package graft.chain

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** S10's JDBC face: a relational mirror of the chain tables behind the
  * same append/deleteRange verbs as TableStore, driven from foreachBatch —
  * the reference's MySQL sink (hand-built INSERTs + `DELETE WHERE
  * block_number BETWEEN`, store/store.go:129-147,319-378) expressed
  * through Spark's JDBC writer.
  *
  *   - appends go through `df.write.jdbc` (batched inserts, executor-side
  *     parallel connections — one per partition);
  *   - retraction is the reference's own range DELETE, one driver-side
  *     statement per table: the predicate touches an indexed column, so
  *     the work is the database's, not a table rewrite;
  *   - wide decimals (wei, Decimal(38,0)) are stored as VARCHAR exactly
  *     like the reference's varchar(32) columns (model/types.go:72-81) —
  *     most JDBC engines cap DECIMAL below 38 digits (Derby: 31), and the
  *     reference made the same call for MySQL.
  *
  * Tested against embedded Derby (on Spark's classpath); any JDBC url
  * works the same way.
  */
final case class JdbcMirror(spark: SparkSession, url: String) {

  private def props: Properties = new Properties()

  /** Append a DataFrame; wei-wide decimal columns travel as strings. */
  def append(table: String, df: DataFrame): Unit =
    stringifyWideDecimals(df).write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Replay-tolerant append for a known block range — the reference treats
    * duplicate-key on re-insert as benign (common/errors.go:48-57, replayed
    * in service/indexer/indexer.go:151-163) because a crashed loop replays
    * its last chunk. Spark's JDBC writer has no INSERT IGNORE, so the same
    * idempotency is delete-then-append keyed by the chunk's range: the
    * DELETE is a no-op on first write (and when the table doesn't exist
    * yet) and clears the partial residue on replay, making
    * `appendRange(t, df, c, f, to)` safe to run any number of times.
    * Callers that already retracted (reorg handling) lose nothing — the
    * second DELETE matches zero rows.
    */
  def appendRange(table: String, df: DataFrame, rangeCol: String,
                  from: Long, to: Long): Unit = {
    if (exists(table)) deleteRange(table, rangeCol, from, to)
    append(table, df)
  }

  /** The reference's retraction statement, verbatim semantics. The range
    * COLUMN is quoted with the DRIVER'S quote string from connection
    * metadata (backticks on MySQL, double quotes on Derby/Postgres) —
    * hardcoded ANSI quotes would break on the reference's actual MySQL
    * backend. Spark's JDBC writer quotes column names (case-preserving)
    * but passes the TABLE name raw in `CREATE TABLE`, so the table must
    * stay raw here too or the identifiers stop matching on
    * case-normalizing engines like Derby.
    */
  def deleteRange(table: String, rangeCol: String, from: Long, to: Long): Unit = {
    require(table.matches("[A-Za-z0-9_.]+"), s"unsafe table name: $table")
    val conn = DriverManager.getConnection(url)
    try {
      val q = Option(conn.getMetaData.getIdentifierQuoteString)
        .map(_.trim).filter(_.nonEmpty).getOrElse("")
      def qt(id: String) =
        if (q.isEmpty) id else q + id.replace(q, q + q) + q
      val st = conn.prepareStatement(
        s"DELETE FROM $table WHERE ${qt(rangeCol)} BETWEEN ? AND ?")
      try { st.setLong(1, from); st.setLong(2, to); st.executeUpdate() }
      finally st.close()
    } finally conn.close()
  }

  def read(table: String): DataFrame = spark.read.jdbc(url, table, props)

  /** JDBC table-pattern matching is case-sensitive and engines normalize
    * identifiers differently (Derby uppercases, Postgres lowercases, MySQL
    * preserves) — probe all three forms, or the mirror's replay watermark
    * would read as perpetually absent on a case-preserving backend and
    * every batch would re-append unguarded duplicates.
    */
  def exists(table: String): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      def has(name: String): Boolean = {
        val rs = conn.getMetaData.getTables(null, null, name, null)
        try rs.next() finally rs.close()
      }
      has(table) || has(table.toUpperCase) || has(table.toLowerCase)
    } finally conn.close()
  }

  private def stringifyWideDecimals(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case d: DecimalType if d.precision > 31 =>
          acc.withColumn(f.name, col(f.name).cast("string"))
        case _ => acc
      }
    }
}
