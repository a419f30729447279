package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query: the Spark plan plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL run by the
  * driver's correctness harness over the same parquet tables.
  *
  * Determinism rules every entry follows (they make the hash-compare sound):
  *   - the result carries a total ORDER BY (unique tiebreaker);
  *   - double columns are aggregated as DECIMAL (exact, associative) or are
  *     pure per-row IEEE scalar math (bit-identical across engines);
  *   - column names match between the Spark plan and the SQL exactly.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  /** DuckDB table name -> parquet path FROM-clause helper: the driver
    * registers tables by reading the same files, so oracles just reference
    * `read_parquet('<dir>/name.parquet')` — it substitutes the dir. We keep
    * bare table names; the driver maps them (TESTDATA.md contract).
    */
  def sql(fn: (SparkSession, String) => DataFrame, oracleSql: String): QueryDef =
    QueryDef(fn, Some(oracleSql))

  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
