package graft.chain

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal transactional-enough table store over parquet directories:
  * append for the normal ingest path, atomic directory-swap rewrite for
  * retraction (the reference's DELETE WHERE block_number BETWEEN f AND t,
  * store/store.go:319-378).
  *
  * In a production deployment this seam is a Delta/Iceberg table —
  * `DELETE WHERE` + txn log replace the swap; the interface is shaped so
  * only this class changes. Idempotency (T6) comes from keyed dedup at
  * write time, mirroring the reference's duplicate-key tolerance
  * (common/errors.go:48-57).
  */
final case class TableStore(spark: SparkSession, root: String) {

  private def dir(table: String): Path = Paths.get(root, table)

  def exists(table: String): Boolean = {
    val d = dir(table)
    Files.exists(d) && Files.list(d).findFirst().isPresent
  }

  def read(table: String, schema: StructType): DataFrame =
    if (exists(table)) spark.read.parquet(dir(table).toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def readOr(table: String, fallback: => DataFrame): DataFrame =
    if (exists(table)) spark.read.parquet(dir(table).toString) else fallback

  def append(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(dir(table).toString)

  /** Replace the table's content with `df` — used for retraction. Writes to
    * a sibling tmp dir, then swaps, so a concurrent reader never sees a
    * half-written table and the source can be derived from the table itself.
    */
  def replace(table: String, df: DataFrame): Unit = {
    val tmp = Paths.get(root, s".${table}_tmp")
    deleteRecursive(tmp)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val target = dir(table)
    val old    = Paths.get(root, s".${table}_old")
    deleteRecursive(old)
    if (Files.exists(target)) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(old)
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
