package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Reads go straight through `spark.read.parquet` so Catalyst's DSv2
  * pushdown (filters, column pruning, min/max row-group skipping) applies
  * to every downstream query — the 100 TB plan is "scan only what the
  * query needs", never "load then filter in memory".
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet has shipped `ts` in two physical layouts across driver
    * corpus regenerations: parquet TIMESTAMP(NANOS) — which Spark's
    * vectorized reader only loads as a long under the legacy conf — and
    * plain TIMESTAMP(MICROS), which loads as a timestamp directly. Branch
    * on the loaded dtype so either corpus works. On the nanos path the
    * conversion uses integer division (`DIV`, not `/`) because epoch-nanos
    * (~1.7e18) exceeds a double's 2^53 exact-int range and float division
    * would corrupt low-order digits.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    (df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        // TIMESTAMP_NTZ or TIMESTAMP; normalize to the session TimestampType
        // so downstream comparisons/arithmetic behave identically either way.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    })
  }
  /** The driver tables each ship as ONE parquet row group, so a plain scan
    * gives every downstream query a single input partition — all map-side
    * work (shingling, hashing, partial aggregation over lineitem) would
    * run on one core before the first shuffle. A 100 TB corpus arrives in
    * thousands of splits; a single-row-group test file does not, so fan
    * the rows out once (a small round-robin exchange) and let the heavy
    * map stages use the whole machine. SCALE-ADAPTIVE by construction:
    * the repartition only fires when the scan has fewer partitions than
    * the cluster has slots — at production split counts the condition is
    * false and the plan is untouched (no gratuitous corpus shuffle).
    * Deterministic filters still push below the repartition to the scan
    * (PushedFilters is unaffected), so point lookups shuffle ~matching
    * rows, not the table. Applied to the CORPUS tables only
    * (documents/embeddings — heavy per-row work downstream); extending it
    * to the relational tables (lineitem/orders/events/customer) was
    * measured in round 17 and REJECTED — the round-robin exchange's fixed
    * cost exceeded the single-thread scan savings on all but one query.
    */
  private def fanned(df: DataFrame): DataFrame =
    if (df.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  private def fannedOut(name: String): DataFrame = fanned(t(name))

  def documents: DataFrame  = fannedOut("documents")
  def embeddings: DataFrame = fannedOut("embeddings")
}
