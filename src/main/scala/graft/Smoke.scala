package graft

import org.apache.spark.sql.SparkSession

/** Driver-style smoke check: SparkEntry.entry on sf0.001 must return rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$rows")
    require(rows > 0, "entry returned no rows")
    spark.stop()
  }
}
