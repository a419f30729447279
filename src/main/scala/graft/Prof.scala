package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only stage profiler (not part of the library). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1").documents
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    time("warm")(docs.count())
    val sigs = Dedup.minHashSignatureArray(docs, "doc_id", "text", 2, 64)
    time("sigs")(sigs.queryExecution.toRdd.count())
    val bands = Dedup.lshBands(sigs, "doc_id", 64, 16)
    time("bands")(bands.queryExecution.toRdd.count())
    val cands = Dedup.candidatePairs(bands, "doc_id")
    time("cands")(cands.queryExecution.toRdd.count())
    val full = Dedup.minHashLshNearDups(docs, "doc_id", "text", 2, 64, 16, 0.8)
    time("full")(full.queryExecution.toRdd.count())
    time("full2")(full.queryExecution.toRdd.count())
    spark.stop()
  }
}
