package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Dev-only stage profiler (not part of the library). Current focus: the
  * d9/d10 floor lift on the regenerated sf0.1 corpus — stage cardinalities
  * (fingerprint buckets, candidate edges, chunk-hash groups) plus the CC
  * path/round telemetry, so a wall-clock regression can be attributed to
  * data shape vs plan shape.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables(spark, dir).documents
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name t=${(System.nanoTime() - t0) / 1e9}%.2f -> $r")
      r
    }
    time("warm")(docs.count())

    // ---- d9 path: chunk hashes -> first-occurrence agg ----
    val chunks = Dedup.chunkHashes(docs, "doc_id", "text", 16)
    time("d9.chunkHashes.count")(chunks.queryExecution.toRdd.count())
    time("d9.group.card") {
      val g = chunks.groupBy("__h").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("groups"), max("n").as("maxGroup"),
          sum(when(col("n") > 1, col("n")).otherwise(0)).as("dupMass"))
        .collect()(0)
      s"groups=${g.getLong(0)} maxGroup=${g.getLong(1)} dupMass=${g.getLong(2)}"
    }
    // fresh DataFrame per trial — the bench rebuilds the plan each trial,
    // so shuffle-output reuse across runs of one RDD must not flatter us
    for (i <- 1 to 3)
      time(s"d9.full.$i")(
        Dedup.chunkDedup(Tables(spark, dir).documents, "doc_id", "text", 16)
          .orderBy("doc_id").queryExecution.toRdd.count())

    // ---- d10 path: winnow fingerprints -> buckets -> edges -> CC -> agg ----
    val wf = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), TextOps.shingleHashArray(col("__toks"), 3).as("__hs"))
      .select(col("doc_id"),
        explode(TextOps.winnowedFingerprintsOfHashes(col("__hs"), 4)).as("fp"))
    time("d10.fingerprints.count")(wf.queryExecution.toRdd.count())
    time("d10.bucket.card") {
      val g = wf.groupBy("fp").agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .agg(count(lit(1)).as("buckets"), max("n").as("maxBucket"),
          sum(col("n") * (col("n") - 1) / 2).as("pairsUB")).collect()(0)
      s"buckets=${g.getLong(0)} maxBucket=${g.getLong(1)} pairsUB=${g.get(2)}"
    }
    val edges = Dedup.winnowEdges(docs, "doc_id", "text", 3, 4, 2)
    val nEdges = time("d10.edges.count")(edges.queryExecution.toRdd.count())
    time("d10.cc") {
      Dedup.connectedComponents(edges, "id_a", "id_b").queryExecution.toRdd.count()
      Dedup.lastCcStats
    }
    println(s"CC stats after full run: ${Dedup.lastCcStats} (edges input=$nEdges)")
    for (i <- 1 to 3)
      time(s"d10.full.$i")(
        Dedup.canonicalPerCluster(Tables(spark, dir).documents,
            "doc_id", "text", "n_chars")
          .orderBy("doc_id").queryExecution.toRdd.count())
    spark.stop()
  }
}
