package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Dev-only control experiment behind BENCH_SF1.md's super-linear
  * attribution: the s3/s4/s12/s16/d12 bench fixtures derive coarse
  * centroids as `vec_id % 97 == 0`, which makes centroid count k scale
  * LINEARLY with the corpus — so the Θ(n·k) assignment stage does 100×
  * the work at 10× the data by construction. This probe times the same
  * operators on the same corpus under both rules:
  *   - `%97`  — the bench fixture (k ∝ n);
  *   - `%971` — k held at the sf0.1 value (~21 centroids at sf1).
  * A ~10× wall-clock drop under the fixed-k rule pins the blowup on the
  * fixture's k, not on the operator's scaling.
  *
  * Usage: runMain graft.ScaleProbe [sfDir]
  *    or: runMain graft.ScaleProbe sfDir q1 q2 …   (fresh-JVM timings of
  *        named SparkEntry inventory queries — the per-operator cost-curve
  *        probe without the 130-query-JVM heap history)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1) {
      args.drop(1).foreach { name =>
        val t0 = System.nanoTime()
        val n  = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      spark.stop()
      return
    }
    val e = Tables(spark, dir).embeddings
    println(s"corpus rows: ${e.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // fresh-JVM floor for the two gram-coverage queries that ran ~15× at
    // sf1 inside the 120-queries-deep bench JVM: if a fresh process lands
    // near 10× the sf0.1 medians, the residual was heap/GC state, not plan
    // shape
    val docs = Tables(spark, dir).documents
    time("d15_dup_spans (fresh JVM)") {
      Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 20)
        .queryExecution.toRdd.count()
    }
    time("d16_self_repetition (fresh JVM)") {
      Dedup.selfRepetitionCoverage(docs, "doc_id", "text", k = 20)
        .queryExecution.toRdd.count()
    }
    Seq(97L -> "k~n (bench fixture)", 971L -> "k fixed at sf0.1 value").foreach {
      case (m, label) =>
        val cents = e.filter(col("vec_id") % m === 0)
        println(s"-- centroid rule %$m ($label): k = ${cents.count()}")
        time(s"s4_kmeans_step %$m") {
          Similarity.kmeansStep(e, cents, "vec_id", "embedding")
            .queryExecution.toRdd.count()
        }
        time(s"s3_ann_ivf %$m") {
          Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), cents,
            "vec_id", "embedding", k = 10, nProbe = 2)
            .queryExecution.toRdd.count()
        }
        time(s"d12_semdedup %$m") {
          Dedup.semanticDedup(e, cents, "vec_id", "embedding", tau = 0.3)
            .queryExecution.toRdd.count()
        }
    }
    spark.stop()
  }
}
