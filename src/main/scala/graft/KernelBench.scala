package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** Dev-only microbench: native kernels vs the declarative HOF chains, on
  * the sf0.1 corpus, same session, median of 3. Round-17 verdicts it
  * recorded: native cosine 0.014 s vs declarative 0.027 s per pass
  * (ADOPTED — graft.functions.CosineSim); native shingle-hash 0.049 s vs
  * declarative 0.036 s and winnow ~equal (REVERTED — Spark's codegen'd
  * md5 over UTF8String beats a JVM-side digest loop's byte copies, so
  * the interpreted-HOF overhead isn't where the time goes). The shingle
  * comparisons below now measure the declarative form against itself and
  * exist as the harness to re-test any future kernel candidate.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // match Bench's shuffle-writer config (rationale in Bench.scala)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").repartition(32)
      .localCheckpoint(true)

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-34s median ${ts(1)}%6.3f s  [${ts.head}%.3f, ${ts.last}%.3f]")
    }

    val toks = TextOps.tokens(col("text"))
    def refShingles(n: Int) =
      filter(transform(col("__t"), (_, i) => when(i <= size(col("__t")) - n,
        concat_ws(" ", slice(col("__t"), i + 1, lit(n))))), x => x.isNotNull)
    def refHashes(k: Int) = transform(refShingles(k),
      g => pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"), lit(Dedup.MersennePrime)))
    def refWinnow(w: Int) = array_distinct(filter(
      transform(col("__hs"), (_, i) => when(i <= size(col("__hs")) - w,
        array_min(slice(col("__hs"), i + 1, lit(w))))), x => x.isNotNull))

    val td = docs.select(col("doc_id"), toks.as("__t")).localCheckpoint(true)
    time("shingleHashes k=3 NATIVE")(
      td.select(sum(aggregate(TextOps.shingleHashArray(col("__t"), 3), lit(0L), _ + _))))
    time("shingleHashes k=3 declarative")(
      td.select(sum(aggregate(refHashes(3), lit(0L), _ + _))))
    val hs = td.select(col("doc_id"),
      TextOps.shingleHashArray(col("__t"), 3).as("__hs")).localCheckpoint(true)
    time("winnowMins w=4 NATIVE")(
      hs.select(sum(aggregate(TextOps.winnowedFingerprintsOfHashes(col("__hs"), 4), lit(0L), _ + _))))
    time("winnowMins w=4 declarative")(
      hs.select(sum(aggregate(refWinnow(4), lit(0L), _ + _))))

    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")),
        expr("ib between ia - 8 and ia + 8 and ia <> ib"))
      .localCheckpoint(true)
    def refCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val d = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val nn = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), _ + _)) *
        sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")), lit(0.0), _ + _))
      when(nn === 0.0, 0.0).otherwise(d / nn)
    }
    println(s"cosine pairs: ${pairs.count()}")
    time("cosine NATIVE")(pairs.select(sum(graft.functions.CosineSim(col("va"), col("vb")))))
    time("cosine declarative")(pairs.select(sum(refCos(col("va"), col("vb")))))

    // MinHash signature agreement (StreamingDedup's per-candidate kernel):
    // native SigEqCount vs the aggregate/zip_with HOF chain it replaced
    val sigs = Dedup.minHashSignatureArray(docs, "doc_id", "text", 3, 64)
      .localCheckpoint(true)
    val sigPairs = sigs.select(col("doc_id").as("ia"), col("sig").as("sa"))
      .join(sigs.select(col("doc_id").as("ib"), col("sig").as("sb")),
        expr("ib between ia - 8 and ia + 8 and ia <> ib"))
      .localCheckpoint(true)
    def refSigAgree(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(aggregate(zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), _ + _).cast("double") / 64, 6)
    println(s"sig pairs: ${sigPairs.count()}")
    time("sigAgreement NATIVE")(sigPairs.select(
      sum(round(graft.functions.SigEqCount(col("sa"), col("sb")).cast("double") / 64, 6))))
    time("sigAgreement declarative")(sigPairs.select(sum(refSigAgree(col("sa"), col("sb")))))
    spark.stop()
  }
}
