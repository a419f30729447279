package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.chain.TableStore
import graft.operators.Similarity

class StreamingSimilaritySpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // deterministic little corpus: 20 vectors on a 2-D fan, 4 exact
  // centroid anchors so the assignment is unambiguous
  private def vec(i: Long): StreamingSimilarity.Vec = {
    val a = (i % 4) * (math.Pi / 2) + (i / 4) * 0.07
    StreamingSimilarity.Vec(i, Array(math.cos(a).toFloat, math.sin(a).toFloat))
  }
  private lazy val centroids = Seq(
    (100L, Array(1.0f, 0.0f)), (101L, Array(0.0f, 1.0f)),
    (102L, Array(-1.0f, 0.0f)), (103L, Array(0.0f, -1.0f))
  ).toDF("vec_id", "embedding")

  test("streamed IVF postings accumulate across batches and serve ivfTopK-identical results") {
    val store = TableStore(spark,
      java.nio.file.Files.createTempDirectory("ivf-stream").toString)
    val in = MemoryStream[StreamingSimilarity.Vec]
    val q = in.toDF().writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, bid: Long) =>
        StreamingSimilarity.processEmbeddingBatch(store, centroids)(b, bid))
      .start()
    try {
      in.addData((0L until 10L).map(vec): _*)
      q.processAllAvailable()
      in.addData((10L until 20L).map(vec): _*)
      q.processAllAvailable()
    } finally q.stop()

    val corpus = (0L until 20L).map(vec).toDF()
    val probes = corpus.filter($"vec_id" < 2)
    val fromIndex = StreamingSimilarity.ivfTopKFromPostings(store, probes, centroids,
        "vec_id", "embedding", k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val direct = Similarity.ivfTopK(corpus, probes, centroids,
        "vec_id", "embedding", k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(fromIndex == direct, "index built over two batches must equal the batch build")
    assert(fromIndex.nonEmpty)
  }

  test("a replayed batch appends nothing (append-only-missing idempotency)") {
    val store = TableStore(spark,
      java.nio.file.Files.createTempDirectory("ivf-replay").toString)
    val batch = (0L until 8L).map(vec).toDF()
    StreamingSimilarity.processEmbeddingBatch(store, centroids)(batch, 0L)
    val n1 = store.read("ivf_postings", StreamingSimilarity.postingsSchema).count()
    // crash-replay: the same batch runs again
    StreamingSimilarity.processEmbeddingBatch(store, centroids)(batch, 0L)
    val n2 = store.read("ivf_postings", StreamingSimilarity.postingsSchema).count()
    assert(n1 == 8L && n2 == 8L, s"replay must not grow the index ($n1 -> $n2)")
  }

  test("the query-side postings scan is partition-pruned to the probed lists") {
    val store = TableStore(spark,
      java.nio.file.Files.createTempDirectory("ivf-prune").toString)
    StreamingSimilarity.processEmbeddingBatch(store, centroids)(
      (0L until 20L).map(vec).toDF(), 0L)
    val probes = Seq(vec(0L)).toDF() // nearest lists: centroid 100 + one more
    val df = StreamingSimilarity.ivfTopKFromPostings(store, probes, centroids,
      "vec_id", "embedding", k = 3, nProbe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"postings scan must carry a centroid partition filter:\n$plan")
    // both ranking stages are the bounded top-k aggregate, never a
    // row_number window (the batch tier's round-14 contract)
    assert(!plan.contains("Window"),
      s"query face must not window its ranking stages:\n$plan")
    assert(plan.contains("partial_collect_top_k"),
      s"bounded top-k must map-side combine:\n$plan")
    assert(df.collect().nonEmpty)
  }
}
