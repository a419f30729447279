package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.chain.TableStore
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** The streaming bottom-k sample against its one-shot twin: the running
  * quantiles after batch n must equal [[Sketches.bottomKQuantiles]] over
  * the union of batches 1..n exactly (the md5 sample keys are a fixed
  * permutation, so the k smallest of the union are the k smallest of the
  * merged per-batch samples), replay must converge by the min-k set
  * algebra alone, and the state must stay ≤ groups×k rows forever.
  */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  private def mkStore() =
    TableStore(spark, Files.createTempDirectory("graft-bk-stream").toString)

  private def batchDf(rows: Seq[(String, Long, Long)]) = rows.toDF("g", "id", "v")

  private val b1 = (1L to 200L).map(i => ("en", i, i * 7 % 1000))
  private val b2 = (201L to 260L).map(i => ("en", i, i * 13 % 1000)) ++
    (1L to 90L).map(i => ("de", i + 1000, i * 3))
  private val b3 = (1L to 10L).map(i => ("fr", i + 5000, i)) // tiny new group

  private def run(store: TableStore, rows: Seq[(String, Long, Long)], bid: Long): Unit =
    StreamingQuantiles.processQuantileBatch(store, "g", "v", "id", K)(batchDf(rows), bid)

  private def snapshot(store: TableStore, bid: Long): Map[String, (Int, Long, Long, Long)] =
    store.readOr(StreamingQuantiles.QuantilesTable, null)
      .filter(col("batch_id") === bid)
      .collect().map(r => r.getAs[String]("g") -> ((r.getAs[Int]("n_sample"),
        r.getAs[Long]("p50"), r.getAs[Long]("p90"), r.getAs[Long]("p99")))).toMap

  private def oneShot(rows: Seq[(String, Long, Long)]): Map[String, (Int, Long, Long, Long)] =
    Sketches.bottomKQuantiles(batchDf(rows), "g", "v", "id", K)
      .collect().map(r => r.getAs[String]("g") -> ((r.getAs[Int]("n_sample"),
        r.getAs[Long]("p50"), r.getAs[Long]("p90"), r.getAs[Long]("p99")))).toMap

  test("running quantiles equal the one-shot sketch over the batch union") {
    val store = mkStore()
    run(store, b1, 1L)
    assert(snapshot(store, 1L) == oneShot(b1))
    run(store, b2, 2L)
    assert(snapshot(store, 2L) == oneShot(b1 ++ b2))
    run(store, b3, 3L)
    assert(snapshot(store, 3L) == oneShot(b1 ++ b2 ++ b3))
    // earlier snapshots are history, untouched by later batches
    assert(snapshot(store, 1L) == oneShot(b1))
    // running row totals come from summing the batch-tagged snapshots
    val total = store.readOr(StreamingQuantiles.QuantilesTable, null)
      .filter(col("g") === "en").agg(sum("batch_rows")).head().getLong(0)
    assert(total == 260L)
    // bounded state: ≤ groups×k sample rows forever
    assert(store.read(StreamingQuantiles.SampleTable,
      StreamingQuantiles.sampleSchema).count() <= 3L * K)
  }

  test("replaying a batch converges by the min-k set algebra, snapshot rewritten once") {
    val store = mkStore()
    run(store, b1, 1L)
    run(store, b2, 2L)
    val before = store.read(StreamingQuantiles.SampleTable,
        StreamingQuantiles.sampleSchema)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val rows = store.readOr(StreamingQuantiles.QuantilesTable, null).count()
    (1 to 3).foreach(_ => run(store, b2, 2L)) // crash-replay, three times
    val after = store.read(StreamingQuantiles.SampleTable,
        StreamingQuantiles.sampleSchema)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(after == before, "replay must not move the sample state")
    assert(store.readOr(StreamingQuantiles.QuantilesTable, null).count() == rows,
      "replay must rewrite its snapshot row, not append")
    assert(snapshot(store, 2L) == oneShot(b1 ++ b2))
  }
}
