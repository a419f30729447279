package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.chain.TableStore
import graft.operators.Sketches
import org.apache.spark.sql.functions._

class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def mkStore() =
    TableStore(spark, Files.createTempDirectory("graft-hll-stream").toString)

  private def batchDf(rows: Seq[(String, String)]) = rows.toDF("g", "v")

  private val b1 = (1 to 400).map(i => ("en", s"tok$i")) ++
    (1 to 50).map(i => ("de", s"wort$i"))
  private val b2 = (200 to 600).map(i => ("en", s"tok$i")) ++ // 200-400 re-seen
    (1 to 80).map(i => ("de", s"wort${i + 50}"))
  private val b3 = (1 to 30).map(i => ("fr", s"mot$i"))       // new group

  private def run(store: TableStore, rows: Seq[(String, String)], bid: Long): Unit =
    StreamingSketch.processSketchBatch(store, "g", "v", m = 256)(batchDf(rows), bid)

  private def snapshot(store: TableStore, bid: Long): Map[String, (Long, Double)] =
    store.readOr(StreamingSketch.CardinalityTable, null)
      .filter(col("batch_id") === bid)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("harmonic"), r.getAs[Double]("hll_est")))).toMap

  private def oneShot(rows: Seq[(String, String)]): Map[String, (Long, Double)] =
    Sketches.hllDistinct(batchDf(rows), Seq("g"), col("v"), m = 256)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("harmonic"), r.getAs[Double]("hll_est")))).toMap

  test("running sketch equals the one-shot sketch over the batch union, register-exact") {
    val store = mkStore()
    run(store, b1, 1L)
    assert(snapshot(store, 1L) == oneShot(b1))
    run(store, b2, 2L)
    assert(snapshot(store, 2L) == oneShot(b1 ++ b2))
    run(store, b3, 3L)
    assert(snapshot(store, 3L) == oneShot(b1 ++ b2 ++ b3))
    // earlier snapshots are history, not rewritten by later batches
    assert(snapshot(store, 1L) == oneShot(b1))
    // state stays bounded: at most groups × m register rows
    val nRegs = store.read(StreamingSketch.RegistersTable,
      StreamingSketch.registersSchema).count()
    assert(nRegs <= 3L * 256)
  }

  test("replaying a batch converges: registers byte-identical, snapshot rewritten once") {
    val store = mkStore()
    run(store, b1, 1L)
    run(store, b2, 2L)
    val regsBefore = store.read(StreamingSketch.RegistersTable,
        StreamingSketch.registersSchema)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val cardRows = store.readOr(StreamingSketch.CardinalityTable, null).count()
    // crash-replay batch 2 twice more
    run(store, b2, 2L)
    run(store, b2, 2L)
    val regsAfter = store.read(StreamingSketch.RegistersTable,
        StreamingSketch.registersSchema)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(regsAfter == regsBefore)
    assert(store.readOr(StreamingSketch.CardinalityTable, null).count() == cardRows)
    assert(snapshot(store, 2L) == oneShot(b1 ++ b2))
  }

  test("estimates track true cardinality within HLL error at m=256") {
    val store = mkStore()
    run(store, b1, 1L)
    run(store, b2, 2L)
    val est = snapshot(store, 2L)
    // en: tok1..600 distinct = 600; de: wort1..130 = 130
    assert(math.abs(est("en")._2 - 600.0) / 600.0 < 0.2, s"en: ${est("en")}")
    assert(math.abs(est("de")._2 - 130.0) / 130.0 < 0.25, s"de: ${est("de")}")
  }
}
