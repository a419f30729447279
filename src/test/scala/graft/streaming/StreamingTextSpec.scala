package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class StreamingTextSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("dedupStream drops duplicates across micro-batches (stateful)") {
    val in  = MemoryStream[StreamingText.Doc]
    val out = StreamingText.dedupStream(in.toDS())
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two distinct + an in-batch duplicate (by normalized text)
      in.addData(StreamingText.Doc(1L, "Hello  World"), StreamingText.Doc(2L, "other doc"),
        StreamingText.Doc(3L, "hello world"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate of doc 1 + one new
      in.addData(StreamingText.Doc(4L, "HELLO WORLD"), StreamingText.Doc(5L, "fresh content"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect().map(_.getAs[Long]("doc_id")).sorted
      assert(got.toSeq == Seq(1L, 2L, 5L)) // 3 (in-batch) and 4 (cross-batch) deduped
    } finally q.stop()
  }

  test("windowedQuality emits watermark-finalized windows and drops stragglers") {
    val in = MemoryStream[(Timestamp, String)]
    val out = StreamingText.windowedQuality(
      in.toDF().toDF("ts", "text"), "ts", "10 seconds", "5 seconds")
    val q = out.writeStream.format("memory").queryName("wq_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def ts(s: Int) = new Timestamp(s * 1000L)
      in.addData((ts(1), "a doc!"), (ts(4), "more, text?"))
      q.processAllAvailable()
      // advance event time past window-end (10s) + lateness (5s)
      in.addData((ts(21), "next window"))
      q.processAllAvailable()
      // straggler for the finalized [0,10) window: dropped by the watermark
      in.addData((ts(2), "too late"))
      q.processAllAvailable()
      in.addData((ts(40), "flush"))
      q.processAllAvailable()
      val rows = spark.table("wq_out").collect()
        .map(r => r.getAs[Timestamp]("window_start").getTime / 1000 -> r.getAs[Long]("n_docs"))
        .toMap
      assert(rows(0L) == 2L) // straggler NOT counted
    } finally q.stop()
  }
}
