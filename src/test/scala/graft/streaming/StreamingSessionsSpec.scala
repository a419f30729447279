package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionStream merges a session across micro-batches and emits on watermark close") {
    val in  = MemoryStream[StreamingSessions.Event]
    val out = StreamingSessions.sessionStream(in.toDF(), gap = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 opens a session (2 events, 5 min apart); user 2 one event
      in.addData(
        StreamingSessions.Event(1L, ts("2024-01-01 00:00:00"), 1L),
        StreamingSessions.Event(1L, ts("2024-01-01 00:05:00"), 2L),
        StreamingSessions.Event(2L, ts("2024-01-01 00:00:00"), 3L))
      q.processAllAvailable()
      // batch 2: 00:12 is within 10 min of user 1's open window end (00:15)
      // → MERGES into the batch-1 session even though that window is state
      // from a prior batch
      in.addData(StreamingSessions.Event(1L, ts("2024-01-01 00:12:00"), 4L))
      q.processAllAvailable()
      // batch 3: a far-future event pushes the watermark past every open
      // session's close so the finalized sessions emit
      in.addData(StreamingSessions.Event(9L, ts("2024-01-02 00:00:00"), 99L))
      q.processAllAvailable()

      val rows = spark.table("sess_out")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      // user 1: one session [00:00, 00:12+10min), THREE events — not two
      // sessions, which is what a per-batch (stateless) grouping would give
      assert(rows.contains((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:22:00"), 3L)))
      assert(rows.contains((2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 1L)))
      // the sentinel session is still open → must NOT have emitted
      assert(!rows.exists(_._1 == 9L))
    } finally q.stop()
  }

  test("sessionStream keeps separate sessions for gaps beyond the window") {
    val in  = MemoryStream[StreamingSessions.Event]
    val out = StreamingSessions.sessionStream(in.toDF(), gap = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess_out2")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        StreamingSessions.Event(1L, ts("2024-01-01 00:00:00"), 1L),
        StreamingSessions.Event(1L, ts("2024-01-01 01:00:00"), 2L))
      q.processAllAvailable()
      in.addData(StreamingSessions.Event(9L, ts("2024-01-02 00:00:00"), 99L))
      q.processAllAvailable()
      val starts = spark.table("sess_out2").filter($"user_id" === 1L)
        .select("session_start").collect().map(_.getTimestamp(0)).toSet
      assert(starts == Set(ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
    } finally q.stop()
  }
}
