package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.operators.Relational

/** Pins the batch/streaming session-boundary EQUIVALENCE with a test, not
  * prose. Round 14 documented a divergence: `session_window` was claimed
  * to START a new session on an event at exactly `last + gap` while the
  * batch face's `delta > gap` keeps it. Measured here, that claim is
  * WRONG — Spark's session merge test is inclusive (a window starting
  * exactly at an open window's end merges into it), within one batch and
  * across the cross-batch state-merge path alike. The two faces therefore
  * agree on the exact-boundary event with no code change; this spec keeps
  * them agreeing in both directions (boundary stays, beyond-boundary
  * breaks) so any future drift in either face fails a test instead of
  * silently diverging.
  */
class SessionParitySpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: second event EXACTLY 10 min after the first → boundary case,
  //   one session on both faces;
  // user 2: second event 10:01 after the first → breaks, two sessions
  private val events = Seq(
    (1L, ts("2024-01-01 00:00:00"), 1L),
    (1L, ts("2024-01-01 00:10:00"), 2L),
    (2L, ts("2024-01-01 00:00:00"), 3L),
    (2L, ts("2024-01-01 00:10:01"), 4L))

  private val expected = Map(1L -> 1L, 2L -> 2L)

  test("batch face: exact-gap event stays in-session, beyond-gap breaks") {
    val got = Relational.sessionize(events.toDF("user_id", "ts", "event_id"),
        Seq("user_id"), col("ts"), Seq(col("ts"), col("event_id")), gapSeconds = 600L)
      .groupBy("user_id").agg(max("session_seq").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("streaming face, same-batch arrival: identical session counts") {
    val in  = MemoryStream[StreamingSessions.Event]
    val out = StreamingSessions.sessionStream(in.toDF(), gap = "10 minutes")
    val q = out.writeStream.format("memory").queryName("parity_same")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(events.map { case (u, t, id) => StreamingSessions.Event(u, t, id) }: _*)
      q.processAllAvailable()
      // watermark push so every session finalizes and emits
      in.addData(StreamingSessions.Event(9L, ts("2024-01-02 00:00:00"), 99L))
      q.processAllAvailable()
      val got = spark.table("parity_same").filter($"user_id" < 9L)
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected,
        "streaming session counts must match the batch face on the exact-boundary event")
    } finally q.stop()
  }

  test("streaming face, cross-batch arrival: the state-merge path agrees too") {
    val in  = MemoryStream[StreamingSessions.Event]
    val out = StreamingSessions.sessionStream(in.toDF(), gap = "10 minutes")
    val q = out.writeStream.format("memory").queryName("parity_cross")
      .outputMode(OutputMode.Append()).start()
    try {
      // first events land, open sessions become STATE
      in.addData(
        StreamingSessions.Event(1L, ts("2024-01-01 00:00:00"), 1L),
        StreamingSessions.Event(2L, ts("2024-01-01 00:00:00"), 3L))
      q.processAllAvailable()
      // boundary / beyond-boundary events arrive in a LATER batch, so the
      // merge decision runs against checkpointed state, not batch-local rows
      in.addData(
        StreamingSessions.Event(1L, ts("2024-01-01 00:10:00"), 2L),
        StreamingSessions.Event(2L, ts("2024-01-01 00:10:01"), 4L))
      q.processAllAvailable()
      in.addData(StreamingSessions.Event(9L, ts("2024-01-02 00:00:00"), 99L))
      q.processAllAvailable()
      val got = spark.table("parity_cross").filter($"user_id" < 9L)
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected,
        "cross-batch state merge must keep the exact-boundary event in-session")
    } finally q.stop()
  }
}
