package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-10 additions: gaps-and-islands sessionization,
  * duplicated-span coverage, and the deletion-neighborhood fuzzy join.
  */
class SessionAndFuzzySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize numbers sessions per key at the gap threshold") {
    // user 1: events at 00:00, 00:10, 02:00 with a 30-min gap → sessions 1,1,2
    // user 2: single event → session 1
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:10:00"), 2L),
      (1L, ts("2024-01-01 02:00:00"), 3L),
      (2L, ts("2024-01-01 05:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val got = Relational.sessionize(ev, Seq("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), gapSeconds = 1800L)
      .select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionize keeps a gap of exactly the threshold in-session (session_window convention)") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:30:00"), 2L), // exactly 1800s later → stays
      (1L, ts("2024-01-01 01:00:01"), 3L)  // 1801s later → breaks
    ).toDF("user_id", "ts", "event_id")
    val got = Relational.sessionize(ev, Seq("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), gapSeconds = 1800L)
      .select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("dupSpanCoverage merges overlapping shared windows into true coverage") {
    // docs 1 and 2 share the 30-char run "0123456789abcdefghijklmnopqrst"
    // embedded at different offsets; doc 3 is disjoint. With k=20, the
    // shared run produces 11 overlapping windows per doc that must merge
    // into ONE 30-char island — counting windows without merging would
    // report 11·20 = 220 chars.
    val shared = "0123456789abcdefghijklmnopqrst" // 30 chars
    val docs = Seq(
      (1L, "XXXX" + shared + "YYYYYYYY"),
      (2L, "zz" + shared + "qqq"),
      (3L, "completely different text with no overlap at all..")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 11L, 30L), (2L, 11L, 30L), (3L, 0L, 0L)))
  }

  test("dupSpanCoverage reports separate islands separately") {
    // two disjoint 20-char shared runs inside doc 1 → two islands, 40 chars
    val runA = "AAAAAAAAAABBBBBBBBBB"
    val runB = "CCCCCCCCCCDDDDDDDDDD"
    val docs = Seq(
      (1L, runA + "-- unique middle filler text --" + runB),
      (2L, "left pad " + runA + " right pad"),
      (3L, "other pad " + runB + " tail pad")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 20)
      .filter(col("doc_id") === 1L)
      .select("n_shared_grams", "covered_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(got == ((2L, 40L)))
  }

  test("editDistanceOnePairs finds substitution, indel, and exact pairs — no distance-2") {
    val docs = Seq(
      (1L, "hello world"),
      (2L, "hello worle"), // substitution → dist 1
      (3L, "hello worl"),  // deletion → dist 1 of doc 1, dist 1 of doc 2
      (4L, "hello world"), // exact → dist 0
      (5L, "help wortd")   // dist 2 from doc 1 — must NOT pair
    ).toDF("doc_id", "title")
    val got = TextOps.editDistanceOnePairs(docs, "doc_id", "title")
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(
      (1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 0),
      (2L, 3L, 1), (2L, 4L, 1), (3L, 4L, 1)))
  }

  test("selfRepetitionCoverage flags only re-occurrences within the same doc") {
    val run = "ABCDEFGHIJKLMNOPQRST" // 20 chars
    val docs = Seq(
      // run appears twice → second occurrence is one 20-char repeat island
      (1L, run + "-- unique middle that is long enough --" + run),
      // run appears once here: cross-doc sharing must NOT count as self-repetition
      (2L, "prefix pad " + run + " suffix pad"),
      (3L, "no repetition in this document at all, every char unique-ish")
    ).toDF("doc_id", "text")
    val got = Dedup.selfRepetitionCoverage(docs, "doc_id", "text", k = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 20L)), "second occurrence = one island of 20 chars")
    assert(got(2L) == ((0L, 0L)), "cross-doc duplication is d15's job, not d16's")
    assert(got(3L) == ((0L, 0L)))
  }

  test("labelMrr finds the first same-label neighbor's reciprocal rank") {
    import graft.operators.Similarity
    // probe 1 (label 0): nearest is id 2 (label 1), then id 3 (label 0) → rr = 1/2
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.14f), 1),
      (3L, Array(0.9f, 0.43f), 0),
      (4L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelMrr(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", "label").head()
    assert(got.getAs[Long]("n_relevant") == 1L)
    assert(got.getAs[Int]("first_rank") == 2)
    assert(got.getAs[Double]("rr") == 0.5)
  }

  test("urlDomainStats groups by parsed host; docs without URLs keep an empty-host row") {
    import graft.operators.Curation
    val docs = Seq(
      (1L, "doc with https://a.example.com/x link", "s1"),
      (2L, "another https://a.example.com/y page", "s2"),
      (3L, "see https://b.example.org/z", "s1"),
      (4L, "no links at all here", "s1")
    ).toDF("doc_id", "text", "source")
    val got = Curation.urlDomainStats(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "a.example.com" -> ((2L, 2L)),
      "b.example.org" -> ((1L, 1L)),
      "" -> ((1L, 1L))))
  }

  test("session funnel requires stage ORDER, not mere presence") {
    // purchase BEFORE the first view must not count as a conversion
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "purchase"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "view"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "click"),
      // user 2: full ordered funnel
      (2L, ts("2024-01-01 00:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 00:01:00"), 5L, "click"),
      (2L, ts("2024-01-01 00:02:00"), 6L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val sess = Relational.sessionize(ev, Seq("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), gapSeconds = 86400L)
    val w  = org.apache.spark.sql.expressions.Window.partitionBy("user_id", "session_seq")
    val us = unix_micros(col("ts"))
    val withV = sess.withColumn("__v", min(when(col("event_type") === "view", us)).over(w))
    val withC = withV.withColumn("__c",
      min(when(col("event_type") === "click" && us > col("__v"), us)).over(w))
    val got = withC.withColumn("__p",
        min(when(col("event_type") === "purchase" && us > col("__c"), us)).over(w))
      .withColumn("reached",
        when(col("__p").isNotNull, 3).when(col("__c").isNotNull, 2)
          .when(col("__v").isNotNull, 1).otherwise(0))
      .groupBy("user_id").agg(max("reached").as("reached"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 2, 2L -> 3), "out-of-order purchase must not convert")
  }

  test("editDistanceOnePairs emits one row per pair despite repeated-char variants") {
    // "aaaa" yields the same deletion variant four times; the pair must
    // still appear exactly once
    val docs = Seq((1L, "aaaa"), (2L, "aaab")).toDF("doc_id", "title")
    val rows = TextOps.editDistanceOnePairs(docs, "doc_id", "title").collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("dist") == 1)
  }
}
