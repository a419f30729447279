package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val B = 100L // tiny bucket width to force multi-bucket spans

  private def run(rows: Seq[(String, Long, Long, Long)], maxB: Int = 1024) =
    Relational.intervalJoin(
      rows.toDF("k", "id", "s", "e"), Seq("k"), "id", col("s"), col("e"),
      bucketMicros = B, maxBucketsPerRow = maxB)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("id_a"),
        r.getAs[Long]("id_b"), r.getAs[Long]("overlap_us"))).toSet

  test("overlapping pairs within a key, exactly once across shared buckets") {
    val got = run(Seq(
      ("x", 1L, 0L, 250L),    // spans buckets 0,1,2
      ("x", 2L, 120L, 380L),  // spans 1,2,3 — shares buckets 1 AND 2 with id 1
      ("x", 3L, 500L, 600L),  // disjoint from both
      ("y", 4L, 0L, 250L)     // other key: never pairs with x rows
    ))
    // (1,2) overlap [120,250] = 130; emitted ONCE despite two shared buckets
    assert(got == Set(("x", 1L, 2L, 130L)))
  }

  test("touching endpoints count as overlap zero; reversed ids normalize") {
    val got = run(Seq(
      ("k", 10L, 100L, 200L),
      ("k", 5L, 200L, 300L))) // starts exactly where 10 ends
    assert(got == Set(("k", 5L, 10L, 0L)))
  }

  test("maxBucketsPerRow valve drops hostile spans instead of exploding") {
    val got = run(Seq(
      ("k", 1L, 0L, 1000000L), // 10k buckets at B=100 — over the valve
      ("k", 2L, 50L, 150L),
      ("k", 3L, 120L, 160L)), maxB = 100)
    // the hostile row vanishes; the small pair still reports
    assert(got == Set(("k", 2L, 3L, 30L)))
  }

  test("negative-length and negative-time intervals are dropped") {
    val got = run(Seq(
      ("k", 1L, 300L, 200L), // e < s
      ("k", 2L, -50L, 80L),  // negative epoch
      ("k", 3L, 100L, 180L),
      ("k", 4L, 150L, 220L)))
    assert(got == Set(("k", 3L, 4L, 30L)))
  }

  test("matches a brute-force O(n^2) oracle on random-ish intervals") {
    val rows = (1 to 120).map { i =>
      val s = (i * 37L) % 900
      ("k" + (i % 3), i.toLong, s, s + (i * 13L) % 200
    )}
    val got = run(rows)
    val want = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._2, math.min(a._4, b._4) - math.max(a._3, b._3))).toSet
    assert(got == want, s"got ${got.size} vs want ${want.size}")
  }
}
