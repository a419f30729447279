package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force equivalence checks for the window-backed operators over
  * seeded pseudo-random data — the single-shuffle formulations must agree
  * with the O(n·m) reference definitions on every row, including ties,
  * missing keys, and empty groups.
  */
class RelationalPropertySpec extends SparkSpec {
  import spark.implicits._

  // deterministic LCG so failures reproduce
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  // (key, t, tiebreak id, value) with heavy tie collisions: t ∈ [0, 8)
  private lazy val events = {
    val r = lcg(42).take(600).toSeq
    r.zipWithIndex.map { case (x, i) =>
      ((math.abs(x) % 7).toInt, (math.abs(x >> 8) % 8).toInt, i.toLong, (math.abs(x >> 16) % 1000).toInt)
    }
  }

  test("asOfJoin == brute-force max-(t,id) lookup under ties") {
    val probes = events.take(200).toDF("k", "t", "id", "v")
    val builds = events.drop(200).toDF("k", "t", "id", "v")
      .withColumnRenamed("v", "bv").withColumnRenamed("id", "bid")

    val got = Relational.asOfJoin(
      probes, builds.select(col("k"), col("t"), col("bid").as("id"), col("bid"), col("bv")),
      "k", Seq("t", "id"), Seq("bv"))
      .select("k", "id", "bv").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (if (r.isNullAt(2)) -1 else r.getInt(2))).toMap

    val buildRows = events.drop(200)
    events.take(200).foreach { case (k, t, id, _) =>
      val cands = buildRows.filter { case (bk, bt, bid, _) =>
        bk == k && (bt < t || (bt == t && bid <= id))
      }
      val expect =
        if (cands.isEmpty) -1
        else cands.maxBy { case (_, bt, bid, _) => (bt, bid) }._4
      assert(got((k, id)) == expect, s"probe k=$k id=$id")
    }
  }

  test("latestPerKey == brute-force argmax per key") {
    val df  = events.toDF("k", "t", "id", "v")
    val got = Relational.latestPerKey(df, Seq("k"), Seq(col("t"), col("id")))
      .select("k", "id").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    events.groupBy(_._1).foreach { case (k, rows) =>
      val expect = rows.maxBy(r => (r._2, r._3))._3
      assert(got(k) == expect, s"key $k")
    }
    assert(got.size == events.map(_._1).distinct.size)
  }

  test("semiJoinAny == brute-force OR-membership with exact multiset") {
    val left  = events.take(300).map { case (k, t, id, v) => (k, (k + t) % 11, id, v) }
      .toDF("from", "to", "id", "v")
    val right = Seq(1, 3, 5, 8).toDF("addr")
    val got = Relational.semiJoinAny(left, right, Seq("from", "to"), "addr")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val keys = Set(1, 3, 5, 8)
    val expect = events.take(300)
      .map { case (k, t, id, _) => (k, (k + t) % 11, id) }
      .filter { case (f, t, _) => keys(f) || keys(t) }
      .map(_._3).sorted
    assert(got == expect)
  }

  test("saltedSum == direct groupBy sum under heavy key skew") {
    // 90% of rows share one key — the salted two-phase must still be exact
    val rows = lcg(7).take(500).toSeq.zipWithIndex.map { case (x, i) =>
      (if (i % 10 == 0) (math.abs(x) % 5).toInt else 99, (math.abs(x) % 1000).toInt)
    }
    val df = rows.toDF("k", "v")
    val got = Relational.saltedSum(df, Seq("k"), col("v"), "total", saltBuckets = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2.toLong).sum }
    assert(got == expect)
    // the salt must be a deterministic row function: a task retried after a
    // shuffle-fetch failure re-derives identical (key, salt) partials
    val plan = Relational.saltedSum(df, Seq("k"), col("v"), "total")
      .queryExecution.analyzed.toString
    assert(!plan.contains("monotonically_increasing_id") && !plan.contains("spark_partition_id"))
    assert(plan.contains("xxhash64"))
  }

  test("carryForward == brute-force last-non-null scan") {
    val rows = events.take(200).map { case (k, t, id, v) =>
      (k, t, id, if (v % 3 == 0) Some(v) else None)
    }
    val df = rows.toDF("k", "t", "id", "v")
    val got = Relational.carryForward(df, Seq("k"), Seq(col("t"), col("id")),
      col("v"), lit(-1), "cf")
      .select("id", "cf").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_._1).foreach { case (_, group) =>
      val sorted = group.sortBy(r => (r._2, r._3))
      var lastSeen = -1
      sorted.foreach { case (_, _, id, v) =>
        v.foreach(lastSeen = _)
        assert(got(id) == lastSeen, s"row $id")
      }
    }
  }
}
