package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct estimates within HLL error bounds and is duplicate-insensitive") {
    // 5000 distinct values, each appearing 3 times: a multiset whose
    // DISTINCT count the sketch must recover without any pre-distinct
    val vals = (1 to 5000).flatMap(i => Seq.fill(3)(s"value-$i"))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .withColumn("g", lit("all"))
    val row = Sketches.hllDistinct(df, Seq("g"), col("v"), m = 1024).collect().head
    val est = row.getAs[Double]("hll_est")
    // standard error 1.04/sqrt(1024) ~ 3.25%; assert a generous 3 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"est $est vs 5000")
    assert(row.getAs[Long]("m") == 1024L)

    // duplicates are free: the deduplicated input yields the IDENTICAL sketch
    val once = (1 to 5000).map(i => (i.toLong, s"value-$i")).toDF("id", "v")
      .withColumn("g", lit("all"))
    val rowOnce = Sketches.hllDistinct(once, Seq("g"), col("v"), m = 1024).collect().head
    assert(rowOnce.getAs[Long]("harmonic") == row.getAs[Long]("harmonic"))
    assert(rowOnce.getAs[Double]("hll_est") == est)
  }

  test("hllDistinct keeps groups independent") {
    val df = ((1 to 1000).map(i => ("a", s"x$i")) ++ (1 to 10).map(i => ("b", s"x$i")))
      .toDF("g", "v")
    val got = Sketches.hllDistinct(df, Seq("g"), col("v"), m = 256)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("hll_est")).toMap
    assert(math.abs(got("a") - 1000.0) / 1000.0 < 0.2, s"group a: ${got("a")}")
    // 10 values over 256 registers is the sparse range: the raw HLL
    // estimate saturates near α·m there, so the linear-counting branch
    // (m·ln(m/V)) must fire and land near the true 10
    assert(math.abs(got("b") - 10.0) < 3.0, s"group b: ${got("b")}")
  }

  test("hllOverlap: union is the exact max-merge sketch, intersection tracks truth") {
    val a = (1 to 1000).map(i => ("g", s"v$i")).toDF("g", "v")
    val b = (500 to 1500).map(i => ("g", s"v$i")).toDF("g", "v")
    val row = Sketches.hllOverlap(a, b, Seq("g"), col("v"), m = 1024).collect().head
    // the union estimate must equal the one-shot sketch of A ∪ B exactly
    // (max-merge IS the union sketch, not an approximation of it)
    val direct = Sketches.hllDistinct(a.union(b), Seq("g"), col("v"), m = 1024)
      .collect().head.getAs[Double]("hll_est")
    assert(row.getAs[Double]("est_union") == direct)
    // inclusion-exclusion: truth |A∩B| = 501, |A∪B| = 1500 — wide bars,
    // the intersection inherits both sketches' error
    assert(math.abs(row.getAs[Double]("est_union") - 1500.0) / 1500.0 < 0.1)
    assert(math.abs(row.getAs[Double]("est_intersect") - 501.0) / 501.0 < 0.35,
      s"intersect ${row.getAs[Double]("est_intersect")}")
    val j = row.getAs[Double]("jaccard_est")
    assert(j > 0.2 && j < 0.5, s"jaccard $j vs true 0.334")

    // disjoint sets: the clamp keeps the estimate at >= 0
    val c = (5000 to 5800).map(i => ("g", s"w$i")).toDF("g", "v")
    val dj = Sketches.hllOverlap(a, c, Seq("g"), col("v"), m = 1024).collect().head
    assert(dj.getAs[Double]("est_intersect") >= 0.0)
    assert(dj.getAs[Double]("est_intersect") / 1800.0 < 0.1, "disjoint should read near zero")
  }

  test("cmsHeavyHitters is one-sided: estimate >= true count, exact at large w") {
    val tokens = Seq.fill(400)("hot") ++ (1 to 200).map(i => s"cold$i")
    val df = tokens.toDF("t")
    val got = Sketches.cmsHeavyHitters(df, col("t"),
        Seq("hot", "cold1", "missing"), d = 4, w = 1024, phiNum = 1L, phiDenom = 10L)
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    assert(got("hot").getAs[Long]("cms_est") == 400L) // no collision at w=1024
    assert(got("hot").getAs[Int]("heavy") == 1)       // 400 >= 600/10
    assert(got("cold1").getAs[Long]("true_count") == 1L)
    assert(got("cold1").getAs[Int]("heavy") == 0)
    assert(got("missing").getAs[Long]("cms_est") >= 0L)
    assert(got("missing").getAs[Long]("true_count") == 0L)
    got.values.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L, s"one-sided violated: $r")
      assert(r.getAs[Long]("total_n") == 600L)
    }
  }

  test("cmsHeavyHitters overcounts under forced collisions but never undercounts") {
    // w=8 with 50 distinct tokens: every row of the sketch collides, so
    // estimates exceed truth for most probes — the one-sided contract is
    // the thing to hold, exactness is not available at this geometry
    val tokens = (1 to 50).flatMap(i => Seq.fill(i)(s"tok$i"))
    val df = tokens.toDF("t")
    val rows = Sketches.cmsHeavyHitters(df, col("t"),
      (1 to 50).map(i => s"tok$i"), d = 2, w = 8).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CMS undercounted ${r.getAs[String]("token")}")
    }
    assert(rows.map(_.getAs[Long]("overcount")).sum > 0L,
      "w=8 with 50 tokens must produce at least one collision overcount")
  }

  test("bottomKQuantiles: exact below k, matches the brute-force md5 sample above") {
    val df = (1L to 500L).map(i => (if (i <= 100) "small" else "big", i, i * 3))
      .toDF("g", "id", "v")
    // k larger than the group: the sample IS the group, quantiles exact
    val exact = Sketches.bottomKQuantiles(df.filter(col("g") === "small"),
      "g", "v", "id", k = 1000).head()
    assert(exact.getAs[Int]("n_sample") == 100 && exact.getAs[Long]("n_rows") == 100L)
    // values 3..300 step 3: p50 = lower stat at idx (99*50)/100 = 49 → 150
    assert(exact.getAs[Long]("p50") == 150L)
    assert(exact.getAs[Long]("p99") == (((99 * 99) / 100) + 1) * 3L)
    // k smaller: the sample must be EXACTLY the k md5-smallest ids
    val got = Sketches.bottomKQuantiles(df.filter(col("g") === "big"),
      "g", "v", "id", k = 32).head()
    val sampleVals = (101L to 500L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .take(32).map(_ * 3).sorted
    assert(got.getAs[Int]("n_sample") == 32 && got.getAs[Long]("n_rows") == 400L)
    assert(got.getAs[Long]("p50") == sampleVals((31 * 50) / 100))
    assert(got.getAs[Long]("p90") == sampleVals((31 * 90) / 100))
    // partition-order invariance: min-k is a semilattice, so the merged
    // partials give the identical sample regardless of layout
    val re = Sketches.bottomKQuantiles(df.filter(col("g") === "big").repartition(17),
      "g", "v", "id", k = 32).head()
    assert(re.getAs[Long]("p50") == got.getAs[Long]("p50") &&
      re.getAs[Long]("p90") == got.getAs[Long]("p90") &&
      re.getAs[Long]("p99") == got.getAs[Long]("p99"))
  }
}
