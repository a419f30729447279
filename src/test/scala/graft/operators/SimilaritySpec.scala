package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("pq kernels reject NULL vector elements instead of reading them as 0.0") {
    val df = spark.range(1).select(
      expr("array(cast(1.0 as float), cast(null as float), cast(0.5 as float), cast(0.5 as float))")
        .as("v"))
    val enc = intercept[Exception] {
      df.select(graft.functions.PqEncode(col("v"), dim = 4, m = 2, k = 4)).collect()
    }
    assert(exceptionChain(enc).exists(t => Option(t.getMessage).exists(_.contains("NULL element"))))
    val adc = intercept[Exception] {
      df.select(graft.functions.PqEncode.adcColumn(col("v"), lit(3L), dim = 4, m = 2, k = 4)).collect()
    }
    assert(exceptionChain(adc).exists(t => Option(t.getMessage).exists(_.contains("NULL element"))))
  }

  private def exceptionChain(t: Throwable): List[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toList

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(1.0f, 0.0f), Array(-1.0f, 0.0f)))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("a"), col("c")).as("ac"),
      Similarity.cosine(col("a"), col("d")).as("ad")).head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == -1.0)
  }

  test("bruteForceTopK ranks nearest first, excludes self") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L) || got == Seq(1L, 3L)) // 1 is closest; 2/3 tie at 0
  }

  test("rangeSearch returns exactly the neighbors above the threshold, no self") {
    val got = Similarity.rangeSearch(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding",
      minSim = 0.5)
      .select("vec_id", "sim").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim")).toMap
    assert(!got.contains(0L), "self must be excluded")
    assert(got.keySet.nonEmpty)
    assert(got.values.forall(_ >= 0.5))
    // consistency with top-k: every range hit appears in a wide-enough top-k
    val topAll = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", 100)
      .select("vec_id", "sim").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim")).toMap
    assert(got == topAll.filter(_._2 >= 0.5))
  }

  test("hardNegatives skips same-label vectors however similar") {
    // vec 1 is nearly identical to probe 0 but shares its label: the top
    // negative must be the best DIFFERENT-label vector (2 or 3, tied at 0)
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 7),
      (1L, Array(0.9f, 0.1f, 0.0f), 7),
      (2L, Array(0.0f, 1.0f, 0.0f), 8),
      (3L, Array(0.0f, 0.0f, 1.0f), 9),
      (4L, Array(-1.0f, 0.0f, 0.0f), 8)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(labeled, labeled.filter($"vec_id" === 0),
        "vec_id", "embedding", "label", 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(!got.contains(1L))
    assert(got == Seq(2L, 3L, 4L)) // ties broken by id; -1-direction last
  }

  test("lshTopK hot-bucket valve: a planted degenerate bucket is gated and reported") {
    // all-zero vectors sign identically into one bucket — ungated, a probe
    // landing there would see every one of them as a candidate
    val degenerate = (100L to 140L).map(i => (i, Array(0.0f, 0.0f, 0.0f)))
    val planted = (vecs.as[(Long, Array[Float])].collect().toSeq ++ degenerate)
      .toDF("vec_id", "embedding")
    val probes = planted.filter($"vec_id" === 100L) // probes INTO the hot bucket
    val gated = Similarity.lshTopK(planted, probes, "vec_id", "embedding",
      dim = 3, nPlanes = 4, k = 5, maxBucket = Some(20)).collect()
    // every degenerate candidate lived in the dropped bucket: the probe
    // keeps only whatever non-degenerate vectors share its bucket
    assert(!gated.exists(r => r.getAs[Long]("vec_id") >= 100L),
      "gated bucket members must not surface as candidates")
    val dropped = Similarity.lshDroppedBuckets(planted, "embedding",
      dim = 3, nPlanes = 4, maxBucket = 20).collect()
    // ≥ the 41 planted zeros (base vectors whose signs all come out
    // non-positive share the same code)
    assert(dropped.length == 1 && dropped.head.getAs[Long]("n_dropped") >= 41L,
      "the dropped-mass report must name the hot bucket and its size")
    // ungated (maxBucket = None) recovers the exact contract
    val exact = Similarity.lshTopK(planted, probes, "vec_id", "embedding",
      dim = 3, nPlanes = 4, k = 5, maxBucket = None).collect()
    assert(exact.nonEmpty && exact.exists(r => r.getAs[Long]("vec_id") >= 100L))
  }

  test("labelCentroidScores: singleton label scores 1.0 against itself") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), 1), // label 1: centroid = (0.5, 0.5)
      (1L, Array(0.0f, 1.0f), 1),
      (2L, Array(0.0f, 1.0f), 2)  // label 2: singleton — its own centroid
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroidScores(labeled, "vec_id", "embedding", "label")
      .select("vec_id", "centroid_sim").as[(Long, Double)].collect().toMap
    assert(got(2L) == 1.0)
    // both label-1 members sit at 45° from the (0.5, 0.5) centroid
    assert(math.abs(got(0L) - 0.707107) < 1e-6)
    assert(got(0L) == got(1L))
  }

  test("assignToCentroids picks the highest-cosine centroid, ties to lowest id") {
    val centroids = vecs.filter($"vec_id".isin(0L, 2L, 3L))
    val got = Similarity.assignToCentroids(vecs, centroids, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    assert(got(1L) == 0L) // (0.9, 0.1, 0) nearest to x-axis centroid
    assert(got(2L) == 2L) // itself
    assert(got(4L) == 2L) // -x: cos 0 vs centroids 2/3, -1 vs 0 → tie 2 vs 3 → lowest id
    assert(got.size == 5)
  }

  test("ivfTopK with all centroids probed equals brute force") {
    val centroids = vecs.filter($"vec_id".isin(0L, 2L))
    val ivf = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0), centroids,
      "vec_id", "embedding", k = 2, nProbe = 2)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"))).sorted
    val bf = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"))).sorted
    assert(ivf.toSeq == bf.toSeq) // nProbe = all lists → exact
  }

  test("ivfPqTopK: all lists probed equals full-scan ADC; pruning respects posting lists") {
    // 64-dim lattice vectors (PQ kernels are fixed at dim 64 here)
    val data = (0L to 9L).map(i =>
      (i, Array.tabulate(64)(d => (((i + 1) * (d + 3)) % 7 - 3) / 2.0f)))
    val df = data.toDF("vec_id", "embedding")
    val centroids = df.filter($"vec_id".isin(0L, 5L))
    val probes = df.filter($"vec_id" < 2)
    def rows(res: org.apache.spark.sql.DataFrame) = res.collect().map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("adist"))).toSet
    // nProbe = all lists → identical to the full ADC scan (same distance,
    // same tie-break)
    assert(rows(Similarity.ivfPqTopK(df, probes, centroids, "vec_id", "embedding",
        k = 4, nProbe = 2)) ==
      rows(Similarity.pqAdcTopK(df, probes, "vec_id", "embedding", 4)))
    // nProbe = 1: every returned neighbor lives in the probe's single
    // nearest posting list
    val assigned = Similarity.assignToCentroids(df, centroids, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    val pruned = Similarity.ivfPqTopK(df, probes, centroids, "vec_id", "embedding",
      k = 10, nProbe = 1).collect()
    pruned.groupBy(_.getAs[Long]("probe_id")).foreach { case (pid, rs) =>
      val lists = rs.map(r => assigned(r.getAs[Long]("vec_id"))).toSet
      assert(lists.size == 1, s"probe $pid escaped its single probed list: $lists")
    }
  }

  test("kmeansStep emits exact per-(centroid, dim) sums and counts") {
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)),   // centroid seed A
      (1L, Array(0.9f, 0.1f)),   // → A
      (2L, Array(0.0f, 1.0f)),   // centroid seed B
      (3L, Array(0.1f, 0.9f))    // → B
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansStep(pts, pts.filter($"vec_id".isin(0L, 2L)), "vec_id", "embedding")
      .collect().map(r => (r.getAs[Long]("centroid_id"), r.getAs[Int]("dim")) ->
        ((r.getAs[Double]("comp_sum"), r.getAs[Long]("n")))).toMap
    assert(got((0L, 0)) == ((1.9, 2L)) && got((0L, 1)) == ((0.1, 2L)))
    assert(got((2L, 0)) == ((0.1, 2L)) && got((2L, 1)) == ((1.9, 2L)))
  }

  test("pqEncode matches a scalar reference argmin and packs nibbles") {
    val vec = Array.tabulate(64)(i => ((i % 5) - 2) / 2.0f)
    val df = Seq((7L, vec)).toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(df, "vec_id", "embedding").head()
    // scalar mirror: same codebook lattice, same left-to-right fold
    var expected = 0L
    for (m <- 0 until 8) {
      var best = 0; var bestD = Double.MaxValue
      for (j <- 0 until 16) {
        var dist = 0.0
        for (t <- 0 until 8) {
          val d = vec(m * 8 + t).toDouble - Similarity.pqCodeWeight(m, j, t)
          dist += d * d
        }
        if (dist < bestD) { bestD = dist; best = j }
      }
      expected += best.toLong * math.pow(16, m).toLong
    }
    assert(got.getAs[Long]("pq_code") == expected)
    assert(got.getAs[Long]("pq_code") >= 0L && got.getAs[Long]("pq_code") < (1L << 32))
  }

  test("pqAdcTopK ranks by the exact scalar ADC against packed codes") {
    val vs = (0L until 6L).map(i =>
      (i, Array.tabulate(64)(t => ((t * (i + 1)) % 7 - 3) / 2.0f))).toDF("vec_id", "embedding")
    val got = Similarity.pqAdcTopK(vs, vs.filter($"vec_id" === 0L), "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank"), r.getAs[Double]("adist")))
    val codes = Similarity.pqEncode(vs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probe = Array.tabulate(64)(t => ((t % 7) - 3) / 2.0f) // i = 0
    def adc(code: Long): Double = {
      var total = 0.0; var rest = code
      for (m <- 0 until 8) {
        val j = (rest % 16).toInt; rest /= 16
        var inner = 0.0
        for (t <- 0 until 8) {
          val d = probe(m * 8 + t).toDouble - Similarity.pqCodeWeight(m, j, t)
          inner += d * d
        }
        total += inner
      }
      total
    }
    assert(got.length == 5)
    got.foreach { case (id, _, adist) => assert(adist == adc(codes(id)), s"adist of $id") }
    val expectOrder = (1L until 6L).sortBy(id => (adc(codes(id)), id))
    assert(got.sortBy(_._2).map(_._1).toSeq == expectOrder)
  }

  test("lshTopK finds the same nearest neighbor as brute force here") {
    val bf = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 1)
      .select("vec_id").as[Long].head()
    val ann = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding",
      dim = 3, nPlanes = 1, k = 1)
      .select("vec_id").as[Long].collect()
    assert(ann.isEmpty || ann.head == bf) // bucket may exclude; if found, must agree
    assert(bf == 1L)
  }

  test("annRecall: ivf with all centroids probed scores 1.0; partial overlap counts") {
    val exact = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", 3)
    val full = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0),
      vecs.filter($"vec_id" < 2), "vec_id", "embedding", k = 3, nProbe = 2)
    val r = Similarity.annRecall(exact, full, "vec_id").collect().head
    assert(r.getAs[Long]("n_exact") == 3L && r.getAs[Double]("recall") == 1.0)
    // an approx result missing neighbors scores fractionally, never null
    val partial = exact.filter($"rank" === 1)
    val p = Similarity.annRecall(exact, partial, "vec_id").collect().head
    assert(p.getAs[Long]("n_hit") == 1L && p.getAs[Double]("recall") == 0.333333)
  }

  test("dimensionMoments: exact mean and population variance per dim") {
    val rows = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dimensionMoments(rows, "embedding")
      .collect().map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("mean"), r.getAs[Double]("variance")))).toMap
    assert(got(0) == ((2L, 2.0, 1.0))) // (1,3): mean 2, var ((1+9)/2 - 4) = 1
    assert(got(1) == ((2L, 3.0, 1.0))) // (2,4): mean 3, var ((4+16)/2 - 9) = 1
  }

  test("int8Quantize: codes, checksum, and mse on hand-computed vectors") {
    val rows = Seq(
      (1L, Array(1.0f, -0.4f, 0.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))  // zero vector: no div-by-zero
    ).toDF("vec_id", "embedding")
    val got = Similarity.int8Quantize(rows, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("scale"), r.getAs[Long]("code_sum"),
          r.getAs[Long]("code_min"), r.getAs[Long]("code_max"),
          r.getAs[Double]("mse")))).toMap
    // maxabs 1.0 → scale 1/127; codes replicate the engine's own double ops
    val scale = 1.0 / 127.0
    val xs = Seq(1.0f, -0.4f, 0.0f, 0.25f).map(_.toDouble)
    val codes = xs.map(x => BigDecimal(x / scale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    assert(codes == Seq(127L, -51L, 0L, 32L)) // none near a .5 tie
    val mse = xs.zip(codes).map { case (x, c) => val e = x - c * scale; e * e }.sum / 4.0
    val r9 = (v: Double) => BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((r9(scale), 108L, -51L, 127L, r9(mse))))
    assert(got(2L) == ((0.0, 0L, 0L, 0L, 0.0)))
  }

  test("signPackHalf sets exactly the strictly-positive bits") {
    val rows = Seq((1L, Array(0.5f, -0.5f, 0.0f, 2.0f))).toDF("vec_id", "embedding")
    val lo = rows.select(Similarity.signPackHalf(col("embedding"), 0, 4).as("w"))
      .as[Long].head()
    assert(lo == ((1L << 0) | (1L << 3))) // dims 0 and 3 positive; 0.0 is NOT
    // high half of a longer vector starts its bit numbering at 0
    val rows8 = Seq((1L, Array(0f, 0f, 0f, 0f, 1f, 0f, -1f, 3f))).toDF("vec_id", "embedding")
    val hi = rows8.select(Similarity.signPackHalf(col("embedding"), 4, 4).as("w"))
      .as[Long].head()
    assert(hi == ((1L << 0) | (1L << 3)))
  }

  test("signHammingTopK with rerank covering the corpus equals brute force") {
    val dim4 = Seq(
      (0L, Array(1.0f, 0.2f, -0.3f, 0.1f)),
      (1L, Array(0.9f, 0.1f, -0.2f, 0.2f)),
      (2L, Array(-1.0f, 0.5f, 0.4f, -0.6f)),
      (3L, Array(0.1f, -0.9f, 0.8f, 0.3f)),
      (4L, Array(0.4f, 0.4f, -0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val probes = dim4.filter($"vec_id" === 0)
    val bf = Similarity.bruteForceTopK(dim4, probes, "vec_id", "embedding", 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    val sh = Similarity.signHammingTopK(dim4, probes, "vec_id", "embedding",
      dim = 4, rerank = 4, k = 3)
      .orderBy("rank").collect()
    assert(sh.map(_.getAs[Long]("vec_id")).toSeq == bf,
      "full-coverage rerank must reproduce the exact ranking")
    // vec 1 shares every sign with the probe → hamming 0
    assert(sh.find(_.getAs[Long]("vec_id") == 1L).get.getAs[Int]("hamming") == 0)
    // a tight shortlist keeps only sign-compatible candidates
    val tight = Similarity.signHammingTopK(dim4, probes, "vec_id", "embedding",
      dim = 4, rerank = 1, k = 1).collect()
    assert(tight.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L))
  }

  test("matryoshkaAgreement: identity prefix gives full overlap and zero mse") {
    val dim4 = Seq(
      (0L, Array(1.0f, 0.2f, -0.3f, 0.1f)),
      (1L, Array(0.9f, 0.1f, -0.2f, 0.2f)),
      (2L, Array(-1.0f, 0.5f, 0.4f, -0.6f)),
      (3L, Array(0.1f, -0.9f, 0.8f, 0.3f))
    ).toDF("vec_id", "embedding")
    val probes = dim4.filter($"vec_id" === 0)
    val full = Similarity.matryoshkaAgreement(dim4, probes, "vec_id", "embedding",
      prefixDim = 4, k = 2).collect().head
    assert(full.getAs[Long]("n_pairs") == 3L)
    assert(full.getAs[Long]("n_overlap") == 2L)
    assert(full.getAs[Double]("overlap_at_k") == 1.0)
    assert(full.getAs[Double]("mse") == 0.0)
    // a 1-dim prefix collapses sims to ±1 — overlap can only shrink, mse > 0
    val trunc = Similarity.matryoshkaAgreement(dim4, probes, "vec_id", "embedding",
      prefixDim = 1, k = 2).collect().head
    assert(trunc.getAs[Long]("n_overlap") <= 2L)
    assert(trunc.getAs[Double]("mse") > 0.0)
  }

  test("dimensionPsi: zero on identical corpora, flags exactly the shifted dim") {
    import spark.implicits._
    def corpus(shift: Float) = (0 until 40).map { i =>
      (i.toLong, Array(((i % 8) / 8.0f - 0.5f) + shift, 0.1f))
    }.toDF("vec_id", "embedding")
    // same distribution on both sides → every term is exactly zero
    val same = graft.operators.Similarity
      .dimensionPsi(corpus(0.0f), corpus(0.0f), "embedding", nBuckets = 8)
      .collect().map(r => r.getAs[Int]("dim") -> r.getAs[Double]("psi")).toMap
    assert(same.size == 2 && same.values.forall(_ == 0.0))
    // dim 0 mass shifted by two buckets; dim 1 untouched
    val drifted = graft.operators.Similarity
      .dimensionPsi(corpus(0.0f), corpus(0.5f), "embedding", nBuckets = 8)
      .collect().map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Double]("psi"), r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur")))).toMap
    assert(drifted(0)._1 > 0.25, s"shifted dim must cross the re-fit line: $drifted")
    assert(drifted(1)._1 == 0.0, "untouched dim must stay exactly zero")
    assert(drifted(0)._2 == 40L && drifted(0)._3 == 40L)
    // PSI is symmetric-ish but not equal under swap; both directions flag
    val reverse = graft.operators.Similarity
      .dimensionPsi(corpus(0.5f), corpus(0.0f), "embedding", nBuckets = 8)
      .collect().map(r => r.getAs[Int]("dim") -> r.getAs[Double]("psi")).toMap
    assert(reverse(0) > 0.25)
  }
}
