package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the curation/quantization operators over seeded
  * pseudo-random corpora: budget conservation, group-consistency of splits,
  * and the argmin optimality of PQ encoding — properties that must hold on
  * ANY input, not just the oracle fixtures.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("temperatureMixture: weights sum to ~1, allocations never exceed the budget") {
    val rows = lcg(7).take(12).zipWithIndex
      .map { case (x, i) => (s"s$i", math.abs(x) % 100000L + 1L) }.toSeq
    val df = rows.toDF("src", "n")
    Seq(0.3, 0.5, 1.0).foreach { alpha =>
      val got = Curation.temperatureMixture(df, "src", col("n"), alpha, 1000000L)
        .collect().map(r => (r.getAs[Double]("weight"), r.getAs[Long]("alloc_tokens")))
      val wsum = got.map(_._1).sum
      assert(math.abs(wsum - 1.0) < 1e-4, s"alpha=$alpha weights sum $wsum")
      assert(got.map(_._2).sum <= 1000000L, s"alpha=$alpha over-allocated")
      assert(got.forall(_._2 >= 0L))
    }
    // alpha = 1 is proportional: biggest stratum gets the biggest slice
    val p = Curation.temperatureMixture(df, "src", col("n"), 1.0, 1000000L)
      .collect().map(r => r.getAs[Long]("n_tokens") -> r.getAs[Long]("alloc_tokens"))
    assert(p.maxBy(_._1)._2 == p.map(_._2).max)
  }

  test("leakageSafeSplit: identical texts NEVER straddle splits, for any permilles") {
    val texts = (0 until 40).map(i => s"text body number ${i % 10}") // 10 dup groups of 4
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Seq((500, 250), (900, 50), (334, 333)).foreach { case (tr, va) =>
      val bySplit = Curation.leakageSafeSplit(df, "doc_id", "text", tr, va)
        .collect().map(r => (r.getAs[Long]("doc_id") % 10, r.getAs[String]("split")))
        .groupBy(_._1).values
      assert(bySplit.forall(_.map(_._2).distinct.length == 1),
        s"dup group straddles splits at ($tr, $va)")
    }
  }

  test("pqEncode is the per-subspace argmin: own code beats any other code under ADC") {
    val vecs = lcg(13).take(20).zipWithIndex.map { case (s, i) =>
      val inner = lcg(s | 1).take(64).toSeq
      (i.toLong, inner.map(x => ((math.abs(x) % 2000) - 1000) / 500.0f).toArray)
    }.toSeq
    val df = vecs.toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def adc(vec: Array[Float], code: Long): Double = {
      var total = 0.0; var rest = code
      for (m <- 0 until 8) {
        val j = (rest % 16).toInt; rest /= 16
        var inner = 0.0
        for (t <- 0 until 8) {
          val d = vec(m * 8 + t).toDouble - Similarity.pqCodeWeight(m, j, t)
          inner += d * d
        }
        total += inner
      }
      total
    }
    val rng = lcg(99).map(x => math.abs(x) % (1L << 32))
    vecs.foreach { case (id, vec) =>
      val own = adc(vec, codes(id))
      rng.take(25).foreach { other =>
        assert(own <= adc(vec, other) + 1e-12, s"vec $id: own code not optimal vs $other")
      }
    }
  }
}
