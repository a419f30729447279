package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PowerIterationSpec extends SparkSpec {
  import spark.implicits._

  test("powerIterationTop recovers a planted dominant direction") {
    // corpus = scalar multiples of one unit-ish direction u plus a tiny
    // orthogonal perturbation: the dominant Gram eigenvector IS u
    val dim = 8
    val u = Array(0.6f, 0.48f, 0.36f, 0.3f, 0.24f, 0.18f, 0.12f, 0.3f)
    val un = math.sqrt(u.map(x => x.toDouble * x).sum)
    val docs = (1 to 200).map { i =>
      val c = 0.5 + (i % 7) * 0.2
      val v = u.map(x => (x * c).toFloat)
      v(1 + i % (dim - 1)) = (v(1 + i % (dim - 1)) + 0.01f * (i % 3 - 1)).toFloat
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.powerIterationTop(docs, "embedding")
      .orderBy("dim").collect()
    assert(rows.length == dim)
    val v2 = rows.map(_.getAs[Double]("v2"))
    // v2 should align with u/|u| (seed e0 has positive overlap with u,
    // so no sign flip); cosine(v2, u-hat) > 0.999
    val uh = u.map(_ / un)
    val cos = v2.zip(uh).map { case (a, b) => a * b }.sum /
      math.sqrt(v2.map(x => x * x).sum)
    assert(cos > 0.999, s"v2 misaligned: cos=$cos v2=${v2.mkString(",")}")
    // mass_frac: rank-one-dominated corpus concentrates most Gram mass
    assert(rows.head.getAs[Double]("mass_frac") > 0.9)
    // lambda is constant across rows and positive
    assert(rows.map(_.getAs[Double]("lambda")).distinct.length == 1)
    assert(rows.head.getAs[Double]("lambda") > 0.0)
  }

  test("powerIterationTop is partition-order independent (exact decimal sums)") {
    val docs = (1 to 120).map { i =>
      (i.toLong, (0 until 8).map(d => ((i * 31 + d * 7) % 13 - 6) / 7.0f))
    }.toDF("vec_id", "embedding")
    val a = Similarity.powerIterationTop(docs.repartition(1), "embedding")
      .orderBy("dim").collect()
    val b = Similarity.powerIterationTop(docs.repartition(17), "embedding")
      .orderBy("dim").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("a corpus orthogonal to the seed yields the zero iterate, not NaN") {
    // every x0 = 0: w = A·e0 = 0 — the guard must emit v1 = 0 and null
    // v2/lambda stays defined (0) rather than NaN/crash
    val docs = (1 to 50).map { i =>
      (i.toLong, Seq(0.0f, 1.0f + (i % 3) * 0.1f, 0.5f, 0.0f))
    }.toDF("vec_id", "embedding")
    val rows = Similarity.powerIterationTop(docs, "embedding")
      .orderBy("dim").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("v1") == 0.0)
      assert(r.isNullAt(r.fieldIndex("v2"))) // un2 = 0 → guarded null
      assert(r.getAs[Double]("lambda") == 0.0)
      assert(!r.getAs[Double]("lambda").isNaN)
    }
  }
}
