package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native cosine kernel vs the declarative aggregate/zip_with chain
  * it replaced — bit-identical doubles pinned on every branch: normal
  * vectors, zero norms, length mismatches, null elements, null arrays,
  * NaN components, float and double element types.
  */
class CosineSimSpec extends SparkSpec {

  import spark.implicits._

  // the declarative original, verbatim
  private def refCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def norm2(x: org.apache.spark.sql.Column) =
      aggregate(transform(x, p => p.cast("double") * p.cast("double")), lit(0.0), (acc, v) => acc + v)
    val d  = dot(a, b)
    val nn = sqrt(norm2(a)) * sqrt(norm2(b))
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  test("native cosine matches the declarative fold bit for bit") {
    val rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])] = Seq(
      (Seq(1f, 2f, 3f).map(java.lang.Float.valueOf), Seq(4f, 5f, 6f).map(java.lang.Float.valueOf)),
      (Seq(0f, 0f).map(java.lang.Float.valueOf), Seq(1f, 2f).map(java.lang.Float.valueOf)),   // zero norm → 0.0
      (Seq(0f, 0f).map(java.lang.Float.valueOf), Seq(0f).map(java.lang.Float.valueOf)),       // zero norms, ragged → 0.0
      (Seq(1f, 2f).map(java.lang.Float.valueOf), Seq(1f, 2f, 3f).map(java.lang.Float.valueOf)), // ragged → NULL
      (Seq[java.lang.Float](1f, null, 3f), Seq(1f, 2f, 3f).map(java.lang.Float.valueOf)),     // null element → NULL
      (Seq(Float.NaN, 1f).map(java.lang.Float.valueOf), Seq(1f, 1f).map(java.lang.Float.valueOf)), // NaN flows
      (Seq(-0.37f, 0.82f, 123.456f, -9.5f).map(java.lang.Float.valueOf),
        Seq(0.11f, -0.92f, 4.2f, 8.1f).map(java.lang.Float.valueOf)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.CosineSim(col("a"), col("b")).as("n"),
      refCosine(col("a"), col("b")).as("r")).collect()
    got.foreach { r =>
      val (n, ref) = (if (r.isNullAt(0)) null else r.getDouble(0),
                      if (r.isNullAt(1)) null else r.getDouble(1))
      (n, ref) match {
        case (null, null) => ()
        case (x: java.lang.Double, y: java.lang.Double) =>
          assert(x.isNaN == y.isNaN && (x.isNaN ||
            java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)),
            s"native $x vs declarative $y")
        case other => fail(s"null mismatch: $other")
      }
    }
    // null array → NULL both ways
    val nr = Seq((null: Seq[java.lang.Float], Seq(1f).map(java.lang.Float.valueOf))).toDF("a", "b")
      .select(graft.functions.CosineSim(col("a"), col("b"))).collect()(0)
    assert(nr.isNullAt(0))
  }

  test("double-element arrays (centroid means) take the getDouble path") {
    val df = Seq((Seq(1.0, 2.0), Seq(2.0, 1.0))).toDF("a", "b")
    val got = df.select(graft.functions.CosineSim(col("a"), col("b")).as("n"),
      refCosine(col("a"), col("b")).as("r")).collect()(0)
    assert(got.getDouble(0) == got.getDouble(1))
  }
}
