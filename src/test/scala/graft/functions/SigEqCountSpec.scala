package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native signature-agreement kernel vs the declarative
  * aggregate/zip_with chain it replaced in StreamingDedup — identical
  * longs (and identical rounded estimators) pinned on every branch:
  * equal/unequal components, ragged lengths (zip_with null-padding counts
  * 0, result non-null), null elements (count 0), null arrays (NULL),
  * empty arrays.
  */
class SigEqCountSpec extends SparkSpec {

  import spark.implicits._

  // the declarative original, verbatim
  private def refCount(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), _ + _)

  test("native count matches the declarative fold on every branch") {
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq(1L, 2L, 3L).map(java.lang.Long.valueOf), Seq(1L, 9L, 3L).map(java.lang.Long.valueOf)), // 2 equal
      (Seq(1L, 2L).map(java.lang.Long.valueOf), Seq(1L, 2L, 3L).map(java.lang.Long.valueOf)),     // ragged → pads count 0
      (Seq(5L).map(java.lang.Long.valueOf), Seq(6L).map(java.lang.Long.valueOf)),                 // 0 equal
      (Seq[java.lang.Long](1L, null, 3L), Seq(1L, 2L, 3L).map(java.lang.Long.valueOf)),           // null elem → counts 0, total non-null
      (Seq.empty[java.lang.Long], Seq(1L).map(java.lang.Long.valueOf)),                           // empty → 0
      (Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]))                                     // both empty → 0
    val df = rows.toDF("a", "b")
    val got = df.select(
      SigEqCount(col("a"), col("b")).as("n"),
      refCount(col("a"), col("b")).as("r")).collect()
    got.foreach { r =>
      val n = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
      val f = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
      assert(n == f, s"native $n vs declarative $f")
    }
    // null array → NULL both ways
    val nr = Seq((null: Seq[java.lang.Long], Seq(1L).map(java.lang.Long.valueOf)))
      .toDF("a", "b")
      .select(SigEqCount(col("a"), col("b")).as("n"), refCount(col("a"), col("b")).as("r"))
      .collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("the full estimator (round(count/64, 6)) is bit-identical") {
    val sigA = (0 until 64).map(i => java.lang.Long.valueOf(i.toLong))
    val sigB = (0 until 64).map(i => java.lang.Long.valueOf(if (i % 3 == 0) i.toLong else -i.toLong))
    val df = Seq((sigA, sigB)).toDF("a", "b")
    val r = df.select(
      round(SigEqCount(col("a"), col("b")).cast("double") / 64, 6).as("n"),
      round(refCount(col("a"), col("b")).cast("double") / 64, 6).as("r")).collect()(0)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }
}
