package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused count-gated set collection vs the shape it replaced
  * (count → [min,max] filter → semi-join → sort_array(collect_set)):
  * identical buckets on long and struct payloads, across partition merges
  * (partial buffers serialize through the shuffle), with the poison path
  * (over-max buckets → NULL) and the min gate (singletons → NULL) pinned.
  */
class BoundedSetAggSpec extends SparkSpec {

  import spark.implicits._

  private def refGated(rows: org.apache.spark.sql.DataFrame, max: Int) = {
    val eligible = rows.groupBy("k").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1 && col("__cnt") <= max)
      .select("k")
    rows.join(eligible, Seq("k"), "left_semi")
      .groupBy("k")
      .agg(sort_array(collect_set(col("v"))).as("ids"))
  }

  test("long payloads: fused gate equals count-gate + collect_set, across partitions") {
    // bucket sizes 1 (dropped by min), 2, 3, 6 (dropped by max=5)
    val rows = (Seq(("a", 1L)) ++
      Seq(("b", 10L), ("b", 7L)) ++
      Seq(("c", 3L), ("c", 1L), ("c", 2L)) ++
      (1L to 6L).map(v => ("hot", v)))
    val df = rows.toDF("k", "v").repartition(8) // force partial buffers to merge
    val got = df.groupBy("k")
      .agg(BoundedSortedSetAgg(col("v"), 2, 5).as("ids"))
      .filter(col("ids").isNotNull)
      .orderBy("k").collect()
    val want = refGated(df, 5).orderBy("k").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    assert(got.map(_.getString(0)).toSeq == Seq("b", "c")) // 'a' under min, 'hot' poisoned
    assert(got(0).getSeq[Long](1) == Seq(7L, 10L))
    assert(got(1).getSeq[Long](1) == Seq(1L, 2L, 3L))
  }

  test("struct payloads (the hamming64/cosine bucket shape) sort and dedupe identically") {
    val rows = Seq(
      ("x", (1L, 11L)), ("x", (2L, 22L)),
      ("y", (9L, 9L)),
      ("z", (3L, 3L)), ("z", (1L, 1L)), ("z", (2L, 2L)))
    val df = rows.toDF("k", "p").repartition(5)
      .select(col("k"), struct(col("p._1").as("id"), col("p._2").as("h")).as("v"))
    val got = df.groupBy("k")
      .agg(BoundedSortedSetAgg(col("v"), 2, 100).as("ids"))
      .filter(col("ids").isNotNull).orderBy("k").collect()
    val want = refGated(df, 100).orderBy("k").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("max = Int.MaxValue keeps the exact (uncapped) contract") {
    val df = (1L to 100L).map(v => ("k", v)).toDF("k", "v").repartition(7)
    val got = df.groupBy("k")
      .agg(BoundedSortedSetAgg(col("v"), 2, Int.MaxValue).as("ids")).collect()(0)
    assert(got.getSeq[Long](1) == (1L to 100L))
  }

  test("nulls are skipped like collect_set") {
    val df = Seq(("k", java.lang.Long.valueOf(1L)), ("k", null: java.lang.Long),
      ("k", java.lang.Long.valueOf(2L))).toDF("k", "v")
    val got = df.groupBy("k").agg(BoundedSortedSetAgg(col("v"), 2, 10).as("ids")).collect()(0)
    assert(got.getSeq[Long](1) == Seq(1L, 2L))
  }
}
