package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  // (address, block_number, balance) — balance snapshot shape from the
  // reference's accounts table
  private lazy val balances = Seq(
    ("a", 1L, 100L), ("a", 5L, 150L), ("a", 9L, 120L),
    ("b", 2L, 10L), ("b", 8L, 30L)
  ).toDF("address", "block_number", "balance")

  test("latestPerKey picks the highest-ordered row per key (J1/W1)") {
    val got = Relational.latestPerKey(balances, Seq("address"), Seq(col("block_number")))
      .select("address", "block_number", "balance")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 9L, 120L), ("b", 8L, 30L)))
  }

  test("asOfJoin returns latest build value at-or-before probe time (J5)") {
    val probes = Seq(("a", 5L, 1L), ("a", 4L, 2L), ("b", 1L, 3L))
      .toDF("address", "block_number", "probe_id")
    val build = balances.withColumn("bal", col("balance")).drop("balance")
    val got = Relational.asOfJoin(probes, build, "address", Seq("block_number"), Seq("bal"))
      .select("probe_id", "bal")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // probe 1: block 5 → inclusive match 150; probe 2: block 4 → block 1's 100;
    // probe 3: block 1 for b → nothing at-or-before → null
    assert(got == Set((1L, 150L), (2L, 100L), (3L, -1L)))
  }

  test("cumSum produces running totals per key (A6/W2)") {
    val got = Relational.cumSum(balances, Seq("address"), Seq(col("block_number")),
      col("balance"), "running")
      .filter(col("address") === "a").orderBy("block_number")
      .select("running").as[Long].collect().toSeq
    assert(got == Seq(100L, 250L, 370L))
  }

  test("carryForward fills last non-null with default (W3)") {
    val df = Seq(("a", 1L, Some(10L)), ("a", 2L, None), ("a", 3L, Some(20L)), ("a", 4L, None))
      .toDF("k", "t", "v")
    val got = Relational.carryForward(df, Seq("k"), Seq(col("t")), col("v"), lit(0L), "cf")
      .orderBy("t").select("cf").as[Long].collect().toSeq
    assert(got == Seq(10L, 10L, 20L, 20L))
  }

  test("paginate returns deterministic stable pages (O3)") {
    val df = (1 to 10).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    val page2 = Relational.paginate(df, Seq(col("id")), page = 2, pageSize = 3)
      .select("id").as[Long].collect().toSeq
    assert(page2 == Seq(4L, 5L, 6L))
  }

  test("semiJoinAny keeps rows matching ANY key, preserving multiset (J2)") {
    val left = Seq((1L, 10L, 20L), (2L, 11L, 21L), (3L, 10L, 21L), (3L, 10L, 21L))
      .toDF("id", "from_k", "to_k")
    val watched = Seq(20L, 11L).toDF("w")
    val got = Relational.semiJoinAny(left, watched, Seq("from_k", "to_k"), "w")
      .select("id").as[Long].collect().toSeq.sorted
    // id=1 via to_k=20, id=2 via from_k=11; both id=3 copies match nothing
    assert(got == Seq(1L, 2L))
  }
}
