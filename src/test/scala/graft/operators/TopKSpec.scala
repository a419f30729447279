package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Direct contract of the shared bounded per-group top-k helper (the
  * similarity tier and the streaming ANN query face both rank through
  * it): rank recovery from the in-row sort, tie behavior through the
  * composed ordering key, k larger than the group, and the plan shape
  * (map-side partial_collect_top_k, no Window).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def scored = Seq(
    // group 1: scores with a tie at 0.9 broken by id (lower id first)
    (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.5), (1L, 13L, 0.7),
    // group 2: fewer rows than k
    (2L, 20L, 0.1)
  ).toDF("probe_id", "id", "sim")

  test("ranks descend by score with ties to the lowest id; short groups emit all rows") {
    val out = TopK.perGroup(scored,
        Seq("probe_id"), struct((-col("sim")).as("s"), col("id").as("i")), 3, "rank")
      .select("probe_id", "rank", "id", "sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      (1L, 1, 10L, 0.9), (1L, 2, 11L, 0.9), (1L, 3, 13L, 0.7),
      (2L, 1, 20L, 0.1)))
  }

  test("k=1 keeps exactly the best row per group") {
    val out = TopK.perGroup(scored,
        Seq("probe_id"), struct((-col("sim")).as("s"), col("id").as("i")), 1, "rank")
      .collect()
    assert(out.length == 2)
  }

  test("plan: bounded aggregate with a map-side partial, no Window") {
    val df = TopK.perGroup(scored,
      Seq("probe_id"), struct((-col("sim")).as("s"), col("id").as("i")), 2, "rank")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_collect_top_k"),
      s"map-side combine missing:\n$plan")
    assert(!plan.contains("Window"), s"must not window:\n$plan")
  }
}
