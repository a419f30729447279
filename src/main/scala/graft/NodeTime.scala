package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev-only per-OPERATOR time attribution: run a registry query, then walk
  * the executed (AQE-final) plan and print every node whose time-ish
  * metrics are nonzero, largest first.
  *
  *   sbt "runMain graft.NodeTime /root/testdata/sf0.1 a16_sketch_overlap"
  */
object NodeTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    def walk(p: SparkPlan, depth: Int, out: collection.mutable.ArrayBuffer[(Long, String)]): Unit = {
      val timeMetrics = p.metrics.filter { case (k, _) =>
        k.toLowerCase.contains("time") }.map { case (k, m) => s"$k=${m.value}" }
      val t = p.metrics.collect { case (k, m)
        if k.toLowerCase.contains("time") && !k.toLowerCase.contains("fetch") => m.value }
      val rows = p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      val total = if (t.isEmpty) 0L else t.max
      if (total > 0 || rows >= 0)
        out += ((total, f"${"  " * depth}${p.nodeName}%-38s rows=$rows ${timeMetrics.mkString(" ")}"))
      unwrap(p).foreach(walk(_, depth + 1, out))
    }

    args.drop(1).foreach { name =>
      // codegen warm
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      val df = SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"\n========== $name wall=$wall%.2f ==========")
      val out = collection.mutable.ArrayBuffer.empty[(Long, String)]
      walk(df.queryExecution.executedPlan, 0, out)
      // print tree order but flag the heavy ones
      val heavy = out.sortBy(-_._1).take(8).map(_._2).toSet
      out.foreach { case (t, line) =>
        println((if (heavy(line) && t > 0) "HOT " else "    ") + line)
      }
    }
    spark.stop()
  }
}
