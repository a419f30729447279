package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of registry queries.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 w4_sessionize d15_dup_spans"
  *
  * No arguments after the dir prints every registered query id.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", Runtime.getRuntime.availableProcessors())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-explain")
      .getOrCreate()
    try {
      val qs = SparkEntry.queries
      if (args.length <= 1) { qs.keys.toSeq.sorted.foreach(println); return }
      args.drop(1).foreach { name =>
        println(s"\n========== $name ==========")
        qs.get(name) match {
          case Some(fn) => fn(spark, dir).explain("formatted")
          case None     => println(s"unknown query: $name")
        }
      }
    } finally spark.stop()
  }
}
