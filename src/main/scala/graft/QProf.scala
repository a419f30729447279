package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only per-query profiler: wall time vs scheduler-visible work.
  *
  *   sbt "runMain graft.QProf /root/testdata/sf0.1 d12_semdedup d6_dup_components"
  *
  * For each query (bench methodology: codegen-warm at sf0.001 first, then
  * one timed materialization) prints wall seconds, job/stage/task counts,
  * summed executor task time, and summed shuffle bytes — the attribution
  * tool for "is this query slow because of real work or because of plan
  * width / job cascade overhead". No args after the dir = top-cost set.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench's shuffle-writer config so profiles attribute the
      // same execution the bench times (rationale in Bench.scala)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
    sys.env.get("QPROF_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split('='); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskNanos = new AtomicLong
    val shufRead = new AtomicLong; val shufWrite = new AtomicLong
    val gcMs = new AtomicLong
    val stageDetail = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          gcMs.addAndGet(m.jvmGCTime)
          stageDetail.add((s.stageInfo.name.takeWhile(_ != '\n').take(90),
            m.executorRunTime / 1e3, s.stageInfo.numTasks))
        }
        tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    })
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
      taskNanos.set(0); shufRead.set(0); shufWrite.set(0); gcMs.set(0)
      stageDetail.clear() }

    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("r11_release_pipeline", "d12_semdedup", "d20_cluster_quality",
        "d13_containment", "d11_cluster_sizes", "d10_cluster_canonical",
        "d6_dup_components", "d3_simhash", "a16_sketch_overlap", "d2_minhash_lsh")
    val warmDir = "/root/testdata/sf0.001"
    @volatile var lastBuild = 0.0
    def run(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      lastBuild = (System.nanoTime() - t0) / 1e9
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    run(names.head, warmDir) // session warm
    println(f"${"query"}%-26s ${"wall"}%7s ${"build"}%6s ${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s ${"taskT"}%7s ${"gc"}%5s ${"shW"}%8s")
    names.foreach { name =>
      run(name, warmDir) // codegen warm
      Thread.sleep(100)
      reset()
      val wall = run(name, dir)
      Thread.sleep(200) // let listener drain
      println(f"$name%-26s $wall%7.2f ${lastBuild}%6.2f ${jobs.get}%5d ${stages.get}%4d ${tasks.get}%6d ${taskNanos.get / 1e9}%7.2f ${gcMs.get / 1e3}%5.2f ${shufWrite.get / 1024}%7dK")
      if (sys.env.get("QPROF_STAGES").contains("1")) {
        import scala.jdk.CollectionConverters._
        stageDetail.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (n, t, nt) =>
          println(f"    $t%8.2fs ($nt%3d tasks) $n")
        }
      }
    }
    spark.stop()
  }
}
