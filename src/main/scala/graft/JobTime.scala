package graft
import org.apache.spark.sql.SparkSession
import graft.chain._
import graft.streaming._

/** Like JobDump but attributes TIME per job call-site, plus stage detail. */
object JobTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    case class J(id: Int, site: String, t0: Long, var t1: Long = -1L)
    case class S(id: Int, name: String, var sub: Long = 0, var t0: Long = -1L, var t1: Long = -1L, var job: Int = -1)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, S]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val cs = js.stageInfos.sortBy(_.stageId).lastOption.map(_.name).getOrElse("?")
        jobs.put(js.jobId, J(js.jobId, cs, js.time))
        js.stageInfos.foreach(si => stages.put(si.stageId, S(si.stageId, si.name, job = js.jobId)))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobs.get(je.jobId)).foreach(_.t1 = je.time)
      override def onStageSubmitted(ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        Option(stages.get(ss.stageInfo.stageId)).foreach(_.t0 = System.currentTimeMillis)
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        Option(stages.get(sc.stageInfo.stageId)).foreach(_.t1 = System.currentTimeMillis)
    })
    val client = new IngestBench.SyntheticClient
    val store = TableStore(spark, java.nio.file.Files.createTempDirectory("jobtime").toString, bucketSize = 64L)
    store.replace(BalanceIngest.SubsTable,
      Seq((1L, 1L, 1L, Fixtures.alice)).toDF("id", "block_number", "group", "address"))
    val chain = {
      val txsAt = (1L to 4L).map { i =>
        i -> Seq(Fixtures.tx((2*i).toInt, Fixtures.alice, Fixtures.carol, 500, gasPrice = 100L))
      }.toMap
      Fixtures.bundleChain(1, 4, Fixtures.hash32(0), txsAt = txsAt, withTransferLogs = true)
    }
    import scala.jdk.CollectionConverters._
    chain.take(2).foreach(b => FullIngest.processBatch(spark, store, Seq(b).toDS().toDF(), client))
    // make block 3 an ADMISSION event: a pending sub + a pending token
    store.replace(BalanceIngest.SubsTable,
      Seq((1L, 1L, 1L, Fixtures.alice), (2L, 0L, 2L, Fixtures.bob))
        .toDF("id", "block_number", "group", "address"))
    store.replace(BalanceIngest.RegistryTable,
      Seq((Fixtures.tokenX, 0L, 18, "TOK")).toDF("address", "block_number", "decimals", "name"))
    Thread.sleep(800); jobs.clear(); stages.clear()
    val e0 = System.nanoTime()
    FullIngest.processBatch(spark, store, Seq(chain(2)).toDS().toDF(), client)
    println(f"[event] WALL ${(System.nanoTime()-e0)/1e9}%.2f s, JOBS ${jobs.size}")
    Thread.sleep(800); jobs.clear(); stages.clear()
    // sample the driver thread while the quiet block runs: histogram the
    // deepest graft/catalyst frame to attribute the between-job gaps
    val driver = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = driver.getStackTrace
        val interesting = st.find { e =>
          val c = e.getClassName
          c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
          c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
          c.startsWith("org.apache.spark.sql.execution.datasources") ||
          c.contains("FileIndex") || c.contains("CheckAnalysis")
        }.orElse(st.find(_.getClassName.startsWith("graft")))
        val key = interesting.map(e => e.getClassName.split("\\.").takeRight(2).mkString(".") + "." + e.getMethodName)
          .getOrElse(st.headOption.map(e => e.getClassName.split("\\.").lastOption.getOrElse("?") + "." + e.getMethodName).getOrElse("?"))
        hist.merge(key, 1, (a, b) => a + b)
        Thread.sleep(10)
      }
    }); sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    FullIngest.processBatch(spark, store, Seq(chain(3)).toDS().toDF(), client)
    val wall = (System.nanoTime()-t0)/1e9
    sampling = false
    Thread.sleep(800)
    println("[driver samples, 10ms]")
    hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) =>
      println(f"  $n%4d  $k")
    }
    val js = jobs.values.asScala.toSeq.sortBy(_.t0)
    println(f"[quiet] WALL $wall%.2f s, JOBS ${js.size}")
    val base = js.headOption.map(_.t0).getOrElse(0L)
    js.foreach { j =>
      println(f"job ${j.id}%3d  @${(j.t0-base)/1e3}%5.2f  ${(j.t1-j.t0)/1e3}%6.2f s  ${j.site.take(60)}")
      if (j.t1 - j.t0 > 500) {
        stages.values.asScala.filter(s => s.job == j.id && s.t0 > 0).toSeq.sortBy(_.t0).foreach { s =>
          println(f"    stage ${s.id}%3d ${(s.t1-s.t0)/1e3}%6.2f s  ${s.name.take(55)}")
        }
      }
    }
    spark.stop()
  }
}
