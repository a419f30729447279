package graft
import org.apache.spark.sql.SparkSession
import graft.chain._
import graft.streaming._

object JobDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val cs = js.stageInfos.sortBy(_.stageId).lastOption.map(_.name).getOrElse("?")
        counts.merge(cs, 1, (a, b) => a + b)
      }
    })
    val client = new IngestBench.SyntheticClient
    val store = TableStore(spark, java.nio.file.Files.createTempDirectory("jobdump").toString, bucketSize = 64L)
    store.replace(BalanceIngest.SubsTable,
      Seq((1L, 1L, 1L, Fixtures.alice)).toDF("id", "block_number", "group", "address"))
    val chain = {
      val txsAt = (1L to 4L).map { i =>
        i -> Seq(Fixtures.tx((2*i).toInt, Fixtures.alice, Fixtures.carol, 500, gasPrice = 100L))
      }.toMap
      Fixtures.bundleChain(1, 4, Fixtures.hash32(0), txsAt = txsAt, withTransferLogs = true)
    }
    import scala.jdk.CollectionConverters._
    def bracket(label: String)(f: => Unit): Unit = {
      Thread.sleep(500); counts.clear()
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime()-t0)/1e9
      Thread.sleep(800)
      val total = counts.values.asScala.map(_.toInt).sum
      println(f"[$label] BLOCK_TIME $dt%.2f s, TOTAL_JOBS $total")
      counts.asScala.toSeq.sortBy(-_._2).foreach { case (k, v) => println(f"$v%4d  $k") }
    }
    // warm: blocks 1-2 (block 1 is quiet here — no pending subs yet)
    chain.take(2).foreach(b => FullIngest.processBatch(spark, store, Seq(b).toDS().toDF(), client))
    // make block 3 an ADMISSION event: a pending sub + a pending token
    store.replace(BalanceIngest.SubsTable,
      Seq((1L, 1L, 1L, Fixtures.alice), (2L, 0L, 2L, Fixtures.bob))
        .toDF("id", "block_number", "group", "address"))
    store.replace(BalanceIngest.RegistryTable,
      Seq((Fixtures.tokenX, 0L, 18, "TOK")).toDF("address", "block_number", "decimals", "name"))
    bracket("event")(FullIngest.processBatch(spark, store, Seq(chain(2)).toDS().toDF(), client))
    bracket("quiet")(FullIngest.processBatch(spark, store, Seq(chain(3)).toDS().toDF(), client))
    spark.stop()
  }
}
