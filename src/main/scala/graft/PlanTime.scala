package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.chain._
import graft.streaming._

object PlanTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val client = new IngestBench.SyntheticClient
    val store = TableStore(spark, java.nio.file.Files.createTempDirectory("plantime").toString, bucketSize = 64L)
    store.replace(BalanceIngest.SubsTable,
      Seq((1L, 1L, 1L, Fixtures.alice)).toDF("id", "block_number", "group", "address"))
    val chain = {
      val txsAt = (1L to 4L).map { i =>
        i -> Seq(Fixtures.tx((2*i).toInt, Fixtures.alice, Fixtures.carol, 500, gasPrice = 100L))
      }.toMap
      Fixtures.bundleChain(1, 4, Fixtures.hash32(0), txsAt = txsAt, withTransferLogs = true)
    }
    chain.take(3).foreach(b => FullIngest.processBatch(spark, store, Seq(b).toDS().toDF(), client))
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; f; println(f"$name: ${(System.nanoTime-t0)/1e6}%.0f ms")
    }
    for (i <- 1 to 2) {
      time(s"readRange transfers $i") {
        store.readRange(ChainIngest.TransfersTable, "block_number", 4, 4, null).queryExecution.analyzed
      }
      time(s"readOr subs $i") { store.readOr(BalanceIngest.SubsTable, null).queryExecution.analyzed }
      time(s"loadState $i") {
        val s = BalanceIngest.loadState(spark, store)
        s.latestAccounts.queryExecution.analyzed; s.latestTotals.queryExecution.analyzed
      }
    }
    // a representative deep chain: 12 chained ops on tiny tables
    time("deep chain analysis") {
      val t = store.readRange(ChainIngest.TransfersTable, "block_number", 4, 4, null)
      val x = store.readRange(ChainIngest.TxTable, "block_number", 4, 4, null)
      val subs = store.readOr(BalanceIngest.SubsTable, null)
      val a = subs.filter(col("block_number") > 0L).select("address").distinct()
      val c = t.select(col("block_number"), col("from").as("address"))
        .unionByName(t.select(col("block_number"), col("to").as("address")))
        .unionByName(x.select(col("block_number"), col("from").as("address")))
        .dropDuplicates("block_number", "address")
        .join(a, Seq("address"), "left_semi")
        .join(t.select(col("block_number"), col("token")), Seq("block_number"))
        .groupBy("token").count()
      c.queryExecution.analyzed
    }
    time("optimize+physical of that chain") {
      val t = store.readRange(ChainIngest.TransfersTable, "block_number", 4, 4, null)
      val subs = store.readOr(BalanceIngest.SubsTable, null)
      val a = subs.filter(col("block_number") > 0L).select("address").distinct()
      val c = t.select(col("block_number"), col("from").as("address"))
        .join(a, Seq("address"), "left_semi").groupBy("address").count()
      c.queryExecution.executedPlan
    }
    spark.stop()
  }
}
