package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.chain._
import graft.chain.Fixtures._

/** The observability facade: counters/gauges matching the reference's
  * operational metrics (new_block, insert_block latency,
  * new_subscription, changed_account_per_block — indexer.go:63-64,
  * transfer_processor.go:42-43) advance across batches, admissions, and a
  * reorg, and surface as a queryable table.
  */
class IngestMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("counters and gauges advance across a batch, an admission, and a reorg") {
    val store = TableStore(spark, Files.createTempDirectory("graft-metrics").toString, bucketSize = 4L)
    val client = BlockAwareBalanceClient(spark.sparkContext.longAccumulator("metrics"))
    val m = new IngestMetrics

    // alice active from the start; every block carries one of her txs
    store.replace(BalanceIngest.SubsTable,
      Seq((1L, 1L, 1L, alice)).toDF("id", "block_number", "group", "address"))
    val txs = (1L to 4L).map(n => n -> Seq(tx(n.toInt, alice, carol, 500, gasPrice = 100L))).toMap
    val main = bundleChain(1, 4, hash32(0), 1000L, -1, txs, withTransferLogs = true)
    FullIngest.processBatch(spark, store, main.toDS().toDF(), client, metrics = Some(m))

    assert(m.newBlock.get() == 4L)
    assert(m.insertBlock.count == 1L)
    assert(m.insertBlock.sumSeconds > 0.0)
    assert(m.reorg.get() == 0L)
    // quiet span 1..4: alice touched every block → average gauge = 1
    assert(m.changedAccountPerBlock.get() == 1L)

    // bob subscribes → next batch's first block is an event block
    store.replace(BalanceIngest.SubsTable,
      store.readOr(BalanceIngest.SubsTable, null).unionByName(
        Seq((2L, 0L, 2L, bob)).toDF("id", "block_number", "group", "address")))
    val tail = bundleChain(5, 6, main.last.block.hash, 1000L, -1, Map.empty,
      withTransferLogs = true)
    FullIngest.processBatch(spark, store, tail.toDS().toDF(), client, metrics = Some(m))
    assert(m.newBlock.get() == 6L)
    assert(m.insertBlock.count == 2L)
    assert(m.newSubscription.get() == 1L, "bob's admission must gauge")

    // heavier, higher fork from 3 retracts 4..6 and lands the new branch
    // (admission ignores heads at ≤ current height, so the fork overtakes)
    val fork = bundleChain(4, 7, main(2).block.hash, 5000L, 77, Map.empty,
      withTransferLogs = true)
    FullIngest.processBatch(spark, store, fork.toDS().toDF(), client, metrics = Some(m))
    assert(m.reorg.get() == 1L)
    assert(m.retractedBlocks.get() == 3L)
    assert(m.newBlock.get() == 10L, "fork branch blocks count as landed")

    // surfaced as a queryable metrics table and a log line
    val table = m.toDF(spark).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(table("new_block") == 10.0)
    assert(table("reorg") == 1.0)
    assert(table("insert_block_count") == 3.0)
    assert(table.keys.exists(_.startsWith("insert_block_le_")))
    assert(m.logLine.contains("new_block=10"))
  }
}
