package graft.chain

import graft.SparkSpec
import graft.chain.Fixtures._
import java.nio.file.{Files, Path}
import java.util.Comparator

/** The read-through cache facade (the reference's ARC middlewares,
  * store/block_header/cache.go:36-138): hits must serve without touching
  * storage, retraction must invalidate, and the entry count stays bounded.
  *
  * "Without touching storage" is proven the strong way: the backing
  * parquet files are DELETED between the first and second lookup — a hit
  * that still resolves can only have come from the cache, and an
  * invalidated key that then FAILS provably went back to the (gone) files.
  */
class CachedChainStoreSpec extends SparkSpec {
  import spark.implicits._

  private def bd(s: String) = new java.math.BigDecimal(s)

  /** Fresh parquet-backed store per test so deletions don't interact. */
  private def mkStore(): (ChainStore, Path) = {
    val dir = Files.createTempDirectory("graft-cache")
    Seq((1L, hash32(1), hash32(0), 100L), (2L, hash32(2), hash32(1), 200L),
      (3L, hash32(3), hash32(2), 300L))
      .toDF("number", "hash", "parent_hash", "difficulty")
      .write.mode("overwrite").parquet(s"$dir/headers")
    Seq((1L, hash32(1), bd("100")), (2L, hash32(2), bd("300")))
      .toDF("block", "hash", "td")
      .write.mode("overwrite").parquet(s"$dir/td")
    val empty = spark.emptyDataFrame
    val store = ChainStore(
      headers = spark.read.parquet(s"$dir/headers"),
      transactions = empty, receipts = empty, receiptLogs = empty,
      totalDifficulty = spark.read.parquet(s"$dir/td"),
      transfers = empty, accounts = empty, subscriptions = empty,
      reorgs = empty, tokens = empty)
    (store, dir)
  }

  private def rmrf(dir: Path): Unit =
    Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))

  test("a hit serves from memory — storage can vanish and the answer stands") {
    val (store, dir) = mkStore()
    val c = new CachedChainStore(store)
    assert(c.findBlockByHash(hash32(2)).head().getAs[Long]("number") == 2L)
    assert(c.findBlockByNumber(3L).head().getAs[Array[Byte]]("hash").toSeq == hash32(3).toSeq)
    assert(c.findTd(hash32(2)).head().getAs[java.math.BigDecimal]("td")
      .compareTo(bd("300")) == 0)
    assert(c.size == 3)
    rmrf(dir) // no storage left — only the cache can answer now
    assert(c.findBlockByHash(hash32(2)).head().getAs[Long]("number") == 2L)
    assert(c.findBlockByNumber(3L).head().getAs[Array[Byte]]("hash").toSeq == hash32(3).toSeq)
    assert(c.findTd(hash32(2)).head().getAs[java.math.BigDecimal]("td")
      .compareTo(bd("300")) == 0)
    // and the served plan is a local relation, not a file scan
    val plan = c.findTd(hash32(2)).queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), plan)
  }

  test("retraction invalidates exactly the touched interval plus negative entries") {
    val (store, dir) = mkStore()
    val c = new CachedChainStore(store)
    c.findBlockByHash(hash32(1)) // block 1 — outside the retraction below
    c.findBlockByHash(hash32(2)) // block 2 — retracted
    c.findBlockByHash(hash32(99)) // miss → negative entry
    assert(c.size == 3)
    c.invalidateRange(2L, 3L)
    assert(c.size == 1) // block-2 entry and the negative entry are gone
    rmrf(dir)
    // survivor still serves; the invalidated key must go back to storage → fails
    assert(c.findBlockByHash(hash32(1)).head().getAs[Long]("number") == 1L)
    intercept[Exception] { c.findBlockByHash(hash32(2)).head() }
  }

  test("receipts and transactions cache with the same hit/invalidation contract") {
    val dir = Files.createTempDirectory("graft-cache-rc")
    Seq((hash32(7), 2L, 21000L), (hash32(8), 3L, 42000L))
      .toDF("tx_hash", "block_number", "gas_used")
      .write.mode("overwrite").parquet(s"$dir/receipts")
    Seq((hash32(7), 2L, 100L), (hash32(8), 3L, 200L))
      .toDF("hash", "block_number", "gas_price")
      .write.mode("overwrite").parquet(s"$dir/txs")
    val empty = spark.emptyDataFrame
    val store = ChainStore(
      headers = empty, transactions = spark.read.parquet(s"$dir/txs"),
      receipts = spark.read.parquet(s"$dir/receipts"), receiptLogs = empty,
      totalDifficulty = empty, transfers = empty, accounts = empty,
      subscriptions = empty, reorgs = empty, tokens = empty)
    val c = new CachedChainStore(store)

    assert(c.findReceipt(hash32(7)).head().getAs[Long]("gas_used") == 21000L)
    assert(c.findTransaction(hash32(8)).head().getAs[Long]("gas_price") == 200L)
    assert(c.size == 2)
    rmrf(dir) // storage gone: only the memo can answer
    assert(c.findReceipt(hash32(7)).head().getAs[Long]("gas_used") == 21000L)
    assert(c.findTransaction(hash32(8)).head().getAs[Long]("gas_price") == 200L)
    val plan = c.findReceipt(hash32(7)).queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), plan)

    // a reorg at block 2 sweeps the receipt entry (its row is in-range)
    // but keeps the block-3 transaction entry
    c.invalidateRange(2L, 2L)
    assert(c.size == 1)
    intercept[Exception] { c.findReceipt(hash32(7)).head() }
    assert(c.findTransaction(hash32(8)).head().getAs[Long]("gas_price") == 200L)
  }

  test("entry count is bounded and access-ordered (LRU)") {
    val (store, dir) = mkStore()
    val c = new CachedChainStore(store, maxEntries = 2)
    c.findBlockByNumber(1L)
    c.findBlockByNumber(2L)
    c.findBlockByNumber(1L) // touch 1 → 2 becomes eldest
    c.findBlockByNumber(3L) // evicts 2
    assert(c.size == 2)
    rmrf(dir)
    assert(c.findBlockByNumber(1L).head().getAs[Long]("number") == 1L) // retained
    intercept[Exception] { c.findBlockByNumber(2L).head() }            // evicted
  }
}
