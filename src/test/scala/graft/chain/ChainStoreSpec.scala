package graft.chain

import graft.SparkSpec
import graft.chain.Fixtures._
import graft.chain.Schemas.Sentinels
import org.apache.spark.sql.functions._

/** Direct coverage of every read-facade method (the reference's store
  * Find/List surface) against small fixture tables.
  */
class ChainStoreSpec extends SparkSpec {
  import spark.implicits._

  private def bd(s: String) = new java.math.BigDecimal(s)
  private val eth = Sentinels.EthToken

  private lazy val store = ChainStore(
    headers = Seq(
      (1L, hash32(1), hash32(0), 100L),
      (2L, hash32(2), hash32(1), 200L),
      (3L, hash32(3), hash32(2), 300L)
    ).toDF("number", "hash", "parent_hash", "difficulty"),
    transactions = Seq(
      (hash32(1001), hash32(1), alice, 1L),
      (hash32(1002), hash32(1), bob, 1L),
      (hash32(1003), hash32(2), alice, 2L)
    ).toDF("hash", "block_hash", "from", "block_number"),
    receipts = Seq((hash32(1001), 21000L, 1L)).toDF("tx_hash", "gas_used", "block_number"),
    receiptLogs = Seq(
      (hash32(1001), 1L, 1, "AA"), (hash32(1001), 1L, 0, "BB")
    ).toDF("tx_hash", "block_number", "log_index", "event_name"),
    totalDifficulty = Seq((1L, hash32(1), bd("100")), (2L, hash32(2), bd("300")))
      .toDF("block", "hash", "td"),
    transfers = Seq(
      (eth, alice, bob, 1L), (eth, bob, carol, 2L), (eth, carol, alice, 3L)
    ).toDF("token", "from", "to", "block_number"),
    accounts = Seq(
      (eth, alice, 1L, bd("10")), (eth, alice, 3L, bd("30")), (eth, bob, 2L, bd("20"))
    ).toDF("token", "address", "block_number", "balance"),
    subscriptions = (1 to 25).map(i => (i.toLong, 1L, (i % 2).toLong, addr20(i)))
      .toDF("id", "block_number", "group", "address"),
    reorgs = Seq.empty[(Long, Array[Byte])].toDF("from", "from_hash"),
    tokens = Seq((tokenX, 5L), (addr20(201), 3L)).toDF("address", "block_number"))

  test("block lookups: by hash, by number, latest, TD (P1/P2/P6/A3/F12)") {
    assert(store.findBlockByHash(hash32(2)).head().getAs[Long]("number") == 2L)
    assert(store.findBlockByNumber(3L).head().getAs[Array[Byte]]("hash").toSeq == hash32(3).toSeq)
    assert(store.findLatestBlock().head().getAs[Long]("number") == 3L)
    assert(store.findTd(hash32(2)).head().getAs[java.math.BigDecimal]("td")
      .compareTo(bd("300")) == 0)
  }

  test("tx lookups: by hash and by block hash (P3/P4)") {
    assert(store.findTransaction(hash32(1003)).head().getAs[Long]("block_number") == 2L)
    assert(store.findTransactionsByBlockHash(hash32(1)).count() == 2L)
  }

  test("receipt + ordered logs stitch (P5)") {
    assert(store.findReceipt(hash32(1001)).head().getAs[Long]("gas_used") == 21000L)
    val logs = store.findReceiptLogs(hash32(1001)).collect()
    assert(logs.map(_.getAs[Int]("log_index")).toSeq == Seq(0, 1)) // ordered
  }

  test("account as-of lookups (J1/J5): latest <= N and per-address latest") {
    assert(store.findAccount(eth, alice, 2L).head()
      .getAs[java.math.BigDecimal]("balance").compareTo(bd("10")) == 0)
    assert(store.findAccount(eth, alice).head()
      .getAs[java.math.BigDecimal]("balance").compareTo(bd("30")) == 0)
    val latest = store.findLatestAccounts(eth, Seq(alice, bob)).collect()
      .map(r => r.getAs[Array[Byte]]("address").toSeq -> r.getAs[Long]("block_number")).toMap
    assert(latest == Map(alice.toSeq -> 3L, bob.toSeq -> 2L))
  }

  test("transfers touching an address, newest first (P9)") {
    val got = store.findAllTransfers(eth, alice).collect().map(_.getAs[Long]("block_number"))
    assert(got.toSeq == Seq(3L, 1L))
  }

  test("subscription paging with stable order and count (P8/P11/O3)") {
    assert(store.countSubscriptions(1L) == 13L) // odd ids 1..25
    val page2 = store.listSubscriptions(1L, page = 2, limit = 5).collect()
      .map(_.getAs[Long]("id"))
    assert(page2.toSeq == Seq(11L, 13L, 15L, 17L, 19L))
    assert(store.findSubscriptions(Seq(addr20(3), addr20(4))).count() == 2L)
  }

  test("token registry (P7) and retraction filter (P10/S12)") {
    assert(store.findToken(tokenX).head().getAs[Long]("block_number") == 5L)
    assert(store.listTokens().collect().map(_.getAs[Long]("block_number")).toSeq == Seq(3L, 5L))
    val kept = store.retract(store.transfers, 2L, 3L).collect().map(_.getAs[Long]("block_number"))
    assert(kept.toSeq == Seq(1L))
  }
}
