package graft.chain

import graft.SparkSpec
import graft.chain.Fixtures._
import graft.chain.Schemas.Sentinels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The compact-ledger path must produce block-for-block identical outputs
  * to the full-history windowed path over a multi-block run.
  */
class BalanceLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def bd(s: String) = new java.math.BigDecimal(s)
  private val eth = Sentinels.EthToken

  private def subsAt(block: Long): DataFrame =
    // bob's subscription is "new" (block_number = 0) only when block 10
    // processes it; afterwards it is active since 10
    if (block == 10L)
      Seq((1L, 5L, 1L, alice), (2L, 0L, 2L, bob)).toDF("id", "block_number", "group", "address")
    else
      Seq((1L, 5L, 1L, alice), (2L, 10L, 2L, bob)).toDF("id", "block_number", "group", "address")

  /** Block N: alice sends N wei to bob, pays fee 21000·N; balances resolve
    * to deterministic functions of N.
    */
  private def inputsAt(n: Long, accounts: DataFrame, prevTotals: DataFrame): BalancePipeline.Inputs = {
    val transfers = Seq((eth, hash32(n.toInt), alice, bob, bd(n.toString), n))
      .toDF("token", "tx_hash", "from", "to", "value", "block_number")
    val txs = Seq((hash32(n.toInt), alice, n, n))
      .toDF("hash", "from", "gas_price", "block_number")
    val receipts = Seq((hash32(n.toInt), 21000L, n)).toDF("tx_hash", "gas_used", "block_number")
    val resolver = Seq(
      (eth, alice, bd((1000000L - n * 2).toString)),
      (eth, bob, bd((50000L + n).toString))
    ).toDF("token", "address", "balance")
    BalancePipeline.Inputs(n, transfers, txs, receipts, subsAt(n), accounts, resolver, prevTotals)
  }

  private def collectTotals(df: DataFrame): Map[(Long, Long), (String, String)] =
    df.collect().map { r =>
      (r.getAs[Long]("block_number"), r.getAs[Long]("group")) ->
        (r.getAs[java.math.BigDecimal]("balance").toPlainString,
          r.getAs[java.math.BigDecimal]("tx_fee").toPlainString)
    }.toMap

  test("ledger path == windowed path over three sequential blocks") {
    val emptyAcc = BalanceLedger.empty(spark).latestAccounts
    val emptyTot = BalanceLedger.empty(spark).latestTotals

    // full-history path: accumulate every snapshot/total row, re-window
    var accHist = emptyAcc
    var totHist = emptyTot
    var windowedTotals = Map.empty[(Long, Long), (String, String)]
    (10L to 12L).foreach { n =>
      val out = BalancePipeline.process(inputsAt(n, accHist, totHist))
      windowedTotals ++= collectTotals(out.totalBalances)
      accHist = accHist.unionByName(
        out.newAccounts.select("token", "address", "block_number", "balance"))
      totHist = totHist.unionByName(out.totalBalances)
    }

    // compact-ledger path
    var state = BalanceLedger.empty(spark)
    var ledgerTotals = Map.empty[(Long, Long), (String, String)]
    (10L to 12L).foreach { n =>
      val (out, next) = BalanceLedger.step(state, inputsAt(n, null, null))
      ledgerTotals ++= collectTotals(out.totalBalances)
      state = next
    }

    assert(ledgerTotals == windowedTotals)
    assert(ledgerTotals.nonEmpty)

    // state stays one row per key with the LAST block's values
    val latest = state.latestTotals.collect()
      .map(r => r.getAs[Long]("group") -> r.getAs[Long]("block_number")).toMap
    assert(latest.values.forall(_ == 12L))
    val latestAcc = state.latestAccounts.groupBy("token", "address").count()
      .select("count").collect().map(_.getLong(0))
    assert(latestAcc.forall(_ == 1L))
  }
}
