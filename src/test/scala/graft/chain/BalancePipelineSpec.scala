package graft.chain

import graft.SparkSpec
import graft.chain.Fixtures._
import graft.chain.Schemas._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mirrors the reference's transfer-processor scenarios
  * (store/transfer_processor_test.go): an old subscription with a prior
  * balance, a new subscription seeding in, fee/miner-reward accounting into
  * per-(group, token) totals.
  */
class BalancePipelineSpec extends SparkSpec {
  import spark.implicits._

  private def bd(s: String) = new java.math.BigDecimal(s)
  private val eth = Sentinels.EthToken

  // Block 10: alice (group 1, old sub) sends 100 wei to carol (unsubscribed);
  // bob (group 2, NEW sub) seeds in; alice pays fee 21000*100; miner (group 1
  // via alice? no — miner unsubscribed) gets reward.
  private def inputs: BalancePipeline.Inputs = {
    val transfers = Seq(
      (eth, hash32(1001), alice, carol, bd("100"), 10L),
      (eth, null.asInstanceOf[Array[Byte]], Sentinels.MinerReward, miner, bd("5000000000000000000"), 10L)
    ).toDF("token", "tx_hash", "from", "to", "value", "block_number")
    val txs = Seq((hash32(1001), alice, 100L, 10L))
      .toDF("hash", "from", "gas_price", "block_number")
    val receipts = Seq((hash32(1001), 21000L, 10L))
      .toDF("tx_hash", "gas_used", "block_number")
    val subs = Seq(
      (1L, 5L, 1L, alice), // active since block 5
      (2L, 0L, 2L, bob)    // new
    ).toDF("id", "block_number", "group", "address")
    val accounts = Seq((eth, alice, 5L, bd("1000100"))) // prior snapshot
      .toDF("token", "address", "block_number", "balance")
    val resolver = Seq(
      (eth, alice, bd("997900")), // 1000100 - 100 - 2100000... fixture value
      (eth, bob, bd("50000"))
    ).toDF("token", "address", "balance")
    val prevTotals = Seq((9L, eth, 1L, bd("1000100"), bd("0"), bd("0"), bd("0")))
      .toDF("block_number", "token", "group", "balance", "tx_fee", "miner_reward", "uncles_reward")
    BalancePipeline.Inputs(10L, transfers, txs, receipts, subs, accounts, resolver, prevTotals)
  }

  test("matched transfers keep only rows touching a subscribed address (J2)") {
    val out = BalancePipeline.process(inputs)
    val got = out.matchedTransfers.select("from", "to").collect()
    assert(got.length == 1) // alice→carol matches via alice; miner row matches nobody
    assert(got(0).getAs[Array[Byte]]("from").toSeq == alice.toSeq)
  }

  test("balance snapshots: old sub diffs vs latest, new sub seeds full (J6)") {
    val out  = BalancePipeline.process(inputs)
    val snap = out.newAccounts.collect()
      .map(r => r.getAs[Array[Byte]]("address").toSeq ->
        (r.getAs[java.math.BigDecimal]("balance"), r.getAs[Long]("block_number"))).toMap
    assert(snap(alice.toSeq)._1.compareTo(bd("997900")) == 0)
    assert(snap(bob.toSeq)._1.compareTo(bd("50000")) == 0)
    assert(snap.values.forall(_._2 == 10L))
  }

  test("total balances: carry-forward + deltas + fees per group (A8/W3)") {
    val out = BalancePipeline.process(inputs)
    val tot = out.totalBalances.collect()
      .map(r => r.getAs[Long]("group") ->
        (r.getAs[java.math.BigDecimal]("balance"), r.getAs[java.math.BigDecimal]("tx_fee"))).toMap
    // group 1 (alice, old): prev 1000100 + (997900 − 1000100) = 997900
    assert(tot(1L)._1.compareTo(bd("997900")) == 0)
    // alice's fee: 100 gas_price × 21000 gas
    assert(tot(1L)._2.compareTo(bd("2100000")) == 0)
    // group 2 (bob, new): no prev totals → 0 + seed 50000
    assert(tot(2L)._1.compareTo(bd("50000")) == 0)
    assert(tot(2L)._2.signum == 0)
  }

  test("new subscriptions flip to the processed block number (T8)") {
    val out = BalancePipeline.process(inputs)
    val got = out.updatedSubs.select("id", "block_number").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((2L, 10L)))
  }

  test("miner rewards roll into totals when the coinbase is subscribed (A9)") {
    val in2 = {
      val i = inputs
      // subscribe the miner under group 3 (active), give it a resolver balance
      val subs = Seq((1L, 5L, 1L, alice), (2L, 0L, 2L, bob), (3L, 5L, 3L, miner))
        .toDF("id", "block_number", "group", "address")
      val resolver = Seq(
        (eth, alice, bd("997900")), (eth, bob, bd("50000")),
        (eth, miner, bd("5000000000000000000"))
      ).toDF("token", "address", "balance")
      i.copy(subs = subs, resolver = resolver)
    }
    val tot = BalancePipeline.process(in2).totalBalances.collect()
      .map(r => r.getAs[Long]("group") -> r.getAs[java.math.BigDecimal]("miner_reward")).toMap
    assert(tot(3L).compareTo(bd("5000000000000000000")) == 0)
    assert(tot(1L).signum == 0)
  }
}
