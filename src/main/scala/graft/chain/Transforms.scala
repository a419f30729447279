package graft.chain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.chain.Schemas.Sentinels

/** The ingest transform DAG (reference pipeline stage 6,
  * store/store.go:215-316 + transfer prep in common/utils.go) as pure
  * `DataFrame => DataFrame` functions over the nested `Dataset[Block]` /
  * `Dataset[Receipt]` inputs. Everything is declarative — Catalyst prunes,
  * pushes down, and codegens; uint256 bytes→decimal is the native
  * graft.functions.Uint256ToDecimal expression (codegen'd, not a UDF).
  */
object Transforms {
  import Rewards.wei

  private val zeroWei = lit(new java.math.BigDecimal(0)).cast(wei)

  /** block_headers incl. reward columns (migrations 20180313051512 +
    * 20180706033026; reward fold model/types.go:93-123). Uncle math:
    * per-uncle `(n_u + 8 − n) · base / 8`, miner bonus `base/32` each
    * (common/utils.go:216-254).
    */
  def blockHeaders(blocks: DataFrame): DataFrame =
    blocks.select(
      col("number"),
      col("hash"),
      col("parentHash").as("parent_hash"),
      col("uncleHash").as("uncle_hash"),
      col("coinbase"),
      col("root"),
      col("txHash").as("tx_hash"),
      col("receiptHash").as("receipt_hash"),
      col("difficulty"),
      col("gasLimit").as("gas_limit"),
      col("gasUsed").as("gas_used"),
      col("time"),
      col("extraData").as("extra_data"),
      col("mixDigest").as("mix_digest"),
      col("nonce"),
      size(col("uncles")).as("n_uncles"),
      Rewards.minerReward(col("number"), size(col("uncles"))).as("miner_reward"),
      coalesce(
        aggregate(
          col("uncles"),
          zeroWei,
          (acc, u) => acc + Rewards.uncleReward(col("number"), u.getField("number"))),
        zeroWei
      ).as("uncles_reward")
    )

  /** transactions table: explode of the nested tx array
    * (common/utils.go:120-143; fixtures carry `from`, so signer recovery
    * is bypassed exactly as the reference's tests do).
    */
  def transactions(blocks: DataFrame): DataFrame =
    blocks
      .select(col("number").as("block_number"), col("hash").as("block_hash"),
        explode(col("transactions")).as("tx"))
      .select(
        col("tx.hash").as("hash"),
        col("block_hash"),
        col("tx.from").as("from"),
        col("tx.to").as("to"),
        col("tx.nonce").as("nonce"),
        col("tx.gasPrice").as("gas_price"),
        col("tx.gasLimit").as("gas_limit"),
        col("tx.amount").cast(wei).as("amount"),
        col("tx.payload").as("payload"),
        col("block_number"))

  /** transaction_receipts table (flat part; logs normalize separately —
    * store/transaction_receipt/transaction_receipt.go:53-74).
    */
  def transactionReceipts(receipts: DataFrame): DataFrame =
    receipts.select(
      col("root"),
      col("status"),
      col("cumulativeGasUsed").as("cumulative_gas_used"),
      col("gasUsed").as("gas_used"),
      col("bloom"),
      col("txHash").as("tx_hash"),
      col("contractAddress").as("contract_address"),
      col("blockNumber").as("block_number"))

  /** receipt_logs: the one generator-shaped op — explode nested logs, split
    * topics into event_name ("NA" default) + topic1..3
    * (common/utils.go:33-35,146-196). >4 topics is a data error upstream.
    */
  def receiptLogs(receipts: DataFrame): DataFrame =
    receipts
      .select(col("txHash").as("tx_hash"), col("blockNumber").as("block_number"),
        posexplode(col("logs")).as(Seq("log_index", "log")))
      .select(
        col("tx_hash"),
        col("block_number"),
        col("log_index"),
        col("log.contractAddress").as("contract_address"),
        coalesce(lower(hex(get(col("log.topics"), lit(0)))), lit("NA")).as("event_name"),
        get(col("log.topics"), lit(1)).as("topic1"),
        get(col("log.topics"), lit(2)).as("topic2"),
        get(col("log.topics"), lit(3)).as("topic3"),
        col("log.data").as("data"))

  /** eth_transfer rows from the modified geth's state-diff transfer logs
    * (common/utils.go:199-208).
    */
  def ethTransfers(transferLogs: DataFrame): DataFrame =
    transferLogs.select(
      col("txHash").as("tx_hash"),
      col("from"),
      col("to"),
      col("value").cast(wei).as("value"),
      col("blockNumber").as("block_number"))

  /** uint256 big-endian bytes → Decimal(38,0). conv() tops out at uint64,
    * so this needs real big-integer parsing; values beyond 10^38−1 (the
    * reference's own varchar(32) cap is 10^32−1) overflow to null. Native
    * codegen'd expression — no ScalaUDF row detour in the hot decode path.
    */
  def bytesToDecimal(c: Column): Column = graft.functions.Uint256ToDecimal(c)

  /** Decoded ERC20 transfers: logs ⋉ broadcast(token registry) on contract
    * address, topic0 = Transfer signature, from/to = low 20 bytes of
    * topics 1/2, value = uint256 data (store/event_erc20.go:37-62). The
    * explicit hint pins the broadcast in the static plan — this runs per
    * admitted chunk on the backfill hot path, where an AQE conversion
    * round per chunk is pure scheduling overhead.
    */
  def erc20Transfers(logs: DataFrame, tokens: DataFrame): DataFrame = {
    val transferSigHex = lower(lit(Sentinels.TransferSig.map("%02x".format(_)).mkString))
    logs
      .join(broadcast(tokens.select(col("address").as("__tok_addr"))),
        col("contract_address") === col("__tok_addr"), "left_semi")
      .filter(col("event_name") === transferSigHex)
      .select(
        col("contract_address").as("token"),
        col("tx_hash"),
        substring(col("topic1"), 13, 20).as("from"),
        substring(col("topic2"), 13, 20).as("to"),
        bytesToDecimal(col("data")).cast(wei).as("value"),
        col("block_number"))
  }

  /** Synthetic miner/uncle reward transfer rows
    * (store/store.go:268-299; sentinel from-addresses model/types.go:39-42).
    */
  def rewardTransfers(blocks: DataFrame): DataFrame = {
    val miner = blockHeaders(blocks).select(
      lit(null).cast("binary").as("tx_hash"),
      lit(Sentinels.MinerReward).as("from"),
      col("coinbase").as("to"),
      col("miner_reward").cast(wei).as("value"),
      col("number").as("block_number"))
    val uncle = blocks
      .select(col("number"), explode(col("uncles")).as("u"))
      .select(
        lit(null).cast("binary").as("tx_hash"),
        lit(Sentinels.UncleReward).as("from"),
        col("u.coinbase").as("to"),
        Rewards.uncleReward(col("number"), col("u.number")).cast(wei).as("value"),
        col("number").as("block_number"))
    miner.unionByName(uncle)
  }

  /** The unified transfer stream: ETH ∪ decoded ERC20 ∪ synthetic rewards
    * (store/store.go:240-299, U1), tagged by token (`ETH` pseudo-token —
    * per-token "tables" become partition values, SURVEY §1.1).
    */
  def allTransfers(eth: DataFrame, erc20: DataFrame, rewards: DataFrame): DataFrame = {
    val ethTok = eth.withColumn("token", lit(Sentinels.EthToken))
    val rewTok = rewards.withColumn("token", lit(Sentinels.EthToken))
    ethTok.unionByName(erc20).unionByName(rewTok)
  }

  /** total_difficulty: td = parent_td + difficulty
    * (service/indexer/indexer.go:249-274) — a cumulative sum in block
    * order over the canonical chain. Sequential by construction; in
    * streaming the running value is carried as state (the admission fold),
    * in batch it is this distributed two-level scan — the same shape as
    * `Curation.sequencePacking`: per-block cumsum WITHIN coarse number
    * ranges (a partitioned window), plus each range's exclusive offset
    * computed on the tiny per-range totals relation and broadcast back.
    * A bare `Window.orderBy("number")` would funnel ALL history through
    * one task; here only #ranges rows (one per `rangeWidth` blocks —
    * ~200 rows for the full chain at the default) ever cross an
    * unpartitioned window.
    */
  def totalDifficulty(headers: DataFrame, rangeWidth: Long = 100000L): DataFrame = {
    require(rangeWidth > 0, "rangeWidth must be positive")
    val base = headers.select(col("number"), col("hash"),
        col("difficulty").cast(wei).as("__d"))
      .withColumn("__r", floor(col("number") / rangeWidth).cast("long"))
    val offsets = base.groupBy("__r").agg(sum("__d").as("__rt"))
      .withColumn("__off", coalesce(
        sum("__rt").over(Window.orderBy("__r")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0).cast(wei)))
      .drop("__rt")
    val w = Window.partitionBy("__r").orderBy("number")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("__r"))
      .select(col("number").as("block"), col("hash"),
        (sum("__d").over(w) + col("__off")).cast(wei).as("td"))
  }
}
