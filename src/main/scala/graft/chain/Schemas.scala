package graft.chain

import java.sql.Timestamp

/** Case-class schemas for the chain data model — the 12 tables of
  * SURVEY.md §1.3 (migrations in
  * /root/reference/migration/db/migrate (ruby migrations), Go structs in
  * /root/reference/model/types.go:54-263).
  *
  * Binary columns are raw bytes (hash 32, address 20, bloom 256, nonce 8 —
  * model/types.go:56-70). Wei-domain numerics are carried as STRINGS on the
  * ingest structs — exactly the reference's varchar(32) storage
  * (model/types.go:72-81) — and cast to Decimal(38,0) in Transforms. A Scala
  * BigDecimal field would be encoded as Decimal(38,18), whose integral max
  * (~1.7e20) silently nulls any amount above ~170 ETH at Dataset-encoding
  * time, before any downstream cast can widen it. Timestamps are UTC.
  */
object Schemas {

  /** Ingest-side nested block, as the indexer consumes it from RPC
    * (service/indexer/indexer.go:443-467).
    */
  case class UncleRef(hash: Array[Byte], coinbase: Array[Byte], number: Long)

  case class Tx(
      hash: Array[Byte],
      from: Array[Byte],
      to: Option[Array[Byte]], // null = contract creation (model/types.go:131)
      nonce: Long,
      gasPrice: Long, // bigint after 20180726081811_change_gp_to_be_big_int.rb
      gasLimit: Long,
      amount: String, // decimal wei string ≤10^38−1 (ref varchar(32), ≤10^32−1)
      payload: Array[Byte])

  case class Block(
      number: Long,
      hash: Array[Byte],
      parentHash: Array[Byte],
      uncleHash: Array[Byte],
      coinbase: Array[Byte],
      root: Array[Byte],
      txHash: Array[Byte],
      receiptHash: Array[Byte],
      difficulty: Long,
      gasLimit: Long,
      gasUsed: Long,
      time: Long,
      extraData: Array[Byte],
      mixDigest: Array[Byte],
      nonce: Array[Byte], // 8-byte big-endian uint64 (common/utils.go:97-98)
      transactions: Seq[Tx],
      uncles: Seq[UncleRef])

  /** Nested log inside a receipt (model/types.go:153-164). */
  case class LogEntry(contractAddress: Array[Byte], topics: Seq[Array[Byte]], data: Array[Byte])

  case class Receipt(
      root: Option[Array[Byte]],
      status: Int,
      cumulativeGasUsed: Long,
      gasUsed: Long,
      bloom: Array[Byte],
      txHash: Array[Byte],
      contractAddress: Option[Array[Byte]],
      blockNumber: Long,
      logs: Seq[LogEntry])

  /** ETH transfer event from modified geth's debug_getTransferLogs
    * (common/utils.go:199-208).
    */
  case class TransferLog(
      txHash: Array[Byte],
      from: Array[Byte],
      to: Array[Byte],
      value: String, // decimal wei string, see class note
      blockNumber: Long)

  /** Token registry row (model/types.go:238-244). blockNumber 0 = pending
    * backfill (store/new_erc20.go:41-175).
    */
  case class ERC20(
      address: Array[Byte],
      blockNumber: Long,
      totalSupply: Option[String], // decimal string, see class note
      decimals: Int,
      name: String)

  /** Watched address (model/types.go:247-254). blockNumber 0 = new. */
  case class Subscription(
      id: Long,
      blockNumber: Long,
      group: Long,
      address: Array[Byte],
      createdAt: Timestamp,
      updatedAt: Timestamp)

  /** Pluggable balance-resolver row replacing the geth RPC in tests
    * (client/balancer.go:43-116; FIXTURES.md).
    */
  case class BalanceFixture(
      blockNumber: Long,
      token: Array[Byte], // Sentinels.EthToken for ETH
      address: Array[Byte],
      balance: String) // decimal wei string, see class note

  /** One block's ingest bundle — the block plus its per-block RPC
    * side-fetches (service/indexer/indexer.go:443-467), the row type of the
    * S1 streaming source.
    */
  case class Bundle(block: Block, receipts: Seq[Receipt], transferLogs: Seq[TransferLog])

  /** Reorg audit row (model/types.go:257-263; store/reorg/reorg.go:36-37). */
  case class Reorg(
      from: Long,
      fromHash: Array[Byte],
      to: Long,
      toHash: Array[Byte])

  /** Sentinel constants (model/types.go:36-42). */
  object Sentinels {
    val EthToken: Array[Byte]    = "ETH".getBytes("UTF-8")
    val MinerReward: Array[Byte] = "MINER REWARD".getBytes("UTF-8")
    val UncleReward: Array[Byte] = "UNCLE REWARD".getBytes("UTF-8")
    /** keccak256("Transfer(address,address,uint256)") —
      * store/event_erc20.go:32-35.
      */
    val TransferSig: Array[Byte] =
      "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
        .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }
}
