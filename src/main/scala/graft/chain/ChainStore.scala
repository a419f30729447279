package graft.chain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.chain.Schemas.Sentinels
import graft.operators.Relational

/** The read-side serving facade — every Find/List method of the reference's
  * store interfaces (store/account/account.go:32-51,
  * store/block_header/block_header.go:30-39,
  * store/transaction/transaction.go:28-33,
  * store/transaction_receipt/transaction_receipt.go:28-32,
  * store/subscription/subscription.go:32-46, store/reorg/reorg.go:29-33)
  * as a DataFrame function over the derived tables.
  *
  * Per-token "tables" (`erc20_balance_<addr>` /`erc20_transfer_<addr>`,
  * created at runtime by the reference — store/account/account.go:55-56)
  * are partition values here: `FindAccount(token, …)` routes to
  * `accounts.filter(token = …)`, which partition pruning turns back into a
  * per-token scan. The reference's ARC caches (client/cache.go:29-141)
  * become `.cache()` on hot dimensions at the caller's discretion.
  */
final case class ChainStore(
    headers: DataFrame,
    transactions: DataFrame,
    receipts: DataFrame,
    receiptLogs: DataFrame,
    totalDifficulty: DataFrame,
    transfers: DataFrame, // unified, token-tagged (ETH pseudo-token incl.)
    accounts: DataFrame,  // unified, token-tagged balance snapshots
    subscriptions: DataFrame,
    reorgs: DataFrame,
    tokens: DataFrame) { // erc20 registry (model/types.go:238-244)

  // -- block_headers (P1/P2/A3; block_header.go:44-49) --------------------
  def findBlockByHash(hash: Array[Byte]): DataFrame =
    headers.filter(col("hash") === lit(hash))

  def findBlockByNumber(n: Long): DataFrame =
    headers.filter(col("number") === n)

  def findLatestBlock(): DataFrame =
    headers.orderBy(col("number").desc).limit(1)

  def findTd(hash: Array[Byte]): DataFrame =
    totalDifficulty.filter(col("hash") === lit(hash))

  // -- transactions (P3/P4; transaction.go:37-39) --------------------------
  def findTransaction(hash: Array[Byte]): DataFrame =
    transactions.filter(col("hash") === lit(hash))

  def findTransactionsByBlockHash(blockHash: Array[Byte]): DataFrame =
    transactions.filter(col("block_hash") === lit(blockHash))

  // -- receipts + logs stitched (P5; transaction_receipt.go:97-120) -------
  def findReceipt(txHash: Array[Byte]): DataFrame =
    receipts.filter(col("tx_hash") === lit(txHash))

  def findReceiptLogs(txHash: Array[Byte]): DataFrame =
    receiptLogs.filter(col("tx_hash") === lit(txHash)).orderBy("log_index")

  // -- accounts (J1/J5/P9; account.go:63-67) -------------------------------
  /** Latest balance ≤ blockNr for one (token, address) — the reference's
    * `FindAccount` top-1 query (account.go:63-64,175-185).
    */
  def findAccount(token: Array[Byte], address: Array[Byte], blockNr: Long = Long.MaxValue): DataFrame =
    accounts
      .filter(col("token") === lit(token) && col("address") === lit(address) &&
        col("block_number") <= blockNr)
      .orderBy(col("block_number").desc)
      .limit(1)

  /** Latest balance per address over a set — `FindLatestAccounts`
    * (account.go:187-209), window form of the greatest-n-per-group self-join.
    */
  def findLatestAccounts(token: Array[Byte], addresses: Seq[Array[Byte]]): DataFrame = {
    val addrSet = addresses.map(a => lit(a))
    Relational.latestPerKey(
      accounts.filter(col("token") === lit(token) && col("address").isin(addrSet: _*)),
      Seq("address"), Seq(col("block_number")))
  }

  /** All transfers touching an address, newest first — `FindAllTransfers`
    * (account.go:67,223-234: disjunctive predicate + desc order).
    */
  def findAllTransfers(token: Array[Byte], address: Array[Byte]): DataFrame =
    transfers
      .filter(col("token") === lit(token) &&
        (col("from") === lit(address) || col("to") === lit(address)))
      .orderBy(col("block_number").desc)

  // -- subscriptions (P8/P11/O3; subscription.go:52-63,148-206) ------------
  def findSubscriptions(addresses: Seq[Array[Byte]]): DataFrame =
    subscriptions.filter(col("address").isin(addresses.map(a => lit(a)): _*))

  /** Paged scan with total count contract (O3): deterministic order by id. */
  def listSubscriptions(group: Long, page: Int, limit: Int): DataFrame =
    Relational.paginate(
      subscriptions.filter(col("group") === group),
      Seq(col("id")), page, limit)

  def countSubscriptions(group: Long): Long =
    subscriptions.filter(col("group") === group).count()

  // -- token registry (P7; store/store.go:381-403) -------------------------
  def findToken(address: Array[Byte]): DataFrame =
    tokens.filter(col("address") === lit(address))

  def listTokens(): DataFrame = tokens.orderBy("block_number", "address")

  // -- retraction (P10/S12/T5; store/store.go:319-378) ---------------------
  /** Rows outside a retraction interval — the DELETE WHERE block_number
    * BETWEEN f AND t of every table, as the keep-side filter. The streaming
    * sink overwrites with exactly this.
    */
  def retract(df: DataFrame, from: Long, to: Long): DataFrame =
    df.filter(!col("block_number").between(from, to))
}
