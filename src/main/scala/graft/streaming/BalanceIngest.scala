package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.chain._
import graft.chain.Schemas.Sentinels
import graft.operators.Relational

/** The reference's FULL per-block lifecycle composed over the ingested
  * tables: after ChainIngest lands a block's rows, the transfer processor
  * runs for that block (store/store.go:215-316 stage 6 →
  * store/transfer_processor.go:85-418) — matched transfers, balance
  * snapshots via the batched resolver, per-(group, token) running totals —
  * and the compact ledger state persists for the next block.
  *
  * Scale shape per block: reads are partition-pruned single-block slices
  * (readRange on the bucketed tables); the pipeline is O(touched keys +
  * state); state tables (one row per key) swap atomically, which also
  * truncates plan lineage so a 10k-block catch-up does not accrete a
  * 10k-step logical plan.
  */
object BalanceIngest {

  val AccountsTable  = "accounts"
  val TotalsTable    = "total_balances"
  val MatchedTable   = "matched_transfers"
  val SubsTable      = "subscriptions"
  val RegistryTable  = "erc20"
  val LatestAccounts = "latest_accounts"
  val LatestTotals   = "latest_totals"
  val BalanceHeadTable = "balance_head"

  /** Highest block the balance pipeline has processed — the single-row
    * watermark that makes the composed stream replay-safe: a micro-batch
    * re-delivered after a crash re-enters here and only the unprocessed
    * tail [watermark+1, chain head] runs (the reference gets the same
    * property from its per-block transaction bracket,
    * store/store.go:129-147).
    */
  def processedThrough(store: TableStore): Option[Long] =
    Option(store.readOr(BalanceHeadTable, null))
      .flatMap(_.collect().headOption.map(_.getAs[Long]("number")))

  private def accSchema = StructType(Seq(
    StructField("token", BinaryType), StructField("address", BinaryType),
    StructField("block_number", LongType), StructField("balance", Rewards.wei)))

  /** Load compact state; absent tables mean a fresh ledger. */
  def loadState(spark: SparkSession, store: TableStore): BalanceLedger.State = {
    val empty = BalanceLedger.empty(spark)
    BalanceLedger.State(
      latestAccounts = store.readOr(LatestAccounts, empty.latestAccounts),
      latestTotals   = store.readOr(LatestTotals, empty.latestTotals))
  }

  private def saveState(store: TableStore, state: BalanceLedger.State): Unit =
    // one staged swap: the totals plan reads the OLD accounts state
    store.replaceAll(Seq(
      LatestAccounts -> state.latestAccounts,
      LatestTotals   -> state.latestTotals))

  /** Rebuild compact state from full history — the recovery path after a
    * reorg retraction (the reference re-reads its latest rows from MySQL
    * the same way, store/transfer_processor.go:259-313).
    */
  def rebuildState(spark: SparkSession, store: TableStore): BalanceLedger.State = {
    val empty = BalanceLedger.empty(spark)
    val acc = store.readOr(AccountsTable, empty.latestAccounts)
    val tot = store.readOr(TotalsTable, empty.latestTotals)
    BalanceLedger.State(
      latestAccounts = Relational.latestPerKey(
        acc.select("token", "address", "block_number", "balance"),
        Seq("token", "address"), Seq(col("block_number"))),
      latestTotals = Relational.latestPerKey(
        tot, Seq("group", "token"), Seq(col("block_number"))))
  }

  /** Process blocks [from, to] (already ingested by ChainIngest) through
    * the balance pipeline, appending accounts/total_balances/matched rows
    * and persisting the ledger + flipped subscriptions after each block —
    * the reference's one-transaction-per-block bracket.
    */
  def processRange(
      spark: SparkSession,
      store: TableStore,
      from: Long,
      to: Long,
      client: BalanceClient,
      newSubLimit: Int = 990): Unit = {
    import spark.implicits._
    var state = loadState(spark, store)
    // watermark carried through the loop (read once, not per block);
    // monotonic — replaying an old block must not lower "processed through"
    var wm = processedThrough(store).getOrElse(-1L)
    def advance(n: Long): Unit = if (n > wm) {
      store.replace(BalanceHeadTable, Seq(Tuple1(n)).toDF("number"))
      wm = n
    }
    (from to to).foreach { n =>
      val transfers = store.readRange(ChainIngest.TransfersTable, "block_number", n, n, null)
      val txs       = store.readRange(ChainIngest.TxTable, "block_number", n, n, null)
      val receipts  = store.readRange(ChainIngest.ReceiptsTable, "block_number", n, n, null)
      val subs      = store.readOr(SubsTable, null)
      // un-landed heights are no-ops (a watermark range wider than the
      // stored chain, e.g. a genesis-0 start when the chain begins at 1):
      // the reference only transfer-processes blocks it actually inserted,
      // and running the pipeline on an absent block would wrongly seed
      // pending registry tokens against an empty block hash
      val blockHashOpt =
        if (subs == null) None
        else store.readRange(ChainIngest.HeadersTable, "number", n, n, null)
          .select("hash").collect().headOption.map(_.getAs[Array[Byte]](0))
      blockHashOpt.foreach { blockHash =>

        // resolver request set: every touched-or-new subscribed address ×
        // every token seen in the block (plus ETH) — the same set the
        // reference batches to geth (client/balancer.go:43-116)
        val active  = BalancePipeline.activeSubs(subs, newSubLimit)
        val touched = BalancePipeline.changedAddresses(transfers, txs)
          .join(active.select("address"), Seq("address"), "left_semi")
          .unionByName(BalancePipeline.admittedNewSubs(subs, newSubLimit).select("address"))
          .dropDuplicates("address")
        val tokens = transfers.select(col("token")).distinct()
          .unionByName(Seq(Tuple1(Sentinels.EthToken)).toDF("token"))
          .dropDuplicates("token")
        val pairs    = tokens.crossJoin(touched)
        val resolver = BalanceResolver.resolve(pairs, blockHash, client)

        val in = BalancePipeline.Inputs(n, transfers, txs, receipts, subs,
          accounts = null, resolver = resolver, prevTotals = null)
        val (out, next0) = BalanceLedger.step(state, in, newSubLimit)

        // New-token admission (initNewERC20, store/new_erc20.go:41-175):
        // every PENDING registry row seeds a balance for every ACTIVE
        // subscription at n through the same batched resolver, plus the
        // per-(group, token) starting totals (A10), and its watermark
        // flips to n+1 — the reference's "next block" convention, so the
        // token's events are transfer-processed from n+1 on. The pending
        // set includes tokens already flipped to n+1 so that REPLAYING
        // block n re-seeds exactly the rows its delete bracket wipes.
        val registry = store.readOr(RegistryTable, null)
        val seeds = Option(registry).map { reg =>
          reg.filter(col("block_number") === 0L || col("block_number") === n + 1)
            .select(col("address").as("token"))
        }.filter(_.limit(1).collect().nonEmpty).map { pend =>
          // flip-before-seed ordering (transfer_processor.go:316 before
          // new_erc20.go's ListOldSubscriptions): subs admitted THIS block
          // are already active when the new token seeds, so union them in —
          // otherwise the (sub, token) seed row is missed and never heals
          val oldSubs = subs.filter(col("block_number") > 0L)
            .select("address", "group")
            .unionByName(out.updatedSubs.select("address", "group"))
            .dropDuplicates("address")
          val sBal = BalanceResolver.resolve(
            oldSubs.select("address").crossJoin(broadcast(pend)), blockHash, client)
          val sAcc = sBal.join(oldSubs, Seq("address"))
            .select(col("token"), col("address"), lit(n).as("block_number"),
              col("balance"), col("group"))
            .localCheckpoint(true) // must survive the registry swap below
          val zero = lit(0L).cast(Rewards.wei)
          val sTot = sAcc.groupBy("group", "token")
            .agg(sum("balance").cast(Rewards.wei).as("balance"))
            .select(lit(n).as("block_number"), col("token"), col("group"),
              col("balance"), zero.as("tx_fee"), zero.as("miner_reward"),
              zero.as("uncles_reward"))
          (sAcc, sTot)
        }
        val next = seeds.fold(next0) { case (sAcc, sTot) =>
          BalanceLedger.State(
            latestAccounts = BalanceLedger.upsert(next0.latestAccounts,
              sAcc.select("token", "address", "block_number", "balance"),
              Seq("token", "address")),
            latestTotals = BalanceLedger.upsert(next0.latestTotals, sTot,
              Seq("group", "token")))
        }

        // replay-idempotent bracket (same as ChainIngest.appendChunk): a
        // reprocessed block rewrites its rows instead of duplicating them
        Seq(AccountsTable, TotalsTable, MatchedTable)
          .foreach(t => store.deleteRange(t, "block_number", n, n))

        val accRows = out.newAccounts
          .select("token", "address", "block_number", "balance", "group")
        store.appendBucketed(AccountsTable,
          seeds.fold(accRows)(s => accRows.unionByName(s._1)), "block_number")
        store.appendBucketed(TotalsTable,
          seeds.fold(out.totalBalances)(s => out.totalBalances.unionByName(s._2)),
          "block_number")
        store.appendBucketed(MatchedTable,
          out.matchedTransfers.select("token", "from", "to", "value", "block_number"),
          "block_number")

        // persist state FIRST (atomic swap also truncates plan lineage) —
        // `next`'s plans still read the un-flipped subscriptions table
        saveState(store, next)
        state = loadState(spark, store)

        // flip seeded tokens to n+1 (BatchUpdateERC20BlockNumber); the
        // seed plans are checkpointed, so the registry swap is safe
        seeds.foreach { _ =>
          store.replace(RegistryTable, registry.withColumn("block_number",
            when(col("block_number") === 0L, lit(n + 1))
              .otherwise(col("block_number"))))
        }

        // flip admitted new subs to active at n (BatchUpdateBlockNumber);
        // last mutation of the block so no pending plan re-reads the old files
        val flippedIds = out.updatedSubs.select("id")
        val newSubs = subs.join(flippedIds, Seq("id"), "left_anti")
          .unionByName(out.updatedSubs)
        store.replace(SubsTable, newSubs)
        advance(n) // per-block crash bracket where work actually happened
      }
    }
    advance(to) // no-work tail (no subscriptions) collapses into one write
  }

  /** Reorg path: retract balance rows in [from, to], RESET subscriptions
    * whose admission watermark fell inside the retracted range back to
    * pending (block_number 0 — store/subscription/subscription.go's
    * `Reset`, called from store/store.go:339-342), and rebuild the compact
    * state from the surviving history. The reset is what re-seeds those
    * addresses on the winning branch: their admission block no longer
    * exists, so they must re-enter through the new-subscription path. A
    * caller-persisted token registry composes the same way (the reference
    * resets erc20.block_number for tokens initialized in-range,
    * store/store.go:357-375).
    */
  def retract(spark: SparkSession, store: TableStore, from: Long, to: Long): Unit = {
    import spark.implicits._
    Seq(AccountsTable, TotalsTable, MatchedTable)
      .foreach(t => store.deleteRange(t, "block_number", from, to))
    val subs = store.readOr(SubsTable, null)
    if (subs != null) {
      store.replace(SubsTable, subs.withColumn("block_number",
        when(col("block_number").between(from, to), lit(0L))
          .otherwise(col("block_number"))))
    }
    saveState(store, rebuildState(spark, store))
    // the retracted range is unprocessed again: the winning branch's blocks
    // at those heights must flow through the pipeline on reprocess
    if (processedThrough(store).exists(_ >= from))
      store.replace(BalanceHeadTable, Seq(Tuple1(from - 1)).toDF("number"))
  }
}
