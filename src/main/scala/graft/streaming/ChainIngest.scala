package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.chain._

/** Structured Streaming ingest shell — the Spark shape of the reference's
  * `Listen` loop (service/indexer/indexer.go:122-246):
  *
  *   - source: an unbounded stream of block bundles (block + receipts +
  *     transfer logs — the per-block RPC fetches of indexer.go:443-467 made
  *     columnar). Tests drive a memory/file stream; production would plug a
  *     custom MicroBatchStream over the WS subscription.
  *   - admission (T2): duplicate heads and lower-difficulty branches are
  *     dropped (`Ignore old header`, indexer.go:141-144,361-364).
  *   - catch-up (T3): inserts proceed in ≤ `maxBlocksPerChunk` slices
  *     (maxBlocksToInsert = 50, indexer.go:39,218-246).
  *   - reorg (T5): an incoming block at an already-stored height with a
  *     different hash branches the chain; if the new branch wins (longer,
  *     or heavier at equal length), [branch, storedTip] retracts from every
  *     table + a reorg audit row (indexer.go:331-440, store/store.go:175-212)
  *     and the new branch inserts.
  *   - state (T4): the current head is re-derived from the sink each batch
  *     (the reference's `loadLocalState`, indexer.go:177-216) — restart-safe
  *     with no extra checkpoint state.
  *   - idempotency (T6): already-stored hashes skip (duplicate-key
  *     tolerance, common/errors.go:48-57).
  *
  * Scale note: reorg decisions read ONLY (number, hash, parent_hash,
  * difficulty) — one small row per block — to the driver; payload tables
  * stay distributed.
  */
object ChainIngest {

  val HeadersTable   = "block_headers"
  val TxTable        = "transactions"
  val ReceiptsTable  = "transaction_receipts"
  val LogsTable      = "receipt_logs"
  val TdTable        = "total_difficulty"
  val TransfersTable = "transfers"
  val ReorgsTable    = "reorgs"

  private case class Hdr(number: Long, hash: Seq[Byte], parentHash: Seq[Byte], difficulty: Long)

  /** One micro-batch of the ingest DAG: admission → reorg handling →
    * transform → idempotent append. `bundles` columns: block (struct),
    * receipts (array), transferLogs (array).
    */
  def ingestBatch(
      spark: SparkSession,
      store: TableStore,
      bundles: DataFrame,
      tokens: DataFrame,
      maxBlocksPerChunk: Int = 50): Unit = {
    if (bundles.isEmpty) return

    val incoming: Array[Hdr] = bundles
      .select(col("block.number"), col("block.hash"), col("block.parentHash"),
        col("block.difficulty"))
      .orderBy("number")
      .collect()
      .map(r => Hdr(r.getLong(0), r.getSeq[Byte](1), r.getSeq[Byte](2), r.getLong(3)))

    val stored: Map[Long, Hdr] =
      if (!store.exists(HeadersTable)) Map.empty
      else store.readOr(HeadersTable, null)
        .select("number", "hash", "parent_hash", "difficulty")
        .collect()
        .map(r => r.getLong(0) -> Hdr(r.getLong(0), r.getSeq[Byte](1), r.getSeq[Byte](2), r.getLong(3)))
        .toMap
    val storedMax = if (stored.isEmpty) -1L else stored.keys.max

    // First contradicted height = branch point of a reorg candidate
    val reorgAt: Option[Long] = incoming
      .find(h => stored.get(h.number).exists(_.hash != h.hash))
      .map(_.number)

    val insertFrom: Long = reorgAt match {
      case Some(branch) =>
        val tip = incoming.last.number
        // T2: drop losing branches — shorter, or lighter at equal length
        val newWins =
          tip > storedMax || {
            val newTd = incoming.filter(h => h.number >= branch).map(_.difficulty).sum
            val oldTd = (branch to storedMax).flatMap(stored.get).map(_.difficulty).sum
            tip == storedMax && newTd > oldTd
          }
        if (!newWins) return
        retract(spark, store, branch, storedMax)
        branch
      case None => storedMax + 1
    }

    // T6: skip duplicates/old heads; insert the admitted suffix in order
    val toInsert = incoming.filter(_.number >= insertFrom).map(_.number)
    if (toInsert.isEmpty) return

    // T3: ≤ maxBlocksPerChunk blocks per sink transaction
    toInsert.grouped(maxBlocksPerChunk).foreach { chunk =>
      val slice = bundles.filter(col("block.number").between(chunk.head, chunk.last))
      appendChunk(spark, store, slice, tokens)
    }
  }

  /** Retraction: delete [from, to] from every derived table (the reference
    * does this chunked, newest-first, to bound MySQL lock time —
    * store/store.go:75,198-210; a single swap/`DELETE WHERE` per table is
    * already transactional here), plus the audit row
    * (store/reorg/reorg.go:50-54).
    */
  def retract(spark: SparkSession, store: TableStore, from: Long, to: Long): Unit = {
    import spark.implicits._
    if (store.exists(HeadersTable)) {
      val hdrs    = store.readOr(HeadersTable, null)
      val fromRow = hdrs.filter(col("number") === from).select("hash").collect().headOption
      val toRow   = hdrs.filter(col("number") === to).select("hash").collect().headOption
      (fromRow, toRow) match {
        case (Some(f), Some(t0)) =>
          store.append(ReorgsTable,
            Seq((from, f.getSeq[Byte](0).toArray, to, t0.getSeq[Byte](0).toArray))
              .toDF("from", "from_hash", "to", "to_hash"))
        case _ => ()
      }
      store.replace(HeadersTable, hdrs.filter(!col("number").between(from, to)))
    }
    Seq(TxTable, ReceiptsTable, LogsTable, TransfersTable).foreach { t =>
      if (store.exists(t)) {
        store.replace(t, store.readOr(t, null).filter(!col("block_number").between(from, to)))
      }
    }
    if (store.exists(TdTable)) {
      store.replace(TdTable, store.readOr(TdTable, null).filter(!col("block").between(from, to)))
    }
  }

  /** Transform one admitted chunk and append to all sinks (stage 6 of the
    * reference lifecycle, store/store.go:215-316).
    */
  private def appendChunk(
      spark: SparkSession,
      store: TableStore,
      slice: DataFrame,
      tokens: DataFrame): Unit = {
    val blocks       = slice.select("block.*")
    val receipts     = slice.select(explode(col("receipts")).as("r")).select("r.*")
    val transferLogs = slice.select(explode(col("transferLogs")).as("t")).select("t.*")

    store.append(HeadersTable, Transforms.blockHeaders(blocks))
    store.append(TxTable, Transforms.transactions(blocks))
    store.append(ReceiptsTable, Transforms.transactionReceipts(receipts))
    val logs = Transforms.receiptLogs(receipts)
    store.append(LogsTable, logs)

    val eth     = Transforms.ethTransfers(transferLogs)
    val erc20   = Transforms.erc20Transfers(logs, tokens)
    val rewards = Transforms.rewardTransfers(blocks)
    store.append(TransfersTable, Transforms.allTransfers(eth, erc20, rewards))

    // TD is a running sum over the canonical chain (one tiny row per
    // block) — recomputed from headers so parent-linked semantics stay
    // exact across reorgs (A6, indexer.go:249-274).
    store.replace(TdTable, Transforms.totalDifficulty(store.readOr(HeadersTable, null)))
  }

  /** Wire the ingest DAG as a streaming query over a bundle stream. */
  def start(
      bundles: Dataset[_],
      store: TableStore,
      tokens: DataFrame,
      checkpoint: String): StreamingQuery =
    bundles.toDF().writeStream
      .trigger(Trigger.ProcessingTime(0L))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch.sparkSession, store, batch, tokens)
      }
      .start()
}
