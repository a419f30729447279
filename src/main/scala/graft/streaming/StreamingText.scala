package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.TextOps

/** Streaming faces of the training-data text operators: a 100 TB corpus
  * usually ARRIVES as a stream (crawl batches, upload feeds), so dedup and
  * quality accounting must hold across micro-batches, not just within one
  * DataFrame.
  */
object StreamingText {

  final case class Doc(doc_id: Long, text: String)
  final case class KeyedDoc(fp: String, doc_id: Long, text: String)

  /** Cross-batch exact dedup: the first document per content fingerprint
    * survives, every later arrival (same or later micro-batch) is dropped.
    * State is one boolean per fingerprint via mapGroupsWithState — the
    * canonical KeyValueGroupedDataset stateful pattern; state volume is
    * O(distinct fingerprints), partitioned by fingerprint hash.
    */
  def dedupStream(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .as[KeyedDoc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[KeyedDoc], state: GroupState[Boolean]) =>
          if (state.exists) {
            Iterator.empty // fingerprint already emitted in a prior batch
          } else {
            state.update(true)
            // within one batch, keep the lowest doc_id (deterministic)
            val first = rows.minBy(_.doc_id)
            Iterator.single(Doc(first.doc_id, first.text))
          }
      }
  }

  final case class PackedDoc(shard: String, doc_id: Long, n_tokens: Long, bin: Long)

  /** JVM-side token count, bit-consistent with the column `TextOps.tokens`
    * (trim + split on runs of whitespace; an empty string still counts 1,
    * matching Spark's and DuckDB's split semantics).
    */
  private[graft] def tokenCountLocal(s: String): Long =
    s.trim.split("\\s+").length.toLong

  /** Online sequence packing: the streaming face of
    * Curation.sequencePacking — documents arrive over micro-batches and
    * are cut into fixed token-budget bins whose numbering CONTINUES across
    * batches. State is one running token total per shard (a source/worker
    * key so packing parallelizes; bins are per-shard sequences, exactly
    * how a multi-worker pretraining loader shards its stream). Within a
    * batch, docs pack in doc_id order, so a replayed batch re-derives the
    * identical bins.
    */
  def packedStream(docs: Dataset[Doc], shardOf: Doc => String,
                   budget: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    require(budget > 0, "budget must be positive")
    docs
      .groupByKey(shardOf)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: String, rows: Iterator[Doc], state: GroupState[Long]) =>
          var start = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val n = tokenCountLocal(d.text)
            val packed = PackedDoc(shard, d.doc_id, n, start / budget)
            start += n
            packed
          }
          state.update(start)
          out.iterator
      }
  }

  /** Cross-batch CHUNK-level dedup — the streaming face of
    * Dedup.chunkDedup. A single flatMapGroupsWithState stage cannot
    * express it: the duplicate decision keys by CHUNK HASH while the
    * output re-aggregates by DOC, and append mode cannot chain a stateful
    * stage into a keyed aggregation without a synthetic watermark. So
    * this uses the ChainIngest architecture instead: foreachBatch + a
    * persistent hash state table, idempotent under batch replay.
    *
    * Per micro-batch `bid`:
    *   1. chunk + hash the batch docs (Dedup.chunkHashes);
    *   2. a chunk is a DUPLICATE if its hash appears in the state table
    *      from an EARLIER batch (left-semi probe; the batch side is
    *      small) or earlier in THIS batch (the d9 min(struct) rule);
    *   3. per-doc counts land in `chunk_dedup` by delete-then-append on
    *      the batch-id bucket (replays overwrite, never duplicate);
    *   4. the batch's distinct hashes append to `chunk_hashes` TAGGED
    *      with bid — which is what makes the crash window safe: a
    *      replayed batch filters its own half-written hashes out of the
    *      "seen" set (batch_id < bid), so the recomputation is identical,
    *      and re-appended hash rows are harmless to a semi join.
    *
    * Scale notes: the state table grows one row per distinct chunk ever
    * seen, but the per-batch probe is BOUNDED: `chunk_hashes` is
    * partitioned by a hash-prefix category (`hp`, the first two hex
    * chars, 256 partitions), and each batch's anti-join reads only the
    * partitions for prefixes actually present in the batch — an `isin`
    * partition predicate Spark prunes before opening any file. Per-batch
    * state-scan cost is O(|batch prefix set| / 256 × state), not
    * O(state); widen the prefix (4 chars → 65 536 partitions) when the
    * corpus grows so a micro-batch keeps touching a strict subset.
    * Replay idempotency is append-only-missing: the same pruned scan
    * tells the batch which of its hashes a crashed attempt already
    * landed, so a crash LOOP converges instead of growing the table.
    *
    * State growth pricing: `chunk_hashes` holds EXACTLY one row per
    * distinct chunk ever kept — rows ≈ distinct chunks, ~(32-char md5 +
    * long + int ≈ 50 B/row raw, ~25 B parquet-encoded) — growing linearly
    * with distinct-chunk mass forever, which is inherent to exact dedup
    * (forgetting a hash re-admits its duplicates). `retentionBatches`
    * trades that for SLIDING-WINDOW semantics when a deployment accepts
    * it: once per window the state table is pruned to the last N batches
    * (one atomic partitioned rewrite, amortized O(state/N) per batch),
    * after which a duplicate of a chunk older than the window reads as
    * fresh — the documented semantic change, not a bug. None (default)
    * keeps the unbounded exact behavior.
    */
  def processChunkBatch(store: graft.chain.TableStore, chunkTokens: Int,
                        compactFiles: Int = 64,
                        retentionBatches: Option[Long] = None)
                       (batch: DataFrame, bid: Long): Unit = {
    import graft.operators.Dedup
    val seenSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("batch_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("hp", org.apache.spark.sql.types.IntegerType)))
    // a fresh checkpoint restarts batch ids at 0: running it against a
    // store that already holds later-batch state would hide the whole
    // accumulated history behind `batch_id < bid` and emit wrong counts
    // for the entire catch-up — fail fast instead (limit-probed, bid=0
    // only; same-bid rows are the legitimate crash-replay case)
    if (bid == 0L) {
      val stale = store.read("chunk_hashes", seenSchema)
        .filter(col("batch_id") > 0L).limit(1).count()
      require(stale == 0L,
        "chunk_hashes holds later-batch state but the stream restarted at batch 0: " +
          "the checkpoint and the state store must be wiped together")
    }
    val chunks = Dedup.chunkHashes(batch, "doc_id", "text", chunkTokens)
      .withColumn("__hp", hashPrefix(col("__h")))
      .localCheckpoint(true) // consumed by both fresh and the doc totals
    // the batch's prefix set: a bounded driver read (≤256 ints) that makes
    // the state probe below prune to matching partitions only
    val prefixes = chunks.select("__hp").distinct().collect().map(_.getInt(0)).toSeq
    val state = seenState(store, seenSchema, prefixes)
    val seen = state.filter(col("batch_id") < bid).select(col("h"))
    // checkpoint the anti-join's (small, O(batch)) result so the two
    // consumers below don't run the pruned state scan twice
    val fresh = chunks.join(seen, chunks("__h") === seen("h"), "left_anti")
      .localCheckpoint(true)
    // within-batch keep-first among store-fresh chunks (the d9 rule)
    val uniques = fresh
      .groupBy("__h")
      .agg(min(struct(col("doc_id").as("i"), col("__ci").as("c"))).as("__first"))
      .groupBy(col("__first.i").as("doc_id"))
      .agg(count(lit(1)).as("__uniq"))
    val counts = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .join(uniques, Seq("doc_id"), "left")
      .select(lit(bid).as("batch_id"), col("doc_id"), col("n_chunks"),
        (col("n_chunks") - coalesce(col("__uniq"), lit(0L))).as("dup_chunks"))
      .withColumn("dup_fraction",
        round(col("dup_chunks").cast("double") / col("n_chunks").cast("double"), 6))
    store.deleteRange("chunk_dedup", "batch_id", bid, bid)
    store.appendBucketed("chunk_dedup", counts, "batch_id")
    // only store-fresh hashes append, and of those only the ones a crashed
    // attempt at this SAME bid didn't already land (the pruned scan again):
    // the state table stays O(distinct chunks) even under a crash LOOP on
    // this batch (a plain append would re-add the batch's hashes once per
    // replay — harmless to the anti-join, unbounded on disk)
    val already = state.filter(col("batch_id") === bid).select(col("h"))
    val toAppend = fresh.select(col("__h").as("h")).distinct()
      .join(already, Seq("h"), "left_anti")
      .withColumn("batch_id", lit(bid))
      .withColumn("hp", hashPrefix(col("h")))
    store.appendPartitioned("chunk_hashes", toAppend, "hp")
    // bounded file counts per hash-prefix partition: threshold-compact
    // exactly the partitions this batch touched (rows and batch_id replay
    // tags unchanged — see TableStore.compactPartitions)
    store.compactPartitions("chunk_hashes", "hp", Some(prefixes), compactFiles)
    // sliding-window retention (see the scaladoc pricing note): prune once
    // per window — idempotent under replay (same keepFrom → same result)
    retentionBatches.foreach { r =>
      if (r > 0 && bid > 0 && bid % r == 0)
        store.retainFrom("chunk_hashes", "batch_id", bid - r, "hp")
    }
  }

  /** First two hex chars of an md5 hash as the partition category 0..255. */
  private def hashPrefix(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(h, 1, 2), 16, 10).cast("int")

  /** The pruned state probe: only the partitions for `prefixes` are read —
    * factored out so the plan contract can assert the pruning directly.
    */
  private[graft] def seenState(store: graft.chain.TableStore,
                               schema: org.apache.spark.sql.types.StructType,
                               prefixes: Seq[Int]): DataFrame =
    store.read("chunk_hashes", schema).filter(col("hp").isin(prefixes: _*))

  /** The [[processChunkBatch]] processor wired as a streaming query. */
  def chunkDedupStream(docs: Dataset[Doc], store: graft.chain.TableStore,
                       chunkTokens: Int, checkpointDir: String) = {
    docs.toDF().writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        processChunkBatch(store, chunkTokens)(batch, bid): Unit
      }
      .start()
  }

  /** Watermarked per-window arrival counts + mean quality features: the
    * standard event-time aggregation (append mode emits a window once the
    * watermark passes; stragglers later than `lateness` are dropped, which
    * bounds state).
    */
  def windowedQuality(docs: DataFrame, tsCol: String, windowLen: String,
                      lateness: String): DataFrame = {
    val punctRatio = TextOps.qualityFeatures(col("text"))
      .collectFirst { case ("punct_ratio", c) => c }.get
    docs
      .withColumn("__q", punctRatio)
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_docs"), avg(col("__q")).as("mean_punct_ratio"))
      .select(col("window.start").as("window_start"), col("n_docs"), col("mean_punct_ratio"))
  }
}
