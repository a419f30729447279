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
