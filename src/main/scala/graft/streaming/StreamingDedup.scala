package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
import graft.chain.TableStore
import graft.operators.Dedup

/** Streaming face of MinHash-LSH near-dup detection (the d2 family): a
  * crawl feed arrives over micro-batches, every new document must be
  * checked against EVERYTHING kept so far, and the index must grow
  * incrementally — never rebuild. Same foreachBatch + persistent-table
  * architecture as [[StreamingText.processChunkBatch]] and
  * [[StreamingSimilarity.processEmbeddingBatch]] (a stateful-operator
  * formulation can't express it: the index is a TABLE probed by band
  * keys, and the verdict re-aggregates by doc).
  *
  * Index layout — CANONICAL DOCS ONLY, two tables:
  *   - `lsh_postings` (band, band_hash, doc_id, batch_id), partitioned by
  *     the band-hash prefix `bp` (0..255): a batch's candidate probe reads
  *     only the partitions for prefixes present in the batch — an `isin`
  *     predicate Spark prunes before opening a file, the chunk_hashes
  *     discipline. At corpus scale a batch touches its share of the index,
  *     not the index.
  *   - `lsh_sigs` (doc_id, sig, batch_id), partitioned by the doc-id
  *     prefix `sp`: signatures are fetched ONLY for the candidate set
  *     (bounded by the bucket valve), again partition-pruned.
  * Keeping only canonicals in the index is what production frontiers do:
  * dups never accumulate as index mass, and a chain of near-dups all
  * resolves against the one kept representative.
  *
  * Per-batch verdict (`near_dups`, delete-then-append on batch_id):
  * (batch_id, doc_id, is_new 1|0, dup_of, est_jaccard). Matching is the
  * standard MinHash estimator — the fraction of equal signature
  * components, which estimates Jaccard unbiasedly — against (a) earlier
  * batches' canonicals sharing an LSH bucket and (b) the batch's own
  * within-batch candidate groups, collapsed through connected components
  * (batch-bounded) so chains keep exactly their min-id member. A doc
  * whose batch-canonical matched an older doc resolves to THAT older doc.
  *
  * Replay idempotency: postings/sigs rows are tagged with batch_id; the
  * "earlier corpus" is `batch_id < bid`, so a replayed batch never
  * matches its own half-landed rows, recomputes the identical verdict,
  * and appends only the rows a crashed attempt didn't land — a crash
  * loop converges instead of growing the index.
  */
object StreamingDedup {

  val PostingsTable = "lsh_postings"
  val SigsTable     = "lsh_sigs"
  val VerdictTable  = "near_dups"

  val postingsSchema: StructType = StructType(Seq(
    StructField("band", IntegerType), StructField("band_hash", LongType),
    StructField("doc_id", LongType), StructField("batch_id", LongType),
    StructField("bp", IntegerType)))

  val sigsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("sig", ArrayType(LongType)),
    StructField("batch_id", LongType), StructField("sp", IntegerType)))

  private def bandPrefix(h: org.apache.spark.sql.Column) = pmod(h, lit(256L)).cast("int")
  private def docPrefix(id: org.apache.spark.sql.Column) = pmod(id, lit(256L)).cast("int")

  /** Estimated Jaccard: fraction of equal MinHash components. The equal-
    * component count is the native codegen kernel
    * [[graft.functions.SigEqCount]] (bit-identical to the former
    * aggregate/zip_with HOF chain — see its scaladoc for the branch
    * mapping); divide and round stay declarative built-ins.
    */
  private def sigAgreement(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                           numHashes: Int) =
    round(graft.functions.SigEqCount(a, b).cast("double") / numHashes, 6)

  /** foreachBatch body. `maxBucket` is the usual hot-bucket valve on both
    * the index probe and the within-batch candidate stage.
    *
    * State growth pricing: `lsh_sigs` holds one row per CANONICAL doc
    * (numHashes longs + doc_id ≈ 8·numHashes B/row) and `lsh_postings`
    * `bands` rows per canonical — both linear in distinct-canonical mass
    * forever, inherent to dedup-against-everything-kept. `retentionBatches`
    * trades that for SLIDING-WINDOW near-dup semantics: once per window
    * both index tables prune to the last N batches (one atomic partitioned
    * rewrite each, amortized O(index/N) per batch), after which a near-dup
    * of a canonical older than the window reads as NEW — the documented
    * semantic change. None (default) keeps the unbounded exact behavior.
    */
  def processLshBatch(store: TableStore,
                      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      simThreshold: Double = 0.7,
                      maxBucket: Int = Dedup.DefaultMaxBucket,
                      compactFiles: Int = 64,
                      retentionBatches: Option[Long] = None)
                     (batch: DataFrame, bid: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._

    // 1. one signature pass per doc; band rows derived from it
    val sigs = Dedup.minHashSignatureArray(batch, "doc_id", "text", shingleSize, numHashes)
      .localCheckpoint(true)
    val bandRows = Dedup.lshBands(sigs, "doc_id", numHashes, bands)
      .withColumn("bp", bandPrefix(col("band_hash")))
      .localCheckpoint(true)

    // 2. bounded probe of the canonical index: only this batch's band-hash
    //    prefix partitions are read; earlier batches only (replay safety).
    //    The old side is count-gated per bucket BEFORE the join — a band
    //    hash shared by 10⁶ distinct canonicals (boilerplate signatures)
    //    would otherwise multiply every matching batch row by the full
    //    bucket; above the valve the bucket is dropped and the other
    //    bands provide recall, the maxBucket discipline throughout Dedup.
    val prefixes = bandRows.select("bp").distinct().collect().map(_.getInt(0)).toSeq
    val oldPostings = store.read(PostingsTable, postingsSchema)
      .filter(col("bp").isin(prefixes: _*) && col("batch_id") < bid)
    val coldBuckets = oldPostings.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") <= maxBucket).select("band", "band_hash")
    val oldPairs = bandRows
      .join(oldPostings.select(col("band"), col("band_hash"), col("doc_id").as("old_id"))
          .join(coldBuckets, Seq("band", "band_hash"), "left_semi"),
        Seq("band", "band_hash"))
      .select(col("doc_id"), col("old_id")).distinct()
      .localCheckpoint(true)

    // 3. signatures for the candidate OLD docs — partition-pruned by the
    //    candidates' doc prefixes (bounded: candidate set ≤ batch × valve)
    val oldSps = oldPairs.select(docPrefix(col("old_id")).as("sp")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val oldSigs =
      if (oldSps.isEmpty) spark.emptyDataset[(Long, Array[Long])].toDF("old_id", "old_sig")
      else store.read(SigsTable, sigsSchema).filter(col("sp").isin(oldSps: _*))
        .select(col("doc_id").as("old_id"), col("sig").as("old_sig"))
    val oldMatches = oldPairs
      .join(sigs, "doc_id")
      .join(oldSigs, "old_id")
      .withColumn("est_jaccard", sigAgreement(col("sig"), col("old_sig"), numHashes))
      .filter(col("est_jaccard") >= simThreshold)
      .select(col("doc_id"), col("old_id"), col("est_jaccard"))
      .localCheckpoint(true)

    // 4. within-batch candidates (count-gated buckets via candidatePairs),
    //    verified by the same estimator, collapsed via CC so chains keep
    //    their min-id member
    val inBatchPairs = Dedup.candidatePairs(bandRows, "doc_id", Some(maxBucket))
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("__sa")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("__sb")), "id_b")
      .withColumn("est_jaccard", sigAgreement(col("__sa"), col("__sb"), numHashes))
      .filter(col("est_jaccard") >= simThreshold)
      .select("id_a", "id_b", "est_jaccard")
    val labels = Dedup.connectedComponents(
      inBatchPairs.select("id_a", "id_b"), "id_a", "id_b")
      .select(col("id").as("doc_id"), col("label"))

    // 5. verdicts. Precedence: an old-index match beats in-batch identity
    //    (the corpus saw it first); a doc whose batch-canonical matched an
    //    old doc resolves to that old doc too. est_jaccard reports the
    //    estimator that triggered the verdict (the old match's, else the
    //    best in-batch pair's — only ever computed values, never inferred
    //    across a CC chain).
    val bestOld = oldMatches
      .groupBy("doc_id")
      .agg(max(struct(col("est_jaccard"), (-col("old_id")).as("__nid"))).as("__m"))
      .select(col("doc_id"), (-col("__m.__nid")).as("dup_of_old"),
        col("__m.est_jaccard").as("old_sim"))
    // best computed estimator over BOTH pair sides: a CC member can appear
    // only as id_a of its surviving pairs (e.g. pairs (3,9) and (5,9) from
    // two different bands put 5 in component {3,5,9} with 5 never an id_b),
    // so aggregating one side alone would leave a real dup with a null
    // estimator. The group minimum also gets an in_sim here; the verdict
    // select nulls est_jaccard whenever dup_of is null, preserving the
    // invariant est_jaccard non-null ⟺ dup verdict.
    val bestIn = inBatchPairs.select(col("id_a").as("doc_id"), col("est_jaccard"))
      .unionByName(inBatchPairs.select(col("id_b").as("doc_id"), col("est_jaccard")))
      .groupBy("doc_id")
      .agg(max("est_jaccard").as("in_sim"))
    val withLabel = sigs.select(col("doc_id"), col("sig"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("canon", coalesce(col("label"), col("doc_id")))
    val canonOld = bestOld.select(col("doc_id").as("canon"),
      col("dup_of_old").as("canon_dup_of"))
    val verdicts = withLabel
      .join(bestOld, Seq("doc_id"), "left")
      .join(bestIn, Seq("doc_id"), "left")
      .join(canonOld, Seq("canon"), "left")
      .withColumn("dup_of",
        coalesce(col("dup_of_old"),
          when(col("canon") =!= col("doc_id"),
            coalesce(col("canon_dup_of"), col("canon")))))
      .select(
        lit(bid).as("batch_id"),
        col("doc_id"),
        col("sig"),
        col("dup_of"),
        when(col("dup_of").isNotNull,
          coalesce(col("old_sim"), col("in_sim"))).as("est_jaccard"))
      .withColumn("is_new", when(col("dup_of").isNull, 1).otherwise(0).cast("int"))
      .localCheckpoint(true)

    store.deleteRange(VerdictTable, "batch_id", bid, bid)
    store.appendBucketed(VerdictTable,
      verdicts.select("batch_id", "doc_id", "is_new", "dup_of", "est_jaccard"),
      "batch_id")

    // 6. index growth: canonicals only, append-only-missing under replay.
    //    EACH table gates its append on ITS OWN already-landed rows: a
    //    crash between the two appends (sigs landed, postings not) must
    //    leave the postings append — not nothing — for the replay to redo,
    //    or those canonicals would be permanently invisible to later
    //    batches' index probes. Both probes prune to the KEPT docs'
    //    prefix partitions (bounded ≤256-int driver read); each append is
    //    one Spark write job, so per-doc presence is the right granule.
    val kept = verdicts.filter(col("is_new") === 1).select(col("doc_id"), col("sig"))
    val keptSps = kept.select(docPrefix(col("doc_id")).as("sp")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val alreadySigs =
      if (keptSps.isEmpty) kept.limit(0).select(col("doc_id"))
      else store.read(SigsTable, sigsSchema)
        .filter(col("sp").isin(keptSps: _*) && col("batch_id") === bid)
        .select(col("doc_id"))
    val freshSigs = kept.join(alreadySigs, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val keptBps = bandRows.join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("bp").distinct().collect().map(_.getInt(0)).toSeq
    val alreadyPostings =
      if (keptBps.isEmpty) kept.limit(0).select(col("doc_id"))
      else store.read(PostingsTable, postingsSchema)
        .filter(col("bp").isin(keptBps: _*) && col("batch_id") === bid)
        .select(col("doc_id")).distinct()
    val freshPostingDocs = kept.select("doc_id")
      .join(alreadyPostings, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    store.appendPartitioned(SigsTable,
      freshSigs.select(col("doc_id"), col("sig"), lit(bid).as("batch_id"),
        docPrefix(col("doc_id")).as("sp")), "sp")
    store.appendPartitioned(PostingsTable,
      bandRows.join(freshPostingDocs, Seq("doc_id"), "left_semi")
        .select(col("band"), col("band_hash"), col("doc_id"),
          lit(bid).as("batch_id"), col("bp")), "bp")

    // 7. bounded file counts: every batch lands one file-set per touched
    //    partition and nothing range-deletes the index, so without this
    //    the probe's open cost grows one file per batch per partition
    //    forever. Threshold-compact exactly the partitions this batch
    //    touched (listing cost scales with the batch); rows and their
    //    batch_id replay tags are unchanged, so the idempotency probes
    //    above see the identical index.
    store.compactPartitions(SigsTable, "sp", Some(keptSps), compactFiles)
    store.compactPartitions(PostingsTable, "bp", Some(keptBps), compactFiles)
    // sliding-window retention (see the scaladoc pricing note): prune once
    // per window — idempotent under replay (same keepFrom → same result)
    retentionBatches.foreach { r =>
      if (r > 0 && bid > 0 && bid % r == 0) {
        store.retainFrom(SigsTable, "batch_id", bid - r, "sp")
        store.retainFrom(PostingsTable, "batch_id", bid - r, "bp")
      }
    }
  }

  /** The processor wired as a streaming query. */
  def lshDedupStream(docs: org.apache.spark.sql.Dataset[StreamingText.Doc],
                     store: TableStore, checkpointDir: String,
                     shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
                     simThreshold: Double = 0.7) =
    docs.toDF().writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processLshBatch(store, shingleSize, numHashes, bands, simThreshold)(batch, bid): Unit
      }
      .start()
}
