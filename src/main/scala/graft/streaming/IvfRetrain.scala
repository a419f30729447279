package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chain.TableStore
import graft.operators.Similarity

/** The quantizer-maintenance loop that closes the IVF index lifecycle:
  * [[StreamingSimilarity.processEmbeddingBatch]] GROWS the posting lists
  * under a fixed coarse quantizer, `Similarity.postingListStats` (s16)
  * GRADES cell balance, and `Similarity.kmeansStep` (s4) RE-TRAINS — but
  * until round 15 nothing triggered re-training or swapped centroids
  * atomically. This object is that trigger: when the maintained index's
  * cell imbalance crosses a threshold (data drift — embeddings no longer
  * match the distribution the quantizer was trained on), run N Lloyd
  * rounds on a deterministic sample, re-assign the corpus to the new
  * centroids, CHECK RECALL against the exact top-k on a probe sample,
  * and only then promote centroids + postings through the store's
  * staged-swap discipline (one ordered marker-flip pair in manifest
  * mode, directory swaps in rename mode — the same protocol as the
  * ingest ledger). A retrain that does not improve the index never
  * replaces it. The reference's analogue is the token-registry
  * reload-on-change lifecycle (store/store.go:98-113): maintained state
  * refreshed from its own telemetry, not by operator intervention.
  *
  * Crash window: the pair promotes centroids THEN postings, so a crash
  * between the two leaves new centroids over old postings. [[consistent]]
  * detects exactly that state (postings assigned to centroid ids the
  * centroid table no longer carries, or under a stale assignment) and the
  * next [[maybeRetrain]] call rebuilds unconditionally — the loop
  * converges instead of serving a mixed generation forever.
  *
  * 100 TB shape: the imbalance probe is one count-per-cell aggregation of
  * the postings table (≤ |centroids| rows collect); Lloyd rounds run on a
  * hash-sampled slice with broadcast centroids (no corpus shuffle — see
  * kmeansStep); the rebuild re-assigns the corpus in ONE broadcast pass
  * and writes back through the partitioned layout the query face prunes
  * on; the recall gate runs |probes| brute-force rows, probes bounded by
  * config.
  */
object IvfRetrain {

  val CentroidsTable = "ivf_centroids"
  val PostingsTable  = "ivf_postings"

  final case class Report(
      nVectors: Long, nCells: Long, imbalance: Double,
      triggered: Boolean, swapped: Boolean,
      recallBefore: Option[Double], recallAfter: Option[Double])

  /** Cell imbalance of the maintained postings: max cell size over the
    * mean cell size, where the mean's denominator is `totalCells` — the
    * CENTROID count, not the occupied-cell count — when given. The
    * distinction is total collapse: a fully-drifted quantizer that
    * funnels ALL mass into ONE cell has max = total and ONE occupied
    * cell, so an occupied-cell mean reads imbalance = 1.0 (perfectly
    * balanced) and the trigger never fires; with the centroid count in
    * the denominator the empty cells drag the mean down and the same
    * state reads imbalance = |centroids| — the worst value, as it should.
    * 1.0 = perfectly balanced; the ratio grows without bound under drift
    * (the s16 telemetry, reduced to one trigger number). Cost: one
    * combine-friendly count aggregation, ≤ |centroids| rows to the
    * driver. Returns (nVectors, occupiedCells, imbalance).
    */
  def imbalance(postings: DataFrame, totalCells: Option[Long] = None): (Long, Long, Double) = {
    val counts = postings.groupBy("centroid_id").count()
      .collect().map(_.getLong(1))
    if (counts.isEmpty) (0L, 0L, 1.0)
    else {
      val total = counts.sum
      val cells = math.max(totalCells.getOrElse(counts.length.toLong), counts.length.toLong)
      (total, counts.length.toLong,
        counts.max.toDouble * cells / total.toDouble)
    }
  }

  /** The postings/centroids pair is consistent iff sampled posting rows
    * are assigned to their true nearest centroid under the CURRENT table
    * (the staged-swap crash window leaves new centroids over old
    * postings — often the same ids with a stale assignment, so id
    * containment alone can't see it). The audit runs on a
    * `auditPermille` hash sample — a crashed pair misassigns essentially
    * every row, so a thin deterministic sample catches it while keeping
    * the per-check cost a fraction of one index pass. A sample that
    * selects ZERO rows (a small index under the default 10‰) must not
    * pass vacuously — a crashed pair would read consistent until
    * imbalance happened to cross the threshold — so the audit falls back
    * to the full postings table when the sample is empty (an index small
    * enough to empty the sample is small enough to audit whole).
    */
  def consistent(postings: DataFrame, centroids: DataFrame,
                 auditPermille: Int = 10): Boolean = {
    val base = postings
      .filter(pmod(xxhash64(col("vec_id")), lit(1000L)) < auditPermille)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val sampled =
      (if (base.isEmpty) postings.select(col("vec_id"), col("embedding"), col("centroid_id"))
       else base).localCheckpoint(true)
    val misassigned = Similarity
      .assignToCentroids(sampled.drop("centroid_id"), centroids, "vec_id", "embedding")
      .withColumnRenamed("centroid_id", "__true_cid")
      .join(sampled.select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
      .filter(col("__true_cid") =!= col("centroid_id"))
      .limit(1).count()
    misassigned == 0L
  }

  /** `rounds` Lloyd iterations over `vectors` starting from `centroids`:
    * new component = exact-decimal mean of the members' (rounded)
    * components; a cell with no members keeps its previous centroid
    * (reseeding policy: hold position rather than teleport). Each round's
    * result is localCheckpoint'ed so round k doesn't replay rounds 1..k−1.
    */
  def lloydRounds(vectors: DataFrame, centroids: DataFrame, rounds: Int): DataFrame = {
    var cents = centroids
    (0 until rounds).foreach { _ =>
      val step = Similarity.kmeansStep(vectors, cents, "vec_id", "embedding")
      val updated = step
        .withColumn("__comp",
          (col("comp_sum") / col("n").cast("double")).cast("float"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("__comp")))).as("__ps"))
        .select(col("centroid_id").as("vec_id"),
          transform(col("__ps"), p => p("__comp")).as("__new"))
      cents = cents.join(updated, Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("__new"), col("embedding")).as("embedding"))
        .localCheckpoint(true)
    }
    cents
  }

  /** Mean recall@k of the IVF result under `cents` vs the exact top-k —
    * the s19 grade, reduced to the one number the swap gate compares.
    */
  private def meanRecall(corpus: DataFrame, probes: DataFrame, cents: DataFrame,
                         k: Int, nProbe: Int): Double = {
    val exact  = Similarity.bruteForceTopK(corpus, probes, "vec_id", "embedding", k)
    val approx = Similarity.ivfTopK(corpus, probes, cents, "vec_id", "embedding", k, nProbe)
    val r = Similarity.annRecall(exact, approx, "vec_id")
      .agg(avg(col("recall"))).collect()(0)
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** The maintenance decision, run after each embedding batch (the
    * `retrain` face): measure imbalance; when it crosses `threshold` (or
    * the pair is inconsistent after a crashed swap), retrain on a
    * `samplePermille` slice, re-assign, and promote ONLY if mean
    * recall@k on `nProbes` deterministic probes did not drop.
    */
  def maybeRetrain(spark: SparkSession, store: TableStore,
                   threshold: Double = 3.0, rounds: Int = 3,
                   samplePermille: Int = 250, nProbes: Int = 16,
                   k: Int = 10, nProbe: Int = 4,
                   auditPermille: Int = 10): Report = {
    val postings = store.readOr(PostingsTable, null)
    if (postings == null) return Report(0L, 0L, 1.0, triggered = false,
      swapped = false, None, None)
    val cents = store.readOr(CentroidsTable, null)
    if (cents == null) return Report(0L, 0L, 1.0, triggered = false,
      swapped = false, None, None)
    // the no-op path pays only the centroid_id-column count aggregation
    // plus the thin sampled audit — the full corpus is NOT materialized
    // until a trigger fires. The imbalance denominator is the CENTROID
    // count (a tiny-table count), so a totally collapsed quantizer (all
    // mass in one cell, every other cell empty) reads |centroids|, not a
    // vacuous 1.0. The consistency audit runs INDEPENDENTLY of the drift
    // trigger: a pair that is both drifted and crash-inconsistent must
    // take the unconditional-rebuild path, not the recall gate — the
    // mixed-generation postings are not a coherent recall baseline, and
    // a baseline that happened to grade well would refuse the swap
    // forever, serving the crashed pair indefinitely.
    val (nVec, nCells, imb) = imbalance(postings, Some(cents.count()))
    val drifted = imb > threshold
    val crashed = !consistent(postings, cents, auditPermille)
    if (!drifted && !crashed)
      return Report(nVec, nCells, imb, triggered = false, swapped = false, None, None)

    // dropDuplicates: a crash between the postings promote and a batch
    // replay can land the SAME vec_id under two generations' cells (the
    // replay's anti-join probes only the batch's new-cid partitions);
    // without the dedup the rebuild would bake both copies in forever —
    // inflated counts and duplicate top-k neighbors
    val corpus = postings.select(col("vec_id"), col("embedding"))
      .dropDuplicates("vec_id")
      .localCheckpoint(true) // read once; consumed by sample/assign/recall
    val sample = corpus.filter(pmod(xxhash64(col("vec_id")), lit(1000L)) < samplePermille)
    val newCents = lloydRounds(sample, cents, rounds)
    // probes: the nProbes lowest xxhash64 values — a deterministic
    // distribution-representative slice (TakeOrderedAndProject, bounded
    // heap per partition, no full sort). orderBy(vec_id) would grade
    // recall on the lowest-id (oldest) vectors — the slice LEAST affected
    // by the drift that triggered the retrain.
    val probes = corpus.orderBy(xxhash64(col("vec_id"))).limit(nProbes).localCheckpoint(true)
    val before = meanRecall(corpus, probes, cents, k, nProbe)
    val after  = meanRecall(corpus, probes, newCents, k, nProbe)
    // the recall gate: a retrain that grades worse than the live index
    // must never replace it (crashed-pair rebuilds always proceed — the
    // live pair is not a coherent baseline)
    if (after < before && !crashed)
      return Report(nVec, nCells, imb, triggered = true, swapped = false,
        Some(before), Some(after))
    val reassigned = Similarity
      .assignToCentroids(corpus, newCents, "vec_id", "embedding")
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    // staged swap: both tables written before either promotes; promote
    // order centroids → postings (see the crash-window note above)
    val (stage, promote) = store.stageReplaceAll(
      Seq(CentroidsTable -> newCents, PostingsTable -> reassigned),
      partitionBy = Map(PostingsTable -> "centroid_id"))
    stage.foreach(_.apply())
    promote()
    Report(nVec, nCells, imb, triggered = true, swapped = true,
      Some(before), Some(after))
  }
}
