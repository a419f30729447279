package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two tiers, as a 100 TB pipeline needs:
  *   - brute-force cosine top-k: exact; probes broadcast, corpus streamed —
  *     one pass over the corpus, no shuffle of the corpus side;
  *   - LSH-bucketed ANN (random-hyperplane signatures): candidates only
  *     meet within a bucket, turning all-pairs into a keyed join.
  *
  * All math is column expressions (sequential left-to-right folds), which
  * keeps results deterministic and plans inside whole-stage codegen.
  */
object Similarity {

  /** Sequential dot product of two float-array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity; 0 when either vector has zero norm. Evaluated by
    * the native codegen'd [[graft.functions.CosineSimExpr]] — the
    * declarative `when(nn === 0, 0)/otherwise(dot/nn)` HOF chain this
    * replaces ran interpreted (higher-order functions never enter
    * whole-stage codegen) and cosine is the per-candidate kernel of the
    * entire similarity tier. Same arithmetic, branch for branch:
    * left-to-right double folds, zero-norm → 0.0, length mismatch or
    * null element → NULL.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim(a, b)

  /** Bounded per-probe top-k — `groupBy(probe_id).agg(CollectTopK)` in
    * place of a `row_number` window. The window form moved the FULL
    * candidate relation (|probes|·|corpus| rows at the exact tier)
    * through its ranking exchange; here every mapper keeps at most k
    * rows per probe in a bounded priority queue and partials merge
    * associatively (the min-k semilattice — the a17/argmax algebra), so
    * the shuffle carries ≤ |probes|·k rows no matter the corpus size.
    * Ranks are recovered by sorting the ≤k survivors IN-ROW.
    *
    * `ordKey` must be ascending-is-better and UNIQUE per probe (every
    * caller composes (±score, id), ties to the lowest id — identical to
    * the windows this replaces). NaN scores: the old desc window put NaN
    * first, the bottom-k ordering sorts NaN last; the tiers only rank
    * round()ed finite sims, so no caller sees the divergence.
    */
  private[graft] def topKPerProbe(scored: DataFrame, ordKey: Column, k: Int,
                                  rankName: String): DataFrame =
    TopK.perGroup(scored, Seq("probe_id"), ordKey, k, rankName)

  /** (−sim, id): the bottom-k ordering key for "highest similarity, ties
    * to the lowest id" — negating the round()ed sim flips desc into the
    * bounded aggregate's ascending world with no precision loss.
    */
  private[graft] def descKey(sim: Column, id: Column): Column =
    struct((-sim).as("s"), id.as("i"))

  /** (score, id): ascending-is-better key (distances, Hamming). */
  private def ascKey(score: Column, id: Column): Column =
    struct(score.as("s"), id.as("i"))

  /** Exact top-k cosine neighbors for each probe vector.
    *
    * The probe set is broadcast (it is small by construction — a query
    * batch), so the corpus is scanned once with no shuffle; ranking is
    * the bounded [[topKPerProbe]] aggregate, so only |probes|·k
    * pre-combined rows ever cross an exchange — a row_number window here
    * would move the full |probes|·|corpus| candidate relation through
    * the ranking shuffle. Self-matches are excluded.
    *
    * @param corpus (id, vec) as (Long, Array[Float]) columns named idCol/vecCol
    * @param probes same schema; ids disjoint or equal to corpus ids
    */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pvec")))
    val scored = corpus
      .join(p, col(idCol) =!= col("probe_id"))
      .withColumn("sim", round(cosine(col("__pvec"), col(vecCol)), 6))
      .drop("__pvec")
    topKPerProbe(scored, descKey(col("sim"), col(idCol)), k, "rank")
  }

  /** Radius (range) search: every corpus vector within cosine ≥ `minSim`
    * of each probe — the thresholded counterpart of [[bruteForceTopK]]
    * (near-dup candidate generation and recall-oriented retrieval ask
    * "everything this close", not "the k closest"). Same broadcast-probe /
    * stream-corpus shape, but with NO per-probe window: the threshold
    * filters inside the scan, so at 100 TB this is a map-only pass over
    * the corpus — zero shuffles beyond whatever ordering the caller adds.
    */
  def rangeSearch(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, minSim: Double): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pvec")))
    corpus
      .join(p, col(idCol) =!= col("probe_id"))
      .withColumn("sim", round(cosine(col("__pvec"), col(vecCol)), 6))
      .filter(col("sim") >= minSim)
      .drop("__pvec")
  }

  /** Hard-negative mining for contrastive training: per probe, the top-k
    * most-similar corpus vectors whose label DIFFERS from the probe's —
    * the highest-value negatives for a triplet/InfoNCE batch (random
    * negatives are mostly easy and teach the model little). Same
    * broadcast-probe / stream-corpus shape as [[bruteForceTopK]]: one
    * corpus pass, ranking via the bounded per-probe top-k aggregate.
    */
  def hardNegatives(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("__pvec"), col(labelCol).as("__plabel")))
    val scored = corpus
      .join(p, col(idCol) =!= col("probe_id") && col(labelCol) =!= col("__plabel"))
      .withColumn("sim", round(cosine(col("__pvec"), col(vecCol)), 6))
      .drop("__pvec", "__plabel")
    topKPerProbe(scored, descKey(col("sim"), col(idCol)), k, "rank")
  }

  /** Per-label centroid cohesion scoring — the embedding-space quality
    * filter (CLIP-score-style outlier screening): each vector scores by
    * cosine to its OWN label's mean vector; low scores are mislabeled or
    * off-distribution candidates a curation pass drops.
    *
    * Determinism at scale: centroid components accumulate as
    * round(·,4)-then-DECIMAL sums (the [[kmeansStep]] trick), so the
    * centroid — and therefore every score — is independent of partition
    * order and bit-identical across engines; a raw double sum would drift
    * run-to-run. Shape: one narrow (label, dim, component) aggregation
    * with map-side combine, then a broadcast join of |labels| centroids
    * back onto the corpus — the corpus itself never shuffles.
    *
    * Centroid means divide by the label's ROW count (not by how many
    * vectors carry each dimension), so a vector shorter than its label's
    * widest contributes zeros for its missing trailing dims — zero-padded
    * semantics, identical to the oracle's fixed-width formulation, and the
    * two stay in agreement even on ragged inputs.
    */
  def labelCentroidScores(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String): DataFrame = {
    val labelRows = df.groupBy(col(labelCol).as("__lbl")).agg(count(lit(1)).as("__n"))
    val comps = df
      .select(col(labelCol).as("__lbl"), posexplode(col(vecCol)).as(Seq("__dim", "__c")))
      .groupBy("__lbl", "__dim")
      .agg(sum(round(col("__c").cast("double"), 4).cast("decimal(38,6)")).as("__sum"))
      .join(broadcast(labelRows), Seq("__lbl"))
      .select(col("__lbl"), col("__dim"),
        (col("__sum").cast("double") / col("__n")).as("__mean"))
    val centroids = comps
      .groupBy("__lbl")
      .agg(transform(array_sort(collect_list(struct(col("__dim"), col("__mean")))),
        s => s.getField("__mean")).as("__cvec"))
    df.join(broadcast(centroids), col(labelCol) === col("__lbl"))
      .withColumn("centroid_sim", round(cosine(col(vecCol), col("__cvec")), 6))
      .drop("__lbl", "__cvec")
  }

  /** Deterministic pseudo-random hyperplane component: a fixed integer
    * lattice mapped to [-9, 9], reproducible in any engine — the ANN
    * variant stays testable against an oracle.
    */
  private[graft] def planeWeight(plane: Int, dim: Int): Double =
    graft.functions.SignProjection.planeWeight(plane, dim)

  /** Sign-random-projection bucket id over `nPlanes` hyperplanes, via the
    * native `SignProjectionExpr` (codegen'd loops — the declarative
    * nPlanes·dim-term tree evaluated ~1000 boxed nodes per row).
    */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    graft.functions.SignProjection(vec, dim, nPlanes)

  /** Default hot-bucket valve for [[lshTopK]]: the same skew discipline
    * as [[Dedup.DefaultMaxBucket]] — a bucket shared by >10k corpus
    * vectors (e.g. near-zero vectors all signing to the same code) makes
    * one probe's candidate list a meaningful fraction of the corpus, and
    * production LSH drops such buckets as uninformative rather than
    * letting the candidate join go quadratic-hot. Far above anything the
    * test scale factors produce, so small-scale results stay exact.
    */
  val DefaultMaxLshBucket: Int = Dedup.DefaultMaxBucket

  /** The corpus-bucket size gate behind [[lshTopK]]: buckets holding more
    * than `maxBucket` corpus vectors are excluded BEFORE the candidate
    * join. Sizes come first as a combine-friendly count (never a row
    * list), and the ≤2^nPlanes surviving bucket ids broadcast into a
    * semi-join — the corpus itself neither shuffles nor sorts for the
    * gate.
    */
  private def gatedCorpusBuckets(corpus: DataFrame, vecCol: String,
                                 dim: Int, nPlanes: Int,
                                 maxBucket: Option[Int]): DataFrame = {
    val c = corpus.withColumn("__bucket", lshBucket(col(vecCol), dim, nPlanes))
    maxBucket.fold(c) { m =>
      val ok = c.groupBy("__bucket").agg(count(lit(1)).as("__cnt"))
        .filter(col("__cnt") <= m).select("__bucket")
      c.join(broadcast(ok), Seq("__bucket"), "left_semi")
    }
  }

  /** The report half of the [[lshTopK]] valve: the buckets the gate
    * drops, with their sizes — a run that caps coverage must say what it
    * dropped, not read as "covered everything".
    */
  def lshDroppedBuckets(corpus: DataFrame, vecCol: String,
                        dim: Int, nPlanes: Int,
                        maxBucket: Int = DefaultMaxLshBucket): DataFrame =
    corpus.withColumn("__bucket", lshBucket(col(vecCol), dim, nPlanes))
      .groupBy(col("__bucket").as("bucket")).agg(count(lit(1)).as("n_dropped"))
      .filter(col("n_dropped") > maxBucket)

  /** Approximate NN: probes and corpus hash into sign-projection buckets;
    * candidates meet only within a bucket (keyed equi-join — shuffle on
    * bucket id instead of a cross product), then exact cosine + bounded
    * per-probe top-k. Recall is tuned by nPlanes (fewer planes = bigger
    * buckets = higher recall, more compute).
    *
    * `maxBucket` is the hot-bucket valve ([[gatedCorpusBuckets]]): a
    * degenerate bucket — all-zero vectors sign identically — would
    * otherwise make one probe's candidate list the corpus. Dropped
    * buckets are enumerable via [[lshDroppedBuckets]]; pass `None` for
    * the exact ungated contract.
    */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, dim: Int, nPlanes: Int, k: Int,
      maxBucket: Option[Int] = Some(DefaultMaxLshBucket)): DataFrame = {
    val c = gatedCorpusBuckets(corpus, vecCol, dim, nPlanes, maxBucket)
    val p = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pvec"))
      .withColumn("__bucket", lshBucket(col("__pvec"), dim, nPlanes))
    val scored = c.join(p, Seq("__bucket"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("sim", round(cosine(col("__pvec"), col(vecCol)), 6))
      .drop("__pvec", "__bucket")
    topKPerProbe(scored, descKey(col("sim"), col(idCol)), k, "rank")
  }

  /** Nearest-centroid assignment: each vector gets the id of its
    * highest-cosine centroid (ties → lowest centroid id).
    *
    * Shape: the centroid table folds into ONE row — a sorted array of
    * (cid, cvec, ‖cvec‖) structs — broadcast keylessly onto the corpus
    * (the r4/t11 one-row-scalar topology), and the argmax runs per row in
    * the native codegen'd [[graft.functions.NearestCentroid]] loop. No
    * n·k candidate relation ever exists, so the assignment adds ZERO
    * shuffle to the corpus: earlier forms either moved n·k rows through
    * a window exchange or (max_by with a struct-of-array buffer) fell
    * into a per-task SortAggregate over n·k rows — this is a map-only
    * pass, and the broadcast is the same k·dim floats those forms
    * shipped anyway (k ≈ √n in a production IVF, ~25 MB at k=100k,
    * dim=64). Empty centroid input yields an empty result, matching the
    * join-based original.
    */
  /** The centroid table folded into ONE broadcast row — a sorted array of
    * (cid, cvec, ‖cvec‖) structs — the input shape of the native argmax
    * expressions. Empty centroid input yields an empty relation, so the
    * keyless join with it produces no rows (matching the join-based
    * original's behavior on empty centroids).
    */
  private def centroidRow(centroids: DataFrame, idCol: String, vecCol: String): DataFrame =
    broadcast(
      centroids
        .groupBy()
        .agg(array_sort(collect_list(struct(
          col(idCol).cast("long").as("cid"),
          col(vecCol).as("cvec"),
          sqrt(norm2(col(vecCol))).as("cnorm")))).as("__cents"))
        .where(size(col("__cents")) > 0))

  def assignToCentroids(df: DataFrame, centroids: DataFrame,
                        idCol: String, vecCol: String): DataFrame = {
    val idType = centroids.schema(idCol).dataType
    df.crossJoin(centroidRow(centroids, idCol, vecCol))
      .withColumn("centroid_id",
        graft.functions.NearestCentroid(col(vecCol), col("__cents")).cast(idType))
      .drop("__cents")
  }

  /** One Lloyd iteration's M-step for training the IVF coarse quantizer,
    * in map-reduce form: after nearest-centroid assignment, emit per
    * (centroid, dimension) the member count and the EXACT component sum —
    * the consumer divides sum/n for the new centroid (and reseeds empty
    * cells). Components round to 4 decimals (under float32's noise floor)
    * and sum as DECIMAL, so the result is independent of partition order
    * and bit-identical across engines — a raw double sum would differ
    * run-to-run with Spark's nondeterministic reduce order.
    *
    * Scale shape: assignment broadcasts the centroids (no corpus
    * shuffle); the explode keeps rows narrow (centroid, dim, component);
    * the aggregation map-side combines down to k·dim rows.
    */
  def kmeansStep(df: DataFrame, centroids: DataFrame,
                 idCol: String, vecCol: String): DataFrame =
    assignToCentroids(df, centroids, idCol, vecCol)
      .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("dim", "__comp")))
      .groupBy("centroid_id", "dim")
      .agg(
        sum(round(col("__comp").cast("double"), 4).cast("decimal(38,6)"))
          .cast("double").as("comp_sum"),
        count(lit(1)).as("n"))

  /** Deterministic product-quantization codebook entry (exact
    * quarter-integer lattice — see graft.functions.PqEncode.codeWeight).
    */
  private[graft] def pqCodeWeight(sub: Int, j: Int, t: Int): Double =
    graft.functions.PqEncode.codeWeight(sub, j, t)

  /** Product-quantization encoding — the memory tier under IVF for
    * billion-vector search (IVF-PQ): the vector splits into `m`
    * subvectors, each snapping to its nearest of `k` per-subspace
    * centroids (squared L2, first index wins ties); the code packs into
    * one BIGINT, nibble per subspace for the default m=8, k=16 — a
    * 256-byte float vector compresses to 8 bytes, which is what lets a
    * posting list live in executor memory at corpus scale.
    *
    * Per-row math with no shuffle or join, via the native
    * `PqEncodeExpr` Catalyst expression (`doGenCode` → tight JVM loops
    * inside whole-stage codegen): the declarative dim·k-term tree this
    * replaces evaluated thousands of boxed nodes per row. Codes are
    * reproducible across engines — exact-lattice codebooks, fixed fold
    * order, lowest-index tie-break.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               dim: Int = 64, m: Int = 8, k: Int = 16): DataFrame = {
    require(m > 0 && dim % m == 0, "dim must divide into m subspaces")
    require(k > 1 && m * math.log(k) / math.log(2) <= 62,
      "packed code must fit a long")
    df.select(col(idCol),
      graft.functions.PqEncode(col(vecCol), dim, m, k).as("pq_code"))
  }

  /** PQ-approximate top-k by asymmetric distance computation (ADC) — the
    * search half of IVF-PQ: the corpus participates as 8-BYTE packed codes
    * (from `pqEncode`), probes stay raw, and each (probe, code) pair costs
    * one native `PqAdcExpr` evaluation instead of a 64-dim float scan.
    *
    * Scale shape: identical join topology to the exact tier (probes
    * broadcast, corpus streamed once — the s1 pattern), but the streamed
    * side is 32× narrower; at a billion vectors the code relation is what
    * actually fits in executor memory. Ranking is ascending approximate
    * distance, ties to the lower id; distances are bit-exact across
    * engines (lattice codebooks, fixed fold order), so the whole ANN
    * result is oracle-checkable.
    */
  def pqAdcTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int = 64, m: Int = 8, kCent: Int = 16): DataFrame = {
    val codes = pqEncode(corpus, idCol, vecCol, dim, m, kCent)
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pvec")))
    val scored = codes
      .join(p, col(idCol) =!= col("probe_id"))
      .withColumn("adist",
        graft.functions.PqEncode.adcColumn(col("__pvec"), col("pq_code"), dim, m, kCent))
      .select(col("probe_id"), col(idCol), col("adist"))
    topKPerProbe(scored, ascKey(col("adist"), col(idCol)), k, "rank")
      .select(col("probe_id"), col("rank"), col(idCol), col("adist"))
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path:
    * the corpus is assigned once to its nearest coarse centroid (the
    * posting lists); a probe ranks centroids, visits only its `nProbe`
    * nearest lists, and runs exact cosine inside them. Versus LSH buckets
    * this trades hash independence for data-adaptive cells. The centroid
    * set is caller-supplied (deterministic sample or trained means), so
    * results are reproducible in any engine.
    *
    * Scale shape: assignment is a broadcast cross join (no corpus
    * shuffle), posting-list probing is an equi-join on centroid_id —
    * |probes|·nProbe lists instead of the full corpus.
    */
  def ivfTopK(
      corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val posted = assignToCentroids(corpus, centroids, idCol, vecCol)
    val probeLists = probeNearestLists(probes, centroids, idCol, vecCol, nProbe)
    val scored = posted.join(probeLists, Seq("centroid_id"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("sim", round(cosine(col("__pvec"), col(vecCol)), 6))
      .select(col("probe_id"), col(idCol), col("sim"))
    topKPerProbe(scored, descKey(col("sim"), col(idCol)), k, "rank")
      .select(col("probe_id"), col("rank"), col(idCol), col("sim"))
  }

  /** The coarse-probing stage shared by [[ivfTopK]]/[[ivfPqTopK]]: each
    * probe's `nProbe` highest-cosine centroids (ties → lowest id), as
    * (probe_id, __pvec, centroid_id). Centroids broadcast; the ranking is
    * the bounded per-probe aggregate, so even a large probe batch never
    * moves its |probes|·|centroids| scored relation through an exchange —
    * only |probes|·nProbe rows survive the combine.
    */
  private[graft] def probeNearestLists(probes: DataFrame, centroids: DataFrame,
                                       idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val c = broadcast(centroids.select(col(idCol).as("__cid"), col(vecCol).as("__cvec")))
    val scored = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pvec"))
      .crossJoin(c)
      .select(col("probe_id"), col("__pvec"), col("__cid"),
        round(cosine(col("__pvec"), col("__cvec")), 6).as("__csim"))
    topKPerProbe(scored, descKey(col("__csim"), col("__cid")), nProbe, "__rn")
      .select(col("probe_id"), col("__pvec"), col("__cid").as("centroid_id"))
  }

  /** IVF-PQ composed search — the index family actually deployed at
    * billion-vector scale: an IVF coarse quantizer for pruning, PQ codes
    * for in-list distances. The corpus is assigned ONCE to posting lists
    * and stored as (centroid_id, id, 8-byte pq_code) — 16 bytes per
    * vector; a probe ranks the coarse centroids, visits only its
    * `nProbe` nearest lists, and ranks THEIR members by asymmetric PQ
    * distance (the native codegen kernel), never touching a raw corpus
    * vector at query time.
    *
    * Scale shape: the index build is one corpus pass (centroids
    * broadcast for assignment, PQ encode per-row codegen — no corpus
    * shuffle); at query time the |probes|·nProbe probe-list relation
    * broadcasts and joins the posted codes on centroid_id, so the
    * corpus side streams once, 16 bytes wide. Exact-lattice codebooks
    * keep every distance bit-reproducible across engines, so even the
    * composed index is oracle-checkable. With `nProbe` ≥ the centroid
    * count the result is identical to [[pqAdcTopK]] (the full-scan ADC
    * tier) — SimilaritySpec pins that equivalence.
    */
  def ivfPqTopK(
      corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int,
      dim: Int = 64, m: Int = 8, kCent: Int = 16): DataFrame = {
    val posted = assignToCentroids(corpus, centroids, idCol, vecCol)
      .select(col("centroid_id"), col(idCol),
        graft.functions.PqEncode(col(vecCol), dim, m, kCent).as("pq_code"))
    val probeLists = probeNearestLists(probes, centroids, idCol, vecCol, nProbe)
    val scored = posted.join(broadcast(probeLists), Seq("centroid_id"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("adist",
        graft.functions.PqEncode.adcColumn(col("__pvec"), col("pq_code"), dim, m, kCent))
      .select(col("probe_id"), col(idCol), col("adist"))
    topKPerProbe(scored, ascKey(col("adist"), col(idCol)), k, "rank")
      .select(col("probe_id"), col("rank"), col(idCol), col("adist"))
  }

  /** Recall@k of an approximate-neighbor result against the exact one —
    * the acceptance metric every ANN deployment computes before trusting
    * an index (an IVF/LSH configuration is chosen BY its recall/latency
    * point). Both inputs are result relations shaped like
    * [[bruteForceTopK]]/[[lshTopK]]/[[ivfTopK]] output: (probe_id, rank,
    * `idCol`, sim). Per probe: exact neighbors found, approximate hits
    * among them, recall = hits / exact. Probes the approximate side with
    * a left-semi join on (probe, neighbor) — at scale both relations are
    * |probes|·k rows, tiny next to the corpus, so this is a cheap keyed
    * join no matter the corpus size.
    * join no matter the corpus size.
    *
    * The probe universe is the UNION of both sides: a probe present only
    * in the approximate result (the exact side was accidentally narrowed
    * upstream) surfaces as a row with n_exact = 0 and null recall rather
    * than silently vanishing — a 10-row result over a 100-probe approx
    * set must look wrong, not complete.
    */
  def annRecall(exact: DataFrame, approx: DataFrame, idCol: String): DataFrame = {
    val e = exact.select(col("probe_id"), col(idCol))
    val a = approx.select(col("probe_id"), col(idCol))
    val hits = e.join(a, Seq("probe_id", idCol), "left_semi")
      .groupBy("probe_id").agg(count(lit(1)).as("n_hit"))
    val probes = e.select("probe_id").union(a.select("probe_id")).distinct()
    probes
      .join(e.groupBy("probe_id").agg(count(lit(1)).as("__ne")), Seq("probe_id"), "left")
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("__ne"), lit(0L)).as("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall",
        when(col("n_exact") > 0,
          round(col("n_hit").cast("double") / col("n_exact").cast("double"), 6)))
  }

  /** Sign (1-bit) quantization of `n` consecutive dimensions starting at
    * 0-based `lo` into one BIGINT: bit i set iff component lo+i > 0. Packed
    * as two 32-bit halves by [[signHammingTopK]] — a 64th-bit shift
    * overflows in engines that range-check (and the half form scales to
    * any dim). 8 bytes per 32 dims: a 64-d corpus signs into 16 bytes/row.
    */
  def signPackHalf(vec: Column, lo: Int, n: Int): Column = {
    require(n >= 1 && n <= 32, "one 32-bit half per word")
    aggregate(
      zip_with(slice(vec, lo + 1, n), sequence(lit(0), lit(n - 1)),
        (x, i) => when(x.cast("double") > 0d,
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (a, v) => a.bitwiseOR(v))
  }

  /** Sign-quantized Hamming search with exact re-rank — the binary-
    * quantization ANN tier (16 bytes/vector at 64 dims, 32× smaller than
    * float32): Hamming distance over the packed sign bits shortlists
    * `rerank` candidates per probe, exact cosine re-ranks the shortlist
    * to the final top-k. Unlike LSH projections ([[lshTopK]]) the sign
    * bits ARE the data's own coordinates, so recall tracks the corpus
    * distribution with no tuning knob beyond `rerank`.
    *
    * Scale shape: the corpus streams ONCE as a (id, 2×BIGINT) relation —
    * raw vectors never enter the candidate join or the shortlist shuffle;
    * probes broadcast; only the |probes|·rerank shortlist (re-broadcast)
    * joins back to the corpus for float vectors. At deployment the sig
    * words would be a precomputed index column; here they fold into the
    * same scan.
    */
  def signHammingTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, dim: Int, rerank: Int, k: Int): DataFrame = {
    require(dim >= 2 && dim <= 64 && rerank >= k, "dim ≤ 64; rerank must cover k")
    val h = dim / 2
    def sigLo(v: Column) = signPackHalf(v, 0, h)
    def sigHi(v: Column) = signPackHalf(v, h, dim - h)
    val sigs = corpus.select(col(idCol), sigLo(col(vecCol)).as("__slo"),
      sigHi(col(vecCol)).as("__shi"))
    val p = broadcast(probes.select(col(idCol).as("probe_id"),
      sigLo(col(vecCol)).as("__plo"), sigHi(col(vecCol)).as("__phi")))
    val cand = sigs.join(p, col(idCol) =!= col("probe_id"))
      .withColumn("hamming",
        (bit_count(col("__slo").bitwiseXOR(col("__plo"))) +
          bit_count(col("__shi").bitwiseXOR(col("__phi")))).cast("int"))
      .select(col("probe_id"), col(idCol), col("hamming"))
    val shortlist =
      topKPerProbe(cand, ascKey(col("hamming"), col(idCol)), rerank, "__hr")
        .drop("__hr")
    val pv = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pvec")))
    val reranked = corpus.join(broadcast(shortlist), Seq(idCol))
      .join(pv, Seq("probe_id"))
      .withColumn("sim", round(cosine(col("__pvec"), col(vecCol)), 6))
      .select(col("probe_id"), col(idCol), col("hamming"), col("sim"))
    topKPerProbe(reranked, descKey(col("sim"), col(idCol)), k, "rank")
      .select(col("probe_id"), col("rank"), col(idCol), col("hamming"), col("sim"))
  }

  /** Matryoshka truncation agreement — the acceptance metric for serving
    * a prefix of an MRL-trained embedding (half the index bytes): per
    * probe, how much of the exact full-dimension top-k the `prefixDim`-
    * truncated cosine ranking retains (overlap@k), and the MSE between
    * full and truncated similarities over all candidate pairs. A prefix
    * that loses top-k overlap is not servable no matter how good its
    * average error looks, so both numbers matter.
    *
    * Determinism: similarities land in round-6 doubles before ranking
    * (ties → lowest id, both rankings); squared errors carry as
    * round-12 DECIMAL so the MSE sum is partition-order independent.
    * Scale: probes broadcast, the corpus streams once, and EVERYTHING —
    * both bounded top-k sets, the pair count, the error sum — folds in
    * ONE combine-friendly per-probe aggregation: each mapper holds two
    * ≤k priority queues per probe, so only |probes| pre-combined rows
    * cross the exchange (the windowed original moved the full
    * |probes|·|corpus| candidate relation through TWO ranking sorts).
    * The overlap is then set arithmetic on the two in-row id arrays.
    */
  def matryoshkaAgreement(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, prefixDim: Int, k: Int): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pvec")))
    val cand = corpus.join(p, col(idCol) =!= col("probe_id"))
      .withColumn("sim_full", round(cosine(col("__pvec"), col(vecCol)), 6))
      .withColumn("sim_trunc", round(cosine(
        slice(col("__pvec"), 1, prefixDim), slice(col(vecCol), 1, prefixDim)), 6))
      .select(col("probe_id"), col(idCol), col("sim_full"), col("sim_trunc"))
    val sq = round(pow(col("sim_full") - col("sim_trunc"), 2), 12).cast("decimal(28,12)")
    def topIds(sim: Column) = GraftSqlBridge.collectTopK(
      struct((-sim).as("s"), col(idCol).as("i")), k, reverse = true)
    def ids(c: Column) = transform(c, e => e.getField("i"))
    cand.groupBy("probe_id")
      .agg(count(lit(1)).as("n_pairs"),
        topIds(col("sim_full")).as("__tf"),
        topIds(col("sim_trunc")).as("__tt"),
        sum(sq).as("__se"))
      .withColumn("n_overlap",
        size(array_intersect(ids(col("__tf")), ids(col("__tt")))).cast("long"))
      .select(col("probe_id"), col("n_pairs"), col("n_overlap"),
        round(col("n_overlap").cast("double") / lit(k.toDouble), 6).as("overlap_at_k"),
        round(col("__se").cast("double") / col("n_pairs").cast("double"), 6).as("mse"))
  }

  /** Per-dimension corpus moments — the statistics a whitening/PCA
    * preprocessing step (or a drift monitor) needs before any projection:
    * for each embedding dimension, the vector count, mean, and population
    * variance. A dimension with near-zero variance is dead weight in
    * every distance computation; a drifting mean breaks pre-trained
    * quantizer codebooks.
    *
    * Shape: posexplode → one (dim)-keyed aggregation with map-side
    * combine — the s8 centroid plan without the join back, so the corpus
    * is scanned once and only 〈#dims〉 rows shuffle. Components round to
    * 4 decimals (the embedding ingestion discipline) and their squares to
    * 8, carried as DECIMAL so the sums are exact; mean and variance
    * divide in double at the end.
    */
  def dimensionMoments(df: DataFrame, vecCol: String): DataFrame = {
    val c  = round(col("__c").cast("double"), 4)
    val x  = c.cast("decimal(18,4)")
    val xx = (c * c).cast("decimal(28,8)")
    df.select(posexplode(col(vecCol)).as(Seq("dim", "__c")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n_vecs"), sum(x).as("__sx"), sum(xx).as("__sxx"))
      .withColumn("__mean", col("__sx").cast("double") / col("n_vecs").cast("double"))
      .select(col("dim"), col("n_vecs"),
        round(col("__mean"), 6).as("mean"),
        round(col("__sxx").cast("double") / col("n_vecs").cast("double")
          - col("__mean") * col("__mean"), 6).as("variance"))
  }

  /** Per-dimension POPULATION STABILITY INDEX between a reference
    * embedding snapshot and the current corpus — the standard drift gate a
    * production vector pipeline runs before trusting a frozen quantizer /
    * index / classifier against newly-embedded data (s11's moments see a
    * mean/variance shift; PSI sees SHAPE changes those miss — a
    * bimodal split, a tail migration). Per dim: fixed-width buckets over
    * [−1, 1) (clamped), add-one smoothing so empty buckets stay finite,
    * PSI = Σ_b (p_cur − p_ref) · ln(p_cur/p_ref). The usual reading:
    * <0.1 stable, 0.1–0.25 drifting, >0.25 re-fit.
    *
    * Shape: one posexplode + (dim, bucket)-keyed count per side with
    * map-side combine — each corpus is scanned ONCE and only
    * dims×buckets rows shuffle; everything after the counts is tiny-
    * relation math. Each PSI term rounds to 9 decimals and sums as
    * DECIMAL (the t11 discipline), so the result is partition-order-
    * independent and engine-exact; the full dim×bucket grid is generated
    * explicitly so zero-zero buckets contribute their (nonzero, smoothed)
    * term identically on every engine.
    */
  def dimensionPsi(ref: DataFrame, cur: DataFrame, vecCol: String,
                   nBuckets: Int = 8,
                   persistIntermediates: Boolean = true): DataFrame = {
    require(nBuckets > 1, "psi needs at least 2 buckets")
    def bucketCounts(df: DataFrame, tag: String) = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .withColumn("__b", least(greatest(
        floor((col("__v").cast("double") + 1.0) * (nBuckets / 2.0)).cast("int"),
        lit(0)), lit(nBuckets - 1)))
      .groupBy("dim", "__b").agg(count(lit(1)).as(tag))
    val r = bucketCounts(ref, "__cr")
    val c = bucketCounts(cur, "__cc")
    // materialized: `joined` is ≤ dims×buckets rows but its upstream is
    // two corpus-wide posexplode aggregations, and it has two consumers
    // (the grid key list and the grid join) — without the checkpoint both
    // corpora were bucket-counted twice
    // valve = false: ≤ dims×buckets rows by construction, but the
    // full_outer join upstream makes Catalyst's size ESTIMATE a child
    // product — the valve would misread it (Materialize scaladoc)
    val joined = Materialize.pivot(r.join(c, Seq("dim", "__b"), "full_outer"),
      persistIntermediates, valve = false)
    val grid = joined.select("dim").distinct()
      .select(col("dim"), explode(sequence(lit(0), lit(nBuckets - 1))).as("__b"))
    val wDim = Window.partitionBy("dim")
    val full = grid.join(joined, Seq("dim", "__b"), "left")
      .select(col("dim"), col("__b"),
        coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))
      .withColumn("__nr", sum("__cr").over(wDim) + nBuckets)
      .withColumn("__nc", sum("__cc").over(wDim) + nBuckets)
    val pr = (col("__cr") + 1).cast("double") / col("__nr").cast("double")
    val pc = (col("__cc") + 1).cast("double") / col("__nc").cast("double")
    val ratio = ((col("__cc") + 1) * col("__nr")).cast("double") /
      ((col("__cr") + 1) * col("__nc")).cast("double")
    full
      .withColumn("__term", round((pc - pr) * log(ratio), 9).cast("decimal(18,9)"))
      .groupBy("dim")
      .agg(first(col("__nr") - nBuckets).as("n_ref"),
        first(col("__nc") - nBuckets).as("n_cur"),
        round(sum("__term").cast("double"), 6).as("psi"))
      .select(col("dim"), col("n_ref").cast("long").as("n_ref"),
        col("n_cur").cast("long").as("n_cur"), col("psi"))
  }

  /** Symmetric int8 scalar quantization (the SQ8 memory tier between raw
    * floats and PQ codes: 4× smaller than float32 with ~exact recall for
    * reranking): per vector, scale = max|x|/127, code_i = round(x_i/scale)
    * clamped to [−127, 127], and the per-vector reconstruction MSE
    * measures what the compression cost.
    *
    * Purely per-row column math — narrow plan, whole-stage codegen, no
    * shuffle, no UDF. Every operation (max, divide, round-half-away,
    * multiply, sequential-fold sum) is IEEE-deterministic and mirrored
    * exactly by the SQL oracle; zero vectors quantize to all-zero codes
    * with scale 0 and mse 0 rather than dividing by zero.
    *
    * Output: (id, scale, code_sum, code_min, code_max, mse). `code_sum`
    * is the exact integer checksum of the code vector — any engine
    * disagreement on a single rounding surfaces there, without shipping
    * 64 codes per row through the comparison.
    */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col("__v")
    val codes =
      expr("""transform(__v, x -> CAST(greatest(-127.0, least(127.0,
             |  round(x / __scale, 0))) AS BIGINT))""".stripMargin)
    val recon = expr("zip_with(__v, __codes, (x, c) -> x - CAST(c AS DOUBLE) * __scale)")
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__maxabs", coalesce(array_max(transform(v, x => abs(x))), lit(0.0)))
      .withColumn("__scale", col("__maxabs") / 127.0)
      .withColumn("__codes",
        when(col("__maxabs") === 0.0, transform(v, _ => lit(0L))).otherwise(codes))
      .withColumn("__err", recon)
      .select(col(idCol),
        round(col("__scale"), 9).as("scale"),
        aggregate(col("__codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
        array_min(col("__codes")).as("code_min"),
        array_max(col("__codes")).as("code_max"),
        round(
          aggregate(col("__err"), lit(0.0), (acc, e) => acc + e * e)
            / size(v).cast("double"), 9).as("mse"))
  }

  /** IVF index-health telemetry: per posting list, the member count and
    * the cosine-to-centroid distribution (min/max/avg) — the numbers that
    * tell an operator whether the coarse quantizer is BALANCED (skewed
    * cells make nProbe recall erratic and one cell quadratic-hot for
    * SemDeDup) and TIGHT (low within-cell similarity means the centroids
    * no longer fit the data and need re-training via [[kmeansStep]]).
    *
    * Scale shape: the [[assignToCentroids]] topology — one-row broadcast
    * centroid array, per-row native argmax — run TWICE in one projection
    * (id + winning sim: twice the k·dim FLOPs inside codegen), then a
    * combine-friendly aggregation on centroid_id. This stage kept a
    * private copy of the old row_number-window assignment long after
    * assignToCentroids lost it (it needs the sim, not just the id), which
    * is why s16 stayed the sf1 headline dominator after the round-13
    * argmax fix collapsed s3/s4/s12: the window moved the full n·k
    * candidate relation through its exchange. Now nothing but ~n
    * pre-combined stat rows move. The avg carries as an exact DECIMAL sum
    * of 6-decimal-rounded cosines, so it is engine-reproducible (a raw
    * double sum would drift with partition order).
    */
  def postingListStats(df: DataFrame, centroids: DataFrame,
                       idCol: String, vecCol: String): DataFrame = {
    val idType = centroids.schema(idCol).dataType
    df.crossJoin(centroidRow(centroids, idCol, vecCol))
      .select(
        graft.functions.NearestCentroid(col(vecCol), col("__cents"))
          .cast(idType).as("centroid_id"),
        graft.functions.NearestCentroid.sim(col(vecCol), col("__cents")).as("__sim"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_vectors"),
        min(col("__sim")).as("min_sim"),
        max(col("__sim")).as("max_sim"),
        round(sum(col("__sim").cast("decimal(38,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("avg_sim"))
  }

  /** Label-retrieval MRR — the end-to-end eval an embedding pipeline signs
    * off on: rank the corpus by cosine per probe (excluding self) and find
    * the first SAME-LABEL neighbor; reciprocal rank near 1 means the
    * embedding space clusters its labels. [[annRecall]] grades an index
    * against exact top-k; this grades the SPACE against ground truth, so
    * together they separate "bad index" from "bad embeddings".
    *
    * Scale shape: [[bruteForceTopK]]'s broadcast-probe topology, with NO
    * ranking window — the windowed original moved the full
    * |probes|·|corpus| candidate relation through its exchange to rank
    * rows it would immediately aggregate away. Instead: the first
    * same-label neighbor is the same-label candidate with the MINIMUM
    * (−sim, id) key (a fixed-width min(struct) with map-side combine),
    * and its rank is 1 + |candidates strictly ahead of it| — a count
    * against the ≤|probes|-row broadcast of those best keys on a second
    * corpus pass. Two corpus SCANS, but the only rows that ever cross an
    * exchange are |probes| pre-combined aggregates.
    *
    * Output: (probe_id, probe_label, n_relevant, first_rank, rr) — probes
    * whose label has no other member report n_relevant = 0 with null
    * rank/rr (counted, not dropped).
    */
  def labelMrr(corpus: DataFrame, probes: DataFrame,
               idCol: String, vecCol: String, labelCol: String): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("__pvec"), col(labelCol).as("probe_label")))
    def scored = corpus
      .join(p, col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col("probe_label"), col(labelCol).as("__nlabel"),
        struct((-round(cosine(col("__pvec"), col(vecCol)), 6)).as("s"),
          col(idCol).as("i")).as("__key"))
    val best = scored
      .groupBy(col("probe_id"), col("probe_label"))
      .agg(
        sum(when(col("__nlabel") === col("probe_label"), 1L).otherwise(0L))
          .as("n_relevant"),
        min(when(col("__nlabel") === col("probe_label"), col("__key"))).as("__best"))
    val firstRank = scored
      .join(broadcast(best.select(col("probe_id"), col("__best"))), Seq("probe_id"))
      .filter(col("__key") <= col("__best"))
      .groupBy("probe_id")
      .agg(count(lit(1)).cast("int").as("first_rank"))
    best.join(firstRank, Seq("probe_id"), "left")
      .select(col("probe_id"), col("probe_label"), col("n_relevant"), col("first_rank"))
      .withColumn("rr", round(lit(1.0) / col("first_rank").cast("double"), 6))
  }

  /** Dominant direction of the (uncentered) embedding Gram matrix via two
    * deterministic power-iteration steps (s18) — the anisotropy
    * diagnostic an embedding-quality gate runs: when one direction
    * carries most of the mass ("all embeddings share a common
    * component", Ethayarajh 2019), cosine similarity degrades and a
    * whitening step is warranted. λ = ‖A·v₁‖ against the trace (=Σ‖x‖²)
    * gives the dominant-direction mass fraction.
    *
    * Deterministic by construction: the seed is e₀ (no RNG), so step 1's
    * w = A·e₀ is just the Σ x·x₀ column — ONE posexplode +
    * (dim)-keyed exact-DECIMAL aggregation with map-side combine
    * (components round at 4, the s11 ingestion discipline). v₁ =
    * w/‖w‖ rounds to 9 decimals and re-enters as DECIMAL(18,9), so step
    * 2's per-row dot t_r = x̂·v₁ and the final u = Σ t_r·x̂ are again
    * exact integer-scaled sums — partition order cannot move any digit,
    * and the oracle repeats the identical arithmetic.
    *
    * Shape at scale: two corpus passes (w and u), each shuffling only
    * 〈#dims〉 rows; v₁ pivots into a ONE-ROW broadcast map so step 2's
    * per-row dot is array math on the scan — no row-keyed shuffle ever
    * touches the corpus; trace rides pass 1. Nothing is collected to the
    * driver.
    *
    * Output, one row per dim: `v1` (the normalized first iterate), `v2`
    * (the normalized second — their agreement measures convergence),
    * `lambda` (= ‖A·v₁‖) and `mass_frac` (= λ/trace), both repeated on
    * every row for relational convenience.
    */
  def powerIterationTop(df: DataFrame, vecCol: String,
                        persistIntermediates: Boolean = true): DataFrame = {
    val e4 = round(col("__c").cast("double"), 4).cast("decimal(18,4)")
    val x0 = round(element_at(col(vecCol), 1).cast("double"), 4).cast("decimal(18,4)")
    val ex = df.select(x0.as("__x0"), posexplode(col(vecCol)).as(Seq("dim", "__c")))
      .select(col("dim"), e4.as("__e"), col("__x0"))
    // pass 1: w = A·e0 (exact) + the trace on the same scan. Materialized
    // (#dims rows): w has two consumers (the norm/trace fold and v1) and
    // u below likewise two (its norm and the final join) — without the
    // checkpoints each consumer re-ran its full corpus pass.
    val w = Materialize.pivot(ex.groupBy("dim").agg(
      sum((col("__e") * col("__x0")).cast("decimal(28,8)")).as("__w"),
      sum((col("__e") * col("__e")).cast("decimal(28,8)")).as("__tr_d")),
      persistIntermediates, valve = false) // #dims rows by construction
    // narrow the summed (38,8) back to (19,8) before squaring: a
    // (38,8)×(38,8) product exceeds DECIMAL precision and Spark would
    // silently drop scale; |w_d| ≤ n·max|x̂|² keeps (19,8) exact
    val w19 = col("__w").cast("decimal(19,8)")
    val scal = w.agg(
      sum((w19 * w19).cast("decimal(38,16)")).as("__wn2"),
      sum(col("__tr_d")).as("__trace"))
    // zero-norm guard: a corpus orthogonal to the seed (every x₀ = 0)
    // yields w = 0; emit a zero iterate instead of 0/0 NaN
    val v1 = w.crossJoin(broadcast(scal))
      .select(col("dim"),
        when(col("__wn2") > 0,
            round(col("__w").cast("double") / sqrt(col("__wn2").cast("double")), 9))
          .otherwise(lit(0.0))
          .cast("decimal(18,9)").as("__v1"),
        col("__trace"))
    // v1 pivots into a one-row (dim → v1) map: step 2 needs no row join
    val v1map = v1.agg(
      map_from_entries(collect_list(struct(col("dim"), col("__v1")))).as("__v1m"))
    // pass 2: t_r = x̂·v1 per row as an exact decimal array fold on the
    // scan, then u = Σ t_r·x̂ per dim (exact, map-side combined)
    // fold in DECIMAL(24,13): at full (38,13) Spark's add rule would cap
    // precision and silently drop to scale 12; the explicit merge cast
    // keeps every step exact at scale 13 (|t| is small, 11 integer
    // digits are ample)
    val withT = df.crossJoin(broadcast(v1map))
      .select(col(vecCol),
        aggregate(
          transform(col(vecCol), (c, i) =>
            (round(c.cast("double"), 4).cast("decimal(18,4)")
              * element_at(col("__v1m"), i)).cast("decimal(24,13)")),
          lit(0).cast("decimal(24,13)"),
          (acc, t) => (acc + t).cast("decimal(24,13)")).as("__traw"))
      // t re-enters the next exact stage through the same 9-decimal gate
      // as v1 (a (18,4)×(38,13) product would overflow DECIMAL precision
      // and silently lose scale)
      .select(col(vecCol),
        round(col("__traw").cast("double"), 9).cast("decimal(18,9)").as("__t"))
    val u = Materialize.pivot(withT
      .select(col("__t"), posexplode(col(vecCol)).as(Seq("dim", "__c")))
      .groupBy("dim")
      .agg(sum((e4 * col("__t")).cast("decimal(38,13)")).as("__u_raw"))
      .select(col("dim"),
        round(col("__u_raw").cast("double"), 9).cast("decimal(18,9)").as("__u")),
      persistIntermediates, valve = false) // #dims rows; crossJoin upstream
    val un = u.agg(sum((col("__u") * col("__u")).cast("decimal(38,18)")).as("__un2"))
    u.crossJoin(broadcast(un)).join(v1, "dim")
      .select(col("dim"),
        col("__v1").cast("double").as("v1"),
        when(col("__un2") > 0,
          round(col("__u").cast("double") / sqrt(col("__un2").cast("double")), 6)).as("v2"),
        round(sqrt(col("__un2").cast("double")), 6).as("lambda"),
        when(col("__trace") > 0,
          round(sqrt(col("__un2").cast("double")) / col("__trace").cast("double"), 6))
          .as("mass_frac"))
  }
}
