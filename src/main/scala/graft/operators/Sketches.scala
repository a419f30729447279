package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality / frequency sketches — the statistics layer a
  * 100 TB curation pipeline plans with before it runs anything expensive
  * (how many distinct shingles per slice → dedup bucket sizing; which
  * tokens are heavy → boilerplate/stopword candidates). Both sketches are
  * mergeable by construction, so Spark's partial aggregation IS the sketch
  * merge: mapper-side state is bounded by the register/cell count, never
  * by the data, and the shuffle carries at most `groups × m` rows no
  * matter how many trillions of values stream through.
  *
  * Hashing is md5-derived (like every fixture/oracle construction in this
  * repo) so the register contents are engine-independent integers: the
  * DuckDB oracle rebuilds the identical sketch in SQL and the comparison
  * is exact — no tolerance, no seed smuggling.
  */
object Sketches {

  /** Rank of the first set bit (ρ) over a 48-bit window taken from hex
    * chars [from, from+12) of an md5 digest column: 1 + the number of
    * leading zero BITS, 49 when the whole window is zero. Pure string +
    * CASE math (leading-zero hex run via ltrim length arithmetic, a 4-way
    * lookup inside the first non-zero digit), identical in the SQL oracle.
    */
  private def rho48(h: Column, from: Int): Column = {
    val w    = substring(h, from, 12)
    // leading-zero run length via ltrim (codegen'd charAt loop) instead of
    // a regexp engine invocation per value — same count by construction:
    // ltrim(w, "0") strips exactly the leading '0' characters
    val zHex = lit(12) - length(ltrim(w, "0"))
    val d1   = w.substr(zHex + 1, lit(1))
    val inDigit = when(d1 === "1", 3)
      .when(d1.isin("2", "3"), 2)
      .when(d1.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(zHex === 12, lit(49)).otherwise(zHex * 4 + inDigit + 1)
  }

  /* HyperLogLog distinct-count estimate per group (Flajolet et al. 2007)
    * over `value`, with m registers (m a power of two ≤ 4096) — see
    * [[hllDistinct]] below; split into [[hllRegisters]] (mergeable
    * state) + [[hllEstimate]] (the read) so the streaming face can
    * persist and max-merge the state between them.
    *
    * Shape — the canonical two-level mergeable aggregation:
    *   1. per (group, register) max-ρ: map-side combine bounds every
    *      mapper at groups×m rows, duplicates collapse BEFORE the shuffle
    *      (max is idempotent, so no pre-distinct pass is ever needed);
    *   2. per group: fold the ≤ m register rows into the harmonic sum.
    * The harmonic sum is kept EXACT as the integer Σ 2^(49−ρ_j) (absent
    * registers contribute 2^49; max m·2^49 = 2^61 fits a long), so the
    * floating steps are the final αm²·2^49 / S division and — in the
    * sparse range only — the standard linear-counting correction
    * m·ln(m/V) when the raw estimate is ≤ 2.5m and V registers are
    * untouched (raw HLL saturates near α·m for small n; Flajolet §4).
    * Both expressions are repeated verbatim in the oracle, and the
    * branch condition compares identically-computed doubles.
    *
    * Columns: group…, `m`, `n_zero` (untouched registers), `harmonic`
    * (the exact integer sum), `hll_est` (rounded at 4 decimals).
    */
  /** The HLL register relation alone: (group…, __b, __r) with __r =
    * max ρ per register — the MERGEABLE state ([[hllDistinct]]'s stage
    * 1). Two corpora's register relations max-merge into the union's
    * sketch, and merging is idempotent, which is what the streaming face
    * builds on. At most groups×m rows regardless of input size.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column,
                   m: Int): DataFrame = {
    require(m > 0 && m <= 4096 && (m & (m - 1)) == 0, s"m must be a power of two <= 4096: $m")
    require(groupCols.nonEmpty, "hll needs >= 1 group column (group by a literal for a global count)")
    val h      = md5(value.cast("string"))
    val bucket = conv(substring(h, 1, 3), 16, 10).cast("long") % m
    df.select(groupCols.map(col) :+ bucket.as("__b") :+ rho48(h, 4).as("__rho"): _*)
      .groupBy(groupCols.head, groupCols.tail :+ "__b": _*)
      .agg(max(col("__rho")).as("__r"))
  }

  /** [[hllDistinct]]'s estimate tail over a register relation (from
    * [[hllRegisters]], possibly merged across batches/corpora).
    */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    val g = groupCols.map(col)
    regs
      .groupBy(groupCols.head, groupCols.tail: _*)
      .agg(count(lit(1)).as("__present"),
        sum(expr("shiftleft(1L, 49 - __r)")).as("__s"))
      .select(g ++ Seq(
        lit(m.toLong).as("m"),
        (lit(m.toLong) - col("__present")).as("n_zero"),
        (col("__s") + (lit(m.toLong) - col("__present")) * lit(1L << 49)).as("harmonic")): _*)
      .withColumn("__raw",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
          * lit(m.toDouble) * lit(m.toDouble) * lit((1L << 49).toDouble)
          / col("harmonic").cast("double"))
      .withColumn("hll_est",
        when(col("n_zero") > 0L && col("__raw") <= lit(2.5 * m),
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero").cast("double")), 4))
          .otherwise(round(col("__raw"), 4)))
      .drop("__raw")
  }

  /** [[hllRegisters]] ∘ [[hllEstimate]]: the one-shot batch form. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  m: Int = 1024): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, value, m), groupCols, m)

  /** Sketch-algebra corpus overlap (a16): |A|, |B|, |A∪B| from HLL
    * registers and |A∩B| by inclusion–exclusion — "how much content do
    * two crawls share" WITHOUT ever joining them (t20 computes the exact
    * overlap with a join; this is its sketch twin, the form that still
    * works when A and B are 100 TB each). The union sketch is just the
    * max-merge of the two register relations — the same algebra the
    * streaming face relies on — so all three cardinalities come from
    * two corpus scans and three ≤ groups×m-row estimate folds.
    *
    * Inclusion–exclusion inherits both sketches' error, so the
    * intersection estimate is clamped at 0 and `jaccard_est` is the
    * derived similarity — standard sketch-overlap telemetry, not an
    * exact count (the exact path is t20).
    *
    * Columns: group…, `est_a`, `est_b`, `est_union`, `est_intersect`,
    * `jaccard_est`. Groups present in only one side report the other at
    * 0.
    */
  def hllOverlap(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                 value: Column, m: Int = 1024,
                 persistIntermediates: Boolean = true): DataFrame = {
    // Each register relation has TWO consumers (its own estimate + the
    // max-merge union), and Catalyst expands shared subtrees, so without
    // materialization each corpus was scanned-and-hashed TWICE. The
    // registers are ≤ groups×m rows — an eager localCheckpoint costs one
    // trivial job and halves the corpus passes from four to two (blocks
    // are ContextCleaner-reclaimed; the Dedup.minHashLshNearDups
    // discipline applied to a tiny relation).
    val ra = Materialize.pivot(hllRegisters(a, groupCols, value, m), persistIntermediates)
    val rb = Materialize.pivot(hllRegisters(b, groupCols, value, m), persistIntermediates)
    val merged = ra.unionByName(rb)
      .groupBy(groupCols.head, groupCols.tail :+ "__b": _*)
      .agg(max(col("__r")).as("__r"))
    def est(regs: DataFrame, name: String) =
      hllEstimate(regs, groupCols, m)
        .select(groupCols.map(col) :+ col("hll_est").as(name): _*)
    est(merged, "est_union")
      .join(est(ra, "est_a"), groupCols, "left")
      .join(est(rb, "est_b"), groupCols, "left")
      .select(groupCols.map(col) ++ Seq(
        coalesce(col("est_a"), lit(0.0)).as("est_a"),
        coalesce(col("est_b"), lit(0.0)).as("est_b"),
        col("est_union")): _*)
      .withColumn("est_intersect",
        round(greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")), 4))
      .withColumn("jaccard_est",
        when(col("est_union") > 0.0,
          round(col("est_intersect") / col("est_union"), 6)))
  }

  /** Count-Min sketch frequency estimates (Cormode & Muthukrishnan 2005)
    * for a fixed probe set, plus the φ-heavy-hitter verdict.
    *
    * Shape: the corpus pays ONE value-keyed count rollup (map-side
    * combine; the shuffle carries the distinct-value relation, not the
    * stream). The d×w cell build then runs on that bounded relation —
    * each distinct value expands to exactly d (row, cell) increments —
    * and the sketch itself is ≤ d·w rows, so the probe lookup joins
    * against a relation the planner always broadcasts. `est = min_j
    * CMS[j][h_j(x)]` is never below the true count (one-sided error);
    * the true count and overcount ride along to show it.
    *
    * The heavy verdict is integer-exact: est·denom ≥ N·num for
    * φ = num/denom (default 1/100), no floating threshold.
    *
    * Columns: `token`, `cms_est`, `true_count`, `overcount`, `total_n`,
    * `heavy`.
    */
  def cmsHeavyHitters(df: DataFrame, value: Column, probes: Seq[String],
                      d: Int = 4, w: Int = 1024,
                      phiNum: Long = 1L, phiDenom: Long = 100L,
                      persistIntermediates: Boolean = true): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 8, s"bad CMS geometry d=$d w=$w")
    val spark = df.sparkSession
    import spark.implicits._
    def cell(row: Column, v: Column): Column =
      conv(substring(md5(concat(row.cast("string"), lit(":"), v)), 1, 5), 16, 10)
        .cast("long") % w

    // materialized: the vocab rollup has THREE consumers (totals, the
    // cell build, the probe truth lookup) — without the checkpoint each
    // re-ran the corpus tokenize+count pass; the relation itself is the
    // distinct-value vocabulary, orders of magnitude under the stream
    val counts = Materialize.pivot(
      df.select(value.cast("string").as("__v"))
        .groupBy("__v").agg(count(lit(1)).as("__c")),
      persistIntermediates)
    val totals = counts.agg(sum(col("__c")).as("__n"))
    val sketch = counts
      .select(explode(array((0 until d).map(j => lit(j.toLong)): _*)).as("__j"),
        col("__v"), col("__c"))
      .select(col("__j"), cell(col("__j"), col("__v")).as("__cell"), col("__c"))
      .groupBy("__j", "__cell").agg(sum(col("__c")).as("__cnt"))

    val probeDf = probes.toDF("token")
    val probeCells = probeDf
      .select(col("token"),
        explode(array((0 until d).map(j => lit(j.toLong)): _*)).as("__j"))
      .select(col("token"), col("__j"), cell(col("__j"), col("token")).as("__cell"))
    // true counts for the probes only: the probe set broadcasts into the
    // distributed vocab relation (never the reverse — the vocab is
    // corpus-sized at scale, the probe list is a constant)
    val trueCounts = counts
      .join(broadcast(probeDf), col("__v") === col("token")).select("token", "__c")
    probeCells
      .join(broadcast(sketch), Seq("__j", "__cell"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("__cnt"), lit(0L))).as("cms_est"))
      .join(broadcast(trueCounts), Seq("token"), "left")
      .withColumn("true_count", coalesce(col("__c"), lit(0L)))
      .crossJoin(broadcast(totals))
      .select(col("token"), col("cms_est"), col("true_count"),
        (col("cms_est") - col("true_count")).as("overcount"),
        col("__n").as("total_n"),
        (col("cms_est") * phiDenom >= col("__n") * phiNum).cast("int").as("heavy"))
  }

  /** Mergeable bottom-k quantile sketch — per-group value quantiles from
    * a DETERMINISTIC uniform row sample: each row keys by md5 of its
    * unique id (a fixed uniform permutation, reproducible in any engine),
    * and the group keeps its k hash-smallest rows via Spark's bounded
    * top-k aggregate. Per-mapper state is ≤ k rows PER GROUP no matter
    * the corpus size, partials merge associatively (min-k is a
    * semilattice — the same algebra as the HLL registers), and the
    * shuffle carries at most groups×k sample rows: quantile telemetry
    * (length/quality distribution drift, the release-report numbers) at
    * 100 TB for the cost of one narrow combine-friendly aggregation. An
    * exact formulation (t10's sort/percentile path) shuffles the corpus.
    *
    * Estimates are the LOWER order statistics of the value-sorted sample
    * at index ⌊(n−1)·p/100⌋ — integer-exact, no interpolation — so the
    * SQL oracle (same md5 sample, same index arithmetic) hash-matches
    * bit-for-bit. Groups smaller than k sample everything: exact.
    */
  def bottomKQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       idCol: String, k: Int,
                       percents: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(k > 0 && percents.forall(p => p >= 0 && p <= 100))
    val item = struct(
      md5(col(idCol).cast("string")).as("h"),
      col(valueCol).cast("long").as("v"))
    val vals = array_sort(transform(col("__samp"), s => s.getField("v")))
    val n    = size(col("__vals"))
    def q(p: Int) =
      element_at(col("__vals"),
        (floor(((n - 1) * lit(p)).cast("double") / 100.0) + 1).cast("int")).as(s"p$p")
    df.groupBy(col(groupCol))
      .agg(
        org.apache.spark.sql.GraftSqlBridge.collectTopK(item, k, reverse = true)
          .as("__samp"),
        count(lit(1)).as("n_rows"))
      .withColumn("__vals", vals)
      .select(Seq(col(groupCol), col("n_rows"), n.as("n_sample")) ++ percents.map(q): _*)
  }
}
