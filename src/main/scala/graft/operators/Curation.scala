package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between dedup
  * and packing: repetition screens, deterministic sampling, and sequence
  * packing. All hashing is the md5-based portable family (Dedup), so every
  * operator is oracle-checkable in ANSI SQL, and every sample is
  * REPRODUCIBLE — re-running the pipeline on the same corpus selects the
  * same rows, with no RNG state to ship between executors.
  */
object Curation {

  /** Repetition signals (the Gopher-style quality screens): distinct-token
    * ratio, top-unigram fraction, top-bigram fraction. Heavily repetitive
    * docs (boilerplate, keyword stuffing, decoding loops) score high
    * top-fractions and low distinct ratios.
    *
    * Shape: explode → two-level aggregation, both with map-side partial
    * combine on (doc, term) then (doc) — at 100 TB the reducers see one
    * row per distinct term per doc, never the raw token stream. The
    * bigram branch reuses the bound token array (never re-tokenizes).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
    val uni = toked.select(col(idCol), explode(col("__t")).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max("__c").as("__topc"), sum("__c").as("__n"), count(lit(1)).as("__nd"))
    val bi = toked
      .select(col(idCol), explode(TextOps.shinglesOfTokens(col("__t"), 2)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max("__c").as("__topb"), sum("__c").as("__nb"))
    // left join: a one-token doc has no bigrams → fractions default to 0
    uni.join(bi, Seq(idCol), "left")
      .select(col(idCol), col("__n").as("n_tokens"),
        (col("__nd").cast("double") / col("__n")).as("distinct_ratio"),
        (col("__topc").cast("double") / col("__n")).as("top_unigram_frac"),
        coalesce(col("__topb").cast("double") / col("__nb"), lit(0.0)).as("top_bigram_frac"))
  }

  /** Sequence packing: concatenate documents in `idCol` order and cut the
    * stream into fixed token-budget bins — bin = ⌊exclusive-prefix-sum /
    * budget⌋, the streaming packing an LLM pre-training loader applies.
    *
    * A global ordered prefix sum is the textbook "one window, one
    * partition" trap — `Window.orderBy` with no partition key funnels the
    * corpus through a single task. This is the distributed two-level scan
    * instead: per-row cumsum WITHIN coarse id ranges (a partitioned
    * window), plus each range's exclusive offset computed on the
    * tiny per-range totals relation and broadcast back. Only
    * #ranges rows ever pass through an unpartitioned window.
    */
  def sequencePacking(df: DataFrame, idCol: String, nTokens: Column,
                      budget: Long, rangeWidth: Long = 1000L): DataFrame = {
    require(budget > 0 && rangeWidth > 0, "budget and rangeWidth must be positive")
    val base = df.select(col(idCol), nTokens.cast("long").as("n_tokens"))
      .withColumn("__r", floor(col(idCol) / rangeWidth).cast("long"))
    val offsets = base.groupBy("__r").agg(sum("n_tokens").as("__rt"))
      .withColumn("__off", coalesce(
        sum("__rt").over(Window.orderBy("__r")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__rt")
    val w = Window.partitionBy("__r").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq("__r"))
      .withColumn("__prefix", coalesce(sum("n_tokens").over(w), lit(0L)) + col("__off"))
      .select(col(idCol), col("n_tokens"),
        expr(s"CAST(__prefix DIV $budget AS BIGINT)").as("bin"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any n-gram
    * with an evaluation set (the GPT-3-style 13-gram collision test, the
    * screen every training corpus runs before release). Grams travel as
    * portable 32-bit hashes, not strings — the eval side collapses to a
    * DISTINCT hash set that broadcasts (benchmarks are tiny next to a
    * 100 TB corpus), so the check is a broadcast LEFT SEMI join against
    * the corpus gram stream: no shuffle of corpus data at all. A hash
    * collision can only over-flag (safe direction for decontamination)
    * and is deterministic + mirrored by the SQL oracle.
    */
  def contaminatedIds(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
                      textCol: String, gramSize: Int = 13): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame = df
      .select(cols :+ TextOps.tokens(col(textCol)).as("__t"): _*)
      .select(cols :+ explode(TextOps.shingleHashArray(col("__t"), gramSize)).as("__g"): _*)
    val evalGrams = grams(evalDocs).select(col("__g")).distinct()
    grams(corpus, col(idCol))
      .join(broadcast(evalGrams), "__g", "left_semi")
      .select(idCol).distinct()
  }

  /** Characteristic terms per document: top-k by term frequency, ties to
    * the globally RARER term (lower document frequency), then lexicographic
    * — tf-idf's ranking with integer-only arithmetic, so the result is
    * bit-identical across engines (no log/float tie ambiguity).
    *
    * The document-frequency relation is the tf relation re-aggregated
    * (tf's (doc, term) rows are already distinct), so the token stream is
    * scanned once; df joins back on the term key.
    *
    * Ranking deliberately stays a `row_number` window, NOT the bounded
    * [[TopK.perGroup]] aggregate: the partition key is the DOCUMENT, so a
    * window partition is bounded by one doc's distinct-term count and the
    * exchange is linear in the tf relation — this is not the
    * |probes|·|corpus| pathological class the similarity tier had. The
    * aggregate form was tried and MEASURED slower at BOTH scales
    * (sf0.1: 0.72→1.5 s; sf1, same harness back-to-back: 3.85→8.93 s,
    * 2.3×): per-doc priority-queue state plus TypedImperativeAggregate
    * buffer serialization costs more CPU than the ~30× exchange-volume
    * cut saves when groups are small and group count is huge.
    */
  def characteristicTerms(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 3,
                          persistIntermediates: Boolean = true): DataFrame = {
    // materialized: tf feeds BOTH the document-frequency rollup and the
    // ranking join — without the checkpoint each consumer re-ran the
    // tokenize+explode corpus pass (the bigramLogProb discipline).
    // persistIntermediates=false keeps lazy fault-tolerant lineage; the
    // size valve inside pivot() skips materialization past the byte
    // threshold either way (Materialize scaladoc).
    val tf = Materialize.pivot(
      df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")),
      persistIntermediates)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"))
  }

  /** Corpus mixture sampling — the pretraining data-mixing primitive:
    * draw a fixed TOKEN budget from every stratum (source/language),
    * admitting documents in portable-hash order until the stratum's
    * budget is exhausted (the straddling doc counts fully — the standard
    * overshoot-by-one-doc rule). Deterministic: re-running draws the
    * same mixture; changing the budget only extends/truncates the draw,
    * it never reshuffles what was already admitted.
    *
    * Same distributed two-level prefix sum as sequencePacking: per-row
    * cumsum inside (stratum, hash-range) window partitions, plus a
    * broadcast of the tiny (stratum × nRanges) exclusive offsets — no
    * stratum ever funnels through a single partition.
    */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
                    nTokens: Column, tokenBudget: Long, nRanges: Int = 64): DataFrame = {
    require(tokenBudget > 0 && nRanges > 0, "tokenBudget and nRanges must be positive")
    val rangeWidth = Dedup.MersennePrime / nRanges + 1
    val base = df.select(col(idCol), col(strataCol), nTokens.cast("long").as("n_tokens"))
      .withColumn("__h", pmod(Dedup.portableHashLo(col(idCol).cast("string")),
        lit(Dedup.MersennePrime)))
      .withColumn("__r", floor(col("__h") / rangeWidth).cast("int"))
    val offsets = base.groupBy(col(strataCol), col("__r")).agg(sum("n_tokens").as("__rt"))
      .withColumn("__off", coalesce(
        sum("__rt").over(Window.partitionBy(strataCol).orderBy("__r")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__rt")
    val w = Window.partitionBy(col(strataCol), col("__r")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq(strataCol, "__r"))
      .withColumn("__start", coalesce(sum("n_tokens").over(w), lit(0L)) + col("__off"))
      .filter(col("__start") < tokenBudget)
      .select(col(idCol), col(strataCol), col("n_tokens"))
  }

  /** Exact per-group quantiles by rank selection: the value at row
    * ceil(p·n) of the group's sort order (percentile_disc semantics,
    * integer-only — no interpolation, so engines agree bit-for-bit).
    * Exact quantiles need the group ordered; at 100 TB prefer a sketch
    * (t-digest/KLL) unless exactness is the point — this is the
    * exactness tier, one shuffle + per-group sort.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     tieBreak: String, ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(tieBreak))
    val ranked = df
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = ps.map { p =>
      max(when(col("__rk") === ceil(col("__cnt") * p), col(valueCol)))
        .as(s"p${(p * 100).toInt}")
    }
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  private def keyHash(idCol: Column): Column =
    pmod(Dedup.portableHashLo(idCol.cast("string")), lit(1000))

  /** Deterministic stratified sampling: keep a row iff the portable hash of
    * its id lands under its stratum's permille rate. No RNG, no seed
    * plumbing — the sample is a pure filter (predicate-pushdown friendly,
    * embarrassingly parallel) and stable across runs, which training-data
    * reproducibility requires. Rates are exact in expectation per stratum;
    * the hash is uniform over [0, 1000).
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       permille: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = permille.foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(keyHash(col(idCol)) < rate)
  }

  /** Deterministic shard-and-shuffle — the step every pretraining pipeline
    * ENDS with: assign each document a pseudo-random position in one of
    * `nShards` output shards, so the training loader reads a well-mixed
    * stream without any coordination. Order comes from the portable md5
    * hash of (id, seed): reshuffling is a seed change, reproducing a run
    * is the same seed, and no RNG state ever lives on an executor. shard =
    * hash mod nShards; position = dense 0-based rank of the hash within
    * the shard (id as tiebreak).
    *
    * Scale shape: the shard assignment is a pure per-row expression, and
    * the in-shard position is ONE window over the shard key — exactly the
    * repartition-then-sort a shard writer performs, so materializing the
    * shards is `.repartition(col("shard")).sortWithinPartitions("pos")`
    * with zero extra shuffles. No global sort, no single-partition stage;
    * shard sizes are n/nShards ± binomial noise.
    */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int,
                   seed: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = pmod(Dedup.portableHashLo(concat(col(idCol).cast("string"), lit(seed))),
      lit(Dedup.MersennePrime))
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    df.select(col(idCol), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-domain
    * rebalancing rule (exponent α < 1 upsamples rare strata, α = 1 is
    * proportional): weight_s = n_s^α / Σ_t n_t^α, and a global token
    * budget divides as ⌊weight_s · budget⌋.
    *
    * Determinism across engines: the per-stratum pow lands in a
    * round-6 DECIMAL before the cross-stratum sum (decimal addition is
    * exact and associative — a raw double sum would depend on partition
    * order), and the budget multiply runs in DECIMAL so the floor can't
    * straddle a double ulp. The strata relation is tiny (one row per
    * source/language), so the totals cross-join broadcasts.
    *
    * Budget conservation is enforced, not assumed: the display weights are
    * rounded independently, so Σ⌊weight·budget⌋ can exceed the budget by a
    * few tokens when many strata all round up. The excess is given back by
    * LARGEST REMAINDER: every stratum returns ⌊excess/n⌋ tokens, and the
    * last `excess mod n` come from the strata whose floored allocation
    * kept the SMALLEST fractional remainder — they sit closest to their
    * exact entitlement, so the dock is spread by proximity instead of
    * always falling on the lexicographically-last stratum (the bias a
    * stratum-ordered cumulative clamp has). Ties break by stratum name;
    * the common case (Σ raw ≤ budget) stays byte-identical to no clamp,
    * and when the excess path fires Σ alloc == budget exactly (barring a
    * stratum clamped at 0, which only under-allocates — the safe
    * direction). The remainder is compared as an exact DECIMAL, so both
    * engines rank identically. The single-partition windows are safe
    * here: they run on the post-aggregation strata relation (one row per
    * source), never on document rows.
    */
  def temperatureMixture(df: DataFrame, strataCol: String, nTokens: Column,
                         alpha: Double, tokenBudget: Long): DataFrame = {
    require(alpha > 0 && tokenBudget > 0, "alpha and tokenBudget must be positive")
    val perStratum = df.groupBy(strataCol).agg(sum(nTokens.cast("long")).as("n_tokens"))
      .withColumn("__p",
        round(pow(col("n_tokens").cast("double"), lit(alpha)), 6).cast("decimal(28,6)"))
    val total = perStratum.agg(sum("__p").as("__tot"))
    val sized = perStratum.crossJoin(broadcast(total))
      .withColumn("weight",
        round(col("__p").cast("double") / col("__tot").cast("double"), 6))
      .withColumn("__rawd", col("weight").cast("decimal(12,6)") * lit(tokenBudget))
      .withColumn("__raw", floor(col("__rawd")).cast("long"))
      .withColumn("__frac", col("__rawd") - col("__raw"))
    val excess = sized.agg(
      greatest(lit(0L), sum("__raw") - lit(tokenBudget)).as("__x"),
      count(lit(1)).as("__n"))
    val rk = Window.orderBy(col("__frac").asc, col(strataCol).asc)
    sized.crossJoin(broadcast(excess))
      .withColumn("__rk", row_number().over(rk).cast("long"))
      .withColumn("alloc_tokens",
        greatest(lit(0L), col("__raw") - expr("__x DIV __n") -
          when(col("__rk") <= expr("__x % __n"), lit(1L)).otherwise(lit(0L))))
      .select(col(strataCol), col("n_tokens"), col("weight"), col("alloc_tokens"))
  }

  /** Homoglyph fold table for [[robustCanonicalize]]: the Cyrillic/Greek
    * letters visually identical to Latin in most fonts — the characters
    * adversarial SEO/spam text swaps in to defeat exact dedup. Char-for-
    * char (all BMP), applied via translate().
    */
  val HomoglyphFrom =
    "аеорсхуіјѕ" + // а е о р с х у і ј ѕ
      "АЕОРСХ" +                       // А Е О Р С Х
      "οα"                                                 // ο α
  val HomoglyphTo = "aeopcxyijs" + "AEOPCX" + "oa"

  /** Obfuscation-resistant canonicalization (t31) — the dedup-prep pass
    * that defeats the three cheap evasions exact/fuzzy dedup meets in
    * adversarial web text (where [[nfcNormalizeStats]] handles Unicode
    * COMPOSITION): zero-width/bidi controls stripped (ZWSP..RLM, word
    * joiner, BOM), Cyrillic/Greek homoglyphs folded to Latin
    * ([[HomoglyphFrom]]), and runs of ≥3 repeated punctuation squeezed
    * to one. Two spam variants of one page canonicalize to the same
    * bytes — `canon_md5` is the key an exact-dedup stage then groups on.
    *
    * One per-row projection (translate + a fixed regexp chain, all
    * codegen); no join, no shuffle.
    */
  def robustCanonicalize(df: DataFrame, idCol: String, textCol: String,
                         extraCols: Seq[String] = Nil): DataFrame = {
    val zw = regexp_replace(col(textCol), "[\\u200B-\\u200F\\u2060\\uFEFF]", "")
    val folded = translate(zw, HomoglyphFrom, HomoglyphTo)
    val squeezed = Seq("!", "\\?", "\\.", ",", "-").foldLeft(folded) {
      (c, p) => regexp_replace(c, s"$p{3,}", p.replace("\\", ""))
    }
    // extraCols pass through the projection so a composed pipeline
    // (Release.releasePipeline) keeps its working columns without a
    // corpus-sized self-join back onto the input
    df.select(col(idCol) +: extraCols.map(col) :+ squeezed.as("canon") :+
        (squeezed =!= col(textCol)).cast("int").as("changed"): _*)
      .withColumn("canon_md5", md5(col("canon")))
      .withColumn("canon_len", length(col("canon")).cast("long"))
  }

  /** Deterministic obfuscation fixture for the t31 oracle: every doc
    * gains the SAME canonical suffix " copy!" but spelled differently per
    * md5 nibble — an optional zero-width space (nibble 1 < 8), Cyrillic
    * "сору" instead of Latin "copy" (nibble 2 < 8), "!!!!" instead of
    * "!" (nibble 3 < 4). Canonicalization must erase all three choices.
    */
  def plantObfuscation(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    def nib(i: Int): Column = conv(substring(h, i, 1), 16, 10).cast("int")
    val zw   = when(nib(1) < 8, lit("\u200B")).otherwise(lit(""))
    val word = when(nib(2) < 8, lit("сору")).otherwise(lit("copy"))
    val bang = when(nib(3) < 4, lit("!!!!")).otherwise(lit("!"))
    df.select(col(idCol), concat(col(textCol), lit(" "), zw, word, bang).as(textCol))
  }

  /** Data-constrained scaling planner (r10, Muennighoff et al. 2023,
    * arXiv:2305.16264): [[temperatureMixture]]'s allocation extended with
    * the paper's repeated-epoch value model — tokens re-read beyond the
    * first epoch decay in value with R* ≈ 15.4, D' = U·(1 + R*·(1 −
    * e^(−R/R*))) for R = epochs − 1 repeated passes over U unique
    * tokens. The planner answers the recipe question directly: per
    * stratum, how many epochs does its allocation imply and how many
    * EFFECTIVE tokens does the budget actually buy (utilization < 1 on
    * over-epoched strata means the α/budget combination is wasting
    * compute on repeats — raise α or find more data).
    *
    * Determinism: allocation is r4's decimal-carried largest-remainder
    * math (exact longs); epochs is one double division of two exact
    * longs rounded at 6; the single transcendental (exp) re-enters
    * through a 9-decimal gate (the r9 ln discipline) so every digit the
    * oracle compares is reproducible. Shape: one tokenize+count rollup
    * per stratum, then tiny-relation math under one-row broadcasts —
    * the corpus is scanned once.
    */
  def dataBudgetPlan(df: DataFrame, strataCol: String, nTokens: Column,
                     alpha: Double, tokenBudget: Long,
                     rStar: Double = 15.39): DataFrame = {
    val alloc = temperatureMixture(df, strataCol, nTokens, alpha, tokenBudget)
    val ep6 = round(col("alloc_tokens").cast("double") / col("n_tokens").cast("double"), 6)
    alloc
      .withColumn("epochs", ep6)
      .withColumn("__r", greatest(lit(0.0), col("epochs") - lit(1.0)))
      .withColumn("__e9", round(exp(-col("__r") / lit(rStar)), 9))
      .withColumn("__u",
        least(col("alloc_tokens"), col("n_tokens")).cast("double"))
      .withColumn("effective_tokens",
        round(col("__u") * (lit(1.0) + lit(rStar) * (lit(1.0) - col("__e9"))), 4))
      .withColumn("utilization",
        when(col("alloc_tokens") > 0L,
          round(col("effective_tokens") / col("alloc_tokens").cast("double"), 6)))
      .select(col(strataCol), col("n_tokens"), col("weight"), col("alloc_tokens"),
        col("epochs"), col("effective_tokens"), col("utilization"))
  }

  /** Epoch-capped mixture allocation — the data-recipe planner on top of
    * [[temperatureMixture]]: α-scaled weights propose per-stratum token
    * draws, but no stratum may repeat beyond `maxEpochs` passes over its
    * own mass (the over-epoching guard every published pretraining recipe
    * applies to small high-weight sources). alloc = min(⌊w·B⌋, ⌊E·n⌋);
    * budget the caps forfeit is REPORTED per stratum (`unfilled` > 0 on
    * capped rows means the recipe needs more raw data or a lower α), not
    * silently reassigned — redistribution policy is a recipe decision,
    * not an engine default.
    *
    * Decimal-carried arithmetic end to end (the r4 discipline), so the
    * allocation is engine-reproducible.
    */
  def epochCappedMixture(df: DataFrame, strataCol: String, nTokens: Column,
                         alpha: Double, tokenBudget: Long,
                         maxEpochs: Double): DataFrame = {
    require(alpha > 0 && tokenBudget > 0 && maxEpochs > 0,
      "alpha, tokenBudget, maxEpochs must be positive")
    val perStratum = df.groupBy(strataCol).agg(sum(nTokens.cast("long")).as("n_tokens"))
      .withColumn("__p",
        round(pow(col("n_tokens").cast("double"), lit(alpha)), 6).cast("decimal(28,6)"))
    val total = perStratum.agg(sum("__p").as("__tot"))
    perStratum.crossJoin(broadcast(total))
      .withColumn("weight",
        round(col("__p").cast("double") / col("__tot").cast("double"), 6))
      .withColumn("__raw",
        floor(col("weight").cast("decimal(12,6)") * lit(tokenBudget)).cast("long"))
      .withColumn("cap_tokens",
        floor(col("n_tokens").cast("decimal(28,6)") *
          lit(BigDecimal(maxEpochs).setScale(6, BigDecimal.RoundingMode.HALF_UP))).cast("long"))
      .withColumn("alloc_tokens", least(col("__raw"), col("cap_tokens")))
      .withColumn("unfilled", col("__raw") - col("alloc_tokens"))
      .withColumn("epochs",
        round(col("alloc_tokens").cast("double") / col("n_tokens").cast("double"), 6))
      .select(col(strataCol), col("n_tokens"), col("weight"), col("cap_tokens"),
        col("alloc_tokens"), col("unfilled"), col("epochs"))
  }

  /** Canonical-URL deduplication — crawl frontiers hand the pipeline the
    * same page as `HTTP://Site.com/p/x?utm_source=feed#top` and
    * `https://site.com/p/x`: canonicalization (lowercase host, drop query
    * + fragment, strip the trailing slash) plus an exact group-by is the
    * first-line URL dedup every crawl pipeline runs BEFORE content
    * hashing. Host/path come from the codegen'd `parse_url`; grouping is
    * one combine-friendly aggregation on the canonical key; each doc maps
    * to its group representative (min id).
    *
    * Docs with NO extractable URL get canon_url "" and are NON-GROUPABLE:
    * each is its own singleton (n_docs=1, rep_id=id, is_canonical=1) —
    * "no URL" is absence of evidence, not sameness, and a caller keeping
    * is_canonical=1 rows must not drop every URL-less doc but one. (The
    * "" rows also never reach the group aggregation, so a mostly-URL-less
    * corpus cannot form a hot empty-key partition.)
    *
    * Output: (id, canon_url, n_docs, rep_id, is_canonical).
    */
  def canonicalUrlDedup(df: DataFrame, idCol: String, textCol: String,
                        persistIntermediates: Boolean = true): DataFrame = {
    // (?i): crawl data writes schemes in any case (HTTPS://…)
    val url  = regexp_extract(col(textCol), "(?i)https?://[^\\s]+", 0)
    val host = lower(parse_url(url, lit("HOST")))
    val path = regexp_replace(coalesce(parse_url(url, lit("PATH")), lit("")), "/$", "")
    val canon = when(host.isNull || host === "", lit(""))
      .otherwise(concat(lit("https://"), host, path))
    // materialized: the canon projection (regex extract + parse_url per
    // row) has THREE consumers (the group rollup, the join-back, the
    // singleton branch) — without the checkpoint it ran once per consumer
    val docs = Materialize.pivot(
      df.select(col(idCol), canon.as("canon_url")), persistIntermediates)
    val withUrl = docs.filter(col("canon_url") =!= "")
    val groups = withUrl.groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("rep_id"))
    val grouped = withUrl.join(groups, Seq("canon_url"))
      .select(col(idCol), col("canon_url"), col("n_docs"), col("rep_id"),
        when(col(idCol) === col("rep_id"), 1).otherwise(0).cast("int").as("is_canonical"))
    val singletons = docs.filter(col("canon_url") === "")
      .select(col(idCol), col("canon_url"), lit(1L).as("n_docs"),
        col(idCol).as("rep_id"), lit(1).cast("int").as("is_canonical"))
    grouped.unionByName(singletons)
  }

  /** Messy-URL fixture for the d17 oracle: each document's provenance URL
    * carries md5-selected noise a crawl frontier actually produces —
    * uppercase host, a `?utm_source` tracking query, a `#fragment`, a
    * trailing slash — around the same canonical core as [[plantUrls]].
    * The oracle rebuilds the CANONICAL form directly from the md5
    * arithmetic, so Spark's parse_url + canonicalization chain is graded
    * against ground truth.
    */
  def plantMessyUrls(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    def even(i: Int): Column =
      substring(h, i, 1).isin("0", "2", "4", "6", "8", "a", "c", "e")
    val tld  = when(even(2), lit("com")).otherwise(lit("org"))
    val site = concat(lit("site"), substring(h, 1, 1), lit("."), tld)
    val host = when(even(5), upper(site)).otherwise(site)
    df.withColumn(textCol,
      concat(col(textCol), lit(" see https://"), host,
        lit("/p/"), substring(h, 3, 6),
        when(even(8), lit("/")).otherwise(lit("")),
        when(even(6), lit("?utm_source=track")).otherwise(lit("")),
        when(even(7), lit("#sec")).otherwise(lit(""))))
  }

  /** Leakage-safe train/val/test assignment: every member of an exact-dup
    * group (same md5 of the full text) follows its group REPRESENTATIVE
    * (min id) into the same split, so a duplicated document can never sit
    * in train while its twin sits in eval — the contamination mode a naive
    * per-doc hash split creates. Near-dup closure composes upstream: run
    * after minHashLshNearDups-driven canonicalization and the same rule
    * covers fuzzy twins. The split itself is the portable permille hash of
    * the representative — deterministic, no RNG.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       trainPermille: Int, valPermille: Int): DataFrame = {
    require(trainPermille > 0 && valPermille >= 0
      && trainPermille + valPermille <= 1000, "permilles must partition [0,1000]")
    val rep = df.select(col(idCol), md5(col(textCol)).as("__fp"))
      .withColumn("rep", min(col(idCol)).over(Window.partitionBy("__fp")))
    val h = pmod(Dedup.portableHashLo(col("rep").cast("string")), lit(1000))
    rep.select(col(idCol), col("rep"),
      when(h < trainPermille, "train")
        .when(h < trainPermille + valPermille, "val")
        .otherwise("test").as("split"))
  }

  /** Per-document mean unigram log-probability under the corpus' own
    * unigram distribution — the cheap perplexity proxy quality screens
    * rank on (rare-token-soup and OCR noise score low; natural prose
    * scores near the corpus mode).
    *
    * Shape: one token scan → (doc, term, tf) with map-side combine; the
    * vocabulary relation (term, count) is that relation re-aggregated, so
    * the text is tokenized once; the vocab joins back on the term key.
    * Each term's ln(p) is rounded to 9 decimals and carried as DECIMAL,
    * so the per-doc SUM is exact and partition-order-independent. The sum
    * ships (with n_tokens), not the mean: sum/n routinely lands exactly
    * on a rounding half-way point (a 9-decimal total over a small n), and
    * engines disagree there by one ulp of the rounding scale — the
    * consumer divides in whatever precision domain it ranks in.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
                     persistIntermediates: Boolean = true): DataFrame = {
    // materialized: the tf relation feeds BOTH the vocabulary rollup and
    // the scoring join — without the checkpoint each consumer re-ran the
    // tokenize+explode corpus pass (the bigramLogProb discipline)
    val tf = Materialize.pivot(
      df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")),
      persistIntermediates)
    val vocab = tf.groupBy("term").agg(sum("tf").as("__cnt"))
    val total = vocab.agg(sum("__cnt").as("__total"))
    // operand precisions stay small (18,9)×(10,0) → decimal(29,9): a wider
    // product would pass Spark's 38-digit cap and silently REDUCE the
    // scale to 6, rounding every term before the sum
    val lnp = round(log(col("__cnt").cast("double") / col("__total").cast("double")), 9)
      .cast("decimal(18,9)")
    tf.join(vocab, "term").crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf").cast("decimal(10,0)") * lnp).cast("double").as("sum_logprob"))
  }

  /** Per-document add-one-smoothed bigram log-probability — the next
    * perplexity proxy up from [[unigramLogProb]]: P(w_i | w_{i-1}) =
    * (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V), summed in log space over
    * every bigram instance. Repetitive or word-salad text separates far
    * better under a bigram model than a unigram one (the unigram score
    * cannot see order at all).
    *
    * Shape: ONE tokenization feeds both the bigram tf relation and the
    * corpus unigram counts; the bigram-count and context-count relations
    * are re-aggregations joined back on their keys; the vocabulary size
    * is a broadcast scalar. Per-instance ln terms round to 9 decimals and
    * sum as DECIMAL — exact, partition-order-independent.
    *
    * Every corpus-wide shuffle is keyed on `xxhash64` of the gram, never
    * the gram STRING (the d15 discipline: 8-byte keys instead of arbitrary-
    * width text cut shuffle bytes by the mean gram length, and the output
    * needs no gram strings at all — only per-doc sums). A 64-bit collision
    * merges two grams' counts; absent at test scale (the oracle agrees),
    * negligible bias at corpus scale, same tradeoff as [[Dedup.dupSpanCoverage]].
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    persistIntermediates: Boolean = true): DataFrame = {
    // checkpointed: `toked` feeds BOTH the bigram and the unigram scans —
    // without it each consumer re-runs the tokenization over the corpus
    val toked = Materialize.pivot(
      df.select(col(idCol), TextOps.tokens(col(textCol)).as("__t")),
      persistIntermediates)
    // (bigram hash, context-word hash) pairs — hashed in the scan, before
    // any shuffle; ctxh rides along (it is a function of bgh) so the
    // context join needs no string split downstream
    val bg = toked
      .select(col(idCol), explode(transform(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        (w, i) => struct(
          xxhash64(w, element_at(col("__t"), i + 2)).as("bgh"),
          xxhash64(w).as("ctxh")))).as("__b"))
      .groupBy(col(idCol), col("__b.bgh").as("bgh"), col("__b.ctxh").as("ctxh"))
      .agg(count(lit(1)).as("tf"))
    // materialized: bg feeds BOTH the bigram-count rollup and the
    // scoring join — without this each consumer re-ran the bigram
    // explode+aggregate over the (checkpointed) token arrays
    val bgM = Materialize.pivot(bg, persistIntermediates)
    val c2 = bgM.groupBy("bgh").agg(sum("tf").as("__c2"))
    val uni = toked.select(explode(col("__t")).as("w"))
      .groupBy(xxhash64(col("w")).as("ctxh")).agg(count(lit(1)).as("__c1"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val lnp = round(log(
        (col("__c2").cast("double") + 1.0) /
          (col("__c1").cast("double") + col("__v").cast("double"))), 9)
      .cast("decimal(18,9)")
    val scored = bgM.join(c2, "bgh")
      .join(uni, "ctxh")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(sum("tf").as("__nb"),
        sum(col("tf").cast("decimal(10,0)") * lnp).cast("double").as("__lp"))
    // docs with < 2 tokens have no bigrams but must still get a row (the
    // unigramLogProb contract) — a quality join that silently drops short
    // docs lets them escape the filter unscored
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("__lp"), lit(0.0)).as("sum_logprob"))
  }

  /** Per-document lexical diversity: type-token ratio and unigram Shannon
    * entropy (nats) — the standard screens for degenerate/templated text
    * that length and stopword ratios miss (a 1000-token doc of one
    * repeated word has perfect length stats and zero entropy).
    *
    * Entropy is computed as ln(n) - (Σ tf·ln tf)/n: the Σ runs over one
    * row per DISTINCT (doc, term) with map-side combine, and each ln(tf)
    * term is rounded to 9 decimals and carried as DECIMAL so the
    * cross-partition sum is exact and order-independent (the
    * [[unigramLogProb]] discipline). Only the final ln/divide/subtract
    * happen in double, identically on any IEEE engine.
    */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val lnTf = round(log(col("tf").cast("double")), 9).cast("decimal(18,9)")
    tf.groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("tf").cast("decimal(10,0)") * lnTf).as("__tlnt"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6).as("ttr"),
        round(log(col("n_tokens").cast("double")) -
          col("__tlnt").cast("double") / col("n_tokens").cast("double"), 6).as("entropy"))
  }

  /** Corpus-level vocabulary statistics: vocabulary size, total tokens,
    * hapax count (terms seen once — the OOV-rate predictor), and the Zipf
    * log-log slope fitted by least squares over the full rank-frequency
    * curve. A healthy natural-language corpus sits near slope -1;
    * machine-generated or boilerplate-heavy corpora flatten or steepen it.
    *
    * The global frequency rank (cnt desc, term asc) never materializes
    * per term: the regression sums only depend on the SET of ranks each
    * frequency class occupies — a contiguous block [off+1, off+m] — not
    * on which term gets which rank. So the plan is: frequency spectrum
    * (one row per distinct cnt, ≤ ~sqrt(2T) rows for T tokens since
    * Σf·m_f = T) → class offsets by a two-level prefix sum (within-bucket
    * partitioned windows + a ≤512-row bucket-totals relation, the only
    * single-partition window) → each class's rank block splits into
    * `chunkSize` chunks that explode and fold their Σln(r), Σln²(r)
    * partials as codegen array aggregates. No per-term relation and no
    * per-class window — a billion hapax terms (which all share cnt=1 and
    * would be ONE hot window partition under a rank-by-term design) land
    * in ~30k independent chunk rows instead.
    *
    * Regression sums carry 9-decimal-rounded DECIMAL terms; decimal
    * addition is exact and commutative, so grouping ranks by chunk yields
    * bit-identical totals to the oracle's per-term sum.
    */
  def corpusZipfStats(df: DataFrame, textCol: String, chunkSize: Int = 32768): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val vocab = df.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    // spectrum: (cnt, m) — m terms share frequency cnt. Buckets are
    // eighth-octaves of cnt (monotone in cnt, so bucket order = cnt
    // order): ≤ 8·64 = 512 bucket rows ever cross the unpartitioned
    // window below
    val spectrum = vocab.groupBy("cnt").agg(count(lit(1)).as("__m"))
      .withColumn("__b", floor(log(2.0, col("cnt").cast("double")) * 8.0).cast("long"))
    val bucketTotals = spectrum.groupBy("__b").agg(sum("__m").as("__bt"))
      .withColumn("__boff", coalesce(
        sum("__bt").over(Window.orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__bt")
    val wIn = Window.partitionBy("__b").orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = spectrum.join(broadcast(bucketTotals), Seq("__b"))
      .withColumn("__off", coalesce(sum("__m").over(wIn), lit(0L)) + col("__boff"))
      .select(col("cnt"), col("__m"), col("__off"))
    // each class's rank block [off+1, off+m] in chunkSize-sized slices;
    // per-chunk partials fold over a generated rank array (codegen, no
    // shuffle), so work spreads evenly regardless of class skew
    val lnCnt  = log(col("cnt").cast("double"))
    val chunks = offsets
      .withColumn("__chunk", explode(expr(s"sequence(0L, (__m - 1) DIV $chunkSize)")))
      .withColumn("__start", col("__off") + col("__chunk") * chunkSize.toLong)
      .withColumn("__len",
        least(lit(chunkSize.toLong), col("__m") - col("__chunk") * chunkSize.toLong))
      .withColumn("__ranks", expr("sequence(__start + 1, __start + __len)"))
    // accumulator stays at (28,9): the add result (29,9) is under Spark's
    // 38-digit cap (a (38,9) acc would force the sum to scale 8, rounding
    // every 9th decimal away), and the cast back is exact below 10^19 —
    // chunk partials top out around 3·10^4 terms × 10^3 per term
    def fold(term: Column => Column): Column =
      aggregate(col("__ranks"), lit(0).cast("decimal(28,9)"),
        (acc, r) => (acc + term(r).cast("decimal(18,9)")).cast("decimal(28,9)"))
    val parts = chunks.select(col("cnt"), col("__len"),
      fold(r => round(log(r.cast("double")), 9)).as("__px"),
      fold(r => round(log(r.cast("double")) * log(r.cast("double")), 9)).as("__pxx"),
      fold(r => round(log(r.cast("double")) * lnCnt, 9)).as("__pxy"),
      (col("__len").cast("decimal(10,0)") * round(lnCnt, 9).cast("decimal(18,9)")).as("__py"))
    parts.agg(
        sum("__len").as("vocab_size"),
        sum(col("cnt") * col("__len")).as("total_tokens"),
        sum(when(col("cnt") === 1, col("__len")).otherwise(0L)).as("hapax_terms"),
        sum("__px").as("__sx"), sum("__py").as("__sy"),
        sum("__pxy").as("__sxy"), sum("__pxx").as("__sxx"))
      .select(col("vocab_size"), col("total_tokens"), col("hapax_terms"),
        round((col("vocab_size").cast("double") * col("__sxy").cast("double")
            - col("__sx").cast("double") * col("__sy").cast("double"))
          / (col("vocab_size").cast("double") * col("__sxx").cast("double")
            - col("__sx").cast("double") * col("__sx").cast("double")), 6)
          .as("zipf_slope"))
  }

  /** Deterministic k-per-group sample: rank rows inside each group by the
    * portable hash of their id (id as tiebreak) and keep the first k —
    * a reproducible uniform-without-replacement draw per group, one
    * shuffle on the group key. The per-group reservoir of the streaming
    * world, expressed as a window.
    */
  def perGroupSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                     k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(pmod(Dedup.portableHashLo(col(idCol).cast("string")),
        lit(Dedup.MersennePrime)), col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Cross-document boilerplate detection: an n-gram occurring in ≥
    * `minDocs` DISTINCT documents is boilerplate (headers, footers,
    * license blurbs, template text — the stuff whose per-doc quality
    * features look fine but which a model memorizes verbatim). Per doc:
    * total n-gram positions, positions covered by a boilerplate gram, and
    * the coverage ratio — the filter signal (drop or trim docs whose
    * ratio exceeds a threshold).
    *
    * Scale shape: two combine-friendly aggregations — per-(doc, gram)
    * dedup then a gram-keyed document-frequency count (never
    * countDistinct's per-group set), and a per-doc position count — plus
    * one left-semi join of positions against the boilerplate gram set
    * (column-pruned to the gram key; AQE broadcasts it when small). No
    * windows, no all-pairs; a billion-doc common gram is one map-side-
    * combined counter, not a hot partition. Grams hash to `xxhash64` 8-byte
    * keys IN THE SCAN (the d15 discipline) — the gram strings never
    * shuffle, and the output carries only per-doc counts; a 64-bit
    * collision merges two grams' doc frequencies (absent at test scale,
    * negligible at corpus scale — see [[Dedup.dupSpanCoverage]]).
    */
  def boilerplateNgrams(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minDocs: Int = 3,
                        persistIntermediates: Boolean = true): DataFrame = {
    require(n >= 1 && minDocs >= 2, "n ≥ 1; boilerplate needs ≥ 2 docs")
    // Per-doc gram-hash ARRAYS, materialized once (the minHashLshNearDups
    // persistIntermediates discipline): the exploded gram relation had
    // THREE consumers (doc-freq, per-doc totals, the flag count) and
    // Catalyst re-ran the tokenize+shingle+hash corpus pass for each.
    // With the array form the per-doc total is a free size() projection,
    // the doc-distinct relation is an in-row array_distinct (identical to
    // dropDuplicates(id, gh) — one row per doc either way), and the
    // corpus tokenizes exactly once.
    val ghs = Materialize.pivot(
      df.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
        .select(col(idCol),
          transform(TextOps.shinglesOfTokens(col("__t"), n), g => xxhash64(g)).as("__ghs")),
      persistIntermediates)
    val boiler = ghs.select(col(idCol), explode(array_distinct(col("__ghs"))).as("gh"))
      .groupBy("gh").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs).select("gh")
    val perDoc = ghs.select(col(idCol), size(col("__ghs")).cast("long").as("n_grams"))
    val flagged = ghs.select(col(idCol), explode(col("__ghs")).as("gh"))
      .join(boiler, Seq("gh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("boiler_grams"))
    perDoc
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("boiler_grams"), lit(0L)).as("boiler_grams"))
      .withColumn("boiler_ratio",
        when(col("n_grams") > 0,
          round(col("boiler_grams").cast("double") / col("n_grams").cast("double"), 6)))
  }

  /** PII redaction patterns — the categories every public-corpus release
    * scrubs (emails, IPv4 addresses, long international phone runs).
    * Deliberately a COMMON regex subset (no lookarounds, no backrefs):
    * the same pattern strings run under Java regex (Spark codegen) and
    * RE2 (the SQL oracle) with identical semantics.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+\\d{7,}"

  /** PII redaction — the scrub pass between crawling and release: emails,
    * IPv4s, and +international phone runs replace with typed tags, in a
    * FIXED order (emails first — an address can contain digit runs the
    * later patterns would mangle mid-token). Pure `regexp_replace` /
    * `regexp_count` column exprs: codegen'd, no UDF, scan-parallel at
    * 100 TB. Emits per-category counts plus the redacted fingerprint so
    * the pipeline can both filter on PII density and verify the scrub.
    */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // counts run on the PROGRESSIVELY-REDACTED string, category by
    // category, so they count exactly the tags the scrub emits: a phone
    // run nested inside an email's local part (sam+19995551234@ex.com)
    // redacts as ONE <EMAIL> and must not also count as a phone
    val afterEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val afterIp    = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    val redacted   = regexp_replace(afterIp, PhonePattern, "<PHONE>")
    df.select(
      col(idCol),
      regexp_count(t, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(Ipv4Pattern)).cast("long").as("n_ips"),
      regexp_count(afterIp, lit(PhonePattern)).cast("long").as("n_phones"),
      md5(redacted).as("redacted_fp"))
  }

  /** Deterministic PII augmentation for the t19 oracle: the corpus is
    * synthetic word-salad with no real PII, so the fixture plants one
    * email, one IPv4, and one phone per document, all derived from
    * md5(text) — the synthWav/synthBmp construction applied to text. The
    * oracle rebuilds the identical augmented string in SQL.
    */
  def plantPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    def b(i: Int): Column = conv(substring(h, i, 2), 16, 10) // 0-255, as string
    df.select(col(idCol),
      concat(col(textCol),
        lit(" contact "), substring(h, 1, 6), lit("@example.com from "),
        b(7), lit("."), b(9), lit(".0."), b(11),
        lit(" call +15550"), lpad(b(13), 3, "0"), lpad(b(15), 3, "0")
      ).as(textCol))
  }

  /** Hashed linear quality-classifier inference — the fasttext-shaped
    * scoring pass corpus releases run to keep "high-quality-looking" text
    * (CCNet/FineWeb style): every token hashes into one of `dim` feature
    * buckets, each bucket carries a model weight, and the document score
    * is sigmoid(mean bucket weight). The weight table here is
    * DETERMINISTICALLY SYNTHESIZED (a multiplicative-hash formula — no
    * model artifact ships in this container); a real deployment swaps in
    * trained weights via the same bucket arithmetic.
    *
    * Scale shape: pure per-row column math — tokens → buckets → weights →
    * fold, all inside whole-stage codegen, NO join and NO shuffle (the
    * "broadcast the model" step degenerates to a formula; with real
    * weights it becomes one broadcast join on bucket id). The fold runs
    * left-to-right so the oracle reproduces the exact FP sum.
    */
  def linearQualityScore(df: DataFrame, idCol: String, textCol: String,
                         dim: Int = 1024): DataFrame = {
    require(dim > 0, "dim must be positive")
    val toks = TextOps.tokens(col(textCol))
    // bucket = portable 32-bit token hash mod dim; weight in [-1, 1] via a
    // Knuth multiplicative scramble of the bucket id (bucket ≤ dim − 1 and
    // 2654435761·dim < 2^53, so the product is exact in a double too)
    val weights = transform(toks, t =>
      (pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(dim)) * 2654435761L % 2001L
        - 1000L).cast("double") / 1000.0)
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      round(aggregate(weights, lit(0.0), (acc, w) => acc + w)
        / size(toks).cast("double"), 9).as("margin"))
      .withColumn("quality_prob",
        round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 6))
  }

  /** Cross-source vocabulary overlap — the corpus-composition telemetry a
    * mixture designer reads before weighting sources: for every source
    * pair, the distinct-token Jaccard overlap. Shape: one (source, token)
    * dedup aggregation over the exploded corpus (map-side combined), then
    * a self-equi-join ON TOKEN whose fan-out is bounded by #sources² per
    * token — never an all-pairs document join, and the corpus is read
    * once. At 100 TB with a handful of sources every relation after the
    * dedup is tiny.
    */
  def sourceVocabOverlap(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val vocab = df
      .select(col(sourceCol).as("source"), explode(TextOps.tokens(col(textCol))).as("token"))
      .distinct()
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("vocab_size"))
    val a = vocab.select(col("source").as("source_a"), col("token"))
    val b = vocab.select(col("source").as("source_b"), col("token"))
    a.join(b, Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("common"))
      .join(broadcast(sizes.select(col("source").as("source_a"), col("vocab_size").as("vocab_a"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("vocab_size").as("vocab_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("vocab_a"), col("vocab_b"), col("common"),
        round(col("common").cast("double") /
          (col("vocab_a") + col("vocab_b") - col("common")).cast("double"), 6).as("jaccard"))
  }

  /** Unicode canonical-composition stats — the normalization pass run
    * before dedup/tokenization so "é" and "e"+U+0301 stop being different
    * strings (they defeat exact dedup, n-gram matching, and vocab lookup).
    * Pure per-row column math over the native [[graft.functions.NfcNormalize]]
    * expression (codegen'd, no UDF, no shuffle): per-doc changed flag,
    * code-point counts before/after (composition only ever shrinks), and
    * the normalized fingerprint downstream dedup keys on.
    */
  def nfcNormalizeStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t    = col(textCol)
    val norm = graft.functions.NfcNormalize(t)
    df.select(col(idCol),
      when(norm === t, 0).otherwise(1).cast("int").as("changed"),
      length(t).cast("long").as("n_before"),
      length(norm).cast("long").as("n_after"),
      md5(norm).as("norm_fp"))
  }

  /** Readability scoring (Flesch–Kincaid grade with an integer syllable
    * proxy) — the classic text-difficulty screen corpus curation uses to
    * stratify by audience level. Syllables per word ≈ max(1, vowel runs)
    * — the standard dictionary-free heuristic, exact-integer so both
    * engines count identically; sentences ≈ terminal-punctuation runs
    * (min 1). Pure per-row regexp/aggregate column math: codegen'd scan
    * work, no shuffle, no UDF.
    *
    * Output: (id, n_words, n_sentences, n_syllables, fk_grade) with
    * fk_grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59
    * rounded to 4 decimals — the double arithmetic is a fixed three-term
    * expression over exact integer ratios, so it is engine-reproducible.
    */
  def readabilityStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    df.select(col(idCol), toks.as("__t"),
        greatest(regexp_count(col(textCol), lit("[.!?]+")), lit(1)).cast("long").as("n_sentences"))
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_words"),
        col("n_sentences"),
        aggregate(col("__t"), lit(0L),
          (acc, w) => acc + greatest(size(regexp_extract_all(w, lit("[aeiouAEIOU]+"), lit(0))), lit(1)))
          .as("n_syllables"))
      .withColumn("fk_grade",
        round(lit(0.39) * (col("n_words").cast("double") / col("n_sentences").cast("double"))
          + lit(11.8) * (col("n_syllables").cast("double") / col("n_words").cast("double"))
          - lit(15.59), 4))
  }

  /** Per-domain corpus rollup — crawl curation is domain-centric (domain
    * blocklists, per-site caps, source diversity audits all key on the
    * registrable host). Extracts the first URL per document, parses the
    * host with Spark's codegen'd `parse_url`, and rolls up document and
    * source counts per host. Docs with no URL group under the empty host
    * "" (counted, not dropped — a release report needs the no-provenance
    * mass visible).
    *
    * Scale shape: regexp + parse stay in the scan; the rollup is two
    * combine-friendly aggregations ((host, source) dedup → host), so a
    * million-doc domain costs one partial per map task — never a
    * countDistinct Expand over the corpus.
    */
  def urlDomainStats(df: DataFrame, idCol: String, textCol: String,
                     sourceCol: String): DataFrame = {
    val url  = regexp_extract(col(textCol), "(?i)https?://[^\\s]+", 0)
    val host = coalesce(lower(parse_url(url, lit("HOST"))), lit(""))
    val base = df.select(col(idCol), host.as("host"), col(sourceCol).as("__src"))
    val docs    = base.groupBy("host").agg(count(lit(1)).as("n_docs"))
    val sources = base.select(col("host"), col("__src")).distinct()
      .groupBy("host").agg(count(lit(1)).as("n_sources"))
    docs.join(sources, Seq("host"))
  }

  /** Deterministic URL fixture for the t24 oracle: the corpus carries no
    * provenance URLs, so the fixture appends one per document, derived
    * from md5(text) — hex digit 1 picks one of 16 domains, digit 2's
    * parity the TLD, digits 3-8 the path, so domains COLLIDE across docs
    * and the rollup is non-trivial. The oracle rebuilds the host straight
    * from the same md5 arithmetic — Spark's parse_url is graded against
    * the known construction, not against itself.
    */
  def plantUrls(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h   = md5(col(textCol))
    val tld = when(substring(h, 2, 1).isin("0", "2", "4", "6", "8", "a", "c", "e"),
      lit("com")).otherwise(lit("org"))
    // withColumn, not select: provenance queries need the OTHER columns
    // (source, lang) to survive the planting
    df.withColumn(textCol,
      concat(col(textCol), lit(" see https://site"), substring(h, 1, 1),
        lit("."), tld, lit("/p/"), substring(h, 3, 6)))
  }

  /** Deterministic denormalized-text fixture for the t23 oracle: the
    * synthetic corpus is pure ASCII (already NFC), so the fixture appends
    * a marker of DECOMPOSED sequences derived from md5(text) — each of the
    * first four hex digits picks "e"+U+0301 (→ "é" under NFC) for even
    * digits or "o"+U+0302 (→ "ô") for odd — the plantPii construction
    * applied to combining marks. The oracle rebuilds the identical string
    * with chr() and normalizes with DuckDB's nfc_normalize.
    */
  def plantDenormalized(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    def mark(i: Int): Column =
      when(substring(h, i, 1).isin("0", "2", "4", "6", "8", "a", "c", "e"),
        lit("e\u0301")).otherwise(lit("o\u0302")) // decomposed base+combining
    df.select(col(idCol),
      concat(col(textCol), lit(" "), mark(1), mark(2), mark(3), mark(4)).as(textCol))
  }

  /** Deterministic multi-line fixture for the t29 oracle: the synthetic
    * corpus is single-line, so the Gopher line-structure rules (bullet
    * fraction, ellipsis line-ends) would be degenerate on it. Appends
    * 2·d1 bullet lines (d1 = first md5 hex digit, 0-15 — docs with
    * d1 ≥ 10 cross the >90%-bullets removal threshold) and one trailing
    * line that ends in an ellipsis for half the corpus — all derived from
    * md5(text), so the oracle rebuilds the identical string.
    */
  /** [[plantStructuredLines]] as a per-row Column (the composed release
    * pipeline fuses the gate into one corpus projection — see
    * [[gopherKeepExpr]]).
    */
  private[graft] def plantStructuredText(text: Column): Column = {
    val h  = md5(text)
    val d1 = conv(substring(h, 1, 1), 16, 10).cast("int")
    val bullets = call_function("repeat",
      concat(lit("\n- "), substring(h, 2, 4)), d1 * lit(2))
    val ell = when(substring(h, 6, 1).isin("0", "2", "4", "6", "8", "a", "c", "e"),
      lit("...")).otherwise(lit(""))
    concat(text, bullets, lit("\n"), substring(h, 7, 6), ell)
  }

  def plantStructuredLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), plantStructuredText(col(textCol)).as(textCol))

  /** Gopher rule battery (t29, Rae et al. 2021, arXiv:2112.11446 — the
    * canonical pretraining HARD-filter set, where [[linearQualityScore]]
    * and the t2 features are soft signals): per-document rule flags plus
    * the combined keep verdict. Rules: word count in [50, 100k], mean
    * word length in [3, 10], symbol-to-word ratio (# or …) < 0.1, ≤ 90%
    * of lines bullet-started, ≤ 30% of lines ellipsis-ended, ≥ 80% of
    * words containing an alphabetic char, ≥ 2 stopword hits.
    *
    * Shape: one per-row projection — tokenize once, every rule is
    * higher-order array math inside whole-stage codegen; NO join, NO
    * shuffle (the t21 discipline). Ratios are single double divisions of
    * exact integer counts rounded at 6 decimals, and the keep verdict
    * compares the ROUNDED values — both engine-deterministic.
    */
  /** The Gopher battery's feature expressions over a text Column — the
    * single construction site [[gopherRules]] and [[gopherKeepExpr]]
    * share, so the per-query face and the composed release pipeline can
    * never drift apart.
    */
  private def gopherFeatureExprs(text: Column, stopwords: Seq[String])
      : Seq[(String, Column)] = {
    val toks   = TextOps.tokens(text)
    val nWords = size(toks).cast("long")
    val nW     = greatest(nWords, lit(1L)).cast("double")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val meanLen   = round(sumLen.cast("double") / nW, 6)
    val nAlpha    = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val fracAlpha = round(nAlpha.cast("double") / nW, 6)
    val nSymbols = (regexp_count(text, lit("#")) +
      regexp_count(text, lit("\\.\\.\\."))).cast("long")
    val symbolRatio = round(nSymbols.cast("double") / nW, 6)
    val lines  = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nL     = greatest(nLines, lit(1L)).cast("double")
    val fracBullet = round(
      size(filter(lines, l => l.startsWith("- "))).cast("double") / nL, 6)
    val fracEllipsis = round(
      size(filter(lines, l => l.endsWith("..."))).cast("double") / nL, 6)
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("long")
    Seq("n_words" -> nWords, "mean_word_len" -> meanLen,
      "frac_alpha_words" -> fracAlpha, "symbol_ratio" -> symbolRatio,
      "n_lines" -> nLines, "frac_bullet_lines" -> fracBullet,
      "frac_ellipsis_lines" -> fracEllipsis, "n_stopwords" -> nStop)
  }

  /** The combined Gopher keep verdict over the named feature columns —
    * identical comparisons in [[gopherRules]] and the fused form.
    */
  private def gopherKeepOf(f: String => Column): Column =
    f("n_words") >= 50L && f("n_words") <= 100000L &&
      f("mean_word_len") >= 3.0 && f("mean_word_len") <= 10.0 &&
      f("symbol_ratio") < 0.1 &&
      f("frac_bullet_lines") <= 0.9 &&
      f("frac_ellipsis_lines") <= 0.3 &&
      f("frac_alpha_words") >= 0.8 &&
      f("n_stopwords") >= 2L

  /** The Gopher keep verdict as ONE per-row boolean Column over a text
    * Column — the shape the composed release pipeline (Release) fuses
    * into its survivor projection so the gate costs zero joins.
    */
  private[graft] def gopherKeepExpr(text: Column,
                                    stopwords: Seq[String] =
                                      Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it"))
      : Column = {
    val feats = gopherFeatureExprs(text, stopwords).toMap
    gopherKeepOf(feats)
  }

  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  stopwords: Seq[String] =
                    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it"))
      : DataFrame = {
    val feats = gopherFeatureExprs(col(textCol), stopwords)
    df.select(col(idCol) +: feats.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep", gopherKeepOf(col).cast("int"))
  }

  /** Deterministic multi-line fixture for the t30 oracle (C4 is a
    * LINE-level filter and the synthetic corpus is single-line). All
    * planting decisions derive from md5(text) nibbles so the oracle
    * rebuilds the identical page:
    *   - the base line gets a terminal '.' for even nibble 1 (so the
    *     retained-sentence rule sees both outcomes);
    *   - one always-kept sentence line, one too-short line, one
    *     unterminated line;
    *   - a "please enable javascript" line for nibble 2 < 8;
    *   - a "lorem ipsum" page poison for nibble 3 = 0, a '{' code line
    *     for nibble 4 = 0 (page-level removals);
    *   - a 3-sentence line for nibble 5 < 12 (without it most pages fall
    *     below the ≥ 3 retained-sentences floor).
    */
  /** [[plantC4Lines]] as a per-row Column (see [[plantStructuredText]]). */
  private[graft] def plantC4Text(text: Column): Column = {
    val h = md5(text)
    def nib(i: Int): Column = conv(substring(h, i, 1), 16, 10).cast("int")
    val base = when(nib(1) % 2 === 0, concat(text, lit(".")))
      .otherwise(text)
    val l1 = concat(lit("\nc4 keeps this sentence about "),
      substring(h, 1, 6), lit(" tokens."))
    val l2 = concat(lit("\n"), substring(h, 7, 4), lit(" short."))
    val l3 = lit("\nthis line has five words minimum but no terminal punctuation")
    val l4 = when(nib(2) < 8,
      lit("\nplease enable javascript to view the content here.")).otherwise(lit(""))
    val l5 = when(nib(3) === 0,
      lit("\nlorem ipsum dolor sit amet consectetur.")).otherwise(lit(""))
    val l6 = when(nib(4) === 0,
      concat(lit("\nfunction f() { return "), substring(h, 11, 2), lit(" }")))
      .otherwise(lit(""))
    val l7 = when(nib(5) < 12,
      lit("\nfirst sentence here is fine. second sentence also fine. third sentence ends properly."))
      .otherwise(lit(""))
    concat(base, l1, l2, l3, l4, l5, l6, l7)
  }

  def plantC4Lines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), plantC4Text(col(textCol)).as(textCol))

  /** C4 heuristic cleaning (t30, Raffel et al. 2020, arXiv:1910.10683
    * §2.2 — the rule set behind the C4 corpus, where [[gopherRules]] is
    * the Gopher battery): line-level retention (a line survives only if
    * it ends in terminal punctuation [.!?"], has ≥ 5 words, and does not
    * mention javascript) plus page-level removal (any page containing
    * "lorem ipsum" or a '{', or retaining fewer than 3 sentences after
    * line filtering). The lexicon ("bad words") pass is the t19/t21
    * family and stays separate.
    *
    * Shape: one per-row projection — split lines once, every rule is
    * higher-order array math inside whole-stage codegen; NO join, NO
    * shuffle (the t21/t29 discipline). All outputs are integers or the
    * cleaned string itself; nothing floating.
    *
    * Columns: `n_lines`, `n_kept`, `n_sentences` (terminal marks in the
    * retained text), `has_lorem`, `has_brace`, `clean_len`, `clean_text`
    * (retained lines re-joined), `keep`.
    */
  /** The C4 per-row feature expressions over a text Column — the single
    * construction site [[c4Filters]] and [[c4KeepExpr]] share.
    */
  private def c4FeatureExprs(text: Column): Seq[(String, Column)] = {
    val lines = split(text, "\n")
    val kept = filter(lines, l => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= 5 &&
        !contains(lower(t), lit("javascript"))
    })
    val cleanText = array_join(kept, "\n")
    Seq("n_lines" -> size(lines).cast("long"),
      "n_kept" -> size(kept).cast("long"),
      "n_sentences" -> regexp_count(cleanText, lit("[.!?]")).cast("long"),
      "has_lorem" -> contains(lower(text), lit("lorem ipsum")).cast("int"),
      "has_brace" -> contains(text, lit("{")).cast("int"),
      "clean_len" -> length(cleanText).cast("long"),
      "clean_text" -> cleanText)
  }

  private def c4KeepOf(f: String => Column): Column =
    f("n_sentences") >= 3L && f("has_lorem") === 0 && f("has_brace") === 0

  /** The C4 keep verdict as ONE per-row boolean Column (the composed
    * release pipeline's fused-gate shape — see [[gopherKeepExpr]]).
    */
  private[graft] def c4KeepExpr(text: Column): Column = {
    val feats = c4FeatureExprs(text).toMap
    c4KeepOf(feats)
  }

  def c4Filters(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val feats = c4FeatureExprs(col(textCol))
    df.select(col(idCol) +: feats.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep", c4KeepOf(col).cast("int"))
  }

  /** BM25 relevance scores (t28) for a fixed probe-term set — the lexical
    * retrieval scorer a curation pipeline uses to pull topical slices out
    * of a crawl (and the baseline every embedding retriever is graded
    * against). Okapi BM25 with the Lucene +1 idf (always positive):
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1), and the classic tf
    * saturation tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Shape: one tokenize+explode pass filtered to the probe terms BEFORE
    * the (doc, term) aggregation, so the corpus-wide shuffle carries only
    * matching instances; doc lengths ride a second combine-friendly rollup
    * of the same scan; the per-term df/idf relation is probe-sized and
    * broadcast, N and avgdl are one-row broadcasts. Per-(doc,term) score
    * terms round to 9 decimals and sum as DECIMAL — exact and
    * partition-order-independent (the t11 discipline). Only docs matching
    * ≥ 1 probe term are emitted.
    */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75,
                 persistIntermediates: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
    // materialized (2 longs per doc / probe-filtered rows): lens has two
    // consumers (the avgdl fold, the scoring join) and tf two (the idf
    // rollup, the scoring join) — without the checkpoints the corpus was
    // tokenized four times instead of twice
    val lens = Materialize.pivot(
      toks.select(col(idCol), size(col("__toks")).cast("long").as("__dl")),
      persistIntermediates)
    // avgdl as ONE double division of two exact integer aggregates — a
    // float avg() would sum in partition order and could differ from the
    // oracle engine by an ulp that survives the 9-decimal term rounding
    val stats = broadcast(lens.agg(count(lit(1)).as("__n"), sum("__dl").as("__sumdl"))
      .select(col("__n"),
        (col("__sumdl").cast("double") / col("__n").cast("double")).as("__avgdl")))
    // tf stays UN-materialized deliberately: its probe-set isin filter and
    // (doc, term) aggregation are plan contracts (PlanContractSpec) that a
    // checkpoint would hide behind a LocalTableScan; its two consumers
    // re-tokenize one extra corpus pass, accepted for plan auditability
    val tf = toks
      .select(col(idCol), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("__tf"))
    val idf = broadcast(tf.groupBy("__term").agg(count(lit(1)).as("__df"))
      .crossJoin(stats)
      .select(col("__term"),
        round(log((col("__n").cast("double") - col("__df") + 0.5) /
          (col("__df").cast("double") + 0.5) + 1.0), 9).as("__idf")))
    val term = round(col("__idf") *
      (col("__tf").cast("double") * (k1 + 1.0)) /
      (col("__tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / col("__avgdl"))), 9)
      .cast("decimal(28,9)")
    tf.join(idf, "__term")
      .join(lens, idCol)
      .crossJoin(stats)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_matched"),
        sum("__tf").as("n_term_hits"),
        sum(term).cast("double").as("bm25"))
  }

  /** DSIR importance weights (r9, Xie et al. 2023, arXiv:2302.03169): per-
    * document log importance weight ln(p_target(doc)/p_raw(doc)) under
    * hashed-unigram bag models of a TARGET slice (the in-domain sample
    * selection is steering toward) vs the RAW corpus — the data-selection
    * score behind importance resampling. Token features hash into
    * `buckets` bins with the portable md5 family; both distributions are
    * add-one smoothed, so target-absent buckets penalize instead of
    * −∞-ing.
    *
    * Shape: the bucket histograms are bounded by `buckets` (1024 default)
    * regardless of corpus size — both build with combine-friendly counts
    * and broadcast; the corpus pays ONE tokenize+explode and one doc-keyed
    * aggregation of 9-decimal-rounded DECIMAL ln-ratio terms (exact,
    * order-independent). Totals ride one-row broadcasts.
    */
  def dsirWeights(corpus: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 1024,
                  persistIntermediates: Boolean = true): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def bucketed(df: DataFrame) = df
      .select(explode(TextOps.tokens(col(textCol))).as("__term"))
      .select(pmod(Dedup.portableHashLo(col("__term")), lit(buckets)).as("__b"))
    def hist(df: DataFrame) = df.groupBy("__b").agg(count(lit(1)).as("__cnt"))
    // The per-doc (id, bucket, tf) relation is tokenized ONCE and
    // materialized (eager localCheckpoint, ≤ |docs|·distinct-buckets rows
    // of three integers); the raw corpus histogram is its re-aggregation,
    // so the corpus pays one tokenize+md5 pass instead of three (rHist,
    // rTot, and the final scoring scan each re-derived it). The target
    // histogram is ≤ `buckets` rows — checkpointing it stops its own two
    // consumers (ratios, tTot) from re-tokenizing the target.
    val dtf = Materialize.pivot(corpus
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__term"))
      .select(col(idCol), pmod(Dedup.portableHashLo(col("__term")), lit(buckets)).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__tf")),
      persistIntermediates)
    val tHist = Materialize.pivot(hist(bucketed(target)), persistIntermediates)
    val rHist = dtf.groupBy("__b").agg(sum("__tf").as("__cnt"))
    val tTot  = broadcast(tHist.agg(sum("__cnt").as("__ttot")))
    val rTot  = broadcast(rHist.agg(sum("__cnt").as("__rtot")))
    // ln ratio per OCCURRING bucket (raw count ≥ 1 by construction; the
    // target side smooths through the coalesce-0): ln((ct+1)/(tt+B)) −
    // ln((cr+1)/(rt+B)), rounded once as a single 9-decimal term
    val ratios = broadcast(rHist
      .join(tHist.withColumnRenamed("__cnt", "__tcnt"), Seq("__b"), "left_outer")
      .crossJoin(tTot).crossJoin(rTot)
      .select(col("__b"), round(
        log((coalesce(col("__tcnt"), lit(0L)).cast("double") + 1.0) /
          (col("__ttot").cast("double") + buckets)) -
        log((col("__cnt").cast("double") + 1.0) /
          (col("__rtot").cast("double") + buckets)), 9)
        .cast("decimal(18,9)").as("__lnr")))
    dtf
      .join(ratios, "__b")
      .groupBy(col(idCol))
      .agg(sum("__tf").as("n_tokens"),
        sum(col("__tf").cast("decimal(10,0)") * col("__lnr"))
          .cast("double").as("log_weight"))
  }
}
