package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan contracts for the scale-critical queries: these assert the
  * PLAN SHAPE (pushdown, broadcast, shuffle count, no cartesian blowup),
  * not results — a regression here is invisible at sf0.001 correctness and
  * fatal at 100 TB.
  */
class PlanContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(plan: String, needle: String): Int =
    plan.linesIterator.count(_.contains(needle))

  test("point lookups push their predicate into the parquet scan") {
    Seq("p1_point_lookup" -> "o_orderkey", "p2_point_lookup_number" -> "p_partkey",
      "p3_lookup_by_id" -> "event_id").foreach { case (q, key) =>
      val plan = planOf(q)
      assert(plan.contains(s"PushedFilters: [IsNotNull($key), EqualTo($key,"),
        s"$q must push EqualTo($key) to the scan")
    }
  }

  test("small dimensions broadcast; no shuffle join for j3/j6/p5") {
    Seq("j3_broadcast_semi_join", "j6_lookup_join_nulls", "p5_stitched_lookup").foreach { q =>
      val plan = planOf(q)
      assert(count(plan, "BroadcastHashJoin") >= 1, s"$q must broadcast its small side")
      assert(count(plan, "SortMergeJoin") == 0, s"$q must not sort-merge")
    }
  }

  test("no cartesian or nested-loop joins anywhere in the inventory") {
    graft.SparkEntry.queries.keys.foreach { q =>
      val plan = planOf(q)
      assert(count(plan, "CartesianProduct") == 0, s"$q plans a cartesian product")
      // BroadcastNestedLoop is allowed only where it IS the design:
      // j7 (intentional tiny cross join), s1 (exact top-k tier — broadcast
      // probe set against the corpus, streamed once), s3/s4 (the
      // broadcast centroid set × corpus is the coarse quantizer —
      // assignment and its Lloyd training step; posting-list probing
      // itself is an equi-join), r4/t11 (a broadcast ONE-ROW corpus
      // total joined keylessly onto a small/narrow relation), and s6
      // (broadcast probes against the corpus CODE relation — the s1
      // topology with an 8-byte streamed side)
      // s7/s9 are s1's topology with an extra label/threshold predicate —
      // same broadcast probe set, same single corpus pass; t16 is t11's
      // one-row broadcast vocabulary-size scalar joined keylessly
      // s12 composes s3's broadcast-centroid assignment with s6's code
      // relation — the same two sanctioned broadcast-nested-loop shapes
      // s13/s14 are s1's broadcast-probe topology (s13 streams the corpus
      // as two BIGINT sig words, s14 carries two sims); d12 is s3/s4's
      // broadcast-centroid assignment — its pairwise stage is an equi-join
      // a11 joins a broadcast ONE-ROW max-date anchor keylessly onto the
      // event stream — the r4/t11 scalar-subquery shape; s15 is s1's
      // broadcast-probe topology (probes × corpus, one corpus pass)
      if (!Set("j7_cross_join", "s1_cosine_topk", "s3_ann_ivf", "s4_kmeans_step",
          "r4_temperature_mix", "t11_unigram_logprob", "s6_pq_adc_topk",
          "s7_hard_negatives", "s9_range_search", "t16_bigram_logprob",
          "s12_ivf_pq", "s13_sign_hamming", "s14_matryoshka",
          "d12_semdedup", "a11_decayed_sum", "s15_label_mrr",
          // s16 = s3/s4's broadcast-centroid assignment; r6 = r4's
          // broadcast one-row weight-total scalar; t28 joins the one-row
          // (N, avgdl) stats scalar keylessly twice (idf build + term
          // scoring) and r9 its two one-row distribution totals — the
          // r4/t11 shape, onto ≤1024-row bounded relations
          "s16_ivf_health", "r6_epoch_capped_mix", "t28_bm25",
          // a15 joins the broadcast ONE-ROW token grand total keylessly
          // onto the probe-sized estimate relation — the r4/t11 shape;
          // s18's norm scalars and pivoted v1 map are the same one-row
          // broadcasts (onto the 64-row register relation and the scan);
          // r10 inherits r4's one-row excess/total broadcasts
          "r9_dsir_weights", "a15_cms_heavy", "s18_power_iteration",
          // s19 recomputes s1 (broadcast-probe exact side) and s3
          // (broadcast-centroid assignment) — both sanctioned shapes
          // r11 composes r6's mixture stage, inheriting its broadcast
          // ONE-ROW weight-total scalar joined keylessly onto the
          // ≤#sources strata relation — the r4/t11 shape; every other
          // join in the composition is an equi/semi/anti hash join
          "r10_data_budget", "s19_ann_recall",
          "r11_release_pipeline").contains(q))
        assert(count(plan, "BroadcastNestedLoopJoin") == 0, s"$q plans a nested-loop join")
    }
  }

  test("asOfJoin is a single hash-partition shuffle, not a range join") {
    val plan = planOf("j5_asof_join")
    // exchanges: 1 for the union-window key partition + 1 for the final
    // presentation orderBy (rangepartitioning) — nothing else
    assert(count(plan, "Exchange hashpartitioning") == 1,
      s"asOfJoin must shuffle exactly once on the key:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0 && count(plan, "CartesianProduct") == 0)
  }

  test("aggregations keep map-side partials (a1/a4/d1)") {
    Seq("a1_count", "a4_sum_per_group", "d1_dedup_exact").foreach { q =>
      val plan = planOf(q)
      // partial + final pairs: >= 2 HashAggregate nodes around one exchange
      assert(count(plan, "HashAggregate") >= 2, s"$q lost map-side partial aggregation")
    }
  }

  test("t8 sequence packing: only the tiny range-offsets relation is single-partitioned") {
    val plan = planOf("t8_sequence_packing")
    // the corpus flows through partitioned windows; exactly one
    // SinglePartition exchange may exist — the per-range totals (#ranges
    // rows), broadcast back to the corpus side
    assert(count(plan, "Exchange SinglePartition") <= 1,
      s"corpus-sized relation funneled into one partition:\n$plan")
    assert(count(plan, "BroadcastHashJoin") >= 1, "range offsets must broadcast")
    assert(count(plan, "SortMergeJoin") == 0)
  }

  test("t14 zipf: only the ≤64-row bucket-totals relation is single-partitioned") {
    val plan = planOf("t14_zipf_stats")
    // vocab ranks assemble two-level like t8: within-frequency-class
    // windows stay partitioned; the only SinglePartition stages are the
    // log2-bucket totals prefix (≤64 rows) and the final one-row global
    // aggregate — never the vocabulary or the token stream
    assert(count(plan, "Exchange SinglePartition") <= 2,
      s"corpus/vocab-sized relation funneled into one partition:\n$plan")
    assert(count(plan, "BroadcastHashJoin") >= 1, "bucket offsets must broadcast")
  }

  test("s12 ivf-pq: posting-list probe broadcasts; the code relation never sort-merges") {
    val plan = planOf("s12_ivf_pq")
    // query time: the |probes|·nProbe probe-list relation broadcasts onto
    // the posted 8-byte code relation — the corpus side streams through a
    // hash join, never a sort-merge
    assert(count(plan, "BroadcastHashJoin") >= 1, s"probe lists must broadcast:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0, s"code relation must not sort-merge:\n$plan")
  }

  test("d9 chunk dedup: no window or per-hash row lists — aggregations only") {
    val plan = planOf("d9_chunk_dedup")
    // first-occurrence-per-hash must be the skew-immune min(struct)
    // aggregation: a window or join keyed on the chunk hash would make one
    // partition quadratic-hot under billion-fold boilerplate repetition
    assert(count(plan, "Window") == 0, s"d9 must not window:\n$plan")
    assert(count(plan, "HashAggregate") >= 4, "chunk totals and firsts need partial+final")
    assert(count(plan, "CartesianProduct") == 0)
  }

  test("d7 decontamination: eval grams broadcast, corpus never shuffles for the probe") {
    val plan = planOf("d7_decontaminate")
    assert(count(plan, "BroadcastHashJoin") >= 1, "eval gram set must broadcast")
    assert(count(plan, "SortMergeJoin") == 0, "corpus must not sort-merge against the eval set")
  }

  test("s5 PQ encoding is pure per-row math: no join, no pre-sort shuffle") {
    val plan = planOf("s5_pq_encode")
    assert(count(plan, "Join") == 0, s"PQ encode must not join:\n$plan")
    assert(count(plan, "Exchange hashpartitioning") == 0,
      s"PQ encode must not shuffle (only the presentation sort may range-partition):\n$plan")
    assert(plan.contains("pq_encode"), "native PqEncodeExpr must appear in the plan")
  }

  test("m4 patch grids prune the payload column out of a stored asset scan") {
    // over an asset TABLE (payload at rest next to meta — the 100 TB
    // layout), geometry must touch only the metadata struct: a scan that
    // drags gigabyte payload pages through memory for integer math is the
    // failure mode this pins down
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("payload", unhex(md5(col("text"))))
    val assets = graft.operators.Multimodal.toAssets(docs, "doc_id", "payload", "image")
    val dir = java.nio.file.Files.createTempDirectory("m4assets").toString
    assets.write.mode("overwrite").parquet(dir)
    val plan = graft.operators.Multimodal.patchGrid(spark.read.parquet(dir), 16)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("meta") && !scanLine.contains("payload"),
      s"payload not pruned from the asset scan:\n$plan")
    assert(count(plan, "Join") == 0)
  }

  test("r5 leakage split shuffles once on the fingerprint, no join") {
    val plan = planOf("r5_leakage_split")
    assert(count(plan, "Join") == 0, s"split assignment must not join:\n$plan")
    // one hash exchange for the per-fingerprint window; the final orderBy
    // adds a range exchange
    assert(count(plan, "Exchange hashpartitioning") == 1,
      s"expected exactly one window shuffle:\n$plan")
  }

  test("t11 log-prob keeps map-side partials and broadcasts only the scalar total") {
    val plan = planOf("t11_unigram_logprob")
    assert(count(plan, "HashAggregate") >= 4, "tf and vocab aggregations need partial+final")
    assert(count(plan, "CartesianProduct") == 0)
  }

  test("no unpartitioned window over potentially unbounded input anywhere") {
    import org.apache.spark.sql.execution.window.WindowExec
    // Single-partition windows are allowed ONLY where the windowed relation
    // is tiny by construction — t8's ~O(#ranges) offsets table in its
    // two-level prefix sum (its own contract asserts the offsets relation
    // is the only single-partition stage) and r4's per-stratum budget
    // table (≤ #sources rows). History/corpus relations must never appear
    // here — this is the contract that keeps the Transforms.totalDifficulty
    // regression class out of the whole inventory.
    // t14 joins the set on the same terms: its only single-partition window
    // runs over the ≤64-row log2-bucket totals of the frequency spectrum
    // (its own contract below pins that)
    // r10 is r4's allocation with planner math appended — same ≤#strata
    // largest-remainder window
    val allowed = Set("t8_sequence_packing", "r4_temperature_mix", "t14_zipf_stats",
      "r10_data_budget")
    // AQE wraps the tree in an adaptive leaf; disable it so collect() sees
    // the real operators
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = graft.SparkEntry.queries.toSeq.flatMap { case (q, fn) =>
        val bad = fn(spark, sf).queryExecution.executedPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty && !allowed.contains(q)) Some(q) else None
      }
      assert(offenders.isEmpty,
        s"unpartitioned windows outside the allowed set: ${offenders.sorted.mkString(", ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("similarity ranking stages use the bounded top-k aggregate, never a window") {
    // the round-13 argmax lesson applied to the remaining ranking stages:
    // a row_number window moves the FULL scored candidate relation
    // (|probes|·|corpus| at the exact tier) through its exchange; the
    // CollectTopK aggregate map-side combines to ≤ |probes|·k rows before
    // any shuffle. s15 (label MRR) goes further — no bounded set either,
    // just min(struct) + a rank count, so it must plan zero windows too.
    Seq("s1_cosine_topk", "s2_ann_lsh", "s3_ann_ivf", "s6_pq_adc_topk",
        "s7_hard_negatives", "s12_ivf_pq", "s13_sign_hamming",
        "s14_matryoshka").foreach { q =>
      val plan = planOf(q)
      assert(count(plan, "Window") == 0, s"$q must not window its ranking stage:\n$plan")
      assert(count(plan, "partial_collect_top_k") >= 1,
        s"$q lost the map-side bounded top-k partial:\n$plan")
    }
    val mrr = planOf("s15_label_mrr")
    assert(count(mrr, "Window") == 0, s"s15 must not window the corpus:\n$mrr")
  }

  test("s2 lsh: corpus buckets are count-gated before the candidate join") {
    // the hot-bucket valve: bucket sizes come first as a combine-friendly
    // count and the surviving ≤2^nPlanes bucket ids broadcast into a
    // semi-join — a degenerate bucket (all-zero vectors sign identically)
    // must never reach the probe join, and the gate itself must neither
    // shuffle nor sort the corpus. (This is annLsh's ID-level gate — the
    // bucket-ARRAY stages' gate lives inside bounded_sorted_set, covered
    // by the candidate-buckets contract below.)
    val plan = planOf("s2_ann_lsh")
    assert(count(plan, "BroadcastHashJoin") >= 2,
      s"gate semi-join + probe join must both broadcast:\n$plan")
    assert(plan.contains("LeftSemi"), s"bucket gate semi-join missing:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0, s"s2 must not sort-merge:\n$plan")
  }

  test("s13 sign-hamming: shortlist broadcasts back for the vector fetch; no sort-merge") {
    val plan = planOf("s13_sign_hamming")
    // the Hamming tier joins (id, 2×BIGINT) sigs against broadcast probe
    // sigs; only the |probes|·rerank shortlist re-joins the corpus for
    // float vectors — as a broadcast hash join, never a corpus sort-merge
    assert(count(plan, "BroadcastHashJoin") >= 1, s"shortlist must broadcast:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0, s"corpus must not sort-merge:\n$plan")
    assert(count(plan, "CartesianProduct") == 0)
  }

  test("s4 centroid assignment is per-row native math: no window, no n·k sort or shuffle") {
    // the assignment stage (shared by s3/s4/s12/s16/d12/s19) must be the
    // one-row-broadcast + native argmax loop: a row_number window moves
    // the full n·k crossed relation through an exchange (n^1.5 shuffle
    // volume at k ≈ √n), and a max_by aggregation's struct-of-array
    // buffer falls out of hash aggregation into a per-task n·k sort
    val plan = planOf("s4_kmeans_step")
    assert(count(plan, "Window") == 0, s"assignment must not window:\n$plan")
    assert(count(plan, "SortAggregate") == 0,
      s"assignment must not sort-aggregate n·k candidates:\n$plan")
    assert(plan.contains("nearest_centroid"),
      s"native NearestCentroidExpr must appear in the plan:\n$plan")
  }

  test("s16 posting health: per-row native (id, sim) projection, no corpus window") {
    // postingListStats kept a private copy of the old window assignment
    // long after assignToCentroids lost it (it needs the winning sim, not
    // just the id) — the round-13 sf1 run caught it as the new headline
    // dominator. Both values must come from the native expressions in one
    // projection; the only shuffle is the ~k-row stats aggregation.
    val plan = planOf("s16_ivf_health")
    assert(count(plan, "Window") == 0, s"s16 must not window the corpus:\n$plan")
    assert(count(plan, "SortAggregate") == 0, s"s16 must not sort-aggregate:\n$plan")
    assert(plan.contains("nearest_centroid_sim"),
      s"native NearestCentroidSimExpr must appear:\n$plan")
    assert(count(plan, "HashAggregate") >= 2, "stats rollup needs partial+final")
  }

  test("d12 semdedup: pairwise stage is an equi-join on the cell key") {
    val plan = planOf("d12_semdedup")
    // within-cell pairs must meet on centroid_id (bounded by the largest
    // cell); the only nested-loop is the sanctioned broadcast-centroid
    // assignment, and the dominated-id probe is a keyed join
    assert(count(plan, "CartesianProduct") == 0, s"d12 must never go all-pairs:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") <= 2,
      s"only the centroid assignment may nested-loop:\n$plan")
  }

  test("t17 boilerplate: doc frequency via dedup+count, never a countDistinct expand") {
    val plan = planOf("t17_boilerplate")
    // count(DISTINCT doc_id) would plan an Expand (double-shuffling the
    // gram relation); the dedup-then-count form keeps plain partial+final
    // aggregation pairs
    assert(count(plan, "Expand") == 0, s"t17 must not expand for countDistinct:\n$plan")
    assert(count(plan, "Window") == 0, s"t17 needs no windows:\n$plan")
    assert(count(plan, "HashAggregate") >= 4, "gram and doc aggs need partial+final")
    assert(count(plan, "CartesianProduct") == 0)
  }

  test("materialized cluster labels: consumer faces re-read parquet, never re-winnow") {
    // the compute-once contract behind d6/d10/d11 at 100 TB: after
    // materializeClusters persists the labeling artifact, every consumer
    // face must plan as (labels parquet scan + its own small aggregation/
    // join) — the winnow machinery (shingle explode → Generate, fingerprint
    // buckets, CC propagation) must appear in NO face plan. A face that
    // silently recomputed the labeling would re-run hours of work per
    // telemetry query.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val store = graft.chain.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-labels").toString)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val counter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet(): Unit
    }
    val labels = graft.operators.Dedup.materializeClusters(store, docs, "doc_id", "text",
      extraCols = Seq("n_chars"))
    val faces = Seq(
      "members"   -> graft.operators.Dedup.membersFromLabels(labels, "doc_id"),
      "canonical" -> graft.operators.Dedup.canonicalFromLabels(labels, "doc_id", "n_chars"),
      "histogram" -> graft.operators.Dedup.histogramFromLabels(labels))
    faces.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(count(plan, "Generate") == 0,
        s"$name face re-runs the shingle explode — labeling not reused:\n$plan")
      assert(plan.contains("Scan parquet") || plan.contains("FileScan"),
        s"$name face must read the persisted labels artifact:\n$plan")
    }
    // and the faces stay CHEAP at runtime: serving all three costs a
    // bounded handful of jobs (aggregation passes over the labels table),
    // nowhere near a winnow→CC recompute per face
    spark.sparkContext.addSparkListener(counter)
    try {
      faces.foreach(_._2.queryExecution.toRdd.count())
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(counter)
    assert(jobCount.get <= 12,
      s"serving the three faces cost ${jobCount.get} jobs — a recompute smell")
  }

  test("t21 classifier inference is pure per-row math: no join, no shuffle") {
    val plan = planOf("t21_quality_classifier")
    assert(count(plan, "Join") == 0, s"classifier scoring must not join:\n$plan")
    assert(count(plan, "Exchange hashpartitioning") == 0,
      s"classifier scoring must not shuffle (only the presentation sort range-partitions):\n$plan")
  }

  test("d13 containment: candidate pairs from bucket groupBy, sizes never broadcast") {
    val plan = planOf("d13_containment")
    // the per-doc size relation is corpus-sized: it must meet the bounded
    // candidate relation through a non-broadcast join (candidates build),
    // and the pair stage must come from the in-bucket expansion — no
    // corpus self-join, no cartesian
    assert(count(plan, "CartesianProduct") == 0, s"d13 must never go all-pairs:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") == 0)
  }

  test("w4 sessionize: both windows and the rollup share ONE user-key shuffle") {
    val plan = planOf("w4_sessionize")
    // lag-flag window, cumulative-count window, and the session groupBy
    // all partition on user_id: Catalyst must plan a single hash exchange
    // (plus the presentation orderBy's range exchange) — a second hash
    // exchange means the windows/agg stopped sharing their partitioning
    assert(count(plan, "Exchange hashpartitioning") == 1,
      s"sessionize must shuffle exactly once on the session key:\n$plan")
    assert(count(plan, "Join") == 0, s"sessionize needs no join:\n$plan")
  }

  test("d15 dup spans: gram strings never shuffle; span merge is windowed, not joined") {
    val plan = planOf("d15_dup_spans")
    // every hash exchange partitions on the 8-byte gram hash (__h) or the
    // doc id — a raw 20-char gram string as a shuffle key would 3× the
    // shuffle bytes and re-hash variable-length keys at every exchange
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(e =>
      e.contains("__h#") || e.contains("doc_id#")),
      s"an exchange partitions on something other than the gram hash/doc id:\n$plan")
    assert(count(plan, "CartesianProduct") == 0)
    assert(count(plan, "Expand") == 0, "doc frequency must be dedup+count, not countDistinct")
  }

  test("t22 fuzzy pairs: candidates via variant equi-join — the distance cross join appears in no plan") {
    val plan = planOf("t22_fuzzy_pairs")
    assert(count(plan, "CartesianProduct") == 0, s"t22 must never go all-pairs:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") == 0,
      s"t22's candidate join must be an equi-join on the variant key:\n$plan")
  }

  test("m10 WHT is one native-expression pass: no join, no pre-sort shuffle") {
    val plan = planOf("m10_wht_bands")
    assert(plan.contains("wht_band_energies"), "native WhtEnergiesExpr must appear in the plan")
    assert(count(plan, "Join") == 0, s"WHT must not join:\n$plan")
    assert(count(plan, "Exchange hashpartitioning") == 0,
      s"WHT must not shuffle (only the presentation sort range-partitions):\n$plan")
  }

  test("candidate buckets are count-gated: every bucket array is the bounded aggregate") {
    // the memory contract for the whole near-dup family: bucket membership
    // arrays may only be built by bounded_sorted_set, whose [2, maxBucket]
    // gate lives INSIDE the aggregation buffer — a bucket crossing the cap
    // poisons to a flag and stops accumulating, so per-key state is
    // bounded no matter how hot the fingerprint (the property the old
    // count → filter → left-semi → collect_set pipeline bought with two
    // extra Exchanges and a join). A raw collect_set keyed on a BUCKET
    // would materialize a hot bucket's full id array before any valve —
    // a single-reducer OOM at corpus scale. (d2's remaining collect_set
    // is the per-DOC shingle set — bounded by the document's own length,
    // not by bucket heat — so it is exempt.)
    val direct = {
      val docs = graft.sources.Tables(spark, sf).documents
      Seq(
        "winnowEdges" -> graft.operators.Dedup
          .winnowEdges(docs, "doc_id", "text"),
        "containmentPairs" -> graft.operators.Dedup
          .containmentPairs(docs, "doc_id", "text"),
        "simHashNearDups" -> graft.operators.Dedup
          .simHashNearDups(docs, "doc_id", "text"))
        .map { case (n, df) => n -> df.queryExecution.executedPlan.toString }
    }
    val fromInventory = Seq("d2_minhash_lsh", "m14_image_neardup").map(q => q -> planOf(q))
    (direct ++ fromInventory).foreach { case (name, plan) =>
      assert(plan.contains("bounded_sorted_set"),
        s"$name must build bucket arrays via the bounded aggregate:\n$plan")
      if (name != "d2_minhash_lsh") // d2: per-doc signature set is exempt
        assert(!plan.contains("collect_set"),
          s"$name: un-gated collect_set — hot buckets would materialize " +
            s"before the valve:\n$plan")
    }
  }

  test("d18 record linkage: count-gated buckets, string-free slice shuffle, no cartesian") {
    val plan = planOf("d18_record_linkage")
    // same gate discipline as the LSH stages
    assert(plan.contains("bounded_sorted_set"),
      s"d18 must build slice buckets via the bounded aggregate:\n$plan")
    assert(!plan.contains("collect_set"),
      s"d18: un-gated collect_set in the bucket stage:\n$plan")
    assert(count(plan, "CartesianProduct") == 0, s"d18 must never go all-pairs:\n$plan")
    // the candidate shuffle keys on (band, xxhash64), never the slice string
    assert(plan.contains("xxhash64"),
      s"d18 slices must shuffle as hash keys, not strings:\n$plan")
    // the verify projection runs the native expression (whole-stage eligible)
    assert(plan.contains("jaro_winkler"),
      s"d18 verify must use the native JaroWinklerExpr:\n$plan")
  }

  test("t28 bm25: probe-term filter sits below the (doc,term) aggregation, stats broadcast") {
    val plan = planOf("t28_bm25")
    // the corpus-wide shuffle must carry only probe-term instances: the
    // isin filter appears below the first HashAggregate over (doc, term)
    val aggIdx = plan.indexOf("HashAggregate")
    assert(aggIdx >= 0)
    assert(plan.indexOf("__term#", aggIdx) > 0, s"t28 aggregates (doc, term):\n$plan")
    assert(plan.contains("INSET") || plan.contains("IN ("),
      s"t28 must filter to the probe set before aggregating:\n$plan")
    assert(count(plan, "BroadcastExchange") >= 2,
      s"t28 stats and idf relations must broadcast:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0, s"t28 needs no sort-merge join:\n$plan")
  }

  test("t29 gopher rules is one per-row projection: no join, no aggregation shuffle") {
    val plan = planOf("t29_gopher_rules")
    assert(count(plan, "Join") == 0, s"t29 needs no join:\n$plan")
    assert(count(plan, "HashAggregate") == 0, s"t29 needs no aggregation:\n$plan")
    // the only exchange is the presentation orderBy's range partitioning
    assert(count(plan, "Exchange hashpartitioning") == 0,
      s"t29 must not shuffle on any key:\n$plan")
  }

  test("t30 c4 filters is one per-row projection: no join, no aggregation shuffle") {
    val plan = planOf("t30_c4_filters")
    assert(count(plan, "Join") == 0, s"t30 needs no join:\n$plan")
    assert(count(plan, "HashAggregate") == 0, s"t30 needs no aggregation:\n$plan")
    assert(count(plan, "Exchange hashpartitioning") == 0,
      s"t30 must not shuffle on any key:\n$plan")
  }

  test("t31 robust canon is one per-row projection: no join, no aggregation shuffle") {
    val plan = planOf("t31_robust_canon")
    assert(count(plan, "Join") == 0, s"t31 needs no join:\n$plan")
    assert(count(plan, "HashAggregate") == 0, s"t31 needs no aggregation:\n$plan")
    assert(count(plan, "Exchange hashpartitioning") == 0,
      s"t31 must not shuffle on any key:\n$plan")
  }

  test("a14 hll: two combine-friendly aggregations, no join, no Expand") {
    val plan = planOf("a14_hll_distinct")
    assert(count(plan, "Join") == 0, s"a14 needs no join:\n$plan")
    assert(count(plan, "Expand") == 0, s"a14 must not plan countDistinct's Expand:\n$plan")
    // register build + per-group fold, each with a partial side: the
    // shuffle carries at most groups × m register rows
    assert(count(plan, "HashAggregate") >= 4, s"a14 needs partial aggregation:\n$plan")
  }

  test("a15 cms: probe lookups broadcast, never sort-merge; vocab rollup is partial-agg") {
    val plan = planOf("a15_cms_heavy")
    assert(count(plan, "SortMergeJoin") == 0, s"a15 must not sort-merge:\n$plan")
    assert(count(plan, "BroadcastHashJoin") >= 2,
      s"a15's sketch/true-count lookups must broadcast:\n$plan")
    assert(count(plan, "Expand") == 0, s"a15 must not plan an Expand:\n$plan")
  }

  test("a17 bottom-k quantiles: bounded top-k aggregate with a partial, no corpus window/sort") {
    val plan = planOf("a17_bottomk_quantiles")
    // the whole point vs t10's exact path: the corpus must flow through a
    // combine-friendly bounded aggregate (≤ k rows/group/mapper state),
    // never a per-group window or corpus-wide sort
    assert(plan.contains("collect_top_k"), s"bounded top-k aggregate missing:\n$plan")
    assert(count(plan, "partial_collect_top_k") >= 1,
      s"a17 lost its map-side partial:\n$plan")
    assert(count(plan, "Window") == 0, s"a17 must not window the corpus:\n$plan")
    assert(count(plan, "Join") == 0, s"a17 needs no join:\n$plan")
  }

  test("j9 interval join: hash equi-join on (key, bucket) — no theta join, no distinct") {
    val plan = planOf("j9_interval_join")
    assert(count(plan, "CartesianProduct") == 0, s"j9 must not plan a cartesian:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") == 0,
      s"j9's overlap predicate must filter AFTER a hash join, not drive a theta join:\n$plan")
    assert(count(plan, "SortMergeJoin") + count(plan, "ShuffledHashJoin") +
      count(plan, "BroadcastHashJoin") >= 1, s"j9 needs an equi-join:\n$plan")
    // exactly-once comes from the report-bucket predicate, never a dedup
    assert(count(plan, "HashAggregate") == 0, s"j9 must not dedup via aggregation:\n$plan")
    assert(count(plan, "Expand") == 0, s"j9 must not Expand:\n$plan")
  }

  test("s18 power iteration: dim-keyed partial aggs only, no row-keyed corpus shuffle") {
    val plan = planOf("s18_power_iteration")
    assert(count(plan, "SortMergeJoin") == 0, s"s18 must not sort-merge:\n$plan")
    assert(count(plan, "Expand") == 0, s"s18 must not Expand:\n$plan")
    // both corpus passes aggregate on dim (≤64 rows shuffle); the v1 map
    // and scalars come back as broadcasts — the corpus never shuffles on
    // a row key
    assert(!plan.contains("hashpartitioning(__r"),
      s"s18 must not shuffle the corpus by row key:\n$plan")
    assert(count(plan, "BroadcastExchange") >= 2,
      s"s18's v1 map and norm scalars must broadcast:\n$plan")
  }

  test("r9 dsir: bounded histograms broadcast, corpus aggregates once per key") {
    val plan = planOf("r9_dsir_weights")
    assert(count(plan, "BroadcastExchange") >= 1,
      s"r9 ln-ratio relation (≤1024 rows) must broadcast:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0,
      s"r9 must never shuffle-join the corpus against the bucket relation:\n$plan")
    assert(count(plan, "CartesianProduct") == 0)
  }

  test("a13 cohort retention counts distinct activity via dedup+count, never Expand") {
    val plan = planOf("a13_cohort_retention")
    assert(count(plan, "Expand") == 0,
      s"retention must aggregate distinct (user, week) rows, not countDistinct:\n$plan")
    assert(count(plan, "CartesianProduct") == 0)
  }

  test("t27 fertility is one combine-friendly rollup: partial aggregates, no join") {
    val plan = planOf("t27_fertility")
    assert(count(plan, "partial_") >= 1, s"t27 must keep map-side partials:\n$plan")
    assert(count(plan, "Join") == 0, s"t27 needs no join:\n$plan")
  }

  test("d2 LSH plan computes the shingle aggregation exactly once") {
    val plan = planOf("d2_minhash_lsh")
    // Either the per-doc (signature + set) relation is cached — every
    // consumer reads InMemoryTableScan and the aggregation executes once
    // by construction (textual repeats under InMemoryRelation don't
    // execute) — or, uncached, at most partial+final of ONE aggregation.
    val cachedReads = plan.linesIterator.count(_.contains("InMemoryTableScan"))
    val shingleAggs = plan.linesIterator.count(l =>
      l.contains("HashAggregate") && l.contains("mh_0#"))
    assert(cachedReads >= 3 || shingleAggs <= 2,
      s"signature aggregation appears duplicated (aggs=$shingleAggs, cachedReads=$cachedReads)")
  }
}
