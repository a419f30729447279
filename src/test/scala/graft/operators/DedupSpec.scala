package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
    (3L, "ALPHA  beta gamma delta epsilon zeta eta theta"), // normalized dup of 1
    (4L, "alpha beta gamma delta epsilon zeta eta iota"),   // near dup (1 word differs)
    (5L, "one two three four five six seven eight")         // unrelated
  ).toDF("doc_id", "text")

  test("exactDedup groups normalized duplicates under the lowest id") {
    val got = Dedup.exactDedup(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(got(1L) == 3L) // docs 1,2,3 collapse
    assert(got(4L) == 1L)
    assert(got(5L) == 1L)
  }

  test("duplicateGroups reports only multi-member groups with the keeper id") {
    val got = Dedup.duplicateGroups(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(got == Map(1L -> 3L)) // docs 1,2,3; singletons absent
  }

  test("fingerprint64 collapses normalized duplicates like the md5 form") {
    val fps = docs.select(col("doc_id"), TextOps.fingerprint64(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) == fps(3L))
    assert(fps(1L) != fps(5L))
  }

  test("minHash signatures are equal for identical docs, differ for unrelated") {
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", shingleSize = 2, numHashes = 16)
      .collect().map(r => r.getAs[Long]("doc_id") -> (1 to 16).map(i => r.getAs[Long](s"mh_${i - 1}")))
      .toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(5L))
  }

  test("minHashLshNearDups finds the near-duplicate pair and skips unrelated") {
    val pairs = Dedup.minHashLshNearDups(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)) || pairs.contains((2L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("candidatePairs maxBucket valve drops only oversized buckets") {
    val sigs  = Dedup.minHashSignatureArray(docs, "doc_id", "text", 2, 16)
    val bands = Dedup.lshBands(sigs, "doc_id", 16, 8)
    val all    = Dedup.candidatePairs(bands, "doc_id").count()
    val capped = Dedup.candidatePairs(bands, "doc_id", maxBucket = Some(2)).count()
    val none   = Dedup.candidatePairs(bands, "doc_id", maxBucket = Some(1)).count()
    assert(capped <= all)
    assert(none == 0L) // every >1-member bucket exceeds cap 1
  }

  test("contaminationScores grades overlap: dup=1.0, near-dup in (0,1), unrelated=0") {
    val got = Dedup.contaminationScores(
      docs.filter(col("doc_id") =!= 1L), docs.filter(col("doc_id") === 1L),
      "doc_id", "text", shingleSize = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("overlap")).toMap
    assert(got(2L) == 1.0) // exact dup of the benchmark doc
    // one case-differing token breaks exactly the one gram containing it
    assert(got(3L) == 5.0 / 6.0)
    assert(got(4L) > 0.0 && got(4L) < 1.0) // one word differs
    assert(got(5L) == 0.0) // unrelated
    // thresholded form keeps only the contaminated tail
    val flagged = Dedup.contaminationScores(
      docs.filter(col("doc_id") =!= 1L), docs.filter(col("doc_id") === 1L),
      "doc_id", "text", shingleSize = 3, minOverlap = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(flagged == Set(2L, 3L, 4L))
  }

  test("verifyJaccard computes exact intersection/union counts") {
    val pairs = Seq((1L, 4L)).toDF("id_a", "id_b")
    val row = Dedup.verifyJaccard(docs, pairs, "doc_id", "text", shingleSize = 1).head()
    // word sets: 8 tokens each, 7 shared → union 9
    assert(row.getAs[Int]("inter") == 7)
    assert(row.getAs[Int]("uni") == 9)
  }

  test("simHashNearDups maxBucket valve bounds degenerate chunk buckets") {
    // many short docs that all hash to the same 16-bit chunk values —
    // the boilerplate-corpus degeneracy the valve exists for
    val degenerate = (1L to 12L).map(i => (i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val all = Dedup.simHashNearDups(degenerate, "doc_id", "text").count()
    assert(all == 12L * 11 / 2) // uncapped: full quadratic pair set
    val capped = Dedup.simHashNearDups(degenerate, "doc_id", "text", maxBucket = Some(4))
    assert(capped.count() == 0L) // every bucket exceeds the cap → dropped whole
    // the valve must not disturb non-degenerate pairs: docs 1/2/4 still link
    val normal = Dedup.simHashNearDups(docs, "doc_id", "text",
      maxHamming = 10, maxBucket = Some(8))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(normal.contains((1L, 2L)))
  }

  test("simHash of identical docs equal; near dup within small hamming") {
    val h = Dedup.simHash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    val hamNear = java.lang.Long.bitCount(h(1L) ^ h(4L))
    val hamFar  = java.lang.Long.bitCount(h(1L) ^ h(5L))
    assert(hamNear < hamFar)
  }

  test("cosineNearDups flags identical vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (3L, Array(-1.0f, 2.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.cosineNearDups(vecs, "vec_id", "embedding", dim = 4, nPlanes = 2, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("connectedComponents labels every node with its cluster's min id") {
    // components: {1,2,3,4} (a 3-hop chain), {10,11}, isolated 99 has no edges
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents == brute-force union-find on a random graph (incl. long chains)") {
    // deterministic LCG edges over 200 nodes + an adversarial 40-node chain
    // (diameter 39 — exercises the pointer-jumping path, maxIter default 30
    // would NOT reach it by neighbor propagation alone)
    var x = 12345L
    def nxt(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x }
    val rand  = (1 to 150).map(_ => (nxt() % 200, nxt() % 200)).filter(p => p._1 != p._2)
    val chain = (500L until 539L).map(i => (i, i + 1))
    val edges = (rand ++ chain).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    // distributed min-label loop (driver fast path disabled) must agree
    val gotLoop = Dedup.connectedComponents(edges, "id_a", "id_b", driverMaxEdges = 0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(a: Long): Long = { val p = parent.getOrElseUpdate(a, a); if (p == a) a else { val r = find(p); parent(a) = r; r } }
    (rand ++ chain).foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val expect = parent.keys.map(k => k -> find(k)).toMap
    assert(got == expect)
    assert(gotLoop == expect)
  }

  test("connectedComponents works on string ids and rejects mismatched id types") {
    val sedges = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(sedges, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
    // string src vs decimal dst would union positionally through a silent
    // common cast — must be rejected, not coerced
    val bad = Seq(("a", java.math.BigDecimal.ONE)).toDF("id_a", "id_b")
    val err = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(bad, "id_a", "id_b")
    }
    assert(err.getMessage.contains("common type"))
  }

  test("winnowEdges links docs sharing >=minShared fingerprints, transitively clusterable") {
    // 1,2,3 share long runs; 4 shares a shorter run with 1 only; 5 unrelated
    val chain = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "XX alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val edges = Dedup.winnowEdges(chain, "doc_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((1L, 2L)) && edges.contains((2L, 3L)))
    assert(!edges.exists { case (a, b) => a == 5L || b == 5L })
    val comps = Dedup.connectedComponents(
        Dedup.winnowEdges(chain, "doc_id", "text", minShared = 2), "id_a", "id_b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("chunkDedup: keep-first across docs, within-doc repeats, short tails") {
    val docs = Seq(
      (1L, "a b c d"),         // chunks (k=2): [a b][c d] — all first
      (2L, "a b x y c d"),     // [a b] dup of 1, [x y] uniq, [c d] dup of 1
      (3L, "p q p q"),         // [p q][p q] — second dups the first IN-DOC
      (4L, "a b c")            // [a b] dup, [c] short tail uniq
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("dup_chunks"),
          r.getAs[Double]("dup_fraction")))).toMap
    assert(got(1L) == ((2L, 0L, 0.0)))
    assert(got(2L) == ((3L, 2L, 0.666667)))
    assert(got(3L) == ((2L, 1L, 0.5)))
    assert(got(4L) == ((2L, 1L, 0.5)))

    // the rewrite face removes exactly the duplicate chunks and rejoins
    // survivors in offset order; an all-duplicate doc keeps an EMPTY row
    val clean = Dedup.chunkClean(docs.union(Seq((5L, "a b")).toDF("doc_id", "text")),
        "doc_id", "text", chunkTokens = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text")))).toMap
    assert(clean(1L) == ((2L, 2L, "a b c d")))
    assert(clean(2L) == ((3L, 1L, "x y")))
    assert(clean(3L) == ((2L, 1L, "p q")))
    assert(clean(4L) == ((2L, 1L, "c")))
    assert(clean(5L) == ((1L, 0L, "")), "all-duplicate doc stays as an empty row")
  }

  test("clusterQuality grades star pairs against the min-id rep; singletons never appear") {
    val dup  = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, dup), (2L, dup),                // exact dups: jaccard 1.0 vs rep 1
      (3L, "XX " + dup),                   // near-dup of the family
      (9L, "one two three four five six seven eight nine ten") // singleton
    ).toDF("doc_id", "text")
    val got = Dedup.clusterQuality(docs, "doc_id", "text", minShared = 2)
      .collect().map(r => r.getAs[Long]("component") ->
        ((r.getAs[Long]("n_members"), r.getAs[Double]("min_jaccard"),
          r.getAs[Double]("mean_jaccard")))).toMap
    assert(got.keySet == Set(1L)) // one multi-member cluster, no singleton rows
    val (n, mn, mean) = got(1L)
    assert(n == 3L)
    assert(mn > 0.0 && mn < 1.0)     // the near-dup member drags the min below 1
    assert(mean > mn && mean <= 1.0) // exact dup holds the mean above the min
    // star semantics: mean over exactly n-1 = 2 pairs, one of them 1.0
    // (HALF_UP at 6 decimals — Spark's round, not rint's half-even)
    assert(mean == BigDecimal((1.0 + mn) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("canonicalPerCluster keeps the best-quality doc per cluster, singletons themselves") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 10L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 30L), // best
      (3L, "XX alpha beta gamma delta epsilon zeta eta theta iota kappa", 20L),
      (9L, "one two three four five six seven eight nine ten", 5L)           // singleton
    ).toDF("doc_id", "text", "n_chars")
    val got = Dedup.canonicalPerCluster(docs, "doc_id", "text", "n_chars", minShared = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("rep_id"),
          r.getAs[Int]("is_canonical")))).toMap
    assert(got(1L) == ((1L, 2L, 0)))
    assert(got(2L) == ((1L, 2L, 1)))
    assert(got(3L) == ((1L, 2L, 0)))
    assert(got(9L) == ((9L, 9L, 1)))
    // quality tie → smallest id wins
    val tied = Seq(
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 10L),
      (8L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 10L)
    ).toDF("doc_id", "text", "n_chars")
    val reps = Dedup.canonicalPerCluster(tied, "doc_id", "text", "n_chars", minShared = 2)
      .filter(col("is_canonical") === 1).select("doc_id").collect().map(_.getLong(0))
    assert(reps.toSeq == Seq(7L))
    // string ids (connectedComponents supports them) must pick real
    // representatives, not null out under an id-negation cast
    val strIds = Seq(
      ("docA", "alpha beta gamma delta epsilon zeta eta theta iota kappa", 10L),
      ("docB", "alpha beta gamma delta epsilon zeta eta theta iota kappa", 30L)
    ).toDF("doc_id", "text", "n_chars")
    val sGot = Dedup.canonicalPerCluster(strIds, "doc_id", "text", "n_chars", minShared = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[String]("rep_id"), r.getAs[Int]("is_canonical")))).toMap
    assert(sGot("docA") == (("docB", 0)) && sGot("docB") == (("docB", 1)))
    // null quality loses to any scored doc; integral MinValue cannot
    // overflow the negation into winning
    val hazard = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", Some(Long.MinValue)),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", None),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", Some(0L))
    ).toDF("doc_id", "text", "q")
    val hGot = Dedup.canonicalPerCluster(hazard, "doc_id", "text", "q", minShared = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("is_canonical")).toMap
    assert(hGot == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("clusterSizeHistogram counts singletons and near-dup families") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "XX alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val got = Dedup.clusterSizeHistogram(docs, "doc_id", "text", minShared = 2)
      .collect().map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))).toMap
    assert(got == Map(1L -> ((1L, 1L)), 3L -> ((1L, 3L)))) // one singleton, one family of 3
  }

  test("materializeClusters: one labeling pass feeds members, canonical, and histogram") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 10L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 30L),
      (3L, "XX alpha beta gamma delta epsilon zeta eta theta iota kappa", 20L),
      (9L, "one two three four five six seven eight nine ten", 5L)
    ).toDF("doc_id", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-clusters").toString
    val store = graft.chain.TableStore(spark, dir)

    // ONE winnow→CC pass, persisted; every consumer below reads the table
    val labels = Dedup.materializeClusters(store, docs, "doc_id", "text",
      minShared = 2, extraCols = Seq("n_chars"))
    assert(store.exists("dup_clusters"))

    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

    // each from-labels consumer matches its standalone (recomputing) form
    assert(rows(Dedup.membersFromLabels(labels, "doc_id")) ==
      rows(Dedup.connectedComponents(
          Dedup.winnowEdges(docs, "doc_id", "text", 3, 4, 2), "id_a", "id_b")
        .select(col("id").as("doc_id"), col("label").as("component"))))
    assert(rows(Dedup.canonicalFromLabels(labels, "doc_id", "n_chars")) ==
      rows(Dedup.canonicalPerCluster(docs, "doc_id", "text", "n_chars", minShared = 2)))
    assert(rows(Dedup.histogramFromLabels(labels)) ==
      rows(Dedup.clusterSizeHistogram(docs, "doc_id", "text", minShared = 2)))
  }

  test("semanticDedup drops every later member of a tight cell, keeps the minimum") {
    // cell A: vecs 0,1,2 nearly parallel (pairwise cos ≈ 1); cell B: vec 3
    // alone; vec 4 shares cell A's centroid side but is orthogonal enough
    // to survive tau
    val vecs = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f)),
      (1L, Array(0.99f, 0.0f, 0.01f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)),
      (4L, Array(0.4f, 0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val centroids = vecs.filter(col("vec_id") === 2L || col("vec_id") === 3L)
    val got = Dedup.semanticDedup(vecs, centroids, "vec_id", "embedding", tau = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("centroid_id"), r.getAs[Int]("is_kept")))).toMap
    assert(got.size == 5)
    assert(got(0L)._2 == 1, "smallest id of the dup chain is the keeper")
    assert(got(1L)._2 == 0 && got(2L)._2 == 0, "later near-parallel members drop")
    assert(got(3L)._2 == 1, "a singleton cell keeps its only member")
    assert(got(4L)._2 == 1, "below-tau same-cell neighbor survives")
    assert(got(3L)._1 == 3L && got(0L)._1 == 2L)
    // tightening tau to 1+ keeps everything (cosine never exceeds 1)
    val all = Dedup.semanticDedup(vecs, centroids, "vec_id", "embedding", tau = 1.01)
      .agg(org.apache.spark.sql.functions.sum("is_kept")).head().getLong(0)
    assert(all == 5L)
  }

  test("semanticDedup maxCell valve bounds a degenerate single-cell corpus") {
    // pathological centroid fit: ONE centroid, so every vector lands in one
    // cell and the unguarded within-cell join is quadratic. Under the valve
    // the cell salt-splits into ceil(n/maxCell) groups; identical vectors
    // inside a salt group still dedup to their minimum.
    val n = 200
    val vecs = (0 until n).map(i => (i.toLong, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val centroids = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val guarded = Dedup.semanticDedup(vecs, centroids, "vec_id", "embedding",
      tau = 0.99, maxCell = Some(20))
    val rows = guarded.collect()
    assert(rows.length == n)
    val kept = rows.filter(_.getAs[Int]("is_kept") == 1).map(_.getAs[Long]("vec_id")).sorted
    // exactly one keeper per salt group (all vectors identical, cos = 1):
    // ceil(200/20) = 10 groups → ≤ 10 keepers, and the global minimum id 0
    // is always one of them
    assert(kept.length <= 10, s"valve must bound keepers to the salt-group count, got ${kept.length}")
    assert(kept.contains(0L))
    // sanity: cells at or under the valve are byte-identical to unguarded
    val loose = Dedup.semanticDedup(vecs, centroids, "vec_id", "embedding",
      tau = 0.99, maxCell = Some(n)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val unguarded = Dedup.semanticDedup(vecs, centroids, "vec_id", "embedding",
      tau = 0.99, maxCell = None).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(loose.sameElements(unguarded))
  }
}
