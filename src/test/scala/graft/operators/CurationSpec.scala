package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats computes distinct/top fractions incl. the no-bigram edge") {
    val docs = Seq(
      (1L, "a a a b"),     // n=4, nd=2, topc=3; bigrams: "a a"x2, "a b" → topb=2/3
      (2L, "x")            // single token: no bigrams → top_bigram_frac 0
    ).toDF("doc_id", "text")
    val got = Curation.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("distinct_ratio"),
          r.getAs[Double]("top_unigram_frac"), r.getAs[Double]("top_bigram_frac")))).toMap
    assert(got(1L) == ((4L, 0.5, 0.75, 2.0 / 3)))
    assert(got(2L) == ((1L, 1.0, 1.0, 0.0)))
  }

  test("sequencePacking bins equal the single-window exclusive prefix sum") {
    // ids crossing range boundaries (rangeWidth 4) with a tiny budget
    val docs = (0L until 25L).map(i => (i, "w " * (i % 7 + 1).toInt)).toDF("doc_id", "text")
    val got = Curation.sequencePacking(docs, "doc_id",
        TextOps.tokenCount(col("text")), budget = 10L, rangeWidth = 4L)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"), r.getAs[Long]("bin")))
    var prefix = 0L
    got.foreach { case (id, n, bin) =>
      assert(n == id % 7 + 1, s"doc $id token count")
      assert(bin == prefix / 10L, s"doc $id bin")
      prefix += n
    }
    // bins are contiguous from 0
    assert(got.map(_._3).distinct.sorted.sameElements(0L to got.map(_._3).max))
  }

  test("stratifiedSample is a deterministic per-stratum permille filter") {
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val s1 = Curation.stratifiedSample(rows, "id", "s", Map("a" -> 100), 700)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = Curation.stratifiedSample(rows, "id", "s", Map("a" -> 100), 700)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 == s2) // reproducible, no RNG
    val aRate = s1.count(_._2 == "a") / 1000.0
    val bRate = s1.count(_._2 == "b") / 1000.0
    assert(aRate > 0.05 && aRate < 0.15, s"a rate $aRate")
    assert(bRate > 0.6 && bRate < 0.8, s"b rate $bRate")
  }

  test("contaminatedIds flags exactly the corpus docs sharing an n-gram with the eval set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text with different words entirely"),
      (3L, "another doc where quick brown fox jumps appears midway")
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "watch the quick brown fox jumps today")).toDF("doc_id", "text")
    val got = Curation.contaminatedIds(corpus, evalSet, "doc_id", "text", gramSize = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L)) // both contain "quick brown fox jumps"
  }

  test("characteristicTerms ranks by tf desc, then rarer term, then lexicographic") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),  // tf: apple 2; banana/cherry 1
      (2L, "banana banana cherry date"),  // banana df=2, cherry df=2, date df=1
      (3L, "cherry date elderberry fig")
    ).toDF("doc_id", "text")
    val got = Curation.characteristicTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) -> r.getAs[String]("term")).toMap
    assert(got((1L, 1L)) == "apple")
    // doc 1 rank 2: banana vs cherry both tf=1; banana df=2, cherry df=3 → banana
    assert(got((1L, 2L)) == "banana")
    assert(got((2L, 1L)) == "banana")
    // doc 2 rank 2: cherry/date tf=1; date df=2... cherry df=3 → date wins
    assert(got((2L, 2L)) == "date")
  }

  test("mixtureSample draws each stratum's token budget in hash order, overshoot-by-one") {
    val docs = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b", "w " * (i % 9 + 1).toInt))
      .toDF("id", "src", "text")
    val got = Curation.mixtureSample(docs, "id", "src",
        TextOps.tokenCount(col("text")), tokenBudget = 100L, nRanges = 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("src"), r.getAs[Long]("n_tokens")))
    // brute force: same hash order, same admission rule
    import org.apache.spark.sql.functions.{md5 => _, _}
    val hashed = docs.select(col("id"),
        pmod(Dedup.portableHashLo(col("id").cast("string")), lit(Dedup.MersennePrime)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq("a", "b").foreach { s =>
      val inOrder = (0L until 400L).filter(i => (if (i % 2 == 0) "a" else "b") == s)
        .sortBy(i => (hashed(i), i))
      var start = 0L
      val expect = inOrder.takeWhile { i => val ok = start < 100L; start += i % 9 + 1; ok }.toSet
      assert(got.filter(_._2 == s).map(_._1).toSet == expect, s"stratum $s")
    }
    // per-stratum token draw is within one doc of the budget
    Seq("a", "b").foreach { s =>
      val tot = got.filter(_._2 == s).map(_._3).sum
      assert(tot >= 100L && tot < 100L + 9L, s"stratum $s drew $tot")
    }
  }

  test("groupQuantiles returns the exact rank-selected values") {
    val df = (1L to 10L).map(i => ("g", i, i * 10L)).toDF("g", "id", "v")
    val got = Curation.groupQuantiles(df, "g", "v", "id", Seq(0.5, 0.9, 1.0)).head()
    assert(got.getAs[Long]("p50") == 50L)   // ceil(10*0.5)=5 → 5th value
    assert(got.getAs[Long]("p90") == 90L)
    assert(got.getAs[Long]("p100") == 100L)
  }

  test("temperatureMixture upweights rare strata and splits the budget exactly") {
    // token masses 100 and 400; α=0.5 → sqrt masses 10/20 → weights 1/3, 2/3
    val df = Seq(("rare", 100L), ("big", 400L)).toDF("s", "n")
    val got = Curation.temperatureMixture(df, "s", col("n"), alpha = 0.5, tokenBudget = 900L)
      .collect().map(r => r.getAs[String]("s") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"), r.getAs[Long]("alloc_tokens")))).toMap
    assert(got("rare") == ((100L, 0.333333, 299L))) // floor(0.333333*900) = 299
    assert(got("big") == ((400L, 0.666667, 600L)))  // floor(0.666667*900) = 600
  }

  test("dataBudgetPlan: under-epoched strata keep full value, repeats decay") {
    // masses 100/400, α=0.5 → allocs 299/600 (the temperatureMixture
    // fixture). rare: 299/100 = 2.99 epochs → R=1.99, repeated value
    // decays; big: 600/400 = 1.5 epochs → mild decay
    val df = Seq(("rare", 100L), ("big", 400L)).toDF("s", "n")
    val got = Curation.dataBudgetPlan(df, "s", col("n"), alpha = 0.5,
        tokenBudget = 900L)
      .collect().map(r => r.getAs[String]("s") -> r).toMap
    assert(got("rare").getAs[Double]("epochs") == 2.99)
    assert(got("big").getAs[Double]("epochs") == 1.5)
    def expected(u: Long, ep: Double): Double = {
      val e9 = math.rint(math.exp(-math.max(0.0, ep - 1.0) / 15.39) * 1e9) / 1e9
      math.rint(u * (1.0 + 15.39 * (1.0 - e9)) * 1e4) / 1e4
    }
    assert(got("rare").getAs[Double]("effective_tokens") == expected(100L, 2.99))
    assert(got("big").getAs[Double]("effective_tokens") == expected(400L, 1.5))
    // decay is real: 299 allocated to rare buy < 299 effective
    assert(got("rare").getAs[Double]("effective_tokens") <
      got("rare").getAs[Long]("alloc_tokens").toDouble)
    assert(got("rare").getAs[Double]("utilization") < 1.0)

    // a stratum allocated under one epoch keeps utilization exactly 1
    val single = Seq(("only", 1000L), ("huge", 1000000L)).toDF("s", "n")
    val g2 = Curation.dataBudgetPlan(single, "s", col("n"), alpha = 0.5,
        tokenBudget = 10000L)
      .collect().map(r => r.getAs[String]("s") -> r).toMap
    assert(g2("huge").getAs[Double]("epochs") < 1.0)
    assert(g2("huge").getAs[Double]("utilization") == 1.0)
  }

  test("temperatureMixture apportions rounding excess by largest remainder") {
    // α=1, masses 1/1/4 → weights 0.166667/0.166667/0.666667 (each rounds
    // UP, Σ=1.000001). B=1e6: raw floors are 166667/166667/666667,
    // Σ=1000001 → excess 1, all fracs tie at 0 → the name tie-break docks
    // "a" alone (not the lexicographically-LAST stratum, the old bias).
    val df = Seq(("a", 1L), ("b", 1L), ("c", 4L)).toDF("s", "n")
    val got = Curation.temperatureMixture(df, "s", col("n"), alpha = 1.0, tokenBudget = 1000000L)
      .collect().map(r => r.getAs[String]("s") -> r.getAs[Long]("alloc_tokens")).toMap
    assert(got == Map("a" -> 166666L, "b" -> 166667L, "c" -> 666667L))
    assert(got.values.sum == 1000000L) // excess path lands exactly on budget

    // B=3000001: fracs differ (.166667/.166667/.666667), excess 2 — the
    // two SMALLEST remainders (a, b) give back a token; c, closest to its
    // exact entitlement, is spared.
    val got2 = Curation.temperatureMixture(df, "s", col("n"), alpha = 1.0, tokenBudget = 3000001L)
      .collect().map(r => r.getAs[String]("s") -> r.getAs[Long]("alloc_tokens")).toMap
    assert(got2 == Map("a" -> 500000L, "b" -> 500000L, "c" -> 2000001L))
    assert(got2.values.sum == 3000001L)
  }

  test("leakageSafeSplit sends every exact-dup twin into its representative's split") {
    val docs = Seq(
      (5L, "same text"), (1L, "same text"), (9L, "same text"),
      (3L, "other text"), (7L, "third text")
    ).toDF("doc_id", "text")
    val got = Curation.leakageSafeSplit(docs, "doc_id", "text", 900, 50)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("rep"), r.getAs[String]("split")))).toMap
    assert(got.size == 5)
    assert(Seq(1L, 5L, 9L).map(got(_)._1).forall(_ == 1L)) // min-id representative
    assert(Seq(1L, 5L, 9L).map(got(_)._2).distinct.size == 1) // one split per group
    assert(got.values.map(_._2).forall(Set("train", "val", "test")))
    // degenerate partition: everything lands in train
    val all = Curation.leakageSafeSplit(docs, "doc_id", "text", 1000, 0)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(all == Seq("train"))
  }

  test("unigramLogProb sums per-token ln(p) under the corpus distribution") {
    // corpus: a,a,b,b → p(a)=p(b)=0.5; ln(0.5) rounded to 9 = -0.693147181
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = Curation.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("sum_logprob")))).toMap
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - (-2.079441543)) < 1e-12)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - (-0.693147181)) < 1e-12)
  }

  test("bigramLogProb: add-one smoothing over hand-computed counts") {
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
    // unigrams a:3 b:3 c:1 → V=3; bigrams "a b":2 "b a":1 "b c":1
    // P(a b)=(2+1)/(3+3)=0.5  P(b a)=P(b c)=(1+1)/(3+3)=1/3
    val got = Curation.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("sum_logprob")))).toMap
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val d1 = (r9(math.log(0.5)) * 2 + r9(math.log(1.0 / 3))).toDouble
    assert(got(1L) == ((3L, d1)))
    assert(got(2L) == ((1L, r9(math.log(1.0 / 3)).toDouble)))
    // a one-token doc still gets a row, with zero bigrams — not dropped
    assert(got(3L) == ((0L, 0.0)))
  }

  test("lexicalDiversity: entropy and TTR on hand-computed docs") {
    val docs = Seq(
      (1L, "a a a b"),   // entropy = ln4 - 3·ln3/4 ≈ 0.562335
      (2L, "a b c d"),   // uniform → entropy = ln4, ttr 1
      (3L, "x")          // single token → entropy 0, ttr 1
    ).toDF("doc_id", "text")
    val got = Curation.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("ttr"), r.getAs[Double]("entropy")))).toMap
    assert(got(1L) == ((4L, 2L, 0.5, 0.562335)))
    assert(got(2L) == ((4L, 4L, 1.0, 1.386294)))
    assert(got(3L) == ((1L, 1L, 1.0, 0.0)))
  }

  test("corpusZipfStats: two-level global rank equals a driver-side sort") {
    // frequencies spanning several log2 buckets (1..20), many ties
    val words = (0 until 40).flatMap { i =>
      val freq = i % 20 + 1
      Seq.fill(freq)(f"w$i%02d")
    }
    val docs = words.grouped(7).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val row = Curation.corpusZipfStats(docs, "text").collect().head
    assert(row.getAs[Long]("vocab_size") == 40L)
    assert(row.getAs[Long]("total_tokens") == words.length.toLong)
    assert(row.getAs[Long]("hapax_terms") == 2L) // freqs 1..20 twice each
    // reference slope: plain global sort on the driver, same rounding
    val byFreq = words.groupBy(identity).view.mapValues(_.size).toSeq
    val ranked = byFreq.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((_, c), r0) => (r0 + 1, c) }
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val (sx, sy, sxy, sxx) = ranked.foldLeft((BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0))) {
      case ((ax, ay, axy, axx), (r, c)) =>
        val (lr, lc) = (math.log(r.toDouble), math.log(c.toDouble))
        (ax + r9(lr), ay + r9(lc), axy + r9(lr * lc), axx + r9(lr * lr))
    }
    val n = ranked.size.toDouble
    val slope = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n * sxx.toDouble - sx.toDouble * sx.toDouble)
    val expected = BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("zipf_slope") == expected)
  }

  test("perGroupSample keeps exactly k deterministic rows per group") {
    val rows = (0L until 300L).map(i => (i % 5, i)).toDF("g", "id")
    val got = Curation.perGroupSample(rows, Seq("g"), "id", k = 4)
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("id"), r.getAs[Long]("rk")))
    assert(got.length == 20)
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1L to 4L))
    }
    val again = Curation.perGroupSample(rows, Seq("g"), "id", k = 4)
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("id"))).toSet
    assert(again == got.map(t => (t._1, t._2)).toSet)
  }

  test("boilerplateNgrams flags grams shared by >= minDocs distinct docs") {
    val docs = Seq(
      (1L, "all rights reserved this page"),     // grams: "all rights reserved", "rights reserved this", "reserved this page"
      (2L, "all rights reserved in full"),
      (3L, "all rights reserved forever and ever"),
      (4L, "completely original text with no template at all"),
      (5L, "ab")                                  // < n tokens: zero grams
    ).toDF("doc_id", "text")
    val got = Curation.boilerplateNgrams(docs, "doc_id", "text", n = 3, minDocs = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("boiler_grams"),
          Option(r.getAs[java.lang.Double]("boiler_ratio")).map(_.toDouble)))).toMap
    // only "all rights reserved" appears in 3 distinct docs
    assert(got(1L) == ((3L, 1L, Some(BigDecimal(1.0/3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(got(2L) == ((3L, 1L, Some(BigDecimal(1.0/3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(got(3L)._1 == 4L && got(3L)._2 == 1L)
    assert(got(4L)._2 == 0L, "unique text carries no boilerplate")
    assert(got(5L) == ((0L, 0L, None)), "a too-short doc has no grams and a null ratio")
  }

  test("piiRedact scrubs emails/IPs/phones with typed tags; clean text untouched") {
    val docs = Seq(
      (1L, "write to alice.b+dev@corp.example.org or bob@x.io today"),
      (2L, "server at 10.0.42.255 fell over, call +4915551234567 now"),
      (3L, "no pii here at all"),
      (4L, "version 1.2.3.4 is an ip-shaped string and redacts as one"),
      (5L, "mail sam+19995551234@ex.com please") // phone run INSIDE the email
    ).toDF("doc_id", "text")
    val got = Curation.piiRedact(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"), r.getAs[Long]("n_phones"),
          r.getAs[String]("redacted_fp")))).toMap
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L)._1 == 2L && got(1L)._2 == 0L && got(1L)._3 == 0L)
    assert(got(2L) == ((0L, 1L, 1L,
      md5Hex("server at <IP> fell over, call <PHONE> now"))))
    assert(got(3L)._1 == 0L && got(3L)._2 == 0L && got(3L)._3 == 0L)
    assert(got(3L)._4 == md5Hex("no pii here at all"),
      "clean text must hash unchanged")
    assert(got(4L)._2 == 1L, "dotted quads redact conservatively (recall over precision)")
    // counts reflect the tags the scrub EMITS: the nested digit run is
    // consumed by <EMAIL> and must not double-count as a phone
    assert(got(5L) == ((1L, 0L, 0L, md5Hex("mail <EMAIL> please"))))
    // the planted-PII fixture redacts to exactly one of each category
    val planted = Curation.piiRedact(
      Curation.plantPii(docs.select($"doc_id", lit("some corpus words").as("text")),
        "doc_id", "text"), "doc_id", "text").head()
    assert((planted.getAs[Long]("n_emails"), planted.getAs[Long]("n_ips"),
      planted.getAs[Long]("n_phones")) == ((1L, 1L, 1L)))
  }

  test("epochCappedMixture caps over-epoched strata and reports forfeited budget") {
    // masses 100/400, α=1 → weights 0.2/0.8; B=1000 → raw 200/800.
    // E=1.5 → caps 150/600: BOTH bind; unfilled 50/200; epochs 1.5/1.5
    val df = Seq(("rare", 100L), ("big", 400L)).toDF("s", "n")
    val got = Curation.epochCappedMixture(df, "s", col("n"), alpha = 1.0,
        tokenBudget = 1000L, maxEpochs = 1.5)
      .collect().map(r => r.getAs[String]("s") ->
        ((r.getAs[Long]("cap_tokens"), r.getAs[Long]("alloc_tokens"),
          r.getAs[Long]("unfilled"), r.getAs[Double]("epochs")))).toMap
    assert(got("rare") == ((150L, 150L, 50L, 1.5)))
    assert(got("big") == ((600L, 600L, 200L, 1.5)))
    // a generous cap leaves the temperature allocation untouched
    val loose = Curation.epochCappedMixture(df, "s", col("n"), alpha = 1.0,
        tokenBudget = 1000L, maxEpochs = 100.0)
      .collect().map(r => r.getAs[String]("s") ->
        (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("unfilled"))).toMap
    assert(loose("rare") == ((200L, 0L)) && loose("big") == ((800L, 0L)))
  }

  test("canonicalUrlDedup merges case/query/fragment/slash variants of one page") {
    val docs = Seq(
      (1L, "a doc citing HTTPS://Example.COM/Page/?utm_source=feed#top"),
      (2L, "same page as https://example.com/Page"),
      (3L, "same again https://EXAMPLE.com/Page/#frag"),
      (4L, "different https://example.com/Other"),
      (5L, "no url in this one at all")
    ).toDF("doc_id", "text")
    val got = Curation.canonicalUrlDedup(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("canon_url"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("rep_id"), r.getAs[Int]("is_canonical")))).toMap
    // 1, 2, 3 collapse to one canonical page; rep = min id = 1
    assert(got(1L) == (("https://example.com/Page", 3L, 1L, 1)))
    assert(got(2L) == (("https://example.com/Page", 3L, 1L, 0)))
    assert(got(3L) == (("https://example.com/Page", 3L, 1L, 0)))
    assert(got(4L)._2 == 1L && got(4L)._4 == 1)
    assert(got(5L)._1 == "" && got(5L)._4 == 1, "url-less docs keep the empty key")
  }

  test("shardShuffle: every doc exactly once, deterministic, reshuffled by seed") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Curation.shardShuffle(docs, "doc_id", nShards = 4, seed = "s1").collect()
    assert(a.length == 200 && a.map(_.getLong(0)).toSet.size == 200)
    // positions are a dense 0..k-1 sequence within each shard
    a.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.sameElements(0L until rows.length.toLong), s"shard $shard positions not dense")
    }
    // same seed → identical placement; different seed → a different order
    val a2 = Curation.shardShuffle(docs, "doc_id", nShards = 4, seed = "s1").collect()
    assert(a.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      a2.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    val b = Curation.shardShuffle(docs, "doc_id", nShards = 4, seed = "s2").collect()
    assert(a.map(r => (r.getLong(0), r.getInt(1))).toSet !=
      b.map(r => (r.getLong(0), r.getInt(1))).toSet, "a new seed must reshuffle")
    // shards are near-balanced (binomial noise around 50 per shard)
    val sizes = a.groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(sizes.values.forall(n => n > 20 && n < 80), s"skewed shards: ${sizes.toMap}")
  }

  test("canonicalUrlDedup never groups URL-less docs with each other") {
    // "no URL" is absence of evidence, not sameness: every URL-less doc is
    // its own singleton, so a keep-is_canonical policy retains all of them
    val docs = Seq(
      (1L, "nothing to extract here"),
      (2L, "still no link"),
      (3L, "also blank"),
      (4L, "a real one https://example.com/p")
    ).toDF("doc_id", "text")
    val got = Curation.canonicalUrlDedup(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("canon_url"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("rep_id"), r.getAs[Int]("is_canonical")))).toMap
    assert(got.size == 4)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == (("", 1L, id, 1)),
        s"URL-less doc $id must be a singleton with itself as representative")
    }
    assert(got(4L) == (("https://example.com/p", 1L, 4L, 1)))
  }

  test("readabilityStats counts vowel-run syllables and sentence runs exactly") {
    // "Simple text here. It reads well!" → 6 words, 2 sentences,
    // syllables: sim-ple? vowel runs: S(i)mpl(e)=2, t(e)xt=1, h(e)r(e)=2,
    // (I)t=1, r(ea)ds=1, w(e)ll=1 → 8
    val docs = Seq((1L, "Simple text here. It reads well!"),
      (2L, "xyz")).toDF("doc_id", "text") // no vowels, no terminator → mins kick in
    val got = Curation.readabilityStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_syllables"), r.getAs[Double]("fk_grade")))).toMap
    assert(got(1L)._1 == 6L && got(1L)._2 == 2L && got(1L)._3 == 8L)
    val fk1 = BigDecimal(0.39 * (6.0 / 2.0) + 11.8 * (8.0 / 6.0) - 15.59)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._4 == fk1)
    assert(got(2L) == ((1L, 1L, 1L,
      BigDecimal(0.39 + 11.8 - 15.59).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("nfcNormalizeStats composes decomposed sequences; NFC text passes through") {
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "caf" + "e\u0301"),        // decomposed e+acute -> composes, shrinks by 1
      (3L, "caf\u00e9"),              // already composed - unchanged
      (4L, "o\u0302" + " and " + "e\u0301") // two decomposed pairs
    ).toDF("doc_id", "text")
    val got = Curation.nfcNormalizeStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("changed"), r.getAs[Long]("n_before"), r.getAs[Long]("n_after"),
          r.getAs[String]("norm_fp"))).toMap
    assert(got(1L)._1 == 0 && got(1L)._2 == got(1L)._3)
    assert(got(2L) == ((1, 5L, 4L, got(3L)._4)), "decomposed café must hash like composed café")
    assert(got(3L)._1 == 0 && got(3L)._2 == 4L && got(3L)._3 == 4L)
    assert(got(4L)._1 == 1 && got(4L)._2 == 9L && got(4L)._3 == 7L)
    // the fixture plants sequences NFC actually changes, for every doc
    val plantedStats = Curation.nfcNormalizeStats(
      Curation.plantDenormalized(docs, "doc_id", "text"), "doc_id", "text")
      .collect()
    assert(plantedStats.forall(_.getAs[Int]("changed") == 1))
    // every doc shrinks by the 4 planted pairs plus any decomposed pairs
    // already in its own text (docs 2 and 4 here carry 1 and 2 of their own)
    val shrink = plantedStats.map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_before") - r.getAs[Long]("n_after"))).toMap
    assert(shrink == Map(1L -> 4L, 2L -> 5L, 3L -> 4L, 4L -> 6L))
  }
}
