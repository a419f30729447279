package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "  The   quick  BROWN fox jumps "),
    (3L, "der hund und die katze ist da"),
    (4L, "xyzzy plugh")
  ).toDF("doc_id", "text")

  test("tokenCount splits on any whitespace run") {
    val got = docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 5, 2L -> 5, 3L -> 7, 4L -> 2))
  }

  test("shingles builds word n-grams") {
    val got = docs.filter($"doc_id" === 1)
      .select(TextOps.shingles(col("text"), 3))
      .as[Seq[String]].head()
    assert(got == Seq("the quick brown", "quick brown fox", "brown fox jumps"))
  }

  test("normalized collapses case and whitespace; fingerprints of 1 and 2 match") {
    val fps = docs.filter($"doc_id".isin(1L, 2L))
      .select(TextOps.fingerprint(col("text"))).as[String].collect().toSet
    assert(fps.size == 1)
  }

  test("langId prefers the language with most marker hits") {
    val got = docs.select(col("doc_id"), TextOps.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(3L) == "de")
    assert(got(4L) == "und")
  }

  test("quality features: stopword ratio and punct ratio behave") {
    val feats = TextOps.qualityFeatures(col("text"))
    val row = docs.filter($"doc_id" === 1)
      .select(feats.map { case (n, c) => c.as(n) }: _*).head()
    assert(row.getAs[Int]("n_tokens") == 5)
    assert(row.getAs[Double]("stopword_ratio") == 0.2) // "the" of 5 tokens
    assert(row.getAs[Double]("punct_ratio") == 0.0)
  }

  test("bpePairCounts weights pairs by word frequency, skips 1-char words") {
    val docs = Seq((1L, "abab ab a"), (2L, "abab")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(docs, col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // vocab: abab×2 (pairs ab,ba,ab each), ab×1 (pair ab), a×1 (no pairs)
    // → ab: 2·2 + 1 = 5, ba: 2·1 = 2
    assert(got == Map("ab" -> 5L, "ba" -> 2L))
  }

  test("bpeTrain learns the textbook merge sequence on the low/lower/lowest corpus") {
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    // pairs: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1 →
    //   tie (l,o)/(o,w) breaks lexicographic → (l,o); then (lo,w)=5;
    //   then (low,e)=2
    val got = TextOps.bpeTrain(docs, col("text"), nMerges = 3)
    assert(got == Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L)))
    // overlap semantics: greedy leftmost — "aaa"×1 merges once per pass
    val aaa = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = TextOps.bpeTrain(aaa, col("text"), nMerges = 2)
    // round 1: (a,a)=4 (two per word); round 2 vocab "aa a": (aa,a)=2
    assert(m == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
    // merge budget beyond exhaustion stops cleanly
    val one = Seq((1L, "x y")).toDF("doc_id", "text")
    assert(TextOps.bpeTrain(one, col("text"), nMerges = 5).isEmpty)
  }

  test("bpeApplyCounts encodes docs under the trained merges") {
    // training corpus: "low" x5, "lower" x2 → rules (l,o), (lo,w), (low,e)
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower")
    ).toDF("doc_id", "text")
    val got = TextOps.bpeApplyCounts(docs, "doc_id", col("text"), nMerges = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"),
          r.getAs[Double]("tokens_per_word")))).toMap
    // "low" → [low] (1 sym); "lower" → [lowe, r] (2 syms)
    assert(got(1L) == ((5L, 5L, 1.0)))
    assert(got(2L) == ((2L, 4L, 2.0)))
    // zero merges is plain character counting
    val chars = TextOps.bpeApplyCounts(docs, "doc_id", col("text"), nMerges = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    // one merge (l,o): "low" → [lo,w] 2 syms; "lower" → [lo,w,e,r] 4 syms
    assert(chars == Map(1L -> 10L, 2L -> 8L))
  }
}
