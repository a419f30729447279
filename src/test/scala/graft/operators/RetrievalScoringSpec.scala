package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalScoringSpec extends SparkSpec {
  import spark.implicits._

  test("bm25Scores: hand-computed two-doc fixture, non-matching doc absent") {
    val docs = Seq(
      (1L, "spark spark table"), // tf(spark)=2, dl=3
      (2L, "query plan here and more words"), // tf(query)=1, dl=6
      (3L, "nothing relevant at all") // no probe term -> absent
    ).toDF("doc_id", "text")
    val got = Curation.bm25Scores(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms_matched"), r.getAs[Long]("n_term_hits"),
          r.getAs[Double]("bm25"))).toMap
    // N=3, avgdl=(3+6+4)/3; df(spark)=1, df(query)=1 -> same idf
    val n = 3.0; val avgdl = 13.0 / 3.0
    val idf = math.rint(math.log((n - 1.0 + 0.5) / (1.0 + 0.5) + 1.0) * 1e9) / 1e9
    def score(tf: Double, dl: Double): Double =
      math.rint(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e9) / 1e9
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 1L && got(1L)._2 == 2L)
    assert(math.abs(got(1L)._3 - score(2.0, 3.0)) < 2e-9)
    assert(math.abs(got(2L)._3 - score(1.0, 6.0)) < 2e-9)
  }

  test("bm25Scores: higher tf scores higher at equal length, longer doc scores lower at equal tf") {
    val docs = Seq(
      (1L, "spark spark spark pad pad pad pad pad"),
      (2L, "spark pad pad pad pad pad pad pad"),
      (3L, "spark pad pad pad pad pad pad pad pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val got = Curation.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(got(1L) > got(2L)) // tf saturation still increases
    assert(got(2L) > got(3L)) // length normalization penalizes
  }

  test("dsirWeights: target-like docs weigh above target-unlike docs") {
    // target distribution = aa/bb heavy; doc 10 matches it, doc 11 is all
    // out-of-target tokens, doc 12 mixes
    val corpus = Seq(
      (10L, "aa bb aa bb aa bb"),
      (11L, "xx yy zz xx yy zz"),
      (12L, "aa bb xx yy aa zz")
    ).toDF("doc_id", "text")
    val target = Seq((1L, "aa bb aa bb aa bb aa bb")).toDF("doc_id", "text")
    val got = Curation.dsirWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("log_weight"))).toMap
    assert(got.keySet == Set(10L, 11L, 12L))
    assert(got(10L)._1 == 6L)
    assert(got(10L)._2 > got(12L)._2 && got(12L)._2 > got(11L)._2)
  }

  test("dsirWeights: per-token ln-ratio matches a direct computation") {
    val corpus = Seq((10L, "aa"), (11L, "cc")).toDF("doc_id", "text")
    val target = Seq((1L, "aa aa")).toDF("doc_id", "text")
    val got = Curation.dsirWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    // smoothed models: p_t(b) = (cnt_t+1)/(2+1024), p_r(b) = (cnt_r+1)/(2+1024)
    def lnr(ct: Long, cr: Long): Double = math.rint(
      (math.log((ct + 1.0) / (2.0 + 1024)) - math.log((cr + 1.0) / (2.0 + 1024))) * 1e9) / 1e9
    assert(math.abs(got(10L) - lnr(2, 1)) < 2e-9) // 'aa': 2 target hits, 1 raw
    assert(math.abs(got(11L) - lnr(0, 1)) < 2e-9) // 'cc': unseen in target
  }
}
