package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class RobustCanonSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, Row] =
    Curation.robustCanonicalize(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("two obfuscated spellings of one page share a canonical md5") {
    val plain = "please copy this page now!"
    // Cyrillic с/о/р/у in "сору", a zero-width space, quadrupled bang
    val spam = "please сору​ this page now!!!!"
    val got = run(Seq(1L -> plain, 2L -> spam))
    assert(got(1L).getAs[String]("canon") == plain)
    assert(got(2L).getAs[String]("canon") == plain)
    assert(got(1L).getAs[String]("canon_md5") == got(2L).getAs[String]("canon_md5"))
    assert(got(1L).getAs[Int]("changed") == 0)
    assert(got(2L).getAs[Int]("changed") == 1)
  }

  test("each evasion strips independently; legitimate text is untouched") {
    val got = run(Seq(
      (1L, "bidi‎‏marks⁠and﻿bom"),
      (2L, "АЕ capitals οα greek"), // А Е ο α
      (3L, "ellipsis... stays, four dots.... squeeze"),
      (4L, "hyphen-ated and double!! bangs stay")))
    assert(got(1L).getAs[String]("canon") == "bidimarksandbom")
    assert(got(2L).getAs[String]("canon") == "AE capitals oa greek")
    // "..." (3 dots) squeezes to "." at the >=3 threshold; ".." would stay
    assert(got(3L).getAs[String]("canon") == "ellipsis. stays, four dots. squeeze")
    assert(got(4L).getAs[String]("canon") == "hyphen-ated and double!! bangs stay")
    assert(got(4L).getAs[Int]("changed") == 0)
  }

  test("plantObfuscation spells the same canonical suffix per md5 nibble") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    val out = Curation.robustCanonicalize(
      Curation.plantObfuscation(docs, "doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("canon")).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      assert(out(id) == text + " copy!", s"doc $id: '${out(id)}'")
    }
  }
}
