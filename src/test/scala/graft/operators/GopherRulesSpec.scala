package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, Row] =
    Curation.gopherRules(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("clean prose keeps; each rule flags its own violation") {
    val clean = (Seq("the", "it") ++ Seq.fill(58)("word")).mkString(" ") // 60 words
    val short = "only nine words here not nearly enough to pass"
    val bullets = "the it " + Seq.fill(30)("\n- x").mkString // 32 lines, 30 bullets
    val numeric = (Seq("the", "it") ++ Seq.fill(58)("12345")).mkString(" ")
    val got = run(Seq(1L -> clean, 2L -> short, 3L -> bullets, 4L -> numeric))

    assert(got(1L).getAs[Int]("keep") == 1)
    assert(got(1L).getAs[Long]("n_words") == 60L)
    assert(got(1L).getAs[Double]("mean_word_len") ==
      math.rint((3 + 2 + 58 * 4).toDouble / 60 * 1e6) / 1e6)
    assert(got(1L).getAs[Double]("frac_alpha_words") == 1.0)
    assert(got(1L).getAs[Long]("n_lines") == 1L)

    assert(got(2L).getAs[Int]("keep") == 0) // word count < 50
    assert(got(2L).getAs[Long]("n_words") == 9L)

    assert(got(3L).getAs[Int]("keep") == 0) // > 90% bullet lines
    assert(got(3L).getAs[Long]("n_lines") == 31L)
    assert(got(3L).getAs[Double]("frac_bullet_lines") ==
      math.rint(30.0 / 31 * 1e6) / 1e6)

    assert(got(4L).getAs[Int]("keep") == 0) // frac_alpha < 0.8
    assert(got(4L).getAs[Double]("frac_alpha_words") ==
      math.rint(2.0 / 60 * 1e6) / 1e6)
  }

  test("symbol and ellipsis rules count hash marks and ... occurrences") {
    val hashy = (Seq("the", "it") ++ Seq.fill(48)("w")).mkString(" ") + " ##### #"
    val ell   = "the it w w w\nline one...\nline two...\nclean line"
    val got = run(Seq(1L -> hashy, 2L -> ell))
    // 6 hashes over 52 words -> ratio > 0.1 -> dropped
    assert(got(1L).getAs[Double]("symbol_ratio") ==
      math.rint(6.0 / 52 * 1e6) / 1e6)
    assert(got(1L).getAs[Int]("keep") == 0)
    // 2 of 4 lines ellipsis-ended -> > 0.3 -> dropped (also short, but
    // the ellipsis column itself must be exact)
    assert(got(2L).getAs[Double]("frac_ellipsis_lines") == 0.5)
    assert(got(2L).getAs[Long]("n_lines") == 4L)
  }

  test("plantStructuredLines appends 2*d1 bullet lines and one trailing line") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val planted = Curation.plantStructuredLines(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val d1 = Integer.parseInt(h.substring(0, 1), 16)
      val lines = planted(id).split("\n", -1)
      assert(lines.length == 2 * d1 + 2, s"doc $id: ${lines.length} lines")
      assert(lines.head == text)
      lines.tail.dropRight(1).foreach(l => assert(l == "- " + h.substring(1, 5)))
      val even = "02468ace".contains(h.charAt(5))
      assert(lines.last == h.substring(6, 12) + (if (even) "..." else ""))
    }
  }
}
