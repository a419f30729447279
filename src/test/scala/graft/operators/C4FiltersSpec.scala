package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, Row] =
    Curation.c4Filters(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("line rules: terminal punctuation, >= 5 words, no javascript") {
    val page = Seq(
      "this first sentence has enough words to survive.",
      "too short.",                                       // < 5 words
      "this line has plenty of words but never terminates", // no terminal punct
      "please enable javascript to view this content.",   // javascript line
      "does a question with six words survive?",          // '?' terminates
      "\"a quoted ending with five words\"").mkString("\n") // '"' terminates
    val got = run(Seq(1L -> page))(1L)
    assert(got.getAs[Long]("n_lines") == 6L)
    assert(got.getAs[Long]("n_kept") == 3L)
    val clean = got.getAs[String]("clean_text")
    assert(clean.linesIterator.toSeq == Seq(
      "this first sentence has enough words to survive.",
      "does a question with six words survive?",
      "\"a quoted ending with five words\""))
  }

  test("page rules: lorem ipsum, brace, and the 3-sentence floor") {
    val goodLine = "a full sentence with enough words to be retained."
    val good  = Seq(goodLine, goodLine, goodLine).mkString("\n")
    val lorem = good + "\nsome Lorem Ipsum filler appears in this sentence."
    val brace = good + "\nvar config = { enabled: true }"
    val thin  = goodLine + "\n" + goodLine // only 2 retained sentences
    val got = run(Seq(1L -> good, 2L -> lorem, 3L -> brace, 4L -> thin))
    assert(got(1L).getAs[Int]("keep") == 1)
    assert(got(1L).getAs[Long]("n_sentences") == 3L)
    assert(got(2L).getAs[Int]("keep") == 0)
    assert(got(2L).getAs[Int]("has_lorem") == 1) // case-insensitive
    assert(got(3L).getAs[Int]("keep") == 0)
    assert(got(3L).getAs[Int]("has_brace") == 1)
    assert(got(4L).getAs[Int]("keep") == 0)
    assert(got(4L).getAs[Long]("n_sentences") == 2L)
  }

  test("plantC4Lines is md5-deterministic and plants each rule's trigger") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val planted = Curation.plantC4Lines(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def nib(i: Int) = Integer.parseInt(h.substring(i - 1, i), 16)
      val lines = planted(id).split("\n", -1)
      assert(lines.head == (if (nib(1) % 2 == 0) text + "." else text))
      assert(lines(1) == s"c4 keeps this sentence about ${h.substring(0, 6)} tokens.")
      assert(lines.contains("this line has five words minimum but no terminal punctuation"))
      assert(lines.exists(_.contains("javascript")) == (nib(2) < 8))
      assert(lines.exists(_.contains("lorem ipsum")) == (nib(3) == 0))
      assert(lines.exists(_.contains("{")) == (nib(4) == 0))
    }
  }
}
