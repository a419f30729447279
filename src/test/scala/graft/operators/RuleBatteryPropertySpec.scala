package graft.operators

import graft.SparkSpec

/** Invariant checks for the rule batteries (t29 Gopher, t30 C4, t31
  * canonicalization) over seeded pseudo-random multi-line text — the
  * rules recomputed in plain JVM code must agree with the column plans
  * on ANY input, not just the oracle fixtures.
  */
class RuleBatteryPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private val words = Vector("the", "a", "of", "quick", "brown", "foxes",
    "12345", "x", "##", "supercalifragilistic", "data", "scan", "...", "ok")
  private val enders = Vector("", ".", "!", "?", "...", "\"")

  /** Seeded random page: 1-8 lines, each 0-12 words, random terminator;
    * occasional javascript / lorem ipsum / brace / bullet / ellipsis
    * injections so every rule path fires somewhere in the corpus.
    */
  private def randomPage(it: Iterator[Long]): String = {
    def n(m: Int) = (math.abs(it.next()) % m).toInt
    val lines = (0 to n(7)).map { _ =>
      val base = (0 to n(12)).map(_ => words(n(words.length))).mkString(" ")
      val injected = n(10) match {
        case 0 => "please enable javascript here " + base
        case 1 => "lorem ipsum " + base
        case 2 => base + " { code }"
        case 3 => "- " + base
        case _ => base
      }
      injected + enders(n(enders.length))
    }
    lines.mkString("\n")
  }

  test("gopherRules agrees with a plain-JVM recompute on random pages") {
    val it = lcg(77)
    val docs = (1 to 60).map(i => (i.toLong, randomPage(it)))
    val got = Curation.gopherRules(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val stop = Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    docs.foreach { case (id, t) =>
      val toks = t.trim.split("\\s+").toSeq
      val nW = math.max(toks.length, 1).toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val lines = t.split("\n", -1).toSeq
      val r = got(id)
      assert(r.getAs[Long]("n_words") == toks.length.toLong, s"doc $id words")
      assert(r.getAs[Double]("mean_word_len") == r6(toks.map(_.length).sum / nW), s"doc $id mwl")
      assert(r.getAs[Double]("frac_alpha_words") ==
        r6(toks.count(_.exists(_.isLetter)) / nW), s"doc $id alpha")
      assert(r.getAs[Long]("n_lines") == lines.length.toLong, s"doc $id lines")
      assert(r.getAs[Double]("frac_bullet_lines") ==
        r6(lines.count(_.startsWith("- ")) / math.max(lines.length, 1).toDouble), s"doc $id bullets")
      assert(r.getAs[Double]("frac_ellipsis_lines") ==
        r6(lines.count(_.endsWith("...")) / math.max(lines.length, 1).toDouble), s"doc $id ell")
      assert(r.getAs[Long]("n_stopwords") == toks.count(stop).toLong, s"doc $id stop")
    }
  }

  test("c4Filters agrees with a plain-JVM recompute on random pages") {
    val it = lcg(78)
    val docs = (1 to 60).map(i => (i.toLong, randomPage(it)))
    val got = Curation.c4Filters(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, t) =>
      val lines = t.split("\n", -1).toSeq
      val kept = lines.filter { l0 =>
        val l = l0.trim
        l.nonEmpty && ".!?\"".contains(l.last) &&
          l.split("\\s+").length >= 5 &&
          !l.toLowerCase.contains("javascript")
      }
      val clean = kept.mkString("\n")
      val r = got(id)
      assert(r.getAs[Long]("n_lines") == lines.length.toLong, s"doc $id lines")
      assert(r.getAs[Long]("n_kept") == kept.length.toLong, s"doc $id kept: $t")
      assert(r.getAs[String]("clean_text") == clean, s"doc $id clean")
      assert(r.getAs[Long]("n_sentences") == clean.count(".!?".contains(_)).toLong, s"doc $id sent")
      assert(r.getAs[Int]("has_lorem") ==
        (if (t.toLowerCase.contains("lorem ipsum")) 1 else 0), s"doc $id lorem")
      assert(r.getAs[Int]("has_brace") == (if (t.contains("{")) 1 else 0), s"doc $id brace")
      val keep = r.getAs[Long]("n_sentences") >= 3 &&
        r.getAs[Int]("has_lorem") == 0 && r.getAs[Int]("has_brace") == 0
      assert(r.getAs[Int]("keep") == (if (keep) 1 else 0), s"doc $id keep")
    }
  }

  test("robustCanonicalize is idempotent and only ever shrinks or preserves") {
    val it = lcg(79)
    val zoo = Vector("а", "е", "с", "​", "‎", "!", "!!", "!!!!",
      "...", ".....", "x", "plain", "ΑΒ", "οα")
    val docs = (1 to 80).map { i =>
      (i.toLong, (0 to (math.abs(it.next()) % 12).toInt)
        .map(_ => zoo((math.abs(it.next()) % zoo.length).toInt)).mkString(" "))
    }
    val once = Curation.robustCanonicalize(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "canon")
    val twice = Curation.robustCanonicalize(once.withColumnRenamed("canon", "text"),
        "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("canon"), r.getAs[Int]("changed")))).toMap
    val first = once.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("canon")).toMap
    docs.foreach { case (id, raw) =>
      assert(twice(id)._1 == first(id), s"doc $id not idempotent")
      assert(twice(id)._2 == 0, s"doc $id changed on second pass")
      assert(first(id).length <= raw.length, s"doc $id grew")
    }
  }
}
