package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force equivalence checks for the round-10 operators over seeded
  * pseudo-random data: the distributed formulations (single-shuffle
  * windows, deletion-neighborhood join, span merging) must agree with the
  * O(n²) reference definitions on every row — including ties, adjacency
  * edge cases, and empty results.
  */
class SessionFuzzyPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("sessionize == brute-force gap walk, exact-gap boundary stays in-session") {
    // events at coarse second offsets so exact-gap ties actually occur
    val gap = 10L
    val rows = lcg(7).take(400).zipWithIndex.map { case (x, i) =>
      ((math.abs(x) % 5).toInt,                               // user
        new java.sql.Timestamp(1700000000000L + (math.abs(x >> 6) % 400) * 5000L), // ts, 5s grid
        i.toLong)                                             // unique id
    }.toSeq
    val got = Relational.sessionize(rows.toDF("user_id", "ts", "event_id"),
        Seq("user_id"), col("ts"), Seq(col("ts"), col("event_id")), gapSeconds = gap)
      .select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2.getTime, e._3))
      var seq = 0L; var prev: Option[Long] = None
      ordered.foreach { case (_, ts, id) =>
        val t = ts.getTime
        if (prev.isEmpty || t - prev.get > gap * 1000L) seq += 1
        assert(got(id) == seq, s"event $id")
        prev = Some(t)
      }
    }
  }

  test("editDistanceOnePairs == brute-force all-pairs levenshtein <= 1") {
    // short random strings over a 3-letter alphabet: dense dist-0/1/2 space
    val alpha = "abc"
    val strs = lcg(11).take(120).zipWithIndex.map { case (x, i) =>
      val len = 2 + (math.abs(x) % 4).toInt
      val s = (0 until len).map(j => alpha(((math.abs(x) >> (4 * j)) % 3).toInt)).mkString
      (i.toLong, s)
    }.toSeq
    val got = TextOps.editDistanceOnePairs(strs.toDF("doc_id", "title"), "doc_id", "title")
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib) -> d).toMap
    assert(got == expect,
      s"missing=${(expect.keySet -- got.keySet).take(5)} extra=${(got.keySet -- expect.keySet).take(5)}")
  }

  test("dupSpanCoverage == brute-force shared-gram interval merge") {
    val k = 5
    // random strings over a tiny alphabet so cross-doc k-gram sharing is common
    val alpha = "xyz"
    val docs = lcg(23).take(40).zipWithIndex.map { case (x, i) =>
      val len = 6 + (math.abs(x) % 30).toInt
      val chars = Iterator.iterate(x)(v => v * 48271L + 11L).take(len)
        .map(v => alpha((math.abs(v) % 3).toInt)).mkString
      (i.toLong, chars)
    }.toSeq
    val got = Dedup.dupSpanCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // brute force: gram -> set of docs; per doc merge [pos, pos+k) spans
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    docs.foreach { case (id, t) =>
      t.sliding(k).filter(_.length == k).foreach(g =>
        gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id)
    }
    docs.foreach { case (id, t) =>
      val hits = t.sliding(k).zipWithIndex
        .filter { case (g, _) => g.length == k && gramDocs(g).size >= 2 }
        .map { case (_, i) => (i + 1L, i + 1L + k) }.toSeq // 1-based [pos, end)
      val nGrams = hits.size.toLong
      var covered = 0L
      var curStart = -1L; var curEnd = -1L
      hits.sortBy(_._1).foreach { case (s, e) =>
        if (curStart < 0) { curStart = s; curEnd = e }
        else if (s > curEnd) { covered += curEnd - curStart; curStart = s; curEnd = e }
        else curEnd = math.max(curEnd, e)
      }
      if (curStart >= 0) covered += curEnd - curStart
      assert(got(id) == ((nGrams, covered)), s"doc $id")
    }
  }

  test("selfRepetitionCoverage == brute-force within-doc repeat merge") {
    val k = 4
    val alpha = "pq"
    val docs = lcg(31).take(30).zipWithIndex.map { case (x, i) =>
      val len = 5 + (math.abs(x) % 25).toInt
      val chars = Iterator.iterate(x)(v => v * 25214903917L + 11L).take(len)
        .map(v => alpha((math.abs(v) % 2).toInt)).mkString
      (i.toLong, chars)
    }.toSeq
    val got = Dedup.selfRepetitionCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.foreach { case (id, t) =>
      val firstAt = scala.collection.mutable.Map.empty[String, Int]
      val hits = t.sliding(k).zipWithIndex.flatMap { case (g, i) =>
        if (g.length < k) None
        else if (firstAt.contains(g)) Some((i + 1L, i + 1L + k))
        else { firstAt(g) = i; None }
      }.toSeq
      var covered = 0L; var curStart = -1L; var curEnd = -1L
      hits.sortBy(_._1).foreach { case (s, e) =>
        if (curStart < 0) { curStart = s; curEnd = e }
        else if (s > curEnd) { covered += curEnd - curStart; curStart = s; curEnd = e }
        else curEnd = math.max(curEnd, e)
      }
      if (curStart >= 0) covered += curEnd - curStart
      assert(got(id) == ((hits.size.toLong, covered)), s"doc $id (text=$t)")
    }
  }

  test("labelMrr == brute-force ranking for every probe") {
    val vecs = lcg(43).take(60).zipWithIndex.map { case (x, i) =>
      (i.toLong,
        Array(((math.abs(x) % 100) / 100.0f) + 0.01f, ((math.abs(x >> 8) % 100) / 100.0f) + 0.01f),
        (math.abs(x >> 16) % 3).toInt)
    }.toSeq
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.labelMrr(df, df.filter($"vec_id" < 8), "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    vecs.filter(_._1 < 8).foreach { case (pid, pv, pl) =>
      val ranked = vecs.filter(_._1 != pid)
        .map { case (id, v, l) => (id, l, cos(pv, v)) }
        .sortBy { case (id, _, s) => (-s, id) }
      val nRel = ranked.count(_._2 == pl).toLong
      val first = ranked.indexWhere(_._2 == pl) match { case -1 => -1; case i => i + 1 }
      assert(got(pid) == ((nRel, first)), s"probe $pid")
    }
  }
}
