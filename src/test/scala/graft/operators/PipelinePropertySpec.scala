package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the chunk-dedup / quantization / canonical-
  * selection / corpus-statistics operators over seeded pseudo-random
  * corpora — properties that must hold on ANY input, not just the oracle
  * fixtures.
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  /** Seeded corpus: docs of 1..40 words drawn from a 12-word vocabulary,
    * heavy overlap so chunk/cluster structure actually occurs. */
  private def corpus(seed: Long, nDocs: Int) = {
    val it = lcg(seed)
    (0 until nDocs).map { i =>
      val len = (math.abs(it.next()) % 40 + 1).toInt
      val text = Seq.fill(len)(words((math.abs(it.next()) % words.size).toInt)).mkString(" ")
      (i.toLong, text)
    }
  }

  test("chunkDedup: chunk counts, bounds, and global uniq-chunk conservation") {
    val rows = corpus(101, 60)
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("dup_chunks")))).toMap
    val expected = rows.map { case (id, text) =>
      id -> text.split("\\s+").grouped(4).map(_.mkString(" ")).toSeq
    }.toMap
    expected.foreach { case (id, chunks) =>
      val (n, dup) = got(id)
      assert(n == chunks.length, s"doc $id chunk count")
      assert(dup >= 0 && dup <= n, s"doc $id dup bounds")
    }
    // conservation: kept (non-dup) chunks across the corpus = distinct chunk strings
    val kept = got.values.map { case (n, d) => n - d }.sum
    val distinctChunks = expected.values.flatten.toSet.size
    assert(kept == distinctChunks, "keep-first must keep each distinct chunk exactly once")
  }

  test("int8Quantize: codes bounded, max-abs element hits ±127, mse within scale²/4") {
    val vecs = lcg(33).take(25).zipWithIndex.map { case (s, i) =>
      (i.toLong, lcg(s | 1).take(16).map(x => ((math.abs(x) % 4000) - 2000) / 1000.0f).toArray)
    }.toSeq
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.int8Quantize(df, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("scale"), r.getAs[Long]("code_min"),
          r.getAs[Long]("code_max"), r.getAs[Double]("mse")))).toMap
    vecs.foreach { case (id, v) =>
      val (scale, cmin, cmax, mse) = got(id)
      assert(cmin >= -127L && cmax <= 127L, s"vec $id codes out of range")
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      if (maxAbs > 0) {
        assert(math.max(math.abs(cmin), math.abs(cmax)) == 127L,
          s"vec $id max-abs element must quantize to ±127")
        // per-dim error ≤ scale/2 (+ rounding slack on the reported values)
        assert(mse <= scale * scale / 4.0 + 1e-9, s"vec $id mse $mse vs scale $scale")
      } else assert(scale == 0.0 && mse == 0.0)
    }
  }

  test("canonicalPerCluster: exactly one canonical per component, and it argmaxes quality") {
    val base = corpus(55, 30)
    // give every doc a quality and force near-dup families via repeats
    val rows = base ++ base.take(10).map { case (id, t) => (id + 100L, t) }
    val it = lcg(77)
    val withQ = rows.map { case (id, t) => (id, t, math.abs(it.next()) % 1000L) }
    val df = withQ.toDF("doc_id", "text", "q")
    val got = Dedup.canonicalPerCluster(df, "doc_id", "text", "q")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[Long]("rep_id"), r.getAs[Int]("is_canonical")))
    assert(got.length == withQ.length, "every doc appears exactly once")
    val byComp = got.groupBy(_._2)
    val quality = withQ.map(r => r._1 -> r._3).toMap
    byComp.foreach { case (comp, members) =>
      val canon = members.filter(_._4 == 1)
      assert(canon.length == 1, s"component $comp canonical count")
      val rep = canon.head._1
      assert(members.forall(_._3 == rep), s"component $comp rep_id consistent")
      val bestQ = members.map(m => quality(m._1)).max
      assert(quality(rep) == bestQ, s"component $comp rep not best quality")
      val tied = members.filter(m => quality(m._1) == bestQ).map(_._1)
      assert(rep == tied.min, s"component $comp tie must break to min id")
    }
  }

  test("lexicalDiversity: ttr in (0,1], entropy in [0, ln n_types]") {
    val df = corpus(91, 40).toDF("doc_id", "text")
    val got = Curation.lexicalDiversity(df, "doc_id", "text").collect()
    assert(got.length == 40)
    got.foreach { r =>
      val (n, types, ttr, ent) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Double]("ttr"), r.getAs[Double]("entropy"))
      assert(types >= 1 && types <= n)
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(ent >= 0.0 && ent <= math.log(types.toDouble) + 1e-6,
        s"entropy $ent exceeds ln($types)")
      if (types == 1) assert(ent == 0.0)
    }
  }

  test("corpusZipfStats agrees with driver-side counting on a random corpus") {
    val rows = corpus(123, 50)
    val df = rows.toDF("doc_id", "text")
    val row = Curation.corpusZipfStats(df, "text", chunkSize = 7).collect().head
    val all = rows.flatMap(_._2.split("\\s+"))
    val freq = all.groupBy(identity).view.mapValues(_.size).toMap
    assert(row.getAs[Long]("vocab_size") == freq.size.toLong)
    assert(row.getAs[Long]("total_tokens") == all.length.toLong)
    assert(row.getAs[Long]("hapax_terms") == freq.count(_._2 == 1).toLong)
    assert(!row.getAs[Double]("zipf_slope").isNaN)
  }

  test("bpeTrain: merge pair frequencies never increase across steps") {
    val df = corpus(17, 30).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(df, col("text"), nMerges = 6)
    assert(merges.nonEmpty)
    merges.sliding(2).foreach {
      case Seq((_, _, _, f1), (_, _, _, f2)) =>
        assert(f2 <= f1, s"pair freq rose $f1 -> $f2 (BPE max is non-increasing)")
      case _ =>
    }
  }

  test("synth WAV/BMP payloads round-trip through the imperative decoders") {
    val df = corpus(201, 5).toDF("doc_id", "text")
    Multimodal.synthWav(df, "doc_id", "text").collect().foreach { r =>
      val w = Multimodal.decodeWavPcm(r.getAs[Array[Byte]]("payload")).get
      assert(w.sampleRate == 16000 && w.channels == 1 && w.nSamples == 128)
    }
    Multimodal.synthBmp(df, "doc_id", "text").collect().foreach { r =>
      val b = Multimodal.decodeBmpRgb(r.getAs[Array[Byte]]("payload")).get
      assert(b.width == 3 && b.height == 4 && b.pixels.length == 12)
    }
  }
}
