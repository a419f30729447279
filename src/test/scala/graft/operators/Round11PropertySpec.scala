package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant checks for the round-11 operators (MP3/MP4 metadata, PSI
  * drift, shard shuffle, Hamming near-dups) over seeded pseudo-random
  * inputs — properties that must hold on ANY input, not just the oracle
  * fixtures.
  */
class Round11PropertySpec extends SparkSpec {
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("mp3: column parse == frame walk == construction on random CBR streams") {
    val it = lcg(2024)
    val streams = (0 until 30).map { i =>
      val bi     = (math.abs(it.next()) % 14 + 1).toInt
      val sr     = (math.abs(it.next()) % 3).toInt
      val mode   = (math.abs(it.next()) % 4).toInt
      val frames = (math.abs(it.next()) % 9 + 1).toInt
      val kbps   = Multimodal.Mp3BitrateKbps(bi - 1).toInt
      val rate   = Multimodal.Mp3SampleRates(sr).toInt
      val frameLen = 144000 * kbps / rate
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xFF.toByte; frame(1) = 0xFB.toByte
      frame(2) = ((bi << 4) | (sr << 2)).toByte
      frame(3) = (mode << 6).toByte
      val out = new java.io.ByteArrayOutputStream()
      (0 until frames).foreach(_ => out.write(frame))
      (i.toLong, out.toByteArray, kbps, rate, mode, frames)
    }
    val meta = Multimodal.mp3Meta(
        streams.map(s => (s._1, s._2)).toDF("doc_id", "payload"), idCol = "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    streams.foreach { case (id, payload, kbps, rate, mode, frames) =>
      val r = meta(id)
      assert(r.getAs[Int]("valid") == 1, s"stream $id")
      assert(r.getAs[Long]("bitrate_kbps") == kbps.toLong)
      assert(r.getAs[Long]("sample_rate") == rate.toLong)
      assert(r.getAs[Long]("channel_mode") == mode.toLong)
      assert(r.getAs[Long]("n_frames") == frames.toLong)
      val walked = Multimodal.mp3FrameWalk(payload).get
      assert(walked.bitrateKbps == kbps && walked.sampleRate == rate &&
        walked.nFrames == frames, s"walker disagrees on stream $id")
      // duration computed ONCE from the frame count — same formula as the
      // column plan, no per-frame floor drift at any stream length
      assert(walked.durationMs == frames.toLong * 1152000L / rate)

      // the same stream behind an ID3v2 tag (md5-free: lcg filler body)
      // must parse identically in BOTH faces; a truncated final frame
      // (header present, body cut) must NOT be counted by either
      val body = Array.fill((math.abs(it.next()) % 200).toInt)((it.next() & 0x3F).toByte)
      val tag = Array[Byte]('I', 'D', '3', 3, 0, 0,
        ((body.length >> 21) & 0x7F).toByte, ((body.length >> 14) & 0x7F).toByte,
        ((body.length >> 7) & 0x7F).toByte, (body.length & 0x7F).toByte) ++ body
      val tagged = tag ++ payload
      val wTag = Multimodal.mp3FrameWalk(tagged).get
      assert(wTag == walked, s"ID3-prefixed walk must equal the bare walk on stream $id")
      val mTag = Multimodal.mp3Meta(
          Seq((0L, tagged)).toDF("doc_id", "payload"), idCol = "doc_id").head()
      assert(mTag.getAs[Int]("valid") == 1 &&
        mTag.getAs[Long]("id3_len") == (10 + body.length).toLong &&
        mTag.getAs[Long]("n_frames") == frames.toLong,
        s"ID3-prefixed parse disagrees on stream $id")
      val truncated = tagged.dropRight(frameLenOf(kbps, rate) - 4) // leave a bare header
      val wTrunc = Multimodal.mp3FrameWalk(truncated)
      if (frames == 1) assert(wTrunc.isEmpty)
      else assert(wTrunc.get.nFrames == frames - 1,
        s"truncated tail must not count as a frame on stream $id")
    }
  }

  private def frameLenOf(kbps: Int, rate: Int): Int = 144000 * kbps / rate

  test("mp4: the box walk recovers fields under random box order, free sizes, versions") {
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(t: String, p: Array[Byte]) = be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    val it = lcg(77)
    (0 until 25).foreach { trial =>
      val ts  = Seq(600L, 1000L, 44100L, 90000L)((math.abs(it.next()) % 4).toInt)
      val dur = math.abs(it.next()) % 10000000L
      val nTracks = (math.abs(it.next()) % 4).toInt
      val v1  = it.next() % 2 == 0
      val mvhd =
        if (v1) Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(ts) ++ be64(dur) ++
          new Array[Byte](80)
        else Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur min 0xFFFFFFFFL) ++
          new Array[Byte](80)
      val dur0 = if (v1) dur else dur min 0xFFFFFFFFL
      val trak = box("trak", box("tkhd", new Array[Byte](84)))
      val free = box("free", new Array[Byte]((math.abs(it.next()) % 40).toInt))
      // mvhd at a random position among the traks
      val children = new scala.util.Random(trial).shuffle(
        Seq.fill(nTracks)(trak) :+ box("mvhd", mvhd))
      val moov = box("moov", children.flatten.toArray)
      val payload = box("ftyp", "isom".getBytes ++ be32(0x200L)) ++ free ++ moov ++
        box("mdat", new Array[Byte]((math.abs(it.next()) % 64).toInt))
      val m = Multimodal.decodeMp4Meta(payload)
      assert(m.isDefined, s"trial $trial must decode")
      assert(m.get.timescale == ts && m.get.duration == dur0, s"trial $trial fields")
      assert(m.get.nTracks == nTracks, s"trial $trial tracks")
      assert(m.get.durationMs == dur0 * 1000L / ts)
    }
  }

  test("dimensionPsi matches a direct JVM PSI computation on random corpora") {
    val it = lcg(555)
    def vecs(n: Int) = (0 until n).map { i =>
      (i.toLong, Array.fill(3)(((math.abs(it.next()) % 2001) - 1000) / 1000.0f))
    }
    val ref = vecs(80); val cur = vecs(70)
    val nB = 8
    def jvmPsi(dim: Int): Double = {
      def counts(vs: Seq[(Long, Array[Float])]) = {
        val c = new Array[Long](nB)
        vs.foreach { case (_, v) =>
          val b = math.min(math.max(math.floor((v(dim).toDouble + 1.0) * (nB / 2.0)).toInt, 0), nB - 1)
          c(b) += 1
        }
        c
      }
      val cr = counts(ref); val cc = counts(cur)
      val nr = cr.sum + nB; val nc = cc.sum + nB
      val terms = (0 until nB).map { b =>
        val pr = (cr(b) + 1).toDouble / nr
        val pc = (cc(b) + 1).toDouble / nc
        val t = (pc - pr) * math.log(((cc(b) + 1) * nr).toDouble / ((cr(b) + 1) * nc))
        BigDecimal(t).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      BigDecimal(terms.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Similarity.dimensionPsi(
        ref.toDF("vec_id", "embedding"), cur.toDF("vec_id", "embedding"),
        "embedding", nBuckets = nB)
      .collect().map(r => r.getAs[Int]("dim") -> r.getAs[Double]("psi")).toMap
    (0 until 3).foreach { d =>
      assert(math.abs(got(d) - jvmPsi(d)) < 1e-9, s"dim $d: ${got(d)} vs ${jvmPsi(d)}")
      assert(got(d) >= 0.0, "PSI is a divergence: never negative")
    }
  }

  test("shardShuffle matches a JVM reference placement exactly") {
    val ids = lcg(909).take(150).map(x => math.abs(x) % 100000L).toSeq.distinct
    val df = ids.map(i => (i, "x")).toDF("doc_id", "text")
    val got = Curation.shardShuffle(df, "doc_id", nShards = 4, seed = "prop")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // JVM reference: same md5-based hash, same shard mod, same hash-order rank
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      val hex = md.digest((id.toString + "prop").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % Dedup.MersennePrime
    }
    val expected = ids.map(i => (i, h(i))).groupBy(_._2 % 4).flatMap { case (shard, members) =>
      members.sortBy { case (i, hv) => (hv, i) }.zipWithIndex.map {
        case ((i, _), pos) => i -> ((shard.toInt, pos.toLong))
      }
    }
    assert(got == expected.toMap, "placement must equal the reference hash order")
  }

  test("hamming64NearDups: complete for distance ≤ 3, sound for any returned pair") {
    val it = lcg(3131)
    // base hashes plus planted ≤3-bit perturbations
    val base = (0 until 20).map(i => (i.toLong * 10, it.next()))
    val planted = base.flatMap { case (id, h) =>
      val flips = (math.abs(h) % 4).toInt
      val mutated = (0 until flips).foldLeft(h)((acc, _) =>
        acc ^ (1L << ((math.abs(it.next()) % 64).toInt)))
      Seq((id, h), (id + 1, mutated))
    }.distinctBy(_._1)
    val df = planted.toDF("doc_id", "hash")
    val got = Dedup.hamming64NearDups(df, "doc_id", "hash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // soundness + completeness vs the quadratic reference
    val ref = for {
      a <- planted; b <- planted if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) if d <= 3
    } yield (a._1, b._1) -> d
    assert(got == ref.toMap, s"bucketed pairs must equal the quadratic reference")
  }
}
