package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = Seq(
    (1L, Array[Byte](0x12, 0x34, 0x00, 0x40, 0x07, 0x7f)),
    (2L, Array[Byte](0x00, 0x01, 0x02, 0x03, 0x04))
  ).toDF("id", "blob")

  test("toAssets derives header metadata without decoding") {
    val assets = Multimodal.toAssets(raw, "id", "blob", "image")
    val r = assets.filter($"asset_id" === 1).select("meta.*").head()
    assert(r.getAs[Int]("byte_len") == 6)
    assert(r.getAs[Int]("width") == 0x1234 % 1920)
    assert(r.getAs[Int]("height") == 0x0040 % 1080)
    assert(r.getAs[Int]("channels") == 0x07 % 4 + 1)
  }

  test("sampleFrames fans out every step-th payload slice, in-row") {
    val assets = Multimodal.toAssets(raw, "id", "blob", "video")
    // asset 1: byte_len 6, frameSize 2 → 3 frames, step 2 → frames 0, 2
    val frames = Multimodal.sampleFrames(assets, frameSize = 2, step = 2)
      .filter($"asset_id" === 1).orderBy("frame_rank").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(frames(0).getAs[Array[Byte]]("frame").toSeq == Seq[Byte](0x12, 0x34))
    assert(frames(1).getAs[Array[Byte]]("frame").toSeq == Seq[Byte](0x07, 0x7f))
  }

  test("audioWindows emits overlapping hop-strided windows; short payloads drop") {
    val assets = Multimodal.toAssets(raw, "id", "blob", "audio")
    // asset 1: byte_len 6, window 4, hop 2 → starts 0 and 2 (4+4 > 6 stops it)
    val wins = Multimodal.audioWindows(assets, windowSize = 4, hop = 2)
      .filter($"asset_id" === 1).orderBy("win_rank").collect()
    assert(wins.map(_.getAs[Int]("start_byte")).toSeq == Seq(0, 2))
    assert(wins(0).getAs[Array[Byte]]("window").toSeq == Seq[Byte](0x12, 0x34, 0x00, 0x40))
    assert(wins(1).getAs[Array[Byte]]("window").toSeq == Seq[Byte](0x00, 0x40, 0x07, 0x7f))
    // windows overlap: byte 0x40 appears in both (hop < window)
    val none = Multimodal.audioWindows(assets, windowSize = 100, hop = 2).count()
    assert(none == 0L) // payload shorter than one window → no rows
  }

  test("resizeStub rewrites metadata through the per-partition seam") {
    val assets  = Multimodal.toAssets(raw, "id", "blob", "image")
    val resized = Multimodal.resizeStub(spark, assets, 224, 224)
    val metas = resized.select("asset_id", "meta.width", "meta.height", "meta.byte_len")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(metas.values.forall { case (w, h, _) => w == 224 && h == 224 })
    assert(metas(1L)._3 == 6) // untouched fields carry through
  }

  test("nearest-neighbor resize: decode → resample → BMP re-encode roundtrips") {
    // identity resize preserves every pixel through the full codec loop
    val srcBmp = {
      val rgb = Array.tabulate(3 * 4 * 3)(i => (i * 7 + 3).toByte)
      Multimodal.encodeBmpRgb(rgb, 3, 4)
    }
    val Some((w0, h0, rgb0)) = Multimodal.decodeRgb(srcBmp)
    assert((w0, h0) == ((3, 4)))
    val idBmp = Multimodal.encodeBmpRgb(
      Multimodal.nnResample(rgb0, 3, 4, 3, 4), 3, 4)
    assert(idBmp.toSeq == srcBmp.toSeq, "identity resize must be byte-identical")

    // 2×2 downsample picks source pixels (0,0) (1,0) (0,2) (1,2)
    val Some((_, _, small)) = Multimodal.decodeRgb(
      Multimodal.encodeBmpRgb(Multimodal.nnResample(rgb0, 3, 4, 2, 2), 2, 2))
    def srcPix(x: Int, y: Int): Seq[Byte] =
      rgb0.slice((y * 3 + x) * 3, (y * 3 + x) * 3 + 3).toSeq
    assert(small.toSeq.grouped(3).toSeq ==
      Seq(srcPix(0, 0), srcPix(1, 0), srcPix(0, 2), srcPix(1, 2)))

    // the distributed face: synth BMP through resizeRgbNearest, then the
    // column-expression parser reads the re-encoded result
    val docs = Seq((1L, "hello resize world")).toDF("doc_id", "text")
    val out = Multimodal.bmpPixelStats(
      Multimodal.resizeRgbNearest(
        Multimodal.synthBmp(docs, "doc_id", "text"), "doc_id", "payload", 2, 2),
      idCol = "doc_id", payloadCol = "payload", maxPixels = 64).head()
    assert(out.getAs[Int]("valid") == 1)
    assert(out.getAs[Long]("width") == 2L && out.getAs[Long]("height") == 2L)
    assert(out.getAs[Long]("n_pixels") == 4L)

    // PNG decodes through the same seam and arrives as a BMP payload
    val png = Multimodal.synthPngBytes("resize me", 5, 5)
    val Some((pw, ph, prgb)) = Multimodal.decodeRgb(png)
    assert((pw, ph) == ((5, 5)))
    val Some((rw, rh, rrgb)) = Multimodal.decodeRgb(
      Multimodal.encodeBmpRgb(Multimodal.nnResample(prgb, 5, 5, 2, 2), 2, 2))
    assert((rw, rh) == ((2, 2)))
    assert(rrgb.toSeq.take(3) == prgb.toSeq.take(3), "target (0,0) samples source (0,0)")

    // JPEG decodes through the same seam (gray replicates to RGB): the
    // flat-block synth means target (0,0) must sample block (0,0)'s level
    val jlevels = Array(17, 200, 90, 255, 0, 128, 64, 32, 250)
    val Some((jw, jh, jrgb)) = Multimodal.decodeRgb(Jpeg.synthJpegBytes(jlevels, 3, 3))
    assert((jw, jh) == ((24, 24)))
    assert((jrgb(0) & 0xFF, jrgb(1) & 0xFF, jrgb(2) & 0xFF) == ((17, 17, 17)))
    val Some((_, _, jsmall)) = Multimodal.decodeRgb(
      Multimodal.encodeBmpRgb(Multimodal.nnResample(jrgb, 24, 24, 3, 3), 3, 3))
    assert(jsmall.toSeq.grouped(3).map(p => p.head & 0xFF).toSeq == jlevels.toSeq,
      "3x3 NN downsample of the flat-block JPEG must recover exactly the block levels")

    // resizeAssets: decodable payloads really resize (payload + meta move)
    val assets = Multimodal.toAssets(
      Seq((7L, Multimodal.synthPngBytes("asset", 5, 5))).toDF("id", "blob"),
      "id", "blob", "image")
    val ra = Multimodal.resizeAssets(spark, assets, 2, 2).head()
    val meta = ra.getStruct(ra.fieldIndex("meta"))
    assert(meta.getInt(1) == 2 && meta.getInt(2) == 2 && meta.getInt(3) == 3)
    assert(Multimodal.decodeBmpRgb(ra.getAs[Array[Byte]]("payload")).exists(b =>
      b.width == 2 && b.height == 2))
  }

  test("patchGrid tiles images into padded patch multiples") {
    val assets = Seq((1L, 33, 16), (2L, 16, 16), (3L, 0, 10)).toDF("asset_id", "w", "h")
      .select(col("asset_id"), struct(lit(0).as("byte_len"), col("w").as("width"),
        col("h").as("height"), lit(1).as("channels")).as("meta"))
    val got = Multimodal.patchGrid(assets, patchSize = 16)
      .collect().map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Int]("patches_x"), r.getAs[Int]("patches_y"), r.getAs[Int]("n_patches"),
          r.getAs[Int]("pad_x"), r.getAs[Int]("pad_y")))).toMap
    assert(got(1L) == ((3, 1, 3, 15, 0)))
    assert(got(2L) == ((1, 1, 1, 0, 0)))
    assert(!got.contains(3L)) // zero-width assets are dropped
  }

  test("extractFeatures streams batches through the decode stub") {
    val assets = Multimodal.toAssets(raw, "id", "blob", "image")
    val feats = Multimodal.extractFeatures(spark, assets)
      .select("asset_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).length == 8)
    assert(feats(1L) == Multimodal.decodeStub(Array[Byte](0x12, 0x34, 0x00, 0x40, 0x07, 0x7f)).toSeq)
  }

  test("decodeWavPcm parses a handcrafted WAV; rejects corrupt payloads") {
    // 2 samples: 1000, -2 (LE int16: e8 03, fe ff)
    val hex = Multimodal.wavHeaderHex(4) + "e803" + "feff"
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val w = Multimodal.decodeWavPcm(bytes).get
    assert(w.audioFormat == 1 && w.channels == 1 && w.sampleRate == 16000)
    assert(w.bitDepth == 16 && w.dataLen == 4 && w.nSamples == 2)
    assert(w.samples.toSeq == Seq(1000.toShort, (-2).toShort))
    // corrupt magic / truncated / null all refuse instead of misparsing
    val broken = bytes.clone(); broken(0) = 'X'.toByte
    assert(Multimodal.decodeWavPcm(broken).isEmpty)
    assert(Multimodal.decodeWavPcm(bytes.take(20)).isEmpty)
    assert(Multimodal.decodeWavPcm(null).isEmpty)
  }

  test("column-expression WAV decode agrees with the imperative decoder") {
    val docs = Seq((1L, "hello world"), (2L, "another doc")).toDF("doc_id", "text")
    val wavs = Multimodal.synthWav(docs, "doc_id", "text")
    val cols = Multimodal.wavPcmStats(wavs, "doc_id", "payload", maxSamples = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("valid"), r.getAs[Long]("sample_rate"), r.getAs[Long]("n_samples"),
          r.getAs[Long]("peak"), r.getAs[Double]("rms")))).toMap
    val imps = Multimodal.extractWavFeatures(wavs, "doc_id", "payload", maxSamples = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_samples"), r.getAs[Int]("peak"), r.getAs[Double]("rms")))).toMap
    Seq(1L, 2L).foreach { id =>
      val (valid, rate, n, peak, rms) = cols(id)
      assert(valid == 1 && rate == 16000L && n == 128L)
      // n_samples is the TOTAL frame count on both paths; stats cover the cap
      assert(imps(id) == ((128, peak.toInt, rms)), s"doc $id disagreement")
    }
    // a non-WAV payload yields nulls, not a crash, on both paths
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val cj = Multimodal.wavPcmStats(junk, "doc_id", "payload").collect().head
    assert(cj.getAs[Int]("valid") == 0 && cj.isNullAt(cj.fieldIndex("rms")))
    val ij = Multimodal.extractWavFeatures(junk, "doc_id", "payload").collect().head
    assert(ij.isNullAt(ij.fieldIndex("rms")))
    // a truncated valid-header payload clamps to the bytes present on
    // BOTH paths — no fabricated sample counts from the header claim
    val full = wavs.filter($"doc_id" === 1L).collect().head.getAs[Array[Byte]]("payload")
    val cut = Seq((3L, full.take(44 + 20))).toDF("doc_id", "payload")
    val cc = Multimodal.wavPcmStats(cut, "doc_id", "payload").collect().head
    assert(cc.getAs[Long]("data_len") == 20L && cc.getAs[Long]("n_samples") == 10L)
    assert(Multimodal.decodeWavPcm(full.take(44 + 20)).get.nSamples == 10)
  }

  test("decodeBmpRgb walks the padded row stride; rejects corrupt payloads") {
    // 1×2 bitmap: rowSize 4 (1 padding byte/row). Pixels: row0 = (10,20,30)
    // pad CC, row1 = (40,50,60) pad DD — a flat scan would read CC as a
    // channel of the second pixel
    val hex = Multimodal.bmpHeaderHex(1, 2) + "0a141e" + "cc" + "28323c" + "dd"
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val b = Multimodal.decodeBmpRgb(bytes).get
    assert(b.width == 1 && b.height == 2 && b.bpp == 24)
    assert(b.pixels.toSeq == Seq((10, 20, 30), (40, 50, 60)))
    val broken = bytes.clone(); broken(0) = 'X'.toByte
    assert(Multimodal.decodeBmpRgb(broken).isEmpty)
    assert(Multimodal.decodeBmpRgb(bytes.take(40)).isEmpty)
    assert(Multimodal.decodeBmpRgb(null).isEmpty)
    // header claiming ~2^31-scale dimensions must refuse, not overflow
    // Int geometry into a bypassed bounds check and a giant allocation
    val huge = bytes.clone()
    val wide = Multimodal.bmpHeaderHex(1, 1).grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    System.arraycopy(wide, 0, huge, 0, 54)
    // overwrite width bytes (1-based 19-22) with 800,000,000 LE
    val wv = 800000000L
    (0 until 4).foreach(i => huge(18 + i) = ((wv >> (8 * i)) & 0xFF).toByte)
    huge(22) = 3; huge(23) = 0; huge(24) = 0; huge(25) = 0 // height = 3
    assert(Multimodal.decodeBmpRgb(huge).isEmpty)
  }

  test("column-expression BMP decode agrees with the imperative decoder") {
    val docs = Seq((1L, "hello world"), (2L, "another doc")).toDF("doc_id", "text")
    val bmps = Multimodal.synthBmp(docs, "doc_id", "text")
    val cols = Multimodal.bmpPixelStats(bmps, "doc_id", "payload", maxPixels = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("valid"), r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("row_size"), r.getAs[Double]("mean_b"),
          r.getAs[Double]("mean_g"), r.getAs[Double]("mean_r")))).toMap
    val payloads = bmps.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    Seq(1L, 2L).foreach { id =>
      val (valid, w, h, rs, mb, mg, mr) = cols(id)
      assert(valid == 1 && w == 3L && h == 4L && rs == 12L)
      val px = Multimodal.decodeBmpRgb(payloads(id)).get.pixels
      def m(f: ((Int, Int, Int)) => Int) = BigDecimal(px.map(f).sum.toDouble / px.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert((mb, mg, mr) == ((m(_._1), m(_._2), m(_._3))), s"doc $id disagreement")
    }
    val junk = Seq((9L, Array[Byte](66, 77, 0))).toDF("doc_id", "payload")
    val cj = Multimodal.bmpPixelStats(junk, "doc_id", "payload").collect().head
    assert(cj.getAs[Int]("valid") == 0 && cj.isNullAt(cj.fieldIndex("mean_b")))
  }

  test("PNG round-trip: decode inverts all five filters back to the md5 stream") {
    val text = "the quick brown fox"
    val png = Multimodal.synthPngBytes(text)
    val got = Multimodal.decodePngRgb(png).get
    assert(got.width == 5 && got.height == 5 && got.bitDepth == 8)
    // expected pixels: first 75 bytes of md5(text||p0..p4)
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = (0 until 5).flatMap(i =>
      md.digest((text + "p" + i).getBytes("UTF-8"))).take(75)
    assert(got.pixels.toSeq == want, "de-filtered pixels must equal the source stream")
  }

  test("PNG encoder is accepted by ImageIO and both decoders agree pixel-for-pixel") {
    // ImageIO's PNG reader is an independent JDK implementation: if the
    // synth encoder and decodePngRgb shared a filter bug, this diverges
    val png = Multimodal.synthPngBytes("imageio cross check")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == 5 && img.getHeight == 5)
    val ours = Multimodal.decodePngRgb(png).get
    for (y <- 0 until 5; x <- 0 until 5) {
      val rgb = img.getRGB(x, y)
      val k = (y * 5 + x) * 3
      assert(((rgb >> 16) & 0xFF) == (ours.pixels(k) & 0xFF), s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xFF) == (ours.pixels(k + 1) & 0xFF), s"G at ($x,$y)")
      assert((rgb & 0xFF) == (ours.pixels(k + 2) & 0xFF), s"B at ($x,$y)")
    }
  }

  test("decodePngRgb rejects corrupt payloads; pngPixelStats counts them") {
    val png = Multimodal.synthPngBytes("corrupt cases")
    assert(Multimodal.decodePngRgb(null).isEmpty)
    assert(Multimodal.decodePngRgb(png.take(20)).isEmpty)        // truncated mid-IHDR
    assert(Multimodal.decodePngRgb(png.dropRight(20)).isEmpty)   // no IEND
    val badSig = png.clone(); badSig(1) = 'X'.toByte
    assert(Multimodal.decodePngRgb(badSig).isEmpty)
    // hostile geometry: IHDR claiming a ~2^30-pixel image must refuse
    // before allocating (width bytes are 8-11, big-endian)
    val huge = png.clone()
    huge(16) = 0x40.toByte; huge(17) = 0; huge(18) = 0; huge(19) = 0
    assert(Multimodal.decodePngRgb(huge).isEmpty)
    val docs = Seq((1L, "good doc"), (2L, "also good")).toDF("doc_id", "text")
    val assets = Multimodal.synthPng(docs, "doc_id", "text")
      .unionByName(Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"))
    val stats = Multimodal.pngPixelStats(assets, "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(stats(1L).getAs[Int]("valid") == 1 && stats(1L).getAs[Long]("n_pixels") == 25L)
    assert(stats(9L).getAs[Int]("valid") == 0 &&
      stats(9L).isNullAt(stats(9L).fieldIndex("mean_r")))
    // means are exact integer sums / 25 — recompute from the decoder
    val payload = Multimodal.synthPng(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val px = Multimodal.decodePngRgb(payload(1L)).get.pixels
    def m(ch: Int) = BigDecimal(
        (0 until 25).map(k => px(3 * k + ch) & 0xFF).sum.toDouble / 25)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(stats(1L).getAs[Double]("mean_r") == m(0))
    assert(stats(1L).getAs[Double]("mean_g") == m(1))
    assert(stats(1L).getAs[Double]("mean_b") == m(2))
  }

  test("whtBandEnergies matches a direct JVM Walsh–Hadamard computation") {
    val docs   = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")
    val assets = Multimodal.synthWav(docs, "doc_id", "text")
    val got = Multimodal.whtBandEnergies(assets, "doc_id", "payload")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band")) ->
        r.getAs[Long]("energy")).toMap
    assert(got.size == 16) // 2 docs × 8 bands
    // reference computation straight off the imperative decoder
    val payloads = assets.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((id, p) <- payloads) {
      val s = Multimodal.decodeWavPcm(p, maxSamples = 64).get.samples.map(_.toLong)
      val w = (0 until 64).map { k =>
        (0 until 64).map { i =>
          if (java.lang.Long.bitCount(i & k) % 2 == 0) s(i) else -s(i)
        }.sum
      }
      for (b <- 0 until 8) {
        val e = (0 until 8).map(j => w(8 * b + j) * w(8 * b + j)).sum
        assert(got((id, b)) == e, s"doc $id band $b")
      }
    }
    // Parseval: total energy across bands = 64 × Σ s² (orthogonality check)
    for ((id, p) <- payloads) {
      val s = Multimodal.decodeWavPcm(p, maxSamples = 64).get.samples.map(_.toLong)
      val total = (0 until 8).map(b => got((id, b))).sum
      assert(total == 64L * s.map(x => x * x).sum, s"Parseval fails for doc $id")
    }
  }

  test("imageAHash: identical images share a hash, invalid payloads report null") {
    val docs = Seq((1L, "same pixels"), (2L, "same pixels"), (3L, "different img"))
      .toDF("doc_id", "text")
    val assets = Multimodal.synthBmp(docs, "doc_id", "text")
      .unionByName(Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"))
    val got = Multimodal.imageAHash(assets, "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Long]("ahash")), Option(r.getAs[java.lang.Long]("n_same_hash"))))
      .toMap
    assert(got(1L)._1.isDefined && got(1L)._1 == got(2L)._1, "same pixels → same hash")
    assert(got(1L)._2.contains(2L) && got(2L)._2.contains(2L))
    assert(got(9L) == ((None, None)), "invalid payload → null hash, not dropped")
    // hand-check doc 1's hash against the imperative decoder
    val payload = Multimodal.synthBmp(docs.filter($"doc_id" === 1L), "doc_id", "text")
      .head().getAs[Array[Byte]]("payload")
    val px = Multimodal.decodeBmpRgb(payload).get.pixels
    val grays = px.map { case (b, g, r) => (b + g + r) / 3 }
    val mean = grays.sum / grays.length
    val expect = grays.zipWithIndex.map { case (g, i) => if (g > mean) 1L << i else 0L }.sum
    assert(got(1L)._1.contains(expect))
  }

  test("mp3Meta parses all three synthesized stream shapes back to md5 ground truth") {
    // enough texts that all three shapes (bare CBR / ID3-prefixed /
    // Xing-VBR, keyed on md5 nibble 5) occur; asserted below
    val texts = (0 until 12).map(i => i.toLong -> s"mp3 shape doc $i")
    val docs = texts.toDF("doc_id", "text")
    val got = Multimodal.mp3Meta(
        Multimodal.synthMp3(docs, "doc_id", "text"), idCol = "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val shapesSeen = scala.collection.mutable.Set[Int]()
    for ((id, text) <- texts) {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def nib(i: Int) = Integer.parseInt(h.substring(i - 1, i), 16)
      val shape = nib(5) % 3
      shapesSeen += shape
      val kbps = if (shape == 2) 320L else Multimodal.Mp3BitrateKbps(nib(1) % 14)
      val rate = Multimodal.Mp3SampleRates(nib(2) % 3)
      val nf   = (nib(4) % 6 + 3) + (if (shape == 2) 1 else 0)
      val r = got(id)
      assert(r.getAs[Int]("valid") == 1, s"doc $id shape $shape")
      assert(r.getAs[Long]("mpeg_version") == 1L && r.getAs[Long]("layer") == 3L)
      assert(r.getAs[Long]("bitrate_kbps") == kbps, s"doc $id bitrate")
      assert(r.getAs[Long]("sample_rate") == rate, s"doc $id rate")
      assert(r.getAs[Long]("channel_mode") == (nib(3) % 4).toLong)
      assert(r.getAs[Long]("id3_len") ==
        (if (shape == 1) 30L + nib(6) * 8 else 0L), s"doc $id id3_len")
      assert(r.getAs[Long]("vbr") == (if (shape == 2) 1L else 0L), s"doc $id vbr")
      assert(r.getAs[Long]("frame_len") == 144000L * kbps / rate)
      assert(r.getAs[Long]("n_frames") == nf.toLong, s"doc $id shape $shape frames")
      assert(r.getAs[Long]("duration_ms") == nf * 1152000L / rate)
    }
    assert(shapesSeen == Set(0, 1, 2), s"fixture texts must cover all shapes: $shapesSeen")
    // garbage payload: counted with valid=0 and null fields, never dropped
    val bad = Multimodal.mp3Meta(
        Seq((9L, Array[Byte](1, 2, 3, 4, 5))).toDF("doc_id", "payload"), idCol = "doc_id")
      .collect()
    assert(bad.length == 1 && bad(0).getAs[Int]("valid") == 0)
    assert(bad(0).isNullAt(bad(0).fieldIndex("bitrate_kbps")))
  }

  test("mp3FrameWalk counts frames exactly through per-frame padding") {
    // hand-built stream: 3 frames of 128 kbps @ 44100 Hz (417 bytes
    // unpadded) with padding bits 0,1,0 → lengths 417, 418, 417. The CBR
    // division estimate cannot see this; the walker must.
    def header(pad: Int): Array[Byte] =
      Array(0xFF, 0xFB, (9 << 4) | (0 << 2) | (pad << 1), 1 << 6).map(_.toByte)
    val frameLens = Seq(417, 418, 417)
    val bytes = new java.io.ByteArrayOutputStream()
    for ((len, pad) <- frameLens.zip(Seq(0, 1, 0))) {
      val f = new Array[Byte](len)
      header(pad).copyToArray(f)
      bytes.write(f)
    }
    val info = Multimodal.mp3FrameWalk(bytes.toByteArray).get
    assert(info.bitrateKbps == 128 && info.sampleRate == 44100 && info.channelMode == 1)
    assert(info.nFrames == 3, "walker must follow each frame's own padding bit")
    assert(info.durationMs == 3 * (1152L * 1000000L / 44100L) / 1000L)
    // and on the padding-free synthesized CBR stream the walker agrees
    // with the column-expression estimate
    val docs = Seq((1L, "cbr agreement doc")).toDF("doc_id", "text")
    val payload = Multimodal.synthMp3(docs, "doc_id", "text")
      .head().getAs[Array[Byte]]("payload")
    val meta = Multimodal.mp3Meta(
        Multimodal.synthMp3(docs, "doc_id", "text"), idCol = "doc_id").head()
    val walked = Multimodal.mp3FrameWalk(payload).get
    assert(walked.nFrames.toLong == meta.getAs[Long]("n_frames"))
    assert(walked.bitrateKbps.toLong == meta.getAs[Long]("bitrate_kbps"))
    assert(walked.sampleRate.toLong == meta.getAs[Long]("sample_rate"))
    assert(Multimodal.mp3FrameWalk(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("PCM decode seams REJECT real MP3 frames — the codec stub never fabricates samples") {
    // the honesty audit behind the documented Layer III stub: a REAL MP3
    // frame stream (synthMp3, the m12 fixture family) must parse at the
    // metadata tier and be REFUSED by every PCM-producing decoder — a
    // caller can therefore never mistake the codec seam for a decoder
    // that silently emits fake audio
    val docs = Seq((1L, "layer three honesty audit")).toDF("doc_id", "text")
    val mp3 = Multimodal.synthMp3(docs, "doc_id", "text")
      .head().getAs[Array[Byte]]("payload")
    assert(Multimodal.mp3FrameWalk(mp3).nonEmpty, "fixture must be a real MP3 stream")
    // every PCM decoder refuses the payload outright
    assert(Multimodal.decodeWavPcm(mp3).isEmpty)
    assert(Flac.decode(mp3).isEmpty)
    assert(Multimodal.decodeRgb(mp3).isEmpty)
    // and the DataFrame PCM faces FLAG it instead of emitting stats
    val assets = Multimodal.synthMp3(docs, "doc_id", "text")
    val flagged = Flac.flacPcmStats(assets, idCol = "doc_id").head()
    assert(flagged.getAs[Int]("valid") == 0 && flagged.isNullAt(flagged.fieldIndex("sum_pcm")),
      "an undecodable payload must surface as valid=0/null stats, never fake PCM")
  }

  test("mp4Meta walks the synthesized container back to its md5 ground truth") {
    val docs = Seq((1L, "video one"), (2L, "another clip")).toDF("doc_id", "text")
    val got = Multimodal.mp4Meta(
        Multimodal.synthMp4(docs, "doc_id", "text"), idCol = "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, text) <- Seq(1L -> "video one", 2L -> "another clip")) {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def nib(i: Int) = Integer.parseInt(h.substring(i - 1, i), 16)
      val ts  = Seq(600L, 1000L, 90000L)(nib(1) % 3)
      val dur = 1000L + Integer.parseInt(h.substring(1, 5), 16)
      val r = got(id)
      assert(r.getAs[Int]("valid") == 1)
      assert(r.getAs[String]("major_brand") == (if (nib(7) % 2 == 0) "isom" else "mp42"))
      assert(r.getAs[Long]("timescale") == ts && r.getAs[Long]("duration") == dur)
      assert(r.getAs[Long]("duration_ms") == dur * 1000L / ts)
      assert(r.getAs[Long]("n_tracks") == (1 + nib(6) % 3).toLong)
    }
    // corrupt payloads: counted with valid=0, not dropped
    val bad = Multimodal.mp4Meta(
        Seq((9L, Array[Byte](0, 0, 0, 8, 'j', 'u', 'n', 'k'))).toDF("doc_id", "payload"),
        idCol = "doc_id").collect()
    assert(bad.length == 1 && bad(0).getAs[Int]("valid") == 0)
  }

  test("decodeMp4Meta handles version-1 mvhd and 64-bit largesize boxes") {
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(t: String, p: Array[Byte]) = be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    // v1 mvhd: version 1, creation/modification 8 bytes each, ts 4, dur 8
    val mvhd1 = Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(48000L) ++ be64(96000L) ++ new Array[Byte](80)
    // moov framed with a 64-bit largesize header (size field = 1)
    val moovPayload = box("mvhd", mvhd1) ++ box("trak", Array.emptyByteArray)
    val moovLarge = be32(1L) ++ "moov".getBytes("US-ASCII") ++
      be64(16L + moovPayload.length) ++ moovPayload
    val payload = box("ftyp", "isom".getBytes ++ be32(0x200L)) ++ moovLarge
    val m = Multimodal.decodeMp4Meta(payload).get
    assert(m.timescale == 48000L && m.duration == 96000L)
    assert(m.durationMs == 2000L && m.nTracks == 1)
    // truncated mid-box and missing-ftyp forms must both reject cleanly
    assert(Multimodal.decodeMp4Meta(payload.dropRight(5)).isEmpty ||
      Multimodal.decodeMp4Meta(payload.dropRight(5)).get.nTracks <= 1)
    assert(Multimodal.decodeMp4Meta(payload.drop(16)).isEmpty)
  }

  test("mp4SampleIndex reads the synth's sample table back to md5 ground truth") {
    val docs = Seq((1L, "video one"), (2L, "another clip")).toDF("doc_id", "text")
    val got = Multimodal.mp4SampleIndex(
        Multimodal.synthMp4(docs, "doc_id", "text"), idCol = "doc_id")
      .collect().groupBy(_.getAs[Long]("doc_id"))
    for ((id, text) <- Seq(1L -> "video one", 2L -> "another clip")) {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def nib(i: Int) = Integer.parseInt(h.substring(i - 1, i), 16)
      val ts = Seq(600L, 1000L, 90000L)(nib(9) % 3)
      val (n1, n2) = (2 + nib(10) % 4, 1 + nib(11) % 4)
      val (d1, d2) = (100L + 10L * nib(12), 100L + 10L * nib(13))
      val n = n1 + n2
      val sizes = (1 to n).map(i => 64L + 4L * nib(((13 + i) % 32) + 1))
      val base = 408L + nib(8) + 4L * n + 100L * (nib(6) % 3)
      val rows = got(id).sortBy(_.getAs[Long]("sample_idx"))
      assert(rows.length == n)
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("size") == sizes(i))
        assert(r.getAs[Long]("offset") == base + sizes.take(i).sum)
        val dts = if (i < n1) i * d1 else n1 * d1 + (i - n1) * d2
        assert(r.getAs[Long]("dts") == dts)
        assert(r.getAs[Long]("dts_ms") == dts * 1000L / ts)
        assert(r.getAs[Long]("timescale") == ts)
      }
      // the stco base really points at file bytes: the payload is long
      // enough to contain every sample and the last sample ends at EOF
      val payload = Multimodal.synthMp4Bytes(text)
      assert(base + sizes.sum == payload.length)
    }
  }

  test("decodeMp4SampleIndex: constant-size stsz form, hostile counts rejected") {
    def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(t: String, p: Array[Byte]) = be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    def stbl(stts: Array[Byte], stsz: Array[Byte]) = {
      val stco = box("stco", be32(0) ++ be32(1) ++ be32(4096L))
      val mdhd = Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(1000L) ++
        be32(600L) ++ be32(0)
      box("moov", box("trak", box("mdia",
        box("mdhd", mdhd) ++
        box("minf", box("stbl", stts ++ stsz ++ stco)))))
    }
    // constant sample_size = 512, 3 samples, one stts run of delta 200
    val ok = box("ftyp", "isom".getBytes ++ be32(0L)) ++ stbl(
      box("stts", be32(0) ++ be32(1) ++ be32(3) ++ be32(200L)),
      box("stsz", be32(0) ++ be32(512L) ++ be32(3)))
    val (ts, samples) = Multimodal.decodeMp4SampleIndex(ok).get
    assert(ts == 1000L)
    assert(samples.map(s => (s.size, s.offset, s.dts, s.dtsMs)) == Seq(
      (512L, 4096L, 0L, 0L), (512L, 4608L, 200L, 200L), (512L, 5120L, 400L, 400L)))
    // stts claiming more entries than its box holds must reject
    val overrun = box("ftyp", "isom".getBytes ++ be32(0L)) ++ stbl(
      box("stts", be32(0) ++ be32(99) ++ be32(3) ++ be32(200L)),
      box("stsz", be32(0) ++ be32(512L) ++ be32(3)))
    assert(Multimodal.decodeMp4SampleIndex(overrun).isEmpty)
    // stts/stsz sample-count disagreement must reject
    val disagree = box("ftyp", "isom".getBytes ++ be32(0L)) ++ stbl(
      box("stts", be32(0) ++ be32(1) ++ be32(2) ++ be32(200L)),
      box("stsz", be32(0) ++ be32(512L) ++ be32(3)))
    assert(Multimodal.decodeMp4SampleIndex(disagree).isEmpty)
    // a million-sample hostile count must hit the valve, not allocate
    val hostile = box("ftyp", "isom".getBytes ++ be32(0L)) ++ stbl(
      box("stts", be32(0) ++ be32(1) ++ be32(1L << 30) ++ be32(200L)),
      box("stsz", be32(0) ++ be32(512L) ++ be32(1L << 30)))
    assert(Multimodal.decodeMp4SampleIndex(hostile).isEmpty)
  }

  test("whtBandEnergies reads stereo geometry identically to decodeWavPcm") {
    // channels live at offset 23 (NumChannels), not 21 (the PCM format
    // field): a stereo file has half as many frames as int16 words, and
    // both decoders must take the same first dataLen/(2·channels) words
    def stereoWav(samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
        .putInt(16).putShort(1).putShort(2).putInt(8000).putInt(8000 * 4)
        .putShort(4).putShort(16).put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // 40 interleaved L,R words → 20 frames; distinct L vs R values so a
    // mono misread (treating all 40 words as samples) cannot pass
    val interleaved = (0 until 40).map(i =>
      (if (i % 2 == 0) 100 + i else -(200 + i)).toShort).toArray
    val payload = stereoWav(interleaved)
    val decoded = Multimodal.decodeWavPcm(payload, maxSamples = 64).get
    assert(decoded.channels == 2 && decoded.nSamples == 20)
    val assets = Seq((1L, payload)).toDF("doc_id", "payload")
    val got = Multimodal.whtBandEnergies(assets, "doc_id", "payload")
      .collect().map(r => r.getAs[Int]("band") -> r.getAs[Long]("energy")).toMap
    val s = decoded.samples.map(_.toLong).padTo(64, 0L)
    val w = (0 until 64).map { k =>
      (0 until 64).map(i =>
        if (java.lang.Long.bitCount(i & k) % 2 == 0) s(i) else -s(i)).sum
    }
    for (b <- 0 until 8) {
      val e = (0 until 8).map(j => w(8 * b + j) * w(8 * b + j)).sum
      assert(got(b) == e, s"stereo band $b diverges from decodeWavPcm geometry")
    }
  }

  test("imageNearDups pairs identical images at Hamming 0; invalid payloads never pair") {
    val docs = Seq((1L, "same pixels"), (2L, "same pixels"), (7L, "another view"))
      .toDF("doc_id", "text")
    val assets = Multimodal.synthBmp(docs, "doc_id", "text")
      .unionByName(Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"))
    val got = Multimodal.imageNearDups(assets, idCol = "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.contains((1L, 2L, 0)), s"identical images must pair at Hamming 0: ${got.toSeq}")
    assert(got.forall(_._3 == 0))
    assert(!got.exists(p => p._1 == 9L || p._2 == 9L), "null-hash assets must not pair")
  }

  test("whtBandEnergies zero-pads truncated payloads instead of failing") {
    val docs = Seq((1L, "some doc")).toDF("doc_id", "text")
    // truncate to 44-byte header + 8 bytes → only 4 real samples
    val truncated = Multimodal.synthWav(docs, "doc_id", "text")
      .select(col("doc_id"), expr("substring(payload, 1, 52)").as("payload"))
    val rows = Multimodal.whtBandEnergies(truncated, "doc_id", "payload").collect()
    assert(rows.length == 8) // still all 8 bands, finite energies
    assert(rows.forall(_.getAs[Long]("energy") >= 0L))
  }
}
