package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, exactly as a 100 TB
  * training pipeline carries them (decode happens late, next to the
  * consumer, never at ingest).
  *
  * Decode status: the image family (BMP, 8-bit truecolor PNG, baseline
  * JPEG via [[graft.operators.Jpeg]]) and RIFF/WAV PCM are REALLY decoded
  * — WAV twice, in fact: [[wavPcmStats]] parses the container and samples
  * as codegen column expressions (distributed, oracle-checkable), and
  * [[decodeWavPcm]] is the imperative per-partition decoder behind the
  * mapPartitions seam. MP3's METADATA tier is real too ([[mp3Meta]] /
  * [[mp3FrameWalk]]: frame headers, tables, frame count, duration); its
  * sample SYNTHESIS — and every video codec — remains stubbed behind
  * `decodeStub` (those libraries are not in this container) with the fake
  * clearly marked. Everything around the seam is real and tested: the
  * schema contract, the mapPartitions batching, and the column-level
  * metadata extraction.
  */
object Multimodal {

  /** Decoded canonical-PCM WAV: header fields plus the first samples. */
  final case class WavPcm(audioFormat: Int, channels: Int, sampleRate: Int,
                          bitDepth: Int, dataLen: Int, nSamples: Int,
                          samples: Array[Short])

  /** Canonical schema for a multimodal asset column family. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap any (id, binary) DataFrame into the asset contract, deriving
    * cheap metadata from the payload header bytes — pure column exprs,
    * no decode.
    */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).as("payload"),
      struct(
        length(col(payloadCol)).cast("int").as("byte_len"),
        // header-derived fake dimensions (see decodeStub): bytes 1-2 and 3-4
        (conv(hex(substring(col(payloadCol), 1, 2)), 16, 10).cast("int") % 1920).as("width"),
        (conv(hex(substring(col(payloadCol), 3, 2)), 16, 10).cast("int") % 1080).as("height"),
        (conv(hex(substring(col(payloadCol), 5, 1)), 16, 10).cast("int") % 4 + 1).as("channels")
      ).as("meta")
    )

  /** The decode seam. A real deployment plugs a codec here (JNI/FFI, one
    * instance per partition). The stub derives deterministic "features"
    * from the payload bytes so the plumbing is testable end-to-end.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    // ??? <- real image/audio decode goes here; deterministic fake instead:
    if (payload == null || payload.isEmpty) Array.fill(8)(0.0f)
    else {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) = out(i % 8) + (payload(i) & 0xFF).toFloat / 255.0f
        i += 1
      }
      out
    }
  }

  /** Frame sampling for video-typed assets: one output row per sampled
    * frame, every `step`-th frame of `frameSize` bytes. Pure column
    * exprs (sequence → posexplode + substring) — the fan-out is
    * distributed and codegen'd, no driver loop, no decode; the emitted
    * "frame" is exactly the payload slice a real codec would decode.
    */
  def sampleFrames(assets: DataFrame, frameSize: Int, step: Int): DataFrame =
    assets
      .withColumn("__n_frames", (col("meta.byte_len") / frameSize).cast("int"))
      .filter(col("__n_frames") > 0)
      .select(col("asset_id"), col("media_type"), col("payload"),
        posexplode(sequence(lit(0), col("__n_frames") - 1, lit(step)))
          .as(Seq("frame_rank", "frame_idx")))
      .select(
        col("asset_id"), col("frame_rank"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameSize + 1, lit(frameSize)).as("frame"))

  /** Audio framing for audio-typed assets: OVERLAPPING `windowSize`-byte
    * windows every `hop` bytes — the STFT/filterbank framing a speech
    * pipeline applies before feature extraction (sampleFrames' disjoint
    * stride doesn't overlap; spectral features need hop < window). Same
    * distributed sequence → posexplode fan-out, no decode, no driver loop.
    */
  def audioWindows(assets: DataFrame, windowSize: Int, hop: Int): DataFrame =
    assets
      .filter(col("meta.byte_len") >= windowSize)
      .withColumn("__n_win",
        ((col("meta.byte_len") - windowSize) / hop).cast("int") + 1)
      .select(col("asset_id"), col("payload"),
        posexplode(sequence(lit(0), (col("__n_win") - 1) * hop, lit(hop)))
          .as(Seq("win_rank", "start_byte")))
      .select(col("asset_id"), col("win_rank"), col("start_byte"),
        col("payload").substr(col("start_byte") + 1, lit(windowSize)).as("window"))

  /** ViT-style patch-grid geometry from asset metadata: how many
    * `patchSize`×`patchSize` patches an image tiles into after
    * right/bottom zero-padding to a patch multiple — the numbers a
    * vision-tower preprocessor needs to budget sequence length
    * (n_patches is the image's token count) and allocate the padded
    * canvas. Pure integer column math on the meta struct; the payload is
    * never touched, so the planner prunes it from the scan entirely.
    */
  def patchGrid(assets: DataFrame, patchSize: Int): DataFrame = {
    require(patchSize > 0, "patchSize must be positive")
    val nx = ceil(col("meta.width").cast("double") / patchSize).cast("int")
    val ny = ceil(col("meta.height").cast("double") / patchSize).cast("int")
    assets
      .filter(col("meta.width") > 0 && col("meta.height") > 0)
      .select(col("asset_id"),
        nx.as("patches_x"), ny.as("patches_y"),
        (nx * ny).as("n_patches"),
        (nx * patchSize - col("meta.width")).as("pad_x"),
        (ny * patchSize - col("meta.height")).as("pad_y"))
  }

  /** Resize seam over the asset contract. Decodable rasters (uncompressed
    * 24-bit BMP, 8-bit truecolor PNG, baseline JPEG via [[Jpeg.decode]])
    * get a REAL nearest-neighbor resize: decode → integer NN resample →
    * re-encode as uncompressed BMP, with the meta struct updated to the
    * actual output geometry. Payloads no decoder here understands
    * (mp3/h264/progressive-jpeg — their codecs are not in this container)
    * fall through to the stub path: metadata rewrite only, payload
    * untouched. Either way the shape is the per-partition mapPartitions
    * seam a real codec plugs into.
    */
  def resizeAssets(spark: SparkSession, assets: DataFrame, width: Int, height: Int): DataFrame = {
    val schema     = assets.schema
    val payloadIdx = schema.fieldIndex("payload")
    val metaIdx    = schema.fieldIndex("meta")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        decodeRgb(payload) match {
          case Some((w, h, rgb)) =>
            val out = encodeBmpRgb(nnResample(rgb, w, h, width, height), width, height)
            val newMeta = Row(out.length, width, height, 3)
            Row.fromSeq(r.toSeq.updated(payloadIdx, out).updated(metaIdx, newMeta))
          case None =>
            // ??? <- non-raster codec decode+resize goes here; stub instead:
            val meta = r.getStruct(metaIdx)
            val newMeta = Row(meta.get(0), width, height, meta.get(3))
            Row.fromSeq(r.toSeq.updated(metaIdx, newMeta))
        }
      }
    }(Encoders.row(schema))
  }

  /** The historical stub-only face of the resize seam (metadata rewrite,
    * payload untouched) — now just [[resizeAssets]], whose stub branch is
    * what this always did for payloads without a real decoder.
    */
  def resizeStub(spark: SparkSession, assets: DataFrame, width: Int, height: Int): DataFrame =
    resizeAssets(spark, assets, width, height)

  /** Decode any supported raster payload to TOP-DOWN row-major RGB bytes:
    * tries BMP (stored bottom-up BGR — flipped and swizzled straight into
    * a flat byte buffer, no per-pixel tuple boxing: a 1920×1080 frame is
    * ~6 MB of bytes, not ~80 MB of Tuple3s), then PNG (already top-down
    * RGB), then baseline JPEG (grayscale replicates to three channels).
    * Returns (width, height, rgb).
    */
  def decodeRgb(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeBmpFlat(payload)
      .orElse(decodePngRgb(payload).map(p => (p.width, p.height, p.pixels)))
      .orElse(Jpeg.decode(payload).map { img =>
        if (img.components == 3) (img.width, img.height, img.pixels)
        else {
          val rgb = new Array[Byte](img.width * img.height * 3)
          var i = 0
          while (i < img.pixels.length) {
            val g = img.pixels(i)
            rgb(3 * i) = g; rgb(3 * i + 1) = g; rgb(3 * i + 2) = g
            i += 1
          }
          (img.width, img.height, rgb)
        }
      })

  /** BMP → flat top-down RGB, allocation-lean: the same validation as
    * [[decodeBmpRgb]] but writing bytes directly (the tuple face stays
    * for the small-maxPixels stats use).
    */
  private def decodeBmpFlat(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 54) return None
    def le(pos: Int, width: Int): Long = leBytes(payload, pos, width)
    def leS32(pos: Int): Long = { val u = le(pos, 4); if (u >= 2147483648L) u - 4294967296L else u }
    if (payload(0) != 'B'.toByte || payload(1) != 'M'.toByte) return None
    if (le(27, 2) != 1L || le(29, 2) != 24L || le(31, 4) != 0L) return None
    val w = leS32(19); val h = leS32(23)
    if (w <= 0 || h <= 0 || w * h > (1L << 24)) return None
    val off = le(11, 4)
    val rowSize = (w * 3 + 3) / 4 * 4
    if (off < 54 || off + (h - 1) * rowSize + (w - 1) * 3 + 3 > payload.length) return None
    val (wi, hi) = (w.toInt, h.toInt)
    val rgb = new Array[Byte](wi * hi * 3)
    var y = 0
    while (y < hi) {
      val src = (off + (hi - 1 - y).toLong * rowSize).toInt // stored bottom-up
      var x = 0
      while (x < wi) {
        val s = src + x * 3
        val d = (y * wi + x) * 3
        rgb(d) = payload(s + 2); rgb(d + 1) = payload(s + 1); rgb(d + 2) = payload(s)
        x += 1
      }
      y += 1
    }
    Some((wi, hi, rgb))
  }

  /** Integer nearest-neighbor resample of a top-down RGB buffer: target
    * pixel (x, y) reads source (x·srcW DIV dstW, y·srcH DIV dstH) — the
    * floor-division convention every oracle mirror can restate exactly.
    */
  private[operators] def nnResample(src: Array[Byte], srcW: Int, srcH: Int,
                                    dstW: Int, dstH: Int): Array[Byte] = {
    require(dstW > 0 && dstH > 0, "target dimensions must be positive")
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * srcH / dstH).toInt
      var x = 0
      while (x < dstW) {
        val sx = (x.toLong * srcW / dstW).toInt
        val s = (sy * srcW + sx) * 3
        val d = (y * dstW + x) * 3
        out(d) = src(s); out(d + 1) = src(s + 1); out(d + 2) = src(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a top-down RGB buffer as an uncompressed 24-bit BI_RGB BMP —
    * bottom-up rows, BGR order, 4-byte row padding: the exact layout
    * [[decodeBmpRgb]]/[[bmpPixelStats]] parse, so resize output feeds
    * straight back into the decode family.
    */
  def encodeBmpRgb(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb buffer ${rgb.length} != ${w}x$h*3")
    val rowSize = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + rowSize * h)
    val hdr = bmpHeaderHex(w, h)
    var i = 0
    while (i < 54) {
      out(i) = Integer.parseInt(hdr.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val d = base + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Slim (id, payload) face of the real resize — decode, NN-resample,
    * re-encode as BMP; payloads that don't decode become null payloads
    * (counted invalid downstream, never dropped). The m8 oracle runs
    * [[bmpPixelStats]] over this output.
    */
  def resizeRgbNearest(df: DataFrame, idCol: String, payloadCol: String,
                       dstW: Int, dstH: Int): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx  = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idIdx).dataType, nullable = false),
      StructField(payloadCol, BinaryType, nullable = true)))
    df.mapPartitions { rows =>
      rows.map { r =>
        val resized = decodeRgb(r.getAs[Array[Byte]](pIdx)).map { case (w, h, rgb) =>
          encodeBmpRgb(nnResample(rgb, w, h, dstW, dstH), dstW, dstH)
        }
        Row(r.get(idIdx), resized.orNull)
      }
    }(Encoders.row(outSchema))
  }

  // ---- Real RIFF/WAV PCM decode --------------------------------------

  /** Canonical-WAV byte layout (1-based positions): RIFF(1-4) size(5-8)
    * WAVE(9-12) "fmt "(13-16) fmtSize(17-20) format(21-22) channels(23-24)
    * rate(25-28) byteRate(29-32) align(33-34) bits(35-36) "data"(37-40)
    * dataLen(41-44) samples(45-). All multi-byte fields little-endian.
    */
  private val DataOffset = 45

  /** One byte of a binary column (1-based position) as 0-255. */
  private def byteAt(p: Column, pos: Column): Column =
    conv(hex(p.substr(pos, lit(1))), 16, 10).cast("long")

  /** Little-endian unsigned integer field of `width` bytes at `pos`. */
  private def leUInt(p: Column, pos: Int, width: Int): Column =
    (0 until width).map(i => byteAt(p, lit(pos + i)) * (1L << (8 * i)))
      .reduce(_ + _)

  /** Signed 16-bit little-endian PCM sample at 0-based index `idx`. */
  private def pcm16At(p: Column, idx: Column): Column = {
    val u = byteAt(p, idx * 2 + DataOffset) +
      byteAt(p, idx * 2 + (DataOffset + 1)) * 256L
    when(u >= 32768L, u - 65536L).otherwise(u)
  }

  /** REAL WAV decode as a distributed column plan: container validation,
    * every header field, and amplitude statistics (peak, RMS) over the
    * first `maxSamples` 16-bit PCM samples — no codec library, no UDF,
    * no driver loop; byte access is substring+hex+conv, which
    * whole-stage-codegens, and the integer sum of squares is exact so
    * RMS is engine-independent.
    *
    * Rows whose payload fails the magic checks (or carries no samples)
    * keep their header fields but get null peak/rms rather than being
    * dropped — a 100 TB scan wants corrupt assets COUNTED, not silently
    * filtered.
    */
  def wavPcmStats(assets: DataFrame, idCol: String = "asset_id",
                  payloadCol: String = "payload",
                  maxSamples: Int = 64): DataFrame = {
    require(maxSamples > 0, "maxSamples must be positive")
    val p = col(payloadCol)
    val valid =
      (substring(p, 1, 4) === lit("RIFF".getBytes("US-ASCII"))) &&
      (substring(p, 9, 4) === lit("WAVE".getBytes("US-ASCII"))) &&
      (substring(p, 13, 4) === lit("fmt ".getBytes("US-ASCII"))) &&
      (substring(p, 37, 4) === lit("data".getBytes("US-ASCII"))) &&
      (leUInt(p, 21, 2) === 1L) && (leUInt(p, 35, 2) === 16L) &&
      (leUInt(p, 23, 2) >= 1L) // channels=0 would divide the frame size by 0
    val bytesPerFrame = leUInt(p, 23, 2) * 2L // channels × 16-bit
    assets
      .withColumn("valid", valid.cast("int"))
      .withColumn("audio_format", leUInt(p, 21, 2))
      .withColumn("channels", leUInt(p, 23, 2))
      .withColumn("sample_rate", leUInt(p, 25, 4))
      .withColumn("bit_depth", leUInt(p, 35, 2))
      // header claims clamped to the bytes actually present: a truncated
      // payload must not fabricate sample counts (the imperative twin
      // clamps identically)
      .withColumn("data_len",
        least(leUInt(p, 41, 4),
          greatest(length(p).cast("long") - (DataOffset - 1).toLong, lit(0L))))
      .withColumn("n_samples",
        when(col("valid") === 1,
          floor(col("data_len") / bytesPerFrame).cast("long")).otherwise(lit(0L)))
      .withColumn("__n", least(col("n_samples"), lit(maxSamples.toLong)))
      .withColumn("__s",
        when(col("__n") > 0,
          transform(sequence(lit(0L), col("__n") - 1L), i => pcm16At(p, i))))
      .select(col(idCol), col("valid"), col("audio_format"), col("channels"),
        col("sample_rate"), col("bit_depth"), col("data_len"), col("n_samples"),
        array_max(transform(col("__s"), s => abs(s))).as("peak"),
        round(sqrt(
          aggregate(col("__s"), lit(0L), (acc, s) => acc + s * s).cast("double")
            / col("__n").cast("double")), 6).as("rms"))
  }

  /** Audio SPECTRAL features, integer-exact: sequency-band energies of the
    * first `nSamples` PCM samples under the Walsh–Hadamard transform — the
    * ±1-coefficient orthogonal transform real DSP uses when it needs a
    * spectral decomposition without floating point (W_k = Σᵢ (−1)^popcount(i∧k)·sᵢ,
    * band b = Σ_{k∈b} W_k²). A Fourier filterbank would hide transcendental
    * ULP drift between engines; the WHT is exact 64-bit integer arithmetic
    * end to end, so the oracle hash-compares. The whole computation is one
    * per-row column expression (zip_with/aggregate inside transform) —
    * codegen'd, no UDF, no shuffle, scan-parallel at 100 TB; on a real
    * deployment these per-band energies are the cheap audio quality/
    * bandwidth screen run before any expensive codec decode.
    *
    * Output: (id, band ∈ [0, nBands), energy) — `nSamples`/`nBands`
    * coefficients per band; samples beyond the payload's actual count
    * contribute zero (truncated assets still get well-defined features).
    */
  def whtBandEnergies(assets: DataFrame, idCol: String = "asset_id",
                      payloadCol: String = "payload",
                      nSamples: Int = 64, nBands: Int = 8): DataFrame = {
    require(nSamples > 0 && (nSamples & (nSamples - 1)) == 0, "nSamples must be a power of 2")
    require(nBands > 0 && nSamples % nBands == 0, "nBands must divide nSamples")
    // one native-expression call per row (graft.functions.WhtEnergies):
    // the declarative transform/aggregate form of this kernel re-evaluated
    // the hex byte-decode n×n times per row after CollapseProject inlined
    // it into the coefficient lambda (~60 s at sf0.1 vs <1 s native) — see
    // the expression's scaladoc for the full post-mortem
    assets.select(col(idCol),
      posexplode(graft.functions.WhtEnergies(col(payloadCol), nSamples, nBands))
        .as(Seq("band", "energy")))
  }

  /** The same decode, imperatively: the per-partition decoder a
    * mapPartitions feature extractor plugs in where the stub sits for
    * compressed codecs. Returns None unless the payload is a canonical
    * PCM WAV (RIFF/WAVE/fmt/data magics, format 1, 16-bit).
    */
  /** Little-endian unsigned field of `width` bytes at 1-based `pos` — the
    * one imperative LE parser both decoders share (the column-expr twin
    * is [[leUInt]], the SQL twin is PipelineQueries' generator). */
  private[operators] def leBytes(payload: Array[Byte], pos: Int, width: Int): Long =
    (0 until width).map(i => (payload(pos - 1 + i) & 0xFFL) << (8 * i)).sum

  def decodeWavPcm(payload: Array[Byte], maxSamples: Int = Int.MaxValue): Option[WavPcm] = {
    if (payload == null || payload.length < DataOffset - 1) return None
    def str(pos: Int, n: Int) = new String(payload, pos - 1, n, "US-ASCII")
    def le(pos: Int, width: Int): Long = leBytes(payload, pos, width)
    if (str(1, 4) != "RIFF" || str(9, 4) != "WAVE" ||
        str(13, 4) != "fmt " || str(37, 4) != "data") return None
    if (le(21, 2) != 1L || le(35, 2) != 16L) return None
    val channels = le(23, 2).toInt
    if (channels <= 0) return None
    val dataLen = math.min(le(41, 4), (payload.length - (DataOffset - 1)).toLong)
    val nSamples = (dataLen / (channels * 2)).toInt
    val n = math.min(nSamples, maxSamples)
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((payload(DataOffset - 1 + 2 * i) & 0xFF) |
        (payload(DataOffset + 2 * i) << 8)).toShort
      i += 1
    }
    Some(WavPcm(le(21, 2).toInt, channels, le(25, 4).toInt, le(35, 2).toInt,
      dataLen.toInt, nSamples, samples))
  }

  /** WAV features over asset batches through the real decoder: the same
    * mapPartitions shape as [[extractFeatures]], but the decode inside is
    * [[decodeWavPcm]], not a stub. Emits (id, n_samples, peak, rms);
    * non-WAV payloads yield nulls.
    */
  def extractWavFeatures(assets: DataFrame, idCol: String = "asset_id",
                         payloadCol: String = "payload",
                         maxSamples: Int = 64): DataFrame = {
    val idIdx = assets.schema.fieldIndex(idCol)
    val pIdx  = assets.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      StructField(idCol, assets.schema(idIdx).dataType, nullable = false),
      StructField("n_samples", IntegerType, nullable = true),
      StructField("peak", IntegerType, nullable = true),
      StructField("rms", DoubleType, nullable = true)))
    assets.mapPartitions { rows =>
      rows.map { r =>
        decodeWavPcm(r.getAs[Array[Byte]](pIdx), maxSamples) match {
          case Some(w) if w.samples.nonEmpty =>
            // n_samples is the TOTAL frame count (wavPcmStats parity);
            // peak/rms cover the first maxSamples like the column twin
            var peak = 0L; var sumsq = 0L
            w.samples.foreach { s =>
              peak = math.max(peak, math.abs(s.toLong)); sumsq += s.toLong * s
            }
            val rms = BigDecimal(math.sqrt(sumsq.toDouble / w.samples.length))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            Row(r.get(idIdx), w.nSamples, peak.toInt, rms)
          case _ => Row(r.get(idIdx), null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- Real BMP (BI_RGB) decode --------------------------------------

  /** Uncompressed-BMP byte layout (1-based positions): "BM"(1-2)
    * fileSize(3-6) reserved(7-10) pixelOffset(11-14) dibSize(15-18)
    * width(19-22, signed) height(23-26, signed) planes(27-28) bpp(29-30)
    * compression(31-34) … pixel array at pixelOffset (0-based), rows
    * BOTTOM-UP, B-G-R per pixel, each row zero-padded to a 4-byte
    * multiple — the padding bytes are present in the stream and must be
    * SKIPPED, which is exactly what a naive flat scan gets wrong.
    */
  private def leSInt32(p: Column, pos: Int): Column = {
    val u = leUInt(p, pos, 4)
    when(u >= 2147483648L, u - 4294967296L).otherwise(u)
  }

  /** REAL BMP decode as a distributed column plan: magic/compression
    * validation, signed dimensions, and per-channel means over the first
    * `maxPixels` pixels addressed through the padded bottom-up row
    * geometry (so a padding or stride bug changes the result and fails
    * the oracle). 24-bit BI_RGB only — compressed bitmaps stay behind
    * the stub like every other compressed codec.
    */
  def bmpPixelStats(assets: DataFrame, idCol: String = "asset_id",
                    payloadCol: String = "payload",
                    maxPixels: Int = 64): DataFrame = {
    require(maxPixels > 0, "maxPixels must be positive")
    val p = col(payloadCol)
    val valid =
      (substring(p, 1, 2) === lit("BM".getBytes("US-ASCII"))) &&
      (leUInt(p, 27, 2) === 1L) && (leUInt(p, 29, 2) === 24L) &&
      (leUInt(p, 31, 4) === 0L) &&
      (leSInt32(p, 19) > 0L) && (leSInt32(p, 23) > 0L)
    def channelMean(ch: Int): Column = {
      // pixel i (row-major over the stored bottom-up rows): 1-based byte
      // position = pixelOffset + (i DIV w)·rowSize + (i % w)·3 + ch + 1
      val bytes = transform(sequence(lit(0L), col("__n") - 1L), i =>
        byteAt(p, col("__off") + (i / col("width")).cast("long") * col("row_size")
          + (i % col("width")) * 3L + ch + 1L))
      round(aggregate(bytes, lit(0L), (acc, b) => acc + b).cast("double")
        / col("__n").cast("double"), 6)
    }
    assets
      .withColumn("valid", valid.cast("int"))
      .withColumn("width", when(valid, leSInt32(p, 19)).otherwise(lit(0L)))
      .withColumn("height", when(valid, leSInt32(p, 23)).otherwise(lit(0L)))
      .withColumn("bpp", leUInt(p, 29, 2))
      .withColumn("row_size", (floor((col("width") * 3L + 3L) / 4L) * 4L).cast("long"))
      .withColumn("__off", leUInt(p, 11, 4))
      .withColumn("n_pixels", col("width") * col("height"))
      .withColumn("__n", least(col("n_pixels"), lit(maxPixels.toLong)))
      .select(col(idCol), col("valid"), col("width"), col("height"), col("bpp"),
        col("row_size"), col("n_pixels"),
        when(col("__n") > 0, channelMean(0)).as("mean_b"),
        when(col("__n") > 0, channelMean(1)).as("mean_g"),
        when(col("__n") > 0, channelMean(2)).as("mean_r"))
  }

  /** Image average-hash (aHash) + exact-duplicate grouping — the content
    * fingerprint tier for IMAGES that `TextOps.fingerprint` provides for
    * text: each decoded pixel grays to (b+g+r) DIV 3, the hash sets bit i
    * when gray_i exceeds the image's integer mean, and images sharing a
    * hash are duplicate candidates (re-encodes, metadata-only edits).
    * All integer arithmetic — engine-exact, no float thresholds.
    *
    * Scale shape: the hash is per-row column math inside the scan (the
    * gray array is materialized per row and consumed by mean + bits — a
    * bounded 2× re-evaluation, never the n× lambda-inlining blowup m10
    * hit); duplicate counts follow the d9 discipline — groupBy count on
    * the hash (map-side combined), then a once-per-hash equi-join back,
    * so a billion-fold repeated logo never hot-spots a window partition.
    *
    * Output: (id, ahash, n_same_hash); invalid payloads report null hash
    * and count (counted, not dropped).
    */
  def imageAHash(assets: DataFrame, idCol: String = "asset_id",
                 payloadCol: String = "payload",
                 maxPixels: Int = 64): DataFrame = {
    require(maxPixels > 0 && maxPixels <= 64, "ahash uses at most 64 bits")
    // one native-expression call per row (graft.functions.AHash): the
    // declarative gray-array form re-evaluated its 36-byte-extract tree
    // once per BIT after CollapseProject inlined the mean into the
    // comparison lambda — the m10/WhtEnergies blowup class; see the
    // expression's scaladoc
    val hashes = assets.select(col(idCol),
      graft.functions.AHash(col(payloadCol), maxPixels).as("ahash"))
    val counts = hashes.filter(col("ahash").isNotNull)
      .groupBy("ahash").agg(count(lit(1)).as("n_same_hash"))
    hashes.join(counts, Seq("ahash"), "left")
      .select(col(idCol), col("ahash"), col("n_same_hash"))
  }

  /** Image NEAR-dup pairs — the m11 exact-hash story completed: two
    * re-encodes of the same picture (resize artifacts, palette dither, a
    * flipped pixel) share most aHash bits but not all of them, which the
    * n_same_hash equality join can never see. aHash per asset via the
    * native expression, then [[Dedup.hamming64NearDups]]'s pigeonhole
    * buckets + exact `bit_count(xor)` verify — complete recall for
    * Hamming ≤ 3 by construction, count-gated buckets, never all-pairs.
    */
  def imageNearDups(assets: DataFrame, idCol: String = "asset_id",
                    payloadCol: String = "payload",
                    maxHamming: Int = 3): DataFrame =
    Dedup.hamming64NearDups(
      assets.select(col(idCol),
        graft.functions.AHash(col(payloadCol), 64).as("ahash")),
      idCol, "ahash", maxHamming)

  /** Decoded BI_RGB bitmap: dimensions plus the first pixels as (b, g, r)
    * byte triples in stored row order. */
  final case class BmpRgb(width: Int, height: Int, bpp: Int,
                          pixels: Array[(Int, Int, Int)])

  /** The imperative twin of [[bmpPixelStats]] for the mapPartitions seam:
    * returns None unless the payload is an uncompressed 24-bit BMP; walks
    * the padded row stride explicitly.
    */
  def decodeBmpRgb(payload: Array[Byte], maxPixels: Int = Int.MaxValue): Option[BmpRgb] = {
    if (payload == null || payload.length < 54) return None
    def le(pos: Int, width: Int): Long = leBytes(payload, pos, width)
    def leS32(pos: Int): Long = { val u = le(pos, 4); if (u >= 2147483648L) u - 4294967296L else u }
    if (payload(0) != 'B'.toByte || payload(1) != 'M'.toByte) return None
    if (le(27, 2) != 1L || le(29, 2) != 24L || le(31, 4) != 0L) return None
    val w = leS32(19); val h = leS32(23)
    if (w <= 0 || h <= 0) return None
    // all geometry in Long: header-claimed dimensions are attacker input,
    // and Int math on width·3 or off+rows·rowSize overflows negative for
    // ~2^31-scale claims, which would bypass the bounds check below and
    // allocate against a fabricated pixel count
    val off = le(11, 4)
    val rowSize = (w * 3 + 3) / 4 * 4
    val n0 = math.min(w * h, maxPixels.toLong)
    if (n0 > Int.MaxValue) return None
    val n = n0.toInt
    val lastBase = off + (n - 1).toLong / w * rowSize + (n - 1).toLong % w * 3
    if (off < 54 || lastBase + 3 > payload.length) return None
    val pixels = Array.tabulate(n) { i =>
      val base = (off + i / w * rowSize + i % w * 3).toInt
      ((payload(base) & 0xFF), (payload(base + 1) & 0xFF), (payload(base + 2) & 0xFF))
    }
    Some(BmpRgb(w.toInt, h.toInt, 24, pixels))
  }

  /** 54-byte BMP header (BITMAPINFOHEADER, 24-bit BI_RGB) for a `w`×`h`
    * bitmap, as lowercase hex. */
  def bmpHeaderHex(w: Int, h: Int): String = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataBytes = rowSize * h
    "424d" + leHex(54L + dataBytes, 4) + "00000000" + leHex(54, 4) +
      leHex(40, 4) + leHex(w, 4) + leHex(h, 4) + leHex(1, 2) + leHex(24, 2) +
      leHex(0, 4) + leHex(dataBytes, 4) + leHex(2835, 4) + leHex(2835, 4) +
      leHex(0, 4) + leHex(0, 4)
  }

  /** Deterministic, VALID 3×4 24-bit BMP from a text column's md5 stream:
    * rowSize 12 (3 padding bytes per 9-byte pixel row, so the parsers'
    * stride handling is actually exercised), 48 data bytes = 3 md5 blocks.
    */
  def synthBmp(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dataHex = concat((0 until 3)
      .map(i => md5(concat(col(textCol), lit(s"b$i")))): _*)
    df.select(col(idCol),
      unhex(concat(lit(bmpHeaderHex(3, 4)), dataHex)).as("payload"))
  }

  /** 8×8 variant for the perceptual-hash family (m14): 64 pixels populate
    * ALL 64 aHash bits — the 3×4 fixture's 12-bit hashes would leave the
    * upper Hamming-chunk buckets degenerate corpus-wide. 192 data bytes =
    * 12 md5 blocks, rowSize 24 (no padding; the stride exercise stays
    * with m6's 3×4 form).
    */
  def synthBmpSquare(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dataHex = concat((0 until 12)
      .map(i => md5(concat(col(textCol), lit(s"b$i")))): _*)
    df.select(col(idCol),
      unhex(concat(lit(bmpHeaderHex(8, 8)), dataHex)).as("payload"))
  }

  /** Near-dup IMAGE family fixture for m14: 8×8 payloads content-keyed on
    * `floor(doc_id / 10)` — consecutive-id families of ten share each base
    * picture, so dup families EXIST (the corpus's text near-dups don't
    * survive md5 into pixel
    * space) — and every third doc gets a deterministic white pixel at
    * position `doc_id % 64` painted over its base, so nonzero-Hamming
    * pairs exist too (the overlay flips that pixel's bit and can ripple a
    * few mean-adjacent bits; the oracle recomputes the hash from the
    * mutated payload, so the ripple is graded, not assumed).
    */
  def plantNearDupImages(df: DataFrame, idCol: String): DataFrame = {
    // consecutive-id families of TEN at any scale factor (a modulus key
    // would grow family size — and pair count QUADRATICALLY — with the
    // corpus; div keying keeps the fixture's cost linear in rows)
    val key = floor(col(idCol) / 10L).cast("long").cast("string")
    val baseHex = concat(lit(bmpHeaderHex(8, 8)) +:
      (0 until 12).map(i => md5(concat(key, lit(s"b$i")))): _*)
    // pixel p sits at data byte 54 + 3p (rowSize 24, no padding) →
    // hex chars [108 + 6p + 1, 108 + 6p + 6] (1-based)
    val cut = lit(108) + pmod(col(idCol), lit(64L)).cast("int") * 6
    val mutated = concat(
      baseHex.substr(lit(1), cut),
      lit("ffffff"),
      baseHex.substr(cut + 7, lit(1000000)))
    df.select(col(idCol),
      unhex(when(pmod(col(idCol), lit(3L)) === 1L, mutated).otherwise(baseHex))
        .as("payload"))
  }

  private def leHex(v: Long, bytes: Int): String =
    (0 until bytes).map(i => f"${(v >> (8 * i)) & 0xFF}%02x").mkString

  /** 44-byte canonical header for 16 kHz mono 16-bit PCM with
    * `dataBytes` of samples, as lowercase hex. */
  def wavHeaderHex(dataBytes: Int): String =
    "52494646" + leHex(36L + dataBytes, 4) + "57415645" +
      "666d7420" + leHex(16, 4) + leHex(1, 2) + leHex(1, 2) +
      leHex(16000, 4) + leHex(32000, 4) + leHex(2, 2) + leHex(16, 2) +
      "64617461" + leHex(dataBytes, 4)

  /** Deterministic, VALID 16 kHz mono 16-bit PCM WAV synthesized from a
    * text column's md5 stream: 128 samples (256 data bytes) behind a
    * canonical 44-byte header — any standard WAV reader accepts the
    * result. Exists because the container ships no media fixtures; the
    * parsers above are the real thing, this makes their input.
    */
  def synthWav(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dataHex = concat((0 until 16)
      .map(i => md5(concat(col(textCol), lit(i.toString)))): _*)
    df.select(col(idCol),
      unhex(concat(lit(wavHeaderHex(256)), dataHex)).as("payload"))
  }

  // ---- Real MP3 frame-header metadata ---------------------------------

  /** MPEG-1 Layer III bitrate table (kbps) for bitrate indices 1–14
    * (index 0 = "free" and 15 = "bad" are rejected), and the MPEG-1
    * sample-rate table for indices 0–2 (3 = reserved). ISO/IEC 11172-3
    * header layout: AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM — sync(11)
    * version(2) layer(2) protection(1) bitrate(4) samplerate(2)
    * padding(1) private(1) mode(2) modeExt(2) copyright(1) original(1)
    * emphasis(2).
    */
  val Mp3BitrateKbps: Seq[Long] =
    Seq(32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L, 128L, 160L, 192L, 224L, 256L, 320L)
  val Mp3SampleRates: Seq[Long] = Seq(44100L, 48000L, 32000L)

  /** REAL MP3 (MPEG-1 Layer III) frame-header metadata as a distributed
    * column plan — the m5 discipline applied to the compressed-audio tier:
    * sync word, version/layer bits, bitrate + sample-rate table lookups,
    * channel mode, frame geometry, and the frame-count/duration report —
    * exactly what a metadata probe reports without decoding a single
    * sample (sample SYNTHESIS stays behind the codec seam; this tier is
    * pure header math). Real-world coverage:
    *   - a leading ID3v2 tag (10-byte header, 28-bit synchsafe length,
    *     footer flag) is skipped; `id3_len` reports the bytes skipped —
    *     almost every crawled MP3 leads with one;
    *   - a Xing/Info tag in the first frame (at the MPEG-1 side-info
    *     offset: 21 bytes into the frame for mono, 36 otherwise) with the
    *     frames-field flag set overrides the frame count — the VBR
    *     convention, where floor(bytes / firstFrameLen) is wrong because
    *     every frame picks its own bitrate. `vbr` = 1 for a `Xing` tag
    *     (VBR encoder), 0 for `Info` (CBR encoder) or no tag;
    *   - otherwise the count is the CBR estimate
    *     floor((bytes − id3_len) / frameLen) — complete frames only,
    *     which [[mp3FrameWalk]] matches exactly on padding-free input.
    * bitrate_kbps/frame_len always report the FIRST frame's header (for a
    * VBR stream that is the Xing frame's — the standard probe convention);
    * duration_ms is floor(n_frames · 1152000 / rate), integer-exact.
    *
    * Invalid payloads (bad sync, reserved version/layer/rate, free/bad
    * bitrate, truncated ID3 tag) keep their row with valid=0 and null
    * fields — counted, not dropped.
    */
  def mp3Meta(assets: DataFrame, idCol: String = "asset_id",
              payloadCol: String = "payload"): DataFrame = {
    // STAGED projections, one value per intermediate: the data-dependent
    // frame offset (id3_len) feeds ~20 downstream byte reads, and inlining
    // it into each would re-evaluate the whole synchsafe subtree per read
    // (codegen CSE does not reliably fold conditional substr chains —
    // measured 15× slower as one projection). Each stage materializes its
    // bytes once; Catalyst keeps the stages inside one WholeStageCodegen.
    val p0 = col(payloadCol)
    // stage 1: optional leading ID3v2 tag — "ID3" magic, version (2),
    // flags (bit 4 appends a 10-byte footer), 28-bit synchsafe size
    val hasId3 = (length(p0) >= 10) &&
      (byteAt(p0, lit(1)) === 0x49L) && (byteAt(p0, lit(2)) === 0x44L) &&
      (byteAt(p0, lit(3)) === 0x33L)
    val synchsafe =
      shiftleft(byteAt(p0, lit(7)).bitwiseAND(lit(127L)), 21) +
      shiftleft(byteAt(p0, lit(8)).bitwiseAND(lit(127L)), 14) +
      shiftleft(byteAt(p0, lit(9)).bitwiseAND(lit(127L)), 7) +
      byteAt(p0, lit(10)).bitwiseAND(lit(127L))
    val s1 = assets.select(col(idCol), p0.as("__p"),
      length(p0).cast("long").as("__len"),
      when(hasId3, lit(10L) + synchsafe +
          shiftright(byteAt(p0, lit(6)), 4).bitwiseAND(lit(1L)) * 10L)
        .otherwise(lit(0L)).as("__id3"))
    // stage 2: the first frame's 4 header bytes at the skipped offset
    val p = col("__p"); val len = col("__len"); val id3Len = col("__id3")
    val s2 = s1.select(col(idCol), p, len, id3Len,
      byteAt(p, id3Len + 1).as("__h1"), byteAt(p, id3Len + 2).as("__h2"),
      byteAt(p, id3Len + 3).as("__h3"), byteAt(p, id3Len + 4).as("__h4"))
    // stage 3: header fields + the Xing/Info probe region — the 12 tag
    // bytes fetched as ONE slice at the MPEG-1 side-info offset (17 bytes
    // for mono mode 3, 32 otherwise, +4 header), hexed once
    val b2 = col("__h2"); val b3 = col("__h3"); val b4 = col("__h4")
    val versionBits = shiftright(b2, 3).bitwiseAND(lit(3L)) // 3 = MPEG-1
    val layerBits   = shiftright(b2, 1).bitwiseAND(lit(3L)) // 1 = Layer III
    val mode0   = shiftright(b4, 6).bitwiseAND(lit(3L))
    val sideOff0 = when(mode0 === 3L, lit(21L)).otherwise(lit(36L))
    val s3 = s2.select(col(idCol), len, id3Len,
      ((col("__h1") === 255L) && (shiftright(b2, 5) === 7L) &&
        (versionBits === 3L) && (layerBits === 1L) &&
        (len >= id3Len + 4L)).as("__sync"),
      shiftright(b3, 4).bitwiseAND(lit(15L)).as("__bi"),
      shiftright(b3, 2).bitwiseAND(lit(3L)).as("__sr"),
      shiftright(b3, 1).bitwiseAND(lit(1L)).as("__pad"),
      mode0.as("__mode"),
      sideOff0.as("__side"),
      lower(hex(p.substr((id3Len + sideOff0 + 1).cast("int"), lit(12)))).as("__tag"))
    // stage 4: validity, table lookups, Xing frames-field override
    val bi = col("__bi"); val srIdx = col("__sr"); val padding = col("__pad")
    val mode = col("__mode"); val tagHex = col("__tag")
    val valid = col("__sync") && (bi >= 1L) && (bi <= 14L) && (srIdx <= 2L)
    // guard the table indices: element_at is 1-based and must never see a
    // reserved index even on invalid rows (the when() keeps them null)
    val kbps = when(valid,
      element_at(array(Mp3BitrateKbps.map(lit): _*), bi.cast("int")))
    val rate = when(valid,
      element_at(array(Mp3SampleRates.map(lit): _*), srIdx.cast("int") + 1))
    val frameLen = when(valid, floor(lit(144000L) * kbps / rate) + padding)
    // tag layout: tag(4) flags(4,BE) frames(4,BE) when flags bit 0 set
    def tagBe32(hexPos: Int) = conv(substring(tagHex, hexPos, 8), 16, 10).cast("long")
    val isXing = substring(tagHex, 1, 8) === "58696e67"
    val isInfo = substring(tagHex, 1, 8) === "496e666f"
    val tagRoom = len >= id3Len + col("__side") + 12L
    val hasFrames = valid && tagRoom && (isXing || isInfo) &&
      (tagBe32(9).bitwiseAND(lit(1L)) === 1L)
    val nFrames = when(hasFrames, tagBe32(17))
      .otherwise(when(valid, floor((len - id3Len) / frameLen)))
    s3.select(col(idCol),
      valid.cast("int").as("valid"),
      when(valid, lit(1L)).as("mpeg_version"),
      when(valid, lit(3L)).as("layer"),
      kbps.as("bitrate_kbps"),
      rate.as("sample_rate"),
      when(valid, mode).as("channel_mode"),
      when(valid, padding).as("padding"),
      when(valid, id3Len).as("id3_len"),
      when(valid, when(hasFrames && isXing, 1L).otherwise(0L)).as("vbr"),
      frameLen.cast("long").as("frame_len"),
      nFrames.cast("long").as("n_frames"),
      // 1152 samples per MPEG-1 Layer III frame; integer-exact ms
      when(valid, floor(nFrames * lit(1152000L) / rate)).cast("long").as("duration_ms"))
  }

  /** Parsed MP3 stream metadata from an imperative frame WALK. */
  final case class Mp3Info(bitrateKbps: Int, sampleRate: Int, channelMode: Int,
                           nFrames: Int, durationMs: Long)

  /** Frame-by-frame MP3 walk — the per-partition twin of [[mp3Meta]] that
    * per-frame padding and true VBR streams need (each frame's length
    * depends on its own bitrate + padding bits, so a single division
    * cannot count frames). Skips a leading ID3v2 tag (same synchsafe
    * math as the column plan), then walks headers until the payload ends
    * or a header stops validating. Reports the FIRST frame's
    * bitrate/rate/mode (the probe convention) and the exact COMPLETE
    * frame count — a truncated final frame whose header is present but
    * whose body is cut off is not counted, matching the plan's
    * floor(bytes / frameLen) on CBR input. Duration is computed once
    * from the frame count at the first frame's sample rate
    * (floor(n · 1152000 / rate) ms — the same formula as [[mp3Meta]];
    * MPEG-1 streams don't change sample rate mid-stream). Pure JDK byte
    * math; None if even the first header is invalid or incomplete.
    */
  def mp3FrameWalk(payload: Array[Byte]): Option[Mp3Info] = {
    if (payload == null || payload.length < 4) return None
    var off = 0
    // ID3v2: "ID3", version (2), flags at index 5 (bit 4 = 10-byte
    // footer), 28-bit synchsafe size in bytes 6-9
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
      val size = ((payload(6) & 0x7F) << 21) | ((payload(7) & 0x7F) << 14) |
        ((payload(8) & 0x7F) << 7) | (payload(9) & 0x7F)
      off = 10 + size + (if (((payload(5) >> 4) & 1) == 1) 10 else 0)
    }
    var nFrames = 0
    var first: Option[(Int, Int, Int)] = None
    var ok = true
    while (ok && off + 4 <= payload.length) {
      val b1 = payload(off) & 0xFF; val b2 = payload(off + 1) & 0xFF
      val b3 = payload(off + 2) & 0xFF; val b4 = payload(off + 3) & 0xFF
      val bi = (b3 >> 4) & 15; val sr = (b3 >> 2) & 3; val pad = (b3 >> 1) & 1
      if (b1 != 255 || (b2 >> 5) != 7 || ((b2 >> 3) & 3) != 3 ||
          ((b2 >> 1) & 3) != 1 || bi < 1 || bi > 14 || sr > 2) {
        ok = false
      } else {
        val kbps = Mp3BitrateKbps(bi - 1).toInt
        val rate = Mp3SampleRates(sr).toInt
        val frameLen = (144000 * kbps / rate) + pad
        if (off + frameLen > payload.length) {
          ok = false // header-only truncated tail: not a complete frame
        } else {
          if (first.isEmpty) first = Some((kbps, rate, (b4 >> 6) & 3))
          nFrames += 1
          off += frameLen
        }
      }
    }
    first.map { case (kbps, rate, mode) =>
      Mp3Info(kbps, rate, mode, nFrames, nFrames.toLong * 1152000L / rate) }
  }

  /** Deterministic, VALID MPEG-1 Layer III stream synthesized from a
    * text column's md5 nibbles (the synthWav construction for the
    * compressed tier): bitrate index 1–14, sample-rate index 0–2, channel
    * mode, and 3–8 frames all selected by md5 digits; every data frame is
    * the same 4-byte header (padding 0) plus md5-stream filler of the
    * exact frame length 144000·kbps/rate. Nibble 5 picks one of the three
    * real-world stream SHAPES the parser must handle:
    *   - shape 0: bare CBR frames (byte-identical to the original synth);
    *   - shape 1: the same CBR frames behind an ID3v2.3 tag whose body is
    *     20 + 8·nibble(6) bytes of md5 filler (synchsafe length, no
    *     footer) — the almost-universal crawled-MP3 prefix;
    *   - shape 2: a VBR-style stream whose FIRST frame is a 320 kbps
    *     Xing frame (zeroed side info, `Xing` tag + frames-flag + BE32
    *     total frame count = data frames + 1) followed by the CBR data
    *     frames — first-frame division math is wrong here by
    *     construction, only the Xing field gives the right count.
    * Any standard MP3 prober accepts the headers; the oracle rebuilds the
    * expected metadata from the same md5 arithmetic.
    */
  def synthMp3(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    def nib(i: Int): Column = conv(substring(h, i, 1), 16, 10).cast("int")
    def hex2(c: Column): Column = lpad(lower(hex(c.cast("long"))), 2, "0")
    val bi     = nib(1) % 14 + 1
    val srIdx  = nib(2) % 3
    val mode   = nib(3) % 4
    val frames = nib(4) % 6 + 3
    val shape  = nib(5) % 3
    val kbps = element_at(array(Mp3BitrateKbps.map(lit): _*), bi)
    val rate = element_at(array(Mp3SampleRates.map(lit): _*), srIdx + 1)
    val frameLen = floor(lit(144000L) * kbps / rate).cast("int")
    val headerHex = concat(lit("fffb"),
      hex2(bi * 16 + srIdx * 4), hex2(mode * 64))
    // filler: one md5 repeated past the max frame length (1440 bytes =
    // 2880 hex chars), sliced to exactly frameLen − 4 bytes
    val fillerHex = repeat(md5(concat(col(textCol), lit("mp3"))), 90)
      .substr(lit(1), (frameLen - 4) * 2)
    // frames is data-dependent and repeat() takes a literal count: repeat
    // to the 8-frame maximum, slice to frames × frameLen bytes
    val frameHex = concat(headerHex, fillerHex)
    val cbrHex = repeat(frameHex, 8).substr(lit(1), frames * frameLen * 2)
    // shape 1: ID3v2.3 tag — "ID3" 03 00, flags 00, synchsafe body length
    // (fits 14 bits), md5 body filler (≤140 bytes → repeat(md5, 9))
    val id3Body = nib(6) * 8 + 20
    val id3HexFull = concat(lit("494433030000"), lit("0000"),
      hex2(id3Body / 128), hex2(id3Body % 128),
      repeat(md5(concat(col(textCol), lit("id3"))), 9).substr(lit(1), id3Body * 2))
    // shape 2: Xing frame at 320 kbps (bitrate index 14) — header, zeroed
    // side info (17 bytes mono / 32 otherwise), "Xing", flags 0x1, BE32
    // frame count (data frames + this one), md5 filler to the frame length
    val xFrameLen = floor(lit(144000L) * 320 / rate).cast("int")
    val xHeaderHex = concat(lit("fffb"), hex2(lit(14) * 16 + srIdx * 4), hex2(mode * 64))
    val sideHex = when(mode === 3, lit("00" * 17)).otherwise(lit("00" * 32))
    val sideLen = when(mode === 3, lit(17)).otherwise(lit(32))
    val xingHex = concat(lit("58696e67"), lit("00000001"),
      lpad(lower(hex((frames + 1).cast("long"))), 8, "0"))
    val xFillerHex = repeat(md5(concat(col(textCol), lit("xing"))), 90)
      .substr(lit(1), (xFrameLen - 4 - sideLen - 12) * 2)
    val xFrameHex = concat(xHeaderHex, sideHex, xingHex, xFillerHex)
    val payloadHex = when(shape === 1, concat(id3HexFull, cbrHex))
      .when(shape === 2, concat(xFrameHex, cbrHex))
      .otherwise(cbrHex)
    df.select(col(idCol), unhex(payloadHex).as("payload"))
  }

  // ---- Real MP4 (ISO BMFF) box-walk metadata --------------------------

  /** Parsed ISO-BMFF container metadata. duration/timescale are mvhd's;
    * durationMs is the integer-exact millisecond form. */
  final case class Mp4Info(majorBrand: String, timescale: Long, duration: Long,
                           durationMs: Long, nTracks: Int)

  /** REAL MP4/ISO-BMFF metadata via the box walk every prober performs
    * (ISO/IEC 14496-12): 4-byte big-endian size + 4-char type per box,
    * 64-bit `largesize` and size-0 (to-EOF) forms included; `ftyp` must
    * lead (major brand read from it), then the TOP-LEVEL walk finds
    * `moov`, whose CHILD walk reads `mvhd` (version 0 and 1 layouts) for
    * timescale/duration and counts `trak` children. Boxes in any order,
    * unknown boxes skipped by size — the walk is real, not fixed offsets.
    * Sample decode (h264 et al.) stays behind the codec seam; this is the
    * container tier, the m12-MP3 move applied to video.
    *
    * None on any structural failure (no ftyp, truncated box, no moov/mvhd,
    * zero timescale) — corrupt assets are counted by the caller. All
    * geometry is computed in Long and bounds-checked before any read.
    */
  def decodeMp4Meta(payload: Array[Byte]): Option[Mp4Info] = {
    if (payload == null || payload.length < 16) return None
    def be32(pos: Int): Long =
      ((payload(pos) & 0xFFL) << 24) | ((payload(pos + 1) & 0xFFL) << 16) |
        ((payload(pos + 2) & 0xFFL) << 8) | (payload(pos + 3) & 0xFFL)
    def be64(pos: Int): Long = (be32(pos) << 32) | be32(pos + 4)
    def typ(pos: Int): String = new String(payload, pos, 4, "US-ASCII")
    // (payloadStart, payloadEnd, headerLen) of the box at `pos`, or None
    def box(pos: Int, limit: Int): Option[(Int, Int, String)] = {
      if (pos + 8 > limit) return None
      val size0 = be32(pos)
      val t = typ(pos + 4)
      val (start, end) =
        if (size0 == 1L) {
          if (pos + 16 > limit) return None
          val sz = be64(pos + 8)
          if (sz < 16 || pos + sz > limit) return None
          (pos + 16, pos + sz.toInt)
        } else if (size0 == 0L) (pos + 8, limit) // to end of enclosing box
        else {
          if (size0 < 8 || pos + size0 > limit) return None
          (pos + 8, pos + size0.toInt)
        }
      Some((start, end, t))
    }
    // ftyp must lead (14496-12 §4.3: "shall be placed as early as possible")
    val ftyp = box(0, payload.length) match {
      case Some((s, e, "ftyp")) if e - s >= 4 => typ(s)
      case _ => return None
    }
    // top-level walk to moov
    var pos = 0
    var moov: Option[(Int, Int)] = None
    while (moov.isEmpty && pos + 8 <= payload.length) {
      box(pos, payload.length) match {
        case Some((s, e, t)) =>
          if (t == "moov") moov = Some((s, e))
          pos = e
        case None => return None
      }
    }
    moov.flatMap { case (ms, me) =>
      var p = ms
      var timescale = -1L; var duration = -1L; var tracks = 0
      while (p + 8 <= me) {
        box(p, me) match {
          case Some((s, e, t)) =>
            if (t == "trak") tracks += 1
            else if (t == "mvhd" && e - s >= 4) {
              val version = payload(s) & 0xFF
              if (version == 1 && e - s >= 4 + 28) {
                timescale = be32(s + 4 + 16)
                duration  = be64(s + 4 + 20)
              } else if (version == 0 && e - s >= 4 + 16) {
                timescale = be32(s + 4 + 8)
                duration  = be32(s + 4 + 12)
              }
            }
            p = e
          case None => return None
        }
      }
      if (timescale <= 0 || duration < 0) None
      else Some(Mp4Info(ftyp, timescale, duration,
        duration * 1000L / timescale, tracks))
    }
  }

  /** [[decodeMp4Meta]] over asset batches — the mapPartitions face a
    * prober plugs into (the pngPixelStats shape). Invalid payloads keep
    * their row with valid=0 and null fields.
    */
  def mp4Meta(assets: DataFrame, idCol: String = "asset_id",
              payloadCol: String = "payload"): DataFrame = {
    val idIdx = assets.schema.fieldIndex(idCol)
    val pIdx  = assets.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      StructField(idCol, assets.schema(idIdx).dataType, nullable = false),
      StructField("valid", IntegerType, nullable = false),
      StructField("major_brand", StringType, nullable = true),
      StructField("timescale", LongType, nullable = true),
      StructField("duration", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_tracks", LongType, nullable = true)))
    assets.mapPartitions { rows =>
      rows.map { r =>
        decodeMp4Meta(r.getAs[Array[Byte]](pIdx)) match {
          case Some(m) => Row(r.get(idIdx), 1, m.majorBrand, m.timescale,
            m.duration, m.durationMs, m.nTracks.toLong)
          case None => Row(r.get(idIdx), 0, null, null, null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** One row of an MP4 track's sample index: byte geometry + timing. */
  final case class Mp4Sample(idx: Int, size: Long, offset: Long,
                             dts: Long, dtsMs: Long)

  /** REAL ISO-BMFF sample-table walk (m15): the frame index a video
    * sampler reads BEFORE it ever touches a codec — which bytes are
    * frame i and when does it play. Walks top-level boxes to `moov`,
    * then each `trak`'s `mdia/mdhd` (media timescale, v0 and v1) and
    * `mdia/minf/stbl`, and decodes the first track carrying a complete
    * table: `stts` (run-length decoding times), `stsz` (per-sample sizes,
    * both the constant sample_size form and the explicit entry list) and
    * `stco` (chunk base; single-chunk layout — the synth's shape).
    * Absolute byte offsets are chunk base + running size sum; dts is the
    * running stts delta sum; dts_ms = dts·1000/timescale integer-exact.
    * Frame-sample SELECTION itself (every k-th, time-windowed) is then
    * plain relational algebra over these rows — m2's operator, fed by
    * real container geometry instead of synthetic frame ids.
    *
    * None on structural failure (no moov, no table track, entry counts
    * that overrun their box, zero timescale). All geometry is Long math
    * bounds-checked against the enclosing box before any read.
    */
  def decodeMp4SampleIndex(payload: Array[Byte]): Option[(Long, Seq[Mp4Sample])] = {
    if (payload == null || payload.length < 16) return None
    def be32(pos: Int): Long =
      ((payload(pos) & 0xFFL) << 24) | ((payload(pos + 1) & 0xFFL) << 16) |
        ((payload(pos + 2) & 0xFFL) << 8) | (payload(pos + 3) & 0xFFL)
    def typ(pos: Int): String = new String(payload, pos, 4, "US-ASCII")
    def box(pos: Int, limit: Int): Option[(Int, Int, String)] = {
      if (pos + 8 > limit) return None
      val size0 = be32(pos)
      val t = typ(pos + 4)
      if (size0 == 1L) {
        if (pos + 16 > limit) return None
        val sz = (be32(pos + 8) << 32) | be32(pos + 12)
        if (sz < 16 || pos + sz > limit) None else Some((pos + 16, pos + sz.toInt, t))
      } else if (size0 == 0L) Some((pos + 8, limit, t))
      else if (size0 < 8 || pos + size0 > limit) None
      else Some((pos + 8, pos + size0.toInt, t))
    }
    // find a child box of the given type; None if the walk breaks
    def child(from: Int, limit: Int, want: String): Option[(Int, Int)] = {
      var p = from
      while (p + 8 <= limit) {
        box(p, limit) match {
          case Some((s, e, t)) => if (t == want) return Some((s, e)) else p = e
          case None => return None
        }
      }
      None
    }
    // stts + stsz + stco → sample rows; None when any entry count
    // overruns its box or the tables disagree on the sample count
    def decodeTable(ttS: Int, ttE: Int, szS: Int, szE: Int,
                    coS: Int, coE: Int, ts: Long): Option[Seq[Mp4Sample]] = {
      // stts: fullbox(4), entry_count(4), (count, delta)*
      if (ttE - ttS < 8 || szE - szS < 12 || coE - coS < 8) return None
      val nRuns = be32(ttS + 4)
      if (nRuns < 0 || ttS + 8 + nRuns * 8 > ttE) return None
      val deltas = Seq.newBuilder[Long]
      var run = 0
      while (run < nRuns) {
        val cnt = be32(ttS + 8 + run * 8)
        val dl  = be32(ttS + 12 + run * 8)
        if (cnt < 0 || cnt > (1 << 20)) return None // hostile-count valve
        var i = 0L
        while (i < cnt) { deltas += dl; i += 1 }
        run += 1
      }
      // stsz: fullbox(4), sample_size(4), sample_count(4), entries if 0
      val constSize = be32(szS + 4)
      val nSamples0 = be32(szS + 8)
      if (nSamples0 < 0 || nSamples0 > (1 << 20)) return None
      val nSamples = nSamples0.toInt
      val sizes: Seq[Long] =
        if (constSize != 0L) Seq.fill(nSamples)(constSize)
        else {
          if (szS + 12 + nSamples * 4 > szE) return None
          (0 until nSamples).map(i => be32(szS + 12 + i * 4))
        }
      val allDeltas = deltas.result()
      if (allDeltas.length != nSamples) return None
      // stco: fullbox(4), entry_count(4), chunk_offset(4)* — single-chunk
      if (be32(coS + 4) < 1 || coS + 12 > coE) return None
      val base = be32(coS + 8)
      var off = base; var dts = 0L
      Some((0 until nSamples).map { i =>
        val s = Mp4Sample(i, sizes(i), off, dts, dts * 1000L / ts)
        off += sizes(i); dts += allDeltas(i)
        s
      })
    }
    child(0, payload.length, "moov").flatMap { case (ms, me) =>
      // walk every trak; decode the first with mdhd + a complete stbl
      var p = ms
      var result: Option[(Long, Seq[Mp4Sample])] = None
      while (result.isEmpty && p + 8 <= me) {
        box(p, me) match {
          case Some((s, e, "trak")) =>
            result = for {
              (mdS, mdE)   <- child(s, e, "mdia")
              (mhS, mhE)   <- child(mdS, mdE, "mdhd")
              ts <- {
                val v = payload(mhS) & 0xFF
                if (v == 1 && mhE - mhS >= 24 + 4) Some(be32(mhS + 20))
                else if (v == 0 && mhE - mhS >= 16) Some(be32(mhS + 12))
                else None
              }
              if ts > 0
              (mnS, mnE)   <- child(mdS, mdE, "minf")
              (sbS, sbE)   <- child(mnS, mnE, "stbl")
              (ttS, ttE)   <- child(sbS, sbE, "stts")
              (szS, szE)   <- child(sbS, sbE, "stsz")
              (coS, coE)   <- child(sbS, sbE, "stco")
              samples <- decodeTable(ttS, ttE, szS, szE, coS, coE, ts)
            } yield (ts, samples)
            p = e
          case Some((_, e, _)) => p = e
          case None => return None
        }
      }
      result
    }
  }

  /** [[decodeMp4SampleIndex]] over asset batches: one output row per
    * sample of each decodable asset (undecodable assets emit nothing —
    * count them with [[mp4Meta]]'s valid flag, the two walks share the
    * box layer). Columns: `sample_idx`, `size`, `offset` (absolute file
    * byte), `dts` (media units), `dts_ms`, `timescale`.
    */
  def mp4SampleIndex(assets: DataFrame, idCol: String = "asset_id",
                     payloadCol: String = "payload"): DataFrame = {
    val idIdx = assets.schema.fieldIndex(idCol)
    val pIdx  = assets.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      StructField(idCol, assets.schema(idIdx).dataType, nullable = false),
      StructField("sample_idx", LongType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("dts", LongType, nullable = false),
      StructField("dts_ms", LongType, nullable = false),
      StructField("timescale", LongType, nullable = false)))
    assets.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeMp4SampleIndex(r.getAs[Array[Byte]](pIdx)) match {
          case Some((ts, samples)) => samples.map(sm =>
            Row(r.get(idIdx), sm.idx.toLong, sm.size, sm.offset, sm.dts, sm.dtsMs, ts))
          case None => Seq.empty[Row]
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic, structurally VALID ISO-BMFF container from md5
    * nibbles: brand, timescale, duration, and track count all md5-chosen;
    * an md5-sized `free` box sits between `ftyp` and `moov`, and inside
    * `moov` one `trak` PRECEDES `mvhd` — so fixed-offset "parsing" fails
    * and only a real order-independent, size-driven box walk recovers the
    * fields. mvhd is the full 108-byte version-0 layout.
    *
    * The FIRST trak carries a complete sample table (the m15 input):
    * `mdia/mdhd` (its own media timescale), `minf/stbl` with `stts`
    * (two duration runs), `stsc` (one chunk), `stsz` (per-sample sizes,
    * sample_size = 0 form), and `stco` whose single chunk offset is the
    * REAL byte position of the mdat payload — so sample offsets resolve
    * against actual file geometry, and the mdat body really contains
    * Σ size_i bytes. Sample geometry (run lengths n1/n2, deltas,
    * per-sample sizes) is all md5-nibble-derived; the oracle rebuilds it
    * arithmetically, including the stco base (408 + nib8 + 4n +
    * 100·(nTracks−1) — the closed form of the box layout below; the m15
    * oracle hash-fails if any constant drifts).
    */
  def synthMp4Bytes(text: String): Array[Byte] = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(i: Int) = Integer.parseInt(h.substring(i - 1, i), 16)
    val timescale = Seq(600L, 1000L, 90000L)(nib(1) % 3)
    val duration  = 1000L + Integer.parseInt(h.substring(1, 5), 16).toLong
    val nTracks   = 1 + nib(6) % 3
    val brand     = if (nib(7) % 2 == 0) "isom" else "mp42"
    // sample-table geometry (m15)
    val mediaTs = Seq(600L, 1000L, 90000L)(nib(9) % 3)
    val n1 = 2 + nib(10) % 4
    val n2 = 1 + nib(11) % 4
    val delta1 = 100L + 10L * nib(12)
    val delta2 = 100L + 10L * nib(13)
    val n = n1 + n2
    val sizes = (1 to n).map(i => 64L + 4L * nib(((13 + i) % 32) + 1))
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def boxBytes(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    // ftyp: major brand + minor version + one compatible brand
    out.write(boxBytes("ftyp",
      brand.getBytes("US-ASCII") ++ be32(0x200L) ++ "isom".getBytes("US-ASCII")))
    // free box of md5-dependent size: the walk must skip by size
    out.write(boxBytes("free", new Array[Byte](nib(8))))
    // mdat payload offset, closed form (ftyp 20, free 8+nib8, moov header
    // 8, trak1 256+4n, mvhd 108, plain traks 100 each, mdat header 8)
    val mdatOff = 408L + nib(8) + 4L * n + 100L * (nTracks - 1)
    // stbl: stts (2 runs) + stsc (1 chunk) + stsz (explicit sizes) + stco
    val stts = boxBytes("stts", be32(0) ++ be32(2) ++
      be32(n1) ++ be32(delta1) ++ be32(n2) ++ be32(delta2))
    val stsc = boxBytes("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(n) ++ be32(1))
    val stsz = boxBytes("stsz", be32(0) ++ be32(0) ++ be32(n) ++
      sizes.flatMap(be32).toArray)
    val stco = boxBytes("stco", be32(0) ++ be32(1) ++ be32(mdatOff))
    val stbl = boxBytes("stbl", stts ++ stsc ++ stsz ++ stco)
    val mdhd = {
      val b = new Array[Byte](24) // fullbox + v0 times/timescale/duration + lang
      System.arraycopy(be32(mediaTs), 0, b, 12, 4)
      System.arraycopy(be32(n1 * delta1 + n2 * delta2), 0, b, 16, 4)
      b
    }
    val mdia = boxBytes("mdia", boxBytes("mdhd", mdhd) ++ boxBytes("minf", stbl))
    // moov: the sample-table trak BEFORE mvhd, plain traks after
    val mvhd = {
      val b = new Array[Byte](100) // fullbox(4) + v0 fields + matrix + next_track
      System.arraycopy(be32(timescale), 0, b, 12, 4)
      System.arraycopy(be32(duration), 0, b, 16, 4)
      b
    }
    val trak1 = boxBytes("trak", boxBytes("tkhd", new Array[Byte](84)) ++ mdia)
    val trak = boxBytes("trak", boxBytes("tkhd", new Array[Byte](84)))
    val moovPayload = new java.io.ByteArrayOutputStream()
    moovPayload.write(trak1)
    moovPayload.write(boxBytes("mvhd", mvhd))
    (1 until nTracks).foreach(_ => moovPayload.write(trak))
    out.write(boxBytes("moov", moovPayload.toByteArray))
    // mdat really holds Σ size_i media bytes (md5-derived filler), so the
    // stco + stsz geometry resolves against true file contents
    val mediaLen = sizes.sum.toInt
    val filler = Iterator.continually(h.getBytes("US-ASCII"))
      .flatten.take(mediaLen).toArray
    require(out.size() + 8 == mdatOff, s"mdat offset drifted: ${out.size() + 8} != $mdatOff")
    out.write(boxBytes("mdat", filler))
    out.toByteArray
  }

  /** [[synthMp4Bytes]] as a column generator (the synthPng shape). */
  def synthMp4(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx  = df.schema.fieldIndex(textCol)
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idIdx).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    df.mapPartitions { rows =>
      rows.map(r => Row(r.get(idIdx), synthMp4Bytes(r.getString(tIdx))))
    }(Encoders.row(outSchema))
  }

  // ---- Real PNG (8-bit truecolor) decode ------------------------------

  /** Decoded 8-bit RGB PNG: dimensions plus the de-filtered pixel bytes
    * (r, g, b per pixel, row-major). */
  final case class PngRgb(width: Int, height: Int, bitDepth: Int, pixels: Array[Byte])

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** REAL PNG decode — no external codec: chunk walk (IHDR, concatenated
    * IDAT, IEND; ancillary chunks skipped), zlib inflate via the JDK's own
    * `java.util.zip.Inflater`, and full scanline de-filtering (all five
    * filter types: None, Sub, Up, Average, Paeth). 8-bit truecolor
    * (color type 2), non-interlaced only — the palette/alpha/Adam7
    * variants stay out of scope, and genuinely foreign codecs (JPEG/MP3)
    * remain behind the stub.
    *
    * Unlike the WAV/BMP twins there is no column-expression form: inflate
    * is not expressible as a Catalyst plan, so the distributed face is the
    * mapPartitions seam ([[pngPixelStats]]) — which is exactly where a
    * real pipeline's codec sits.
    *
    * Returns None on any structural failure (bad magic, truncated chunk,
    * bad zlib stream, wrong geometry) — corrupt assets are counted by the
    * caller, never crash the scan. Header-claimed dimensions are attacker
    * input: geometry is computed in Long and capped before allocation.
    */
  def decodePngRgb(payload: Array[Byte]): Option[PngRgb] = {
    if (payload == null || payload.length < 8 + 25 + 12) return None // sig+IHDR+IEND
    var i = 0
    while (i < 8) { if (payload(i) != PngSig(i)) return None; i += 1 }
    def beUInt(pos: Int): Long =
      ((payload(pos) & 0xFFL) << 24) | ((payload(pos + 1) & 0xFFL) << 16) |
        ((payload(pos + 2) & 0xFFL) << 8) | (payload(pos + 3) & 0xFFL)
    var off = 8
    var w = -1L; var h = -1L; var bitDepth = -1; var colorType = -1; var interlace = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      if (off + 12 > payload.length) return None // ran out before IEND
      val len = beUInt(off)
      if (off + 12 + len > payload.length) return None
      new String(payload, off + 4, 4, "US-ASCII") match {
        case "IHDR" =>
          if (len != 13) return None
          w = beUInt(off + 8); h = beUInt(off + 12)
          bitDepth = payload(off + 16) & 0xFF; colorType = payload(off + 17) & 0xFF
          if ((payload(off + 18) & 0xFF) != 0 || (payload(off + 19) & 0xFF) != 0) return None
          interlace = payload(off + 20) & 0xFF
        case "IDAT" => idat.write(payload, off + 8, len.toInt)
        case "IEND" => sawEnd = true
        case _      => () // ancillary (tEXt, pHYs, …): skip
      }
      off += 12 + len.toInt
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || colorType != 2 || interlace != 0) return None
    val rowBytes = w * 3
    val rawLen = (rowBytes + 1) * h
    if (rawLen > (1L << 26)) return None // 64 MB raw cap against hostile headers
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated
        got += n
      }
      if (got < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // de-filter: out[j] recovers from raw with left (a), up (b), up-left
    // (c) neighbors of the RECONSTRUCTED image, per the PNG spec
    val wB = rowBytes.toInt; val hI = h.toInt
    val out = new Array[Byte](wB * hI)
    var r = 0
    while (r < hI) {
      val f = raw(r * (wB + 1)) & 0xFF
      val src = r * (wB + 1) + 1
      val dst = r * wB
      var j = 0
      while (j < wB) {
        val x = raw(src + j) & 0xFF
        val a = if (j >= 3) out(dst + j - 3) & 0xFF else 0
        val b = if (r > 0) out(dst - wB + j) & 0xFF else 0
        val c = if (r > 0 && j >= 3) out(dst - wB + j - 3) & 0xFF else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None // undefined filter type
        }
        out(dst + j) = (v & 0xFF).toByte
        j += 1
      }
      r += 1
    }
    Some(PngRgb(w.toInt, hI, 8, out))
  }

  /** PNG stats over asset batches through the real decoder — the
    * distributed face of [[decodePngRgb]], same mapPartitions shape as
    * [[extractWavFeatures]]: per-channel means over the first `maxPixels`
    * pixels; structurally invalid payloads keep their row with valid = 0
    * and null means (counted, not dropped).
    */
  def pngPixelStats(assets: DataFrame, idCol: String = "asset_id",
                    payloadCol: String = "payload",
                    maxPixels: Int = 64): DataFrame = {
    require(maxPixels > 0, "maxPixels must be positive")
    val idIdx = assets.schema.fieldIndex(idCol)
    val pIdx  = assets.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      StructField(idCol, assets.schema(idIdx).dataType, nullable = false),
      StructField("valid", IntegerType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    assets.mapPartitions { rows =>
      rows.map { r =>
        decodePngRgb(r.getAs[Array[Byte]](pIdx)) match {
          case Some(png) =>
            val nPixels = png.width.toLong * png.height
            val n = math.min(nPixels, maxPixels.toLong).toInt
            var sr = 0L; var sg = 0L; var sb = 0L
            var k = 0
            while (k < n) {
              sr += png.pixels(3 * k) & 0xFF
              sg += png.pixels(3 * k + 1) & 0xFF
              sb += png.pixels(3 * k + 2) & 0xFF
              k += 1
            }
            def mean(s: Long): Double = BigDecimal(s.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            Row(r.get(idIdx), 1, png.width.toLong, png.height.toLong, nPixels,
              mean(sr), mean(sg), mean(sb))
          case None => Row(r.get(idIdx), 0, 0L, 0L, 0L, null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic, VALID 8-bit RGB PNG whose DECODED pixels are exactly
    * the md5 stream of (text || "p" || blockIdx): the encoder FILTERS the
    * stream — row r uses filter type r % 5, so all five PNG filters are
    * exercised — deflates it with the JDK `Deflater` (a real zlib
    * stream), and frames signature/IHDR/IDAT/IEND with real CRC32s. The
    * zlib stream is split across TWO IDAT chunks (the normal PNG shape —
    * a decoder that doesn't concatenate fails). Any standard PNG reader
    * accepts the output; MultimodalSpec cross-checks against the JDK's
    * own ImageIO so encoder and decoder cannot share a filter bug.
    *
    * Because decode inverts the filtering back to the md5 stream, the m7
    * oracle derives the expected channel means DIRECTLY from md5 hex —
    * no inflate needed SQL-side.
    */
  def synthPngBytes(text: String, width: Int = 5, height: Int = 5): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val need = width * height * 3
    val pix = new Array[Byte](need)
    var filled = 0; var blk = 0
    while (filled < need) {
      // digest bytes == the byte pairs of SQL md5()'s hex — the oracle
      // re-derives this stream from md5(text || 'p' || blk) directly
      val dig = md.digest((text + "p" + blk).getBytes("UTF-8"))
      val n = math.min(16, need - filled)
      System.arraycopy(dig, 0, pix, filled, n)
      filled += n; blk += 1
    }
    val wB = width * 3
    val raw = new Array[Byte]((wB + 1) * height)
    var r = 0
    while (r < height) {
      val f = r % 5
      raw(r * (wB + 1)) = f.toByte
      var j = 0
      while (j < wB) {
        val cur = pix(r * wB + j) & 0xFF
        val a = if (j >= 3) pix(r * wB + j - 3) & 0xFF else 0
        val b = if (r > 0) pix((r - 1) * wB + j) & 0xFF else 0
        val c = if (r > 0 && j >= 3) pix((r - 1) * wB + j - 3) & 0xFF else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case _ =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(r * (wB + 1) + 1 + j) = (v & 0xFF).toByte
        j += 1
      }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def be(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue))
    }
    chunk("IHDR", be(width) ++ be(height) ++ Array[Byte](8, 2, 0, 0, 0))
    val cb = comp.toByteArray
    chunk("IDAT", cb.take(cb.length / 2))
    chunk("IDAT", cb.drop(cb.length / 2))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** [[synthPngBytes]] as a column generator — the PNG analogue of
    * [[synthWav]]/[[synthBmp]]: (id, payload) rows through mapPartitions
    * (the builder needs Deflater/CRC32, not expressible as column exprs).
    */
  def synthPng(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx  = df.schema.fieldIndex(textCol)
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idIdx).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    df.mapPartitions { rows =>
      rows.map(r => Row(r.get(idIdx), synthPngBytes(r.getString(tIdx))))
    }(Encoders.row(outSchema))
  }

  /** Feature extraction over asset batches: mapPartitions so the (stubbed)
    * decoder is initialized once per partition and rows stream through —
    * the Scala analogue of a Pandas UDF over mapInPandas, same batch shape.
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    val outSchema = StructType(assets.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { rows =>
      // per-partition decoder init would happen here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ decodeStub(payload).toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
