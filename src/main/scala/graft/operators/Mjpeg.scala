package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** REAL video decode — MJPEG in AVI, no external codec: the RIFF/AVI
  * container walk every prober performs (chunk sizes, LIST nesting,
  * `avih` geometry/timing, `movi` frame chunks with even-byte padding,
  * `idx1` cross-check) and a full per-frame image decode through the
  * in-repo baseline JPEG decoder ([[Jpeg.decode]] — marker walk, canonical
  * Huffman, dequant, 2-D IDCT). Motion-JPEG is the video codec class
  * whose frames ARE the still codec this library already implements for
  * real, so the remaining "video decode" seam closes with zero invented
  * tables: container structure is pure spec, and the frame tier reuses
  * m9's honestly-decodable machinery.
  *
  * (The other video families — H.26x/VPx/AV1 — need entropy/transform
  * tables and reference-frame machinery far beyond what can be honestly
  * reproduced in this container; they remain out of scope exactly as the
  * MP3 PCM path does, see [[Flac]]'s scaladoc.)
  *
  * Like the other decoders: None on structural failure; header-claimed
  * counts/sizes are bounds-checked before any allocation.
  */
object Mjpeg {

  final case class Avi(usPerFrame: Long, totalFrames: Int, width: Int, height: Int,
                       frames: Seq[Array[Byte]])

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Max frames any header may claim before we refuse (hostile-count
    * valve, same discipline as the MP4 sample walk).
    */
  private val MaxFrames = 1 << 16

  /** Parse an MJPEG AVI: RIFF/'AVI ' validation, top-level chunk walk to
    * LIST hdrl (avih timing/geometry) and LIST movi (00dc/00db frame
    * payloads, even-padded), with an idx1 entry-count cross-check when
    * the index is present.
    */
  def decodeAvi(payload: Array[Byte]): Option[Avi] = {
    try {
      if (payload == null || payload.length < 24) return None
      if (fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ") return None
      // a RIFF size past EOF is a truncated write, not a shorter file
      if (8L + le32(payload, 4) > payload.length) return None
      val riffEnd = 8L + le32(payload, 4)
      var pos = 12L
      var flags = 0L
      var usPerFrame = -1L; var totalFrames = -1; var width = -1; var height = -1
      val frames = Seq.newBuilder[Array[Byte]]
      var idxEntries = -1
      while (pos + 8 <= riffEnd) {
        val cc  = fourcc(payload, pos.toInt)
        val len = le32(payload, pos.toInt + 4)
        val dataStart = pos + 8
        if (dataStart + len > riffEnd) return None
        cc match {
          case "LIST" =>
            if (len < 4) return None
            val listType = fourcc(payload, dataStart.toInt)
            if (listType == "hdrl") {
              // child walk to avih (ignore strl — stream headers carry
              // nothing the frame decode below doesn't re-derive)
              var p = dataStart + 4
              val end = dataStart + len
              while (p + 8 <= end) {
                val ccc  = fourcc(payload, p.toInt)
                val clen = le32(payload, p.toInt + 4)
                if (p + 8 + clen > end) return None
                if (ccc == "avih") {
                  if (clen < 40) return None
                  val o = (p + 8).toInt
                  usPerFrame  = le32(payload, o)
                  flags       = le32(payload, o + 12)
                  totalFrames = le32(payload, o + 16).toInt
                  width       = le32(payload, o + 32).toInt
                  height      = le32(payload, o + 36).toInt
                }
                p += 8 + clen + (clen & 1) // chunks are even-padded
              }
            } else if (listType == "movi") {
              var p = dataStart + 4
              val end = dataStart + len
              var count = 0
              while (p + 8 <= end) {
                val ccc  = fourcc(payload, p.toInt)
                val clen = le32(payload, p.toInt + 4)
                if (p + 8 + clen > end || clen > payload.length) return None
                if (ccc.endsWith("dc") || ccc.endsWith("db")) {
                  count += 1
                  if (count > MaxFrames) return None
                  frames += java.util.Arrays.copyOfRange(
                    payload, (p + 8).toInt, (p + 8 + clen).toInt)
                }
                p += 8 + clen + (clen & 1)
              }
            }
          case "idx1" =>
            if (len % 16 != 0) return None
            idxEntries = (len / 16).toInt
          case _ => () // JUNK etc: skip
        }
        pos += 8 + len + (len & 1)
      }
      val fs = frames.result()
      if (usPerFrame <= 0 || totalFrames < 0 || totalFrames > MaxFrames ||
          fs.isEmpty || fs.length != totalFrames) return None
      // AVIF_HASINDEX promised an idx1; a missing one means the tail of
      // the write is gone (the headers are written before the index)
      if ((flags & 0x10L) != 0 && idxEntries < 0) return None
      if (idxEntries >= 0 && idxEntries != fs.length) return None
      Some(Avi(usPerFrame, totalFrames, width, height, fs))
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
    }
  }

  /** Build a valid MJPEG AVI around pre-encoded JPEG frame payloads. */
  def synthAviBytes(frames: Seq[Array[Byte]], usPerFrame: Long,
                    width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    // avih: 56 bytes
    val avih = Array.fill(14)(0L)
    avih(0) = usPerFrame; avih(3) = 0x10L /* HASINDEX */
    avih(4) = frames.length.toLong; avih(6) = 1L
    avih(8) = width.toLong; avih(9) = height.toLong
    // strh 'vids'/'MJPG': scale=usPerFrame, rate=1000000 → fps exact
    // strf: BITMAPINFOHEADER with biCompression 'MJPG'
    val hdrlLen = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviLen = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val idxLen  = 16 * frames.length
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen) + (8 + idxLen)
    cc("RIFF"); u32(riffLen.toLong); cc("AVI ")
    cc("LIST"); u32(hdrlLen.toLong); cc("hdrl")
    cc("avih"); u32(56L); avih.foreach(u32)
    cc("LIST"); u32((4 + (8 + 56) + (8 + 40)).toLong); cc("strl")
    cc("strh"); u32(56L)
    cc("vids"); cc("MJPG"); u32(0L); u32(0L) // flags, priority+language
    u32(0L)                                   // initial frames
    u32(usPerFrame); u32(1000000L)            // scale, rate
    u32(0L); u32(frames.length.toLong)        // start, length
    u32(0L); u32(0L); u32(0L)                 // sugg buffer, quality, sample size
    u32(0L); u32((width.toLong & 0xFFFF) | ((height.toLong & 0xFFFF) << 16)) // rcFrame
    cc("strf"); u32(40L)
    u32(40L); u32(width.toLong); u32(height.toLong)
    u32(1L | (24L << 16))                     // planes=1, bitcount=24
    cc("MJPG"); u32((width.toLong * height * 3)) // biSizeImage
    u32(0L); u32(0L); u32(0L); u32(0L)        // ppm x/y, clrUsed, clrImportant
    cc("LIST"); u32(moviLen.toLong); cc("movi")
    val offsets = Seq.newBuilder[(Long, Int)]
    var rel = 4L // idx1 offsets point at each chunk's fourcc, movi-data-relative
    frames.foreach { f =>
      offsets += ((rel, f.length))
      cc("00dc"); u32(f.length.toLong); out.write(f)
      if ((f.length & 1) == 1) out.write(0) // even padding
      rel += 8 + f.length + (f.length & 1)
    }
    cc("idx1"); u32(idxLen.toLong)
    offsets.result().foreach { case (off, len) =>
      cc("00dc"); u32(0x10L); u32(off); u32(len.toLong)
    }
    out.toByteArray
  }

  /** Column generator over (id, text): a deterministic MJPEG AVI with
    * `2 + nib₂ mod 3` frames of 16×16 flat-block JPEGs (frame f's four
    * 8×8 levels are bytes 1–4 of md5(text ‖ "vf") — the m9 lossless-
    * subspace construction per frame) at an fps picked by nib₀ — every
    * field re-derivable by the SQL oracle from the same md5 arithmetic.
    */
  def synthMjpegAvi(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx  = df.schema.fieldIndex(textCol)
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idIdx).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val text = r.getString(tIdx)
        val h0 = md.digest((text + "v0").getBytes("UTF-8"))
        def nib(i: Int): Int = (h0(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xF
        val nFrames = 2 + nib(2) % 3
        val us = Array(100000L, 40000L, 33333L, 16666L)(nib(0) % 4)
        val frames = (0 until nFrames).map { f =>
          val dig = md.digest((text + "v" + f).getBytes("UTF-8"))
          Jpeg.synthJpegBytes(Array.tabulate(4)(i => dig(i) & 0xFF), 2, 2)
        }
        Row(r.get(idIdx), synthAviBytes(frames, us, 16, 16))
      }
    }(Encoders.row(outSchema))
  }

  /** Per-frame decode stats through the REAL container walk + JPEG
    * decoder: one row per frame with integer-exact presentation time and
    * gray statistics. Invalid containers keep one row with valid = 0;
    * an undecodable frame inside a valid container yields its row with
    * frame_valid = 0.
    */
  def mjpegFrameStats(assets: DataFrame, idCol: String = "asset_id",
                      payloadCol: String = "payload"): DataFrame = {
    val idIdx = assets.schema.fieldIndex(idCol)
    val pIdx  = assets.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      StructField(idCol, assets.schema(idIdx).dataType, nullable = false),
      StructField("valid", IntegerType, nullable = false),
      StructField("frame_idx", LongType, nullable = true),
      StructField("pts_ms", LongType, nullable = true),
      StructField("frame_valid", IntegerType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("mean_gray", DoubleType, nullable = true),
      StructField("min_gray", IntegerType, nullable = true),
      StructField("max_gray", IntegerType, nullable = true)))
    assets.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAvi(r.getAs[Array[Byte]](pIdx)) match {
          case Some(avi) =>
            avi.frames.zipWithIndex.map { case (fb, i) =>
              val pts = i.toLong * avi.usPerFrame / 1000L
              Jpeg.decode(fb) match {
                case Some(img) =>
                  val n = img.width * img.height
                  var s = 0L; var mn = 255; var mx = 0
                  var p = 0
                  while (p < n) {
                    val g = if (img.components == 1) img.pixels(p) & 0xFF
                            else img.pixels(3 * p + 1) & 0xFF
                    s += g; if (g < mn) mn = g; if (g > mx) mx = g
                    p += 1
                  }
                  val mean = BigDecimal(s.toDouble / n)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  Row(r.get(idIdx), 1, i.toLong, pts, 1,
                    img.width.toLong, img.height.toLong, mean, mn, mx)
                case None =>
                  Row(r.get(idIdx), 1, i.toLong, pts, 0, null, null, null, null, null)
              }
            }
          case None =>
            Seq(Row(r.get(idIdx), 0, null, null, null, null, null, null, null, null))
        }
      }
    }(Encoders.row(outSchema))
  }
}
