package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** REAL compressed-audio → PCM decode — no external codec: a FLAC
  * decoder for the fixed-prediction subset (constant / verbatim / fixed
  * orders 0–4), with full bitstream mechanics: metadata-block walk,
  * STREAMINFO, frame-header parse (blocking strategy, block-size and
  * sample-rate codes, FLAC's extended-UTF-8 frame numbers), CRC-8 header
  * and CRC-16 frame integrity checks, subframe headers with wasted-bits
  * unary, Rice/Golomb residual decoding across partition orders (escape
  * code included), and polynomial predictor reconstruction. This closes
  * the "audio is container-parse only" gap with a codec whose EVERY
  * constant is normative structure derivable from the format spec —
  * prediction coefficients are binomial (1; 1; 2,-1; 3,-3,1; 4,-6,4,-1),
  * entropy coding is parameterized Rice, CRCs are the stated polynomials
  * (x⁸+x²+x+1, x¹⁶+x¹⁵+x²+1).
  *
  * Why FLAC and not MP3 frames→PCM (the remaining honest stub at
  * [[Multimodal.decodeStub]]): MPEG-1 Layer II/III time-domain synthesis
  * requires the ISO 11172-3 TABULATED prototype window (Table B.3, 512
  * coefficients of a designed lowpass filter — not derivable from any
  * formula) and, for Layer III, the Annex-B Huffman code tables. Neither
  * table ships in this container and fabricating them from memory would
  * produce a decoder that only "works" against its own fixtures — the
  * dishonest version of closing the gap. FLAC's fixed-prediction tier is
  * the compressed-audio codec class that IS fully implementable from
  * first principles, and it exercises the same decode machinery a Layer
  * II implementation would (bit reader, entropy decode, predictor state,
  * integrity checks).
  *
  * LPC subframes ARE supported — FLAC ships the quantized predictor
  * coefficients in the stream itself (4-bit precision, 5-bit shift,
  * order×precision signed coeffs; s[i] = res[i] + (Σ coefⱼ·s[i−1−j]) >>
  * shift in 64-bit), so unlike the MPEG tables nothing external is
  * needed.
  *
  * Scope (explicit, like [[Jpeg]]'s baseline-only scope): side-coded
  * stereo returns None (the synth fixtures are mono; decode-only support
  * without fixture coverage would be padding); sample-rate codes 0000
  * (STREAMINFO) and the three end-of-header forms (the tabulated
  * 0001–1011 shortcuts are rejected rather than guessed). Like the other
  * decoders: None on any structural failure, and header-claimed sizes
  * are bounds-checked before allocation.
  */
object Flac {

  final case class Decoded(sampleRate: Int, channels: Int, bps: Int,
                           samples: Array[Array[Int]])

  // ---- CRCs (FLAC frame integrity) -------------------------------------

  /** CRC-8, poly x⁸+x²+x+1 (0x07), init 0 — frame-header checksum. */
  def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — whole-frame checksum. */
  def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit I/O (FLAC is MSB-first) --------------------------------------

  private final class BitReader(data: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def aligned: Boolean = bitPos == 0
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def bit(): Int = {
      if (bytePos >= data.length) throw new ArrayIndexOutOfBoundsException("bits exhausted")
      val v = (data(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    def bits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(n: Int): Int = {
      val v = bits(n)
      // sign-extend an n-bit two's-complement value
      if (n > 0 && (v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt else v.toInt
    }
    /** FLAC unary: q zero-bits terminated by a one-bit → q. */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) { q += 1; if (q > (1 << 24)) throw new IllegalStateException("runaway unary") }
      q
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (nBits != 0) bit(0)
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  // ---- encoder (fixture synthesis: the exact inverse of the decoder) ----

  /** Fixed-predictor residuals of the given order (0 = the samples). */
  private[operators] def fixedResiduals(s: Array[Int], order: Int): Array[Int] = {
    val n = s.length
    val r = new Array[Int](n - order)
    var i = order
    while (i < n) {
      r(i - order) = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      i += 1
    }
    r
  }

  /** LPC residuals for in-stream quantized coefficients: res[i] = s[i] −
    * ((Σ coefⱼ·s[i−1−j]) >> shift) — the exact inverse of the decoder's
    * reconstruction, so any integer coefficient set is lossless.
    */
  private[operators] def lpcResiduals(s: Array[Int], coefs: Array[Int], shift: Int): Array[Int] = {
    val order = coefs.length
    val r = new Array[Int](s.length - order)
    var i = order
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
      r(i - order) = s(i) - (acc >> shift).toInt
      i += 1
    }
    r
  }

  /** One-frame mono 16-bps FLAC stream: fLaC magic, STREAMINFO, a single
    * fixed-blocksize frame with one fixed-prediction subframe. Lossless by
    * construction, so the decoder must return `samples` bit-exactly.
    * `partOrder`/`wastedBits`/`escapeBits`/`lpc` exist so the spec can
    * drive the decoder's partitioned-Rice, wasted-bits, escape, and
    * LPC-subframe paths with real streams (lpc = (coeffs, precision,
    * shift) replaces the fixed predictor; any integer coefficients are
    * lossless since the residual carries the error); the corpus fixtures
    * use the defaults.
    */
  def synthFlacBytes(samples: Array[Int], sampleRate: Int, order: Int,
                     partOrder: Int = 0, wastedBits: Int = 0,
                     escapeBits: Option[Int] = None,
                     lpc: Option[(Array[Int], Int, Int)] = None): Array[Byte] = {
    require(order >= 0 && order <= 4 && samples.length > order)
    val n = samples.length
    // the synthesizer always emits the 8-bit end-of-header block-size
    // code (0x6), whose payload is (n−1) in ONE byte — more samples
    // would truncate silently and decode to None with no hint why
    require(n <= 256, s"synthFlacBytes emits the 8-bit block-size code: n ≤ 256, got $n")
    require(n % (1 << partOrder) == 0 && (n >> partOrder) >= order)
    lpc.foreach { case (coefs, prec, shift) =>
      require(coefs.nonEmpty && coefs.length <= 32 && prec >= 1 && prec <= 15 &&
        shift >= 0 && shift <= 15 && samples.length > coefs.length)
    }
    require(wastedBits >= 0 &&
      samples.forall(s => wastedBits == 0 || (s % (1 << wastedBits)) == 0))
    val bps = 16
    val effBps = bps - wastedBits
    val shifted = samples.map(_ >> wastedBits)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-block flag + type 0, length 34
    val si = new BitWriter
    si.bits(n.toLong, 16); si.bits(n.toLong, 16)  // min/max blocksize
    si.bits(0L, 24); si.bits(0L, 24)              // min/max framesize: unknown
    si.bits(sampleRate.toLong, 20)
    si.bits(0L, 3)                                // channels - 1
    si.bits((bps - 1).toLong, 5)
    si.bits(n.toLong, 36)                         // total samples
    val siBytes = si.toBytes ++ new Array[Byte](16) // md5: 0 = unknown
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes)

    // frame header: 14+1+1+4+4+4+3+1+8+8 = 48 bits — byte-aligned
    val fw = new BitWriter
    fw.bits(0x3FFEL, 14)  // sync
    fw.bit(0)             // reserved
    fw.bit(0)             // blocking strategy: fixed (frame number)
    fw.bits(0x6L, 4)      // block size: 8-bit (n-1) at end of header
    fw.bits(0x0L, 4)      // sample rate: from STREAMINFO
    fw.bits(0x0L, 4)      // channel assignment: 1 channel
    fw.bits(0x4L, 3)      // sample size: 16 bps
    fw.bit(0)             // reserved
    fw.bits(0L, 8)        // frame number 0 (UTF-8 single byte)
    fw.bits((n - 1).toLong, 8)
    val headerNoCrc = fw.toBytes
    val h8 = crc8(headerNoCrc, 0, headerNoCrc.length)

    val predOrder = lpc.map(_._1.length).getOrElse(order)
    val body = new BitWriter
    // subframe header: pad 0, type (fixed 001000+order | lpc 1xxxxx), wasted-bits
    body.bit(0)
    lpc match {
      case Some((coefs, _, _)) => body.bits((0x20 + (coefs.length - 1)).toLong, 6)
      case None                => body.bits((0x08 + order).toLong, 6)
    }
    if (wastedBits == 0) body.bit(0)
    else { // flag 1, then (k-1) in unary: k-1 zeros terminated by a one
      body.bit(1)
      var w = 0
      while (w < wastedBits - 1) { body.bit(0); w += 1 }
      body.bit(1)
    }
    var i = 0
    while (i < predOrder) { body.bits(shifted(i).toLong & ((1L << effBps) - 1), effBps); i += 1 }
    lpc.foreach { case (coefs, prec, shift) =>
      body.bits((prec - 1).toLong, 4)
      body.bits(shift.toLong, 5)
      coefs.foreach(c => body.bits(c.toLong & ((1L << prec) - 1), prec))
    }
    val res = lpc match {
      case Some((coefs, _, shift)) => lpcResiduals(shifted, coefs, shift)
      case None                    => fixedResiduals(shifted, order)
    }
    // Rice parameter: smallest p with every quotient < 48 (keeps unary
    // runs short; any p is decodable, this is just fixture economy)
    val maxU = res.foldLeft(0L)((m, r) => math.max(m, (r.toLong << 1) ^ (r.toLong >> 63)))
    var p = 0
    while (p < 14 && (maxU >> p) >= 48) p += 1
    body.bits(0L, 2)               // residual method: Rice, 4-bit params
    body.bits(partOrder.toLong, 4)
    val nParts = 1 << partOrder
    var part = 0
    var idx = 0
    while (part < nParts) {
      val count = (n >> partOrder) - (if (part == 0) predOrder else 0)
      escapeBits match {
        case Some(raw) =>
          body.bits(0xFL, 4)       // escape: raw `raw`-bit residuals follow
          body.bits(raw.toLong, 5)
          var j = 0
          while (j < count) {
            if (raw > 0) body.bits(res(idx).toLong & ((1L << raw) - 1), raw)
            idx += 1; j += 1
          }
        case None =>
          body.bits(p.toLong, 4)
          var j = 0
          while (j < count) {
            val u = (res(idx).toLong << 1) ^ (res(idx).toLong >> 63) // zigzag fold
            val q = (u >> p).toInt
            var z = 0
            while (z < q) { body.bit(0); z += 1 }
            body.bit(1)
            body.bits(u & ((1L << p) - 1), p)
            idx += 1; j += 1
          }
      }
      part += 1
    }
    val frame = headerNoCrc ++ Array(h8.toByte) ++ body.toBytes
    val f16 = crc16(frame, 0, frame.length)
    out.write(frame)
    out.write((f16 >> 8) & 0xFF); out.write(f16 & 0xFF)
    out.toByteArray
  }

  // ---- decoder -----------------------------------------------------------

  private val MaxBlock = 1 << 16 // spec maximum block size

  /** Decode the first frame of a FLAC stream (this library's asset
    * fixtures are single-frame; a multi-frame walk is the same loop).
    * None on: bad magic, unsupported subframe/stereo/sample-rate form,
    * CRC mismatch, or any structural overrun.
    */
  def decode(payload: Array[Byte]): Option[Decoded] = {
    try {
      if (payload == null || payload.length < 42) return None
      if (!(payload(0) == 'f' && payload(1) == 'L' && payload(2) == 'a' && payload(3) == 'C'))
        return None
      // metadata walk
      var pos = 4
      var last = false
      var srInfo = -1; var chInfo = -1; var bpsInfo = -1
      while (!last) {
        if (pos + 4 > payload.length) return None
        val hdr = payload(pos) & 0xFF
        last = (hdr & 0x80) != 0
        val btype = hdr & 0x7F
        val len = ((payload(pos + 1) & 0xFF) << 16) | ((payload(pos + 2) & 0xFF) << 8) |
          (payload(pos + 3) & 0xFF)
        pos += 4
        if (pos + len > payload.length) return None
        if (btype == 0) { // STREAMINFO
          if (len < 34) return None
          val br = new BitReader(payload, pos)
          br.bits(16); br.bits(16); br.bits(24); br.bits(24)
          srInfo  = br.bits(20).toInt
          chInfo  = br.bits(3).toInt + 1
          bpsInfo = br.bits(5).toInt + 1
        }
        pos += len
      }
      if (srInfo <= 0) return None

      // ---- frame header ----
      val frameStart = pos
      val br = new BitReader(payload, pos)
      if (br.bits(14) != 0x3FFE) return None
      if (br.bit() != 0) return None
      br.bit(): Unit // blocking strategy (frame vs sample number — both UTF-8 below)
      val bsCode = br.bits(4).toInt
      val srCode = br.bits(4).toInt
      val chCode = br.bits(4).toInt
      val ssCode = br.bits(3).toInt
      if (br.bit() != 0) return None
      // FLAC's extended UTF-8 coded frame/sample number
      val first = br.bits(8).toInt
      if (first >= 0x80) {
        var cont = 0
        var mask = 0x40
        while ((first & mask) != 0) { cont += 1; mask >>= 1 }
        if (cont == 0 || cont > 6) return None
        var i = 0
        while (i < cont) { if ((br.bits(8).toInt & 0xC0) != 0x80) return None; i += 1 }
      }
      val blockSize = bsCode match {
        case 0x1 => 192
        case c if c >= 0x2 && c <= 0x5 => 576 << (c - 2)
        case 0x6 => br.bits(8).toInt + 1
        case 0x7 => br.bits(16).toInt + 1
        case c if c >= 0x8 => 256 << (c - 8)
        case _ => return None // 0000 reserved
      }
      if (blockSize <= 0 || blockSize > MaxBlock) return None
      val sampleRate = srCode match {
        case 0x0 => srInfo
        case 0xC => br.bits(8).toInt * 1000
        case 0xD => br.bits(16).toInt
        case 0xE => br.bits(16).toInt * 10
        case _ => return None // tabulated shortcuts out of scope (see scaladoc)
      }
      val channels = chCode match {
        case c if c <= 0x7 => c + 1
        case _ => return None // side-coded stereo out of scope
      }
      val bps = ssCode match {
        case 0x0 => bpsInfo
        case 0x1 => 8
        case 0x2 => 12
        case 0x4 => 16
        case 0x5 => 20
        case 0x6 => 24
        case _ => return None
      }
      if (bps <= 0 || bps > 32) return None
      // CRC-8 covers the header up to (not including) the CRC byte itself
      if (!br.aligned) return None
      val headerEnd = br.bytePos
      val wantCrc8 = br.bits(8).toInt
      if (crc8(payload, frameStart, headerEnd) != wantCrc8) return None

      // ---- subframes ----
      val out = Array.ofDim[Int](channels, blockSize)
      var ch = 0
      while (ch < channels) {
        if (br.bit() != 0) return None // subframe pad bit
        val stype = br.bits(6).toInt
        val wastedFlag = br.bit()
        val wasted = if (wastedFlag == 1) br.unary() + 1 else 0
        val effBps = bps - wasted
        val s = out(ch)
        stype match {
          case 0 => // constant
            val v = br.signedBits(effBps)
            java.util.Arrays.fill(s, v)
          case 1 => // verbatim
            var i = 0
            while (i < blockSize) { s(i) = br.signedBits(effBps); i += 1 }
          case t if t >= 0x08 && t <= 0x0C => // fixed, order 0-4
            val order = t - 0x08
            if (order > blockSize) return None
            var i = 0
            while (i < order) { s(i) = br.signedBits(effBps); i += 1 }
            if (!readResiduals(br, s, blockSize, order)) return None
            i = order
            while (i < blockSize) {
              s(i) += (order match {
                case 0 => 0
                case 1 => s(i - 1)
                case 2 => 2 * s(i - 1) - s(i - 2)
                case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
                case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
              })
              i += 1
            }
          case t if t >= 0x20 => // LPC, order 1-32 — coefficients in-stream
            val order = (t & 0x1F) + 1
            if (order > blockSize) return None
            var i = 0
            while (i < order) { s(i) = br.signedBits(effBps); i += 1 }
            val precM1 = br.bits(4).toInt
            if (precM1 == 0xF) return None // invalid per spec
            val prec  = precM1 + 1
            val shift = { // 5-bit two's complement; negative is invalid
              val v = br.bits(5).toInt
              if (v >= 16) return None
              v
            }
            val coefs = new Array[Long](order)
            i = 0
            while (i < order) { coefs(i) = br.signedBits(prec).toLong; i += 1 }
            if (!readResiduals(br, s, blockSize, order)) return None
            i = order
            while (i < blockSize) {
              var acc = 0L
              var j = 0
              while (j < order) { acc += coefs(j) * s(i - 1 - j); j += 1 }
              s(i) += (acc >> shift).toInt
              i += 1
            }
          case _ => return None // reserved subframe types
        }
        if (wasted > 0) { var i = 0; while (i < blockSize) { s(i) <<= wasted; i += 1 } }
        ch += 1
      }
      br.align()
      val frameEnd = br.bytePos
      if (frameEnd + 2 > payload.length) return None
      val wantCrc16 = ((payload(frameEnd) & 0xFF) << 8) | (payload(frameEnd + 1) & 0xFF)
      if (crc16(payload, frameStart, frameEnd) != wantCrc16) return None
      Some(Decoded(sampleRate, channels, bps, out))
    } catch {
      case _: ArrayIndexOutOfBoundsException | _: IllegalStateException |
           _: NegativeArraySizeException => None
    }
  }

  /** Rice-coded residual section: 2-bit method (4- or 5-bit parameters),
    * 4-bit partition order, 2^order partitions (first one short by the
    * predictor order), escape parameter = raw n-bit residuals.
    */
  private def readResiduals(br: BitReader, s: Array[Int], blockSize: Int, order: Int): Boolean = {
    val method = br.bits(2).toInt
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val partOrder = br.bits(4).toInt
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) return false
    var idx = order
    var part = 0
    while (part < nParts) {
      val count = (blockSize >> partOrder) - (if (part == 0) order else 0)
      if (count < 0) return false
      val p = br.bits(pBits).toInt
      if (p == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < count) { s(idx) = if (raw == 0) 0 else br.signedBits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = br.unary().toLong
          val u = (q << p) | br.bits(p)
          s(idx) = ((u >> 1) ^ -(u & 1L)).toInt // zigzag unfold
          idx += 1; i += 1
        }
      }
      part += 1
    }
    idx == blockSize
  }

  // ---- distributed faces ---------------------------------------------------

  /** Column generator over (id, text): a single-frame mono 16-bit FLAC
    * whose 32 samples are the md5(text) nibble stream mapped to
    * `nib·4096 − 30000`, sample rate from nib₁ — every field re-derivable
    * by the SQL oracle from the same md5 arithmetic, while the decoder
    * must run the full bitstream path (CRCs, Rice, prediction) to recover
    * them. nib₂ picks the SUBFRAME CODING per doc — fixed order nib₀ mod 5
    * for three quarters of the corpus, an in-stream-coefficient LPC frame
    * ((2,−1) linear extrapolation, shift 0) for the rest — so both
    * predictor families run under the oracle gate, not just in the unit
    * spec; the coding choice is invisible to the oracle because FLAC is
    * lossless: the stats depend only on the samples.
    */
  def synthFlac(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val tIdx  = df.schema.fieldIndex(textCol)
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idIdx).dataType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val hex = md.digest(r.getString(tIdx).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        def nib(i: Int): Int = Character.digit(hex.charAt(i), 16)
        val samples = Array.tabulate(32)(i => nib(i) * 4096 - 30000)
        val rate = Array(8000, 16000, 32000, 48000)(nib(1) % 4)
        val lpc  = if (nib(2) % 4 == 0) Some((Array(2, -1), 3, 0)) else None
        val order = if (lpc.isDefined) 0 else nib(0) % 5
        Row(r.get(idIdx), synthFlacBytes(samples, rate, order, lpc = lpc))
      }
    }(Encoders.row(outSchema))
  }

  /** PCM stats through the real decoder — the distributed face, same
    * mapPartitions shape as the other decode families. Integer-exact
    * stats over channel 0: sum, min, max, and an order-pinning weighted
    * checksum Σ(i+1)·sᵢ — one wrong sample anywhere fails the hash.
    */
  def flacPcmStats(assets: DataFrame, idCol: String = "asset_id",
                   payloadCol: String = "payload",
                   maxSamples: Int = 1 << 16): DataFrame = {
    require(maxSamples > 0, "maxSamples must be positive")
    val idIdx = assets.schema.fieldIndex(idCol)
    val pIdx  = assets.schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      StructField(idCol, assets.schema(idIdx).dataType, nullable = false),
      StructField("valid", IntegerType, nullable = false),
      StructField("sample_rate", LongType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bps", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_pcm", LongType, nullable = true),
      StructField("min_pcm", LongType, nullable = true),
      StructField("max_pcm", LongType, nullable = true),
      StructField("checksum", LongType, nullable = true)))
    assets.mapPartitions { rows =>
      rows.map { r =>
        decode(r.getAs[Array[Byte]](pIdx)) match {
          case Some(d) =>
            val s = d.samples(0)
            val n = math.min(s.length, maxSamples)
            var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var ck = 0L
            var i = 0
            while (i < n) {
              val v = s(i).toLong
              sum += v; ck += (i + 1) * v
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            Row(r.get(idIdx), 1, d.sampleRate.toLong, d.channels, d.bps,
              n.toLong, sum, mn, mx, ck)
          case None =>
            Row(r.get(idIdx), 0, null, null, null, null, null, null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }
}
