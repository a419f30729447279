package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The FLAC fixed-prediction decoder against its synth encoder — round
  * trips across every subframe order and the decoder-path knobs
  * (partitioned Rice, escape coding, wasted bits), CRC rejection, and an
  * independent known-answer derivation of the md5 fixture stream.
  */
class FlacSpec extends AnyFunSuite {

  private val voice = Array.tabulate(32)(i =>
    (math.sin(i * 0.7) * 12000).toInt + (if (i % 5 == 0) 301 else -77))

  test("round trip: fixed predictor orders 0-4 recover samples bit-exactly") {
    (0 to 4).foreach { order =>
      val bytes = Flac.synthFlacBytes(voice, 48000, order)
      val d = Flac.decode(bytes).getOrElse(fail(s"order $order did not decode"))
      assert(d.sampleRate == 48000 && d.channels == 1 && d.bps == 16)
      assert(d.samples(0).toSeq == voice.toSeq, s"order $order samples diverged")
    }
  }

  test("partitioned Rice residuals (order 2, 4 partitions) round trip") {
    val bytes = Flac.synthFlacBytes(voice, 16000, order = 2, partOrder = 2)
    assert(Flac.decode(bytes).get.samples(0).toSeq == voice.toSeq)
  }

  test("escape-coded (verbatim-residual) partitions round trip") {
    val small = Array.tabulate(32)(i => (i % 7) - 3) // residuals fit 8 raw bits
    val bytes = Flac.synthFlacBytes(small, 8000, order = 1, escapeBits = Some(8))
    assert(Flac.decode(bytes).get.samples(0).toSeq == small.toSeq)
  }

  test("LPC subframes: in-stream quantized coefficients round trip bit-exactly") {
    // coefficients ship in the stream (precision + shift + signed coeffs),
    // so ANY integer set is lossless — the residual carries the error
    Seq(
      (Array(3, -1), 4, 1),          // (3·s₁ − s₂) >> 1
      (Array(2), 3, 0),              // pure 2× previous
      (Array(5, -4, 1, 2, -1), 5, 2) // order 5, negative coeffs, shift 2
    ).foreach { case (coefs, prec, shift) =>
      val bytes = Flac.synthFlacBytes(voice, 48000, order = 0,
        lpc = Some((coefs, prec, shift)))
      val d = Flac.decode(bytes).getOrElse(fail(s"lpc ${coefs.toSeq} did not decode"))
      assert(d.samples(0).toSeq == voice.toSeq, s"lpc ${coefs.toSeq} diverged")
    }
  }

  test("wasted-bits subframes shift back up") {
    val s = Array.tabulate(32)(i => ((i * 37) % 100 - 50) * 4) // all ×4
    val bytes = Flac.synthFlacBytes(s, 32000, order = 1, wastedBits = 2)
    assert(Flac.decode(bytes).get.samples(0).toSeq == s.toSeq)
  }

  test("corrupting the frame-header CRC-8 or the frame CRC-16 rejects the stream") {
    val bytes = Flac.synthFlacBytes(voice, 48000, order = 2)
    // header CRC byte sits right after the 6-byte frame header, which
    // starts after magic(4) + block header(4) + STREAMINFO(34) = 42
    val h = bytes.clone; h(42 + 6) = (h(42 + 6) ^ 0x5A).toByte
    assert(Flac.decode(h).isEmpty, "CRC-8 mismatch must reject")
    val t = bytes.clone; t(t.length - 1) = (t(t.length - 1) ^ 0x01).toByte
    assert(Flac.decode(t).isEmpty, "CRC-16 mismatch must reject")
    // flipping payload bits with CRC left stale must also reject
    val m = bytes.clone; m(50) = (m(50) ^ 0x10).toByte
    assert(Flac.decode(m).isEmpty)
  }

  test("truncated / junk payloads return None, never throw") {
    val bytes = Flac.synthFlacBytes(voice, 48000, order = 3)
    (0 until bytes.length by 7).foreach { k =>
      assert(Flac.decode(bytes.take(k)).isEmpty)
    }
    assert(Flac.decode(Array.fill(64)(0x7F.toByte)).isEmpty)
    assert(Flac.decode(null).isEmpty)
  }

  test("known answer: the md5 fixture stream decodes to the nibble formula") {
    // independent derivation of what synthFlac builds for one text — the
    // same arithmetic the m16 SQL oracle runs in DuckDB
    val text = "the quick brown fox"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(i: Int) = Character.digit(hex.charAt(i), 16)
    val expected = Array.tabulate(32)(i => nib(i) * 4096 - 30000)
    val rate = Array(8000, 16000, 32000, 48000)(nib(1) % 4)
    val bytes = Flac.synthFlacBytes(expected, rate, nib(0) % 5)
    val d = Flac.decode(bytes).get
    assert(d.sampleRate == rate)
    assert(d.samples(0).toSeq == expected.toSeq)
  }
}
