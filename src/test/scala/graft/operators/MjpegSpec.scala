package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The MJPEG/AVI walk against its synth: container round trip, even-byte
  * chunk padding, idx1 cross-check, hostile/truncated rejection, and the
  * end-to-end frame decode through the real JPEG decoder.
  */
class MjpegSpec extends AnyFunSuite {

  private def jpegOf(levels: Array[Int]) = Jpeg.synthJpegBytes(levels, 2, 2)

  test("container round trip: frames, timing, and geometry survive") {
    val f0 = jpegOf(Array(10, 20, 30, 40))
    val f1 = jpegOf(Array(200, 150, 100, 50))
    val avi = Mjpeg.synthAviBytes(Seq(f0, f1), 33333L, 16, 16)
    val d = Mjpeg.decodeAvi(avi).getOrElse(fail("valid AVI rejected"))
    assert(d.usPerFrame == 33333L && d.totalFrames == 2)
    assert(d.width == 16 && d.height == 16)
    assert(d.frames(0).toSeq == f0.toSeq && d.frames(1).toSeq == f1.toSeq)
  }

  test("odd-length frame chunks are even-padded and still round trip") {
    val f0 = jpegOf(Array(1, 2, 3, 4))
    val odd = if (f0.length % 2 == 0) f0 :+ 0xD9.toByte else f0 // force odd
    val avi = Mjpeg.synthAviBytes(Seq(odd, f0), 40000L, 16, 16)
    val d = Mjpeg.decodeAvi(avi).get
    assert(d.frames(0).length == odd.length, "padding byte leaked into the frame")
    assert(d.frames(1).toSeq == f0.toSeq)
  }

  test("frames decode through the real JPEG path to their flat-block levels") {
    val levels = Array(17, 99, 254, 3)
    val avi = Mjpeg.synthAviBytes(Seq(jpegOf(levels)), 100000L, 16, 16)
    val img = Jpeg.decode(Mjpeg.decodeAvi(avi).get.frames(0)).get
    assert(img.width == 16 && img.height == 16)
    // each 8x8 block is flat at its level: sample one pixel per block
    assert((img.pixels(0) & 0xFF) == levels(0))          // top-left block
    assert((img.pixels(8) & 0xFF) == levels(1))          // top-right block
    assert((img.pixels(8 * 16) & 0xFF) == levels(2))     // bottom-left block
    assert((img.pixels(8 * 16 + 8) & 0xFF) == levels(3)) // bottom-right block
  }

  test("corrupt containers are rejected, never thrown") {
    val avi = Mjpeg.synthAviBytes(Seq(jpegOf(Array(9, 9, 9, 9))), 40000L, 16, 16)
    val badMagic = avi.clone; badMagic(2) = 'X'.toByte
    assert(Mjpeg.decodeAvi(badMagic).isEmpty)
    (0 until avi.length by 13).foreach(k => assert(Mjpeg.decodeAvi(avi.take(k)).isEmpty))
    assert(Mjpeg.decodeAvi(null).isEmpty)
    // idx1 disagreeing with the movi frame count must reject (truncated-
    // write detection): chop the last idx entry by shrinking idx1's size
    val idxAt = avi.length - (8 + 16) // idx1 is the last chunk: header + 1 entry
    assert(new String(avi, idxAt, 4, "US-ASCII") == "idx1", "fixture layout drifted")
    // an index claiming more bytes than the file holds → bounds rejection
    val overrun = avi.clone
    overrun(idxAt + 4) = 0; overrun(idxAt + 5) = 2 // len 16 → 512
    assert(Mjpeg.decodeAvi(overrun).isEmpty)
    // an index DISAGREEING with the movi frame count (0 entries vs 1
    // frame) → the idx1 cross-check rejects; the stale entry bytes that
    // follow also fail the chunk walk — either path must end in None
    val empty = avi.clone
    empty(idxAt + 4) = 0
    assert(Mjpeg.decodeAvi(empty).isEmpty)
  }

  test("hostile frame-count header is bounded, not allocated") {
    val avi = Mjpeg.synthAviBytes(Seq(jpegOf(Array(5, 5, 5, 5))), 40000L, 16, 16)
    // avih dwTotalFrames sits 16 bytes into the avih payload:
    // RIFF(12) + LIST hdr(8) + 'hdrl'(4) + 'avih'+size(8) + 16
    val off = 12 + 8 + 4 + 8 + 16
    val hostile = avi.clone
    hostile(off) = 0xFF.toByte; hostile(off + 1) = 0xFF.toByte
    hostile(off + 2) = 0xFF.toByte; hostile(off + 3) = 0x7F.toByte
    assert(Mjpeg.decodeAvi(hostile).isEmpty, "claimed 2^31 frames must reject")
  }
}
