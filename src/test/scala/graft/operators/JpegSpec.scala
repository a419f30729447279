package graft.operators

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** The baseline JPEG decoder against the JDK's own codec from BOTH sides:
  * our decoder reads ImageIO-encoded streams (real quant tables, real AC
  * coefficients, optimized Huffman, 4:2:0 color), and ImageIO reads our
  * synth streams — so encoder and decoder cannot share a bug, and the
  * decode path is proven on genuinely lossy real-world streams, not just
  * the DC-exact synth subspace the oracle uses.
  */
class JpegSpec extends AnyFunSuite {

  private def imageIoJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("synth stream decodes to its exact levels; ImageIO agrees on every pixel") {
    val levels = Array(0, 255, 128, 37, 200, 91, 14, 250, 66)
    val bytes = Jpeg.synthJpegBytes(levels, 3, 3)
    val img = Jpeg.decode(bytes).getOrElse(fail("decoder rejected the synth stream"))
    assert((img.width, img.height, img.components) == ((24, 24, 1)))
    for (by <- 0 until 3; bx <- 0 until 3; y <- 0 until 8; x <- 0 until 8) {
      val got = img.pixels((by * 8 + y) * 24 + bx * 8 + x) & 0xFF
      assert(got == levels(by * 3 + bx),
        s"block ($bx,$by) pixel ($x,$y): $got != ${levels(by * 3 + bx)}")
    }
    // the JDK's decoder accepts the stream and sees the same image
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null, "ImageIO rejected the synth JPEG")
    assert((jdk.getWidth, jdk.getHeight) == ((24, 24)))
    for (y <- 0 until 24; x <- 0 until 24) {
      val ours = img.pixels(y * 24 + x) & 0xFF
      val theirs = jdk.getRaster.getSample(x, y, 0)
      assert(ours == theirs, s"pixel ($x,$y): ours $ours vs ImageIO $theirs")
    }
  }

  test("decodes a REAL ImageIO grayscale JPEG (AC coefficients, their tables) within tolerance") {
    val w = 40; val h = 24
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(42)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (96 + 64 * math.sin(x / 3.0) + rnd.nextInt(32)).toInt.min(255).max(0))
    val bytes = imageIoJpeg(img, 0.9f)
    val ours = Jpeg.decode(bytes).getOrElse(fail("decoder rejected an ImageIO JPEG"))
    assert((ours.width, ours.height, ours.components) == ((w, h, 1)))
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((ours.pixels(y * w + x) & 0xFF) - jdk.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    // both decode the SAME lossy stream; small IDCT rounding differences
    // are legal between conformant decoders, structural bugs are not
    assert(maxDiff <= 2, s"decoders diverge by $maxDiff gray levels")
  }

  test("decodes a REAL ImageIO color JPEG (4:2:0 subsampling, YCbCr) within tolerance") {
    // SMOOTH chroma on purpose: 4:2:0 decoders legitimately differ in
    // upsampling interpolation (nearest here vs libjpeg's fancy triangle),
    // which diverges on per-pixel chroma detail but not on gradients —
    // while a real bug (swapped Cb/Cr, mis-walked MCU) diverges wildly on
    // BOTH. The grayscale test above already pins high-frequency content.
    val w = 32; val h = 20
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((60 + x * 3) << 16) | ((80 + y * 4) << 8) | (120 + x + y))
    val bytes = imageIoJpeg(img, 0.95f)
    val ours = Jpeg.decode(bytes).getOrElse(fail("decoder rejected an ImageIO color JPEG"))
    assert((ours.width, ours.height, ours.components) == ((w, h, 3)))
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val theirs = (jdk.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      sumDiff += math.abs((ours.pixels((y * w + x) * 3 + c) & 0xFF) - theirs)
    }
    val avgDiff = sumDiff.toDouble / (w * h * 3)
    // chroma upsampling conventions legitimately differ between decoders
    // (nearest here vs ImageIO's interpolation); the AVERAGE divergence
    // staying tiny proves tables/IDCT/color math are right
    assert(avgDiff <= 3.0, s"decoders diverge by $avgDiff avg per channel")
  }

  test("structural failures are counted, not thrown") {
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode("not a jpeg at all, just text".getBytes).isEmpty)
    val good = Jpeg.synthJpegBytes(Array(10, 20, 30, 40), 2, 2)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty, "truncated stream must fail cleanly")
    // progressive SOF2 is out of scope and must be rejected, not mis-decoded
    val prog = good.clone()
    val sofAt = good.indices.find(i => (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }
}
