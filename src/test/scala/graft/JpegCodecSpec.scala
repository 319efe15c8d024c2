package graft

import graft.pipeline.{JpegCodec, MediaCodecs}
import MediaCodecs.Bmp

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import java.awt.image.BufferedImage

/**
 * Baseline JPEG codec, cross-witnessed against the JDK's INDEPENDENT
 * ImageIO JPEG implementation in both directions: our encoder's output
 * must decode correctly in ImageIO, and ImageIO's output (which uses
 * 4:2:0 chroma subsampling — a different code path than our 4:4:4
 * encoder emits) must decode correctly in our decoder. JPEG is lossy,
 * so comparisons are tolerance-based (quantization + each side's
 * IDCT/upsampling rounding); dimensions and marker structure are exact.
 */
class JpegCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** smooth gradient — low-frequency content JPEG represents well */
  private def gradient(w: Int, h: Int): Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 255) / math.max(1, w - 1)).toByte
      rgb(o + 1) = ((y * 255) / math.max(1, h - 1)).toByte
      rgb(o + 2) = (((x + y) * 255) / math.max(1, w + h - 2)).toByte
    }
    Bmp(w, h, rgb)
  }

  private def meanAbsDiff(a: Bmp, b: Bmp): Double = {
    require(a.width == b.width && a.height == b.height)
    a.rgb.iterator.zip(b.rgb.iterator)
      .map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.sum.toDouble /
      a.rgb.length
  }

  private def toBuffered(img: Bmp): BufferedImage = {
    val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val (r, g, b) = img.pixel(x, y)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    bi
  }

  private def fromBuffered(bi: BufferedImage): Bmp = {
    val rgb = new Array[Byte](bi.getWidth * bi.getHeight * 3)
    for (y <- 0 until bi.getHeight; x <- 0 until bi.getWidth) {
      val p = bi.getRGB(x, y)
      val o = (y * bi.getWidth + x) * 3
      rgb(o) = ((p >> 16) & 0xff).toByte
      rgb(o + 1) = ((p >> 8) & 0xff).toByte
      rgb(o + 2) = (p & 0xff).toByte
    }
    Bmp(bi.getWidth, bi.getHeight, rgb)
  }

  test("encode→decode round-trip: smooth image survives with small error") {
    for ((w, h) <- Seq((16, 16), (17, 9), (8, 8), (24, 31))) {
      val img = gradient(w, h)
      val bytes = JpegCodec.encodeJpeg(img, quality = 90)
      assert(JpegCodec.isJpeg(bytes))
      val back = JpegCodec.decodeJpeg(bytes)
      assert(back.isDefined, s"w=$w h=$h")
      assert(back.get.width == w && back.get.height == h)
      assert(meanAbsDiff(img, back.get) < 4.0, s"w=$w h=$h mad=${meanAbsDiff(img, back.get)}")
    }
  }

  test("cross-witness: ImageIO decodes our encoder's output") {
    val img = gradient(33, 20)
    val bytes = JpegCodec.encodeJpeg(img, quality = 90)
    val bi = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(bi != null, "ImageIO rejected our JFIF stream")
    assert(bi.getWidth == 33 && bi.getHeight == 20)
    // ImageIO's reconstruction of OUR bytes vs our own decode of the same
    // bytes: both implement the same standard; differences are IDCT
    // rounding only
    val ours = JpegCodec.decodeJpeg(bytes).get
    assert(meanAbsDiff(ours, fromBuffered(bi)) < 2.0)
    // and both stay close to the original
    assert(meanAbsDiff(img, fromBuffered(bi)) < 4.0)
  }

  test("cross-witness: our decoder handles ImageIO's 4:2:0 output") {
    val img = gradient(40, 24)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(toBuffered(img), "jpg", bos))
    val bytes = bos.toByteArray
    val ours = JpegCodec.decodeJpeg(bytes)
    assert(ours.isDefined, "our decoder rejected an ImageIO stream")
    assert(ours.get.width == 40 && ours.get.height == 24)
    val theirs = fromBuffered(ImageIO.read(new ByteArrayInputStream(bytes)))
    // 4:2:0 chroma: our box upsampling vs ImageIO's interpolation differ
    // most at chroma edges; a smooth gradient keeps both near the source
    assert(meanAbsDiff(ours.get, theirs) < 6.0,
      s"mad=${meanAbsDiff(ours.get, theirs)}")
    assert(meanAbsDiff(img, ours.get) < 6.0)
  }

  test("grayscale single-component streams decode") {
    val w = 19; val h = 13
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      // write the RAW raster: setRGB on TYPE_BYTE_GRAY would round-trip
      // through sRGB↔linear gamma conversion and store different bytes
      bi.getRaster.setSample(x, y, 0, (x * 10 + y * 7) % 200)
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(bi, "jpg", bos))
    val ours = JpegCodec.decodeJpeg(bos.toByteArray)
    assert(ours.isDefined)
    assert(ours.get.width == w && ours.get.height == h)
    // grayscale: r==g==b everywhere
    assert(ours.get.rgb.grouped(3).forall(px => px(0) == px(1) && px(1) == px(2)))
    // witness on the RAW raster too (same gamma caveat on read)
    val back = ImageIO.read(new ByteArrayInputStream(bos.toByteArray))
    var sum = 0.0
    for (y <- 0 until h; x <- 0 until w)
      sum += math.abs(back.getRaster.getSample(x, y, 0) - ours.get.pixel(x, y)._1)
    assert(sum / (w * h) < 3.0, s"raw-raster mad=${sum / (w * h)}")
  }

  test("restart intervals: RSTn framing decodes to the identical pixels") {
    val img = gradient(48, 16) // 6x2 MCUs at 4:4:4
    val plain = JpegCodec.encodeJpeg(img, quality = 85, restartInterval = 0)
    val rst = JpegCodec.encodeJpeg(img, quality = 85, restartInterval = 2)
    assert(rst.length > plain.length) // DRI + markers present
    val a = JpegCodec.decodeJpeg(plain).get
    val b = JpegCodec.decodeJpeg(rst).get
    // same quantized coefficients, different entropy framing only
    assert(a.rgb.toSeq == b.rgb.toSeq)
    // foreign witness accepts the restart framing too
    val bi = ImageIO.read(new ByteArrayInputStream(rst))
    assert(bi != null && bi.getWidth == 48 && bi.getHeight == 16)
    assert(meanAbsDiff(b, fromBuffered(bi)) < 2.0)
  }

  test("wrong restart-marker index refuses instead of decoding shifted (r7 ADVICE)") {
    val img = gradient(48, 16)
    val rst = JpegCodec.encodeJpeg(img, quality = 85, restartInterval = 2)
    // the first restart marker in scan data is FF D0 (index 0); bump its
    // modulo-8 index — a resync there would shift every following MCU
    val evil = rst.clone()
    val i = (2 until evil.length - 1).find(i =>
      (evil(i) & 0xff) == 0xFF && (evil(i + 1) & 0xff) == 0xD0).get
    evil(i + 1) = 0xD3.toByte
    assert(JpegCodec.decodeJpeg(evil).isEmpty)
  }

  test("hostile inputs return None, never throw") {
    assert(JpegCodec.decodeJpeg(Array.empty[Byte]).isEmpty)
    assert(JpegCodec.decodeJpeg(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    assert(JpegCodec.decodeJpeg("not a jpeg at all".getBytes).isEmpty)
    val valid = JpegCodec.encodeJpeg(gradient(16, 16))
    // truncations at every tenth byte: parse either fails cleanly or
    // yields a (partial) image — never an exception
    (1 until valid.length by 10).foreach { n =>
      JpegCodec.decodeJpeg(java.util.Arrays.copyOf(valid, n))
    }
    // progressive is out of scope and must be refused: flip SOF0→SOF2
    val prog = valid.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xFF && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(JpegCodec.decodeJpeg(prog).isEmpty)
  }

  test("quality knob trades bytes for error monotonically") {
    val img = gradient(32, 32)
    val lo = JpegCodec.encodeJpeg(img, quality = 20)
    val hi = JpegCodec.encodeJpeg(img, quality = 95)
    assert(hi.length > lo.length)
    val eLo = meanAbsDiff(img, JpegCodec.decodeJpeg(lo).get)
    val eHi = meanAbsDiff(img, JpegCodec.decodeJpeg(hi).get)
    assert(eHi < eLo)
  }
}
