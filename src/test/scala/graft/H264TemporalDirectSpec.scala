package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Temporal direct mode (r13, 8.4.1.2.3): direct/skip B macroblocks
  * derive motion from the COLOCATED block of list1's first picture,
  * scaled by POC distances — JM's default direct mode, previously a
  * loud refusal. Witnessed by encoder-reconstruction plane parity
  * (the encoder derives direct candidates through the decoder's own
  * temporalDirectQuads), the static-content skip behavior, and
  * composition with implicit weighted biprediction (both POC-math
  * paths at once). */
class H264TemporalDirectSpec extends AnyFunSuite {

  private def movingSquare(w: Int, h: Int, t: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val bg = (x * 150) / math.max(1, w - 1) + (y * 80) / math.max(1, h - 1)
        val sx = 6 + t * 2
        val v = if (x >= sx && x < sx + 12 && y >= 10 && y < 22) 250 else bg
        rgb(o) = v.toByte
        rgb(o + 1) = ((v + 30) % 256).toByte
        rgb(o + 2) = ((v + 60) % 256).toByte
        x += 1
      }
      y += 1
    }
    MediaCodecs.Bmp(w, h, rgb)
  }

  private def decodeChain(payloads: Seq[Array[Byte]])
      : Seq[(Array[Byte], Array[Byte], Array[Byte])] = {
    val g = new H264Codec.GopDecoder
    payloads.map { p =>
      val d = g.decodeAuYuv(p)
      assert(d.isDefined, "decode failed")
      (d.get._2, d.get._3, d.get._4)
    }
  }

  private def assertParity(pv: Seq[Array[Byte]],
      recon: Seq[(Array[Byte], Array[Byte], Array[Byte])], tag: String): Unit =
    decodeChain(pv).zip(recon).zipWithIndex.foreach {
      case (((y, cb, cr), (ey, ecb, ecr)), i) =>
        assert(java.util.Arrays.equals(y, ey) && java.util.Arrays.equals(cb, ecb) &&
          java.util.Arrays.equals(cr, ecr), s"plane parity failed at frame $i ($tag)")
    }

  test("temporal-direct IbbP GOPs: plane parity across shapes") {
    val frames = (0 until 7).map(t => movingSquare(64, 48, t))
    for (bFrames <- Seq(1, 2); deblock <- Seq(false, true)) {
      val (pv, _, recon) = H264Codec.encodeGopBForTest(frames, qp = 26,
        bFrames = bFrames, deblock = deblock, directTemporal = true)
      assertParity(pv, recon, s"temporal bFrames=$bFrames deblock=$deblock")
    }
  }

  test("temporal direct under CABAC entropy") {
    val frames = (0 until 5).map(t => movingSquare(48, 32, t))
    val (pv, _, recon) = H264Codec.encodeGopBForTest(frames, qp = 26,
      cabac = true, directTemporal = true)
    assertParity(pv, recon, "temporal cabac")
  }

  test("static content: temporal direct skips like spatial (zero-bit Bs)") {
    val still = movingSquare(64, 48, 3)
    val frames = Seq.fill(5)(still)
    val (pv, display, recon) = H264Codec.encodeGopBForTest(frames, qp = 26,
      directTemporal = true)
    assertParity(pv, recon, "temporal static")
    val bSizes = pv.zipWithIndex.collect {
      case (p, i) if i > 0 && display(i) % 2 == 1 => p.length
    }
    assert(bSizes.nonEmpty)
    // static: colocated P blocks skip with zero MVs -> temporal direct
    // derives zero motion at the mapped reference -> residual vanishes
    bSizes.foreach(sz => assert(sz < 80, s"static temporal B payload $sz B"))
  }

  test("temporal direct composes with implicit weighted biprediction") {
    val frames = (0 until 7).map(t => movingSquare(64, 48, t))
    val (pv, _, recon) = H264Codec.encodeGopBForTest(frames, qp = 26,
      bFrames = 2, weightedBipred = 2, directTemporal = true)
    assertParity(pv, recon, "temporal + implicit wp")
  }

  test("hostile: tampered temporal-direct streams reject, never throw") {
    val frames = (0 until 5).map(t => movingSquare(48, 32, t))
    val (pv, _) = H264Codec.encodeGopB(frames, qp = 26, directTemporal = true)
    assert(H264Codec.decodeGop(pv).forall(_.isDefined))
    var n = 0
    pv.tail.foreach { p =>
      var i = p.length / 2
      while (i < p.length && n < 40) {
        val bad = pv.map(_.clone())
        bad(pv.indexOf(p))(i) = (bad(pv.indexOf(p))(i) ^ 0x66).toByte
        H264Codec.decodeGop(bad)
        n += 1
        i += 6
      }
    }
    assert(n > 15)
  }
}
