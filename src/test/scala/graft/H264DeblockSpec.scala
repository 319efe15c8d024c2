package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** In-loop deblocking filter (8.7): threshold-table structure, filter
  * activation on blocky content, flat-content neutrality, and — the
  * load-bearing check — plane-exact encoder/decoder parity across a
  * GOP whose REFERENCES are filtered pictures (the filter sits inside
  * the prediction loop, so any divergence compounds and the parity
  * assert catches it at the first frame). */
class H264DeblockSpec extends AnyFunSuite {

  // deterministic busy content: per-8x8-tile DC levels with noise —
  // coarse quantization leaves visible block edges for the filter
  private def busy(w: Int, h: Int, seed: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    var s = seed.toLong * 0x9E3779B97F4A7C15L + 1
    def nxt(): Int = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & 0x7fffffff).toInt }
    val tiles = Array.fill((w / 8 + 1) * (h / 8 + 1))(nxt() % 200 + 28)
    for (y <- 0 until h; x <- 0 until w) {
      val base = tiles((y / 8) * (w / 8 + 1) + x / 8)
      val o = (y * w + x) * 3
      rgb(o) = clip(base + (x * 7 + y * 3) % 11)
      rgb(o + 1) = clip(base / 2 + (x * 3 + y * 5) % 13)
      rgb(o + 2) = clip(255 - base + (x + y) % 7)
    }
    MediaCodecs.Bmp(w, h, rgb)
  }

  private def clip(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  private def shifted(src: MediaCodecs.Bmp, dx: Int, dy: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](src.width * src.height * 3)
    for (y <- 0 until src.height; x <- 0 until src.width) {
      val sx = math.max(0, math.min(src.width - 1, x - dx))
      val sy = math.max(0, math.min(src.height - 1, y - dy))
      System.arraycopy(src.rgb, (sy * src.width + sx) * 3, rgb, (y * src.width + x) * 3, 3)
    }
    MediaCodecs.Bmp(src.width, src.height, rgb)
  }

  private def eq3(a: (Array[Byte], Array[Byte], Array[Byte]),
      b: (Array[Byte], Array[Byte], Array[Byte])): Boolean =
    java.util.Arrays.equals(a._1, b._1) && java.util.Arrays.equals(a._2, b._2) &&
      java.util.Arrays.equals(a._3, b._3)

  test("Table 8-16 / 8-17 structure: zero below 16, monotone, spec anchors") {
    val a = H264Codec.DeblockAlpha; val b = H264Codec.DeblockBeta
    val t = H264Codec.DeblockTc0
    assert(a.length == 52 && b.length == 52 && t.length == 52)
    (0 until 16).foreach { i =>
      assert(a(i) == 0 && b(i) == 0 && t(i).forall(_ == 0), s"idx $i")
    }
    (1 until 52).foreach { i =>
      assert(a(i) >= a(i - 1) && b(i) >= b(i - 1), s"monotone at $i")
      (0 until 3).foreach(k => assert(t(i)(k) >= t(i - 1)(k), s"tc0 at $i"))
    }
    (16 until 52).foreach { i =>
      assert(t(i)(0) <= t(i)(1) && t(i)(1) <= t(i)(2), s"tc0 bS order at $i")
    }
    // spec anchors (Table 8-16/8-17)
    assert(a(16) == 4 && a(26) == 15 && a(36) == 50 && a(51) == 255)
    assert(b(16) == 2 && b(26) == 6 && b(36) == 11 && b(51) == 18)
    assert(t(17).sameElements(Array(0, 0, 1)))
    assert(t(31).sameElements(Array(1, 2, 3)))
    assert(t(51).sameElements(Array(14, 19, 25)))
  }

  test("deblocked GOP: decode equals encoder reconstruction; filter demonstrably fires") {
    val f0 = busy(48, 32, seed = 3)
    val frames = Seq(f0, shifted(f0, 2, 1), shifted(f0, 4, 2), shifted(f0, 5, 3))
    // coarse qp -> visible block edges -> the filter must modify pixels
    val (on, reconOn) = H264Codec.encodeGopForTest(frames, qp = 36, deblock = true)
    val (off, reconOff) = H264Codec.encodeGopForTest(frames, qp = 36)
    val g = new H264Codec.GopDecoder
    on.zip(reconOn).zipWithIndex.foreach { case ((p, r), i) =>
      val dec = g.decodeAuYuv(p)
      assert(dec.isDefined, s"frame $i failed to decode")
      assert(eq3((dec.get._2, dec.get._3, dec.get._4), r),
        s"frame $i: decode != encoder reconstruction (filter divergence)")
    }
    // the filter changed the IDR's reconstruction (blocky content at
    // coarse qp always has bS>=3 MB edges above threshold)
    assert(!java.util.Arrays.equals(reconOn.head._1, reconOff.head._1),
      "deblocking changed nothing on blocky content — filter inert?")
    // ... and the P references being filtered means the whole chain
    // differs; both chains decode to their own encoder's reconstruction
    val g2 = new H264Codec.GopDecoder
    off.zip(reconOff).foreach { case (p, r) =>
      val dec = g2.decodeAuYuv(p)
      assert(dec.isDefined && eq3((dec.get._2, dec.get._3, dec.get._4), r))
    }
  }

  test("deblocking at fine qp on smooth content: parity holds, output stays faithful") {
    val f0 = {
      val w = 48; val h = 32
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        rgb(o) = (x * 255 / (w - 1)).toByte
        rgb(o + 1) = (y * 255 / (h - 1)).toByte
        rgb(o + 2) = ((x + y) * 255 / (w + h - 2)).toByte
      }
      MediaCodecs.Bmp(w, h, rgb)
    }
    val frames = Seq(f0, shifted(f0, 2, 0), shifted(f0, 3, 1))
    val (payloads, recon) = H264Codec.encodeGopForTest(frames, qp = 24, deblock = true)
    val g = new H264Codec.GopDecoder
    payloads.zip(recon).zipWithIndex.foreach { case ((p, r), i) =>
      val dec = g.decodeAuYuv(p)
      assert(dec.isDefined && eq3((dec.get._2, dec.get._3, dec.get._4), r), s"frame $i")
    }
    val rgbs = H264Codec.decodeGop(payloads)
    frames.zip(rgbs).foreach { case (src, Some(back)) =>
      val mad = src.rgb.iterator.zip(back.rgb.iterator)
        .map { case (p, q) => math.abs((p & 0xff) - (q & 0xff)) }
        .sum.toDouble / src.rgb.length
      assert(mad < 8.0, s"mad $mad")
    }
  }

  test("flat content: the filter is a no-op (|p0-q0| = 0 edges never qualify... they do, but change nothing)") {
    val flat = MediaCodecs.Bmp(32, 32, Array.fill[Byte](32 * 32 * 3)(100))
    val frames = Seq(flat, flat)
    val on = H264Codec.encodeGop(frames, qp = 26, deblock = true)
    val off = H264Codec.encodeGop(frames, qp = 26)
    val dOn = H264Codec.decodeGop(on).map(_.get.rgb)
    val dOff = H264Codec.decodeGop(off).map(_.get.rgb)
    dOn.zip(dOff).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "filter altered flat content")
    }
  }

  test("the x264-default shape composes: ref=3 + deblocking + mixed intra, parity holds") {
    // the combination a real x264-baseline-defaults stream carries —
    // multi-reference selection, the in-loop filter inside the
    // prediction loop, and intra refresh MBs inside P slices — all at
    // once, pinned plane-exact (each feature's spec covers it alone;
    // this covers their interactions: filtered DPB entries under
    // ref_idx selection, intra MBs' bS-4 edges inside P frames)
    val f0 = busy(48, 32, seed = 21)
    val frames = (0 until 6).map(i => shifted(f0, 2 * i, i))
    val (payloads, recon) = H264Codec.encodeGopForTest(frames, qp = 30,
      refFrames = 3, forcedRefIdx = Some((mx, my) => (mx + my) % 3),
      intraEvery = 5, deblock = true)
    val g = new H264Codec.GopDecoder
    payloads.zip(recon).zipWithIndex.foreach { case ((p, r), i) =>
      val dec = g.decodeAuYuv(p)
      assert(dec.isDefined, s"frame $i failed to decode")
      assert(eq3((dec.get._2, dec.get._3, dec.get._4), r),
        s"frame $i: decode != encoder reconstruction")
    }
  }

  test("randomized parity sweep: content x qp grid keeps encode/decode exact") {
    // the filter has many data-dependent branches (strong vs clipped,
    // ap/aq taps, chroma vs luma, offsets of the qp average) — a seeded
    // sweep across content and the qp range catches a divergence in any
    // rarely-taken branch that the single-fixture tests might miss
    for (seed <- 1 to 6; qp <- Seq(20, 28, 36, 44, 51)) {
      val f0 = busy(32, 32, seed = seed * 131)
      val frames = Seq(f0, shifted(f0, seed % 5 - 2, seed % 3))
      val (payloads, recon) =
        H264Codec.encodeGopForTest(frames, qp = qp, deblock = true)
      val g = new H264Codec.GopDecoder
      payloads.zip(recon).zipWithIndex.foreach { case ((p, r), i) =>
        val dec = g.decodeAuYuv(p)
        assert(dec.isDefined, s"seed $seed qp $qp frame $i")
        assert(eq3((dec.get._2, dec.get._3, dec.get._4), r),
          s"seed $seed qp $qp frame $i: parity broke")
      }
    }
  }

  test("hostile: truncated/flipped deblocked streams never escape") {
    val f0 = busy(32, 32, seed = 9)
    val frames = Seq(f0, shifted(f0, 1, 1))
    val payloads = H264Codec.encodeGop(frames, qp = 30, deblock = true)
    for (cut <- Seq(1, 7, 33, 101)) {
      val t = payloads(1).take(math.max(0, payloads(1).length - cut))
      H264Codec.decodeGop(Seq(payloads(0), t)) // no throw
    }
    for (pos <- 0 until payloads(1).length by 29) {
      val bad = payloads(1).clone(); bad(pos) = (bad(pos) ^ 0x5a).toByte
      H264Codec.decodeGop(Seq(payloads(0), bad)) // no throw
    }
  }
}
