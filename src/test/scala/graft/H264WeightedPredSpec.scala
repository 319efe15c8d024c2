package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Weighted prediction (r13, 8.4.2.3): explicit per-reference
  * luma/chroma weights on P slices (the x264 `weightp` shape — emitted
  * by default on fades in the wild), explicit bipred (idc 1) and
  * implicit POC-distance bipred (idc 2) on B slices. Witnessed by
  * encoder-reconstruction plane parity (the encoder reconstructs
  * through the decoder's own weighted-MC kernel), a payload-shrink pin
  * proving the weights genuinely engage on fades, and the centered-B
  * equivalence of implicit weights to the default average. */
class H264WeightedPredSpec extends AnyFunSuite {

  /** Textured frame faded multiplicatively toward black: frame t has
    * ~(1 - 0.12t) of the base luminance — the shape weighted
    * prediction exists for. */
  private def fadeFrame(w: Int, h: Int, t: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val base = 40 + ((x / 3) * 13 + (y / 3) * 7) % 180
      val v = (base * (100 - 12 * t)) / 100
      rgb(i * 3) = v.toByte
      rgb(i * 3 + 1) = ((v * 9) / 10).toByte
      rgb(i * 3 + 2) = ((v * 11) / 10 min 255).toByte
      i += 1
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

  test("explicit P weights: fade GOP round-trips plane-exactly") {
    val frames = (0 until 5).map(t => fadeFrame(64, 48, t))
    // w/denom ~ 0.88 — the per-frame fade ratio; offset 0
    val wp = Some((6, 56, 0))
    for (cabac <- Seq(false, true); deblock <- Seq(false, true)) {
      val (pv, recon) = H264Codec.encodeGopForTest(frames, qp = 26,
        wpLuma = wp, cabac = cabac, deblock = deblock)
      assertParity(pv, recon, s"wp-p cabac=$cabac deblock=$deblock")
    }
  }

  test("explicit P weights engage: fade payloads shrink vs unweighted") {
    val frames = (0 until 6).map(t => fadeFrame(64, 48, t))
    val plain = H264Codec.encodeGop(frames, qp = 26).map(_.length.toLong).sum
    val weighted = H264Codec.encodeGop(frames, qp = 26,
      wpLuma = Some((6, 56, 0))).map(_.length.toLong).sum
    assert(weighted < plain,
      s"weighted fade $weighted B vs plain $plain B — weights not engaging")
  }

  test("explicit P weights: multi-reference + offsets") {
    val frames = (0 until 5).map(t => fadeFrame(48, 32, t))
    val (pv, recon) = H264Codec.encodeGopForTest(frames, qp = 24,
      refFrames = 2, wpLuma = Some((5, 30, 3)))
    assertParity(pv, recon, "wp-p multiref")
  }

  test("explicit B bipred (idc 1): asymmetric two-list weights round-trip") {
    val frames = (0 until 7).map(t => fadeFrame(64, 48, t))
    for (bFrames <- Seq(1, 2); deblock <- Seq(false, true)) {
      val (pv, _, recon) = H264Codec.encodeGopBForTest(frames, qp = 26,
        bFrames = bFrames, deblock = deblock, weightedBipred = 1)
      assertParity(pv, recon, s"wp-b explicit bFrames=$bFrames deblock=$deblock")
    }
  }

  test("implicit B bipred (idc 2): POC-distance weights round-trip") {
    val frames = (0 until 7).map(t => fadeFrame(64, 48, t))
    // bFrames = 2: the Bs sit at 1/3 and 2/3 between their references,
    // so the implicit weights are genuinely asymmetric (not 32/32)
    for (bFrames <- Seq(1, 2); cabac <- Seq(false, true)) {
      val (pv, _, recon) = H264Codec.encodeGopBForTest(frames, qp = 26,
        bFrames = bFrames, cabac = cabac, weightedBipred = 2)
      assertParity(pv, recon, s"wp-b implicit bFrames=$bFrames cabac=$cabac")
    }
  }

  test("centered implicit B equals the default average (weights 32/32)") {
    // a B exactly midway between its references derives (32, 32) —
    // the spec's implicit math degenerates to the default rounding
    // average, so the decoded planes must match the unweighted GOP's
    val frames = (0 until 5).map(t => fadeFrame(48, 32, t))
    val (pv0, _, recon0) = H264Codec.encodeGopBForTest(frames, qp = 26,
      bFrames = 1, weightedBipred = 0)
    val (pv2, _, recon2) = H264Codec.encodeGopBForTest(frames, qp = 26,
      bFrames = 1, weightedBipred = 2)
    assertParity(pv2, recon2, "centered implicit")
    recon0.zip(recon2).zipWithIndex.foreach { case (((a, b, c), (x, y, z)), i) =>
      assert(java.util.Arrays.equals(a, x) && java.util.Arrays.equals(b, y) &&
        java.util.Arrays.equals(c, z), s"centered implicit != default at $i")
    }
  }

  test("x264 weightp=2 shape: list modification duplicates a reference " +
      "with per-duplicate weights") {
    // ref_pic_list_modification turns [newest, older] into
    // [newest, newest] (the second command wraps MaxFrameNum back to
    // the same PicNum — x264's duplication trick), and the weight
    // table gives each duplicate different luma weights; MBs alternate
    // ref_idx to select the variant. Parity pins the modification
    // arithmetic + duplicate handling + per-reference weighting.
    def planes(wMbs: Int, hMbs: Int, seed: Int)
        : (Array[Byte], Array[Byte], Array[Byte]) = {
      val lw = wMbs * 16; val lh = hMbs * 16
      (Array.tabulate(lw * lh)(i => ((i * 7 + seed * 13) % 251).toByte),
        Array.tabulate(lw * lh / 4)(i => ((i * 5 + seed * 11) % 241).toByte),
        Array.tabulate(lw * lh / 4)(i => ((i * 3 + seed * 17) % 239).toByte))
    }
    val (rY, rCb, rCr) = planes(3, 2, seed = 2)
    val (oY, oCb, oCr) = planes(3, 2, seed = 5)
    val (sY, sCb, sCr) = planes(3, 2, seed = 8)
    val (_, enc, dec) = H264Codec.pWeightpRoundTripForTest(
      sY, sCb, sCr, rY, rCb, rCr, oY, oCb, oCr, wMbs = 3, hMbs = 2,
      qp = 26, (mx, my) => ((mx - my) % 5 - 1, (mx + my) % 4 - 2))
    assert(dec.isDefined, "weightp-shaped P frame failed to decode")
    assert(java.util.Arrays.equals(dec.get._1, enc._1) &&
      java.util.Arrays.equals(dec.get._2, enc._2) &&
      java.util.Arrays.equals(dec.get._3, enc._3),
      "weightp shape: decode != encoder reconstruction")
  }

  test("fuzz the new header parsers: every bit of the slice-header region") {
    // pred_weight_table + ref_pic_list_modification + the PPS extension
    // are fresh untrusted-bytes parsers (the r12 fuzz found two real
    // allocation-DoS bugs in this class); flip EVERY bit of the first
    // 60 payload bytes of a weightp-shaped payload and assert
    // Option-clean decode — no throw, no hang, no allocation blowup
    def planes(wMbs: Int, hMbs: Int, seed: Int)
        : (Array[Byte], Array[Byte], Array[Byte]) = {
      val lw = wMbs * 16; val lh = hMbs * 16
      (Array.tabulate(lw * lh)(i => ((i * 7 + seed * 13) % 251).toByte),
        Array.tabulate(lw * lh / 4)(i => ((i * 5 + seed * 11) % 241).toByte),
        Array.tabulate(lw * lh / 4)(i => ((i * 3 + seed * 17) % 239).toByte))
    }
    val (rY, rCb, rCr) = planes(2, 2, seed = 2)
    val (oY, oCb, oCr) = planes(2, 2, seed = 5)
    val (sY, sCb, sCr) = planes(2, 2, seed = 8)
    val (payload, _, dec) = H264Codec.pWeightpRoundTripForTest(
      sY, sCb, sCr, rY, rCb, rCr, oY, oCb, oCr, wMbs = 2, hMbs = 2,
      qp = 26, (_, _) => (0, 0))
    assert(dec.isDefined)
    val limit = math.min(60, payload.length)
    var i = 0
    while (i < limit) {
      var b = 0
      while (b < 8) {
        val bad = payload.clone()
        bad(i) = (bad(i) ^ (1 << b)).toByte
        H264Codec.decodeGop(Seq(bad)) // must stay Option-clean
        b += 1
      }
      i += 1
    }
    // and a high-profile inter-8x8 payload's header region too
    val (p8, _, d8) = H264Codec.pInter8x8RoundTripForTest(
      sY, sCb, sCr, rY, rCb, rCr, wMbs = 2, hMbs = 2, qp = 26,
      (_, _) => (1, -1))
    assert(d8.isDefined)
    i = 0
    while (i < math.min(50, p8.length)) {
      val bad = p8.clone()
      bad(i) = (bad(i) ^ 0xff).toByte
      H264Codec.decodeGop(Seq(bad))
      i += 1
    }
  }

  test("hostile inputs: tampered weighted streams reject, never throw") {
    val frames = (0 until 5).map(t => fadeFrame(48, 32, t))
    val pv = H264Codec.encodeGop(frames, qp = 26, wpLuma = Some((6, 56, 0)))
    assert(H264Codec.decodeGop(pv).forall(_.isDefined))
    var n = 0
    pv.tail.foreach { p =>
      var i = 40 // into the slice header / weight table region
      while (i < p.length && n < 60) {
        val bad = pv.map(_.clone())
        bad(pv.indexOf(p))(i) = (bad(pv.indexOf(p))(i) ^ 0x55).toByte
        H264Codec.decodeGop(bad) // Option-clean
        n += 1
        i += 7
      }
    }
    assert(n > 20)
    val cut = pv.updated(1, pv(1).take(50))
    assert(H264Codec.decodeGop(cut)(1).isEmpty)
  }
}
