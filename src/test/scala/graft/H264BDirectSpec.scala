package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** B_Skip / B_Direct_16x16 (spatial direct, 8.4.1.2.2) + in-loop
  * deblocking on B slices (r13): encoder-reconstruction plane parity
  * across deblocked reference chains, a behavioral pin of the direct
  * derivation (static content must decode as an exact reference copy
  * through zero bits), payload-size proof that skip actually fires,
  * and the temporal-direct refuse posture. */
class H264BDirectSpec extends AnyFunSuite {

  private def movingSquare(w: Int, h: Int, t: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val bg = ((x / 4) * 16 + (y / 4) * 8) % 200
        val sx = 8 + t * 2
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

  test("direct-mode GOPs: plane-exact parity, with and without deblocking") {
    val frames = (0 until 7).map(t => movingSquare(64, 48, t))
    for (deblock <- Seq(false, true); bFrames <- Seq(1, 2)) {
      val (payloads, _, recon) = H264Codec.encodeGopBForTest(frames, qp = 26,
        bFrames = bFrames, deblock = deblock)
      val decoded = decodeChain(payloads)
      decoded.zip(recon).zipWithIndex.foreach { case (((y, cb, cr), (ey, ecb, ecr)), i) =>
        assert(java.util.Arrays.equals(y, ey) && java.util.Arrays.equals(cb, ecb) &&
          java.util.Arrays.equals(cr, ecr),
          s"plane parity failed at frame $i (deblock=$deblock bFrames=$bFrames)")
      }
    }
  }

  test("static content: every B macroblock skips, zero-bit reference copy") {
    // identical frames: spatial direct resolves to zero motion against
    // the colocated-zero reference, residual quantizes to nothing, so
    // each B slice is a skip run — bytes prove it, and the decoded B
    // planes must EQUAL the reference reconstruction exactly (an
    // independent behavioral pin of the 8.4.1.2.2 derivation, not just
    // encoder/decoder symmetry)
    val still = movingSquare(64, 48, 3)
    val frames = Seq.fill(5)(still)
    val (payloads, display, _) = H264Codec.encodeGopBForTest(frames, qp = 26)
    // payload 0 = IDR; B payloads carry SPS+PPS+slice where the slice
    // is just a header + one skip run
    val bSizes = payloads.zipWithIndex.collect {
      case (p, i) if i > 0 && display(i) % 2 == 1 => p.length
    }
    val pSizes = payloads.zipWithIndex.collect {
      case (p, i) if i > 0 && display(i) % 2 == 0 => p.length
    }
    assert(bSizes.nonEmpty)
    bSizes.foreach(sz => assert(sz < 80,
      s"static B payload $sz B — skip run not engaged (SPS+PPS+header budget is ~60)"))
    // behavioral pin of the derivation, independent of encoder/decoder
    // symmetry: an all-skip B is pure direct-zero BI-prediction, so its
    // planes must equal the rounding average of its two references
    // (display neighbors: past ref = d-1, future ref = d+1). Early Bs
    // may legally carry a B_Direct MB refining quantization noise
    // toward the source (bounded by one quant step); once the reference
    // chain converges the B is EXACTLY the average — pin the last one.
    val decoded = decodeChain(payloads)
    val byDisplay = display.zip(decoded).toMap
    def avg(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      Array.tabulate(a.length)(i => (((a(i) & 0xff) + (b(i) & 0xff) + 1) >> 1).toByte)
    val bDisplays = display.filter(_ % 2 == 1)
    bDisplays.foreach { d =>
      val (y, cb, cr) = byDisplay(d)
      val ay = avg(byDisplay(d - 1)._1, byDisplay(d + 1)._1)
      val maxDiff = y.indices.map(i => math.abs((y(i) & 0xff) - (ay(i) & 0xff))).max
      assert(maxDiff <= 6, s"static B at display $d drifts $maxDiff from its ref average")
      if (d == bDisplays.max) {
        assert(java.util.Arrays.equals(y, ay) &&
          java.util.Arrays.equals(cb, avg(byDisplay(d - 1)._2, byDisplay(d + 1)._2)) &&
          java.util.Arrays.equals(cr, avg(byDisplay(d - 1)._3, byDisplay(d + 1)._3)),
          "converged static B must be the EXACT average of its references")
      }
    }
    assert(pSizes.forall(_ < 400), "static P frames should stay small")
  }

  test("direct mode saves bits on mixed content") {
    // moving square on static background: most MBs skip, the square's
    // MBs code — the B payloads must undercut the no-direct r12 shape
    // (every MB coded with mvds) by a clear margin; proxy bound: a
    // coded-all-MBs 64x48 B frame at qp 26 measured >= 300 B in r12
    val frames = (0 until 5).map(t => movingSquare(64, 48, t))
    val (payloads, display, _) = H264Codec.encodeGopBForTest(frames, qp = 26)
    val bSizes = payloads.zipWithIndex.collect {
      case (p, i) if i > 0 && display(i) % 2 == 1 => p.length
    }
    assert(bSizes.forall(_ < 260), s"B payloads $bSizes — direct/skip not engaging")
  }

  test("flipped direct_spatial_mv_pred_flag decodes via temporal direct (r13)") {
    // r12 refused temporal direct; r13 implements it (8.4.1.2.3,
    // positively witnessed in H264TemporalDirectSpec). On static
    // content a spatial-coded all-skip B reinterpreted as temporal
    // must decode to ESSENTIALLY the same picture: the encoder's
    // SAD-tie-broken colocated MVs can be nonzero in flat regions, so
    // temporal scaling may move predictions onto half-pel positions
    // whose interpolation rounds +-1 against spatial's zero motion —
    // agreement is pinned at that rounding level, not byte equality.
    val still = movingSquare(64, 48, 2)
    val (payloads, display, _) = H264Codec.encodeGopBForTest(Seq.fill(3)(still), qp = 26)
    val bIdx = display.indexWhere(_ == 1)
    val bPay = payloads(bIdx)
    // find the slice NAL (type 1, nal_ref_idc 0) inside the AVCC payload
    // and flip the direct_spatial_mv_pred_flag: slice header bits are
    // ue(0) ue(6) ue(0) u(4) u(8) = 19 bits, flag is bit 19 of the RBSP
    // -> byte 2, mask 0x10 (no emulation bytes this early in a header)
    var off = 0
    var sliceOff = -1
    while (off + 4 < bPay.length && sliceOff < 0) {
      val len = ((bPay(off) & 0xff) << 24) | ((bPay(off + 1) & 0xff) << 16) |
        ((bPay(off + 2) & 0xff) << 8) | (bPay(off + 3) & 0xff)
      val nalType = bPay(off + 4) & 0x1f
      if (nalType == 1) sliceOff = off + 4
      off += 4 + len
    }
    assert(sliceOff > 0, "slice NAL not found")
    val bad = bPay.clone()
    bad(sliceOff + 3) = (bad(sliceOff + 3) ^ 0x10).toByte
    val g = new H264Codec.GopDecoder
    assert(g.decodeAu(payloads.head).isDefined)
    (1 until bIdx).foreach(i => g.decodeAu(payloads(i)))
    val viaTemporal = g.decodeAu(bad)
    assert(viaTemporal.isDefined, "temporal-direct reinterpretation must decode")
    val g2 = new H264Codec.GopDecoder
    assert(g2.decodeAu(payloads.head).isDefined)
    (1 until bIdx).foreach(i => g2.decodeAu(payloads(i)))
    val viaSpatial = g2.decodeAu(bPay)
    val maxDiff = viaTemporal.get.rgb.zip(viaSpatial.get.rgb)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxDiff <= 2,
      s"static content: temporal vs spatial direct diverged by $maxDiff")
  }

  test("deblocking fires on B slices: blocky B content changes under the filter") {
    // coarse qp makes blocking artifacts; the deblocked GOP's B output
    // must differ from the unfiltered one (filter demonstrably ran on
    // the B picture, not only on its references)
    val frames = (0 until 3).map(t => movingSquare(64, 48, t * 2))
    val (plain, displayP, _) = H264Codec.encodeGopBForTest(frames, qp = 38)
    val (felt, displayF, _) = H264Codec.encodeGopBForTest(frames, qp = 38, deblock = true)
    assert(displayP == displayF)
    val dp = decodeChain(plain)
    val df = decodeChain(felt)
    val bIdx = displayP.indexWhere(_ == 1)
    assert(!java.util.Arrays.equals(dp(bIdx)._1, df(bIdx)._1),
      "deblocked B luma identical to unfiltered — filter did not run")
  }

  test("hostile: truncated/corrupted direct-mode B payloads never escape") {
    val frames = (0 until 4).map(t => movingSquare(48, 32, t))
    val (payloads, display, _) = H264Codec.encodeGopBForTest(frames, qp = 26,
      deblock = true)
    val bIdx = display.indexWhere(_ == 1)
    var s = 7L
    for (trial <- 0 until 30) {
      val g = new H264Codec.GopDecoder
      g.decodeAu(payloads.head)
      (1 until bIdx).foreach(i => g.decodeAu(payloads(i)))
      val bad = payloads(bIdx).clone()
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      if (trial % 3 == 0) {
        g.decodeAu(bad.take((math.abs(s) % bad.length).toInt)) // truncation
      } else {
        val at = (math.abs(s) % bad.length).toInt
        bad(at) = (bad(at) ^ (s >> 8).toByte).toByte
        g.decodeAu(bad) // must not throw; Option result either way
      }
    }
  }
}
