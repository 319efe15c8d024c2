package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Custom quant matrices (r15 — 7.3.2.1.1.1 scaling_list, Table 7-2
  * fall-back rules, Table 7-3/7-4 defaults, 8.5.9–8.5.13 weighted
  * dequant). Witness stack: hand-worked spec arithmetic on the general
  * kernels (engine-independent), bit-exact flat-equivalence against
  * hardcoded legacy formulas (the pre-CQM forms every green round
  * pinned), structural pins on the default tables, wire round trips
  * incl. the useDefaultScalingMatrixFlag shortcut and delta wrap,
  * hand-derived Table 7-2 resolution chains, end-to-end parity across
  * intra16x16/intra4x4/intra8x8/P/B/8x8-inter under SPS, PPS-override,
  * fall-back and PPS-only transports, and a same-slice-bytes
  * flat-SPS-swap control that fails if the matrices ride the wire
  * without reaching dequant. */
class H264CqmSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, seed: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    var s = seed.toLong * 0x9E3779B97F4A7C15L + 1
    var i = 0
    while (i < w * h) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      val x = i % w; val y = i / w
      val v = (x * 5 + y * 3 + seed * 7 + ((s >> 40) % 13)).toInt & 0xff
      rgb(i * 3) = v.toByte
      rgb(i * 3 + 1) = ((v + 60) & 0xff).toByte
      rgb(i * 3 + 2) = ((v * 2 + 30) & 0xff).toByte
      i += 1
    }
    MediaCodecs.Bmp(w, h, rgb)
  }
  private def frames(w: Int, h: Int, n: Int): Seq[MediaCodecs.Bmp] =
    (0 until n).map(i => frame(w, h, i + 3))

  // normAdjust4x4 / normAdjust8x8 hardcoded INDEPENDENTLY of the
  // library (Table 8-?? values as published) — the pins below must not
  // read the implementation's own tables
  private val V4 = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
  private val V8 = Array(
    Array(20, 18, 32, 25, 19, 24), Array(22, 19, 35, 28, 21, 26),
    Array(26, 23, 42, 33, 24, 31), Array(28, 25, 45, 35, 26, 33),
    Array(32, 28, 51, 40, 30, 38), Array(36, 32, 58, 43, 34, 41))
  private def cls4(r: Int): Int = {
    val x = r & 3; val y = r >> 2
    if (x % 2 == 0 && y % 2 == 0) 0 else if (x % 2 == 1 && y % 2 == 1) 1 else 2
  }
  private def cls8(r: Int): Int = {
    val cx = (r & 7) & 3; val cy = (r >> 3) & 3
    if (cx == 0 && cy == 0) 0
    else if (cx % 2 == 1 && cy % 2 == 1) 1
    else if (cx == 2 && cy == 2) 2
    else if ((cx == 0 && cy == 2) || (cx == 2 && cy == 0)) 3
    else if (cx == 0 || cy == 0) 4
    else 5
  }

  test("general 4x4 dequant: hand-worked 8.5.12.1 values") {
    val w = H264Codec.Default4x4Intra
    // qp 17: m = 5, qp/6 = 2 -> rounding branch, f = 2, shift 2
    val d17 = H264Transform.dequant4x4(Array.fill(16)(1), 17, skipDc = false, w)
    assert(d17(0) == 27, "(6*18+2)>>2")    // w 6,  class 0, V 18
    assert(d17(1) == 75, "(13*23+2)>>2")   // w 13, class 2, V 23
    assert(d17(5) == 145, "(20*29+2)>>2")  // w 20, class 1, V 29
    assert(d17(15) == 305, "(42*29+2)>>2") // w 42, class 1, V 29
    // qp 30: m = 0, qp/6 = 5 -> shift branch << 1
    val d30 = H264Transform.dequant4x4(Array.fill(16)(2), 30, skipDc = false, w)
    assert(d30(0) == 240 && d30(1) == 676 && d30(5) == 1280)
    // negative level, deep rounding branch (qp 5: f = 8, >> 4), floor
    val dn = H264Transform.dequant4x4(Array.fill(16)(-3), 5, skipDc = false, w)
    assert(dn(0) == -20, "(-324+8)>>4 floors to -20")
    // skipDc passes the DC through untouched
    val ds = H264Transform.dequant4x4(Array.tabulate(16)(i => i + 1), 17,
      skipDc = true, w)
    assert(ds(0) == 1)
  }

  test("general luma-DC / chroma-DC dequant: hand-worked 8.5.10/8.5.11") {
    // luma DC, w00 = 6, qp 20 (m = 2, V0 = 13): hadamard(all-1) puts 16
    // at position 0, 0 elsewhere; (16*6*13 + 4) >> 3 = 156
    val dl = H264Transform.dequantLumaDc(Array.fill(16)(1), 20, 6)
    assert(dl(0) == 156 && dl(1) == 0)
    // qp 40 (m = 4, V0 = 16, >= 36 branch): 16*6*16 << 0 = 1536
    val dl40 = H264Transform.dequantLumaDc(Array.fill(16)(1), 40, 6)
    assert(dl40(0) == 1536)
    // chroma DC, w00 = 10, qp 20: 2x2 hadamard(all-1) -> (4,0,0,0);
    // ((4*10*13) << 3) >> 5 = 130
    val dc = H264Transform.dequantChromaDc(Array.fill(4)(1), 20, 10)
    assert(dc(0) == 130 && dc(1) == 0)
  }

  test("general 8x8 dequant: hand-worked 8.5.13.2 values") {
    val w = H264Codec.Default8x8Intra
    // qp 17 (m = 5, qp/6 = 2): rounding branch, f = 8, >> 4
    val d = H264Transform8x8.dequant8x8(Array.fill(64)(1), 17, w)
    assert(d(0) == (6 * 36 + 8) >> 4)   // class 0, V8 36
    assert(d(9) == (11 * 32 + 8) >> 4)  // (1,1) class 1, V8 32, w 11
    // qp 38 (m = 2, >= 36 branch, << 0)
    val d38 = H264Transform8x8.dequant8x8(Array.fill(64)(1), 38, w)
    assert(d38(0) == 6 * 26 && d38(9) == 11 * 23)
  }

  test("flat weight 16 is bit-exact to the legacy pre-CQM forms") {
    val rnd = new scala.util.Random(41)
    for (qp <- 0 to 51) {
      val c = Array.fill(16)(rnd.nextInt(201) - 100)
      val got = H264Transform.dequant4x4(c, qp, skipDc = false)
      val leg = Array.tabulate(16)(r => c(r) * V4(qp % 6)(cls4(r)) << (qp / 6))
      assert(got.sameElements(leg), s"4x4 qp $qp")
      val gDc = H264Transform.dequantLumaDc(c, qp)
      val h = H264Transform.hadamard4x4(c)
      val v0 = V4(qp % 6)(0)
      val lDc =
        if (qp >= 12) h.map(x => (x * v0) << (qp / 6 - 2))
        else h.map(x => (x * v0 + (1 << (1 - qp / 6))) >> (2 - qp / 6))
      assert(gDc.sameElements(lDc), s"lumaDc qp $qp")
      val c4 = c.take(4)
      val gCd = H264Transform.dequantChromaDc(c4, qp)
      val f = Array(
        c4(0) + c4(1) + c4(2) + c4(3), c4(0) - c4(1) + c4(2) - c4(3),
        c4(0) + c4(1) - c4(2) - c4(3), c4(0) - c4(1) - c4(2) + c4(3))
      val lCd = f.map(x => ((x * v0) << (qp / 6)) >> 1)
      assert(gCd.sameElements(lCd), s"chromaDc qp $qp")
      val c64 = Array.fill(64)(rnd.nextInt(201) - 100)
      val g8 = H264Transform8x8.dequant8x8(c64, qp)
      val l8 =
        if (qp >= 36)
          Array.tabulate(64)(r => ((c64(r) * V8(qp % 6)(cls8(r))) << 4) << (qp / 6 - 6))
        else {
          val sh = 6 - qp / 6
          Array.tabulate(64)(r => (((c64(r) * V8(qp % 6)(cls8(r))) << 4) + (1 << (sh - 1))) >> sh)
        }
      assert(g8.sameElements(l8), s"8x8 qp $qp")
    }
  }

  test("Table 7-3/7-4 defaults: symmetry, row-monotone, endpoints") {
    def sym(m: Array[Int], n: Int): Unit =
      for (i <- 0 until n; j <- 0 until n)
        assert(m(i * n + j) == m(j * n + i), s"asym at ($i,$j)")
    def rowMono(m: Array[Int], n: Int): Unit =
      for (i <- 0 until n; j <- 1 until n)
        assert(m(i * n + j) >= m(i * n + j - 1), s"row $i at $j")
    for ((m, n) <- Seq((H264Codec.Default4x4Intra, 4),
        (H264Codec.Default4x4Inter, 4), (H264Codec.Default8x8Intra, 8),
        (H264Codec.Default8x8Inter, 8))) { sym(m, n); rowMono(m, n) }
    // endpoints as published
    assert(H264Codec.Default4x4Intra(0) == 6 && H264Codec.Default4x4Intra(15) == 42)
    assert(H264Codec.Default4x4Inter(0) == 10 && H264Codec.Default4x4Inter(15) == 34)
    assert(H264Codec.Default8x8Intra(0) == 6 && H264Codec.Default8x8Intra(63) == 42)
    assert(H264Codec.Default8x8Inter(0) == 9 && H264Codec.Default8x8Inter(63) == 35)
    // the 4x4 defaults ARE zigzag-monotone (the spec lists them in
    // increasing scan order); the 8x8 intra one famously is NOT
    // ((1,1) = 11 < (2,0) = 13), so row-monotone is the right pin
    val z = H264Transform.Zigzag4x4
    for (j <- 1 until 16) {
      assert(H264Codec.Default4x4Intra(z(j)) >= H264Codec.Default4x4Intra(z(j - 1)))
      assert(H264Codec.Default4x4Inter(z(j)) >= H264Codec.Default4x4Inter(z(j - 1)))
    }
    assert(H264Codec.Default8x8Intra(9) == 11, "(1,1) of the 8x8 intra default")
  }

  test("scaling_list wire: round trip, useDefault shortcut, delta wrap") {
    def mk4(seed: Int) = Array.tabulate(16)(r => 8 + (r * 5 + seed * 3) % 24)
    def mk8(seed: Int) = Array.tabulate(64)(r => 8 + (r * 3 + seed * 7) % 24)
    val lists: IndexedSeq[Option[Array[Int]]] = IndexedSeq(
      Some(mk4(1)), None, Some(mk4(3)), None, Some(mk4(5)), None,
      Some(mk8(1)), None)
    val back = H264Codec.scalingWireForTest(lists, 8)
    for (i <- 0 until 8) (lists(i), back(i)) match {
      case (Some(a), Some(b)) => assert(a.sameElements(b), s"list $i")
      case (None, None) =>
      case other => fail(s"list $i: $other")
    }
    // useDefaultScalingMatrixFlag resolves to the Table 7-3/7-4 default
    val dflt = H264Codec.scalingWireForTest(lists, 8, useDefaultAt = Set(0, 6))
    assert(dflt(0).get.sameElements(H264Codec.Default4x4Intra))
    assert(dflt(6).get.sameElements(H264Codec.Default8x8Intra))
    // delta wrap: 1 -> 255 needs delta -2 mod 256; 255 -> 1 needs +2
    val wrap = Array.fill(16)(1)
    wrap(H264Transform.Zigzag4x4(1)) = 255 // scan position 1
    wrap(H264Transform.Zigzag4x4(2)) = 1
    val w2 = H264Codec.scalingWireForTest(IndexedSeq(Some(wrap)), 6)
    assert(w2(0).get.sameElements(wrap))
  }

  test("Table 7-2 fall-back: rule A chains and defaults") {
    def mk4(seed: Int) = Array.tabulate(16)(r => 8 + (r * 5 + seed * 3) % 24)
    val a = mk4(1); val b = mk4(4)
    val (w4, w8) = H264Codec.resolveForTest(IndexedSeq(
      Some(a), None, None, Some(b), None, None, None, None))
    assert(w4(0).sameElements(a) && w4(1).sameElements(a) && w4(2).sameElements(a))
    assert(w4(3).sameElements(b) && w4(4).sameElements(b) && w4(5).sameElements(b))
    assert(w8(0).sameElements(H264Codec.Default8x8Intra))
    assert(w8(1).sameElements(H264Codec.Default8x8Inter))
    // everything absent -> all defaults (NOT flat: flag-1-all-absent
    // means default matrices per rule A)
    val (d4, d8) = H264Codec.resolveForTest(IndexedSeq.fill(8)(None))
    assert(d4(0).sameElements(H264Codec.Default4x4Intra))
    assert(d4(5).sameElements(H264Codec.Default4x4Inter))
    assert(d8(0).sameElements(H264Codec.Default8x8Intra))
  }

  test("Table 7-2 fall-back: rule B against the SPS lists") {
    def mk4(seed: Int) = Array.tabulate(16)(r => 8 + (r * 5 + seed * 3) % 24)
    def mk8(seed: Int) = Array.tabulate(64)(r => 8 + (r * 3 + seed * 7) % 24)
    val sps = IndexedSeq.tabulate(8)(i =>
      Some(if (i < 6) mk4(10 + i) else mk8(10 + i)): Option[Array[Int]])
    // PPS all-absent: rule B pulls the SPS lists ONLY at the anchor
    // indices 0/3/6/7; 1/2 and 4/5 re-chain from the PPS-resolved
    // previous list (the ffmpeg/JM-visible consequence: an all-absent
    // pic_scaling_matrix re-derives [S0,S0,S0,S3,S3,S3], NOT the SPS's
    // full resolution — only pic_scaling_matrix_present = 0 does that)
    val (p4, p8) = H264Codec.resolveForTest(IndexedSeq.fill(8)(None), Some(sps))
    for (i <- 0 until 3) assert(p4(i).sameElements(sps(0).get), s"w4 $i")
    for (i <- 3 until 6) assert(p4(i).sameElements(sps(3).get), s"w4 $i")
    for (i <- 0 until 2) assert(p8(i).sameElements(sps(6 + i).get), s"w8 $i")
    // PPS overriding only index 1: 2 chains from it, 0/3/6/7 from SPS,
    // 4/5 chain from the SPS-sourced 3
    val x = mk4(30)
    val (q4, q8) = H264Codec.resolveForTest(IndexedSeq(
      None, Some(x), None, None, None, None, None, None), Some(sps))
    assert(q4(0).sameElements(sps(0).get))
    assert(q4(1).sameElements(x) && q4(2).sameElements(x))
    assert(q4(3).sameElements(sps(3).get))
    assert(q4(4).sameElements(sps(3).get) && q4(5).sameElements(sps(3).get))
    assert(q8(0).sameElements(sps(6).get) && q8(1).sameElements(sps(7).get))
    // 6-entry PPS raw (transform_8x8_mode off): 8x8 falls to the SPS
    val (_, r8) = H264Codec.resolveForTest(IndexedSeq.fill(6)(None), Some(sps))
    assert(r8(0).sameElements(sps(6).get) && r8(1).sameElements(sps(7).get))
  }

  test("CQM end to end: SPS lists, CAVLC P GOP round-trips plane-exactly") {
    val (_, recons, decoded) =
      H264Codec.cqmGopForTest(frames(48, 32, 4), qp = 24, leg = 0)
    assert(decoded.length == 4 && decoded.forall(_.isDefined))
    recons.zip(decoded).zipWithIndex.foreach { case ((e, d), i) =>
      val (dy, dcb, dcr) = d.get
      assert(java.util.Arrays.equals(dy, e._1), s"frame $i luma")
      assert(java.util.Arrays.equals(dcb, e._2), s"frame $i cb")
      assert(java.util.Arrays.equals(dcr, e._3), s"frame $i cr")
    }
  }

  test("CQM end to end: CABAC B GOP round-trips plane-exactly") {
    val (_, recons, decoded) =
      H264Codec.cqmGopForTest(frames(48, 32, 5), qp = 26, leg = 1)
    assert(decoded.forall(_.isDefined))
    recons.zip(decoded).foreach { case (e, d) =>
      val (dy, dcb, dcr) = d.get
      assert(java.util.Arrays.equals(dy, e._1))
      assert(java.util.Arrays.equals(dcb, e._2))
      assert(java.util.Arrays.equals(dcr, e._3))
    }
  }

  test("CQM end to end: PPS override, fall-back SPS, PPS-only legs") {
    for (leg <- 2 to 4) {
      val (_, recons, decoded) =
        H264Codec.cqmGopForTest(frames(48, 32, 4), qp = 23 + leg, leg = leg)
      assert(decoded.forall(_.isDefined), s"leg $leg")
      recons.zip(decoded).zipWithIndex.foreach { case ((e, d), i) =>
        val (dy, dcb, dcr) = d.get
        assert(java.util.Arrays.equals(dy, e._1), s"leg $leg frame $i luma")
        assert(java.util.Arrays.equals(dcb, e._2), s"leg $leg frame $i cb")
        assert(java.util.Arrays.equals(dcr, e._3), s"leg $leg frame $i cr")
      }
    }
  }

  test("control: the SAME slice bytes under a flat SPS decode DIFFERENTLY") {
    // parity alone cannot distinguish "matrices applied" from
    // "matrices carried and ignored on both sides" — this can
    val (_, recons, decoded) =
      H264Codec.cqmGopForTest(frames(48, 32, 1), qp = 24, leg = 5)
    val cqmDec = decoded(0); val flatDec = decoded(1)
    assert(cqmDec.isDefined && flatDec.isDefined)
    assert(java.util.Arrays.equals(cqmDec.get._1, recons.head._1),
      "CQM decode must match the encoder recon")
    assert(!java.util.Arrays.equals(flatDec.get._1, cqmDec.get._1),
      "flat-SPS swap must change the reconstruction")
  }

  test("forward quant tracks the weights: CQM recon stays near the flat recon") {
    // if the forward side multiplied by w/16 instead of dividing, round
    // trips would still be parity-exact but the image would be scaled
    // garbage; the CQM decode must stay close to the flat decode of the
    // same source at the same qp
    val f = frames(48, 32, 1)
    val (_, _, cqmDec) = H264Codec.cqmGopForTest(f, qp = 24, leg = 5)
    val flat = H264Codec.encodeGopForTest(f, qp = 24)._2.head
    val a = cqmDec(0).get._1; val b = flat._1
    var sum = 0L
    for (i <- a.indices) sum += math.abs((a(i) & 0xff) - (b(i) & 0xff))
    val mad = sum.toDouble / a.length
    assert(mad < 8.0, f"mean abs diff $mad%.2f vs flat recon")
  }

  test("CQM 8x8: intra8x8 and inter-8x8 transports round-trip") {
    def mk8(seed: Int) = Array.tabulate(64)(r => 8 + (r * 3 + seed * 7) % 24)
    val cfg = H264Codec.CqmCfg(sps = Some(IndexedSeq(
      None, None, None, None, None, None, Some(mk8(2)), Some(mk8(6)))))
    // intra8x8 (w8 list 0 via rule-A chains for the 4x4s)
    val img = frame(48, 32, 9)
    val (bytes, ey, ecb, ecr) =
      H264Codec.encodeI8ForTest(img, qp = 24, (_, best, _) => best, cqm = Some(cfg))
    val dec = H264Codec.decodeYuv(bytes)
    assert(dec.isDefined)
    val (_, dy, dcb, dcr) = dec.get
    assert(java.util.Arrays.equals(dy, ey) && java.util.Arrays.equals(dcb, ecb)
      && java.util.Arrays.equals(dcr, ecr))
    // inter 8x8 (w8 list 1), CAVLC and CABAC
    val wMbs = 3; val hMbs = 2
    val n = wMbs * 16 * hMbs * 16
    def plane(seed: Int, len: Int) =
      Array.tabulate(len)(i => ((i * 31 + seed * 17) % 251).toByte)
    for (cabac <- Seq(false, true)) {
      val (_, recon, d) = H264Codec.pInter8x8RoundTripForTest(
        plane(1, n), plane(2, n / 4), plane(3, n / 4),
        plane(4, n), plane(5, n / 4), plane(6, n / 4),
        wMbs, hMbs, qp = 26, mvOf = (mx, my) => ((mx - 1) * 4, (my - 1) * 4),
        cabac = cabac, cqm = Some(cfg))
      assert(d.isDefined, s"cabac=$cabac")
      assert(java.util.Arrays.equals(d.get._1, recon._1), s"cabac=$cabac luma")
      assert(java.util.Arrays.equals(d.get._2, recon._2), s"cabac=$cabac cb")
      assert(java.util.Arrays.equals(d.get._3, recon._3), s"cabac=$cabac cr")
    }
  }

  test("CQM intra4x4 round-trips plane-exactly") {
    def mk4(seed: Int) = Array.tabulate(16)(r => 8 + (r * 5 + seed * 3) % 24)
    val cfg = H264Codec.CqmCfg(sps = Some(IndexedSeq.tabulate(8)(i =>
      if (i < 6) Some(mk4(i)) else None)))
    val img = frame(48, 32, 11)
    val (bytes, ey, ecb, ecr) =
      H264Codec.encodeI4ForTest(img, qp = 22, (_, best, _) => best, cqm = Some(cfg))
    val dec = H264Codec.decodeYuv(bytes)
    assert(dec.isDefined)
    val (_, dy, dcb, dcr) = dec.get
    assert(java.util.Arrays.equals(dy, ey) && java.util.Arrays.equals(dcb, ecb)
      && java.util.Arrays.equals(dcr, ecr))
  }

  test("x264 --cqm jvt shape: the DEFAULT matrices ride a full stream") {
    // x264's jvt preset signals exactly the Table 7-3/7-4 matrices —
    // the most likely real-world CQM content. Writing them as explicit
    // lists resolves identically to the useDefault wire shortcut
    // (pinned separately above), and parity proves the defaults reach
    // dequant end to end, not just the parser
    val cfg = H264Codec.CqmCfg(sps = Some(IndexedSeq(
      Some(H264Codec.Default4x4Intra), None, None,
      Some(H264Codec.Default4x4Inter), None, None,
      Some(H264Codec.Default8x8Intra), Some(H264Codec.Default8x8Inter))))
    val (ps, recons) = {
      val r = H264Codec.encodeGopForTest(frames(48, 32, 4), qp = 24,
        cqm = Some(cfg))
      (r._1, r._2)
    }
    val g = new H264Codec.GopDecoder
    ps.zip(recons).zipWithIndex.foreach { case ((p, e), i) =>
      val d = g.decodeAuYuv(p)
      assert(d.isDefined, s"frame $i")
      assert(java.util.Arrays.equals(d.get._2, e._1), s"frame $i luma")
      assert(java.util.Arrays.equals(d.get._3, e._2), s"frame $i cb")
      assert(java.util.Arrays.equals(d.get._4, e._3), s"frame $i cr")
    }
  }

  test("hostile inputs: tampered scaling-list regions reject or decode, never throw") {
    val (payloads, _, _) = H264Codec.cqmGopForTest(frames(48, 32, 4), qp = 24, leg = 0)
    val p0 = payloads.head
    // the SPS NAL sits at the front; scaling lists dominate its bytes
    for (i <- 6 until math.min(70, p0.length)) {
      val bad = p0.clone()
      bad(i) = (bad(i) ^ 0x5a).toByte
      val g = new H264Codec.GopDecoder
      g.decodeAu(bad) // must not throw (reject = None)
    }
  }
}
