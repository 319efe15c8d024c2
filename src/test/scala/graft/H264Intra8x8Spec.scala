package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** High-profile Intra_8x8 + the 8x8 integer transform (r13, 8.3.2 /
  * 8.5.12-8.5.13): kernel-level pins of the transform/quant tables,
  * every 8.3.2.2 predictor exercised both directions by
  * encoder-reconstruction parity, the 7.3.5.3.2 CAVLC interleave, the
  * 8.7 filter's 8x8-grid edge rule, the high-profile SPS/PPS
  * parse/emit round trip, and the chroma_qp_index_offset path (whose
  * silent-ignore was a real foreign-stream mis-decode risk). */
class H264Intra8x8Spec extends AnyFunSuite {

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

  test("Zigzag8x8 is a permutation with the spec's opening path") {
    val z = H264Transform8x8.Zigzag8x8
    assert(z.length == 64 && z.toSet == (0 until 64).toSet)
    assert(z.take(8).sameElements(Array(0, 1, 8, 16, 9, 2, 3, 10)))
    assert(z(63) == 63)
  }

  test("forward/quant/dequant/inverse reconstructs within a quant step") {
    val rnd = new scala.util.Random(77)
    for (qp <- Seq(0, 8, 16, 24, 32)) {
      var maxErr = 0
      for (_ <- 0 until 50) {
        val x = Array.fill(64)(rnd.nextInt(511) - 255)
        val q = H264Transform8x8.quant8x8(H264Transform8x8.forward8x8(x), qp)
        val r = H264Transform8x8.inverse8x8(H264Transform8x8.dequant8x8(q, qp))
        var k = 0
        while (k < 64) { maxErr = math.max(maxErr, math.abs(r(k) - x(k))); k += 1 }
      }
      // error grows with the quantizer step (~2^(qp/6)); a transform /
      // scale-table inconsistency would blow far past this envelope
      val bound = 3 * (1 << (qp / 6))
      assert(maxErr <= bound, s"qp $qp: max err $maxErr > $bound")
    }
  }

  test("forward is the exact adjoint: coefficient domain is diagonal") {
    // inverse -> forward round trips every coefficient position with
    // ZERO off-diagonal leakage, and the per-position gains are the
    // 2D basis norms (x 2^12 scales) CONSTANT within each of the six
    // quantizer classes — the structural identity that, with
    // MF·V·n² = 2^24, makes quant->dequant->inverse the identity map.
    // (This pin caught a wrong odd-part butterfly and a class-3/4
    // table swap that round trips could not.)
    import H264Transform8x8._
    def posClass(r: Int): Int = {
      val x = r & 7; val y = r >> 3; val cx = x & 3; val cy = y & 3
      if (cx == 0 && cy == 0) 0
      else if (cx % 2 == 1 && cy % 2 == 1) 1
      else if (cx == 2 && cy == 2) 2
      else if ((cx == 0 && cy == 2) || (cx == 2 && cy == 0)) 3
      else if (cx == 0 || cy == 0) 4
      else 5
    }
    // expected class gains = 2D basis norm² (64, 83521/1024, 25, 40,
    // 289/4, 1445/32), measured through the 2^12-scaled probes
    val expected = Array(64.0, 83521.0 / 1024, 25.0, 40.0, 289.0 / 4, 1445.0 / 32)
    for (p <- 0 until 64) {
      val c = new Array[Int](64); c(p) = 4096
      val w = forward8x8(inverse8x8(c))
      for (q <- 0 until 64 if q != p)
        assert(w(q) == 0, s"coefficient leakage $p -> $q: ${w(q)}")
      val gain = w(p) / 4096.0
      assert(math.abs(gain - expected(posClass(p))) < 1e-9,
        s"position $p class ${posClass(p)}: gain $gain")
    }
  }

  test("odd basis smoothness pins the inverse's output pairing") {
    // the spatial basis of coefficient (0,1) — the lowest odd
    // horizontal frequency — must be MONOTONE decreasing across each
    // row (1.5, 1.25, 0.75, 0.375, -0.375, ...): the swapped b2±b5
    // output pairing (a transcription hazard invisible to round
    // trips) permutes columns 1 and 6 and breaks this
    val c = new Array[Int](64); c(1) = 4096
    val s = H264Transform8x8.inverse8x8(c)
    val row = (0 until 8).map(x => s(x)) // first spatial row
    for (x <- 0 until 7)
      assert(row(x) > row(x + 1), s"row not monotone at $x: $row")
    assert(row(0) == -row(7) && row(1) == -row(6), "odd antisymmetry")
  }

  test("constant residual concentrates in DC; zero passes through") {
    val flat = Array.fill(64)(37)
    val w = H264Transform8x8.forward8x8(flat)
    assert(w(0) != 0)
    (1 until 64).foreach(k => assert(w(k) == 0, s"AC $k = ${w(k)}"))
    val zero = H264Transform8x8.inverse8x8(new Array[Int](64))
    assert(zero.forall(_ == 0))
  }

  test("predictor structure: V copies rows, H copies columns, DC is flat") {
    val top = Array.tabulate(16)(i => 40 + i * 3)
    val left = Array.tabulate(8)(i => 200 - i * 5)
    val (ft, fl, ftl) = H264Transform8x8.filterRefs8x8(top, left, 90, tlAvail = true)
    val v = H264Transform8x8.predLuma8x8(0, ft, fl, ftl)
    for (y <- 0 until 8; x <- 0 until 8) assert(v(y * 8 + x) == ft(x))
    val h = H264Transform8x8.predLuma8x8(1, ft, fl, ftl)
    for (y <- 0 until 8; x <- 0 until 8) assert(h(y * 8 + x) == fl(y))
    val dc = H264Transform8x8.predLuma8x8(2, ft, fl, ftl)
    assert(dc.distinct.length == 1)
    assert(dc(0) == ((ft.take(8).sum + fl.sum + 8) >> 4))
    // every directional mode stays inside the reference value range
    for (m <- 3 to 8) {
      val p = H264Transform8x8.predLuma8x8(m, ft, fl, ftl)
      val lo = (ft ++ fl :+ ftl).min; val hi = (ft ++ fl :+ ftl).max
      p.foreach(s => assert(s >= lo && s <= hi, s"mode $m sample $s"))
    }
  }

  test("8.3.2.2.1 reference filter: endpoints and interior taps") {
    val top = Array.tabulate(16)(i => 10 * i)
    val (ft, _, _) = H264Transform8x8.filterRefs8x8(top, null, 0, tlAvail = false)
    assert(ft(0) == (3 * top(0) + top(1) + 2) >> 2)
    assert(ft(7) == (top(6) + 2 * top(7) + top(8) + 2) >> 2)
    assert(ft(15) == (top(14) + 3 * top(15) + 2) >> 2)
  }

  test("Intra_8x8 round trip: decode equals encoder reconstruction") {
    for ((w, h, seed) <- Seq((64, 48, 1), (48, 32, 2), (62, 46, 3))) {
      val img = frame(w, h, seed)
      for (qp <- Seq(18, 26, 34)) {
        val (payload, ey, ecb, ecr) =
          H264Codec.encodeI8ForTest(img, qp, (_, best, _) => best)
        val dec = H264Codec.decodeYuv(payload)
        assert(dec.isDefined, s"decode failed ($w x $h qp $qp)")
        val (_, dy, dcb, dcr) = dec.get
        assert(java.util.Arrays.equals(dy, ey), s"luma parity ($w x $h qp $qp)")
        assert(java.util.Arrays.equals(dcb, ecb) && java.util.Arrays.equals(dcr, ecr),
          s"chroma parity ($w x $h qp $qp)")
      }
    }
  }

  test("every 8.3.2.2 predictor both directions (forced mode sweep)") {
    val img = frame(64, 64, 9)
    for (m <- 0 to 8) {
      val pick = (_: Int, _: Int, avail: Seq[Int]) =>
        if (avail.contains(m)) m else avail.max
      val (payload, ey, _, _) = H264Codec.encodeI8ForTest(img, 24, pick)
      val dec = H264Codec.decodeYuv(payload)
      assert(dec.isDefined, s"mode $m decode failed")
      assert(java.util.Arrays.equals(dec.get._2, ey), s"mode $m luma parity")
    }
    // rotate the choice so adjacent blocks disagree (mode-prediction
    // rem path + cross-block reference chains)
    val pick2 = (bi: Int, _: Int, avail: Seq[Int]) => avail((bi * 5 + 3) % avail.length)
    val (p2, ey2, _, _) = H264Codec.encodeI8ForTest(img, 30, pick2)
    val d2 = H264Codec.decodeYuv(p2)
    assert(d2.isDefined && java.util.Arrays.equals(d2.get._2, ey2))
  }

  test("deblocking on transform-8x8 MBs: only 8x8-grid luma edges filter") {
    val img = frame(64, 48, 4)
    val (payload, ey, ecb, ecr) =
      H264Codec.encodeI8ForTest(img, 30, (_, best, _) => best, deblock = true)
    val dec = H264Codec.decodeYuv(payload)
    assert(dec.isDefined, "deblocked 8x8 decode failed")
    assert(java.util.Arrays.equals(dec.get._2, ey) &&
      java.util.Arrays.equals(dec.get._3, ecb) &&
      java.util.Arrays.equals(dec.get._4, ecr),
      "deblocked 8x8 plane parity")
  }

  test("chroma_qp_index_offset: nonzero offsets round-trip exactly") {
    val img = frame(48, 32, 6)
    for (off <- Seq(-6, -2, 4, 12)) {
      val (payload, ey, ecb, ecr) = H264Codec.encodeI8ForTest(img, 28,
        (_, best, _) => best, chromaQpOff = off)
      val dec = H264Codec.decodeYuv(payload)
      assert(dec.isDefined, s"offset $off decode failed")
      assert(java.util.Arrays.equals(dec.get._2, ey), s"offset $off luma")
      assert(java.util.Arrays.equals(dec.get._3, ecb) &&
        java.util.Arrays.equals(dec.get._4, ecr), s"offset $off chroma")
    }
    // the offset genuinely changes the stream: +12 quantizes chroma
    // coarser than -6, so the payloads must differ
    val a = H264Codec.encode(img, qp = 28, intra8x8 = true, chromaQpOff = 12)
    val b = H264Codec.encode(img, qp = 28, intra8x8 = true, chromaQpOff = -6)
    assert(!java.util.Arrays.equals(a, b))
    assert(a.length < b.length, "coarser chroma should not grow the payload")
  }

  test("inter 8x8 transform: P residual round-trips through the flag path") {
    // 7.3.5 reads transform_size_8x8_flag for INTER macroblocks too
    // (after the CBP, when luma is coded and no partition is sub-8x8);
    // silently skipping it would misparse every high-profile P slice
    // carrying 8x8 residuals. Forced fractional MVs exercise the MC +
    // 8x8-residual add; parity pins decode == encoder reconstruction.
    def planes(wMbs: Int, hMbs: Int, seed: Int)
        : (Array[Byte], Array[Byte], Array[Byte]) = {
      val lw = wMbs * 16; val lh = hMbs * 16
      (Array.tabulate(lw * lh)(i => ((i * 7 + seed * 13) % 251).toByte),
        Array.tabulate(lw * lh / 4)(i => ((i * 5 + seed * 11) % 241).toByte),
        Array.tabulate(lw * lh / 4)(i => ((i * 3 + seed * 17) % 239).toByte))
    }
    val (refY, refCb, refCr) = planes(3, 2, seed = 2)
    val (srcY, srcCb, srcCr) = planes(3, 2, seed = 6)
    val mvOf = (mx: Int, my: Int) => ((mx * 3 - my) % 6 - 2, (my * 5 + mx) % 5 - 2)
    val (_, enc, dec) = H264Codec.pInter8x8RoundTripForTest(
      srcY, srcCb, srcCr, refY, refCb, refCr, wMbs = 3, hMbs = 2,
      qp = 26, mvOf)
    assert(dec.isDefined, "inter-8x8 P frame failed to decode")
    assert(java.util.Arrays.equals(dec.get._1, enc._1) &&
      java.util.Arrays.equals(dec.get._2, enc._2) &&
      java.util.Arrays.equals(dec.get._3, enc._3),
      "inter 8x8: decode != encoder reconstruction")
  }

  test("high-profile paths coexist: CABAC 8x8 (r14) and baseline decode") {
    val img = frame(32, 32, 5)
    // CABAC + 8x8 decodes since r14 (ctxBlockCat-5 — H264Cabac8x8Spec)
    assert(H264Codec.decode(
      H264Codec.encode(img, qp = 26, intra8x8 = true, cabac = true)).isDefined)
    // a baseline stream still decodes (PPS extension absent)
    assert(H264Codec.decode(H264Codec.encode(img, qp = 26)).isDefined)
  }

  test("hostile inputs: tampered/truncated 8x8 streams reject, never throw") {
    val img = frame(64, 48, 8)
    val good = H264Codec.encode(img, qp = 26, intra8x8 = true)
    assert(H264Codec.decode(good).isDefined)
    for (cut <- Seq(1, 5, good.length / 3))
      assert(H264Codec.decode(good.take(good.length - cut)).isEmpty)
    var i = good.length / 2
    var n = 0
    while (i < good.length && n < 40) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x3c).toByte
      H264Codec.decode(bad) // Option-clean, never an escape
      n += 1
      i += 4
    }
    assert(n > 10)
  }

  test("intra8x8 payload is competitive with intra4x4 on smooth content") {
    // the 8x8 transform exists for smooth/high-res content: on a
    // gradient image it should not be dramatically worse than 4x4
    // (usually better — fewer mode fields and longer basis functions)
    val img = frame(64, 64, 11)
    val s8 = H264Codec.encode(img, qp = 26, intra8x8 = true).length
    val s4 = H264Codec.encode(img, qp = 26, intra4x4 = true).length
    assert(s8 < s4 * 13 / 10, s"8x8 $s8 B vs 4x4 $s4 B")
  }
}
