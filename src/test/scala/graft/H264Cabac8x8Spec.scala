package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** High-profile CABAC 8x8 residuals (r14, ctxBlockCat 5): the
  * transform_size_8x8_flag context path (9.3.3.1.1.10), the Table 9-43
  * significance position maps, and the 402-435 context families —
  * closing the last slice-layer refusal for x264-default-shaped
  * high-profile CABAC streams (cabac_init_idc 0).
  *
  * Witness stack (the one that shipped the r13 P/B columns): bin-level
  * residual round trips, encoder-reconstruction plane parity,
  * CROSS-ENTROPY-MODE parity (CAVLC and CABAC share every
  * prediction/transform kernel, so their reconstructions must be
  * byte-identical), structural pins on the Table 9-43 maps, an
  * entropy-efficiency canary per new context family, and hostile-input
  * safety. No conformant H.264 peer ships in this container, so
  * FOREIGN-stream conformance of the 399-435 init transcription is
  * unwitnessable here (same documented limitation as every init range
  * before it); the exact-termination gate keeps a diverged foreign
  * parse rejecting loudly instead of rendering garbage. */
class H264Cabac8x8Spec extends AnyFunSuite {

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

  test("Table 9-43 maps: structural pins") {
    val sig = H264Cabac.SigMap8x8
    val last = H264Cabac.LastMap8x8
    // 63 coded positions each (position 63's significance is implied)
    assert(sig.length == 63 && last.length == 63)
    // sig: all 15 context increments used, the low-frequency ramp
    // opens the map, and the DC position maps alone to inc 0
    assert(sig.toSet == (0 to 14).toSet, "sig map must cover inc 0-14")
    assert(sig.take(6).sameElements(Array(0, 1, 2, 3, 4, 5)))
    assert(sig.count(_ == 0) == 1 && sig(0) == 0, "only DC maps to inc 0")
    // last: monotone non-decreasing position buckets 0..6 with the
    // geometric sizes {1, 31, 16, 8, 4, 2, 1}
    assert(last.toSet == (0 to 6).toSet)
    last.sliding(2).foreach(p => assert(p(0) <= p(1), "last map not monotone"))
    assert((0 to 6).map(v => last.count(_ == v)) == Seq(1, 31, 16, 8, 4, 2, 1))
  }

  test("context init: 399-435 filled in both columns, legal at all QPs") {
    for (qp <- Seq(0, 10, 26, 40, 51); pb <- Seq(false, true)) {
      val cx = new H264Cabac.Ctx
      if (pb) cx.initPB(0, qp) else cx.initI(qp)
      for (i <- 399 to 435)
        assert(cx.state(i) >= 0 && cx.state(i) <= 63, s"ctx $i (pb=$pb)")
      for (i <- Seq(436, 450, 459)) // field-coded families stay unset
        assert(cx.state(i) == -1, s"field ctx $i unexpectedly filled")
    }
  }

  test("cat-5 residual blocks: bin-level round trips over sparse levels") {
    class Sink extends H264Cavlc.BitOut {
      val bits = new scala.collection.mutable.ArrayBuffer[Int]
      def u1(b: Int): Unit = bits += (b & 1)
      def u(v: Int, n: Int): Unit = { var i = n - 1; while (i >= 0) { u1((v >> i) & 1); i -= 1 } }
      def bytes: Array[Byte] = {
        val padded = bits ++ Seq.fill((8 - bits.length % 8) % 8)(0)
        padded.grouped(8).map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
      }
    }
    val rnd = new scala.util.Random(4242)
    val blocks = Seq.tabulate(200) { bi =>
      val b = new Array[Int](64)
      // density sweep: 1..32 nonzeros, magnitudes across the UEG0
      // prefix cap (1, small, 14, 15, deep suffix), both signs
      val n = 1 + rnd.nextInt(32)
      rnd.shuffle((0 until 64).toList).take(n).foreach { pos =>
        val mag = bi % 5 match {
          case 0 => 1
          case 1 => 1 + rnd.nextInt(5)
          case 2 => 14
          case 3 => 15
          case _ => 16 + rnd.nextInt(400)
        }
        b(pos) = if (rnd.nextBoolean()) mag else -mag
      }
      if (b.forall(_ == 0)) b(rnd.nextInt(64)) = 1
      b
    }
    for (qp <- Seq(12, 26, 40)) {
      val cxE = new H264Cabac.Ctx; cxE.initI(qp)
      val sink = new Sink
      val e = new H264Cabac.Enc(sink)
      blocks.foreach(b => H264Cabac.encodeResidualLevels(e, cxE,
        H264Cabac.Cat8x8, b, 64))
      e.terminate(1)
      val cxD = new H264Cabac.Ctx; cxD.initI(qp)
      val d = new H264Cabac.Dec(sink.bytes, 0)
      val out = new Array[Int](64)
      blocks.zipWithIndex.foreach { case (b, i) =>
        val n = H264Cabac.decodeResidualLevels(d, cxD, H264Cabac.Cat8x8, out, 64)
        assert(out.sameElements(b), s"block $i mismatch (qp $qp)")
        assert(n == b.count(_ != 0))
      }
      assert(d.terminate() == 1)
    }
  }

  test("entropy canary per new family: biased 8x8 blocks code near H") {
    // sparse blocks whose significance is ~20% per position: the coded
    // size must sit well under the raw significance-map cost and above
    // the entropy floor — grossly wrong context wiring (e.g. the
    // Table 9-43 map feeding out-of-family contexts) cannot do this
    class CountSink extends H264Cavlc.BitOut {
      var n = 0
      def u1(b: Int): Unit = n += 1
      def u(v: Int, nn: Int): Unit = n += nn
    }
    var s = 7L
    val blocks = Seq.fill(600) {
      val b = new Array[Int](64)
      var i = 0
      while (i < 64) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        if ((s >>> 40) % 5 == 0) b(i) = if (((s >>> 20) & 1) == 0) 1 else -1
        i += 1
      }
      if (b.forall(_ == 0)) b(0) = 1
      b
    }
    val cx = new H264Cabac.Ctx; cx.initPB(0, 26)
    val sink = new CountSink
    val e = new H264Cabac.Enc(sink)
    blocks.foreach(b => H264Cabac.encodeResidualLevels(e, cx,
      H264Cabac.Cat8x8, b, 64))
    e.terminate(1)
    val nnz = blocks.map(_.count(_ != 0)).sum
    // per-coefficient budget: H(0.2) sig bits + ~2.1 bits/nonzero
    // (level-1 TU bin + sign + last flags); raw coding would spend
    // 63 + 2·nnz bits per block
    val bits = sink.n.toDouble
    val raw = blocks.length * 63.0 + 2.0 * nnz
    val floor = blocks.length * 64 * 0.55 // below H(0.2)·64 is impossible
    assert(bits < 0.85 * raw, f"no compression over raw: $bits%.0f vs $raw%.0f")
    assert(bits > floor, f"impossible compression: $bits%.0f < $floor%.0f")
  }

  test("Intra_8x8 CABAC: decode == encoder reconstruction == CAVLC") {
    for ((w, h) <- Seq((48, 32), (64, 64), (34, 18)); qp <- Seq(18, 26, 34)) {
      val img = frame(w, h, seed = w + qp)
      val (pCavlc, ey, ecb, ecr) =
        H264Codec.encodeI8ForTest(img, qp, (_, best, _) => best)
      val (pCabac, ey2, ecb2, ecr2) =
        H264Codec.encodeI8ForTest(img, qp, (_, best, _) => best, cabac = true)
      // shared analysis + reconstruction kernels: encoder recon is
      // byte-identical across entropy modes by construction
      assert(java.util.Arrays.equals(ey, ey2) &&
        java.util.Arrays.equals(ecb, ecb2) && java.util.Arrays.equals(ecr, ecr2))
      val d1 = H264Codec.decodeYuv(pCavlc)
      val d2 = H264Codec.decodeYuv(pCabac)
      assert(d1.isDefined && d2.isDefined, s"decode failed at $w x $h qp $qp")
      assert(java.util.Arrays.equals(d1.get._2, ey) &&
        java.util.Arrays.equals(d2.get._2, ey), "luma decode != recon")
      assert(java.util.Arrays.equals(d1.get._3, d2.get._3) &&
        java.util.Arrays.equals(d1.get._4, d2.get._4),
        "cross-entropy chroma parity broke")
    }
  }

  test("Intra_8x8 CABAC: every 8.3.2.2 predictor through the flag path") {
    // forced round-robin over the 9 modes (availability permitting)
    val img = frame(64, 48, 11)
    def pick(bi: Int, best: Int, avail: Seq[Int]): Int = avail((bi * 3) % avail.length)
    val (p, ey, _, _) = H264Codec.encodeI8ForTest(img, 24, pick, cabac = true)
    val d = H264Codec.decodeYuv(p)
    assert(d.isDefined && java.util.Arrays.equals(d.get._2, ey))
  }

  test("Intra_8x8 CABAC with deblocking and chroma_qp_index_offset") {
    for (off <- Seq(-4, 0, 4)) {
      val img = frame(48, 48, 20 + off)
      val (p, ey, ecb, ecr) = H264Codec.encodeI8ForTest(img, 28,
        (_, best, _) => best, deblock = true, chromaQpOff = off, cabac = true)
      val d = H264Codec.decodeYuv(p)
      assert(d.isDefined, s"offset $off failed to decode")
      assert(java.util.Arrays.equals(d.get._2, ey) &&
        java.util.Arrays.equals(d.get._3, ecb) &&
        java.util.Arrays.equals(d.get._4, ecr), s"offset $off parity")
    }
  }

  test("inter 8x8 CABAC: P residual through the ctx-399 flag path") {
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
    val (_, encC, decC) = H264Codec.pInter8x8RoundTripForTest(
      srcY, srcCb, srcCr, refY, refCb, refCr, wMbs = 3, hMbs = 2,
      qp = 26, mvOf, cabac = true)
    assert(decC.isDefined, "CABAC inter-8x8 P frame failed to decode")
    assert(java.util.Arrays.equals(decC.get._1, encC._1) &&
      java.util.Arrays.equals(decC.get._2, encC._2) &&
      java.util.Arrays.equals(decC.get._3, encC._3),
      "CABAC inter 8x8: decode != encoder reconstruction")
    // cross-entropy: same planes/MVs through CAVLC reconstruct the same
    val (_, encV, decV) = H264Codec.pInter8x8RoundTripForTest(
      srcY, srcCb, srcCr, refY, refCb, refCr, wMbs = 3, hMbs = 2,
      qp = 26, mvOf, cabac = false)
    assert(decV.isDefined &&
      java.util.Arrays.equals(encV._1, encC._1) &&
      java.util.Arrays.equals(decV.get._1, decC.get._1),
      "inter 8x8 cross-entropy parity broke")
  }

  test("hostile inputs: tampered CABAC 8x8 streams reject, never throw") {
    val img = frame(64, 48, 8)
    val good = H264Codec.encode(img, qp = 26, intra8x8 = true, cabac = true)
    assert(H264Codec.decode(good).isDefined)
    var rejected = 0
    for (i <- good.length / 2 until good.length by 7) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x55).toByte
      // must return None or decode SOMETHING without throwing — the
      // exact-termination gate rejects diverged parses
      H264Codec.decode(bad) match {
        case None => rejected += 1
        case Some(_) => ()
      }
    }
    assert(rejected > 0, "no tamper was rejected — gate inactive?")
    for (cut <- Seq(good.length - 3, good.length / 2)) {
      assert(H264Codec.decode(good.take(cut)).isEmpty, s"truncated at $cut")
    }
  }

  test("cabac_init_idc 1/2 keep refusing loudly (CATALOG adjudication)") {
    // the P/B columns for idc 1/2 are untranscribed by decision; a
    // header carrying them must reject at the slice layer, not drift
    val cx = new H264Cabac.Ctx
    intercept[H264Cabac.CabacFormat] { cx.initPB(1, 26) }
    intercept[H264Cabac.CabacFormat] { cx.initPB(2, 26) }
  }
}
