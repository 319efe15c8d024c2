package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** H.264 P-slice (inter) round trips: motion-compensated decode pinned
  * bit-exactly against the encoder's own reconstruction (the Intra_4x4
  * witness device extended to inter) — full quarter-pel interpolation
  * grid, P_Skip, mixed intra-in-P slices, reference poisoning, and the
  * Table 9-5 inter CBP column's structure. */
class H264PSliceSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (x * 255 / math.max(1, w - 1)).toByte
      rgb(o + 1) = (y * 255 / math.max(1, h - 1)).toByte
      rgb(o + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
    }
    MediaCodecs.Bmp(w, h, rgb)
  }

  /** `src` translated by (dx, dy) pixels (edge-clamped reads). */
  private def shifted(src: MediaCodecs.Bmp, dx: Int, dy: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](src.width * src.height * 3)
    for (y <- 0 until src.height; x <- 0 until src.width) {
      val sx = math.max(0, math.min(src.width - 1, x - dx))
      val sy = math.max(0, math.min(src.height - 1, y - dy))
      System.arraycopy(src.rgb, (sy * src.width + sx) * 3, rgb, (y * src.width + x) * 3, 3)
    }
    MediaCodecs.Bmp(src.width, src.height, rgb)
  }

  private def planes(wMbs: Int, hMbs: Int, seed: Int)
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val lw = wMbs * 16; val lh = hMbs * 16
    (Array.tabulate(lw * lh)(i => ((i * 7 + seed * 13) % 251).toByte),
      Array.tabulate(lw * lh / 4)(i => ((i * 5 + seed * 11) % 241).toByte),
      Array.tabulate(lw * lh / 4)(i => ((i * 3 + seed * 17) % 239).toByte))
  }

  private def eq3(a: (Array[Byte], Array[Byte], Array[Byte]),
      b: (Array[Byte], Array[Byte], Array[Byte])): Boolean =
    java.util.Arrays.equals(a._1, b._1) && java.util.Arrays.equals(a._2, b._2) &&
      java.util.Arrays.equals(a._3, b._3)

  test("IPPP GOP: decoder planes equal the encoder reconstruction, frame by frame") {
    val f0 = gradient(48, 32)
    val frames = Seq(f0, shifted(f0, 2, 1), shifted(f0, 4, 2), shifted(f0, 6, 3))
    val (payloads, recon) = H264Codec.encodeGopForTest(frames, qp = 26)
    assert(payloads.length == 4 && recon.length == 4)
    val g = new H264Codec.GopDecoder
    payloads.zip(recon).zipWithIndex.foreach { case ((p, r), i) =>
      val dec = g.decodeAuYuv(p)
      assert(dec.isDefined, s"frame $i failed to decode")
      val (_, y, cb, cr) = dec.get
      assert(eq3((y, cb, cr), r), s"frame $i decode != encoder reconstruction")
    }
    // inter frames of a pure translation compress far below the IDR
    assert(payloads(1).length < payloads(0).length / 2,
      s"P frame ${payloads(1).length} vs IDR ${payloads(0).length}")
    // and the public RGB surface stays faithful
    val rgbs = H264Codec.decodeGop(payloads)
    assert(rgbs.forall(_.isDefined))
    frames.zip(rgbs).foreach { case (src, Some(back)) =>
      val mad = src.rgb.iterator.zip(back.rgb.iterator)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
        .sum.toDouble / src.rgb.length
      assert(mad < 8.0, s"mad $mad")
    }
  }

  test("every quarter-pel phase: encode/decode parity on the full interp grid") {
    val (refY, refCb, refCr) = planes(2, 2, seed = 1)
    val (srcY, srcCb, srcCr) = planes(2, 2, seed = 2)
    for (mvx <- 0 to 3; mvy <- 0 to 3) {
      // base displacements too: (-4|+8) full-pel plus the fraction
      for (base <- Seq((0, 0), (-4, 8))) {
        val mv = (base._1 + mvx, base._2 + mvy)
        val (_, enc, dec) = H264Codec.pRoundTripForTest(
          srcY, srcCb, srcCr, refY, refCb, refCr, wMbs = 2, hMbs = 2,
          qp = 24, forcedMv = Some(mv))
        assert(dec.isDefined, s"mv $mv failed to decode")
        assert(eq3(dec.get, enc), s"mv $mv: decode != encoder reconstruction")
      }
    }
  }

  test("P_Skip: a source equal to the reference encodes as one skip run") {
    val (refY, refCb, refCr) = planes(3, 2, seed = 5)
    val (payload, enc, dec) = H264Codec.pRoundTripForTest(
      refY.clone(), refCb.clone(), refCr.clone(), refY, refCb, refCr,
      wMbs = 3, hMbs = 2, qp = 26)
    // all 6 MBs skip: SPS+PPS+header+ue(6)+trailing — a few dozen bytes
    assert(payload.length < 40, s"all-skip payload ${payload.length}")
    assert(dec.isDefined)
    assert(eq3(dec.get, enc))
    assert(java.util.Arrays.equals(dec.get._1, refY), "skip must reproduce the reference")
  }

  test("intra macroblocks inside a P slice: parity holds across the mix") {
    val (refY, refCb, refCr) = planes(2, 2, seed = 3)
    val (srcY, srcCb, srcCr) = planes(2, 2, seed = 4)
    val (_, enc, dec) = H264Codec.pRoundTripForTest(
      srcY, srcCb, srcCr, refY, refCb, refCr, wMbs = 2, hMbs = 2,
      qp = 26, intraEvery = 3)
    assert(dec.isDefined)
    assert(eq3(dec.get, enc), "mixed inter/intra P slice parity")
  }

  test("a P frame without its reference decodes to None; corruption poisons the tail") {
    val f0 = gradient(32, 32)
    val frames = Seq(f0, shifted(f0, 1, 0), shifted(f0, 2, 0))
    val payloads = H264Codec.encodeGop(frames, qp = 26)
    // P payload alone: no reference -> None (and no crash)
    assert(H264Codec.decodeGop(Seq(payloads(1))) == Seq(None))
    // corrupt the middle P -> its slot AND the dependent tail are None
    val bad = payloads(1).clone()
    bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x5a).toByte
    val out = H264Codec.decodeGop(Seq(payloads(0), bad, payloads(2)))
    assert(out.head.isDefined)
    assert(out(1).isEmpty && out(2).isEmpty, "corrupt reference must poison dependents")
    // a fresh IDR after the corruption recovers
    val out2 = H264Codec.decodeGop(Seq(payloads(0), bad, payloads(0)))
    assert(out2(2).isDefined)
  }

  test("every inter partition shape: 16x8, 8x16, P_8x8 with all sub_mb_types") {
    val (refY, refCb, refCr) = planes(2, 2, seed = 7)
    val (srcY, srcCb, srcCr) = planes(2, 2, seed = 8)
    // one MB per shape across the 2x2-MB frame; fractional MVs mixed in
    // so MC and MV prediction interact across partition boundaries
    val plan: (Int, Int) => (Int, Seq[Int], Seq[(Int, Int)]) = {
      case (0, 0) => (1, Nil, Seq((4, 0), (-3, 5)))                // 16x8
      case (1, 0) => (2, Nil, Seq((1, 1), (0, -6)))                // 8x16
      case (0, 1) => (3, Seq(0, 1, 2, 3), // P_8x8, every sub type:
        Seq((2, 2),                        //   8x8
          (5, -1), (-2, 3),                //   8x4 top, bottom
          (0, 7), (6, 0),                  //   4x8 left, right
          (1, 0), (0, 1), (-1, 2), (3, 3))) //  4x4 z-order
      case _ => (4, Seq(0, 0, 0, 0), Seq((0, 0), (-4, 4), (8, 0), (2, -2)))
    }
    val (_, enc, dec) = H264Codec.pPartitionRoundTripForTest(
      srcY, srcCb, srcCr, refY, refCb, refCr, wMbs = 2, hMbs = 2,
      qp = 26, plan)
    assert(dec.isDefined, "partitioned P frame failed to decode")
    assert(eq3(dec.get, enc), "partition shapes: decode != encoder reconstruction")
  }

  test("raw Annex-B elementary stream: concatenated GOP decodes identically") {
    val f0 = gradient(48, 32)
    val frames = Seq(f0, shifted(f0, 2, 0), shifted(f0, 3, 1))
    val payloads = H264Codec.encodeGop(frames, qp = 26, avcc = false)
    val es = payloads.flatten.toArray // one .h264 file: NALs back to back
    val viaEs = H264Codec.decodeAnnexBStream(es)
    val viaGop = H264Codec.decodeGop(payloads)
    assert(viaEs.length == 3 && viaGop.length == 3)
    viaEs.zip(viaGop).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.isDefined && b.isDefined, s"frame $i")
      assert(java.util.Arrays.equals(a.get.rgb, b.get.rgb),
        s"frame $i: elementary-stream decode != per-payload GOP decode")
    }
  }

  test("multi-reference GOP (ref=3): decode equals encoder reconstruction, every MB ref forced") {
    // r12: x264's default baseline shape is ref=3 — per-MB ref_idx_l0
    // (te(v)) selecting from a 3-deep DPB ring. Force a deterministic
    // checkerboard of reference indices so every frame uses EVERY
    // available reference (clamped while the DPB fills), and pin the
    // decoder plane-exactly against the encoder's reconstruction.
    val f0 = gradient(48, 32)
    val frames = (0 until 6).map(i => shifted(f0, 2 * i, i))
    val (payloads, recon) = H264Codec.encodeGopForTest(frames, qp = 26,
      refFrames = 3, forcedRefIdx = Some((mx, my) => (mx + 2 * my) % 3))
    val g = new H264Codec.GopDecoder
    payloads.zip(recon).zipWithIndex.foreach { case ((p, r), i) =>
      val dec = g.decodeAuYuv(p)
      assert(dec.isDefined, s"frame $i failed to decode")
      val (_, y, cb, cr) = dec.get
      assert(eq3((y, cb, cr), r), s"frame $i decode != encoder reconstruction")
    }
    // the public RGB surface stays faithful through the ref churn
    val rgbs = H264Codec.decodeGop(payloads)
    assert(rgbs.forall(_.isDefined))
    frames.zip(rgbs).foreach { case (src, Some(back)) =>
      val mad = src.rgb.iterator.zip(back.rgb.iterator)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
        .sum.toDouble / src.rgb.length
      assert(mad < 8.0, s"mad $mad")
    }
  }

  test("multi-ref pays: alternating content picks the older reference via best-SAD") {
    // frames a,b,a,b,a where b is shifted beyond the search range: with
    // one reference, frame 2 must code large residuals against b; with
    // two, best-SAD selects ref_idx 1 (an exact match) and the payload
    // collapses — the real-world reason encoders default to ref>1
    val a = gradient(64, 48)
    val b = shifted(a, 12, 0) // beyond searchRange=4
    val frames = Seq(a, b, a, b, a)
    val one = H264Codec.encodeGop(frames, qp = 26, refFrames = 1)
    val two = H264Codec.encodeGop(frames, qp = 26, refFrames = 2)
    (2 until 5).foreach { i =>
      assert(two(i).length * 2 < one(i).length,
        s"frame $i: ref=2 ${two(i).length}B vs ref=1 ${one(i).length}B")
    }
    // and the ref=2 stream still decodes faithfully
    val rgbs = H264Codec.decodeGop(two)
    assert(rgbs.forall(_.isDefined))
    frames.zip(rgbs).foreach { case (src, Some(back)) =>
      val mad = src.rgb.iterator.zip(back.rgb.iterator)
        .map { case (p, q) => math.abs((p & 0xff) - (q & 0xff)) }
        .sum.toDouble / src.rgb.length
      assert(mad < 8.0, s"mad $mad")
    }
  }

  test("DPB discipline: an under-filled reference list rejects; eviction keeps parity") {
    val f0 = gradient(48, 32)
    val frames = (0 until 5).map(i => shifted(f0, i, 2 * i))
    val payloads = H264Codec.encodeGop(frames, qp = 26, refFrames = 3)
    // feeding IDR then frame 2 (skipping frame 1): frame 2's slice
    // declares a 2-deep list but the decoder's DPB holds only the IDR —
    // it must REJECT (None), not silently predict from the wrong frame;
    // frame 3 then has a poisoned chain; a re-fed IDR recovers
    val g = new H264Codec.GopDecoder
    assert(g.decodeAu(payloads(0)).isDefined)
    assert(g.decodeAu(payloads(2)).isEmpty, "under-filled DPB must reject")
    assert(g.decodeAu(payloads(3)).isEmpty, "chain stays poisoned")
    assert(g.decodeAu(payloads(0)).isDefined, "IDR recovers")
    // eviction path: a 2-deep ring over a longer GOP, both refs used
    // per MB, decode ≡ encoder reconstruction even after frames fall
    // out of the sliding window
    val long = (0 until 7).map(i => shifted(f0, 2 * i, 0))
    val (ps, recon) = H264Codec.encodeGopForTest(long, qp = 26,
      refFrames = 2, forcedRefIdx = Some((mx, my) => (mx + my) % 2))
    val g2 = new H264Codec.GopDecoder
    ps.zip(recon).zipWithIndex.foreach { case ((p, r), i) =>
      val dec = g2.decodeAuYuv(p)
      assert(dec.isDefined, s"frame $i failed")
      assert(eq3((dec.get._2, dec.get._3, dec.get._4), r), s"frame $i parity")
    }
  }

  test("Annex-B iterator materializes ONE access unit at a time") {
    // AU bytes must be copied from the stream only when the consumer
    // pulls that frame: decode frame 0, then clobber the stream bytes
    // PAST the first AU in place — frames 1+ must now fail, proving
    // they had not been materialized up front (the r11 shape copied
    // every AU into an ArrayBuffer before decoding — ~2x the stream)
    val f0 = gradient(48, 32)
    val frames = Seq(f0, shifted(f0, 2, 0), shifted(f0, 3, 1))
    val payloads = H264Codec.encodeGop(frames, qp = 26, avcc = false)
    val es = payloads.flatten.toArray
    val firstAuEnd = payloads.head.length // AU boundaries = payload bounds
    val it = H264Codec.decodeAnnexBIterator(es)
    // the iterator holds at most ONE prefetched AU: at construction
    // that is AU0; pulling frame 0 prefetches AU1 — so after a clobber
    // the prefetched AU1 still decodes but AU2 (not yet copied) cannot
    assert(it.next().isDefined, "frame 0")
    java.util.Arrays.fill(es, firstAuEnd, es.length, 0x5a.toByte)
    val rest = it.toSeq
    // AU grouping is itself lazy: the clobbered region no longer scans
    // as a slice NAL, so frame 2 either vanishes or comes back None —
    // but it must NOT decode (that would mean eager materialization)
    assert(rest.nonEmpty && rest.head.isDefined,
      "frame 1 was the single prefetched AU")
    assert(rest.length <= 2 && rest.drop(1).forall(_.isEmpty),
      "frame 2 decoded post-clobber — AUs were materialized eagerly")
    // and the un-mutated stream still decodes fully via the same path
    val es2 = payloads.flatten.toArray
    assert(H264Codec.decodeAnnexBIterator(es2).count(_.isDefined) == 3)
  }

  test("Table 9-5 inter CBP column: permutation + spec anchors + inverse") {
    val t = H264Codec.CbpInterByCodeNum
    assert(t.length == 48 && t.toSet == (0 until 48).toSet, "not a permutation")
    // anchors from Table 9-5: the uncoded MB gets codeNum 0, chroma-DC
    // only (cbp 16) gets codeNum 1, single luma groups come next
    assert(t(0) == 0 && t(1) == 16 && t(2) == 1 && t(3) == 2 && t(4) == 4)
    (0 until 48).foreach(cn => assert(H264Codec.CbpInterToCodeNum(t(cn)) == cn))
  }
}
