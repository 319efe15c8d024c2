package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** H.264 B-slice (bi-predictive) round trips: POC-type-0 display
  * reordering, list0/list1 construction from POC order, per-MB
  * L0/L1/averaged-Bi mode selection, and plane-exact encoder/decoder
  * parity — the Intra_4x4/P-slice witness device extended to
  * bi-prediction. */
class H264BSliceSpec extends AnyFunSuite {

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

  private def shifted(src: MediaCodecs.Bmp, dx: Int, dy: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](src.width * src.height * 3)
    for (y <- 0 until src.height; x <- 0 until src.width) {
      val sx = math.max(0, math.min(src.width - 1, x - dx))
      val sy = math.max(0, math.min(src.height - 1, y - dy))
      System.arraycopy(src.rgb, (sy * src.width + sx) * 3, rgb, (y * src.width + x) * 3, 3)
    }
    MediaCodecs.Bmp(src.width, src.height, rgb)
  }

  private def blend(a: MediaCodecs.Bmp, b: MediaCodecs.Bmp): MediaCodecs.Bmp = {
    val rgb = Array.tabulate[Byte](a.rgb.length)(i =>
      (((a.rgb(i) & 0xff) + (b.rgb(i) & 0xff) + 1) >> 1).toByte)
    MediaCodecs.Bmp(a.width, a.height, rgb)
  }

  private def eq3(a: (Array[Byte], Array[Byte], Array[Byte]),
      b: (Array[Byte], Array[Byte], Array[Byte])): Boolean =
    java.util.Arrays.equals(a._1, b._1) && java.util.Arrays.equals(a._2, b._2) &&
      java.util.Arrays.equals(a._3, b._3)

  private def mad(a: Array[Byte], b: Array[Byte]): Double =
    a.iterator.zip(b.iterator)
      .map { case (p, q) => math.abs((p & 0xff) - (q & 0xff)) }
      .sum.toDouble / a.length

  test("IbbP GOP: decode equals encoder reconstruction; display order recovers") {
    val f0 = gradient(48, 32)
    val frames = (0 until 6).map(i => shifted(f0, 2 * i, i)) // smooth pan
    val (payloads, display, recon) =
      H264Codec.encodeGopBForTest(frames, qp = 26, bFrames = 2)
    // decode order: refs at display 0,3,5 each before their Bs
    assert(display == Seq(0, 3, 1, 2, 5, 4), display)
    val g = new H264Codec.GopDecoder
    payloads.zip(recon).zipWithIndex.foreach { case ((p, r), i) =>
      val dec = g.decodeAuYuv(p)
      assert(dec.isDefined, s"payload $i (display ${display(i)}) failed")
      assert(eq3((dec.get._2, dec.get._3, dec.get._4), r),
        s"payload $i: decode != encoder reconstruction")
    }
    // the public RGB surface, reordered to display order, stays faithful
    val rgbs = H264Codec.decodeGop(payloads)
    assert(rgbs.forall(_.isDefined))
    display.zip(rgbs).foreach { case (d, Some(back)) =>
      assert(mad(frames(d).rgb, back.rgb) < 8.0, s"display $d")
    }
  }

  test("mode selection: past-match -> L0, future-match -> L1, blend -> Bi pays") {
    val a = gradient(64, 48)
    val b = shifted(a, 3, 2)
    // three GOPs whose middle (B) frame matches the past ref, the
    // future ref, and their average — each decodes faithfully, and the
    // blend B costs no more than either single-list twin would (the
    // averaging mode exists exactly for cross-fades)
    for ((mid, tag) <- Seq((a, "L0"), (b, "L1"), (blend(a, b), "Bi"))) {
      val frames = Seq(a, mid, b)
      val (payloads, display, recon) =
        H264Codec.encodeGopBForTest(frames, qp = 26, bFrames = 1)
      assert(display == Seq(0, 2, 1))
      val g = new H264Codec.GopDecoder
      payloads.zip(recon).zipWithIndex.foreach { case ((p, r), i) =>
        val dec = g.decodeAuYuv(p)
        assert(dec.isDefined, s"$tag payload $i")
        assert(eq3((dec.get._2, dec.get._3, dec.get._4), r), s"$tag payload $i parity")
      }
      val rgbs = H264Codec.decodeGop(payloads)
      assert(mad(mid.rgb, rgbs(2).get.rgb) < 8.0, s"$tag middle frame fidelity")
      // a matched single-list/blended B compresses far below the IDR
      assert(payloads(2).length < payloads(0).length / 2,
        s"$tag B ${payloads(2).length}B vs IDR ${payloads(0).length}B")
    }
  }

  test("every two-partition B shape: 16x8/8x16 x L0/L1/Bi all decode bit-exactly") {
    // Table 7-14 types 4-21 never leave the production encoder
    // (16x16-only) — witness them with planned bitstreams, one shape
    // per MB across frames; fractional MVs mixed in so bi-prediction
    // averaging interacts with the interpolators
    def planes(wMbs: Int, hMbs: Int, seed: Int)
        : (Array[Byte], Array[Byte], Array[Byte]) = {
      val lw = wMbs * 16; val lh = hMbs * 16
      (Array.tabulate(lw * lh)(i => ((i * 7 + seed * 13) % 251).toByte),
        Array.tabulate(lw * lh / 4)(i => ((i * 5 + seed * 11) % 241).toByte),
        Array.tabulate(lw * lh / 4)(i => ((i * 3 + seed * 17) % 239).toByte))
    }
    val (r0y, r0cb, r0cr) = planes(2, 2, seed = 11)
    val (r1y, r1cb, r1cr) = planes(2, 2, seed = 12)
    val (sy, scb, scr) = planes(2, 2, seed = 13)
    // 18 two-partition types + the three 16x16 ones, 4 MBs per frame
    val allTypes = (1 to 21).toSeq
    allTypes.grouped(4).zipWithIndex.foreach { case (group, gi) =>
      val plan: (Int, Int) => (Int, Seq[(Int, Int)], Seq[(Int, Int)]) =
        (mx, my) => {
          val t = group(math.min(group.length - 1, my * 2 + mx))
          val nParts = if (t <= 3) 1 else 2
          val modes = t match {
            case 1 => Seq(1); case 2 => Seq(2); case 3 => Seq(3)
            case x => Seq(
              Seq(1,1),Seq(1,1),Seq(2,2),Seq(2,2),Seq(1,2),Seq(1,2),
              Seq(2,1),Seq(2,1),Seq(1,3),Seq(1,3),Seq(2,3),Seq(2,3),
              Seq(3,1),Seq(3,1),Seq(3,2),Seq(3,2),Seq(3,3),Seq(3,3))(x - 4)
          }
          val mvPool = Seq((2, 1), (-3, 5), (1, -2), (6, 0))
          val mvs0 = modes.zipWithIndex.collect {
            case (m, i) if m == 1 || m == 3 => mvPool(i % 4) }
          val mvs1 = modes.zipWithIndex.collect {
            case (m, i) if m == 2 || m == 3 => mvPool((i + 2) % 4) }
          (t, mvs0, mvs1)
        }
      val (_, enc, dec) = H264Codec.bPartitionRoundTripForTest(
        sy, scb, scr, r0y, r0cb, r0cr, r1y, r1cb, r1cr,
        wMbs = 2, hMbs = 2, qp = 26, plan)
      assert(dec.isDefined, s"type group $group failed to decode")
      assert(eq3(dec.get, enc), s"type group $group: decode != reconstruction")
    }
  }

  test("B poisoning: a B without its references is None; refs are unaffected by B loss") {
    val a = gradient(32, 32)
    val frames = Seq(a, shifted(a, 2, 0), shifted(a, 4, 0))
    val (payloads, display, _) = H264Codec.encodeGopBForTest(frames, qp = 26, bFrames = 1)
    assert(display == Seq(0, 2, 1))
    // the B payload alone has no DPB -> None, no crash
    assert(H264Codec.decodeGop(Seq(payloads(2))) == Seq(None))
    // dropping the B (non-ref, nal_ref_idc 0) loses only itself: the
    // refs decode identically without it
    val withB = H264Codec.decodeGop(payloads)
    val withoutB = H264Codec.decodeGop(Seq(payloads(0), payloads(1)))
    assert(withB(0).isDefined && withB(1).isDefined && withB(2).isDefined)
    assert(java.util.Arrays.equals(withB(1).get.rgb, withoutB(1).get.rgb))
    // corrupting the FUTURE reference poisons the B that lists it
    val bad = payloads(1).clone()
    bad(bad.length - 16) = (bad(bad.length - 16) ^ 0x5a).toByte
    val out = H264Codec.decodeGop(Seq(payloads(0), bad, payloads(2)))
    assert(out(0).isDefined && out(1).isEmpty && out(2).isEmpty,
      "corrupt future ref must poison the dependent B")
  }

  test("B streams reject what stays out of scope; POC type 2 B rejects") {
    val a = gradient(32, 32)
    val frames = Seq(a, shifted(a, 1, 1), shifted(a, 2, 2))
    val (payloads, _, _) = H264Codec.encodeGopBForTest(frames, qp = 26, bFrames = 1)
    // splice the B slice NAL behind a POC-type-2 SPS (the IPPP GOP's):
    // the decoder must reject the illegal combination, not misorder
    val ippp = H264Codec.encodeGop(frames, qp = 26)
    val g = new H264Codec.GopDecoder
    assert(g.decodeAu(ippp(0)).isDefined) // type-2 SPS + IDR now active
    // B payload carries its own type-0 SPS, so decode succeeds there;
    // instead extract JUST the B slice NAL (last NAL of the B payload)
    val units = H264Codec.nalUnits(payloads(2))
    val (s, e) = units.last
    val bareSlice = new Array[Byte](4 + (e - s))
    bareSlice(3) = 1
    System.arraycopy(payloads(2), s, bareSlice, 4, e - s)
    assert(g.decodeAu(bareSlice).isEmpty, "B slice under POC type 2 must reject")
  }

  test("hostile inputs: truncated/flipped B payloads never escape") {
    val a = gradient(32, 32)
    val frames = Seq(a, shifted(a, 1, 0), shifted(a, 2, 0))
    val (payloads, _, _) = H264Codec.encodeGopBForTest(frames, qp = 26, bFrames = 1)
    for (cut <- Seq(1, 5, 19, 64)) {
      val t = payloads(2).take(math.max(0, payloads(2).length - cut))
      H264Codec.decodeGop(Seq(payloads(0), payloads(1), t)) // no throw
    }
    for (pos <- 0 until payloads(2).length by 31) {
      val bad = payloads(2).clone(); bad(pos) = (bad(pos) ^ 0x5a).toByte
      H264Codec.decodeGop(Seq(payloads(0), payloads(1), bad)) // no throw
    }
  }
}
