package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** POC type 1 (r14, 8.2.1.2): the cyclic expected-POC derivation some
  * hardware/broadcast encoders emit instead of type 0 — FrameNumOffset
  * accumulation across frame_num wraps, the SPS cycle mapping of
  * absFrameNum, the non-reference offset, and the per-slice delta.
  * Witnessed by IbbP GOP round trips where the B reference lists are
  * built FROM the derived POCs: a wrong expected-POC anywhere flips
  * list0/list1 ordering or the display mapping and breaks plane
  * parity. The encoder solves delta = desired − expected through the
  * decoder's own accumulator, so the arithmetic is exercised on both
  * sides including the wrap leg. */
class H264PocType1Spec extends AnyFunSuite {

  private def frames(w: Int, h: Int, n: Int): Seq[MediaCodecs.Bmp] =
    (0 until n).map { t =>
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val x = i % w; val y = i / w
        val bg = (x * 3 + y * 5 + (x / 4) * 7) % 200
        val sx = (2 + t * 3) % math.max(1, w - 10)
        val v = if (x >= sx && x < sx + 8 && y >= 6 && y < 14) 255 else bg
        rgb(i * 3) = v.toByte
        rgb(i * 3 + 1) = ((v + 40) % 256).toByte
        rgb(i * 3 + 2) = ((v + 90) % 256).toByte
        i += 1
      }
      MediaCodecs.Bmp(w, h, rgb)
    }

  private def roundTrip(n: Int, bFrames: Int, deblock: Boolean = false,
      cabac: Boolean = false): Unit = {
    val fr = frames(48, 32, n)
    val (payloads, display, recons) = H264Codec.encodeGopBForTest(
      fr, qp = 26, bFrames = bFrames, deblock = deblock, cabac = cabac,
      pocType1 = true)
    val g = new H264Codec.GopDecoder
    payloads.zip(recons).zipWithIndex.foreach { case ((p, e), i) =>
      val d = g.decodeAuYuv(p)
      assert(d.isDefined, s"payload $i (display ${display(i)}) failed")
      assert(java.util.Arrays.equals(d.get._2, e._1), s"payload $i luma")
      assert(java.util.Arrays.equals(d.get._3, e._2), s"payload $i cb")
      assert(java.util.Arrays.equals(d.get._4, e._3), s"payload $i cr")
    }
  }

  test("IbbP GOP under POC type 1: plane parity in decode order") {
    roundTrip(n = 8, bFrames = 2)
  }

  test("POC type 1 with deblocking and CABAC") {
    roundTrip(n = 7, bFrames = 1, deblock = true, cabac = true)
  }

  test("frame_num wrap: a 40-frame GOP crosses MaxFrameNum = 16") {
    // 40 frames at bFrames = 1 -> 20 reference pictures, so frame_num
    // wraps 0..15 -> 0: the FrameNumOffset accumulator must add
    // MaxFrameNum on the wrap or every later expected POC collapses
    roundTrip(n = 40, bFrames = 1)
  }

  test("type-1 stream structure: the SPS carries the cycle, slices the delta") {
    val fr = frames(32, 32, 5)
    val (p1, _, _) = H264Codec.encodeGopBForTest(fr, qp = 26, bFrames = 2,
      pocType1 = true)
    val (p0, _, _) = H264Codec.encodeGopBForTest(fr, qp = 26, bFrames = 2)
    // different POC transports, identical pixels
    val g1 = new H264Codec.GopDecoder
    val g0 = new H264Codec.GopDecoder
    p1.zip(p0).foreach { case (a, b) =>
      assert(!java.util.Arrays.equals(a, b), "type-1 stream should differ")
      val d1 = g1.decodeAuYuv(a); val d0 = g0.decodeAuYuv(b)
      assert(d1.isDefined && d0.isDefined)
      assert(java.util.Arrays.equals(d1.get._2, d0.get._2),
        "cross-POC-type pixel parity")
    }
  }

  test("fixed vectors: frame POC = Min(Top, Bottom) for types 0 and 1") {
    // hand-derived from 8.2.1.1/8.2.1.2 + the 8.2.1 frame rule: a
    // negative delta_pic_order_cnt_bottom / offset_for_top_to_bottom /
    // delta[1] makes the BOTTOM field carry the frame's POC — the
    // values a decoder that discards those fields gets wrong
    def sps1(offTB: Int) = H264Codec.Sps(66, 30, 4, 1, 2, 2, 0, 0, 2, 16,
      true, pocDeltaAlwaysZero = false, pocOffsetNonRef = -4,
      pocCycle = Seq(6), pocOffsetTopToBottom = offTB)
    val st1 = new H264Codec.PocState
    val s = sps1(0)
    assert(H264Codec.framePocType1(s, idr = true, 3, 0, 0, 0, st1) == 0)
    assert(H264Codec.framePocType1(s, idr = false, 3, 1, 0, 0, st1) == 6)
    // non-ref: absFrameNum decrements, offset_for_non_ref applies
    assert(H264Codec.framePocType1(s, idr = false, 0, 2, 0, 0, st1) == 2)
    // wrap: frame_num 15 -> 0 adds MaxFrameNum to FrameNumOffset
    assert(H264Codec.framePocType1(s, idr = false, 3, 15, 0, 0, st1) == 90)
    assert(H264Codec.framePocType1(s, idr = false, 3, 0, 0, 0, st1) == 96)
    // negative offset_for_top_to_bottom_field + delta[1]
    val st1b = new H264Codec.PocState
    val sb = sps1(-3)
    assert(H264Codec.framePocType1(sb, idr = true, 3, 0, 0, 0, st1b) == -3)
    assert(H264Codec.framePocType1(sb, idr = false, 3, 1, 0, -2, st1b) == 1)
    // type 0: msb repair + negative delta_pic_order_cnt_bottom
    val s0 = H264Codec.Sps(66, 30, 4, 0, 2, 2, 0, 0, 2, log2MaxPocLsb = 4)
    val st0 = new H264Codec.PocState
    assert(H264Codec.framePocType0(s0, idr = true, 3, 0, 0, st0) == 0)
    assert(H264Codec.framePocType0(s0, idr = false, 3, 8, 0, st0) == 8)
    assert(H264Codec.framePocType0(s0, idr = false, 3, 12, 0, st0) == 12)
    assert(H264Codec.framePocType0(s0, idr = false, 3, 1, 0, st0) == 17)
    assert(H264Codec.framePocType0(s0, idr = false, 3, 4, -6, st0) == 14)
  }

  test("hostile inputs: tampered type-1 streams reject or decode, never throw") {
    val fr = frames(48, 32, 6)
    val (payloads, _, _) = H264Codec.encodeGopBForTest(fr, qp = 26,
      bFrames = 2, pocType1 = true)
    // corrupt the SPS cycle region of the first payload
    val p0 = payloads.head
    for (i <- 4 until math.min(30, p0.length)) {
      val bad = p0.clone()
      bad(i) = (bad(i) ^ 0x4a).toByte
      H264Codec.decode(bad) // must not throw
    }
    // truncated mid-GOP payloads
    payloads.drop(1).take(2).foreach { p =>
      val g = new H264Codec.GopDecoder
      g.decodeAu(payloads.head)
      g.decodeAu(p.take(p.length / 2)) // must not throw
    }
  }
}
