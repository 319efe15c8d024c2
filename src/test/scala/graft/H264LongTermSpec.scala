package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Long-term reference pictures + MMCO (r14, 7.4.3.3 / 8.2.5.4): the
  * IDR long_term_reference_flag, adaptive marking ops 1/2/3/4/6, the
  * sliding window in the presence of long-term pictures, long-term
  * placement in the P and B default reference lists (8.2.4.2.1/.3),
  * idc-2 long-term list modification, and the op-5 full reset with
  * its frame_num/POC rebase. Witnessed by encoder-reconstruction
  * plane parity over scripted GOPs where every marking step changes
  * which PICTURE a later ref_idx resolves to — any mis-step breaks
  * byte equality. */
class H264LongTermSpec extends AnyFunSuite {

  /** Moving-square frames: textured background + a bright square whose
    * position depends on the frame index, so every reference picture
    * has distinct content and a wrong ref_idx resolution cannot hide. */
  private def frames(w: Int, h: Int, n: Int): Seq[MediaCodecs.Bmp] =
    (0 until n).map { t =>
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val x = i % w; val y = i / w
        val bg = (x * 3 + y * 5 + (x / 4) * 7) % 200
        val sx = 2 + t * 5
        val v = if (x >= sx && x < sx + 8 && y >= 6 && y < 14) 255 else bg
        rgb(i * 3) = v.toByte
        rgb(i * 3 + 1) = ((v + 40) % 256).toByte
        rgb(i * 3 + 2) = ((v + 90) % 256).toByte
        i += 1
      }
      MediaCodecs.Bmp(w, h, rgb)
    }

  private def parity(recons: Seq[(Array[Byte], Array[Byte], Array[Byte])],
      decoded: Seq[Option[(Array[Byte], Array[Byte], Array[Byte])]]): Unit = {
    assert(recons.length == decoded.length)
    recons.zip(decoded).zipWithIndex.foreach { case ((e, d), i) =>
      assert(d.isDefined, s"frame $i failed to decode")
      assert(java.util.Arrays.equals(d.get._1, e._1), s"frame $i luma")
      assert(java.util.Arrays.equals(d.get._2, e._2), s"frame $i cb")
      assert(java.util.Arrays.equals(d.get._3, e._3), s"frame $i cr")
    }
  }

  test("IDR long_term_reference_flag: the long-term picture survives " +
      "sliding-window eviction and sits at the list tail") {
    val (_, recons, decoded) =
      H264Codec.longTermGopForTest(frames(48, 32, 5), qp = 24, leg = 0)
    parity(recons, decoded)
  }

  test("MMCO ops 1/2/3/4/6 + idc-2 list modification round-trip") {
    val (_, recons, decoded) =
      H264Codec.longTermGopForTest(frames(48, 32, 5), qp = 24, leg = 1)
    parity(recons, decoded)
  }

  test("MMCO 5: the mid-GOP reset rebases frame_num/POC state") {
    // the final slice addresses the op-5 picture by its REBASED PicNum
    // through an idc-0 list modification — a decoder that skipped the
    // rebase finds no match and rejects, so parity + success pin it
    val (_, recons, decoded) =
      H264Codec.longTermGopForTest(frames(48, 32, 5), qp = 24, leg = 2)
    parity(recons, decoded)
  }

  test("B default lists place long-term refs at both tails (8.2.4.2.3)") {
    // short refs at POCs 0,4 (past) and 8,12 (future) of current POC 6;
    // long-terms at idx 2 and 0 — both lists must end L0, L2 ascending
    val (l0, l1) = H264Codec.bDefaultListsForTest(
      shortPocs = Seq(0, 4, 8, 12), longIdxs = Seq(2, 0), curPoc = 6)
    assert(l0 == Seq(("S", 4), ("S", 0), ("S", 8), ("S", 12),
      ("L", 0), ("L", 2)), s"l0: $l0")
    assert(l1 == Seq(("S", 8), ("S", 12), ("S", 4), ("S", 0),
      ("L", 0), ("L", 2)), s"l1: $l1")
    // long-term-only DPB: identical lists with >1 entry swap list1's
    // first two entries (the 8.2.4.2.3 disambiguation rule)
    val (m0, m1) = H264Codec.bDefaultListsForTest(
      shortPocs = Seq.empty, longIdxs = Seq(0, 1), curPoc = 6)
    assert(m0 == Seq(("L", 0), ("L", 1)))
    assert(m1 == Seq(("L", 1), ("L", 0)), s"swap rule: $m1")
  }

  test("hostile marking: out-of-order MMCO streams reject, never throw") {
    val (payloads, _, decoded) =
      H264Codec.longTermGopForTest(frames(48, 32, 5), qp = 24, leg = 1)
    assert(decoded.forall(_.isDefined))
    // skipping AU1 (which established MaxLongTermFrameIdx and lt@0)
    // leaves AU2's MMCO 3 addressing state that does not exist: the
    // decode must reject loudly (None), not drift
    val g = new H264Codec.GopDecoder
    assert(g.decodeAu(payloads(0)).isDefined)
    assert(g.decodeAu(payloads(2)).isEmpty, "dangling MMCO must reject")
    // replaying from the IDR recovers (poisoning is not sticky)
    assert(g.decodeAu(payloads(0)).isDefined)
    // byte-tampered marking regions reject or decode, never throw
    val p3 = payloads(3)
    for (i <- 20 until math.min(60, p3.length)) {
      val bad = p3.clone()
      bad(i) = (bad(i) ^ 0x6d).toByte
      val g2 = new H264Codec.GopDecoder
      g2.decodeAu(payloads(0)); g2.decodeAu(payloads(1)); g2.decodeAu(payloads(2))
      g2.decodeAu(bad) // must not throw
    }
  }

  test("frame_num gap: a missing access unit rejects, never silently " +
      "predicts from the wrong reference (7.4.3)") {
    // an IPPP GOP with AU 2 DROPPED from the feed: before r14 the
    // decoder would decode AU 3 against frame 1 silently; now the
    // continuity check rejects it and the next IDR recovers
    val fr = frames(48, 32, 5)
    val payloads = H264Codec.encodeGop(fr, qp = 26)
    val g = new H264Codec.GopDecoder
    assert(g.decodeAu(payloads(0)).isDefined)
    assert(g.decodeAu(payloads(1)).isDefined)
    assert(g.decodeAu(payloads(3)).isEmpty, "gapped AU must reject")
    // poisoning holds for the dependent, recovery via the IDR
    assert(g.decodeAu(payloads(4)).isEmpty)
    assert(g.decodeAu(payloads(0)).isDefined)
    // the full, ungapped feed still decodes end to end
    val g2 = new H264Codec.GopDecoder
    assert(payloads.forall(p => g2.decodeAu(p).isDefined))
  }
}
