package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** 8.2.5.2 non-existing frames (r15): CONFORMANT frame_num gaps under
  * gaps_in_frame_num_value_allowed_flag = 1 — temporal-scalability and
  * RTP-origin streams rely on them — fill the DPB with inserted
  * "non-existing" frames so PicNum accounting, sliding-window
  * eviction, and default-list positions stay spec-exact. Witnessed by
  * encoder-reconstruction plane parity over scripted GOPs where every
  * existing frame's ref_idx resolves THROUGH the inserted entries: a
  * wrong insertion count, order, or eviction breaks byte equality (or
  * refuses). The r14 7.4.3 gate is regression-pinned: with the flag
  * CLEAR the same gapped bytes refuse, and a stream that PREDICTS from
  * a non-existing frame refuses instead of emitting zeros. */
class H264FrameGapSpec extends AnyFunSuite {

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

  test("gaps of width 1 and 2: non-existing frames occupy, evict, and " +
      "are evicted through the sliding window; real refs resolve exactly") {
    val (_, recons, decoded) =
      H264Codec.frameGapGopForTest(frames(48, 32, 4), qp = 24, leg = 0)
    parity(recons, decoded)
  }

  test("a 12-wide gap then a gap crossing the MaxFrameNum wrap " +
      "(…14, 15, 0…) keep PicNum accounting exact") {
    val (_, recons, decoded) =
      H264Codec.frameGapGopForTest(frames(48, 32, 4), qp = 24, leg = 1)
    parity(recons, decoded)
  }

  test("predicting FROM a non-existing frame refuses — never zeros") {
    val (_, _, decoded) =
      H264Codec.frameGapGopForTest(frames(48, 32, 4), qp = 24, leg = 2)
    assert(decoded.head.isDefined, "IDR decodes")
    assert(decoded.tail.forall(_.isEmpty),
      "every frame predicting from (or poisoned after) a non-existing reference must refuse")
  }

  test("the same gapped script with gaps_allowed CLEAR refuses at the " +
      "7.4.3 gate (the r14 dropped-AU protection is intact)") {
    val (_, _, decoded) =
      H264Codec.frameGapGopForTest(frames(48, 32, 4), qp = 24, leg = 3)
    assert(decoded.head.isDefined, "IDR decodes")
    assert(decoded.tail.forall(_.isEmpty), "gapped frames must refuse when the flag is 0")
  }

  test("MMCO 3 addressed at a non-existing frame refuses (8.2.5.2 " +
      "forbids long-term marking of inserted frames)") {
    val (_, _, decoded) =
      H264Codec.frameGapGopForTest(frames(48, 32, 4), qp = 24, leg = 4)
    assert(decoded.head.isDefined, "IDR decodes")
    assert(decoded(1).isEmpty, "the MMCO-3-on-non-existing frame must refuse")
  }
}
