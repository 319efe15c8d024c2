package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** B_8x8 sub-macroblock partitions (r13, Table 7-17 + 7.3.5.2): every
  * sub shape (8x8/8x4/4x8/4x4 x L0/L1/Bi) plus B_Direct_8x8 subs under
  * BOTH direct derivations and BOTH entropy coders, witnessed by the
  * hand-built-syntax round-trip hook (the production encoder never
  * emits B_8x8 — same method that witnessed the P partitions). */
class H264B8x8Spec extends AnyFunSuite {

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

  // MV counts per sub type: L0/L1 shapes draw n from their list, Bi
  // draws n from both
  private def mvsFor(subTypes: Seq[Int], base: Int): (Seq[(Int, Int)], Seq[(Int, Int)]) = {
    var l0 = Vector.empty[(Int, Int)]
    var l1 = Vector.empty[(Int, Int)]
    subTypes.foreach { t =>
      val (m, _, _, n) = t match {
        case 0 => (-1, 2, 2, 1)
        case 1 => (1, 2, 2, 1); case 2 => (2, 2, 2, 1); case 3 => (3, 2, 2, 1)
        case 4 => (1, 2, 1, 2); case 5 => (1, 1, 2, 2)
        case 6 => (2, 2, 1, 2); case 7 => (2, 1, 2, 2)
        case 8 => (3, 2, 1, 2); case 9 => (3, 1, 2, 2)
        case 10 => (1, 1, 1, 4); case 11 => (2, 1, 1, 4)
        case _ => (3, 1, 1, 4)
      }
      if (m == 1 || m == 3)
        l0 ++= (0 until n).map(k => ((base + k) % 9 - 4, (base + 2 * k) % 7 - 3))
      if (m == 2 || m == 3)
        l1 ++= (0 until n).map(k => ((base + 3 * k) % 7 - 3, (base + k) % 9 - 4))
    }
    (l0, l1)
  }

  test("every sub shape round-trips: CAVLC and CABAC, both direct modes") {
    val (r0y, r0cb, r0cr) = planes(2, 2, seed = 3)
    val (r1y, r1cb, r1cr) = planes(2, 2, seed = 5)
    val (srcY, srcCb, srcCr) = planes(2, 2, seed = 9)
    // four MBs cover: all-direct; L0 shapes; L1 shapes; Bi + 4x4 mix
    val mbPlans: Map[(Int, Int), Seq[Int]] = Map(
      (0, 0) -> Seq(0, 0, 0, 0),    // all B_Direct_8x8
      (1, 0) -> Seq(1, 4, 5, 10),   // every L0 shape
      (0, 1) -> Seq(2, 6, 7, 11),   // every L1 shape
      (1, 1) -> Seq(3, 8, 9, 12))   // every Bi shape
    val plan = (mx: Int, my: Int) => {
      val subs = mbPlans((mx, my))
      val (l0, l1) = mvsFor(subs, base = mx + 2 * my + 1)
      (subs, l0, l1)
    }
    for (cabac <- Seq(false, true); spatial <- Seq(false, true)) {
      val (_, enc, dec) = H264Codec.b8x8RoundTripForTest(
        srcY, srcCb, srcCr, r0y, r0cb, r0cr, r1y, r1cb, r1cr,
        wMbs = 2, hMbs = 2, qp = 26, plan, cabac = cabac,
        directSpatial = spatial)
      assert(dec.isDefined, s"B_8x8 decode failed (cabac=$cabac spatial=$spatial)")
      assert(eq3(dec.get, enc),
        s"B_8x8 decode != encoder reconstruction (cabac=$cabac spatial=$spatial)")
    }
  }

  test("B sub_mb_type CABAC tree: all 13 values round-trip at bin level") {
    // through a full slice: one MB per value in a 13-MB-wide frame
    // would be heavy; instead a 2x2 frame cycling all values across
    // two hook invocations (values 0-6, then 7-12 + direct)
    val (r0y, r0cb, r0cr) = planes(2, 2, seed = 1)
    val (r1y, r1cb, r1cr) = planes(2, 2, seed = 2)
    val (srcY, srcCb, srcCr) = planes(2, 2, seed = 4)
    for (group <- Seq(Seq(Seq(0, 1, 2, 3), Seq(4, 5, 6, 0), Seq(1, 2, 3, 4), Seq(5, 6, 0, 1)),
      Seq(Seq(7, 8, 9, 10), Seq(11, 12, 0, 7), Seq(8, 9, 10, 11), Seq(12, 0, 7, 8)))) {
      val plan = (mx: Int, my: Int) => {
        val subs = group(my * 2 + mx)
        val (l0, l1) = mvsFor(subs, base = mx + my + 2)
        (subs, l0, l1)
      }
      val (_, enc, dec) = H264Codec.b8x8RoundTripForTest(
        srcY, srcCb, srcCr, r0y, r0cb, r0cr, r1y, r1cb, r1cr,
        wMbs = 2, hMbs = 2, qp = 24, plan, cabac = true)
      assert(dec.isDefined && eq3(dec.get, enc), s"group $group")
    }
  }

  test("hostile: corrupt B_8x8 payloads reject, never throw") {
    val (r0y, r0cb, r0cr) = planes(2, 2, seed = 3)
    val (r1y, r1cb, r1cr) = planes(2, 2, seed = 5)
    val (srcY, srcCb, srcCr) = planes(2, 2, seed = 9)
    val plan = (mx: Int, my: Int) => {
      val subs = Seq(3, 8, 9, 12)
      val (l0, l1) = mvsFor(subs, base = mx + my + 1)
      (subs, l0, l1)
    }
    for (cabac <- Seq(false, true)) {
      val (payload, _, dec) = H264Codec.b8x8RoundTripForTest(
        srcY, srcCb, srcCr, r0y, r0cb, r0cr, r1y, r1cb, r1cr,
        wMbs = 2, hMbs = 2, qp = 26, plan, cabac = cabac)
      assert(dec.isDefined)
      var i = payload.length / 2
      var n = 0
      while (i < payload.length && n < 30) {
        val bad = payload.clone()
        bad(i) = (bad(i) ^ 0x4b).toByte
        // fresh decoder without seeded refs: must simply refuse
        H264Codec.decodeGop(Seq(bad))
        n += 1
        i += 5
      }
      assert(n > 10)
    }
  }
}
