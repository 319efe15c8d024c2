package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** CAVLC layer: structural validity of every VLC table (prefix-free +
  * Kraft-complete — a single mistranscribed codeword almost surely
  * breaks one of the two), known spec codewords, and exact
  * encode→decode round trips across randomized coefficient vectors
  * covering every level-escape path. */
class H264CavlcSpec extends AnyFunSuite {

  private class Buf extends H264Cavlc.BitOut with H264Cavlc.BitIn {
    val bits = ArrayBuffer.empty[Int]
    var rp = 0
    def u1(b: Int): Unit = bits += (b & 1)
    def u(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach(i => u1((v >> i) & 1))
    def u1(): Int = { val b = bits(rp); rp += 1; b }
    def u(n: Int): Int = (0 until n).foldLeft(0)((a, _) => (a << 1) | u1())
  }

  /** All maximal unused bit patterns of a prefix code (tree walk). */
  private def unusedPatterns(codes: Seq[String], maxDepth: Int): Seq[String] = {
    def walk(prefix: String, depth: Int): Seq[String] =
      if (codes.contains(prefix)) Nil
      else if (!codes.exists(_.startsWith(prefix))) Seq(prefix)
      else if (depth == 0) Nil
      else walk(prefix + "0", depth - 1) ++ walk(prefix + "1", depth - 1)
    walk("", maxDepth)
  }

  test("every VLC table is prefix-free; unused space is exactly the spec's") {
    H264Cavlc.allVlcTables.foreach { case (name, codes) =>
      val cs = codes.toSeq
      // prefix-free: no codeword is a prefix of another
      for (a <- cs; b <- cs if a != b)
        assert(!b.startsWith(a), s"$name: '$a' prefixes '$b'")
      val maxLen = cs.map(_.length).max
      val unused = unusedPatterns(cs, maxLen)
      // The spec's VLC tables are either Kraft-COMPLETE or leave
      // EXACTLY ONE unused codeword subtree, always the all-zeros
      // pattern near the maximum length (start-code-emulation hygiene:
      // Table 9-5 ctx0/1/2 at 15/13/10 bits, total_zeros tc=1 at 9).
      // Any single mistranscribed entry elsewhere moves or multiplies
      // the hole — this pins the transcription hard.
      assert(unused.isEmpty ||
        (unused.length == 1 && unused.head.forall(_ == '0') &&
          unused.head.length >= maxLen - 1),
        s"$name: unused space ${unused.mkString(",")} (want none or one all-zeros hole)")
    }
  }

  test("known Table 9-5 codewords (spec vectors)") {
    // the universally quoted entries of the 0<=nC<2 table
    assert(H264Cavlc.coeffTokenCode(0, 0, 0) == "1")
    assert(H264Cavlc.coeffTokenCode(0, 1, 1) == "01")
    assert(H264Cavlc.coeffTokenCode(0, 2, 2) == "001")
    assert(H264Cavlc.coeffTokenCode(0, 3, 3) == "00011")
    assert(H264Cavlc.coeffTokenCode(0, 0, 1) == "000101")
    // 2<=nC<4
    assert(H264Cavlc.coeffTokenCode(2, 0, 0) == "11")
    assert(H264Cavlc.coeffTokenCode(2, 1, 1) == "10")
    // nC>=8 FLC: TotalCoeff=0 is 000011; (tc,t1) packs as (tc-1)<<2|t1
    assert(H264Cavlc.coeffTokenCode(8, 0, 0) == "000011")
    assert(H264Cavlc.coeffTokenCode(8, 2, 5) == "010010")
    // chroma DC
    assert(H264Cavlc.coeffTokenCode(-1, 1, 1) == "1")
    assert(H264Cavlc.coeffTokenCode(-1, 0, 0) == "01")
  }

  private def roundTrip(coeffs: Array[Int], maxNumCoeff: Int, nC: Int): Unit = {
    val buf = new Buf
    val tcE = H264Cavlc.encodeBlock(buf, coeffs, maxNumCoeff, nC)
    val out = new Array[Int](maxNumCoeff)
    val tcD = H264Cavlc.decodeBlock(buf, out, maxNumCoeff, nC)
    assert(tcE == tcD, s"TotalCoeff $tcE vs $tcD for ${coeffs.mkString(",")}")
    assert(out.toSeq == coeffs.toSeq, s"${coeffs.mkString(",")} -> ${out.mkString(",")}")
    assert(buf.rp == buf.bits.length, "bits left over / overread")
  }

  test("block round trip: hand-picked shapes incl. every escape path") {
    // empty, single T1, dense T1s, large levels (suffix escapes),
    // max-coeff blocks, chroma DC
    roundTrip(Array.fill(16)(0), 16, 0)
    roundTrip(Array(1) ++ Array.fill(15)(0), 16, 0)
    roundTrip(Array(-1, 1, -1) ++ Array.fill(13)(0), 16, 0)
    roundTrip(Array(3, 0, -1, 1, 0, 0, 1) ++ Array.fill(9)(0), 16, 0)
    roundTrip(Array(14, 0, 0, -7) ++ Array.fill(12)(0), 16, 2)
    roundTrip(Array(100, -200, 14) ++ Array.fill(13)(0), 16, 4)   // 12-bit escapes
    roundTrip(Array(2000, -2000, 1, 1, 1) ++ Array.fill(11)(0), 16, 8)
    roundTrip(Array.tabulate(16)(i => if (i % 2 == 0) i + 1 else -(i + 1)), 16, 0)
    roundTrip(Array.fill(16)(1), 16, 1)
    roundTrip(Array.fill(16)(-1), 16, 9)
    roundTrip(Array(0, 0, 0, 5), 4, -1) // chroma DC, trailing zeros... leading
    roundTrip(Array(1, -1, 2, 0), 4, -1)
    roundTrip(Array(7, 0, 0, 0), 4, -1)
    roundTrip(Array.fill(15)(0) :+ 1, 16, 0) // lone highest-frequency coeff
  }

  test("block round trip: randomized sweep over contexts and densities") {
    val rng = new scala.util.Random(20260814L)
    for (trial <- 0 until 4000) {
      val chromaDc = trial % 5 == 4
      val maxNumCoeff = if (chromaDc) 4 else if (trial % 2 == 0) 16 else 15
      val nC = if (chromaDc) -1 else Seq(0, 1, 2, 3, 4, 5, 7, 8, 16)(trial % 9)
      val density = rng.nextDouble() * rng.nextDouble()
      val coeffs = Array.tabulate(maxNumCoeff) { _ =>
        if (rng.nextDouble() < density) {
          val mag = rng.nextInt(3) match {
            case 0 => 1 + rng.nextInt(2)
            case 1 => 1 + rng.nextInt(15)
            case _ => 1 + rng.nextInt(2000)
          }
          if (rng.nextBoolean()) mag else -mag
        } else 0
      }
      roundTrip(coeffs, maxNumCoeff, nC)
    }
  }
}
