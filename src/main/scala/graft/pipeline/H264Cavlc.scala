package graft.pipeline

/**
 * CAVLC residual coding (ITU-T H.264 clause 9.2) — the entropy layer
 * under [[H264Codec]]'s Intra_16x16 path: coeff_token (Table 9-5,
 * three nC-adaptive VLCs + the 6-bit FLC + the chroma-DC table),
 * trailing-one signs, suffix-adaptive level codes, total_zeros
 * (Tables 9-7/9-8 and 9-9) and run_before (Table 9-10), implemented
 * in BOTH directions so the codec's own streams round-trip.
 *
 * Verification posture (stated honestly): no conformant H.264 decoder
 * ships in this container, so the tables cannot be cross-witnessed
 * against foreign bitstreams here. What the specs DO pin: every VLC
 * table is prefix-free and Kraft-complete (sum 2^-len = 1 — a
 * transcription error in any single codeword almost surely breaks
 * this), known spec codewords are asserted verbatim
 * (H264CavlcSpec), and encode->decode round-trips are exact over
 * randomized coefficient vectors including every escape path.
 */
object H264Cavlc {

  // ---- Table 9-5: coeff_token, contexts 0 (0<=nC<2), 1 (2<=nC<4),
  // ---- 2 (4<=nC<8); entry (trailingOnes, totalCoeff) -> bit string.
  // Row format: totalCoeff -> per-trailingOnes codes (T1 0..min(3,TC)).
  private val CoeffTokenCtx0: Map[(Int, Int), String] = vlc(
    0 -> Seq("1"),
    1 -> Seq("000101", "01"),
    2 -> Seq("00000111", "000100", "001"),
    3 -> Seq("000000111", "00000110", "0000101", "00011"),
    4 -> Seq("0000000111", "000000110", "00000101", "000011"),
    5 -> Seq("00000000111", "0000000110", "000000101", "0000100"),
    6 -> Seq("0000000001111", "00000000110", "0000000101", "00000100"),
    7 -> Seq("0000000001011", "0000000001110", "00000000101", "000000100"),
    8 -> Seq("0000000001000", "0000000001010", "0000000001101", "0000000100"),
    9 -> Seq("00000000001111", "00000000001110", "0000000001001", "00000000100"),
    10 -> Seq("00000000001011", "00000000001010", "00000000001101", "0000000001100"),
    11 -> Seq("000000000001111", "000000000001110", "00000000001001", "00000000001100"),
    12 -> Seq("000000000001011", "000000000001010", "000000000001101", "00000000001000"),
    13 -> Seq("0000000000001111", "000000000000001", "000000000001001", "000000000001100"),
    14 -> Seq("0000000000001011", "0000000000001110", "0000000000001101", "000000000001000"),
    15 -> Seq("0000000000000111", "0000000000001010", "0000000000001001", "0000000000001100"),
    16 -> Seq("0000000000000100", "0000000000000110", "0000000000000101", "0000000000001000"))

  private val CoeffTokenCtx1: Map[(Int, Int), String] = vlc(
    0 -> Seq("11"),
    1 -> Seq("001011", "10"),
    2 -> Seq("000111", "00111", "011"),
    3 -> Seq("0000111", "001010", "001001", "0101"),
    4 -> Seq("00000111", "000110", "000101", "0100"),
    5 -> Seq("00000100", "0000110", "0000101", "00110"),
    6 -> Seq("000000111", "00000110", "00000101", "001000"),
    7 -> Seq("00000001111", "000000110", "000000101", "000100"),
    8 -> Seq("00000001011", "00000001110", "00000001101", "0000100"),
    9 -> Seq("000000001111", "00000001010", "00000001001", "000000100"),
    10 -> Seq("000000001011", "000000001110", "000000001101", "00000001100"),
    11 -> Seq("000000001000", "000000001010", "000000001001", "00000001000"),
    12 -> Seq("0000000001111", "0000000001110", "0000000001101", "000000001100"),
    13 -> Seq("0000000001011", "0000000001010", "0000000001001", "0000000001100"),
    14 -> Seq("0000000000111", "00000000001011", "0000000000110", "0000000001000"),
    15 -> Seq("00000000001001", "00000000001000", "00000000001010", "0000000000001"),
    16 -> Seq("00000000000111", "00000000000110", "00000000000101", "00000000000100"))

  private val CoeffTokenCtx2: Map[(Int, Int), String] = vlc(
    0 -> Seq("1111"),
    1 -> Seq("001111", "1110"),
    2 -> Seq("001011", "01111", "1101"),
    3 -> Seq("001000", "01100", "01110", "1100"),
    4 -> Seq("0001111", "01010", "01011", "1011"),
    5 -> Seq("0001011", "01000", "01001", "1010"),
    6 -> Seq("0001001", "001110", "001101", "1001"),
    7 -> Seq("0001000", "001010", "001001", "1000"),
    8 -> Seq("00001111", "0001110", "0001101", "01101"),
    9 -> Seq("00001011", "00001110", "0001010", "001100"),
    10 -> Seq("000001111", "00001010", "00001101", "0001100"),
    11 -> Seq("000001011", "000001110", "00001001", "00001100"),
    12 -> Seq("000001000", "000001010", "000001101", "00001000"),
    13 -> Seq("0000001101", "000000111", "000001001", "000001100"),
    14 -> Seq("0000001001", "0000001100", "0000001011", "0000001010"),
    15 -> Seq("0000000101", "0000001000", "0000000111", "0000000110"),
    16 -> Seq("0000000001", "0000000100", "0000000011", "0000000010"))

  /** chroma DC 2x2 (4:2:0) coeff_token, nC == -1. */
  private val CoeffTokenChromaDc: Map[(Int, Int), String] = vlc(
    0 -> Seq("01"),
    1 -> Seq("000111", "1"),
    2 -> Seq("000100", "000110", "001"),
    3 -> Seq("000011", "0000011", "0000010", "000101"),
    4 -> Seq("000010", "00000011", "00000010", "0000000"))

  private def vlc(rows: (Int, Seq[String])*): Map[(Int, Int), String] =
    rows.flatMap { case (tc, codes) =>
      codes.zipWithIndex.map { case (c, t1) => (t1, tc) -> c }
    }.toMap

  // ---- Tables 9-7/9-8: total_zeros for 4x4 blocks, by TotalCoeff 1..15;
  // ---- index in Seq = totalZeros value.
  private val TotalZeros4x4: Map[Int, Seq[String]] = Map(
    1 -> Seq("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
      "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
      "000000010", "000000001"),
    2 -> Seq("111", "110", "101", "100", "011", "0101", "0100", "0011",
      "0010", "00011", "00010", "000011", "000010", "000001", "000000"),
    3 -> Seq("0101", "111", "110", "101", "0100", "0011", "100", "011",
      "0010", "00011", "00010", "000001", "00001", "000000"),
    4 -> Seq("00011", "111", "0101", "0100", "110", "101", "100", "0011",
      "011", "0010", "00010", "00001", "00000"),
    5 -> Seq("0101", "0100", "0011", "111", "110", "101", "100", "011",
      "0010", "00001", "0001", "00000"),
    6 -> Seq("000001", "00001", "111", "110", "101", "100", "011", "010",
      "0001", "001", "000000"),
    7 -> Seq("000001", "00001", "101", "100", "011", "11", "010", "0001",
      "001", "000000"),
    8 -> Seq("000001", "0001", "00001", "011", "11", "10", "010", "001",
      "000000"),
    9 -> Seq("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
    10 -> Seq("00001", "00000", "001", "11", "10", "01", "0001"),
    11 -> Seq("0000", "0001", "001", "010", "1", "011"),
    12 -> Seq("0000", "0001", "01", "1", "001"),
    13 -> Seq("000", "001", "1", "01"),
    14 -> Seq("00", "01", "1"),
    15 -> Seq("0", "1"))

  // ---- Table 9-9(a): total_zeros for chroma DC (4:2:0), TotalCoeff 1..3.
  private val TotalZerosChromaDc: Map[Int, Seq[String]] = Map(
    1 -> Seq("1", "01", "001", "000"),
    2 -> Seq("1", "01", "00"),
    3 -> Seq("1", "0"))

  // ---- Table 9-10: run_before, by zerosLeft (capped at 7 = ">6").
  private val RunBefore: Map[Int, Seq[String]] = Map(
    1 -> Seq("1", "0"),
    2 -> Seq("1", "01", "00"),
    3 -> Seq("11", "10", "01", "00"),
    4 -> Seq("11", "10", "01", "001", "000"),
    5 -> Seq("11", "10", "011", "010", "001", "000"),
    6 -> Seq("11", "000", "001", "011", "010", "101", "100"),
    7 -> Seq("111", "110", "101", "100", "011", "010", "001", "0001",
      "00001", "000001", "0000001", "00000001", "000000001", "0000000001",
      "00000000001"))

  /** expose the tables for the structural spec (prefix-free + Kraft). */
  private[pipeline] def allVlcTables: Seq[(String, Iterable[String])] = Seq(
    "coeff_token ctx0" -> CoeffTokenCtx0.values,
    "coeff_token ctx1" -> CoeffTokenCtx1.values,
    "coeff_token ctx2" -> CoeffTokenCtx2.values,
    "coeff_token chromaDC" -> CoeffTokenChromaDc.values) ++
    TotalZeros4x4.map { case (tc, codes) => s"total_zeros tc=$tc" -> (codes: Iterable[String]) } ++
    TotalZerosChromaDc.map { case (tc, codes) => s"total_zeros cdc tc=$tc" -> (codes: Iterable[String]) } ++
    RunBefore.map { case (zl, codes) => s"run_before zl=$zl" -> (codes: Iterable[String]) }

  private[pipeline] def coeffTokenCode(nC: Int, trailingOnes: Int, totalCoeff: Int): String =
    if (nC >= 8) {
      if (totalCoeff == 0) "000011"
      else {
        val v = ((totalCoeff - 1) << 2) | trailingOnes
        (0 until 6).map(i => (v >> (5 - i)) & 1).mkString
      }
    } else if (nC >= 4) CoeffTokenCtx2((trailingOnes, totalCoeff))
    else if (nC >= 2) CoeffTokenCtx1((trailingOnes, totalCoeff))
    else if (nC >= 0) CoeffTokenCtx0((trailingOnes, totalCoeff))
    else CoeffTokenChromaDc((trailingOnes, totalCoeff))

  // ---------------- bit IO bridges ----------------

  /** Minimal bit interfaces so this object stays decoupled from
    * H264Codec's private reader/writer. */
  trait BitIn { def u1(): Int; def u(n: Int): Int }
  trait BitOut { def u1(b: Int): Unit; def u(v: Int, n: Int): Unit }

  private def writeBits(w: BitOut, code: String): Unit =
    code.foreach(c => w.u1(c - '0'))

  /** Decode one VLC from `codes` (bit-string -> value index). Linear
    * prefix match over <=62 short codes — plenty for a fixture codec. */
  private def readVlc(r: BitIn, codes: Iterable[(String, Int)]): Int = {
    val sb = new StringBuilder
    var remaining = codes
    while (sb.length <= 16) {
      sb.append(('0' + r.u1()).toChar)
      val s = sb.toString
      remaining.find(_._1 == s) match {
        case Some((_, v)) => return v
        case None =>
          remaining = remaining.filter(_._1.startsWith(s))
          if (remaining.isEmpty) throw new RuntimeException(s"bad VLC prefix $s")
      }
    }
    throw new RuntimeException("VLC overrun")
  }

  // ---------------- residual block decode (9.2) ----------------

  /**
   * Decode one CAVLC residual block into `coeffs` (zigzag order,
   * length maxNumCoeff). `nC` selects the coeff_token context (-1 for
   * chroma DC). Returns TotalCoeff (the value neighbor nC tracking
   * needs).
   */
  def decodeBlock(r: BitIn, coeffs: Array[Int], maxNumCoeff: Int, nC: Int): Int = {
    java.util.Arrays.fill(coeffs, 0)
    // coeff_token
    var totalCoeff = 0
    var trailingOnes = 0
    if (nC >= 8) {
      val v = r.u(6)
      if (v == 3) { totalCoeff = 0; trailingOnes = 0 }
      else { totalCoeff = (v >> 2) + 1; trailingOnes = v & 3 }
    } else {
      val table =
        if (nC >= 4) CoeffTokenCtx2 else if (nC >= 2) CoeffTokenCtx1
        else if (nC >= 0) CoeffTokenCtx0 else CoeffTokenChromaDc
      val enc = table.toSeq.map { case ((t1, tc), code) => code -> (tc * 4 + t1) }
      val v = readVlc(r, enc)
      totalCoeff = v / 4; trailingOnes = v % 4
    }
    if (totalCoeff == 0) return 0
    // levels, highest frequency first
    val levels = new Array[Int](totalCoeff)
    var i = 0
    while (i < trailingOnes) {
      levels(i) = if (r.u1() == 1) -1 else 1
      i += 1
    }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      var levelPrefix = 0
      while (r.u1() == 0) {
        levelPrefix += 1
        if (levelPrefix > 30) throw new RuntimeException("level_prefix runaway")
      }
      var levelCode = math.min(15, levelPrefix) << suffixLength
      if (suffixLength > 0 || levelPrefix >= 14) {
        var size = suffixLength
        if (levelPrefix == 14 && suffixLength == 0) size = 4
        if (levelPrefix >= 15) size = levelPrefix - 3
        levelCode += r.u(size)
      }
      if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
      if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
      if (i == trailingOnes && trailingOnes < 3) levelCode += 2
      levels(i) = if (levelCode % 2 == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // total_zeros
    var zerosLeft = 0
    if (totalCoeff < maxNumCoeff) {
      val codes = (if (nC == -1) TotalZerosChromaDc else TotalZeros4x4)(totalCoeff)
      zerosLeft = readVlc(r, codes.zipWithIndex)
    }
    // run_before + coefficient placement (highest freq first)
    var pos = totalCoeff - 1 + zerosLeft // index in the block, from 0
    i = 0
    while (i < totalCoeff) {
      var run = 0
      if (i == totalCoeff - 1) run = zerosLeft
      else if (zerosLeft > 0) {
        val codes = RunBefore(math.min(zerosLeft, 7))
        run = readVlc(r, codes.zipWithIndex)
      }
      coeffs(pos) = levels(i)
      pos -= run + 1
      zerosLeft -= run
      i += 1
    }
    totalCoeff
  }

  // ---------------- residual block encode (inverse of 9.2) ----------------

  /** Encode `coeffs` (zigzag order). Returns TotalCoeff. */
  def encodeBlock(w: BitOut, coeffs: Array[Int], maxNumCoeff: Int, nC: Int): Int = {
    // gather nonzero levels highest-frequency-first + runs
    val idx = (0 until maxNumCoeff).filter(coeffs(_) != 0).reverse
    val totalCoeff = idx.length
    require(totalCoeff <= maxNumCoeff)
    // trailing ones: up to 3 leading |1|s in hf-first order
    var trailingOnes = 0
    while (trailingOnes < math.min(3, totalCoeff) &&
      math.abs(coeffs(idx(trailingOnes))) == 1) trailingOnes += 1
    writeBits(w, coeffTokenCode(nC, trailingOnes, totalCoeff))
    if (totalCoeff == 0) return 0
    var i = 0
    while (i < trailingOnes) {
      w.u1(if (coeffs(idx(i)) < 0) 1 else 0)
      i += 1
    }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      val level = coeffs(idx(i))
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == trailingOnes && trailingOnes < 3) levelCode -= 2
      if (suffixLength == 0) {
        if (levelCode < 14) { writeBits(w, "0" * levelCode + "1") }
        else if (levelCode < 30) {
          writeBits(w, "0" * 14 + "1"); w.u(levelCode - 14, 4)
        } else {
          require(levelCode < 30 + 4096, s"level $level out of escape range")
          writeBits(w, "0" * 15 + "1"); w.u(levelCode - 30, 12)
        }
      } else {
        if (levelCode < (15 << suffixLength)) {
          writeBits(w, "0" * (levelCode >> suffixLength) + "1")
          w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
        } else {
          require(levelCode - (15 << suffixLength) < 4096, s"level $level out of escape range")
          writeBits(w, "0" * 15 + "1"); w.u(levelCode - (15 << suffixLength), 12)
        }
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    if (totalCoeff < maxNumCoeff) {
      val zerosTotal = idx.head - (totalCoeff - 1)
      val codes = (if (nC == -1) TotalZerosChromaDc else TotalZeros4x4)(totalCoeff)
      writeBits(w, codes(zerosTotal))
      // run_before per coefficient
      var zerosLeft = zerosTotal
      i = 0
      var pos = idx.head
      while (i < totalCoeff - 1 && zerosLeft > 0) {
        val next = idx(i + 1)
        val run = pos - next - 1
        writeBits(w, RunBefore(math.min(zerosLeft, 7))(run))
        zerosLeft -= run
        pos = next
        i += 1
      }
    }
    totalCoeff
  }
}
