package graft.pipeline

/**
 * H.264 integer transforms, (de)quantization, and intra prediction
 * (clauses 8.3, 8.5 — the canonical flat-scaling-list forms every
 * baseline implementation uses):
 *
 *  - 4x4 core transform / inverse (8.5.12.2's butterfly with the >>1
 *    odd taps; final (x+32)>>6 rounding),
 *  - 4x4 Hadamard for the Intra_16x16 luma DC plane (8.5.10) and the
 *    2x2 chroma DC transform (8.5.11),
 *  - MF/V quant scale tables with the three position classes,
 *  - Intra_16x16 luma prediction (V/H/DC/Plane, 8.3.3) and 8x8 chroma
 *    prediction (DC/H/V/Plane, 8.3.4).
 */
object H264Transform {

  /** zigzag scan: scan index -> raster index within a 4x4 block. */
  val Zigzag4x4: Array[Int] = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** luma 4x4 block decoding order within a MB -> (x4, y4) offsets. */
  val LumaBlockOrder: Array[(Int, Int)] = Array(
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))

  // quant scale tables, indexed [qp % 6][positionClass]
  private val MF = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490),
    Array(10082, 4194, 6554), Array(9362, 3647, 5825),
    Array(8192, 3355, 5243), Array(7282, 2893, 4559))
  private val V = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  /** position class of raster index 0..15: 0 for (even,even) corners of
    * the even lattice, 1 for (odd,odd), 2 mixed. */
  private def posClass(raster: Int): Int = {
    val x = raster & 3; val y = raster >> 2
    if (x % 2 == 0 && y % 2 == 0) 0 else if (x % 2 == 1 && y % 2 == 1) 1 else 2
  }

  /** QPc from QPy (Table 8-15, chroma_qp_index_offset = 0). */
  def chromaQp(qpY: Int): Int =
    if (qpY < 30) qpY
    else Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
      38, 38, 38, 39, 39, 39, 39)(qpY - 30)

  // ---------------- 4x4 core transform ----------------

  /** forward core transform W = C X C^T (in place on a raster 4x4). */
  def forward4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    // rows
    var i = 0
    while (i < 4) {
      val o = i * 4
      val s0 = x(o) + x(o + 3); val s1 = x(o + 1) + x(o + 2)
      val d0 = x(o) - x(o + 3); val d1 = x(o + 1) - x(o + 2)
      t(o) = s0 + s1; t(o + 1) = 2 * d0 + d1
      t(o + 2) = s0 - s1; t(o + 3) = d0 - 2 * d1
      i += 1
    }
    val w = new Array[Int](16)
    i = 0
    while (i < 4) {
      val s0 = t(i) + t(12 + i); val s1 = t(4 + i) + t(8 + i)
      val d0 = t(i) - t(12 + i); val d1 = t(4 + i) - t(8 + i)
      w(i) = s0 + s1; w(4 + i) = 2 * d0 + d1
      w(8 + i) = s0 - s1; w(12 + i) = d0 - 2 * d1
      i += 1
    }
    w
  }

  /** inverse core transform (8.5.12.2), result includes (x+32)>>6. */
  def inverse4x4(d: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) { // horizontal
      val o = i * 4
      val e0 = d(o) + d(o + 2); val e1 = d(o) - d(o + 2)
      val e2 = (d(o + 1) >> 1) - d(o + 3); val e3 = d(o + 1) + (d(o + 3) >> 1)
      t(o) = e0 + e3; t(o + 1) = e1 + e2; t(o + 2) = e1 - e2; t(o + 3) = e0 - e3
      i += 1
    }
    val r = new Array[Int](16)
    i = 0
    while (i < 4) { // vertical
      val e0 = t(i) + t(8 + i); val e1 = t(i) - t(8 + i)
      val e2 = (t(4 + i) >> 1) - t(12 + i); val e3 = t(4 + i) + (t(12 + i) >> 1)
      r(i) = (e0 + e3 + 32) >> 6; r(4 + i) = (e1 + e2 + 32) >> 6
      r(8 + i) = (e1 - e2 + 32) >> 6; r(12 + i) = (e0 - e3 + 32) >> 6
      i += 1
    }
    r
  }

  // ---------------- quant / dequant ----------------

  /** Flat 4x4 weight scale (Baseline/Main and flag-0 High): all 16. */
  val Flat16: Array[Int] = Array.fill(16)(16)

  /** quantize forward-transform coefficients (intra rounding f = 2^qbits/3). */
  def quant4x4(w: Array[Int], qp: Int, skipDc: Boolean): Array[Int] =
    quant4x4(w, qp, skipDc, Flat16)

  /** Weighted forward quant (non-normative): the effective quantizer
    * step scales by weightScale/16 per position, so the forward side
    * divides MF by the same ratio — recon stays centered on the source
    * under a custom matrix. Flat weight reduces to the legacy form. */
  def quant4x4(w: Array[Int], qp: Int, skipDc: Boolean, wgt: Array[Int]): Array[Int] = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val m = MF(qp % 6)
    Array.tabulate(16) { r =>
      if (skipDc && r == 0) 0
      else {
        val c = w(r)
        val lvl = ((math.abs(c).toLong * m(posClass(r)) * 16 / wgt(r) + f) >> qbits).toInt
        if (c < 0) -lvl else lvl
      }
    }
  }

  /** dequantize AC/full 4x4 coefficients (flat lists): d = c·V·2^(qp/6). */
  def dequant4x4(c: Array[Int], qp: Int, skipDc: Boolean): Array[Int] =
    dequant4x4(c, qp, skipDc, Flat16)

  /** General 8.5.12.1 dequant: LevelScale4x4 = weightScale(i,j) ·
    * normAdjust4x4(m, class) (= [[V]]); qP < 24 takes the rounding
    * branch. With the flat weight 16 this is bit-exact to the legacy
    * `c·V·2^(qp/6)` form for every qp (16·V >> (4−qp/6) divides
    * evenly and the 2^(3−qp/6) addend shifts out), pinned in
    * H264CqmSpec. */
  def dequant4x4(c: Array[Int], qp: Int, skipDc: Boolean, wgt: Array[Int]): Array[Int] = {
    val v = V(qp % 6)
    if (qp >= 24) {
      val sh = qp / 6 - 4
      Array.tabulate(16) { r =>
        if (skipDc && r == 0) c(0) // DC injected separately by the caller
        else (c(r) * wgt(r) * v(posClass(r))) << sh
      }
    } else {
      val sh = 4 - qp / 6
      val f = 1 << (sh - 1)
      Array.tabulate(16) { r =>
        if (skipDc && r == 0) c(0)
        else (c(r) * wgt(r) * v(posClass(r)) + f) >> sh
      }
    }
  }

  // ---------------- Intra_16x16 luma DC plane (4x4 Hadamard) ----------------

  def hadamard4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val s0 = x(o) + x(o + 3); val s1 = x(o + 1) + x(o + 2)
      val d0 = x(o) - x(o + 3); val d1 = x(o + 1) - x(o + 2)
      t(o) = s0 + s1; t(o + 1) = d0 + d1; t(o + 2) = s0 - s1; t(o + 3) = d0 - d1
      i += 1
    }
    val w = new Array[Int](16)
    i = 0
    while (i < 4) {
      val s0 = t(i) + t(12 + i); val s1 = t(4 + i) + t(8 + i)
      val d0 = t(i) - t(12 + i); val d1 = t(4 + i) - t(8 + i)
      w(i) = s0 + s1; w(4 + i) = d0 + d1; w(8 + i) = s0 - s1; w(12 + i) = d0 - d1
      i += 1
    }
    w
  }

  /** forward DC path: Hadamard then quant with TWO extra shift bits —
    * the unnormalized 4x4 Hadamard pair carries gain 16 (vs the core
    * transform's 4 already absorbed in MF·V), so the forward side
    * divides by the extra 4 (JM folds one half into its dct4x4dc). */
  def quantLumaDc(dc: Array[Int], qp: Int, w00: Int = 16): Array[Int] = {
    val w = hadamard4x4(dc)
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val m = MF(qp % 6)(0)
    w.map(c => {
      val lvl = ((math.abs(c).toLong * m * 16 / w00 + 4 * f) >> (qbits + 2)).toInt
      if (c < 0) -lvl else lvl
    })
  }

  /** inverse DC path (8.5.10): Hadamard then scale. `w00` is the intra
    * luma weightScale at (0,0) — the general form ((f·w00·V)·2^(qp/6)
    * + 2^(5−qp/6)·[qp<36]) per 8.5.10; flat 16 reduces bit-exactly to
    * the legacy `(x·V) << (qp/6 − 2)` branches (H264CqmSpec pin). */
  def dequantLumaDc(c: Array[Int], qp: Int, w00: Int = 16): Array[Int] = {
    val f = hadamard4x4(c)
    val v = V(qp % 6)(0)
    if (qp >= 36) f.map(x => (x * w00 * v) << (qp / 6 - 6))
    else {
      val sh = 6 - qp / 6
      val r = 1 << (sh - 1)
      f.map(x => (x * w00 * v + r) >> sh)
    }
  }

  // ---------------- chroma DC (2x2) ----------------

  def quantChromaDc(dc: Array[Int], qp: Int, w00: Int = 16): Array[Int] = {
    // 2x2 Hadamard
    val w = Array(
      dc(0) + dc(1) + dc(2) + dc(3), dc(0) - dc(1) + dc(2) - dc(3),
      dc(0) + dc(1) - dc(2) - dc(3), dc(0) - dc(1) - dc(2) + dc(3))
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val m = MF(qp % 6)(0)
    w.map(c => {
      val lvl = ((math.abs(c).toLong * m * 16 / w00 + 2 * f) >> (qbits + 1)).toInt
      if (c < 0) -lvl else lvl
    })
  }

  /** inverse chroma DC (8.5.11): Hadamard, then the spec's
    * ((f·LevelScale)<<(qp/6))>>5 with LevelScale = w00·V — `w00` is
    * the active chroma weightScale at (0,0); the flat-list 16 folds to
    * the legacy V·2^(qp/6−1) (16/32 = >>1), pinned in H264CqmSpec. */
  def dequantChromaDc(c: Array[Int], qp: Int, w00: Int = 16): Array[Int] = {
    val f = Array(
      c(0) + c(1) + c(2) + c(3), c(0) - c(1) + c(2) - c(3),
      c(0) + c(1) - c(2) - c(3), c(0) - c(1) - c(2) + c(3))
    val v = V(qp % 6)(0)
    f.map(x => ((x * w00 * v) << (qp / 6)) >> 5)
  }

  // ---------------- intra prediction ----------------

  private def clip(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /**
   * Intra_16x16 luma prediction (8.3.3) into a 256-entry raster array.
   * `top`/`left` are the 16 reconstructed neighbors (null when
   * unavailable); `tl` the corner (used by Plane).
   * mode: 0 = Vertical, 1 = Horizontal, 2 = DC, 3 = Plane.
   */
  def predLuma16x16(mode: Int, top: Array[Int], left: Array[Int], tl: Int): Array[Int] = {
    val p = new Array[Int](256)
    mode match {
      case 0 =>
        require(top != null, "V pred needs top")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { p(y * 16 + x) = top(x); x += 1 }; y += 1 }
      case 1 =>
        require(left != null, "H pred needs left")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { p(y * 16 + x) = left(y); x += 1 }; y += 1 }
      case 2 =>
        val dc =
          if (top != null && left != null) (top.sum + left.sum + 16) >> 5
          else if (top != null) (top.sum + 8) >> 4
          else if (left != null) (left.sum + 8) >> 4
          else 128
        java.util.Arrays.fill(p, dc)
      case 3 =>
        require(top != null && left != null, "Plane pred needs both")
        var hGrad = 0; var vGrad = 0
        var i = 1
        while (i <= 8) {
          hGrad += i * (top(7 + i) - (if (i == 8) tl else top(7 - i)))
          vGrad += i * (left(7 + i) - (if (i == 8) tl else left(7 - i)))
          i += 1
        }
        val b = (5 * hGrad + 32) >> 6
        val c = (5 * vGrad + 32) >> 6
        val a = 16 * (left(15) + top(15))
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            p(y * 16 + x) = clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"luma16x16 mode $m")
    }
    p
  }

  /**
   * Intra_4x4 luma prediction (8.3.1.2.1–8.3.1.2.9) into a 16-entry
   * raster array. `top` is the EIGHT samples p[0..7,−1] with the
   * top-right half already substituted by p[3,−1] when unavailable
   * (8.3.1.2's substitution rule — the caller owns availability);
   * `left` the four samples p[−1,0..3]; `tl` = p[−1,−1]. Null marks a
   * side unavailable. Modes: 0 Vertical, 1 Horizontal, 2 DC,
   * 3 Diagonal-Down-Left, 4 Diagonal-Down-Right, 5 Vertical-Right,
   * 6 Horizontal-Down, 7 Vertical-Left, 8 Horizontal-Up. A mode whose
   * required neighbors are unavailable throws (a conformant stream
   * never signals one; the media pipeline's corrupt-drop path catches).
   */
  def predLuma4x4(mode: Int, top: Array[Int], left: Array[Int], tl: Int): Array[Int] = {
    val p = new Array[Int](16)
    // index −1 on either side = the corner p[−1,−1], so the diagonal
    // modes' edge taps (DDR x−y=1, HD zHD=−2 at x=2, VR i∈{0,1}) read
    // naturally without special cases
    def t(x: Int): Int = if (x < 0) tl else top(x)
    def l(y: Int): Int = if (y < 0) tl else left(y)
    mode match {
      case 0 =>
        require(top != null, "V pred needs top")
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { p(y * 4 + x) = t(x); x += 1 }; y += 1 }
      case 1 =>
        require(left != null, "H pred needs left")
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { p(y * 4 + x) = l(y); x += 1 }; y += 1 }
      case 2 =>
        val dc =
          if (top != null && left != null) (t(0) + t(1) + t(2) + t(3) + left.sum + 4) >> 3
          else if (top != null) (t(0) + t(1) + t(2) + t(3) + 2) >> 2
          else if (left != null) (left.sum + 2) >> 2
          else 128
        java.util.Arrays.fill(p, dc)
      case 3 => // Diagonal-Down-Left (8.3.1.2.4)
        require(top != null, "DDL pred needs top")
        for (y <- 0 until 4; x <- 0 until 4)
          p(y * 4 + x) =
            if (x == 3 && y == 3) (t(6) + 3 * t(7) + 2) >> 2
            else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
      case 4 => // Diagonal-Down-Right (8.3.1.2.5)
        require(top != null && left != null, "DDR pred needs top+left")
        for (y <- 0 until 4; x <- 0 until 4)
          p(y * 4 + x) =
            if (x > y) (t(x - y - 2) + 2 * t(x - y - 1) + t(x - y) + 2) >> 2
            else if (x < y) (l(y - x - 2) + 2 * l(y - x - 1) + l(y - x) + 2) >> 2
            else (t(0) + 2 * tl + l(0) + 2) >> 2
      case 5 => // Vertical-Right (8.3.1.2.6)
        require(top != null && left != null, "VR pred needs top+left")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zVR = 2 * x - y
          p(y * 4 + x) =
            if (zVR >= 0 && zVR % 2 == 0) {
              val i = x - (y >> 1)
              (t(i - 1) + t(i) + 1) >> 1
            } else if (zVR >= 0) {
              val i = x - (y >> 1)
              (t(i - 2) + 2 * t(i - 1) + t(i) + 2) >> 2
            } else if (zVR == -1) (l(0) + 2 * tl + t(0) + 2) >> 2
            else (l(y - 1) + 2 * l(y - 2) + l(y - 3) + 2) >> 2
        }
      case 6 => // Horizontal-Down (8.3.1.2.7)
        require(top != null && left != null, "HD pred needs top+left")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zHD = 2 * y - x
          p(y * 4 + x) =
            if (zHD >= 0 && zHD % 2 == 0) {
              val i = y - (x >> 1)
              (l(i - 1) + l(i) + 1) >> 1
            } else if (zHD >= 0) {
              val i = y - (x >> 1)
              (l(i - 2) + 2 * l(i - 1) + l(i) + 2) >> 2
            } else if (zHD == -1) (l(0) + 2 * tl + t(0) + 2) >> 2
            else (t(x - 1) + 2 * t(x - 2) + t(x - 3) + 2) >> 2
        }
      case 7 => // Vertical-Left (8.3.1.2.8)
        require(top != null, "VL pred needs top")
        for (y <- 0 until 4; x <- 0 until 4)
          p(y * 4 + x) =
            if (y % 2 == 0) (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
            else (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1) + t(x + (y >> 1) + 2) + 2) >> 2
      case 8 => // Horizontal-Up (8.3.1.2.9)
        require(left != null, "HU pred needs left")
        for (y <- 0 until 4; x <- 0 until 4) {
          val zHU = x + 2 * y
          p(y * 4 + x) =
            if (zHU > 5) l(3)
            else if (zHU == 5) (l(2) + 3 * l(3) + 2) >> 2
            else if (zHU % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
            else (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) + l(y + (x >> 1) + 2) + 2) >> 2
        }
      case m => throw new IllegalArgumentException(s"luma4x4 mode $m")
    }
    p
  }

  /**
   * 8x8 chroma prediction (8.3.4) into a 64-entry raster array.
   * mode: 0 = DC (per-4x4-sub-block rules), 1 = Horizontal,
   * 2 = Vertical, 3 = Plane.
   */
  def predChroma8x8(mode: Int, top: Array[Int], left: Array[Int], tl: Int): Array[Int] = {
    val p = new Array[Int](64)
    mode match {
      case 0 =>
        // per sub-block: corner blocks prefer both/one side (8.3.4.1)
        for (sy <- 0 until 2; sx <- 0 until 2) {
          val tSum = if (top != null) (0 until 4).map(i => top(sx * 4 + i)).sum else -1
          val lSum = if (left != null) (0 until 4).map(i => left(sy * 4 + i)).sum else -1
          val dc =
            if (sx == sy) { // (0,0) and (1,1): use both when available
              if (tSum >= 0 && lSum >= 0) (tSum + lSum + 4) >> 3
              else if (tSum >= 0) (tSum + 2) >> 2
              else if (lSum >= 0) (lSum + 2) >> 2
              else 128
            } else if (sx == 1) { // (1,0): prefer top
              if (tSum >= 0) (tSum + 2) >> 2
              else if (lSum >= 0) (lSum + 2) >> 2
              else 128
            } else { // (0,1): prefer left
              if (lSum >= 0) (lSum + 2) >> 2
              else if (tSum >= 0) (tSum + 2) >> 2
              else 128
            }
          for (y <- 0 until 4; x <- 0 until 4)
            p((sy * 4 + y) * 8 + sx * 4 + x) = dc
        }
      case 1 =>
        require(left != null, "chroma H needs left")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { p(y * 8 + x) = left(y); x += 1 }; y += 1 }
      case 2 =>
        require(top != null, "chroma V needs top")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { p(y * 8 + x) = top(x); x += 1 }; y += 1 }
      case 3 =>
        require(top != null && left != null, "chroma Plane needs both")
        var hGrad = 0; var vGrad = 0
        var i = 1
        while (i <= 4) {
          hGrad += i * (top(3 + i) - (if (i == 4) tl else top(3 - i)))
          vGrad += i * (left(3 + i) - (if (i == 4) tl else left(3 - i)))
          i += 1
        }
        val b = (17 * hGrad + 16) >> 5
        val c = (17 * vGrad + 16) >> 5
        val a = 16 * (left(7) + top(7))
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            p(y * 8 + x) = clip((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case m => throw new IllegalArgumentException(s"chroma mode $m")
    }
    p
  }
}
