package graft.pipeline

/**
 * H.264 high-profile 8x8 luma tools (clauses 8.3.2, 8.5.12-8.5.13,
 * flat scaling lists): the 8x8 integer inverse transform and its
 * encoder-side forward butterfly, the V8x8 dequant scale table with
 * its six position classes, the Table 8-8 8x8 zigzag scan, and
 * Intra_8x8 prediction with the 8.3.2.2.1 reference-sample low-pass
 * filter. Witness posture matches the 4x4 layer: decode-side pieces
 * are spec-normative and self-witnessed by encoder-reconstruction
 * parity (the encoder reconstructs through the DECODER's dequant +
 * inverse kernels); the forward transform is non-normative (any
 * forward works — quality, not correctness) and is numerically pinned
 * against the inverse in H264Intra8x8Spec.
 */
object H264Transform8x8 {

  /** Table 8-8 (frame) 8x8 zigzag: scan index -> raster index. */
  val Zigzag8x8: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** 8x8 dequant scale (levelScale8x8 with the flat-16 scaling list),
    * indexed [qp % 6][positionClass]. Verified structurally against
    * [[MF8]] and the transform basis norms: for every (m, class),
    * MF·V·n² = 2^24 within 0.01% — the identity that makes
    * quant -> dequant -> inverse the identity map (n² = the 2D basis
    * norm of the class: 64, 289²/1024, 25, 40, 289/4, 1445/32). */
  private val V8 = Array(
    Array(20, 18, 32, 25, 19, 24), Array(22, 19, 35, 28, 21, 26),
    Array(26, 23, 42, 33, 24, 31), Array(28, 25, 45, 35, 26, 33),
    Array(32, 28, 51, 40, 30, 38), Array(36, 32, 58, 43, 34, 41))

  /** position class of raster index 0..63 by (x % 4, y % 4):
    * (0,0)->0, (odd,odd)->1, (2,2)->2, (0,2)/(2,0)->3,
    * (0,odd)/(odd,0)->4, (2,odd)/(odd,2)->5. */
  private def posClass8(raster: Int): Int = {
    val x = raster & 7; val y = raster >> 3
    val cx = x & 3; val cy = y & 3
    if (cx == 0 && cy == 0) 0
    else if (cx % 2 == 1 && cy % 2 == 1) 1
    else if (cx == 2 && cy == 2) 2
    else if ((cx == 0 && cy == 2) || (cx == 2 && cy == 0)) 3
    else if (cx == 0 || cy == 0) 4
    else 5
  }

  /** Flat 8x8 weight scale (flag-0 High profile): all 16. */
  val Flat64: Array[Int] = Array.fill(64)(16)

  /** Dequantize a raster 8x8 level block (8.5.13.2, flat lists). */
  def dequant8x8(c: Array[Int], qp: Int): Array[Int] =
    dequant8x8(c, qp, Flat64)

  /** General 8.5.13.2 dequant: levelScale8x8 = weightScale(i,j) ·
    * normAdjust8x8 ([[V8]]); `wgt` is the active 8x8 scaling list in
    * raster order (the flat 16 reproduces the legacy `<< 4` form
    * bit-exactly — H264CqmSpec pin). Omitting the weight is invisible
    * to self round trips but decodes foreign levels 16x too small. */
  def dequant8x8(c: Array[Int], qp: Int, wgt: Array[Int]): Array[Int] = {
    val v = V8(qp % 6)
    if (qp >= 36) {
      val sh = qp / 6 - 6
      Array.tabulate(64)(r => (c(r) * v(posClass8(r)) * wgt(r)) << sh)
    } else {
      val sh = 6 - qp / 6
      val f = 1 << (sh - 1)
      Array.tabulate(64)(r => (c(r) * v(posClass8(r)) * wgt(r) + f) >> sh)
    }
  }

  /** Encoder forward-quant multipliers, [qp % 6][positionClass] at
    * qbits = 22 + qp/6 (the forward below carries a 64x scale and the
    * normative dequant a 16x weight scale). The
    * whole (MF8, V8, transform) triple is verified STRUCTURALLY: the
    * inverse's 2D basis is orthogonal with per-class norms n², and
    * MF·V·n² = 2^24 holds for all 36 (m, class) entries within 0.01%
    * (pinned in H264Intra8x8Spec) — so quant -> dequant -> inverse is
    * the identity up to the quantizer step. The numeric pin caught two
    * real transcription faults round trips CANNOT see (encoder and
    * decoder share the chain): a wrong odd-part forward butterfly and
    * a class-3/4 swap in both scale tables. */
  private val MF8 = Array(
    Array(13107, 11428, 20972, 16777, 12222, 15481),
    Array(11916, 10826, 19174, 14980, 11058, 14290),
    Array(10082, 8943, 15978, 12710, 9675, 11985),
    Array(9362, 8228, 14913, 11984, 8931, 11259),
    Array(8192, 7346, 13159, 10486, 7740, 9777),
    Array(7282, 6428, 11570, 9118, 6830, 8640))

  /** Quantize forward 8x8 coefficients (intra 1/3 dead-zone). */
  def quant8x8(w: Array[Int], qp: Int): Array[Int] =
    quant8x8(w, qp, Flat64)

  /** Weighted forward quant (non-normative): MF scaled by 16/weight so
    * the quantizer step tracks the dequant's weightScale/16. */
  def quant8x8(w: Array[Int], qp: Int, wgt: Array[Int]): Array[Int] = {
    val qbits = 22 + qp / 6
    val f = (1L << qbits) / 3
    val m = MF8(qp % 6)
    Array.tabulate(64) { r =>
      val c = w(r)
      val lvl = ((math.abs(c).toLong * m(posClass8(r)) * 16 / wgt(r) + f) >> qbits).toInt
      if (c < 0) -lvl else lvl
    }
  }

  /** Encoder forward 8x8 transform: the EXACT adjoint of
    * [[inverse8x8]]'s (orthogonal) basis, scaled 8x per 1D pass so
    * every coefficient stays integer (the odd basis carries 1/8-step
    * entries: 12/10/6/3 in eighths). Non-normative — any forward
    * works — but the exact adjoint makes the MF·V·n² = 2^24 identity
    * hold, which the spec pins numerically. Input raster residual,
    * output raster coefficients at 64x scale (absorbed by qbits 18). */
  def forward8x8(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](64)
    def pass(src: Int => Int, dst: (Int, Int) => Unit): Unit = {
      var i = 0
      while (i < 8) {
        val s = Array.tabulate(8)(k => src(i * 8 + k))
        val s07 = s(0) + s(7); val s16 = s(1) + s(6)
        val s25 = s(2) + s(5); val s34 = s(3) + s(4)
        val d07 = s(0) - s(7); val d16 = s(1) - s(6)
        val d25 = s(2) - s(5); val d34 = s(3) - s(4)
        dst(i * 8 + 0, 8 * (s07 + s16 + s25 + s34))
        dst(i * 8 + 4, 8 * (s07 - s16 - s25 + s34))
        dst(i * 8 + 2, 8 * (s07 - s34) + 4 * (s16 - s25))
        dst(i * 8 + 6, 4 * (s07 - s34) - 8 * (s16 - s25))
        dst(i * 8 + 1, 12 * d07 + 10 * d16 + 6 * d25 + 3 * d34)
        dst(i * 8 + 3, 10 * d07 - 3 * d16 - 12 * d25 - 6 * d34)
        dst(i * 8 + 5, 6 * d07 - 12 * d16 + 3 * d25 + 10 * d34)
        dst(i * 8 + 7, 3 * d07 - 6 * d16 + 10 * d25 - 12 * d34)
        i += 1
      }
    }
    pass(k => x(k), (k, v) => t(k) = v) // rows
    val w = new Array[Int](64)
    pass(k => t((k % 8) * 8 + k / 8), (k, v) => w((k % 8) * 8 + k / 8) = v) // cols
    w
  }

  /** Normative 8x8 inverse transform (8.5.12.2): horizontal then
    * vertical butterflies, final (r + 32) >> 6 rounding. */
  def inverse8x8(d: Array[Int]): Array[Int] = {
    val t = new Array[Int](64)
    def pass(src: Int => Int, dst: (Int, Int) => Unit): Unit = {
      var i = 0
      while (i < 8) {
        val w = Array.tabulate(8)(k => src(i * 8 + k))
        val a0 = w(0) + w(4)
        val a4 = w(0) - w(4)
        val a2 = (w(2) >> 1) - w(6)
        val a6 = w(2) + (w(6) >> 1)
        val b0 = a0 + a6; val b2 = a4 + a2
        val b4 = a4 - a2; val b6 = a0 - a6
        val a1 = -w(3) + w(5) - w(7) - (w(7) >> 1)
        val a3 = w(1) + w(7) - w(3) - (w(3) >> 1)
        val a5 = -w(1) + w(7) + w(5) + (w(5) >> 1)
        val a7 = w(3) + w(5) + w(1) + (w(1) >> 1)
        val b1 = a1 + (a7 >> 2)
        val b7 = a7 - (a1 >> 2)
        val b3 = a3 + (a5 >> 2)
        val b5 = (a3 >> 2) - a5
        // output pairing pinned by basis smoothness (H264Intra8x8Spec):
        // position 1 takes b2 + b5 — the swapped pairing would permute
        // the two middle samples of every odd basis row, which is
        // invisible to round trips (still orthogonal, same norms) but
        // garbles foreign streams' odd-frequency content
        dst(i * 8 + 0, b0 + b7)
        dst(i * 8 + 1, b2 + b5)
        dst(i * 8 + 2, b4 + b3)
        dst(i * 8 + 3, b6 + b1)
        dst(i * 8 + 4, b6 - b1)
        dst(i * 8 + 5, b4 - b3)
        dst(i * 8 + 6, b2 - b5)
        dst(i * 8 + 7, b0 - b7)
        i += 1
      }
    }
    pass(k => d(k), (k, v) => t(k) = v) // rows
    val r = new Array[Int](64)
    pass(k => t((k % 8) * 8 + k / 8), (k, v) => r((k % 8) * 8 + k / 8) = v) // cols
    Array.tabulate(64)(k => (r(k) + 32) >> 6)
  }

  // ---------------- Intra_8x8 prediction (8.3.2) ----------------

  /** 8.3.2.2.1 reference-sample filtering. Inputs are the UNFILTERED
    * references with the 8.3.2.1 top-right replication already applied
    * by the caller (top has 16 entries when present), null = side
    * unavailable. Returns (top', left', tl'). */
  def filterRefs8x8(top: Array[Int], left: Array[Int], tlIn: Int,
      tlAvail: Boolean): (Array[Int], Array[Int], Int) = {
    val ft = if (top == null) null else {
      val o = new Array[Int](16)
      o(0) =
        if (tlAvail) (tlIn + 2 * top(0) + top(1) + 2) >> 2
        else (3 * top(0) + top(1) + 2) >> 2
      var x = 1
      while (x < 15) { o(x) = (top(x - 1) + 2 * top(x) + top(x + 1) + 2) >> 2; x += 1 }
      o(15) = (top(14) + 3 * top(15) + 2) >> 2
      o
    }
    val fl = if (left == null) null else {
      val o = new Array[Int](8)
      o(0) =
        if (tlAvail) (tlIn + 2 * left(0) + left(1) + 2) >> 2
        else (3 * left(0) + left(1) + 2) >> 2
      var y = 1
      while (y < 7) { o(y) = (left(y - 1) + 2 * left(y) + left(y + 1) + 2) >> 2; y += 1 }
      o(7) = (left(6) + 3 * left(7) + 2) >> 2
      o
    }
    val ftl =
      if (!tlAvail) tlIn
      else if (top != null && left != null) (top(0) + 2 * tlIn + left(0) + 2) >> 2
      else if (top != null) (3 * tlIn + top(0) + 2) >> 2
      else if (left != null) (3 * tlIn + left(0) + 2) >> 2
      else tlIn
    (ft, fl, ftl)
  }

  /** Intra_8x8 prediction (8.3.2.2.2-8.3.2.2.9) over FILTERED
    * references: `top` = p'[0..15,-1] (null if unavailable), `left` =
    * p'[-1,0..7], `tl` = p'[-1,-1]. Mode numbering matches 4x4
    * (0 V, 1 H, 2 DC, 3 DDL, 4 DDR, 5 VR, 6 HD, 7 VL, 8 HU). */
  def predLuma8x8(mode: Int, top: Array[Int], left: Array[Int], tl: Int): Array[Int] = {
    val p = new Array[Int](64)
    def t(x: Int): Int = if (x < 0) tl else top(x)
    def l(y: Int): Int = if (y < 0) tl else left(y)
    mode match {
      case 0 =>
        require(top != null, "V pred needs top")
        for (y <- 0 until 8; x <- 0 until 8) p(y * 8 + x) = t(x)
      case 1 =>
        require(left != null, "H pred needs left")
        for (y <- 0 until 8; x <- 0 until 8) p(y * 8 + x) = l(y)
      case 2 =>
        val dc =
          if (top != null && left != null)
            ((0 until 8).map(t).sum + left.sum + 8) >> 4
          else if (top != null) ((0 until 8).map(t).sum + 4) >> 3
          else if (left != null) (left.sum + 4) >> 3
          else 128
        java.util.Arrays.fill(p, dc)
      case 3 => // Diagonal-Down-Left (8.3.2.2.4)
        require(top != null, "DDL pred needs top")
        for (y <- 0 until 8; x <- 0 until 8)
          p(y * 8 + x) =
            if (x == 7 && y == 7) (t(14) + 3 * t(15) + 2) >> 2
            else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
      case 4 => // Diagonal-Down-Right (8.3.2.2.5)
        require(top != null && left != null, "DDR pred needs top+left")
        for (y <- 0 until 8; x <- 0 until 8)
          p(y * 8 + x) =
            if (x > y) (t(x - y - 2) + 2 * t(x - y - 1) + t(x - y) + 2) >> 2
            else if (x < y) (l(y - x - 2) + 2 * l(y - x - 1) + l(y - x) + 2) >> 2
            else (t(0) + 2 * tl + l(0) + 2) >> 2
      case 5 => // Vertical-Right (8.3.2.2.6)
        require(top != null && left != null, "VR pred needs top+left")
        for (y <- 0 until 8; x <- 0 until 8) {
          val zVR = 2 * x - y
          p(y * 8 + x) =
            if (zVR >= 0 && zVR % 2 == 0) {
              val i = x - (y >> 1)
              (t(i - 1) + t(i) + 1) >> 1
            } else if (zVR >= 0) {
              val i = x - (y >> 1)
              (t(i - 2) + 2 * t(i - 1) + t(i) + 2) >> 2
            } else if (zVR == -1) (l(0) + 2 * tl + t(0) + 2) >> 2
            else (l(y - 2 * x - 1) + 2 * l(y - 2 * x - 2) + l(y - 2 * x - 3) + 2) >> 2
        }
      case 6 => // Horizontal-Down (8.3.2.2.7)
        require(top != null && left != null, "HD pred needs top+left")
        for (y <- 0 until 8; x <- 0 until 8) {
          val zHD = 2 * y - x
          p(y * 8 + x) =
            if (zHD >= 0 && zHD % 2 == 0) {
              val i = y - (x >> 1)
              (l(i - 1) + l(i) + 1) >> 1
            } else if (zHD >= 0) {
              val i = y - (x >> 1)
              (l(i - 2) + 2 * l(i - 1) + l(i) + 2) >> 2
            } else if (zHD == -1) (l(0) + 2 * tl + t(0) + 2) >> 2
            else (t(x - 2 * y - 1) + 2 * t(x - 2 * y - 2) + t(x - 2 * y - 3) + 2) >> 2
        }
      case 7 => // Vertical-Left (8.3.2.2.8)
        require(top != null, "VL pred needs top")
        for (y <- 0 until 8; x <- 0 until 8)
          p(y * 8 + x) =
            if (y % 2 == 0) (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
            else (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1) + t(x + (y >> 1) + 2) + 2) >> 2
      case 8 => // Horizontal-Up (8.3.2.2.9)
        require(left != null, "HU pred needs left")
        for (y <- 0 until 8; x <- 0 until 8) {
          val zHU = x + 2 * y
          p(y * 8 + x) =
            if (zHU > 13) l(7)
            else if (zHU == 13) (l(6) + 3 * l(7) + 2) >> 2
            else if (zHU % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
            else (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) + l(y + (x >> 1) + 2) + 2) >> 2
        }
      case m => throw new IllegalArgumentException(s"luma8x8 mode $m")
    }
    p
  }
}
