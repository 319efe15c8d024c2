package graft.pipeline

/**
 * H.264 CABAC entropy layer (ITU-T H.264 clause 9.3) — the arithmetic
 * coder used by main/high-profile streams, which are the overwhelming
 * majority of real-world MP4s. This module holds the entropy machinery
 * only: the binary arithmetic decoding engine (9.3.3.2), the encoding
 * engine (9.3.4), the probability-state transition tables (Tables
 * 9-44/9-45), context initialization (9.3.1.1, Tables 9-12..9-33 — the
 * I column, since r13 the P/B cabac_init_idc-0 column, and since r14
 * the ctxIdx 399-435 rows for transform_size_8x8_flag + the
 * ctxBlockCat-5 8x8-residual families), the UEGk bypass suffix codec,
 * and the residual-block coefficient codec (significance maps
 * 9.3.3.1.3 with the Table 9-43 8x8 position maps + UEG0 level
 * binarization 9.3.2.3).
 * Macroblock-level syntax (mb_type trees, mvd/ref_idx/skip coding,
 * neighbor-derived context increments) lives in [[H264Codec]], which
 * owns the frame state.
 *
 * Witness posture, stated honestly: the ENGINE and BINARIZATIONS are
 * pure public-spec algorithms, pinned by H264CabacSpec's fixed-vector
 * regressions and by full encoder-reconstruction round-trip parity
 * (same method that witnessed CAVLC). The probability-state and
 * context-INIT tables are public-spec constants transcribed here; the
 * container ships no conformant H.264 peer, so FOREIGN-bitstream
 * conformance of the transcription is unwitnessable in-container
 * (same limitation FlacCodecSpec documents). Transcription errors
 * cannot corrupt output silently: encoder and decoder share the
 * tables (round trips stay exact), and foreign streams are accepted
 * only when the slice terminates EXACTLY — end_of_slice_flag firing
 * on precisely the last macroblock with only zero trailing bytes — so
 * a diverged parse rejects loudly instead of rendering garbage.
 *
 * Reference scope anchor: the Mr.LDA reference has no media surface;
 * this is beyond-reference capability for the multimodal pipeline.
 */
private[pipeline] object H264Cabac {

  final class CabacFormat(msg: String) extends RuntimeException(msg)

  // ---------------- Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx] ----------------
  // 64 probability states x 4 quantized-range columns. Structural pins
  // (H264CabacSpec): non-increasing down each column (the 128 plateau
  // at states 0-2 of column 0 excepted), strictly increasing across
  // each row, the spec's anchor rows at states 0, 62, 63, and the
  // ~0.949 geometric decay the state machine was designed around.
  val rangeTabLps: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  // ---------------- Table 9-45: transIdxLPS (MPS transition is min(s+1, 62)) ----------------
  val transIdxLps: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7,
    8, 9, 9, 11, 11, 12, 13, 13, 15, 15,
    16, 16, 18, 18, 19, 19, 21, 21, 23, 22,
    23, 24, 24, 25, 26, 26, 27, 27, 28, 29,
    29, 30, 30, 30, 31, 32, 32, 33, 33, 33,
    34, 34, 35, 35, 35, 36, 36, 36, 37, 37,
    37, 38, 38, 63)

  @inline def transIdxMps(s: Int): Int = if (s < 62) s + 1 else s

  // ---------------- context variables ----------------

  /** Context-variable bank: pStateIdx + valMPS per ctxIdx (9.3.1.1).
    * Uninitialized contexts carry state -1 — touching one throws,
    * catching any accidental use of an untranscribed table range. */
  final class Ctx {
    val state: Array[Int] = Array.fill(NumCtx)(-1)
    val mps: Array[Boolean] = new Array[Boolean](NumCtx)
    /** 9.3.1.1: preCtxState = Clip3(1, 126, ((m * Clip3(0, 51, qp)) >> 4) + n). */
    def initFrom(table: Array[Int], qp: Int): Unit = {
      val q = math.max(0, math.min(51, qp))
      var i = 0
      while (i < NumCtx) {
        val m = table(2 * i)
        if (m != Unset) {
          val pre = math.max(1, math.min(126, ((m * q) >> 4) + table(2 * i + 1)))
          if (pre <= 63) { state(i) = 63 - pre; mps(i) = false }
          else { state(i) = pre - 64; mps(i) = true }
        }
        i += 1
      }
    }
    def initI(qp: Int): Unit = initFrom(initTableI, qp)
    /** P/B slice context init. Only cabac_init_idc 0 is transcribed
      * (the x264/JM default); the slice layer refuses idc 1/2 loudly —
      * permanently adjudicated in CATALOG.md (r14): the alternative
      * columns are ~780 constants with zero in-container witness and
      * no capability gain for default-shaped streams. */
    def initPB(cabacInitIdc: Int, qp: Int): Unit = {
      if (cabacInitIdc != 0)
        throw new CabacFormat(s"cabac_init_idc $cabacInitIdc out of scope")
      initFrom(initTablePB0, qp)
    }
  }

  val NumCtx = 460
  private val Unset = Int.MinValue

  /** Context init (m, n) pairs, I column of Tables 9-12..9-23, flat
    * [m0, n0, m1, n1, ...]. Only the ranges an I slice parses are
    * filled (0-10 mb_type, 60-63 mb_qp_delta, 64-67
    * intra_chroma_pred_mode, 68-69 intra pred mode, 70-72
    * mb_field [unused, frame coding only], 73-84 coded_block_pattern,
    * 85-104 coded_block_flag, 105-165 significant_coeff_flag, 166-226
    * last_significant_coeff_flag, 227-275 coeff_abs_level_minus1,
    * and since r14 399-435: transform_size_8x8_flag + the
    * ctxBlockCat-5 8x8-residual families);
    * P/B-only and field-only ranges stay Unset and throw on touch.
    * ctxIdx 276 (end_of_slice_flag / pcm terminate) is stateless —
    * DecodeTerminate never reads a context variable. */
  val initTableI: Array[Int] = {
    val t = Array.fill(2 * NumCtx)(Unset)
    def put(from: Int, pairs: (Int, Int)*): Unit = {
      var i = 0
      while (i < pairs.length) {
        t(2 * (from + i)) = pairs(i)._1
        t(2 * (from + i) + 1) = pairs(i)._2
        i += 1
      }
    }
    // 0 -> 10: mb_type (SI prefix 0-2 unused in plain I, kept for completeness)
    put(0, (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
      (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51))
    // 60 -> 69: mb_qp_delta, intra_chroma_pred_mode, prev/rem intra4x4 mode
    put(60, (0, 41), (0, 63), (0, 63), (0, 63),
      (-9, 83), (4, 86), (0, 97), (-7, 72),
      (13, 41), (3, 62))
    // 70 -> 104: mb_field_decoding_flag, coded_block_pattern, coded_block_flag
    put(70, (0, 11), (1, 55), (0, 69),
      (-17, 127), (-13, 102), (0, 82), (-7, 74), // cbp luma
      (-21, 107), (-27, 127), (-31, 127), (-24, 127), // cbp chroma bin 0
      (-18, 95), (-27, 127), (-21, 114), (-30, 127), // cbp chroma bin 1
      (-17, 123), (-12, 115), (-16, 122), (-11, 115), // cbf cat 0
      (-12, 63), (-2, 68), (-15, 84), (-13, 104), // cbf cat 1
      (-3, 70), (-8, 93), (-10, 90), (-30, 127), // cbf cat 2
      (-1, 74), (-6, 97), (-7, 91), (-20, 127), // cbf cat 3
      (-4, 56), (-5, 82), (-7, 76), (-22, 125)) // cbf cat 4
    // 105 -> 165: significant_coeff_flag (frame coded)
    put(105, (-7, 93), (-11, 87), (-3, 77), (-5, 71),
      (-4, 63), (-4, 68), (-12, 84), (-7, 62),
      (-7, 65), (8, 61), (5, 56), (-2, 66),
      (1, 64), (0, 61), (-2, 78), (1, 50),
      (7, 52), (10, 35), (0, 44), (11, 38),
      (1, 45), (0, 46), (5, 44), (31, 17),
      (1, 51), (7, 50), (28, 19), (16, 33),
      (14, 62), (-13, 108), (-15, 100), (-13, 101),
      (-13, 91), (-12, 94), (-10, 88), (-16, 84),
      (-10, 86), (-7, 83), (-13, 87), (-19, 94),
      (1, 70), (0, 72), (-5, 74), (18, 59),
      (-8, 102), (-15, 100), (0, 95), (-4, 75),
      (2, 72), (-11, 75), (-3, 71), (15, 46),
      (-13, 69), (0, 62), (0, 65), (21, 37),
      (-15, 72), (9, 57), (16, 54), (0, 62),
      (12, 72))
    // 166 -> 226: last_significant_coeff_flag (frame coded)
    put(166, (24, 0), (15, 9), (8, 25), (13, 18),
      (15, 9), (13, 19), (10, 37), (12, 18),
      (6, 29), (20, 33), (15, 30), (4, 45),
      (1, 58), (0, 62), (7, 61), (12, 38),
      (11, 45), (15, 39), (11, 42), (13, 44),
      (16, 45), (12, 41), (10, 49), (30, 34),
      (18, 42), (10, 55), (17, 51), (17, 46),
      (0, 89), (26, -19), (22, -17), (26, -17),
      (30, -25), (28, -20), (33, -23), (37, -27),
      (33, -23), (40, -28), (38, -17), (33, -11),
      (40, -15), (41, -6), (38, 1), (41, 17),
      (30, -6), (27, 3), (26, 22), (37, -16),
      (35, -4), (38, -8), (38, -3), (37, 3),
      (38, 5), (42, 0), (35, 16), (39, 22),
      (14, 48), (27, 37), (21, 60), (12, 68),
      (2, 97))
    // 227 -> 275: coeff_abs_level_minus1
    put(227, (-3, 71), (-6, 42), (-5, 50), (-3, 54),
      (-2, 62), (0, 58), (1, 63), (-2, 72),
      (-1, 74), (-9, 91), (-5, 67), (-4, 76),
      (-4, 77), (-4, 82), (-4, 76), (-4, 84),
      (-9, 84), (-11, 85), (-17, 91), (-16, 92),
      (-17, 90), (-18, 88), (-21, 92), (-18, 84),
      (-21, 92), (-30, 86), (-17, 95), (-14, 95),
      (-17, 111), (-18, 111), (-17, 111), (-7, 71),
      (-5, 74), (-4, 74), (-5, 74), (-7, 72),
      (1, 58), (-25, 111), (-3, 51), (-3, 73),
      (-10, 70), (-10, 69), (-8, 66), (-9, 64),
      (-8, 60), (-6, 59), (-5, 75), (-9, 66),
      (-12, 95))
    // 399 -> 435 (r14): transform_size_8x8_flag, then the ctxBlockCat-5
    // (8x8 transform, frame coded) significance / last / level
    // families. Same witness posture as every init range above — see
    // the file scaladoc and the r14 CATALOG note on the confidence
    // tiers of this transcription.
    put(399, (31, 21), (31, 31), (25, 50))
    put(402, (12, 48), (11, 49), (26, 45), (22, 22),
      (23, 22), (27, 21), (33, 20), (26, 28),
      (30, 24), (27, 34), (18, 42), (25, 39),
      (18, 50), (12, 70), (21, 54))
    put(417, (26, 71), (14, 60), (9, 45), (-1, 65),
      (-8, 62), (-17, 83), (-13, 64), (-26, 83),
      (-15, 72))
    put(426, (-10, 45), (-1, 58), (-4, 69), (-9, 108),
      (-22, 127), (-5, 65), (-7, 69), (-8, 77),
      (-10, 66), (-9, 75))
    t
  }

  /** Context init (m, n) pairs for P/B slices at cabac_init_idc 0 —
    * the x264/JM default column of Tables 9-13..9-23. Filled ranges:
    * 11-13 mb_skip_flag(P), 14-20 mb_type(P prefix + intra suffix),
    * 21-23 sub_mb_type(P), 24-26 mb_skip_flag(B), 27-35 mb_type(B
    * prefix + intra suffix), 36-39 sub_mb_type(B), 40-53 mvd x/y,
    * 54-59 ref_idx, the residual ranges 60-275 (whose P/B column
    * differs from the I column), and since r14 399-435
    * (transform_size_8x8_flag + ctxBlockCat-5). I-only (0-10) and
    * field-only ranges stay Unset and throw on touch. Witness posture is
    * identical to [[initTableI]]'s (scaladoc at the top of this file):
    * encoder and decoder share the table so round trips are bit-exact
    * regardless, and a foreign stream whose parse diverges rejects at
    * the exact-termination gate instead of rendering garbage. */
  val initTablePB0: Array[Int] = {
    val t = Array.fill(2 * NumCtx)(Unset)
    def put(from: Int, pairs: (Int, Int)*): Unit = {
      var i = 0
      while (i < pairs.length) {
        t(2 * (from + i)) = pairs(i)._1
        t(2 * (from + i) + 1) = pairs(i)._2
        i += 1
      }
    }
    // 11 -> 23: mb_skip_flag P, mb_type P (prefix 14-16 + shared 17
    // for bin2-after-1 and the intra suffix 17-20), sub_mb_type P
    put(11, (23, 33), (23, 2), (21, 0),
      (1, 9), (0, 49), (-37, 118),
      (5, 57), (-13, 78), (-11, 65), (1, 62),
      (12, 49), (-4, 73), (17, 50))
    // 24 -> 39: mb_skip_flag B, mb_type B (prefix 27-32 + intra
    // suffix 32-35), sub_mb_type B
    put(24, (18, 64), (9, 43), (29, 0),
      (26, 67), (16, 90), (9, 104),
      (-46, 127), (-20, 104), (1, 67),
      (-13, 78), (-11, 65), (1, 62),
      (-6, 86), (-17, 95), (-6, 61), (9, 45))
    // 40 -> 53: mvd (x component 40-46, y component 47-53)
    put(40, (-3, 69), (-6, 81), (-11, 96),
      (6, 55), (7, 67), (-5, 86), (2, 88),
      (0, 58), (-3, 76), (-10, 94),
      (5, 54), (4, 69), (-3, 81), (0, 88))
    // 54 -> 59: ref_idx
    put(54, (-7, 67), (-5, 74), (-4, 74), (-5, 80), (-7, 72), (1, 58))
    // 60 -> 69: mb_qp_delta, intra_chroma_pred_mode, prev/rem intra4x4
    // mode (column-independent in the spec: same values as the I table)
    put(60, (0, 41), (0, 63), (0, 63), (0, 63),
      (-9, 83), (4, 86), (0, 97), (-7, 72),
      (13, 41), (3, 62))
    // 73 -> 104: coded_block_pattern, coded_block_flag
    put(73, (-27, 126), (-28, 98), (-25, 101), (-23, 67), // cbp luma
      (-28, 82), (-20, 94), (-16, 83), (-22, 110), // cbp chroma bin 0
      (-21, 91), (-18, 102), (-13, 93), (-29, 127), // cbp chroma bin 1
      (-7, 92), (-5, 89), (-7, 96), (-13, 108), // cbf cat 0
      (-3, 46), (-1, 65), (-1, 57), (-9, 93), // cbf cat 1
      (-3, 74), (-9, 92), (-8, 87), (-23, 126), // cbf cat 2
      (5, 54), (6, 60), (6, 59), (6, 69), // cbf cat 3
      (-1, 48), (0, 68), (-4, 69), (-8, 88)) // cbf cat 4
    // 105 -> 165: significant_coeff_flag (frame coded)
    put(105, (-2, 85), (-6, 78), (-1, 75), (-7, 77),
      (2, 54), (5, 50), (-3, 68), (1, 50),
      (6, 42), (-4, 81), (1, 63), (-4, 70),
      (0, 67), (2, 57), (-2, 76), (11, 35),
      (4, 64), (1, 61), (11, 35), (18, 25),
      (12, 24), (13, 29), (13, 36), (-10, 93),
      (-7, 73), (-2, 73), (13, 46), (9, 49),
      (-7, 100), (9, 53), (2, 53), (5, 53),
      (-2, 61), (0, 56), (0, 56), (-13, 63),
      (-5, 60), (-1, 62), (4, 57), (-6, 69),
      (4, 57), (14, 39), (4, 51), (13, 68),
      (3, 64), (1, 61), (9, 63), (7, 50),
      (16, 39), (5, 44), (4, 52), (11, 48),
      (-5, 60), (-1, 59), (0, 59), (22, 33),
      (5, 44), (14, 43), (-1, 78), (0, 60),
      (9, 69))
    // 166 -> 226: last_significant_coeff_flag (frame coded)
    put(166, (11, 28), (2, 40), (3, 44), (0, 49),
      (0, 46), (2, 44), (2, 51), (0, 47),
      (4, 39), (2, 62), (6, 46), (0, 54),
      (3, 54), (2, 58), (4, 63), (6, 51),
      (6, 57), (7, 53), (6, 52), (6, 55),
      (11, 45), (14, 36), (8, 53), (-1, 82),
      (7, 55), (-3, 78), (15, 46), (22, 31),
      (-1, 84), (25, 7), (30, -7), (28, 3),
      (28, 4), (32, 0), (34, -1), (30, 6),
      (30, 6), (32, 9), (31, 19), (26, 27),
      (26, 30), (37, 20), (28, 34), (17, 70),
      (1, 67), (5, 59), (9, 67), (16, 30),
      (18, 32), (18, 35), (22, 29), (24, 31),
      (23, 38), (18, 43), (20, 41), (11, 63),
      (9, 59), (9, 64), (-1, 94), (-2, 89),
      (-9, 108))
    // 227 -> 275: coeff_abs_level_minus1
    put(227, (-6, 76), (-2, 44), (0, 45), (0, 52),
      (-3, 64), (-2, 59), (-4, 70), (-4, 75),
      (-8, 82), (-17, 102), (-9, 77), (3, 24),
      (0, 42), (0, 48), (0, 55), (-6, 59),
      (-7, 71), (-12, 83), (-11, 87), (-30, 119),
      (1, 58), (-3, 29), (-1, 36), (1, 38),
      (2, 43), (-6, 55), (0, 58), (0, 64),
      (-3, 74), (-10, 90), (0, 70), (-4, 29),
      (5, 31), (7, 42), (1, 59), (-2, 58),
      (-3, 72), (-3, 81), (11, 76), (10, 94),
      (-10, 82), (-8, 38), (-4, 46), (-6, 58),
      (-1, 65), (-4, 78), (-7, 87), (-5, 98),
      (-10, 112))
    // 399 -> 435 (r14): transform_size_8x8_flag + ctxBlockCat-5
    // families, cabac_init_idc-0 column (idc 1/2 stay refused —
    // CATALOG adjudication).
    put(399, (12, 40), (11, 51), (14, 59))
    put(402, (-4, 79), (-7, 71), (-5, 69), (-9, 70),
      (-8, 66), (-10, 68), (-19, 73), (-12, 69),
      (-16, 70), (-15, 67), (-20, 62), (-19, 70),
      (-16, 66), (-22, 65), (-20, 63))
    put(417, (9, -2), (26, -9), (33, -9), (39, -7),
      (41, -2), (45, 3), (49, 9), (45, 27),
      (36, 59))
    put(426, (-6, 66), (-7, 35), (-7, 42), (-8, 45),
      (-5, 48), (-12, 56), (-6, 60), (-5, 62),
      (-8, 66), (-8, 76))
    t
  }

  // ---------------- decoding engine (9.3.3.2) ----------------

  /** Bit-serial arithmetic decoder over an unescaped RBSP, starting at
    * a byte boundary. `consumedBits` tracks exactly the bits that have
    * entered the engine (9 at init, one per renormalization, one per
    * bypass) — by the encoder-flush accounting this equals the emitted
    * codeword length at any terminate, so [[alignedBytePos]] lands
    * precisely on the byte where PCM samples or trailing alignment
    * begin. */
  final class Dec(data: Array[Byte], startByte: Int) {
    private var bitPos: Long = startByte.toLong * 8
    private var range = 510
    private var offset = 0
    private val limit: Long = data.length.toLong * 8

    locally {
      var i = 0
      while (i < 9) { offset = (offset << 1) | bit(); i += 1 }
      if (offset >= 510) throw new CabacFormat("illegal initial codIOffset")
    }

    private def bit(): Int = {
      if (bitPos >= limit) throw new CabacFormat("cabac bit overrun")
      val b = (data((bitPos >> 3).toInt) >> (7 - (bitPos & 7).toInt)) & 1
      bitPos += 1
      b
    }

    def decision(cx: Ctx, idx: Int): Int = {
      val s = cx.state(idx)
      if (s < 0) throw new CabacFormat(s"uninitialized cabac context $idx")
      val lps = rangeTabLps(s)((range >> 6) & 3)
      range -= lps
      var bin = 0
      if (offset >= range) {
        bin = if (cx.mps(idx)) 0 else 1
        offset -= range
        range = lps
        if (s == 0) cx.mps(idx) = !cx.mps(idx)
        cx.state(idx) = transIdxLps(s)
      } else {
        bin = if (cx.mps(idx)) 1 else 0
        cx.state(idx) = transIdxMps(s)
      }
      while (range < 256) { range <<= 1; offset = (offset << 1) | bit() }
      bin
    }

    def bypass(): Int = {
      offset = (offset << 1) | bit()
      if (offset >= range) { offset -= range; 1 } else 0
    }

    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        while (range < 256) { range <<= 1; offset = (offset << 1) | bit() }
        0
      }
    }

    /** First byte boundary at or after every consumed bit — where PCM
      * samples (after a pcm terminate) or trailing alignment (after
      * end_of_slice) begin. */
    def alignedBytePos: Int = ((bitPos + 7) >> 3).toInt
  }

  // ---------------- encoding engine (9.3.4) ----------------

  /** Arithmetic encoder mirroring [[Dec]]; emits through the caller's
    * bit sink, which must be byte-aligned at construction (the slice
    * writer emits cabac_alignment_one_bit first). [[terminateFlush]]
    * writes the 9.3.4.5 flush, leaving the sink bit-exact where the
    * decoder's consumed-bit count will land. */
  final class Enc(sink: H264Cavlc.BitOut) {
    private var low = 0
    private var range = 510
    private var outstanding = 0
    private var first = true

    private def put(b: Int): Unit = {
      if (first) first = false else sink.u1(b)
      while (outstanding > 0) { sink.u1(1 - b); outstanding -= 1 }
    }

    private def renorm(): Unit = {
      while (range < 256) {
        if (low < 256) put(0)
        else if (low >= 512) { low -= 512; put(1) }
        else { low -= 256; outstanding += 1 }
        range <<= 1
        low <<= 1
      }
    }

    def decision(cx: Ctx, idx: Int, bin: Int): Unit = {
      val s = cx.state(idx)
      if (s < 0) throw new CabacFormat(s"uninitialized cabac context $idx")
      val lps = rangeTabLps(s)((range >> 6) & 3)
      range -= lps
      if ((bin == 1) != cx.mps(idx)) {
        low += range
        range = lps
        if (s == 0) cx.mps(idx) = !cx.mps(idx)
        cx.state(idx) = transIdxLps(s)
      } else cx.state(idx) = transIdxMps(s)
      renorm()
    }

    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin == 1) low += range
      if (low >= 1024) { low -= 1024; put(1) }
      else if (low < 512) put(0)
      else { low -= 512; outstanding += 1 }
    }

    /** end_of_slice_flag / pcm_flag. A `1` performs the 9.3.4.5 flush
      * and invalidates this encoder (re-create after PCM bytes). */
    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin == 1) {
        low += range
        range = 2
        renorm()
        put((low >> 9) & 1)
        sink.u1((low >> 8) & 1)
        sink.u1(1) // stop bit, per WriteBits(((codILow >> 7) & 3) | 1, 2)
      } else renorm()
    }
  }

  // ---------------- residual blocks (9.3.2.3 + 9.3.3.1.3) ----------------

  // ctxBlockCatOffset (Table 9-40), indexed by ctxBlockCat 0..4:
  // 0 = Intra16x16DCLevel, 1 = Intra16x16ACLevel, 2 = LumaLevel4x4,
  // 3 = ChromaDCLevel, 4 = ChromaACLevel. ctxBlockCat 5 (LumaLevel8x8)
  // has its own offsets below and position-MAPPED significance
  // contexts per Table 9-43.
  private val SigOffset = Array(0, 15, 29, 44, 47)
  private val LastOffset = Array(0, 15, 29, 44, 47)
  private val AbsOffset = Array(0, 10, 20, 30, 39)

  val CtxSigBase = 105
  val CtxLastBase = 166
  val CtxAbsBase = 227
  val CtxCbfBase = 85
  val CtxTerminate = 276

  /** ctxBlockCat 5 = LumaLevel8x8 (8x8 transform residual blocks).
    * coded_block_flag is NOT coded for this category (7.4.5.3.3: the
    * CBP luma bit carries the 8x8 block's coded-ness); significance
    * contexts ride the Table 9-43 position maps below. */
  val Cat8x8 = 5
  val CtxT8x8Base = 399 // transform_size_8x8_flag (9.3.3.1.1.10)
  val CtxSig8x8Base = 402
  val CtxLast8x8Base = 417
  val CtxAbs8x8Base = 426

  /** Table 9-43, significant_coeff_flag column, 8x8 blocks FRAME
    * coded: scan position (levelListIdx 0..62) -> ctxIdxInc 0..14.
    * Structural pins (H264CabacSpec): 63 entries, every inc 0-14
    * present, the low-frequency ramp 0,1,2,3,4,5 opens the map, and
    * position 0 (the DC coefficient) maps alone to inc 0. */
  val SigMap8x8: Array[Int] = Array(
    0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12)

  /** Table 9-43, last_significant_coeff_flag column, 8x8 frame coded:
    * the geometric position-bucket cascade {1, 31, 16, 8, 4, 2, 1} —
    * monotone non-decreasing 0..6 over scan order (pinned). */
  val LastMap8x8: Array[Int] = Array(
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6)

  /** Decode a UEGk bypass suffix (9.3.2.3): the Exp-Golomb escape tail
    * that follows a TU prefix which hit its cMax. Returns the suffix
    * value (added to cMax by the caller). */
  def decodeUegSuffix(d: Dec, k0: Int): Int = {
    var v = 0
    var k = k0
    while (d.bypass() == 1) {
      v += 1 << k
      k += 1
      if (k > 30) throw new CabacFormat("ueg suffix overrun")
    }
    while (k > k0) { k -= 1; v += d.bypass() << k }
    var i = k0
    while (i > 0) { i -= 1; v += d.bypass() << i }
    v
  }

  /** Encode a UEGk bypass suffix — the bit-exact mirror of
    * [[decodeUegSuffix]]. */
  def encodeUegSuffix(e: Enc, k0: Int, value: Int): Unit = {
    var rem = value
    var k = k0
    while (rem >= (1 << k)) { rem -= 1 << k; e.bypass(1); k += 1 }
    e.bypass(0)
    while (k > 0) { k -= 1; e.bypass((rem >> k) & 1) }
  }

  /** significant_coeff_flag ctxIdx for scan position i: linear in the
    * position for cats 0-4, Table 9-43-mapped for cat 5. */
  @inline private def sigCtx(cat: Int, i: Int): Int =
    if (cat == Cat8x8) CtxSig8x8Base + SigMap8x8(i)
    else CtxSigBase + SigOffset(cat) + i

  @inline private def lastCtx(cat: Int, i: Int): Int =
    if (cat == Cat8x8) CtxLast8x8Base + LastMap8x8(i)
    else CtxLastBase + LastOffset(cat) + i

  @inline private def absBaseOf(cat: Int): Int =
    if (cat == Cat8x8) CtxAbs8x8Base else CtxAbsBase + AbsOffset(cat)

  /** Decode one residual block's levels (scan order) after a
    * coded_block_flag of 1 (inferred 1 from the CBP for cat 5):
    * significance map, then levels in reverse scan order
    * (coeff_abs_level_minus1 UEG0 + bypass sign). Returns the number
    * of nonzero levels. */
  def decodeResidualLevels(d: Dec, cx: Ctx, cat: Int, coeffs: Array[Int],
      maxNumCoeff: Int): Int = {
    java.util.Arrays.fill(coeffs, 0, maxNumCoeff, 0)
    val sig = new Array[Boolean](maxNumCoeff)
    var lastIdx = maxNumCoeff - 1
    var i = 0
    var sawLast = false
    while (i < maxNumCoeff - 1 && !sawLast) {
      if (d.decision(cx, sigCtx(cat, i)) == 1) {
        sig(i) = true
        if (d.decision(cx, lastCtx(cat, i)) == 1) { lastIdx = i; sawLast = true }
      }
      i += 1
    }
    if (!sawLast) sig(maxNumCoeff - 1) = true
    val absBase = absBaseOf(cat)
    var eq1 = 0 // numDecodAbsLevelEq1
    var gt1 = 0 // numDecodAbsLevelGt1
    var n = 0
    var k = lastIdx
    while (k >= 0) {
      if (sig(k)) {
        // coeff_abs_level_minus1: TU prefix (cMax 14) in contexts, EG0 bypass suffix
        val ctx0 = absBase + (if (gt1 != 0) 0 else math.min(4, 1 + eq1))
        var mag = 0
        if (d.decision(cx, ctx0) == 1) {
          mag = 1
          val ctxN = absBase + 5 + math.min(4, gt1)
          var more = true
          while (more && mag < 14) {
            if (d.decision(cx, ctxN) == 1) mag += 1 else more = false
          }
          if (more) { // prefix hit cMax: EG0 suffix in bypass bins
            var kk = 0
            while (d.bypass() == 1) {
              mag += 1 << kk
              kk += 1
              if (kk > 16) throw new CabacFormat("level suffix overrun")
            }
            while (kk > 0) { kk -= 1; mag += d.bypass() << kk }
          }
        }
        val level = mag + 1
        if (level > (1 << 15)) throw new CabacFormat("coefficient overflow")
        val neg = d.bypass() == 1
        coeffs(k) = if (neg) -level else level
        if (level == 1) eq1 += 1 else gt1 += 1
        n += 1
      }
      k -= 1
    }
    n
  }

  /** Encode one residual block's levels (scan order, at least one
    * nonzero) — the bit-exact mirror of [[decodeResidualLevels]]. */
  def encodeResidualLevels(e: Enc, cx: Ctx, cat: Int, coeffs: Array[Int],
      maxNumCoeff: Int): Unit = {
    var lastIdx = maxNumCoeff - 1
    while (lastIdx > 0 && coeffs(lastIdx) == 0) lastIdx -= 1
    require(coeffs(lastIdx) != 0, "encodeResidualLevels on an all-zero block")
    var i = 0
    while (i < maxNumCoeff - 1 && i <= lastIdx) {
      val s = coeffs(i) != 0
      // the final position's significance is implied when no earlier
      // last flag fired; flags are only sent for positions < max-1
      e.decision(cx, sigCtx(cat, i), if (s) 1 else 0)
      if (s) e.decision(cx, lastCtx(cat, i), if (i == lastIdx) 1 else 0)
      i += 1
    }
    val absBase = absBaseOf(cat)
    var eq1 = 0
    var gt1 = 0
    var k = lastIdx
    while (k >= 0) {
      val v = coeffs(k)
      if (v != 0) {
        val mag = math.abs(v) - 1
        val ctx0 = absBase + (if (gt1 != 0) 0 else math.min(4, 1 + eq1))
        if (mag == 0) e.decision(cx, ctx0, 0)
        else {
          e.decision(cx, ctx0, 1)
          val ctxN = absBase + 5 + math.min(4, gt1)
          var m = 1
          while (m < math.min(mag, 14)) { e.decision(cx, ctxN, 1); m += 1 }
          if (mag < 14) e.decision(cx, ctxN, 0) // TU terminator
          else {
            // prefix complete at cMax (14 ones, no terminator):
            // EG0 suffix on (mag - 14) in bypass bins
            var rem = mag - 14
            var kk = 0
            while (rem >= (1 << kk)) { rem -= 1 << kk; e.bypass(1); kk += 1 }
            e.bypass(0)
            while (kk > 0) { kk -= 1; e.bypass((rem >> kk) & 1) }
          }
        }
        e.bypass(if (v < 0) 1 else 0)
        if (mag == 0) eq1 += 1 else gt1 += 1
      }
      k -= 1
    }
  }
}
