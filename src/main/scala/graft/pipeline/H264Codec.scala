package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/**
 * Pure-JVM H.264/AVC (ITU-T H.264, public spec) INTRA codec — the last
 * synthetic multimodal surface: with this, MP4 'avc1' samples produced
 * by [[Mp4Demux.encodeMp4]] carry REAL H.264 IDR frames that
 * [[Multimodal]] decodes back to pixels, end-to-end.
 *
 * Scope (deliberately bounded — there is no codec library in this
 * container to witness against, so everything implemented must be
 * verifiable from the spec + lossless round-trips):
 *
 *  - NAL layer: Annex-B start-code streams AND length-prefixed AVCC
 *    sample payloads; emulation-prevention-byte (00 00 03) insertion
 *    and removal (7.3.1 / 7.4.1.1).
 *  - Exp-Golomb ue(v)/se(v) (9.1), bit-exact both directions.
 *  - SPS / PPS / IDR slice-header parse and write (7.3.2.1, 7.3.2.2,
 *    7.3.3) for baseline-profile, frame_mbs_only, CAVLC, POC type 2.
 *  - Macroblock layer for I slices with I_PCM macroblocks (7.3.5,
 *    mb_type 25): raw 4:2:0 samples, byte-aligned — spec-valid H.264
 *    any conformant decoder accepts, and LOSSLESS, so the round-trip
 *    spec pins exact pixel equality (the spec's own escape hatch for
 *    uncompressible content; here it doubles as the honest fixture
 *    path, exactly like the BMP/WAV/Y4M codecs).
 *  - Intra_16x16 macroblocks with FULL CAVLC residual decoding AND
 *    encoding (clauses 8.3/8.5/9.2 via [[H264Cavlc]] +
 *    [[H264Transform]]): V/H/DC/Plane luma-16x16 and DC/H/V/Plane
 *    chroma prediction, luma-DC Hadamard + chroma-DC 2x2 + 4x4
 *    integer transforms, nC neighbor tracking across I_PCM and coded
 *    macroblocks. The encoder (`qp` >= 0) reconstructs exactly as the
 *    decoder, so intra prediction chains agree.
 *  - Intra_4x4 macroblocks (mb_type 0), decode AND encode: all nine
 *    8.3.1.2 directional predictors with the top-right substitution
 *    and decode-order availability rules, most-probable-mode
 *    signaling (8.3.1.1), me(v)-coded CBP (Table 9-5 intra), full
 *    16-coefficient CAVLC residual blocks — the I-slice shape real
 *    baseline encoders emit. The encoder reconstructs bit-exactly as
 *    the decoder (pinned by spec), so intra chains agree.
 *  - P slices (r11), decode AND encode — the IPPP GOP shape typical
 *    MP4s carry: mb_skip_run / P_Skip (8.4.1.1), all Table 7-13 inter
 *    MB partitions (16x16/16x8/8x16/P_8x8 with every sub_mb_type) with
 *    the 8.4.1.3 median MV predictor and its directional shortcuts,
 *    quarter-pel luma (6-tap half + averaged quarter, 8.4.2.2.1) and
 *    eighth-pel bilinear chroma interpolation, Table 9-5 INTER CBP,
 *    and intra macroblocks inside P slices (mb_type − 5). Single
 *    reference frame (the baseline IPPP case); the encoder emits
 *    P_Skip / P_L0_16x16 (+ optional forced intra) and reconstructs
 *    exactly as the decoder, so [[encodeGop]]/[[decodeGop]] pin parity
 *    plane-exactly across whole GOPs.
 *
 * Verification posture: no conformant decoder ships in this container,
 * so foreign-bitstream conformance is untestable here; what the specs
 * pin is spec-vector bit primitives, structurally-validated VLC
 *    tables (H264CavlcSpec), byte-exact I_PCM transport, and
 * rate/quality-sane compressed round trips (flat content exact).
 *
 * Reference scope anchor: the Mr.LDA reference has no media surface;
 * this is beyond-reference capability for the multimodal pipeline.
 */
object H264Codec {

  // ---------------- RBSP bit IO ----------------

  /** MSB-first reader over RBSP bytes (EPBs already removed). */
  private final class BitReader(data: Array[Byte]) extends H264Cavlc.BitIn {
    var pos = 0 // bit position
    def more: Boolean = pos < data.length * 8
    def u1(): Int = {
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    /** ue(v) Exp-Golomb (9.1). */
    def ue(): Int = {
      var lz = 0
      while (u1() == 0) {
        lz += 1
        if (lz > 31) throw new H264Format("ue(v) runaway")
      }
      (1 << lz) - 1 + u(lz)
    }
    /** se(v) (9.1.1). */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    def alignToByte(): Unit = { pos = (pos + 7) & ~7 }
    def byteAligned: Boolean = (pos & 7) == 0
    def readByte(): Int = { val v = u(8); v }
    /** Underlying RBSP + aligned byte position — the hand-off point to
      * the CABAC arithmetic decoder (which consumes whole bytes). */
    def rbsp: Array[Byte] = data
    def bytePosAligned: Int = { require(byteAligned); pos >> 3 }
    /** more_rbsp_data() (7.2): data remains iff the current position
      * is before the rbsp_stop_one_bit — the LAST set bit in the
      * payload (trailing alignment past it is all zeros). */
    def moreRbspData: Boolean = {
      var b = data.length - 1
      while (b >= 0 && data(b) == 0) b -= 1
      if (b < 0) return false
      var stop = b * 8 + 7
      while (((data(b) >> (7 - (stop & 7))) & 1) == 0) stop -= 1
      pos < stop
    }
  }

  private final class BitWriter extends H264Cavlc.BitOut {
    private val out = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def u1(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
    }
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val cn = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(cn)
      u(0, len - 1); u(cn, len)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def alignToByte(): Unit = while (nbits != 0) u1(0)
    def byteAligned: Boolean = nbits == 0
    def writeByte(b: Int): Unit = u(b & 0xff, 8)
    /** rbsp_trailing_bits: stop bit then align (7.3.2.11). */
    def trailing(): Unit = { u1(1); alignToByte() }
    def bytes: Array[Byte] = {
      require(nbits == 0, "unaligned RBSP")
      out.toArray
    }
  }

  private final class H264Format(msg: String) extends RuntimeException(msg)

  // ---------------- NAL escaping ----------------

  /** EBSP -> RBSP: drop emulation-prevention bytes (00 00 03 -> 00 00). */
  private[pipeline] def unescape(ebsp: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new ArrayBuffer[Byte](until - from)
    var zeros = 0
    var i = from
    while (i < until) {
      val b = ebsp(i)
      if (zeros >= 2 && b == 3) {
        zeros = 0 // skip the EPB
      } else {
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  /** RBSP -> EBSP: insert 03 after any 00 00 followed by a byte <= 3. */
  private[pipeline] def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i)
      if (zeros >= 2 && (b & 0xff) <= 3) {
        out += 3
        zeros = 0
      }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toArray
  }

  // ---------------- parameter sets ----------------

  // -------- scaling matrices (7.3.2.1.1.1, 8.5.9 — r15 CQM) --------

  /** Resolved scaling matrices in RASTER order: `w4(i)` 16-entry for
    * i = 0..5 (IntraY, IntraCb, IntraCr, InterY, InterCb, InterCr),
    * `w8(i)` 64-entry for i = 0..1 (IntraY, InterY — the two 8x8
    * lists 4:2:0 carries). [[ScalingLists.Flat]] is the all-16 shape
    * every Baseline/Main and flag-0 High stream uses. */
  final class ScalingLists(val w4: Array[Array[Int]], val w8: Array[Array[Int]])

  object ScalingLists {
    val Flat = new ScalingLists(
      Array.fill(6)(H264Transform.Flat16),
      Array.fill(2)(H264Transform8x8.Flat64))
  }

  /** Table 7-3 defaults, raster order (the zigzag-scan form the spec
    * lists un-zigzags to these; symmetric, monotone along diagonals —
    * pinned structurally in H264CqmSpec). Shared encoder/decoder, so a
    * transcription fault is invisible to self round trips (the CABAC
    * init-table posture); unlike those tables the structure here IS
    * checkable: w(i,j) = w(j,i) and zigzag-monotone, both pinned. */
  private[graft] val Default4x4Intra: Array[Int] = Array(
    6, 13, 20, 28,
    13, 20, 28, 32,
    20, 28, 32, 37,
    28, 32, 37, 42)
  private[graft] val Default4x4Inter: Array[Int] = Array(
    10, 14, 20, 24,
    14, 20, 24, 27,
    20, 24, 27, 30,
    24, 27, 30, 34)
  /** Table 7-4 defaults, raster order. */
  private[graft] val Default8x8Intra: Array[Int] = Array(
    6, 10, 13, 16, 18, 23, 25, 27,
    10, 11, 16, 18, 23, 25, 27, 29,
    13, 16, 18, 23, 25, 27, 29, 31,
    16, 18, 23, 25, 27, 29, 31, 33,
    18, 23, 25, 27, 29, 31, 33, 36,
    23, 25, 27, 29, 31, 33, 36, 38,
    25, 27, 29, 31, 33, 36, 38, 40,
    27, 29, 31, 33, 36, 38, 40, 42)
  private[graft] val Default8x8Inter: Array[Int] = Array(
    9, 13, 15, 17, 19, 21, 22, 24,
    13, 13, 17, 19, 21, 22, 24, 25,
    15, 17, 19, 21, 22, 24, 25, 27,
    17, 19, 21, 22, 24, 25, 27, 28,
    19, 21, 22, 24, 25, 27, 28, 30,
    21, 22, 24, 25, 27, 28, 30, 32,
    22, 24, 25, 27, 28, 30, 32, 33,
    24, 25, 27, 28, 30, 32, 33, 35)

  /** Default list for index i under Table 7-2's "default scaling
    * list" column (rule A's fall-back for i ∈ {0, 3, 6, 7} and the
    * useDefaultScalingMatrixFlag target for every i). */
  private def defaultList(i: Int): Array[Int] = i match {
    case 0 | 1 | 2 => Default4x4Intra
    case 3 | 4 | 5 => Default4x4Inter
    case 6 => Default8x8Intra
    case _ => Default8x8Inter
  }

  /** Parse one scaling_list() (7.3.2.1.1.1): returns None when
    * useDefaultScalingMatrixFlag fired (j == 0 with nextScale 0), else
    * the list converted from zigzag scan order to raster. */
  private def parseScalingList(r: BitReader, size: Int): Option[Array[Int]] = {
    val scan = new Array[Int](size)
    var lastScale = 8; var nextScale = 8
    var j = 0
    while (j < size) {
      if (nextScale != 0) {
        val delta = r.se()
        if (delta < -128 || delta > 127)
          throw new H264Format(s"delta_scale $delta out of range")
        nextScale = (lastScale + delta + 256) % 256
        if (j == 0 && nextScale == 0) return None
      }
      scan(j) = if (nextScale == 0) lastScale else nextScale
      lastScale = scan(j)
      j += 1
    }
    val zig = if (size == 16) H264Transform.Zigzag4x4 else H264Transform8x8.Zigzag8x8
    val raster = new Array[Int](size)
    j = 0
    while (j < size) { raster(zig(j)) = scan(j); j += 1 }
    Some(raster)
  }

  /** Parse the 8-list loop shared by the SPS and PPS scaling syntax
    * (4:2:0: lists 0-5 are 4x4, 6-7 are 8x8; the PPS parses 8x8 lists
    * only when transform_8x8_mode is on). Per-index result: None =
    * present-flag 0 (fall-back applies), Some = the parsed raster
    * (with useDefaultScalingMatrixFlag already resolved to the
    * Table 7-3/7-4 default). */
  private def parseScalingLists(r: BitReader, n8x8: Int): Array[Option[Array[Int]]] =
    Array.tabulate(6 + n8x8) { i =>
      if (r.u1() == 0) None
      else Some(parseScalingList(r, if (i < 6) 16 else 64).getOrElse(defaultList(i)))
    }

  /** Resolve 8 per-index raw entries into [[ScalingLists]] per
    * Table 7-2. `fromSps` = None applies fall-back rule A (defaults at
    * 0/3/6/7, previous list elsewhere); Some(sps) applies rule B (the
    * SPS's resolved list at 0/3/6/7). `raw` may carry only 6 entries
    * (PPS with transform_8x8_mode off) — the 8x8 lists then fall back
    * as if absent. */
  private def resolveScalingLists(raw: Array[Option[Array[Int]]],
      fromSps: Option[ScalingLists]): ScalingLists = {
    val out = new Array[Array[Int]](8)
    var i = 0
    while (i < 8) {
      out(i) = raw.lift(i).flatten match {
        case Some(l) => l
        case None => (i, fromSps) match {
          case (0 | 3 | 6 | 7, Some(sp)) =>
            if (i < 6) sp.w4(i) else sp.w8(i - 6)
          case (0 | 3 | 6 | 7, None) => defaultList(i)
          case _ => out(i - 1) // previous list, same parse
        }
      }
      i += 1
    }
    new ScalingLists(out.take(6), out.drop(6))
  }

  case class Sps(profileIdc: Int, levelIdc: Int, log2MaxFrameNum: Int,
      picOrderCntType: Int, widthMbs: Int, heightMbs: Int,
      cropRight: Int, cropBottom: Int, maxRefFrames: Int = 1,
      log2MaxPocLsb: Int = 16, direct8x8Inference: Boolean = true,
      // POC type 1 (8.2.1.2): the expected-POC cycle description
      pocDeltaAlwaysZero: Boolean = false, pocOffsetNonRef: Int = 0,
      pocCycle: Seq[Int] = Nil, pocOffsetTopToBottom: Int = 0,
      // 7.4.2.1.1: frame_num gaps are CONFORMANT when this is set —
      // the 8.2.5.2 non-existing-frame process fills them (r15)
      gapsAllowed: Boolean = false,
      // seq_scaling_matrix_present (r15 CQM): rule-A-resolved lists;
      // None = flag 0 (flat unless the PPS overrides)
      scaling: Option[ScalingLists] = None) {
    def width: Int = widthMbs * 16 - 2 * cropRight
    def height: Int = heightMbs * 16 - 2 * cropBottom
  }

  case class Pps(entropyCabac: Boolean, picInitQp: Int,
      deblockingControlPresent: Boolean, weightedPred: Boolean = false,
      numRefIdxL0Default: Int = 0, numRefIdxL1Default: Int = 0,
      weightedBipredIdc: Int = 0, bottomFieldPocPresent: Boolean = false,
      redundantPicCntPresent: Boolean = false,
      transform8x8Mode: Boolean = false, chromaQpOff: Int = 0,
      // pic_scaling_matrix_present (r15 CQM): per-index raw entries
      // (None = fall-back, resolved against the SPS at slice bind)
      scalingRaw: Option[Array[Option[Array[Int]]]] = None,
      // constrained_intra_pred (vacuous all-intra; P/B refuse)
      constrainedIntra: Boolean = false)

  /** The scaling matrices in effect for a picture under `sps`/`pps`
    * (8.5.9 + Table 7-2): the PPS's lists when present (rule B against
    * the SPS's, rule A when the SPS carries none), else the SPS's,
    * else flat. */
  private[graft] def effectiveScaling(sps: Sps, pps: Pps): ScalingLists =
    pps.scalingRaw match {
      case Some(raw) => resolveScalingLists(raw, sps.scaling)
      case None => sps.scaling.getOrElse(ScalingLists.Flat)
    }

  /** Encoder-side custom-quant-matrix config: the per-index raster
    * lists to signal in the SPS and/or PPS (None at an index = present
    * flag 0, Table 7-2 fall-back — mirroring the wire exactly so the
    * fall-back chains are witnessable end-to-end). [[resolved]] runs
    * the DECODER's resolver, so the encoder reconstructs through the
    * same lists the decoder will derive. */
  private[graft] final case class CqmCfg(
      sps: Option[IndexedSeq[Option[Array[Int]]]] = None,
      pps: Option[IndexedSeq[Option[Array[Int]]]] = None) {
    def resolved: ScalingLists = {
      val s = sps.map(l => resolveScalingLists(l.toArray, None))
      pps match {
        case Some(p) => resolveScalingLists(p.toArray, s)
        case None => s.getOrElse(ScalingLists.Flat)
      }
    }
  }

  /** Write one scaling_list() (7.3.2.1.1.1): raster -> zigzag-scan
    * delta_scale stream (always the full list; the nextScale-0 run-on
    * and useDefault shortcuts are decode-side forms the parser covers
    * separately). */
  private def writeScalingList(w: BitWriter, raster: Array[Int], size: Int): Unit = {
    val zig = if (size == 16) H264Transform.Zigzag4x4 else H264Transform8x8.Zigzag8x8
    var last = 8
    var j = 0
    while (j < size) {
      val v = raster(zig(j))
      require(v >= 1 && v <= 255, s"scaling weight $v out of range")
      var d = v - last
      if (d < -128) d += 256 else if (d > 127) d -= 256
      w.se(d)
      last = v
      j += 1
    }
  }

  /** Write the 8-list (or 6-list PPS) present-flag loop. */
  private def writeScalingLists(w: BitWriter,
      lists: IndexedSeq[Option[Array[Int]]], n: Int): Unit = {
    var i = 0
    while (i < n) {
      lists.lift(i).flatten match {
        case Some(raster) => w.u1(1); writeScalingList(w, raster, if (i < 6) 16 else 64)
        case None => w.u1(0)
      }
      i += 1
    }
  }

  private def parseSps(r: BitReader): Sps = {
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    r.ue() // sps id
    var spsScaling: Option[ScalingLists] = None
    if (profile == 100) {
      // High profile (r13): 8-bit 4:2:0; custom scaling matrices parse
      // per 7.3.2.1.1.1 with Table 7-2 rule A (r15); wider chroma /
      // bit depth refuse loudly rather than mis-decoding
      if (r.ue() != 1) throw new H264Format("chroma_format != 4:2:0 out of scope")
      if (r.ue() != 0) throw new H264Format("bit_depth_luma != 8 out of scope")
      if (r.ue() != 0) throw new H264Format("bit_depth_chroma != 8 out of scope")
      if (r.u1() != 0) throw new H264Format("transform bypass out of scope")
      if (r.u1() == 1) // seq_scaling_matrix_present
        spsScaling = Some(resolveScalingLists(parseScalingLists(r, n8x8 = 2), None))
    } else if (profile == 110 || profile == 122 || profile == 244 ||
      profile == 44 || profile == 83 || profile == 86 || profile == 118 ||
      profile == 128) throw new H264Format(s"profile $profile out of scope")
    val log2MaxFrameNum = r.ue() + 4
    val poc = r.ue()
    if (poc > 2) throw new H264Format(s"pic_order_cnt_type $poc")
    // POC type 0's lsb width matters: the slice header reads exactly
    // this many bits (a fixed-16 read would misparse every foreign
    // type-0 stream whose log2 != 16 — latent until r12's B support)
    val log2MaxPocLsb = if (poc == 0) r.ue() + 4 else 16
    // POC type 1 (r14, 8.2.1.2): the SPS carries the expected-POC
    // cycle; slice headers then send only a small delta (or nothing,
    // when delta_pic_order_always_zero_flag)
    var pocAlwaysZero = false
    var pocNonRef = 0
    var pocCycle: Seq[Int] = Nil
    var pocOffTB = 0
    if (poc == 1) {
      pocAlwaysZero = r.u1() == 1
      pocNonRef = r.se()
      pocOffTB = r.se() // offset_for_top_to_bottom_field
      val n = r.ue()
      if (n > 255) throw new H264Format(s"poc cycle length $n > 255")
      pocCycle = Seq.fill(n)(r.se())
    }
    if (log2MaxPocLsb > 16) throw new H264Format(s"log2_max_poc_lsb $log2MaxPocLsb > 16")
    val maxRef = r.ue() // max_num_ref_frames: bounds the decoder's DPB ring
    if (maxRef > 16) throw new H264Format(s"max_num_ref_frames $maxRef > 16")
    val gapsAllowed = r.u1() == 1 // gaps_in_frame_num_value_allowed_flag
    val wMbs = r.ue() + 1
    val hMap = r.ue() + 1
    val frameMbsOnly = r.u1()
    if (frameMbsOnly == 0) throw new H264Format("interlace out of scope")
    val d8x8 = r.u1() == 1 // direct_8x8_inference_flag
    var cropR = 0; var cropB = 0
    if (r.u1() == 1) { // frame_cropping
      val l = r.ue(); cropR = r.ue(); val t = r.ue(); cropB = r.ue()
      if (l != 0 || t != 0) throw new H264Format("left/top crop out of scope")
    }
    r.u1() // vui_present (ignored if absent; VUI payload not parsed)
    Sps(profile, level, log2MaxFrameNum, poc, wMbs, hMap, cropR, cropB,
      math.max(1, maxRef), log2MaxPocLsb, d8x8,
      pocAlwaysZero, pocNonRef, pocCycle, pocOffTB, gapsAllowed,
      scaling = spsScaling)
  }

  private def parsePps(r: BitReader): Pps = {
    r.ue(); r.ue() // pps id, sps id
    val cabac = r.u1() == 1
    val bottomPoc = r.u1() == 1 // bottom_field_pic_order_in_frame_present
    if (r.ue() != 0) throw new H264Format("slice groups out of scope")
    val numRefL0 = r.ue() // num_ref_idx_l0_default_active_minus1
    val numRefL1 = r.ue() // num_ref_idx_l1_default_active_minus1 (B slices)
    val weighted = r.u1() == 1 // weighted_pred_flag (P slices)
    val wBipred = r.u(2) // weighted_bipred_idc (B slices: 0 = default averaging)
    val qp = r.se() + 26
    r.se() // pic_init_qs (SP/SI only)
    // chroma_qp_index_offset: QPc = lookup(Clip3(0, 51, QPy + offset)) —
    // silently ignoring a nonzero offset would mis-decode every chroma
    // block of streams tuned with it (e.g. x264 --chroma-qp-offset)
    val cqpOff = r.se()
    if (cqpOff < -12 || cqpOff > 12)
      throw new H264Format(s"chroma_qp_index_offset $cqpOff out of range")
    val deblock = r.u1() == 1
    // constrained_intra_pred (8.3.1-8.3.3): flag 1 makes intra MBs in
    // P/B slices treat INTER neighbors as unavailable — VACUOUS in
    // all-intra streams (which commonly set it), so those keep
    // decoding; P/B slices refuse at decodeSlice until the
    // availability arithmetic is implemented (CATALOG adjudication)
    val cip = r.u1() == 1
    val redundant = r.u1() == 1 // redundant_pic_cnt_present_flag
    // High-profile PPS extension (7.3.2.2 tail, present iff more RBSP
    // data before the stop bit): 8x8 transform mode, scaling matrices
    // (parsed per 7.3.2.1.1.1, resolved against the SPS at slice bind
    // — Table 7-2 rule B needs the SPS's lists, r15), second chroma
    // offset (must equal the first — Cb/Cr split offsets stay out of
    // scope)
    var t8x8 = false
    var scalingRaw: Option[Array[Option[Array[Int]]]] = None
    if (r.moreRbspData) {
      t8x8 = r.u1() == 1
      if (r.u1() == 1) // pic_scaling_matrix_present
        scalingRaw = Some(parseScalingLists(r, n8x8 = if (t8x8) 2 else 0))
      val cqpOff2 = r.se()
      if (cqpOff2 != cqpOff)
        throw new H264Format("per-component chroma QP offsets out of scope")
    }
    Pps(cabac, qp, deblock, weighted, numRefL0, numRefL1, wBipred, bottomPoc,
      redundant, t8x8, cqpOff, scalingRaw, cip)
  }

  // ---------------- decode ----------------

  /** One decoded frame as the repo's interchange RGB image. */
  def decode(payload: Array[Byte]): Option[MediaCodecs.Bmp] =
    try decodeImpl(payload).map { case (sps, yP, cbP, crP) =>
      yuvToRgb(sps, yP, cbP, crP)
    } catch { case _: Exception => None }

  /** Decoded 4:2:0 planes (MB-padded) + SPS — the transport-lossless
    * surface the round-trip spec pins byte-exactly (I_PCM carries the
    * planes verbatim; only the RGB<->YCbCr conversion is lossy). */
  private[graft] def decodeYuv(payload: Array[Byte])
      : Option[(Sps, Array[Byte], Array[Byte], Array[Byte])] =
    try decodeImpl(payload) catch { case _: Exception => None }

  /** Split a payload into NAL units: AVCC 4-byte length prefixes when
    * they frame the buffer exactly, otherwise Annex-B start codes. */
  private[pipeline] def nalUnits(p: Array[Byte]): Seq[(Int, Int)] = {
    // try AVCC: consecutive [len][nal] covering the whole payload
    val units = ArrayBuffer.empty[(Int, Int)]
    var o = 0
    var avcc = p.length >= 5
    while (avcc && o < p.length) {
      if (o + 4 > p.length) avcc = false
      else {
        val len = ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
          ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
        if (len <= 0 || o + 4 + len > p.length) avcc = false
        else { units += ((o + 4, o + 4 + len)); o += 4 + len }
      }
    }
    if (avcc && o == p.length && units.nonEmpty) return units.toSeq
    // Annex-B
    units.clear()
    val starts = ArrayBuffer.empty[Int]
    var i = 0
    while (i + 3 < p.length) {
      if (p(i) == 0 && p(i + 1) == 0 &&
        (p(i + 2) == 1 || (p(i + 2) == 0 && i + 3 < p.length && p(i + 3) == 1))) {
        val s = if (p(i + 2) == 1) i + 3 else i + 4
        starts += s
        i = s
      } else i += 1
    }
    starts.indices.foreach { k =>
      val end = if (k + 1 < starts.length) {
        // NAL ends where the next start code begins (strip its 00s)
        var e = starts(k + 1) - 3
        if (e > 0 && p(e - 1) == 0) e -= 1
        e
      } else p.length
      units += ((starts(k), end))
    }
    units.toSeq
  }

  private def decodeImpl(p: Array[Byte])
      : Option[(Sps, Array[Byte], Array[Byte], Array[Byte])] =
    new GopDecoder().decodeAuYuv(p)

  /**
   * Stateful access-unit decoder for a GOP: an IDR frame resets the
   * decoded-picture buffer, a P frame (NAL type 1) motion-compensates
   * against reference frames from the DPB ring — up to the SPS's
   * max_num_ref_frames most recent reference pictures, list-0 ordered
   * most-recent-first (the 8.2.4.2.1 P default; descending PicNum) and
   * evicted sliding-window style (8.2.5.3: oldest out) — so x264's
   * default ref=3 baseline output decodes, not just IPPP-with-one-ref.
   * SPS/PPS carry across payloads, so P-frame payloads need not repeat
   * them. Explicit list reordering and adaptive marking stay out of
   * scope (they throw).
   */
  /** POC decoder state: type 0 (8.2.1.1) tracks the previous REFERENCE
    * picture's MSB/LSB for lsb-wraparound repair; type 1 (8.2.1.2)
    * tracks the previous picture's (any, not just reference)
    * FrameNumOffset + frame_num for the wrap accumulator. */
  private[graft] final class PocState {
    var prevMsb = 0; var prevLsb = 0
    var prevFrameNumOffset = 0; var prevFrameNum = 0
    def reset(): Unit = {
      prevMsb = 0; prevLsb = 0; prevFrameNumOffset = 0; prevFrameNum = 0
    }
  }

  /** Frame PicOrderCnt, type 0 (8.2.1.1 + 8.2.1): lsb-wraparound MSB
    * repair against the previous REFERENCE picture, then the frame's
    * POC is Min(TopFieldOrderCnt, BottomFieldOrderCnt) where Bottom =
    * Top + delta_pic_order_cnt_bottom — a NEGATIVE delta makes the
    * bottom field carry the frame's POC (before r14 the delta was
    * parsed and DISCARDED: a silent mis-order on foreign streams
    * tuned with it). Fixed vectors in H264PocType1Spec. */
  private[graft] def framePocType0(sps: Sps, idr: Boolean, refIdc: Int,
      lsb: Int, deltaBottom: Int, pocState: PocState): Int = {
    val maxLsb = 1 << sps.log2MaxPocLsb
    val (pm, pl) = if (idr) (0, 0) else (pocState.prevMsb, pocState.prevLsb)
    val msb =
      if (lsb < pl && pl - lsb >= maxLsb / 2) pm + maxLsb
      else if (lsb > pl && lsb - pl > maxLsb / 2) pm - maxLsb
      else pm
    if (refIdc != 0) { pocState.prevMsb = msb; pocState.prevLsb = lsb }
    math.min(msb + lsb, msb + lsb + deltaBottom)
  }

  /** Frame PicOrderCnt, type 1 (8.2.1.2): Min(Top, Bottom) over the
    * cyclic derivation below, with Bottom = Top +
    * offset_for_top_to_bottom_field + delta_pic_order_cnt[1]. */
  private[graft] def framePocType1(sps: Sps, idr: Boolean, refIdc: Int,
      frameNum: Int, delta0: Int, delta1: Int, pocState: PocState): Int = {
    val top = derivePocType1(sps, idr, refIdc, frameNum, delta0, pocState)
    math.min(top, top + sps.pocOffsetTopToBottom + delta1)
  }

  /** POC type 1 TopFieldOrderCnt derivation (8.2.1.2, frame coding): accumulate
    * FrameNumOffset across frame_num wraps, map absFrameNum onto the
    * SPS cycle for the expected POC, subtract one cycle position for
    * non-reference pictures and add their offset, then apply the
    * slice's delta. Updates `st` (every picture advances the type-1
    * state, reference or not). Shared verbatim by the decoder and the
    * type-1 GOP encoder (which solves delta = desired − expected). */
  private def derivePocType1(sps: Sps, idr: Boolean, refIdc: Int, frameNum: Int,
      delta0: Int, st: PocState): Int = {
    val maxFn = 1 << sps.log2MaxFrameNum
    val fno =
      if (idr) 0
      else if (st.prevFrameNum > frameNum) st.prevFrameNumOffset + maxFn
      else st.prevFrameNumOffset
    val nCyc = sps.pocCycle.length
    var absFrameNum = if (nCyc > 0) fno + frameNum else 0
    if (refIdc == 0 && absFrameNum > 0) absFrameNum -= 1
    var expected = 0
    if (absFrameNum > 0) {
      val cycleCnt = (absFrameNum - 1) / nCyc
      val inCycle = (absFrameNum - 1) % nCyc
      expected = cycleCnt * sps.pocCycle.sum +
        sps.pocCycle.take(inCycle + 1).sum
    }
    if (refIdc == 0) expected += sps.pocOffsetNonRef
    st.prevFrameNumOffset = fno
    st.prevFrameNum = frameNum
    expected + delta0
  }

  private[graft] final class GopDecoder {
    private var sps: Sps = null
    private var pps: Pps = null
    private var dpb: List[FrameState] = Nil // short-term, most recent first
    private var ltDpb: List[FrameState] = Nil // long-term, ascending idx
    private var maxLtIdxPlus1 = 0 // MaxLongTermFrameIdx + 1 (8.2.5.4)
    private var prevRefFrameNum = -1 // 7.4.3 continuity; -1 = unknown
    private val poc = new PocState

    /** 8.2.5.2: fill a CONFORMANT frame_num gap (gaps_allowed = 1) by
      * inserting "non-existing" frames for every UnusedShortTermFrameNum
      * in (PrevRefFrameNum, curFrameNum) mod MaxFrameNum. Each inserted
      * frame is marked short-term used-for-reference through the same
      * 8.2.5.3 sliding window a real frame rides (it can evict, and be
      * evicted by, real frames), so PicNum-ordered default lists place
      * later REAL references at the spec-exact ref_idx. POC: type 1
      * derives per 8.2.1.2 with the per-slice deltas inferred 0 (this
      * also keeps the FrameNumOffset wrap accumulator honest); type 2
      * carries no POC here (P-only decode order); type 0's
      * pic_order_cnt_lsb lives in the slice header a non-existing frame
      * does not have — B-list ordering would be underivable, so type-0
      * gaps refuse (correct-or-refuse, documented in CATALOG). */
    private def fillFrameNumGap(curFrameNum: Int): List[FrameState] = {
      if (sps.picOrderCntType == 0)
        throw new H264Format(
          "frame_num gap under POC type 0 out of scope (no derivable poc lsb)")
      val maxFn = 1 << sps.log2MaxFrameNum
      val cap = math.max(1, sps.maxRefFrames)
      var un = (prevRefFrameNum + 1) % maxFn
      var guard = 0
      while (un != curFrameNum) {
        guard += 1
        if (guard > maxFn) throw new H264Format("gap fill overrun")
        val f = new FrameState(sps.widthMbs, sps.heightMbs)
        f.nonExisting = true
        f.frameNum = un
        if (sps.picOrderCntType == 1)
          f.poc = framePocType1(sps, idr = false, refIdc = 1, un,
            delta0 = 0, delta1 = 0, poc)
        if (dpb.length + ltDpb.length >= cap) {
          if (dpb.isEmpty)
            throw new H264Format("sliding window with no short-term to evict")
          dpb = dpb.dropRight(1)
        }
        dpb = f :: dpb
        prevRefFrameNum = un
        un = (un + 1) % maxFn
      }
      dpb
    }

    /** Apply this reference picture's dec_ref_pic_marking to the DPB
      * (8.2.5): the MMCO list in stream order when adaptive, else the
      * 8.2.5.3 sliding window (oldest short-term out). A conformant
      * stream never overfills; an overfull DPB or a dangling PicNum
      * rejects loudly — mis-addressed marking means later references
      * would silently resolve to the wrong pictures. */
    private def markReference(st: FrameState): Unit = {
      val cap = math.max(1, sps.maxRefFrames)
      if (st.mmcoOps.isEmpty) {
        if (dpb.length + ltDpb.length >= cap) {
          if (dpb.isEmpty)
            throw new H264Format("sliding window with no short-term to evict")
          dpb = dpb.dropRight(1)
        }
        dpb = st :: dpb
        return
      }
      val maxFrameNum = 1 << sps.log2MaxFrameNum
      def picNum(f: FrameState): Int =
        if (f.frameNum > st.frameNum) f.frameNum - maxFrameNum else f.frameNum
      var currentLt = false
      st.mmcoOps.foreach { case (op, a1, a2) =>
        op match {
          case 1 => // unmark a short-term picture
            val px = st.frameNum - (a1 + 1)
            if (!dpb.exists(f => picNum(f) == px))
              throw new H264Format(s"MMCO 1: no short-term PicNum $px")
            dpb = dpb.filterNot(f => picNum(f) == px)
          case 2 => // unmark a long-term picture
            if (!ltDpb.exists(_.longTermIdx == a1))
              throw new H264Format(s"MMCO 2: no long-term $a1")
            ltDpb = ltDpb.filterNot(_.longTermIdx == a1)
          case 3 => // short-term -> long-term at idx a2
            val px = st.frameNum - (a1 + 1)
            val t = dpb.find(f => picNum(f) == px).getOrElse(
              throw new H264Format(s"MMCO 3: no short-term PicNum $px"))
            if (t.nonExisting) // 8.2.5.2: may not be marked long-term
              throw new H264Format("MMCO 3 on a non-existing frame")
            if (a2 >= maxLtIdxPlus1)
              throw new H264Format(s"MMCO 3: idx $a2 >= max $maxLtIdxPlus1")
            dpb = dpb.filterNot(_ eq t)
            t.longTermIdx = a2
            ltDpb = (t :: ltDpb.filterNot(_.longTermIdx == a2))
              .sortBy(_.longTermIdx)
          case 4 => // set MaxLongTermFrameIdx, truncate above it
            maxLtIdxPlus1 = a1
            ltDpb = ltDpb.filter(_.longTermIdx < a1)
          case 5 => // full reset (8.2.5.4.5): every reference unmarked,
            // no long-term indices, and the CURRENT picture rebases to
            // frame_num 0 / PicOrderCnt 0 — the next picture's PicNum
            // and POC-MSB derivations read the rebased values, exactly
            // as if this picture had been an IDR (conferencing streams
            // emit this instead of one)
            dpb = Nil; ltDpb = Nil; maxLtIdxPlus1 = 0
            st.frameNum = 0
            st.poc = 0
            poc.reset()
          case 6 => // mark the CURRENT picture long-term at idx a1
            if (a1 >= maxLtIdxPlus1)
              throw new H264Format(s"MMCO 6: idx $a1 >= max $maxLtIdxPlus1")
            st.longTermIdx = a1
            ltDpb = ltDpb.filterNot(_.longTermIdx == a1)
            currentLt = true
          case o => throw new H264Format(s"MMCO $o")
        }
      }
      if (currentLt) ltDpb = (st :: ltDpb).sortBy(_.longTermIdx)
      else dpb = st :: dpb
      if (dpb.length + ltDpb.length > cap)
        throw new H264Format("DPB overfull after adaptive marking")
    }

    def decodeAuYuv(p: Array[Byte])
        : Option[(Sps, Array[Byte], Array[Byte], Array[Byte])] = {
      val units = nalUnits(p)
      // a payload with NO parseable NAL structure is corrupt, not merely
      // frameless (SEI/AUD-only payloads still parse): distinguishing
      // the two keeps the GOP poisoning honest — a mangled frame must
      // not let its dependents predict from stale state
      if (units.isEmpty) throw new H264Format("no NAL units")
      for ((s, e) <- units) {
        val hdr = p(s) & 0xff
        if ((hdr & 0x80) != 0) throw new H264Format("forbidden_zero_bit")
        val nalType = hdr & 0x1f
        nalType match {
          case 7 => sps = parseSps(new BitReader(unescape(p, s + 1, e)))
          case 8 => pps = parsePps(new BitReader(unescape(p, s + 1, e)))
          case 5 | 1 => // IDR / non-IDR slice
            if (sps == null || pps == null) throw new H264Format("slice before SPS/PPS")
            val refIdc = (hdr >> 5) & 3
            val st = decodeSlice(new BitReader(unescape(p, s + 1, e)), sps, pps,
              idr = nalType == 5, refIdc, dpb, poc, ltDpb, prevRefFrameNum,
              fillFrameNumGap)
            // DPB update: an IDR resets both marking sets (8.2.5.1;
            // long_term_reference_flag self-marks it long-term at idx
            // 0); a non-IDR reference picture applies its marking;
            // non-reference frames are disposable
            if (nalType == 5) {
              if (st.idrLongTerm) {
                st.longTermIdx = 0
                dpb = Nil; ltDpb = List(st); maxLtIdxPlus1 = 1
              } else { dpb = List(st); ltDpb = Nil; maxLtIdxPlus1 = 0 }
              prevRefFrameNum = st.frameNum
            } else if (refIdc != 0) {
              markReference(st)
              // post-marking: an MMCO-5 reset rebased st.frameNum to 0
              prevRefFrameNum = st.frameNum
            }
            return Some((sps, st.yPlane, st.cbPlane, st.crPlane))
          case _ => () // SEI / AUD / others skipped
        }
      }
      None
    }

    def decodeAu(p: Array[Byte]): Option[MediaCodecs.Bmp] =
      try decodeAuYuv(p).map { case (s, y, cb, cr) => yuvToRgb(s, y, cb, cr) }
      catch { case _: Exception =>
        // a corrupt access unit poisons the chain: dependents must not
        // predict from stale state — only a later self-contained I/IDR
        // picture (which needs no reference) recovers
        dpb = Nil
        ltDpb = Nil
        maxLtIdxPlus1 = 0
        prevRefFrameNum = -1
        poc.reset()
        None
      }

    /** Seed the reference DPB directly, most-recent-first (spec hook). */
    private[pipeline] def seed(s: Sps, p: Pps, refs: List[FrameState]): Unit = {
      sps = s; pps = p; dpb = refs
    }
  }

  /** Lazy GOP decode, one frame in flight at a time — the form the
    * whole-video operators fold over so a long video never materializes
    * every frame at once. A corrupt or unsupported access unit yields
    * None for ITS slot and (via the GopDecoder's nulled reference)
    * poisons the frames that would have referenced it, until the next
    * self-contained I/IDR picture recovers. */
  def decodeGopIterator(payloads: Iterator[Array[Byte]])
      : Iterator[Option[MediaCodecs.Bmp]] = {
    val g = new GopDecoder()
    payloads.map(g.decodeAu)
  }

  /** Strict GOP decode (see [[decodeGopIterator]] — prefer the iterator
    * when frames are consumed one at a time). */
  def decodeGop(payloads: Seq[Array[Byte]]): Seq[Option[MediaCodecs.Bmp]] =
    decodeGopIterator(payloads.iterator).toSeq

  /** Decode a raw Annex-B H.264 ELEMENTARY stream (a `.h264` file: NAL
    * units back to back with start codes, no container): NALs are
    * grouped into access units — every slice NAL ends the AU that the
    * preceding parameter-set/SEI NALs opened, since this codec's scope
    * is single-slice pictures — and the AU sequence decodes as a GOP.
    * Returns one entry per picture, None for undecodable ones (same
    * poisoning semantics as [[decodeGopIterator]]).
    *
    * NOTE this form MATERIALIZES every frame of the stream at once —
    * fine for short fixtures, wrong for long streams. Prefer
    * [[decodeAnnexBIterator]], which keeps one access unit and one
    * decoded frame in flight. */
  def decodeAnnexBStream(es: Array[Byte]): Seq[Option[MediaCodecs.Bmp]] =
    decodeAnnexBIterator(es).toSeq

  /** Lazy form of [[decodeAnnexBStream]]: ONE access unit's bytes are
    * materialized at a time — the start-code scan keeps only NAL
    * positions (O(#NALs) ints), and each AU buffer is copied from the
    * elementary stream when the consumer pulls its frame, so a long
    * `.h264` file never holds a second stream-sized copy in memory.
    * AU splitting is as crash-safe as the decode itself: a truncated
    * stream (e.g. ending in a bare start code, which scans as an empty
    * NAL at the array edge) yields no pictures, it does not throw out
    * of an API aimed at untrusted input. */
  def decodeAnnexBIterator(es: Array[Byte]): Iterator[Option[MediaCodecs.Bmp]] = {
    val units =
      try nalUnits(es).filter { case (s, e) => s < e && s < es.length }
      catch { case scala.util.control.NonFatal(_) => Seq.empty }
    // group NAL positions into access units lazily: every slice NAL
    // (type 1 or 5) ends the AU the preceding parameter-set/SEI NALs
    // opened — this codec's scope is single-slice pictures. Trailing
    // non-slice NALs (SEI with nothing after) decode to nothing.
    val auBytes = new Iterator[Array[Byte]] {
      private val it = units.iterator
      private val buf = ArrayBuffer.empty[(Int, Int)]
      private var pending: Array[Byte] = fetch()
      private def fetch(): Array[Byte] = {
        while (it.hasNext) {
          val u = it.next()
          buf += u
          if (((es(u._1) & 0x1f) == 1) || ((es(u._1) & 0x1f) == 5)) {
            val total = buf.iterator.map { case (s, e) => 4 + (e - s) }.sum
            val au = new Array[Byte](total)
            var o = 0
            buf.foreach { case (s, e) =>
              au(o + 3) = 1 // 00 00 00 01 start code (leading zeros pre-set)
              o += 4
              System.arraycopy(es, s, au, o, e - s)
              o += e - s
            }
            buf.clear()
            return au
          }
        }
        null
      }
      def hasNext: Boolean = pending != null
      def next(): Array[Byte] = { val v = pending; pending = fetch(); v }
    }
    decodeGopIterator(auBytes)
  }

  /** Decode one slice (I when `idr` or slice_type says so, P against
    * the DPB's list-0, or B against POC-ordered list-0/list-1) into a
    * fresh FrameState. Header per 7.3.3, data per 7.3.4/7.3.5; `refIdc`
    * = the NAL header's nal_ref_idc (non-IDR slices carry
    * dec_ref_pic_marking syntax only when it is non-zero). */
  private def decodeSlice(r: BitReader, sps: Sps, pps: Pps, idr: Boolean,
      refIdc: Int, dpb0: List[FrameState], pocState: PocState,
      ltRefs: List[FrameState] = Nil, prevRefFrameNum: Int = -1,
      gapFill: Int => List[FrameState] = _ =>
        throw new H264Format("frame_num gap fill outside a GOP decode"))
      : FrameState = {
    // `dpb` may grow before the current picture decodes: a conformant
    // frame_num gap (gaps_allowed=1) inserts 8.2.5.2 non-existing
    // frames via `gapFill`, and the reference lists below must see them
    var dpb = dpb0
    // slice_header (7.3.3). `dpb` = short-term references, most recent
    // first; `ltRefs` = long-term references sorted by ascending
    // LongTermFrameIdx (8.2.5.4 marking state, r14).
    if (r.ue() != 0) throw new H264Format("first_mb_in_slice != 0")
    val sliceType = r.ue() % 5
    val isP = sliceType == 0
    val isB = sliceType == 1
    if (sliceType != 2 && !isP && !isB)
      throw new H264Format(s"slice type $sliceType out of scope")
    // constrained_intra_pred only changes decoding where an intra MB
    // can have an INTER neighbor — refuse exactly there
    if ((isP || isB) && pps.constrainedIntra)
      throw new H264Format("constrained_intra_pred P/B out of scope")
    if ((isP || isB) && idr) throw new H264Format("inter slice in an IDR NAL")
    if ((isP || isB) && dpb.isEmpty && ltRefs.isEmpty)
      throw new H264Format("inter slice without a reference frame")
    // B frames reference the FUTURE in display order; POC type 2 pins
    // decode order == display order, which makes that shape illegal
    // (types 0 and 1 both carry real display order)
    if (isB && sps.picOrderCntType == 2)
      throw new H264Format("B slice under POC type 2")
    // the direct derivations here implement the inference-ON form
    // (quadrant corner blocks, 8.4.1.2.2/.3); silently applying them
    // to an inference-OFF stream would mis-derive 4x4-level direct
    if (isB && !sps.direct8x8Inference)
      throw new H264Format("direct_8x8_inference_flag 0 out of scope")
    r.ue() // pps id
    val frameNum = r.u(sps.log2MaxFrameNum)
    // frame_num continuity (7.4.3): a reference picture must carry
    // PrevRefFrameNum + 1 (mod MaxFrameNum); non-reference pictures
    // that value or PrevRefFrameNum itself. When the SPS sets
    // gaps_in_frame_num_value_allowed_flag (r15), a gap is CONFORMANT
    // (temporal-scalability or RTP-origin streams) and the 8.2.5.2
    // non-existing-frame process fills it — `gapFill` inserts frames
    // for every UnusedShortTermFrameNum so PicNum accounting, sliding-
    // window eviction, and default-list positions stay spec-exact.
    // With the flag CLEAR a gap means access units are MISSING
    // (dropped packets, a truncated stream): decoding on would
    // silently predict from the wrong references — reject loudly; the
    // next IDR recovers (the GopDecoder's poisoning discipline). -1 =
    // unknown previous state (fresh or seeded decoder): check skipped.
    if (!idr && prevRefFrameNum >= 0) {
      val expect = (prevRefFrameNum + 1) % (1 << sps.log2MaxFrameNum)
      val ok =
        if (refIdc != 0) frameNum == expect
        else frameNum == expect || frameNum == prevRefFrameNum
      if (!ok) {
        if (sps.gapsAllowed && frameNum != prevRefFrameNum)
          dpb = gapFill(frameNum)
        else throw new H264Format(
          s"frame_num gap ($prevRefFrameNum -> $frameNum) out of scope")
      }
    }
    if (idr) r.ue() // idr_pic_id
    // POC (8.2.1.1, type 0): lsb at the SPS-declared width, MSB
    // repaired against the previous REFERENCE picture's (zeroed at an
    // IDR); B reference lists order the DPB by this value
    var pocVal = 0
    if (sps.picOrderCntType == 0) {
      val lsb = r.u(sps.log2MaxPocLsb)
      val deltaBottom = if (pps.bottomFieldPocPresent) r.se() else 0
      pocVal = framePocType0(sps, idr, refIdc, lsb, deltaBottom, pocState)
    } else if (sps.picOrderCntType == 1) {
      val delta0 = if (!sps.pocDeltaAlwaysZero) r.se() else 0
      val delta1 =
        if (pps.bottomFieldPocPresent && !sps.pocDeltaAlwaysZero) r.se()
        else 0
      pocVal = framePocType1(sps, idr, refIdc, frameNum, delta0, delta1,
        pocState)
    }
    // redundant_pic_cnt (7.3.3): present only when the PPS says so; a
    // non-zero value marks a REDUNDANT coded picture (a retransmission
    // of the primary) — decoding it as primary would emit the frame
    // twice, so reject; zero means this IS the primary, proceed
    if (pps.redundantPicCntPresent && r.ue() != 0)
      throw new H264Format("redundant coded pictures out of scope")
    var refs: IndexedSeq[FrameState] = IndexedSeq.empty // list 0
    var refs1: IndexedSeq[FrameState] = IndexedSeq.empty // list 1 (B only)
    // direct_spatial_mv_pred_flag: spatial direct (8.4.1.2.2) is
    // implemented; temporal direct rejects at the first direct MB
    val directSpatial = isB && r.u1() == 1
    if (isP || isB) {
      // effective list sizes: slice override, else the PPS defaults
      val (numRefL0, numRefL1) =
        if (r.u1() == 1) (r.ue(), if (isB) r.ue() else 0)
        else (pps.numRefIdxL0Default, if (isB) pps.numRefIdxL1Default else 0)
      if (numRefL0 > 15 || numRefL1 > 15)
        throw new H264Format(s"num_ref_idx $numRefL0/$numRefL1 > 16")
      if (isP) {
        // the default P list is short-term most-recent-first
        // (8.2.4.2.1: descending PicNum) then long-term by ascending
        // LongTermPicNum; a list longer than the decoded reference
        // history is corrupt
        val l0 = (dpb ++ ltRefs).toIndexedSeq
        if (numRefL0 + 1 > l0.length)
          throw new H264Format(
            s"ref list size ${numRefL0 + 1} exceeds DPB of ${l0.length}")
        refs = l0.take(numRefL0 + 1)
      } else {
        val (l0, l1) = bDefaultLists(dpb, ltRefs, pocVal)
        if (numRefL0 + 1 > l0.length)
          throw new H264Format(s"B list0 size ${numRefL0 + 1} exceeds ${l0.length}")
        if (numRefL1 + 1 > l1.length)
          throw new H264Format(s"B list1 size ${numRefL1 + 1} exceeds ${l1.length}")
        refs = l0.take(numRefL0 + 1)
        refs1 = l1.take(numRefL1 + 1)
      }
      // ref_pic_list_modification (7.3.3.1 + 8.2.4.3): short-term
      // picNum reordering — x264's weightp=2 emits this on P slices
      // (duplicate references carrying different weights) — and
      // long-term reordering by LongTermPicNum (idc 2, r14). The
      // candidate pool is the whole DPB (both marking states).
      if (r.u1() == 1)
        refs = applyListModification(r, refs, dpb.toIndexedSeq,
          ltRefs.toIndexedSeq, frameNum, 1 << sps.log2MaxFrameNum)
      if (isB && r.u1() == 1)
        refs1 = applyListModification(r, refs1, dpb.toIndexedSeq,
          ltRefs.toIndexedSeq, frameNum, 1 << sps.log2MaxFrameNum)
    }
    // pred_weight_table (7.3.3.2): explicit per-reference luma/chroma
    // weights — x264's weightp emits these on P slices by default
    var wpTab: Array[Array[Array[Int]]] = null
    var wpLogWDy = 0
    var wpLogWDc = 0
    if ((isP && pps.weightedPred) || (isB && pps.weightedBipredIdc == 1)) {
      wpLogWDy = r.ue()
      wpLogWDc = r.ue()
      if (wpLogWDy > 7 || wpLogWDc > 7)
        throw new H264Format(s"log2 weight denom $wpLogWDy/$wpLogWDc > 7")
      def entry(): Array[Int] = {
        val e = Array(1 << wpLogWDy, 0, 1 << wpLogWDc, 0, 1 << wpLogWDc, 0)
        if (r.u1() == 1) { // luma_weight_lX_flag
          e(0) = r.se(); e(1) = r.se()
          if (e(0) < -128 || e(0) > 127 || e(1) < -128 || e(1) > 127)
            throw new H264Format("luma weight/offset out of range")
        }
        if (r.u1() == 1) { // chroma_weight_lX_flag
          var c = 0
          while (c < 2) {
            e(2 + 2 * c) = r.se(); e(3 + 2 * c) = r.se()
            if (e(2 + 2 * c) < -128 || e(2 + 2 * c) > 127 ||
              e(3 + 2 * c) < -128 || e(3 + 2 * c) > 127)
              throw new H264Format("chroma weight/offset out of range")
            c += 1
          }
        }
        e
      }
      wpTab = Array(
        Array.fill(refs.length)(entry()),
        if (isB) Array.fill(refs1.length)(entry()) else Array.empty)
    }
    // dec_ref_pic_marking (7.3.3.3): present for IDR always; for
    // non-IDR only when the NAL marks the picture as a reference.
    // IDRs may self-mark long-term; non-IDR adaptive marking parses
    // the MMCO list (ops 1-6; op 5 is the full state reset —
    // conferencing streams emit it instead of an IDR). The ops apply
    // in the GopDecoder's DPB update AFTER this picture decodes
    // (8.2.5.4).
    var idrLongTerm = false
    var mmco: List[(Int, Int, Int)] = Nil
    if (idr) {
      r.u1() // no_output_of_prior_pics_flag (single-stream out: no-op)
      idrLongTerm = r.u1() == 1
    } else if (refIdc != 0 && r.u1() != 0) {
      var op = r.ue()
      var n = 0
      while (op != 0) {
        if (op > 6) throw new H264Format(s"MMCO $op")
        n += 1
        if (n > 35) throw new H264Format("MMCO list overrun")
        val a1 = if (op == 1 || op == 2 || op == 3 || op == 4 || op == 6)
          r.ue() else 0
        val a2 = if (op == 3) r.ue() else 0
        mmco = mmco :+ ((op, a1, a2))
        op = r.ue()
      }
      if (mmco.isEmpty)
        throw new H264Format("adaptive marking with an empty MMCO list")
    }
    // cabac_init_idc (7.3.3): only the idc-0 context column is
    // transcribed — the x264/JM default; 1/2 refuse loudly
    val cabacInitIdc =
      if (pps.entropyCabac && (isP || isB)) {
        val v = r.ue()
        if (v > 2) throw new H264Format(s"cabac_init_idc $v")
        if (v != 0) throw new H264Format(s"cabac_init_idc $v out of scope")
        v
      } else 0
    val sliceQpDelta = r.se() // slice_qp_delta
    // In-loop deblocking (8.7) is IMPLEMENTED for I and P slices (r12):
    // the whole-frame filter runs after the slice decodes — intra
    // prediction inside the frame reads unfiltered samples, the
    // FILTERED picture is what gets output and referenced — so foreign
    // baseline streams with deblocking on (the x264 default, and the
    // implicit default when the PPS carries no control field) decode
    // exactly. idc 2 (skip slice boundaries) equals idc 0 here: one
    // slice per picture means the only slice boundary is the picture
    // edge, which is never filtered anyway. B slices filter too (r13):
    // the boundary-strength test compares reference PICTURES per
    // 8.7.2.1, so list-swapped identical prediction stays unfiltered.
    var deblockEnabled = !pps.deblockingControlPresent // implicit: ON
    var offA = 0; var offB = 0
    if (pps.deblockingControlPresent) {
      val idc = r.ue()
      if (idc != 1) {
        deblockEnabled = true
        offA = 2 * r.se() // slice_alpha_c0_offset_div2 (doubled)
        offB = 2 * r.se() // slice_beta_offset_div2 (doubled)
      } else deblockEnabled = false
    }
    val st = new FrameState(sps.widthMbs, sps.heightMbs)
    st.poc = pocVal
    st.frameNum = frameNum
    st.idrLongTerm = idrLongTerm
    st.mmcoOps = mmco
    st.cqpOff = pps.chromaQpOff
    st.t8x8Allowed = pps.transform8x8Mode
    st.scaling = effectiveScaling(sps, pps)
    st.wpTab = wpTab
    st.wpLogWDy = wpLogWDy
    st.wpLogWDc = wpLogWDc
    st.wpImplicit = isB && pps.weightedBipredIdc == 2
    var qpY = pps.picInitQp + sliceQpDelta
    if (qpY < 0 || qpY > 51) throw new H264Format(s"slice QP $qpY out of range")
    if (pps.entropyCabac) {
      // CABAC (9.3): I, P and B slices all decode through the
      // arithmetic engine (P/B with the idc-0 context column)
      if (isP || isB)
        decodeInterSliceDataCabac(r, st, isB, refs, refs1, qpY,
          cabacInitIdc, directSpatial)
      else decodeISliceDataCabac(r, st, qpY)
      if (deblockEnabled) deblockFrame(st, offA, offB)
      return st
    }
    if (isP) {
      decodePSliceData(r, st, refs, qpY)
      if (deblockEnabled) deblockFrame(st, offA, offB)
      return st
    }
    if (isB) {
      decodeBSliceData(r, st, refs, refs1, qpY, directSpatial)
      if (deblockEnabled) deblockFrame(st, offA, offB)
      return st
    }
    // slice_data: all-I macroblocks, raster order
    var mb = 0
    val nMbs = st.wMbs * st.hMbs
    while (mb < nMbs) {
      val mbType = r.ue()
      qpY = decodeIntraMb(r, st, (mb % st.wMbs) * 16, (mb / st.wMbs) * 16,
        mbType, qpY)
      mb += 1
    }
    if (deblockEnabled) deblockFrame(st, offA, offB)
    st
  }

  /** Decode one intra macroblock (I_PCM / Intra_16x16 / Intra_4x4) at
    * pixel (mbX, mbY); mbType in I-slice numbering (P slices pass
    * mb_type − 5). Returns the updated slice QP. Shared by the I-slice
    * loop and intra MBs inside P slices. */
  private def decodeIntraMb(r: BitReader, st: FrameState, mbX: Int, mbY: Int,
      mbType: Int, qpYIn: Int): Int = {
    var qpY = qpYIn;
    {
      if (mbType == 25) { // I_PCM (7.3.5)
        while (!r.byteAligned) {
          if (r.u1() != 0) throw new H264Format("pcm_alignment_zero_bit != 0")
        }
        var i = 0
        while (i < 256) {
          st.yPlane((mbY + i / 16) * st.lumaW + mbX + i % 16) = r.readByte().toByte
          i += 1
        }
        val cW = st.lumaW / 2
        i = 0
        while (i < 64) {
          st.cbPlane((mbY / 2 + i / 8) * cW + mbX / 2 + i % 8) = r.readByte().toByte
          i += 1
        }
        i = 0
        while (i < 64) {
          st.crPlane((mbY / 2 + i / 8) * cW + mbX / 2 + i % 8) = r.readByte().toByte
          i += 1
        }
        st.markPcm(mbX / 16, mbY / 16) // I_PCM counts as nnz 16 (9.2.1)
      } else if (mbType >= 1 && mbType <= 24) {
        // Intra_16x16 (Table 7-11): predMode + CBP packed in mb_type
        val predMode = (mbType - 1) % 4
        val cbpChroma = ((mbType - 1) / 4) % 3
        val cbpLuma = ((mbType - 1) / 12) * 15
        val chromaMode = r.ue()
        if (chromaMode > 3) throw new H264Format(s"chroma pred mode $chromaMode")
        val qpDelta = r.se()
        qpY = ((qpY + qpDelta) % 52 + 52) % 52
        decodeIntra16x16(new CavlcSrc(r), st, mbX / 16, mbY / 16, predMode,
          chromaMode, cbpLuma, cbpChroma, qpY)
      } else if (mbType == 0 && st.t8x8Allowed && r.u1() == 1) {
        // transform_size_8x8_flag = 1 (7.3.5, high profile): Intra_8x8
        // prediction + the 8x8 integer transform; CAVLC residuals ride
        // four interleaved 4x4 blocks per 8x8 (7.3.5.3.2)
        qpY = decodeIntra8x8Mb(r, st, mbX / 16, mbY / 16, qpY)
      } else if (mbType == 0) {
        // Intra_4x4 (7.3.5.1): 16 per-block pred modes, chroma mode,
        // me(v)-coded CBP, qp delta only when any residual is coded
        // (transform_size_8x8_flag = 0 was consumed above when the PPS
        // enables the 8x8 mode)
        val modes = new Array[Int](16)
        var bi = 0
        while (bi < 16) {
          val (bxo, byo) = H264Transform.LumaBlockOrder(bi)
          val gbx = mbX / 4 + bxo; val gby = mbY / 4 + byo
          val predM = st.predI4Mode(gbx, gby)
          val mode =
            if (r.u1() == 1) predM
            else { val rem = r.u(3); if (rem < predM) rem else rem + 1 }
          modes(bi) = mode
          st.setI4Mode(gbx, gby, mode)
          bi += 1
        }
        val chromaMode = r.ue()
        if (chromaMode > 3) throw new H264Format(s"chroma pred mode $chromaMode")
        val cbpCode = r.ue()
        if (cbpCode > 47) throw new H264Format(s"cbp code $cbpCode")
        val cbp = CbpIntraByCodeNum(cbpCode)
        val cbpLuma = cbp & 15
        val cbpChroma = cbp >> 4
        if (cbp != 0) qpY = ((qpY + r.se()) % 52 + 52) % 52
        val src = new CavlcSrc(r)
        decodeIntra4x4Luma(src, st, mbX / 16, mbY / 16, modes, cbpLuma, qpY)
        decodeChromaResid(src, st, mbX / 16, mbY / 16, chromaMode, cbpChroma,
          st.cQp(qpY))
      } else throw new H264Format(s"bad intra mb_type $mbType")
    }
    // deblock inputs: intra MBs force bS 3/4 at their edges; I_PCM
    // counts as QP 0 in the filter (8.7.2 — disables it over PCM)
    st.markMb(mbX / 16, mbY / 16, intra = true, if (mbType == 25) 0 else qpY)
    qpY
  }

  // ---------------- entropy abstraction (CAVLC | CABAC) ----------------

  // ctxBlockCat (Table 9-42): the residual block categories the shared
  // reconstruction paths pass to their entropy source/sink
  private val CatLumaDc = 0 // Intra16x16DCLevel
  private val CatLumaAc = 1 // Intra16x16ACLevel
  private val CatLuma4x4 = 2 // LumaLevel4x4
  private val CatChromaDc = 3 // ChromaDCLevel
  private val CatChromaAc = 4 // ChromaACLevel
  private val CatLuma8x8 = H264Cabac.Cat8x8 // LumaLevel8x8 (5)

  /** Per-cell interleave TotalCoeffs of a 64-level 8x8 scan
    * (7.3.5.3.2: level4x4[i4][i] = level8x8[4i + i4]) — the nnz
    * bookkeeping BOTH entropy modes record for a coded 8x8 block, so
    * cross-entropy-mode state (nC, deblock bS via the codedAt 8x8
    * aggregate, cbf neighbor contexts via the same aggregate) stays
    * identical by construction. */
  private def record8x8Nnz(st: FrameState, mx: Int, my: Int, i8: Int,
      lv64: Array[Int]): Unit = {
    import H264Transform.LumaBlockOrder
    var i4 = 0
    while (i4 < 4) {
      val (bxo, byo) = LumaBlockOrder(i8 * 4 + i4)
      var tc = 0
      var i = 0
      while (i < 16) { if (lv64(4 * i + i4) != 0) tc += 1; i += 1 }
      st.setNnzY(mx * 4 + bxo, my * 4 + byo, tc)
      i4 += 1
    }
  }

  /** Residual-block source: fills `coeffs` with scan-order levels and
    * returns the nonzero count (TotalCoeff). (gbx, gby) are the
    * block's coords in its plane's 4x4 grid (chroma grid for cat 3/4;
    * the MB's first block for the DC cats); comp 0=Y, 1=Cb, 2=Cr.
    * [[luma8x8]] reads one CODED 8x8 transform block's 64 scan-order
    * levels (CBP bit already said coded): CAVLC via the 7.3.5.3.2
    * interleave, CABAC via the ctxBlockCat-5 codec (coded_block_flag
    * inferred 1, 7.4.5.3.3); both record the per-cell nnz grid. */
  private trait MbSrc {
    def block(st: FrameState, cat: Int, coeffs: Array[Int], maxN: Int,
        gbx: Int, gby: Int, comp: Int): Int
    def luma8x8(st: FrameState, mx: Int, my: Int, i8: Int): Array[Int]
  }

  private final class CavlcSrc(r: BitReader) extends MbSrc {
    def block(st: FrameState, cat: Int, coeffs: Array[Int], maxN: Int,
        gbx: Int, gby: Int, comp: Int): Int = {
      val nC = cat match {
        case CatChromaDc => -1
        case CatChromaAc => st.chromaNc(comp - 1, gbx, gby)
        case _ => st.lumaNc(gbx, gby)
      }
      H264Cavlc.decodeBlock(r, coeffs, maxN, nC)
    }
    def luma8x8(st: FrameState, mx: Int, my: Int, i8: Int): Array[Int] = {
      import H264Transform.LumaBlockOrder
      val lv64 = new Array[Int](64)
      val buf = new Array[Int](16)
      var i4 = 0
      while (i4 < 4) {
        val (bxo, byo) = LumaBlockOrder(i8 * 4 + i4)
        val gbx = mx * 4 + bxo; val gby = my * 4 + byo
        val tc = H264Cavlc.decodeBlock(r, buf, 16, st.lumaNc(gbx, gby))
        st.setNnzY(gbx, gby, tc)
        var i = 0
        while (i < 16) { lv64(4 * i + i4) = buf(i); i += 1 }
        i4 += 1
      }
      lv64
    }
  }

  private final class CabacSrc(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      val interMb: Boolean = false) extends MbSrc {
    def block(st: FrameState, cat: Int, coeffs: Array[Int], maxN: Int,
        gbx: Int, gby: Int, comp: Int): Int = {
      val inc = cbfCtxInc(st, cat, gbx, gby, comp, curIntra = !interMb)
      val cbf = d.decision(cx, H264Cabac.CtxCbfBase + 4 * cat + inc) == 1
      recordDcCbf(st, cat, gbx, gby, comp, cbf)
      if (!cbf) { java.util.Arrays.fill(coeffs, 0, maxN, 0); 0 }
      else H264Cabac.decodeResidualLevels(d, cx, cat, coeffs, maxN)
    }
    def luma8x8(st: FrameState, mx: Int, my: Int, i8: Int): Array[Int] = {
      val lv64 = new Array[Int](64)
      H264Cabac.decodeResidualLevels(d, cx, CatLuma8x8, lv64, 64)
      record8x8Nnz(st, mx, my, i8, lv64)
      lv64
    }
  }

  // ---------------- CABAC context increments (9.3.3.1.1.x) ----------------
  // Neighbor A = left, B = above; a neighbor outside the picture is
  // "not available". One slice per picture keeps slice-boundary
  // availability equal to picture-boundary availability.

  /** coded_block_flag ctxIdxInc (9.3.3.1.1.9). An unavailable
    * neighbor contributes 1 when the CURRENT macroblock is intra and
    * 0 when it is inter; an I_PCM neighbor counts as coded; a
    * neighbor without the block category (e.g. a non-I16 MB asked for
    * a luma DC block, or a skipped/uncoded block's nnz-0 grid entry)
    * contributes 0. */
  private def cbfCtxInc(st: FrameState, cat: Int, gbx: Int, gby: Int,
      comp: Int, curIntra: Boolean = true): Int = {
    val wMbs = st.wMbs
    val unavail = if (curIntra) 1 else 0
    def condLumaDc(nmx: Int, nmy: Int): Int =
      if (nmx < 0 || nmy < 0) unavail
      else {
        val i = nmy * wMbs + nmx
        if (st.pcmMbArr(i)) 1
        else if (!st.i16MbArr(i)) 0
        else if (st.cbfLumaDcMb(i)) 1 else 0
      }
    def condLuma4(bx: Int, by: Int): Int =
      if (bx < 0 || by < 0) unavail
      else if (st.pcmMbArr((by >> 2) * wMbs + (bx >> 2))) 1
      else if (st.t8x8MbArr((by >> 2) * wMbs + (bx >> 2))) {
        // 9.3.3.1.1.9: a neighbor coded with the 8x8 transform
        // contributes the coded_block_flag of the CONTAINING 8x8
        // block (any nonzero cell -> coded)
        val b8x = bx & ~1; val b8y = by & ~1
        if (st.nnzYAt(b8x, b8y) > 0 || st.nnzYAt(b8x + 1, b8y) > 0 ||
          st.nnzYAt(b8x, b8y + 1) > 0 || st.nnzYAt(b8x + 1, b8y + 1) > 0) 1
        else 0
      } else if (st.nnzYAt(bx, by) > 0) 1 else 0
    def condChromaDc(nmx: Int, nmy: Int, c: Int): Int =
      if (nmx < 0 || nmy < 0) unavail
      else {
        val i = nmy * wMbs + nmx
        if (st.pcmMbArr(i)) 1
        else if (st.cbfChromaDcMb(c)(i)) 1 else 0
      }
    def condChroma4(bx: Int, by: Int, c: Int): Int =
      if (bx < 0 || by < 0) unavail
      else if (st.pcmMbArr((by >> 1) * wMbs + (bx >> 1))) 1
      else if (st.nnzCAt(c, bx, by) > 0) 1 else 0
    cat match {
      case CatLumaDc =>
        val mx = gbx >> 2; val my = gby >> 2
        condLumaDc(mx - 1, my) + 2 * condLumaDc(mx, my - 1)
      case CatLumaAc | CatLuma4x4 =>
        condLuma4(gbx - 1, gby) + 2 * condLuma4(gbx, gby - 1)
      case CatChromaDc =>
        val mx = gbx >> 1; val my = gby >> 1
        condChromaDc(mx - 1, my, comp - 1) + 2 * condChromaDc(mx, my - 1, comp - 1)
      case _ =>
        condChroma4(gbx - 1, gby, comp - 1) + 2 * condChroma4(gbx, gby - 1, comp - 1)
    }
  }

  /** DC coded_block_flags persist per MB for later neighbors' context
    * derivation (the AC/4x4 flags ride the nnz grids: cbf == nnz > 0). */
  private def recordDcCbf(st: FrameState, cat: Int, gbx: Int, gby: Int,
      comp: Int, cbf: Boolean): Unit = cat match {
    case CatLumaDc => st.cbfLumaDcMb((gby >> 2) * st.wMbs + (gbx >> 2)) = cbf
    case CatChromaDc =>
      st.cbfChromaDcMb(comp - 1)((gby >> 1) * st.wMbs + (gbx >> 1)) = cbf
    case _ => ()
  }

  /** transform_size_8x8_flag ctxIdxInc (9.3.3.1.1.10): available
    * neighbors with the flag set each contribute 1. */
  private def t8x8Inc(st: FrameState, mx: Int, my: Int): Int = {
    def cond(nmx: Int, nmy: Int): Int =
      if (nmx < 0 || nmy < 0) 0
      else if (st.t8x8MbArr(nmy * st.wMbs + nmx)) 1 else 0
    cond(mx - 1, my) + cond(mx, my - 1)
  }

  /** mb_type bin-0 ctxIdxInc (9.3.3.1.1.3): neighbors that are NOT
    * I_NxN (including I_PCM and, later, inter MBs) each contribute 1. */
  private def mbTypeI4Inc(st: FrameState, mx: Int, my: Int): Int = {
    def cond(nmx: Int, nmy: Int): Int =
      if (nmx < 0 || nmy < 0) 0
      else {
        val i = nmy * st.wMbs + nmx
        if (!st.intraMbArr(i)) 1
        else if (st.i4MbArr(i)) 0 else 1
      }
    cond(mx - 1, my) + cond(mx, my - 1)
  }

  /** intra_chroma_pred_mode bin-0 ctxIdxInc (9.3.3.1.1.8): intra
    * non-PCM neighbors with a nonzero chroma mode contribute 1. */
  private def chromaPredInc(st: FrameState, mx: Int, my: Int): Int = {
    def cond(nmx: Int, nmy: Int): Int =
      if (nmx < 0 || nmy < 0) 0
      else {
        val i = nmy * st.wMbs + nmx
        if (!st.intraMbArr(i) || st.pcmMbArr(i)) 0
        else if (st.chromaModeMb(i) != 0) 1 else 0
      }
    cond(mx - 1, my) + cond(mx, my - 1)
  }

  /** coded_block_pattern luma bin-k ctxIdxInc (9.3.3.1.1.4): neighbor
    * 8x8 blocks whose cbp bit is ZERO contribute (inverted sense);
    * unavailable neighbors contribute 0; `partial` carries the current
    * MB's already-decoded bits for intra-MB neighbors. */
  private def cbpLumaInc(st: FrameState, mx: Int, my: Int, k: Int,
      partial: Int): Int = {
    def bitOf(x8: Int, y8: Int): Int = {
      if (x8 < 0 || y8 < 0) return -1
      val nmx = x8 >> 1; val nmy = y8 >> 1
      val sub = (y8 & 1) * 2 + (x8 & 1)
      if (nmx == mx && nmy == my) (partial >> sub) & 1
      else (st.cbpLumaMb(nmy * st.wMbs + nmx) >> sub) & 1
    }
    val x8 = mx * 2 + (k & 1); val y8 = my * 2 + (k >> 1)
    val a = bitOf(x8 - 1, y8)
    val b = bitOf(x8, y8 - 1)
    (if (a == 0) 1 else 0) + 2 * (if (b == 0) 1 else 0)
  }

  /** coded_block_pattern chroma ctxIdxInc for bin 0 (neighbor chroma
    * cbp nonzero) and bin 1 (neighbor chroma cbp == 2). */
  private def cbpChromaInc(st: FrameState, mx: Int, my: Int, bin: Int): Int = {
    def of(nmx: Int, nmy: Int): Int =
      if (nmx < 0 || nmy < 0) -1 else st.cbpChromaMb(nmy * st.wMbs + nmx)
    val a = of(mx - 1, my); val b = of(mx, my - 1)
    if (bin == 0) (if (a > 0) 1 else 0) + 2 * (if (b > 0) 1 else 0)
    else (if (a == 2) 1 else 0) + 2 * (if (b == 2) 1 else 0)
  }

  /** mb_qp_delta: decode the U-binarized mapped value (9.3.2.7), ctx
    * 60 + (prev != 0), then 62, then 63. */
  private def decodeQpDeltaCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      prevDelta: Int): Int = {
    var v = 0
    if (d.decision(cx, 60 + (if (prevDelta != 0) 1 else 0)) == 1) {
      v = 1
      if (d.decision(cx, 62) == 1) {
        v = 2
        while (v < 53 && d.decision(cx, 63) == 1) v += 1
        if (v >= 53) throw new H264Format("mb_qp_delta overrun")
      }
    }
    if (v % 2 == 0) -(v / 2) else (v + 1) / 2
  }

  private def encodeQpDeltaCabac(e: H264Cabac.Enc, cx: H264Cabac.Ctx,
      prevDelta: Int, delta: Int): Unit = {
    val mapped = if (delta > 0) 2 * delta - 1 else -2 * delta
    val ctx0 = 60 + (if (prevDelta != 0) 1 else 0)
    if (mapped == 0) e.decision(cx, ctx0, 0)
    else {
      e.decision(cx, ctx0, 1)
      if (mapped == 1) e.decision(cx, 62, 0)
      else {
        e.decision(cx, 62, 1)
        var i = 2
        while (i < mapped) { e.decision(cx, 63, 1); i += 1 }
        e.decision(cx, 63, 0)
      }
    }
  }

  /** Intra mb_type tree contexts — [bin0, cbpLuma, chroma bin0,
    * chroma bin1, predMode hi, predMode lo] per Table 9-41: the
    * I-slice tree at offset 3 (bin0 context is neighbor-derived, so
    * the caller passes it), and the intra SUFFIX trees inside P and B
    * mb_type (offsets 17 / 32, whose chroma and predMode bins share a
    * context each). */
  private def intraTreeI(st: FrameState, mx: Int, my: Int): Array[Int] =
    Array(3 + mbTypeI4Inc(st, mx, my), 6, 7, 8, 9, 10)
  private val IntraTreeP = Array(17, 18, 19, 19, 20, 20)
  private val IntraTreeB = Array(32, 33, 34, 34, 35, 35)

  /** Decode one CABAC intra macroblock (mb_type tree 9.3.2.5 at the
    * given contexts, then the shared reconstruction paths through a
    * [[CabacSrc]]). Returns (newQpY, decodedQpDelta, decoder) — the
    * decoder is REPLACED after an I_PCM macroblock (the engine
    * re-initializes past the raw samples, 9.3.1.2). */
  private def decodeIntraMbCabac(dIn: H264Cabac.Dec, cx: H264Cabac.Ctx,
      rbsp: Array[Byte], st: FrameState, mbX: Int, mbY: Int, qpYIn: Int,
      prevQpDelta: Int, tree: Array[Int]): (Int, Int, H264Cabac.Dec) = {
    var d = dIn
    var qpY = qpYIn
    var qpDelta = 0
    val mx = mbX / 16; val my = mbY / 16
    val mbI = my * st.wMbs + mx
    val bin0 = d.decision(cx, tree(0))
    if (bin0 == 1 && d.terminate() == 1) {
      // I_PCM: raw samples begin at the next byte boundary; the engine
      // re-initializes after them
      var o = d.alignedBytePos
      if (o + 256 + 128 > rbsp.length) throw new H264Format("pcm overruns slice")
      var i = 0
      while (i < 256) {
        st.yPlane((mbY + i / 16) * st.lumaW + mbX + i % 16) = rbsp(o + i)
        i += 1
      }
      o += 256
      val cW = st.lumaW / 2
      i = 0
      while (i < 64) {
        st.cbPlane((mbY / 2 + i / 8) * cW + mbX / 2 + i % 8) = rbsp(o + i)
        i += 1
      }
      o += 64
      i = 0
      while (i < 64) {
        st.crPlane((mbY / 2 + i / 8) * cW + mbX / 2 + i % 8) = rbsp(o + i)
        i += 1
      }
      o += 64
      st.markPcm(mx, my)
      st.pcmMbArr(mbI) = true
      st.cbpLumaMb(mbI) = 15
      st.cbpChromaMb(mbI) = 2
      st.markMb(mx, my, intra = true, 0)
      d = new H264Cabac.Dec(rbsp, o)
      return (qpY, 0, d)
    }
    val src = new CabacSrc(d, cx)
    if (bin0 == 1) {
      // Intra_16x16: cbpLuma bin, chroma TU suffix, 2 predMode bins.
      // Table 9-41's dual binIdx-4/5 assignments resolve so the two
      // predMode bins ALWAYS use tree(4)/tree(5) regardless of how
      // many bins the chroma suffix took (the syntactic assignment
      // x264/JM implement; an earlier revision here positionally
      // shifted them when cbpC == 0).
      val cbpL = if (d.decision(cx, tree(1)) == 1) 15 else 0
      var cbpC = 0
      if (d.decision(cx, tree(2)) == 1)
        cbpC = if (d.decision(cx, tree(3)) == 1) 2 else 1
      val predMode = (d.decision(cx, tree(4)) << 1) | d.decision(cx, tree(5))
      st.i16MbArr(mbI) = true
      st.cbpLumaMb(mbI) = cbpL
      st.cbpChromaMb(mbI) = cbpC
      // intra_chroma_pred_mode: TU cMax 3, ctx 64+inc then 67
      var chromaMode = 0
      if (d.decision(cx, 64 + chromaPredInc(st, mx, my)) == 1) {
        chromaMode = 1
        if (d.decision(cx, 67) == 1) {
          chromaMode = 2
          if (d.decision(cx, 67) == 1) chromaMode = 3
        }
      }
      st.chromaModeMb(mbI) = chromaMode
      qpDelta = decodeQpDeltaCabac(d, cx, prevQpDelta)
      qpY = ((qpY + qpDelta) % 52 + 52) % 52
      decodeIntra16x16(src, st, mx, my, predMode, chromaMode, cbpL, cbpC, qpY)
    } else {
      // I_NxN: transform_size_8x8_flag (7.3.5, when the PPS enables the
      // 8x8 mode; ctx 399 + neighbor inc per 9.3.3.1.1.10) selects
      // Intra_8x8 or Intra_4x4; pred modes ride ctx 68/69 either way
      st.i4MbArr(mbI) = true
      val t8 = st.t8x8Allowed &&
        d.decision(cx, H264Cabac.CtxT8x8Base + t8x8Inc(st, mx, my)) == 1
      val nModes = if (t8) 4 else 16
      val modes = new Array[Int](nModes)
      var bi = 0
      while (bi < nModes) {
        val (gbx, gby) =
          if (t8) (mx * 4 + (bi % 2) * 2, my * 4 + (bi / 2) * 2)
          else {
            val (bxo, byo) = H264Transform.LumaBlockOrder(bi)
            (mx * 4 + bxo, my * 4 + byo)
          }
        val predM = st.predI4Mode(gbx, gby)
        val mode =
          if (d.decision(cx, 68) == 1) predM
          else {
            val rem = d.decision(cx, 69) | (d.decision(cx, 69) << 1) |
              (d.decision(cx, 69) << 2)
            if (rem < predM) rem else rem + 1
          }
        modes(bi) = mode
        st.setI4Mode(gbx, gby, mode)
        if (t8) { // every 4x4 cell carries the 8x8 mode (8.3.1.1/8.3.2.1)
          st.setI4Mode(gbx + 1, gby, mode)
          st.setI4Mode(gbx, gby + 1, mode)
          st.setI4Mode(gbx + 1, gby + 1, mode)
        }
        bi += 1
      }
      var chromaMode = 0
      if (d.decision(cx, 64 + chromaPredInc(st, mx, my)) == 1) {
        chromaMode = 1
        if (d.decision(cx, 67) == 1) {
          chromaMode = 2
          if (d.decision(cx, 67) == 1) chromaMode = 3
        }
      }
      st.chromaModeMb(mbI) = chromaMode
      var cbpLuma = 0
      var k = 0
      while (k < 4) {
        val bin = d.decision(cx, 73 + cbpLumaInc(st, mx, my, k, cbpLuma))
        cbpLuma |= bin << k
        k += 1
      }
      var cbpChroma = 0
      if (d.decision(cx, 77 + cbpChromaInc(st, mx, my, 0)) == 1)
        cbpChroma =
          if (d.decision(cx, 81 + cbpChromaInc(st, mx, my, 1)) == 1) 2 else 1
      st.cbpLumaMb(mbI) = cbpLuma
      st.cbpChromaMb(mbI) = cbpChroma
      if (cbpLuma != 0 || cbpChroma != 0) {
        qpDelta = decodeQpDeltaCabac(d, cx, prevQpDelta)
        qpY = ((qpY + qpDelta) % 52 + 52) % 52
      }
      if (t8) {
        decodeIntra8x8Luma(src, st, mx, my, modes, cbpLuma, qpY)
        st.t8x8MbArr(mbI) = true
      } else decodeIntra4x4Luma(src, st, mx, my, modes, cbpLuma, qpY)
      decodeChromaResid(src, st, mx, my, chromaMode, cbpChroma,
        st.cQp(qpY))
    }
    st.markMb(mx, my, intra = true, qpY)
    (qpY, qpDelta, d)
  }

  /** CABAC I-slice slice_data (7.3.4): alignment ones, context init at
    * the slice QP, one intra MB + end_of_slice_flag per iteration.
    * Foreign-stream safety gate: the slice must terminate EXACTLY — the
    * end_of_slice_flag fires on precisely the last macroblock and only
    * zero bytes may follow — so a diverged parse (e.g. from an
    * unsupported stream shape) rejects loudly instead of rendering
    * garbage. */
  private def decodeISliceDataCabac(r: BitReader, st: FrameState,
      sliceQp: Int): Unit = {
    while (!r.byteAligned) {
      if (r.u1() != 1) throw new H264Format("cabac_alignment_one_bit != 1")
    }
    val rbsp = r.rbsp
    val cx = new H264Cabac.Ctx
    cx.initI(sliceQp)
    var d = new H264Cabac.Dec(rbsp, r.bytePosAligned)
    var qpY = sliceQp
    var prevQpDelta = 0
    var mb = 0
    val nMbs = st.wMbs * st.hMbs
    while (mb < nMbs) {
      val mxI = mb % st.wMbs; val myI = mb / st.wMbs
      val (q2, delta, d2) = decodeIntraMbCabac(d, cx, rbsp, st,
        mxI * 16, myI * 16, qpY, prevQpDelta, intraTreeI(st, mxI, myI))
      qpY = q2; prevQpDelta = delta; d = d2
      val eos = d.terminate()
      if (eos == 1 && mb != nMbs - 1)
        throw new H264Format("end_of_slice before the last macroblock")
      if (eos == 0 && mb == nMbs - 1)
        throw new H264Format("slice data continues past the last macroblock")
      mb += 1
    }
    var p = d.alignedBytePos
    while (p < rbsp.length) {
      if (rbsp(p) != 0)
        throw new H264Format("non-zero bytes after end_of_slice")
      p += 1
    }
  }

  /** te(v) (9.1.1): with a max of 1 the field is a single INVERTED bit;
    * with a larger range it is plain ue(v). Used by ref_idx_l0. */
  private def te(r: BitReader, range: Int): Int =
    if (range == 1) 1 - r.u1() else r.ue()

  /** B default reference lists (8.2.4.2.3, frame coding): list0 =
    * past short-term refs by descending POC then future by ascending;
    * list1 = future ascending then past descending; BOTH lists then
    * append every long-term reference by ascending LongTermFrameIdx;
    * when the lists come out identical with >1 entry, list1's first
    * two entries swap. */
  private def bDefaultLists(shortRefs: List[FrameState],
      ltRefs: List[FrameState], pocVal: Int)
      : (IndexedSeq[FrameState], IndexedSeq[FrameState]) = {
    val past = shortRefs.filter(_.poc < pocVal).sortBy(f => -f.poc)
    val future = shortRefs.filter(_.poc > pocVal).sortBy(_.poc)
    val l0 = (past ++ future ++ ltRefs).toIndexedSeq
    val l1raw = (future ++ past ++ ltRefs).toIndexedSeq
    val l1 =
      if (l1raw.length > 1 && l1raw == l0)
        l1raw.updated(0, l1raw(1)).updated(1, l1raw(0))
      else l1raw
    (l0, l1)
  }

  /** Spec hook: B default-list construction over a synthetic DPB —
    * (shortPocs, longIdxs, curPoc) -> the two lists as (kind, key)
    * pairs where kind S carries the POC and L the LongTermFrameIdx. */
  private[graft] def bDefaultListsForTest(shortPocs: Seq[Int],
      longIdxs: Seq[Int], curPoc: Int)
      : (Seq[(String, Int)], Seq[(String, Int)]) = {
    val shortRefs = shortPocs.map { p =>
      val f = new FrameState(1, 1); f.poc = p; f
    }.toList
    val ltRefs = longIdxs.sorted.map { i =>
      val f = new FrameState(1, 1); f.longTermIdx = i; f
    }.toList
    val (l0, l1) = bDefaultLists(shortRefs, ltRefs, curPoc)
    def tag(l: IndexedSeq[FrameState]) = l.map(f =>
      if (f.longTermIdx >= 0) ("L", f.longTermIdx) else ("S", f.poc)).toSeq
    (tag(l0), tag(l1))
  }

  /** ref_pic_list_modification (8.2.4.3.1, frame coding): parse the
    * command list and re-order `defaultList` — idc 0/1 derive a
    * short-term PicNum from the running predictor (subtract/add,
    * wrapping at MaxFrameNum); idc 2 selects a long-term picture by
    * LongTermPicNum (r14). Each command inserts the matching DPB
    * picture at the next index and squeezes a later duplicate of the
    * SAME marking kind out. A PicNum with no DPB match marks a corrupt
    * or out-of-scope stream. */
  private def applyListModification(r: BitReader,
      defaultList: IndexedSeq[FrameState], pool: IndexedSeq[FrameState],
      ltPool: IndexedSeq[FrameState], currFrameNum: Int,
      maxFrameNum: Int): IndexedSeq[FrameState] = {
    val nActive = defaultList.length
    def picNumF(f: FrameState): Int =
      if (f.frameNum > currFrameNum) f.frameNum - maxFrameNum else f.frameNum
    var list = defaultList.toBuffer
    var pred = currFrameNum
    var refIdx = 0
    var commands = 0
    var idc = r.ue()
    while (idc != 3) {
      if (idc > 3) throw new H264Format(s"modification_of_pic_nums_idc $idc")
      commands += 1
      if (commands > 32) throw new H264Format("list modification overrun")
      // (target picture, duplicate-squeeze predicate for its kind)
      val (target, isDup): (FrameState, FrameState => Boolean) =
        if (idc == 2) {
          val ltPicNum = r.ue() // LongTermPicNum == LongTermFrameIdx (frames)
          val t = ltPool.find(_.longTermIdx == ltPicNum).getOrElse(throw
            new H264Format(s"list modification: no long-term ref $ltPicNum"))
          (t, f => f.longTermIdx == ltPicNum)
        } else {
          val diff = r.ue() + 1
          val noWrap =
            if (idc == 0) { val v = pred - diff; if (v < 0) v + maxFrameNum else v }
            else { val v = pred + diff; if (v >= maxFrameNum) v - maxFrameNum else v }
          pred = noWrap
          val picNum = if (noWrap > currFrameNum) noWrap - maxFrameNum else noWrap
          val t = pool.find(f => picNumF(f) == picNum).getOrElse(throw
            new H264Format(s"list modification: no reference with PicNum $picNum"))
          (t, f => f.longTermIdx < 0 && picNumF(f) == picNum)
        }
      // 8.2.4.3.1: shift, insert at refIdx, drop a later duplicate,
      // keep the active length
      list.insert(refIdx, target)
      refIdx += 1
      val (head, tail) = list.splitAt(refIdx)
      list = (head ++ tail.filterNot(isDup)).take(nActive).toBuffer
      if (list.length < nActive)
        throw new H264Format("list modification shrank the active list")
      idc = r.ue()
    }
    list.toIndexedSeq
  }

  // ---------------- CABAC P/B slices (9.3.3.1.1.x + 7.3.4) ----------------
  // The decode and encode halves of every syntax element sit adjacent
  // so their bin trees and context increments can be eyeball-diffed;
  // encoder-reconstruction round-trip parity then witnesses both.

  /** mb_skip_flag ctxIdxInc (9.3.3.1.1.1): available non-skipped
    * neighbors contribute 1. */
  private def skipFlagInc(st: FrameState, mx: Int, my: Int): Int = {
    def cond(nmx: Int, nmy: Int): Int =
      if (nmx < 0 || nmy < 0) 0
      else if (st.skipMbArr(nmy * st.wMbs + nmx)) 0 else 1
    cond(mx - 1, my) + cond(mx, my - 1)
  }

  /** B mb_type bin-0 ctxIdxInc (9.3.3.1.1.3): neighbors that are
    * available and not B_Skip / B_Direct_16x16 contribute 1. */
  private def bMbTypeInc(st: FrameState, mx: Int, my: Int): Int = {
    def cond(nmx: Int, nmy: Int): Int =
      if (nmx < 0 || nmy < 0) 0
      else if (st.bDirectMbArr(nmy * st.wMbs + nmx)) 0 else 1
    cond(mx - 1, my) + cond(mx, my - 1)
  }

  /** ref_idx ctxIdxInc (9.3.3.1.1.6): a neighbor 4x4 block contributes
    * 1 when available, in a non-skip/non-direct MB, and predicting
    * from this list with refIdx > 0 (intra blocks carry refIdx -1 in
    * the grids). inc = condA + 2·condB. */
  private def refIdxInc(st: FrameState, bx: Int, by: Int, list: Int): Int = {
    def cond(nbx: Int, nby: Int): Int =
      if (nbx < 0 || nby < 0 || nbx >= st.wMbs * 4 || nby >= st.hMbs * 4) 0
      else {
        val mbI = (nby >> 2) * st.wMbs + (nbx >> 2)
        if (st.skipMbArr(mbI) || st.directBlk(st.blkIdx(nbx, nby))) 0
        else {
          val ri = if (list == 0) st.refIdxBlk(st.blkIdx(nbx, nby))
            else st.refIdx1Blk(st.blkIdx(nbx, nby))
          if (ri > 0) 1 else 0
        }
      }
    cond(bx - 1, by) + 2 * cond(bx, by - 1)
  }

  /** mvd ctxIdxInc (9.3.3.1.1.7): neighbors' |mvd| sum for the same
    * list and component — 0 (< 3), 1 (3..32), 2 (> 32). Intra, skip
    * and direct neighbors contribute 0 (their mvd grids stay zero). */
  private def mvdInc(st: FrameState, bx: Int, by: Int, list: Int,
      comp: Int): Int = {
    def absOf(nbx: Int, nby: Int): Int =
      if (nbx < 0 || nby < 0 || nbx >= st.wMbs * 4 || nby >= st.hMbs * 4) 0
      else math.abs(st.mvdBlk(list)(comp)(st.blkIdx(nbx, nby)))
    val s = absOf(bx - 1, by) + absOf(bx, by - 1)
    if (s < 3) 0 else if (s > 32) 2 else 1
  }

  /** mvd component (9.3.2.3 UEG3, signedValFlag 1, uCoff 9): TU prefix
    * in contexts (bin0 at base+inc, bins 1.. at base+3..base+6), EG3
    * bypass suffix past the prefix cap, bypass sign. comp 0 = x
    * (ctx base 40), 1 = y (47). */
  private def decodeMvdCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      st: FrameState, bx: Int, by: Int, list: Int, comp: Int): Int = {
    val base = if (comp == 0) 40 else 47
    if (d.decision(cx, base + mvdInc(st, bx, by, list, comp)) == 0) return 0
    var mag = 1
    var more = true
    while (more && mag < 9) {
      if (d.decision(cx, base + 2 + math.min(mag, 4)) == 1) mag += 1
      else more = false
    }
    if (more) mag += H264Cabac.decodeUegSuffix(d, 3)
    if (mag > (1 << 15)) throw new H264Format("mvd overflow")
    if (d.bypass() == 1) -mag else mag
  }

  private def encodeMvdCabac(e: H264Cabac.Enc, cx: H264Cabac.Ctx,
      st: FrameState, bx: Int, by: Int, list: Int, comp: Int, v: Int): Unit = {
    val base = if (comp == 0) 40 else 47
    val inc = mvdInc(st, bx, by, list, comp)
    val mag = math.abs(v)
    if (mag == 0) { e.decision(cx, base + inc, 0); return }
    e.decision(cx, base + inc, 1)
    var m = 1
    while (m < math.min(mag, 9)) {
      e.decision(cx, base + 2 + math.min(m, 4), 1)
      m += 1
    }
    if (mag < 9) e.decision(cx, base + 2 + math.min(mag, 4), 0)
    else H264Cabac.encodeUegSuffix(e, 3, mag - 9)
    e.bypass(if (v < 0) 1 else 0)
  }

  /** ref_idx_lX (unary; bin0 at 54+inc per 9.3.3.1.1.6, bin1 at 58,
    * bins 2.. at 59). `range` = list size − 1; 0 means the field is
    * absent. */
  private def decodeRefIdxCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      st: FrameState, bx: Int, by: Int, list: Int, range: Int): Int = {
    if (range <= 0) return 0
    if (d.decision(cx, 54 + refIdxInc(st, bx, by, list)) == 0) return 0
    var v = 1
    if (d.decision(cx, 58) == 1) {
      v = 2
      while (d.decision(cx, 59) == 1) {
        v += 1
        if (v > 32) throw new H264Format("ref_idx overrun")
      }
    }
    if (v > range) throw new H264Format(s"ref_idx $v exceeds list")
    v
  }

  private def encodeRefIdxCabac(e: H264Cabac.Enc, cx: H264Cabac.Ctx,
      st: FrameState, bx: Int, by: Int, list: Int, v: Int): Unit = {
    val inc = refIdxInc(st, bx, by, list)
    if (v == 0) e.decision(cx, 54 + inc, 0)
    else {
      e.decision(cx, 54 + inc, 1)
      var i = 1
      while (i < v) { e.decision(cx, if (i == 1) 58 else 59, 1); i += 1 }
      e.decision(cx, if (v == 1) 58 else 59, 0)
    }
  }

  /** P mb_type prefix (Table 9-37 / 9-41: bins at 14, 15, then 16
    * when bin1 was 0 or 17 when it was 1): returns Table 7-13
    * numbering 0-3, or -1 for the intra escape (the caller parses the
    * suffix via [[decodeIntraMbCabac]] with [[IntraTreeP]]).
    * P_8x8ref0 (type 4) has no CABAC binarization. */
  private def decodeMbTypePCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx): Int = {
    if (d.decision(cx, 14) == 1) -1
    else if (d.decision(cx, 15) == 0) {
      if (d.decision(cx, 16) == 0) 0 else 3 // P_L0_16x16 / P_8x8
    } else {
      if (d.decision(cx, 17) == 1) 1 else 2 // 16x8 / 8x16
    }
  }

  private def encodeMbTypePCabac(e: H264Cabac.Enc, cx: H264Cabac.Ctx,
      mbType: Int): Unit = mbType match {
    case 0 => e.decision(cx, 14, 0); e.decision(cx, 15, 0); e.decision(cx, 16, 0)
    case 1 => e.decision(cx, 14, 0); e.decision(cx, 15, 1); e.decision(cx, 17, 1)
    case 2 => e.decision(cx, 14, 0); e.decision(cx, 15, 1); e.decision(cx, 17, 0)
    case 3 => e.decision(cx, 14, 0); e.decision(cx, 15, 0); e.decision(cx, 16, 1)
    case -1 => e.decision(cx, 14, 1) // intra escape (suffix follows)
    case t => throw new H264Format(s"CABAC P mb_type $t")
  }

  /** P sub_mb_type (Table 9-38: '1' 8x8, '00' 8x4, '011' 4x8,
    * '010' 4x4; bins at 21, 22, 23). */
  private def decodeSubMbTypePCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx): Int =
    if (d.decision(cx, 21) == 1) 0
    else if (d.decision(cx, 22) == 0) 1
    else if (d.decision(cx, 23) == 1) 2
    else 3

  private def encodeSubMbTypePCabac(e: H264Cabac.Enc, cx: H264Cabac.Ctx,
      t: Int): Unit = t match {
    case 0 => e.decision(cx, 21, 1)
    case 1 => e.decision(cx, 21, 0); e.decision(cx, 22, 0)
    case 2 => e.decision(cx, 21, 0); e.decision(cx, 22, 1); e.decision(cx, 23, 1)
    case 3 => e.decision(cx, 21, 0); e.decision(cx, 22, 1); e.decision(cx, 23, 0)
    case _ => throw new H264Format(s"CABAC P sub_mb_type $t")
  }

  /** B mb_type (Table 9-37: '0' Direct, '10x' L0/L1 16x16, '110xxx'
    * 3-10, '1110xxx' 12-19, '111100x' 20-21, '111110' 11, '111111'
    * B_8x8, '111101' intra escape). Context assignment per Table 9-39
    * at ctxIdxOffset 27: binIdx 0 neighbor-derived (inc 0-2), binIdx 1
    * at inc 3, binIdx 2 b1-DEPENDENT (inc 5 when b1 == 0, inc 4 when
    * b1 == 1 — the '10x' direction bin reads ctx 32, not 31), binIdx
    * >= 3 at inc 5. Both halves ride [[readMbTypeB]] / the bin lists
    * below so the spec's ctx trace is pinned by a fixed-vector test
    * (H264CabacSpec) independent of the arithmetic engine.
    * Returns Table 7-14 numbering, or -1 for intra. */
  private def readMbTypeB(read: Int => Int, c0: Int): Int = {
    if (read(c0) == 0) return 0
    if (read(30) == 0) return 1 + read(32) // binIdx 2 with b1 == 0: inc 5
    if (read(31) == 0) // binIdx 2 with b1 == 1: inc 4
      return 3 + ((read(32) << 2) | (read(32) << 1) | read(32))
    if (read(32) == 0)
      return 12 + ((read(32) << 2) | (read(32) << 1) | read(32))
    if (read(32) == 1)
      return if (read(32) == 0) 11 else 22
    if (read(32) == 1) -1 // intra ('111101')
    else 20 + read(32)
  }

  private def decodeMbTypeBCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      st: FrameState, mx: Int, my: Int): Int =
    readMbTypeB(d.decision(cx, _), 27 + bMbTypeInc(st, mx, my))

  /** The Table 9-37 B bin string per mb_type (MSB-first), precomputed
    * once — index 23 holds the intra escape (mbType -1). The encoder
    * emits straight from these arrays so the benched CABAC hot path
    * allocates nothing per macroblock. */
  private val BMbTypeBinsTab: Array[Array[Int]] = Array.tabulate(24) { i =>
    val t = if (i == 23) -1 else i
    t match {
      case 0 => Array(0)
      case 1 => Array(1, 0, 0)
      case 2 => Array(1, 0, 1)
      case x if x >= 3 && x <= 10 =>
        val v = x - 3
        Array(1, 1, 0, (v >> 2) & 1, (v >> 1) & 1, v & 1)
      case x if x >= 12 && x <= 19 =>
        val v = x - 12
        Array(1, 1, 1, 0, (v >> 2) & 1, (v >> 1) & 1, v & 1)
      case 20 | 21 => Array(1, 1, 1, 1, 0, 0, t - 20)
      case 11 => Array(1, 1, 1, 1, 1, 0)
      case 22 => Array(1, 1, 1, 1, 1, 1)
      case _ => Array(1, 1, 1, 1, 0, 1) // intra escape (suffix follows)
    }
  }

  private def bMbTypeBins(mbType: Int): Array[Int] = {
    if (mbType < -1 || mbType > 22) throw new H264Format(s"CABAC B mb_type $mbType")
    BMbTypeBinsTab(if (mbType == -1) 23 else mbType)
  }

  /** The Table 9-39 ctxIdx for binIdx `i` of a B mb_type bin string —
    * binIdx 2 is b1-dependent (inc 5 when b1 == 0, 4 when b1 == 1). */
  @inline private def bMbTypeCtx(c0: Int, bits: Array[Int], i: Int): Int =
    i match {
      case 0 => c0
      case 1 => 30
      case 2 => if (bits(1) == 0) 32 else 31
      case _ => 32
    }

  private def encodeMbTypeBCabac(e: H264Cabac.Enc, cx: H264Cabac.Ctx,
      st: FrameState, mx: Int, my: Int, mbType: Int): Unit = {
    val bits = bMbTypeBins(mbType)
    val c0 = 27 + bMbTypeInc(st, mx, my)
    var i = 0
    while (i < bits.length) {
      e.decision(cx, bMbTypeCtx(c0, bits, i), bits(i))
      i += 1
    }
  }

  /** Fixed-vector spec hook: feed a scripted bin sequence to the B
    * mb_type DECODER and record the ctxIdx it requests per bin; return
    * (decoded type, decoder ctx trace, encoder ctx trace, encoder bin
    * string). A hand-derived Table 9-37/9-39 expectation then pins the
    * context assignment WITHOUT the arithmetic engine — the test the
    * self round trips are structurally blind to (both halves sharing a
    * wrong ctx still round-trips). */
  private[graft] def bMbTypeCtxTraceForTest(mbType: Int, c0: Int)
      : (Int, Seq[Int], Seq[Int], Seq[Int]) = {
    val bits = bMbTypeBins(mbType)
    val decTrace = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pos = 0
    val decoded = readMbTypeB(ctx => {
      decTrace += ctx
      val b = bits(pos); pos += 1; b
    }, c0)
    val encTrace = bits.indices.map(i => bMbTypeCtx(c0, bits, i))
    (decoded, decTrace.toSeq, encTrace, bits.toSeq)
  }

  /** Spec hook: bin-level round trip of every P/B CABAC syntax codec
    * through a fresh engine + idc-0 contexts — covers the mb_type
    * trees (including the intra escapes and the B shapes the
    * production encoder never emits), sub_mb_type, UEG3 mvd and unary
    * ref_idx, independent of slice structure. */
  private[graft] def cabacSyntaxRoundTripForTest(bTypes: Seq[Int],
      pTypes: Seq[Int], subTypes: Seq[Int], mvds: Seq[Int],
      refIdxs: Seq[Int]): (Seq[Int], Seq[Int], Seq[Int], Seq[Int], Seq[Int]) = {
    val st = new FrameState(4, 4)
    val w = new BitWriter
    val cxE = new H264Cabac.Ctx; cxE.initPB(0, 26)
    val e = new H264Cabac.Enc(w)
    bTypes.foreach(t => encodeMbTypeBCabac(e, cxE, st, 1, 1, t))
    pTypes.foreach(t => encodeMbTypePCabac(e, cxE, t))
    subTypes.foreach(t => encodeSubMbTypePCabac(e, cxE, t))
    mvds.foreach(v => encodeMvdCabac(e, cxE, st, 4, 4, 0, 0, v))
    refIdxs.foreach(v => encodeRefIdxCabac(e, cxE, st, 4, 4, 0, v))
    e.terminate(1)
    w.alignToByte()
    val bytes = w.bytes
    val cxD = new H264Cabac.Ctx; cxD.initPB(0, 26)
    val d = new H264Cabac.Dec(bytes, 0)
    val ob = bTypes.map(_ => decodeMbTypeBCabac(d, cxD, st, 1, 1))
    val op = pTypes.map(_ => decodeMbTypePCabac(d, cxD))
    val os = subTypes.map(_ => decodeSubMbTypePCabac(d, cxD))
    val om = mvds.map(_ => decodeMvdCabac(d, cxD, st, 4, 4, 0, 0))
    val or = refIdxs.map(_ => decodeRefIdxCabac(d, cxD, st, 4, 4, 0, 32))
    (ob, op, os, om, or)
  }

  /** Inter-MB residual tail in CABAC form (coded_block_pattern at
    * 73-84 with the shared increments, transform_size_8x8_flag when
    * coded luma + the PPS 8x8 mode + no sub-8x8 partition (7.3.5),
    * mb_qp_delta when coded, then the shared reconstruction paths
    * through an inter [[CabacSrc]]). Returns (newQpY, qpDelta). */
  private def decodeInterResidCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      st: FrameState, mx: Int, my: Int, qpYIn: Int, prevQpDelta: Int,
      allGe8x8: Boolean): (Int, Int) = {
    var qpY = qpYIn
    var cbpLuma = 0
    var k = 0
    while (k < 4) {
      val bin = d.decision(cx, 73 + cbpLumaInc(st, mx, my, k, cbpLuma))
      cbpLuma |= bin << k
      k += 1
    }
    var cbpChroma = 0
    if (d.decision(cx, 77 + cbpChromaInc(st, mx, my, 0)) == 1)
      cbpChroma =
        if (d.decision(cx, 81 + cbpChromaInc(st, mx, my, 1)) == 1) 2 else 1
    val mbI = my * st.wMbs + mx
    st.cbpLumaMb(mbI) = cbpLuma
    st.cbpChromaMb(mbI) = cbpChroma
    val t8 = cbpLuma != 0 && st.t8x8Allowed && allGe8x8 &&
      d.decision(cx, H264Cabac.CtxT8x8Base + t8x8Inc(st, mx, my)) == 1
    var delta = 0
    if (cbpLuma != 0 || cbpChroma != 0) {
      delta = decodeQpDeltaCabac(d, cx, prevQpDelta)
      qpY = ((qpY + delta) % 52 + 52) % 52
    }
    val src = new CabacSrc(d, cx, interMb = true)
    if (t8) decodeInterLumaResid8x8(src, st, mx, my, cbpLuma, qpY)
    else decodeInterLumaResid(src, st, mx, my, cbpLuma, qpY)
    decodeChromaResidOnPred(src, st, mx, my, cbpChroma,
      st.cQp(qpY))
    (qpY, delta)
  }

  /** CABAC P inter-MB motion (Table 7-13 types 0-3): every partition's
    * ref_idx before any mvd (7.3.5.1), with ref_idx/mvd noted into the
    * grids at read time so later fields' context increments see
    * earlier partitions; motion compensation then applies in partition
    * order exactly like the CAVLC path. Returns
    * noSubMbPartSizeLessThan8x8Flag (7.3.5): false only for a P_8x8
    * with a sub-8x8 sub_mb_type. */
  private def decodeInterMbMotionPCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      st: FrameState, refs: IndexedSeq[FrameState], mx: Int, my: Int,
      mbType: Int): Boolean = {
    val bx0 = mx * 4; val by0 = my * 4
    val range = refs.length - 1
    def readRef(bx: Int, by: Int, w4: Int, h4: Int): Int = {
      val ri = decodeRefIdxCabac(d, cx, st, bx, by, 0, range)
      st.noteRefIdx(bx, by, w4, h4, 0, ri)
      ri
    }
    def readMvd(bx: Int, by: Int, w4: Int, h4: Int): (Int, Int) = {
      val dx = decodeMvdCabac(d, cx, st, bx, by, 0, 0)
      val dy = decodeMvdCabac(d, cx, st, bx, by, 0, 1)
      st.noteMvd(bx, by, w4, h4, 0, dx, dy)
      (dx, dy)
    }
    mbType match {
      case 0 =>
        val ri = readRef(bx0, by0, 4, 4)
        val (dx, dy) = readMvd(bx0, by0, 4, 4)
        val (px, py) = mvPredict(st, bx0, by0, 4, 0, ri)
        mcPartition(st, refs(ri), bx0, by0, 4, 4, px + dx, py + dy, ri)
        true
      case 1 =>
        val ri0 = readRef(bx0, by0, 4, 2)
        val ri1 = readRef(bx0, by0 + 2, 4, 2)
        val (dx0, dy0) = readMvd(bx0, by0, 4, 2)
        val (dx1, dy1) = readMvd(bx0, by0 + 2, 4, 2)
        val (p0x, p0y) = mvPredict(st, bx0, by0, 4, 1, ri0)
        mcPartition(st, refs(ri0), bx0, by0, 4, 2, p0x + dx0, p0y + dy0, ri0)
        val (p1x, p1y) = mvPredict(st, bx0, by0 + 2, 4, 2, ri1)
        mcPartition(st, refs(ri1), bx0, by0 + 2, 4, 2, p1x + dx1, p1y + dy1, ri1)
        true
      case 2 =>
        val ri0 = readRef(bx0, by0, 2, 4)
        val ri1 = readRef(bx0 + 2, by0, 2, 4)
        val (dx0, dy0) = readMvd(bx0, by0, 2, 4)
        val (dx1, dy1) = readMvd(bx0 + 2, by0, 2, 4)
        val (p0x, p0y) = mvPredict(st, bx0, by0, 2, 3, ri0)
        mcPartition(st, refs(ri0), bx0, by0, 2, 4, p0x + dx0, p0y + dy0, ri0)
        val (p1x, p1y) = mvPredict(st, bx0 + 2, by0, 2, 4, ri1)
        mcPartition(st, refs(ri1), bx0 + 2, by0, 2, 4, p1x + dx1, p1y + dy1, ri1)
        true
      case 3 => // P_8x8 (7.3.5.2: 4 sub types, 4 ref_idx, then mvds)
        val subTypes = Array.fill(4)(decodeSubMbTypePCabac(d, cx))
        val refIdx = Array.tabulate(4) { sb =>
          readRef(bx0 + (sb % 2) * 2, by0 + (sb / 2) * 2, 2, 2)
        }
        var sb = 0
        while (sb < 4) {
          val sbx = bx0 + (sb % 2) * 2; val sby = by0 + (sb / 2) * 2
          val ri = refIdx(sb)
          val ref = refs(ri)
          subTypes(sb) match {
            case 0 =>
              val (dx, dy) = readMvd(sbx, sby, 2, 2)
              val (p, q) = mvPredict(st, sbx, sby, 2, 0, ri)
              mcPartition(st, ref, sbx, sby, 2, 2, p + dx, q + dy, ri)
            case 1 =>
              var k = 0
              while (k < 2) {
                val (dx, dy) = readMvd(sbx, sby + k, 2, 1)
                val (p, q) = mvPredict(st, sbx, sby + k, 2, 0, ri)
                mcPartition(st, ref, sbx, sby + k, 2, 1, p + dx, q + dy, ri)
                k += 1
              }
            case 2 =>
              var k = 0
              while (k < 2) {
                val (dx, dy) = readMvd(sbx + k, sby, 1, 2)
                val (p, q) = mvPredict(st, sbx + k, sby, 1, 0, ri)
                mcPartition(st, ref, sbx + k, sby, 1, 2, p + dx, q + dy, ri)
                k += 1
              }
            case _ =>
              var k = 0
              while (k < 4) {
                val cxb = sbx + (k % 2); val cyb = sby + (k / 2)
                val (dx, dy) = readMvd(cxb, cyb, 1, 1)
                val (p, q) = mvPredict(st, cxb, cyb, 1, 0, ri)
                mcPartition(st, ref, cxb, cyb, 1, 1, p + dx, q + dy, ri)
                k += 1
              }
          }
          sb += 1
        }
        subTypes.forall(_ == 0) // all P_L0_8x8 -> no sub-8x8 partition
      case t => throw new H264Format(s"CABAC P mb_type $t")
    }
  }

  /** CABAC B inter-MB motion (Table 7-14 types 1-21): all used
    * ref_idx_l0, then ref_idx_l1, then mvd_l0, then mvd_l1 (7.3.5.1),
    * noted at read time; per-partition single-list or bi prediction
    * then applies in order. */
  private def decodeInterMbMotionBCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      st: FrameState, refs0: IndexedSeq[FrameState],
      refs1: IndexedSeq[FrameState], mx: Int, my: Int, mbType: Int): Unit = {
    val bx0 = mx * 4; val by0 = my * 4
    val (modes, is16x8) = bMbPartModes(mbType)
    val parts: Seq[(Int, Int, Int, Int, Int)] =
      if (modes.length == 1) Seq((bx0, by0, 4, 4, 0))
      else if (is16x8) Seq((bx0, by0, 4, 2, 1), (bx0, by0 + 2, 4, 2, 2))
      else Seq((bx0, by0, 2, 4, 3), (bx0 + 2, by0, 2, 4, 4))
    def usesL0(m: Int): Boolean = m == BModeL0 || m == BModeBi
    def usesL1(m: Int): Boolean = m == BModeL1 || m == BModeBi
    def readRef(list: Int, pi: Int, range: Int): Int = {
      val (bx, by, w4, h4, _) = parts(pi)
      val ri = decodeRefIdxCabac(d, cx, st, bx, by, list, range)
      st.noteRefIdx(bx, by, w4, h4, list, ri)
      ri
    }
    def readMvd(list: Int, pi: Int): (Int, Int) = {
      val (bx, by, w4, h4, _) = parts(pi)
      val dx = decodeMvdCabac(d, cx, st, bx, by, list, 0)
      val dy = decodeMvdCabac(d, cx, st, bx, by, list, 1)
      st.noteMvd(bx, by, w4, h4, list, dx, dy)
      (dx, dy)
    }
    val ri0 = modes.indices.map(pi =>
      if (usesL0(modes(pi))) readRef(0, pi, refs0.length - 1) else -1)
    val ri1 = modes.indices.map(pi =>
      if (usesL1(modes(pi))) readRef(1, pi, refs1.length - 1) else -1)
    val mvd0 = modes.indices.map(pi =>
      if (usesL0(modes(pi))) readMvd(0, pi) else (0, 0))
    val mvd1 = modes.indices.map(pi =>
      if (usesL1(modes(pi))) readMvd(1, pi) else (0, 0))
    parts.zipWithIndex.foreach { case ((bx, by, w4, h4, kind), pi) =>
      val m = modes(pi)
      val v0 =
        if (usesL0(m)) {
          val (px, py) = mvPredict(st, bx, by, w4, kind, ri0(pi), list = 0)
          Some((px + mvd0(pi)._1, py + mvd0(pi)._2, ri0(pi)))
        } else None
      val v1 =
        if (usesL1(m)) {
          val (px, py) = mvPredict(st, bx, by, w4, kind, ri1(pi), list = 1)
          Some((px + mvd1(pi)._1, py + mvd1(pi)._2, ri1(pi)))
        } else None
      mcPartitionB(st, v0.map { case (vx, vy, ri) => (refs0(ri), vx, vy, ri) },
        v1.map { case (vx, vy, ri) => (refs1(ri), vx, vy, ri) },
        bx, by, w4, h4)
    }
  }

  /** P/B slice_data, CABAC form (7.3.4): context-coded mb_skip_flag
    * per macroblock, macroblock_layer for coded MBs, end_of_slice_flag
    * after EVERY macroblock — with the same exact-termination safety
    * gate as the I path (a diverged parse rejects loudly). */
  private def decodeInterSliceDataCabac(r: BitReader, st: FrameState,
      isB: Boolean, refs0: IndexedSeq[FrameState],
      refs1: IndexedSeq[FrameState], sliceQp: Int, cabacInitIdc: Int,
      directSpatial: Boolean): Unit = {
    while (!r.byteAligned) {
      if (r.u1() != 1) throw new H264Format("cabac_alignment_one_bit != 1")
    }
    val rbsp = r.rbsp
    val cx = new H264Cabac.Ctx
    cx.initPB(cabacInitIdc, sliceQp)
    var d = new H264Cabac.Dec(rbsp, r.bytePosAligned)
    var qpY = sliceQp
    var prevQpDelta = 0
    val skipCtxBase = if (isB) 24 else 11
    def directMotion(mx: Int, my: Int): Unit =
      applyDirectQuads(st, refs0, refs1, mx, my,
        if (directSpatial) spatialDirectMotion(st, refs1, mx, my)
        else temporalDirectQuads(st, refs0, refs1, mx, my))
    var mb = 0
    val nMbs = st.wMbs * st.hMbs
    while (mb < nMbs) {
      val mx = mb % st.wMbs; val my = mb / st.wMbs
      val mbI = my * st.wMbs + mx
      if (d.decision(cx, skipCtxBase + skipFlagInc(st, mx, my)) == 1) {
        st.skipMbArr(mbI) = true
        if (isB) {
          st.bDirectMbArr(mbI) = true
          directMotion(mx, my)
        } else {
          val (vx, vy) = skipMv(st, mx, my)
          mcPartition(st, refs0(0), mx * 4, my * 4, 4, 4, vx, vy, refIdx = 0)
        }
        markInterNnzZero(st, mx, my)
        st.markMb(mx, my, intra = false, qpY)
        prevQpDelta = 0
      } else {
        val t =
          if (isB) decodeMbTypeBCabac(d, cx, st, mx, my)
          else decodeMbTypePCabac(d, cx)
        if (t < 0) { // intra suffix
          val (q2, delta, d2) = decodeIntraMbCabac(d, cx, rbsp, st,
            mx * 16, my * 16, qpY, prevQpDelta,
            if (isB) IntraTreeB else IntraTreeP)
          qpY = q2; prevQpDelta = delta; d = d2
          st.setMv(mx * 4, my * 4, 4, 4, 0, 0, inter = false, refIdx = -1)
        } else {
          // noSubMbPartSizeLessThan8x8Flag (7.3.5): gates the
          // transform_size_8x8_flag in the residual tail. For
          // B_Direct_16x16 the gate is direct_8x8_inference_flag,
          // which the SPS layer already enforces = 1.
          val allGe8x8 =
            if (isB && t == 0) { // B_Direct_16x16: direct motion + residual
              st.bDirectMbArr(mbI) = true
              directMotion(mx, my)
              true
            } else if (isB && t == 22) { // B_8x8 sub-partitions
              decodeInterMbB8x8Cabac(d, cx, st, refs0, refs1, mx, my,
                directSpatial)
            } else if (isB) {
              decodeInterMbMotionBCabac(d, cx, st, refs0, refs1, mx, my, t)
              true
            } else {
              decodeInterMbMotionPCabac(d, cx, st, refs0, mx, my, t)
            }
          val (q2, delta) = decodeInterResidCabac(d, cx, st, mx, my, qpY,
            prevQpDelta, allGe8x8)
          qpY = q2; prevQpDelta = delta
          st.markMb(mx, my, intra = false, qpY)
        }
      }
      val eos = d.terminate()
      if (eos == 1 && mb != nMbs - 1)
        throw new H264Format("end_of_slice before the last macroblock")
      if (eos == 0 && mb == nMbs - 1)
        throw new H264Format("slice data continues past the last macroblock")
      mb += 1
    }
    var p = d.alignedBytePos
    while (p < rbsp.length) {
      if (rbsp(p) != 0)
        throw new H264Format("non-zero bytes after end_of_slice")
      p += 1
    }
  }

  /** P-slice slice_data (7.3.4 CAVLC form): mb_skip_run before every
    * coded macroblock (a trailing run may end the slice); coded MBs are
    * Table 7-13 inter types 0-4 or intra (mb_type − 5). Reconstructs
    * into `st` against the list-0 reference frames `refs` (index 0 =
    * most recent; P_Skip always predicts from refs(0) per 8.4.1.1). */
  private def decodePSliceData(r: BitReader, st: FrameState,
      refs: IndexedSeq[FrameState], qpYIn: Int): Unit = {
    var qpY = qpYIn
    var mb = 0
    val nMbs = st.wMbs * st.hMbs
    while (mb < nMbs) {
      var run = r.ue() // mb_skip_run
      if (mb + run > nMbs) throw new H264Format(s"skip run overruns at mb $mb")
      while (run > 0) {
        val mx = mb % st.wMbs; val my = mb / st.wMbs
        val (vx, vy) = skipMv(st, mx, my)
        mcPartition(st, refs(0), mx * 4, my * 4, 4, 4, vx, vy, refIdx = 0)
        markInterNnzZero(st, mx, my)
        st.markMb(mx, my, intra = false, qpY)
        mb += 1; run -= 1
      }
      if (mb < nMbs) {
        val mbType = r.ue()
        val mx = mb % st.wMbs; val my = mb / st.wMbs
        if (mbType >= 5) { // intra in a P slice (Table 7-13: type − 5)
          qpY = decodeIntraMb(r, st, mx * 16, my * 16, mbType - 5, qpY)
          // mark decoded-but-not-inter for 8.4.1.3 neighbor derivation
          // (motion grids are disjoint from the nnz the intra decode set)
          st.setMv(mx * 4, my * 4, 4, 4, 0, 0, inter = false, refIdx = -1)
        } else {
          qpY = decodeInterMb(r, st, refs, mx, my, mbType, qpY)
        }
        mb += 1
      }
    }
  }

  /** Per-partition prediction mode of a B macroblock: which lists
    * contribute (Table 7-14's L0/L1/Bi suffixes). */
  private final val BModeL0 = 1
  private final val BModeL1 = 2
  private final val BModeBi = 3

  /** Table 7-14 partition prediction modes for B mb_types 1-21 (Direct
    * and B_8x8 are handled by the caller): (partition modes, is16x8).
    * One entry = a 16x16 partition; two = 16x8 (even type) or 8x16
    * (odd). */
  private def bMbPartModes(mbType: Int): (Seq[Int], Boolean) = mbType match {
    case 1 => (Seq(BModeL0), false)
    case 2 => (Seq(BModeL1), false)
    case 3 => (Seq(BModeBi), false)
    case t if t >= 4 && t <= 21 =>
      val pair = (t - 4) / 2 match {
        case 0 => Seq(BModeL0, BModeL0)
        case 1 => Seq(BModeL1, BModeL1)
        case 2 => Seq(BModeL0, BModeL1)
        case 3 => Seq(BModeL1, BModeL0)
        case 4 => Seq(BModeL0, BModeBi)
        case 5 => Seq(BModeL1, BModeBi)
        case 6 => Seq(BModeBi, BModeL0)
        case 7 => Seq(BModeBi, BModeL1)
        case _ => Seq(BModeBi, BModeBi)
      }
      (pair, t % 2 == 0) // even = 16x8, odd = 8x16
    case t => throw new H264Format(s"bad B mb_type $t")
  }

  /** B sub_mb_type shape (Table 7-17): (prediction mode — [[BModeL0]]
    * family, or -1 for B_Direct_8x8; part width and height in 4x4
    * units; part count). */
  private def bSubShape(t: Int): (Int, Int, Int, Int) = t match {
    case 0 => (-1, 2, 2, 1) // B_Direct_8x8
    case 1 => (BModeL0, 2, 2, 1)
    case 2 => (BModeL1, 2, 2, 1)
    case 3 => (BModeBi, 2, 2, 1)
    case 4 => (BModeL0, 2, 1, 2)
    case 5 => (BModeL0, 1, 2, 2)
    case 6 => (BModeL1, 2, 1, 2)
    case 7 => (BModeL1, 1, 2, 2)
    case 8 => (BModeBi, 2, 1, 2)
    case 9 => (BModeBi, 1, 2, 2)
    case 10 => (BModeL0, 1, 1, 4)
    case 11 => (BModeL1, 1, 1, 4)
    case 12 => (BModeBi, 1, 1, 4)
    case _ => throw new H264Format(s"bad B sub_mb_type $t")
  }

  /** Part origins (block offsets within the 8x8) for a sub shape. */
  private def subPartOrigins(w4: Int, h4: Int, n: Int): Seq[(Int, Int)] =
    if (n == 1) Seq((0, 0))
    else if (w4 == 2) Seq((0, 0), (0, 1)) // 8x4 top, bottom
    else if (h4 == 2) Seq((0, 0), (1, 0)) // 4x8 left, right
    else Seq((0, 0), (1, 0), (0, 1), (1, 1)) // 4x4 z-order

  /** B sub_mb_type CABAC tree (Table 9-38 B column; bins at 36, 37,
    * then 38 when bin1 = 1 / 39 when bin1 = 0, remaining bins 39). */
  private def decodeSubMbTypeBCabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx): Int =
    if (d.decision(cx, 36) == 0) 0
    else if (d.decision(cx, 37) == 0) 1 + d.decision(cx, 39)
    else if (d.decision(cx, 38) == 0)
      3 + ((d.decision(cx, 39) << 1) | d.decision(cx, 39))
    else if (d.decision(cx, 39) == 0)
      7 + ((d.decision(cx, 39) << 1) | d.decision(cx, 39))
    else 11 + d.decision(cx, 39)

  private def encodeSubMbTypeBCabac(e: H264Cabac.Enc, cx: H264Cabac.Ctx,
      t: Int): Unit = t match {
    case 0 => e.decision(cx, 36, 0)
    case 1 | 2 =>
      e.decision(cx, 36, 1); e.decision(cx, 37, 0)
      e.decision(cx, 39, t - 1)
    case t2 if t2 >= 3 && t2 <= 6 =>
      e.decision(cx, 36, 1); e.decision(cx, 37, 1); e.decision(cx, 38, 0)
      e.decision(cx, 39, ((t2 - 3) >> 1) & 1); e.decision(cx, 39, (t2 - 3) & 1)
    case t2 if t2 >= 7 && t2 <= 10 =>
      e.decision(cx, 36, 1); e.decision(cx, 37, 1); e.decision(cx, 38, 1)
      e.decision(cx, 39, 0)
      e.decision(cx, 39, ((t2 - 7) >> 1) & 1); e.decision(cx, 39, (t2 - 7) & 1)
    case 11 | 12 =>
      e.decision(cx, 36, 1); e.decision(cx, 37, 1); e.decision(cx, 38, 1)
      e.decision(cx, 39, 1); e.decision(cx, 39, t - 11)
    case _ => throw new H264Format(s"CABAC B sub_mb_type $t")
  }

  /** B_8x8 motion (7.3.5.2 for B, CAVLC form): four sub_mb_types, all
    * used ref_idx_l0, all ref_idx_l1, all mvd_l0 (sub-major), all
    * mvd_l1; direct subs take their quadrant of the slice's direct
    * derivation (spatial or temporal). Motion then applies in sub /
    * part order so later predictors see earlier partitions. */
  private def decodeInterMbB8x8(r: BitReader, st: FrameState,
      refs0: IndexedSeq[FrameState], refs1: IndexedSeq[FrameState],
      mx: Int, my: Int, directSpatial: Boolean): Boolean = {
    val subTypes = Array.fill(4)(r.ue())
    val shapes = subTypes.map(bSubShape)
    def usesL0(m: Int) = m == BModeL0 || m == BModeBi
    def usesL1(m: Int) = m == BModeL1 || m == BModeBi
    def readRef(range: Int): Int = {
      val v = if (range == 0) 0 else te(r, range)
      if (v > range) throw new H264Format(s"ref_idx $v exceeds list")
      v
    }
    val ri0 = shapes.map { case (m, _, _, _) =>
      if (m > 0 && usesL0(m)) readRef(refs0.length - 1) else -1 }
    val ri1 = shapes.map { case (m, _, _, _) =>
      if (m > 0 && usesL1(m)) readRef(refs1.length - 1) else -1 }
    val mvd0 = shapes.map { case (m, _, _, n) =>
      if (m > 0 && usesL0(m)) Array.fill(n)((r.se(), r.se())) else Array.empty[(Int, Int)] }
    val mvd1 = shapes.map { case (m, _, _, n) =>
      if (m > 0 && usesL1(m)) Array.fill(n)((r.se(), r.se())) else Array.empty[(Int, Int)] }
    applyB8x8Motion(st, refs0, refs1, mx, my, directSpatial, shapes,
      ri0, ri1, mvd0, mvd1)
    subTypes.forall(_ <= 3) // every sub >= 8x8 (transform-8x8 gate)
  }

  /** Shared B_8x8 geometry application (CAVLC and CABAC feed it their
    * parsed fields). */
  private def applyB8x8Motion(st: FrameState,
      refs0: IndexedSeq[FrameState], refs1: IndexedSeq[FrameState],
      mx: Int, my: Int, directSpatial: Boolean,
      shapes: Array[(Int, Int, Int, Int)], ri0: Array[Int], ri1: Array[Int],
      mvd0: Array[Array[(Int, Int)]], mvd1: Array[Array[(Int, Int)]]): Unit = {
    def usesL0(m: Int) = m == BModeL0 || m == BModeBi
    def usesL1(m: Int) = m == BModeL1 || m == BModeBi
    lazy val directQs =
      if (directSpatial) spatialDirectMotion(st, refs1, mx, my)
      else temporalDirectQuads(st, refs0, refs1, mx, my)
    var sb = 0
    while (sb < 4) {
      val (m, w4, h4, n) = shapes(sb)
      val sbx = mx * 4 + (sb % 2) * 2; val sby = my * 4 + (sb / 2) * 2
      if (m < 0) applyDirectQuad(st, refs0, refs1, mx, my, sb, directQs(sb))
      else {
        subPartOrigins(w4, h4, n).zipWithIndex.foreach { case ((ox, oy), pi) =>
          val bx = sbx + ox; val by = sby + oy
          val v0 =
            if (usesL0(m)) {
              val (px, py) = mvPredict(st, bx, by, w4, 0, ri0(sb), list = 0)
              Some((px + mvd0(sb)(pi)._1, py + mvd0(sb)(pi)._2, ri0(sb)))
            } else None
          val v1 =
            if (usesL1(m)) {
              val (px, py) = mvPredict(st, bx, by, w4, 0, ri1(sb), list = 1)
              Some((px + mvd1(sb)(pi)._1, py + mvd1(sb)(pi)._2, ri1(sb)))
            } else None
          mcPartitionB(st,
            v0.map { case (vx, vy, ri) => (refs0(ri), vx, vy, ri) },
            v1.map { case (vx, vy, ri) => (refs1(ri), vx, vy, ri) },
            bx, by, w4, h4)
        }
      }
      sb += 1
    }
  }

  /** B_8x8 motion, CABAC form: the same field order through the
    * arithmetic codecs, with ref_idx/mvd noted into the grids at read
    * time (9.3.3.1.1.6/.7 neighbor state). Returns
    * noSubMbPartSizeLessThan8x8Flag (7.3.5): every sub is a direct sub
    * (inference ON, SPS-enforced) or a single-partition 8x8 type. */
  private def decodeInterMbB8x8Cabac(d: H264Cabac.Dec, cx: H264Cabac.Ctx,
      st: FrameState, refs0: IndexedSeq[FrameState],
      refs1: IndexedSeq[FrameState], mx: Int, my: Int,
      directSpatial: Boolean): Boolean = {
    val subTypes = Array.fill(4)(decodeSubMbTypeBCabac(d, cx))
    val shapes = subTypes.map(bSubShape)
    def usesL0(m: Int) = m == BModeL0 || m == BModeBi
    def usesL1(m: Int) = m == BModeL1 || m == BModeBi
    def readRef(sb: Int, list: Int, range: Int): Int = {
      val sbx = mx * 4 + (sb % 2) * 2; val sby = my * 4 + (sb / 2) * 2
      val ri = decodeRefIdxCabac(d, cx, st, sbx, sby, list, range)
      st.noteRefIdx(sbx, sby, 2, 2, list, ri)
      ri
    }
    val ri0 = Array.tabulate(4) { sb =>
      val (m, _, _, _) = shapes(sb)
      if (m > 0 && usesL0(m)) readRef(sb, 0, refs0.length - 1) else -1
    }
    val ri1 = Array.tabulate(4) { sb =>
      val (m, _, _, _) = shapes(sb)
      if (m > 0 && usesL1(m)) readRef(sb, 1, refs1.length - 1) else -1
    }
    def readMvds(list: Int): Array[Array[(Int, Int)]] = Array.tabulate(4) { sb =>
      val (m, w4, h4, n) = shapes(sb)
      val used = if (list == 0) usesL0(m) else usesL1(m)
      if (m > 0 && used) {
        val sbx = mx * 4 + (sb % 2) * 2; val sby = my * 4 + (sb / 2) * 2
        subPartOrigins(w4, h4, n).map { case (ox, oy) =>
          val bx = sbx + ox; val by = sby + oy
          val dx = decodeMvdCabac(d, cx, st, bx, by, list, 0)
          val dy = decodeMvdCabac(d, cx, st, bx, by, list, 1)
          st.noteMvd(bx, by, w4, h4, list, dx, dy)
          (dx, dy)
        }.toArray
      } else Array.empty[(Int, Int)]
    }
    val mvd0 = readMvds(0)
    val mvd1 = readMvds(1)
    applyB8x8Motion(st, refs0, refs1, mx, my, directSpatial, shapes,
      ri0, ri1, mvd0, mvd1)
    subTypes.forall(_ <= 3) // direct or single-partition 8x8 subs
  }

  /** Spatial direct motion derivation (8.4.1.2.2, frame coding,
    * direct_8x8_inference = 1) for a 16x16 direct macroblock
    * (B_Skip / B_Direct_16x16): the per-list MinPositive reference over
    * neighbors A/B/C, the 16x16 median predictor for each used list,
    * and the colocated-zero override evaluated at the CORNER 4x4 of
    * each 8x8 quadrant against list1's first picture. Returns the four
    * quadrants' per-list (vx, vy, refIdx). */
  private def spatialDirectMotion(st: FrameState,
      refs1: IndexedSeq[FrameState], mx: Int, my: Int)
      : Array[(Option[(Int, Int, Int)], Option[(Int, Int, Int)])] = {
    val bx0 = mx * 4; val by0 = my * 4
    def minRef(list: Int): Int = {
      val a = mvNbrAt(st, bx0 - 1, by0, list)
      val b = mvNbrAt(st, bx0, by0 - 1, list)
      val cRaw = mvNbrAt(st, bx0 + 4, by0 - 1, list)
      val c = if (cRaw.avail) cRaw else mvNbrAt(st, bx0 - 1, by0 - 1, list)
      val rs = Seq(a, b, c).collect { case n if n.inter && n.refIdx >= 0 => n.refIdx }
      if (rs.isEmpty) -1 else rs.min
    }
    var ref0 = minRef(0)
    var ref1 = minRef(1)
    // no neighbor predicts from either list: zero motion at refIdx 0
    val directZero = ref0 < 0 && ref1 < 0
    if (directZero) { ref0 = 0; ref1 = 0 }
    val mv0 =
      if (directZero || ref0 < 0) (0, 0)
      else mvPredict(st, bx0, by0, 4, 0, ref0, list = 0)
    val mv1 =
      if (directZero || ref1 < 0) (0, 0)
      else mvPredict(st, bx0, by0, 4, 0, ref1, list = 1)
    val col = refs1.head // colocated picture: first entry of list 1
    // a non-existing colocated picture has no motion grid to read —
    // its zeros would silently mis-derive direct motion (8.2.5.2)
    if (col.nonExisting)
      throw new H264Format("direct mode over a non-existing colocated frame (8.2.5.2)")
    Array.tabulate(4) { q =>
      val qx = q & 1; val qy = q >> 1
      // direct_8x8_inference: each quadrant reads the frame-corner 4x4
      val cx = bx0 + (if (qx == 0) 0 else 3)
      val cy = by0 + (if (qy == 0) 0 else 3)
      val ci = col.blkIdx(cx, cy)
      val (colRef, colVx, colVy) =
        if (col.refIdxBlk(ci) >= 0) (col.refIdxBlk(ci), col.mvx(ci), col.mvy(ci))
        else if (col.refIdx1Blk(ci) >= 0) (col.refIdx1Blk(ci), col.mvx1(ci), col.mvy1(ci))
        else (-1, 0, 0) // intra colocated
      // 8.4.1.2.2: the colocated-zero override requires the colocated
      // picture (list1's first entry) to be SHORT-term
      val colZero = col.longTermIdx < 0 && colRef == 0 &&
        math.abs(colVx) <= 1 && math.abs(colVy) <= 1
      def side(refIdx: Int, mv: (Int, Int)): Option[(Int, Int, Int)] =
        if (refIdx < 0) None
        else if (colZero && refIdx == 0) Some((0, 0, refIdx))
        else Some((mv._1, mv._2, refIdx))
      (side(ref0, mv0), side(ref1, mv1))
    }
  }

  /** Temporal direct motion derivation (8.4.1.2.3, frame coding,
    * direct_8x8_inference = 1): each 8x8 quadrant takes the colocated
    * CORNER 4x4 block's motion from list1's first picture, maps its
    * reference PICTURE (by uid) to the current list 0, and scales the
    * vector by POC distances — mvL0 = (DistScaleFactor·mvCol + 128)
    * >> 8, mvL1 = mvL0 − mvCol. An intra colocated block yields zero
    * motion at refIdx 0; a colocated reference absent from list 0
    * marks a corrupt or out-of-scope stream and rejects loudly. */
  private def temporalDirectQuads(st: FrameState,
      refs0: IndexedSeq[FrameState], refs1: IndexedSeq[FrameState],
      mx: Int, my: Int)
      : Array[(Option[(Int, Int, Int)], Option[(Int, Int, Int)])] = {
    val col = refs1.head
    if (col.nonExisting)
      throw new H264Format("direct mode over a non-existing colocated frame (8.2.5.2)")
    Array.tabulate(4) { q =>
      val cx = mx * 4 + (if ((q & 1) == 0) 0 else 3)
      val cy = my * 4 + (if ((q >> 1) == 0) 0 else 3)
      val ci = col.blkIdx(cx, cy)
      val (colUid, colVx, colVy) =
        if (col.refIdxBlk(ci) >= 0) (col.refUidBlk(ci), col.mvx(ci), col.mvy(ci))
        else if (col.refIdx1Blk(ci) >= 0)
          (col.refUid1Blk(ci), col.mvx1(ci), col.mvy1(ci))
        else (-1L, 0, 0) // intra colocated
      val (ri0, v0x, v0y, v1x, v1y) =
        if (colUid < 0) (0, 0, 0, 0, 0)
        else {
          val r0 = refs0.indexWhere(_.uid == colUid)
          if (r0 < 0)
            throw new H264Format("temporal direct: colocated ref not in list 0")
          val pic0 = refs0(r0)
          val td = clip3(-128, 127, col.poc - pic0.poc)
          // 8.4.1.2.3: a LONG-TERM list-0 reference (or td == 0) takes
          // the unscaled colocated motion (POC distance to a long-term
          // picture is not meaningful for scaling)
          if (td == 0 || pic0.longTermIdx >= 0) (r0, colVx, colVy, 0, 0)
          else {
            val tb = clip3(-128, 127, st.poc - pic0.poc)
            val tx = (16384 + math.abs(td / 2)) / td
            val dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
            val x0 = (dsf * colVx + 128) >> 8
            val y0 = (dsf * colVy + 128) >> 8
            (r0, x0, y0, x0 - colVx, y0 - colVy)
          }
        }
      (Some((v0x, v0y, ri0)), Some((v1x, v1y, 0)))
    }
  }

  /** Motion-compensate ONE direct 8x8 quadrant (whole-MB direct/skip
    * and B_Direct_8x8 subs share this; list bounds checked here — a
    * derived refIdx beyond the slice's active list marks a corrupt or
    * out-of-scope stream). Marks the quadrant's blocks direct for the
    * 9.3.3.1.1.6 ref_idx neighbor rule. */
  private def applyDirectQuad(st: FrameState,
      refs0: IndexedSeq[FrameState], refs1: IndexedSeq[FrameState],
      mx: Int, my: Int, q: Int,
      quad: (Option[(Int, Int, Int)], Option[(Int, Int, Int)])): Unit = {
    val (v0, v1) = quad
    v0.foreach { case (_, _, ri) =>
      if (ri >= refs0.length) throw new H264Format(s"direct refIdxL0 $ri exceeds list") }
    v1.foreach { case (_, _, ri) =>
      if (ri >= refs1.length) throw new H264Format(s"direct refIdxL1 $ri exceeds list") }
    val bx = mx * 4 + (q & 1) * 2; val by = my * 4 + (q >> 1) * 2
    mcPartitionB(st,
      v0.map { case (vx, vy, ri) => (refs0(ri), vx, vy, ri) },
      v1.map { case (vx, vy, ri) => (refs1(ri), vx, vy, ri) },
      bx, by, 2, 2)
    var yy = by
    while (yy < by + 2) {
      var xx = bx
      while (xx < bx + 2) { st.directBlk(st.blkIdx(xx, yy)) = true; xx += 1 }
      yy += 1
    }
  }

  private def applyDirectQuads(st: FrameState,
      refs0: IndexedSeq[FrameState], refs1: IndexedSeq[FrameState],
      mx: Int, my: Int,
      quads: Array[(Option[(Int, Int, Int)], Option[(Int, Int, Int)])]): Unit = {
    var q = 0
    while (q < 4) {
      applyDirectQuad(st, refs0, refs1, mx, my, q, quads(q))
      q += 1
    }
  }

  /** B-slice slice_data (7.3.4 CAVLC form): B_Skip rides mb_skip_run
    * (spatial direct motion, no residual); coded MBs are Table 7-14 —
    * B_Direct_16x16 (0, spatial direct + residual), types 1-21
    * (16x16/16x8/8x16 with L0/L1/Bi per partition), or intra
    * (mb_type − 23). Temporal direct (direct_spatial_mv_pred_flag 0)
    * and B_8x8 (22, sub-partitioned, sub_mb direct) reject loudly. */
  private def decodeBSliceData(r: BitReader, st: FrameState,
      refs0: IndexedSeq[FrameState], refs1: IndexedSeq[FrameState],
      qpYIn: Int, directSpatial: Boolean): Unit = {
    var qpY = qpYIn
    var mb = 0
    val nMbs = st.wMbs * st.hMbs
    def decodeDirectMotion(mx: Int, my: Int): Unit =
      applyDirectQuads(st, refs0, refs1, mx, my,
        if (directSpatial) spatialDirectMotion(st, refs1, mx, my)
        else temporalDirectQuads(st, refs0, refs1, mx, my))
    while (mb < nMbs) {
      var skipRun = r.ue() // mb_skip_run: B_Skip = direct, no residual
      while (skipRun > 0 && mb < nMbs) {
        val mx = mb % st.wMbs; val my = mb / st.wMbs
        decodeDirectMotion(mx, my)
        markInterNnzZero(st, mx, my)
        st.markMb(mx, my, intra = false, qpY)
        skipRun -= 1
        mb += 1
      }
      if (skipRun > 0) throw new H264Format("mb_skip_run overruns slice")
      if (mb >= nMbs) return // trailing skip run ended the slice
      val mbType = r.ue()
      val mx = mb % st.wMbs; val my = mb / st.wMbs
      if (mbType == 0 || mbType == 22) {
        // B_Direct_16x16 (direct motion) or B_8x8 (sub-partitioned,
        // possibly with direct subs), then the shared inter residual;
        // the transform-8x8 gate needs every sub partition >= 8x8
        // (direct_8x8_inference is 1 — enforced at the slice header)
        val allGe8x8 =
          if (mbType == 0) { decodeDirectMotion(mx, my); true }
          else decodeInterMbB8x8(r, st, refs0, refs1, mx, my, directSpatial)
        val cbpCode = r.ue()
        if (cbpCode > 47) throw new H264Format(s"cbp code $cbpCode")
        val cbp = CbpInterByCodeNum(cbpCode)
        val t8 = (cbp & 15) != 0 && st.t8x8Allowed && allGe8x8 && r.u1() == 1
        if (cbp != 0) qpY = ((qpY + r.se()) % 52 + 52) % 52
        if (t8)
          decodeInterLumaResid8x8(new CavlcSrc(r), st, mx, my, cbp & 15, qpY)
        else decodeInterLumaResid(new CavlcSrc(r), st, mx, my, cbp & 15, qpY)
        decodeChromaResidOnPred(new CavlcSrc(r), st, mx, my, cbp >> 4,
          st.cQp(qpY))
        st.markMb(mx, my, intra = false, qpY)
      } else if (mbType >= 23) { // intra in a B slice (Table 7-14: type − 23)
        qpY = decodeIntraMb(r, st, mx * 16, my * 16, mbType - 23, qpY)
        st.setMv(mx * 4, my * 4, 4, 4, 0, 0, inter = false, refIdx = -1)
      } else {
        qpY = decodeInterMbB(r, st, refs0, refs1, mx, my, mbType, qpY)
      }
      mb += 1
    }
  }

  /** Decode one B inter macroblock (Table 7-14 types 1-21): per the
    * 7.3.5.1 field order ALL used ref_idx_l0 come first, then all
    * ref_idx_l1, then all mvd_l0, then all mvd_l1; each partition then
    * reconstructs in order (so partition 1's MV prediction sees
    * partition 0's motion) with single-list or averaged bi-prediction.
    * Residual is the shared inter path. Returns the updated slice QP. */
  private def decodeInterMbB(r: BitReader, st: FrameState,
      refs0: IndexedSeq[FrameState], refs1: IndexedSeq[FrameState],
      mx: Int, my: Int, mbType: Int, qpYIn: Int): Int = {
    var qpY = qpYIn
    val bx0 = mx * 4; val by0 = my * 4
    val (modes, is16x8) = bMbPartModes(mbType)
    // partition geometry: (bx, by, w4, h4, shortcutKind-for-16x8/8x16)
    val parts: Seq[(Int, Int, Int, Int, Int)] =
      if (modes.length == 1) Seq((bx0, by0, 4, 4, 0))
      else if (is16x8) Seq((bx0, by0, 4, 2, 1), (bx0, by0 + 2, 4, 2, 2))
      else Seq((bx0, by0, 2, 4, 3), (bx0 + 2, by0, 2, 4, 4))
    def usesL0(m: Int): Boolean = m == BModeL0 || m == BModeBi
    def usesL1(m: Int): Boolean = m == BModeL1 || m == BModeBi
    def readRefIdx(range: Int): Int = {
      val v = if (range == 0) 0 else te(r, range)
      if (v > range) throw new H264Format(s"ref_idx $v exceeds list")
      v
    }
    val ri0 = modes.map(m => if (usesL0(m)) readRefIdx(refs0.length - 1) else -1)
    val ri1 = modes.map(m => if (usesL1(m)) readRefIdx(refs1.length - 1) else -1)
    val mvd0 = modes.map(m => if (usesL0(m)) (r.se(), r.se()) else (0, 0))
    val mvd1 = modes.map(m => if (usesL1(m)) (r.se(), r.se()) else (0, 0))
    parts.zipWithIndex.foreach { case ((bx, by, w4, h4, kind), pi) =>
      val m = modes(pi)
      val v0 =
        if (usesL0(m)) {
          val (px, py) = mvPredict(st, bx, by, w4, kind, ri0(pi), list = 0)
          Some((px + mvd0(pi)._1, py + mvd0(pi)._2, ri0(pi)))
        } else None
      val v1 =
        if (usesL1(m)) {
          val (px, py) = mvPredict(st, bx, by, w4, kind, ri1(pi), list = 1)
          Some((px + mvd1(pi)._1, py + mvd1(pi)._2, ri1(pi)))
        } else None
      mcPartitionB(st, v0.map { case (vx, vy, ri) => (refs0(ri), vx, vy, ri) },
        v1.map { case (vx, vy, ri) => (refs1(ri), vx, vy, ri) },
        bx, by, w4, h4)
    }
    // residual: identical to the P inter layout (Table 9-5 inter CBP,
    // optional transform_size_8x8_flag — every 1-21 shape is >= 8x8)
    val cbpCode = r.ue()
    if (cbpCode > 47) throw new H264Format(s"cbp code $cbpCode")
    val cbp = CbpInterByCodeNum(cbpCode)
    val t8 = (cbp & 15) != 0 && st.t8x8Allowed && r.u1() == 1
    if (cbp != 0) qpY = ((qpY + r.se()) % 52 + 52) % 52
    if (t8) decodeInterLumaResid8x8(new CavlcSrc(r), st, mx, my, cbp & 15, qpY)
    else decodeInterLumaResid(new CavlcSrc(r), st, mx, my, cbp & 15, qpY)
    decodeChromaResidOnPred(new CavlcSrc(r), st, mx, my, cbp >> 4,
      st.cQp(qpY))
    st.markMb(mx, my, intra = false, qpY)
    qpY
  }

  /** Motion-compensate one B partition: single-list prediction writes
    * the interpolated block; bi-prediction combines the two lists'
    * interpolations per 8.4.2.3.2 — the default rounding average, the
    * slice's explicit weights, or implicit POC-distance weights
    * (weighted_bipred_idc 2, bipredicted partitions only). Writes both
    * planes and the per-list motion grid. */
  private def mcPartitionB(st: FrameState,
      p0: Option[(FrameState, Int, Int, Int)],
      p1: Option[(FrameState, Int, Int, Int)],
      bx: Int, by: Int, w4: Int, h4: Int): Unit = {
    require(p0.isDefined || p1.isDefined, "B partition with no list")
    // 8.2.5.2: non-existing frames carry no samples — see mcPartition
    if (p0.exists(_._1.nonExisting) || p1.exists(_._1.nonExisting))
      throw new H264Format("inter prediction from a non-existing frame (8.2.5.2)")
    val lumaW = st.lumaW
    val bw = w4 * 4; val bh = h4 * 4
    // implicit weights are per reference-pair, shared by both planes
    val impW: (Int, Int) =
      if (st.wpImplicit && p0.isDefined && p1.isDefined)
        implicitBiWeights(st.poc, p0.get._1.poc, p1.get._1.poc)
      else (32, 32)
    def combine(a: Option[Array[Int]], b: Option[Array[Int]], n: Int,
        wpOff: Int, logWD: Int): Array[Int] = (a, b) match {
      case (Some(x), Some(y)) =>
        if (st.wpTab != null) { // explicit bi
          val e0 = st.wpTab(0)(p0.get._4); val e1 = st.wpTab(1)(p1.get._4)
          val w0 = e0(wpOff); val o0 = e0(wpOff + 1)
          val w1 = e1(wpOff); val o1 = e1(wpOff + 1)
          val oo = (o0 + o1 + 1) >> 1
          Array.tabulate(n)(i =>
            ((x(i) * w0 + y(i) * w1 + (1 << logWD)) >> (logWD + 1)) + oo)
        } else if (st.wpImplicit)
          Array.tabulate(n)(i => (x(i) * impW._1 + y(i) * impW._2 + 32) >> 6)
        else Array.tabulate(n)(i => (x(i) + y(i) + 1) >> 1)
      case (Some(x), None) =>
        if (st.wpTab != null) { // explicit single-list (list 0)
          val e = st.wpTab(0)(p0.get._4)
          x.map(v => st.wpSample(v, e(wpOff), e(wpOff + 1), logWD))
        } else x
      case (None, other) =>
        val x = other.get
        if (st.wpTab != null) { // explicit single-list (list 1)
          val e = st.wpTab(1)(p1.get._4)
          x.map(v => st.wpSample(v, e(wpOff), e(wpOff + 1), logWD))
        } else x
    }
    def lumaOf(p: (FrameState, Int, Int, Int)): Array[Int] =
      mcLuma(p._1.yPlane, lumaW, st.hMbs * 16, bx * 4, by * 4, p._2, p._3, bw, bh)
    val pl = combine(p0.map(lumaOf), p1.map(lumaOf), bw * bh, 0, st.wpLogWDy)
    var y = 0
    while (y < bh) {
      var x = 0
      while (x < bw) {
        st.yPlane((by * 4 + y) * lumaW + bx * 4 + x) = clipB(pl(y * bw + x))
        x += 1
      }
      y += 1
    }
    val cW = lumaW / 2
    var c = 0
    while (c < 2) {
      def chromaOf(p: (FrameState, Int, Int, Int)): Array[Int] =
        mcChroma(if (c == 0) p._1.cbPlane else p._1.crPlane, cW, st.hMbs * 8,
          bx * 2, by * 2, p._2, p._3, w4 * 2, h4 * 2)
      val pc = combine(p0.map(chromaOf), p1.map(chromaOf), w4 * 2 * h4 * 2,
        2 + 2 * c, st.wpLogWDc)
      val sp = if (c == 0) st.cbPlane else st.crPlane
      var yy = 0
      while (yy < h4 * 2) {
        var xx = 0
        while (xx < w4 * 2) {
          sp((by * 2 + yy) * cW + bx * 2 + xx) = clipB(pc(yy * w4 * 2 + xx))
          xx += 1
        }
        yy += 1
      }
      c += 1
    }
    st.setMvB(bx, by, w4, h4,
      p0.map { case (_, vx, vy, ri) => (vx, vy, ri) },
      p1.map { case (_, vx, vy, ri) => (vx, vy, ri) },
      uid0 = p0.map(_._1.uid).getOrElse(-1L),
      uid1 = p1.map(_._1.uid).getOrElse(-1L))
  }

  /** TotalCoeff bookkeeping for a residual-free inter MB (P_Skip or
    * cbp 0): every luma/chroma 4x4 block records zero coefficients. */
  private def markInterNnzZero(st: FrameState, mx: Int, my: Int): Unit = {
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) { st.setNnzY(mx * 4 + x, my * 4 + y, 0); x += 1 }
      y += 1
    }
    var c = 0
    while (c < 2) {
      var yy = 0
      while (yy < 2) {
        var xx = 0
        while (xx < 2) { st.setNnzC(c, mx * 2 + xx, my * 2 + yy, 0); xx += 1 }
        yy += 1
      }
      c += 1
    }
  }

  /** Decode one inter macroblock (Table 7-13 types 0-4): per-partition
    * ref_idx_l0 (te(v), present when the list has more than one frame —
    * 7.3.5.1 reads ALL partitions' ref_idx before any mvd), partition
    * MVs (mvd against the 8.4.1.3 predictor), motion compensation from
    * the selected reference, then the inter residual (Table 9-5 inter
    * CBP; 16-coefficient luma blocks — no DC split — and the shared
    * chroma layout with MC prediction). Returns the updated slice QP. */
  private def decodeInterMb(r: BitReader, st: FrameState,
      refs: IndexedSeq[FrameState], mx: Int, my: Int, mbType: Int,
      qpYIn: Int): Int = {
    var qpY = qpYIn
    val bx0 = mx * 4; val by0 = my * 4
    val range = refs.length - 1 // te(v) range; 0 = field absent
    def readRefIdx(): Int = {
      val v = if (range == 0) 0 else te(r, range)
      if (v > range) throw new H264Format(s"ref_idx_l0 $v exceeds list of ${refs.length}")
      v
    }
    def readMvd(): (Int, Int) = { val x = r.se(); val y = r.se(); (x, y) }
    var allGe8x8 = true // every partition >= 8x8 (transform-8x8 gate)
    mbType match {
      case 0 => // P_L0_16x16
        val ri = readRefIdx()
        val (dx, dy) = readMvd()
        val (px, py) = mvPredict(st, bx0, by0, 4, 0, ri)
        mcPartition(st, refs(ri), bx0, by0, 4, 4, px + dx, py + dy, ri)
      case 1 => // P_L0_L0_16x8 (top, bottom)
        val ri0 = readRefIdx(); val ri1 = readRefIdx()
        val (dx0, dy0) = readMvd(); val (dx1, dy1) = readMvd()
        val (p0x, p0y) = mvPredict(st, bx0, by0, 4, 1, ri0)
        mcPartition(st, refs(ri0), bx0, by0, 4, 2, p0x + dx0, p0y + dy0, ri0)
        val (p1x, p1y) = mvPredict(st, bx0, by0 + 2, 4, 2, ri1)
        mcPartition(st, refs(ri1), bx0, by0 + 2, 4, 2, p1x + dx1, p1y + dy1, ri1)
      case 2 => // P_L0_L0_8x16 (left, right)
        val ri0 = readRefIdx(); val ri1 = readRefIdx()
        val (dx0, dy0) = readMvd(); val (dx1, dy1) = readMvd()
        val (p0x, p0y) = mvPredict(st, bx0, by0, 2, 3, ri0)
        mcPartition(st, refs(ri0), bx0, by0, 2, 4, p0x + dx0, p0y + dy0, ri0)
        val (p1x, p1y) = mvPredict(st, bx0 + 2, by0, 2, 4, ri1)
        mcPartition(st, refs(ri1), bx0 + 2, by0, 2, 4, p1x + dx1, p1y + dy1, ri1)
      case 3 | 4 => // P_8x8 / P_8x8ref0 (ref0: every ref_idx is 0, no syntax)
        val subTypes = Array.fill(4)(r.ue())
        subTypes.foreach { t =>
          if (t > 3) throw new H264Format(s"bad sub_mb_type $t")
        }
        allGe8x8 = subTypes.forall(_ == 0) // 7.3.5's noSubMbPartSizeLessThan8x8
        // sub_mb_pred (7.3.5.2): the four 8x8s' ref_idx fields come
        // BEFORE any mvd
        val refIdx =
          if (mbType == 4) Array.fill(4)(0)
          else Array.fill(4)(readRefIdx())
        var sb = 0
        while (sb < 4) {
          val sbx = bx0 + (sb % 2) * 2; val sby = by0 + (sb / 2) * 2
          val ri = refIdx(sb)
          val ref = refs(ri)
          subTypes(sb) match {
            case 0 => // 8x8
              val (dx, dy) = readMvd()
              val (p, q) = mvPredict(st, sbx, sby, 2, 0, ri)
              mcPartition(st, ref, sbx, sby, 2, 2, p + dx, q + dy, ri)
            case 1 => // 8x4 (top, bottom)
              var k = 0
              while (k < 2) {
                val (dx, dy) = readMvd()
                val (p, q) = mvPredict(st, sbx, sby + k, 2, 0, ri)
                mcPartition(st, ref, sbx, sby + k, 2, 1, p + dx, q + dy, ri)
                k += 1
              }
            case 2 => // 4x8 (left, right)
              var k = 0
              while (k < 2) {
                val (dx, dy) = readMvd()
                val (p, q) = mvPredict(st, sbx + k, sby, 1, 0, ri)
                mcPartition(st, ref, sbx + k, sby, 1, 2, p + dx, q + dy, ri)
                k += 1
              }
            case _ => // 4x4, z-order within the 8x8
              var k = 0
              while (k < 4) {
                val cx = sbx + (k % 2); val cy = sby + (k / 2)
                val (dx, dy) = readMvd()
                val (p, q) = mvPredict(st, cx, cy, 1, 0, ri)
                mcPartition(st, ref, cx, cy, 1, 1, p + dx, q + dy, ri)
                k += 1
              }
          }
          sb += 1
        }
      case _ => throw new H264Format(s"bad P-slice mb_type $mbType")
    }
    // residual: CBP (inter column), transform_size_8x8_flag (7.3.5,
    // high profile with coded luma and no sub-8x8 partitions), optional
    // qp delta, luma blocks, chroma per the shared layout
    val cbpCode = r.ue()
    if (cbpCode > 47) throw new H264Format(s"cbp code $cbpCode")
    val cbp = CbpInterByCodeNum(cbpCode)
    val cbpLuma = cbp & 15
    val cbpChroma = cbp >> 4
    val t8 = cbpLuma != 0 && st.t8x8Allowed && allGe8x8 && r.u1() == 1
    if (cbp != 0) qpY = ((qpY + r.se()) % 52 + 52) % 52
    if (t8) decodeInterLumaResid8x8(new CavlcSrc(r), st, mx, my, cbpLuma, qpY)
    else decodeInterLumaResid(new CavlcSrc(r), st, mx, my, cbpLuma, qpY)
    decodeChromaResidOnPred(new CavlcSrc(r), st, mx, my, cbpChroma,
      st.cQp(qpY))
    st.markMb(mx, my, intra = false, qpY)
    qpY
  }

  /** Add the decoded luma residual of an inter MB on top of the
    * motion-compensated prediction already in the planes (8.5: inter
    * blocks carry full 16-coefficient 4x4 transforms, no DC split). */
  private def decodeInterLumaResid(src: MbSrc, st: FrameState,
      mx: Int, my: Int, cbpLuma: Int, qpY: Int): Unit = {
    import H264Transform._
    val lumaW = st.lumaW
    val x0 = mx * 16; val y0 = my * 16
    val scan = new Array[Int](16)
    var bi = 0
    while (bi < 16) {
      val (bxo, byo) = LumaBlockOrder(bi)
      val gbx = mx * 4 + bxo; val gby = my * 4 + byo
      if ((cbpLuma & (1 << (bi >> 2))) != 0) {
        val tc = src.block(st, CatLuma4x4, scan, 16, gbx, gby, 0)
        st.setNnzY(gbx, gby, tc)
        val rpx = inverse4x4(dequant4x4(unzigzag(scan, 0), qpY, skipDc = false, st.scaling.w4(3)))
        val ax = x0 + bxo * 4; val ay = y0 + byo * 4
        var py = 0
        while (py < 4) {
          var px = 0
          while (px < 4) {
            val o = (ay + py) * lumaW + ax + px
            st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + rpx(py * 4 + px))
            px += 1
          }
          py += 1
        }
      } else st.setNnzY(gbx, gby, 0)
      bi += 1
    }
  }

  /** Chroma residual of an inter MB added onto the MC prediction
    * already in the planes (same 7.3.5.3.3 layout as the intra path —
    * DC levels for both components, then AC blocks — but reconstruction
    * is pred-in-place + residual). */
  private def decodeChromaResidOnPred(src: MbSrc, st: FrameState,
      mx: Int, my: Int, cbpChroma: Int, qpC: Int): Unit = {
    import H264Transform._
    val cW = st.lumaW / 2
    val cx0 = mx * 8; val cy0 = my * 8
    val acScan = new Array[Int](15)
    val dcLv = Array.ofDim[Int](2, 4)
    if (cbpChroma > 0) {
      var c = 0
      while (c < 2) {
        src.block(st, CatChromaDc, dcLv(c), 4, mx * 2, my * 2, c + 1)
        c += 1
      }
    }
    var c = 0
    while (c < 2) {
      val plane = if (c == 0) st.cbPlane else st.crPlane
      val dcd2 = if (cbpChroma > 0) dequantChromaDc(dcLv(c), qpC, st.scaling.w4(4 + c)(0)) else new Array[Int](4)
      var sb = 0
      while (sb < 4) {
        val sbx = sb % 2; val sby = sb / 2
        val gbx = mx * 2 + sbx; val gby = my * 2 + sby
        var resid: Array[Int] = null
        if (cbpChroma == 2) {
          val tc = src.block(st, CatChromaAc, acScan, 15, gbx, gby, c + 1)
          st.setNnzC(c, gbx, gby, tc)
          resid = dequant4x4(unzigzag(acScan, 1), qpC, skipDc = true, st.scaling.w4(4 + c))
        } else {
          st.setNnzC(c, gbx, gby, 0)
          resid = new Array[Int](16)
        }
        resid(0) = dcd2(sby * 2 + sbx)
        val rpx = inverse4x4(resid)
        var py = 0
        while (py < 4) {
          var px = 0
          while (px < 4) {
            val o = (cy0 + sby * 4 + py) * cW + cx0 + sbx * 4 + px
            plane(o) = clipB((plane(o) & 0xff) + rpx(py * 4 + px))
            px += 1
          }
          py += 1
        }
        sb += 1
      }
      c += 1
    }
  }

  /** coded_block_pattern me(v) mapping, intra column of Table 9-5
    * (ChromaArrayType = 1): codeNum -> cbp (luma low 4 bits, chroma
    * high). */
  private[pipeline] val CbpIntraByCodeNum: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  /** cbp -> codeNum, the encoder's inverse of [[CbpIntraByCodeNum]]. */
  private[pipeline] val CbpIntraToCodeNum: Array[Int] = {
    val inv = new Array[Int](48)
    CbpIntraByCodeNum.zipWithIndex.foreach { case (cbp, cn) => inv(cbp) = cn }
    inv
  }

  /** coded_block_pattern me(v) mapping, INTER column of Table 9-5
    * (ChromaArrayType = 1): codeNum -> cbp. Note cbp 0 (uncoded) takes
    * codeNum 0 — the most common inter outcome gets the 1-bit code. */
  private[pipeline] val CbpInterByCodeNum: Array[Int] = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)

  /** cbp -> codeNum, the encoder's inverse of [[CbpInterByCodeNum]]. */
  private[pipeline] val CbpInterToCodeNum: Array[Int] = {
    val inv = new Array[Int](48)
    CbpInterByCodeNum.zipWithIndex.foreach { case (cbp, cn) => inv(cbp) = cn }
    inv
  }

  // ---------------- P-slice motion compensation (8.4) ----------------

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Luma quarter-sample interpolation (8.4.2.2.1): fill `out` (bw x bh)
    * from the reference plane at full-pel (x0, y0) displaced by
    * (mvx, mvy) quarter-pel units. Edge extension by coordinate clipping
    * (the spec's sample clamping); half-pels via the 6-tap
    * (1,-5,20,20,-5,1) filter, quarter-pels by averaging per Figure 8-4. */
  private[pipeline] def mcLuma(ref: Array[Byte], w: Int, h: Int,
      x0: Int, y0: Int, mvx: Int, mvy: Int, bw: Int, bh: Int): Array[Int] = {
    val xi = x0 + (mvx >> 2); val yi = y0 + (mvy >> 2)
    val xf = mvx & 3; val yf = mvy & 3
    def px(x: Int, y: Int): Int =
      ref(clip3(0, h - 1, y) * w + clip3(0, w - 1, x)) & 0xff
    // half-pel intermediates over the (bw+1) x (bh+1) grid around the
    // block so quarter positions can average their two nearest
    def halfH(x: Int, y: Int): Int = { // b at (x, y): horizontal 6-tap
      val v = px(x - 2, y) - 5 * px(x - 1, y) + 20 * px(x, y) +
        20 * px(x + 1, y) - 5 * px(x + 2, y) + px(x + 3, y)
      clip3(0, 255, (v + 16) >> 5)
    }
    def halfV(x: Int, y: Int): Int = { // h at (x, y): vertical 6-tap
      val v = px(x, y - 2) - 5 * px(x, y - 1) + 20 * px(x, y) +
        20 * px(x, y + 1) - 5 * px(x, y + 2) + px(x, y + 3)
      clip3(0, 255, (v + 16) >> 5)
    }
    def halfHRaw(x: Int, y: Int): Int = // un-normalized b1 for j
      px(x - 2, y) - 5 * px(x - 1, y) + 20 * px(x, y) +
        20 * px(x + 1, y) - 5 * px(x + 2, y) + px(x + 3, y)
    def halfC(x: Int, y: Int): Int = { // j at (x, y): 6-tap of raw b1s
      val v = halfHRaw(x, y - 2) - 5 * halfHRaw(x, y - 1) +
        20 * halfHRaw(x, y) + 20 * halfHRaw(x, y + 1) -
        5 * halfHRaw(x, y + 2) + halfHRaw(x, y + 3)
      clip3(0, 255, (v + 512) >> 10)
    }
    val out = new Array[Int](bw * bh)
    var dy = 0
    while (dy < bh) {
      var dx = 0
      while (dx < bw) {
        val x = xi + dx; val y = yi + dy
        val v = (xf, yf) match {
          case (0, 0) => px(x, y)
          case (2, 0) => halfH(x, y)
          case (0, 2) => halfV(x, y)
          case (2, 2) => halfC(x, y)
          case (1, 0) => (px(x, y) + halfH(x, y) + 1) >> 1
          case (3, 0) => (px(x + 1, y) + halfH(x, y) + 1) >> 1
          case (0, 1) => (px(x, y) + halfV(x, y) + 1) >> 1
          case (0, 3) => (px(x, y + 1) + halfV(x, y) + 1) >> 1
          case (2, 1) => (halfH(x, y) + halfC(x, y) + 1) >> 1
          case (2, 3) => (halfC(x, y) + halfH(x, y + 1) + 1) >> 1
          case (1, 2) => (halfV(x, y) + halfC(x, y) + 1) >> 1
          case (3, 2) => (halfC(x, y) + halfV(x + 1, y) + 1) >> 1
          case (1, 1) => (halfH(x, y) + halfV(x, y) + 1) >> 1
          case (3, 1) => (halfH(x, y) + halfV(x + 1, y) + 1) >> 1
          case (1, 3) => (halfH(x, y + 1) + halfV(x, y) + 1) >> 1
          case (3, 3) => (halfH(x, y + 1) + halfV(x + 1, y) + 1) >> 1
          case _ => px(x, y) // unreachable
        }
        out(dy * bw + dx) = v
        dx += 1
      }
      dy += 1
    }
    out
  }

  /** Chroma eighth-sample bilinear interpolation (8.4.2.2.2): the luma
    * MV applies directly — chroma resolution is half, so its units are
    * already 1/8 chroma pel. */
  private[pipeline] def mcChroma(ref: Array[Byte], w: Int, h: Int,
      x0: Int, y0: Int, mvx: Int, mvy: Int, bw: Int, bh: Int): Array[Int] = {
    val xi = x0 + (mvx >> 3); val yi = y0 + (mvy >> 3)
    val xf = mvx & 7; val yf = mvy & 7
    def px(x: Int, y: Int): Int =
      ref(clip3(0, h - 1, y) * w + clip3(0, w - 1, x)) & 0xff
    val out = new Array[Int](bw * bh)
    var dy = 0
    while (dy < bh) {
      var dx = 0
      while (dx < bw) {
        val x = xi + dx; val y = yi + dy
        out(dy * bw + dx) =
          ((8 - xf) * (8 - yf) * px(x, y) + xf * (8 - yf) * px(x + 1, y) +
            (8 - xf) * yf * px(x, y + 1) + xf * yf * px(x + 1, y + 1) + 32) >> 6
        dx += 1
      }
      dy += 1
    }
    out
  }

  /** One motion-vector-prediction neighbor: available = in-frame and
    * already reconstructed this frame; inter = carries a list-0 MV;
    * refIdx = its reference index (-1 when intra/unavailable). */
  private final case class MvNbr(avail: Boolean, inter: Boolean, vx: Int,
      vy: Int, refIdx: Int)

  private def mvNbrAt(st: FrameState, bx: Int, by: Int, list: Int = 0): MvNbr = {
    if (bx < 0 || by < 0 || bx >= st.wMbs * 4 || by >= st.hMbs * 4)
      MvNbr(avail = false, inter = false, 0, 0, -1)
    else {
      val i = st.blkIdx(bx, by)
      if (!st.decodedBlk(i)) MvNbr(avail = false, inter = false, 0, 0, -1)
      else if (list == 0)
        MvNbr(avail = true, st.interBlk(i), st.mvx(i), st.mvy(i),
          st.refIdxBlk(i))
      else // list 1 (B): "inter" = predicts from THIS list (8.4.1.3.1's
        // predFlagLXN; a single-list neighbor contributes (0,0) to the
        // other list's median, exactly like an intra one)
        MvNbr(avail = true, st.refIdx1Blk(i) >= 0,
          if (st.refIdx1Blk(i) >= 0) st.mvx1(i) else 0,
          if (st.refIdx1Blk(i) >= 0) st.mvy1(i) else 0,
          st.refIdx1Blk(i))
    }
  }

  private def median3(a: Int, b: Int, c: Int): Int =
    math.max(math.min(a, b), math.min(math.max(a, b), c))

  /** Median motion-vector predictor (8.4.1.3) for the partition whose
    * top-left 4x4 block is (bx, by), size w4 x h4 blocks, predicting
    * from reference index `refIdx`. `partKind` selects the 16x8/8x16
    * directional shortcuts: 0 = none, 1 = 16x8 top, 2 = 16x8 bottom,
    * 3 = 8x16 left, 4 = 8x16 right — each takes its neighbor only when
    * that neighbor predicts from the SAME reference; likewise the
    * exactly-one-same-refIdx rule. The component-wise median falls back
    * to the neighbors' MVs regardless of refIdx (with (0,0) for
    * unavailable/intra neighbors), per 8.4.1.3.1. */
  private def mvPredict(st: FrameState, bx: Int, by: Int, w4: Int,
      partKind: Int, refIdx: Int, list: Int = 0): (Int, Int) = {
    val a = mvNbrAt(st, bx - 1, by, list)        // left
    val b = mvNbrAt(st, bx, by - 1, list)        // above
    val cRaw = mvNbrAt(st, bx + w4, by - 1, list) // above-right
    val d = mvNbrAt(st, bx - 1, by - 1, list)    // above-left (C's substitute)
    val c = if (cRaw.avail) cRaw else d
    def sameRef(n: MvNbr): Boolean = n.inter && n.refIdx == refIdx
    // directional shortcuts for the two-partition MB shapes (8.4.1.3)
    partKind match {
      case 1 if sameRef(b) => return (b.vx, b.vy) // 16x8 top from above
      case 2 if sameRef(a) => return (a.vx, a.vy) // 16x8 bottom from left
      case 3 if sameRef(a) => return (a.vx, a.vy) // 8x16 left from left
      case 4 if sameRef(c) => return (c.vx, c.vy) // 8x16 right from above-right
      case _ => ()
    }
    // when B, C and D are all unavailable, A alone predicts
    if (!b.avail && !cRaw.avail && !d.avail) return (a.vx, a.vy)
    // exactly one neighbor with the same refIdx -> its MV
    val same = Seq(a, b, c).filter(sameRef)
    if (same.length == 1) (same.head.vx, same.head.vy)
    else (median3(a.vx, b.vx, c.vx), median3(a.vy, b.vy, c.vy))
  }

  /** P_Skip motion vector (8.4.1.1): zero when either edge neighbor is
    * missing or is a zero-MV refIdx-0 block, else the 16x16 median at
    * refIdx 0 (P_Skip always predicts from the most recent reference). */
  private def skipMv(st: FrameState, mx: Int, my: Int): (Int, Int) = {
    val a = mvNbrAt(st, mx * 4 - 1, my * 4)
    val b = mvNbrAt(st, mx * 4, my * 4 - 1)
    if (!a.avail || !b.avail ||
      (a.inter && a.refIdx == 0 && a.vx == 0 && a.vy == 0) ||
      (b.inter && b.refIdx == 0 && b.vx == 0 && b.vy == 0)) (0, 0)
    else mvPredict(st, mx * 4, my * 4, 4, 0, 0)
  }

  /** Motion-compensate one luma partition + both chroma partitions from
    * the reference planes into the current FrameState (prediction only;
    * residual is added by the caller). Applies the slice's explicit
    * weighted prediction when a table is active (8.4.2.3.2). Writes
    * the MV + refIdx grid. */
  private def mcPartition(st: FrameState, ref: FrameState, bx: Int, by: Int,
      w4: Int, h4: Int, vx: Int, vy: Int, refIdx: Int = 0): Unit = {
    // a conformant stream never predicts from an 8.2.5.2-inserted
    // frame (it has no samples); doing so is a defect, not a gap
    if (ref.nonExisting)
      throw new H264Format("inter prediction from a non-existing frame (8.2.5.2)")
    val lumaW = st.lumaW
    val wp = if (st.wpTab != null) st.wpTab(0)(refIdx) else null
    val pl = mcLuma(ref.yPlane, lumaW, st.hMbs * 16, bx * 4, by * 4, vx, vy,
      w4 * 4, h4 * 4)
    var y = 0
    while (y < h4 * 4) {
      var x = 0
      while (x < w4 * 4) {
        val p = pl(y * w4 * 4 + x)
        st.yPlane((by * 4 + y) * lumaW + bx * 4 + x) =
          clipB(if (wp == null) p else st.wpSample(p, wp(0), wp(1), st.wpLogWDy))
        x += 1
      }
      y += 1
    }
    val cW = lumaW / 2
    var c = 0
    while (c < 2) {
      val rp = if (c == 0) ref.cbPlane else ref.crPlane
      val sp = if (c == 0) st.cbPlane else st.crPlane
      val pc = mcChroma(rp, cW, st.hMbs * 8, bx * 2, by * 2, vx, vy,
        w4 * 2, h4 * 2)
      var yy = 0
      while (yy < h4 * 2) {
        var xx = 0
        while (xx < w4 * 2) {
          val p = pc(yy * w4 * 2 + xx)
          sp((by * 2 + yy) * cW + bx * 2 + xx) =
            clipB(if (wp == null) p
            else st.wpSample(p, wp(2 + 2 * c), wp(3 + 2 * c), st.wpLogWDc))
          xx += 1
        }
        yy += 1
      }
      c += 1
    }
    st.setMv(bx, by, w4, h4, vx, vy, inter = true, refIdx = refIdx,
      refUid = ref.uid)
  }

  /** Implicit-bipred weights (8.4.2.3.1, weighted_bipred_idc 2):
    * POC-distance-derived (w0, w1) at logWD 5, with the spec's
    * fallbacks to the default (32, 32). */
  private def implicitBiWeights(pocCur: Int, poc0: Int, poc1: Int): (Int, Int) = {
    if (poc0 == poc1) return (32, 32)
    val tb = clip3(-128, 127, pocCur - poc0)
    val td = clip3(-128, 127, poc1 - poc0)
    val tx = (16384 + math.abs(td / 2)) / td
    val dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
    val w1 = dsf >> 2
    if (w1 < -64 || w1 > 128) (32, 32) else (64 - w1, w1)
  }

  // ---------------- in-loop deblocking filter (8.7) ----------------

  /** Table 8-16 α threshold, indexed by Clip3(0, 51, qpAvg + offsetA). */
  private[pipeline] val DeblockAlpha: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255)

  /** Table 8-16 β threshold, indexed by Clip3(0, 51, qpAvg + offsetB). */
  private[pipeline] val DeblockBeta: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
    17, 17, 18, 18)

  /** Table 8-17 t_C0, [indexA][bS − 1] (bS 1..3). */
  private[pipeline] val DeblockTc0: Array[Array[Int]] = Array(
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 1), Array(0, 0, 1), Array(0, 0, 1),
    Array(0, 0, 1), Array(0, 1, 1), Array(0, 1, 1), Array(1, 1, 1),
    Array(1, 1, 1), Array(1, 1, 1), Array(1, 1, 1), Array(1, 1, 2),
    Array(1, 1, 2), Array(1, 1, 2), Array(1, 1, 2), Array(1, 2, 3),
    Array(1, 2, 3), Array(2, 2, 3), Array(2, 2, 4), Array(2, 3, 4),
    Array(2, 3, 4), Array(3, 3, 5), Array(3, 4, 6), Array(3, 4, 6),
    Array(4, 5, 7), Array(4, 5, 8), Array(5, 6, 9), Array(6, 7, 10),
    Array(6, 8, 11), Array(7, 9, 12), Array(8, 10, 13), Array(9, 12, 15),
    Array(10, 13, 17), Array(11, 15, 20), Array(13, 17, 23), Array(14, 19, 25))

  /** Whole-picture in-loop deblocking (8.7): applied to a FrameState
    * AFTER its slice decodes (intra prediction inside the frame reads
    * unfiltered samples; the FILTERED picture is what gets output and
    * referenced), edges in spec order — per MB in raster order, all
    * vertical edges left-to-right then all horizontal top-to-bottom,
    * in place, so later edges see earlier edges' filtered samples.
    * Boundary strength per 8.7.2.1 (intra MB edge 4, intra 3, coded
    * residual 2, motion discontinuity ≥ 1 quarter-pel×4 or different
    * refs 1, else 0) from the FrameState's own nnz/motion/intra/QP
    * grids. The encoder applies the SAME function to its
    * reconstruction, so encode/decode parity is plane-exact.
    * `offA`/`offB` are the slice header's FilterOffsetA/B (already
    * doubled). */
  private def deblockFrame(st: FrameState, offA: Int, offB: Int): Unit = {
    import H264Transform.chromaQp
    val W = st.lumaW
    val cW = W / 2
    val wMbs = st.wMbs; val hMbs = st.hMbs
    def mbIntra(mx: Int, my: Int): Boolean = st.intraMbArr(my * wMbs + mx)
    def mbQp(mx: Int, my: Int): Int = st.qpMb(my * wMbs + mx)
    // "block contains coded coefficients" for bS 2: a transform-8x8
    // MB's unit is the 8x8 block (its interleaved 4x4 TotalCoeff cells
    // can be individually zero while the 8x8 coded)
    def codedAt(bx: Int, by: Int): Boolean =
      if (st.t8x8MbArr((by >> 2) * wMbs + (bx >> 2))) {
        val b8x = bx & ~1; val b8y = by & ~1
        st.nnzYAt(b8x, b8y) > 0 || st.nnzYAt(b8x + 1, b8y) > 0 ||
          st.nnzYAt(b8x, b8y + 1) > 0 || st.nnzYAt(b8x + 1, b8y + 1) > 0
      } else st.nnzYAt(bx, by) > 0
    // bS between neighboring luma 4x4 blocks P and Q (8.7.2.1)
    def bs(bxP: Int, byP: Int, bxQ: Int, byQ: Int, mbEdge: Boolean): Int = {
      val pIntra = mbIntra(bxP / 4, byP / 4)
      val qIntra = mbIntra(bxQ / 4, byQ / 4)
      if ((pIntra || qIntra) && mbEdge) 4
      else if (pIntra || qIntra) 3
      else if (codedAt(bxP, byP) || codedAt(bxQ, byQ)) 2
      else {
        // motion discontinuity (8.7.2.1): compare by reference PICTURE
        // (uid), not list index — a picture can sit in both B lists at
        // different indices, and list-swapped identical prediction is
        // NOT a discontinuity
        val i = st.blkIdx(bxP, byP); val j = st.blkIdx(bxQ, byQ)
        val p0 = st.refUidBlk(i); val p1 = st.refUid1Blk(i)
        val q0 = st.refUidBlk(j); val q1 = st.refUid1Blk(j)
        val pN = (if (p0 >= 0) 1 else 0) + (if (p1 >= 0) 1 else 0)
        val qN = (if (q0 >= 0) 1 else 0) + (if (q1 >= 0) 1 else 0)
        def far(ax: Int, ay: Int, bx: Int, by: Int): Boolean =
          math.abs(ax - bx) >= 4 || math.abs(ay - by) >= 4
        if (pN != qN) 1 // different number of motion vectors
        else if (pN == 1) {
          val (pp, pvx, pvy) =
            if (p0 >= 0) (p0, st.mvx(i), st.mvy(i)) else (p1, st.mvx1(i), st.mvy1(i))
          val (qq, qvx, qvy) =
            if (q0 >= 0) (q0, st.mvx(j), st.mvy(j)) else (q1, st.mvx1(j), st.mvy1(j))
          if (pp != qq || far(pvx, pvy, qvx, qvy)) 1 else 0
        } else {
          // two MVs each: pictures must match as a multiset, and the
          // per-picture vector pairs must stay within a quarter-pel 4
          if (!((p0 == q0 && p1 == q1) || (p0 == q1 && p1 == q0))) 1
          else if (p0 == p1) {
            // both predictions from ONE picture: bS 0 if EITHER pairing
            // of the two vectors stays close (8.7.2.1's special case)
            val straight = !far(st.mvx(i), st.mvy(i), st.mvx(j), st.mvy(j)) &&
              !far(st.mvx1(i), st.mvy1(i), st.mvx1(j), st.mvy1(j))
            val crossed = !far(st.mvx(i), st.mvy(i), st.mvx1(j), st.mvy1(j)) &&
              !far(st.mvx1(i), st.mvy1(i), st.mvx(j), st.mvy(j))
            if (straight || crossed) 0 else 1
          } else {
            // align Q's vectors to P's pictures
            val (qx0, qy0, qx1, qy1) =
              if (q0 == p0) (st.mvx(j), st.mvy(j), st.mvx1(j), st.mvy1(j))
              else (st.mvx1(j), st.mvy1(j), st.mvx(j), st.mvy(j))
            if (far(st.mvx(i), st.mvy(i), qx0, qy0) ||
              far(st.mvx1(i), st.mvy1(i), qx1, qy1)) 1
            else 0
          }
        }
      }
    }
    // filter one sample line across an edge: q0 at flat index `q0i`,
    // `d` = step toward q3 (−d toward p3); every output is computed
    // from the line's INPUT samples (8.7.2.3/8.7.2.4)
    def filterLine(plane: Array[Byte], q0i: Int, d: Int, bS: Int,
        idxA: Int, idxB: Int, chromaEdge: Boolean): Unit = {
      val alpha = DeblockAlpha(idxA); val beta = DeblockBeta(idxB)
      val p0 = plane(q0i - d) & 0xff; val q0 = plane(q0i) & 0xff
      val p1 = plane(q0i - 2 * d) & 0xff; val q1 = plane(q0i + d) & 0xff
      if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
        math.abs(q1 - q0) >= beta) return
      if (bS < 4) {
        val tc0 = DeblockTc0(idxA)(bS - 1)
        if (chromaEdge) {
          val tc = tc0 + 1
          val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
          plane(q0i - d) = clipB(p0 + delta)
          plane(q0i) = clipB(q0 - delta)
        } else {
          val p2 = plane(q0i - 3 * d) & 0xff; val q2 = plane(q0i + 2 * d) & 0xff
          val ap = math.abs(p2 - p0); val aq = math.abs(q2 - q0)
          val tc = tc0 + (if (ap < beta) 1 else 0) + (if (aq < beta) 1 else 0)
          val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
          if (ap < beta)
            plane(q0i - 2 * d) = clipB(p1 +
              clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1))
          if (aq < beta)
            plane(q0i + d) = clipB(q1 +
              clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1))
          plane(q0i - d) = clipB(p0 + delta)
          plane(q0i) = clipB(q0 - delta)
        }
      } else { // bS == 4 (8.7.2.4)
        if (chromaEdge) {
          plane(q0i - d) = clipB((2 * p1 + p0 + q1 + 2) >> 2)
          plane(q0i) = clipB((2 * q1 + q0 + p1 + 2) >> 2)
        } else {
          val p2 = plane(q0i - 3 * d) & 0xff; val q2 = plane(q0i + 2 * d) & 0xff
          val p3 = plane(q0i - 4 * d) & 0xff; val q3 = plane(q0i + 3 * d) & 0xff
          val ap = math.abs(p2 - p0); val aq = math.abs(q2 - q0)
          val strong = math.abs(p0 - q0) < (alpha >> 2) + 2
          if (ap < beta && strong) {
            plane(q0i - d) = clipB((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
            plane(q0i - 2 * d) = clipB((p2 + p1 + p0 + q0 + 2) >> 2)
            plane(q0i - 3 * d) = clipB((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
          } else plane(q0i - d) = clipB((2 * p1 + p0 + q1 + 2) >> 2)
          if (aq < beta && strong) {
            plane(q0i) = clipB((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
            plane(q0i + d) = clipB((q2 + q1 + q0 + p0 + 2) >> 2)
            plane(q0i + 2 * d) = clipB((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)
          } else plane(q0i) = clipB((2 * q1 + q0 + p1 + 2) >> 2)
        }
      }
    }
    def idxAB(qpAvg: Int): (Int, Int) =
      (clip3(0, 51, qpAvg + offA), clip3(0, 51, qpAvg + offB))
    var my = 0
    while (my < hMbs) {
      var mx = 0
      while (mx < wMbs) {
        val qpQ = mbQp(mx, my)
        // transform-8x8 MBs filter only 8x8-aligned internal luma
        // edges (8.7: transform_size_8x8_flag drops e = 1, 3)
        val t8 = st.t8x8MbArr(my * wMbs + mx)
        // ---- vertical edges, left to right (luma x = 0,4,8,12)
        var e = 0
        while (e < 4) {
          if ((e > 0 || mx > 0) && !(t8 && (e & 1) == 1)) {
            val x = mx * 16 + e * 4
            val bxQ = mx * 4 + e; val bxP = bxQ - 1
            var seg = 0
            while (seg < 4) {
              val by = my * 4 + seg
              val s = bs(bxP, by, bxQ, by, mbEdge = e == 0)
              if (s > 0) {
                val qpP = mbQp(bxP / 4, my)
                val (ia, ib) = idxAB((qpP + qpQ + 1) >> 1)
                var row = 0
                while (row < 4) {
                  filterLine(st.yPlane, (my * 16 + seg * 4 + row) * W + x, 1,
                    s, ia, ib, chromaEdge = false)
                  row += 1
                }
              }
              seg += 1
            }
          }
          e += 1
        }
        // chroma vertical edges (cx = 0, 4 — luma e = 0, 2); bS comes
        // from the co-located luma block pair, per sample row
        var ce = 0
        while (ce < 2) {
          val lumaE = ce * 2
          if (lumaE > 0 || mx > 0) {
            val cx = mx * 8 + ce * 4
            val bxQ = mx * 4 + lumaE; val bxP = bxQ - 1
            var cy = my * 8
            while (cy < my * 8 + 8) {
              val byBlk = cy / 2
              val s = bs(bxP, byBlk, bxQ, byBlk, mbEdge = lumaE == 0)
              if (s > 0) {
                val qpP = st.cQp(mbQp(bxP / 4, my))
                val (ia, ib) = idxAB((qpP + st.cQp(qpQ) + 1) >> 1)
                filterLine(st.cbPlane, cy * cW + cx, 1, s, ia, ib, chromaEdge = true)
                filterLine(st.crPlane, cy * cW + cx, 1, s, ia, ib, chromaEdge = true)
              }
              cy += 1
            }
          }
          ce += 1
        }
        // ---- horizontal edges, top to bottom (luma y = 0,4,8,12)
        e = 0
        while (e < 4) {
          if ((e > 0 || my > 0) && !(t8 && (e & 1) == 1)) {
            val y = my * 16 + e * 4
            val byQ = my * 4 + e; val byP = byQ - 1
            var seg = 0
            while (seg < 4) {
              val bx = mx * 4 + seg
              val s = bs(bx, byP, bx, byQ, mbEdge = e == 0)
              if (s > 0) {
                val qpP = mbQp(mx, byP / 4)
                val (ia, ib) = idxAB((qpP + qpQ + 1) >> 1)
                var col = 0
                while (col < 4) {
                  filterLine(st.yPlane, y * W + mx * 16 + seg * 4 + col, W,
                    s, ia, ib, chromaEdge = false)
                  col += 1
                }
              }
              seg += 1
            }
          }
          e += 1
        }
        // chroma horizontal edges (cy = 0, 4 — luma e = 0, 2)
        ce = 0
        while (ce < 2) {
          val lumaE = ce * 2
          if (lumaE > 0 || my > 0) {
            val cy = my * 8 + ce * 4
            val byQ = my * 4 + lumaE; val byP = byQ - 1
            var cx = mx * 8
            while (cx < mx * 8 + 8) {
              val bxBlk = cx / 2
              val s = bs(bxBlk, byP, bxBlk, byQ, mbEdge = lumaE == 0)
              if (s > 0) {
                val qpP = st.cQp(mbQp(mx, byP / 4))
                val (ia, ib) = idxAB((qpP + st.cQp(qpQ) + 1) >> 1)
                filterLine(st.cbPlane, cy * cW + cx, cW, s, ia, ib, chromaEdge = true)
                filterLine(st.crPlane, cy * cW + cx, cW, s, ia, ib, chromaEdge = true)
              }
              cx += 1
            }
          }
          ce += 1
        }
        mx += 1
      }
      my += 1
    }
  }

  /** Whether the top-right 4x4 neighbor of luma4x4BlkIdx `bi` precedes
    * it in decode order (8.3.1.2's availability, the within-MB half —
    * frame-boundary checks are the caller's). For top-row blocks the
    * top-right pixels live in an already-decoded MB row, so true. */
  private val I4TopRightInOrder: Array[Boolean] = Array(
    true, true, true, false, true, true, true, false,
    true, true, true, false, true, false, true, false)

  /** Per-frame reconstruction state: planes + the per-4x4-block
    * TotalCoeff grids CAVLC's nC context derivation needs (9.2.1). */
  private final class FrameState(val wMbs: Int, val hMbs: Int) {
    val lumaW: Int = wMbs * 16
    val yPlane = new Array[Byte](lumaW * hMbs * 16)
    val cbPlane = new Array[Byte](lumaW * hMbs * 16 / 4)
    val crPlane = new Array[Byte](lumaW * hMbs * 16 / 4)
    /** TotalCoeff per luma 4x4 block (grid wMbs*4 x hMbs*4). */
    val nnzY = new Array[Int](wMbs * 4 * hMbs * 4)
    /** TotalCoeff per chroma 4x4 block, per component (wMbs*2 x hMbs*2). */
    val nnzC = Array.fill(2)(new Array[Int](wMbs * 2 * hMbs * 2))
    /** Intra4x4PredMode per luma 4x4 block; -1 = the block's MB is not
      * Intra_4x4 (I_PCM / Intra_16x16), which predicts as DC (8.3.1.1). */
    val i4Mode: Array[Int] = Array.fill(wMbs * 4 * hMbs * 4)(-1)
    // ---- P-slice motion state (per luma 4x4 block; untouched by
    // I-slice decode). mv* in quarter-pel units; inter(b) = the block
    // belongs to an inter-predicted partition (refIdx 0 — single
    // reference); dec(b) = the block's partition is already
    // reconstructed this frame (8.4.1.3's decode-order availability).
    /** Display order (PicOrderCnt) — drives B reference-list ordering. */
    var poc: Int = 0
    /** frame_num of this picture (8.2.4.1 PicNum for short-term
      * reference selection in ref_pic_list_modification). */
    var frameNum: Int = 0
    /** LongTermFrameIdx when this picture is marked long-term (8.2.5.4
      * MMCO 3/6 or the IDR long_term_reference_flag); -1 = short-term
      * or non-reference. For frame coding LongTermPicNum == this. */
    var longTermIdx: Int = -1
    /** 8.2.5.2 "non-existing" frame inserted to fill a conformant
      * frame_num gap: it occupies a DPB slot (PicNum/FrameNumWrap and
      * sliding-window accounting see it) but carries no samples — any
      * inter prediction FROM it is a stream defect and throws. */
    var nonExisting: Boolean = false
    /** dec_ref_pic_marking outcome parsed from THIS picture's slice
      * header, consumed by the GopDecoder's DPB update after decode:
      * the IDR long_term_reference_flag, and the adaptive MMCO list as
      * (op, arg1, arg2) in stream order (7.4.3.3). */
    var idrLongTerm: Boolean = false
    var mmcoOps: List[(Int, Int, Int)] = Nil
    /** Per-MB intra flag + decode QP — the 8.7.2.1 boundary-strength
      * and 8.7.2.2 threshold inputs (I_PCM counts as QP 0 in the
      * filter, which disables it over PCM content — lossless stays
      * lossless). */
    val intraMbArr = new Array[Boolean](wMbs * hMbs)
    val qpMb = new Array[Int](wMbs * hMbs)
    def markMb(mx: Int, my: Int, intra: Boolean, qp: Int): Unit = {
      intraMbArr(my * wMbs + mx) = intra
      qpMb(my * wMbs + mx) = qp
    }
    // ---- CABAC bookkeeping (per MB): coding kind, coded block
    // pattern, chroma pred mode, and the DC coded_block_flags — the
    // 9.3.3.1.1.x neighbor context inputs. Maintained by the CABAC
    // paths (and markPcm); the CAVLC paths don't consult them.
    val i4MbArr = new Array[Boolean](wMbs * hMbs)
    val i16MbArr = new Array[Boolean](wMbs * hMbs)
    val pcmMbArr = new Array[Boolean](wMbs * hMbs)
    val cbpLumaMb = new Array[Int](wMbs * hMbs)
    val cbpChromaMb = new Array[Int](wMbs * hMbs)
    val chromaModeMb = new Array[Int](wMbs * hMbs)
    val cbfLumaDcMb = new Array[Boolean](wMbs * hMbs)
    val cbfChromaDcMb = Array.fill(2)(new Array[Boolean](wMbs * hMbs))
    // P/B CABAC neighbor inputs: per-MB skip (9.3.3.1.1.1) and
    // B_Skip/B_Direct_16x16 (9.3.3.1.1.3 / .6) flags, and per-block
    // per-list |mvd| components (9.3.3.1.1.7). Written by the CABAC
    // P/B paths on BOTH sides (the encoder mirrors the decoder's
    // grids, so context increments agree bit-for-bit).
    val skipMbArr = new Array[Boolean](wMbs * hMbs)
    val bDirectMbArr = new Array[Boolean](wMbs * hMbs)
    /** Per-4x4-block direct flag (whole-MB direct/skip AND
      * B_Direct_8x8 subs) — the 9.3.3.1.1.6 ref_idx neighbor rule
      * excludes direct partitions at block granularity. */
    val directBlk = new Array[Boolean](wMbs * 4 * hMbs * 4)
    /** PPS chroma_qp_index_offset in effect for this picture. */
    var cqpOff: Int = 0
    /** Scaling matrices in effect (8.5.9): flat unless the SPS/PPS
      * carry custom quant matrices (r15 CQM). Every dequant site reads
      * the list this picks, so a missed encoder-side bind shows up as
      * a loud parity failure, never a silent mis-decode. */
    var scaling: ScalingLists = ScalingLists.Flat
    /** QPc for a luma QP under this picture's chroma offset (8.5.8). */
    def cQp(qpY: Int): Int =
      H264Transform.chromaQp(math.max(0, math.min(51, qpY + cqpOff)))
    /** Per-MB transform_size_8x8_flag — the 8.7 filter skips internal
      * luma edges off the 8x8 grid for these MBs, and treats the 8x8
      * block as the coded-coefficients unit in the bS test. */
    val t8x8MbArr = new Array[Boolean](wMbs * hMbs)
    /** PPS transform_8x8_mode_flag in effect (high profile). */
    var t8x8Allowed: Boolean = false
    // ---- weighted prediction (8.4.2.3), per slice ----
    /** Explicit WP table: [list][refIdx][wY, oY, wCb, oCb, wCr, oCr];
      * null = no explicit weighting in effect. */
    var wpTab: Array[Array[Array[Int]]] = null
    var wpLogWDy = 0
    var wpLogWDc = 0
    /** Implicit B biprediction (weighted_bipred_idc 2): POC-distance
      * weights on bipredicted partitions, default on single-list. */
    var wpImplicit = false
    /** Weighted single-list sample (8.4.2.3.2). */
    def wpSample(p: Int, w: Int, o: Int, logWD: Int): Int =
      if (logWD >= 1) ((p * w + (1 << (logWD - 1))) >> logWD) + o
      else p * w + o
    val mvdBlk = Array.fill(2, 2)(new Array[Int](wMbs * 4 * hMbs * 4)) // [list][comp]
    /** Record a partition's decoded mvd (CABAC neighbor input). */
    def noteMvd(bx: Int, by: Int, w4: Int, h4: Int, list: Int,
        dx: Int, dy: Int): Unit = {
      var y = by
      while (y < by + h4) {
        var x = bx
        while (x < bx + w4) {
          mvdBlk(list)(0)(blkIdx(x, y)) = dx
          mvdBlk(list)(1)(blkIdx(x, y)) = dy
          x += 1
        }
        y += 1
      }
    }
    /** Record a partition's decoded ref_idx ahead of its motion
      * compensation — the CABAC ref_idx context of a later partition
      * in the SAME macroblock reads it (7.3.5.1 puts all ref_idx
      * fields before any mvd, so the neighbor's setMv hasn't run
      * yet). The later setMv/setMvB overwrites with the same value. */
    def noteRefIdx(bx: Int, by: Int, w4: Int, h4: Int, list: Int,
        ri: Int): Unit = {
      val grid = if (list == 0) refIdxBlk else refIdx1Blk
      var y = by
      while (y < by + h4) {
        var x = bx
        while (x < bx + w4) { grid(blkIdx(x, y)) = ri; x += 1 }
        y += 1
      }
    }
    // per-list motion grids: list 0 (P and B) and list 1 (B only);
    // refIdx -1 = the block does not predict from that list (intra, or
    // a single-list B partition) — 8.4.1.3's "refIdxLXN = -1" marker
    val mvx = new Array[Int](wMbs * 4 * hMbs * 4)
    val mvy = new Array[Int](wMbs * 4 * hMbs * 4)
    val interBlk = new Array[Boolean](wMbs * 4 * hMbs * 4) // predFlagL0
    val decodedBlk = new Array[Boolean](wMbs * 4 * hMbs * 4)
    val refIdxBlk = new Array[Int](wMbs * 4 * hMbs * 4)
    val mvx1 = new Array[Int](wMbs * 4 * hMbs * 4)
    val mvy1 = new Array[Int](wMbs * 4 * hMbs * 4)
    val refIdx1Blk: Array[Int] = Array.fill(wMbs * 4 * hMbs * 4)(-1)
    /** Frame identity for the 8.7.2.1 same-reference-PICTURE test (a
      * picture can sit in both B lists at different indices, so index
      * equality is not picture equality). */
    val uid: Long = FrameState.nextUid.getAndIncrement()
    val refUidBlk: Array[Long] = Array.fill(wMbs * 4 * hMbs * 4)(-1L)
    val refUid1Blk: Array[Long] = Array.fill(wMbs * 4 * hMbs * 4)(-1L)
    def blkIdx(bx: Int, by: Int): Int = by * wMbs * 4 + bx
    /** Mark a partition's 4x4 blocks with its list-0 motion vector +
      * refIdx (clearing list 1 — the P-slice and intra form). */
    def setMv(bx: Int, by: Int, w4: Int, h4: Int, vx: Int, vy: Int,
        inter: Boolean, refIdx: Int = 0, refUid: Long = -1L): Unit = {
      var y = by
      while (y < by + h4) {
        var x = bx
        while (x < bx + w4) {
          val i = blkIdx(x, y)
          mvx(i) = vx; mvy(i) = vy; interBlk(i) = inter; decodedBlk(i) = true
          refIdxBlk(i) = if (inter) refIdx else -1
          refUidBlk(i) = if (inter) refUid else -1L
          mvx1(i) = 0; mvy1(i) = 0; refIdx1Blk(i) = -1; refUid1Blk(i) = -1L
          x += 1
        }
        y += 1
      }
    }
    /** Mark a B partition's blocks with per-list motion: `v0`/`v1` =
      * Some((vx, vy, refIdx)) when the partition predicts from that
      * list. */
    def setMvB(bx: Int, by: Int, w4: Int, h4: Int,
        v0: Option[(Int, Int, Int)], v1: Option[(Int, Int, Int)],
        uid0: Long = -1L, uid1: Long = -1L): Unit = {
      var y = by
      while (y < by + h4) {
        var x = bx
        while (x < bx + w4) {
          val i = blkIdx(x, y)
          decodedBlk(i) = true
          v0 match {
            case Some((vx, vy, ri)) =>
              mvx(i) = vx; mvy(i) = vy; interBlk(i) = true; refIdxBlk(i) = ri
              refUidBlk(i) = uid0
            case None =>
              mvx(i) = 0; mvy(i) = 0; interBlk(i) = false; refIdxBlk(i) = -1
              refUidBlk(i) = -1L
          }
          v1 match {
            case Some((vx, vy, ri)) =>
              mvx1(i) = vx; mvy1(i) = vy; refIdx1Blk(i) = ri
              refUid1Blk(i) = uid1
            case None =>
              mvx1(i) = 0; mvy1(i) = 0; refIdx1Blk(i) = -1; refUid1Blk(i) = -1L
          }
          x += 1
        }
        y += 1
      }
    }

    def setI4Mode(bx: Int, by: Int, m: Int): Unit = i4Mode(by * wMbs * 4 + bx) = m
    /** Predicted Intra_4x4 mode (8.3.1.1): DC when either neighbor
      * block is outside the picture, else min over the neighbors with
      * non-Intra_4x4 neighbors counting as DC (2). */
    def predI4Mode(bx: Int, by: Int): Int = {
      if (bx == 0 || by == 0) 2
      else {
        val a = i4Mode(by * wMbs * 4 + bx - 1)
        val b = i4Mode((by - 1) * wMbs * 4 + bx)
        math.min(if (a < 0) 2 else a, if (b < 0) 2 else b)
      }
    }

    def nnzYAt(bx: Int, by: Int): Int = nnzY(by * wMbs * 4 + bx)
    def setNnzY(bx: Int, by: Int, v: Int): Unit = nnzY(by * wMbs * 4 + bx) = v
    def nnzCAt(c: Int, bx: Int, by: Int): Int = nnzC(c)(by * wMbs * 2 + bx)
    def setNnzC(c: Int, bx: Int, by: Int, v: Int): Unit = nnzC(c)(by * wMbs * 2 + bx) = v

    /** nC for a luma block (9.2.1): mean of available neighbors. */
    def lumaNc(bx: Int, by: Int): Int = {
      val a = if (bx > 0) nnzYAt(bx - 1, by) else -1
      val b = if (by > 0) nnzYAt(bx, by - 1) else -1
      if (a >= 0 && b >= 0) (a + b + 1) >> 1 else if (a >= 0) a else if (b >= 0) b else 0
    }
    def chromaNc(c: Int, bx: Int, by: Int): Int = {
      val a = if (bx > 0) nnzCAt(c, bx - 1, by) else -1
      val b = if (by > 0) nnzCAt(c, bx, by - 1) else -1
      if (a >= 0 && b >= 0) (a + b + 1) >> 1 else if (a >= 0) a else if (b >= 0) b else 0
    }
    def markPcm(mx: Int, my: Int): Unit = {
      for (y <- 0 until 4; x <- 0 until 4) setNnzY(mx * 4 + x, my * 4 + y, 16)
      for (c <- 0 until 2; y <- 0 until 2; x <- 0 until 2)
        setNnzC(c, mx * 2 + x, my * 2 + y, 16)
    }
  }

  private object FrameState {
    val nextUid = new java.util.concurrent.atomic.AtomicLong(0)
  }

  private def clipB(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** un-zigzag a 16-coeff scan (offset 1 skips the DC slot for AC-only
    * 15-coeff blocks) into a raster 4x4. */
  private def unzigzag(scan: Array[Int], offset: Int): Array[Int] = {
    val out = new Array[Int](16)
    var k = 0
    while (k < scan.length) {
      out(H264Transform.Zigzag4x4(k + offset)) = scan(k)
      k += 1
    }
    out
  }

  /** Decode one Intra_16x16 macroblock's residual and reconstruct it
    * (8.3.3 prediction + 9.2 CAVLC + 8.5 transforms). */
  private def decodeIntra16x16(src: MbSrc, st: FrameState, mx: Int, my: Int,
      predMode: Int, chromaMode: Int, cbpLuma: Int, cbpChroma: Int, qpY: Int): Unit = {
    import H264Transform._
    val lumaW = st.lumaW
    val x0 = mx * 16; val y0 = my * 16
    // ---- luma prediction from reconstructed neighbors
    val top = if (my > 0) Array.tabulate(16)(i => st.yPlane((y0 - 1) * lumaW + x0 + i) & 0xff) else null
    val left = if (mx > 0) Array.tabulate(16)(i => st.yPlane((y0 + i) * lumaW + x0 - 1) & 0xff) else null
    val tl = if (mx > 0 && my > 0) st.yPlane((y0 - 1) * lumaW + x0 - 1) & 0xff else 0
    val pred = predLuma16x16(predMode, top, left, tl)
    // ---- luma residual
    val dcScan = new Array[Int](16)
    src.block(st, CatLumaDc, dcScan, 16, mx * 4, my * 4, 0)
    val dcd = dequantLumaDc(unzigzag(dcScan, 0), qpY, st.scaling.w4(0)(0))
    val acScan = new Array[Int](15)
    var bi = 0
    while (bi < 16) {
      val (bxo, byo) = LumaBlockOrder(bi)
      val gbx = mx * 4 + bxo; val gby = my * 4 + byo
      var resid: Array[Int] = null
      if (cbpLuma != 0) {
        val tc = src.block(st, CatLumaAc, acScan, 15, gbx, gby, 0)
        st.setNnzY(gbx, gby, tc)
        resid = dequant4x4(unzigzag(acScan, 1), qpY, skipDc = true, st.scaling.w4(0))
      } else {
        st.setNnzY(gbx, gby, 0)
        resid = new Array[Int](16)
      }
      resid(0) = dcd(byo * 4 + bxo)
      val rpx = inverse4x4(resid)
      var py = 0
      while (py < 4) {
        var px = 0
        while (px < 4) {
          val fx = bxo * 4 + px; val fy = byo * 4 + py
          st.yPlane((y0 + fy) * lumaW + x0 + fx) =
            clipB(pred(fy * 16 + fx) + rpx(py * 4 + px))
          px += 1
        }
        py += 1
      }
      bi += 1
    }
    // ---- chroma (shared with the Intra_4x4 path)
    decodeChromaResid(src, st, mx, my, chromaMode, cbpChroma, st.cQp(qpY))
  }

  /** Decode one macroblock's chroma residual and reconstruct both 8x8
    * planes (7.3.5.3.3 ordering: DC levels for BOTH components, then AC
    * blocks per component) — shared by the Intra_16x16 and Intra_4x4
    * paths, whose chroma syntax is identical. */
  private def decodeChromaResid(src: MbSrc, st: FrameState, mx: Int, my: Int,
      chromaMode: Int, cbpChroma: Int, qpC: Int): Unit = {
    import H264Transform._
    val cW = st.lumaW / 2
    val cx0 = mx * 8; val cy0 = my * 8
    val acScan = new Array[Int](15)
    val dcLv = Array.ofDim[Int](2, 4)
    if (cbpChroma > 0) {
      var c = 0
      while (c < 2) {
        val buf = new Array[Int](4)
        src.block(st, CatChromaDc, buf, 4, mx * 2, my * 2, c + 1)
        dcLv(c) = buf
        c += 1
      }
    }
    var c = 0
    while (c < 2) {
      val plane = if (c == 0) st.cbPlane else st.crPlane
      val ctop = if (my > 0) Array.tabulate(8)(i => plane((cy0 - 1) * cW + cx0 + i) & 0xff) else null
      val cleft = if (mx > 0) Array.tabulate(8)(i => plane((cy0 + i) * cW + cx0 - 1) & 0xff) else null
      val ctl = if (mx > 0 && my > 0) plane((cy0 - 1) * cW + cx0 - 1) & 0xff else 0
      val cpred = predChroma8x8(chromaMode, ctop, cleft, ctl)
      val dcd2 = if (cbpChroma > 0) dequantChromaDc(dcLv(c), qpC, st.scaling.w4(1 + c)(0)) else new Array[Int](4)
      var sb = 0
      while (sb < 4) {
        val sbx = sb % 2; val sby = sb / 2
        val gbx = mx * 2 + sbx; val gby = my * 2 + sby
        var resid: Array[Int] = null
        if (cbpChroma == 2) {
          val tc = src.block(st, CatChromaAc, acScan, 15, gbx, gby, c + 1)
          st.setNnzC(c, gbx, gby, tc)
          resid = dequant4x4(unzigzag(acScan, 1), qpC, skipDc = true, st.scaling.w4(1 + c))
        } else {
          st.setNnzC(c, gbx, gby, 0)
          resid = new Array[Int](16)
        }
        resid(0) = dcd2(sby * 2 + sbx)
        val rpx = inverse4x4(resid)
        var py = 0
        while (py < 4) {
          var px = 0
          while (px < 4) {
            val fx = sbx * 4 + px; val fy = sby * 4 + py
            plane((cy0 + fy) * cW + cx0 + fx) =
              clipB(cpred(fy * 8 + fx) + rpx(py * 4 + px))
            px += 1
          }
          py += 1
        }
        sb += 1
      }
      c += 1
    }
  }

  /** Reconstructed neighbor samples for the luma 4x4 block at pixel
    * (ax, ay), block index `bi` in decode order: (top8, left4, tl) with
    * the 8.3.1.2 top-right substitution (p[4..7,−1] := p[3,−1] when the
    * above-right block is outside the frame or later in decode order).
    * Null sides mean unavailable. */
  private def luma4x4Neighbors(st: FrameState, ax: Int, ay: Int, bi: Int)
      : (Array[Int], Array[Int], Int) = {
    val lumaW = st.lumaW
    val top =
      if (ay > 0) {
        val trOk = I4TopRightInOrder(bi) && ax + 4 < lumaW
        Array.tabulate(8) { i =>
          if (i < 4 || trOk) st.yPlane((ay - 1) * lumaW + ax + i) & 0xff
          else st.yPlane((ay - 1) * lumaW + ax + 3) & 0xff
        }
      } else null
    val left =
      if (ax > 0) Array.tabulate(4)(i => st.yPlane((ay + i) * lumaW + ax - 1) & 0xff)
      else null
    val tl = if (ax > 0 && ay > 0) st.yPlane((ay - 1) * lumaW + ax - 1) & 0xff else 0
    (top, left, tl)
  }

  /** Decode + reconstruct the 16 luma blocks of an Intra_4x4 macroblock
    * (8.3.1 prediction interleaved with 8.5 residual reconstruction in
    * decode order — block k's prediction reads neighbors reconstructed
    * earlier in the same MB). Full 16-coefficient CAVLC blocks, one per
    * 4x4 with its 8x8 group's CBP bit set; DC rides in the block (no
    * separate Hadamard plane, unlike Intra_16x16). */
  private def decodeIntra4x4Luma(src: MbSrc, st: FrameState, mx: Int, my: Int,
      modes: Array[Int], cbpLuma: Int, qpY: Int): Unit = {
    import H264Transform._
    val lumaW = st.lumaW
    val x0 = mx * 16; val y0 = my * 16
    val scan = new Array[Int](16)
    var bi = 0
    while (bi < 16) {
      val (bxo, byo) = LumaBlockOrder(bi)
      val gbx = mx * 4 + bxo; val gby = my * 4 + byo
      val ax = x0 + bxo * 4; val ay = y0 + byo * 4
      val (top, left, tl) = luma4x4Neighbors(st, ax, ay, bi)
      val pred = predLuma4x4(modes(bi), top, left, tl)
      var resid: Array[Int] = null
      if ((cbpLuma & (1 << (bi >> 2))) != 0) {
        val tc = src.block(st, CatLuma4x4, scan, 16, gbx, gby, 0)
        st.setNnzY(gbx, gby, tc)
        resid = dequant4x4(unzigzag(scan, 0), qpY, skipDc = false, st.scaling.w4(0))
      } else {
        st.setNnzY(gbx, gby, 0)
        resid = new Array[Int](16)
      }
      val rpx = inverse4x4(resid)
      var py = 0
      while (py < 4) {
        var px = 0
        while (px < 4) {
          st.yPlane((ay + py) * lumaW + ax + px) =
            clipB(pred(py * 4 + px) + rpx(py * 4 + px))
          px += 1
        }
        py += 1
      }
      bi += 1
    }
  }

  // ---------------- Intra_8x8 (high profile, 8.3.2 + 8.5.12-13) ----------------

  /** Does the 8x8 block at (ax8, ay8) decode before (cx8, cy8)?
    * Raster MB order, then z-order within the MB — the top-right
    * reference availability test of 8.3.2.1. */
  private def blk8Before(ax8: Int, ay8: Int, cx8: Int, cy8: Int,
      wMbs: Int): Boolean = {
    val aMb = (ay8 >> 1) * wMbs + (ax8 >> 1)
    val cMb = (cy8 >> 1) * wMbs + (cx8 >> 1)
    if (aMb != cMb) aMb < cMb
    else ((ay8 & 1) * 2 + (ax8 & 1)) < ((cy8 & 1) * 2 + (cx8 & 1))
  }

  /** Intra_8x8 prediction for the 8x8 luma block at global 8x8-grid
    * (gx8, gy8): assembles the 8.3.2.1 reference row/column (top-right
    * replication when the above-right block is undecoded or outside),
    * validates the mode's availability needs, applies the 8.3.2.2.1
    * low-pass filter, and predicts. */
  private def intra8x8Pred(st: FrameState, gx8: Int, gy8: Int,
      mode: Int): Array[Int] = {
    val lumaW = st.lumaW
    val x0 = gx8 * 8; val y0 = gy8 * 8
    val topAvail = gy8 > 0
    val leftAvail = gx8 > 0
    val trAvail = topAvail && gx8 + 1 < st.wMbs * 2 &&
      blk8Before(gx8 + 1, gy8 - 1, gx8, gy8, st.wMbs)
    val tlAvail = topAvail && leftAvail
    val needTop = mode == 0 || mode == 3 || mode == 7
    val needLeft = mode == 1 || mode == 8
    val needBoth = mode == 4 || mode == 5 || mode == 6
    if ((needTop || needBoth) && !topAvail)
      throw new H264Format("intra8x8 pred needs top")
    if ((needLeft || needBoth) && !leftAvail)
      throw new H264Format("intra8x8 pred needs left")
    val top = if (!topAvail) null else {
      val o = new Array[Int](16)
      var x = 0
      while (x < 8) { o(x) = st.yPlane((y0 - 1) * lumaW + x0 + x) & 0xff; x += 1 }
      while (x < 16) {
        o(x) =
          if (trAvail) st.yPlane((y0 - 1) * lumaW + x0 + x) & 0xff
          else o(7)
        x += 1
      }
      o
    }
    val left = if (!leftAvail) null
      else Array.tabulate(8)(y => st.yPlane((y0 + y) * lumaW + x0 - 1) & 0xff)
    val tl = if (tlAvail) st.yPlane((y0 - 1) * lumaW + x0 - 1) & 0xff else 0
    val (ft, fl, ftl) = H264Transform8x8.filterRefs8x8(top, left, tl, tlAvail)
    H264Transform8x8.predLuma8x8(mode, ft, fl, ftl)
  }

  /** Decode one Intra_8x8 macroblock (CAVLC; mb_type 0 with
    * transform_size_8x8_flag = 1): four per-8x8 prediction modes coded
    * exactly like the 4x4 scheme, chroma mode, me(v) CBP where each
    * luma bit covers one 8x8 TRANSFORM block, then per coded 8x8 four
    * interleaved 4x4 CAVLC blocks (7.3.5.3.2: level8x8[4i + i4x4] =
    * level4x4[i4x4][i]) feeding the 8x8 dequant + inverse transform.
    * Returns the updated slice QP. */
  private def decodeIntra8x8Mb(r: BitReader, st: FrameState, mx: Int, my: Int,
      qpYIn: Int): Int = {
    var qpY = qpYIn
    val modes = new Array[Int](4)
    var i8 = 0
    while (i8 < 4) {
      val gbx = mx * 4 + (i8 % 2) * 2; val gby = my * 4 + (i8 / 2) * 2
      val predM = st.predI4Mode(gbx, gby) // 8.3.2.1 MxM-mode neighbors
      val mode =
        if (r.u1() == 1) predM
        else { val rem = r.u(3); if (rem < predM) rem else rem + 1 }
      modes(i8) = mode
      // every 4x4 cell carries the 8x8 mode so later 4x4 AND 8x8
      // neighbors derive their predicted mode per 8.3.1.1 / 8.3.2.1
      st.setI4Mode(gbx, gby, mode); st.setI4Mode(gbx + 1, gby, mode)
      st.setI4Mode(gbx, gby + 1, mode); st.setI4Mode(gbx + 1, gby + 1, mode)
      i8 += 1
    }
    val chromaMode = r.ue()
    if (chromaMode > 3) throw new H264Format(s"chroma pred mode $chromaMode")
    val cbpCode = r.ue()
    if (cbpCode > 47) throw new H264Format(s"cbp code $cbpCode")
    val cbp = CbpIntraByCodeNum(cbpCode)
    if (cbp != 0) qpY = ((qpY + r.se()) % 52 + 52) % 52
    val src = new CavlcSrc(r)
    decodeIntra8x8Luma(src, st, mx, my, modes, cbp & 15, qpY)
    decodeChromaResid(src, st, mx, my, chromaMode, cbp >> 4, st.cQp(qpY))
    st.t8x8MbArr(my * st.wMbs + mx) = true
    qpY
  }

  /** Read one coded 8x8 transform block's residual through the entropy
    * source (CAVLC 7.3.5.3.2 interleave or CABAC ctxBlockCat-5), then
    * unzigzag / dequant / inverse. Shared by the intra and inter 8x8
    * paths in both entropy modes. */
  private def read8x8Resid(src: MbSrc, st: FrameState, mx: Int, my: Int,
      i8: Int, qpY: Int, intra: Boolean): Array[Int] = {
    val lv64 = src.luma8x8(st, mx, my, i8)
    val raster = new Array[Int](64)
    var k = 0
    while (k < 64) { raster(H264Transform8x8.Zigzag8x8(k)) = lv64(k); k += 1 }
    H264Transform8x8.inverse8x8(H264Transform8x8.dequant8x8(raster, qpY,
      st.scaling.w8(if (intra) 0 else 1)))
  }

  private def zero8x8Nnz(st: FrameState, mx: Int, my: Int, i8: Int): Unit = {
    import H264Transform.LumaBlockOrder
    var i4 = 0
    while (i4 < 4) {
      val (bxo, byo) = LumaBlockOrder(i8 * 4 + i4)
      st.setNnzY(mx * 4 + bxo, my * 4 + byo, 0)
      i4 += 1
    }
  }

  /** Inter luma residual under transform_size_8x8_flag = 1: each coded
    * 8x8 adds its inverse-transformed residual onto the MC prediction
    * already in the plane. */
  private def decodeInterLumaResid8x8(src: MbSrc, st: FrameState,
      mx: Int, my: Int, cbpLuma: Int, qpY: Int): Unit = {
    val lumaW = st.lumaW
    var i8 = 0
    while (i8 < 4) {
      if ((cbpLuma & (1 << i8)) != 0) {
        val resid = read8x8Resid(src, st, mx, my, i8, qpY, intra = false)
        val x0 = (mx * 2 + (i8 % 2)) * 8; val y0 = (my * 2 + (i8 / 2)) * 8
        var py = 0
        while (py < 8) {
          var px = 0
          while (px < 8) {
            val o = (y0 + py) * lumaW + x0 + px
            st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + resid(py * 8 + px))
            px += 1
          }
          py += 1
        }
      } else zero8x8Nnz(st, mx, my, i8)
      i8 += 1
    }
    st.t8x8MbArr(my * st.wMbs + mx) = true
  }

  private def decodeIntra8x8Luma(src: MbSrc, st: FrameState, mx: Int, my: Int,
      modes: Array[Int], cbpLuma: Int, qpY: Int): Unit = {
    val lumaW = st.lumaW
    var i8 = 0
    while (i8 < 4) {
      val gx8 = mx * 2 + (i8 % 2); val gy8 = my * 2 + (i8 / 2)
      val pred = intra8x8Pred(st, gx8, gy8, modes(i8))
      val resid: Array[Int] =
        if ((cbpLuma & (1 << i8)) != 0) read8x8Resid(src, st, mx, my, i8, qpY, intra = true)
        else { zero8x8Nnz(st, mx, my, i8); null }
      val x0 = gx8 * 8; val y0 = gy8 * 8
      var py = 0
      while (py < 8) {
        var px = 0
        while (px < 8) {
          val v = pred(py * 8 + px) + (if (resid == null) 0 else resid(py * 8 + px))
          st.yPlane((y0 + py) * lumaW + x0 + px) = clipB(v)
          px += 1
        }
        py += 1
      }
      i8 += 1
    }
  }

  /** YCbCr (BT.601 full-range, same matrix as the JPEG codec) -> RGB,
    * box-upsampled chroma, cropped to the SPS frame size. */
  private def yuvToRgb(sps: Sps, yPlane: Array[Byte], cbPlane: Array[Byte],
      crPlane: Array[Byte]): MediaCodecs.Bmp = {
    val lumaW = sps.widthMbs * 16
    val w = sps.width; val h = sps.height
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yy = (yPlane(y * lumaW + x) & 0xff).toDouble
        val cb = (cbPlane((y / 2) * (lumaW / 2) + x / 2) & 0xff) - 128.0
        val cr = (crPlane((y / 2) * (lumaW / 2) + x / 2) & 0xff) - 128.0
        val o = (y * w + x) * 3
        rgb(o) = clamp255(yy + 1.402 * cr)
        rgb(o + 1) = clamp255(yy - 0.344136 * cb - 0.714136 * cr)
        rgb(o + 2) = clamp255(yy + 1.772 * cb)
        x += 1
      }
      y += 1
    }
    MediaCodecs.Bmp(w, h, rgb)
  }

  private def clamp255(v: Double): Byte = {
    val i = math.round(v).toInt
    (if (i < 0) 0 else if (i > 255) 255 else i).toByte
  }

  /** RGB -> YCbCr 4:2:0 planes on the MB-padded grid (edge-replicated;
    * chroma top-left-sited). Exposed so the round-trip spec can pin
    * that the bitstream transports these planes BYTE-EXACTLY. */
  private[graft] def toYuv420(img: MediaCodecs.Bmp, wMbs: Int, hMbs: Int)
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val lumaW = wMbs * 16; val lumaH = hMbs * 16
    val yP = new Array[Byte](lumaW * lumaH)
    val cbP = new Array[Byte](lumaW * lumaH / 4)
    val crP = new Array[Byte](lumaW * lumaH / 4)
    var y = 0
    while (y < lumaH) {
      val sy = math.min(y, img.height - 1)
      var x = 0
      while (x < lumaW) {
        val sx = math.min(x, img.width - 1)
        val o = (sy * img.width + sx) * 3
        val r0 = img.rgb(o) & 0xff; val g0 = img.rgb(o + 1) & 0xff; val b0 = img.rgb(o + 2) & 0xff
        yP(y * lumaW + x) = clamp255(0.299 * r0 + 0.587 * g0 + 0.114 * b0)
        if (y % 2 == 0 && x % 2 == 0) {
          val co = (y / 2) * (lumaW / 2) + x / 2
          cbP(co) = clamp255(128.0 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0)
          crP(co) = clamp255(128.0 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0)
        }
        x += 1
      }
      y += 1
    }
    (yP, cbP, crP)
  }

  // ---------------- encode ----------------

  def isH264(p: Array[Byte]): Boolean =
    try {
      nalUnits(p).exists { case (s, _) => (p(s) & 0x1f) == 7 } &&
        nalUnits(p).exists { case (s, _) => (p(s) & 0x1f) == 5 }
    } catch { case _: Exception => false }

  /**
   * Encode one RGB frame as an IDR picture (SPS + PPS + IDR slice).
   * `avcc = true` frames each NAL with a 4-byte length (the MP4-sample
   * convention [[Mp4Demux]] payloads use); false writes Annex-B start
   * codes.
   *
   * `qp = -1` (default) writes every macroblock as I_PCM — LOSSLESS
   * transport of the 4:2:0 planes (the round-trip spec pins byte
   * equality). `qp` in 0..51 writes REAL compressed Intra_16x16
   * macroblocks: DC prediction, 4x4 integer transform + luma-DC
   * Hadamard + chroma-DC 2x2, quantization at `qp`, CAVLC entropy
   * coding — with the encoder reconstructing each macroblock exactly
   * as the decoder will, so neighbor predictions agree.
   *
   * `intra4x4 = true` (needs `qp >= 0`) writes Intra_4x4 macroblocks
   * instead: per-4x4-block directional prediction (all nine 8.3.1.2
   * modes, best-SAD per block), full 16-coefficient CAVLC residual
   * blocks, me(v)-coded CBP — the mb_type-0 shape most real baseline
   * I-frames use.
   */
  def encode(img: MediaCodecs.Bmp, avcc: Boolean = true, qp: Int = -1,
      intra4x4: Boolean = false, cabac: Boolean = false,
      intra8x8: Boolean = false, chromaQpOff: Int = 0): Array[Byte] =
    encodeImpl(img, avcc, qp, intra4x4, (_, best, _) => best, cabac = cabac,
      intra8x8 = intra8x8, chromaQpOff = chromaQpOff)._1

  /** Intra_8x8 encode (high profile, CAVLC or CABAC) with a forced
    * per-block mode choice plus the encoder's reconstructed planes —
    * the spec hook exercising every 8.3.2.2 predictor both
    * directions. */
  private[graft] def encodeI8ForTest(img: MediaCodecs.Bmp, qp: Int,
      pick: (Int, Int, Seq[Int]) => Int, deblock: Boolean = false,
      chromaQpOff: Int = 0, cabac: Boolean = false,
      cqm: Option[CqmCfg] = None)
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    val (bytes, st) = encodeImpl(img, avcc = true, qp = qp, intra4x4 = false,
      pick, intra8x8 = true, deblock = deblock, chromaQpOff = chromaQpOff,
      cabac = cabac, cqm = cqm)
    (bytes, st.yPlane, st.cbPlane, st.crPlane)
  }

  /** Intra_4x4 encode with a forced per-block mode choice plus the
    * encoder's own reconstructed 4:2:0 planes — the spec hook that (a)
    * exercises every 8.3.1.2 predictor both directions and (b) pins the
    * decoder bit-exactly against the encode-time reconstruction. */
  private[graft] def encodeI4ForTest(img: MediaCodecs.Bmp, qp: Int,
      pick: (Int, Int, Seq[Int]) => Int, cqm: Option[CqmCfg] = None)
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    val (bytes, st) = encodeImpl(img, avcc = true, qp = qp, intra4x4 = true, pick,
      cqm = cqm)
    (bytes, st.yPlane, st.cbPlane, st.crPlane)
  }

  /** SPS + PPS NAL units (baseline 66, level 3.0, POC type 2, CAVLC) —
    * shared by the IDR and GOP encoders. `refFrames` sets the SPS
    * max_num_ref_frames (DPB depth) and the PPS list-0 default size;
    * multi-ref GOPs write the x264-like default shape (PPS carries the
    * list size, early slices override it down while the DPB fills). */
  private def spsPpsNals(wMbs: Int, hMbs: Int, cropR: Int, cropB: Int,
      refFrames: Int = 1, pocLsbBits: Int = 0, profile: Int = 66,
      cabac: Boolean = false, t8x8: Boolean = false, chromaQpOff: Int = 0,
      weightedPred: Boolean = false, weightedBipredIdc: Int = 0,
      pocType1: Option[(Int, Seq[Int])] = None,
      gapsAllowed: Boolean = false, cqm: Option[CqmCfg] = None,
      constrainedIntra: Boolean = false)
      : (Array[Byte], Array[Byte]) = {
    require(!t8x8 || profile == 100, "8x8 transform needs high profile")
    require(cqm.forall(_.sps.isEmpty) || profile == 100,
      "SPS scaling matrices need high profile")
    val sw = new BitWriter
    // baseline (66) with constraint_set0/1 for I/P GOPs; B GOPs must
    // declare MAIN (77, constraint flags clear) — baseline forbids B;
    // 8x8-transform streams declare HIGH (100, with its SPS extension)
    sw.u(profile, 8)
    sw.u(if (profile == 66) 0xC0 else 0x00, 8)
    sw.u(30, 8) // level 3.0
    sw.ue(0) // sps id
    if (profile == 100) {
      sw.ue(1) // chroma_format_idc 4:2:0
      sw.ue(0); sw.ue(0) // bit_depth_luma/chroma = 8
      sw.u1(0) // qpprime_y_zero_transform_bypass
      cqm.flatMap(_.sps) match {
        case Some(lists) => // seq_scaling_matrix_present + 8-list loop
          sw.u1(1); writeScalingLists(sw, lists, 8)
        case None => sw.u1(0) // flat lists
      }
    }
    sw.ue(0) // log2_max_frame_num_minus4
    // POC type 2 (decode order == display order) unless the GOP carries
    // B frames, which need explicit POC for display reordering: type 0
    // (lsb per slice) or type 1 (SPS cycle + per-slice delta)
    pocType1 match {
      case Some((offNonRef, cycle)) =>
        sw.ue(1) // pic_order_cnt_type 1
        sw.u1(0) // delta_pic_order_always_zero_flag (deltas per slice)
        sw.se(offNonRef)
        sw.se(0) // offset_for_top_to_bottom_field
        sw.ue(cycle.length)
        cycle.foreach(sw.se)
      case None =>
        if (pocLsbBits > 0) { sw.ue(0); sw.ue(pocLsbBits - 4) }
        else sw.ue(2) // pic_order_cnt_type 2
    }
    sw.ue(refFrames) // max_num_ref_frames
    sw.u1(if (gapsAllowed) 1 else 0) // gaps_in_frame_num_value_allowed
    sw.ue(wMbs - 1); sw.ue(hMbs - 1)
    sw.u1(1) // frame_mbs_only
    sw.u1(1) // direct_8x8_inference
    if (cropR > 0 || cropB > 0) {
      sw.u1(1); sw.ue(0); sw.ue(cropR); sw.ue(0); sw.ue(cropB)
    } else sw.u1(0)
    sw.u1(0) // no VUI
    sw.trailing()
    val spsNal = Array[Byte](0x67.toByte) ++ escape(sw.bytes)

    val pw = new BitWriter
    pw.ue(0); pw.ue(0) // pps id, sps id
    pw.u1(if (cabac) 1 else 0) // entropy_coding_mode_flag
    pw.u1(0) // bottom_field_poc
    pw.ue(0) // one slice group
    pw.ue(refFrames - 1); pw.ue(0) // num_ref_idx_l0/l1_default_active_minus1
    pw.u1(if (weightedPred) 1 else 0) // weighted_pred_flag (P)
    pw.u(weightedBipredIdc, 2) // weighted_bipred_idc (B)
    pw.se(0); pw.se(0) // pic_init_qp 26, qs 26
    pw.se(chromaQpOff) // chroma_qp_index_offset
    pw.u1(1) // deblocking control present
    pw.u1(if (constrainedIntra) 1 else 0) // constrained_intra_pred
    pw.u1(0) // redundant pic cnt
    if (t8x8 || cqm.exists(_.pps.isDefined)) {
      pw.u1(if (t8x8) 1 else 0) // transform_8x8_mode_flag
      cqm.flatMap(_.pps) match {
        case Some(lists) => // pic_scaling_matrix_present + list loop
          pw.u1(1); writeScalingLists(pw, lists, if (t8x8) 8 else 6)
        case None => pw.u1(0)
      }
      pw.se(chromaQpOff) // second_chroma_qp_index_offset (== first)
    }
    pw.trailing()
    val ppsNal = Array[Byte](0x68.toByte) ++ escape(pw.bytes)
    (spsNal, ppsNal)
  }

  private def frameNals(avcc: Boolean, nals: Array[Byte]*): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    nals.foreach { nal =>
      if (avcc) {
        out += ((nal.length >> 24) & 0xff).toByte
        out += ((nal.length >> 16) & 0xff).toByte
        out += ((nal.length >> 8) & 0xff).toByte
        out += (nal.length & 0xff).toByte
      } else { out += 0; out += 0; out += 0; out += 1 }
      out ++= nal
    }
    out.toArray
  }

  /** MB-grid geometry for a frame: (wMbs, hMbs, cropR, cropB) — the ONE
    * derivation the IDR and GOP encoders share (their parameter sets
    * must agree within a GOP). */
  private def mbGeometry(img: MediaCodecs.Bmp): (Int, Int, Int, Int) = {
    val wMbs = (img.width + 15) / 16
    val hMbs = (img.height + 15) / 16
    val cropR = (wMbs * 16 - img.width + 1) / 2
    val cropB = (hMbs * 16 - img.height + 1) / 2
    require(wMbs * 16 - 2 * cropR == img.width && hMbs * 16 - 2 * cropB == img.height,
      "odd frame dims need cropping units of 2 (4:2:0); use even dims")
    (wMbs, hMbs, cropR, cropB)
  }

  private def encodeImpl(img: MediaCodecs.Bmp, avcc: Boolean, qp: Int,
      intra4x4: Boolean, pick: (Int, Int, Seq[Int]) => Int,
      refFrames: Int = 1, pocLsbBits: Int = 0, deblock: Boolean = false,
      profile: Int = 66, cabac: Boolean = false, intra8x8: Boolean = false,
      chromaQpOff: Int = 0, idrLongTerm: Boolean = false,
      pocType1Delta: Option[Int] = None,
      pocType1Sps: Option[(Int, Seq[Int])] = None,
      gapsAllowed: Boolean = false, cqm: Option[CqmCfg] = None)
      : (Array[Byte], FrameState) = {
    require(!intra4x4 || qp >= 0, "intra4x4 needs a compressed qp (0..51)")
    require(!deblock || qp >= 0, "deblocking needs a compressed qp (0..51)")
    require(!intra8x8 || qp >= 0, "intra8x8 needs a compressed qp (0..51)")
    require(!(intra8x8 && intra4x4), "pick one luma transform size")
    require(chromaQpOff >= -12 && chromaQpOff <= 12, s"chromaQpOff $chromaQpOff")
    val (wMbs, hMbs, cropR, cropB) = mbGeometry(img)

    // RGB -> YCbCr 4:2:0, edge-replicated to MB grid
    val lumaW = wMbs * 16
    val (yP, cbP, crP) = toYuv420(img, wMbs, hMbs)
    // CABAC requires main profile (baseline forbids entropy_coding_mode
    // 1); the 8x8 transform requires high profile
    val effProfile =
      if (intra8x8 || cqm.isDefined) 100
      else if (cabac && profile == 66) 77
      else profile
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, cropR, cropB, refFrames,
      pocLsbBits, effProfile, cabac, t8x8 = intra8x8,
      chromaQpOff = chromaQpOff, pocType1 = pocType1Sps,
      gapsAllowed = gapsAllowed, cqm = cqm)
    // the decoder re-derives these from the written SPS/PPS; the
    // encoder reconstructs through the identical resolver (8.5.9)
    val encScaling = cqm.map(_.resolved).getOrElse(ScalingLists.Flat)

    // IDR slice
    require(qp >= -1 && qp <= 51, s"qp $qp")
    val w2 = new BitWriter
    w2.ue(0) // first_mb_in_slice
    w2.ue(7) // slice_type I (all slices)
    w2.ue(0) // pps id
    w2.u(0, 4) // frame_num (log2_max_frame_num = 4)
    w2.ue(0) // idr_pic_id
    if (pocLsbBits > 0) w2.u(0, pocLsbBits) // pic_order_cnt_lsb (IDR: 0)
    pocType1Delta.foreach(w2.se) // delta_pic_order_cnt[0] (POC type 1)
    // dec_ref_pic_marking: no_output_of_prior_pics_flag, then
    // long_term_reference_flag (the IDR self-marks long-term at
    // LongTermFrameIdx 0 when set — 8.2.5.1)
    w2.u1(0); w2.u1(if (idrLongTerm) 1 else 0)
    w2.se(if (qp < 0) 0 else qp - 26) // slice_qp_delta vs pic_init_qp 26
    if (deblock) { w2.ue(0); w2.se(0); w2.se(0) } // filter ON, zero offsets
    else w2.ue(1) // disable_deblocking_filter_idc = 1
    var mb = 0
    val nMbs = wMbs * hMbs
    var stOut: FrameState = null
    def writePcmSamples(mbX: Int, mbY: Int): Unit = {
      var i = 0
      while (i < 256) {
        w2.writeByte(yP((mbY + i / 16) * lumaW + mbX + i % 16) & 0xff)
        i += 1
      }
      val cW = lumaW / 2
      i = 0
      while (i < 64) {
        w2.writeByte(cbP((mbY / 2 + i / 8) * cW + mbX / 2 + i % 8) & 0xff)
        i += 1
      }
      i = 0
      while (i < 64) {
        w2.writeByte(crP((mbY / 2 + i / 8) * cW + mbX / 2 + i % 8) & 0xff)
        i += 1
      }
    }
    if (cabac) {
      // CABAC slice data: alignment ones, context init at the slice QP,
      // arithmetic-coded MBs each followed by end_of_slice_flag; the
      // terminate-1 flush carries the stop bit, so the slice ends with
      // plain zero-alignment (no rbsp_stop_one_bit)
      while (!w2.byteAligned) w2.u1(1) // cabac_alignment_one_bit
      val cxE = new H264Cabac.Ctx
      cxE.initI(if (qp < 0) 26 else qp)
      var enc = new H264Cabac.Enc(w2)
      var sink = new CabacSink(enc, cxE)
      val st = new FrameState(wMbs, hMbs)
      st.scaling = encScaling
      st.cqpOff = chromaQpOff
      if (qp >= 0) stOut = st
      while (mb < nMbs) {
        val mx = mb % wMbs; val my = mb / wMbs
        if (qp < 0) { // every MB I_PCM (lossless transport)
          val mbI = my * wMbs + mx
          enc.decision(cxE, 3 + mbTypeI4Inc(st, mx, my), 1)
          enc.terminate(1) // pcm terminate: flush, then aligned samples
          w2.alignToByte()
          writePcmSamples(mx * 16, my * 16)
          st.markPcm(mx, my)
          st.pcmMbArr(mbI) = true
          st.cbpLumaMb(mbI) = 15
          st.cbpChromaMb(mbI) = 2
          st.markMb(mx, my, intra = true, 0)
          // the engine re-initializes after PCM samples (9.3.1.2)
          enc = new H264Cabac.Enc(w2)
          sink = new CabacSink(enc, cxE)
        } else {
          if (intra8x8) encodeIntra8x8Mb(sink, st, mx, my, yP, cbP, crP, qp, pick)
          else if (intra4x4) encodeIntra4x4Mb(sink, st, mx, my, yP, cbP, crP, qp, pick)
          else encodeIntra16x16Mb(sink, st, mx, my, yP, cbP, crP, qp)
        }
        enc.terminate(if (mb == nMbs - 1) 1 else 0) // end_of_slice_flag
        mb += 1
      }
      w2.alignToByte()
    } else if (qp < 0) {
      while (mb < nMbs) { // every MB I_PCM (lossless transport)
        w2.ue(25)
        w2.alignToByte()
        writePcmSamples((mb % wMbs) * 16, (mb / wMbs) * 16)
        mb += 1
      }
      w2.trailing()
    } else {
      // compressed Intra_16x16 path: DC pred + transforms + CAVLC; the
      // encoder mirrors the decoder's reconstruction so intra prediction
      // chains across macroblocks agree bit-for-bit
      val st = new FrameState(wMbs, hMbs)
      st.scaling = encScaling
      st.cqpOff = chromaQpOff
      stOut = st
      val sink = new CavlcSink(w2)
      while (mb < nMbs) {
        if (intra8x8) encodeIntra8x8Mb(sink, st, mb % wMbs, mb / wMbs, yP, cbP, crP, qp, pick)
        else if (intra4x4) encodeIntra4x4Mb(sink, st, mb % wMbs, mb / wMbs, yP, cbP, crP, qp, pick)
        else encodeIntra16x16Mb(sink, st, mb % wMbs, mb / wMbs, yP, cbP, crP, qp)
        mb += 1
      }
      w2.trailing()
    }
    if (deblock && stOut != null) deblockFrame(stOut, 0, 0)
    val idrNal = Array[Byte](0x65.toByte) ++ escape(w2.bytes)

    val out = new ArrayBuffer[Byte]()
    def emit(nal: Array[Byte]): Unit =
      if (avcc) {
        out += ((nal.length >> 24) & 0xff).toByte
        out += ((nal.length >> 16) & 0xff).toByte
        out += ((nal.length >> 8) & 0xff).toByte
        out += (nal.length & 0xff).toByte
        out ++= nal
      } else {
        out += 0; out += 0; out += 0; out += 1
        out ++= nal
      }
    emit(spsNal); emit(ppsNal); emit(idrNal)
    (out.toArray, stOut)
  }

  /** Encode + reconstruct one Intra_16x16 macroblock (DC prediction,
    * qp-quantized transforms, CAVLC) — the mirror of
    * [[decodeIntra16x16]], sharing its dequant/inverse/pred kernels so
    * the encoder's neighbor state is exactly the decoder's. */
  /** Residual/header sink: the entropy-coder half of the intra MB
    * encoders (analysis + reconstruction stay shared, so CAVLC and
    * CABAC frames reconstruct identically and decode parity follows). */
  private trait MbSink {
    /** Intra mb_type in I-slice numbering (0 I4x4, 1-24 I16, 25 PCM);
      * pOffset relocates into P-slice numbering (CAVLC only). */
    def mbTypeIntra(st: FrameState, mx: Int, my: Int, v: Int, pOffset: Int): Unit
    def i4Mode(prevFlag: Boolean, rem: Int): Unit
    def chromaPred(st: FrameState, mx: Int, my: Int, mode: Int): Unit
    def cbpI4(st: FrameState, mx: Int, my: Int, cbp: Int): Unit
    def qpDelta(v: Int): Unit
    def qpDeltaSkipped(): Unit = ()
    def blockOut(st: FrameState, cat: Int, coeffs: Array[Int], maxN: Int,
        gbx: Int, gby: Int, comp: Int): Int
    /** transform_size_8x8_flag (7.3.5): u(1) under CAVLC, ctx 399 +
      * the 9.3.3.1.1.10 neighbor increment under CABAC. */
    def t8x8Flag(st: FrameState, mx: Int, my: Int, flag: Boolean): Unit
    /** One coded 8x8 transform block's 64 scan-order levels — the
      * emission mirror of [[MbSrc.luma8x8]]; records per-cell nnz. */
    def luma8x8Out(st: FrameState, mx: Int, my: Int, i8: Int,
        lv64: Array[Int]): Unit
  }

  private final class CavlcSink(w: BitWriter) extends MbSink {
    def mbTypeIntra(st: FrameState, mx: Int, my: Int, v: Int, pOffset: Int): Unit =
      w.ue(pOffset + v)
    def i4Mode(prevFlag: Boolean, rem: Int): Unit =
      if (prevFlag) w.u1(1) else { w.u1(0); w.u(rem, 3) }
    def chromaPred(st: FrameState, mx: Int, my: Int, mode: Int): Unit = w.ue(mode)
    def cbpI4(st: FrameState, mx: Int, my: Int, cbp: Int): Unit =
      w.ue(CbpIntraToCodeNum(cbp))
    def qpDelta(v: Int): Unit = w.se(v)
    def blockOut(st: FrameState, cat: Int, coeffs: Array[Int], maxN: Int,
        gbx: Int, gby: Int, comp: Int): Int = {
      val nC = cat match {
        case CatChromaDc => -1
        case CatChromaAc => st.chromaNc(comp - 1, gbx, gby)
        case _ => st.lumaNc(gbx, gby)
      }
      H264Cavlc.encodeBlock(w, coeffs, maxN, nC)
    }
    def t8x8Flag(st: FrameState, mx: Int, my: Int, flag: Boolean): Unit =
      w.u1(if (flag) 1 else 0)
    def luma8x8Out(st: FrameState, mx: Int, my: Int, i8: Int,
        lv64: Array[Int]): Unit = {
      import H264Transform.LumaBlockOrder
      val buf = new Array[Int](16)
      var i4 = 0
      while (i4 < 4) {
        val (bxo, byo) = LumaBlockOrder(i8 * 4 + i4)
        val gbx = mx * 4 + bxo; val gby = my * 4 + byo
        var i = 0
        while (i < 16) { buf(i) = lv64(4 * i + i4); i += 1 }
        val tc = H264Cavlc.encodeBlock(w, buf, 16, st.lumaNc(gbx, gby))
        st.setNnzY(gbx, gby, tc)
        i4 += 1
      }
    }
  }

  /** CABAC sink — the bit-exact mirror of [[decodeIntraMbCabac]]'s
    * element reads, sharing its context-increment helpers. Tracks the
    * previous mb_qp_delta for the ctx-60 increment. */
  private final class CabacSink(e: H264Cabac.Enc, cx: H264Cabac.Ctx)
      extends MbSink {
    private var prevQpDelta = 0
    /** Residual cbf neighbor rule flips for inter MBs (9.3.3.1.1.9);
      * the P/B encoders set this around intra-in-P/B emission. */
    var interMb: Boolean = false
    def mbTypeIntra(st: FrameState, mx: Int, my: Int, v: Int, pOffset: Int): Unit = {
      val mbI = my * st.wMbs + mx
      // pOffset selects the slice type's tree: 0 = I (prefix-free), 5 =
      // intra-in-P ('1' prefix at ctx 14), 23 = intra-in-B ('111101'
      // prefix); the suffix tree shape is shared
      val tree = pOffset match {
        case 0 => intraTreeI(st, mx, my)
        case 5 => encodeMbTypePCabac(e, cx, -1); IntraTreeP
        case 23 => encodeMbTypeBCabac(e, cx, st, mx, my, -1); IntraTreeB
        case o => throw new H264Format(s"CABAC intra mb_type offset $o")
      }
      if (v == 0) { e.decision(cx, tree(0), 0); st.i4MbArr(mbI) = true }
      else {
        require(v >= 1 && v <= 24, "PCM rides the dedicated CABAC path")
        e.decision(cx, tree(0), 1)
        e.terminate(0) // not I_PCM
        val vv = v - 1
        val cbpL = vv / 12
        val cbpC = (vv / 4) % 3
        val predMode = vv % 4
        e.decision(cx, tree(1), cbpL)
        if (cbpC == 0) e.decision(cx, tree(2), 0)
        else { e.decision(cx, tree(2), 1); e.decision(cx, tree(3), if (cbpC == 2) 1 else 0) }
        e.decision(cx, tree(4), predMode >> 1)
        e.decision(cx, tree(5), predMode & 1)
        st.i16MbArr(mbI) = true
        st.cbpLumaMb(mbI) = cbpL * 15
        st.cbpChromaMb(mbI) = cbpC
      }
    }
    def i4Mode(prevFlag: Boolean, rem: Int): Unit =
      if (prevFlag) e.decision(cx, 68, 1)
      else {
        e.decision(cx, 68, 0)
        e.decision(cx, 69, rem & 1)
        e.decision(cx, 69, (rem >> 1) & 1)
        e.decision(cx, 69, (rem >> 2) & 1)
      }
    def chromaPred(st: FrameState, mx: Int, my: Int, mode: Int): Unit = {
      val inc = chromaPredInc(st, mx, my)
      if (mode == 0) e.decision(cx, 64 + inc, 0)
      else {
        e.decision(cx, 64 + inc, 1)
        if (mode == 1) e.decision(cx, 67, 0)
        else { e.decision(cx, 67, 1); e.decision(cx, 67, if (mode == 3) 1 else 0) }
      }
      st.chromaModeMb(my * st.wMbs + mx) = mode
    }
    def cbpI4(st: FrameState, mx: Int, my: Int, cbp: Int): Unit = {
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      var k = 0
      var partial = 0
      while (k < 4) {
        val bit = (cbpLuma >> k) & 1
        e.decision(cx, 73 + cbpLumaInc(st, mx, my, k, partial), bit)
        partial |= bit << k
        k += 1
      }
      if (cbpChroma == 0) e.decision(cx, 77 + cbpChromaInc(st, mx, my, 0), 0)
      else {
        e.decision(cx, 77 + cbpChromaInc(st, mx, my, 0), 1)
        e.decision(cx, 81 + cbpChromaInc(st, mx, my, 1),
          if (cbpChroma == 2) 1 else 0)
      }
      val mbI = my * st.wMbs + mx
      st.cbpLumaMb(mbI) = cbpLuma
      st.cbpChromaMb(mbI) = cbpChroma
    }
    def qpDelta(v: Int): Unit = {
      encodeQpDeltaCabac(e, cx, prevQpDelta, v)
      prevQpDelta = v
    }
    override def qpDeltaSkipped(): Unit = prevQpDelta = 0
    def blockOut(st: FrameState, cat: Int, coeffs: Array[Int], maxN: Int,
        gbx: Int, gby: Int, comp: Int): Int = {
      var n = 0
      var i = 0
      while (i < maxN) { if (coeffs(i) != 0) n += 1; i += 1 }
      val inc = cbfCtxInc(st, cat, gbx, gby, comp, curIntra = !interMb)
      e.decision(cx, H264Cabac.CtxCbfBase + 4 * cat + inc, if (n > 0) 1 else 0)
      recordDcCbf(st, cat, gbx, gby, comp, n > 0)
      if (n > 0) H264Cabac.encodeResidualLevels(e, cx, cat, coeffs, maxN)
      n
    }
    def t8x8Flag(st: FrameState, mx: Int, my: Int, flag: Boolean): Unit =
      e.decision(cx, H264Cabac.CtxT8x8Base + t8x8Inc(st, mx, my),
        if (flag) 1 else 0)
    def luma8x8Out(st: FrameState, mx: Int, my: Int, i8: Int,
        lv64: Array[Int]): Unit = {
      // ctxBlockCat 5: no coded_block_flag (the CBP bit carries it)
      H264Cabac.encodeResidualLevels(e, cx, CatLuma8x8, lv64, 64)
      record8x8Nnz(st, mx, my, i8, lv64)
    }
  }

  private def encodeIntra16x16Mb(sink: MbSink, st: FrameState, mx: Int, my: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte], qp: Int,
      mbTypeOffset: Int = 0): Unit = {
    import H264Transform._
    val lumaW = st.lumaW
    val x0 = mx * 16; val y0 = my * 16
    val top = if (my > 0) Array.tabulate(16)(i => st.yPlane((y0 - 1) * lumaW + x0 + i) & 0xff) else null
    val left = if (mx > 0) Array.tabulate(16)(i => st.yPlane((y0 + i) * lumaW + x0 - 1) & 0xff) else null
    val pred = predLuma16x16(2, top, left, 0) // DC mode
    // forward transform + quant, luma
    val acLv = Array.ofDim[Int](16, 15)
    val dcRaster = new Array[Int](16)
    var bi = 0
    while (bi < 16) {
      val (bxo, byo) = LumaBlockOrder(bi)
      val x = new Array[Int](16)
      var py = 0
      while (py < 4) {
        var px = 0
        while (px < 4) {
          val fx = bxo * 4 + px; val fy = byo * 4 + py
          x(py * 4 + px) = (srcY((y0 + fy) * lumaW + x0 + fx) & 0xff) - pred(fy * 16 + fx)
          px += 1
        }
        py += 1
      }
      val wc = forward4x4(x)
      dcRaster(byo * 4 + bxo) = wc(0)
      val q = quant4x4(wc, qp, skipDc = true, st.scaling.w4(0))
      var k = 0
      while (k < 15) { acLv(bi)(k) = q(Zigzag4x4(k + 1)); k += 1 }
      bi += 1
    }
    val dcLvRaster = quantLumaDc(dcRaster, qp, st.scaling.w4(0)(0))
    val dcScan = Array.tabulate(16)(k => dcLvRaster(Zigzag4x4(k)))
    val cbpLuma = if (acLv.exists(_.exists(_ != 0))) 15 else 0
    // chroma forward + quant (shared with the Intra_4x4 encoder)
    val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp))
    val cbpChroma = chroma.cbpChroma
    // ---- write the macroblock (Table 7-11 inverse: predMode DC = 2);
    // mbTypeOffset 5 relocates the type into P-slice numbering (7-13)
    sink.mbTypeIntra(st, mx, my,
      1 + 2 + 4 * cbpChroma + 12 * (if (cbpLuma == 15) 1 else 0), mbTypeOffset)
    sink.chromaPred(st, mx, my, 0) // intra_chroma_pred_mode = DC
    sink.qpDelta(0)
    sink.blockOut(st, CatLumaDc, dcScan, 16, mx * 4, my * 4, 0)
    val dcd = dequantLumaDc(unzigzag(dcScan, 0), qp, st.scaling.w4(0)(0))
    bi = 0
    while (bi < 16) {
      val (bxo, byo) = LumaBlockOrder(bi)
      val gbx = mx * 4 + bxo; val gby = my * 4 + byo
      var resid: Array[Int] = null
      if (cbpLuma != 0) {
        val tc = sink.blockOut(st, CatLumaAc, acLv(bi), 15, gbx, gby, 0)
        st.setNnzY(gbx, gby, tc)
        resid = dequant4x4(unzigzag(acLv(bi), 1), qp, skipDc = true, st.scaling.w4(0))
      } else {
        st.setNnzY(gbx, gby, 0)
        resid = new Array[Int](16)
      }
      resid(0) = dcd(byo * 4 + bxo)
      val rpx = inverse4x4(resid)
      var py = 0
      while (py < 4) {
        var px = 0
        while (px < 4) {
          val fx = bxo * 4 + px; val fy = byo * 4 + py
          st.yPlane((y0 + fy) * lumaW + x0 + fx) =
            clipB(pred(fy * 16 + fx) + rpx(py * 4 + px))
          px += 1
        }
        py += 1
      }
      bi += 1
    }
    chroma.emit(sink)
    st.markMb(mx, my, intra = true, qp)
  }

  /** Analyzed chroma for one macroblock (DC prediction, qpC-quantized
    * transforms): `cbpChroma` is known before the header is written —
    * mb_type / coded_block_pattern need it — and [[emit]] then writes
    * the residual blocks and reconstructs the planes exactly as
    * [[decodeChromaResid]] will. Shared by the Intra_16x16 and
    * Intra_4x4 encoders. */
  private final class ChromaEnc(st: FrameState, mx: Int, my: Int,
      srcCb: Array[Byte], srcCr: Array[Byte], qpC: Int,
      predOf: Int => Array[Int] = null) {
    import H264Transform._
    // scaling-list base (8.5.9): predOf == null is the intra (DC-pred)
    // path -> lists 1/2; an MC prediction marks the MB inter -> 4/5
    private val slBase = if (predOf == null) 1 else 4
    private val cW = st.lumaW / 2
    private val cx0 = mx * 8
    private val cy0 = my * 8
    private val cPred = new Array[Array[Int]](2)
    private val cAcLv = Array.ofDim[Int](2, 4, 15)
    private val cDcLv = new Array[Array[Int]](2)

    {
      var c = 0
      while (c < 2) {
        val srcP = if (c == 0) srcCb else srcCr
        val recP = if (c == 0) st.cbPlane else st.crPlane
        cPred(c) = if (predOf != null) predOf(c) // inter: MC prediction
        else {
          val ctop = if (my > 0) Array.tabulate(8)(i => recP((cy0 - 1) * cW + cx0 + i) & 0xff) else null
          val cleft = if (mx > 0) Array.tabulate(8)(i => recP((cy0 + i) * cW + cx0 - 1) & 0xff) else null
          predChroma8x8(0, ctop, cleft, 0) // DC mode
        }
        val dcC = new Array[Int](4)
        var sb = 0
        while (sb < 4) {
          val sbx = sb % 2; val sby = sb / 2
          val x = new Array[Int](16)
          var py = 0
          while (py < 4) {
            var px = 0
            while (px < 4) {
              val fx = sbx * 4 + px; val fy = sby * 4 + py
              x(py * 4 + px) = (srcP((cy0 + fy) * cW + cx0 + fx) & 0xff) - cPred(c)(fy * 8 + fx)
              px += 1
            }
            py += 1
          }
          val wc = forward4x4(x)
          dcC(sby * 2 + sbx) = wc(0)
          val q = quant4x4(wc, qpC, skipDc = true, st.scaling.w4(slBase + c))
          var k = 0
          while (k < 15) { cAcLv(c)(sb)(k) = q(Zigzag4x4(k + 1)); k += 1 }
          sb += 1
        }
        cDcLv(c) = quantChromaDc(dcC, qpC, st.scaling.w4(slBase + c)(0))
        c += 1
      }
    }

    val cbpChroma: Int =
      if (cAcLv.exists(_.exists(_.exists(_ != 0)))) 2
      else if (cDcLv.exists(_.exists(_ != 0))) 1
      else 0

    def emit(w: BitWriter): Unit = emit(new CavlcSink(w))

    def emit(sink: MbSink): Unit = {
      if (cbpChroma > 0) {
        var c = 0
        while (c < 2) {
          sink.blockOut(st, CatChromaDc, cDcLv(c), 4, mx * 2, my * 2, c + 1)
          c += 1
        }
      }
      var c = 0
      while (c < 2) {
        val plane = if (c == 0) st.cbPlane else st.crPlane
        val dcd2 = if (cbpChroma > 0) dequantChromaDc(cDcLv(c), qpC, st.scaling.w4(slBase + c)(0)) else new Array[Int](4)
        var sb = 0
        while (sb < 4) {
          val sbx = sb % 2; val sby = sb / 2
          val gbx = mx * 2 + sbx; val gby = my * 2 + sby
          var resid: Array[Int] = null
          if (cbpChroma == 2) {
            val tc = sink.blockOut(st, CatChromaAc, cAcLv(c)(sb), 15, gbx, gby, c + 1)
            st.setNnzC(c, gbx, gby, tc)
            resid = dequant4x4(unzigzag(cAcLv(c)(sb), 1), qpC, skipDc = true, st.scaling.w4(slBase + c))
          } else {
            st.setNnzC(c, gbx, gby, 0)
            resid = new Array[Int](16)
          }
          resid(0) = dcd2(sby * 2 + sbx)
          val rpx = inverse4x4(resid)
          var py = 0
          while (py < 4) {
            var px = 0
            while (px < 4) {
              val fx = sbx * 4 + px; val fy = sby * 4 + py
              plane((cy0 + fy) * cW + cx0 + fx) =
                clipB(cPred(c)(fy * 8 + fx) + rpx(py * 4 + px))
              px += 1
            }
            py += 1
          }
          sb += 1
        }
        c += 1
      }
    }
  }

  /** Intra_4x4 modes whose required neighbors exist (8.3.1.2: V/DDL/VL
    * need top, H/HU need left, DDR/VR/HD need both, DC always). */
  private def availableI4Modes(topOk: Boolean, leftOk: Boolean): Seq[Int] =
    if (topOk && leftOk) 0 to 8
    else if (topOk) Seq(0, 2, 3, 7)
    else if (leftOk) Seq(1, 2, 8)
    else Seq(2)

  /** Encode + reconstruct one Intra_4x4 macroblock — the mirror of the
    * mb_type-0 decode path, sharing its prediction/transform/CAVLC
    * kernels so the reconstruction (and therefore every later block's
    * intra prediction) is bit-identical to the decoder's. Per block the
    * mode minimizing prediction SAD among the available modes wins
    * (ties to the lowest mode index — deterministic); `pick` lets specs
    * override the choice to exercise every predictor. An 8x8 group's
    * CBP bit is set iff any of its four blocks quantized non-zero;
    * uncoded blocks carry zero residual by construction, so applying
    * the quantized residual unconditionally reconstructs exactly what
    * the decoder will. */
  private[pipeline] def encodeIntra4x4Mb(sink: MbSink, st: FrameState,
      mx: Int, my: Int, srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte], qp: Int,
      pick: (Int, Int, Seq[Int]) => Int = (_, best, _) => best): Unit = {
    import H264Transform._
    val lumaW = st.lumaW
    val x0 = mx * 16; val y0 = my * 16
    val prevFlags = new Array[Boolean](16)
    val rems = new Array[Int](16)
    val levels = Array.ofDim[Int](16, 16) // zigzag-order quantized levels
    var bi = 0
    while (bi < 16) {
      val (bxo, byo) = LumaBlockOrder(bi)
      val gbx = mx * 4 + bxo; val gby = my * 4 + byo
      val ax = x0 + bxo * 4; val ay = y0 + byo * 4
      val (top, left, tl) = luma4x4Neighbors(st, ax, ay, bi)
      val avail = availableI4Modes(top != null, left != null)
      val src = Array.tabulate(16)(k => srcY((ay + k / 4) * lumaW + ax + k % 4) & 0xff)
      var best = avail.head; var bestSad = Int.MaxValue
      for (m <- avail) {
        val pr = predLuma4x4(m, top, left, tl)
        var sad = 0; var k = 0
        while (k < 16) { sad += math.abs(src(k) - pr(k)); k += 1 }
        if (sad < bestSad) { bestSad = sad; best = m }
      }
      val mode = pick(bi, best, avail)
      require(avail.contains(mode), s"i4x4 mode $mode unavailable at block $bi")
      val predM = st.predI4Mode(gbx, gby)
      st.setI4Mode(gbx, gby, mode)
      prevFlags(bi) = mode == predM
      rems(bi) = if (mode < predM) mode else mode - 1
      val pred = predLuma4x4(mode, top, left, tl)
      val diff = Array.tabulate(16)(k => src(k) - pred(k))
      val q = quant4x4(forward4x4(diff), qp, skipDc = false, st.scaling.w4(0))
      var k = 0
      while (k < 16) { levels(bi)(k) = q(Zigzag4x4(k)); k += 1 }
      // nnz now (TotalCoeff of an uncoded block is 0 either way), so
      // later blocks' nC and the emit pass read the decoder's values
      st.setNnzY(gbx, gby, levels(bi).count(_ != 0))
      // reconstruct exactly as the decoder (zero levels -> zero resid,
      // matching the uncoded-group path bit-for-bit)
      val rpx = inverse4x4(dequant4x4(unzigzag(levels(bi), 0), qp, skipDc = false, st.scaling.w4(0)))
      var py = 0
      while (py < 4) {
        var px = 0
        while (px < 4) {
          st.yPlane((ay + py) * lumaW + ax + px) =
            clipB(pred(py * 4 + px) + rpx(py * 4 + px))
          px += 1
        }
        py += 1
      }
      bi += 1
    }
    val cbpLuma = (0 until 4).foldLeft(0) { (acc, g) =>
      if ((0 until 4).exists(i => levels(g * 4 + i).exists(_ != 0))) acc | (1 << g)
      else acc
    }
    val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp))
    val cbp = cbpLuma | (chroma.cbpChroma << 4)
    // ---- write: mb_type, 16 pred modes, chroma mode, CBP, qp delta
    // (only when coded), then residuals (7.3.5.1 / 7.3.5.3)
    sink.mbTypeIntra(st, mx, my, 0, 0)
    bi = 0
    while (bi < 16) {
      sink.i4Mode(prevFlags(bi), rems(bi))
      bi += 1
    }
    sink.chromaPred(st, mx, my, 0) // intra_chroma_pred_mode = DC
    sink.cbpI4(st, mx, my, cbp)
    if (cbp != 0) sink.qpDelta(0) else sink.qpDeltaSkipped()
    bi = 0
    while (bi < 16) {
      if ((cbpLuma & (1 << (bi >> 2))) != 0) {
        val (bxo, byo) = LumaBlockOrder(bi)
        sink.blockOut(st, CatLuma4x4, levels(bi), 16,
          mx * 4 + bxo, my * 4 + byo, 0)
      }
      bi += 1
    }
    chroma.emit(sink)
    st.markMb(mx, my, intra = true, qp)
  }

  /** Encode + reconstruct one Intra_8x8 macroblock (high profile,
    * CAVLC or CABAC through the entropy sink) — the mirror of
    * [[decodeIntra8x8Mb]] / the CABAC Intra_8x8 branch, sharing their
    * prediction/dequant/inverse kernels so the reconstruction chain is
    * bit-identical to the decoder's. Per 8x8 block the available mode
    * minimizing prediction SAD wins (ties to the lowest index);
    * `pick(blockIdx, best, available)` overrides the choice. */
  private[pipeline] def encodeIntra8x8Mb(sink: MbSink, st: FrameState,
      mx: Int, my: Int, srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte], qp: Int,
      pick: (Int, Int, Seq[Int]) => Int = (_, best, _) => best): Unit = {
    import H264Transform.LumaBlockOrder
    val lumaW = st.lumaW
    val prevFlags = new Array[Boolean](4)
    val rems = new Array[Int](4)
    val lv64s = Array.ofDim[Int](4, 64) // 8x8-scan quantized levels
    var cbpLuma = 0
    // pass 1 (decode order): mode select, quantize, reconstruct — the
    // next block's prediction reads THIS block's reconstruction
    var i8 = 0
    while (i8 < 4) {
      val gx8 = mx * 2 + (i8 % 2); val gy8 = my * 2 + (i8 / 2)
      val gbx = mx * 4 + (i8 % 2) * 2; val gby = my * 4 + (i8 / 2) * 2
      val avail = availableI4Modes(gy8 > 0, gx8 > 0) // same needs as 4x4
      val x0 = gx8 * 8; val y0 = gy8 * 8
      var bestMode = avail.head
      var bestSad = Long.MaxValue
      avail.foreach { m =>
        val p = intra8x8Pred(st, gx8, gy8, m)
        var sad = 0L
        var k = 0
        while (k < 64) {
          sad += math.abs((srcY((y0 + k / 8) * lumaW + x0 + k % 8) & 0xff) - p(k))
          k += 1
        }
        if (sad < bestSad) { bestSad = sad; bestMode = m }
      }
      val mode = pick(i8, bestMode, avail)
      val predM = st.predI4Mode(gbx, gby)
      prevFlags(i8) = mode == predM
      rems(i8) = if (mode < predM) mode else mode - 1
      st.setI4Mode(gbx, gby, mode); st.setI4Mode(gbx + 1, gby, mode)
      st.setI4Mode(gbx, gby + 1, mode); st.setI4Mode(gbx + 1, gby + 1, mode)
      val pred = intra8x8Pred(st, gx8, gy8, mode)
      val diff = new Array[Int](64)
      var k = 0
      while (k < 64) {
        diff(k) = (srcY((y0 + k / 8) * lumaW + x0 + k % 8) & 0xff) - pred(k)
        k += 1
      }
      val q = H264Transform8x8.quant8x8(H264Transform8x8.forward8x8(diff), qp, st.scaling.w8(0))
      k = 0
      while (k < 64) { lv64s(i8)(k) = q(H264Transform8x8.Zigzag8x8(k)); k += 1 }
      val coded = lv64s(i8).exists(_ != 0)
      if (coded) cbpLuma |= 1 << i8
      // per-cell TotalCoeff for later blocks' nC (interleaved split)
      var i4 = 0
      while (i4 < 4) {
        val (bxo, byo) = LumaBlockOrder(i8 * 4 + i4)
        var tc = 0
        var i = 0
        while (i < 16) { if (lv64s(i8)(4 * i + i4) != 0) tc += 1; i += 1 }
        st.setNnzY(mx * 4 + bxo, my * 4 + byo, if (coded) tc else 0)
        i4 += 1
      }
      // reconstruct exactly as the decoder will
      val resid: Array[Int] =
        if (coded) {
          val raster = new Array[Int](64)
          k = 0
          while (k < 64) { raster(H264Transform8x8.Zigzag8x8(k)) = lv64s(i8)(k); k += 1 }
          H264Transform8x8.inverse8x8(H264Transform8x8.dequant8x8(raster, qp, st.scaling.w8(0)))
        } else null
      var py = 0
      while (py < 8) {
        var px = 0
        while (px < 8) {
          val v = pred(py * 8 + px) + (if (resid == null) 0 else resid(py * 8 + px))
          st.yPlane((y0 + py) * lumaW + x0 + px) = clipB(v)
          px += 1
        }
        py += 1
      }
      i8 += 1
    }
    val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr,
      st.cQp(qp))
    val cbp = cbpLuma | (chroma.cbpChroma << 4)
    // pass 2: emission (7.3.5 order — mb_type, transform flag, modes,
    // chroma mode, CBP, qp delta when coded, residual blocks; nC /
    // cbf contexts read only decode-order-earlier state, so emitting
    // after the full grid is set matches the decoder's incremental
    // view)
    sink.mbTypeIntra(st, mx, my, 0, 0) // I_NxN
    sink.t8x8Flag(st, mx, my, flag = true)
    i8 = 0
    while (i8 < 4) {
      sink.i4Mode(prevFlags(i8), rems(i8))
      i8 += 1
    }
    sink.chromaPred(st, mx, my, 0) // intra_chroma_pred_mode = DC
    sink.cbpI4(st, mx, my, cbp)
    if (cbp != 0) sink.qpDelta(0) else sink.qpDeltaSkipped()
    i8 = 0
    while (i8 < 4) {
      if ((cbpLuma & (1 << i8)) != 0)
        sink.luma8x8Out(st, mx, my, i8, lv64s(i8))
      i8 += 1
    }
    chroma.emit(sink)
    st.markMb(mx, my, intra = true, qp)
    st.t8x8MbArr(my * st.wMbs + mx) = true
  }

  /**
   * Encode an ordered frame sequence as one GOP: frame 0 is an IDR
   * picture (compressed Intra_16x16 at `qp`), every later frame a P
   * picture motion-compensated against the previous frame's
   * RECONSTRUCTION (so encoder and decoder reference states agree
   * bit-for-bit — the Intra_4x4 witness device extended to inter).
   * Every P payload carries SPS+PPS+slice, so each access unit is
   * self-describing given its references. Per macroblock the encoder
   * picks an integer-pel SAD-best MV within ±`searchRange` (P_Skip when
   * the reference is refs(0), the MV equals the skip predictor and
   * every residual quantizes to zero); `forcedMv` (quarter-pel units)
   * overrides the search — the spec hook that exercises the
   * half/quarter-pel interpolation paths; `intraEvery` > 0 encodes
   * every Nth macroblock as Intra_16x16 inside the P slice (Table 7-13
   * type − 5), exercising mixed slices.
   *
   * `refFrames` > 1 keeps a DPB ring of that many reconstructions and
   * searches EVERY reference per macroblock (best SAD wins, ties to the
   * lowest ref_idx — the x264 default-shape ref=3 stream our decoder
   * must handle); `forcedRefIdx(mx, my)` dictates the reference per MB
   * (clamped to the refs available at that frame) — the spec hook that
   * pins ref_idx selection and DPB eviction deterministically.
   */
  def encodeGop(frames: Seq[MediaCodecs.Bmp], qp: Int, avcc: Boolean = true,
      searchRange: Int = 4, forcedMv: Option[(Int, Int)] = None,
      intraEvery: Int = 0, refFrames: Int = 1,
      forcedRefIdx: Option[(Int, Int) => Int] = None,
      deblock: Boolean = false, cabac: Boolean = false,
      wpLuma: Option[(Int, Int, Int)] = None): Seq[Array[Byte]] =
    encodeGopImpl(frames, qp, avcc, searchRange, forcedMv, intraEvery,
      refFrames, forcedRefIdx, deblock, cabac, wpLuma)._1

  /** GOP encode + the encoder's own per-frame reconstructed planes —
    * the spec hook pinning decode ≡ encode-time reconstruction. */
  private[graft] def encodeGopForTest(frames: Seq[MediaCodecs.Bmp], qp: Int,
      searchRange: Int = 4, forcedMv: Option[(Int, Int)] = None,
      intraEvery: Int = 0, refFrames: Int = 1,
      forcedRefIdx: Option[(Int, Int) => Int] = None,
      deblock: Boolean = false, cabac: Boolean = false,
      wpLuma: Option[(Int, Int, Int)] = None,
      cqm: Option[CqmCfg] = None)
      : (Seq[Array[Byte]], Seq[(Array[Byte], Array[Byte], Array[Byte])]) = {
    val (ps, sts) = encodeGopImpl(frames, qp, avcc = true, searchRange,
      forcedMv, intraEvery, refFrames, forcedRefIdx, deblock, cabac, wpLuma,
      cqm)
    (ps, sts.map(st => (st.yPlane, st.cbPlane, st.crPlane)))
  }

  private def encodeGopImpl(frames: Seq[MediaCodecs.Bmp], qp: Int,
      avcc: Boolean, searchRange: Int, forcedMv: Option[(Int, Int)],
      intraEvery: Int, refFrames: Int = 1,
      forcedRefIdx: Option[(Int, Int) => Int] = None,
      deblock: Boolean = false, cabac: Boolean = false,
      wpLuma: Option[(Int, Int, Int)] = None,
      cqm: Option[CqmCfg] = None)
      : (Seq[Array[Byte]], Seq[FrameState]) = {
    require(frames.nonEmpty, "empty GOP")
    require(qp >= 0 && qp <= 51, s"qp $qp")
    require(refFrames >= 1 && refFrames <= 16, s"refFrames $refFrames")
    val w0 = frames.head.width; val h0 = frames.head.height
    require(frames.forall(f => f.width == w0 && f.height == h0),
      "GOP frames must share dimensions")
    val gopProfile = if (cqm.isDefined) 100
      else if (cabac) 77 else 66
    val (idrBytes, st0) =
      encodeImpl(frames.head, avcc, qp, intra4x4 = false, (_, b, _) => b,
        refFrames, deblock = deblock,
        profile = gopProfile, cabac = cabac, cqm = cqm)
    val (wMbs, hMbs, cropR, cropB) = mbGeometry(frames.head)
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, cropR, cropB, refFrames,
      profile = gopProfile, cabac = cabac,
      weightedPred = wpLuma.isDefined, cqm = cqm)
    val gopScaling = cqm.map(_.resolved).getOrElse(ScalingLists.Flat)
    val payloads = ArrayBuffer(idrBytes)
    val states = ArrayBuffer(st0)
    // DPB most-recent-first, sliding-window bounded — mirrors the decoder
    var dpb: List[FrameState] = List(st0)
    var i = 1
    while (i < frames.length) {
      val (yP, cbP, crP) = toYuv420(frames(i), st0.wMbs, st0.hMbs)
      val (sliceNal, st) = encodePFrame(yP, cbP, crP, dpb.toIndexedSeq, qp,
        i % 16, searchRange, forcedMv, intraEvery, refFrames, forcedRefIdx,
        deblock = deblock, cabac = cabac, wpLuma = wpLuma,
        scaling = gopScaling)
      payloads += frameNals(avcc, spsNal, ppsNal, sliceNal)
      states += st
      dpb = (st :: dpb).take(refFrames)
      i += 1
    }
    (payloads.toSeq, states.toSeq)
  }

  /**
   * Encode a display-order frame sequence as one GOP WITH B FRAMES
   * (IbbP cadence): every (`bFrames`+1)-th display frame is a reference
   * (IDR then P, each predicting from the previous reference), and the
   * frames between are non-reference B pictures bi-predicting from the
   * surrounding pair (list0 = past, list1 = future — the decoder
   * rebuilds exactly these lists from POC order). Payloads come back in
   * DECODE order (reference before the Bs that need it) with each
   * payload's display index alongside — the reorder a real transport
   * performs. POC type 0 with explicit pic_order_cnt_lsb carries the
   * display order; B pictures write nal_ref_idc 0 (disposable — an
   * error in a B never propagates). Per macroblock the encoder tries
   * L0-only, L1-only, and averaged bi-prediction (best SAD, ties
   * favoring the cheaper single-list modes) and reconstructs with the
   * decoder's own kernels, so parity is plane-exact.
   *
   * @return (payloads in decode order, display index of each payload)
   */
  def encodeGopB(frames: Seq[MediaCodecs.Bmp], qp: Int, bFrames: Int = 1,
      avcc: Boolean = true, searchRange: Int = 4, deblock: Boolean = false,
      cabac: Boolean = false, weightedBipred: Int = 0,
      directTemporal: Boolean = false, pocType1: Boolean = false)
      : (Seq[Array[Byte]], Seq[Int]) = {
    val (p, d, _) = encodeGopBImpl(frames, qp, bFrames, avcc, searchRange,
      deblock, cabac, weightedBipred, directTemporal, pocType1)
    (p, d)
  }

  /** [[encodeGopB]] + the encoder's own per-payload reconstructed
    * planes — the parity spec hook (decode order, like the payloads). */
  private[graft] def encodeGopBForTest(frames: Seq[MediaCodecs.Bmp], qp: Int,
      bFrames: Int = 1, searchRange: Int = 4, deblock: Boolean = false,
      cabac: Boolean = false, weightedBipred: Int = 0,
      directTemporal: Boolean = false, pocType1: Boolean = false,
      cqm: Option[CqmCfg] = None)
      : (Seq[Array[Byte]], Seq[Int], Seq[(Array[Byte], Array[Byte], Array[Byte])]) = {
    val (p, d, sts) = encodeGopBImpl(frames, qp, bFrames, avcc = true, searchRange,
      deblock, cabac, weightedBipred, directTemporal, pocType1, cqm)
    (p, d, sts.map(st => (st.yPlane, st.cbPlane, st.crPlane)))
  }

  private def encodeGopBImpl(frames: Seq[MediaCodecs.Bmp], qp: Int,
      bFrames: Int, avcc: Boolean, searchRange: Int,
      deblock: Boolean = false, cabac: Boolean = false,
      weightedBipred: Int = 0, directTemporal: Boolean = false,
      pocType1: Boolean = false, cqm: Option[CqmCfg] = None)
      : (Seq[Array[Byte]], Seq[Int], Seq[FrameState]) = {
    require(frames.nonEmpty, "empty GOP")
    require(qp >= 0 && qp <= 51, s"qp $qp")
    require(bFrames >= 1, s"bFrames $bFrames (use encodeGop for IPPP)")
    val w0 = frames.head.width; val h0 = frames.head.height
    require(frames.forall(f => f.width == w0 && f.height == h0),
      "GOP frames must share dimensions")
    val n = frames.length
    val step = bFrames + 1
    val refPos = {
      val b = scala.collection.mutable.ArrayBuffer(0 until n by step: _*)
      if (b.last != n - 1) b += n - 1 // the last frame must be a reference
      b.toSeq
    }
    val pocBits = 8 // lsb width; 8.2.1.1 msb repair covers longer GOPs
    val (wMbs, hMbs, cropR, cropB) = mbGeometry(frames.head)
    // POC type 1 (8.2.1.2): the SPS cycle describes the cadence — one
    // reference per `step` display positions at POC stride 2·step, so
    // reference deltas are exactly 0; non-refs land offset_for_non_ref
    // past the previous reference's expected value, so B deltas stay
    // small. The encoder runs the DECODER's own pocType1 accumulator
    // (wrap handling included) and solves delta = desired − expected.
    val t1Cycle = Seq(2 * step)
    val t1OffNonRef = 2 - 2 * step
    val t1Sps = Sps(77, 30, 4, 1, wMbs, hMbs, cropR, cropB, 2, 16, true,
      pocDeltaAlwaysZero = false, t1OffNonRef, t1Cycle)
    val t1State = new PocState
    def t1Delta(desired: Int, idr: Boolean, refIdc: Int, fn: Int): Option[Int] =
      if (!pocType1) None
      else Some(desired - derivePocType1(t1Sps, idr, refIdc, fn, 0, t1State))
    // SPS DPB depth 2 (past + future ref around each B); PPS list
    // defaults sized for the refs=2 P shape — every slice overrides
    // down to its actual 1-deep lists
    val gopProfile = if (cqm.isDefined) 100 else 77
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, cropR, cropB,
      refFrames = 2, pocLsbBits = if (pocType1) 0 else pocBits,
      profile = gopProfile, cabac = cabac, weightedBipredIdc = weightedBipred,
      pocType1 = if (pocType1) Some((t1OffNonRef, t1Cycle)) else None,
      cqm = cqm)
    val gopScaling = cqm.map(_.resolved).getOrElse(ScalingLists.Flat)
    val (idrBytes, st0) = encodeImpl(frames.head, avcc, qp,
      intra4x4 = false, (_, b, _) => b, refFrames = 2,
      pocLsbBits = if (pocType1) 0 else pocBits,
      deblock = deblock, profile = gopProfile, cabac = cabac,
      pocType1Delta = t1Delta(0, idr = true, refIdc = 3, fn = 0),
      pocType1Sps = if (pocType1) Some((t1OffNonRef, t1Cycle)) else None,
      cqm = cqm)
    st0.poc = 0
    val payloads = ArrayBuffer(idrBytes)
    val display = ArrayBuffer(0)
    val states = ArrayBuffer(st0)
    var prevRef = st0
    var prevRefPos = 0
    var refCount = 0
    val maxLsb = 1 << pocBits
    refPos.tail.foreach { pos =>
      refCount += 1
      val (yP, cbP, crP) = toYuv420(frames(pos), wMbs, hMbs)
      val (pNal, stP) = encodePFrame(yP, cbP, crP, IndexedSeq(prevRef), qp,
        refCount % 16, searchRange, None, 0, refFrames = 2,
        pocLsbBits = if (pocType1) 0 else pocBits,
        pocLsb = (2 * pos) % maxLsb, deblock = deblock,
        cabac = cabac,
        pocType1Delta = t1Delta(2 * pos, idr = false, refIdc = 3,
          fn = refCount % 16), scaling = gopScaling)
      stP.poc = 2 * pos
      payloads += frameNals(avcc, spsNal, ppsNal, pNal)
      display += pos
      states += stP
      var bpos = prevRefPos + 1
      while (bpos < pos) {
        val (by, bcb, bcr) = toYuv420(frames(bpos), wMbs, hMbs)
        val (bNal, stB) = encodeBFrame(by, bcb, bcr, prevRef, stP, qp,
          (refCount + 1) % 16, (2 * bpos) % maxLsb,
          if (pocType1) 0 else pocBits, searchRange,
          deblock = deblock, cabac = cabac, wpMode = weightedBipred,
          directTemporal = directTemporal,
          pocType1Delta = t1Delta(2 * bpos, idr = false, refIdc = 0,
            fn = (refCount + 1) % 16), scaling = gopScaling)
        stB.poc = 2 * bpos
        payloads += frameNals(avcc, spsNal, ppsNal, bNal)
        display += bpos
        states += stB
        bpos += 1
      }
      prevRef = stP
      prevRefPos = pos
    }
    (payloads.toSeq, display.toSeq, states.toSeq)
  }

  /** Encode one B slice NAL (16x16 partitions; per-MB L0/L1/Bi by best
    * SAD) against the past (`ref0` = list0) and future (`ref1` = list1)
    * references, reconstructing with the decoder's kernels. Non-ref
    * NAL (nal_ref_idc 0) — carries no dec_ref_pic_marking. */
  /** Fixed explicit-B weight shape the encoder emits under wpMode 1
    * (the witness for explicit bipred decode): luma denom 5 with
    * asymmetric weights/offsets per list, chroma denom 5 likewise. */
  private val BExpWp0 = Array(40, 2, 28, 3, 26, -2)
  private val BExpWp1 = Array(24, -2, 30, -1, 34, 2)

  private def encodeBFrame(srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte], ref0: FrameState, ref1: FrameState, qp: Int,
      frameNum: Int, pocLsb: Int, pocBits: Int, searchRange: Int,
      deblock: Boolean = false, cabac: Boolean = false, wpMode: Int = 0,
      directTemporal: Boolean = false,
      pocType1Delta: Option[Int] = None,
      scaling: ScalingLists = ScalingLists.Flat)
      : (Array[Byte], FrameState) = {
    import H264Transform._
    val wMbs = ref0.wMbs; val hMbs = ref0.hMbs
    val lumaW = wMbs * 16; val lumaH = hMbs * 16
    val st = new FrameState(wMbs, hMbs)
    st.scaling = scaling
    st.poc = pocLsb // implicit-bipred weights read POC distances
    val w = new BitWriter
    // slice_header (7.3.3): B, one reference per list, POC type 0
    w.ue(0) // first_mb_in_slice
    w.ue(6) // slice_type B (all slices in this picture are B)
    w.ue(0) // pps id
    w.u(frameNum & 15, 4) // frame_num (non-ref: value is informational)
    pocType1Delta match {
      case Some(d) => w.se(d) // delta_pic_order_cnt[0] (POC type 1)
      case None => w.u(pocLsb, pocBits) // pic_order_cnt_lsb (type 0)
    }
    // direct_spatial_mv_pred_flag: spatial (8.4.1.2.2) or temporal
    // (8.4.1.2.3) — both derivations are shared with the decoder
    w.u1(if (directTemporal) 0 else 1)
    w.u1(1); w.ue(0); w.ue(0) // override: 1-deep list0 AND list1
    w.u1(0); w.u1(0) // ref_pic_list_modification l0, l1
    if (wpMode == 1) { // explicit bipred: pred_weight_table for BOTH lists
      w.ue(5); w.ue(5) // luma/chroma log2 weight denoms
      Seq(BExpWp0, BExpWp1).foreach { e =>
        w.u1(1); w.se(e(0)); w.se(e(1)) // luma weight/offset
        w.u1(1) // chroma_weight_flag
        w.se(e(2)); w.se(e(3)); w.se(e(4)); w.se(e(5))
      }
      st.wpLogWDy = 5; st.wpLogWDc = 5
      st.wpTab = Array(Array(BExpWp0), Array(BExpWp1))
    }
    if (wpMode == 2) st.wpImplicit = true
    // (no dec_ref_pic_marking: nal_ref_idc 0)
    if (cabac) w.ue(0) // cabac_init_idc
    w.se(qp - 26) // slice_qp_delta
    if (deblock) { w.ue(0); w.se(0); w.se(0) } // filter ON, zero offsets
    else w.ue(1) // disable_deblocking_filter_idc = 1
    var enc: H264Cabac.Enc = null
    var cSink: CabacSink = null
    var cxE: H264Cabac.Ctx = null
    if (cabac) {
      while (!w.byteAligned) w.u1(1) // cabac_alignment_one_bit
      cxE = new H264Cabac.Ctx
      cxE.initPB(0, qp)
      enc = new H264Cabac.Enc(w)
      cSink = new CabacSink(enc, cxE)
      cSink.interMb = true
    }
    var mb = 0
    var skipRun = 0 // pending B_Skip run (emitted before the next coded MB)
    val nMbs = wMbs * hMbs
    while (mb < nMbs) {
      val mx = mb % wMbs; val my = mb / wMbs
      // mode decision: best integer-pel MV per list, then compare
      // L0-only / L1-only / averaged-bi SADs of the real interpolation
      val (v0x, v0y) = searchMv(srcY, ref0.yPlane, lumaW, lumaH, mx, my, searchRange)
      val (v1x, v1y) = searchMv(srcY, ref1.yPlane, lumaW, lumaH, mx, my, searchRange)
      val pred0 = mcLuma(ref0.yPlane, lumaW, lumaH, mx * 16, my * 16, v0x, v0y, 16, 16)
      val pred1 = mcLuma(ref1.yPlane, lumaW, lumaH, mx * 16, my * 16, v1x, v1y, 16, 16)
      var sad0 = 0L; var sad1 = 0L; var sadBi = 0L
      var k = 0
      while (k < 256) {
        val s = srcY((my * 16 + k / 16) * lumaW + mx * 16 + k % 16) & 0xff
        sad0 += math.abs(s - pred0(k))
        sad1 += math.abs(s - pred1(k))
        sadBi += math.abs(s - ((pred0(k) + pred1(k) + 1) >> 1))
        k += 1
      }
      // direct candidate: the decoder's own derivation (spatial
      // 8.4.1.2.2 or temporal 8.4.1.2.3) over the encoder's mirrored
      // grids, so a direct MB's motion needs no bits at all
      val quads =
        if (directTemporal)
          temporalDirectQuads(st, IndexedSeq(ref0), IndexedSeq(ref1), mx, my)
        else spatialDirectMotion(st, IndexedSeq(ref1), mx, my)
      var sadDirect = 0L
      var q = 0
      while (q < 4) {
        val (dv0, dv1) = quads(q)
        val px0 = mx * 16 + (q & 1) * 8; val py0 = my * 16 + (q >> 1) * 8
        val a = dv0.map { case (vx, vy, _) =>
          mcLuma(ref0.yPlane, lumaW, lumaH, px0, py0, vx, vy, 8, 8) }
        val b = dv1.map { case (vx, vy, _) =>
          mcLuma(ref1.yPlane, lumaW, lumaH, px0, py0, vx, vy, 8, 8) }
        val pq = (a, b) match {
          case (Some(x), Some(y)) => Array.tabulate(64)(i => (x(i) + y(i) + 1) >> 1)
          case (Some(x), None) => x
          case (None, other) => other.get
        }
        var kk = 0
        while (kk < 64) {
          val sy = py0 + kk / 8; val sx = px0 + kk % 8
          sadDirect += math.abs((srcY(sy * lumaW + sx) & 0xff) - pq(kk))
          kk += 1
        }
        q += 1
      }
      val useDirect = sadDirect <= sad0 && sadDirect <= sad1 && sadDirect <= sadBi
      val mode =
        if (sad0 <= sad1 && sad0 <= sadBi) BModeL0
        else if (sad1 <= sadBi) BModeL1
        else BModeBi
      val useL0 = !useDirect && (mode == BModeL0 || mode == BModeBi)
      val useL1 = !useDirect && (mode == BModeL1 || mode == BModeBi)
      // neighbor-only predictors: safe to read before this MB's grid
      val (p0x, p0y) = mvPredict(st, mx * 4, my * 4, 4, 0, 0, list = 0)
      val (p1x, p1y) = mvPredict(st, mx * 4, my * 4, 4, 0, 0, list = 1)
      // assemble the prediction into the frame (planes + motion grid)
      if (useDirect)
        applyDirectQuads(st, IndexedSeq(ref0), IndexedSeq(ref1), mx, my, quads)
      else
        mcPartitionB(st,
          if (useL0) Some((ref0, v0x, v0y, 0)) else None,
          if (useL1) Some((ref1, v1x, v1y, 0)) else None,
          mx * 4, my * 4, 4, 4)
      // residual on top of the assembled prediction, reconstructed
      // exactly as the decoder will (the P-encoder pattern)
      val levels = Array.ofDim[Int](16, 16)
      var bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val diff = new Array[Int](16)
        k = 0
        while (k < 16) {
          val o = (my * 16 + byo * 4 + k / 4) * lumaW + mx * 16 + bxo * 4 + k % 4
          diff(k) = (srcY(o) & 0xff) - (st.yPlane(o) & 0xff)
          k += 1
        }
        val q = quant4x4(forward4x4(diff), qp, skipDc = false, st.scaling.w4(3))
        k = 0
        while (k < 16) { levels(bi)(k) = q(Zigzag4x4(k)); k += 1 }
        bi += 1
      }
      val cbpLuma = (0 until 4).foldLeft(0) { (acc, g) =>
        if ((0 until 4).exists(i => levels(g * 4 + i).exists(_ != 0)))
          acc | (1 << g)
        else acc
      }
      val predC = Array.tabulate(2) { c =>
        val plane = if (c == 0) st.cbPlane else st.crPlane
        Array.tabulate(64)(j =>
          plane((my * 8 + j / 8) * (lumaW / 2) + mx * 8 + j % 8) & 0xff)
      }
      val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp),
        predOf = c => predC(c))
      val cbp = cbpLuma | (chroma.cbpChroma << 4)
      val mbI = my * wMbs + mx
      if (useDirect && cbp == 0) {
        // B_Skip: direct motion, zero residual — one run count (CAVLC)
        // or a context-coded flag (CABAC)
        if (cabac) {
          enc.decision(cxE, 24 + skipFlagInc(st, mx, my), 1)
          st.skipMbArr(mbI) = true
          st.bDirectMbArr(mbI) = true
          cSink.qpDeltaSkipped()
        } else skipRun += 1
        markInterNnzZero(st, mx, my)
        st.markMb(mx, my, intra = false, qp)
        mb += 1
      } else {
        if (cabac) {
          enc.decision(cxE, 24 + skipFlagInc(st, mx, my), 0)
          if (useDirect) {
            encodeMbTypeBCabac(enc, cxE, st, mx, my, 0) // B_Direct_16x16
            st.bDirectMbArr(mbI) = true
          } else {
            encodeMbTypeBCabac(enc, cxE, st, mx, my, mode)
            // (no ref_idx fields: both lists are 1 deep)
            if (useL0) {
              encodeMvdCabac(enc, cxE, st, mx * 4, my * 4, 0, 0, v0x - p0x)
              encodeMvdCabac(enc, cxE, st, mx * 4, my * 4, 0, 1, v0y - p0y)
              st.noteMvd(mx * 4, my * 4, 4, 4, 0, v0x - p0x, v0y - p0y)
            }
            if (useL1) {
              encodeMvdCabac(enc, cxE, st, mx * 4, my * 4, 1, 0, v1x - p1x)
              encodeMvdCabac(enc, cxE, st, mx * 4, my * 4, 1, 1, v1y - p1y)
              st.noteMvd(mx * 4, my * 4, 4, 4, 1, v1x - p1x, v1y - p1y)
            }
          }
          cSink.cbpI4(st, mx, my, cbp)
          if (cbp != 0) cSink.qpDelta(0) else cSink.qpDeltaSkipped()
        } else {
          w.ue(skipRun) // mb_skip_run before this coded MB
          skipRun = 0
          if (useDirect) w.ue(0) // B_Direct_16x16
          else {
            w.ue(mode) // mb_type: B_L0_16x16=1 / B_L1_16x16=2 / B_Bi_16x16=3
            // (no ref_idx fields: both lists are 1 deep)
            if (useL0) { w.se(v0x - p0x); w.se(v0y - p0y) }
            if (useL1) { w.se(v1x - p1x); w.se(v1y - p1y) }
          }
          w.ue(CbpInterToCodeNum(cbp))
          if (cbp != 0) w.se(0) // mb_qp_delta
        }
        val sink: MbSink = if (cabac) cSink else new CavlcSink(w)
        bi = 0
        while (bi < 16) {
          val (bxo, byo) = LumaBlockOrder(bi)
          val gbx = mx * 4 + bxo; val gby = my * 4 + byo
          if ((cbpLuma & (1 << (bi >> 2))) != 0) {
            val tc = sink.blockOut(st, CatLuma4x4, levels(bi), 16, gbx, gby, 0)
            st.setNnzY(gbx, gby, tc)
            val rpx = inverse4x4(dequant4x4(unzigzag(levels(bi), 0), qp, skipDc = false, st.scaling.w4(3)))
            var py = 0
            while (py < 4) {
              var px = 0
              while (px < 4) {
                val o = (my * 16 + byo * 4 + py) * lumaW + mx * 16 + bxo * 4 + px
                st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + rpx(py * 4 + px))
                px += 1
              }
              py += 1
            }
          } else st.setNnzY(gbx, gby, 0)
          bi += 1
        }
        chroma.emit(sink)
        st.markMb(mx, my, intra = false, qp)
        mb += 1
      }
      if (cabac) enc.terminate(if (mb == nMbs) 1 else 0) // end_of_slice
    }
    if (cabac) w.alignToByte()
    else {
      if (skipRun > 0) w.ue(skipRun) // trailing run ends the slice
      w.trailing()
    }
    if (deblock) deblockFrame(st, 0, 0) // output filter (non-ref picture)
    // NAL header: forbidden 0, nal_ref_idc 0 (disposable), type 1
    (Array[Byte](0x01.toByte) ++ escape(w.bytes), st)
  }

  /** Encode one P slice NAL from 4:2:0 source planes against the DPB
    * `refs` (index 0 = most recent), returning the slice NAL and the
    * reconstruction (== what the decoder will produce, sharing its
    * MC/transform/CAVLC kernels). With `refFrames` > 1 the slice writes
    * per-MB te(v) ref_idx_l0 fields; when the DPB is still filling the
    * slice overrides the PPS-default list size down to what exists. */
  private def encodePFrame(srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte], refs: IndexedSeq[FrameState], qp: Int,
      frameNum: Int, searchRange: Int, forcedMv: Option[(Int, Int)],
      intraEvery: Int, refFrames: Int = 1,
      forcedRefIdx: Option[(Int, Int) => Int] = None,
      pocLsbBits: Int = 0, pocLsb: Int = 0, deblock: Boolean = false,
      cabac: Boolean = false, wpLuma: Option[(Int, Int, Int)] = None,
      mmco: List[(Int, Int, Int)] = Nil,
      listModL0: List[(Int, Int)] = Nil,
      pocType1Delta: Option[Int] = None,
      scaling: ScalingLists = ScalingLists.Flat)
      : (Array[Byte], FrameState) = {
    import H264Transform._
    require(refs.nonEmpty, "P frame needs at least one reference")
    val nActive = math.min(refFrames, refs.length) // list-0 size this slice
    val wMbs = refs(0).wMbs; val hMbs = refs(0).hMbs
    val lumaW = wMbs * 16; val lumaH = hMbs * 16
    val st = new FrameState(wMbs, hMbs)
    st.scaling = scaling
    val w = new BitWriter
    // slice_header (7.3.3): P, POC type 2
    w.ue(0) // first_mb_in_slice
    w.ue(5) // slice_type P (all slices in this picture are P)
    w.ue(0) // pps id
    w.u(frameNum & 15, 4) // frame_num (log2_max_frame_num = 4)
    if (pocLsbBits > 0) w.u(pocLsb, pocLsbBits) // pic_order_cnt_lsb (type 0)
    pocType1Delta.foreach(w.se) // delta_pic_order_cnt[0] (POC type 1)
    if (nActive != refFrames) { // DPB still filling: override the default
      w.u1(1) // num_ref_idx_active_override_flag
      w.ue(nActive - 1) // num_ref_idx_l0_active_minus1
    } else w.u1(0)
    // ref_pic_list_modification (7.3.3.1): emitted commands must
    // produce exactly the `refs` list the caller reconstructs with
    if (listModL0.nonEmpty) {
      w.u1(1)
      listModL0.foreach { case (idc, v) => w.ue(idc); w.ue(v) }
      w.ue(3)
    } else w.u1(0) // ref_pic_list_modification_flag_l0
    // pred_weight_table (explicit luma weights, neutral chroma) — the
    // x264 weightp shape; the reconstruction below applies the same
    // weights through mcPartition, so parity is by construction
    wpLuma.foreach { case (logWD, ww, oo) =>
      w.ue(logWD) // luma_log2_weight_denom
      w.ue(0) // chroma_log2_weight_denom
      var i = 0
      while (i < nActive) {
        w.u1(1); w.se(ww); w.se(oo) // luma_weight/offset_l0
        w.u1(0) // chroma_weight_l0_flag
        i += 1
      }
      st.wpLogWDy = logWD
      st.wpLogWDc = 0
      st.wpTab = Array(
        Array.fill(nActive)(Array(ww, oo, 1, 0, 1, 0)), Array.empty)
    }
    // dec_ref_pic_marking (7.3.3.3): sliding window, or the caller's
    // MMCO list (7.4.3.3 — the decoder applies it after this picture)
    if (mmco.nonEmpty) {
      w.u1(1) // adaptive_ref_pic_marking_mode_flag
      mmco.foreach { case (op, a1, a2) =>
        w.ue(op)
        if (op == 1 || op == 2 || op == 3 || op == 4 || op == 6) w.ue(a1)
        if (op == 3) w.ue(a2)
      }
      w.ue(0)
    } else w.u1(0) // sliding window
    if (cabac) w.ue(0) // cabac_init_idc
    w.se(qp - 26) // slice_qp_delta
    if (deblock) { w.ue(0); w.se(0); w.se(0) } // filter ON, zero offsets
    else w.ue(1) // disable_deblocking_filter_idc = 1
    // CABAC slice data: alignment ones, then every syntax element
    // rides the arithmetic engine (skip flags per MB, no skip runs)
    var enc: H264Cabac.Enc = null
    var cSink: CabacSink = null
    var cxE: H264Cabac.Ctx = null
    if (cabac) {
      while (!w.byteAligned) w.u1(1) // cabac_alignment_one_bit
      cxE = new H264Cabac.Ctx
      cxE.initPB(0, qp)
      enc = new H264Cabac.Enc(w)
      cSink = new CabacSink(enc, cxE)
      cSink.interMb = true
    }
    // te(v) write for ref_idx_l0: range 1 = single inverted bit
    def writeRefIdx(v: Int): Unit =
      if (nActive == 2) w.u1(1 - v) else w.ue(v)
    var skipRun = 0
    var mb = 0
    val nMbs = wMbs * hMbs
    while (mb < nMbs) {
      val mx = mb % wMbs; val my = mb / wMbs
      if (intraEvery > 0 && mb % intraEvery == 0) {
        if (cabac) {
          enc.decision(cxE, 11 + skipFlagInc(st, mx, my), 0)
          cSink.interMb = false
          encodeIntra16x16Mb(cSink, st, mx, my, srcY, srcCb, srcCr, qp,
            mbTypeOffset = 5)
          cSink.interMb = true
        } else {
          w.ue(skipRun); skipRun = 0
          encodeIntra16x16Mb(new CavlcSink(w), st, mx, my, srcY, srcCb, srcCr,
            qp, mbTypeOffset = 5)
        }
        st.setMv(mx * 4, my * 4, 4, 4, 0, 0, inter = false, refIdx = -1)
      } else {
        // reference selection: forced pattern (clamped to what exists),
        // else best SAD over every active reference, ties to lowest
        // ref_idx (the cheaper code and the spec's default-list bias)
        val (refIdx, vx, vy) = forcedRefIdx match {
          case Some(f) =>
            val ri = math.min(math.max(0, f(mx, my)), nActive - 1)
            val (x, y) = forcedMv.getOrElse(
              searchMv(srcY, refs(ri).yPlane, lumaW, lumaH, mx, my, searchRange))
            (ri, x, y)
          case None if nActive == 1 =>
            val (x, y) = forcedMv.getOrElse(
              searchMv(srcY, refs(0).yPlane, lumaW, lumaH, mx, my, searchRange))
            (0, x, y)
          case None =>
            var best = (0, 0, 0); var bestSad = Long.MaxValue
            var ri = 0
            while (ri < nActive) {
              val (x, y) = forcedMv.getOrElse(
                searchMv(srcY, refs(ri).yPlane, lumaW, lumaH, mx, my, searchRange))
              val sad = sadAt(srcY, refs(ri).yPlane, lumaW, lumaH, mx, my, x, y)
              if (sad < bestSad) { bestSad = sad; best = (ri, x, y) }
              ri += 1
            }
            best
        }
        val ref = refs(refIdx)
        val predYRaw = mcLuma(ref.yPlane, lumaW, lumaH, mx * 16, my * 16,
          vx, vy, 16, 16)
        // residual must be computed against the WEIGHTED prediction —
        // exactly what mcPartition writes into the planes
        val predY = wpLuma match {
          case Some((logWD, ww, oo)) =>
            predYRaw.map(v => clip3(0, 255, st.wpSample(v, ww, oo, logWD)))
          case None => predYRaw
        }
        val predC = Array.tabulate(2)(c =>
          mcChroma(if (c == 0) ref.cbPlane else ref.crPlane, lumaW / 2,
            hMbs * 8, mx * 8, my * 8, vx, vy, 8, 8))
        // luma residual quantization (16-coefficient blocks, no DC split)
        val levels = Array.ofDim[Int](16, 16)
        var bi = 0
        while (bi < 16) {
          val (bxo, byo) = LumaBlockOrder(bi)
          val diff = new Array[Int](16)
          var k = 0
          while (k < 16) {
            val fx = bxo * 4 + (k % 4); val fy = byo * 4 + (k / 4)
            diff(k) = (srcY((my * 16 + fy) * lumaW + mx * 16 + fx) & 0xff) -
              predY(fy * 16 + fx)
            k += 1
          }
          val q = quant4x4(forward4x4(diff), qp, skipDc = false, st.scaling.w4(3))
          k = 0
          while (k < 16) { levels(bi)(k) = q(Zigzag4x4(k)); k += 1 }
          bi += 1
        }
        val cbpLuma = (0 until 4).foldLeft(0) { (acc, g) =>
          if ((0 until 4).exists(i => levels(g * 4 + i).exists(_ != 0)))
            acc | (1 << g)
          else acc
        }
        val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp),
          predOf = c => predC(c))
        val cbp = cbpLuma | (chroma.cbpChroma << 4)
        if (cbp == 0 && refIdx == 0 && (vx, vy) == skipMv(st, mx, my)) {
          // P_Skip: reconstruction IS the MC prediction (refs(0) only)
          if (cabac) {
            enc.decision(cxE, 11 + skipFlagInc(st, mx, my), 1)
            st.skipMbArr(my * wMbs + mx) = true
            cSink.qpDeltaSkipped()
          } else skipRun += 1
          mcPartition(st, ref, mx * 4, my * 4, 4, 4, vx, vy, refIdx = 0)
          markInterNnzZero(st, mx, my)
          st.markMb(mx, my, intra = false, qp)
        } else {
          val (px0, py0) = mvPredict(st, mx * 4, my * 4, 4, 0, refIdx)
          if (cabac) {
            enc.decision(cxE, 11 + skipFlagInc(st, mx, my), 0)
            encodeMbTypePCabac(enc, cxE, 0) // P_L0_16x16
            if (nActive > 1) {
              encodeRefIdxCabac(enc, cxE, st, mx * 4, my * 4, 0, refIdx)
              st.noteRefIdx(mx * 4, my * 4, 4, 4, 0, refIdx)
            }
            encodeMvdCabac(enc, cxE, st, mx * 4, my * 4, 0, 0, vx - px0)
            encodeMvdCabac(enc, cxE, st, mx * 4, my * 4, 0, 1, vy - py0)
            st.noteMvd(mx * 4, my * 4, 4, 4, 0, vx - px0, vy - py0)
            cSink.cbpI4(st, mx, my, cbp)
            if (cbp != 0) cSink.qpDelta(0) else cSink.qpDeltaSkipped()
          } else {
            w.ue(skipRun); skipRun = 0
            w.ue(0) // mb_type P_L0_16x16
            if (nActive > 1) writeRefIdx(refIdx) // ref_idx_l0, te(v)
            w.se(vx - px0); w.se(vy - py0) // mvd_l0
            w.ue(CbpInterToCodeNum(cbp))
            if (cbp != 0) w.se(0) // mb_qp_delta
          }
          // prediction into the planes + MV grid (decoder order), then
          // residual written and reconstructed exactly as the decoder
          val sink: MbSink = if (cabac) cSink else new CavlcSink(w)
          mcPartition(st, ref, mx * 4, my * 4, 4, 4, vx, vy, refIdx)
          bi = 0
          while (bi < 16) {
            val (bxo, byo) = LumaBlockOrder(bi)
            val gbx = mx * 4 + bxo; val gby = my * 4 + byo
            if ((cbpLuma & (1 << (bi >> 2))) != 0) {
              val tc = sink.blockOut(st, CatLuma4x4, levels(bi), 16, gbx, gby, 0)
              st.setNnzY(gbx, gby, tc)
              val rpx = inverse4x4(
                dequant4x4(unzigzag(levels(bi), 0), qp, skipDc = false, st.scaling.w4(3)))
              val ax = mx * 16 + bxo * 4; val ay = my * 16 + byo * 4
              var py = 0
              while (py < 4) {
                var px = 0
                while (px < 4) {
                  val o = (ay + py) * lumaW + ax + px
                  st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + rpx(py * 4 + px))
                  px += 1
                }
                py += 1
              }
            } else st.setNnzY(gbx, gby, 0)
            bi += 1
          }
          chroma.emit(sink)
          st.markMb(mx, my, intra = false, qp)
        }
      }
      if (cabac) enc.terminate(if (mb == nMbs - 1) 1 else 0) // end_of_slice
      mb += 1
    }
    if (cabac) w.alignToByte()
    else {
      if (skipRun > 0) w.ue(skipRun) // trailing skip run ends the slice
      w.trailing()
    }
    if (deblock) deblockFrame(st, 0, 0)
    (Array[Byte](0x61.toByte) ++ escape(w.bytes), st)
  }

  /** Spec hook: encode ONE P frame from explicit 4:2:0 source planes
    * against explicit reference planes (uncropped wMbs*16 x hMbs*16),
    * then decode it back through the real GOP decoder with the same
    * reference seeded. Returns (P payload with SPS+PPS, encoder
    * reconstruction planes, decoder planes or None). Lets specs pin
    * plane-exact parity for forced fractional MVs, all-skip frames
    * (src == ref), and mixed intra-in-P slices without the lossy
    * RGB<->YCbCr hop in between. */
  private[graft] def pRoundTripForTest(srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte], refY: Array[Byte], refCb: Array[Byte],
      refCr: Array[Byte], wMbs: Int, hMbs: Int, qp: Int,
      searchRange: Int = 4, forcedMv: Option[(Int, Int)] = None,
      intraEvery: Int = 0)
      : (Array[Byte], (Array[Byte], Array[Byte], Array[Byte]),
         Option[(Array[Byte], Array[Byte], Array[Byte])]) = {
    val ref = new FrameState(wMbs, hMbs)
    System.arraycopy(refY, 0, ref.yPlane, 0, refY.length)
    System.arraycopy(refCb, 0, ref.cbPlane, 0, refCb.length)
    System.arraycopy(refCr, 0, ref.crPlane, 0, refCr.length)
    val (slice, st) = encodePFrame(srcY, srcCb, srcCr, IndexedSeq(ref), qp, 1,
      searchRange, forcedMv, intraEvery)
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, 0, 0)
    val payload = frameNals(avcc = true, spsNal, ppsNal, slice)
    val g = new GopDecoder
    g.seed(Sps(66, 30, 4, 2, wMbs, hMbs, 0, 0), Pps(entropyCabac = false, 26,
      deblockingControlPresent = true), List(ref))
    val dec =
      try g.decodeAuYuv(payload).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    (payload, (st.yPlane, st.cbPlane, st.crPlane), dec)
  }

  /** Spec hook: encode one P frame where EVERY macroblock's partition
    * shape and motion vectors are dictated by `plan(mx, my) = (mbType
    * 0..4, subTypes for P_8x8, mvs in partition order, quarter-pel)` —
    * the witness for the decoder's 16x8 / 8x16 / P_8x8 (all four
    * sub_mb_types) paths, which the production encoder (16x16-only)
    * never emits. Same seed-decode parity contract as
    * [[pRoundTripForTest]]. */
  private[graft] def pPartitionRoundTripForTest(srcY: Array[Byte],
      srcCb: Array[Byte], srcCr: Array[Byte], refY: Array[Byte],
      refCb: Array[Byte], refCr: Array[Byte], wMbs: Int, hMbs: Int, qp: Int,
      plan: (Int, Int) => (Int, Seq[Int], Seq[(Int, Int)]),
      cabac: Boolean = false)
      : (Array[Byte], (Array[Byte], Array[Byte], Array[Byte]),
         Option[(Array[Byte], Array[Byte], Array[Byte])]) = {
    import H264Transform._
    val ref = new FrameState(wMbs, hMbs)
    System.arraycopy(refY, 0, ref.yPlane, 0, refY.length)
    System.arraycopy(refCb, 0, ref.cbPlane, 0, refCb.length)
    System.arraycopy(refCr, 0, ref.crPlane, 0, refCr.length)
    val st = new FrameState(wMbs, hMbs)
    val lumaW = wMbs * 16
    val w = new BitWriter
    w.ue(0); w.ue(5); w.ue(0) // first_mb, slice_type P, pps id
    w.u(1, 4) // frame_num
    w.u1(0); w.u1(0); w.u1(0) // ref override / list mod / adaptive marking
    if (cabac) w.ue(0) // cabac_init_idc
    w.se(qp - 26)
    w.ue(1) // disable deblocking
    var enc: H264Cabac.Enc = null
    var cSink: CabacSink = null
    var cxE: H264Cabac.Ctx = null
    if (cabac) {
      while (!w.byteAligned) w.u1(1)
      cxE = new H264Cabac.Ctx; cxE.initPB(0, qp)
      enc = new H264Cabac.Enc(w)
      cSink = new CabacSink(enc, cxE)
      cSink.interMb = true
    }
    val sink: MbSink = if (cabac) cSink else new CavlcSink(w)
    val nMbsAll = wMbs * hMbs
    var mb = 0
    while (mb < nMbsAll) {
      val mx = mb % wMbs; val my = mb / wMbs
      val bx0 = mx * 4; val by0 = my * 4
      val (mbType, subTypes, mvs) = plan(mx, my)
      if (cabac) {
        enc.decision(cxE, 11 + skipFlagInc(st, mx, my), 0) // mb_skip_flag
        require(mbType != 4, "P_8x8ref0 has no CABAC binarization")
        encodeMbTypePCabac(enc, cxE, mbType)
      } else {
        w.ue(0) // mb_skip_run
        w.ue(mbType)
      }
      val it = mvs.iterator
      // partitions in decode order: predict -> mvd -> MC (prediction
      // lands in the planes; residual rides on top, as in the decoder)
      def part(bx: Int, by: Int, w4: Int, h4: Int, kind: Int): Unit = {
        val (vx, vy) = it.next()
        val (px, py) = mvPredict(st, bx, by, w4, kind, 0)
        if (cabac) {
          encodeMvdCabac(enc, cxE, st, bx, by, 0, 0, vx - px)
          encodeMvdCabac(enc, cxE, st, bx, by, 0, 1, vy - py)
          st.noteMvd(bx, by, w4, h4, 0, vx - px, vy - py)
        } else { w.se(vx - px); w.se(vy - py) }
        mcPartition(st, ref, bx, by, w4, h4, vx, vy)
      }
      mbType match {
        case 0 => part(bx0, by0, 4, 4, 0)
        case 1 => part(bx0, by0, 4, 2, 1); part(bx0, by0 + 2, 4, 2, 2)
        case 2 => part(bx0, by0, 2, 4, 3); part(bx0 + 2, by0, 2, 4, 4)
        case 3 | 4 =>
          require(subTypes.length == 4, "P_8x8 needs 4 sub_mb_types")
          if (cabac) subTypes.foreach(t => encodeSubMbTypePCabac(enc, cxE, t))
          else subTypes.foreach(t => w.ue(t))
          var sb = 0
          while (sb < 4) {
            val sbx = bx0 + (sb % 2) * 2; val sby = by0 + (sb / 2) * 2
            subTypes(sb) match {
              case 0 => part(sbx, sby, 2, 2, 0)
              case 1 => part(sbx, sby, 2, 1, 0); part(sbx, sby + 1, 2, 1, 0)
              case 2 => part(sbx, sby, 1, 2, 0); part(sbx + 1, sby, 1, 2, 0)
              case _ => var k = 0
                while (k < 4) {
                  part(sbx + (k % 2), sby + (k / 2), 1, 1, 0); k += 1
                }
            }
            sb += 1
          }
        case t => throw new H264Format(s"bad plan mb_type $t")
      }
      require(!it.hasNext, s"plan at ($mx,$my) supplied too many MVs")
      // residual vs the assembled prediction now in the planes
      val levels = Array.ofDim[Int](16, 16)
      var bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val diff = new Array[Int](16)
        var k = 0
        while (k < 16) {
          val o = (my * 16 + byo * 4 + k / 4) * lumaW + mx * 16 + bxo * 4 + k % 4
          diff(k) = (srcY(o) & 0xff) - (st.yPlane(o) & 0xff)
          k += 1
        }
        val q = quant4x4(forward4x4(diff), qp, skipDc = false, st.scaling.w4(3))
        k = 0
        while (k < 16) { levels(bi)(k) = q(Zigzag4x4(k)); k += 1 }
        bi += 1
      }
      val cbpLuma = (0 until 4).foldLeft(0) { (acc, g) =>
        if ((0 until 4).exists(i => levels(g * 4 + i).exists(_ != 0)))
          acc | (1 << g)
        else acc
      }
      val predC = Array.tabulate(2) { c =>
        val plane = if (c == 0) st.cbPlane else st.crPlane
        Array.tabulate(64)(k =>
          plane((my * 8 + k / 8) * (lumaW / 2) + mx * 8 + k % 8) & 0xff)
      }
      val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp),
        predOf = c => predC(c))
      val cbp = cbpLuma | (chroma.cbpChroma << 4)
      if (cabac) {
        cSink.cbpI4(st, mx, my, cbp)
        if (cbp != 0) cSink.qpDelta(0) else cSink.qpDeltaSkipped()
      } else {
        w.ue(CbpInterToCodeNum(cbp))
        if (cbp != 0) w.se(0) // mb_qp_delta
      }
      bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val gbx = mx * 4 + bxo; val gby = my * 4 + byo
        if ((cbpLuma & (1 << (bi >> 2))) != 0) {
          val tc = sink.blockOut(st, CatLuma4x4, levels(bi), 16, gbx, gby, 0)
          st.setNnzY(gbx, gby, tc)
          val rpx = inverse4x4(dequant4x4(unzigzag(levels(bi), 0), qp, skipDc = false, st.scaling.w4(3)))
          var py = 0
          while (py < 4) {
            var px = 0
            while (px < 4) {
              val o = (my * 16 + byo * 4 + py) * lumaW + mx * 16 + bxo * 4 + px
              st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + rpx(py * 4 + px))
              px += 1
            }
            py += 1
          }
        } else st.setNnzY(gbx, gby, 0)
        bi += 1
      }
      chroma.emit(sink)
      st.markMb(mx, my, intra = false, qp)
      if (cabac) enc.terminate(if (mb == nMbsAll - 1) 1 else 0)
      mb += 1
    }
    if (cabac) w.alignToByte() else w.trailing()
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, 0, 0, cabac = cabac,
      profile = if (cabac) 77 else 66)
    val payload = frameNals(avcc = true, spsNal, ppsNal,
      Array[Byte](0x61.toByte) ++ escape(w.bytes))
    val g = new GopDecoder
    g.seed(Sps(if (cabac) 77 else 66, 30, 4, 2, wMbs, hMbs, 0, 0),
      Pps(entropyCabac = cabac, 26, deblockingControlPresent = true),
      List(ref))
    val dec =
      try g.decodeAuYuv(payload).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    (payload, (st.yPlane, st.cbPlane, st.crPlane), dec)
  }

  /** Spec hook: encode one P frame (16x16 partitions, forced MVs)
    * whose residual rides the 8x8 TRANSFORM (transform_size_8x8_flag,
    * high profile) — the witness for the inter-8x8 decode path the
    * production encoder never emits: flag parse after the inter CBP,
    * interleaved-CAVLC 8x8 residual added onto the MC prediction, and
    * the 8x8-grid deblock bookkeeping. Same seed-decode parity
    * contract as the other partition hooks. */
  private[graft] def pInter8x8RoundTripForTest(srcY: Array[Byte],
      srcCb: Array[Byte], srcCr: Array[Byte], refY: Array[Byte],
      refCb: Array[Byte], refCr: Array[Byte], wMbs: Int, hMbs: Int, qp: Int,
      mvOf: (Int, Int) => (Int, Int), cabac: Boolean = false,
      cqm: Option[CqmCfg] = None)
      : (Array[Byte], (Array[Byte], Array[Byte], Array[Byte]),
         Option[(Array[Byte], Array[Byte], Array[Byte])]) = {
    val ref = new FrameState(wMbs, hMbs)
    System.arraycopy(refY, 0, ref.yPlane, 0, refY.length)
    System.arraycopy(refCb, 0, ref.cbPlane, 0, refCb.length)
    System.arraycopy(refCr, 0, ref.crPlane, 0, refCr.length)
    val st = new FrameState(wMbs, hMbs)
    st.scaling = cqm.map(_.resolved).getOrElse(ScalingLists.Flat)
    st.t8x8Allowed = true
    val lumaW = wMbs * 16
    val w = new BitWriter
    w.ue(0); w.ue(5); w.ue(0) // first_mb, slice_type P, pps id
    w.u(1, 4) // frame_num
    w.u1(0); w.u1(0); w.u1(0) // ref override / list mod / adaptive marking
    if (cabac) w.ue(0) // cabac_init_idc
    w.se(qp - 26)
    w.ue(1) // disable deblocking
    var enc: H264Cabac.Enc = null
    var cSink: CabacSink = null
    var cxE: H264Cabac.Ctx = null
    if (cabac) {
      while (!w.byteAligned) w.u1(1)
      cxE = new H264Cabac.Ctx; cxE.initPB(0, qp)
      enc = new H264Cabac.Enc(w)
      cSink = new CabacSink(enc, cxE)
      cSink.interMb = true
    }
    val sink: MbSink = if (cabac) cSink else new CavlcSink(w)
    var mb = 0
    val nMbs = wMbs * hMbs
    while (mb < nMbs) {
      val mx = mb % wMbs; val my = mb / wMbs
      if (cabac) {
        enc.decision(cxE, 11 + skipFlagInc(st, mx, my), 0) // mb_skip_flag
        encodeMbTypePCabac(enc, cxE, 0) // P_L0_16x16 (1-ref: no ref_idx)
      } else {
        w.ue(0) // mb_skip_run
        w.ue(0) // mb_type P_L0_16x16
      }
      val (vx, vy) = mvOf(mx, my)
      val (px, py) = mvPredict(st, mx * 4, my * 4, 4, 0, 0)
      if (cabac) {
        encodeMvdCabac(enc, cxE, st, mx * 4, my * 4, 0, 0, vx - px)
        encodeMvdCabac(enc, cxE, st, mx * 4, my * 4, 0, 1, vy - py)
        st.noteMvd(mx * 4, my * 4, 4, 4, 0, vx - px, vy - py)
      } else { w.se(vx - px); w.se(vy - py) }
      mcPartition(st, ref, mx * 4, my * 4, 4, 4, vx, vy)
      // 8x8-transform residual vs the MC prediction now in the plane
      val lv64s = Array.ofDim[Int](4, 64)
      var cbpLuma = 0
      var i8 = 0
      while (i8 < 4) {
        val x0 = (mx * 2 + (i8 % 2)) * 8; val y0 = (my * 2 + (i8 / 2)) * 8
        val diff = new Array[Int](64)
        var k = 0
        while (k < 64) {
          val o = (y0 + k / 8) * lumaW + x0 + k % 8
          diff(k) = (srcY(o) & 0xff) - (st.yPlane(o) & 0xff)
          k += 1
        }
        val q = H264Transform8x8.quant8x8(H264Transform8x8.forward8x8(diff), qp, st.scaling.w8(1))
        k = 0
        while (k < 64) { lv64s(i8)(k) = q(H264Transform8x8.Zigzag8x8(k)); k += 1 }
        if (lv64s(i8).exists(_ != 0)) cbpLuma |= 1 << i8
        i8 += 1
      }
      val predC = Array.tabulate(2) { c =>
        val plane = if (c == 0) st.cbPlane else st.crPlane
        Array.tabulate(64)(k =>
          plane((my * 8 + k / 8) * (lumaW / 2) + mx * 8 + k % 8) & 0xff)
      }
      val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp),
        predOf = c => predC(c))
      val cbp = cbpLuma | (chroma.cbpChroma << 4)
      if (cabac) {
        cSink.cbpI4(st, mx, my, cbp)
        if (cbpLuma != 0) cSink.t8x8Flag(st, mx, my, flag = true)
        if (cbp != 0) cSink.qpDelta(0) else cSink.qpDeltaSkipped()
      } else {
        w.ue(CbpInterToCodeNum(cbp))
        if (cbpLuma != 0) w.u1(1) // transform_size_8x8_flag
        if (cbp != 0) w.se(0) // mb_qp_delta
      }
      i8 = 0
      while (i8 < 4) {
        if ((cbpLuma & (1 << i8)) != 0) {
          sink.luma8x8Out(st, mx, my, i8, lv64s(i8))
          val raster = new Array[Int](64)
          var k = 0
          while (k < 64) { raster(H264Transform8x8.Zigzag8x8(k)) = lv64s(i8)(k); k += 1 }
          val resid = H264Transform8x8.inverse8x8(
            H264Transform8x8.dequant8x8(raster, qp, st.scaling.w8(1)))
          val x0 = (mx * 2 + (i8 % 2)) * 8; val y0 = (my * 2 + (i8 / 2)) * 8
          var k2 = 0
          while (k2 < 64) {
            val o = (y0 + k2 / 8) * lumaW + x0 + k2 % 8
            st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + resid(k2))
            k2 += 1
          }
        } else zero8x8Nnz(st, mx, my, i8)
        i8 += 1
      }
      if (cbpLuma != 0) st.t8x8MbArr(my * st.wMbs + mx) = true
      chroma.emit(sink)
      st.markMb(mx, my, intra = false, qp)
      if (cabac) enc.terminate(if (mb == nMbs - 1) 1 else 0)
      mb += 1
    }
    if (cabac) w.alignToByte() else w.trailing()
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, 0, 0, profile = 100,
      cabac = cabac, t8x8 = true, cqm = cqm)
    val payload = frameNals(avcc = true, spsNal, ppsNal,
      Array[Byte](0x61.toByte) ++ escape(w.bytes))
    val g = new GopDecoder
    g.seed(Sps(100, 30, 4, 2, wMbs, hMbs, 0, 0),
      Pps(entropyCabac = cabac, 26, deblockingControlPresent = true,
        transform8x8Mode = true), List(ref))
    val dec =
      try g.decodeAuYuv(payload).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    (payload, (st.yPlane, st.cbPlane, st.crPlane), dec)
  }

  /** Spec hook: the x264 weightp=2 P-slice shape END TO END —
    * ref_pic_list_modification DUPLICATES the newest reference into
    * both list-0 slots (the second command reaches the same PicNum by
    * wrapping MaxFrameNum, exactly how x264 does it), and an explicit
    * pred_weight_table gives each duplicate DIFFERENT luma weights;
    * each macroblock then selects its weight variant via ref_idx.
    * Decode parity pins the modification arithmetic, the duplicate
    * handling, and the per-reference weighting together. */
  private[graft] def pWeightpRoundTripForTest(srcY: Array[Byte],
      srcCb: Array[Byte], srcCr: Array[Byte], refY: Array[Byte],
      refCb: Array[Byte], refCr: Array[Byte], oldY: Array[Byte],
      oldCb: Array[Byte], oldCr: Array[Byte], wMbs: Int, hMbs: Int, qp: Int,
      mvOf: (Int, Int) => (Int, Int))
      : (Array[Byte], (Array[Byte], Array[Byte], Array[Byte]),
         Option[(Array[Byte], Array[Byte], Array[Byte])]) = {
    import H264Transform._
    def mkRef(y: Array[Byte], cb: Array[Byte], cr: Array[Byte],
        fn: Int): FrameState = {
      val f = new FrameState(wMbs, hMbs)
      System.arraycopy(y, 0, f.yPlane, 0, y.length)
      System.arraycopy(cb, 0, f.cbPlane, 0, cb.length)
      System.arraycopy(cr, 0, f.crPlane, 0, cr.length)
      f.frameNum = fn
      f
    }
    val refNew = mkRef(refY, refCb, refCr, fn = 1) // default list head
    val refOld = mkRef(oldY, oldCb, oldCr, fn = 0)
    val st = new FrameState(wMbs, hMbs)
    val lumaW = wMbs * 16
    val w = new BitWriter
    w.ue(0); w.ue(5); w.ue(0) // first_mb, slice_type P, pps id
    w.u(2, 4) // frame_num = 2
    w.u1(1); w.ue(1) // num_ref_idx override: l0 active = 2
    // ref_pic_list_modification: [refNew, refOld] -> [refNew, refNew]
    w.u1(1)
    w.ue(0); w.ue(0) // idc 0, abs_diff 1: PicNum 1 (refNew) to index 0
    w.ue(0); w.ue(15) // idc 0, abs_diff 16: wraps BACK to PicNum 1 — dup
    w.ue(3) // end
    // pred_weight_table: different luma weights per duplicate
    val wp0 = (40, 2); val wp1 = (24, -2)
    w.ue(5); w.ue(0) // luma denom 5, chroma denom 0
    Seq(wp0, wp1).foreach { case (ww, oo) =>
      w.u1(1); w.se(ww); w.se(oo) // luma weight/offset
      w.u1(0) // no chroma weights
    }
    w.u1(0) // adaptive_ref_pic_marking
    w.se(qp - 26)
    w.ue(1) // disable deblocking
    st.wpLogWDy = 5; st.wpLogWDc = 0
    st.wpTab = Array(Array(
      Array(wp0._1, wp0._2, 1, 0, 1, 0),
      Array(wp1._1, wp1._2, 1, 0, 1, 0)), Array.empty)
    var mb = 0
    while (mb < wMbs * hMbs) {
      val mx = mb % wMbs; val my = mb / wMbs
      val refIdx = (mx + my) % 2 // alternate the weight variant
      w.ue(0) // mb_skip_run
      w.ue(0) // mb_type P_L0_16x16
      w.u1(1 - refIdx) // ref_idx_l0, te(v) range 1
      val (vx, vy) = mvOf(mx, my)
      val (px, py) = mvPredict(st, mx * 4, my * 4, 4, 0, refIdx)
      w.se(vx - px); w.se(vy - py)
      // both list entries are refNew — the weight differs by index
      mcPartition(st, refNew, mx * 4, my * 4, 4, 4, vx, vy, refIdx)
      val levels = Array.ofDim[Int](16, 16)
      var bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val diff = new Array[Int](16)
        var k = 0
        while (k < 16) {
          val o = (my * 16 + byo * 4 + k / 4) * lumaW + mx * 16 + bxo * 4 + k % 4
          diff(k) = (srcY(o) & 0xff) - (st.yPlane(o) & 0xff)
          k += 1
        }
        val q = quant4x4(forward4x4(diff), qp, skipDc = false, st.scaling.w4(3))
        k = 0
        while (k < 16) { levels(bi)(k) = q(Zigzag4x4(k)); k += 1 }
        bi += 1
      }
      val cbpLuma = (0 until 4).foldLeft(0) { (acc, g) =>
        if ((0 until 4).exists(i => levels(g * 4 + i).exists(_ != 0)))
          acc | (1 << g)
        else acc
      }
      val predC = Array.tabulate(2) { c =>
        val plane = if (c == 0) st.cbPlane else st.crPlane
        Array.tabulate(64)(k =>
          plane((my * 8 + k / 8) * (lumaW / 2) + mx * 8 + k % 8) & 0xff)
      }
      val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp),
        predOf = c => predC(c))
      val cbp = cbpLuma | (chroma.cbpChroma << 4)
      w.ue(CbpInterToCodeNum(cbp))
      if (cbp != 0) w.se(0)
      bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val gbx = mx * 4 + bxo; val gby = my * 4 + byo
        if ((cbpLuma & (1 << (bi >> 2))) != 0) {
          val tc = H264Cavlc.encodeBlock(w, levels(bi), 16, st.lumaNc(gbx, gby))
          st.setNnzY(gbx, gby, tc)
          val rpx = inverse4x4(dequant4x4(unzigzag(levels(bi), 0), qp, skipDc = false, st.scaling.w4(3)))
          var py2 = 0
          while (py2 < 4) {
            var px2 = 0
            while (px2 < 4) {
              val o = (my * 16 + byo * 4 + py2) * lumaW + mx * 16 + bxo * 4 + px2
              st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + rpx(py2 * 4 + px2))
              px2 += 1
            }
            py2 += 1
          }
        } else st.setNnzY(gbx, gby, 0)
        bi += 1
      }
      chroma.emit(w)
      st.markMb(mx, my, intra = false, qp)
      mb += 1
    }
    w.trailing()
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, 0, 0, refFrames = 2,
      weightedPred = true)
    val payload = frameNals(avcc = true, spsNal, ppsNal,
      Array[Byte](0x61.toByte) ++ escape(w.bytes))
    val g = new GopDecoder
    g.seed(Sps(66, 30, 4, 2, wMbs, hMbs, 0, 0, 2),
      Pps(entropyCabac = false, 26, deblockingControlPresent = true,
        weightedPred = true, numRefIdxL0Default = 1), List(refNew, refOld))
    val dec =
      try g.decodeAuYuv(payload).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    (payload, (st.yPlane, st.cbPlane, st.crPlane), dec)
  }

  /** Luma SAD of one macroblock against an arbitrary (possibly
    * fractional) MV — the multi-reference selection metric: unlike
    * [[searchMv]]'s integer-pel scan, this prices the actual
    * interpolated prediction, so a forced fractional MV compares
    * references fairly. */
  private def sadAt(srcY: Array[Byte], refY: Array[Byte], lumaW: Int,
      lumaH: Int, mx: Int, my: Int, vx: Int, vy: Int): Long = {
    val pred = mcLuma(refY, lumaW, lumaH, mx * 16, my * 16, vx, vy, 16, 16)
    var sad = 0L
    var k = 0
    while (k < 256) {
      sad += math.abs(
        (srcY((my * 16 + k / 16) * lumaW + mx * 16 + k % 16) & 0xff) - pred(k))
      k += 1
    }
    sad
  }

  /** Spec hook: encode one B frame where EVERY macroblock's Table 7-14
    * shape (types 1-21) and per-list quarter-pel motion vectors are
    * dictated by `plan(mx, my) = (mbType, mvsL0, mvsL1)` — the witness
    * for the decoder's two-partition B paths (16x8/8x16 with every
    * L0/L1/Bi combination), which the production encoder (16x16-only)
    * never emits. `ref0*` planes = the PAST reference (list 0, POC 0),
    * `ref1*` = the FUTURE one (list 1, POC 4; the slice carries POC 2);
    * both lists 1-deep. Same seed-decode parity contract as
    * [[pPartitionRoundTripForTest]]. */
  private[graft] def bPartitionRoundTripForTest(srcY: Array[Byte],
      srcCb: Array[Byte], srcCr: Array[Byte],
      ref0Y: Array[Byte], ref0Cb: Array[Byte], ref0Cr: Array[Byte],
      ref1Y: Array[Byte], ref1Cb: Array[Byte], ref1Cr: Array[Byte],
      wMbs: Int, hMbs: Int, qp: Int,
      plan: (Int, Int) => (Int, Seq[(Int, Int)], Seq[(Int, Int)]))
      : (Array[Byte], (Array[Byte], Array[Byte], Array[Byte]),
         Option[(Array[Byte], Array[Byte], Array[Byte])]) = {
    import H264Transform._
    def mkRef(y: Array[Byte], cb: Array[Byte], cr: Array[Byte], poc: Int)
        : FrameState = {
      val f = new FrameState(wMbs, hMbs)
      System.arraycopy(y, 0, f.yPlane, 0, y.length)
      System.arraycopy(cb, 0, f.cbPlane, 0, cb.length)
      System.arraycopy(cr, 0, f.crPlane, 0, cr.length)
      f.poc = poc
      f
    }
    val ref0 = mkRef(ref0Y, ref0Cb, ref0Cr, poc = 0)
    val ref1 = mkRef(ref1Y, ref1Cb, ref1Cr, poc = 4)
    val st = new FrameState(wMbs, hMbs)
    val lumaW = wMbs * 16
    val w = new BitWriter
    w.ue(0); w.ue(6); w.ue(0) // first_mb, slice_type B, pps id
    w.u(1, 4) // frame_num
    w.u(2, 8) // pic_order_cnt_lsb (between the refs' 0 and 4)
    w.u1(0) // direct_spatial_mv_pred_flag
    w.u1(1); w.ue(0); w.ue(0) // override: 1-deep list0 and list1
    w.u1(0); w.u1(0) // ref_pic_list_modification l0, l1
    w.se(qp - 26)
    w.ue(1) // disable deblocking
    var mb = 0
    while (mb < wMbs * hMbs) {
      val mx = mb % wMbs; val my = mb / wMbs
      val bx0 = mx * 4; val by0 = my * 4
      val (mbType, mvs0, mvs1) = plan(mx, my)
      val (modes, is16x8) = bMbPartModes(mbType)
      val parts: Seq[(Int, Int, Int, Int, Int)] =
        if (modes.length == 1) Seq((bx0, by0, 4, 4, 0))
        else if (is16x8) Seq((bx0, by0, 4, 2, 1), (bx0, by0 + 2, 4, 2, 2))
        else Seq((bx0, by0, 2, 4, 3), (bx0 + 2, by0, 2, 4, 4))
      def usesL0(m: Int) = m == BModeL0 || m == BModeBi
      def usesL1(m: Int) = m == BModeL1 || m == BModeBi
      w.ue(0) // mb_skip_run
      w.ue(mbType)
      // stage 1: predictors + motion grid in the decoder's
      // RECONSTRUCTION order (partition 1's predictors see partition
      // 0's grid — the grid, not the pixels, drives 8.4.1.3)
      val it0 = mvs0.iterator; val it1 = mvs1.iterator
      val resolved = parts.zipWithIndex.map { case ((bx, by, w4, h4, kind), pi) =>
        val m = modes(pi)
        val v0 =
          if (usesL0(m)) {
            val (vx, vy) = it0.next()
            val (px, py) = mvPredict(st, bx, by, w4, kind, 0, list = 0)
            Some((vx, vy, vx - px, vy - py))
          } else None
        val v1 =
          if (usesL1(m)) {
            val (vx, vy) = it1.next()
            val (px, py) = mvPredict(st, bx, by, w4, kind, 0, list = 1)
            Some((vx, vy, vx - px, vy - py))
          } else None
        st.setMvB(bx, by, w4, h4,
          v0.map(t => (t._1, t._2, 0)), v1.map(t => (t._1, t._2, 0)))
        (bx, by, w4, h4, v0, v1)
      }
      require(!it0.hasNext && !it1.hasNext, s"plan at ($mx,$my) MV count mismatch")
      // stage 2: mvds in STREAM order (all l0 partitions, then all l1)
      resolved.foreach { case (_, _, _, _, v0, _) =>
        v0.foreach { case (_, _, dx, dy) => w.se(dx); w.se(dy) } }
      resolved.foreach { case (_, _, _, _, _, v1) =>
        v1.foreach { case (_, _, dx, dy) => w.se(dx); w.se(dy) } }
      // stage 3: MC in partition order (setMvB re-writes the same grid)
      resolved.foreach { case (bx, by, w4, h4, v0, v1) =>
        mcPartitionB(st,
          v0.map { case (vx, vy, _, _) => (ref0, vx, vy, 0) },
          v1.map { case (vx, vy, _, _) => (ref1, vx, vy, 0) },
          bx, by, w4, h4)
      }
      // residual vs the assembled prediction (the P-hook pattern)
      val levels = Array.ofDim[Int](16, 16)
      var bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val diff = new Array[Int](16)
        var k = 0
        while (k < 16) {
          val o = (my * 16 + byo * 4 + k / 4) * lumaW + mx * 16 + bxo * 4 + k % 4
          diff(k) = (srcY(o) & 0xff) - (st.yPlane(o) & 0xff)
          k += 1
        }
        val q = quant4x4(forward4x4(diff), qp, skipDc = false, st.scaling.w4(3))
        k = 0
        while (k < 16) { levels(bi)(k) = q(Zigzag4x4(k)); k += 1 }
        bi += 1
      }
      val cbpLuma = (0 until 4).foldLeft(0) { (acc, g) =>
        if ((0 until 4).exists(i => levels(g * 4 + i).exists(_ != 0)))
          acc | (1 << g)
        else acc
      }
      val predC = Array.tabulate(2) { c =>
        val plane = if (c == 0) st.cbPlane else st.crPlane
        Array.tabulate(64)(k =>
          plane((my * 8 + k / 8) * (lumaW / 2) + mx * 8 + k % 8) & 0xff)
      }
      val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp),
        predOf = c => predC(c))
      val cbp = cbpLuma | (chroma.cbpChroma << 4)
      w.ue(CbpInterToCodeNum(cbp))
      if (cbp != 0) w.se(0) // mb_qp_delta
      bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val gbx = mx * 4 + bxo; val gby = my * 4 + byo
        if ((cbpLuma & (1 << (bi >> 2))) != 0) {
          val tc = H264Cavlc.encodeBlock(w, levels(bi), 16, st.lumaNc(gbx, gby))
          st.setNnzY(gbx, gby, tc)
          val rpx = inverse4x4(dequant4x4(unzigzag(levels(bi), 0), qp, skipDc = false, st.scaling.w4(3)))
          var py = 0
          while (py < 4) {
            var px = 0
            while (px < 4) {
              val o = (my * 16 + byo * 4 + py) * lumaW + mx * 16 + bxo * 4 + px
              st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + rpx(py * 4 + px))
              px += 1
            }
            py += 1
          }
        } else st.setNnzY(gbx, gby, 0)
        bi += 1
      }
      chroma.emit(w)
      mb += 1
    }
    w.trailing()
    // type-0 POC SPS/PPS so the B header parses; the payload's own
    // parameter sets overwrite the seeded ones on decode
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, 0, 0, refFrames = 2,
      pocLsbBits = 8, profile = 77)
    val payload = frameNals(avcc = true, spsNal, ppsNal,
      Array[Byte](0x01.toByte) ++ escape(w.bytes))
    val g = new GopDecoder
    g.seed(Sps(66, 30, 4, 0, wMbs, hMbs, 0, 0, 2, 8),
      Pps(entropyCabac = false, 26, deblockingControlPresent = true),
      List(ref1, ref0))
    val dec =
      try g.decodeAuYuv(payload).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    (payload, (st.yPlane, st.cbPlane, st.crPlane), dec)
  }

  /** Spec hook: encode one B frame where EVERY macroblock is B_8x8
    * with `plan(mx, my) = (subTypes, mvsL0, mvsL1)` dictating the four
    * Table 7-17 sub shapes (0 = B_Direct_8x8 draws no MVs) and the
    * per-part quarter-pel vectors — the witness for the sub-partition
    * decode paths in BOTH entropy modes, which the production encoder
    * never emits. `directSpatial` selects the direct derivation for
    * type-0 subs. Same seed-decode parity contract as the other
    * partition hooks. */
  private[graft] def b8x8RoundTripForTest(srcY: Array[Byte],
      srcCb: Array[Byte], srcCr: Array[Byte],
      ref0Y: Array[Byte], ref0Cb: Array[Byte], ref0Cr: Array[Byte],
      ref1Y: Array[Byte], ref1Cb: Array[Byte], ref1Cr: Array[Byte],
      wMbs: Int, hMbs: Int, qp: Int,
      plan: (Int, Int) => (Seq[Int], Seq[(Int, Int)], Seq[(Int, Int)]),
      cabac: Boolean = false, directSpatial: Boolean = false)
      : (Array[Byte], (Array[Byte], Array[Byte], Array[Byte]),
         Option[(Array[Byte], Array[Byte], Array[Byte])]) = {
    import H264Transform._
    def mkRef(y: Array[Byte], cb: Array[Byte], cr: Array[Byte], poc: Int)
        : FrameState = {
      val f = new FrameState(wMbs, hMbs)
      System.arraycopy(y, 0, f.yPlane, 0, y.length)
      System.arraycopy(cb, 0, f.cbPlane, 0, cb.length)
      System.arraycopy(cr, 0, f.crPlane, 0, cr.length)
      f.poc = poc
      f
    }
    val ref0 = mkRef(ref0Y, ref0Cb, ref0Cr, poc = 0)
    val ref1 = mkRef(ref1Y, ref1Cb, ref1Cr, poc = 4)
    // seed the colocated grid so temporal direct has real motion to
    // scale: mark ref1 fully decoded as zero-MV refIdx-0 inter
    ref0.setMv(0, 0, wMbs * 4, hMbs * 4, 0, 0, inter = false, refIdx = -1)
    ref1.setMv(0, 0, wMbs * 4, hMbs * 4, 0, 0, inter = true, refIdx = 0,
      refUid = ref0.uid)
    val st = new FrameState(wMbs, hMbs)
    st.poc = 2
    val lumaW = wMbs * 16
    val w = new BitWriter
    w.ue(0); w.ue(6); w.ue(0) // first_mb, slice_type B, pps id
    w.u(1, 4) // frame_num
    w.u(2, 8) // pic_order_cnt_lsb (between the refs' 0 and 4)
    w.u1(if (directSpatial) 1 else 0) // direct_spatial_mv_pred_flag
    w.u1(1); w.ue(0); w.ue(0) // override: 1-deep list0 and list1
    w.u1(0); w.u1(0) // ref_pic_list_modification l0, l1
    if (cabac) w.ue(0) // cabac_init_idc
    w.se(qp - 26)
    w.ue(1) // disable deblocking
    var enc: H264Cabac.Enc = null
    var cSink: CabacSink = null
    var cxE: H264Cabac.Ctx = null
    if (cabac) {
      while (!w.byteAligned) w.u1(1)
      cxE = new H264Cabac.Ctx; cxE.initPB(0, qp)
      enc = new H264Cabac.Enc(w)
      cSink = new CabacSink(enc, cxE)
      cSink.interMb = true
    }
    val sink: MbSink = if (cabac) cSink else new CavlcSink(w)
    val refs0 = IndexedSeq(ref0); val refs1 = IndexedSeq(ref1)
    val nMbs = wMbs * hMbs
    var mb = 0
    while (mb < nMbs) {
      val mx = mb % wMbs; val my = mb / wMbs
      val (subTypes, mvs0, mvs1) = plan(mx, my)
      require(subTypes.length == 4, "B_8x8 needs 4 sub_mb_types")
      val shapes = subTypes.map(bSubShape).toArray
      if (cabac) {
        enc.decision(cxE, 24 + skipFlagInc(st, mx, my), 0) // mb_skip_flag
        encodeMbTypeBCabac(enc, cxE, st, mx, my, 22)
        subTypes.foreach(t => encodeSubMbTypeBCabac(enc, cxE, t))
      } else {
        w.ue(0) // mb_skip_run
        w.ue(22)
        subTypes.foreach(t => w.ue(t))
      }
      // resolve + MC per sub/part in decode order; mvds stashed for
      // stream-order emission (their contexts read only the mvd-note
      // grids, which emission replays in the decoder's order)
      def usesL0(m: Int) = m == BModeL0 || m == BModeBi
      def usesL1(m: Int) = m == BModeL1 || m == BModeBi
      lazy val directQs =
        if (directSpatial) spatialDirectMotion(st, refs1, mx, my)
        else temporalDirectQuads(st, refs0, refs1, mx, my)
      val it0 = mvs0.iterator; val it1 = mvs1.iterator
      val outMvd0 = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Int, Int, Int)]()
      val outMvd1 = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Int, Int, Int)]()
      var sb = 0
      while (sb < 4) {
        val (m, w4, h4, n) = shapes(sb)
        val sbx = mx * 4 + (sb % 2) * 2; val sby = my * 4 + (sb / 2) * 2
        if (m < 0) applyDirectQuad(st, refs0, refs1, mx, my, sb, directQs(sb))
        else subPartOrigins(w4, h4, n).foreach { case (ox, oy) =>
          val bx = sbx + ox; val by = sby + oy
          val v0 =
            if (usesL0(m)) {
              val (vx, vy) = it0.next()
              val (px, py) = mvPredict(st, bx, by, w4, 0, 0, list = 0)
              outMvd0 += ((bx, by, w4, h4, vx - px, vy - py))
              Some((ref0, vx, vy, 0))
            } else None
          val v1 =
            if (usesL1(m)) {
              val (vx, vy) = it1.next()
              val (px, py) = mvPredict(st, bx, by, w4, 0, 0, list = 1)
              outMvd1 += ((bx, by, w4, h4, vx - px, vy - py))
              Some((ref1, vx, vy, 0))
            } else None
          mcPartitionB(st, v0, v1, bx, by, w4, h4)
        }
        sb += 1
      }
      require(!it0.hasNext && !it1.hasNext, s"plan at ($mx,$my) MV count mismatch")
      (outMvd0 ++ outMvd1).zipWithIndex.foreach { case ((bx, by, w4, h4, dx, dy), i) =>
        val list = if (i < outMvd0.length) 0 else 1
        if (cabac) {
          encodeMvdCabac(enc, cxE, st, bx, by, list, 0, dx)
          encodeMvdCabac(enc, cxE, st, bx, by, list, 1, dy)
          st.noteMvd(bx, by, w4, h4, list, dx, dy)
        } else { w.se(dx); w.se(dy) }
      }
      // residual vs the assembled prediction (the partition-hook pattern)
      val levels = Array.ofDim[Int](16, 16)
      var bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val diff = new Array[Int](16)
        var k = 0
        while (k < 16) {
          val o = (my * 16 + byo * 4 + k / 4) * lumaW + mx * 16 + bxo * 4 + k % 4
          diff(k) = (srcY(o) & 0xff) - (st.yPlane(o) & 0xff)
          k += 1
        }
        val q = quant4x4(forward4x4(diff), qp, skipDc = false, st.scaling.w4(3))
        k = 0
        while (k < 16) { levels(bi)(k) = q(Zigzag4x4(k)); k += 1 }
        bi += 1
      }
      val cbpLuma = (0 until 4).foldLeft(0) { (acc, g) =>
        if ((0 until 4).exists(i => levels(g * 4 + i).exists(_ != 0)))
          acc | (1 << g)
        else acc
      }
      val predC = Array.tabulate(2) { c =>
        val plane = if (c == 0) st.cbPlane else st.crPlane
        Array.tabulate(64)(k =>
          plane((my * 8 + k / 8) * (lumaW / 2) + mx * 8 + k % 8) & 0xff)
      }
      val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, st.cQp(qp),
        predOf = c => predC(c))
      val cbp = cbpLuma | (chroma.cbpChroma << 4)
      if (cabac) {
        cSink.cbpI4(st, mx, my, cbp)
        if (cbp != 0) cSink.qpDelta(0) else cSink.qpDeltaSkipped()
      } else {
        w.ue(CbpInterToCodeNum(cbp))
        if (cbp != 0) w.se(0)
      }
      bi = 0
      while (bi < 16) {
        val (bxo, byo) = LumaBlockOrder(bi)
        val gbx = mx * 4 + bxo; val gby = my * 4 + byo
        if ((cbpLuma & (1 << (bi >> 2))) != 0) {
          val tc = sink.blockOut(st, CatLuma4x4, levels(bi), 16, gbx, gby, 0)
          st.setNnzY(gbx, gby, tc)
          val rpx = inverse4x4(dequant4x4(unzigzag(levels(bi), 0), qp, skipDc = false, st.scaling.w4(3)))
          var py = 0
          while (py < 4) {
            var px = 0
            while (px < 4) {
              val o = (my * 16 + byo * 4 + py) * lumaW + mx * 16 + bxo * 4 + px
              st.yPlane(o) = clipB((st.yPlane(o) & 0xff) + rpx(py * 4 + px))
              px += 1
            }
            py += 1
          }
        } else st.setNnzY(gbx, gby, 0)
        bi += 1
      }
      chroma.emit(sink)
      st.markMb(mx, my, intra = false, qp)
      if (cabac) enc.terminate(if (mb == nMbs - 1) 1 else 0)
      mb += 1
    }
    if (cabac) w.alignToByte() else w.trailing()
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, 0, 0, refFrames = 2,
      pocLsbBits = 8, profile = 77, cabac = cabac)
    val payload = frameNals(avcc = true, spsNal, ppsNal,
      Array[Byte](0x01.toByte) ++ escape(w.bytes))
    val g = new GopDecoder
    g.seed(Sps(66, 30, 4, 0, wMbs, hMbs, 0, 0, 2, 8),
      Pps(entropyCabac = cabac, 26, deblockingControlPresent = true),
      List(ref1, ref0))
    val dec =
      try g.decodeAuYuv(payload).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    (payload, (st.yPlane, st.cbPlane, st.crPlane), dec)
  }

  /** Spec hook: long-term reference pictures + MMCO (7.4.3.3 /
    * 8.2.5.4) END TO END, two legs:
    *
    * - IDR leg (mmcoLeg = false), max_num_ref_frames = 2: the IDR
    *   self-marks long-term (long_term_reference_flag); every later P
    *   slice alternates ref_idx between the newest short-term picture
    *   and the long-term IDR at the list TAIL — by the third P the
    *   sliding window has evicted every same-age short-term, so plane
    *   parity proves the long-term picture survived eviction and the
    *   8.2.4.2.1 short-then-long list order.
    * - MMCO leg (leg = 1), max_num_ref_frames = 3: op 4
    *   (MaxLongTermFrameIdx), op 6 (mark CURRENT long-term), op 3
    *   (short -> long at an idx), op 2 (unmark long), op 1 (unmark
    *   short), and an idc-2 long-term list modification on the final
    *   slice — each changes which PICTURE a later ref_idx resolves
    *   to, so any mis-step breaks byte parity.
    * - MMCO-5 leg (leg = 2), max_num_ref_frames = 2: the full reset
    *   (8.2.5.4.5) mid-GOP — the op-5 picture rebases to frame_num 0,
    *   later slices restart frame_num from 1, and the final slice
    *   addresses the rebased picture by PicNum 0 through an idc-0
    *   list modification: without the rebase the command has no match
    *   and the decode rejects, so success + parity pin the reset.
    *
    * Returns (payloads, encoder recons, decoded planes) per frame. */
  private[graft] def longTermGopForTest(frames: Seq[MediaCodecs.Bmp],
      qp: Int, leg: Int)
      : (Seq[Array[Byte]],
         Seq[(Array[Byte], Array[Byte], Array[Byte])],
         Seq[Option[(Array[Byte], Array[Byte], Array[Byte])]]) = {
    require(frames.length == 5, "the long-term legs are 5-frame scripts")
    val maxRef = if (leg == 1) 3 else 2
    val (idrBytes, f0) = encodeImpl(frames.head, avcc = true, qp = qp,
      intra4x4 = false, (_, b, _) => b, refFrames = maxRef,
      idrLongTerm = leg == 0)
    val (wMbs, hMbs, cropR, cropB) = mbGeometry(frames.head)
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, cropR, cropB, maxRef)
    f0.frameNum = 0
    val payloads = ArrayBuffer(idrBytes)
    val recons = ArrayBuffer(
      (f0.yPlane.clone(), f0.cbPlane.clone(), f0.crPlane.clone()))
    def p(i: Int, fn: Int, refs: IndexedSeq[FrameState], cycle: Int,
        mmco: List[(Int, Int, Int)] = Nil,
        listMod: List[(Int, Int)] = Nil): FrameState = {
      val (yP, cbP, crP) = toYuv420(frames(i), wMbs, hMbs)
      val (nal, st) = encodePFrame(yP, cbP, crP, refs, qp, frameNum = fn,
        searchRange = 2, forcedMv = None, intraEvery = 0,
        refFrames = maxRef,
        forcedRefIdx = Some((mx, my) => (mx + my) % cycle),
        mmco = mmco, listModL0 = listMod)
      st.frameNum = fn
      payloads += frameNals(avcc = true, spsNal, ppsNal, nal)
      recons += ((st.yPlane.clone(), st.cbPlane.clone(), st.crPlane.clone()))
      st
    }
    if (leg == 0) {
      // decoder DPB: lt=[f0]; short slides with capacity maxRef - 1
      val f1 = p(1, 1, IndexedSeq(f0), 1)
      val f2 = p(2, 2, IndexedSeq(f1, f0), 2)
      val f3 = p(3, 3, IndexedSeq(f2, f0), 2) // f1 evicted; f0 retained
      p(4, 4, IndexedSeq(f3, f0), 2)
    } else if (leg == 1) {
      // ops annotated with the decoder-side DPB they must produce
      val f1 = p(1, 1, IndexedSeq(f0), 1,
        mmco = List((4, 2, 0), (6, 0, 0))) // lt=[f1@0], short=[f0]
      val f2 = p(2, 2, IndexedSeq(f0, f1), 2,
        mmco = List((3, 1, 1))) // f0 -> lt@1: lt=[f1@0, f0@1], short=[f2]
      val f3 = p(3, 3, IndexedSeq(f2, f1, f0), 3,
        mmco = List((2, 0, 0), (1, 0, 0))) // lt=[f0@1], short=[f3]
      p(4, 4, IndexedSeq(f0, f3), 2,
        listMod = List((2, 1))) // idc-2 moves the long-term f0 to index 0
    } else {
      val f1 = p(1, 1, IndexedSeq(f0), 1)
      // op 5 mid-GOP: everything unmarked, f2 rebases to frame_num 0
      val f2 = p(2, 2, IndexedSeq(f1, f0), 2, mmco = List((5, 0, 0)))
      f2.frameNum = 0 // the decoder-side rebase, mirrored
      val f3 = p(3, 1, IndexedSeq(f2), 1) // frame_num restarts at 1
      // idc-0 modification addresses f2 by its REBASED PicNum 0
      // (pred 2 - (diff_minus1 1 + 1)): no rebase -> no match -> reject
      p(4, 2, IndexedSeq(f2, f3), 2, listMod = List((0, 1)))
    }
    val g = new GopDecoder
    val decoded = payloads.map { pl =>
      try g.decodeAuYuv(pl).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    }
    (payloads.toSeq, recons.toSeq, decoded.toSeq)
  }

  /** 8.2.5.2 frame_num-gap witness (r15): encoder-side scripts that
    * emit LEGAL gaps under gaps_in_frame_num_value_allowed_flag = 1,
    * with every existing P frame referencing a REAL frame through a
    * ref_idx that is only correct if the decoder inserted the
    * non-existing frames at their spec-exact default-list positions
    * (PicNum-descending) and ran sliding-window eviction over them.
    * Legs: 0 = two gaps of different widths (1 and 2) with NE frames
    * both evicting and being evicted; 1 = a 12-wide gap then a gap
    * CROSSING the MaxFrameNum wrap (…14, 15, 0…); 2 = a stream DEFECT
    * that references a non-existing frame (decoder must refuse, not
    * predict from zeros); 3 = leg-0's exact script with the SPS flag
    * CLEAR (every post-gap frame must refuse — the r14 7.4.3 gate);
    * 4 = MMCO 3 addressing a non-existing frame (8.2.5.2 forbids
    * long-term marking of them — must refuse). */
  private[graft] def frameGapGopForTest(frames: Seq[MediaCodecs.Bmp],
      qp: Int, leg: Int)
      : (Seq[Array[Byte]],
         Seq[(Array[Byte], Array[Byte], Array[Byte])],
         Seq[Option[(Array[Byte], Array[Byte], Array[Byte])]]) = {
    require(frames.length == 4, "the frame-gap legs are 4-frame scripts")
    val maxRef = if (leg == 1) 16 else 3
    val gaps = leg != 3
    val (idrBytes, f0) = encodeImpl(frames.head, avcc = true, qp = qp,
      intra4x4 = false, (_, b, _) => b, refFrames = maxRef,
      gapsAllowed = gaps)
    val (wMbs, hMbs, cropR, cropB) = mbGeometry(frames.head)
    val (spsNal, ppsNal) = spsPpsNals(wMbs, hMbs, cropR, cropB, maxRef,
      gapsAllowed = gaps)
    f0.frameNum = 0
    val payloads = ArrayBuffer(idrBytes)
    val recons = ArrayBuffer(
      (f0.yPlane.clone(), f0.cbPlane.clone(), f0.crPlane.clone()))
    // encoder-side stand-in for a decoder-inserted non-existing frame:
    // occupies its ref_idx slot; the forced pattern never reads it
    def ne(): FrameState = {
      val f = new FrameState(wMbs, hMbs); f.nonExisting = true; f
    }
    def p(i: Int, fn: Int, refs: IndexedSeq[FrameState], ri: Int,
        mmco: List[(Int, Int, Int)] = Nil): FrameState = {
      val (yP, cbP, crP) = toYuv420(frames(i), wMbs, hMbs)
      val (nal, st) = encodePFrame(yP, cbP, crP, refs, qp, frameNum = fn,
        searchRange = 2, forcedMv = None, intraEvery = 0,
        refFrames = maxRef, forcedRefIdx = Some((_, _) => ri), mmco = mmco)
      st.frameNum = fn
      payloads += frameNals(avcc = true, spsNal, ppsNal, nal)
      recons += ((st.yPlane.clone(), st.cbPlane.clone(), st.crPlane.clone()))
      st
    }
    if (leg == 0 || leg == 3) {
      // decoder DPB after each fill, newest first (cap 3):
      // fn 2: [NE1, f0]              -> real f0 at ref_idx 1
      // fn 5: [NE4, NE3, f1]         -> f0 AND NE1 slid out; f1 at 2
      // fn 6: [f2, NE4, NE3]         -> f2 at 0
      val f1 = p(1, 2, IndexedSeq(ne(), f0), 1)
      val f2 = p(2, 5, IndexedSeq(ne(), ne(), f1), 2)
      p(3, 6, IndexedSeq(f2, ne(), ne()), 0)
    } else if (leg == 1) {
      // cap 16 keeps f0 across a 12-wide gap (ref_idx 12), then the
      // next gap crosses the frame_num wrap: …NE14, NE15, NE0, fn 1
      val f1 = p(1, 13, IndexedSeq.fill(12)(ne()) :+ f0, 12)
      val f2 = p(2, 1, IndexedSeq(ne(), ne(), ne(), f1), 3)
      p(3, 2, IndexedSeq(f2), 0)
    } else if (leg == 2) {
      // DEFECT: ref_idx 0 resolves to NE1 on the decoder side (the
      // encoder predicts from a real frame so the stream is
      // well-formed); the decoder must refuse, never emit zeros
      p(1, 2, IndexedSeq(f0, f0), 0)
      p(2, 3, IndexedSeq(f0, f0, f0), 0) // poisoned until an IDR
      p(3, 4, IndexedSeq(f0, f0, f0), 0)
    } else {
      // leg 4: MMCO 3 (short->long) addressed at PicNum 1 = NE1
      p(1, 2, IndexedSeq(ne(), f0), 1, mmco = List((4, 1, 0), (3, 0, 0)))
      p(2, 3, IndexedSeq(f0, f0), 1) // post-throw state: must not decode
      p(3, 4, IndexedSeq(f0, f0), 1)
    }
    val g = new GopDecoder
    val decoded = payloads.map { pl =>
      try g.decodeAuYuv(pl).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    }
    (payloads.toSeq, recons.toSeq, decoded.toSeq)
  }

  /** Spec hook: custom quant matrices (CQM, 7.3.2.1.1.1 + 8.5.9) end
    * to end. Per leg, encodes a 4-frame script with scaling lists in
    * the SPS and/or PPS and decodes it back; the caller pins
    * decode ≡ encoder reconstruction. Legs:
    *  0 = CAVLC P GOP, all 8 SPS lists custom;
    *  1 = CABAC B GOP, all 8 SPS lists custom;
    *  2 = PPS OVERRIDE: SPS carries one set, the PPS a different one —
    *      parity holds only if the decoder applies the PPS's (8.5.9
    *      priority), which the encoder-side resolver mirrors;
    *  3 = Table 7-2 fall-back rule A: only lists 0 and 3 present
    *      (1, 2 inherit 0; 4, 5 inherit 3; 6, 7 take the defaults);
    *  4 = PPS-only lists (seq flag 0): rule A applies inside the PPS.
    * The deliberately zigzag-asymmetric matrices make a raster/scan
    * placement fault a parity failure, not a wash. */
  private[graft] def cqmGopForTest(frames: Seq[MediaCodecs.Bmp], qp: Int,
      leg: Int)
      : (Seq[Array[Byte]],
         Seq[(Array[Byte], Array[Byte], Array[Byte])],
         Seq[Option[(Array[Byte], Array[Byte], Array[Byte])]]) = {
    def mk4(seed: Int): Array[Int] = Array.tabulate(16)(r => 8 + (r * 5 + seed * 3) % 24)
    def mk8(seed: Int): Array[Int] = Array.tabulate(64)(r => 8 + (r * 3 + seed * 7) % 24)
    def full(seed: Int): IndexedSeq[Option[Array[Int]]] =
      IndexedSeq.tabulate(8)(i => Some(if (i < 6) mk4(seed + i) else mk8(seed + i)))
    val cfg = leg match {
      case 0 | 1 => CqmCfg(sps = Some(full(1)))
      // the P/B GOP PPS has transform_8x8_mode off, so its scaling
      // loop carries 6 lists (7.3.2.2) — the 8x8 PPS lists are
      // witnessed through the pInter8x8 hook instead
      case 2 => CqmCfg(sps = Some(full(1)), pps = Some(full(9).take(6)))
      case 3 => CqmCfg(sps = Some(IndexedSeq(Some(mk4(1)), None, None,
        Some(mk4(4)), None, None, None, None)))
      case _ => CqmCfg(pps = Some(full(5).take(6)))
    }
    if (leg == 5) {
      // CONTROL: the SAME slice bytes under a FLAT SPS/PPS must decode
      // to DIFFERENT planes — proving the matrices reach dequant, not
      // merely ride the wire ignored on both sides (which parity alone
      // cannot distinguish)
      val (ps, sts) = encodeGopImpl(frames.take(1), qp, avcc = true,
        searchRange = 2, forcedMv = None, intraEvery = 0,
        cqm = Some(CqmCfg(sps = Some(full(1)))))
      val (wMbs, hMbs, cropR, cropB) = mbGeometry(frames.head)
      val (flatSps, flatPps) = spsPpsNals(wMbs, hMbs, cropR, cropB, 1,
        profile = 100)
      val units = nalUnits(ps.head)
      val (ss, se) = units.last // the slice NAL (after SPS and PPS)
      val swapped = frameNals(avcc = true, flatSps, flatPps,
        ps.head.slice(ss, se))
      val cqmDec = new GopDecoder().decodeAuYuv(ps.head).map(t => (t._2, t._3, t._4))
      val flatDec = new GopDecoder().decodeAuYuv(swapped).map(t => (t._2, t._3, t._4))
      return (ps,
        sts.map(st => (st.yPlane.clone(), st.cbPlane.clone(), st.crPlane.clone())),
        Seq(cqmDec, flatDec))
    }
    val (payloads, recons) =
      if (leg == 1) {
        val (ps, _, sts) = encodeGopBImpl(frames, qp, bFrames = 1,
          avcc = true, searchRange = 2, cabac = true, cqm = Some(cfg))
        (ps, sts.map(st => (st.yPlane.clone(), st.cbPlane.clone(), st.crPlane.clone())))
      } else {
        val (ps, sts) = encodeGopImpl(frames, qp, avcc = true,
          searchRange = 2, forcedMv = None, intraEvery = 0,
          cqm = Some(cfg))
        (ps, sts.map(st => (st.yPlane.clone(), st.cbPlane.clone(), st.crPlane.clone())))
      }
    val g = new GopDecoder
    val decoded = payloads.map { pl =>
      try g.decodeAuYuv(pl).map(t => (t._2, t._3, t._4))
      catch { case _: Exception => None }
    }
    (payloads, recons, decoded)
  }

  /** The planted moving-square frame sequence both h264 roundtrip
    * queries (framegap, cqm) feed their GOP scripts: a closed-form
    * gradient background with a bright square stepping right per
    * frame — deterministic, shared so the paired SQL oracles (which
    * replay only dims) can never drift apart on content. */
  private[graft] def movingSquareFrames(id: Long, w: Int, h: Int,
      n: Int): IndexedSeq[MediaCodecs.Bmp] =
    (0 until n).map { tIdx =>
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val x = i % w; val y = i / w
        val bg = (x * 3 + y * 5 + (x / 4) * 7 + id).toInt % 200
        val sx = 2 + tIdx * 5
        val v = if (x >= sx && x < sx + 8 && y >= 6 && y < 14) 255 else bg
        rgb(i * 3) = v.toByte
        rgb(i * 3 + 1) = ((v + 40) % 256).toByte
        rgb(i * 3 + 2) = ((v + 90) % 256).toByte
        i += 1
      }
      MediaCodecs.Bmp(w, h, rgb)
    }

  /** Spec hook: the SAME slice bytes under a PPS with
    * constrained_intra_pred_flag = 1 — outcomes must be provably the
    * PPS bit, not a stream difference. Returns (flag-0 I payload,
    * flag-1 I payload, flag-1 P payload): the flag is VACUOUS on the
    * all-intra stream (must still decode, byte-equal) and refuses on
    * the P slice (where an intra MB could have inter neighbors). */
  private[graft] def cipStreamsForTest(img2: Seq[MediaCodecs.Bmp], qp: Int)
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    val (wMbs, hMbs, cropR, cropB) = mbGeometry(img2.head)
    val (bytes, _) =
      encodeImpl(img2.head, avcc = true, qp, intra4x4 = false, (_, b, _) => b)
    val (sps, pps) = spsPpsNals(wMbs, hMbs, cropR, cropB,
      constrainedIntra = true)
    val units = nalUnits(bytes)
    val (ss, se) = units.last
    val iPayload = frameNals(avcc = true, sps, pps, bytes.slice(ss, se))
    val gop = encodeGopImpl(img2, qp, avcc = true, searchRange = 2,
      forcedMv = None, intraEvery = 0)._1
    val pUnits = nalUnits(gop(1)) // sps, pps, P slice
    val (ps, pe) = pUnits.last
    val pPayload = frameNals(avcc = true, sps, pps, gop(1).slice(ps, pe))
    (bytes, iPayload, gop(0), gop(1), pPayload)
  }

  /** Spec shim: write a scaling-list loop to bits (optionally forcing
    * the useDefaultScalingMatrixFlag wire shortcut — first delta −8
    * drives nextScale to 0 at j 0) and re-parse it, exposing the
    * private wire codec to the unit pins. */
  private[graft] def scalingWireForTest(lists: IndexedSeq[Option[Array[Int]]],
      n: Int, useDefaultAt: Set[Int] = Set.empty): Array[Option[Array[Int]]] = {
    val w = new BitWriter
    var i = 0
    while (i < n) {
      if (useDefaultAt(i)) { w.u1(1); w.se(-8) }
      else lists.lift(i).flatten match {
        case Some(r) => w.u1(1); writeScalingList(w, r, if (i < 6) 16 else 64)
        case None => w.u1(0)
      }
      i += 1
    }
    w.trailing()
    parseScalingLists(new BitReader(w.bytes), n8x8 = math.max(0, n - 6))
  }

  /** Spec shim: run the Table 7-2 resolver (rule A when `sps` is None,
    * rule B against the rule-A-resolved SPS lists otherwise). */
  private[graft] def resolveForTest(raw: IndexedSeq[Option[Array[Int]]],
      sps: Option[IndexedSeq[Option[Array[Int]]]] = None)
      : (Array[Array[Int]], Array[Array[Int]]) = {
    val s = sps.map(l => resolveScalingLists(l.toArray, None))
    val r = resolveScalingLists(raw.toArray, s)
    (r.w4, r.w8)
  }

  /** Integer-pel SAD motion search over ±range around (0,0), ties to
    * the first candidate in (dy, dx) scan order — deterministic.
    * Returns the MV in quarter-pel units. */
  private def searchMv(srcY: Array[Byte], refY: Array[Byte], lumaW: Int,
      lumaH: Int, mx: Int, my: Int, range: Int): (Int, Int) = {
    var bestX = 0; var bestY = 0; var bestSad = Int.MaxValue
    var dy = -range
    while (dy <= range) {
      var dx = -range
      while (dx <= range) {
        var sad = 0
        var yy = 0
        while (yy < 16 && sad < bestSad) {
          var xx = 0
          while (xx < 16) {
            val sx = clip3(0, lumaW - 1, mx * 16 + xx + dx)
            val sy = clip3(0, lumaH - 1, my * 16 + yy + dy)
            sad += math.abs((srcY((my * 16 + yy) * lumaW + mx * 16 + xx) & 0xff) -
              (refY(sy * lumaW + sx) & 0xff))
            xx += 1
          }
          yy += 1
        }
        if (sad < bestSad) { bestSad = sad; bestX = dx * 4; bestY = dy * 4 }
        dx += 1
      }
      dy += 1
    }
    (bestX, bestY)
  }

  /** Structural probe without full decode: (width, height) from the SPS. */
  def describe(p: Array[Byte]): Option[(Int, Int)] =
    try {
      nalUnits(p).collectFirst { case (s, e) if (p(s) & 0x1f) == 7 =>
        val sps = parseSps(new BitReader(unescape(p, s + 1, e)))
        (sps.width, sps.height)
      }
    } catch { case _: Exception => None }
}
