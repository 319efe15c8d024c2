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

  case class Sps(profileIdc: Int, levelIdc: Int, log2MaxFrameNum: Int,
      picOrderCntType: Int, widthMbs: Int, heightMbs: Int,
      cropRight: Int, cropBottom: Int) {
    def width: Int = widthMbs * 16 - 2 * cropRight
    def height: Int = heightMbs * 16 - 2 * cropBottom
  }

  case class Pps(entropyCabac: Boolean, picInitQp: Int,
      deblockingControlPresent: Boolean)

  private def parseSps(r: BitReader): Sps = {
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    r.ue() // sps id
    if (profile == 100 || profile == 110 || profile == 122 || profile == 244 ||
      profile == 44 || profile == 83 || profile == 86 || profile == 118 ||
      profile == 128) throw new H264Format("high-profile SPS out of scope")
    val log2MaxFrameNum = r.ue() + 4
    val poc = r.ue()
    if (poc == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
    else if (poc == 1) throw new H264Format("POC type 1 out of scope")
    r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num
    val wMbs = r.ue() + 1
    val hMap = r.ue() + 1
    val frameMbsOnly = r.u1()
    if (frameMbsOnly == 0) throw new H264Format("interlace out of scope")
    r.u1() // direct_8x8_inference
    var cropR = 0; var cropB = 0
    if (r.u1() == 1) { // frame_cropping
      val l = r.ue(); cropR = r.ue(); val t = r.ue(); cropB = r.ue()
      if (l != 0 || t != 0) throw new H264Format("left/top crop out of scope")
    }
    r.u1() // vui_present (ignored if absent; VUI payload not parsed)
    Sps(profile, level, log2MaxFrameNum, poc, wMbs, hMap, cropR, cropB)
  }

  private def parsePps(r: BitReader): Pps = {
    r.ue(); r.ue() // pps id, sps id
    val cabac = r.u1() == 1
    r.u1() // bottom_field_pic_order_in_frame_present
    if (r.ue() != 0) throw new H264Format("slice groups out of scope")
    r.ue(); r.ue() // num_ref_idx defaults
    r.u1(); r.u(2) // weighted pred
    val qp = r.se() + 26
    r.se(); r.se() // qs, chroma_qp_offset
    val deblock = r.u1() == 1
    r.u1(); r.u1() // constrained_intra, redundant_pic_cnt
    Pps(cabac, qp, deblock)
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
      : Option[(Sps, Array[Byte], Array[Byte], Array[Byte])] = {
    var sps: Sps = null
    var pps: Pps = null
    for ((s, e) <- nalUnits(p)) {
      val hdr = p(s) & 0xff
      if ((hdr & 0x80) != 0) throw new H264Format("forbidden_zero_bit")
      val nalType = hdr & 0x1f
      nalType match {
        case 7 => sps = parseSps(new BitReader(unescape(p, s + 1, e)))
        case 8 => pps = parsePps(new BitReader(unescape(p, s + 1, e)))
        case 5 => // IDR slice
          if (sps == null || pps == null) throw new H264Format("slice before SPS/PPS")
          if (pps.entropyCabac) throw new H264Format("CABAC out of scope")
          return Some(decodeIdrSlice(new BitReader(unescape(p, s + 1, e)), sps, pps))
        case _ => () // SEI / AUD / others skipped
      }
    }
    None
  }

  private def decodeIdrSlice(r: BitReader, sps: Sps, pps: Pps)
      : (Sps, Array[Byte], Array[Byte], Array[Byte]) = {
    // slice_header (7.3.3)
    if (r.ue() != 0) throw new H264Format("first_mb_in_slice != 0")
    val sliceType = r.ue()
    if (sliceType % 5 != 2) throw new H264Format("non-I slice")
    r.ue() // pps id
    r.u(sps.log2MaxFrameNum) // frame_num
    r.ue() // idr_pic_id
    if (sps.picOrderCntType == 0) r.u(16) // poc lsb (we always write type 2)
    // dec_ref_pic_marking for IDR (7.3.3.3)
    r.u1(); r.u1()
    val sliceQpDelta = r.se() // slice_qp_delta
    if (pps.deblockingControlPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() }
    }
    // slice_data: all-I macroblocks, raster order
    val st = new FrameState(sps.widthMbs, sps.heightMbs)
    var qpY = pps.picInitQp + sliceQpDelta
    if (qpY < 0 || qpY > 51) throw new H264Format(s"slice QP $qpY out of range")
    var mb = 0
    val nMbs = st.wMbs * st.hMbs
    while (mb < nMbs) {
      val mbType = r.ue()
      val mbX = (mb % st.wMbs) * 16
      val mbY = (mb / st.wMbs) * 16
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
        decodeIntra16x16(r, st, mbX / 16, mbY / 16, predMode, chromaMode,
          cbpLuma, cbpChroma, qpY)
      } else if (mbType == 0) {
        // Intra_4x4 (7.3.5.1): 16 per-block pred modes, chroma mode,
        // me(v)-coded CBP, qp delta only when any residual is coded
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
        decodeIntra4x4Luma(r, st, mbX / 16, mbY / 16, modes, cbpLuma, qpY)
        decodeChromaResid(r, st, mbX / 16, mbY / 16, chromaMode, cbpChroma,
          H264Transform.chromaQp(qpY))
      } else throw new H264Format(s"bad I-slice mb_type $mbType")
      mb += 1
    }
    (sps, st.yPlane, st.cbPlane, st.crPlane)
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
  private def decodeIntra16x16(r: BitReader, st: FrameState, mx: Int, my: Int,
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
    H264Cavlc.decodeBlock(r, dcScan, 16, st.lumaNc(mx * 4, my * 4))
    val dcd = dequantLumaDc(unzigzag(dcScan, 0), qpY)
    val acScan = new Array[Int](15)
    var bi = 0
    while (bi < 16) {
      val (bxo, byo) = LumaBlockOrder(bi)
      val gbx = mx * 4 + bxo; val gby = my * 4 + byo
      var resid: Array[Int] = null
      if (cbpLuma != 0) {
        val tc = H264Cavlc.decodeBlock(r, acScan, 15, st.lumaNc(gbx, gby))
        st.setNnzY(gbx, gby, tc)
        resid = dequant4x4(unzigzag(acScan, 1), qpY, skipDc = true)
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
    decodeChromaResid(r, st, mx, my, chromaMode, cbpChroma, chromaQp(qpY))
  }

  /** Decode one macroblock's chroma residual and reconstruct both 8x8
    * planes (7.3.5.3.3 ordering: DC levels for BOTH components, then AC
    * blocks per component) — shared by the Intra_16x16 and Intra_4x4
    * paths, whose chroma syntax is identical. */
  private def decodeChromaResid(r: BitReader, st: FrameState, mx: Int, my: Int,
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
        H264Cavlc.decodeBlock(r, buf, 4, -1)
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
      val dcd2 = if (cbpChroma > 0) dequantChromaDc(dcLv(c), qpC) else new Array[Int](4)
      var sb = 0
      while (sb < 4) {
        val sbx = sb % 2; val sby = sb / 2
        val gbx = mx * 2 + sbx; val gby = my * 2 + sby
        var resid: Array[Int] = null
        if (cbpChroma == 2) {
          val tc = H264Cavlc.decodeBlock(r, acScan, 15, st.chromaNc(c, gbx, gby))
          st.setNnzC(c, gbx, gby, tc)
          resid = dequant4x4(unzigzag(acScan, 1), qpC, skipDc = true)
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
  private def decodeIntra4x4Luma(r: BitReader, st: FrameState, mx: Int, my: Int,
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
        val tc = H264Cavlc.decodeBlock(r, scan, 16, st.lumaNc(gbx, gby))
        st.setNnzY(gbx, gby, tc)
        resid = dequant4x4(unzigzag(scan, 0), qpY, skipDc = false)
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
      intra4x4: Boolean = false): Array[Byte] =
    encodeImpl(img, avcc, qp, intra4x4, (_, best, _) => best)._1

  /** Intra_4x4 encode with a forced per-block mode choice plus the
    * encoder's own reconstructed 4:2:0 planes — the spec hook that (a)
    * exercises every 8.3.1.2 predictor both directions and (b) pins the
    * decoder bit-exactly against the encode-time reconstruction. */
  private[graft] def encodeI4ForTest(img: MediaCodecs.Bmp, qp: Int,
      pick: (Int, Int, Seq[Int]) => Int)
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    val (bytes, st) = encodeImpl(img, avcc = true, qp = qp, intra4x4 = true, pick)
    (bytes, st.yPlane, st.cbPlane, st.crPlane)
  }

  private def encodeImpl(img: MediaCodecs.Bmp, avcc: Boolean, qp: Int,
      intra4x4: Boolean, pick: (Int, Int, Seq[Int]) => Int)
      : (Array[Byte], FrameState) = {
    require(!intra4x4 || qp >= 0, "intra4x4 needs a compressed qp (0..51)")
    val wMbs = (img.width + 15) / 16
    val hMbs = (img.height + 15) / 16
    val cropR = (wMbs * 16 - img.width + 1) / 2
    val cropB = (hMbs * 16 - img.height + 1) / 2
    require(wMbs * 16 - 2 * cropR == img.width && hMbs * 16 - 2 * cropB == img.height,
      "odd frame dims need cropping units of 2 (4:2:0); use even dims")

    // RGB -> YCbCr 4:2:0, edge-replicated to MB grid
    val lumaW = wMbs * 16
    val (yP, cbP, crP) = toYuv420(img, wMbs, hMbs)

    // SPS (baseline 66, level 3.0, POC type 2)
    val sw = new BitWriter
    sw.u(66, 8); sw.u(0xC0, 8); sw.u(30, 8) // constraint_set0/1, level 3.0
    sw.ue(0) // sps id
    sw.ue(0) // log2_max_frame_num_minus4
    sw.ue(2) // pic_order_cnt_type 2
    sw.ue(1) // max_num_ref_frames
    sw.u1(0) // gaps
    sw.ue(wMbs - 1); sw.ue(hMbs - 1)
    sw.u1(1) // frame_mbs_only
    sw.u1(1) // direct_8x8_inference
    if (cropR > 0 || cropB > 0) {
      sw.u1(1); sw.ue(0); sw.ue(cropR); sw.ue(0); sw.ue(cropB)
    } else sw.u1(0)
    sw.u1(0) // no VUI
    sw.trailing()
    val spsNal = Array[Byte](0x67.toByte) ++ escape(sw.bytes)

    // PPS
    val pw = new BitWriter
    pw.ue(0); pw.ue(0) // pps id, sps id
    pw.u1(0) // CAVLC
    pw.u1(0) // bottom_field_poc
    pw.ue(0) // one slice group
    pw.ue(0); pw.ue(0) // ref idx defaults
    pw.u1(0); pw.u(0, 2) // weighted pred off
    pw.se(0); pw.se(0); pw.se(0) // qp 26, qs 26, chroma offset 0
    pw.u1(1) // deblocking control present
    pw.u1(0); pw.u1(0) // constrained intra, redundant pic cnt
    pw.trailing()
    val ppsNal = Array[Byte](0x68.toByte) ++ escape(pw.bytes)

    // IDR slice
    require(qp >= -1 && qp <= 51, s"qp $qp")
    val w2 = new BitWriter
    w2.ue(0) // first_mb_in_slice
    w2.ue(7) // slice_type I (all slices)
    w2.ue(0) // pps id
    w2.u(0, 4) // frame_num (log2_max_frame_num = 4)
    w2.ue(0) // idr_pic_id
    w2.u1(0); w2.u1(0) // dec_ref_pic_marking
    w2.se(if (qp < 0) 0 else qp - 26) // slice_qp_delta vs pic_init_qp 26
    w2.ue(1) // disable_deblocking_filter_idc = 1
    var mb = 0
    val nMbs = wMbs * hMbs
    var stOut: FrameState = null
    if (qp < 0) {
      while (mb < nMbs) { // every MB I_PCM (lossless transport)
        w2.ue(25)
        w2.alignToByte()
        val mbX = (mb % wMbs) * 16
        val mbY = (mb / wMbs) * 16
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
        mb += 1
      }
    } else {
      // compressed Intra_16x16 path: DC pred + transforms + CAVLC; the
      // encoder mirrors the decoder's reconstruction so intra prediction
      // chains across macroblocks agree bit-for-bit
      val st = new FrameState(wMbs, hMbs)
      stOut = st
      while (mb < nMbs) {
        if (intra4x4) encodeIntra4x4Mb(w2, st, mb % wMbs, mb / wMbs, yP, cbP, crP, qp, pick)
        else encodeIntra16x16Mb(w2, st, mb % wMbs, mb / wMbs, yP, cbP, crP, qp)
        mb += 1
      }
    }
    w2.trailing()
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
  private def encodeIntra16x16Mb(w: BitWriter, st: FrameState, mx: Int, my: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte], qp: Int): Unit = {
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
      val q = quant4x4(wc, qp, skipDc = true)
      var k = 0
      while (k < 15) { acLv(bi)(k) = q(Zigzag4x4(k + 1)); k += 1 }
      bi += 1
    }
    val dcLvRaster = quantLumaDc(dcRaster, qp)
    val dcScan = Array.tabulate(16)(k => dcLvRaster(Zigzag4x4(k)))
    val cbpLuma = if (acLv.exists(_.exists(_ != 0))) 15 else 0
    // chroma forward + quant (shared with the Intra_4x4 encoder)
    val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, chromaQp(qp))
    val cbpChroma = chroma.cbpChroma
    // ---- write the macroblock (Table 7-11 inverse: predMode DC = 2)
    w.ue(1 + 2 + 4 * cbpChroma + 12 * (if (cbpLuma == 15) 1 else 0))
    w.ue(0) // intra_chroma_pred_mode = DC
    w.se(0) // mb_qp_delta
    H264Cavlc.encodeBlock(w, dcScan, 16, st.lumaNc(mx * 4, my * 4))
    val dcd = dequantLumaDc(unzigzag(dcScan, 0), qp)
    bi = 0
    while (bi < 16) {
      val (bxo, byo) = LumaBlockOrder(bi)
      val gbx = mx * 4 + bxo; val gby = my * 4 + byo
      var resid: Array[Int] = null
      if (cbpLuma != 0) {
        val tc = H264Cavlc.encodeBlock(w, acLv(bi), 15, st.lumaNc(gbx, gby))
        st.setNnzY(gbx, gby, tc)
        resid = dequant4x4(unzigzag(acLv(bi), 1), qp, skipDc = true)
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
    chroma.emit(w)
  }

  /** Analyzed chroma for one macroblock (DC prediction, qpC-quantized
    * transforms): `cbpChroma` is known before the header is written —
    * mb_type / coded_block_pattern need it — and [[emit]] then writes
    * the residual blocks and reconstructs the planes exactly as
    * [[decodeChromaResid]] will. Shared by the Intra_16x16 and
    * Intra_4x4 encoders. */
  private final class ChromaEnc(st: FrameState, mx: Int, my: Int,
      srcCb: Array[Byte], srcCr: Array[Byte], qpC: Int) {
    import H264Transform._
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
        val ctop = if (my > 0) Array.tabulate(8)(i => recP((cy0 - 1) * cW + cx0 + i) & 0xff) else null
        val cleft = if (mx > 0) Array.tabulate(8)(i => recP((cy0 + i) * cW + cx0 - 1) & 0xff) else null
        cPred(c) = predChroma8x8(0, ctop, cleft, 0) // DC mode
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
          val q = quant4x4(wc, qpC, skipDc = true)
          var k = 0
          while (k < 15) { cAcLv(c)(sb)(k) = q(Zigzag4x4(k + 1)); k += 1 }
          sb += 1
        }
        cDcLv(c) = quantChromaDc(dcC, qpC)
        c += 1
      }
    }

    val cbpChroma: Int =
      if (cAcLv.exists(_.exists(_.exists(_ != 0)))) 2
      else if (cDcLv.exists(_.exists(_ != 0))) 1
      else 0

    def emit(w: BitWriter): Unit = {
      if (cbpChroma > 0) {
        var c = 0
        while (c < 2) { H264Cavlc.encodeBlock(w, cDcLv(c), 4, -1); c += 1 }
      }
      var c = 0
      while (c < 2) {
        val plane = if (c == 0) st.cbPlane else st.crPlane
        val dcd2 = if (cbpChroma > 0) dequantChromaDc(cDcLv(c), qpC) else new Array[Int](4)
        var sb = 0
        while (sb < 4) {
          val sbx = sb % 2; val sby = sb / 2
          val gbx = mx * 2 + sbx; val gby = my * 2 + sby
          var resid: Array[Int] = null
          if (cbpChroma == 2) {
            val tc = H264Cavlc.encodeBlock(w, cAcLv(c)(sb), 15, st.chromaNc(c, gbx, gby))
            st.setNnzC(c, gbx, gby, tc)
            resid = dequant4x4(unzigzag(cAcLv(c)(sb), 1), qpC, skipDc = true)
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
  private[pipeline] def encodeIntra4x4Mb(w: BitWriter, st: FrameState,
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
      val q = quant4x4(forward4x4(diff), qp, skipDc = false)
      var k = 0
      while (k < 16) { levels(bi)(k) = q(Zigzag4x4(k)); k += 1 }
      // nnz now (TotalCoeff of an uncoded block is 0 either way), so
      // later blocks' nC and the emit pass read the decoder's values
      st.setNnzY(gbx, gby, levels(bi).count(_ != 0))
      // reconstruct exactly as the decoder (zero levels -> zero resid,
      // matching the uncoded-group path bit-for-bit)
      val rpx = inverse4x4(dequant4x4(unzigzag(levels(bi), 0), qp, skipDc = false))
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
    val chroma = new ChromaEnc(st, mx, my, srcCb, srcCr, chromaQp(qp))
    val cbp = cbpLuma | (chroma.cbpChroma << 4)
    // ---- write: mb_type, 16 pred modes, chroma mode, me(v) CBP,
    // qp delta (only when coded), then residuals (7.3.5.1 / 7.3.5.3)
    w.ue(0)
    bi = 0
    while (bi < 16) {
      if (prevFlags(bi)) w.u1(1) else { w.u1(0); w.u(rems(bi), 3) }
      bi += 1
    }
    w.ue(0) // intra_chroma_pred_mode = DC
    w.ue(CbpIntraToCodeNum(cbp))
    if (cbp != 0) w.se(0) // mb_qp_delta
    bi = 0
    while (bi < 16) {
      if ((cbpLuma & (1 << (bi >> 2))) != 0) {
        val (bxo, byo) = LumaBlockOrder(bi)
        H264Cavlc.encodeBlock(w, levels(bi), 16,
          st.lumaNc(mx * 4 + bxo, my * 4 + byo))
      }
      bi += 1
    }
    chroma.emit(w)
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
