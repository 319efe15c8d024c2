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
 *  - Intra_16x16 mb_types are PARSED (prediction mode / CBP fields per
 *    Table 7-11) so foreign I-frames fail soft with a clear reason
 *    (None), never mis-decode: CAVLC residual decoding is NOT
 *    implemented — that is the one remaining H.264 gap, documented
 *    here rather than stubbed silently.
 *
 * Reference scope anchor: the Mr.LDA reference has no media surface;
 * this is beyond-reference capability for the multimodal pipeline.
 */
object H264Codec {

  // ---------------- RBSP bit IO ----------------

  /** MSB-first reader over RBSP bytes (EPBs already removed). */
  private final class BitReader(data: Array[Byte]) {
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

  private final class BitWriter {
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
    r.se() // slice_qp_delta
    if (pps.deblockingControlPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() }
    }
    // slice_data: all-I macroblocks, raster order
    val wMbs = sps.widthMbs; val hMbs = sps.heightMbs
    val lumaW = wMbs * 16; val lumaH = hMbs * 16
    val yPlane = new Array[Byte](lumaW * lumaH)
    val cbPlane = new Array[Byte](lumaW * lumaH / 4)
    val crPlane = new Array[Byte](lumaW * lumaH / 4)
    var mb = 0
    val nMbs = wMbs * hMbs
    while (mb < nMbs) {
      val mbType = r.ue()
      if (mbType == 25) { // I_PCM (7.3.5)
        while (!r.byteAligned) {
          if (r.u1() != 0) throw new H264Format("pcm_alignment_zero_bit != 0")
        }
        val mbX = (mb % wMbs) * 16
        val mbY = (mb / wMbs) * 16
        var i = 0
        while (i < 256) {
          yPlane((mbY + i / 16) * lumaW + mbX + i % 16) = r.readByte().toByte
          i += 1
        }
        val cW = lumaW / 2
        i = 0
        while (i < 64) {
          cbPlane((mbY / 2 + i / 8) * cW + mbX / 2 + i % 8) = r.readByte().toByte
          i += 1
        }
        i = 0
        while (i < 64) {
          crPlane((mbY / 2 + i / 8) * cW + mbX / 2 + i % 8) = r.readByte().toByte
          i += 1
        }
      } else if (mbType >= 1 && mbType <= 24) {
        // Intra_16x16: the header fields parse (Table 7-11) but the CAVLC
        // residual does not — fail soft with a precise reason
        throw new H264Format("Intra_16x16 CAVLC residual not implemented")
      } else if (mbType == 0) {
        throw new H264Format("Intra_4x4 CAVLC residual not implemented")
      } else throw new H264Format(s"bad I-slice mb_type $mbType")
      mb += 1
    }
    (sps, yPlane, cbPlane, crPlane)
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
   * Encode one RGB frame as an IDR picture (SPS + PPS + I_PCM IDR
   * slice). `avcc = true` frames each NAL with a 4-byte length (the
   * MP4-sample convention [[Mp4Demux]] payloads use); false writes
   * Annex-B start codes. I_PCM keeps the round trip LOSSLESS up to the
   * RGB->YCbCr 4:2:0 resample, which is pinned by encoding from the
   * decoded planes (see spec).
   */
  def encode(img: MediaCodecs.Bmp, avcc: Boolean = true): Array[Byte] = {
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

    // IDR slice, every MB I_PCM
    val w2 = new BitWriter
    w2.ue(0) // first_mb_in_slice
    w2.ue(7) // slice_type I (all slices)
    w2.ue(0) // pps id
    w2.u(0, 4) // frame_num (log2_max_frame_num = 4)
    w2.ue(0) // idr_pic_id
    w2.u1(0); w2.u1(0) // dec_ref_pic_marking
    w2.se(0) // slice_qp_delta
    w2.ue(1) // disable_deblocking_filter_idc = 1
    var mb = 0
    val nMbs = wMbs * hMbs
    while (mb < nMbs) {
      w2.ue(25) // I_PCM
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
    out.toArray
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
