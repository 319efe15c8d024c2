package graft.pipeline

import scala.collection.mutable

/**
 * VP8 / VP9 / AV1 frame-HEADER parsers (r15) — the bit-structure layer
 * above the refused pixel decode. The CATALOG adjudication keeps
 * VP8/VP9/AV1 entropy decode out (probability-table mass fails the
 * honest-witness bar), but the uncompressed headers are plain bit
 * layout, auditable field-by-field against the public specs — the same
 * bar the EBML container, MP4 boxes, and H.264 headers cleared. They
 * give the pipeline per-frame keyframe detection from the BITSTREAM
 * (container flags can lie; these cannot without failing to parse) and
 * dims cross-checks against track metadata.
 *
 * Layouts transcribed from public specs: VP8 — RFC 6386 §9.1 (3-byte
 * little-endian frame tag, keyframe start code 9D 01 2A, 14-bit dims +
 * 2-bit scale); VP9 — the VP9 Bitstream & Decoding Process
 * Specification §6.2 uncompressed_header (MSB-first); AV1 — the AV1
 * Bitstream & Decoding Process Specification §5.2-5.9 (OBU framing,
 * leb128, sequence-header dims, frame-header frame_type).
 *
 * Writers ([[writeVp8KeyHeader]] etc.) synthesize spec-valid headers so
 * fixtures exercise real byte layouts — the encoder-for-fixtures
 * pattern every codec in this repo uses.
 */
object CodecHeaders {

  // ---------------- shared bit IO (MSB-first, VP9/AV1) ----------------

  private final class BitReader(p: Array[Byte], from: Int, until: Int) {
    private var pos = from * 8L
    private val end = until * 8L
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        if (pos >= end) throw new IllegalArgumentException("EOF in header bits")
        val b = p((pos >> 3).toInt) & 0xff
        v = (v << 1) | ((b >> (7 - (pos & 7)).toInt) & 1)
        pos += 1; i += 1
      }
      v
    }
    def byteAligned: Boolean = (pos & 7) == 0
    def bytePos: Int = (pos >> 3).toInt
  }

  private final class BitWriter {
    private val out = mutable.ArrayBuffer.empty[Byte]
    private var cur = 0; private var nBits = 0
    def bits(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
        i -= 1
      }
      this
    }
    def bytes(bs: Array[Byte]): this.type = {
      require(nBits == 0, "unaligned raw bytes"); out ++= bs; this
    }
    def result(): Array[Byte] = {
      if (nBits > 0) { out += (cur << (8 - nBits)).toByte; cur = 0; nBits = 0 }
      out.toArray
    }
  }

  // ---------------- VP8 (RFC 6386 §9.1) ----------------

  /** Parsed VP8 frame tag (+ keyframe start code / dims when present).
    * widthScale/heightScale are the 2-bit upscale hints. */
  case class Vp8Frame(keyframe: Boolean, version: Int, showFrame: Boolean,
      firstPartSize: Int, width: Int, height: Int,
      widthScale: Int, heightScale: Int)

  def parseVp8(p: Array[Byte]): Option[Vp8Frame] =
    try {
      if (p.length < 3) return None
      val tag = (p(0) & 0xff) | ((p(1) & 0xff) << 8) | ((p(2) & 0xff) << 16)
      val key = (tag & 1) == 0
      val version = (tag >> 1) & 7
      if (version > 3) return None // RFC 6386: versions 0-3
      val show = ((tag >> 4) & 1) == 1
      val partSize = tag >> 5
      if (!key) return Some(Vp8Frame(false, version, show, partSize, 0, 0, 0, 0))
      if (p.length < 10) return None
      if ((p(3) & 0xff) != 0x9d || (p(4) & 0xff) != 0x01 || (p(5) & 0xff) != 0x2a)
        return None // keyframe start code
      val wRaw = (p(6) & 0xff) | ((p(7) & 0xff) << 8)
      val hRaw = (p(8) & 0xff) | ((p(9) & 0xff) << 8)
      Some(Vp8Frame(true, version, show, partSize,
        wRaw & 0x3fff, hRaw & 0x3fff, wRaw >> 14, hRaw >> 14))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Spec-valid VP8 keyframe header + an opaque compressed tail. */
  def writeVp8KeyHeader(width: Int, height: Int, version: Int,
      firstPartSize: Int, tail: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= 0x3fff && height > 0 && height <= 0x3fff)
    require(firstPartSize >= 0 && firstPartSize < (1 << 19))
    val tag = (0) | (version << 1) | (1 << 4) | (firstPartSize << 5)
    Array[Byte](
      (tag & 0xff).toByte, ((tag >> 8) & 0xff).toByte, ((tag >> 16) & 0xff).toByte,
      0x9d.toByte, 0x01.toByte, 0x2a.toByte,
      (width & 0xff).toByte, ((width >> 8) & 0xff).toByte,
      (height & 0xff).toByte, ((height >> 8) & 0xff).toByte) ++ tail
  }

  /** VP8 interframe: tag only (frame_type = 1). */
  def writeVp8InterHeader(version: Int, firstPartSize: Int,
      tail: Array[Byte]): Array[Byte] = {
    val tag = 1 | (version << 1) | (1 << 4) | (firstPartSize << 5)
    Array[Byte]((tag & 0xff).toByte, ((tag >> 8) & 0xff).toByte,
      ((tag >> 16) & 0xff).toByte) ++ tail
  }

  // ---------------- VP9 (§6.2 uncompressed_header) ----------------

  /** showExisting frames carry only a map index (no new pixels). Dims
    * are populated for keyframes (intra-only/inter dims need the
    * reference-size machinery — out of this layer's scope, 0). */
  case class Vp9Frame(profile: Int, keyframe: Boolean, showFrame: Boolean,
      showExisting: Boolean, errorResilient: Boolean, width: Int, height: Int)

  def parseVp9(p: Array[Byte]): Option[Vp9Frame] =
    try {
      val r = new BitReader(p, 0, p.length)
      if (r.bits(2) != 2) return None // frame_marker
      val profile = r.bits(1) | (r.bits(1) << 1) // low bit first
      if (profile == 3 && r.bits(1) != 0) return None // reserved_zero
      if (r.bits(1) == 1) { // show_existing_frame
        r.bits(3) // frame_to_show_map_idx
        return Some(Vp9Frame(profile, keyframe = false, showFrame = true,
          showExisting = true, errorResilient = false, 0, 0))
      }
      val key = r.bits(1) == 0 // frame_type: 0 = KEY_FRAME
      val show = r.bits(1) == 1
      val er = r.bits(1) == 1
      if (!key)
        return Some(Vp9Frame(profile, keyframe = false, show,
          showExisting = false, er, 0, 0))
      if (r.bits(8) != 0x49 || r.bits(8) != 0x83 || r.bits(8) != 0x42)
        return None // frame_sync_code
      // color_config
      if (profile >= 2) r.bits(1) // ten_or_twelve_bit
      val colorSpace = r.bits(3)
      if (colorSpace != 7) { // != CS_RGB
        r.bits(1) // color_range
        if (profile == 1 || profile == 3) {
          r.bits(2) // subsampling_x/y
          if (r.bits(1) != 0) return None // reserved_zero
        }
      } else if (profile == 1 || profile == 3) {
        if (r.bits(1) != 0) return None // reserved_zero
      }
      val w = r.bits(16) + 1
      val h = r.bits(16) + 1
      Some(Vp9Frame(profile, keyframe = true, show, showExisting = false,
        er, w, h))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Spec-valid VP9 profile-0 keyframe uncompressed-header prefix. */
  def writeVp9KeyHeader(width: Int, height: Int, tail: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= 65536 && height > 0 && height <= 65536)
    val w = new BitWriter
    w.bits(2, 2) // frame_marker
    w.bits(0, 1).bits(0, 1) // profile 0 (low, high)
    w.bits(0, 1) // show_existing_frame
    w.bits(0, 1) // frame_type KEY
    w.bits(1, 1) // show_frame
    w.bits(0, 1) // error_resilient_mode
    w.bits(0x49, 8).bits(0x83, 8).bits(0x42, 8) // frame_sync_code
    w.bits(1, 3) // color_space CS_BT_601
    w.bits(0, 1) // color_range (profile 0: 4:2:0 implied, no ss bits)
    w.bits(width - 1, 16)
    w.bits(height - 1, 16)
    w.bits(0, 1) // render_and_frame_size_different
    w.result() ++ tail
  }

  /** VP9 non-key frame prefix (frame_type = 1, no dims at this layer). */
  def writeVp9InterHeader(tail: Array[Byte]): Array[Byte] = {
    val w = new BitWriter
    w.bits(2, 2) // frame_marker
    w.bits(0, 1).bits(0, 1) // profile 0
    w.bits(0, 1) // show_existing_frame
    w.bits(1, 1) // frame_type NON_KEY
    w.bits(1, 1) // show_frame
    w.bits(0, 1) // error_resilient_mode
    w.result() ++ tail
  }

  // ---------------- AV1 (§5.2-5.9) ----------------

  case class Av1Obu(obuType: Int, offset: Int, size: Int)
  /** Temporal-unit structure: the OBU list, sequence-header dims (when
    * a sequence header OBU is present), and the first frame(-header)
    * OBU's keyframe flag. */
  case class Av1Frame(obus: Seq[Av1Obu], profile: Int, width: Int,
      height: Int, keyframe: Boolean, showFrame: Boolean)

  private def leb128(p: Array[Byte], at: Int): (Long, Int) = {
    var v = 0L; var i = 0
    while (i < 8) {
      if (at + i >= p.length) throw new IllegalArgumentException("EOF in leb128")
      val b = p(at + i) & 0xff
      v |= (b & 0x7fL) << (7 * i)
      i += 1
      if ((b & 0x80) == 0) return (v, i)
    }
    throw new IllegalArgumentException("leb128 too long")
  }

  private def writeLeb128(v: Long): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    var x = v
    do {
      val b = (x & 0x7f).toInt
      x >>>= 7
      out += (if (x != 0) (b | 0x80) else b).toByte
    } while (x != 0)
    out.toArray
  }

  /** OBU types (§6.2.2). */
  final val ObuSequenceHeader = 1
  final val ObuTemporalDelimiter = 2
  final val ObuFrameHeader = 3
  final val ObuFrame = 6

  def parseAv1(p: Array[Byte]): Option[Av1Frame] =
    try {
      val obus = mutable.ArrayBuffer.empty[Av1Obu]
      var profile = -1; var w = 0; var h = 0
      var key = false; var show = false; var sawFrame = false
      var reducedStill = false
      var o = 0
      while (o < p.length) {
        val hdr = p(o) & 0xff
        if ((hdr & 0x80) != 0) throw new IllegalArgumentException("obu_forbidden_bit")
        val typ = (hdr >> 3) & 0xf
        val ext = (hdr >> 2) & 1
        val hasSize = (hdr >> 1) & 1
        if ((hdr & 1) != 0) throw new IllegalArgumentException("obu reserved bit")
        var body = o + 1
        if (ext == 1) body += 1 // temporal/spatial ids
        val (sz, szLen) =
          if (hasSize == 1) leb128(p, body)
          else (p.length.toLong - (body + 0), 0) // last OBU extends to end
        val start = body + szLen
        if (start + sz > p.length) throw new IllegalArgumentException("obu escapes")
        obus += Av1Obu(typ, start, sz.toInt)
        if (typ == ObuSequenceHeader) {
          val r = new BitReader(p, start, start + sz.toInt)
          profile = r.bits(3)
          r.bits(1) // still_picture
          reducedStill = r.bits(1) == 1
          if (reducedStill) {
            r.bits(5) // seq_level_idx
          } else {
            if (r.bits(1) == 1) // timing_info_present
              throw new IllegalArgumentException("timing_info out of this layer")
            // initial_display_delay_present gates PER-OPERATING-POINT
            // delay fields below (5.5.1) — skipping them would shift
            // every later read and silently misparse the dims
            val dispDelay = r.bits(1) == 1
            val nOps = r.bits(5) + 1
            var i = 0
            while (i < nOps) {
              r.bits(12) // operating_point_idc
              val lvl = r.bits(5)
              if (lvl > 7) r.bits(1) // seq_tier
              if (dispDelay && r.bits(1) == 1) // present_for_this_op
                r.bits(4) // initial_display_delay_minus_1
              i += 1
            }
          }
          val wBits = r.bits(4) + 1
          val hBits = r.bits(4) + 1
          w = r.bits(wBits) + 1
          h = r.bits(hBits) + 1
        } else if ((typ == ObuFrameHeader || typ == ObuFrame) && !sawFrame) {
          sawFrame = true
          val r = new BitReader(p, start, start + sz.toInt)
          if (reducedStill) { key = true; show = true }
          else {
            if (r.bits(1) == 1) { // show_existing_frame
              key = false; show = true
            } else {
              key = r.bits(2) == 0 // frame_type KEY_FRAME
              show = r.bits(1) == 1
            }
          }
        }
        o = start + sz.toInt
      }
      if (obus.isEmpty) None
      else Some(Av1Frame(obus.toSeq, profile, w, h, key, show))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Spec-valid AV1 temporal unit: temporal delimiter + sequence header
    * (main profile, one operating point, dims) + a frame OBU whose
    * header carries frame_type; the frame body past the parsed prefix
    * is opaque tail. */
  def writeAv1KeyUnit(width: Int, height: Int, tail: Array[Byte],
      dispDelay: Boolean = false): Array[Byte] =
    writeAv1Unit(width, height, keyframe = true, tail, dispDelay)

  def writeAv1InterUnit(tail: Array[Byte]): Array[Byte] =
    writeAv1Unit(0, 0, keyframe = false, tail)

  private def writeAv1Unit(width: Int, height: Int, keyframe: Boolean,
      tail: Array[Byte], dispDelay: Boolean = false): Array[Byte] = {
    def obu(typ: Int, body: Array[Byte]): Array[Byte] =
      Array((((typ & 0xf) << 3) | 2).toByte) ++ writeLeb128(body.length.toLong) ++ body
    val td = obu(ObuTemporalDelimiter, Array.empty)
    val seq =
      if (!keyframe) Array.empty[Byte]
      else {
        require(width > 0 && width <= 65536 && height > 0 && height <= 65536)
        val w = new BitWriter
        w.bits(0, 3) // seq_profile 0 (main)
        w.bits(0, 1) // still_picture
        w.bits(0, 1) // reduced_still_picture_header
        w.bits(0, 1) // timing_info_present
        w.bits(if (dispDelay) 1 else 0, 1) // initial_display_delay_present
        w.bits(0, 5) // operating_points_cnt_minus_1
        w.bits(0, 12) // operating_point_idc[0]
        w.bits(0, 5) // seq_level_idx[0] (<=7: no tier bit)
        if (dispDelay) {
          w.bits(1, 1) // initial_display_delay_present_for_this_op[0]
          w.bits(3, 4) // initial_display_delay_minus_1[0]
        }
        w.bits(15, 4) // frame_width_bits_minus_1
        w.bits(15, 4) // frame_height_bits_minus_1
        w.bits(width - 1, 16)
        w.bits(height - 1, 16)
        obu(ObuSequenceHeader, w.result())
      }
    val fh = new BitWriter
    fh.bits(0, 1) // show_existing_frame
    fh.bits(if (keyframe) 0 else 1, 2) // frame_type
    fh.bits(1, 1) // show_frame
    val frame = obu(ObuFrame, fh.result() ++ tail)
    td ++ seq ++ frame
  }

  /** Dispatch on a WebM track's CodecID: per-frame bitstream header
    * facts as (keyframe, width, height) — (false, 0, 0) dims when the
    * frame is not a keyframe or the payload does not parse. */
  def frameFacts(codecId: String, frame: Array[Byte]): Option[(Boolean, Int, Int)] =
    codecId match {
      case "V_VP8" => parseVp8(frame).map(f => (f.keyframe, f.width, f.height))
      case "V_VP9" => parseVp9(frame).map(f => (f.keyframe, f.width, f.height))
      case "V_AV1" => parseAv1(frame).map(f => (f.keyframe, f.width, f.height))
      case _ => None
    }

  // ------- audio headers: Opus (RFC 7845/6716) / Vorbis (Xiph I) -------
  // The HEADER layer only, same posture as the video parsers above:
  // audio DECODE stays refused (CATALOG — Opus/Vorbis codebook mass
  // fails the honest-witness bar), but the id headers and the Opus TOC
  // byte are plain structure with magic-anchored layouts.

  /** OpusHead (RFC 7845 §5.1, the WebM/Ogg CodecPrivate payload). */
  case class OpusHead(version: Int, channels: Int, preSkip: Int,
      inputSampleRate: Long, outputGainQ8: Int, mappingFamily: Int)

  def parseOpusHead(p: Array[Byte]): Option[OpusHead] =
    try {
      if (p.length < 19) return None
      if (new String(p, 0, 8, "ISO-8859-1") != "OpusHead") return None
      val version = p(8) & 0xff
      if ((version >> 4) != 0) return None // compat rule: major 0
      val ch = p(9) & 0xff
      if (ch == 0) return None
      def u16le(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      def u32le(o: Int) = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
      val family = p(18) & 0xff
      if (family != 0 && p.length < 21 + ch) return None // mapping table
      Some(OpusHead(version, ch, u16le(10), u32le(12), u16le(16).toShort, family))
    } catch { case scala.util.control.NonFatal(_) => None }

  def writeOpusHead(channels: Int, preSkip: Int, inputRate: Long,
      gainQ8: Int = 0): Array[Byte] = {
    require(channels >= 1 && channels <= 2, "family-0 channels")
    val out = mutable.ArrayBuffer.empty[Byte]
    out ++= "OpusHead".getBytes("ISO-8859-1")
    out += 1 // version
    out += channels.toByte
    out += (preSkip & 0xff).toByte; out += ((preSkip >> 8) & 0xff).toByte
    var i = 0
    while (i < 4) { out += ((inputRate >> (8 * i)) & 0xff).toByte; i += 1 }
    out += (gainQ8 & 0xff).toByte; out += ((gainQ8 >> 8) & 0xff).toByte
    out += 0 // mapping family 0 (mono/stereo)
    out.toArray
  }

  /** Opus TOC byte (RFC 6716 §3.1): per-packet frame layout. Durations
    * in MICROSECONDS per the config table (SILK 10/20/40/60 ms bands,
    * hybrid 10/20, CELT 2.5/5/10/20). */
  case class OpusToc(config: Int, stereo: Boolean, framesInPacket: Int,
      frameDurationUs: Int) {
    def packetDurationUs: Long = framesInPacket.toLong * frameDurationUs
  }

  def parseOpusToc(p: Array[Byte]): Option[OpusToc] =
    try {
      if (p.isEmpty) return None
      val b = p(0) & 0xff
      val config = b >> 3
      val stereo = ((b >> 2) & 1) == 1
      val code = b & 3
      val n = code match {
        case 0 => 1
        case 1 | 2 => 2
        case _ =>
          if (p.length < 2) return None
          val m = p(1) & 0x3f
          if (m == 0) return None // RFC 6716: code-3 M must be >= 1
          m
      }
      val durUs =
        if (config < 12) Array(10000, 20000, 40000, 60000)(config % 4) // SILK
        else if (config < 16) Array(10000, 20000)(config % 2) // hybrid
        else Array(2500, 5000, 10000, 20000)(config % 4) // CELT
      if (n.toLong * durUs > 120000L) return None // max packet 120 ms
      Some(OpusToc(config, stereo, n, durUs))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One Opus packet: TOC + opaque compressed tail. `frames` > 1 uses
    * code 3 (count byte, CBR flag 0 pattern covered by padding-free
    * VBR=0). */
  def writeOpusPacket(config: Int, stereo: Boolean, frames: Int,
      tail: Array[Byte]): Array[Byte] = {
    require(config >= 0 && config <= 31 && frames >= 1 && frames <= 48)
    val code = if (frames == 1) 0 else 3
    val toc = ((config << 3) | (if (stereo) 4 else 0) | code).toByte
    if (code == 0) toc +: tail
    else Array(toc, frames.toByte) ++ tail // code 3, cbr, no padding
  }

  /** Vorbis identification header (Xiph Vorbis I §4.2.2). */
  case class VorbisId(channels: Int, sampleRate: Long, blocksize0: Int,
      blocksize1: Int)

  def parseVorbisId(p: Array[Byte]): Option[VorbisId] =
    try {
      if (p.length < 30) return None
      if ((p(0) & 0xff) != 1) return None // packet_type id
      if (new String(p, 1, 6, "ISO-8859-1") != "vorbis") return None
      def u32le(o: Int) = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
      if (u32le(7) != 0L) return None // vorbis_version
      val ch = p(11) & 0xff
      val rate = u32le(12)
      if (ch == 0 || rate == 0) return None
      val bs = p(28) & 0xff
      val bs0 = 1 << (bs & 0xf)
      val bs1 = 1 << (bs >> 4)
      if (bs0 > bs1) return None // spec: blocksize_0 <= blocksize_1
      if ((p(29) & 1) != 1) return None // framing flag
      Some(VorbisId(ch, rate, bs0, bs1))
    } catch { case scala.util.control.NonFatal(_) => None }

  def writeVorbisId(channels: Int, rate: Long, log2Bs0: Int = 8,
      log2Bs1: Int = 11): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    out += 1; out ++= "vorbis".getBytes("ISO-8859-1")
    out ++= Array.fill(4)(0.toByte) // version 0
    out += channels.toByte
    var i = 0
    while (i < 4) { out += ((rate >> (8 * i)) & 0xff).toByte; i += 1 }
    out ++= Array.fill(12)(0.toByte) // bitrate max/nominal/min
    out += ((log2Bs1 << 4) | log2Bs0).toByte
    out += 1 // framing flag
    out.toArray
  }

  /** WebM/Matroska Vorbis CodecPrivate: Xiph-laced 3 header packets
    * (count byte 2, then 255-run lengths of the first two). Returns the
    * IDENTIFICATION packet. */
  def vorbisIdFromPrivate(priv: Array[Byte]): Option[Array[Byte]] =
    try {
      if (priv.length < 3 || (priv(0) & 0xff) != 2) return None
      var o = 1
      val lens = new Array[Int](2)
      var k = 0
      while (k < 2) {
        var s = 0; var b = 255
        while (b == 255) {
          if (o >= priv.length) return None
          b = priv(o) & 0xff; s += b; o += 1
        }
        lens(k) = s; k += 1
      }
      if (o + lens(0) > priv.length) return None
      Some(java.util.Arrays.copyOfRange(priv, o, o + lens(0)))
    } catch { case scala.util.control.NonFatal(_) => None }

  def writeVorbisPrivate(idPacket: Array[Byte], comment: Array[Byte],
      setup: Array[Byte]): Array[Byte] = {
    def xiphLen(n: Int): Array[Byte] =
      Array.fill(n / 255)(255.toByte) ++ Array((n % 255).toByte)
    Array(2.toByte) ++ xiphLen(idPacket.length) ++ xiphLen(comment.length) ++
      idPacket ++ comment ++ setup
  }

  /** The canonical per-doc planted WebM fixture (the
    * q_webm_codec_headers / q_stream_webm_ingest schedule): spec-valid
    * VP8/VP9/AV1 frame headers on a closed-form keyframe cadence
    * inside a real container, with the container layout (cluster
    * split, sized/streaming segment form) varied per doc — every
    * consumer derives the SAME bytes, so the SQL oracles and the
    * stream-vs-batch joins can never desynchronize. */
  private[graft] def plantedWebmForDoc(id: Long, text: String): Array[Byte] = {
    val len = text.codePointCount(0, text.length)
    val n = 4 + (len % 5)
    val ke = 2 + (id % 3).toInt
    val w = 128 + 16 * (len % 6)
    val h = 72 + 8 * (id % 5).toInt
    val codec = (id % 3) match {
      case 0 => "V_VP8"; case 1 => "V_VP9"; case _ => "V_AV1"
    }
    val frames = (0 until n).map { i =>
      val tl = Array.tabulate(10 + ((len + i) % 7))(k =>
        ((id * 13 + i * 7 + k) % 251).toByte)
      val key = i % ke == 0
      codec match {
        case "V_VP8" =>
          if (key) writeVp8KeyHeader(w, h, 0, tl.length, tl)
          else writeVp8InterHeader(0, tl.length, tl)
        case "V_VP9" =>
          if (key) writeVp9KeyHeader(w, h, tl)
          else writeVp9InterHeader(tl)
        case _ =>
          if (key) writeAv1KeyUnit(w, h, tl)
          else writeAv1InterUnit(tl)
      }
    }
    WebmDemux.encodeWebm(frames, w, h, codecId = codec,
      laceSize = 1, blocksPerCluster = 2 + (len % 2), keyframeEvery = ke,
      // half the docs take the live-streaming container shape
      unknownSizeClusters = id % 2 == 1, sizedSegment = id % 4 == 3)
  }

  /** Bitstream-true audio facts for a WebM track: (channels, rate)
    * from the CodecPrivate id header — the cross-check against the
    * container's Audio element the video dims cross-check parallels. */
  def audioFacts(codecId: String, codecPrivate: Array[Byte]): Option[(Int, Long)] =
    codecId match {
      case "A_OPUS" =>
        parseOpusHead(codecPrivate).map(h => (h.channels, h.inputSampleRate))
      case "A_VORBIS" =>
        vorbisIdFromPrivate(codecPrivate).flatMap(parseVorbisId)
          .map(v => (v.channels, v.sampleRate))
      case _ => None
    }
}
