package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/**
 * Pure-JVM FLAC codec (the xiph.org free lossless audio format, now
 * also RFC 9639) — the audio container real training corpora ship in
 * (LibriSpeech, Common Voice exports, …). Unlike AAC/MP3, FLAC is
 * entirely TABLE-FREE — Rice/Golomb entropy coding plus polynomial or
 * in-stream-LPC prediction — so every line here is verifiable from
 * arithmetic alone, and because the format is LOSSLESS the round-trip
 * specs pin byte-exact sample equality (the strongest witness class,
 * same posture as the BMP/WAV/Y4M codecs and H.264 I_PCM).
 *
 * Scope:
 *  - Container: "fLaC" magic, metadata block walk (STREAMINFO parsed —
 *    rate/channels/bps/total/MD5 — other blocks skipped), fixed
 *    blocking strategy frames.
 *  - Frame layer: sync + header (explicit 16-bit block size, rate from
 *    STREAMINFO), UTF-8-coded frame number, CRC-8 header check and
 *    CRC-16 whole-frame check — both VERIFIED on decode (corruption
 *    rejects the file; callers' corrupt-drop try turns that into a
 *    dropped sample).
 *  - Channels: mono, independent stereo, and all three stereo
 *    decorrelation modes (left/side, right/side, mid/side — the side
 *    channel carries bps+1 bits, per spec).
 *  - Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC (any
 *    order 1-32, quantized coefficients from the stream), wasted-bits
 *    unary prefix, Rice residual partitions (4- and 5-bit parameter
 *    methods, escape partitions with raw n-bit samples, any partition
 *    order).
 *  - Encoder ([[encodeFlac]]): 16-bit PCM, 1-2 channels, per-block
 *    best-of (CONSTANT / FIXED 0-4 / optional LPC via Levinson-Durbin)
 *    per channel, stereo mode chosen per block by coded cost,
 *    wasted-bits detection, per-partition Rice parameter search, and
 *    the STREAMINFO MD5 of the unencoded samples (decode verifies it).
 *
 * Reference scope anchor: the Mr.LDA reference has no media surface;
 * this is beyond-reference capability for the multimodal pipeline.
 */
object FlacCodec {

  def isFlac(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C'

  private final class FlacFormat(msg: String) extends RuntimeException(msg)

  // ---------------- bit IO (MSB-first, as the spec reads) ----------------

  // Bit position tracked in Long: `byteOffset * 8` overflows Int for
  // payloads >= 256 MiB (24-bit studio corpora get there), which would
  // fail valid files with a spurious "bit overrun".
  private final class BitReader(data: Array[Byte], var pos: Long) {
    def bitsLeft: Long = data.length.toLong * 8 - pos
    def u1(): Int = {
      if (pos >= data.length.toLong * 8) throw new FlacFormat("bit overrun")
      val b = (data((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
      pos += 1
      b
    }
    def u(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    /** n-bit two's-complement signed read. */
    def s(n: Int): Int = {
      val v = u(n)
      (if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v).toInt
    }
    def unary(): Int = { // zeros terminated by a one
      var q = 0
      while (u1() == 0) {
        q += 1
        if (q > (1 << 24)) throw new FlacFormat("unary runaway")
      }
      q
    }
    def alignToByte(): Unit = { pos = (pos + 7) & ~7L }
    def bytePos: Int = { require((pos & 7) == 0); (pos >> 3).toInt }
  }

  private final class BitWriter {
    val out = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def u1(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
    }
    def u(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { u1(((v >> i) & 1).toInt); i -= 1 }
    }
    def s(v: Int, n: Int): Unit = u(v.toLong & ((1L << n) - 1), n)
    def unary(q: Int): Unit = { var i = 0; while (i < q) { u1(0); i += 1 }; u1(1) }
    def alignToByte(): Unit = while (nbits != 0) u1(0)
    def bytes: Array[Byte] = { require(nbits == 0); out.toArray }
  }

  /** Spec hook: round-trip a frame-number value through the UTF-8-style
    * coder in isolation (streams short enough to exercise the 3+-byte
    * forms would need hundreds of frames). */
  private[pipeline] def utf8NumberRoundTrip(v: Long): Long = {
    val w = new BitWriter
    writeUtf8Number(w, v)
    w.alignToByte()
    readUtf8Number(new BitReader(w.bytes, 0))
  }

  // ---------------- CRCs (spec polynomials, bitwise — no tables) ----------------

  /** CRC-8, poly 0x07, init 0 (frame header check). */
  private[pipeline] def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 (whole-frame check). */
  private[pipeline] def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---------------- fixed predictors (subset of the spec's table) ----------------

  private def fixedPredict(order: Int, s: Array[Int], i: Int): Long = order match {
    case 0 => 0L
    case 1 => s(i - 1).toLong
    case 2 => 2L * s(i - 1) - s(i - 2)
    case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
    case _ => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
  }

  // ---------------- decode ----------------

  /** Decoded stream as the repo's audio interchange type (interleaved
    * 16-bit samples). Streams beyond 16 bits/sample yield None on THIS
    * facade (the interchange type is 16-bit) — [[decodeFlacRaw]]
    * decodes them at native depth. >2 channels, CRC and MD5 mismatches
    * reject on both. */
  def decodeFlac(payload: Array[Byte]): Option[MediaCodecs.Wav] =
    try decodeImpl(payload).flatMap { case (rate, ch, bps, samples) =>
      if (bps > 16) None
      else Some(MediaCodecs.Wav(rate, ch, samples.map(_.toShort)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode at the stream's NATIVE bit depth (8..24 — studio corpora
    * ship 24-bit FLAC): (rate, channels, bps, interleaved samples). */
  def decodeFlacRaw(payload: Array[Byte]): Option[(Int, Int, Int, Array[Int])] =
    try decodeImpl(payload) catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(p: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (!isFlac(p)) return None
    var o = 4
    var sampleRate = 0
    var channels = 0
    var bps = 0
    var totalSamples = 0L
    var md5: Array[Byte] = null
    // metadata block walk
    var last = false
    var sawStreamInfo = false
    while (!last) {
      if (o + 4 > p.length) throw new FlacFormat("truncated metadata")
      last = (p(o) & 0x80) != 0
      val typ = p(o) & 0x7f
      val len = ((p(o + 1) & 0xff) << 16) | ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
      o += 4
      if (o + len > p.length) throw new FlacFormat("metadata overrun")
      if (typ == 0) { // STREAMINFO
        if (len < 34) throw new FlacFormat("short STREAMINFO")
        val r = new BitReader(p, o.toLong * 8)
        r.u(16); r.u(16) // min/max block size
        r.u(24); r.u(24) // min/max frame size
        sampleRate = r.u(20).toInt
        channels = r.u(3).toInt + 1
        bps = r.u(5).toInt + 1
        totalSamples = r.u(36)
        md5 = java.util.Arrays.copyOfRange(p, o + 18, o + 34)
        sawStreamInfo = true
      }
      o += len
    }
    if (!sawStreamInfo) throw new FlacFormat("no STREAMINFO")
    if (sampleRate <= 0) throw new FlacFormat("bad sample rate")
    if (channels > 2) throw new FlacFormat(s"$channels channels out of scope")
    if (bps > 24) throw new FlacFormat(s"$bps bits/sample out of scope")
    // total_samples == 0 means "unknown" per the spec (common in
    // streamed flac output) — decode frames until the payload is
    // exhausted rather than silently yielding zero samples.
    val totalKnown = totalSamples > 0
    if (totalSamples > (1L << 31) / channels) throw new FlacFormat("stream too long")
    val sampleLo = -(1 << (bps - 1)); val sampleHi = (1 << (bps - 1)) - 1
    val outSamples = new ArrayBuffer[Int](
      math.min(totalSamples * channels, 1L << 20).toInt)
    var decoded = 0L
    while (if (totalKnown) decoded < totalSamples else o < p.length) {
      val frameStart = o
      val r = new BitReader(p, o.toLong * 8)
      // frame header
      if (r.u(14) != 0x3ffe) throw new FlacFormat("lost frame sync")
      if (r.u1() != 0) throw new FlacFormat("reserved bit set")
      val variableBlocking = r.u1() == 1
      if (variableBlocking) throw new FlacFormat("variable blocking out of scope")
      val bsCode = r.u(4).toInt
      val srCode = r.u(4).toInt
      val chanAsgn = r.u(4).toInt
      val ssCode = r.u(3).toInt
      if (r.u1() != 0) throw new FlacFormat("reserved bit set")
      // UTF-8-coded frame number (fixed blocking: frame index)
      readUtf8Number(r)
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.u(8).toInt + 1
        case 7 => r.u(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new FlacFormat(s"reserved block size code $bsCode")
      }
      srCode match { // only the follow-up fields matter; value from STREAMINFO
        case 12 => r.u(8)
        case 13 | 14 => r.u(16)
        case 15 => throw new FlacFormat("invalid sample rate code")
        case _ => ()
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case _ => throw new FlacFormat(s"reserved sample size code $ssCode")
      }
      if (frameBps != bps)
        throw new FlacFormat(s"frame bps $frameBps != stream bps $bps")
      // CRC-8 covers the header bytes read so far
      r.alignToByte()
      val headerEnd = r.bytePos
      val storedCrc8 = r.u(8).toInt
      if (storedCrc8 != crc8(p, frameStart, headerEnd))
        throw new FlacFormat("frame header CRC-8 mismatch")
      val nCh = chanAsgn match {
        case c if c <= 7 => c + 1
        case 8 | 9 | 10 => 2
        case _ => throw new FlacFormat(s"reserved channel assignment $chanAsgn")
      }
      if (nCh != channels) throw new FlacFormat("frame/stream channel mismatch")
      if (totalKnown && blockSize.toLong > totalSamples - decoded)
        throw new FlacFormat("frame overruns total_samples")
      if (!totalKnown && decoded + blockSize > (1L << 31) / channels)
        throw new FlacFormat("stream too long")
      // subframes
      val chan = Array.ofDim[Int](nCh, blockSize)
      var c = 0
      while (c < nCh) {
        // stereo decorrelation: the SIDE channel carries one extra bit
        val extra = chanAsgn match {
          case 8 => if (c == 1) 1 else 0 // left/side
          case 9 => if (c == 0) 1 else 0 // right/side
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(r, chan(c), frameBps + extra)
        c += 1
      }
      // inter-channel reconstruction
      chanAsgn match {
        case 8 => // left/side: R = L - side
          var i = 0
          while (i < blockSize) { chan(1)(i) = chan(0)(i) - chan(1)(i); i += 1 }
        case 9 => // right/side: stored (side, R); L = R + side
          var i = 0
          while (i < blockSize) {
            val side = chan(0)(i)
            chan(0)(i) = chan(1)(i) + side
            i += 1
          }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            var mid = chan(0)(i)
            val side = chan(1)(i)
            mid = (mid << 1) | (side & 1)
            chan(0)(i) = (mid + side) >> 1
            chan(1)(i) = (mid - side) >> 1
            i += 1
          }
        case _ => ()
      }
      // frame footer: CRC-16 over everything incl. the header's CRC-8
      r.alignToByte()
      val frameEnd = r.bytePos
      val storedCrc16 = r.u(16).toInt
      if (storedCrc16 != crc16(p, frameStart, frameEnd))
        throw new FlacFormat("frame CRC-16 mismatch")
      o = r.bytePos
      var i = 0
      while (i < blockSize) {
        var cc = 0
        while (cc < nCh) {
          val v = chan(cc)(i)
          if (v < sampleLo || v > sampleHi)
            throw new FlacFormat(s"sample out of $bps-bit range")
          outSamples += v
          cc += 1
        }
        i += 1
      }
      decoded += blockSize
    }
    val samples = outSamples.toArray
    // STREAMINFO MD5 (of the little-endian unencoded samples, bps/8
    // bytes each — the spec's packing for byte-aligned depths): verify
    // when present (all-zero = unset)
    if (md5 != null && md5.exists(_ != 0) && bps % 8 == 0) {
      if (!java.util.Arrays.equals(md5, sampleMd5(samples, bps / 8)))
        throw new FlacFormat("STREAMINFO MD5 mismatch")
    }
    Some((sampleRate, channels, bps, samples))
  }

  private[pipeline] def readUtf8Number(r: BitReader): Long = {
    val first = r.u(8).toInt
    var ones = 0
    while (ones < 8 && ((first << ones) & 0x80) != 0) ones += 1
    if (ones == 0) first.toLong
    else if (ones == 1 || ones > 7) throw new FlacFormat("bad UTF-8 number")
    else {
      var v = (first & (0x7f >> ones)).toLong
      var i = 1
      while (i < ones) {
        val b = r.u(8).toInt
        if ((b & 0xc0) != 0x80) throw new FlacFormat("bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3f)
        i += 1
      }
      v
    }
  }

  private def decodeSubframe(r: BitReader, out: Array[Int], bps: Int): Unit = {
    if (r.u1() != 0) throw new FlacFormat("subframe padding bit set")
    val typ = r.u(6).toInt
    var wasted = 0
    if (r.u1() == 1) wasted = r.unary() + 1
    val eff = bps - wasted
    if (eff <= 0) throw new FlacFormat("wasted bits exceed sample size")
    val n = out.length
    typ match {
      case 0 => // CONSTANT
        val v = r.s(eff)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { out(i) = r.s(eff); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED, order t-8
        val order = t - 8
        if (order > n) throw new FlacFormat("order exceeds block")
        var i = 0
        while (i < order) { out(i) = r.s(eff); i += 1 }
        val resid = new Array[Int](n - order)
        decodeResidual(r, resid, n, order)
        i = order
        while (i < n) {
          val v = fixedPredict(order, out, i) + resid(i - order)
          if (v < Int.MinValue || v > Int.MaxValue) throw new FlacFormat("overflow")
          out(i) = v.toInt
          i += 1
        }
      case t if t >= 32 => // LPC, order (t & 31) + 1
        val order = (t & 31) + 1
        if (order > n) throw new FlacFormat("order exceeds block")
        var i = 0
        while (i < order) { out(i) = r.s(eff); i += 1 }
        val precision = r.u(4).toInt + 1
        if (precision == 16) throw new FlacFormat("invalid qlp precision")
        val shift = r.s(5)
        if (shift < 0) throw new FlacFormat("negative qlp shift")
        val coefs = Array.fill(order)(r.s(precision))
        val resid = new Array[Int](n - order)
        decodeResidual(r, resid, n, order)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
          val v = (acc >> shift) + resid(i - order)
          if (v < Int.MinValue || v > Int.MaxValue) throw new FlacFormat("overflow")
          out(i) = v.toInt
          i += 1
        }
      case t => throw new FlacFormat(s"reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  private def decodeResidual(r: BitReader, resid: Array[Int], blockSize: Int,
      predOrder: Int): Unit = {
    val method = r.u(2).toInt // 0: 4-bit rice, 1: 5-bit rice2
    if (method > 1) throw new FlacFormat(s"reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = r.u(4).toInt
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) throw new FlacFormat("partition/block mismatch")
    val partLen = blockSize >> partOrder
    var idx = 0
    var part = 0
    while (part < nParts) {
      val count = if (part == 0) partLen - predOrder else partLen
      if (count < 0) throw new FlacFormat("negative partition length")
      val param = r.u(pBits).toInt
      if (param == escape) {
        val raw = r.u(5).toInt
        var i = 0
        while (i < count) {
          resid(idx) = if (raw == 0) 0 else r.s(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val u = (q.toLong << param) | r.u(param)
          resid(idx) = (if ((u & 1) != 0) -((u >> 1) + 1) else u >> 1).toInt
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }

  private def sampleMd5(samples: Array[Int], bytesPer: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](bytesPer * samples.length)
    var i = 0
    while (i < samples.length) { // little-endian, as the spec hashes
      var b = 0
      while (b < bytesPer) {
        buf(bytesPer * i + b) = ((samples(i) >> (8 * b)) & 0xff).toByte
        b += 1
      }
      i += 1
    }
    md.digest(buf)
  }

  // ---------------- encode ----------------

  /**
   * Encode interleaved 16-bit PCM as FLAC. Per 4096-sample block and
   * per channel the cheapest of CONSTANT / FIXED 0-4 / (optionally)
   * Levinson-Durbin LPC wins by exact coded cost; for stereo the best
   * of independent / left-side / right-side / mid-side wins the same
   * way. `forceEscape` makes every Rice partition use the raw-bits
   * escape (spec hook — exercises the decoder's escape path in a
   * lossless round trip); `partitionOrder` > 0 splits residuals into
   * 2^k Rice partitions with independent parameters.
   */
  def encodeFlac(wav: MediaCodecs.Wav, useLpc: Boolean = false,
      lpcOrder: Int = 8, partitionOrder: Int = 0,
      forceEscape: Boolean = false): Array[Byte] =
    encodeFlacRaw(wav.sampleRateHz, wav.channels, 16,
      wav.samples.map(_.toInt), useLpc, lpcOrder, partitionOrder, forceEscape)

  /** Encode at a native bit depth (8/12/16/20/24 — the sample-size
    * codes a frame header can carry): interleaved samples must fit the
    * depth's signed range. */
  def encodeFlacRaw(sampleRateHz: Int, channels: Int, bps: Int,
      samples: Array[Int], useLpc: Boolean = false,
      lpcOrder: Int = 8, partitionOrder: Int = 0,
      forceEscape: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 2, "1-2 channels")
    // the STREAMINFO rate field is 20 bits; a wider value would be
    // silently truncated into a wrong-rate archive
    require(sampleRateHz > 0 && sampleRateHz < (1 << 20),
      s"sample rate $sampleRateHz outside STREAMINFO's 20-bit field")
    require(samples.length % channels == 0, "ragged interleave")
    require(partitionOrder >= 0 && partitionOrder <= 6, "partition order 0-6")
    require(Set(8, 12, 16, 20, 24).contains(bps), s"bps $bps not codable")
    val lo = -(1 << (bps - 1)); val hi = (1 << (bps - 1)) - 1
    require(samples.forall(v => v >= lo && v <= hi), s"sample outside $bps-bit range")
    val nCh = channels
    val total = samples.length / nCh
    val blockSizeMax = 4096
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    si.u(blockSizeMax, 16); si.u(blockSizeMax, 16) // min/max block size
    si.u(0, 24); si.u(0, 24) // min/max frame size unknown
    si.u(sampleRateHz.toLong, 20)
    si.u(nCh - 1, 3)
    si.u(bps - 1, 5)
    si.u(total.toLong, 36)
    // the spec's MD5 packing is byte-aligned; non-multiple-of-8 depths
    // write the all-zero "unset" marker
    val md5 = if (bps % 8 == 0) sampleMd5(samples, bps / 8) else new Array[Byte](16)
    val siBytes = si.bytes ++ md5
    out.write(Array[Byte](0x80.toByte, 0, 0, siBytes.length.toByte))
    out.write(siBytes)
    var start = 0
    var frameIdx = 0L
    while (start < total || (total == 0 && frameIdx == 0 && start == 0)) {
      val n = math.min(blockSizeMax, total - start)
      if (n <= 0) { start = total + 1 } // zero-length stream: no frames
      else {
        val chans = Array.tabulate(nCh)(c =>
          Array.tabulate(n)(i => samples((start + i) * nCh + c)))
        out.write(encodeFrame(chans, n, frameIdx, bps, useLpc, lpcOrder,
          partitionOrder, forceEscape))
        start += n
        frameIdx += 1
      }
    }
    out.toByteArray
  }

  /** One encoded frame; picks the stereo mode and per-channel subframe
    * by exact coded bit cost. */
  private def encodeFrame(chans: Array[Array[Int]], n: Int, frameIdx: Long,
      bps: Int, useLpc: Boolean, lpcOrder: Int, partitionOrder: Int,
      forceEscape: Boolean): Array[Byte] = {
    val nCh = chans.length
    // candidate stereo assignments: (chanAsgn code, channel planes, extra-bit flags)
    val candidates: Seq[(Int, Array[Array[Int]], Array[Int])] =
      if (nCh == 1) Seq((0, chans, Array(0)))
      else {
        val l = chans(0); val rr = chans(1)
        val side = Array.tabulate(n)(i => l(i) - rr(i))
        val mid = Array.tabulate(n)(i => (l(i) + rr(i)) >> 1)
        Seq(
          (1, Array(l, rr), Array(0, 0)),
          (8, Array(l, side), Array(0, 1)),
          (9, Array(side, rr), Array(1, 0)),
          (10, Array(mid, side), Array(0, 1)))
      }
    val best = candidates.minBy { case (_, planes, extras) =>
      planes.zip(extras).map { case (pl, ex) =>
        val w = new BitWriter
        encodeSubframe(w, pl, bps + ex, useLpc, lpcOrder, partitionOrder, forceEscape)
        w.out.length * 8
      }.sum
    }
    val (asgn, planes, extras) = best
    val w = new BitWriter
    w.u(0x3ffe, 14) // sync
    w.u1(0); w.u1(0) // reserved, fixed blocking
    w.u(7, 4) // block size: explicit 16-bit value follows
    w.u(0, 4) // sample rate: from STREAMINFO
    w.u(asgn.toLong, 4)
    w.u(bps match { // sample size code
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case _ => 6
    }, 3)
    w.u1(0) // reserved
    writeUtf8Number(w, frameIdx)
    w.u(n - 1, 16)
    val headerBytes = w.bytes // byte-aligned here by construction
    val w2 = new BitWriter
    headerBytes.foreach(b => w2.u(b & 0xff, 8))
    w2.u(crc8(headerBytes, 0, headerBytes.length), 8)
    planes.zip(extras).foreach { case (pl, ex) =>
      encodeSubframe(w2, pl, bps + ex, useLpc, lpcOrder, partitionOrder, forceEscape)
    }
    w2.alignToByte()
    val body = w2.bytes
    val w3 = new BitWriter
    body.foreach(b => w3.u(b & 0xff, 8))
    w3.u(crc16(body, 0, body.length), 16)
    w3.bytes
  }

  private[pipeline] def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.u(v, 8)
    else {
      // count of leading-ones bytes needed
      var bytes = 2
      while (bytes < 7 && v >= (1L << (6 * (bytes - 1) + (7 - bytes)))) bytes += 1
      w.u((0xff << (8 - bytes)) & 0xfe | ((v >> (6 * (bytes - 1))) &
        ((1 << (7 - bytes)) - 1)).toInt, 8)
      var i = bytes - 2
      while (i >= 0) { w.u(0x80 | ((v >> (6 * i)) & 0x3f), 8); i -= 1 }
    }
  }

  /** One subframe: cheapest of CONSTANT / FIXED 0-4 / optional LPC by
    * exact coded cost, with wasted-bits detection. */
  private def encodeSubframe(w: BitWriter, samplesIn: Array[Int], bps: Int,
      useLpc: Boolean, lpcOrder: Int, partitionOrder: Int,
      forceEscape: Boolean): Unit = {
    val n = samplesIn.length
    // wasted bits: shared low zero bits across the block
    var wasted = 0
    if (samplesIn.exists(_ != 0)) {
      var orAll = 0
      samplesIn.foreach(v => orAll |= v)
      while (wasted < bps - 1 && (orAll & (1 << wasted)) == 0) wasted += 1
    }
    val eff = bps - wasted
    val s = if (wasted == 0) samplesIn else samplesIn.map(_ >> wasted)
    def writeTypeAndWasted(typ: Int): Unit = {
      w.u1(0); w.u(typ.toLong, 6)
      if (wasted > 0) { w.u1(1); var i = 0; while (i < wasted - 1) { w.u1(0); i += 1 }; w.u1(1) }
      else w.u1(0)
    }
    // CONSTANT?
    if (s.forall(_ == s(0))) {
      writeTypeAndWasted(0)
      w.s(s(0), eff)
      return
    }
    // candidates: fixed orders 0-4 (bounded by n-1), optional LPC
    case class Cand(cost: Long, write: () => Unit)
    val cands = ArrayBuffer.empty[Cand]
    var order = 0
    while (order <= math.min(4, n - 1)) {
      val resid = new Array[Int](n - order)
      var ok = true
      var i = order
      while (i < n && ok) {
        val d = s(i) - fixedPredict(order, s, i)
        if (d < Int.MinValue || d > Int.MaxValue) ok = false
        else resid(i - order) = d.toInt
        i += 1
      }
      if (ok) {
        val o = order
        val cost = order.toLong * eff +
          residualCost(resid, n, o, partitionOrder, forceEscape)
        cands += Cand(cost, () => {
          writeTypeAndWasted(8 + o)
          var k = 0
          while (k < o) { w.s(s(k), eff); k += 1 }
          writeResidual(w, resid, n, o, partitionOrder, forceEscape)
        })
      }
      order += 1
    }
    if (useLpc && n > lpcOrder * 2 && lpcOrder >= 1 && lpcOrder <= 32) {
      lpcAnalyze(s, lpcOrder).foreach { case (coefs, shift, precision) =>
        val o = lpcOrder
        val resid = new Array[Int](n - o)
        var i = o
        var ok = true
        while (i < n && ok) {
          var acc = 0L
          var j = 0
          while (j < o) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
          val d = s(i).toLong - (acc >> shift)
          if (d < Int.MinValue || d > Int.MaxValue) ok = false
          else resid(i - o) = d.toInt
          i += 1
        }
        if (ok) {
          val cost = o.toLong * eff + 4 + 5 + o.toLong * precision +
            residualCost(resid, n, o, partitionOrder, forceEscape)
          cands += Cand(cost, () => {
            writeTypeAndWasted(32 | (o - 1))
            var k = 0
            while (k < o) { w.s(s(k), eff); k += 1 }
            w.u(precision - 1, 4)
            w.s(shift, 5)
            coefs.foreach(c => w.s(c, precision))
            writeResidual(w, resid, n, o, partitionOrder, forceEscape)
          })
        }
      }
    }
    val verbatimCost = n.toLong * eff
    if (cands.isEmpty || cands.map(_.cost).min >= verbatimCost) {
      writeTypeAndWasted(1)
      var i = 0
      while (i < n) { w.s(s(i), eff); i += 1 }
    } else cands.minBy(_.cost).write()
  }

  /** Levinson-Durbin on the rectangular-window autocorrelation;
    * coefficients quantized to `precision` bits at a right-shift the
    * integer replay uses exactly. None when the signal is degenerate. */
  private def lpcAnalyze(s: Array[Int], order: Int)
      : Option[(Array[Int], Int, Int)] = {
    val n = s.length
    val ac = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var sum = 0.0
      var i = lag
      while (i < n) { sum += s(i).toDouble * s(i - lag); i += 1 }
      ac(lag) = sum
      lag += 1
    }
    if (ac(0) == 0.0) return None
    val lpc = new Array[Double](order)
    var err = ac(0)
    var i = 0
    while (i < order) {
      var acc = ac(i + 1)
      var j = 0
      while (j < i) { acc -= lpc(j) * ac(i - j); j += 1 }
      val k = acc / err
      lpc(i) = k
      var jj = 0
      while (jj < i / 2) {
        val t = lpc(jj)
        lpc(jj) = t - k * lpc(i - 1 - jj)
        lpc(i - 1 - jj) = lpc(i - 1 - jj) - k * t
        jj += 1
      }
      if (i % 2 == 1) lpc(i / 2) -= k * lpc(i / 2)
      err *= 1 - k * k
      if (err <= 0 || err.isNaN) return None
      i += 1
    }
    val precision = 14
    val shift = 12
    val coefs = lpc.map { c =>
      val q = math.round(c * (1 << shift)).toInt
      math.max(-(1 << (precision - 1)), math.min((1 << (precision - 1)) - 1, q))
    }
    if (coefs.forall(_ == 0)) None else Some((coefs, shift, precision))
  }

  private def zigzag(v: Int): Long = {
    val l = v.toLong
    if (l >= 0) l << 1 else ((-l) << 1) - 1
  }

  /** Exact Rice parameter search per partition (method 0, 4-bit). */
  private def bestRiceParam(resid: Array[Int], from: Int, until: Int): (Int, Long) = {
    var bestP = 0
    var bestBits = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var bits = 0L
      var i = from
      while (i < until && bits < bestBits) {
        bits += (zigzag(resid(i)) >>> p) + 1 + p
        i += 1
      }
      if (bits < bestBits) { bestBits = bits; bestP = p }
      p += 1
    }
    (bestP, bestBits)
  }

  private def escapeBits(resid: Array[Int], from: Int, until: Int): Int = {
    var maxU = 0L
    var i = from
    while (i < until) { maxU = math.max(maxU, zigzag(resid(i))); i += 1 }
    var b = 0
    while (b < 31 && (1L << b) <= maxU) b += 1
    // signed raw needs one more bit than the magnitude when nonzero;
    // the width rides a 5-bit field, so it must stay <= 31 (16/17-bit
    // inputs peak far below: order-4 residual of a 17-bit sample needs
    // at most 23 bits)
    val raw = if (maxU == 0) 0 else b + 1
    require(raw <= 31, s"escape width $raw exceeds the 5-bit field")
    raw
  }

  /** Coded size of a residual section under the chosen partitioning. */
  private def residualCost(resid: Array[Int], blockSize: Int, predOrder: Int,
      partOrderReq: Int, forceEscape: Boolean): Long = {
    val partOrder = effectivePartOrder(blockSize, predOrder, partOrderReq)
    val nParts = 1 << partOrder
    val partLen = blockSize >> partOrder
    var bits = 2L + 4L
    var part = 0
    var idx = 0
    while (part < nParts) {
      val count = if (part == 0) partLen - predOrder else partLen
      if (forceEscape) {
        val raw = escapeBits(resid, idx, idx + count)
        bits += 4 + 5 + raw.toLong * count
      } else bits += 4 + bestRiceParam(resid, idx, idx + count)._2
      idx += count
      part += 1
    }
    bits
  }

  /** Largest legal partition order ≤ requested: the block must split
    * evenly and the first partition must keep ≥ 0 samples. */
  private def effectivePartOrder(blockSize: Int, predOrder: Int, req: Int): Int = {
    var po = req
    while (po > 0 && (blockSize % (1 << po) != 0 ||
      (blockSize >> po) <= predOrder)) po -= 1
    po
  }

  private def writeResidual(w: BitWriter, resid: Array[Int], blockSize: Int,
      predOrder: Int, partOrderReq: Int, forceEscape: Boolean): Unit = {
    val partOrder = effectivePartOrder(blockSize, predOrder, partOrderReq)
    val nParts = 1 << partOrder
    val partLen = blockSize >> partOrder
    w.u(0, 2) // method 0: 4-bit rice
    w.u(partOrder.toLong, 4)
    var part = 0
    var idx = 0
    while (part < nParts) {
      val count = if (part == 0) partLen - predOrder else partLen
      if (forceEscape) {
        val raw = escapeBits(resid, idx, idx + count)
        w.u(15, 4) // escape
        w.u(raw.toLong, 5)
        var i = 0
        while (i < count) {
          if (raw > 0) w.s(resid(idx), raw)
          idx += 1; i += 1
        }
      } else {
        val (p, _) = bestRiceParam(resid, idx, idx + count)
        w.u(p.toLong, 4)
        var i = 0
        while (i < count) {
          val u = zigzag(resid(idx))
          w.unary((u >>> p).toInt)
          w.u(u & ((1L << p) - 1), p)
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }
}
