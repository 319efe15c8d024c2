package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Pure-JVM media codecs for the two mainstream formats that need NO
 * native library: BMP (24-bit uncompressed BI_RGB) and WAV (16-bit PCM).
 * They turn [[Multimodal]]'s decode step from a stub into a REAL
 * decode/feature/resize path for these formats — the stub remains only
 * for genuinely opaque payloads (JPEG/MP4/… need codecs this container
 * doesn't ship).
 *
 * Both formats are fixed public layouts (Windows BITMAPINFOHEADER;
 * RIFF/WAVE): little-endian headers + raw samples, decodable with
 * ByteBuffer arithmetic. Encoders exist so fixtures and resize output
 * are themselves valid files (encode→decode round-trips are
 * bit-exact — MultimodalCodecSpec pins them).
 */
object MediaCodecs {

  // ---------- BMP: 24-bit uncompressed, bottom-up or top-down ----------

  case class Bmp(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3, s"rgb length ${rgb.length} != $width x $height x 3")
    /** pixel (x, y) with y=0 the TOP row; returns (r, g, b) 0..255 */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      (rgb(o) & 0xff, rgb(o + 1) & 0xff, rgb(o + 2) & 0xff)
    }
  }

  def isBmp(payload: Array[Byte]): Boolean =
    payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M'

  /** serialize as the standard 54-byte-header bottom-up BI_RGB file */
  def encodeBmp(img: Bmp): Array[Byte] = {
    val stride = (img.width * 3 + 3) / 4 * 4
    val imageSize = stride * img.height
    val out = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(img.width).putInt(img.height) // positive: bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(imageSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val row = new Array[Byte](stride)
    var y = img.height - 1 // bottom-up: last image row first
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val o = (y * img.width + x) * 3
        row(x * 3) = img.rgb(o + 2)     // BGR on disk
        row(x * 3 + 1) = img.rgb(o + 1)
        row(x * 3 + 2) = img.rgb(o)
        x += 1
      }
      out.put(row)
      y -= 1
    }
    out.array()
  }

  /** decode a 24-bit uncompressed BMP; None when the payload is not one
    * (wrong magic, compressed, other bit depth, truncated) */
  def decodeBmp(payload: Array[Byte]): Option[Bmp] = {
    if (!isBmp(payload)) return None
    try {
      val in = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      val pixelOffset = in.getInt(10)
      val width = in.getInt(18)
      val rawHeight = in.getInt(22)
      val bpp = in.getShort(28)
      val compression = in.getInt(30)
      if (bpp != 24 || compression != 0 || width <= 0 || rawHeight == 0) return None
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      val stride = (width * 3 + 3) / 4 * 4
      if (pixelOffset.toLong + stride.toLong * height > payload.length) return None
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        val base = pixelOffset + srcRow * stride
        var x = 0
        while (x < width) {
          val o = (y * width + x) * 3
          rgb(o) = payload(base + x * 3 + 2)     // disk BGR → mem RGB
          rgb(o + 1) = payload(base + x * 3 + 1)
          rgb(o + 2) = payload(base + x * 3)
          x += 1
        }
        y += 1
      }
      Some(Bmp(width, height, rgb))
    } catch { case _: Exception => None }
  }

  /** nearest-neighbor resample — a REAL resize for BMP payloads */
  def resizeBmp(img: Bmp, newW: Int, newH: Int): Bmp = {
    require(newW > 0 && newH > 0)
    val rgb = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = (y.toLong * img.height / newH).toInt
      var x = 0
      while (x < newW) {
        val sx = (x.toLong * img.width / newW).toInt
        val so = (sy * img.width + sx) * 3
        val o = (y * newW + x) * 3
        rgb(o) = img.rgb(so); rgb(o + 1) = img.rgb(so + 1); rgb(o + 2) = img.rgb(so + 2)
        x += 1
      }
      y += 1
    }
    Bmp(newW, newH, rgb)
  }

  /** 16-dim image features: dimensions, per-channel means, luminance
    * spread + 8-bin histogram, aspect; f15 = 1 marks a real decode. */
  def bmpFeatures(img: Bmp): Array[Float] = {
    val n = img.width * img.height
    var sr = 0L; var sg = 0L; var sb = 0L
    var sumLum = 0.0; var sumLum2 = 0.0
    val hist = new Array[Long](8)
    var i = 0
    while (i < n) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b
      val lum = (r + g + b) / 3.0
      sumLum += lum; sumLum2 += lum * lum
      hist((lum / 32.0).toInt.min(7)) += 1
      i += 1
    }
    val meanLum = sumLum / n
    val varLum = math.max(0.0, sumLum2 / n - meanLum * meanLum)
    val out = new Array[Float](Multimodal.FeatureDim)
    out(0) = img.width / 1024f
    out(1) = img.height / 1024f
    out(2) = (sr.toDouble / n / 255.0).toFloat
    out(3) = (sg.toDouble / n / 255.0).toFloat
    out(4) = (sb.toDouble / n / 255.0).toFloat
    out(5) = (math.sqrt(varLum) / 255.0).toFloat
    i = 0
    while (i < 8) { out(6 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
    out(14) = (img.width.toFloat / img.height) / 8f
    out(15) = 1f
    out
  }

  // ---------- PNG: 8-bit RGB/RGBA, non-interlaced ----------
  // zlib lives in the JVM (java.util.zip), so PNG needs no native codec
  // either: chunk parse + inflate + per-row defilter (the five filter
  // types of the spec). Decoded images reuse [[Bmp]] as the in-memory
  // RGB representation, so features/resize compose unchanged.

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def isPng(payload: Array[Byte]): Boolean =
    payload.length >= 8 && payload.take(8).sameElements(PngSig)

  /** serialize RGB as a minimal valid PNG: IHDR + one IDAT (deflate of
    * filter-type-0 rows) + IEND, CRCs included */
  def encodePng(img: Bmp): Array[Byte] = {
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(body)
      val out = ByteBuffer.allocate(12 + body.length) // length + tag + body + crc
      out.putInt(body.length).put(tag.getBytes("US-ASCII")).put(body)
        .putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (RGB)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    val raw = new Array[Byte]((img.width * 3 + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val base = y * (img.width * 3 + 1)
      raw(base) = 0 // filter type None
      System.arraycopy(img.rgb, y * img.width * 3, raw, base + 1, img.width * 3)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val outBytes = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      outBytes.write(buf, 0, n)
    }
    deflater.end()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", outBytes.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** decode non-interlaced 8-bit RGB or RGBA PNG (alpha dropped);
    * None for anything else or malformed input */
  def decodePng(payload: Array[Byte]): Option[Bmp] = {
    if (!isPng(payload)) return None
    try {
      val in = ByteBuffer.wrap(payload) // PNG ints are big-endian (default)
      var pos = 8
      var width = 0; var height = 0; var colorType = -1; var ok = true
      val idat = new java.io.ByteArrayOutputStream()
      while (pos + 8 <= payload.length) {
        val len = in.getInt(pos)
        if (len < 0 || pos + 12L + len > payload.length) return None
        val tag = new String(payload, pos + 4, 4, "US-ASCII")
        tag match {
          case "IHDR" =>
            width = in.getInt(pos + 8)
            height = in.getInt(pos + 12)
            val bitDepth = payload(pos + 16)
            colorType = payload(pos + 17)
            val interlace = payload(pos + 20)
            ok = bitDepth == 8 && (colorType == 2 || colorType == 6) && interlace == 0
          case "IDAT" => idat.write(payload, pos + 8, len)
          case _ => // PLTE/tEXt/… skipped; IEND ends below via loop bound
        }
        pos += 12 + len
      }
      if (!ok || width <= 0 || height <= 0 || idat.size == 0) return None
      val bpp = if (colorType == 6) 4 else 3
      val stride = width * bpp
      val raw = new Array[Byte]((stride + 1) * height)
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (!inflater.finished() && off < raw.length) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        off += n
      }
      inflater.end()
      if (off != raw.length) return None
      // defilter in place into `img` (spec §9: None/Sub/Up/Average/Paeth)
      val img = new Array[Byte](stride * height)
      def paeth(a: Int, b: Int, c: Int): Int = {
        val p = a + b - c
        val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      var y = 0
      while (y < height) {
        val filter = raw(y * (stride + 1)) & 0xff
        val rowIn = y * (stride + 1) + 1
        val rowOut = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(rowIn + x) & 0xff
          val left = if (x >= bpp) img(rowOut + x - bpp) & 0xff else 0
          val up = if (y > 0) img(rowOut - stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) img(rowOut - stride + x - bpp) & 0xff else 0
          val v = filter match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + (left + up) / 2
            case 4 => cur + paeth(left, up, ul)
            case _ => return None
          }
          img(rowOut + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      // drop alpha if present
      val rgb =
        if (bpp == 3) img
        else {
          val o = new Array[Byte](width * height * 3)
          var i = 0
          while (i < width * height) {
            o(i * 3) = img(i * 4); o(i * 3 + 1) = img(i * 4 + 1); o(i * 3 + 2) = img(i * 4 + 2)
            i += 1
          }
          o
        }
      Some(Bmp(width, height, rgb))
    } catch { case _: Exception => None }
  }

  // ---------- WAV: RIFF/WAVE, 16-bit PCM ----------

  case class Wav(sampleRateHz: Int, channels: Int, samples: Array[Short])

  def isWav(payload: Array[Byte]): Boolean =
    payload.length >= 44 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'

  /** serialize as a canonical 44-byte-header PCM16 file */
  def encodeWav(wav: Wav): Array[Byte] = {
    val dataLen = wav.samples.length * 2
    val out = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(wav.channels.toShort)
      .putInt(wav.sampleRateHz)
      .putInt(wav.sampleRateHz * wav.channels * 2)
      .putShort((wav.channels * 2).toShort).putShort(16)
    out.put("data".getBytes).putInt(dataLen)
    wav.samples.foreach(s => out.putShort(s))
    out.array()
  }

  /** decode RIFF/WAVE PCM16, walking chunks to the fmt and data blocks;
    * None for non-WAV / non-PCM16 payloads */
  def decodeWav(payload: Array[Byte]): Option[Wav] = {
    if (!isWav(payload)) return None
    try {
      val in = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var sampleRate = 0; var channels = 0; var bits = 0; var fmtCode = 0
      var samples: Array[Short] = null
      while (pos + 8 <= payload.length) {
        val id = new String(payload, pos, 4, "US-ASCII")
        val len = in.getInt(pos + 4)
        if (len < 0 || pos + 8L + len > payload.length) return None
        id match {
          case "fmt " =>
            fmtCode = in.getShort(pos + 8)
            channels = in.getShort(pos + 10)
            sampleRate = in.getInt(pos + 12)
            bits = in.getShort(pos + 22)
          case "data" =>
            samples = new Array[Short](len / 2)
            var i = 0
            while (i < samples.length) { samples(i) = in.getShort(pos + 8 + i * 2); i += 1 }
          case _ => // skip LIST/fact/…
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (fmtCode != 1 || bits != 16 || sampleRate <= 0 || channels <= 0 || samples == null)
        None
      else Some(Wav(sampleRate, channels, samples))
    } catch { case _: Exception => None }
  }

  /** 16-dim audio features: rate/channels/duration, RMS, peak,
    * zero-crossing rate + 8-bin |amplitude| histogram; f15 = 2 marks a
    * real audio decode. */
  def wavFeatures(wav: Wav): Array[Float] = {
    val n = math.max(1, wav.samples.length)
    var sum2 = 0.0; var peak = 0L; var zc = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < wav.samples.length) {
      val s = wav.samples(i).toLong
      sum2 += s.toDouble * s
      val a = math.abs(s)
      if (a > peak) peak = a
      if (i > 0 && (wav.samples(i - 1) < 0) != (s < 0)) zc += 1
      hist((a / 4096).toInt.min(7)) += 1
      i += 1
    }
    val out = new Array[Float](Multimodal.FeatureDim)
    out(0) = wav.sampleRateHz / 48000f
    out(1) = wav.channels / 8f
    out(2) = (wav.samples.length.toDouble / wav.channels / wav.sampleRateHz / 10.0).toFloat
    out(3) = (math.sqrt(sum2 / n) / 32768.0).toFloat
    out(4) = peak / 32768f
    out(5) = zc.toFloat / n
    i = 0
    while (i < 8) { out(6 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
    out(14) = (math.log10(1.0 + wav.samples.length) / 10.0).toFloat
    out(15) = 2f
    out
  }

  /** sample-aligned time slice re-wrapped as a VALID standalone WAV —
    * the real frame/segment sampler for audio */
  def sliceWav(wav: Wav, i: Int, n: Int): Wav = {
    val frames = wav.samples.length / wav.channels
    val step = math.max(1, frames / n)
    val startF = math.min(i.toLong * step, math.max(0, frames - 1)).toInt
    val endF = math.min(startF + step, frames)
    Wav(wav.sampleRateHz, wav.channels,
      java.util.Arrays.copyOfRange(wav.samples, startF * wav.channels, endF * wav.channels))
  }
}
