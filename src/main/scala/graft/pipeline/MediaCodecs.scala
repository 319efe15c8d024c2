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

  /**
   * Bilinear resample in EXACT fixed-point arithmetic — the
   * vision-pipeline standard interpolation (nearest-neighbor aliases
   * hard on downscale), done so an independent engine can replay every
   * output pixel. Pixel-center convention: output x maps to source
   * position (2x+1)·W/(2·newW) − 1/2, kept as the rational
   * sxNum/Dx with Dx = 2·newW (never a float); edge samples clamp
   * (replicate). The 2x2 neighborhood is blended with integer weights
   * fx/Dx, fy/Dy and ONE final half-up rounding division:
   *
   *   out = floorDiv(2·Σ w·p + DxDy, 2·DxDy)
   *
   * All Long arithmetic (255·Dx·Dy needs ~38 bits at 4k targets).
   */
  def resizeBmpBilinear(img: Bmp, newW: Int, newH: Int): Bmp = {
    require(newW > 0 && newH > 0)
    val w = img.width; val h = img.height
    val dx = 2L * newW; val dy = 2L * newH
    val rgb = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val syNum = (2L * y + 1) * h - newH // source y = syNum / dy
      var iy = Math.floorDiv(syNum, dy).toInt
      var fy = syNum - iy.toLong * dy
      if (iy < 0) { iy = 0; fy = 0 }
      if (iy >= h - 1) { iy = h - 1; fy = 0 }
      val iy1 = math.min(h - 1, iy + 1)
      var x = 0
      while (x < newW) {
        val sxNum = (2L * x + 1) * w - newW
        var ix = Math.floorDiv(sxNum, dx).toInt
        var fx = sxNum - ix.toLong * dx
        if (ix < 0) { ix = 0; fx = 0 }
        if (ix >= w - 1) { ix = w - 1; fx = 0 }
        val ix1 = math.min(w - 1, ix + 1)
        val o = (y * newW + x) * 3
        var c = 0
        while (c < 3) {
          val p00 = img.rgb((iy * w + ix) * 3 + c) & 0xff
          val p10 = img.rgb((iy * w + ix1) * 3 + c) & 0xff
          val p01 = img.rgb((iy1 * w + ix) * 3 + c) & 0xff
          val p11 = img.rgb((iy1 * w + ix1) * 3 + c) & 0xff
          val num = (dx - fx) * (dy - fy) * p00 + fx * (dy - fy) * p10 +
            (dx - fx) * fy * p01 + fx * fy * p11
          rgb(o + c) = (Math.floorDiv(2 * num + dx * dy, 2 * dx * dy)).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Bmp(newW, newH, rgb)
  }

  /**
   * Aspect-preserving letterbox to a fixed model input — the standard
   * vision-training geometry (resize to the largest size that fits
   * boxW×boxH, center, pad with `fill`): the limiting side is decided
   * by the exact rational comparison boxW·h ≤ boxH·w, the minor target
   * dimension is half-up rounded ([[Math.floorDiv]] on the doubled
   * numerator), offsets floor-center, and the content is
   * [[resizeBmpBilinear]] — so every output pixel, content or padding,
   * is integer-exactly replayable. `fill` defaults to the conventional
   * neutral gray 114.
   */
  def letterbox(img: Bmp, boxW: Int, boxH: Int, fill: Int = 114): Bmp = {
    require(boxW > 0 && boxH > 0 && fill >= 0 && fill <= 255)
    val w = img.width; val h = img.height
    val widthLimited = boxW.toLong * h <= boxH.toLong * w
    val tw =
      if (widthLimited) boxW
      else math.max(1, Math.floorDiv(2L * w * boxH + h, 2L * h).toInt)
    val th =
      if (widthLimited) math.max(1, Math.floorDiv(2L * h * boxW + w, 2L * w).toInt)
      else boxH
    val inner = resizeBmpBilinear(img, tw, th)
    val ox = (boxW - tw) / 2; val oy = (boxH - th) / 2
    val rgb = Array.fill[Byte](boxW * boxH * 3)(fill.toByte)
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        val o = ((oy + y) * boxW + ox + x) * 3
        val i = (y * tw + x) * 3
        rgb(o) = inner.rgb(i); rgb(o + 1) = inner.rgb(i + 1); rgb(o + 2) = inner.rgb(i + 2)
        x += 1
      }
      y += 1
    }
    Bmp(boxW, boxH, rgb)
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
        // n == 0 without progress: truncated stream (needsInput) or a
        // preset-dictionary header (needsDictionary — inflate would
        // return 0 forever: reject, don't spin)
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary())) {
          inflater.end(); return None
        }
        off += n
      }
      if (off != raw.length) { inflater.end(); return None }
      // the stream must END here: extra decompressed rows beyond the
      // IHDR-declared size mean an inconsistent file, not a valid image
      if (!inflater.finished() && inflater.inflate(new Array[Byte](1)) > 0) {
        inflater.end(); return None
      }
      inflater.end()
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

  // ---------- Y4M (YUV4MPEG2): uncompressed 4:2:0 video ----------
  // The one mainstream VIDEO container with no compression at all: a
  // text header + raw planar YUV frames (mplayer/ffmpeg's interchange
  // format). Pure parsing + BT.601 full-range color math — so the
  // "video" kind gets a real decode path too. Frames reuse [[Bmp]] as
  // the in-memory RGB representation.

  case class Y4m(width: Int, height: Int, frames: Seq[Bmp]) {
    require(width % 2 == 0 && height % 2 == 0, s"4:2:0 needs even dims: $width x $height")
    require(frames.forall(f => f.width == width && f.height == height))
  }

  def isY4m(payload: Array[Byte]): Boolean =
    payload.length >= 10 &&
      new String(payload, 0, 10, "US-ASCII") == "YUV4MPEG2 "

  private def clamp(v: Double): Byte =
    math.max(0, math.min(255, math.round(v))).toByte

  /** RGB frame → (Y, U, V) planes, BT.601 full-range, 2x2 chroma mean */
  private def toYuv420(f: Bmp): (Array[Byte], Array[Byte], Array[Byte]) = {
    val w = f.width; val h = f.height
    val yP = new Array[Byte](w * h)
    val uF = new Array[Double](w * h); val vF = new Array[Double](w * h)
    var i = 0
    while (i < w * h) {
      val r = f.rgb(i * 3) & 0xff; val g = f.rgb(i * 3 + 1) & 0xff; val b = f.rgb(i * 3 + 2) & 0xff
      yP(i) = clamp(0.299 * r + 0.587 * g + 0.114 * b)
      uF(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      vF(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    val uP = new Array[Byte](w / 2 * (h / 2)); val vP = new Array[Byte](uP.length)
    var cy = 0
    while (cy < h / 2) {
      var cx = 0
      while (cx < w / 2) {
        val a = 2 * cy * w + 2 * cx
        val u4 = (uF(a) + uF(a + 1) + uF(a + w) + uF(a + w + 1)) / 4.0
        val v4 = (vF(a) + vF(a + 1) + vF(a + w) + vF(a + w + 1)) / 4.0
        uP(cy * (w / 2) + cx) = clamp(u4); vP(cy * (w / 2) + cx) = clamp(v4)
        cx += 1
      }
      cy += 1
    }
    (yP, uP, vP)
  }

  def encodeY4m(video: Y4m, fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W${video.width} H${video.height} F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(header.getBytes("US-ASCII"))
    video.frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      val (y, u, v) = toYuv420(f)
      out.write(y); out.write(u); out.write(v)
    }
    out.toByteArray
  }

  /** decode YUV4MPEG2 C420 (any 420 chroma tag); None otherwise */
  def decodeY4m(payload: Array[Byte]): Option[Y4m] = {
    if (!isY4m(payload)) return None
    try {
      val nl = payload.indexOf('\n'.toByte)
      if (nl < 0) return None
      val tokens = new String(payload, 0, nl, "US-ASCII").split(" ")
      var w = 0; var h = 0
      tokens.iterator.drop(1).foreach { t =>
        if (t.startsWith("W")) w = t.tail.toInt
        else if (t.startsWith("H")) h = t.tail.toInt
        else if (t.startsWith("C") && !t.startsWith("C420")) return None
      }
      if (w <= 0 || h <= 0 || w % 2 != 0 || h % 2 != 0) return None
      val frameBytes = w * h + 2 * (w / 2) * (h / 2)
      val frames = scala.collection.mutable.ArrayBuffer.empty[Bmp]
      var pos = nl + 1
      while (pos < payload.length) {
        val fnl = payload.indexOf('\n'.toByte, pos)
        if (fnl < 0 || !new String(payload, pos, 5, "US-ASCII").equals("FRAME")) return None
        var p = fnl + 1
        if (p + frameBytes > payload.length) return None
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val yy = payload(p + i) & 0xff
          val ci = (i / w / 2) * (w / 2) + (i % w) / 2
          val u = (payload(p + w * h + ci) & 0xff) - 128
          val v = (payload(p + w * h + (w / 2) * (h / 2) + ci) & 0xff) - 128
          rgb(i * 3) = clamp(yy + 1.402 * v)
          rgb(i * 3 + 1) = clamp(yy - 0.344136 * u - 0.714136 * v)
          rgb(i * 3 + 2) = clamp(yy + 1.772 * u)
          i += 1
        }
        frames += Bmp(w, h, rgb)
        pos = p + frameBytes
      }
      if (frames.isEmpty) None else Some(Y4m(w, h, frames.toSeq))
    } catch { case _: Exception => None }
  }

  /** 16-dim video features: dimensions, frame count, luma statistics,
    * inter-frame MOTION (mean |ΔY| between consecutive frames — the
    * signal a video-quality filter gates on); f15 = 3 marks video. */
  def y4mFeatures(video: Y4m): Array[Float] = {
    val w = video.width; val h = video.height; val n = w * h
    def luma(f: Bmp): Array[Double] = Array.tabulate(n) { i =>
      0.299 * (f.rgb(i * 3) & 0xff) + 0.587 * (f.rgb(i * 3 + 1) & 0xff) +
        0.114 * (f.rgb(i * 3 + 2) & 0xff)
    }
    // one streaming pass, TWO luma buffers live at any time — motion only
    // compares consecutive frames, so materializing every frame's luma
    // (8 B/px × frames on top of the decoded RGB) would make a single
    // long video row an executor OOM
    var sum = 0.0; var sum2 = 0.0; var motionSum = 0.0
    val hist = new Array[Long](8)
    var prev: Array[Double] = null
    video.frames.foreach { f =>
      val cur = luma(f)
      var i = 0
      while (i < n) {
        val l = cur(i)
        sum += l; sum2 += l * l; hist((l / 32.0).toInt.min(7)) += 1
        if (prev != null) motionSum += math.abs(l - prev(i))
        i += 1
      }
      prev = cur
    }
    val total = (n * video.frames.length).toDouble
    val mean = sum / total
    val variance = math.max(0.0, sum2 / total - mean * mean)
    val motion =
      if (video.frames.length < 2) 0.0
      else motionSum / n / (video.frames.length - 1)
    val out = new Array[Float](Multimodal.FeatureDim)
    out(0) = w / 1024f
    out(1) = h / 1024f
    out(2) = video.frames.length / 100f
    out(3) = (mean / 255.0).toFloat
    out(4) = (motion / 255.0).toFloat
    out(5) = (math.sqrt(variance) / 255.0).toFloat
    var i = 0
    while (i < 8) { out(6 + i) = (hist(i) / total).toFloat; i += 1 }
    out(14) = (w.toFloat / h) / 8f
    out(15) = 3f
    out
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

  /** Downmix to mono: per frame, the FLOOR mean of the channel samples
    * (Math.floorDiv — one fixed convention, so an independent engine
    * replays it exactly even on negative odd sums). Mono input returns
    * unchanged. */
  def downmixMono(wav: Wav): Wav = {
    val ch = math.max(1, wav.channels)
    if (ch == 1) wav
    else {
      val n = wav.samples.length / ch
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        var s = 0
        var c = 0
        while (c < ch) { s += wav.samples(i * ch + c); c += 1 }
        out(i) = Math.floorDiv(s, ch).toShort
        i += 1
      }
      Wav(wav.sampleRateHz, 1, out)
    }
  }

  /**
   * Linear sample-rate conversion of a MONO signal in EXACT integer
   * arithmetic: output index j sits at rational source position
   * j·inRate/outRate; with i0 = floor and frac = remainder,
   *
   *   out(j) = s(i0) + floorDiv((s(i0+1) − s(i0)) · frac, outRate)
   *
   * and n_out = floor((n_in − 1)·outRate/inRate) + 1 so the last output
   * lands ON the last input sample — no extrapolation (when frac > 0,
   * i0+1 < n_in by construction). Every step is integer floor
   * arithmetic, so a SQL oracle replays the whole resample
   * bit-for-bit. Linear interpolation is the standard cheap resampler
   * for ASR-style pipelines standardizing a crawl's mixed sample rates
   * to one model rate; a windowed-sinc kernel would beat it on
   * anti-aliasing but has no exact-replay story.
   */
  def resampleWav(wav: Wav, outRateHz: Int): Wav = {
    require(outRateHz > 0, s"outRateHz $outRateHz")
    require(wav.channels == 1, "resampleWav expects mono — downmixMono first")
    val s = wav.samples
    val inRate = wav.sampleRateHz
    if (s.isEmpty || inRate == outRateHz) return Wav(outRateHz, 1, s)
    val nOut = ((s.length - 1).toLong * outRateHz / inRate).toInt + 1
    val out = new Array[Short](nOut)
    var j = 0
    while (j < nOut) {
      val num = j.toLong * inRate
      val i0 = (num / outRateHz).toInt
      val frac = (num % outRateHz).toInt
      val a = s(i0)
      out(j) =
        if (frac == 0 || i0 + 1 >= s.length) a
        else (a + Math.floorDiv((s(i0 + 1) - a).toLong * frac, outRateHz)).toShort
      j += 1
    }
    Wav(outRateHz, 1, out)
  }

  /** decode RIFF/WAVE PCM16, walking chunks to the fmt and data blocks;
    * None for non-WAV / non-PCM16 payloads */
  def decodeWav(payload: Array[Byte]): Option[Wav] = {
    if (!isWav(payload)) return None
    try {
      val in = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var sampleRate = 0; var channels = 0; var bits = 0; var fmtCode = 0
      var dataOff = -1; var dataLen = 0
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
            dataOff = pos + 8; dataLen = len
          case _ => // skip LIST/fact/…
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
      // data is expanded AFTER the chunk walk so a data chunk preceding
      // fmt (legal RIFF) still decodes with the right format code
      val samples: Array[Short] =
        if (fmtCode == 1 && bits == 16) {
          val s = new Array[Short](dataLen / 2)
          var i = 0
          while (i < s.length) { s(i) = in.getShort(dataOff + i * 2); i += 1 }
          s
        } else if (fmtCode == 7 && bits == 8) { // G.711 mu-law
          val s = new Array[Short](dataLen)
          var i = 0
          while (i < s.length) { s(i) = muLawToPcm(payload(dataOff + i) & 0xff).toShort; i += 1 }
          s
        } else if (fmtCode == 6 && bits == 8) { // G.711 A-law
          val s = new Array[Short](dataLen)
          var i = 0
          while (i < s.length) { s(i) = aLawToPcm(payload(dataOff + i) & 0xff).toShort; i += 1 }
          s
        } else return None
      Some(Wav(sampleRate, channels, samples))
    } catch { case _: Exception => None }
  }

  // ---------------- G.711 companding (ITU-T G.711, public spec) ----------------
  // Telephony WAVs arrive as 8-bit mu-law (fmt 7) or A-law (fmt 6);
  // expansion lands them on the same PCM16 surface as everything else.
  // The segment/mantissa arithmetic follows the classic public-domain
  // CCITT reference implementation (Sun Microsystems' g711.c, shipped
  // unencumbered in countless codecs), restated in Scala. Decode
  // formulas are pure integer arithmetic, so a SQL oracle replays them
  // per code; encode is pinned by the all-256-codes round-trip
  // identity encode(decode(c)) == c.

  /** mu-law code (0..255, as transmitted: complemented) -> PCM16. */
  def muLawToPcm(code: Int): Int = {
    val u = ~code & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** PCM16 -> mu-law code (clamps past ±32635, the G.711 ceiling). */
  def pcmToMuLaw(pcm: Int): Int = {
    var s = pcm
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (s >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** A-law code (0..255, even bits toggled as transmitted) -> PCM16.
    * Sign bit SET (after the 0x55 toggle) means POSITIVE. */
  def aLawToPcm(code: Int): Int = {
    val v = (code ^ 0x55) & 0xff
    val exp = (v >> 4) & 7
    val mant = v & 0x0f
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    if ((v & 0x80) != 0) mag else -mag
  }

  /** Serialize raw G.711 codes as an 8-bit WAV — fmt 7 (mu-law) or
    * fmt 6 (A-law) — the container telephony recordings actually ship
    * in; [[decodeWav]] expands it back to PCM16. */
  def encodeWavG711(sampleRateHz: Int, channels: Int, codes: Array[Byte],
      aLaw: Boolean): Array[Byte] = {
    val out = ByteBuffer.allocate(44 + codes.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + codes.length).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
      .putShort(if (aLaw) 6 else 7).putShort(channels.toShort)
      .putInt(sampleRateHz).putInt(sampleRateHz * channels)
      .putShort(channels.toShort).putShort(8)
    out.put("data".getBytes).putInt(codes.length).put(codes)
    out.array()
  }

  /** PCM16 -> A-law code. */
  def pcmToALaw(pcm: Int): Int = {
    var s = pcm >> 3 // 13-bit magnitude domain
    val mask = if (pcm >= 0) 0xd5 else { s = -s - 1; 0x55 }
    var exp = 0
    while (exp < 8 && s > ((0x1f << exp) | ((1 << exp) - 1))) exp += 1
    if (exp >= 8) 0x7f ^ mask
    else {
      val mant = if (exp < 2) (s >> 1) & 0x0f else (s >> exp) & 0x0f
      ((exp << 4) | mant) ^ mask
    }
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
