package graft.pipeline

/**
 * Pure-JVM baseline JPEG codec — retires the last real multimodal stub:
 * the [[Multimodal]] decode/resize paths previously fell back to the
 * deterministic fake for JPEG payloads because the container ships no
 * codec library. Everything here is implemented from the public JPEG
 * standard (ITU-T T.81): baseline sequential DCT, Huffman entropy
 * coding, Annex-K quantization/Huffman tables for the encoder.
 *
 * Decoder: SOI / APPn / COM / DQT (8- and 16-bit) / DHT / SOF0+SOF1 /
 * DRI / SOS / RSTn / EOI; grayscale or YCbCr with ANY sampling factors
 * (4:4:4, 4:2:0, 4:2:2, ...) — chroma planes are box-upsampled.
 * Progressive (SOF2) and arithmetic-coded streams return None rather
 * than mis-decode. The bit reader honors byte stuffing (FF 00) and
 * restart-marker re-alignment with DC-predictor reset.
 *
 * Encoder: baseline 4:4:4 YCbCr, quality-scaled Annex-K quant tables
 * (the libjpeg 5000/q | 200-2q convention), standard Huffman tables,
 * optional restart interval. Output is a standalone JFIF file that
 * foreign decoders accept — JpegCodecSpec cross-witnesses both
 * directions against the JDK's independent ImageIO implementation.
 *
 * Reference scope anchor: the Mr.LDA reference has no media surface at
 * all (text corpus only); this is beyond-reference capability for the
 * multimodal training-data pipeline.
 */
object JpegCodec {

  import MediaCodecs.Bmp

  def isJpeg(p: Array[Byte]): Boolean =
    p.length > 3 && (p(0) & 0xff) == 0xFF && (p(1) & 0xff) == 0xD8 &&
      (p(2) & 0xff) == 0xFF

  // ---------------- shared tables ----------------

  /** zigzag position -> natural (row-major) position */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance / chrominance quant tables (natural order). */
  private val StdQuantLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val StdQuantChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K Huffman tables: (counts per code length 1..16, symbols)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChromBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** cosTable(x)(u) = cos((2x+1)·u·π/16); scale(u) = C(u) normalizer */
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val Cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // ---------------- Huffman ----------------

  /** Canonical Huffman table in the spec's min/max-code form, usable for
    * both decode (walk lengths) and encode (symbol -> (code, len)). */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val encCode = new Array[Int](256)
    val encLen = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        var i = 0
        while (i < bits(l - 1)) {
          encCode(vals(k)) = code
          encLen(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1 // no codes at this length
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.nextBit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.nextBit()
        l += 1
      }
      if (l > 16) throw new JpegFormat("bad Huffman code")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  private final class JpegFormat(msg: String) extends RuntimeException(msg)

  /** Entropy-segment bit reader: MSB-first, FF00 byte-stuffing honored;
    * a non-stuffing marker stops bit supply (zero-fill — a correct
    * stream never reads past its own data). */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) { buf = 0 }
        else {
          var b = data(pos) & 0xff
          if (b == 0xFF) {
            val nxt = if (pos + 1 < data.length) data(pos + 1) & 0xff else -1
            if (nxt == 0x00) { pos += 2 } // stuffed data 0xFF
            else { b = 0 }                // marker: stop supplying real bits
          } else pos += 1
          buf = b
        }
        cnt = 8
      }
      cnt -= 1
      (buf >>> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** drop partial byte, consume an expected RSTn marker — and verify
      * its modulo-8 index (T.81 E.2.4): a dropped/duplicated restart
      * marker would otherwise resync to the wrong MCU boundary and
      * decode silently shifted; a mismatch throws (caught into None). */
    def alignToRestart(expected: Int): Unit = {
      cnt = 0
      while (pos + 1 < data.length && !((data(pos) & 0xff) == 0xFF &&
        (data(pos + 1) & 0xff) >= 0xD0 && (data(pos + 1) & 0xff) <= 0xD7)) pos += 1
      if (pos + 1 < data.length) {
        if (((data(pos + 1) & 0xff) & 7) != (expected & 7))
          throw new JpegFormat(
            s"restart marker index ${(data(pos + 1) & 0xff) & 7}, expected ${expected & 7}")
        pos += 2
      }
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---------------- decoder ----------------

  private case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Huff = null
    var acTab: Huff = null
    var pred: Int = 0
    var plane: Array[Byte] = null // MCU-padded plane, planeW x planeH
    var planeW: Int = 0
  }

  def decodeJpeg(payload: Array[Byte]): Option[Bmp] =
    try decodeImpl(payload) catch { case _: Exception => None }

  private def decodeImpl(p: Array[Byte]): Option[Bmp] = {
    if (!isJpeg(p)) return None
    val qt = new Array[Array[Int]](4) // zigzag order, as stored in DQT
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    def u16(i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    var i = 2
    while (i + 3 < p.length) {
      if ((p(i) & 0xff) != 0xFF) return None
      val m = p(i + 1) & 0xff
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) { i += 2 }
      else if (m == 0xD9) return None // EOI before SOS
      else {
        val len = u16(i + 2)
        val seg = i + 4
        m match {
          case 0xC0 | 0xC1 => // baseline / extended sequential
            if ((p(seg) & 0xff) != 8) return None
            h = u16(seg + 1); w = u16(seg + 3)
            val n = p(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || (n != 1 && n != 3)) return None
            comps = Array.tabulate(n) { c =>
              val o = seg + 6 + 3 * c
              Component(p(o) & 0xff, (p(o + 1) & 0xff) >> 4,
                p(o + 1) & 0x0f, p(o + 2) & 0xff)
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4))
              return None
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return None // progressive/lossless/arithmetic: not baseline
          case 0xDB =>
            var o = seg
            while (o < seg + len - 2) {
              val pq = (p(o) & 0xff) >> 4
              val tq = p(o) & 0x0f
              val tab = new Array[Int](64)
              if (pq == 0) { var k = 0; while (k < 64) { tab(k) = p(o + 1 + k) & 0xff; k += 1 }; o += 65 }
              else { var k = 0; while (k < 64) { tab(k) = u16(o + 1 + 2 * k); k += 1 }; o += 129 }
              qt(tq) = tab
            }
          case 0xC4 =>
            var o = seg
            while (o < seg + len - 2) {
              val tc = (p(o) & 0xff) >> 4
              val th = p(o) & 0x0f
              val bits = Array.tabulate(16)(k => p(o + 1 + k) & 0xff)
              val nv = bits.sum
              val vals = Array.tabulate(nv)(k => p(o + 17 + k) & 0xff)
              if (tc == 0) dcT(th) = new Huff(bits, vals)
              else acT(th) = new Huff(bits, vals)
              o += 17 + nv
            }
          case 0xDD =>
            restartInterval = u16(seg)
          case 0xDA =>
            if (comps == null) return None
            val ns = p(seg) & 0xff
            if (ns != comps.length) return None // single interleaved scan only
            var c = 0
            while (c < ns) {
              val cid = p(seg + 1 + 2 * c) & 0xff
              val tt = p(seg + 2 + 2 * c) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.dcTab = dcT(tt >> 4)
              comp.acTab = acT(tt & 0x0f)
              if (comp.dcTab == null || comp.acTab == null || qt(comp.tq) == null)
                return None
              c += 1
            }
            return Some(decodeScan(p, i + 2 + len, comps, w, h, qt, restartInterval))
          case _ => () // APPn, COM, others: skip
        }
        i += 2 + len
      }
    }
    None
  }

  private def decodeScan(p: Array[Byte], scanStart: Int, comps: Array[Component],
      w: Int, h: Int, qt: Array[Array[Int]], restartInterval: Int): Bmp = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.plane = new Array[Byte](c.planeW * mcusY * c.v * 8)
      c.pred = 0
    }
    val br = new BitReader(p, scanStart)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.alignToRestart((mcu / restartInterval - 1) % 8)
          comps.foreach(_.pred = 0)
        }
        comps.foreach { c =>
          val q = qt(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // entropy-decode one block (coefficients land dequantized
              // in natural order)
              java.util.Arrays.fill(coef, 0)
              val t = c.dcTab.decode(br)
              c.pred += extend(br.receive(t), t)
              coef(0) = c.pred * q(0)
              var k = 1
              while (k < 64) {
                val rs = c.acTab.decode(br)
                val r = rs >> 4
                val s = rs & 15
                if (s == 0) { if (r == 15) k += 16 else k = 64 }
                else {
                  k += r
                  if (k > 63) throw new JpegFormat("AC run past block end")
                  coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
                  k += 1
                }
              }
              idct(coef, tmp, blk)
              // place into the component plane
              val x0 = (mx * c.h + bx) * 8
              val y0 = (my * c.v + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                val rowOff = (y0 + yy) * c.planeW + x0
                while (xx < 8) {
                  c.plane(rowOff + xx) = blk(yy * 8 + xx).toByte
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // upsample + color-convert
    val rgb = new Array[Byte](w * h * 3)
    def clamp(v: Double): Int = { val r = math.round(v).toInt; if (r < 0) 0 else if (r > 255) 255 else r }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (comps.length == 1) {
          val c = comps(0)
          val v = c.plane((y * c.v / vMax) * c.planeW + (x * c.h / hMax)) & 0xff
          rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
        } else {
          def sample(c: Component): Int =
            c.plane((y * c.v / vMax) * c.planeW + (x * c.h / hMax)) & 0xff
          val yv = sample(comps(0)).toDouble
          val cb = sample(comps(1)) - 128.0
          val cr = sample(comps(2)) - 128.0
          rgb(o) = clamp(yv + 1.402 * cr).toByte
          rgb(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr).toByte
          rgb(o + 2) = clamp(yv + 1.772 * cb).toByte
        }
        x += 1
      }
      y += 1
    }
    Bmp(w, h, rgb)
  }

  /** separable 2-D inverse DCT + level shift; out values 0..255 */
  private def idct(coef: Array[Int], tmp: Array[Double], out: Array[Int]): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Cu(u) * coef(v * 8 + u) * CosT(x)(u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var vv = 0
        while (vv < 8) { acc += Cu(vv) * tmp(vv * 8 + x) * CosT(y)(vv); vv += 1 }
        val s = math.round(0.25 * acc + 128.0).toInt
        out(y * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s
        x += 1
      }
      y += 1
    }
  }

  // ---------------- encoder ----------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >>> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xFF) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { // pad with 1s per spec
      buf = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      out.write(buf & 0xff)
      if ((buf & 0xff) == 0xFF) out.write(0x00)
      buf = 0; cnt = 0
    }
  }

  /** libjpeg-convention quality scaling of the Annex-K base tables. */
  private def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { b =>
      val t = (b * scale + 50) / 100
      math.max(1, math.min(255, t))
    }
  }

  private def bitSize(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /**
   * Encode as baseline 4:4:4 YCbCr JFIF. `quality` 1..100 scales the
   * Annex-K tables; `restartInterval` > 0 emits DRI + RSTn markers every
   * that many MCUs (the resync feature a splittable scan reader needs).
   */
  def encodeJpeg(img: Bmp, quality: Int = 85, restartInterval: Int = 0): Array[Byte] = {
    val w = img.width; val h = img.height
    val qLum = scaledQuant(StdQuantLum, quality)
    val qChrom = scaledQuant(StdQuantChrom, quality)
    val dcL = new Huff(DcLumBits, DcLumVals)
    val acL = new Huff(AcLumBits, AcLumVals)
    val dcC = new Huff(DcChromBits, DcChromVals)
    val acC = new Huff(AcChromBits, AcChromVals)

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }

    marker(0xD8) // SOI
    marker(0xE0); u16(16) // JFIF APP0
    Seq('J', 'F', 'I', 'F', 0).foreach(c => u8(c.toInt))
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xDB); u16(2 + 65 * 2) // both quant tables, zigzag order
    u8(0x00); (0 until 64).foreach(k => u8(qLum(Zigzag(k))))
    u8(0x01); (0 until 64).foreach(k => u8(qChrom(Zigzag(k))))
    marker(0xC0); u16(8 + 3 * 3) // SOF0
    u8(8); u16(h); u16(w); u8(3)
    u8(1); u8(0x11); u8(0) // Y, 1x1, qtab 0
    u8(2); u8(0x11); u8(1) // Cb
    u8(3); u8(0x11); u8(1) // Cr
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length)
      u8((tc << 4) | th); bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    dht(0, 1, DcChromBits, DcChromVals); dht(1, 1, AcChromBits, AcChromVals)
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    marker(0xDA); u16(6 + 2 * 3) // SOS
    u8(3); u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(63); u8(0)

    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    val block = new Array[Double](64)
    val coefZ = new Array[Int](64)
    val tmp = new Array[Double](64)

    def encodeBlock(dc: Huff, ac: Huff, q: Array[Int], comp: Int): Unit = {
      fdct(block, tmp)
      var k = 0
      while (k < 64) {
        val nat = Zigzag(k)
        coefZ(k) = math.round(tmp(nat) / q(nat)).toInt
        k += 1
      }
      val diff = coefZ(0) - preds(comp)
      preds(comp) = coefZ(0)
      val t = bitSize(diff)
      bw.put(dc.encCode(t), dc.encLen(t))
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      var run = 0
      k = 1
      while (k < 64) {
        if (coefZ(k) == 0) run += 1
        else {
          while (run > 15) { bw.put(ac.encCode(0xF0), ac.encLen(0xF0)); run -= 16 }
          val s = bitSize(coefZ(k))
          val rs = (run << 4) | s
          bw.put(ac.encCode(rs), ac.encLen(rs))
          bw.put(if (coefZ(k) < 0) coefZ(k) + (1 << s) - 1 else coefZ(k), s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(ac.encCode(0x00), ac.encLen(0x00)) // EOB
    }

    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xD0 + ((mcu / restartInterval - 1) % 8))
          preds(0) = 0; preds(1) = 0; preds(2) = 0
        }
        // gather the 8x8 RGB tile with edge replication, convert, encode
        var comp = 0
        while (comp < 3) {
          var yy = 0
          while (yy < 8) {
            val sy = math.min(my * 8 + yy, h - 1)
            var xx = 0
            while (xx < 8) {
              val sx = math.min(mx * 8 + xx, w - 1)
              val o = (sy * w + sx) * 3
              val r = img.rgb(o) & 0xff
              val g = img.rgb(o + 1) & 0xff
              val b = img.rgb(o + 2) & 0xff
              val v = comp match {
                case 0 => 0.299 * r + 0.587 * g + 0.114 * b
                case 1 => -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                case _ => 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
              }
              block(yy * 8 + xx) = v - 128.0
              xx += 1
            }
            yy += 1
          }
          if (comp == 0) encodeBlock(dcL, acL, qLum, 0)
          else if (comp == 1) encodeBlock(dcC, acC, qChrom, 1)
          else encodeBlock(dcC, acC, qChrom, 2)
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** separable forward DCT: in = level-shifted samples, out = coefficients */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += in(y * 8 + x) * CosT(x)(u); x += 1 }
        t(y * 8 + u) = acc
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) { acc += t(y * 8 + uu) * CosT(y)(v); y += 1 }
        out(v * 8 + uu) = 0.25 * Cu(uu) * Cu(v) * acc
        uu += 1
      }
      v += 1
    }
  }
}
