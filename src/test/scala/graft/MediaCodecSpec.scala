package graft

import graft.pipeline.{MediaCodecs, Multimodal}
import MediaCodecs.{Bmp, Wav}

/** Pure-JVM BMP/WAV codecs: bit-exact encode→decode round-trips, header
  * edge cases, real feature statistics, and the Multimodal dispatch. */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._

  private def randRgb(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rng = new java.util.Random(seed)
    Array.fill(w * h * 3)(rng.nextInt(256).toByte)
  }

  test("bmp encode→decode is bit-exact across padding widths") {
    // widths 1..5 hit every row-stride padding case (stride % 4)
    for (w <- 1 to 5; h <- Seq(1, 3)) {
      val img = Bmp(w, h, randRgb(w, h, seed = w * 31 + h))
      val back = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img))
      assert(back.isDefined, s"w=$w h=$h")
      assert(back.get.width == w && back.get.height == h)
      assert(back.get.rgb.toSeq == img.rgb.toSeq, s"w=$w h=$h")
    }
  }

  test("top-down bmp (negative height) decodes to the same image") {
    val img = Bmp(4, 2, randRgb(4, 2, seed = 7))
    val bytes = MediaCodecs.encodeBmp(img)
    // flip to top-down: negate height, reverse row order in place
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    val stride = (4 * 3 + 3) / 4 * 4
    val row0 = bytes.slice(54, 54 + stride)
    System.arraycopy(bytes, 54 + stride, bytes, 54, stride)
    System.arraycopy(row0, 0, bytes, 54 + stride, stride)
    val back = MediaCodecs.decodeBmp(bytes)
    assert(back.get.rgb.toSeq == img.rgb.toSeq)
  }

  test("bmp resize: nearest-neighbor 2x downscale picks exact source pixels") {
    // 4x4 image with distinct per-pixel values
    val rgb = Array.tabulate(4 * 4 * 3)(i => i.toByte)
    val img = Bmp(4, 4, rgb)
    val small = MediaCodecs.resizeBmp(img, 2, 2)
    // (x,y) in 2x2 maps to source (2x, 2y)
    for (y <- 0 until 2; x <- 0 until 2)
      assert(small.pixel(x, y) == img.pixel(2 * x, 2 * y), s"($x,$y)")
    // and the resized image round-trips through the encoder
    val back = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(small))
    assert(back.get.rgb.toSeq == small.rgb.toSeq)
  }

  test("malformed bmp payloads are rejected, not mis-decoded") {
    assert(MediaCodecs.decodeBmp("BMnot really a bitmap at all, just text padding out".getBytes).isEmpty)
    val valid = MediaCodecs.encodeBmp(Bmp(3, 3, randRgb(3, 3, 1)))
    assert(MediaCodecs.decodeBmp(valid.take(40)).isEmpty)        // truncated
    val bpp8 = valid.clone; bpp8(28) = 8                          // unsupported depth
    assert(MediaCodecs.decodeBmp(bpp8).isEmpty)
  }

  test("png encode→decode is bit-exact (zlib round-trip + chunk CRCs)") {
    for ((w, h) <- Seq((1, 1), (3, 2), (7, 5))) {
      val img = Bmp(w, h, randRgb(w, h, seed = w * 17 + h))
      val bytes = MediaCodecs.encodePng(img)
      assert(MediaCodecs.isPng(bytes))
      val back = MediaCodecs.decodePng(bytes)
      assert(back.get.width == w && back.get.height == h)
      assert(back.get.rgb.toSeq == img.rgb.toSeq, s"w=$w h=$h")
    }
  }

  test("png defilter inverts every spec filter type (Sub/Up/Average/Paeth)") {
    // build a PNG whose rows use filters 1..4: apply the spec's forward
    // filter in the test, the decoder must invert it back to the pixels
    val w = 5; val h = 4; val bpp = 3; val stride = w * bpp
    val img = Bmp(w, h, randRgb(w, h, seed = 99))
    def px(y: Int, x: Int): Int = img.rgb(y * stride + x) & 0xff
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val f = y % 4 + 1 // 1=Sub 2=Up 3=Average 4=Paeth
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val left = if (x >= bpp) px(y, x - bpp) else 0
        val up = if (y > 0) px(y - 1, x) else 0
        val ul = if (y > 0 && x >= bpp) px(y - 1, x - bpp) else 0
        val pred = f match {
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = ((px(y, x) - pred) & 0xff).toByte
      }
    }
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes); crc.update(body)
      java.nio.ByteBuffer.allocate(12 + body.length)
        .putInt(body.length).put(tag.getBytes).put(body).putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val os = new java.io.ByteArrayOutputStream()
    while (!d.finished()) os.write(buf, 0, d.deflate(buf))
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", os.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
    assert(MediaCodecs.decodePng(png).get.rgb.toSeq == img.rgb.toSeq)
  }

  test("png rgba decode drops alpha; malformed png rejected") {
    // craft a 2x1 RGBA png (color type 6) with filter 0 rows
    val w = 2; val h = 1
    val rgba = Array[Byte](10, 20, 30, 127.toByte, 40, 50, 60, 255.toByte)
    val raw = Array[Byte](0) ++ rgba
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes); crc.update(body)
      java.nio.ByteBuffer.allocate(12 + body.length)
        .putInt(body.length).put(tag.getBytes).put(body).putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
    val buf = new Array[Byte](256); val os = new java.io.ByteArrayOutputStream()
    while (!d.finished()) os.write(buf, 0, d.deflate(buf))
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", os.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
    assert(MediaCodecs.decodePng(png).get.rgb.toSeq ==
      Seq[Byte](10, 20, 30, 40, 50, 60))
    // truncated IDAT → rejected
    assert(MediaCodecs.decodePng(png.take(png.length - 20)).isEmpty)
    // 16-bit depth → rejected
    val deep = png.clone; deep(8 + 8 + 8) = 16
    assert(MediaCodecs.decodePng(deep).isEmpty)
  }

  test("png: preset-dictionary zlib header rejected (no inflate spin)") {
    // zlib CMF/FLG with FDICT set (0x78 0x3F has a valid %31 checksum):
    // inflate() returns 0 with needsDictionary, which must reject — not
    // loop forever inside a Spark task
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes); crc.update(body)
      java.nio.ByteBuffer.allocate(12 + body.length)
        .putInt(body.length).put(tag.getBytes).put(body).putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val fdictStream = Array[Byte](0x78, 0x3f, 1, 2, 3, 4, 5, 6, 7, 8)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", fdictStream) ++
      chunk("IEND", Array.empty[Byte])
    assert(MediaCodecs.decodePng(png).isEmpty) // and returns, not hangs
  }

  test("png with more rows than IHDR declares is rejected") {
    val img = Bmp(2, 2, randRgb(2, 2, 21))
    val bytes = MediaCodecs.encodePng(img)
    // re-declare the height as 1: the stream now decompresses to MORE
    // data than the header implies → inconsistent file, must reject
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(8 + 8 + 4, 1) // IHDR height field
    assert(MediaCodecs.decodePng(bytes).isEmpty)
  }

  test("wav encode→decode is bit-exact and chunk walking skips LIST") {
    val rng = new java.util.Random(3)
    val samples = Array.fill(200)((rng.nextInt(65536) - 32768).toShort)
    val wav = Wav(16000, 2, samples)
    val back = MediaCodecs.decodeWav(MediaCodecs.encodeWav(wav))
    assert(back.get == Wav(16000, 2, samples) ||
      (back.get.sampleRateHz == 16000 && back.get.channels == 2 &&
        back.get.samples.toSeq == samples.toSeq))
    // insert a LIST chunk between fmt and data: decoder must skip it
    val bytes = MediaCodecs.encodeWav(wav)
    val listChunk = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val patched = bytes.slice(0, 36) ++ listChunk ++ bytes.slice(36, bytes.length)
    val bb = java.nio.ByteBuffer.wrap(patched).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + listChunk.length) // fix RIFF size
    val walked = MediaCodecs.decodeWav(patched)
    assert(walked.get.samples.toSeq == samples.toSeq)
  }

  test("wav features: square wave has RMS = amplitude and known ZCR") {
    val samples = Array.tabulate(8000)(i =>
      (if ((i / 4) % 2 == 0) 8000 else -8000).toShort)
    val f = MediaCodecs.wavFeatures(Wav(8000, 1, samples))
    assert(math.abs(f(3) - 8000f / 32768f) < 1e-4, s"rms ${f(3)}")   // RMS = A
    assert(math.abs(f(4) - 8000f / 32768f) < 1e-6, s"peak ${f(4)}")
    assert(math.abs(f(5) - 0.25f) < 1e-2, s"zcr ${f(5)}")            // flips every 4
    assert(math.abs(f(2) - 0.1f) < 1e-6, s"duration ${f(2)}")        // 1 s / 10
    assert(f(15) == 2f)
  }

  test("bmp features: uniform image has zero spread and exact means") {
    val rgb = Array.fill(8 * 4)(Seq(10.toByte, 200.toByte, 60.toByte)).flatten.toArray
    val f = MediaCodecs.bmpFeatures(Bmp(8, 4, rgb))
    assert(math.abs(f(2) - 10f / 255f) < 1e-6)
    assert(math.abs(f(3) - 200f / 255f) < 1e-6)
    assert(math.abs(f(4) - 60f / 255f) < 1e-6)
    assert(f(5) == 0f) // no luminance spread
    assert(f(6 + ((10 + 200 + 60) / 3 / 32)) == 1f) // all mass in one histogram bin
    assert(f(15) == 1f)
  }

  test("y4m encode→decode: header parsed, grayscale round-trips within ±1") {
    // grayscale frames: U=V=128 exactly, so chroma subsampling is
    // lossless and Y = pixel value — round-trip error is pure rounding
    val w = 6; val h = 4
    val frames = (0 until 3).map { f =>
      val rgb = new Array[Byte](w * h * 3)
      for (i <- 0 until w * h; c <- 0 until 3) rgb(i * 3 + c) = ((i * 9 + f * 40) % 256).toByte
      MediaCodecs.Bmp(w, h, rgb)
    }
    val video = MediaCodecs.Y4m(w, h, frames)
    val back = MediaCodecs.decodeY4m(MediaCodecs.encodeY4m(video))
    assert(back.get.width == w && back.get.height == h && back.get.frames.length == 3)
    for (f <- 0 until 3; i <- 0 until w * h * 3) {
      val a = frames(f).rgb(i) & 0xff; val b = back.get.frames(f).rgb(i) & 0xff
      assert(math.abs(a - b) <= 1, s"frame $f byte $i: $a vs $b")
    }
  }

  test("y4m features: still video has zero motion, moving video does not") {
    val w = 4; val h = 4
    def flat(v: Int) = MediaCodecs.Bmp(w, h, Array.fill(w * h * 3)(v.toByte))
    val still = MediaCodecs.y4mFeatures(MediaCodecs.Y4m(w, h, Seq(flat(100), flat(100))))
    assert(still(4) == 0f, s"motion ${still(4)}")
    assert(still(15) == 3f)
    val moving = MediaCodecs.y4mFeatures(MediaCodecs.Y4m(w, h, Seq(flat(100), flat(200))))
    assert(moving(4) > 0.3f, s"motion ${moving(4)}") // |ΔY| = 100 → ~0.39
    assert(math.abs(still(3) - 100f / 255f) < 1e-5)  // mean luma
  }

  test("malformed y4m rejected: odd dims, bad chroma, truncated frame") {
    val good = MediaCodecs.encodeY4m(MediaCodecs.Y4m(4, 4,
      Seq(MediaCodecs.Bmp(4, 4, randRgb(4, 4, 11)))))
    assert(MediaCodecs.decodeY4m(good).isDefined)
    assert(MediaCodecs.decodeY4m(good.take(good.length - 5)).isEmpty) // truncated
    val odd = new String(good.take(30), "US-ASCII").replace("W4", "W5")
    assert(MediaCodecs.decodeY4m(odd.getBytes ++ good.drop(30)).isEmpty)
    val c444 = new String(good, "US-ASCII").replace("C420jpeg", "C444mono").getBytes
    assert(MediaCodecs.decodeY4m(c444).isEmpty)
  }

  test("dispatch: real decoders for bmp/wav, stub for opaque bytes") {
    val bmp = MediaCodecs.encodeBmp(Bmp(3, 2, randRgb(3, 2, 5)))
    val wav = MediaCodecs.encodeWav(Wav(8000, 1, Array.tabulate(64)(_.toShort)))
    val opaque = "definitely not a media file".getBytes
    assert(Multimodal.decode(bmp)(15) == 1f)
    assert(Multimodal.decode(wav)(15) == 2f)
    assert(Multimodal.decode(opaque).toSeq == Multimodal.decodeStub(opaque).toSeq)
  }

  test("resizeBmpBilinear: hand-computed 2x2 -> 4x4, identity, half-up rounding") {
    def gray(vals: Int*): Array[Byte] =
      vals.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)).toArray
    // corners 0/100/40/220; pixel-center positions give fx in {0, 2, 6,
    // clamp} of 8 — every cell hand-computed with the single half-up
    // rounding division
    val src = Bmp(2, 2, gray(0, 100, 40, 220))
    val up = MediaCodecs.resizeBmpBilinear(src, 4, 4)
    val got = (0 until 16).map(i => up.rgb(3 * i) & 0xff)
    assert(got == Seq(
      0, 25, 75, 100,
      10, 40, 100, 130,
      30, 70, 150, 190,
      40, 85, 175, 220), got.mkString(","))
    // all three channels resampled identically for gray input
    assert(up.rgb.grouped(3).forall(c => c(0) == c(1) && c(1) == c(2)))
    // exact .5 ties round UP: 0..10 ramp at fx=2 is 2.5 -> 3, fx=6 is 7.5 -> 8
    val ramp = MediaCodecs.resizeBmpBilinear(Bmp(2, 1, gray(0, 10)), 4, 1)
    assert((0 until 4).map(i => ramp.rgb(3 * i) & 0xff) == Seq(0, 3, 8, 10))
    // same-size resize is the identity (pixel centers align exactly)
    val id = MediaCodecs.resizeBmpBilinear(src, 2, 2)
    assert(id.rgb.toSeq == src.rgb.toSeq)
    // 2:1 downscale lands on half-positions and blends neighbor pairs
    // (nearest just picks): [0,100 | 200,40] -> [(0+100)/2, (200+40)/2]
    val dn = MediaCodecs.resizeBmpBilinear(Bmp(4, 1, gray(0, 100, 200, 40)), 2, 1)
    val nn = MediaCodecs.resizeBmp(Bmp(4, 1, gray(0, 100, 200, 40)), 2, 1)
    assert((dn.rgb(0) & 0xff) == 50 && (dn.rgb(3) & 0xff) == 120,
      s"${dn.rgb(0)} ${dn.rgb(3)}")
    assert((nn.rgb(0) & 0xff) == 0 && (nn.rgb(3) & 0xff) == 200) // picked
  }

  test("letterbox: limiting-side selection, centered pad, exact fill") {
    def gray(vals: Int*): Array[Byte] =
      vals.flatMap(v => Seq(v.toByte, v.toByte, v.toByte)).toArray
    // wide 4x2 into a 4x4 box: width-limited (4*2 <= 4*4), th =
    // round(2*4/4) = 2, oy = 1 -> rows 0 and 3 are pure fill
    val wide = Bmp(4, 2, gray(10, 20, 30, 40, 50, 60, 70, 80))
    val lb = MediaCodecs.letterbox(wide, 4, 4, fill = 114)
    assert(lb.width == 4 && lb.height == 4)
    val px = (0 until 16).map(i => lb.rgb(3 * i) & 0xff)
    assert(px.take(4).forall(_ == 114) && px.takeRight(4).forall(_ == 114), px)
    // content rows are the identity resize of the source (tw=4, th=2)
    assert(px.slice(4, 12) == Seq(10, 20, 30, 40, 50, 60, 70, 80), px)
    // tall 2x4 into 4x4: height-limited, tw = 2, ox = 1 -> fill columns
    val tall = MediaCodecs.letterbox(Bmp(2, 4, gray(1 to 8: _*)), 4, 4)
    val tp = (0 until 16).map(i => tall.rgb(3 * i) & 0xff)
    for (y <- 0 until 4) {
      assert(tp(y * 4) == 114 && tp(y * 4 + 3) == 114, s"row $y")
      assert(tp(y * 4 + 1) == 2 * y + 1 && tp(y * 4 + 2) == 2 * y + 2, s"row $y")
    }
    // square into square: no padding at all, pure bilinear identity
    val sq = Bmp(2, 2, gray(9, 9, 9, 9))
    assert(MediaCodecs.letterbox(sq, 2, 2).rgb.toSeq == sq.rgb.toSeq)
  }

  test("downmixMono: floor-mean over channels, exact on negative odd sums") {
    // stereo frames: (10, 20) -> 15; (-3, -4) -> floorDiv(-7,2) = -4
    // (NOT truncation's -3 — the one convention the oracle replays);
    // (7, 0) -> 3
    val st = Wav(8000, 2, Array[Short](10, 20, -3, -4, 7, 0))
    val mono = MediaCodecs.downmixMono(st)
    assert(mono.channels == 1 && mono.sampleRateHz == 8000)
    assert(mono.samples.toSeq == Seq[Short](15, -4, 3))
    // 3-channel: (1, 2, 4) -> 2; mono passthrough is identity
    val tri = MediaCodecs.downmixMono(Wav(8000, 3, Array[Short](1, 2, 4)))
    assert(tri.samples.toSeq == Seq[Short](2))
    val m = Wav(8000, 1, Array[Short](5, 6))
    assert(MediaCodecs.downmixMono(m) eq m)
  }

  test("resampleWav: exact linear interpolation, endpoints, edge shapes") {
    val ramp = Wav(8000, 1, Array[Short](0, 100, -60, 40))
    // 2x upsample: midpoints are exact floor-averages, endpoints exact,
    // n_out = floor(3*16000/8000) + 1 = 7 (no extrapolation past s(3))
    val up = MediaCodecs.resampleWav(ramp, 16000)
    assert(up.sampleRateHz == 16000)
    assert(up.samples.toSeq == Seq[Short](0, 50, 100, 20, -60, -10, 40))
    // 3/4 downsample: j=1 at pos 4/3 -> s(1) + floor((s(2)-s(1))/3) =
    // 100 + floor(-160/3) = 100 - 54 = 46; j=2 at pos 8/3 ->
    // -60 + floor(100*2/3) = -60 + 66 = 6; n_out = floor(3*3/4)+1 = 3
    val dn = MediaCodecs.resampleWav(ramp, 6000)
    assert(dn.samples.toSeq == Seq[Short](0, 46, 6))
    // identity rate returns the same samples; empty and 1-sample safe
    assert(MediaCodecs.resampleWav(ramp, 8000).samples.toSeq == ramp.samples.toSeq)
    assert(MediaCodecs.resampleWav(Wav(8000, 1, Array.empty[Short]), 16000)
      .samples.isEmpty)
    assert(MediaCodecs.resampleWav(Wav(8000, 1, Array[Short](7)), 3000)
      .samples.toSeq == Seq[Short](7))
    // the first sample always survives; the last lands ON the final
    // input exactly when the rate ratio divides (integer upsampling)
    for (r <- Seq(3000, 5513, 11025, 44100)) {
      assert(MediaCodecs.resampleWav(ramp, r).samples.head == 0, s"rate $r")
    }
    for (k <- Seq(2, 3, 4)) {
      val o = MediaCodecs.resampleWav(ramp, 8000 * k)
      assert(o.samples.last == 40 && o.samples.length == 3 * k + 1, s"x$k")
    }
  }

  test("G.711: spec anchor values, all-256 round trips, WAV fmt 6/7 decode") {
    // mu-law anchors from the G.711 tables: 0x00 -> -32124 (max
    // negative), 0x80 -> +32124, 0xFF -> +0, 0x7F -> -0 (decodes 0)
    assert(MediaCodecs.muLawToPcm(0x00) == -32124)
    assert(MediaCodecs.muLawToPcm(0x80) == 32124)
    assert(MediaCodecs.muLawToPcm(0xFF) == 0 && MediaCodecs.muLawToPcm(0x7F) == 0)
    // A-law anchors: 0x55 -> -8 (smallest), 0xD5 -> +8, 0x2A -> -32256,
    // 0xAA -> +32256 (the A-law ceiling)
    assert(MediaCodecs.aLawToPcm(0x55) == -8 && MediaCodecs.aLawToPcm(0xD5) == 8)
    assert(MediaCodecs.aLawToPcm(0x2A) == -32256 && MediaCodecs.aLawToPcm(0xAA) == 32256)
    // every code survives decode -> encode, EXCEPT mu-law 0x7F: the -0
    // code decodes to 0, which re-encodes as +0 = 0xFF (G.711's one
    // non-injective point); A-law has no zero code, so all 256 hold
    for (c <- 0 until 256) {
      if (c != 0x7F)
        assert(MediaCodecs.pcmToMuLaw(MediaCodecs.muLawToPcm(c)) == c, s"mu $c")
      assert(MediaCodecs.pcmToALaw(MediaCodecs.aLawToPcm(c)) == c, s"a $c")
    }
    assert(MediaCodecs.pcmToMuLaw(MediaCodecs.muLawToPcm(0x7F)) == 0xFF)
    // encode clamps past the ceilings instead of wrapping
    assert(MediaCodecs.pcmToMuLaw(32767) == MediaCodecs.pcmToMuLaw(32635))
    assert(MediaCodecs.pcmToALaw(32767) == 0xAA) // the +32256 ceiling code
    // fmt 7 / fmt 6 WAVs decode through the same decodeWav surface
    val codes = Array.tabulate[Byte](64)(i => ((i * 11 + 5) % 256).toByte)
    val mu = MediaCodecs.decodeWav(MediaCodecs.encodeWavG711(8000, 1, codes, aLaw = false)).get
    assert(mu.sampleRateHz == 8000 && mu.channels == 1)
    assert(mu.samples.toSeq ==
      codes.toSeq.map(c => MediaCodecs.muLawToPcm(c & 0xff).toShort))
    val al = MediaCodecs.decodeWav(MediaCodecs.encodeWavG711(8000, 1, codes, aLaw = true)).get
    assert(al.samples.toSeq ==
      codes.toSeq.map(c => MediaCodecs.aLawToPcm(c & 0xff).toShort))
  }

  test("sliceWav: sample-aligned slices reassemble the original") {
    val samples = Array.tabulate(100)(_.toShort)
    val wav = Wav(8000, 1, samples)
    val n = 4
    val joined = (0 until n).flatMap(i => MediaCodecs.sliceWav(wav, i, n).samples)
    assert(joined == samples.toSeq)
  }

  test("resize and sampleFrames take the real paths on real media") {
    val docs = Seq((0L, "an image doc"), (1L, "an audio doc"),
      (2L, "a png image doc")).toDF("doc_id", "text")
    val media = Multimodal.realMediaFromText(docs, "doc_id", "text")
    val resized = Multimodal.resize(media, 2, 2).collect()
    val img = resized.find(_.kind == "image").get
    val back = MediaCodecs.decodeBmp(img.payload)
    assert(back.get.width == 2 && back.get.height == 2) // valid BMP at new dims
    val png = resized.find(_.kind == "image_png").get
    assert(MediaCodecs.isPng(png.payload)) // container format preserved
    val pback = MediaCodecs.decodePng(png.payload)
    assert(pback.get.width == 2 && pback.get.height == 2)
    val frames = Multimodal.sampleFrames(media.filter(_.kind == "audio"), 4)
      .select($"features").collect()
    // every audio frame is a valid standalone WAV → real audio features
    assert(frames.forall(_.getSeq[Float](0)(15) == 2f))
    // video frames sample to standalone PNGs → real image features
    val vdocs = Seq((3L, "a moving picture")).toDF("doc_id", "text")
    val vmedia = Multimodal.realMediaFromText(vdocs, "doc_id", "text")
    assert(vmedia.collect().head.kind == "video")
    val vframes = Multimodal.sampleFrames(vmedia, 2).select($"features").collect()
    assert(vframes.nonEmpty && vframes.forall(_.getSeq[Float](0)(15) == 1f))
    // and the video payload itself dispatches to the real video features
    assert(Multimodal.decode(vmedia.collect().head.payload)(15) == 3f)
  }
}
