package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec: LOSSLESS round trips pin byte-exact sample equality
  * across the whole feature grid (stereo decorrelation modes, fixed
  * orders, LPC, Rice partitions, escape partitions, wasted bits, odd
  * lengths), CRC-8/CRC-16/MD5 corruption all reject, and hostile
  * inputs never escape. No conformant decoder ships in this container,
  * so foreign-bitstream conformance is untestable here — what the
  * format's losslessness buys is that ANY encode/decode defect breaks
  * exact equality somewhere in this grid. */
class FlacCodecSpec extends AnyFunSuite {

  private def wav(rate: Int, ch: Int, samples: Array[Short]): MediaCodecs.Wav =
    MediaCodecs.Wav(rate, ch, samples)

  // deterministic tonal-ish integer wave: smooth + correlated channels
  private def tone(n: Int, ch: Int, seed: Int): Array[Short] = {
    val out = new Array[Short](n * ch)
    var phase = seed.toLong
    var i = 0
    while (i < n) {
      phase = phase * 1103515245L + 12345
      val base = (6000 * math.sin(i / 23.0 + seed) +
        2000 * math.sin(i / 7.0) + ((phase >> 33) % 101) - 50).toInt
      var c = 0
      while (c < ch) {
        val v = base + c * (base / 7 + 13) // correlated channels
        out(i * ch + c) = math.max(Short.MinValue, math.min(Short.MaxValue, v)).toShort
        c += 1
      }
      i += 1
    }
    out
  }

  private def noise(n: Int, ch: Int, seed: Long): Array[Short] = {
    var s = seed * 0x9E3779B97F4A7C15L + 1
    Array.tabulate[Short](n * ch) { _ =>
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s & 0xffff).toShort
    }
  }

  private def roundTrip(w: MediaCodecs.Wav, useLpc: Boolean = false,
      partitionOrder: Int = 0, forceEscape: Boolean = false): Array[Byte] = {
    val flac = FlacCodec.encodeFlac(w, useLpc = useLpc,
      partitionOrder = partitionOrder, forceEscape = forceEscape)
    val back = FlacCodec.decodeFlac(flac)
    assert(back.isDefined, "decode failed")
    assert(back.get.sampleRateHz == w.sampleRateHz)
    assert(back.get.channels == w.channels)
    assert(java.util.Arrays.equals(back.get.samples, w.samples),
      "LOSSLESS round trip must be sample-exact")
    flac
  }

  test("lossless: silence, tone, noise, ramp — mono and stereo, odd lengths") {
    for (n <- Seq(1, 2, 3, 5, 100, 4096, 4097, 9000); ch <- Seq(1, 2)) {
      roundTrip(wav(16000, ch, new Array[Short](n * ch))) // silence: CONSTANT
      roundTrip(wav(22050, ch, tone(n, ch, seed = n + ch)))
    }
    roundTrip(wav(8000, 1, Array.tabulate[Short](5000)(i => (i - 2500).toShort))) // ramp
    roundTrip(wav(44100, 2, noise(6000, 2, 99))) // incompressible -> verbatim path
  }

  test("tonal stereo compresses; noise does not blow up") {
    val t = wav(22050, 2, tone(8192, 2, seed = 4))
    val flac = roundTrip(t)
    assert(flac.length < 2 * t.samples.length * 11 / 20, // < 55% of raw
      s"tonal stereo: ${flac.length}B vs raw ${2 * t.samples.length}B")
    val nz = wav(22050, 2, noise(8192, 2, 5))
    val nflac = roundTrip(nz)
    assert(nflac.length < 2 * nz.samples.length * 12 / 10,
      "noise must stay near raw size, not explode")
  }

  test("LPC, Rice partitions, escape partitions, wasted bits all round-trip") {
    val t = wav(16000, 2, tone(8192, 2, seed = 7))
    val plain = roundTrip(t)
    val lpc = roundTrip(t, useLpc = true)
    val parts = roundTrip(t, partitionOrder = 3)
    val esc = roundTrip(t, forceEscape = true)
    // the variants genuinely produce different bitstreams
    assert(!java.util.Arrays.equals(plain, esc))
    assert(!java.util.Arrays.equals(plain, parts))
    assert(lpc.length <= plain.length * 11 / 10, "LPC should not cost much")
    // wasted bits: every sample a multiple of 8 -> 3 shared low zero bits
    val shifted = wav(16000, 1,
      tone(5000, 1, seed = 9).map(v => ((v / 8) * 8).toShort))
    roundTrip(shifted)
    // and combined
    roundTrip(wav(16000, 2, tone(4099, 2, seed = 21)), useLpc = true,
      partitionOrder = 2)
  }

  test("corruption rejects: frame CRC, header CRC, STREAMINFO MD5") {
    val t = wav(16000, 1, tone(5000, 1, seed = 3))
    val flac = FlacCodec.encodeFlac(t)
    assert(FlacCodec.decodeFlac(flac).isDefined)
    // STREAMINFO is 4 (magic) + 4 (block header) + 34 bytes; frames after.
    // Flip a byte in the FIRST frame body -> CRC-16 (or CRC-8) mismatch
    val frameStart = 4 + 4 + 34
    for (off <- Seq(frameStart + 1, frameStart + 7, frameStart + 40,
        flac.length - 3)) {
      val bad = flac.clone(); bad(off) = (bad(off) ^ 0x5a).toByte
      assert(FlacCodec.decodeFlac(bad).isEmpty, s"corruption at $off accepted")
    }
    // tamper the stored MD5 itself -> MD5 mismatch (frames intact)
    val badMd5 = flac.clone()
    badMd5(4 + 4 + 18) = (badMd5(4 + 4 + 18) ^ 0x01).toByte
    assert(FlacCodec.decodeFlac(badMd5).isEmpty, "MD5 tamper accepted")
  }

  test("hostile inputs: soup and truncations never escape") {
    def soup(seed: Long, n: Int): Array[Byte] = {
      var s = seed * 0x9E3779B97F4A7C15L + 1
      Array.tabulate(n) { _ =>
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        (s & 0xff).toByte
      }
    }
    for (seed <- 1 to 80) {
      FlacCodec.decodeFlac(soup(seed, 32 + seed * 13)) // Option: no throw
      val fake = "fLaC".getBytes("US-ASCII") ++ soup(seed, 64 + seed * 7)
      FlacCodec.decodeFlac(fake)
    }
    val good = FlacCodec.encodeFlac(wav(16000, 2, tone(5000, 2, seed = 8)))
    for (cut <- Seq(1, 5, 37, 100, good.length / 2, good.length - 4))
      FlacCodec.decodeFlac(good.take(math.max(0, good.length - cut)))
  }

  test("native bit depths 8/12/16/20/24 all round-trip sample-exactly") {
    // studio corpora ship 24-bit FLAC; the raw API decodes every depth
    // losslessly (the 16-bit Wav facade keeps returning None past 16)
    for (bps <- Seq(8, 12, 16, 20, 24); ch <- Seq(1, 2)) {
      val n = 5000
      val lim = (1 << (bps - 1)) - 1
      var h = bps.toLong * 31 + ch
      val samples = Array.tabulate(n * ch) { i =>
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        val tri = {
          val ph = (i / ch) % 80
          (if (ph < 40) ph else 80 - ph) * (lim / 45)
        }
        math.max(-lim - 1, math.min(lim, tri - lim / 2 + ((h >> 40) % 9).toInt))
      }
      val flac = FlacCodec.encodeFlacRaw(16000, ch, bps, samples,
        useLpc = bps % 3 == 0, partitionOrder = bps % 4)
      val back = FlacCodec.decodeFlacRaw(flac)
      assert(back.isDefined, s"bps $bps ch $ch decode failed")
      val (rate, bch, bbps, bs) = back.get
      assert(rate == 16000 && bch == ch && bbps == bps, s"bps $bps ch $ch header")
      assert(java.util.Arrays.equals(bs, samples), s"bps $bps ch $ch samples")
      // the 16-bit facade: exact at <=16, None past it
      if (bps <= 16) assert(FlacCodec.decodeFlac(flac).isDefined)
      else assert(FlacCodec.decodeFlac(flac).isEmpty, "facade must refuse >16-bit")
    }
  }

  test("UTF-8 frame numbers round-trip across every byte length") {
    // streams in this suite never pass 3 frames, so the 2..7-byte forms
    // need a direct witness: boundary values either side of each width
    val probes = Seq(0L, 1L, 0x7eL, 0x7fL, 0x80L, 0x7ffL, 0x800L,
      0xffffL, 0x10000L, 0x1fffffL, 0x200000L, 0x3ffffffL, 0x4000000L,
      0x7fffffffL, (1L << 35), (1L << 36) - 1)
    probes.foreach { v =>
      assert(FlacCodec.utf8NumberRoundTrip(v) == v, s"value $v")
    }
  }

  test("STREAMINFO total_samples == 0 means UNKNOWN: frames decode to EOF") {
    // streamed flac output commonly carries total=0; a decoder that
    // used it as the loop bound would silently return zero samples
    // (and archiveAudio's empty==empty verification would pass
    // trivially while losing the audio)
    val t = wav(16000, 2, tone(9000, 2, seed = 6)) // > 2 frames
    val flac = FlacCodec.encodeFlac(t)
    // total(36) = low nibble of STREAMINFO byte 13 + bytes 14-17
    // (file offsets 21-25 behind the 4B magic + 4B block header)
    val unk = flac.clone()
    unk(21) = (unk(21) & 0xf0).toByte
    unk(22) = 0; unk(23) = 0; unk(24) = 0; unk(25) = 0
    val back = FlacCodec.decodeFlac(unk)
    assert(back.isDefined, "unknown-total stream must decode")
    assert(java.util.Arrays.equals(back.get.samples, t.samples),
      "unknown-total decode must return ALL samples, not zero")
    // a zero-length stream with total=0 and no frames stays empty
    val empty = FlacCodec.encodeFlac(wav(16000, 1, Array.empty[Short]))
    assert(FlacCodec.decodeFlac(empty).exists(_.samples.isEmpty))
    // trailing garbage after the last frame of an unknown-total stream
    // must reject (sync loss), not decode partially
    val garbage = unk ++ Array[Byte](0x12, 0x34, 0x56)
    assert(FlacCodec.decodeFlac(garbage).isEmpty, "trailing garbage accepted")
  }

  test("payloads >= 256 MiB decode (bit positions do not overflow Int)") {
    // byteOffset * 8 overflows Int at 256 MiB; splice 17 x 16 MiB
    // PADDING metadata blocks so the first frame sits past the line
    val t = wav(16000, 1, tone(3000, 1, seed = 11))
    val flac = FlacCodec.encodeFlac(t)
    val out = new java.io.ByteArrayOutputStream(290 << 20)
    out.write(flac, 0, 4) // magic
    out.write(Array[Byte](0x00, 0, 0, 34)) // STREAMINFO, no longer last
    out.write(flac, 8, 34)
    val padLen = (1 << 24) - 1 // max 24-bit block length
    val pad = new Array[Byte](padLen)
    for (i <- 0 until 17) {
      val hdr = if (i == 16) 0x81 else 0x01 // PADDING, last on the final one
      out.write(Array[Byte](hdr.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
      out.write(pad)
    }
    out.write(flac, 42, flac.length - 42) // the frames
    val big = out.toByteArray
    assert(big.length > (1 << 28), "fixture must cross 256 MiB")
    val back = FlacCodec.decodeFlac(big)
    assert(back.isDefined, "large valid payload must decode")
    assert(java.util.Arrays.equals(back.get.samples, t.samples))
  }

  test("encoder rejects sample rates outside STREAMINFO's 20-bit field") {
    val s = new Array[Int](100)
    intercept[IllegalArgumentException](FlacCodec.encodeFlacRaw(0, 1, 16, s))
    intercept[IllegalArgumentException](FlacCodec.encodeFlacRaw(-1, 1, 16, s))
    intercept[IllegalArgumentException](FlacCodec.encodeFlacRaw(1 << 20, 1, 16, s))
    assert(FlacCodec.decodeFlacRaw(
      FlacCodec.encodeFlacRaw((1 << 20) - 1, 1, 16, s)).exists(_._1 == (1 << 20) - 1))
  }

  test("structural pins: magic, STREAMINFO fields, frame sync") {
    val t = wav(12345, 2, tone(5000, 2, seed = 1))
    val flac = FlacCodec.encodeFlac(t)
    assert(FlacCodec.isFlac(flac))
    assert(new String(flac, 0, 4, "US-ASCII") == "fLaC")
    assert((flac(4) & 0x80) != 0 && (flac(4) & 0x7f) == 0, "one STREAMINFO, last")
    // sample rate 20 bits at byte 18 of STREAMINFO (offset 8+10)
    val sr = ((flac(18) & 0xff) << 12) | ((flac(19) & 0xff) << 4) |
      ((flac(20) & 0xff) >> 4)
    assert(sr == 12345, s"STREAMINFO rate $sr")
    assert(((flac(20) >> 1) & 7) == 1, "channels-1") // 2 channels
    // first frame: 14-bit sync 11111111111110
    val fs = 4 + 4 + 34
    assert((flac(fs) & 0xff) == 0xff && (flac(fs + 1) & 0xfc) == 0xf8,
      "frame sync")
  }
}
