package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** CABAC entropy layer (9.3): engine round trips pinned bit-exactly by
  * encoder-reconstruction parity (the method that witnessed CAVLC),
  * plus structural pins on the spec tables, an entropy-efficiency
  * canary on the probability machinery, and hostile-input safety. No
  * conformant H.264 peer ships in this container, so FOREIGN-stream
  * conformance of the table transcription is unwitnessable here; the
  * decoder's exact-termination gate (end_of_slice must fire on exactly
  * the last MB, only zero bytes after) keeps a diverged foreign parse
  * rejecting loudly instead of rendering garbage. */
class H264CabacSpec extends AnyFunSuite {

  // deterministic textured frame (same family the H264 codec specs use)
  private def frame(w: Int, h: Int, seed: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    var s = seed.toLong * 0x9E3779B97F4A7C15L + 1
    while (i < w * h) {
      val x = i % w; val y = i / w
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      val v = (x * 3 + y * 7 + seed) % 256
      rgb(i * 3) = v.toByte
      rgb(i * 3 + 1) = ((v + 50 + ((s >> 40) % 7)).toInt % 256).toByte
      rgb(i * 3 + 2) = ((2 * v + ((x / 5) * 11)) % 256).toByte
      i += 1
    }
    MediaCodecs.Bmp(w, h, rgb)
  }

  test("Table 9-44 structure: monotone decay, row growth, spec anchors") {
    val t = H264Cabac.rangeTabLps
    assert(t.length == 64 && t.forall(_.length == 4))
    // anchors
    assert(t(0).sameElements(Array(128, 176, 208, 240)))
    assert(t(62).sameElements(Array(6, 7, 8, 9)))
    assert(t(63).sameElements(Array(2, 2, 2, 2)))
    for (s <- 0 until 63; q <- 0 until 4) {
      // probability decays with state: rows non-increasing downward
      // (equality only on the state 0-2 column-0 plateau at 128)
      assert(t(s)(q) >= t(s + 1)(q), s"state $s col $q not non-increasing")
      if (s < 62) // the designed ~0.949 geometric decay, loose band
        assert(t(s + 1)(q) >= (t(s)(q) * 8) / 10, s"state $s col $q decays too fast")
    }
    for (s <- 0 until 63; q <- 0 until 3)
      assert(t(s)(q) < t(s)(q + 1), s"state $s row not increasing")
    // LPS range must stay below the smallest quantized range slice so
    // codIRange stays positive: max value in column q < 256 + 64*q
    for (s <- 0 until 64; q <- 0 until 4)
      assert(t(s)(q) < 256 + 64 * q, s"state $s col $q LPS >= range")
  }

  test("Table 9-45 structure: LPS transitions bounded, MPS ladder") {
    val t = H264Cabac.transIdxLps
    assert(t.length == 64)
    assert(t(0) == 0 && t(63) == 63)
    for (s <- 0 until 63) {
      assert(t(s) <= s, s"LPS transition must not increase confidence ($s)")
      assert(t(s) >= 0 && t(s) <= 63)
    }
    for (s <- 0 until 64)
      assert(H264Cabac.transIdxMps(s) == (if (s < 62) s + 1 else s))
  }

  test("context init: every filled I entry yields a legal state at all QPs") {
    for (qp <- Seq(0, 10, 26, 40, 51)) {
      val cx = new H264Cabac.Ctx
      cx.initI(qp)
      var filled = 0
      for (i <- 0 until H264Cabac.NumCtx if cx.state(i) >= 0) {
        assert(cx.state(i) <= 63, s"ctx $i state out of range")
        filled += 1
      }
      assert(filled >= 227, s"expected the full I-slice context surface, got $filled")
      // the ranges an I slice touches are all filled (incl. r14's
      // 399-435: transform_size_8x8_flag + ctxBlockCat-5 families)
      for (r <- Seq(0 to 10, 60 to 104, 105 to 165, 166 to 226, 227 to 275,
          399 to 435); i <- r)
        assert(cx.state(i) >= 0, s"ctx $i unset")
      // P/B-only and field-only ranges stay unset (touching one must
      // throw, not drift)
      for (i <- Seq(11, 24, 40, 54, 277, 398, 436, 459))
        assert(cx.state(i) == -1, s"ctx $i unexpectedly filled")
    }
  }

  test("engine round trip: decisions + bypass + terminate, fixed vectors") {
    // a deterministic mixed bin/bypass sequence through one adaptive
    // context must decode back exactly and re-encode byte-identically
    class Sink extends H264Cavlc.BitOut {
      val bits = new scala.collection.mutable.ArrayBuffer[Int]
      def u1(b: Int): Unit = bits += (b & 1)
      def u(v: Int, n: Int): Unit = { var i = n - 1; while (i >= 0) { u1((v >> i) & 1); i -= 1 } }
      def bytes: Array[Byte] = {
        val padded = bits ++ Seq.fill((8 - bits.length % 8) % 8)(0)
        padded.grouped(8).map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
      }
    }
    var s = 12345L
    val bins = Array.tabulate(4000) { _ =>
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (((s >> 33) % 10) < 3).compareTo(false) // ~30% ones
    }
    val byp = Array.tabulate(500) { i => (i * 7) % 2 }
    for (qp <- Seq(10, 26, 45)) {
      val cx = new H264Cabac.Ctx; cx.initI(qp)
      val sink = new Sink
      val e = new H264Cabac.Enc(sink)
      bins.foreach(b => e.decision(cx, 105, b))
      byp.foreach(e.bypass)
      e.terminate(0)
      e.terminate(1)
      val data = sink.bytes
      val cx2 = new H264Cabac.Ctx; cx2.initI(qp)
      val d = new H264Cabac.Dec(data, 0)
      bins.foreach(b => assert(d.decision(cx2, 105) == b, s"decision mismatch qp $qp"))
      byp.foreach(b => assert(d.bypass() == b, s"bypass mismatch qp $qp"))
      assert(d.terminate() == 0)
      assert(d.terminate() == 1)
      // context states marched identically on both sides
      assert(cx.state(105) == cx2.state(105) && cx.mps(105) == cx2.mps(105))
      // consumed-bit accounting: decoder lands exactly at the flush end
      assert(d.alignedBytePos == data.length, "terminate position drifted")
    }
  }

  test("probability machinery canary: biased source approaches entropy") {
    // H(0.2) = 0.722 bits/bin; 10k adaptive-context bins of a 20% source
    // must code within ~15% of entropy — a corrupted rangeTab/transIdx
    // pair cannot do this
    class CountSink extends H264Cavlc.BitOut {
      var n = 0
      def u1(b: Int): Unit = n += 1
      def u(v: Int, nn: Int): Unit = n += nn
    }
    var s = 99L
    val cx = new H264Cabac.Ctx; cx.initI(26)
    val sink = new CountSink
    val e = new H264Cabac.Enc(sink)
    var ones = 0
    for (_ <- 0 until 10000) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      val b = if ((s >>> 40) % 5 == 0) 1 else 0
      ones += b
      e.decision(cx, 105, b)
    }
    e.terminate(1)
    val bitsPerBin = sink.n.toDouble / 10000
    assert(math.abs(ones / 10000.0 - 0.2) < 0.02, "source bias drifted")
    assert(bitsPerBin < 0.83, f"adaptive coding too weak: $bitsPerBin%.3f bits/bin")
    assert(bitsPerBin > 0.60, f"impossible compression: $bitsPerBin%.3f bits/bin")
  }

  test("CABAC I-frame round trips: parity with CAVLC reconstruction") {
    for ((w, h) <- Seq((48, 32), (64, 64), (34, 18));
        i4 <- Seq(false, true); qp <- Seq(18, 26, 34)) {
      val img = frame(w, h, seed = w + qp)
      val cavlc = H264Codec.encode(img, qp = qp, intra4x4 = i4)
      val cabac = H264Codec.encode(img, qp = qp, intra4x4 = i4, cabac = true)
      val d1 = H264Codec.decode(cavlc)
      val d2 = H264Codec.decode(cabac)
      assert(d2.isDefined, s"CABAC decode failed ${w}x$h i4=$i4 qp=$qp")
      assert(java.util.Arrays.equals(d1.get.rgb, d2.get.rgb),
        s"CABAC reconstruction != CAVLC at ${w}x$h i4=$i4 qp=$qp")
    }
  }

  test("CABAC compresses at least as well as CAVLC on textured frames") {
    // the whole point of the mode — and a canary against grossly wrong
    // context init values (bad init costs bits on every macroblock)
    var cavlcTotal = 0L
    var cabacTotal = 0L
    for (seed <- 1 to 6; i4 <- Seq(false, true)) {
      val img = frame(64, 48, seed)
      cavlcTotal += H264Codec.encode(img, qp = 24, intra4x4 = i4).length
      cabacTotal += H264Codec.encode(img, qp = 24, intra4x4 = i4, cabac = true).length
    }
    assert(cabacTotal < cavlcTotal,
      s"CABAC ($cabacTotal B) must beat CAVLC ($cavlcTotal B)")
  }

  test("CABAC I_PCM: engine reinit across raw samples is exact") {
    for ((w, h) <- Seq((32, 32), (48, 16))) {
      val img = frame(w, h, seed = 7)
      val pcm = H264Codec.encode(img, qp = -1, cabac = true)
      val viaCavlc = H264Codec.decode(H264Codec.encode(img, qp = -1))
      val viaCabac = H264Codec.decode(pcm)
      assert(viaCabac.isDefined, "CABAC PCM decode failed")
      assert(java.util.Arrays.equals(viaCabac.get.rgb, viaCavlc.get.rgb))
    }
  }

  test("hostile inputs: tampered and truncated CABAC streams reject, never throw") {
    val img = frame(64, 48, seed = 3)
    val good = H264Codec.encode(img, qp = 26, cabac = true)
    assert(H264Codec.decode(good).isDefined)
    // truncations: the exact-termination gate must refuse
    for (cut <- Seq(1, 3, 10, good.length / 3, good.length / 2))
      assert(H264Codec.decode(good.take(good.length - cut)).isEmpty,
        s"truncated by $cut accepted")
    // byte tampering in the arithmetic payload: Option-clean always; a
    // diverged parse must reject (garbage acceptance would need the
    // end_of_slice terminate to fire on exactly the last MB)
    var rejected = 0
    var i = good.length / 2
    var flips = 0
    while (i < good.length && flips < 40) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0xa5).toByte
      if (H264Codec.decode(bad).isEmpty) rejected += 1
      flips += 1
      i += 3
    }
    assert(rejected >= flips / 2,
      s"only $rejected/$flips tampered payloads rejected — gate too weak")
    // arbitrary soup through the public API
    var s = 5L
    for (n <- Seq(16, 64, 300)) {
      val soup = Array.tabulate(n) { _ =>
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17; (s & 0xff).toByte
      }
      H264Codec.decode(soup) // must not throw
    }
  }

  test("CAVLC GOPs keep decoding alongside the CABAC paths") {
    // (r13 made CABAC P/B first-class — H264CabacPBSpec owns that
    // coverage; this pin keeps the CAVLC baseline regression-guarded)
    val frames = Seq(frame(48, 32, 1), frame(48, 32, 2))
    val gop = H264Codec.encodeGop(frames, qp = 26)
    val decoded = H264Codec.decodeGop(gop)
    assert(decoded.forall(_.isDefined)) // CAVLC baseline: both fine
  }
}
