package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** H.264 intra codec: spec-vector pins for the bit primitives
  * (Exp-Golomb 9.1, emulation prevention 7.4.1.1), byte-exact plane
  * transport through I_PCM, both NAL framings, hostile-input safety,
  * and the MP4+Multimodal end-to-end integration. */
class H264CodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (x * 255 / math.max(1, w - 1)).toByte
      rgb(o + 1) = (y * 255 / math.max(1, h - 1)).toByte
      rgb(o + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
    }
    MediaCodecs.Bmp(w, h, rgb)
  }

  private def noisy(w: Int, h: Int, seed: Int): MediaCodecs.Bmp =
    MediaCodecs.Bmp(w, h, Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 17) % 256).toByte))

  test("emulation prevention: spec vectors round-trip") {
    // 7.4.1.1: 00 00 00 / 00 00 01 / 00 00 02 / 00 00 03 get an EPB
    val vectors = Seq(
      Array[Byte](0, 0, 0) -> Array[Byte](0, 0, 3, 0),
      Array[Byte](0, 0, 1) -> Array[Byte](0, 0, 3, 1),
      Array[Byte](0, 0, 2) -> Array[Byte](0, 0, 3, 2),
      Array[Byte](0, 0, 3) -> Array[Byte](0, 0, 3, 3),
      Array[Byte](0, 0, 4) -> Array[Byte](0, 0, 4),
      Array[Byte](1, 0, 0, 0, 0, 1) -> Array[Byte](1, 0, 0, 3, 0, 0, 3, 1))
    vectors.foreach { case (rbsp, ebsp) =>
      assert(H264Codec.escape(rbsp).toSeq == ebsp.toSeq, rbsp.mkString(","))
      assert(H264Codec.unescape(ebsp, 0, ebsp.length).toSeq == rbsp.toSeq)
    }
  }

  test("I_PCM transport is BYTE-EXACT at the plane level") {
    for (img <- Seq(gradient(48, 32), noisy(32, 16, 7), noisy(64, 48, 3))) {
      val wMbs = (img.width + 15) / 16; val hMbs = (img.height + 15) / 16
      val expected = H264Codec.toYuv420(img, wMbs, hMbs)
      val (sps, yP, cbP, crP) = H264Codec.decodeYuv(H264Codec.encode(img)).get
      assert(sps.width == img.width && sps.height == img.height)
      assert(yP.toSeq == expected._1.toSeq, "luma plane differs")
      assert(cbP.toSeq == expected._2.toSeq, "cb plane differs")
      assert(crP.toSeq == expected._3.toSeq, "cr plane differs")
    }
  }

  test("smooth images survive the 4:2:0 colorspace round trip closely") {
    val img = gradient(64, 32)
    val back = H264Codec.decode(H264Codec.encode(img)).get
    val mad = img.rgb.iterator.zip(back.rgb.iterator)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
      .sum.toDouble / img.rgb.length
    assert(mad < 2.0, s"mad $mad")
  }

  test("both NAL framings decode; odd dims crop per SPS") {
    val img = gradient(48, 32)
    assert(H264Codec.decode(H264Codec.encode(img, avcc = false)).get.width == 48)
    val odd = H264Codec.decode(H264Codec.encode(gradient(30, 18))).get
    assert(odd.width == 30 && odd.height == 18)
    assert(H264Codec.describe(H264Codec.encode(gradient(30, 18))).contains((30, 18)))
  }

  test("hostile inputs return None, never throw") {
    assert(H264Codec.decode(Array.empty[Byte]).isEmpty)
    assert(H264Codec.decode("definitely not h264".getBytes).isEmpty)
    val valid = H264Codec.encode(gradient(32, 32))
    (1 until valid.length by 17).foreach { n =>
      H264Codec.decode(java.util.Arrays.copyOf(valid, n)) // clean None/partial
    }
    // flip CAVLC->CABAC in the PPS: must refuse (out of scope), not misread
    // (PPS starts after the second AVCC length prefix; entropy flag is in
    // the first payload byte after pps/sps ids '11' -> bit 2)
    val evil = valid.clone()
    // find PPS NAL (type 8) and set its first RBSP bit pattern so
    // entropy_coding_mode_flag flips: ue(0) ue(0) are '1''1', flag is bit 2
    val ppsAt = (0 until evil.length).find(i => (evil(i) & 0x1f) == 8 && (evil(i) & 0x80) == 0
      && i >= 4 && ((evil(i - 4) & 0xff) << 24 | (evil(i - 3) & 0xff) << 16
        | (evil(i - 2) & 0xff) << 8 | (evil(i - 1) & 0xff)) > 0).get
    evil(ppsAt + 1) = (evil(ppsAt + 1) | 0x20).toByte // set bit 2 of RBSP
    assert(H264Codec.decode(evil).isEmpty)
  }

  test("isH264 identifies SPS+IDR structure without a full decode") {
    val valid = H264Codec.encode(gradient(16, 16))
    assert(H264Codec.isH264(valid))
  }

  test("compressed Intra_16x16: flat content reconstructs EXACTLY") {
    val flat = MediaCodecs.Bmp(32, 32, Array.fill(32 * 32 * 3)(100.toByte))
    val enc = H264Codec.encode(flat, qp = 26)
    val back = H264Codec.decode(enc).get
    assert(back.rgb.toSeq == flat.rgb.toSeq, "flat image must survive losslessly")
    assert(enc.length < 100, s"flat frame should be tiny, got ${enc.length}")
  }

  test("compressed Intra_16x16: quality and rate track QP monotonically") {
    val img = gradient(64, 48)
    val pcmLen = H264Codec.encode(img).length
    var prevLen = Int.MaxValue
    var prevMad = -1.0
    for (qp <- Seq(10, 20, 26, 32, 40)) {
      val enc = H264Codec.encode(img, qp = qp)
      val back = H264Codec.decode(enc).get
      val mad = img.rgb.iterator.zip(back.rgb.iterator)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
        .sum.toDouble / img.rgb.length
      assert(enc.length < pcmLen, s"qp=$qp not smaller than I_PCM")
      assert(enc.length <= prevLen, s"qp=$qp rate not monotone")
      assert(mad >= prevMad - 0.5, s"qp=$qp error wildly non-monotone")
      assert(mad < 10.0, s"qp=$qp mad $mad out of band")
      prevLen = enc.length; prevMad = mad
    }
  }

  test("Intra_4x4: flat content reconstructs exactly at fine QP, tiny frames") {
    // only the frame's FIRST 4x4 block carries a DC residual (no
    // neighbors -> DC pred 128 vs flat 100); every later block predicts
    // from reconstruction and codes nothing, so the whole frame is
    // CBP-0 except one block. At fine QP that one DC survives exactly;
    // at qp=26 it lands 2 away and the rest follows it CONSISTENTLY
    // (constant error, zero variance — the prediction chain at work).
    val flat = MediaCodecs.Bmp(32, 32, Array.fill(32 * 32 * 3)(100.toByte))
    val enc10 = H264Codec.encode(flat, qp = 10, intra4x4 = true)
    assert(H264Codec.decode(enc10).get.rgb.toSeq == flat.rgb.toSeq,
      "flat image must survive exactly at qp=10")
    assert(enc10.length < 100, s"flat frame should be tiny, got ${enc10.length}")
    val back26 = H264Codec.decode(H264Codec.encode(flat, qp = 26, intra4x4 = true)).get
    val errs = flat.rgb.iterator.zip(back26.rgb.iterator)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.toSeq
    assert(errs.max <= 2 && errs.distinct.size == 1,
      s"qp=26 flat error must be small and uniform: max=${errs.max}")
  }

  test("Intra_4x4: decoder equals the encoder's reconstruction BIT-EXACTLY") {
    // the strongest no-external-decoder check available: the encoder
    // reconstructs each block with the same prediction/dequant kernels
    // the decoder uses — any disagreement in the 9 predictors, mode
    // signaling, CBP coding, nC tracking, or dequant shows up as a
    // plane diff here. Exercised over content that populates every CBP
    // group and crosses MB prediction chains.
    for ((img, qp) <- Seq((gradient(64, 48), 20), (noisy(48, 32, 3), 10),
        (gradient(32, 32), 40))) {
      val (bytes, yEnc, cbEnc, crEnc) =
        H264Codec.encodeI4ForTest(img, qp, (_, best, _) => best)
      val (_, yDec, cbDec, crDec) = H264Codec.decodeYuv(bytes).get
      assert(yDec.toSeq == yEnc.toSeq, s"luma reconstruction diverged (qp=$qp)")
      assert(cbDec.toSeq == cbEnc.toSeq && crDec.toSeq == crEnc.toSeq,
        s"chroma reconstruction diverged (qp=$qp)")
    }
  }

  test("Intra_4x4: all nine 8.3.1.2 predictors round-trip bit-exactly") {
    // force every block to cycle through its AVAILABLE mode list (so
    // V/H/DC/DDL/DDR/VR/HD/VL/HU all get used, including the rem <
    // predM and rem >= predM signaling branches and the top-right
    // substitution blocks 3/7/11/13/15), then demand decoder/encoder
    // reconstruction parity again
    val img = noisy(64, 48, 7)
    for (qp <- Seq(12, 28)) {
      val picks = scala.collection.mutable.Set.empty[Int]
      val (bytes, yEnc, cbEnc, crEnc) = H264Codec.encodeI4ForTest(img, qp,
        (bi, _, avail) => { val m = avail((bi * 5 + 3) % avail.length); picks += m; m })
      assert(picks == (0 to 8).toSet, s"fixture failed to exercise all modes: $picks")
      val (_, yDec, cbDec, crDec) = H264Codec.decodeYuv(bytes).get
      assert(yDec.toSeq == yEnc.toSeq, s"luma diverged (qp=$qp)")
      assert(cbDec.toSeq == cbEnc.toSeq && crDec.toSeq == crEnc.toSeq,
        s"chroma diverged (qp=$qp)")
    }
  }

  test("Intra_4x4: quality and rate track QP; directional content decodes sanely") {
    val img = gradient(64, 48)
    val pcmLen = H264Codec.encode(img).length
    var prevLen = Int.MaxValue
    var prevMad = -1.0
    for (qp <- Seq(10, 26, 40)) {
      val enc = H264Codec.encode(img, qp = qp, intra4x4 = true)
      val back = H264Codec.decode(enc).get
      val mad = img.rgb.iterator.zip(back.rgb.iterator)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
        .sum.toDouble / img.rgb.length
      assert(enc.length < pcmLen, s"qp=$qp not smaller than I_PCM")
      assert(enc.length <= prevLen, s"qp=$qp rate not monotone")
      assert(mad >= prevMad - 0.5, s"qp=$qp error wildly non-monotone")
      assert(mad < 10.0, s"qp=$qp mad $mad out of band")
      prevLen = enc.length; prevMad = mad
    }
    // a smooth directional ramp is Intra_4x4's home turf: prediction
    // residuals are near-zero, so the frame stays small and accurate
    val enc26 = H264Codec.encode(img, qp = 26, intra4x4 = true)
    assert(enc26.length * 4 < pcmLen, "directional content should compress well")
  }

  test("Intra_4x4 fuzz: mutated/truncated streams fail soft, never throw") {
    val rng = new scala.util.Random(21L)
    val base = H264Codec.encode(noisy(48, 32, 11), qp = 26, intra4x4 = true)
    for (_ <- 0 until 300) {
      val evil = base.clone()
      evil(rng.nextInt(evil.length)) = rng.nextInt(256).toByte
      H264Codec.decode(evil)
    }
    (1 until base.length by 7).foreach { n =>
      H264Codec.decode(java.util.Arrays.copyOf(base, n))
    }
  }

  test("compressed path: QP extremes, odd dims, multi-MB prediction chains") {
    for (qp <- Seq(0, 51)) {
      val img = gradient(48, 32)
      val back = H264Codec.decode(H264Codec.encode(img, qp = qp))
      assert(back.isDefined, s"qp=$qp failed")
    }
    val odd = H264Codec.decode(H264Codec.encode(gradient(30, 18), qp = 26)).get
    assert(odd.width == 30 && odd.height == 18)
    // 4x3 MBs of structured content: intra DC chains across MB borders
    val big = noisy(64, 48, 5)
    val back = H264Codec.decode(H264Codec.encode(big, qp = 10)).get
    assert(back.width == 64 && back.height == 48)
    // decode is deterministic
    val enc = H264Codec.encode(big, qp = 10)
    assert(H264Codec.decode(enc).get.rgb.toSeq == H264Codec.decode(enc).get.rgb.toSeq)
  }

  test("fuzz: mutated/truncated compressed streams fail soft, never throw") {
    val rng = new scala.util.Random(8L)
    val base = H264Codec.encode(noisy(48, 32, 9), qp = 26)
    // random single-byte mutations in the slice payload: decode must
    // return Some (mis-decoded pixels are fine) or None — never throw,
    // never hang (CAVLC VLC walks and level prefixes are bounded)
    for (_ <- 0 until 300) {
      val evil = base.clone()
      evil(rng.nextInt(evil.length)) = rng.nextInt(256).toByte
      H264Codec.decode(evil)
    }
    // truncations at every offset
    (1 until base.length by 7).foreach { n =>
      H264Codec.decode(java.util.Arrays.copyOf(base, n))
    }
    // pure noise payloads with a plausible AVCC frame
    for (trial <- 0 until 50) {
      val junk = Array.fill(200)(rng.nextInt(256).toByte)
      junk(0) = 0; junk(1) = 0; junk(2) = 0; junk(3) = (junk.length - 4).toByte
      H264Codec.decode(junk)
    }
  }

  test("end-to-end: MP4 avc1 samples decode to REAL frame features") {
    val frames = (0 until 3).map(i => noisy(32, 16, i))
    val samples = frames.map(f => H264Codec.encode(f))
    val mp4 = Mp4Demux.encodeMp4(samples, 32, 16)
    val info = Mp4Demux.demux(mp4).get
    assert(info.videoTrack.nSamples == 3)
    (0 until 3).foreach { i =>
      val s = Mp4Demux.sampleBytes(mp4, info.videoTrack, i)
      val dec = H264Codec.decode(s).get
      assert(dec.width == 32 && dec.height == 16)
      // the features Multimodal emits are the real decoded-pixel stats,
      // not the byte-hash stub
      val real = MediaCodecs.bmpFeatures(dec)
      val stub = Multimodal.decodeStub(s)
      assert(!real.sameElements(stub))
    }
  }

  test("interlace refuses loudly at the SPS layer (CATALOG adjudication)") {
    // hand-assembled baseline SPS, byte-for-byte what parseSps reads:
    // the control (frame_mbs_only_flag = 1) must DECODE when spliced
    // over a real stream's SPS, proving the only delta in the refusal
    // case is the one interlace bit — a PAFF/MBAFF stream can never
    // reach macroblock parsing, so progressive-only holds by
    // construction (permanent scope, CATALOG.md r14 adjudication)
    val img = gradient(32, 32)
    val payload = H264Codec.encode(img, qp = 26) // AVCC framing
    def nals(p: Array[Byte]): Seq[Array[Byte]] = {
      var o = 0
      val out = Seq.newBuilder[Array[Byte]]
      while (o < p.length) {
        val len = ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
          ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
        out += p.slice(o + 4, o + 4 + len)
        o += 4 + len
      }
      out.result()
    }
    def sps(frameMbsOnly: Int): Array[Byte] = {
      val bits = new scala.collection.mutable.ArrayBuffer[Int]
      def u(v: Int, n: Int): Unit =
        (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1))
      def ue(v: Int): Unit = {
        val cw = v + 1
        val nb = 32 - Integer.numberOfLeadingZeros(cw)
        u(0, nb - 1); u(cw, nb)
      }
      u(66, 8); u(0, 8); u(30, 8) // profile / constraints / level
      ue(0) // sps id
      ue(0) // log2_max_frame_num_minus4 (log2 = 4)
      ue(2) // pic_order_cnt_type
      ue(1) // max_num_ref_frames
      u(0, 1) // gaps_in_frame_num
      ue(1); ue(1) // 2x2 MBs = 32x32
      u(frameMbsOnly, 1)
      u(1, 1) // direct_8x8_inference
      u(0, 1) // frame_cropping
      u(0, 1) // vui
      u(1, 1) // rbsp stop bit
      while (bits.length % 8 != 0) bits += 0
      (Array(0x67.toByte) ++ bits.grouped(8)
        .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte)).toArray
    }
    def splice(spsNal: Array[Byte]): Array[Byte] = {
      val parts = nals(payload)
      (Seq(spsNal) ++ parts.tail).flatMap { n =>
        Seq(((n.length >> 24) & 0xff).toByte, ((n.length >> 16) & 0xff).toByte,
          ((n.length >> 8) & 0xff).toByte, (n.length & 0xff).toByte) ++ n
      }.toArray
    }
    val control = H264Codec.decode(splice(sps(frameMbsOnly = 1)))
    assert(control.isDefined, "control SPS must decode — splice harness broken")
    assert(java.util.Arrays.equals(control.get.rgb,
      H264Codec.decode(payload).get.rgb))
    assert(H264Codec.decode(splice(sps(frameMbsOnly = 0))).isEmpty,
      "interlaced SPS must refuse")
  }

  test("constrained_intra_pred: vacuous on all-intra, refuses on P slices") {
    // ignoring the flag would silently mis-decode intra MBs in P/B
    // slices (inter neighbors must become unavailable, 8.3.1-8.3.3);
    // it is VACUOUS in all-intra streams, which commonly set it — so
    // the same slice bytes must DECODE byte-equal under a flag-1 PPS
    // on the I stream and REFUSE on the P stream
    val imgs = (0 until 2).map { t =>
      val w = 48; val h = 32
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 7 + t * 11) % 251).toByte)
      MediaCodecs.Bmp(w, h, rgb)
    }
    val (flag0, iFlag1, gopIdr, gopP, pFlag1) =
      H264Codec.cipStreamsForTest(imgs, qp = 24)
    val a = H264Codec.decode(flag0); val b = H264Codec.decode(iFlag1)
    assert(a.isDefined && b.isDefined, "all-intra must decode either way")
    assert(java.util.Arrays.equals(a.get.rgb, b.get.rgb),
      "the flag is vacuous on all-intra content")
    // the SAME P slice decodes under its original PPS (control) and
    // refuses under the CIP PPS — after the IDR in both arms, so the
    // refusal is provably the bit, not missing-reference state
    val g = new H264Codec.GopDecoder
    assert(g.decodeAu(gopIdr).isDefined)
    assert(g.decodeAu(pFlag1).isEmpty, "CIP=1 P slice must refuse")
    val g2 = new H264Codec.GopDecoder
    assert(g2.decodeAu(gopIdr).isDefined)
    assert(g2.decodeAu(gopP).isDefined, "control P slice must decode")
  }
}
