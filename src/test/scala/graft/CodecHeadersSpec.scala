package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** VP8/VP9/AV1 frame-header layer (r15): write→parse round trips pin
  * every field against the public-spec layouts (RFC 6386 §9.1, VP9
  * §6.2, AV1 §5.2-5.9), keyframe/interframe discrimination, dims, OBU
  * walking with leb128 sizes — plus hostile inputs (truncation, bad
  * sync/start codes, forbidden bits) that must refuse, never
  * misparse. Pixel decode of all three stays refused per the CATALOG
  * adjudication; this layer is pure bit structure. */
class CodecHeadersSpec extends AnyFunSuite {

  private val tail = Array.tabulate(37)(i => ((i * 31 + 7) % 251).toByte)

  test("VP8: keyframe tag + start code + 14-bit dims round-trip") {
    val b = CodecHeaders.writeVp8KeyHeader(641, 353, version = 2,
      firstPartSize = 1234, tail)
    val f = CodecHeaders.parseVp8(b).get
    assert(f.keyframe && f.showFrame)
    assert(f.version == 2 && f.firstPartSize == 1234)
    assert(f.width == 641 && f.height == 353)
    assert(f.widthScale == 0 && f.heightScale == 0)
    val inter = CodecHeaders.parseVp8(
      CodecHeaders.writeVp8InterHeader(version = 0, firstPartSize = 9, tail)).get
    assert(!inter.keyframe && inter.firstPartSize == 9)
    // corrupt start code refuses
    val bad = b.clone(); bad(4) = 0x55
    assert(CodecHeaders.parseVp8(bad).isEmpty)
    // version > 3 refuses
    val badV = CodecHeaders.writeVp8KeyHeader(64, 64, 0, 0, tail).clone()
    badV(0) = (badV(0) | 0x0e).toByte // version bits 1-3 = 7
    assert(CodecHeaders.parseVp8(badV).isEmpty)
    assert(CodecHeaders.parseVp8(b.take(2)).isEmpty)
    assert(CodecHeaders.parseVp8(b.take(8)).isEmpty) // truncated dims
  }

  test("VP9: profile-0 keyframe header round-trips marker, sync, dims") {
    val b = CodecHeaders.writeVp9KeyHeader(1920, 1080, tail)
    val f = CodecHeaders.parseVp9(b).get
    assert(f.keyframe && f.showFrame && !f.showExisting)
    assert(f.profile == 0)
    assert(f.width == 1920 && f.height == 1080)
    val inter = CodecHeaders.parseVp9(CodecHeaders.writeVp9InterHeader(tail)).get
    assert(!inter.keyframe && inter.showFrame && inter.width == 0)
    // frame_marker != 2 refuses
    val bad = b.clone(); bad(0) = (bad(0) ^ 0x80).toByte
    assert(CodecHeaders.parseVp9(bad).isEmpty)
    // sync code corrupt refuses
    val badSync = b.clone(); badSync(1) = (badSync(1) ^ 0x40).toByte
    assert(CodecHeaders.parseVp9(badSync).isEmpty)
    assert(CodecHeaders.parseVp9(b.take(4)).isEmpty) // truncated
  }

  test("AV1: OBU walk + sequence-header dims + frame_type round-trip") {
    val b = CodecHeaders.writeAv1KeyUnit(1280, 720, tail)
    val f = CodecHeaders.parseAv1(b).get
    assert(f.obus.map(_.obuType) == Seq(CodecHeaders.ObuTemporalDelimiter,
      CodecHeaders.ObuSequenceHeader, CodecHeaders.ObuFrame))
    assert(f.profile == 0)
    assert(f.width == 1280 && f.height == 720)
    assert(f.keyframe && f.showFrame)
    val inter = CodecHeaders.parseAv1(CodecHeaders.writeAv1InterUnit(tail)).get
    assert(!inter.keyframe && inter.showFrame)
    assert(inter.obus.map(_.obuType) == Seq(CodecHeaders.ObuTemporalDelimiter,
      CodecHeaders.ObuFrame))
    // forbidden bit refuses
    val bad = b.clone(); bad(0) = (bad(0) | 0x80).toByte
    assert(CodecHeaders.parseAv1(bad).isEmpty)
    // an OBU whose leb128 size escapes the payload refuses
    assert(CodecHeaders.parseAv1(b.dropRight(5)).isEmpty)
    // leb128 sizes > 127 exercise the continuation byte
    val big = CodecHeaders.writeAv1KeyUnit(640, 360,
      Array.tabulate(300)(i => (i % 251).toByte))
    val fb = CodecHeaders.parseAv1(big).get
    assert(fb.width == 640 && fb.obus.last.size > 300)
    // initial_display_delay_present = 1 gates PER-OP delay fields the
    // parser must consume — skipping them shifted every later bit and
    // silently misparsed the dims (r15 review fix)
    val dd = CodecHeaders.parseAv1(
      CodecHeaders.writeAv1KeyUnit(1920, 1080, tail, dispDelay = true)).get
    assert(dd.width == 1920 && dd.height == 1080 && dd.keyframe)
  }

  test("Opus: OpusHead + TOC round-trip; durations per the config table") {
    val h = CodecHeaders.parseOpusHead(
      CodecHeaders.writeOpusHead(2, preSkip = 312, inputRate = 48000L)).get
    assert(h.version == 1 && h.channels == 2 && h.preSkip == 312)
    assert(h.inputSampleRate == 48000L && h.mappingFamily == 0)
    // wrong magic / zero channels refuse
    assert(CodecHeaders.parseOpusHead("OpusTags".getBytes ++
      Array.fill(11)(1.toByte)).isEmpty)
    val zc = CodecHeaders.writeOpusHead(1, 0, 48000L); zc(9) = 0
    assert(CodecHeaders.parseOpusHead(zc).isEmpty)
    // TOC: config 1 = SILK NB 20 ms single frame
    val t1 = CodecHeaders.parseOpusToc(
      CodecHeaders.writeOpusPacket(1, stereo = false, 1, Array(9, 9))).get
    assert(!t1.stereo && t1.framesInPacket == 1 && t1.frameDurationUs == 20000)
    // config 17 = CELT NB 5 ms, code-3 packet with 6 frames = 30 ms
    val t2 = CodecHeaders.parseOpusToc(
      CodecHeaders.writeOpusPacket(17, stereo = true, 6, Array.empty)).get
    assert(t2.stereo && t2.framesInPacket == 6 && t2.packetDurationUs == 30000)
    // hybrid band: config 15 = FB 20 ms
    assert(CodecHeaders.parseOpusToc(Array((15 << 3).toByte)).get
      .frameDurationUs == 20000)
    // RFC cap: 8 x 20 ms = 160 ms > 120 ms refuses
    assert(CodecHeaders.parseOpusToc(
      CodecHeaders.writeOpusPacket(1, stereo = false, 8, Array.empty)).isEmpty)
  }

  test("Vorbis: id header through the Xiph-laced CodecPrivate") {
    val id = CodecHeaders.writeVorbisId(2, 44100L)
    val priv = CodecHeaders.writeVorbisPrivate(id,
      Array.tabulate(300)(i => (i % 251).toByte), // comment > 255: 255-run
      Array.tabulate(40)(i => (i * 3).toByte))
    val v = CodecHeaders.vorbisIdFromPrivate(priv).flatMap(CodecHeaders.parseVorbisId).get
    assert(v.channels == 2 && v.sampleRate == 44100L)
    assert(v.blocksize0 == 256 && v.blocksize1 == 2048)
    // framing bit / version refuse
    val noFrame = id.clone(); noFrame(29) = 0
    assert(CodecHeaders.parseVorbisId(noFrame).isEmpty)
    val badVer = id.clone(); badVer(7) = 1
    assert(CodecHeaders.parseVorbisId(badVer).isEmpty)
  }

  test("audioFacts: bitstream channels/rate from WebM CodecPrivate") {
    import graft.pipeline.WebmDemux
    val opusPackets = (0 until 5).map(i =>
      CodecHeaders.writeOpusPacket(1, stereo = true, 1,
        Array.tabulate(12)(k => ((i * 7 + k) % 251).toByte)))
    val vframes = (0 until 4).map(i => Array.tabulate(10)(k => ((i + k) % 97).toByte))
    val bytes = WebmDemux.encodeWebm(vframes, 64, 48,
      audio = Some(("A_OPUS", 48000.0, 2, opusPackets)),
      audioCodecPrivate = CodecHeaders.writeOpusHead(2, 312, 48000L))
    val info = WebmDemux.demux(bytes).get
    val at = info.tracks.find(_.trackType == 2).get
    assert(CodecHeaders.audioFacts(at.codecId, at.codecPrivate)
      .contains((2, 48000L)))
    // per-packet TOC durations over the demuxed audio frames
    val durs = (0 until at.nFrames).map(i =>
      CodecHeaders.parseOpusToc(WebmDemux.frameBytes(bytes, at, i)).get
        .packetDurationUs)
    assert(durs.forall(_ == 20000L) && at.nFrames == 5)
    // a track without CodecPrivate yields no facts, never throws
    assert(CodecHeaders.audioFacts("A_OPUS", Array.emptyByteArray).isEmpty)
  }

  test("frameFacts dispatches on the WebM CodecID") {
    assert(CodecHeaders.frameFacts("V_VP8",
      CodecHeaders.writeVp8KeyHeader(320, 240, 0, 1, tail)).contains((true, 320, 240)))
    assert(CodecHeaders.frameFacts("V_VP9",
      CodecHeaders.writeVp9KeyHeader(320, 240, tail)).contains((true, 320, 240)))
    assert(CodecHeaders.frameFacts("V_AV1",
      CodecHeaders.writeAv1KeyUnit(320, 240, tail)).contains((true, 320, 240)))
    assert(CodecHeaders.frameFacts("V_VP9",
      CodecHeaders.writeVp9InterHeader(tail)).contains((false, 0, 0)))
    assert(CodecHeaders.frameFacts("V_MPEG4/ISO/AVC", tail).isEmpty)
    assert(CodecHeaders.frameFacts("V_VP9", "garbage".getBytes).isEmpty)
  }

  test("headers survive the WebM container round trip per frame") {
    // mux VP9 frames (key every 3rd) and read the bitstream truth back
    // through the demuxed frame ranges — container flags agree with
    // the bitstream because the muxer was told the same schedule
    val frames = (0 until 9).map { i =>
      if (i % 3 == 0) CodecHeaders.writeVp9KeyHeader(160 + 16 * i, 90, tail)
      else CodecHeaders.writeVp9InterHeader(tail :+ i.toByte)
    }
    val webm = WebmDemux.encodeWebm(frames, 160, 90, codecId = "V_VP9",
      laceSize = 1, blocksPerCluster = 3, keyframeEvery = 3)
    val t = WebmDemux.demux(webm).get.videoTrack
    (0 until t.nFrames).foreach { i =>
      val facts = CodecHeaders.frameFacts("V_VP9",
        WebmDemux.frameBytes(webm, t, i)).get
      assert(facts._1 == (i % 3 == 0), s"frame $i keyframe")
      assert(facts._1 == t.frames(i).keyframe, s"frame $i container flag parity")
      if (facts._1) assert(facts._2 == 160 + 16 * i)
    }
  }
}
