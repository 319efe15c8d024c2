package graft

import graft.pipeline.Mp4Demux

/** ISO-BMFF demuxer: mux→demux round-trips pin every structural field
  * and the resolved per-sample byte ranges against the payloads that
  * went in; layout edges (multi-chunk stsc, trailing short chunk) and
  * hostile inputs are covered byte-level, the MrldaSequenceFile
  * discipline for wire formats with no independent in-container
  * witness. */
class Mp4DemuxSpec extends SparkSpec {

  private def mkSamples(n: Int, seed: Int): Seq[Array[Byte]] =
    (0 until n).map { i =>
      Array.tabulate(5 + (seed + i) % 9)(k => ((seed * 31 + i * 7 + k) % 251).toByte)
    }

  test("mux→demux round-trips structure and exact sample byte ranges") {
    val samples = mkSamples(8, seed = 3)
    val bytes = Mp4Demux.encodeMp4(samples, width = 64, height = 48,
      codec = "avc1", handler = "vide", timescale = 1000, samplesPerChunk = 3)
    assert(Mp4Demux.isMp4(bytes))
    val info = Mp4Demux.demux(bytes).get
    assert(info.majorBrand == "isom")
    assert(info.timescale == 1000 && info.duration == 8)
    assert(info.tracks.length == 1)
    val t = info.tracks.head
    assert(t.trackId == 1 && t.handler == "vide" && t.codec == "avc1")
    assert(t.width == 64 && t.height == 48)
    assert(t.timescale == 1000 && t.duration == 8)
    assert(t.nSamples == 8)
    // every resolved range must point at the exact payload bytes
    for (i <- samples.indices) {
      assert(Mp4Demux.sampleBytes(bytes, t, i).toSeq == samples(i).toSeq, s"sample $i")
    }
    assert(t.totalSampleBytes == samples.map(_.length).sum)
  }

  test("multi-chunk layout: 8 samples at 3/chunk = 3 chunks, short tail") {
    val samples = mkSamples(8, seed = 11)
    val bytes = Mp4Demux.encodeMp4(samples, 32, 32, samplesPerChunk = 3)
    // chunk offsets are strictly increasing and the 3rd chunk holds 2
    val t = Mp4Demux.demux(bytes).get.tracks.head
    val offs = t.sampleRanges.map(_._1)
    assert(offs == offs.sorted)
    // contiguity within a chunk: sample i+1 starts where i ends unless a
    // chunk boundary intervenes (every 3rd sample here)
    for (i <- 0 until 7 if (i + 1) % 3 != 0) {
      assert(offs(i + 1) == offs(i) + t.sampleRanges(i)._2, s"gap at $i")
    }
  }

  test("audio-handler track carries its fourcc and no dimensions") {
    val bytes = Mp4Demux.encodeMp4(mkSamples(4, 5), 0, 0,
      codec = "mp4a", handler = "soun", samplesPerChunk = 2)
    val t = Mp4Demux.demux(bytes).get.tracks.head
    assert(t.handler == "soun" && t.codec == "mp4a")
    assert(t.width == 0 && t.height == 0 && t.nSamples == 4)
  }

  test("hostile inputs return None, never throw") {
    assert(Mp4Demux.demux(Array.empty[Byte]).isEmpty)
    assert(Mp4Demux.demux("nowhere near an mp4".getBytes).isEmpty)
    val valid = Mp4Demux.encodeMp4(mkSamples(4, 7), 16, 16)
    (1 until valid.length by 13).foreach { n =>
      Mp4Demux.demux(java.util.Arrays.copyOf(valid, n)) // clean None/partial
    }
    // corrupt a box size to something absurd: must refuse cleanly
    val broken = valid.clone()
    broken(0) = 0x7f.toByte
    assert(Mp4Demux.demux(broken).isEmpty)
  }

  test("corrupt-but-parseable sample tables reject at demux (r7 ADVICE)") {
    val valid = Mp4Demux.encodeMp4(mkSamples(4, 7), 16, 16)
    // find the stco box and point its first chunk offset past EOF: the
    // box tree still parses, but the resolved (off, len) ranges escape
    // the payload — demux must return None, not leave a landmine for
    // sampleBytes to throw in an executor
    def findBox(typ: String): Int = {
      val pat = typ.getBytes("ISO-8859-1")
      (0 until valid.length - 4).find(i => valid.slice(i, i + 4).sameElements(pat)).get
    }
    val stco = findBox("stco")
    val evil = valid.clone()
    // first entry at stco+4(ver/flags)+4(count): write a huge offset
    val o = stco + 4 + 4 + 4
    evil(o) = 0x7f.toByte; evil(o + 1) = -1; evil(o + 2) = -1; evil(o + 3) = -1
    assert(Mp4Demux.demux(evil).isEmpty)
    // hostile stsz too: negative sample size
    val stsz = findBox("stsz")
    val evil2 = valid.clone()
    val so = stsz + 4 + 4 + 4 + 4 // ver/flags, uniform, count, then sizes
    evil2(so) = -1
    assert(Mp4Demux.demux(evil2).isEmpty)
    // and Multimodal falls back to the byte-slice stub instead of failing
    import spark.implicits._
    val media = Seq(graft.pipeline.MediaRow(9L, "video_mp4", evil, 16, 16, 0)).toDS()
    val out = graft.pipeline.Multimodal.sampleFrames(media, 2).collect()
    assert(out.length == 2)
  }

  test("videoTrack prefers the first 'vide' track over a sound-first head") {
    // hand-build a two-track file by splicing a second trak into moov is
    // overkill — instead demux a sound-only file and check the fallback,
    // then check the selector on a synthetic Mp4Info
    val soun = Mp4Demux.demux(Mp4Demux.encodeMp4(mkSamples(3, 1), 0, 0,
      codec = "mp4a", handler = "soun")).get
    assert(soun.videoTrack.handler == "soun") // fallback: head
    val t1 = soun.tracks.head
    val vide = t1.copy(trackId = 2, handler = "vide", width = 64, height = 48)
    val multi = soun.copy(tracks = Seq(t1, vide))
    assert(multi.videoTrack.handler == "vide" && multi.videoTrack.width == 64)
  }

  test("Multimodal.sampleFrames slices real MP4 sample payloads") {
    val samples = mkSamples(9, seed = 2)
    val bytes = Mp4Demux.encodeMp4(samples, 32, 24, samplesPerChunk = 4)
    import spark.implicits._
    val media = Seq(graft.pipeline.MediaRow(1L, "video_mp4", bytes, 32, 24, 0)).toDS()
    val out = graft.pipeline.Multimodal.sampleFrames(media, 3)
      .orderBy($"frame").collect()
    assert(out.length == 3)
    // frame i samples index i*3 — n_bytes must equal that sample's length
    for (i <- 0 until 3) {
      assert(out(i).getInt(2) == samples(i * 3).length, s"frame $i")
    }
  }

  test("ctts: composition offsets round-trip; presentation ranks invert decode order") {
    import graft.pipeline.{Mp4Demux, H264Codec, MediaCodecs}
    // a real IbbP GOP: decode order [0,3,1,2,5,4] for 6 display frames
    val f0 = {
      val rgb = Array.tabulate[Byte](48 * 32 * 3)(i => ((i * 31) % 251).toByte)
      MediaCodecs.Bmp(48, 32, rgb)
    }
    val frames = (0 until 6).map(_ => f0)
    val (payloads, display) = H264Codec.encodeGopB(frames, qp = 26, bFrames = 2)
    assert(display == Seq(0, 3, 1, 2, 5, 4))
    val n = payloads.length
    val delay = (0 until n).map(k => k - display(k)).max
    val cts = (0 until n).map(k => display(k) + delay - k)
    val mp4 = Mp4Demux.encodeMp4(payloads, 48, 32, ctsOffsets = Some(cts))
    val t = Mp4Demux.demux(mp4).get.videoTrack
    assert(t.ctsOffsets == cts, "ctts round-trip")
    assert(t.presentationIndex == display,
      "presentation ranks must recover the display mapping")
    // no ctts -> identity
    val plain = Mp4Demux.demux(Mp4Demux.encodeMp4(payloads, 48, 32)).get.videoTrack
    assert(plain.presentationIndex == (0 until n))
    // a ctts table disagreeing with the sample count is corrupt: the
    // demux must reject the file rather than mislabel frames. Patch the
    // ctts entry count down by one (first run has count >= 2 only if
    // offsets repeat; patch a run count instead: set entry_count field
    // to 1 so expansion can't cover every sample)
    val idx = {
      var i = -1
      var o = 0
      while (o + 8 <= mp4.length && i < 0) {
        if (new String(mp4, o, 4, "ISO-8859-1") == "ctts") i = o - 4
        o += 1
      }
      i
    }
    assert(idx >= 0, "ctts box present")
    val bad = mp4.clone()
    // entry_count lives 8 bytes past the box header start (size+type+ver/flags)
    bad(idx + 12) = 0; bad(idx + 13) = 0; bad(idx + 14) = 0; bad(idx + 15) = 1
    assert(Mp4Demux.demux(bad).isEmpty, "short ctts must reject the file")
  }
}
