package graft

import graft.pipeline.WebmDemux

/** EBML/Matroska demuxer: mux→demux round-trips pin every structural
  * field and the resolved per-frame byte ranges against the payloads
  * that went in — across all three lacing modes, SimpleBlock AND
  * BlockGroup forms, sized AND unknown-size (streaming-shaped)
  * Segment/Clusters — plus hostile inputs, the MrldaSequenceFile
  * discipline for wire formats with no independent in-container
  * witness. */
class WebmDemuxSpec extends SparkSpec {

  private def mkFrames(n: Int, seed: Int): Seq[Array[Byte]] =
    (0 until n).map { i =>
      Array.tabulate(6 + (seed + 3 * i) % 11)(k => ((seed * 31 + i * 7 + k) % 251).toByte)
    }

  private def assertFramesExact(bytes: Array[Byte],
      t: WebmDemux.Track, frames: Seq[Array[Byte]]): Unit = {
    assert(t.nFrames == frames.length)
    for (i <- frames.indices)
      assert(WebmDemux.frameBytes(bytes, t, i).toSeq == frames(i).toSeq, s"frame $i")
    assert(t.totalFrameBytes == frames.map(_.length.toLong).sum)
  }

  test("mux→demux round-trips structure and exact frame byte ranges") {
    val frames = mkFrames(10, seed = 3)
    val bytes = WebmDemux.encodeWebm(frames, width = 320, height = 240,
      codecId = "V_VP9", laceSize = 1, blocksPerCluster = 4, ticksPerFrame = 40)
    assert(WebmDemux.isWebm(bytes))
    val info = WebmDemux.demux(bytes).get
    assert(info.docType == "webm")
    assert(info.timestampScaleNs == 1000000L)
    assert(info.durationTicks == 400.0)
    assert(info.tracks.length == 1)
    val t = info.videoTrack
    assert(t.trackNumber == 1 && t.trackType == 1 && t.codecId == "V_VP9")
    assert(t.width == 320 && t.height == 240)
    assertFramesExact(bytes, t, frames)
    // block timestamps: frame i at i*40 ticks (laceSize 1 = one frame
    // per block), resolved through cluster-ts + relative-ts
    assert(t.frames.map(_.timestampTicks) == (0 until 10).map(_ * 40L))
    // keyframe = first block of each of the 3 clusters (4/4/2 split)
    assert(t.frames.map(_.keyframe) ==
      (0 until 10).map(i => i % 4 == 0))
    assert(t.keyframeCount == 3)
  }

  test("all three lacing modes resolve exact per-frame ranges") {
    // laceSize 3 over 18 frames = 6 blocks cycling Xiph/fixed/EBML
    // twice; unequal sizes inside a block downgrade fixed→EBML, so
    // also run an equal-size set that keeps true fixed lacing
    val uneven = mkFrames(18, seed = 7)
    val b1 = WebmDemux.encodeWebm(uneven, 64, 48, laceSize = 3,
      blocksPerCluster = 2)
    assertFramesExact(b1, WebmDemux.demux(b1).get.videoTrack, uneven)

    val even = (0 until 18).map(i =>
      Array.tabulate(9)(k => ((i * 13 + k * 5) % 251).toByte))
    val b2 = WebmDemux.encodeWebm(even, 64, 48, laceSize = 3,
      blocksPerCluster = 2)
    assertFramesExact(b2, WebmDemux.demux(b2).get.videoTrack, even)

    // Xiph 255-run edge: a laced frame longer than 255 bytes needs the
    // multi-byte size run
    val big = Seq(Array.tabulate(600)(i => (i % 251).toByte),
      Array.tabulate(300)(i => ((i * 3) % 251).toByte),
      Array.tabulate(17)(i => ((i * 11) % 251).toByte))
    val b3 = WebmDemux.encodeWebm(big, 64, 48, laceSize = 3)
    assertFramesExact(b3, WebmDemux.demux(b3).get.videoTrack, big)

    // laced frames share their block's timestamp
    val t1 = WebmDemux.demux(b1).get.videoTrack
    assert(t1.frames.map(_.timestampTicks).distinct.length == 6)
    assert(t1.frames.grouped(3).forall(g => g.map(_.timestampTicks).distinct.length == 1))
  }

  test("unknown-size segment and clusters (streaming shape) parse identically") {
    val frames = mkFrames(9, seed = 5)
    val sized = WebmDemux.encodeWebm(frames, 96, 64, laceSize = 1,
      blocksPerCluster = 3)
    val streaming = WebmDemux.encodeWebm(frames, 96, 64, laceSize = 1,
      blocksPerCluster = 3, unknownSizeClusters = true)
    assert(!java.util.Arrays.equals(sized, streaming)) // distinct wire forms
    val a = WebmDemux.demux(sized).get
    val b = WebmDemux.demux(streaming).get
    assert(a.tracks.map(t => (t.trackNumber, t.codecId, t.nFrames)) ==
      b.tracks.map(t => (t.trackNumber, t.codecId, t.nFrames)))
    assertFramesExact(streaming, b.videoTrack, frames)
    assert(a.videoTrack.frames.map(f => (f.timestampTicks, f.keyframe)) ==
      b.videoTrack.frames.map(f => (f.timestampTicks, f.keyframe)))
  }

  test("BlockGroup form: keyframe = ReferenceBlock absence") {
    val frames = mkFrames(8, seed = 9)
    val bytes = WebmDemux.encodeWebm(frames, 64, 48, laceSize = 1,
      blocksPerCluster = 4, useBlockGroups = true)
    val t = WebmDemux.demux(bytes).get.videoTrack
    assertFramesExact(bytes, t, frames)
    // 2 clusters of 4: keyframes at 0 and 4 — conveyed ONLY by which
    // groups carry a ReferenceBlock (the Block flag byte has no kf bit)
    assert(t.frames.map(_.keyframe) == Seq(true, false, false, false,
      true, false, false, false))
  }

  test("audio track: metadata, interleaved blocks, videoTrack selection") {
    val v = mkFrames(6, seed = 2)
    val a = mkFrames(3, seed = 8)
    val bytes = WebmDemux.encodeWebm(v, 128, 72, codecId = "V_AV1",
      laceSize = 1, blocksPerCluster = 2,
      audio = Some(("A_OPUS", 48000.0, 2, a)))
    val info = WebmDemux.demux(bytes).get
    assert(info.tracks.length == 2)
    val at = info.tracks.find(_.trackType == 2).get
    assert(at.codecId == "A_OPUS" && at.channels == 2)
    assert(math.abs(at.samplingHz - 48000.0) < 1e-6)
    assertFramesExact(bytes, at, a)
    // videoTrack picks the video track even with audio present
    assert(info.videoTrack.codecId == "V_AV1")
    assertFramesExact(bytes, info.videoTrack, v)
  }

  test("plain-VINT positions accept the all-ones pattern (track 127 = 0xFF)") {
    // the all-ones-means-unknown mapping belongs to element DATA sizes
    // ONLY: a block track number of 127 is legally the single byte
    // 0xFF, and an EBML first lace size of 127 likewise — real muxers
    // emit these minimal forms (r15 review fix: readSize's unknown
    // mapping wrongly rejected them, dropping the whole file to the
    // feature stub)
    val frames = Seq(
      Array.tabulate(9)(i => i.toByte), Array.tabulate(12)(i => (i + 1).toByte),
      // block 1 gets EBML lacing (mode cycle): first lace size 127
      Array.tabulate(127)(i => (i * 3).toByte), Array.tabulate(11)(i => (i + 5).toByte),
      Array.tabulate(10)(i => (i + 7).toByte), Array.tabulate(10)(i => (i + 9).toByte))
    val bytes = WebmDemux.encodeWebm(frames, 64, 48, laceSize = 2,
      blocksPerCluster = 3, trackNumber = 127)
    val info = WebmDemux.demux(bytes).get
    val t = info.videoTrack
    assert(t.trackNumber == 127)
    assertFramesExact(bytes, t, frames)
  }

  test("unknown-size cluster inside a SIZED segment stops at the segment end") {
    // live-remuxed shape: the segment is sized (seekable file) but a
    // cluster kept its streaming unknown size; trailing non-Matroska
    // bytes after the segment must not derail the cluster walk (r15
    // review fix: the terminator scan previously ran to payload end)
    val frames = mkFrames(6, seed = 8)
    val good = WebmDemux.encodeWebm(frames, 64, 48, blocksPerCluster = 3,
      unknownSizeClusters = true, sizedSegment = true)
    val trailing = good ++ Array.tabulate(37)(i => ((i * 89 + 7) % 256).toByte)
    val info = WebmDemux.demux(trailing).get
    assertFramesExact(trailing, info.videoTrack, frames)
    // junk that PARSES as a plausible element header must be tolerated
    // too: 0xA3 0x90 reads as id SimpleBlock + size 16 and only fails
    // the BOUNDS check; 0x81 0xFF reads as a 1-byte id + unknown size
    // on a non-segment — both previously dropped the whole valid file
    for (junk <- Seq(Array(0xA3, 0x90).map(_.toByte),
        Array(0x81, 0xFF).map(_.toByte),
        Array(0x95, 0x40, 0x7f, 0x01).map(_.toByte),
        // junk wearing the SEGMENT magic: enters the child walk, dies
        // there, and must roll back rather than refuse or mix rows
        Array(0x18, 0x53, 0x80, 0x67, 0x81, 0x00).map(_.toByte),
        // a truncated SECOND segment (real bytes, cut mid-cluster):
        // the completed first segment's rows survive, none of the
        // partial segment's leak in
        good.slice(good.indexOfSlice(Seq(0x18, 0x53, 0x80, 0x67).map(_.toByte)),
          good.length - 7))) {
      val p2 = good ++ junk
      val i2 = WebmDemux.demux(p2).get
      assertFramesExact(p2, i2.videoTrack, frames)
      assert(i2.tracks.length == 1, "no partial-segment tracks may leak")
    }
  }

  test("hostile dims and channels refuse instead of truncating") {
    val good = WebmDemux.encodeWebm(mkFrames(3, seed = 2), 64, 48)
    // splice an oversized PixelWidth: find the 1-byte width element
    // b0 81 40 (id, size 1, value 64) and widen it to 5 bytes 2^32
    val idx = good.indexOfSlice(Seq(0xb0, 0x81, 0x40).map(_.toByte))
    assert(idx > 0, "fixture must carry the 1-byte width form")
    val patched = good.take(idx) ++
      Array(0xb0, 0x85, 0x01, 0x00, 0x00, 0x00, 0x00).map(_.toByte) ++
      good.drop(idx + 3)
    // the enclosing element sizes no longer add up, or the dim check
    // fires first — either way: None, never a truncated/negative dim
    assert(WebmDemux.demux(patched).isEmpty)
  }

  test("hostile inputs: refuse, never allocate from claimed sizes") {
    val good = WebmDemux.encodeWebm(mkFrames(5, seed = 4), 64, 48)
    // truncations at every prefix length must demux to None, not throw
    for (cut <- Seq(3, 5, 20, 40, good.length / 2, good.length - 1)) {
      val p = java.util.Arrays.copyOf(good, cut)
      assert(WebmDemux.demux(p).isEmpty, s"cut $cut")
    }
    // zero lead byte = invalid VINT
    val zeroed = good.clone(); zeroed(4) = 0
    assert(WebmDemux.demux(zeroed).isEmpty)
    // a crafted huge element size must not allocate — flip the segment
    // size bytes to a giant value and expect clean refusal
    val inflated = good.clone()
    // find the segment id (0x18538067) and stomp its size vint
    val segAt = (0 until inflated.length - 4).find(i =>
      (inflated(i) & 0xff) == 0x18 && (inflated(i + 1) & 0xff) == 0x53 &&
        (inflated(i + 2) & 0xff) == 0x80 && (inflated(i + 3) & 0xff) == 0x67).get
    inflated(segAt + 4) = 0x41.toByte // 2-byte vint claiming ~0x1xx bytes more
    inflated(segAt + 5) = 0xff.toByte
    assert(WebmDemux.demux(inflated).isEmpty)
    // not-webm payloads
    assert(WebmDemux.demux("plain text".getBytes("UTF-8")).isEmpty)
    assert(WebmDemux.demux(Array.empty[Byte]).isEmpty)
  }

  test("container-level remux invariance: same frames, different layout") {
    // the demuxed STREAM (per-frame bytes in order) must not depend on
    // cluster split, lacing choice, or sized-vs-streaming form — the
    // property Multimodal's stream-level features rely on
    val frames = mkFrames(12, seed = 6)
    // content keyframes (keyframeEvery) so the flag is a stream
    // property, as in real files where remuxers preserve codec
    // keyframes; block boundaries at laceSize 2 always align with them
    val layouts = Seq(
      WebmDemux.encodeWebm(frames, 64, 48, laceSize = 2, blocksPerCluster = 3,
        keyframeEvery = 4),
      WebmDemux.encodeWebm(frames, 64, 48, laceSize = 2, blocksPerCluster = 2,
        keyframeEvery = 4),
      WebmDemux.encodeWebm(frames, 64, 48, laceSize = 2, blocksPerCluster = 4,
        unknownSizeClusters = true, keyframeEvery = 4),
      WebmDemux.encodeWebm(frames, 64, 48, laceSize = 2, blocksPerCluster = 2,
        useBlockGroups = true, keyframeEvery = 4))
    val streams = layouts.map { b =>
      val t = WebmDemux.demux(b).get.videoTrack
      (0 until t.nFrames).map(i => WebmDemux.frameBytes(b, t, i).toSeq)
    }
    assert(streams.distinct.length == 1)
    // and the Multimodal feature vector inherits the invariance: same
    // stream → same features regardless of container layout, while the
    // whole-file stub differs across layouts (the property webmFeatures
    // exists to provide)
    import graft.pipeline.Multimodal
    val feats = layouts.map(b => Multimodal.decode(b).toSeq)
    assert(feats.distinct.length == 1)
    assert(layouts.map(b => Multimodal.decodeStub(b).toSeq).distinct.length > 1)
    // different frame CONTENT changes the vector (it hashes the stream)
    val other = WebmDemux.encodeWebm(mkFrames(12, seed = 7), 64, 48)
    assert(Multimodal.decode(other).toSeq != feats.head)
    // lacing is pure layout for the frame-byte stream too: the hash
    // part and the per-frame structural stats stay invariant across
    // laceSize; only the keyframe RATIO may move (Matroska flags are
    // per block, so laced followers share the leader's flag)
    val laced = WebmDemux.encodeWebm(frames, 64, 48, laceSize = 3,
      blocksPerCluster = 2, keyframeEvery = 4)
    val lf = Multimodal.decode(laced).toSeq
    assert(lf.patch(3, Nil, 1) == feats.head.patch(3, Nil, 1))
    // …and with REAL codec frames the keyframe ratio comes from the
    // BITSTREAM (CodecHeaders), restoring full invariance even across
    // lacing: laceSize 3 + keyframeEvery 3 flags EVERY container block
    // a keyframe, but the bitstream says 1/3 in both layouts
    import graft.pipeline.CodecHeaders
    val vp9 = (0 until 9).map { i =>
      if (i % 3 == 0) CodecHeaders.writeVp9KeyHeader(160, 90, Array.tabulate(21)(k => ((i * 7 + k) % 251).toByte))
      else CodecHeaders.writeVp9InterHeader(Array.tabulate(17)(k => ((i * 11 + k) % 251).toByte))
    }
    val v1 = WebmDemux.encodeWebm(vp9, 160, 90, codecId = "V_VP9",
      laceSize = 1, blocksPerCluster = 3, keyframeEvery = 3)
    val v3 = WebmDemux.encodeWebm(vp9, 160, 90, codecId = "V_VP9",
      laceSize = 3, blocksPerCluster = 2, keyframeEvery = 3)
    val fv1 = Multimodal.decode(v1).toSeq
    assert(fv1 == Multimodal.decode(v3).toSeq)
    assert(math.abs(fv1(3) - 1f / 3f) < 1e-6)
  }

  test("Multimodal.sampleFrames slices real lacing-resolved WebM frames") {
    val frames = mkFrames(9, seed = 11)
    val bytes = WebmDemux.encodeWebm(frames, 64, 48, laceSize = 2,
      blocksPerCluster = 2)
    import spark.implicits._
    val media = Seq(graft.pipeline.MediaRow(1L, "video_webm", bytes, 64, 48, 0)).toDS()
    val out = graft.pipeline.Multimodal.sampleFrames(media, 3)
      .orderBy(org.apache.spark.sql.functions.col("frame")).collect()
    assert(out.length == 3)
    // step 3 in timestamp order (== stream order here): frames 0, 3, 6
    for (i <- 0 until 3)
      assert(out(i).getInt(2) == frames(i * 3).length, s"frame $i")
  }
}
