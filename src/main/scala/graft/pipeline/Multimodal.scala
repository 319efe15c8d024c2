package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media row: opaque binary payload + typed metadata. */
case class MediaRow(
    mediaId: Long,
    kind: String, // image | audio | video
    payload: Array[Byte],
    width: Int,
    height: Int,
    sampleRateHz: Int)

/** Extracted features for one media item. */
case class MediaFeatures(
    mediaId: Long,
    kind: String,
    nBytes: Int,
    features: Array[Float])

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed batch-wise in `mapPartitions`.
 *
 * The decode step is REAL for the formats a bare JVM can parse — BMP
 * (24-bit BI_RGB) and WAV (PCM16) via [[MediaCodecs]]: actual pixels /
 * samples → actual image/audio statistics, and resize/frame-sampling
 * that emit VALID files of the same format. Payloads in any other
 * format (JPEG/MP4/… need codecs this container doesn't ship) fall
 * back to `decodeStub`, a deterministic byte-hash feature vector that
 * keeps the Spark-side contract — schema, partition-wise batching,
 * feature shape, join-back pattern — exercised end-to-end.
 */
object Multimodal {

  val FeatureDim = 16

  /** Format-sniffing decode: real BMP/PNG/JPEG/WAV/Y4M feature
    * extraction, stub for opaque payloads. One decoder-dispatch per row,
    * no per-row library init (that belongs once-per-partition in the
    * mapPartitions callers). */
  def decode(payload: Array[Byte]): Array[Float] =
    if (MediaCodecs.isBmp(payload))
      MediaCodecs.decodeBmp(payload).map(MediaCodecs.bmpFeatures).getOrElse(decodeStub(payload))
    else if (MediaCodecs.isPng(payload))
      MediaCodecs.decodePng(payload).map(MediaCodecs.bmpFeatures).getOrElse(decodeStub(payload))
    else if (JpegCodec.isJpeg(payload))
      JpegCodec.decodeJpeg(payload).map(MediaCodecs.bmpFeatures).getOrElse(decodeStub(payload))
    else if (MediaCodecs.isWav(payload))
      MediaCodecs.decodeWav(payload).map(MediaCodecs.wavFeatures).getOrElse(decodeStub(payload))
    else if (FlacCodec.isFlac(payload))
      FlacCodec.decodeFlac(payload).map(MediaCodecs.wavFeatures).getOrElse(decodeStub(payload))
    else if (MediaCodecs.isY4m(payload))
      MediaCodecs.decodeY4m(payload).map(MediaCodecs.y4mFeatures).getOrElse(decodeStub(payload))
    else if (H264Codec.isH264(payload))
      H264Codec.decode(payload).map(MediaCodecs.bmpFeatures).getOrElse(decodeStub(payload))
    else if (WebmDemux.isWebm(payload))
      WebmDemux.demux(payload).map(webmFeatures(payload, _)).getOrElse(decodeStub(payload))
    else decodeStub(payload)

  /** Stream-level features for WebM/Matroska payloads (r15): real
    * structure from the EBML demux — dims, frame count, keyframe
    * ratio, mean frame size — plus a hash over the DEMUXED frame
    * payloads in stream order. Deliberately container-layout-invariant
    * (re-muxing the same stream with a different cluster split,
    * sized/streaming form, or block grouping yields the identical
    * vector; across LACING changes only the keyframe-ratio component
    * may move, since Matroska keyframe flags are per block — pinned in
    * WebmDemuxSpec), which the whole-file `decodeStub`
    * can't offer. VP8/VP9/AV1 PIXEL decode stays refused (CATALOG
    * adjudication — probability-table mass fails the honest-witness
    * bar, the AAC reasoning), so these are the honest maximum. */
  def webmFeatures(payload: Array[Byte], info: WebmDemux.WebmInfo): Array[Float] = {
    val t = info.videoTrack
    val out = new Array[Float](FeatureDim)
    out(0) = t.width.toFloat / 4096f
    out(1) = t.height.toFloat / 4096f
    out(2) = math.min(t.nFrames, 100000).toFloat / 100000f
    // keyframe ratio: BITSTREAM truth when every frame's header parses
    // under the track's codec (CodecHeaders, r15) — fully layout-
    // invariant (laced frames share one container flag; the bitstream
    // does not) — container flags otherwise
    val bitstreamKeys =
      if (t.nFrames == 0) None
      else {
        val facts = (0 until t.nFrames).map(i =>
          CodecHeaders.frameFacts(t.codecId, WebmDemux.frameBytes(payload, t, i)))
        if (facts.forall(_.isDefined)) Some(facts.count(_.exists(_._1)))
        else None
      }
    out(3) =
      if (t.nFrames == 0) 0f
      else bitstreamKeys.getOrElse(t.keyframeCount).toFloat / t.nFrames
    out(4) = if (t.nFrames == 0) 0f
      else math.min(t.totalFrameBytes.toDouble / t.nFrames, 1e7).toFloat / 1e7f
    out(5) = math.min(info.tracks.length, 64).toFloat / 64f
    var h = 1125899906842597L
    var fi = 0
    while (fi < t.nFrames) {
      val f = t.frames(fi)
      var i = f.offset.toInt
      val end = i + f.size
      while (i < end) { h = 31 * h + payload(i); i += 1 }
      fi += 1
    }
    var k = 6
    while (k < FeatureDim) {
      val x = h ^ (h >>> 29) ^ (k.toLong * 0x9E3779B97F4A7C15L)
      out(k) = (x % 1000003L).toFloat / 1000003f
      k += 1
    }
    out
  }

  /** STUB: stands in for decode + feature extraction of formats that
    * need codecs this container doesn't ship (JPEG went native in r7
    * via [[JpegCodec]]; H.264 I_PCM IDR frames in r8, full I-slice
    * CAVLC in r8-r10, baseline P-slice motion-compensated decode in
    * r11, and in r12 multi-reference P slices, bi-predictive B slices
    * with POC-type-0 display reordering, AND the 8.7 in-loop
    * deblocking filter — `H264Codec.decodeGop` handles x264-default
    * baseline streams and IbbP GOPs; FLAC went native in r12 too
    * ([[FlacCodec]]); r13 added CABAC entropy decoding for I, P AND B
    * slices (main-profile streams — [[H264Cabac]], cabac_init_idc-0
    * context column, self-witnessed by encoder round trips,
    * exact-termination-gated on foreign input), B_Skip/B_Direct
    * spatial AND temporal direct, B_8x8 sub-partitions, deblocking on
    * B slices, weighted prediction (explicit P/B + implicit bipred,
    * including the x264 weightp=2 reference-duplication shape via
    * ref_pic_list_modification), and high-profile CAVLC — Intra_8x8 +
    * the 8x8 transform, intra and inter, with chroma QP offsets; r14
    * added CABAC 8x8 residuals (ctxBlockCat 5, contexts 399-435),
    * long-term references + the full MMCO set, and POC type 1; r15
    * added the WebM/Matroska CONTAINER layer ([[WebmDemux]] — real
    * stream-level features + frame sampling via [[webmFeatures]]).
    * What remains stubbed, each under a written CATALOG adjudication:
    * VP8/VP9/AV1 pixel decode (probability-table mass fails the
    * honest-witness bar), cabac_init_idc 1/2, interlace, and AAC/MP3/
    * Opus audio (codebooks unverifiable in-container). */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    i = 0
    while (i < FeatureDim) {
      val x = h ^ (h >>> 29) ^ (i.toLong * 0x9E3779B97F4A7C15L)
      out(i) = ((x % 1000003L).toFloat / 1000003f)
      i += 1
    }
    out
  }

  /** Batch feature extraction over the binary column; one decoder init per
    * partition (the expensive part in a real codec), then row streaming.
    * Dispatches to the REAL BMP/WAV decoders, stub otherwise. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: initialize heavyweight codecs/models once per partition here
      it.map { m =>
        MediaFeatures(m.mediaId, m.kind, m.payload.length, decode(m.payload))
      }
    }
  }

  /** Frame sampling: split each payload into `n` evenly spaced segments
    * and emit one row per segment — the explode-shape a real frame
    * sampler produces. WAV payloads get REAL sample-aligned slices,
    * each re-wrapped as a valid standalone WAV (so downstream decode
    * works on every frame); opaque payloads get byte slices + stub. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      MediaCodecs.decodeY4m(m.payload) match {
        case Some(video) =>
          // REAL video frame sampling: n evenly spaced frames, each
          // emitted as a standalone PNG — the image-per-frame shape a
          // vision encoder consumes downstream. Features come straight
          // from the frame (the PNG round-trip is bit-exact, so decoding
          // the bytes back would produce the identical vector at 2×
          // compression cost per frame)
          val step = math.max(1, video.frames.length / n)
          (0 until n).iterator.map { i =>
            val idx = math.min(i * step, video.frames.length - 1)
            val frame = video.frames(idx)
            (m.mediaId, i, MediaCodecs.encodePng(frame).length,
              MediaCodecs.bmpFeatures(frame))
          }
        case None => MediaCodecs.decodeWav(m.payload) match {
          case Some(wav) =>
            (0 until n).iterator.map { i =>
              val slice = MediaCodecs.sliceWav(wav, i, n)
              // 44-byte canonical header + PCM16 data — encodeWav's size
              // closed-form, without serializing bytes just to measure them
              (m.mediaId, i, 44 + 2 * slice.samples.length,
                MediaCodecs.wavFeatures(slice))
            }
          case None => Mp4Demux.demux(m.payload) match {
            case Some(info) if info.videoTrack.nSamples > 0 =>
              // REAL MP4 frame sampling: the demuxer resolves exact
              // per-sample byte ranges from the stsz×stsc×stco tables
              // (bounds-validated at demux, so sampleBytes can't escape
              // the payload), so each emitted frame is the sample's true
              // payload; only the codec decode itself is the stub.
              // Sampling is evenly spaced in PRESENTATION order (r12:
              // ctts-derived; identity without ctts) — on a B-coded MP4
              // a decode-order stride would cluster around references
              // instead of spacing what a viewer sees
              val t = info.videoTrack
              val decOfDisplay = {
                val pres = t.presentationIndex
                val inv = new Array[Int](pres.length)
                pres.zipWithIndex.foreach { case (d, k) => inv(d) = k }
                inv
              }
              val step = math.max(1, t.nSamples / n)
              // IPPP-aware (r11): a sampled P frame needs its reference
              // chain, so when standalone decode fails the GOP decodes
              // ONCE (lazily — all-intra MP4s never pay it), streaming
              // frame-by-frame and retaining only the n sampled frames;
              // foreign codecs still fall to the stub
              lazy val gopSampled: Map[Int, MediaCodecs.Bmp] = {
                val wanted = (0 until n)
                  .map(i => decOfDisplay(
                    math.min(i.toLong * step, t.nSamples - 1).toInt)).toSet
                H264Codec.decodeGopIterator(
                    Iterator.tabulate(t.nSamples.toInt) { i =>
                      // guarded like videoPhashRows: a bad sample must
                      // poison only its GOP slot, not escape from the
                      // payload iterator's next() past decodeAu's catch
                      // and fail the whole row
                      try Mp4Demux.sampleBytes(m.payload, t, i)
                      catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
                    })
                  .zipWithIndex
                  .collect { case (Some(b), i) if wanted(i) => i -> b }
                  .toMap
              }
              (0 until n).iterator.map { i =>
                val idx = decOfDisplay(math.min(i * step, t.nSamples - 1))
                // same guard as the gopSampled tabulate above: a bad
                // sample poisons only this frame slot, not the row
                val sample = try Mp4Demux.sampleBytes(m.payload, t, idx)
                  catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
                val h264ish = // any slice NAL: IDR (5) or P (1)
                  try H264Codec.nalUnits(sample).exists { case (s, _) =>
                    val ty = sample(s) & 0x1f; ty == 1 || ty == 5
                  } catch { case scala.util.control.NonFatal(_) => false }
                val feats = H264Codec.decode(sample)
                  .orElse(if (h264ish) gopSampled.get(idx.toInt) else None)
                  .map(MediaCodecs.bmpFeatures).getOrElse(decodeStub(sample))
                (m.mediaId, i, sample.length, feats)
              }
            case _ => WebmDemux.demux(m.payload) match {
              case Some(winfo) if winfo.videoTrack.nFrames > 0 =>
                // REAL WebM frame sampling (r15): exact per-frame byte
                // ranges from the EBML cluster walk, lacing resolved;
                // evenly spaced in PRESENTATION order (block-timestamp
                // sort — stable on ties so laced frames keep stream
                // order). VP8/VP9/AV1 pixel decode is adjudicated out
                // (CATALOG), so features are the stub over the TRUE
                // frame payload — sampling itself is real.
                val t = winfo.videoTrack
                val order = t.frames.indices
                  .sortBy(i => (t.frames(i).timestampTicks, i))
                val step = math.max(1, t.nFrames / n)
                (0 until n).iterator.map { i =>
                  val idx = order(math.min(i.toLong * step, t.nFrames - 1).toInt)
                  // same guard as the MP4 branch: a bad frame poisons
                  // only its slot, not the row
                  val fb = try WebmDemux.frameBytes(m.payload, t, idx)
                    catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
                  (m.mediaId, i, fb.length, decodeStub(fb))
                }
              case _ =>
              val step = math.max(1, m.payload.length / n)
              (0 until n).iterator.map { i =>
                val start = math.min(i.toLong * step, math.max(0, m.payload.length - 1)).toInt
                val end = math.min(start + step, m.payload.length)
                val slice = java.util.Arrays.copyOfRange(m.payload, start, end)
                (m.mediaId, i, slice.length, decodeStub(slice))
              }
            }
          }
        }
      }
    }.toDF("mediaId", "frame", "n_bytes", "features")
  }

  /** Resize: decodable payloads get a REAL resample — nearest-neighbor
    * by default, exact-fixed-point bilinear with `bilinear = true`
    * ([[MediaCodecs.resizeBmpBilinear]], the vision-training standard —
    * nearest aliases hard on downscale) — re-encoded in the same
    * container; opaque payloads keep the proportional byte-budget stub
    * so the pipeline shape is exercised for every format. Composes
    * with extractFeatures / sampleFrames downstream. */
  def resize(media: Dataset[MediaRow], newWidth: Int, newHeight: Int,
      bilinear: Boolean = false): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val kernel: (MediaCodecs.Bmp, Int, Int) => MediaCodecs.Bmp =
      if (bilinear) MediaCodecs.resizeBmpBilinear else MediaCodecs.resizeBmp
    media.map { m =>
      // real resample, re-encoded in the SAME container format (Y4M
      // needs even target dims for 4:2:0 — odd targets fall to the stub)
      val real =
        MediaCodecs.decodeBmp(m.payload)
          .map(img => MediaCodecs.encodeBmp(kernel(img, newWidth, newHeight)))
          .orElse(MediaCodecs.decodePng(m.payload)
            .map(img => MediaCodecs.encodePng(kernel(img, newWidth, newHeight))))
          .orElse(if (JpegCodec.isJpeg(m.payload))
            JpegCodec.decodeJpeg(m.payload)
              .map(img => JpegCodec.encodeJpeg(kernel(img, newWidth, newHeight)))
          else None)
          .orElse(
            if (newWidth % 2 == 0 && newHeight % 2 == 0)
              MediaCodecs.decodeY4m(m.payload).map(v => MediaCodecs.encodeY4m(
                MediaCodecs.Y4m(newWidth, newHeight,
                  v.frames.map(kernel(_, newWidth, newHeight)))))
            else None)
      real match {
        case Some(bytes) =>
          m.copy(payload = bytes, width = newWidth, height = newHeight)
        case None =>
          // Long arithmetic: 65536x65536 overflows Int to 0 and would
          // truncate every payload to one byte
          val oldArea = math.max(1L, m.width.toLong * m.height)
          val targetLen = math.max(1L,
            m.payload.length.toLong * (newWidth.toLong * newHeight) / oldArea).toInt
          m.copy(
            payload = java.util.Arrays.copyOf(m.payload, targetLen),
            width = newWidth, height = newHeight)
      }
    }
  }

  /**
   * Deterministic REAL-media fixture from a text table: even ids become
   * valid BMPs (arithmetic-derived pixels), odd ids valid PCM16 WAVs
   * (square-wave samples). Dimensions/sample counts are closed-form in
   * (id, codepoint-length of text) — so a SQL oracle can verify the
   * serialized sizes AND the decoded header fields round-tripped by the
   * real decoders, while specs pin the pixel/sample statistics.
   */
  def realMediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val len = text.codePointCount(0, text.length) // = DuckDB len()
        if (id % 2 == 0) {
          val w = 4 + (len % 8); val h = 3 + (len % 5)
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val o = (y * w + x) * 3
              rgb(o) = ((x * 7 + y * 13 + id) % 256).toByte
              rgb(o + 1) = ((x * 3 + y * 11 + len) % 256).toByte
              rgb(o + 2) = ((x * 5 + y * 17) % 256).toByte
              x += 1
            }
            y += 1
          }
          val img = MediaCodecs.Bmp(w, h, rgb)
          // alternate the container: ids ≡ 0 (mod 4) ship BMP, ≡ 2 ship
          // PNG — same pixels, both real-decoded back
          if (id % 4 == 0)
            MediaRow(id, "image", MediaCodecs.encodeBmp(img), w, h, 0)
          else
            MediaRow(id, "image_png", MediaCodecs.encodePng(img), w, h, 0)
        } else if (id % 4 == 1) {
          val ns = 64 + (len % 128)
          val samples = Array.tabulate(ns)(i =>
            (if ((i / 4) % 2 == 0) 8000 else -8000).toShort) // square wave, period 8
          MediaRow(id, "audio", MediaCodecs.encodeWav(MediaCodecs.Wav(8000, 1, samples)),
            0, 0, 8000)
        } else {
          // video: even 4:2:0 dims + frame count, all closed-form in len
          val w = 2 * (2 + (len % 6)); val h = 2 * (2 + (len % 4))
          val nf = 2 + (len % 3)
          val frames = (0 until nf).map { f =>
            val rgb = new Array[Byte](w * h * 3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val o = (y * w + x) * 3
                rgb(o) = ((x * 11 + y * 5 + f * 29 + id) % 256).toByte
                rgb(o + 1) = ((x * 13 + y * 7 + f * 31 + len) % 256).toByte
                rgb(o + 2) = ((x * 17 + y * 3 + f * 37) % 256).toByte
                x += 1
              }
              y += 1
            }
            MediaCodecs.Bmp(w, h, rgb)
          }
          MediaRow(id, "video", MediaCodecs.encodeY4m(MediaCodecs.Y4m(w, h, frames)),
            w, h, 0)
        }
      }
  }

  /** Round-trip summary through the REAL decoders: for each payload, the
    * header fields the decoder actually parsed back — (width, height)
    * for BMP/PNG, (sampleRate, nSamples) for WAV; -1/-1 when only the
    * stub path applies. Integer-exact, so a SQL oracle can replay it.
    * PNG rows report n_bytes = -1: the deflate stream's length is
    * encoder-dependent and not part of the format contract. */
  def realDecodeSummary(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      val (a, b) = MediaCodecs.decodeBmp(m.payload)
        .orElse(MediaCodecs.decodePng(m.payload))
        .orElse(if (JpegCodec.isJpeg(m.payload)) JpegCodec.decodeJpeg(m.payload) else None)
        .map(img => (img.width, img.height))
        .orElse(MediaCodecs.decodeWav(m.payload)
          .map(w => (w.sampleRateHz, w.samples.length)))
        .orElse(MediaCodecs.decodeY4m(m.payload)
          .map(v => (v.width, v.frames.length)))
        .orElse(H264Codec.describe(m.payload))
        .orElse(Mp4Demux.demux(m.payload)
          .map(info => (info.videoTrack.width, info.videoTrack.nSamples)))
        .orElse(WebmDemux.demux(m.payload)
          .map(info => (info.videoTrack.width, info.videoTrack.nFrames)))
        .getOrElse((-1, -1))
      // PNG/JPEG stream lengths are encoder-dependent, not format contract
      val nBytes = if (MediaCodecs.isPng(m.payload) || JpegCodec.isJpeg(m.payload)) -1
        else m.payload.length
      (m.mediaId, m.kind, nBytes, a, b)
    }.toDF("media_id", "kind", "n_bytes", "decoded_a", "decoded_b")
  }

  /** Build a deterministic media table from any text table (test fixture:
    * payload = utf8 bytes). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val kind = id % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        MediaRow(id, kind, bytes, width = 64, height = 64, sampleRateHz = 16000)
      }
  }
}
