package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/**
 * Pure-JVM MP4 / ISO Base Media File Format (ISO/IEC 14496-12, public
 * spec) DEMUXER — the container half of the one remaining multimodal
 * stub. Codec payloads (H.264/AAC entropy streams) stay stubbed — no
 * codec library ships in this container — but everything structural is
 * real: box tree walking (size/type headers, 64-bit largesize,
 * container recursion), movie/track/media headers, and the full sample
 * table resolution stsz × stsc × stco/co64 → per-sample byte ranges
 * into mdat. That makes frame SAMPLING a real operation (exact payload
 * byte ranges for evenly spaced samples) even while frame DECODE is a
 * deterministic fake.
 *
 * A minimal muxer ([[encodeMp4]]) writes a spec-valid single-track file
 * (ftyp + mdat + moov with the six mandatory stbl boxes) so fixtures
 * and round-trip tests exercise real byte layouts rather than canned
 * blobs — the same encoder-for-fixtures pattern as the BMP/PNG/WAV/Y4M
 * codecs in [[MediaCodecs]].
 *
 * Reference scope anchor: the Mr.LDA reference has no media surface;
 * this is beyond-reference capability for the multimodal pipeline.
 */
object Mp4Demux {

  /** One track's structure: handler is 'vide'/'soun'/…, codec the stsd
    * entry fourcc, dims from tkhd (16.16 fixed, video only), and the
    * resolved (offset, size) byte range of every sample in file order. */
  case class Track(trackId: Int, handler: String, codec: String,
      width: Int, height: Int, timescale: Long, duration: Long,
      sampleRanges: Seq[(Long, Int)], ctsOffsets: Seq[Int] = Nil,
      sampleDeltas: Seq[Long] = Nil) {
    def nSamples: Int = sampleRanges.length
    def totalSampleBytes: Long = sampleRanges.iterator.map(_._2.toLong).sum
    /** Presentation (display) index of each DECODE-order sample: rank
      * by composition time (decode time from stts + the ctts offset).
      * Identity when the track carries no ctts — no reordering, the
      * IPPP case. B-coded tracks (decode order != display order) get
      * the mapping video operators need to label frames by what a
      * viewer sees. */
    def presentationIndex: Seq[Int] =
      if (ctsOffsets.length != nSamples) sampleRanges.indices
      else {
        val deltas =
          if (sampleDeltas.length == nSamples) sampleDeltas
          else Seq.fill(nSamples)(1L)
        val dt = deltas.scanLeft(0L)(_ + _)
        val ct = Array.tabulate(nSamples)(i => dt(i) + ctsOffsets(i))
        val order = (0 until nSamples).sortBy(i => (ct(i), i))
        val rank = new Array[Int](nSamples)
        order.zipWithIndex.foreach { case (i, r) => rank(i) = r }
        rank.toSeq
      }
  }

  case class Mp4Info(majorBrand: String, timescale: Long, duration: Long,
      tracks: Seq[Track]) {
    /** The track video-frame semantics should use: the first 'vide'
      * track (a sound-first multi-track file would otherwise sample
      * audio bytes as "frames"), falling back to the first track. */
    def videoTrack: Track = tracks.find(_.handler == "vide").getOrElse(tracks.head)
  }

  def isMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  // ---------------- demuxer ----------------

  def demux(payload: Array[Byte]): Option[Mp4Info] =
    try demuxImpl(payload) catch { case _: Exception => None }

  private def demuxImpl(p: Array[Byte]): Option[Mp4Info] = {
    if (!isMp4(p)) return None
    val bb = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    var majorBrand = ""
    var mvhdScale = 0L
    var mvhdDur = 0L
    val tracks = mutable.ArrayBuffer.empty[Track]

    /** walk the box children of [start, end); `visit` returns true to
      * recurse into a box's children */
    def walk(start: Long, end: Long)(visit: (String, Long, Long) => Boolean): Unit = {
      var o = start
      while (o + 8 <= end) {
        val size32 = bb.getInt(o.toInt).toLong & 0xffffffffL
        val typ = new String(p, o.toInt + 4, 4, "ISO-8859-1")
        var body = o + 8
        val boxEnd =
          if (size32 == 1) { // 64-bit largesize
            val ls = bb.getLong(o.toInt + 8)
            body = o + 16
            o + ls
          } else if (size32 == 0) end // box extends to end of file
          else o + size32
        if (boxEnd > end || boxEnd <= o) throw new IllegalArgumentException("bad box size")
        if (visit(typ, body, boxEnd)) walk(body, boxEnd)(visit)
        o = boxEnd
      }
    }

    // per-trak parse state
    def parseTrak(start: Long, end: Long): Unit = {
      var trackId = 0
      var w = 0; var h = 0
      var handler = ""
      var codec = ""
      var mScale = 0L; var mDur = 0L
      var sizes: Array[Int] = Array.empty
      var chunkOffsets: Array[Long] = Array.empty
      // stsc entries: (firstChunk, samplesPerChunk)
      var stsc: Array[(Int, Int)] = Array.empty
      var cts: Array[Int] = Array.empty
      var deltas: Array[Long] = Array.empty
      // entry counts are UNTRUSTED bytes: bound every table's claimed
      // length by the bytes its box actually holds BEFORE allocating —
      // a crafted count would otherwise allocate gigabytes before the
      // first out-of-bounds read throws (the readGamma DoS class)
      def boundedN(n: Int, body: Long, boxEnd: Long, header: Int,
          entry: Int): Int = {
        require(n >= 0 && body + header + entry.toLong * n <= boxEnd,
          s"table entry count $n overruns its box")
        n
      }
      walk(start, end) { (typ, body, boxEnd) =>
        val b = body.toInt
        typ match {
          case "tkhd" =>
            val ver = p(b) & 0xff
            if (ver == 1) {
              trackId = bb.getInt(b + 20)
              w = bb.getInt(boxEnd.toInt - 8) >>> 16
              h = bb.getInt(boxEnd.toInt - 4) >>> 16
            } else {
              trackId = bb.getInt(b + 12)
              w = bb.getInt(boxEnd.toInt - 8) >>> 16
              h = bb.getInt(boxEnd.toInt - 4) >>> 16
            }
            false
          case "mdhd" =>
            val ver = p(b) & 0xff
            if (ver == 1) { mScale = bb.getInt(b + 20).toLong & 0xffffffffL; mDur = bb.getLong(b + 24) }
            else { mScale = bb.getInt(b + 12).toLong & 0xffffffffL; mDur = bb.getInt(b + 16).toLong & 0xffffffffL }
            false
          case "hdlr" =>
            handler = new String(p, b + 8, 4, "ISO-8859-1")
            false
          case "stsd" =>
            // entry_count then the first sample entry: size + fourcc
            if (bb.getInt(b + 4) >= 1) codec = new String(p, b + 12, 4, "ISO-8859-1")
            false
          case "stsz" =>
            val uniform = bb.getInt(b + 4)
            val n = bb.getInt(b + 8)
            sizes =
              if (uniform != 0) {
                require(n >= 0 && n <= (1 << 24), s"stsz uniform count $n")
                Array.fill(n)(uniform)
              } else
                Array.tabulate(boundedN(n, body, boxEnd, 12, 4))(i =>
                  bb.getInt(b + 12 + 4 * i))
            false
          case "stsc" =>
            val n = boundedN(bb.getInt(b + 4), body, boxEnd, 8, 12)
            stsc = Array.tabulate(n)(i =>
              (bb.getInt(b + 8 + 12 * i), bb.getInt(b + 12 + 12 * i)))
            false
          case "stco" =>
            val n = boundedN(bb.getInt(b + 4), body, boxEnd, 8, 4)
            chunkOffsets = Array.tabulate(n)(i => bb.getInt(b + 8 + 4 * i).toLong & 0xffffffffL)
            false
          case "co64" =>
            val n = boundedN(bb.getInt(b + 4), body, boxEnd, 8, 8)
            chunkOffsets = Array.tabulate(n)(i => bb.getLong(b + 8 + 8 * i))
            false
          case "stts" =>
            // decode-time deltas (run-length): expanded per sample for
            // the composition-time ranking; expansion capped like ctts
            val n = boundedN(bb.getInt(b + 4), body, boxEnd, 8, 8)
            val out = mutable.ArrayBuffer.empty[Long]
            var i = 0
            while (i < n) {
              val cnt = bb.getInt(b + 8 + 8 * i)
              val d = bb.getInt(b + 12 + 8 * i).toLong & 0xffffffffL
              require(cnt >= 0 && out.length + cnt.toLong <= (1 << 24),
                s"stts expansion overflows: $cnt")
              var j = 0
              while (j < cnt) { out += d; j += 1 }
              i += 1
            }
            deltas = out.toArray
            false
          case "ctts" =>
            // composition-time offsets (run-length; signed in v1,
            // unsigned-but-small in v0 — both fit an Int read)
            val n = boundedN(bb.getInt(b + 4), body, boxEnd, 8, 8)
            val out = mutable.ArrayBuffer.empty[Int]
            var i = 0
            while (i < n) {
              val cnt = bb.getInt(b + 8 + 8 * i)
              val off = bb.getInt(b + 12 + 8 * i)
              require(cnt >= 0 && out.length + cnt.toLong <= (1 << 24),
                s"ctts expansion overflows: $cnt")
              var j = 0
              while (j < cnt) { out += off; j += 1 }
              i += 1
            }
            cts = out.toArray
            false
          case "mdia" | "minf" | "stbl" => true // containers: recurse
          case _ => false
        }
      }
      // resolve stsz × stsc × stco → per-sample (offset, size); ranges
      // must land inside the payload — hostile/corrupt stsz or stco
      // values (negative sizes, offsets past EOF) reject the whole file
      // (caught in demux → None → callers fall back to the stub path)
      val ranges = mutable.ArrayBuffer.empty[(Long, Int)]
      if (sizes.nonEmpty && chunkOffsets.nonEmpty && stsc.nonEmpty) {
        var si = 0
        var ci = 0
        while (ci < chunkOffsets.length && si < sizes.length) {
          // samples-per-chunk for chunk ci+1 (1-based): the last stsc
          // entry with firstChunk <= ci+1
          var spc = stsc(0)._2
          var k = 0
          while (k < stsc.length && stsc(k)._1 <= ci + 1) { spc = stsc(k)._2; k += 1 }
          var off = chunkOffsets(ci)
          var j = 0
          while (j < spc && si < sizes.length) {
            val len = sizes(si)
            if (len < 0 || off < 0 || off + len > p.length)
              throw new IllegalArgumentException(
                s"sample range out of bounds: off=$off len=$len payload=${p.length}")
            ranges += ((off, len))
            off += len
            si += 1; j += 1
          }
          ci += 1
        }
      }
      // a ctts table that disagrees with the sample count is corrupt —
      // mis-zipping decode and presentation order would silently
      // mislabel every frame downstream
      if (cts.nonEmpty)
        require(cts.length == ranges.length,
          s"ctts has ${cts.length} entries for ${ranges.length} samples")
      tracks += Track(trackId, handler, codec, w, h, mScale, mDur,
        ranges.toSeq, cts.toSeq, deltas.toSeq)
    }

    walk(0L, p.length.toLong) { (typ, body, boxEnd) =>
      val b = body.toInt
      typ match {
        case "ftyp" =>
          majorBrand = new String(p, b, 4, "ISO-8859-1")
          false
        case "moov" => true
        case "mvhd" =>
          val ver = p(b) & 0xff
          if (ver == 1) { mvhdScale = bb.getInt(b + 20).toLong & 0xffffffffL; mvhdDur = bb.getLong(b + 24) }
          else { mvhdScale = bb.getInt(b + 12).toLong & 0xffffffffL; mvhdDur = bb.getInt(b + 16).toLong & 0xffffffffL }
          false
        case "trak" =>
          parseTrak(body, boxEnd)
          false
        case _ => false
      }
    }
    if (majorBrand.isEmpty || tracks.isEmpty) None
    else Some(Mp4Info(majorBrand, mvhdScale, mvhdDur, tracks.toSeq))
  }

  /** Extract the raw payload bytes of sample `i` (file order). */
  def sampleBytes(payload: Array[Byte], t: Track, i: Int): Array[Byte] = {
    val (off, len) = t.sampleRanges(i)
    java.util.Arrays.copyOfRange(payload, off.toInt, off.toInt + len)
  }

  // ---------------- minimal muxer (fixtures) ----------------

  /**
   * Write a spec-valid single-track MP4: ftyp, one mdat holding the
   * samples back-to-back, and a moov with the mandatory box chain
   * (mvhd, trak/tkhd, mdia/mdhd+hdlr, minf/vmhd+dinf/dref,
   * stbl/stsd+stts+stsc+stsz+stco). One chunk per `samplesPerChunk`
   * samples, uniform 1-tick durations. `codec` is the stsd fourcc
   * (e.g. "avc1" for a video track whose payloads the caller supplies —
   * the demuxer never inspects payload bytes).
   */
  def encodeMp4(samples: Seq[Array[Byte]], width: Int, height: Int,
      codec: String = "avc1", handler: String = "vide",
      timescale: Int = 1000, samplesPerChunk: Int = 3,
      ctsOffsets: Option[Seq[Int]] = None): Array[Byte] = {
    require(samples.nonEmpty && codec.length == 4 && handler.length == 4)
    require(ctsOffsets.forall(c => c.length == samples.length && c.forall(_ >= 0)),
      "ctts offsets must cover every sample, non-negative (version 0)")
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val len = 8 + body.iterator.map(_.length).sum
      val b = new java.io.ByteArrayOutputStream(len)
      b.write(u32(len)); b.write(typ.getBytes("ISO-8859-1"))
      body.foreach(b.write)
      b.toByteArray
    }
    val ftyp = box("ftyp", "isom".getBytes, u32(0x200), "isomiso2".getBytes)
    // mdat directly after ftyp: chunk offsets are ftyp.len + 8 + running
    val mdatBodyLen = samples.iterator.map(_.length).sum
    val mdatStart = ftyp.length + 8L
    val nChunks = (samples.length + samplesPerChunk - 1) / samplesPerChunk
    val chunkOffsets = {
      val offs = new Array[Long](nChunks)
      var off = mdatStart
      var i = 0
      var c = 0
      while (c < nChunks) {
        offs(c) = off
        var j = 0
        while (j < samplesPerChunk && i < samples.length) { off += samples(i).length; i += 1; j += 1 }
        c += 1
      }
      offs
    }
    val dur = samples.length.toLong // 1 tick per sample
    val fixed = (v: Int) => u32(v.toLong << 16)
    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(timescale), u32(dur),
      u32(0x00010000), Array[Byte](0x01, 0x00, 0, 0), new Array[Byte](8),
      // identity matrix
      u32(0x00010000), u32(0), u32(0), u32(0), u32(0x00010000), u32(0),
      u32(0), u32(0), u32(0x40000000),
      new Array[Byte](24), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0), u32(dur),
      new Array[Byte](8), new Array[Byte](8),
      u32(0x00010000), u32(0), u32(0), u32(0), u32(0x00010000), u32(0),
      u32(0), u32(0), u32(0x40000000),
      fixed(width), fixed(height))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(timescale), u32(dur),
      Array[Byte](0x55, (0xc4 & 0xff).toByte), Array[Byte](0, 0))
    val hdlr = box("hdlr", u32(0), u32(0), handler.getBytes("ISO-8859-1"),
      new Array[Byte](12), "graft".getBytes("ISO-8859-1"), Array[Byte](0))
    val sampleEntry = { // minimal visual sample entry
      val b = new java.io.ByteArrayOutputStream()
      b.write(new Array[Byte](6)); b.write(Array[Byte](0, 1)) // data_ref_index 1
      b.write(new Array[Byte](16))
      b.write(Array[Byte]((width >> 8).toByte, width.toByte,
        (height >> 8).toByte, height.toByte))
      b.write(u32(0x00480000)); b.write(u32(0x00480000)) // 72 dpi
      b.write(u32(0)); b.write(Array[Byte](0, 1)) // frame_count 1
      b.write(new Array[Byte](32)) // compressorname
      b.write(Array[Byte](0, 0x18)); b.write(Array[Byte](-1, -1)) // depth, -1
      box(codec, b.toByteArray)
    }
    val stsd = box("stsd", u32(0), u32(1), sampleEntry)
    val stts = box("stts", u32(0), u32(1), u32(samples.length), u32(1))
    // ctts (composition offsets, version 0): run-length over equal runs
    // — the decode-to-display mapping B-coded tracks carry
    val ctts = ctsOffsets.map { offs =>
      val runs = mutable.ArrayBuffer.empty[(Int, Int)]
      offs.foreach { o =>
        if (runs.nonEmpty && runs.last._2 == o)
          runs(runs.length - 1) = (runs.last._1 + 1, o)
        else runs += ((1, o))
      }
      box("ctts", u32(0), u32(runs.length),
        runs.iterator.map { case (c, o) => u32(c.toLong) ++ u32(o.toLong) }
          .reduce(_ ++ _))
    }
    val stsc = box("stsc", u32(0), u32(1), u32(1), u32(samplesPerChunk), u32(1))
    val stsz = box("stsz", u32(0), u32(0), u32(samples.length),
      samples.iterator.map(s => u32(s.length)).reduce(_ ++ _))
    val stco = box("stco", u32(0), u32(nChunks),
      chunkOffsets.iterator.map(u32).reduce(_ ++ _))
    val vmhd = box("vmhd", u32(1), new Array[Byte](8))
    val dref = box("dref", u32(0), u32(1), box("url ", u32(1)))
    val dinf = box("dinf", dref)
    val stbl = ctts match {
      case Some(c) => box("stbl", stsd, stts, c, stsc, stsz, stco)
      case None => box("stbl", stsd, stts, stsc, stsz, stco)
    }
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    out.write(ftyp)
    out.write(u32(8L + mdatBodyLen)); out.write("mdat".getBytes)
    samples.foreach(out.write)
    out.write(moov)
    out.toByteArray
  }
}
