package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic mini-fuzz over every untrusted-bytes ingest surface
  * added or touched in r11: random-looking payloads, truncations of
  * valid payloads, and single-byte corruptions must all come back as
  * empty/None results — never an escaped exception, never a hang (the
  * tar walker's negative-size guard and the Annex-B splitter's bounds
  * guard exist exactly for this class of input). */
class HostileInputSpec extends AnyFunSuite {

  // xorshift-ish deterministic byte soup — no Math.random, replayable
  private def soup(seed: Long, n: Int): Array[Byte] = {
    var s = seed * 0x9E3779B97F4A7C15L + 1
    Array.tabulate(n) { _ =>
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s & 0xff).toByte
    }
  }

  private def gradient(w: Int, h: Int): MediaCodecs.Bmp = {
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 37) % 251).toByte)
    MediaCodecs.Bmp(w, h, rgb)
  }

  test("random byte soup: tar walker, GOP decoder, Annex-B splitter, MP4 demux") {
    for (seed <- 1 to 120) {
      val junk = soup(seed, 64 + seed * 31)
      // tar: kernel throws IAE-or-NFE only; the Dataset reader's
      // corrupt-drop contract catches NonFatal — emulate it here
      try graft.sources.TarShards.listEntries(junk)
      catch { case e: Exception => assert(scala.util.control.NonFatal(e), e) }
      assert(H264Codec.decodeGop(Seq(junk)) == Seq(None), s"seed $seed")
      assert(H264Codec.decodeAnnexBStream(junk).forall(_.isEmpty), s"seed $seed")
      Mp4Demux.demux(junk) // Option-returning: must not throw
      FlacCodec.decodeFlac(junk) // Option-returning: must not throw
      Multimodal.decode(junk) // stub fallback: must not throw
    }
  }

  test("r12: image/audio/video decoders survive soup, truncation, and bit flips") {
    // the remaining untrusted-bytes surfaces (JPEG, BMP, PNG, WAV, Y4M
    // are all Option-returning: they must come back None-or-Some, never
    // throw, never hang) over the same grid as the r11 tar/H.264 pass
    def allDecoders(p: Array[Byte]): Unit = {
      JpegCodec.decodeJpeg(p)
      MediaCodecs.decodeBmp(p)
      MediaCodecs.decodePng(p)
      MediaCodecs.decodeWav(p)
      MediaCodecs.decodeY4m(p)
      ()
    }
    for (seed <- 1 to 120) allDecoders(soup(seed * 7919, 64 + seed * 29))
    // valid payloads of each format, then truncations + flips
    val img = gradient(24, 16)
    val wav = MediaCodecs.Wav(8000, 1,
      Array.tabulate[Short](700)(i => ((i * 131) % 20000 - 10000).toShort))
    val valid = Seq(
      JpegCodec.encodeJpeg(img, quality = 85),
      MediaCodecs.encodeBmp(img),
      MediaCodecs.encodePng(img),
      MediaCodecs.encodeWav(wav),
      MediaCodecs.encodeY4m(MediaCodecs.Y4m(24, 16, Seq(img, gradient(24, 16)))))
    for (payload <- valid) {
      for (cut <- Seq(1, 3, 17, 64, payload.length / 2, payload.length - 1))
        allDecoders(payload.take(math.max(0, payload.length - cut)))
      for (pos <- 0 until payload.length by 53) {
        val bad = payload.clone(); bad(pos) = (bad(pos) ^ 0x5a).toByte
        allDecoders(bad)
      }
    }
  }

  test("r12: Mr.LDA SequenceFile record decoders fail loudly, never hang") {
    // the byte-level record parsers behind readDocs/readPolyDocs (the
    // split reader hands them raw value bytes from foreign files):
    // contract is throw-NonFatal-or-parse, like the tar walker — the
    // Dataset layer's corrupt-drop try is the soft edge
    import graft.sources.MrldaSequenceFile
    def tryAll(b: Array[Byte]): Unit = {
      try MrldaSequenceFile.decodeDoc(b)
      catch { case e: Exception => assert(scala.util.control.NonFatal(e), e) }
      try MrldaSequenceFile.decodePolyDoc(b)
      catch { case e: Exception => assert(scala.util.control.NonFatal(e), e) }
    }
    for (seed <- 1 to 150) tryAll(soup(seed * 104729, 1 + seed * 17))
    tryAll(Array.empty[Byte])
    tryAll(Array.fill[Byte](4096)(0))
    tryAll(Array.fill[Byte](4096)(-1))
  }

  test("truncations and single-byte flips of VALID payloads never escape") {
    val frames = Seq(gradient(32, 32), gradient(32, 32))
    val gop = H264Codec.encodeGop(frames, qp = 26)
    val es = H264Codec.encodeGop(frames, qp = 26, avcc = false).flatten.toArray
    val tar = graft.sources.TarShards.writeTar(
      Seq(("a.txt", soup(7, 700)), ("b.bin", soup(8, 40))))
    for (cut <- Seq(1, 4, 17, 100, 511, 513)) {
      val tGop = gop.head.take(gop.head.length - cut)
      H264Codec.decodeGop(Seq(tGop, gop(1))) // truncated IDR poisons; no throw
      H264Codec.decodeAnnexBStream(es.take(math.max(0, es.length - cut)))
      try graft.sources.TarShards.listEntries(tar.take(tar.length - cut))
      catch { case e: Exception => assert(scala.util.control.NonFatal(e), e) }
    }
    for (pos <- 0 until es.length by 97) { // ~every 97th byte flipped
      val bad = es.clone(); bad(pos) = (bad(pos) ^ 0x5a).toByte
      H264Codec.decodeAnnexBStream(bad) // any result, no escape
    }
    for (pos <- 0 until tar.length by 83) {
      val bad = tar.clone(); bad(pos) = (bad(pos) ^ 0x5a).toByte
      try graft.sources.TarShards.listEntries(bad)
      catch { case e: Exception => assert(scala.util.control.NonFatal(e), e) }
    }
  }
}
