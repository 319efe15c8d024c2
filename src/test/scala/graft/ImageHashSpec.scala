package graft

import graft.pipeline.{ImageHash, JpegCodec, MediaCodecs}
import org.apache.spark.sql.functions._

/** pHash validation: re-encode invariance vs cross-content separation on
  * the planted spectral fixture, banded-LSH completeness against the
  * brute-force join, and the corrupt-blob drop contract. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def decode(bytes: Array[Byte]): MediaCodecs.Bmp =
    JpegCodec.decodeJpeg(bytes).getOrElse(fail("fixture must decode"))

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("planted fixture: pairs hash close, distinct bases hash far") {
    val hashes = (0L until 60L).map(id =>
      id -> ImageHash.phash64(decode(ImageHash.plantedSpectralJpeg(id)))).toMap
    val planted = (0L until 30L).map(b => ham(hashes(2 * b), hashes(2 * b + 1)))
    assert(planted.max <= 4, s"planted pair drifted past the cut: ${planted.max}")
    val cross = for {
      a <- 0L until 60L; b <- (a + 1) until 60L if a / 2 != b / 2
    } yield ham(hashes(a), hashes(b))
    assert(cross.min >= 10, s"cross-base collision risk: ${cross.min}")
  }

  test("phash64 is deterministic and uses only 63 bits") {
    val img = decode(ImageHash.plantedSpectralJpeg(7L))
    val h1 = ImageHash.phash64(img)
    val h2 = ImageHash.phash64(img)
    assert(h1 == h2)
    assert((h1 & (1L << 63)) == 0L)
    // ~half the decisive coefficients sit above the median by construction
    val bits = java.lang.Long.bitCount(h1)
    assert(bits >= 20 && bits <= 43, s"degenerate bit balance: $bits")
  }

  test("imageNearDups equals the brute-force Hamming join on the fixture") {
    val rows = (0L until 40L).map(id => (id, ImageHash.plantedSpectralJpeg(id)))
    val df = rows.toDF("id", "bytes").repartition(5)
    val got = ImageHash.imageNearDups(df, "id", "bytes", maxHamming = 4)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes = rows.map { case (id, b) => id -> ImageHash.phash64(decode(b)) }
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && ham(ha, hb) <= 4
    } yield (ia, ib)).toSet
    assert(got == brute)
    assert(got == (0L until 20L).map(b => (2 * b, 2 * b + 1)).toSet)
  }

  test("video fixture margins and aligned near-dup recovery through MP4+H.264") {
    import graft.pipeline.{H264Codec, Mp4Demux}
    val hashes: Map[(Long, Int), Long] = (0L until 24L).flatMap { id =>
      val bytes = ImageHash.plantedSpectralMp4(id)
      val t = Mp4Demux.demux(bytes).get.videoTrack
      (0 until t.nSamples.toInt).map { i =>
        val img = H264Codec.decode(Mp4Demux.sampleBytes(bytes, t, i))
          .getOrElse(fail("fixture sample must decode"))
        (id, i) -> ImageHash.phash64(img)
      }
    }.toMap
    assert(hashes.size == 96) // 24 videos × 4 frames all decoded
    val planted = for (b <- 0L until 12L; f <- 0 until 4)
      yield ham(hashes((2 * b, f)), hashes((2 * b + 1, f)))
    assert(planted.max <= 6, s"qp-requant drifted past the cut: ${planted.max}")
    val cross = for {
      a <- 0L until 24L; b <- (a + 1) until 24L if a / 2 != b / 2; f <- 0 until 4
    } yield ham(hashes((a, f)), hashes((b, f)))
    assert(cross.min >= 10, s"cross-base frame collision risk: ${cross.min}")

    val df = (0L until 24L).map(id => (id, ImageHash.plantedSpectralMp4(id)))
      .toDF("id", "bytes").repartition(4)
    val got = ImageHash.videoNearDups(df, "id", "bytes", maxHamming = 6, minFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == (0L until 12L).map(b => (2 * b, 2 * b + 1, 4L)).toSet)
  }

  test("undecodable MP4s and corrupt samples drop out of videoNearDups") {
    val good0 = ImageHash.plantedSpectralMp4(0L)
    val df = Seq(
      (0L, good0), (1L, ImageHash.plantedSpectralMp4(1L)),
      (9L, Array[Byte](0, 0, 0, 8, 102, 116, 121, 112)), // bare ftyp, no moov
      (10L, good0.take(good0.length / 2)) // truncated mid-mdat
    ).toDF("id", "bytes")
    val pairs = ImageHash.videoNearDups(df, "id", "bytes", maxHamming = 6, minFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("image flood: hot banded buckets are capped, genuine near-dups survive") {
    // 20 byte-identical copies of one image flood every banded bucket
    // they hash into (n identical hashes -> an n² self-join at scale —
    // the blank-thumbnail/logo case); a genuine near-dup pair from a
    // different base must keep matching while the flood drops wholesale
    val flood = (100L until 120L).map(id => (id, ImageHash.plantedSpectralJpeg(50L)))
    val rows = Seq((0L, ImageHash.plantedSpectralJpeg(0L)),
      (1L, ImageHash.plantedSpectralJpeg(1L))) ++ flood
    val df = rows.toDF("id", "bytes").repartition(5)
    val capped = ImageHash.imageNearDups(df, "id", "bytes",
        maxHamming = 4, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L)), s"cap broke the genuine pair: $capped")
    // the "log" half sees exactly the 7 flooded (band, chunk) buckets
    val hot = ImageHash.hotMediaBuckets(
      ImageHash.phashFrames(df, "id", "bytes"), maxBucketSize = 10).collect()
    assert(hot.length == 7 && hot.forall(_.getAs[Long]("n") >= 20L),
      hot.mkString(";"))
    // uncapped (the 10k default), the flood's full pair matrix returns
    assert(ImageHash.imageNearDups(df, "id", "bytes", maxHamming = 4)
      .count() == 190L + 1L)
  }

  test("video flood: hot (band, chunk, frame) buckets are capped") {
    val flood = (100L until 112L).map(id => (id, ImageHash.plantedSpectralMp4(50L)))
    val rows = Seq((0L, ImageHash.plantedSpectralMp4(0L)),
      (1L, ImageHash.plantedSpectralMp4(1L))) ++ flood
    val df = rows.toDF("id", "bytes").repartition(4)
    val capped = ImageHash.videoNearDups(df, "id", "bytes",
        maxHamming = 6, minFrames = 3, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L)), s"cap broke the genuine pair: $capped")
    // uncapped: 12 identical videos -> C(12,2) pairs plus the real one
    assert(ImageHash.videoNearDups(df, "id", "bytes",
      maxHamming = 6, minFrames = 3).count() == 66L + 1L)
  }

  test("videoNearDups recovers pairs through Intra_4x4-coded MP4s") {
    import graft.pipeline.{H264Codec, Mp4Demux}
    // the r10 codec path end-to-end: same spectral content, qp-requant
    // pair (24 vs 28) encoded as Intra_4x4 macroblocks — pHash must
    // stay within the banded cut through the directional predictors
    def mp4(id: Long): Array[Byte] = {
      val qp = if (id % 2 == 0) 24 else 28
      val frames = (0 until 4).map(f => H264Codec.encode(
        ImageHash.spectralFrame((id / 2) * 61 + f * 17 + 3),
        avcc = true, qp = qp, intra4x4 = true))
      Mp4Demux.encodeMp4(frames, 64, 64)
    }
    val df = (0L until 12L).map(id => (id, mp4(id))).toDF("id", "bytes")
      .repartition(3)
    val got = ImageHash.videoNearDups(df, "id", "bytes",
        maxHamming = 6, minFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == (0L until 6L).map(b => (2 * b, 2 * b + 1, 4L)).toSet, got)
  }

  test("sceneSegments recovers planted shot boundaries exactly") {
    val df = Seq(
      (1L, ImageHash.plantedSceneMp4(1L, Seq(3, 2, 4))), // scenes at 0,3,5
      (2L, ImageHash.plantedSceneMp4(2L, Seq(5))), // one scene, no cut
      (9L, Array[Byte](0, 0, 0, 8)) // undecodable, must drop
    ).toDF("id", "bytes")
    val got = ImageHash.sceneSegments(df, "id", "bytes", maxHamming = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      (1L, 1L, 0, 2, 3L), (1L, 2L, 3, 4, 2L), (1L, 3L, 5, 8, 4L),
      (2L, 1L, 0, 4, 5L)), got.mkString(";"))
  }

  test("imageQuality: closed-form PNG fixture matches hand arithmetic") {
    // id=100: a=100, b=min(255, 100+40+32)=172 -> mean 136, range 72,
    // contrast 36.0; id=0: a=0 (left half full-black) -> saturated 0.5
    val df = Seq((100L, ImageHash.plantedQualityPng(100L)),
      (0L, ImageHash.plantedQualityPng(0L))).toDF("id", "bytes")
    val out = ImageHash.imageQuality(df, "id", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r100 = out(100L)
    assert(r100.getInt(1) == 64 && r100.getInt(2) == 64)
    assert(r100.getDouble(3) == 136.0 && r100.getLong(4) == 72L)
    assert(r100.getDouble(5) == 36.0 && r100.getDouble(6) == 0.0)
    val r0 = out(0L)
    assert(r0.getDouble(6) == 0.5) // the a=0 half is full-scale black
  }

  test("imageQuality decodes BMP and JPEG by magic, drops garbage") {
    val flat = graft.pipeline.MediaCodecs.Bmp(16, 16,
      Array.fill[Byte](16 * 16 * 3)(80))
    val df = Seq(
      (1L, graft.pipeline.MediaCodecs.encodeBmp(flat)),
      (2L, graft.pipeline.JpegCodec.encodeJpeg(flat, quality = 90)),
      (3L, Array[Byte](9, 9, 9))).toDF("id", "bytes")
    val rows = ImageHash.imageQuality(df, "id", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L).getDouble(3) == 80.0 && rows(1L).getLong(4) == 0L)
    // JPEG of a flat field decodes flat (DC-only) — contrast stays 0
    assert(rows(2L).getDouble(5) == 0.0)
  }

  test("undecodable blobs are dropped, not fatal") {
    val good = ImageHash.plantedSpectralJpeg(0L)
    val df = Seq(
      (0L, good), (1L, ImageHash.plantedSpectralJpeg(1L)),
      (9L, Array[Byte](1, 2, 3)), // not a JPEG
      (10L, good.take(good.length / 3)) // truncated stream
    ).toDF("id", "bytes")
    val hashed = ImageHash.phashFrames(df, "id", "bytes")
      .collect().map(_.getLong(0)).toSet
    assert(hashed.intersect(Set(0L, 1L)) == Set(0L, 1L))
    assert(!hashed.contains(9L))
    val pairs = ImageHash.imageNearDups(df, "id", "bytes", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }
}
