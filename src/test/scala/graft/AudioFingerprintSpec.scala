package graft

import graft.pipeline.{AudioFingerprint, MediaCodecs}
import org.apache.spark.sql.functions._

/** Audio-landmark validation: re-master invariance vs cross-content
  * separation on the planted tone fixture, join parity with the
  * brute-force overlap count, silence suppression, and the corrupt-blob
  * drop contract. */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def lm(id: Long): Set[Long] =
    AudioFingerprint.landmarks(
      MediaCodecs.decodeWav(AudioFingerprint.plantedToneWav(id))
        .getOrElse(fail("fixture must decode"))).toSet

  test("planted fixture: pairs share almost all landmarks, bases almost none") {
    val sets = (0L until 40L).map(id => id -> lm(id)).toMap
    val planted = (0L until 20L).map(b => sets(2 * b).intersect(sets(2 * b + 1)).size)
    assert(planted.min >= 28, s"re-mastering broke landmarks: ${planted.min}/32")
    val cross = for {
      a <- 0L until 40L; b <- (a + 1) until 40L if a / 2 != b / 2
    } yield sets(a).intersect(sets(b)).size
    assert(cross.max <= 4, s"cross-base landmark collision: ${cross.max}")
  }

  test("landmarks are gain-invariant and silence-suppressed") {
    val tone = Array.tabulate[Short](4 * AudioFingerprint.FrameSize)(i =>
      (6000 * math.sin(2 * math.Pi * 17 * i / AudioFingerprint.FrameSize)).toInt.toShort)
    val loud = AudioFingerprint.landmarks(MediaCodecs.Wav(8000, 1, tone))
    val quiet = AudioFingerprint.landmarks(MediaCodecs.Wav(8000, 1,
      tone.map(s => (s / 8).toShort)))
    assert(loud == quiet && loud.size == 4)
    assert(loud.forall(l => (l & 0xffffL) == 17L))
    // true silence (sub-threshold) emits nothing
    val silent = AudioFingerprint.landmarks(
      MediaCodecs.Wav(8000, 1, Array.fill[Short](4 * AudioFingerprint.FrameSize)(10)))
    assert(silent.isEmpty)
  }

  test("audioNearDups equals the brute-force overlap join on the fixture") {
    val rows = (0L until 30L).map(id => (id, AudioFingerprint.plantedToneWav(id)))
    val df = rows.toDF("id", "bytes").repartition(4)
    val got = AudioFingerprint.audioNearDups(df, "id", "bytes", minShared = 8)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = rows.map { case (id, _) => id -> lm(id) }
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && sa.intersect(sb).size >= 8
    } yield (ia, ib)).toSet
    assert(got == brute)
    assert(got == (0L until 15L).map(b => (2 * b, 2 * b + 1)).toSet)
  }

  test("audio flood: hot landmarks are dropped, genuine pair survives") {
    // 20 byte-identical copies of one clip give every one of its
    // landmarks a document frequency of 20 — uncapped, a C(20,2) pair
    // matrix per landmark (the mass-duplicated-jingle case)
    val flood = (100L until 120L).map(id => (id, AudioFingerprint.plantedToneWav(50L)))
    val rows = Seq((0L, AudioFingerprint.plantedToneWav(0L)),
      (1L, AudioFingerprint.plantedToneWav(1L))) ++ flood
    val df = rows.toDF("id", "bytes").repartition(4)
    val capped = AudioFingerprint.audioNearDups(df, "id", "bytes",
        minShared = 8, maxLandmarkDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L)), s"cap broke the genuine pair: $capped")
    // the "log" half reports the flood's whole landmark set
    val hot = AudioFingerprint.hotLandmarks(df, "id", "bytes",
      maxLandmarkDf = 10).collect()
    assert(hot.length >= 28 && hot.forall(_.getAs[Long]("n") >= 20L),
      s"${hot.length} hot landmarks")
    // uncapped (the 10k default), the flood's full pair matrix returns
    assert(AudioFingerprint.audioNearDups(df, "id", "bytes", minShared = 8)
      .count() == 190L + 1L)
  }

  test("audioQuality: closed-form fixture columns match hand arithmetic") {
    // id=35: a = 1000 + 35*1000 = 36000 -> clamped 32767, fully clipped;
    // nsil = 3 -> silence 3/16, clipping (16-3)/16
    val df = Seq((35L, AudioFingerprint.plantedQualityWav(35L)),
      (2L, AudioFingerprint.plantedQualityWav(2L))).toDF("id", "bytes")
    val out = AudioFingerprint.audioQuality(df, "id", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    val c = out(35L)
    assert(c.getLong(1) == 4096L && c.getInt(2) == 8000)
    assert(c.getLong(3) == 32767L)
    assert(c.getDouble(5) == 0.8125) // clipping_ratio (16-3)/16
    assert(c.getDouble(6) == 0.1875) // silence_fraction 3/16
    val q = out(2L) // a = 3000, nsil = 2: no clipping
    assert(q.getLong(3) == 3000L && q.getDouble(5) == 0.0)
    assert(q.getDouble(6) == 0.125)
    assert(q.getDouble(4) ==
      BigDecimal(math.sqrt(3000.0 * 3000.0 * 14 * 256 / 4096.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("audioQuality reads the first channel of stereo and drops empties") {
    // stereo: L = loud square, R = zeros; screen must report the L channel
    val n = 2 * AudioFingerprint.FrameSize
    val inter = new Array[Short](2 * n)
    (0 until n).foreach { i =>
      inter(2 * i) = if ((i / 16) % 2 == 0) 5000 else -5000
      inter(2 * i + 1) = 0
    }
    val df = Seq(
      (1L, MediaCodecs.encodeWav(MediaCodecs.Wav(8000, 2, inter))),
      (2L, MediaCodecs.encodeWav(MediaCodecs.Wav(8000, 1, Array.empty[Short])))
    ).toDF("id", "bytes")
    val rows = AudioFingerprint.audioQuality(df, "id", "bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L)) // the empty clip drops out
    assert(rows(1L).getLong(3) == 5000L)
    assert(rows(1L).getDouble(6) == 0.0)
  }

  test("undecodable blobs are dropped, not fatal") {
    val df = Seq(
      (0L, AudioFingerprint.plantedToneWav(0L)),
      (1L, AudioFingerprint.plantedToneWav(1L)),
      (9L, Array[Byte](82, 73, 70, 70)), // RIFF magic, then truncation
      (10L, Array[Byte](1, 2, 3))
    ).toDF("id", "bytes")
    val pairs = AudioFingerprint.audioNearDups(df, "id", "bytes", minShared = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }
}
