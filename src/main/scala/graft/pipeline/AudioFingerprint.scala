package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Audio fingerprinting and near-duplicate detection — the audio twin of
 * [[ImageHash]]: re-gained, re-dithered, or re-encoded copies of a
 * recording share almost all spectral landmarks, while different
 * recordings share almost none.
 *
 * The fingerprint is the classic landmark construction: the mono signal
 * is cut into non-overlapping 256-sample frames and each frame
 * contributes one landmark — its dominant DFT bin, position-coded as
 * (frame index << 16 | bin). Dominant-bin selection is invariant to gain
 * and robust to additive noise well below the signal (the peak magnitude
 * scales with the signal, the comparison is within-frame), which is
 * exactly the re-mastered-copy equivalence class a dedup pass needs.
 *
 * 100 TB posture: decode + fingerprint is a per-partition map over the
 * binary column; matching explodes to (landmark, id) and joins ON THE
 * LANDMARK — the [[Curation.ngramContamination]] shape — so the shuffle
 * carries landmark rows, never waveforms, and never goes doc × doc.
 */
object AudioFingerprint {

  /** frame length in mono samples; DFT bins searched = frameSize/2 */
  val FrameSize = 256

  /**
   * Position-coded spectral landmarks of a decoded WAV (first channel).
   * Naive DFT magnitude per frame — frames are 256 samples, so the scan
   * is O(n·128) integer-in/double-out and deterministic (fixed loop
   * order). Frames quieter than `minEnergy` (mean |sample|) emit no
   * landmark: silence has no dominant bin, only dither noise, and a
   * landmark from noise would make two silent recordings "match".
   */
  def landmarks(wav: MediaCodecs.Wav, minEnergy: Double = 64.0): Seq[Long] = {
    val ch = math.max(1, wav.channels)
    val n = wav.samples.length / ch
    val out = Seq.newBuilder[Long]
    var f = 0
    while ((f + 1) * FrameSize <= n) {
      val base = f * FrameSize * ch
      var mean = 0.0
      var i = 0
      while (i < FrameSize) {
        mean += math.abs(wav.samples(base + i * ch).toDouble)
        i += 1
      }
      if (mean / FrameSize >= minEnergy) {
        var bestBin = 0
        var bestMag = -1.0
        var k = 1
        while (k < FrameSize / 2) {
          var re = 0.0
          var im = 0.0
          i = 0
          while (i < FrameSize) {
            val ang = 2 * math.Pi * k * i / FrameSize
            val s = wav.samples(base + i * ch).toDouble
            re += s * math.cos(ang)
            im -= s * math.sin(ang)
            i += 1
          }
          val mag = re * re + im * im
          if (mag > bestMag) { bestMag = mag; bestBin = k }
          k += 1
        }
        out += (f.toLong << 16) | bestBin.toLong
      }
      f += 1
    }
    out.result()
  }

  /** (id, landmark) rows for every decodable WAV; undecodable or
    * landmark-free rows drop out (same contract as the other decode
    * paths). Map-only, then one explode. */
  /** Container-agnostic audio decode: WAV or FLAC (r12) — dedup and
    * quality must treat the SAME recording identically whichever
    * container it shipped in (FLAC is lossless, so its samples are the
    * WAV's bit-for-bit). */
  private def decodeAudio(bytes: Array[Byte]): Option[MediaCodecs.Wav] =
    if (FlacCodec.isFlac(bytes)) FlacCodec.decodeFlac(bytes)
    else MediaCodecs.decodeWav(bytes)

  def fingerprintRows(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        try decodeAudio(bytes).toSeq
          .flatMap(w => landmarks(w).map(l => (id, l)))
        catch { case scala.util.control.NonFatal(_) => Nil }
      }
      .toDF("id", "landmark")
  }

  /**
   * Audio near-duplicate pairs (id_a < id_b) sharing at least `minShared`
   * landmarks. The join key is the landmark, so a landmark shared by many
   * recordings fans out quadratically — `maxLandmarkDf` ENFORCES the
   * rarity the position coding usually provides: a landmark present in
   * more than that many recordings (mass-duplicated jingles, silence
   * floors, tone tests — the audio flood case) is dropped before the
   * self-join, the same hot-gram / capBuckets drop-and-log posture as
   * [[Dedup]]. The population is a count window over the join key —
   * one shuffle, shared with the self-join's exchange. Run
   * [[hotLandmarks]] alongside to see what was skipped.
   */
  def audioNearDups(df: DataFrame, idCol: String, bytesCol: String,
      minShared: Int = 8,
      maxLandmarkDf: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fp = Caps.capByCount(fingerprintRows(df, idCol, bytesCol),
      Seq("landmark"), maxLandmarkDf)
    fp.as("a").join(fp.as("b"),
        $"a.landmark" === $"b.landmark" && $"a.id" < $"b.id")
      .groupBy($"a.id".as("id_a"), $"b.id".as("id_b"))
      .agg(count(lit(1)).as("shared_landmarks"))
      .filter($"shared_landmarks" >= minShared)
  }

  /**
   * Standardize clips for training — the audio twin of the image
   * resize step: decode WAV → floor-mean downmix to mono → exact
   * linear resample to `outRateHz` ([[MediaCodecs.resampleWav]]) →
   * re-encode. Undecodable blobs drop, map-only (samples never leave
   * the partition). Every per-sample step is integer floor arithmetic,
   * so the registry fixture's DuckDB oracle replays the WHOLE signal
   * path — downmix, rational positions, interpolation — value-exactly.
   *
   * @return (id, bytes, sample_rate, n_samples) with bytes a mono WAV
   *         at `outRateHz`
   */
  def standardizeAudio(df: DataFrame, idCol: String, bytesCol: String,
      outRateHz: Int = 16000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        try decodeAudio(bytes).map { wav =>
          val mono = MediaCodecs.downmixMono(wav)
          val res = MediaCodecs.resampleWav(mono, outRateHz)
          (id, MediaCodecs.encodeWav(res), res.sampleRateHz, res.samples.length)
        } catch { case scala.util.control.NonFatal(_) => None }
      }
      .toDF("id", "bytes", "sample_rate", "n_samples")
  }

  /**
   * Lossless archival transcode — the corpus-compression step a 100 TB
   * audio crawl runs once: WAV (or already-FLAC) clips re-encode as
   * FLAC, map-only and embarrassingly parallel (samples never leave the
   * partition, no shuffle at all). Every row carries a `lossless`
   * verification bit — the transcode is DECODED BACK on the spot and
   * compared sample-exactly, so a codec defect can never silently
   * corrupt an archive (the write amplification is one in-memory
   * decode, far cheaper than discovering corruption at training time).
   * Undecodable blobs drop.
   *
   * @return (id, flac, orig_bytes, flac_bytes, lossless)
   */
  def archiveAudio(df: DataFrame, idCol: String, bytesCol: String,
      useLpc: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        try decodeAudio(bytes).map { wav =>
          val flac = FlacCodec.encodeFlac(wav, useLpc = useLpc)
          val back = FlacCodec.decodeFlac(flac)
          val lossless = back.exists(b =>
            b.sampleRateHz == wav.sampleRateHz && b.channels == wav.channels &&
              java.util.Arrays.equals(b.samples, wav.samples))
          (id, flac, bytes.length, flac.length, lossless)
        } catch { case scala.util.control.NonFatal(_) => None }
      }
      .toDF("id", "flac", "orig_bytes", "flac_bytes", "lossless")
  }

  /** Landmarks MORE frequent than `maxLandmarkDf`, with document
    * frequencies — the "log" half of [[audioNearDups]]'s drop-and-log:
    * each row is usually a mass-duplicated jingle/tone worth routing to
    * exact dedup instead. */
  def hotLandmarks(df: DataFrame, idCol: String, bytesCol: String,
      maxLandmarkDf: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    import df.sparkSession.implicits._
    fingerprintRows(df, idCol, bytesCol)
      .groupBy($"landmark").agg(count(lit(1)).as("n"))
      .filter($"n" > maxLandmarkDf)
  }

  /**
   * Audio-quality screen — the audio twin of the text quality rules: per
   * clip, the curation gates a speech/audio corpus filters on. All
   * integer or exactly-dyadic arithmetic up to one IEEE sqrt, so the
   * whole screen replays in SQL against a planted closed-form fixture:
   *
   *   - n_samples / sample_rate (duration as integers, no FP),
   *   - peak = max |sample| (first channel),
   *   - rms = round(sqrt(Σs² / n), 4) — sum in Long, ONE division by n,
   *     then sqrt, so an oracle reproducing that operand order gets the
   *     identical double,
   *   - clipping_ratio = round(#{|s| ≥ 32767} / n, 4) (full-scale hits —
   *     the clipped-recording screen),
   *   - silence_fraction = round(silent frames / complete frames, 4),
   *     a frame being silent when its mean |s| < `minEnergy` (the same
   *     256-sample frames and threshold [[landmarks]] uses).
   *
   * Undecodable rows drop out. Map-only at any scale.
   */
  def audioQuality(df: DataFrame, idCol: String, bytesCol: String,
      minEnergy: Double = 64.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        try decodeAudio(bytes).flatMap { wav =>
          val ch = math.max(1, wav.channels)
          val n = wav.samples.length / ch
          if (n == 0) None else {
            var peak = 0L
            var sumSq = 0L
            var clipped = 0L
            var i = 0
            while (i < n) {
              val s = math.abs(wav.samples(i * ch).toLong)
              if (s > peak) peak = s
              sumSq += s * s
              if (s >= 32767L) clipped += 1
              i += 1
            }
            val frames = n / FrameSize
            var silent = 0
            var f = 0
            while (f < frames) {
              var acc = 0.0
              i = 0
              while (i < FrameSize) {
                acc += math.abs(wav.samples((f * FrameSize + i) * ch).toDouble)
                i += 1
              }
              if (acc / FrameSize < minEnergy) silent += 1
              f += 1
            }
            Some((id, n.toLong, wav.sampleRateHz, peak,
              BigDecimal(math.sqrt(sumSq.toDouble / n))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
              BigDecimal(clipped.toDouble / n)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
              if (frames == 0) 0.0
              else BigDecimal(silent.toDouble / frames)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
        }.toSeq
        catch { case scala.util.control.NonFatal(_) => Nil }
      }
      .toDF("id", "n_samples", "sample_rate", "peak", "rms",
        "clipping_ratio", "silence_fraction")
  }

  /**
   * Closed-form quality fixture: a 16-frame square wave at amplitude
   * A = 1000 + (id % 40)·1000 (Short-clamped, so ids with A ≥ 33000 are
   * fully clipped) with the last id % 8 frames silent. Every screen
   * column is then integer arithmetic on (id % 40, id % 8) — the SQL
   * oracle recomputes them without decoding anything, which is what makes
   * the engine's decode+scan independently checkable.
   */
  def plantedQualityWav(id: Long): Array[Byte] = {
    val a = math.min(32767L, 1000L + (id % 40) * 1000L).toShort
    val nsil = (id % 8).toInt
    val samples = new Array[Short](16 * FrameSize)
    var i = 0
    while (i < (16 - nsil) * FrameSize) {
      samples(i) = if ((i / 16) % 2 == 0) a else (-a).toShort
      i += 1
    }
    MediaCodecs.encodeWav(MediaCodecs.Wav(8000, 1, samples))
  }

  /**
   * Deterministic planted near-duplicate WAV fixture, the audio analog of
   * [[ImageHash.plantedSpectralJpeg]]: ids 2b and 2b+1 play the SAME
   * LCG-seeded 16-tone sequence (tones on exact DFT bins 5..100 of the
   * 256-frame grid, 2 frames per tone, 8 kHz mono), but the odd id is
   * re-mastered: gain ×0.7 plus seeded ±300 dither under an 8000-amplitude
   * signal. Dominant bins survive re-mastering, so planted pairs share
   * (nearly) all 32 landmarks while distinct bases collide only by
   * seed coincidence — ImageHashSpec's audio twin pins the margins.
   */
  def plantedToneWav(id: Long): Array[Byte] = {
    val base = id / 2
    var s = base * 6364136223846793005L + 1442695040888963407L
    def next(): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) & 0x7fffff).toInt
    }
    val tones = Array.fill(16)(5 + next() % 96) // DFT bin per tone
    var d = id * 2862933555777941757L + 3037000493L
    def dither(): Int = {
      d = d * 2862933555777941757L + 3037000493L
      ((d >>> 40) % 601).toInt - 300
    }
    val gain = if (id % 2 == 0) 1.0 else 0.7
    val samples = new Array[Short](16 * 2 * FrameSize)
    var t = 0
    while (t < 16) {
      var i = 0
      while (i < 2 * FrameSize) {
        val ang = 2 * math.Pi * tones(t) * i / FrameSize
        val v = gain * 8000.0 * math.sin(ang) + (if (id % 2 == 0) 0 else dither())
        samples(t * 2 * FrameSize + i) = math.max(Short.MinValue,
          math.min(Short.MaxValue, v.round)).toShort
        i += 1
      }
      t += 1
    }
    MediaCodecs.encodeWav(MediaCodecs.Wav(8000, 1, samples))
  }
}
