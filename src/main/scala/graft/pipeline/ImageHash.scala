package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Perceptual image hashing (pHash) and image near-duplicate detection —
 * the multimodal twin of text SimHash: re-encoded, re-compressed, or
 * slightly-touched copies of an image land within a few bits of each
 * other, while unrelated images are ~half the hash apart.
 *
 * The hash is the classic DCT construction: luma → 32×32 box downsample →
 * 2-D DCT-II → the 8×8 low-frequency corner minus the DC term (63 AC
 * coefficients) → one bit per coefficient, set iff the coefficient
 * exceeds their median. Low-frequency structure survives JPEG
 * requantization; per-pixel noise and entropy-coding differences do not.
 *
 * 100 TB posture: decode + hash is a per-partition map over the binary
 * column (no shuffle, no driver round-trip); the near-dup join shuffles
 * (id, 63-bit hash) pairs only — never pixels — through the same
 * banded-LSH shape as [[Dedup.simhashNearDups]]: 7 bands × 9 bits, so any
 * pair within Hamming ≤ 6 shares at least one band bucket (pigeonhole)
 * and the verifier is one `bit_count(xor)` per candidate.
 */
object ImageHash {

  /** downsampled side; DCT size */
  private val S = 32

  /** DCT-II basis cos(π(2x+1)u / 2S) for the 32-point transform, built
    * once — deterministic doubles, same values in every JVM. */
  private lazy val cosTable: Array[Array[Double]] = {
    val t = Array.ofDim[Double](S, S)
    var u = 0
    while (u < S) {
      var x = 0
      while (x < S) {
        t(u)(x) = math.cos(math.Pi * (2 * x + 1) * u / (2.0 * S))
        x += 1
      }
      u += 1
    }
    t
  }

  /**
   * 63-bit perceptual hash of a decoded image (bit i of the result = AC
   * coefficient i in row-major (u,v) order, skipping (0,0), above the
   * median). Integer luma and box sums keep everything before the DCT
   * exact; the DCT itself runs a fixed loop order, so the hash is a pure
   * function of the pixels.
   */
  def phash64(img: MediaCodecs.Bmp): Long = {
    val w = img.width
    val h = img.height
    require(w > 0 && h > 0, "phash64: empty image")
    // integer luma (Rec.601 weights ×1000)
    val luma = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val o = i * 3
      luma(i) = ((img.rgb(o) & 0xff) * 299 + (img.rgb(o + 1) & 0xff) * 587 +
        (img.rgb(o + 2) & 0xff) * 114)
      i += 1
    }
    // box-resample to S×S: each target cell averages its (possibly
    // fractionally overlapping) source box using integer pixel-index
    // bounds — floor boxes, never empty (max(1) span)
    val g = Array.ofDim[Double](S, S)
    var ty = 0
    while (ty < S) {
      val y0 = ty * h / S
      val y1 = math.max(y0 + 1, (ty + 1) * h / S)
      var tx = 0
      while (tx < S) {
        val x0 = tx * w / S
        val x1 = math.max(x0 + 1, (tx + 1) * w / S)
        var acc = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { acc += luma(y * w + x); x += 1 }
          y += 1
        }
        g(ty)(tx) = acc.toDouble / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    // separable 2-D DCT-II, low 8×8 corner only
    val rows = Array.ofDim[Double](S, 8) // DCT along x, keep u<8
    var y = 0
    while (y < S) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < S) { s += g(y)(x) * cosTable(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](63)
    var v = 0
    var k = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        if (u != 0 || v != 0) {
          var s = 0.0
          var yy = 0
          while (yy < S) { s += rows(yy)(u) * cosTable(v)(yy); yy += 1 }
          coef(k) = s
          k += 1
        }
        u += 1
      }
      v += 1
    }
    val sorted = coef.sorted
    val median = (sorted(31) + sorted(32)) / 2.0 // 63 values: mid-pair of the
    // even-split convention so exactly ≤31 bits can sit above a heavy tie
    var bits = 0L
    i = 0
    while (i < 63) {
      if (coef(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /**
   * (id, phash) for every decodable JPEG in `bytesCol`; undecodable rows
   * are dropped (same contract as the other decode paths — a corrupt blob
   * must not fail the stage). Map-only at any scale.
   */
  def phashFrames(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        try JpegCodec.decodeJpeg(bytes).map(img => (id, phash64(img)))
        catch { case scala.util.control.NonFatal(_) => None }
      }
      .toDF("id", "phash")
  }

  /**
   * Deterministic planted near-duplicate JPEG fixture: ids 2b and 2b+1
   * render the SAME spectrally-dense content (every low-band DCT basis
   * pair (u,v)<8 with an LCG-seeded ±14 amplitude, seed = b) but encode
   * at different JPEG qualities (85 vs 78) — the re-compressed-copy
   * scenario pHash exists for. Dense low-band energy makes all 63 hash
   * bits decisive: measured on the first 50 bases, planted pairs sit ≤ 2
   * bits apart and distinct bases ≥ 20, so a Hamming-4 cut recovers
   * exactly the planted pairs — which is what the q_image_phash_dedup
   * oracle asserts, end-to-end through the real encoder and decoder.
   */
  def plantedSpectralJpeg(id: Long): Array[Byte] =
    JpegCodec.encodeJpeg(spectralFrame(id / 2),
      quality = if (id % 2 == 0) 85 else 78)

  /**
   * Image-quality screen — brightness / contrast / saturation gates for
   * image-corpus curation, the image twin of the audio and text quality
   * rules. Per image: width, height, mean luma (integer Rec.601, exact
   * for grayscale), luma range, round(stddev, 4) as contrast, and the
   * fraction of full-scale pixels (luma 0 or 255 — the blown-
   * highlight/crushed-black screen). Decodes PNG, BMP, or JPEG by magic;
   * undecodable rows drop out. Map-only at any scale.
   *
   * Sums run in Long and the variance divides ONCE by n before the sqrt,
   * so a fixture with dyadic pixel counts replays the doubles exactly in
   * SQL (same operand-order discipline as [[AudioFingerprint.audioQuality]]).
   */
  def imageQuality(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        try decodeAny(bytes).flatMap { img =>
          val n = img.width.toLong * img.height
          if (n == 0) None else {
            var sum = 0L
            var sumSq = 0L
            var mn = 255L
            var mx = 0L
            var sat = 0L
            var i = 0
            while (i < n) {
              val o = i.toInt * 3
              val l = ((img.rgb(o) & 0xff) * 299 + (img.rgb(o + 1) & 0xff) * 587 +
                (img.rgb(o + 2) & 0xff) * 114) / 1000
              sum += l; sumSq += l.toLong * l
              if (l < mn) mn = l
              if (l > mx) mx = l
              if (l == 0L || l == 255L) sat += 1
              i += 1
            }
            val mean = sum.toDouble / n
            val variance = sumSq.toDouble / n - mean * mean
            Some((id, img.width, img.height,
              BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
              mx - mn,
              BigDecimal(math.sqrt(math.max(0.0, variance)))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
              BigDecimal(sat.toDouble / n)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
        }.toSeq
        catch { case scala.util.control.NonFatal(_) => Nil }
      }
      .toDF("id", "width", "height", "mean_luma", "luma_range",
        "contrast", "saturated_fraction")
  }

  private def decodeAny(bytes: Array[Byte]): Option[MediaCodecs.Bmp] =
    MediaCodecs.decodePng(bytes)
      .orElse(MediaCodecs.decodeBmp(bytes))
      .orElse(JpegCodec.decodeJpeg(bytes))

  /**
   * Closed-form quality fixture (losslessly PNG-encoded, so the decoded
   * pixels ARE the formula): a 64×64 grayscale image, left half value
   * a = id % 200, right half b = min(255, a + 40 + 8·(id % 16)). Every screen
   * column is then integer-or-dyadic arithmetic on (a, b) — mean =
   * (a+b)/2, range = b−a, contrast = (b−a)/2 EXACTLY (two-value variance
   * is a perfect square, and IEEE sqrt of a perfect square is exact) —
   * which the SQL oracle recomputes without inflating a single byte.
   */
  def plantedQualityPng(id: Long): Array[Byte] = {
    val a = (id % 200).toInt
    val b = math.min(255L, a + 40 + (id % 16) * 8).toInt
    val w = 64; val h = 64
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (if (x < w / 2) a else b).toByte
        val o = (y * w + x) * 3
        rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        x += 1
      }
      y += 1
    }
    MediaCodecs.encodePng(MediaCodecs.Bmp(w, h, rgb))
  }

  /** One 64×64 grayscale frame of LCG-seeded spectrally-dense content —
    * the shared renderer behind both planted media fixtures. */
  private[graft] def spectralFrame(seed: Long): MediaCodecs.Bmp = {
    var s = seed * 6364136223846793005L + 1442695040888963407L
    def next(): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) & 0x7fffff).toInt
    }
    val w = 64; val h = 64
    val signs = Array.tabulate(8, 8)((u, v) =>
      if (u == 0 && v == 0) 0.0 else if (next() % 2 == 0) 14.0 else -14.0)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var p = 128.0
        var fu = 0
        while (fu < 8) {
          var fv = 0
          while (fv < 8) {
            p += signs(fu)(fv) *
              math.cos(math.Pi * (2 * x + 1) * fu / (2.0 * w)) *
              math.cos(math.Pi * (2 * y + 1) * fv / (2.0 * h))
            fv += 1
          }
          fu += 1
        }
        val c = math.max(0, math.min(255, p.round.toInt))
        val o = (y * w + x) * 3
        rgb(o) = c.toByte; rgb(o + 1) = c.toByte; rgb(o + 2) = c.toByte
        x += 1
      }
      y += 1
    }
    MediaCodecs.Bmp(w, h, rgb)
  }

  /**
   * Planted near-duplicate MP4 fixture, the video leg of the triad: ids
   * 2b and 2b+1 carry the SAME four spectral frames, H.264-encoded
   * (real Intra_16x16 + CAVLC) at different quantizers (qp 26 vs 32 —
   * the re-encoded-copy scenario), muxed as spec-valid single-track MP4s.
   */
  def plantedSpectralMp4(id: Long): Array[Byte] = {
    val base = id / 2
    val qp = if (id % 2 == 0) 26 else 32
    val frames = (0 until 4).map(f =>
      H264Codec.encode(spectralFrame(base * 41 + f * 101 + 7), avcc = true, qp = qp))
    Mp4Demux.encodeMp4(frames, 64, 64)
  }

  /** Planted MP4 with KNOWN scene structure: scene s holds
    * `sceneLens(s)` frames of one spectral content, re-encoded per
    * frame at alternating qp (within-scene pHash distance ≤ 6 by the
    * fixture margins), with adjacent scenes on different content
    * (distance ≥ 10) — so [[sceneSegments]]' expected output is
    * closed-form. */
  private[graft] def plantedSceneMp4(id: Long, sceneLens: Seq[Int]): Array[Byte] = {
    val frames = sceneLens.zipWithIndex.flatMap { case (n, s) =>
      (0 until n).map { f =>
        H264Codec.encode(spectralFrame((id * 977 + s) * 53 + 11), avcc = true,
          qp = if (f % 2 == 0) 24 else 28)
      }
    }
    Mp4Demux.encodeMp4(frames, 64, 64)
  }

  /** IPPP variant of [[plantedSceneMp4]] (r11): each scene is a real
    * inter-coded GOP — an IDR of the scene content followed by P
    * frames of the SAME content (mostly P_Skip after requantization),
    * the shape real MP4s carry. Only each scene's first frame is
    * intra, so [[sceneSegments]] over this fixture exercises the
    * motion-compensated decode path; the expected segment table is the
    * same closed form (within-scene pHash distance 0, cross-scene by
    * the spectral-content margins). */
  private[graft] def plantedSceneMp4Ipp(id: Long, sceneLens: Seq[Int]): Array[Byte] = {
    val frames = sceneLens.zipWithIndex.flatMap { case (n, s) =>
      val f = spectralFrame((id * 977 + s) * 53 + 11)
      H264Codec.encodeGop(Seq.fill(n)(f), qp = 24)
    }
    Mp4Demux.encodeMp4(frames, 64, 64)
  }

  /** B-coded twin (r12): each scene an IbP GOP, samples in DECODE order
    * with a real ctts table carrying the decode→display mapping — the
    * shape ffmpeg/x264 MP4s actually have. Recovering the planted
    * segments proves videoPhashRows labels frames by PRESENTATION index
    * (a decode-order labeling would split every 3-frame scene). */
  private[graft] def plantedSceneMp4B(id: Long, sceneLens: Seq[Int]): Array[Byte] = {
    val perScene = sceneLens.zipWithIndex.map { case (n, s) =>
      val f = spectralFrame((id * 977 + s) * 53 + 11)
      H264Codec.encodeGopB(Seq.fill(n)(f), qp = 24, bFrames = 1)
    }
    val samples = perScene.flatMap(_._1)
    val displayGlobal = {
      var base = 0
      perScene.flatMap { case (_, disp) =>
        val out = disp.map(_ + base); base += disp.length; out
      }
    }
    val n = samples.length
    val delay = math.max(0, (0 until n).map(k => k - displayGlobal(k)).max)
    val cts = (0 until n).map(k => displayGlobal(k) + delay - k)
    Mp4Demux.encodeMp4(samples, 64, 64, ctsOffsets = Some(cts))
  }

  /**
   * Shot-boundary segmentation — the frame-sampling policy real video
   * pipelines want instead of uniform-n ([[Multimodal.sampleFrames]]):
   * a frame OPENS a new scene when its pHash is more than `maxHamming`
   * bits from the previous frame's. Downstream, one frame per scene is
   * the right training sample; `n_frames` weights it.
   *
   * Scale shape: per-video lag + running boundary count = two passes
   * over ONE frame-ordered window per video (frames-per-video sized,
   * keyed by video id — videos parallelize), then a (video, scene)
   * hash aggregate. The decode is [[videoPhashRows]]' map-only path.
   *
   * @return (id, scene 1-based, start_frame, end_frame, n_frames)
   */
  def sceneSegments(df: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"frame")
    videoPhashRows(df, idCol, bytesCol)
      .withColumn("__prev", lag($"phash", 1).over(w))
      .withColumn("__b", when($"__prev".isNull ||
        bit_count($"phash".bitwiseXOR($"__prev")) > maxHamming, 1L).otherwise(0L))
      .withColumn("scene", sum($"__b").over(w))
      .groupBy($"id", $"scene")
      .agg(min($"frame").as("start_frame"), max($"frame").as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  /**
   * (id, frame, phash) for every decodable H.264 sample of every
   * demuxable MP4: demux resolves exact sample byte ranges from the
   * stsz×stsc×stco tables, and the sample sequence decodes as a GOP
   * ([[H264Codec.decodeGop]], r11) — all-intra samples decode exactly
   * as before, and IPPP streams (the shape real MP4s carry) now
   * motion-compensate through their reference chain. A corrupt sample
   * drops out (poisoning only the frames that referenced it, until the
   * next IDR) instead of failing the stage. Map-only — pixels never
   * leave the partition.
   */
  def videoPhashRows(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(bytesCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // crashSafe, not a bare try: the body is LAZY (it runs when
        // Spark consumes the iterator, outside any try wrapped around
        // construction), so the corrupt-drop contract must guard
        // consumption — an exception mid-iteration truncates this
        // video's remaining frames instead of failing the task
        crashSafe {
          Mp4Demux.demux(bytes).iterator.flatMap { info =>
            val t = info.videoTrack
            // frame numbers are PRESENTATION indices (ctts-derived;
            // identity for IPPP tracks): B-coded MP4s carry samples in
            // decode order, and scene/near-dup analysis downstream
            // sorts by frame — labeling by what a viewer sees keeps
            // that analysis honest without buffering a reorder window
            val pres = t.presentationIndex
            // fully lazy: one compressed sample + one decoded frame in
            // flight at a time (the GOP decoder keeps only its
            // reference frame) — a long video never materializes all
            // its frames on the executor
            val sampleIt = Iterator.tabulate(t.nSamples.toInt) { i =>
              try Mp4Demux.sampleBytes(bytes, t, i)
              catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
            }
            H264Codec.decodeGopIterator(sampleIt).zipWithIndex.collect {
              case (Some(img), i) => (id, pres(i), phash64(img))
            }
          }
        }
      }
      .toDF("id", "frame", "phash")
  }

  /** Iterator whose construction AND consumption are exception-proof:
    * a NonFatal anywhere ends iteration (dropping the remainder) — the
    * corrupt-input posture for lazy per-row iterators handed to Spark,
    * where a try around construction alone would not cover the
    * consumption-time body. Prefetches one element, so failures surface
    * as truncation, never as a task failure. */
  private def crashSafe[T](mk: => Iterator[T]): Iterator[T] = new Iterator[T] {
    private val it =
      try mk catch { case scala.util.control.NonFatal(_) => Iterator.empty[T] }
    private var nextV: Option[T] = fetch()
    private def fetch(): Option[T] =
      try { if (it.hasNext) Some(it.next()) else None }
      catch { case scala.util.control.NonFatal(_) => None }
    def hasNext: Boolean = nextV.isDefined
    def next(): T = { val v = nextV.get; nextV = fetch(); v }
  }

  /** Keep only banded-LSH buckets with ≤ `maxBucketSize` members — the
    * [[Dedup]] `capBuckets` posture ported to the media joins, because
    * a media flood is the NORMAL skew case at web scale (blank
    * thumbnails, logo frames, silence): one bucket of n identical
    * hashes is an n² self-join. The population is an unordered count
    * window over the join key itself — on the sort-merge scale path
    * (the 100 TB case) that hash exchange IS the join's own, so the
    * cap adds no stage; when the planner broadcasts one side instead
    * (small inputs), the window costs the one exchange it needs —
    * measured cheaper than the uncapped join even at bench scale. A
    * duplicate CLUSTER larger than the cap is dropped wholesale (run
    * [[hotMediaBuckets]] alongside to see exactly what was skipped —
    * such clusters are better routed to exact byte/hash dedup). */
  private def capBanded(banded: DataFrame, keys: Seq[String],
      maxBucketSize: Int): DataFrame =
    Caps.capByCount(banded, keys, maxBucketSize)

  /** The "log" half of the media drop-and-log: banded buckets LARGER
    * than `maxBucketSize`, with populations — run next to a capped
    * [[videoNearDups]]/[[imageNearDups]] to quantify what was skipped.
    * Pass the (id[, frame], phash) rows from [[phashFrames]] /
    * [[videoPhashRows]]. */
  def hotMediaBuckets(hashed: DataFrame,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    import hashed.sparkSession.implicits._
    val keyCols = hashed.columns.filter(_ == "frame").toSeq
    bandChunks(hashed)
      .groupBy(($"band" +: $"chunk" +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .filter($"n" > maxBucketSize)
  }

  /** 7×9-bit banded chunks of the 63-bit pHash — the shared LSH
    * explode of [[imageNearDups]] and [[videoNearDups]] (complete for
    * Hamming distance ≤ 6 by pigeonhole). */
  private def bandChunks(hashed: DataFrame): DataFrame = {
    import hashed.sparkSession.implicits._
    hashed.select(hashed.columns.map(col) :+
        posexplode(array((0 until 7).map(b =>
          shiftright($"phash", b * 9).bitwiseAND(lit(0x1FFL))): _*)): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
  }

  /**
   * Video near-duplicate pairs (id_a < id_b): two videos match when at
   * least `minFrames` ALIGNED frame indices hash within `maxHamming`
   * bits (the re-encoded/re-muxed copy class — temporal re-edits are a
   * retrieval problem, not a dedup one). Same banded-LSH shape as
   * [[imageNearDups]] with the frame index folded into the join key, so
   * only (id, frame, hash) rows shuffle; buckets over `maxBucketSize`
   * drop before the self-join ([[capBanded]] — a flood of identical
   * frames is otherwise quadratic in the flood size).
   */
  def videoNearDups(df: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 4, minFrames: Int = 3,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 6,
      s"videoNearDups: 7 bands certify maxHamming <= 6, got $maxHamming")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = videoPhashRows(df, idCol, bytesCol)
    val banded = capBanded(bandChunks(hashed),
      Seq("band", "chunk", "frame"), maxBucketSize)
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.chunk" === $"b.chunk" &&
          $"a.frame" === $"b.frame" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"), $"a.frame".as("frame"),
        bit_count($"a.phash".bitwiseXOR($"b.phash")).as("hamming"))
      .dropDuplicates("id_a", "id_b", "frame")
      .filter($"hamming" <= maxHamming)
      .groupBy($"id_a", $"id_b")
      .agg(count(lit(1)).as("matched_frames"))
      .filter($"matched_frames" >= minFrames)
  }

  /**
   * Image near-duplicate pairs (id_a < id_b) within `maxHamming` bits:
   * banded LSH over 7×9-bit chunks of the 63-bit hash — complete for
   * maxHamming ≤ 6 by pigeonhole — then exact `bit_count(xor)`
   * verification. Only (id, hash) rows ever shuffle; buckets over
   * `maxBucketSize` drop before the self-join ([[capBanded]]).
   */
  def imageNearDups(df: DataFrame, idCol: String, bytesCol: String,
      maxHamming: Int = 4,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 6,
      s"imageNearDups: 7 bands certify maxHamming <= 6, got $maxHamming")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = phashFrames(df, idCol, bytesCol)
    val banded = capBanded(bandChunks(hashed),
      Seq("band", "chunk"), maxBucketSize)
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.chunk" === $"b.chunk" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        bit_count($"a.phash".bitwiseXOR($"b.phash")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter($"hamming" <= maxHamming)
  }
}
