package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for the sessionizer (ms epoch keeps the state tuple compact). */
case class SessionEvent(user_id: Long, tsMs: Long, value: Double)

/** Open-session state carried between micro-batches. */
case class OpenSession(startMs: Long, endMs: Long, events: Long, valueSum: Double)

case class SessionOut(
    user_id: Long, session_start: String, session_end: String,
    events: Long, value_sum: Double)

/** One observation for the streaming EWMA (µs epoch — exact ts algebra). */
case class EwmaEvent(user_id: Long, tsUs: Long, event_id: Long, value: Double)

/** Rolling-window state for the streaming z-score: the key's most recent
  * ≤ lookback observations, oldest first — bounded, watermark-free. */
case class ZscoreBuf(values: List[Double])

case class ZscoreOut(user_id: Long, tsUs: Long, event_id: Long,
    value: Double, z: Option[Double], is_anomaly: Boolean)

/** EWMA state carried between micro-batches: the last smoothed value. */
case class EwmaCarry(s: Double)

case class EwmaOut(user_id: Long, tsUs: Long, event_id: Long,
    value: Double, ewma: Double)

/** Holt state carried between micro-batches: level + trend. */
case class HoltCarry(l: Double, b: Double)

/** CUSUM state carried between micro-batches: the calibration buffer
  * (≤ baselineN observations, held until the baseline mean freezes) or,
  * once frozen, the mean plus the two one-sided sums. */
case class CusumCarry(pending: List[EwmaEvent], mu: Double, frozen: Boolean,
    hi: Double, lo: Double)

case class CusumOut(user_id: Long, tsUs: Long, event_id: Long, value: Double,
    mu: Double, cusum_hi: Double, cusum_lo: Double,
    alarm_hi: Boolean, alarm_lo: Boolean)

case class HoltOut(user_id: Long, tsUs: Long, event_id: Long,
    value: Double, level: Double, trend: Double, forecast: Double)

/**
 * Structured Streaming surface over the `events` table: event-time windowed
 * aggregation with a watermark. This is *new* capability relative to the
 * reference (which has no streaming at all — SURVEY.md §2.9); designed to
 * Spark idioms directly: file source → watermark → tumbling window →
 * stateful agg → sink.
 */
object EventsStream {

  private val counter = new AtomicInteger(0)

  /** UTC "yyyy-MM-dd HH:mm:ss" from epoch ms; a static helper (not a
    * captured formatter) so stateful-streaming closures stay serializable. */
  private def formatMs(ms: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ms))

  /**
   * Hourly tumbling-window counts/sums per event type, executed as a
   * streaming query over the parquet file source and drained synchronously
   * (memory sink, complete mode). Output matches the equivalent batch
   * aggregation bit-for-bit, so it shares the batch DuckDB oracle.
   */
  /** The file stream source requires a *directory* (its basePath), but the
    * test tables are single parquet files — expose the events file through a
    * per-call temp directory symlink. */
  /** copies > 1 simulates at-least-once redelivery: the same file exposed
    * under several names, every event arriving `copies` times. Location
    * fixed per (source path, copies) and staleness-refreshed — StreamDirs. */
  private def streamableEventsDir(dir: String, copies: Int = 1): String =
    StreamDirs.linkedDir("graft_events_stream",
      java.nio.file.Paths.get(dir, "events.parquet"),
      (0 until copies).map(i => s"events_$i.parquet"))

  /** streaming read of the events file; `ts` is normalized to µs
    * TimestampType whatever the file's physical layout (nanos-as-long or
    * timestamp[us] — see Registry.normalizeEventTs) */
  private def eventsStream(spark: SparkSession, dir: String,
      copies: Int = 1, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    graft.queries.Registry.normalizeEventTs(
      reader.parquet(streamableEventsDir(dir, copies)))
  }

  def hourlyWindowed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = s"graft_events_hourly_${counter.incrementAndGet()}"
    val q = hourlyAggregate(eventsStream(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"hour", $"event_type")
  }

  /**
   * Exactly-once aggregation over at-least-once delivery: every event is
   * delivered TWICE (the source directory exposes the same file under two
   * names), and streaming `dropDuplicates` on the event id reduces the
   * stream back to the logical input — per-user counts then equal the
   * batch aggregation, so the plain SQL oracle applies. At scale the
   * watermarked variant (`dropDuplicatesWithinWatermark`) bounds the dedup
   * state; the unbounded form is exact and fine for a verification run.
   */
  def dedupedUserCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = s"graft_dedup_counts_${counter.incrementAndGet()}"
    // one file per micro-batch → the duplicate delivery arrives in a
    // SECOND batch, exercising cross-batch dedup state, not just
    // within-batch distinct
    val q = eventsStream(spark, dir, copies = 2, maxFilesPerTrigger = Some(1))
      .dropDuplicates("event_id")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"user_id")
  }

  /** The watermarked hourly aggregation shared by `hourlyWindowed`,
    * `hourlyToFileSink`, and the late-data replay spec: 1-hour watermark,
    * 1-hour tumbling windows per event type. Factored out so the
    * drop/evict boundary proven on a controlled multi-batch source is the
    * SAME plan the sink queries run. */
  private[graft] def hourlyAggregate(stream: DataFrame): DataFrame = {
    import stream.sparkSession.implicits._
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("hour"),
        $"event_type", $"n", $"total_value")
  }

  /** Watermarked-dedup + per-user aggregation shared by
    * `dedupedUserCountsWatermarked` and the late-data replay spec. */
  private[graft] def dedupWatermarkedAggregate(stream: DataFrame,
      horizon: String): DataFrame = {
    import stream.sparkSession.implicits._
    stream
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
  }

  /**
   * Append-mode windowed aggregation into an exactly-once PARQUET file
   * sink (checkpointed) — the production sink shape, where finalized
   * windows land in files and the checkpoint makes restarts idempotent.
   * Append mode only emits a window once the watermark passes its end, so
   * with a bounded source the output is every window whose end ≤
   * max(event time) − delay: deterministic, and the batch oracle applies
   * with exactly that cutoff. (The trailing window never finalizes — the
   * semantics, not a bug.)
   */
  def hourlyToFileSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = counter.incrementAndGet()
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_file_sink_${ProcessHandle.current().pid()}_$run")
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val q = hourlyAggregate(eventsStream(spark, dir))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(out).orderBy($"hour", $"event_type")
  }

  /**
   * Streaming CDC apply: a change stream maintained as a keyed parquet
   * SNAPSHOT (current state per user) via foreachBatch — each micro-batch
   * compacts to its latest row per key (`Merge.latestByKey`) and applies
   * with the version-aware upsert (`Merge.versionedUpsert`), writing a new
   * snapshot version per batch (the table-format pattern: versions are
   * immutable, the latest pointer advances).
   *
   * The change stream is deliberately NOT time-ordered: events split
   * round-robin by id into three files (one per trigger), so micro-batches
   * interleave event times and a naive last-write-wins apply would corrupt
   * the snapshot. `versionedUpsert` ignores stale updates, so the stream
   * converges to exactly the batch `latestByKey` over all events — which
   * is the oracle. Scale: one key shuffle per batch; at 100 TB the base
   * would be bucketed by key (Formats.writeBucketed) making each apply
   * exchange-free on the snapshot side.
   */
  def snapshotUpsertSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = counter.incrementAndGet()
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_upsert_sink_${ProcessHandle.current().pid()}_$run")
    val incoming = base.resolve("incoming").toString
    val ckpt = base.resolve("ckpt").toString

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.queries.Registry.normalizeEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
    (0 until 3).foreach { i =>
      events.filter($"event_id" % 3 === i).coalesce(1)
        .write.mode("append").parquet(incoming)
    }

    @volatile var snapshotPath: Option[String] = None
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(incoming)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val compacted = graft.operators.Merge.latestByKey(
          batch, "user_id", "ts", "event_id")
        val next = snapshotPath match {
          case None => compacted
          case Some(p) => graft.operators.Merge.versionedUpsert(
            spark.read.parquet(p), compacted, "user_id", "ts", "event_id")
        }
        val out = base.resolve(s"v$batchId").toString
        next.write.mode("overwrite").parquet(out)
        snapshotPath = Some(out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(snapshotPath.getOrElse(
        sys.error("snapshot stream produced no batches")))
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
        $"event_type", round($"value", 2).as("value"))
      .orderBy($"user_id")
  }

  /**
   * Exactly-once streaming ingest into a manifest-versioned snapshot
   * table: each micro-batch appends as snapshot version == batchId with
   * `expectedVersion` as the transaction guard — a REPLAYED batch (sink
   * restart after a crash between commit and checkpoint advance) targets
   * an already-published version, loses the manifest race, and is
   * swallowed as "already committed". That race-loss-means-idempotence
   * trick is the standard table-format sink contract (Delta's
   * txnAppId/txnVersion); here it falls straight out of the snapshot
   * commit protocol. The second commit attempt per batch in the sink
   * exercises the replay path on every run, not just on crashes.
   *
   * Converges to all events regardless of batching; the batch aggregate
   * over the source table is the oracle.
   */
  def snapshotIngestSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = counter.incrementAndGet()
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_snap_ingest_${ProcessHandle.current().pid()}_$run")
    val incoming = base.resolve("incoming").toString
    val ckpt = base.resolve("ckpt").toString
    val snapDir = base.resolve("snap").toString

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_id", $"event_type", $"value")
    (0 until 3).foreach { i =>
      events.filter($"event_id" % 3 === i).coalesce(1)
        .write.mode("append").parquet(incoming)
    }

    def commitIdempotent(batch: DataFrame, batchId: Long): Unit =
      try graft.sources.Snapshots.commit(batch, snapDir,
        append = true, expectedVersion = Some(batchId),
        // stat each micro-batch's files on the id so downstream windowed
        // consumers (readVersionRange) prune the ingested history instead
        // of rescanning it — stats cost stays per-batch-sized
        statsCols = Seq("event_id"))
      catch { case _: IllegalStateException => () } // replay: already committed

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(incoming)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitIdempotent(batch, batchId)
        commitIdempotent(batch, batchId) // simulated replay: must no-op
      }
      .start()
    q.processAllAvailable()
    q.stop()
    graft.sources.Snapshots.readLatest(spark, snapDir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
      .orderBy($"event_type")
  }

  /**
   * Streaming sketch maintenance: each micro-batch is sketched
   * (`Sketches.hllSketch`) and max-merged into a persistent register
   * table (`Sketches.hllMerge`), one immutable version per batch — the
   * foreachBatch twin of `q_hll_sketch_merge`'s batch lifecycle. Register
   * merge is lossless and order/batching-independent, so the final
   * estimate equals the single-pass estimate over all events (the
   * oracle), no matter how the stream was chunked. State is the ≤ m-row
   * register table itself — nothing in Spark's state store, nothing that
   * grows with stream length: the 100 TB cardinality-dashboard shape.
   */
  def streamingHllSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = counter.incrementAndGet()
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_hll_stream_${ProcessHandle.current().pid()}_$run")
    val incoming = base.resolve("incoming").toString
    val ckpt = base.resolve("ckpt").toString

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_id", $"event_type".as("scope"),
        $"user_id".cast("string").as("key"))
    (0 until 3).foreach { i =>
      events.filter($"event_id" % 3 === i).coalesce(1)
        .write.mode("append").parquet(incoming)
    }

    @volatile var sketchPath: Option[String] = None
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(incoming)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val batchSketch = graft.pipeline.Sketches.hllSketch(batch, "key", Seq("scope"))
        val merged = sketchPath match {
          case None => batchSketch
          case Some(p) => graft.pipeline.Sketches.hllMerge(
            Seq(spark.read.parquet(p), batchSketch), Seq("scope"))
        }
        val out = base.resolve(s"v$batchId").toString
        merged.write.mode("overwrite").parquet(out)
        sketchPath = Some(out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    graft.pipeline.Sketches.hllEstimateFromSketch(
        spark.read.parquet(sketchPath.getOrElse(
          sys.error("sketch stream produced no batches"))), Seq("scope"))
      .orderBy($"scope")
  }

  /**
   * Bounded-state variant of `dedupedUserCounts`: the unbounded
   * `dropDuplicates` keeps every seen id forever, which at 100 TB grows
   * without limit — `dropDuplicatesWithinWatermark` evicts dedup state
   * once ids age past the event-time watermark, which is the production
   * posture (duplicates in real delivery arrive close together). The
   * fixture's duplicate delivery lands in a second micro-batch well
   * inside the horizon, so the output still equals the batch aggregation
   * and the same SQL oracle applies.
   */
  def dedupedUserCountsWatermarked(spark: SparkSession, dir: String,
      horizon: String = "30 days"): DataFrame = {
    import spark.implicits._
    val name = s"graft_dedup_wm_counts_${counter.incrementAndGet()}"
    val q = dedupWatermarkedAggregate(
        eventsStream(spark, dir, copies = 2, maxFilesPerTrigger = Some(1)), horizon)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"user_id")
  }

  /**
   * Stream–static enrichment join: the event stream joined to the static
   * `customer` dimension (broadcast — the static side is re-read per
   * micro-batch, so keeping it broadcast-small avoids a per-batch shuffle),
   * then aggregated by market segment. Stateless join: no watermark needed
   * on a stream–static inner join, and at 100 TB the stream side never
   * buffers — each micro-batch probes the broadcast table and moves on.
   * Output equals the batch join+agg, so a plain SQL oracle applies.
   */
  def enrichedSegmentTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customers = spark.read.parquet(s"$dir/customer.parquet")
      .select($"c_custkey", $"c_mktsegment")
    val name = s"graft_enriched_${counter.incrementAndGet()}"
    val q = eventsStream(spark, dir)
      .join(broadcast(customers), $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment", $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"c_mktsegment", $"event_type")
  }

  /**
   * Stream–stream inner join with watermarks and a time-range condition:
   * purchase events joined to error events by the same user where the error
   * happened in the 30 minutes before the purchase. Both sides carry a
   * 1-hour watermark and the join predicate bounds event time on both
   * sides — exactly what Spark needs to evict join state, so at 100 TB the
   * buffered state per side stays O(watermark window), not O(stream).
   * Inner-join results are emitted as they match (append mode); on a
   * static source this equals the batch join, so a SQL oracle applies.
   */
  def purchaseErrorJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val purchases = eventsStream(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"),
        $"value".as("p_value"))
      .withWatermark("p_ts", "1 hour")
    val errors = eventsStream(spark, dir)
      .filter($"event_type" === "error")
      .select($"event_id".as("e_id"), $"user_id".as("e_user"), $"ts".as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val name = s"graft_purchase_errors_${counter.incrementAndGet()}"
    val q = purchases.join(errors,
        $"user_id" === $"e_user" &&
          $"e_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
          $"e_ts" <= $"p_ts")
      .select($"p_id", $"e_id", $"user_id", $"p_value",
        (unix_micros($"p_ts") - unix_micros($"e_ts")).as("gap_us"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"p_id", $"e_id")
  }

  /**
   * Stream–stream LEFT OUTER join: same sides and time-range condition as
   * `purchaseErrorJoin`, but purchases with no error in their 30-minute
   * lookback must still emit (null-extended). In streaming this is
   * watermark-gated: a left row can only be declared unmatched once the
   * watermark proves no qualifying error can still arrive (every error
   * with e_ts ≤ p_ts is late once the watermark passes p_ts), so
   * null-extended rows trail the data by the watermark delay and rows
   * inside the final watermark horizon are withheld at stream end — state
   * stays O(watermark window) per side, which is what makes the join
   * feasible against an unbounded stream. The oracle applies the same
   * horizon cutoff to its unmatched branch; matched rows emit as they
   * match, horizon-free, like the inner join.
   */
  def purchaseErrorLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val purchases = eventsStream(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"),
        $"value".as("p_value"))
      .withWatermark("p_ts", "1 hour")
    val errors = eventsStream(spark, dir)
      .filter($"event_type" === "error")
      .select($"event_id".as("e_id"), $"user_id".as("e_user"), $"ts".as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val name = s"graft_purchase_errors_left_${counter.incrementAndGet()}"
    val q = purchases.join(errors,
        $"user_id" === $"e_user" &&
          $"e_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
          $"e_ts" <= $"p_ts",
        "left_outer")
      .select($"p_id", $"e_id", $"user_id", $"p_value",
        (unix_micros($"p_ts") - unix_micros($"e_ts")).as("gap_us"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"p_id", $"e_id")
  }

  /**
   * Stream–stream FULL OUTER join: both directions of the left-outer
   * semantics at once. Unmatched purchases null-extend when the
   * watermark passes `p_ts` (no qualifying error can still arrive);
   * unmatched errors null-extend when it passes `e_ts + 30min` (the last
   * purchase that could have looked back at them is now late). Each
   * side's withheld tail at stream end is its own eviction horizon — the
   * oracle replays both cutoffs.
   */
  def purchaseErrorFullJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val purchases = eventsStream(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"),
        $"value".as("p_value"))
      .withWatermark("p_ts", "1 hour")
    val errors = eventsStream(spark, dir)
      .filter($"event_type" === "error")
      .select($"event_id".as("e_id"), $"user_id".as("e_user"), $"ts".as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val name = s"graft_purchase_errors_full_${counter.incrementAndGet()}"
    val q = purchases.join(errors,
        $"user_id" === $"e_user" &&
          $"e_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
          $"e_ts" <= $"p_ts",
        "full_outer")
      .select($"p_id", $"e_id", coalesce($"user_id", $"e_user").as("uid"),
        (unix_micros($"p_ts") - unix_micros($"e_ts")).as("gap_us"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    // unmatched-error rows have p_id NULL: Spark's default asc puts NULLs
    // FIRST, DuckDB's puts them LAST — pin NULLS LAST on both sides so
    // the ordered outputs agree row-for-row
    spark.table(name).orderBy($"p_id".asc_nulls_last, $"e_id".asc_nulls_last)
  }

  /**
   * Gap-based sessionization with CUSTOM state (`flatMapGroupsWithState`):
   * per user, events within `gapMinutes` of the previous one extend the
   * current session; a larger gap closes it and opens a new one. The open
   * session is kept in `GroupState` so it continues across micro-batches;
   * every session (closed and still-open) is emitted each batch in update
   * mode — on the single-micro-batch file source this equals the batch
   * sessionization, so a SQL oracle applies.
   */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    // value_sum emitted raw; rounded by the SQL round() below so the
    // rounding mode matches the oracle's (half-up, not rint's half-even)
    def fn(uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession])
        : Iterator[SessionOut] = {
      val evs = it.toArray.sortBy(_.tsMs)
      var closed = Vector.empty[OpenSession]
      var cur: OpenSession = state.getOption.orNull
      evs.foreach { e =>
        if (cur == null) cur = OpenSession(e.tsMs, e.tsMs, 1, e.value)
        else if (e.tsMs - cur.endMs > gapMs) {
          closed :+= cur
          cur = OpenSession(e.tsMs, e.tsMs, 1, e.value)
        } else cur = OpenSession(cur.startMs, e.tsMs, cur.events + 1, cur.valueSum + e.value)
      }
      if (cur != null) { state.update(cur); closed :+= cur }
      closed.iterator.map(s =>
        SessionOut(uid, formatMs(s.startMs), formatMs(s.endMs), s.events, s.valueSum))
    }

    val name = s"graft_sessions_${counter.incrementAndGet()}"
    val q = eventsStream(spark, dir)
      .select($"user_id".cast("long").as("user_id"),
        (unix_micros($"ts") / 1000L).cast("long").as("tsMs"),
        $"value".cast("double").as("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .withColumn("value_sum", round($"value_sum", 2))
      .orderBy($"user_id", $"session_start")
  }

  /**
   * Streaming EWMA (the stateful twin of `TimeSeries.ewma`): per user,
   * the `adjust=False` recursion s_i = α·v_i + (1−α)·s_{i−1} with the
   * last smoothed value carried in `GroupState` across micro-batches.
   * Each batch's events fold in (ts, event_id) order on top of the
   * carried state, so as long as delivery is per-key time-ordered ACROSS
   * batches (the file source replaying time-partitioned files — the
   * normal ingest shape) the emitted trajectory is identical to the
   * batch fold, and the batch recursive-CTE oracle applies unchanged.
   * Same exact-binary-α contract as the batch operator: no rounding.
   */
  def ewmaTransform(events: org.apache.spark.sql.Dataset[EwmaEvent],
      alpha: Double): org.apache.spark.sql.Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    def fn(uid: Long, it: Iterator[EwmaEvent], state: GroupState[EwmaCarry])
        : Iterator[EwmaOut] = {
      val evs = it.toArray.sortBy(e => (e.tsUs, e.event_id))
      var s = state.getOption.map(_.s).getOrElse(0.0)
      var first = state.getOption.isEmpty
      val out = evs.map { e =>
        s = if (first) { first = false; e.value } else alpha * e.value + (1 - alpha) * s
        EwmaOut(uid, e.tsUs, e.event_id, e.value, s)
      }
      if (!first) state.update(EwmaCarry(s))
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  /**
   * Streaming Holt linear-trend smoothing (the stateful twin of
   * `TimeSeries.holtLinear`): per user, the level/trend recursion with
   * BOTH scalars carried in `GroupState` across micro-batches — O(1)
   * per-key state for an unbounded stream. Same delivery contract and
   * exact-binary-coefficient reasoning as `ewmaTransform`, so the batch
   * recursive-CTE oracle applies to the streamed trajectory unchanged.
   */
  def holtTransform(events: org.apache.spark.sql.Dataset[EwmaEvent],
      alpha: Double, beta: Double): org.apache.spark.sql.Dataset[HoltOut] = {
    import events.sparkSession.implicits._
    def fn(uid: Long, it: Iterator[EwmaEvent], state: GroupState[HoltCarry])
        : Iterator[HoltOut] = {
      val evs = it.toArray.sortBy(e => (e.tsUs, e.event_id))
      var carry = state.getOption
      val out = evs.map { e =>
        carry = Some(carry match {
          case None => HoltCarry(e.value, 0.0)
          case Some(HoltCarry(lPrev, bPrev)) =>
            val l = alpha * e.value + (1 - alpha) * (lPrev + bPrev)
            HoltCarry(l, beta * (l - lPrev) + (1 - beta) * bPrev)
        })
        val c = carry.get
        HoltOut(uid, e.tsUs, e.event_id, e.value, c.l, c.b, c.l + c.b)
      }
      carry.foreach(state.update)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  /**
   * Streaming CUSUM (the stateful twin of `TimeSeries.cusum`): each key
   * buffers its first `baselineN` observations (bounded state), freezes
   * the 6dp-rounded baseline mean when the window fills, then emits the
   * buffered backlog scored from row 1 followed by live scoring — so
   * the emitted trajectory equals the batch operator's for every key
   * that completes calibration. Keys that never reach `baselineN`
   * observations emit nothing (a drift detector with no baseline has
   * nothing sound to say); the batch oracle applies with the same
   * ≥ baselineN filter.
   */
  def cusumTransform(events: org.apache.spark.sql.Dataset[EwmaEvent],
      baselineN: Int, slack: Double, threshold: Double)
      : org.apache.spark.sql.Dataset[CusumOut] = {
    import events.sparkSession.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def fn(uid: Long, it: Iterator[EwmaEvent], state: GroupState[CusumCarry])
        : Iterator[CusumOut] = {
      val evs = it.toArray.sortBy(e => (e.tsUs, e.event_id))
      var st = state.getOption.getOrElse(CusumCarry(Nil, 0.0, frozen = false, 0.0, 0.0))
      val out = Seq.newBuilder[CusumOut]
      def score(e: EwmaEvent): Unit = {
        val hi = r6(math.max(0.0, st.hi + (e.value - st.mu - slack)))
        val lo = r6(math.max(0.0, st.lo - (e.value - st.mu + slack)))
        val aHi = hi > threshold
        val aLo = lo > threshold
        out += CusumOut(uid, e.tsUs, e.event_id, e.value, st.mu, hi, lo, aHi, aLo)
        st = st.copy(hi = if (aHi) 0.0 else hi, lo = if (aLo) 0.0 else lo)
      }
      evs.foreach { e =>
        if (st.frozen) score(e)
        else {
          val pending = st.pending :+ e
          if (pending.size >= baselineN) {
            val mu = r6(pending.map(_.value).sum / pending.size)
            st = CusumCarry(Nil, mu, frozen = true, 0.0, 0.0)
            pending.foreach(score)
          } else st = st.copy(pending = pending)
        }
      }
      state.update(st)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  def cusumStream(spark: SparkSession, dir: String, baselineN: Int,
      slack: Double, threshold: Double,
      eventType: String = "purchase"): DataFrame = {
    import spark.implicits._
    val name = s"graft_cusum_stream_${counter.incrementAndGet()}"
    val q = cusumTransform(
      eventsStream(spark, dir)
        .filter($"event_type" === eventType)
        .select($"user_id".cast("long").as("user_id"),
          unix_micros($"ts").as("tsUs"),
          $"event_id".cast("long").as("event_id"),
          $"value".cast("double").as("value"))
        .as[EwmaEvent], baselineN, slack, threshold)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select($"user_id", timestamp_micros($"tsUs").as("ts"), $"event_id",
        $"value", $"mu", $"cusum_hi", $"cusum_lo", $"alarm_hi", $"alarm_lo")
      .orderBy($"user_id", $"ts", $"event_id")
  }

  def holtStream(spark: SparkSession, dir: String, alpha: Double, beta: Double,
      eventType: String = "purchase"): DataFrame = {
    import spark.implicits._
    val name = s"graft_holt_stream_${counter.incrementAndGet()}"
    val q = holtTransform(
      eventsStream(spark, dir)
        .filter($"event_type" === eventType)
        .select($"user_id".cast("long").as("user_id"),
          unix_micros($"ts").as("tsUs"),
          $"event_id".cast("long").as("event_id"),
          $"value".cast("double").as("value"))
        .as[EwmaEvent], alpha, beta)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select($"user_id", timestamp_micros($"tsUs").as("ts"), $"event_id",
        $"value", $"level", $"trend", $"forecast")
      .orderBy($"user_id", $"ts", $"event_id")
  }

  /**
   * Streaming rolling z-score (the stateful twin of
   * `TimeSeries.rollingZscore`): each key carries its most recent
   * ≤ `lookback` values in `GroupState` — STRICTLY BOUNDED state, the
   * anomaly-detection posture for an unbounded stream. Every incoming
   * observation is scored against the buffered baseline (itself
   * excluded), then pushed in. On per-key time-ordered delivery the
   * emitted scores equal the batch operator's, so `q_ts_anomaly`'s SQL
   * oracle applies; the 4dp rounding both operators share absorbs the
   * two-pass-vs-window variance association difference.
   */
  def zscoreTransform(events: org.apache.spark.sql.Dataset[EwmaEvent],
      lookback: Int, minPoints: Int, threshold: Double)
      : org.apache.spark.sql.Dataset[ZscoreOut] = {
    import events.sparkSession.implicits._
    def score(buf: List[Double], v: Double): (Option[Double], Boolean) = {
      val n = buf.size
      if (n < minPoints) (None, false)
      else {
        val mu = buf.sum / n
        val sd = math.sqrt(buf.map(x => (x - mu) * (x - mu)).sum / (n - 1))
        if (sd > 0) {
          val z = java.math.BigDecimal.valueOf((v - mu) / sd)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          (Some(z), math.abs(z) > threshold)
        } else (None, false)
      }
    }
    def fn(uid: Long, it: Iterator[EwmaEvent], state: GroupState[ZscoreBuf])
        : Iterator[ZscoreOut] = {
      val evs = it.toArray.sortBy(e => (e.tsUs, e.event_id))
      var buf = state.getOption.map(_.values).getOrElse(Nil)
      val out = evs.map { e =>
        val (z, flag) = score(buf, e.value)
        buf = (buf :+ e.value).takeRight(lookback)
        ZscoreOut(uid, e.tsUs, e.event_id, e.value, z, flag)
      }
      if (evs.nonEmpty) state.update(ZscoreBuf(buf))
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  def zscoreStream(spark: SparkSession, dir: String, lookback: Int = 20,
      minPoints: Int = 5, threshold: Double = 3.0,
      eventType: String = "purchase"): DataFrame = {
    import spark.implicits._
    val name = s"graft_zscore_stream_${counter.incrementAndGet()}"
    val q = zscoreTransform(
      eventsStream(spark, dir)
        .filter($"event_type" === eventType)
        .select($"user_id".cast("long").as("user_id"),
          unix_micros($"ts").as("tsUs"),
          $"event_id".cast("long").as("event_id"),
          $"value".cast("double").as("value"))
        .as[EwmaEvent], lookback, minPoints, threshold)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select($"user_id", timestamp_micros($"tsUs").as("ts"), $"event_id",
        $"value", $"z", $"is_anomaly")
      .orderBy($"user_id", $"ts", $"event_id")
  }

  def ewmaStream(spark: SparkSession, dir: String, alpha: Double,
      eventType: String = "purchase"): DataFrame = {
    import spark.implicits._
    val name = s"graft_ewma_stream_${counter.incrementAndGet()}"
    val q = ewmaTransform(
      eventsStream(spark, dir)
        .filter($"event_type" === eventType)
        .select($"user_id".cast("long").as("user_id"),
          unix_micros($"ts").as("tsUs"),
          $"event_id".cast("long").as("event_id"),
          $"value".cast("double").as("value"))
        .as[EwmaEvent], alpha)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select($"user_id", timestamp_micros($"tsUs").as("ts"), $"event_id",
        $"value", $"ewma")
      .orderBy($"user_id", $"ts", $"event_id")
  }

  /**
   * NATIVE session windows (`session_window`) next to the custom
   * `flatMapGroupsWithState` sessionizer: the same gap semantics expressed
   * declaratively, with Spark's state store handling window merges — the
   * preferred form when no custom per-session state is needed, since the
   * engine can evict via the watermark and the plan stays whole-stage
   * friendly. Complete mode (update is rejected for session windows —
   * merges would retract earlier emissions) holds every session in final
   * state. The built-in defines the window end as lastEvent + gap, and
   * splits when the inter-event gap is EXACTLY the gap duration (windows
   * that touch do not overlap) — both replayed by the oracle (`>=` in the
   * island test, `max(ts) + gap` as the end).
   */
  def sessionWindowNative(spark: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val name = s"graft_session_native_${counter.incrementAndGet()}"
    val q = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", s"$gapMinutes minutes"), $"user_id")
      .agg(count(lit(1)).as("events"), round(sum($"value"), 2).as("value_sum"))
      .select($"user_id",
        date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format($"session_window.end", "yyyy-MM-dd HH:mm:ss").as("session_end"),
        $"events", $"value_sum")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"user_id", $"session_start")
  }

  /**
   * Sessionization-style stateful pattern: per-user event counts over
   * 30-minute event-time windows with a 2-hour watermark, update mode
   * (append would hold back windows newer than the final watermark, which
   * on a static file means the whole input). Drained synchronously.
   */
  def userActivityWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = s"graft_user_windows_${counter.incrementAndGet()}"
    val q = eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("events"), round(sum($"value"), 2).as("value_sum"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("window_start"),
        $"user_id", $"events", $"value_sum")
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"window_start", $"user_id")
  }
}
