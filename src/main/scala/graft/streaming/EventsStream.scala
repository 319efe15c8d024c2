package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming surface over the `events` table: event-time windowed
 * aggregation with a watermark. This is *new* capability relative to the
 * reference (which has no streaming at all — SURVEY.md §2.9); designed to
 * Spark idioms directly: file source → watermark → tumbling window →
 * stateful agg → sink.
 */
object EventsStream {

  private val counter = new AtomicInteger(0)

  /**
   * Hourly tumbling-window counts/sums per event type, executed as a
   * streaming query over the parquet file source and drained synchronously
   * (memory sink, complete mode). Output matches the equivalent batch
   * aggregation bit-for-bit, so it shares the batch DuckDB oracle.
   */
  /** The file stream source requires a *directory* (its basePath), but the
    * test tables are single parquet files — expose the events file through a
    * per-call temp directory symlink. */
  private def streamableEventsDir(dir: String): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(dir, "events.parquet")
    val tmp = Files.createTempDirectory("graft_events_stream_")
    tmp.toFile.deleteOnExit()
    val link = tmp.resolve("events.parquet")
    try Files.createSymbolicLink(link, src)
    catch { case _: Exception => Files.copy(src, link) }
    tmp.toString
  }

  /** streaming read of the events file; ts arrives as TIMESTAMP(NANOS)
    * which Spark's parquet reader only accepts as long → convert to µs */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .parquet(streamableEventsDir(dir))
      .withColumn("ts", timestamp_micros((col("ts") / lit(1000L)).cast("long")))
  }

  def hourlyWindowed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = s"graft_events_hourly_${counter.incrementAndGet()}"
    val q = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("hour"),
        $"event_type", $"n", $"total_value")
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
