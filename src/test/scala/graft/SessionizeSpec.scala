package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** Batch gap-sessionization: boundary exactness (gap strictly greater than
  * the threshold starts a session), per-key independence, and
  * partitioning-invariance of the assignment. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long)*) =
    rows.toDF("user_id", "ms").select($"user_id", timestamp_millis($"ms").as("ts"))

  test("gap strictly greater than threshold starts a new session") {
    val df = ev((1L, 0L), (1L, 100L), (1L, 200L), // gap == 100 stays
      (1L, 301L),                                 // gap 101 > 100 → new
      (2L, 50L))                                  // other key independent
    val out = Sessionize.byGap(df, "user_id", "ts", gapMs = 100L)
      .select($"user_id", unix_millis($"ts").as("ms"), $"session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 0L, 0L), (1L, 100L, 0L), (1L, 200L, 0L),
      (1L, 301L, 1L),
      (2L, 50L, 0L)))
  }

  test("funnel stages require strict temporal order and report the deepest stage") {
    val df = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full funnel
      (2L, "click", 5L), (2L, "view", 6L),                          // click BEFORE view → stage 1
      (3L, "view", 10L), (3L, "purchase", 20L),                     // skips click → stage 1
      (4L, "view", 10L), (4L, "click", 10L),                        // tie is not strictly after → stage 1
      (5L, "error", 1L)                                             // no funnel events → stage 0
    ).toDF("key", "t", "ms").select($"key", $"t", timestamp_millis($"ms").as("ts"))
    val out = Sessionize.funnelStages(df, "key", "t", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 0))
  }

  test("batch byGap agrees with the streaming sessionizer on real events") {
    // the two implementations are independent (window chain vs
    // flatMapGroupsWithState); same gap on the same data must yield the
    // same per-session (user, start, end, count) sets
    val dir = "/root/testdata/sf0.001"
    val streaming = graft.streaming.EventsStream.sessionize(spark, dir, gapMinutes = 30)
      .select($"user_id", $"session_start", $"session_end", $"events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val events = graft.queries.Registry.events(spark, dir)
    val batch = graft.operators.Sessionize.byGap(
        events.select($"user_id", $"ts"), "user_id", "ts", gapMs = 30L * 60L * 1000L)
      .groupBy($"user_id", $"session_seq")
      .agg(org.apache.spark.sql.functions.min($"ts").as("s"),
        org.apache.spark.sql.functions.max($"ts").as("e"),
        count(lit(1)).as("n"))
      .select($"user_id",
        date_format($"s", "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format($"e", "yyyy-MM-dd HH:mm:ss").as("session_end"), $"n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(batch == streaming, s"batch ${batch.size} vs streaming ${streaming.size} sessions")
    assert(batch.nonEmpty)
  }

  test("cohort retention counts keys per (first-period, offset) cell") {
    import graft.operators.Sessionize
    // periods of 100ms from epoch0=0: A first in p0, active p0+p2;
    // B first in p0 only; C first in p1, active p1+p2 (two events in p1
    // must count once)
    val df = Seq((1L, 10L), (1L, 250L), (2L, 50L), (3L, 110L), (3L, 150L), (3L, 220L))
      .toDF("id", "ms").select($"id", timestamp_millis($"ms").as("ts"))
    val out = Sessionize.cohortRetention(df, "id", "ts", epoch0Ms = 0L, periodMs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 2L) -> 1L, (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("assignment is invariant under input partitioning") {
    val rows = (0L until 500L).map(i => (i % 7, i * 37L % 10000L))
    val a = Sessionize.byGap(ev(rows: _*), "user_id", "ts", 200L)
      .select($"user_id", unix_millis($"ts"), $"session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = Sessionize.byGap(ev(rows: _*).repartition(13), "user_id", "ts", 200L)
      .select($"user_id", unix_millis($"ts"), $"session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }
}
