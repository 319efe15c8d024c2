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
