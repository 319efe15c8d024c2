package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch gap-based sessionization — the backfill twin of the streaming
 * sessionizer (streaming/EventsStream.sessionize): a new session starts
 * whenever the gap to the key's previous event exceeds `gapMs`.
 *
 * One shuffle on the key; the lag flag and its running sum share the same
 * window specification, so Catalyst evaluates both in a single sort pass.
 * Session ids are per-key 0-based sequence numbers: data-derived, so the
 * assignment is deterministic under any input partitioning (ties in the
 * timestamp can permute rows within a session but never move a row across
 * sessions — a tied row's gap is 0 regardless of tie order).
 */
object Sessionize {

  /** Appends `session_seq` (0-based per key) to `df`. */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val ms = unix_millis(col(tsCol))
    val prev = lag(ms, 1).over(w)
    val newSession = when(prev.isNull || ms - prev > gapMs, 1).otherwise(0)
    df.withColumn("session_seq",
      (sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
        .cast("long"))
  }
}
