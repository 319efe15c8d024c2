package graft.queries

import graft.streaming.EventsStream

/**
 * Structured Streaming capabilities, drained synchronously so they are
 * checkable like batch queries. The hourly window query produces output
 * identical to the batch aggregation, so it shares a DuckDB oracle.
 */
object StreamingQueries {

  val defs: Map[String, QueryDef] = Map(
    "q_stream_events_hourly" -> QueryDef(
      (s, dir) => EventsStream.hourlyWindowed(s, dir),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // the events table is one parquet file → one micro-batch → update-mode
    // output holds exactly the final per-window aggregates, so the batch
    // oracle applies
    "q_stream_user_windows" -> QueryDef(
      (s, dir) => EventsStream.userActivityWindows(s, dir),
      Some("""SELECT strftime(time_bucket(INTERVAL 30 MINUTE, ts), '%Y-%m-%d %H:%M') AS window_start,
             |  user_id, count(*) AS events, round(sum(value), 2) AS value_sum
             |FROM events GROUP BY 1, 2 ORDER BY window_start, user_id""".stripMargin)),

    // gap-based sessionization via flatMapGroupsWithState (custom streaming
    // state); single-micro-batch source ⇒ equals batch sessionization
    "q_stream_sessionize" -> QueryDef(
      (s, dir) => EventsStream.sessionize(s, dir, gapMinutes = 30),
      Some("""WITH d AS (
             |  SELECT user_id, ts, value,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |s AS (
             |  SELECT user_id, ts, value,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM d)
             |SELECT user_id,
             |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             |       count(*) AS events, round(sum(value), 2) AS value_sum
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // stream–static broadcast enrichment join (stateless); output equals
    // the batch join+agg so the plain SQL oracle applies
    "q_stream_enriched_segments" -> QueryDef(
      (s, dir) => EventsStream.enrichedSegmentTotals(s, dir),
      Some("""SELECT c_mktsegment, event_type, count(*) AS n,
             |  round(sum(value), 2) AS total_value
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin)),

    // watermarked stream–stream inner join with a time-range condition;
    // on a static source the append-mode output equals the batch join
    "q_stream_purchase_errors" -> QueryDef(
      (s, dir) => EventsStream.purchaseErrorJoin(s, dir),
      Some("""SELECT p.event_id AS p_id, e.event_id AS e_id,
             |  p.user_id, p.value AS p_value,
             |  epoch_us(p.ts) - epoch_us(e.ts) AS gap_us
             |FROM events p JOIN events e
             |  ON p.user_id = e.user_id
             | AND p.event_type = 'purchase' AND e.event_type = 'error'
             | AND e.ts >= p.ts - INTERVAL 30 MINUTE AND e.ts <= p.ts
             |ORDER BY p_id, e_id""".stripMargin)),

    // every event delivered twice; streaming dropDuplicates restores
    // exactly-once, so the batch aggregation oracle applies unchanged
    "q_stream_dedup_counts" -> QueryDef(
      (s, dir) => EventsStream.dedupedUserCounts(s, dir),
      Some("""SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)))
}
