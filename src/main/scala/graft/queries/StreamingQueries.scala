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

    "q_stream_user_windows" -> QueryDef(
      (s, dir) => EventsStream.userActivityWindows(s, dir),
      None))
}
