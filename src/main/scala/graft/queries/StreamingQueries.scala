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

    // streaming rolling z-score: each key's ≤20 most recent values ride
    // GroupState (strictly bounded), every arrival scored against the
    // buffered baseline; equals the batch operator on ordered delivery,
    // so q_ts_anomaly's oracle applies
    "q_stream_ts_anomaly" -> QueryDef(
      (s, dir) => EventsStream.zscoreStream(s, dir,
        lookback = 20, minPoints = 5, threshold = 3.0),
      Some("""WITH v AS (
             |  SELECT user_id, ts, event_id, value,
             |    count(value) OVER w AS n,
             |    avg(value) OVER w AS mu,
             |    stddev_samp(value) OVER w AS sd
             |  FROM events WHERE event_type = 'purchase'
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
             |SELECT user_id, ts, event_id, value,
             |  CASE WHEN n >= 5 AND sd > 0 THEN round((value - mu) / sd, 4) END AS z,
             |  coalesce(CASE WHEN n >= 5 AND sd > 0
             |    THEN abs(round((value - mu) / sd, 4)) > 3.0 END, false) AS is_anomaly
             |FROM v ORDER BY user_id, ts, event_id""".stripMargin)),

    // stateful streaming EWMA: the last smoothed value rides GroupState
    // across micro-batches; on per-key time-ordered delivery the emitted
    // trajectory equals the batch fold, so the recursive-CTE oracle from
    // q_ewma applies verbatim (bitwise, no rounding)
    "q_stream_ewma" -> QueryDef(
      (s, dir) => EventsStream.ewmaStream(s, dir, alpha = 0.25),
      Some("""WITH RECURSIVE ordered AS (
             |  SELECT user_id, ts, event_id, value,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS rn
             |  FROM events WHERE event_type = 'purchase'),
             |rec AS (
             |  SELECT user_id, ts, event_id, value, rn, value AS ewma
             |  FROM ordered WHERE rn = 1
             |  UNION ALL
             |  SELECT o.user_id, o.ts, o.event_id, o.value, o.rn,
             |         0.25 * o.value + 0.75 * r.ewma
             |  FROM ordered o JOIN rec r
             |    ON o.user_id = r.user_id AND o.rn = r.rn + 1)
             |SELECT user_id, ts, event_id, value, ewma
             |FROM rec ORDER BY user_id, ts, event_id""".stripMargin)),

    // streaming CUSUM: calibration buffer until the baseline freezes,
    // then backlog + live scoring — batch-trajectory parity for every
    // key that completes calibration (the oracle filters to those)
    "q_stream_cusum" -> QueryDef(
      (s, dir) => EventsStream.cusumStream(s, dir,
        baselineN = 20, slack = 5.0, threshold = 50.0),
      Some("""WITH RECURSIVE ordered AS (
             |  SELECT user_id, ts, event_id, value,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS rn
             |  FROM events WHERE event_type = 'purchase'),
             |muq AS (SELECT user_id, round(avg(value), 6) AS mu
             |        FROM ordered WHERE rn <= 20 GROUP BY user_id
             |        HAVING count(*) >= 20),
             |o2 AS (SELECT o.user_id, o.ts, o.event_id, o.value, o.rn, muq.mu
             |       FROM ordered o JOIN muq USING (user_id)),
             |rec AS (
             |  SELECT user_id, ts, event_id, value, rn, mu,
             |    round(greatest(0, 0 + (value - mu - 5.0)), 6) AS hi,
             |    round(greatest(0, 0 - (value - mu + 5.0)), 6) AS lo,
             |    CASE WHEN round(greatest(0, 0 + (value - mu - 5.0)), 6) > 50.0
             |         THEN 0 ELSE round(greatest(0, 0 + (value - mu - 5.0)), 6) END AS hic,
             |    CASE WHEN round(greatest(0, 0 - (value - mu + 5.0)), 6) > 50.0
             |         THEN 0 ELSE round(greatest(0, 0 - (value - mu + 5.0)), 6) END AS loc
             |  FROM o2 WHERE rn = 1
             |  UNION ALL
             |  SELECT user_id, ts, event_id, value, rn, mu, hi, lo,
             |    CASE WHEN hi > 50.0 THEN 0 ELSE hi END,
             |    CASE WHEN lo > 50.0 THEN 0 ELSE lo END
             |  FROM (
             |    SELECT o.user_id, o.ts, o.event_id, o.value, o.rn, o.mu,
             |      round(greatest(0, r.hic + (o.value - o.mu - 5.0)), 6) AS hi,
             |      round(greatest(0, r.loc - (o.value - o.mu + 5.0)), 6) AS lo
             |    FROM o2 o JOIN rec r
             |      ON o.user_id = r.user_id AND o.rn = r.rn + 1))
             |SELECT user_id, ts, event_id, value, mu,
             |       hi AS cusum_hi, lo AS cusum_lo,
             |       hi > 50.0 AS alarm_hi, lo > 50.0 AS alarm_lo
             |FROM rec ORDER BY user_id, ts, event_id""".stripMargin)),

    // streaming Holt linear trend: level+trend carried in GroupState,
    // O(1) per key; trajectory equals the batch fold, so the same
    // structure-matched recursive CTE is the oracle
    "q_stream_holt" -> QueryDef(
      (s, dir) => EventsStream.holtStream(s, dir, alpha = 0.5, beta = 0.25),
      Some("""WITH RECURSIVE ordered AS (
             |  SELECT user_id, ts, event_id, value,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS rn
             |  FROM events WHERE event_type = 'purchase'),
             |rec AS (
             |  SELECT user_id, ts, event_id, value, rn,
             |         value AS l, CAST(0 AS DOUBLE) AS b
             |  FROM ordered WHERE rn = 1
             |  UNION ALL
             |  SELECT user_id, ts, event_id, value, rn,
             |         lnew AS l, 0.25 * (lnew - lprev) + 0.75 * bprev AS b
             |  FROM (
             |    SELECT o.user_id, o.ts, o.event_id, o.value, o.rn,
             |           0.5 * o.value + 0.5 * (r.l + r.b) AS lnew,
             |           r.l AS lprev, r.b AS bprev
             |    FROM ordered o JOIN rec r
             |      ON o.user_id = r.user_id AND o.rn = r.rn + 1))
             |SELECT user_id, ts, event_id, value,
             |       l AS level, b AS trend, l + b AS forecast
             |FROM rec ORDER BY user_id, ts, event_id""".stripMargin)),

    // NATIVE session_window aggregation (state-store-managed window
    // merges) next to the custom-state sessionizer; the oracle replays
    // the built-in's exact semantics — split at gap >= 30min, window end
    // = last event + gap
    "q_stream_session_native" -> QueryDef(
      (s, dir) => EventsStream.sessionWindowNative(s, dir, gapMinutes = 30),
      Some("""WITH d AS (
             |  SELECT user_id, ts, value,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |s AS (
             |  SELECT user_id, ts, value,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM d)
             |SELECT user_id,
             |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
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

    // left-outer variant: unmatched purchases null-extend only once the
    // watermark (min of both sides' max event time, minus the 1h delay)
    // proves no qualifying error can still arrive; purchases inside the
    // final horizon are withheld at stream end. The oracle replays both
    // branches: matched rows horizon-free, unmatched rows horizon-gated.
    "q_stream_purchase_errors_left" -> QueryDef(
      (s, dir) => EventsStream.purchaseErrorLeftJoin(s, dir),
      Some("""WITH wm AS (
             |  SELECT least(
             |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
             |    (SELECT max(ts) FROM events WHERE event_type = 'error'))
             |    - INTERVAL 1 HOUR AS w),
             |matched AS (
             |  SELECT p.event_id AS p_id, e.event_id AS e_id,
             |    p.user_id, p.value AS p_value,
             |    epoch_us(p.ts) - epoch_us(e.ts) AS gap_us
             |  FROM events p JOIN events e
             |    ON p.user_id = e.user_id
             |   AND p.event_type = 'purchase' AND e.event_type = 'error'
             |   AND e.ts >= p.ts - INTERVAL 30 MINUTE AND e.ts <= p.ts),
             |unmatched AS (
             |  SELECT p.event_id AS p_id, CAST(NULL AS BIGINT) AS e_id,
             |    p.user_id, p.value AS p_value, CAST(NULL AS BIGINT) AS gap_us
             |  FROM events p, wm
             |  WHERE p.event_type = 'purchase' AND p.ts < wm.w
             |    AND NOT EXISTS (
             |      SELECT 1 FROM events e
             |      WHERE e.event_type = 'error' AND e.user_id = p.user_id
             |        AND e.ts >= p.ts - INTERVAL 30 MINUTE AND e.ts <= p.ts))
             |SELECT * FROM matched
             |UNION ALL SELECT * FROM unmatched
             |ORDER BY p_id, e_id""".stripMargin)),

    // full-outer: both eviction horizons at once — unmatched purchases
    // gate on p_ts < wm, unmatched errors on e_ts + 30min < wm (the last
    // purchase that could reach back at them is then late)
    "q_stream_purchase_errors_full" -> QueryDef(
      (s, dir) => EventsStream.purchaseErrorFullJoin(s, dir),
      Some("""WITH wm AS (
             |  SELECT least(
             |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
             |    (SELECT max(ts) FROM events WHERE event_type = 'error'))
             |    - INTERVAL 1 HOUR AS w),
             |matched AS (
             |  SELECT p.event_id AS p_id, e.event_id AS e_id,
             |    p.user_id AS uid,
             |    epoch_us(p.ts) - epoch_us(e.ts) AS gap_us
             |  FROM events p JOIN events e
             |    ON p.user_id = e.user_id
             |   AND p.event_type = 'purchase' AND e.event_type = 'error'
             |   AND e.ts >= p.ts - INTERVAL 30 MINUTE AND e.ts <= p.ts),
             |un_p AS (
             |  SELECT p.event_id AS p_id, CAST(NULL AS BIGINT) AS e_id,
             |    p.user_id AS uid, CAST(NULL AS BIGINT) AS gap_us
             |  FROM events p, wm
             |  WHERE p.event_type = 'purchase' AND p.ts < wm.w
             |    AND NOT EXISTS (
             |      SELECT 1 FROM events e
             |      WHERE e.event_type = 'error' AND e.user_id = p.user_id
             |        AND e.ts >= p.ts - INTERVAL 30 MINUTE AND e.ts <= p.ts)),
             |un_e AS (
             |  SELECT CAST(NULL AS BIGINT) AS p_id, e.event_id AS e_id,
             |    e.user_id AS uid, CAST(NULL AS BIGINT) AS gap_us
             |  FROM events e, wm
             |  WHERE e.event_type = 'error' AND e.ts + INTERVAL 30 MINUTE < wm.w
             |    AND NOT EXISTS (
             |      SELECT 1 FROM events p
             |      WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
             |        AND e.ts >= p.ts - INTERVAL 30 MINUTE AND e.ts <= p.ts))
             |SELECT * FROM matched
             |UNION ALL SELECT * FROM un_p
             |UNION ALL SELECT * FROM un_e
             |ORDER BY p_id NULLS LAST, e_id NULLS LAST""".stripMargin)),

    // every event delivered twice; streaming dropDuplicates restores
    // exactly-once, so the batch aggregation oracle applies unchanged
    "q_stream_dedup_counts" -> QueryDef(
      (s, dir) => EventsStream.dedupedUserCounts(s, dir),
      Some("""SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // append-mode parquet file sink: only windows finalized by the
    // watermark emit (end <= max event time - 1h), exactly once into
    // checkpointed files — the oracle applies the same cutoff
    "q_stream_file_sink" -> QueryDef(
      (s, dir) => EventsStream.hourlyToFileSink(s, dir),
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events)
             |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events, m
             |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 1 HOUR
             |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // bounded-state dedup: dropDuplicatesWithinWatermark evicts ids past
    // the event-time horizon (the 100 TB posture — unbounded dedup state
    // grows forever); duplicates land inside the horizon, so the batch
    // oracle still applies
    "q_stream_dedup_watermarked" -> QueryDef(
      (s, dir) => EventsStream.dedupedUserCountsWatermarked(s, dir),
      Some("""SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // streaming sketch maintenance: per-batch HLL register sketches
    // max-merged into a persistent register table; merge is lossless so
    // the final estimate equals the single-pass DuckDB replay regardless
    // of micro-batching
    "q_stream_hll_sketch" -> QueryDef(
      (s, dir) => EventsStream.streamingHllSketch(s, dir),
      Some(s"""SELECT scope, approx_distinct
              |FROM (${graft.pipeline.Sketches.hllOracleSql(
                  "SELECT event_type AS scope, CAST(user_id AS VARCHAR) AS key FROM events")})
              |ORDER BY scope""".stripMargin)),

    // CDC apply: out-of-order change stream → keyed snapshot via
    // foreachBatch + version-aware upsert; converges to the batch
    // latest-by-key no matter how the stream is micro-batched, which is
    // exactly what the oracle computes
    "q_stream_upsert_snapshot" -> QueryDef(
      (s, dir) => EventsStream.snapshotUpsertSink(s, dir),
      Some("""SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
             |       round(value, 2) AS value
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY user_id
             |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             |      FROM events)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // raw .h264 elementary streams arriving as FILES on a binaryFile
    // stream (the camera-feed delivery shape, r12): per-file GOP decode
    // is stateless across files, so the streamed per-frame rows must
    // equal the batch decodeAnnexBStream rows over the SAME bitstreams
    // — pinned here by an inner join on (doc_id, frame) comparing dims
    // and the decoded-pixel checksum; a dropped or duplicated streamed
    // row changes the row count and the hash catches it. Dims are
    // closed-form in the doc, so DuckDB replays the full result.
    "q_stream_annexb_ingest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val streamed = graft.streaming.AnnexBStream.annexBIngestSink(s, dir)
        val batch = s.read.parquet(s"$dir/documents.parquet")
          .filter($"doc_id" < 16)
          .select($"doc_id".cast("long"), $"text")
          .as[(Long, String)]
          .flatMap { case (id, text) =>
            val (_, _, es) = graft.streaming.AnnexBStream.esForDoc(id, text)
            graft.streaming.AnnexBStream.decodeRows(f"doc_$id%05d.h264", es)
          }
          .toDF("doc_id", "frame", "b_width", "b_height", "b_rgb_sum")
        streamed.join(batch, Seq("doc_id", "frame"))
          .select($"doc_id", $"frame".cast("int").as("frame"),
            $"width".cast("int").as("width"),
            $"height".cast("int").as("height"),
            ($"width" === $"b_width" && $"height" === $"b_height" &&
              $"rgb_sum" === $"b_rgb_sum").as("stream_matches_batch"))
          .orderBy($"doc_id", $"frame")
      },
      Some("""SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
             |  CAST(f.frame AS INT) AS frame,
             |  CAST(32 + 2 * (len(d.text) % 8) AS INT) AS width,
             |  CAST(32 + 2 * ((len(d.text) + d.doc_id) % 6) AS INT) AS height,
             |  true AS stream_matches_batch
             |FROM documents d
             |CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS frame) f
             |WHERE d.doc_id < 16 ORDER BY doc_id, frame""".stripMargin)),

    // WebM files arriving on a binaryFile stream (r15): per-file EBML
    // demux + bitstream keyframe headers, stateless across files, so
    // the streamed rows equal the batch demux of the same bytes row by
    // row (stream_matches_batch) and the planted schedule replays
    // closed-form; half the files arrive in the unknown-size
    // live-streaming shape
    "q_stream_webm_ingest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val streamed = graft.streaming.WebmStream.webmIngestSink(s, dir)
        val batch = s.read.parquet(s"$dir/documents.parquet")
          .filter($"doc_id" < 24)
          .select($"doc_id".cast("long"), $"text")
          .as[(Long, String)]
          .flatMap { case (id, text) =>
            graft.streaming.WebmStream.demuxRow(f"doc_$id%05d.webm",
              graft.streaming.WebmStream.webmForDoc(id, text))
          }
          .toDF("doc_id", "b_codec", "b_n", "b_key", "b_w", "b_h")
        streamed.join(batch, Seq("doc_id"))
          .select($"doc_id", $"codec",
            $"n_frames".cast("int").as("n_frames"),
            $"n_key".cast("int").as("n_key"),
            $"width".cast("int").as("width"),
            $"height".cast("int").as("height"),
            ($"codec" === $"b_codec" && $"n_frames" === $"b_n" &&
              $"n_key" === $"b_key" && $"width" === $"b_w" &&
              $"height" === $"b_h").as("stream_matches_batch"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (
             |  SELECT CAST(doc_id AS BIGINT) AS doc_id, len(text) AS l,
             |         4 + len(text) % 5 AS n, 2 + doc_id % 3 AS ke
             |  FROM documents WHERE doc_id < 24)
             |SELECT doc_id,
             |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'V_VP8'
             |       WHEN 1 THEN 'V_VP9' ELSE 'V_AV1' END AS codec,
             |  CAST(n AS INT) AS n_frames,
             |  CAST((n + ke - 1) // ke AS INT) AS n_key,
             |  CAST(128 + 16 * (l % 6) AS INT) AS width,
             |  CAST(72 + 8 * (doc_id % 5) AS INT) AS height,
             |  true AS stream_matches_batch
             |FROM d ORDER BY doc_id""".stripMargin)),

    // WebDataset tar shards arriving as FILES on a binaryFile stream,
    // one shard per trigger (8 real micro-batches): the per-shard
    // explode is stateless and map-only, so the accumulated rows equal
    // the batch q_tar_shards result and share its oracle verbatim
    "q_stream_tar_ingest" -> QueryDef(
      (s, dir) => graft.streaming.TarStream.tarIngestSink(s, dir),
      Some(PipelineQueries.tarShardsOracleSql)),

    // exactly-once versioned ingest: every micro-batch commits as snapshot
    // version==batchId (expectedVersion guard), and a deliberate second
    // commit per batch exercises the replay-idempotence path every run —
    // a double-applied batch would double the counts and break the hash
    "q_stream_snapshot_ingest" -> QueryDef(
      (s, dir) => EventsStream.snapshotIngestSink(s, dir),
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // the continual-ingest dedup filter as a stream: per-micro-batch
    // foreachBatch screen against a prebuilt MinHash reference index.
    // Candidates only cross new×reference, so the result is independent of
    // micro-batching (forced to 2 triggers) and the batch incremental-LSH
    // oracle applies unchanged.
    "q_stream_incremental_dedup" -> QueryDef(
      (s, dir) => graft.streaming.DedupStream.incrementalScreen(s, dir),
      Some(PipelineQueries.incrementalMinhashOracleSql)),

    // continual vector-index maintenance as a stream: per-micro-batch
    // foreachBatch append of new embeddings into the persisted IVF lists
    // against FROZEN centroids. Assignment is per-row, so the final index
    // is micro-batching-independent (forced to 2 triggers) and the batch
    // incremental-IVF oracle applies unchanged to the post-ingest probe.
    "q_stream_ann_ingest" -> QueryDef(
      (s, dir) => graft.streaming.AnnStream.incrementalIvfIngest(s, dir),
      Some(PipelineQueries.annIvfIncrementalOracleSql)),

    // train-batch/apply-stream tokenization: BPE merges learned once from
    // the batch corpus, the stateless distributed encode applied inside a
    // streaming query (append mode, no state); per-doc counts equal the
    // batch q_bpe_encode rows (StreamingTokenizeSpec pins parity — the
    // merge table itself is not SQL-expressible, so rows-only here)
    // streaming BPE apply emits exactly the batch q_bpe_encode rows
    // (stateless mapPartitions, append mode), so it shares that query's
    // full merge-replay oracle (TokenizerOracles)
    "q_stream_bpe_counts" -> QueryDef(
      (s, dir) => graft.streaming.DocsStream.bpeTokenCounts(s, dir),
      Some(TokenizerOracles.bpeEncodeSql(
        numMerges = 200, encRounds = 12, minFreq = 2L, maxWords = 50000))),

    // batch/streaming unification: the stateless quality-score operator
    // (TextAnalysis.qualityScore, same Column transform q_text_quality
    // verifies per-doc) runs unchanged inside a streaming query; complete
    // mode on a single-file source equals the batch aggregation
    // batch-fitted DSIR model frozen into a stateless streaming screen
    // (map-literal scorer, append mode) — per-doc weights equal the
    // batch q_dsir_select rows, so the shared weight CTEs oracle it
    "q_stream_dsir_weights" -> QueryDef(
      (s, dir) => graft.streaming.DocsStream.dsirWeights(s, dir),
      Some(s"""${CurationQueries.dsirWeightCtes}
             |SELECT doc_id, n_tokens, log_weight
             |FROM allw ORDER BY doc_id""".stripMargin)),

    // streaming half of q_heavy_hitters: exact token counts as complete-
    // mode state, the n/k cut applied to the drained state — equals the
    // batch row, so the SHARED oracle text applies verbatim
    "q_stream_heavy_hitters" -> QueryDef(
      (s, dir) => graft.streaming.DocsStream.heavyHitterScreen(s, dir),
      Some(StatsQueries.tokenHeavyHitterOracle)),

    "q_stream_quality_counts" -> QueryDef(
      (s, dir) => graft.streaming.DocsStream.qualityScoreCounts(s, dir),
      Some(s"""WITH f AS (
             |  SELECT doc_id,
             |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
             |    round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             |      / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1), 4) AS mean_token_len,
             |    round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
             |      / greatest(length(text), 1), 4) AS punct_ratio,
             |    round(CAST(len(list_filter(string_split(text, ' '),
             |        t -> list_contains(${duckStopwords}, lower(t)))) AS DOUBLE)
             |      / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1), 4) AS stopword_ratio
             |  FROM documents),
             |scored AS (
             |  SELECT round((CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4 ELSE 0.0 END)
             |    + (CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
             |    + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
             |    + (CASE WHEN stopword_ratio >= 0.01 THEN 0.1 ELSE 0.0 END), 2) AS quality_score
             |  FROM f)
             |SELECT quality_score, count(*) AS n_docs
             |FROM scored GROUP BY quality_score ORDER BY quality_score""".stripMargin))
  )

  private def duckStopwords: String =
    graft.pipeline.TextAnalysis.EnStopwords
      .map(s => s"'${s.replace("'", "''")}'").mkString("[", ", ", "]")
}
