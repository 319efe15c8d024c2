package graft.queries

import graft.operators.{Sessionize, TemporalJoins, TimeSeries}
import org.apache.spark.sql.functions._

/**
 * Temporal join capabilities over the events table, each verified against
 * DuckDB's native ASOF JOIN / inequality join on the same parquet.
 */
object TemporalQueries {

  val defs: Map[String, QueryDef] = Map(

    // calendar reindex + forward fill: each user's daily purchase spend
    // Mann-Kendall monotone-trend test per event type over the daily mean
    // series: S and the tie counts are exact integers on 6dp-anchored
    // values, the tie-corrected variance and continuity-corrected z close
    // it out — the drift detector run before trusting a metric trend
    "q_mann_kendall_trend" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.mannKendall(
          Registry.events(s, dir)
            .select($"event_type", to_date($"ts").as("day"), $"value"),
          "event_type", "day", "value")
          .orderBy($"event_type")
      },
      Some("""WITH s AS (
             |  SELECT event_type AS k, CAST(ts AS DATE) AS t,
             |         round(avg(value), 6) AS v
             |  FROM events GROUP BY 1, 2),
             |p AS (
             |  SELECT a.k, CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS s
             |  FROM s a JOIN s b ON a.k = b.k AND a.t < b.t GROUP BY 1),
             |n AS (SELECT k, count(*) AS n FROM s GROUP BY 1),
             |tt AS (SELECT k, sum(t0 * (t0 - 1) * (2 * t0 + 5)) AS tt FROM (
             |  SELECT k, v, count(*) AS t0 FROM s GROUP BY 1, 2) GROUP BY 1),
             |j AS (
             |  SELECT n.k, n.n, coalesce(p.s, 0) AS s,
             |    (n.n * (n.n - 1) * (2 * n.n + 5) - tt.tt) / 18.0 AS var
             |  FROM n LEFT JOIN p ON p.k = n.k JOIN tt ON tt.k = n.k),
             |z AS (SELECT k, n, s, round(var, 4) AS var_s,
             |  round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var)
             |             WHEN s < 0 THEN (s + 1) / sqrt(var)
             |             ELSE 0 END, 4) AS z FROM j)
             |SELECT k AS event_type, n, s, var_s, z,
             |  CASE WHEN z > 1.96 THEN 'increasing'
             |       WHEN z < -1.96 THEN 'decreasing'
             |       ELSE 'no_trend' END AS trend
             |FROM z ORDER BY event_type""".stripMargin)),

    // binary-segmentation changepoints over planted two-level mean shifts
    // (+10 from Jan 18, +5 more from Jan 25): exact scaled-integer
    // partial sums make the SSE gains and the (gain, -i) argmax
    // engine-exact; the oracle unrolls both levels
    "q_changepoints" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = Registry.events(s, dir)
          .select($"event_type", to_date($"ts").as("day"),
            ($"value" +
              when(to_date($"ts") >= lit("2024-01-18"), 10.0).otherwise(0.0) +
              when(to_date($"ts") >= lit("2024-01-25"), 5.0).otherwise(0.0))
              .as("v"))
        TimeSeries.changepoints(planted, "event_type", "day", "v",
            maxDepth = 2, minSegment = 5, penalty = 5.0)
          .select($"event_type", $"level", $"segment",
            date_format($"split_at", "yyyy-MM-dd").as("split_day"),
            $"n_left", $"n_right", $"gain")
          .orderBy($"event_type", $"level", $"segment")
      },
      Some(changepointOracleSql)),

    // Theil-Sen robust slope per event type: median of all pairwise
    // slopes (10dp-anchored) with the deterministic two-middle median,
    // Sen's median-residual intercept — the outlier-immune trend the OLS
    // regr_slope row can't give
    "q_theil_sen" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.theilSen(
          Registry.events(s, dir)
            .select($"event_type",
              datediff(to_date($"ts"), lit("1970-01-01")).as("x"), $"value"),
          "event_type", "x", "value")
          .orderBy($"event_type")
      },
      Some("""WITH s AS (
             |  SELECT event_type AS k,
             |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DOUBLE) AS x,
             |    round(avg(value), 6) AS v
             |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
             |sl AS (SELECT a.k, round((b.v - a.v) / (b.x - a.x), 10) AS sl
             |       FROM s a JOIN s b ON a.k = b.k AND a.x < b.x),
             |med1 AS (SELECT k, avg(sl) AS slope FROM (
             |  SELECT k, sl, row_number() OVER (PARTITION BY k ORDER BY sl) AS rn,
             |         count(*) OVER (PARTITION BY k) AS m FROM sl)
             |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1 GROUP BY k),
             |res AS (SELECT s.k, round(v - slope * x, 10) AS r
             |        FROM s JOIN med1 ON med1.k = s.k),
             |med2 AS (SELECT k, avg(r) AS icept FROM (
             |  SELECT k, r, row_number() OVER (PARTITION BY k ORDER BY r) AS rn,
             |         count(*) OVER (PARTITION BY k) AS m FROM res)
             |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1 GROUP BY k),
             |n AS (SELECT k, count(*) AS n FROM s GROUP BY 1),
             |np AS (SELECT k, count(*) AS n_pairs FROM sl GROUP BY 1)
             |SELECT n.k AS event_type, n.n, coalesce(np.n_pairs, 0) AS n_pairs,
             |  round(slope, 6) AS slope, round(icept, 6) AS intercept
             |FROM n LEFT JOIN np ON np.k = n.k
             |JOIN med1 ON med1.k = n.k JOIN med2 ON med2.k = n.k
             |ORDER BY event_type""".stripMargin)),

    // regularized onto their full [first, last] day spine — gap days carry
    // the last observed value with observed=false; the oracle replays the
    // spine (generate_series) and the fill (last_value IGNORE NULLS)
    "q_timeseries_gapfill" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val daily = Registry.events(s, dir)
          .filter($"event_type" === "purchase")
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(round(sum($"value"), 2).as("spend"))
        TimeSeries.gapFillForwardDaily(daily, "user_id", "day", "spend")
          .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
            $"spend", $"observed")
          .orderBy($"user_id", $"day")
      },
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             |         round(sum(value), 2) AS spend
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |span AS (SELECT user_id, min(day) AS lo, max(day) AS hi
             |         FROM daily GROUP BY 1),
             |spine AS (SELECT user_id,
             |            CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             |          FROM span),
             |j AS (SELECT s.user_id, s.day, d.spend, d.spend IS NOT NULL AS observed
             |      FROM spine s LEFT JOIN daily d USING (user_id, day))
             |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
             |       last_value(spend IGNORE NULLS) OVER (
             |         PARTITION BY user_id ORDER BY day
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spend,
             |       observed
             |FROM j ORDER BY user_id, day""".stripMargin)),

    // linear-interpolation gap fill: interior gaps are time-weighted
    // blends of the surrounding observations; both window passes share
    // one key sort, and the oracle replays prev/next via IGNORE NULLS
    "q_gapfill_interpolate" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val daily = Registry.events(s, dir)
          .filter($"event_type" === "purchase")
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(round(sum($"value"), 2).as("spend"))
        TimeSeries.gapFillInterpolateDaily(daily, "user_id", "day", "spend")
          .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
            $"spend", $"observed")
          .orderBy($"user_id", $"day")
      },
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             |         round(sum(value), 2) AS spend
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |span AS (SELECT user_id, min(day) AS lo, max(day) AS hi
             |         FROM daily GROUP BY 1),
             |spine AS (SELECT user_id,
             |            CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             |          FROM span),
             |j AS (SELECT s.user_id, s.day, d.spend, d.spend IS NOT NULL AS observed
             |      FROM spine s LEFT JOIN daily d USING (user_id, day)),
             |w AS (SELECT user_id, day, spend, observed,
             |        last_value(spend IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |        last_value(CASE WHEN observed THEN day END IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             |        first_value(spend IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY day
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |        first_value(CASE WHEN observed THEN day END IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY day
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
             |      FROM j)
             |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
             |       CASE WHEN observed THEN round(spend, 6)
             |            ELSE round(pv + (nv - pv) * (day - pd) / (nd - pd), 6)
             |       END AS spend,
             |       observed
             |FROM w ORDER BY user_id, day""".stripMargin)),

    // OHLC downsampling: per (user, hour) bars over the event value — the
    // order-dependent first/last computed as min/max of (ts, id, v)
    // structs, so the whole bar is ONE hash aggregate (no window sort);
    // the oracle takes first/last via row_number windows instead and
    // must agree exactly (bar edges are raw row values, no FP folding)
    "q_ohlc_bars" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.ohlcBars(Registry.events(s, dir), "user_id", "ts",
          "event_id", "value", bucket = "1 hour")
          .select($"key".as("user_id"),
            date_format($"bucket_start", "yyyy-MM-dd HH:mm").as("hour"),
            $"open", $"high", $"low", $"close", $"n_obs")
          .orderBy($"user_id", $"hour")
      },
      Some("""WITH b AS (
             |  SELECT user_id, date_trunc('hour', ts) AS bs, ts, event_id,
             |         value AS v
             |  FROM events),
             |sel AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY user_id, bs
             |      ORDER BY ts, event_id) AS ra,
             |    row_number() OVER (PARTITION BY user_id, bs
             |      ORDER BY ts DESC, event_id DESC) AS rd
             |  FROM b)
             |SELECT user_id, strftime(bs, '%Y-%m-%d %H:%M') AS hour,
             |  max(CASE WHEN ra = 1 THEN v END) AS open,
             |  max(v) AS high, min(v) AS low,
             |  max(CASE WHEN rd = 1 THEN v END) AS close,
             |  count(*) AS n_obs
             |FROM sel GROUP BY user_id, bs
             |ORDER BY user_id, hour""".stripMargin)),

    // recursive per-key smoothing (pandas ewm(adjust=False)): the fold is
    // NOT a window function, so the engine side is the secondary-sort
    // mapPartitions idiom; α=0.25 and 1−α=0.75 are exact binary doubles
    // and both engines fold in the same (ts, event_id) order, so the
    // trajectories match bitwise — no rounding anywhere
    "q_ewma" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.ewma(
          Registry.events(s, dir).filter($"event_type" === "purchase"),
          "user_id", "ts", "event_id", "value", alpha = 0.25)
          .orderBy($"user_id", $"ts", $"event_id")
      },
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

    // Holt linear-trend smoothing: same bitwise-fold device as q_ewma —
    // α=0.5/β=0.25 are exact binary doubles and the SQL recursion uses
    // the IDENTICAL expression structure (inner subquery computes the
    // new level once, then the trend update reads it), so level, trend
    // and forecast trajectories match with no rounding
    "q_holt_linear" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.holtLinear(
          Registry.events(s, dir).filter($"event_type" === "purchase"),
          "user_id", "ts", "event_id", "value", alpha = 0.5, beta = 0.25)
          .select($"user_id", $"ts", $"event_id", $"value",
            $"level", $"trend", $"forecast")
          .orderBy($"user_id", $"ts", $"event_id")
      },
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

    // interval-union coverage: each purchase opens a value-minutes
    // activity window; overlapping-or-touching windows merge per user
    // via the running-max gaps-and-islands pass, summarized as total
    // covered minutes — the uptime/utilization primitive
    "q_interval_merge" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val iv = Registry.events(s, dir).filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("lo"),
            timestamp_micros(unix_micros($"ts") +
              round($"value").cast("long") * lit(60000000L)).as("hi"))
        TemporalJoins.mergeIntervals(iv, "user_id", "lo", "hi")
          .groupBy($"user_id")
          .agg(count(lit(1)).cast("int").as("n_islands"),
            sum($"n_segments").cast("int").as("n_segments"),
            (sum(unix_micros($"merged_hi") - unix_micros($"merged_lo"))
              / lit(60000000L)).cast("double").as("covered_minutes"))
          .select($"user_id", $"n_islands", $"n_segments",
            round($"covered_minutes", 4).as("covered_minutes"))
          .orderBy($"user_id")
      },
      Some("""WITH iv AS (
             |  SELECT user_id, ts AS lo,
             |         make_timestamp(epoch_us(ts)
             |           + CAST(round(value) AS BIGINT) * 60000000) AS hi
             |  FROM events WHERE event_type = 'purchase'),
             |f AS (
             |  SELECT user_id, lo, hi,
             |    CASE WHEN max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |         OR lo > max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |         THEN 1 ELSE 0 END AS newi
             |  FROM iv WHERE lo <= hi),
             |isl AS (
             |  SELECT user_id, lo, hi,
             |    sum(newi) OVER (PARTITION BY user_id ORDER BY lo, hi
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM f),
             |m AS (
             |  SELECT user_id, island, min(lo) AS mlo, max(hi) AS mhi,
             |         count(*) AS nseg
             |  FROM isl GROUP BY 1, 2)
             |SELECT user_id, CAST(count(*) AS INT) AS n_islands,
             |       CAST(sum(nseg) AS INT) AS n_segments,
             |       round(CAST(sum(epoch_us(mhi) - epoch_us(mlo)) AS DOUBLE)
             |         / 60000000, 4) AS covered_minutes
             |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // cross-correlation lead-lag scan: daily click counts vs purchase
    // counts per user, lags -3..3 pooled across users; best = highest
    // |corr|, ties to the smaller lag
    "q_cross_corr" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        def daily(t: String) = ev.filter($"event_type" === t)
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(count(lit(1)).cast("double").as("n"))
        TimeSeries.crossCorr(daily("click"), daily("purchase"),
            "user_id", "day", "n", "n", maxLag = 3)
          .orderBy($"lag")
      },
      Some("""WITH a AS (
             |  SELECT user_id AS k, CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS DOUBLE) AS av
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |b AS (
             |  SELECT user_id AS k, CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS DOUBLE) AS bv
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |l AS (SELECT CAST(unnest(range(-3, 4)) AS INT) AS lag),
             |j AS (SELECT l.lag, a.av, b.bv
             |      FROM a CROSS JOIN l
             |      JOIN b ON a.k = b.k AND a.d + l.lag = b.d),
             |g AS (SELECT lag, CAST(count(*) AS INT) AS n_pairs,
             |             round(corr(av, bv), 6) AS xcorr
             |      FROM j GROUP BY lag)
             |SELECT lag, n_pairs, xcorr,
             |       lag = (SELECT lag FROM g
             |              ORDER BY abs(xcorr) DESC NULLS LAST, lag LIMIT 1) AS best
             |FROM g ORDER BY lag""".stripMargin)),

    // CUSUM drift detection: per-user baseline mean from the first 20
    // purchases, two one-sided sums with slack 5 / threshold 50,
    // reset-after-alarm; carried sums rounded 6dp each step so the
    // recursive CTE carries identical state
    "q_cusum" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.cusum(
          Registry.events(s, dir).filter($"event_type" === "purchase"),
          "user_id", "ts", "event_id", "value",
          baselineN = 20, slack = 5.0, threshold = 50.0)
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""WITH RECURSIVE ordered AS (
             |  SELECT user_id, ts, event_id, value,
             |         row_number() OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS rn
             |  FROM events WHERE event_type = 'purchase'),
             |muq AS (SELECT user_id, round(avg(value), 6) AS mu
             |        FROM ordered WHERE rn <= 20 GROUP BY 1),
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

    // classical additive decomposition of daily event counts, weekly
    // period: centered-MA trend (null at edges), zero-centered per-phase
    // seasonal, residual — every stage replayed in SQL at 6dp
    "q_seasonal_decompose" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val daily = Registry.events(s, dir)
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(count(lit(1)).cast("double").as("n"))
        TimeSeries.seasonalDecompose(daily, "event_type", "day", "n", period = 7)
          .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
            $"phase", $"v", $"trend", $"seasonal", $"residual")
          .orderBy($"event_type", $"day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |         CAST(count(*) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |b AS (
             |  SELECT event_type, day, v,
             |    CAST(CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS INT) AS phase,
             |    CASE WHEN count(v) OVER w = 7
             |         THEN round(avg(v) OVER w, 6) END AS trend
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |d AS (SELECT *, v - trend AS detrended FROM b),
             |pm AS (SELECT event_type, phase, round(avg(detrended), 6) AS phase_mean
             |       FROM d GROUP BY 1, 2),
             |ctr AS (SELECT event_type, phase,
             |          round(phase_mean - avg(phase_mean) OVER (
             |            PARTITION BY event_type), 6) AS seasonal
             |        FROM pm)
             |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.phase,
             |       d.v, d.trend, c.seasonal,
             |       round(d.v - d.trend - c.seasonal, 6) AS residual
             |FROM d JOIN ctr c ON d.event_type = c.event_type AND d.phase = c.phase
             |ORDER BY d.event_type, day""".stripMargin)),

    // seasonality-adjusted anomaly screen: decompose weekly pattern,
    // robust-z the residuals per series — the composition that keeps
    // every Friday peak from tripping the detector
    "q_seasonal_anomaly" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val daily = Registry.events(s, dir)
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(count(lit(1)).cast("double").as("n"))
        val res = TimeSeries.seasonalDecompose(daily, "event_type", "day", "n",
            period = 7)
          .filter($"trend".isNotNull)
          .select($"event_type", $"day", $"v", $"residual")
        graft.pipeline.Profiling.robustZscore(res, "event_type", "residual")
          .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
            $"v", $"residual", $"robust_z".as("season_adj_z"))
          .orderBy($"event_type", $"day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |         CAST(count(*) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |b AS (
             |  SELECT event_type, day, v,
             |    CAST(CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS INT) AS phase,
             |    CASE WHEN count(v) OVER w = 7
             |         THEN round(avg(v) OVER w, 6) END AS trend
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |d AS (SELECT *, v - trend AS detrended FROM b),
             |pm AS (SELECT event_type, phase, round(avg(detrended), 6) AS phase_mean
             |       FROM d GROUP BY 1, 2),
             |ctr AS (SELECT event_type, phase,
             |          round(phase_mean - avg(phase_mean) OVER (
             |            PARTITION BY event_type), 6) AS seasonal
             |        FROM pm),
             |res AS (
             |  SELECT d.event_type, d.day, d.v,
             |         round(d.v - d.trend - c.seasonal, 6) AS residual
             |  FROM d JOIN ctr c ON d.event_type = c.event_type AND d.phase = c.phase
             |  WHERE d.trend IS NOT NULL),
             |med AS (SELECT event_type, round(quantile_cont(residual, 0.5), 6) AS m
             |        FROM res GROUP BY 1),
             |mad AS (SELECT r.event_type,
             |          round(quantile_cont(abs(r.residual - med.m), 0.5), 6) AS d
             |        FROM res r JOIN med USING (event_type) GROUP BY 1)
             |SELECT r.event_type, strftime(r.day, '%Y-%m-%d') AS day, r.v,
             |       r.residual,
             |       CASE WHEN mad.d > 0 THEN
             |         round((r.residual - med.m) / (1.4826 * mad.d), 4)
             |       END AS season_adj_z
             |FROM res r JOIN med USING (event_type) JOIN mad USING (event_type)
             |ORDER BY r.event_type, day""".stripMargin)),

    // exact rolling median (10 preceding + current), quantile_cont
    // interpolation on even window counts — the robust denoiser next to
    // the rolling-zscore screen
    "q_rolling_median" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.rollingMedian(
          Registry.events(s, dir).filter($"event_type" === "purchase")
            .select($"user_id", $"ts", $"event_id", $"value"),
          "user_id", "ts", "event_id", "value", lookback = 10)
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""SELECT user_id, ts, event_id, value,
             |  CAST(count(*) OVER w AS INT) AS n_window,
             |  round(quantile_cont(value, 0.5) OVER w, 6) AS rolling_median
             |FROM events WHERE event_type = 'purchase'
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, ts, event_id""".stripMargin)),

    // rolling z-score outlier screen: each purchase scored against the
    // mean/stddev of its 20 preceding purchases (current row excluded);
    // 4dp rounding keeps the engines' variance associativity out of the
    // hash
    "q_ts_anomaly" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.rollingZscore(
          Registry.events(s, dir).filter($"event_type" === "purchase")
            .select($"user_id", $"ts", $"event_id", $"value"),
          "user_id", "ts", "event_id", "value",
          lookback = 20, minPoints = 5, threshold = 3.0)
          .orderBy($"user_id", $"ts", $"event_id")
      },
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

    // MATCH_RECOGNIZE-lite: each user's event stream serialized to a code
    // string in (ts, event_id) order, "view leading through clicks/errors
    // to a purchase" counted as non-overlapping regex matches — the same
    // left-to-right semantics in both regex engines
    "q_event_pattern" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.operators.Sessionize.eventPatternCounts(
          Registry.events(s, dir), "user_id", "event_type", "ts", "event_id",
          codes = Map("view" -> "v", "click" -> "c", "error" -> "e",
            "purchase" -> "p", "signup" -> "s"),
          pattern = "v[ce]*p")
          .orderBy($"key")
          .select($"key".as("user_id"), $"n_events", $"seq_len",
            $"n_matches", $"matched")
      },
      Some("""WITH coded AS (
             |  SELECT user_id, ts, event_id,
             |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
             |      WHEN 'error' THEN 'e' WHEN 'purchase' THEN 'p'
             |      WHEN 'signup' THEN 's' END AS c
             |  FROM events),
             |seqs AS (
             |  SELECT user_id, count(*) AS n_events,
             |         string_agg(c, '' ORDER BY ts, event_id) AS seq
             |  FROM coded WHERE c IS NOT NULL GROUP BY user_id)
             |SELECT user_id, n_events, CAST(length(seq) AS INT) AS seq_len,
             |  CAST(len(regexp_extract_all(seq, 'v[ce]*p')) AS INT) AS n_matches,
             |  len(regexp_extract_all(seq, 'v[ce]*p')) > 0 AS matched
             |FROM seqs ORDER BY user_id""".stripMargin)),

    // time-weighted average (TWAP): each observation holds until the
    // next one or the bucket edge; one lead window + one hash aggregate
    "q_twap" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.twap(
          Registry.events(s, dir).filter($"event_type" === "purchase"),
          "user_id", "ts", "event_id", "value", bucket = "1 hour")
          .select($"key".as("user_id"),
            date_format($"bucket_start", "yyyy-MM-dd HH:mm").as("hour"),
            $"n_obs", $"twap")
          .orderBy($"user_id", $"hour")
      },
      Some("""WITH b AS (
             |  SELECT user_id, ts, event_id, value,
             |    epoch_us(ts) AS tus,
             |    date_trunc('hour', ts) AS bs,
             |    epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS bend,
             |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS nxt
             |  FROM events WHERE event_type = 'purchase'),
             |h AS (SELECT user_id, bs, value,
             |        least(coalesce(nxt, bend), bend) - tus AS hold
             |      FROM b WHERE least(coalesce(nxt, bend), bend) - tus >= 0)
             |SELECT user_id, strftime(bs, '%Y-%m-%d %H:%M') AS hour,
             |  count(*) AS n_obs,
             |  round(sum(value * hold) / sum(hold), 6) AS twap
             |FROM h GROUP BY user_id, bs
             |ORDER BY user_id, hour""".stripMargin)),

    // interval × interval overlap join, both sides binned, candidates
    // deduped by keeping only the overlap-start bin (no distinct
    // shuffle); oracle is DuckDB's plain inequality join
    "q_interval_overlap" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        // ±-window intervals derived per event: clicks get [ts, ts+30m),
        // purchases [ts−5m, ts+5m] — overlap = purchase near a click
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"),
            unix_micros($"ts").as("c_lo"),
            (unix_micros($"ts") + 1800L * 1000000L).as("c_hi"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("purchase_id"),
            (unix_micros($"ts") - 300L * 1000000L).as("p_lo"),
            (unix_micros($"ts") + 300L * 1000000L).as("p_hi"))
        TemporalJoins.intervalOverlapJoin(clicks, purchases, Seq("user_id"),
            "c_lo", "c_hi", "p_lo", "p_hi", binWidth = 1800L * 1000000L)
          .select($"user_id", $"click_id", $"purchase_id")
          .orderBy($"user_id", $"click_id", $"purchase_id")
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_id AS click_id,
             |         epoch_us(ts) AS lo, epoch_us(ts) + 1800000000 AS hi
             |  FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id, event_id AS purchase_id,
             |         epoch_us(ts) - 300000000 AS lo, epoch_us(ts) + 300000000 AS hi
             |  FROM events WHERE event_type = 'purchase')
             |SELECT c.user_id AS user_id, c.click_id, p.purchase_id
             |FROM c JOIN p ON c.user_id = p.user_id
             |              AND c.lo <= p.hi AND p.lo <= c.hi
             |ORDER BY c.user_id, click_id, purchase_id""".stripMargin)),

    // lag-1 persistence per user: align pairs with one keyed window pass,
    // correlate with one hash aggregate; sparse users stay as null rows
    "q_lag_autocorr" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        TimeSeries.lagAutocorr(
          Registry.events(s, dir).filter($"event_type" === "purchase"),
          "user_id", "ts", "event_id", "value", lag = 1)
          .orderBy($"user_id")
      },
      Some("""WITH lagged AS (
             |  SELECT user_id, value,
             |    lag(value, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM events WHERE event_type = 'purchase')
             |SELECT user_id, count(prev) AS n_pairs,
             |  round(corr(value, prev), 6) AS acf_1
             |FROM lagged GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // for each click, the latest purchase by the same user at or before it
    "q_asof_purchase" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("pid"), $"user_id", $"ts", $"value")
        TemporalJoins.asofJoin(clicks, purchases, Seq("user_id"),
            leftTsCol = "ts", rightTsCol = "ts",
            rightValueCols = Seq("pid", "ts", "value"), rightOrder = Some("pid"))
          .select($"event_id", $"user_id", $"ts",
            $"right_pid".as("purchase_id"), $"right_ts".as("purchase_ts"),
            round($"right_value", 4).as("purchase_value"))
          .orderBy($"event_id")
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT event_id AS purchase_id, user_id, ts AS pts, value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT c.event_id, c.user_id, c.ts, p.purchase_id,
             |       p.pts AS purchase_ts, round(p.value, 4) AS purchase_value
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts >= p.pts
             |ORDER BY c.event_id""".stripMargin)),

    // nearest-direction as-of (merge_asof direction='nearest'): each
    // click takes whichever purchase is closer in time within 6 h, ties
    // backward; the oracle replays the union + two-frame window
    // construction (DuckDB ASOF JOIN has no nearest mode)
    "q_asof_nearest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("pid"), $"user_id", $"ts", $"value")
        TemporalJoins.asofJoinNearest(clicks, purchases, Seq("user_id"),
            leftTsCol = "ts", rightTsCol = "ts",
            rightValueCols = Seq("pid", "ts", "value"), rightOrder = Some("pid"),
            toleranceMs = Some(6L * 3600 * 1000))
          .select($"event_id", $"user_id", $"ts",
            $"right_pid".as("purchase_id"), $"right_ts".as("purchase_ts"),
            round($"right_value", 4).as("purchase_value"), $"asof_dir")
          .orderBy($"event_id")
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT event_id AS pid, user_id, ts, value
             |  FROM events WHERE event_type = 'purchase'),
             |u AS (
             |  SELECT user_id, ts, 1 AS side, NULL::BIGINT AS ord,
             |         NULL::BIGINT AS r_pid, NULL::TIMESTAMP AS r_pts,
             |         NULL::DOUBLE AS r_value
             |  FROM (SELECT DISTINCT user_id, ts FROM c)
             |  UNION ALL
             |  SELECT user_id, ts, 0, pid, pid, ts, value FROM p),
             |w AS (
             |  SELECT user_id, ts, side,
             |    last_value(r_pid IGNORE NULLS) OVER bwin AS b_pid,
             |    last_value(r_pts IGNORE NULLS) OVER bwin AS b_pts,
             |    last_value(r_value IGNORE NULLS) OVER bwin AS b_value,
             |    first_value(r_pid IGNORE NULLS) OVER fwin AS f_pid,
             |    first_value(r_pts IGNORE NULLS) OVER fwin AS f_pts,
             |    first_value(r_value IGNORE NULLS) OVER fwin AS f_value
             |  FROM u
             |  WINDOW bwin AS (PARTITION BY user_id ORDER BY ts, side, ord
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  fwin AS (PARTITION BY user_id ORDER BY ts, side, ord
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
             |ch AS (
             |  SELECT user_id, ts,
             |    b_pts IS NOT NULL AND epoch_ms(ts) - epoch_ms(b_pts) <= 21600000 AS b_ok,
             |    f_pts IS NOT NULL AND epoch_ms(f_pts) - epoch_ms(ts) <= 21600000 AS f_ok,
             |    epoch_ms(ts) - epoch_ms(b_pts) AS bd,
             |    epoch_ms(f_pts) - epoch_ms(ts) AS fd,
             |    b_pid, b_pts, b_value, f_pid, f_pts, f_value
             |  FROM w WHERE side = 1),
             |sel AS (
             |  SELECT user_id, ts,
             |    CASE WHEN b_ok AND (NOT f_ok OR bd <= fd) THEN 'backward'
             |         WHEN f_ok THEN 'forward' END AS asof_dir,
             |    CASE WHEN b_ok AND (NOT f_ok OR bd <= fd) THEN b_pid
             |         WHEN f_ok THEN f_pid END AS purchase_id,
             |    CASE WHEN b_ok AND (NOT f_ok OR bd <= fd) THEN b_pts
             |         WHEN f_ok THEN f_pts END AS purchase_ts,
             |    CASE WHEN b_ok AND (NOT f_ok OR bd <= fd) THEN b_value
             |         WHEN f_ok THEN f_value END AS purchase_value
             |  FROM ch)
             |SELECT c.event_id, c.user_id, c.ts, sel.purchase_id,
             |       sel.purchase_ts, round(sel.purchase_value, 4) AS purchase_value,
             |       sel.asof_dir
             |FROM c JOIN sel ON c.user_id = sel.user_id AND c.ts = sel.ts
             |ORDER BY c.event_id""".stripMargin)),

    // as-of with a staleness bound (pandas merge_asof tolerance): the
    // latest purchase counts only within 6 hours of the click — older
    // matches null out, the click row survives
    "q_asof_tolerance" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("pid"), $"user_id", $"ts", $"value")
        TemporalJoins.asofJoinTolerance(clicks, purchases, Seq("user_id"),
            leftTsCol = "ts", rightTsCol = "ts",
            rightValueCols = Seq("pid", "value"),
            toleranceMs = 6L * 3600L * 1000L, rightOrder = Some("pid"))
          .select($"event_id", $"user_id", $"ts",
            $"right_pid".as("purchase_id"),
            round($"right_value", 4).as("purchase_value"))
          .orderBy($"event_id")
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT event_id AS purchase_id, user_id, ts AS pts, value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT c.event_id, c.user_id, c.ts,
             |  CASE WHEN epoch_ms(c.ts) - epoch_ms(p.pts) <= 21600000
             |       THEN p.purchase_id END AS purchase_id,
             |  CASE WHEN epoch_ms(c.ts) - epoch_ms(p.pts) <= 21600000
             |       THEN round(p.value, 4) END AS purchase_value
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts >= p.pts
             |ORDER BY c.event_id""".stripMargin)),

    // forward as-of: for each signup, the user's first purchase at or after
    "q_asof_next_purchase" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        val signups = ev.filter($"event_type" === "signup")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("pid"), $"user_id", $"ts", $"value")
        TemporalJoins.asofJoin(signups, purchases, Seq("user_id"),
            leftTsCol = "ts", rightTsCol = "ts",
            rightValueCols = Seq("pid", "ts", "value"),
            rightOrder = Some("pid"), direction = "forward")
          .select($"event_id", $"user_id", $"ts",
            $"right_pid".as("purchase_id"), $"right_ts".as("purchase_ts"),
            round($"right_value", 4).as("purchase_value"))
          .orderBy($"event_id")
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
             |p AS (
             |  SELECT event_id AS purchase_id, user_id, ts AS pts, value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT c.event_id, c.user_id, c.ts, p.purchase_id,
             |       p.pts AS purchase_ts, round(p.value, 4) AS purchase_value
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts <= p.pts
             |ORDER BY c.event_id""".stripMargin)),

    // per error event: how many views the same user had in the preceding
    // 6 hours, and their total value (binned range join, no cartesian)
    "q_range_error_context" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        val views = ev.filter($"event_type" === "view")
          .select($"user_id", unix_micros($"ts").as("vts"), $"value")
        val errors = ev.filter($"event_type" === "error")
          .select($"event_id".as("error_id"), $"user_id",
            (unix_micros($"ts") - 21600000000L).as("lo"), unix_micros($"ts").as("hi"))
        TemporalJoins.rangeJoinBinned(views, errors, Seq("user_id"),
            leftPointCol = "vts", loCol = "lo", hiCol = "hi",
            binWidth = 21600000000L)
          .groupBy($"error_id")
          .agg(count(lit(1)).as("n_views"), round(sum($"value"), 4).as("sum_view_value"))
          .orderBy($"error_id")
      },
      Some("""WITH err AS (
             |  SELECT event_id AS error_id, user_id, ts
             |  FROM events WHERE event_type = 'error'),
             |v AS (
             |  SELECT user_id, ts AS vts, value FROM events WHERE event_type = 'view')
             |SELECT error_id, count(*) AS n_views, round(sum(v.value), 4) AS sum_view_value
             |FROM err JOIN v
             |  ON err.user_id = v.user_id
             | AND v.vts BETWEEN err.ts - INTERVAL 6 HOUR AND err.ts
             |GROUP BY error_id ORDER BY error_id""".stripMargin)),

    // batch gap sessionization (30-min gap), aggregated per session — the
    // backfill twin of q_stream_sessionize, verified by the same window
    // math in DuckDB
    // grid-blocked spatial self-join: md5-deterministic user coords in
    // a 10°×20° region, all pairs within 100 km via cell equi-join +
    // exact haversine (4dp absorbs libm trig); never a cross product
    "q_geo_neighbors" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val u = Registry.events(s, dir).select($"user_id").distinct()
        def draw(salt: String) = graft.pipeline.Dedup.baseHash60(
          concat(lit(s"$salt:"), $"user_id".cast("string")))
          .cast("double") / lit(math.pow(2, 60))
        val pts = u.select($"user_id",
          round(lit(40.0) + lit(10.0) * draw("lat"), 6).as("lat"),
          round(lit(0.0) + lit(20.0) * draw("lon"), 6).as("lon"))
        graft.operators.Geo.geoNeighbors(pts, "user_id", "lat", "lon",
            radiusKm = 100.0)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |c AS (
             |  SELECT user_id,
             |    round(40.0 + 10.0 * (CAST(('0x' || substr(md5('lat:' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      / 1152921504606846976.0), 6) AS lat,
             |    round(0.0 + 20.0 * (CAST(('0x' || substr(md5('lon:' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      / 1152921504606846976.0), 6) AS lon
             |  FROM u),
             |p AS (
             |  SELECT a.user_id AS id_a, b.user_id AS id_b,
             |    round(2 * 6371.0088 * asin(sqrt(
             |      sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
             |      + cos(radians(a.lat)) * cos(radians(b.lat))
             |      * sin(radians(b.lon - a.lon) / 2)
             |      * sin(radians(b.lon - a.lon) / 2))), 4) AS distance_km
             |  FROM c a JOIN c b ON a.user_id < b.user_id)
             |SELECT id_a, id_b, distance_km FROM p
             |WHERE distance_km <= 100.0
             |ORDER BY id_a, id_b""".stripMargin)),

    // nearest-site assignment: every user snapped to the closest of 20
    // synthetic stores (broadcast argmin, no window); same md5 coords
    "q_geo_nearest_site" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val u = Registry.events(s, dir).select($"user_id").distinct()
        def draw(salt: String, c: org.apache.spark.sql.Column) =
          graft.pipeline.Dedup.baseHash60(concat(lit(s"$salt:"), c.cast("string")))
            .cast("double") / lit(math.pow(2, 60))
        val pts = u.select($"user_id",
          round(lit(40.0) + lit(10.0) * draw("lat", $"user_id"), 6).as("lat"),
          round(lit(0.0) + lit(20.0) * draw("lon", $"user_id"), 6).as("lon"))
        val sites = s.range(20).select($"id".as("site_id"),
          round(lit(40.0) + lit(10.0) * draw("slat", $"id"), 6).as("slat"),
          round(lit(0.0) + lit(20.0) * draw("slon", $"id"), 6).as("slon"))
        graft.operators.Geo.nearestSite(pts, "user_id", "lat", "lon",
            sites, "site_id", "slat", "slon")
          .orderBy($"user_id")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |c AS (
             |  SELECT user_id,
             |    round(40.0 + 10.0 * (CAST(('0x' || substr(md5('lat:' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      / 1152921504606846976.0), 6) AS lat,
             |    round(0.0 + 20.0 * (CAST(('0x' || substr(md5('lon:' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      / 1152921504606846976.0), 6) AS lon
             |  FROM u),
             |st AS (
             |  SELECT s AS site_id,
             |    round(40.0 + 10.0 * (CAST(('0x' || substr(md5('slat:' ||
             |      CAST(s AS VARCHAR)), 1, 15)) AS BIGINT)
             |      / 1152921504606846976.0), 6) AS slat,
             |    round(0.0 + 20.0 * (CAST(('0x' || substr(md5('slon:' ||
             |      CAST(s AS VARCHAR)), 1, 15)) AS BIGINT)
             |      / 1152921504606846976.0), 6) AS slon
             |  FROM (SELECT unnest(range(0, 20)) AS s)),
             |d AS (
             |  SELECT c.user_id, st.site_id,
             |    round(2 * 6371.0088 * asin(sqrt(
             |      sin(radians(st.slat - c.lat) / 2) * sin(radians(st.slat - c.lat) / 2)
             |      + cos(radians(c.lat)) * cos(radians(st.slat))
             |      * sin(radians(st.slon - c.lon) / 2)
             |      * sin(radians(st.slon - c.lon) / 2))), 4) AS distance_km
             |  FROM c CROSS JOIN st)
             |SELECT user_id, site_id, distance_km FROM d
             |QUALIFY row_number() OVER (PARTITION BY user_id
             |  ORDER BY distance_km ASC, site_id ASC) = 1
             |ORDER BY user_id""".stripMargin)),

    // behavioral similarity: users whose coded event sequences sit
    // within edit-distance 10% of each other — exact length-difference
    // blocking (complete, integer arithmetic), one levenshtein pass on
    // the banded candidates; both engines share the textbook distance
    "q_behavior_similarity" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Sessionize.behaviorSimilarity(Registry.events(s, dir),
            "user_id", "event_type", "ts", "event_id",
            codes = Map("view" -> "v", "click" -> "c", "error" -> "e",
              "purchase" -> "p", "signup" -> "s"),
            minSimilarity = 0.9)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH coded AS (
             |  SELECT user_id, ts, event_id,
             |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
             |      WHEN 'error' THEN 'e' WHEN 'purchase' THEN 'p'
             |      WHEN 'signup' THEN 's' END AS c
             |  FROM events),
             |seqs AS (
             |  SELECT user_id AS key,
             |         string_agg(c, '' ORDER BY ts, event_id) AS seq,
             |         CAST(length(string_agg(c, '' ORDER BY ts, event_id)) AS INT)
             |           AS len
             |  FROM coded WHERE c IS NOT NULL GROUP BY user_id),
             |mx AS (SELECT CAST(ceil(0.1 * max(len)) AS INT) AS delta FROM seqs),
             |p AS (
             |  SELECT a.key AS id_a, b.key AS id_b, a.len AS len_a,
             |         b.len AS len_b, levenshtein(a.seq, b.seq) AS dist
             |  FROM seqs a JOIN seqs b
             |    ON abs(a.len - b.len) <= (SELECT delta FROM mx)
             |   AND a.key < b.key)
             |SELECT id_a, id_b, len_a, len_b, dist,
             |       round(1.0 - CAST(dist AS DOUBLE) / greatest(len_a, len_b), 6)
             |         AS similarity
             |FROM p
             |WHERE round(1.0 - CAST(dist AS DOUBLE) / greatest(len_a, len_b), 6)
             |      >= 0.9
             |ORDER BY id_a, id_b""".stripMargin)),

    // top-10 three-step event journeys across all users — one window
    // sort, two leads, path aggregate
    "q_frequent_paths" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Sessionize.frequentPaths3(Registry.events(s, dir),
          "user_id", "ts", "event_id", "event_type", topK = 10)
      },
      Some("""WITH p AS (
             |  SELECT event_type AS s1,
             |    lead(event_type, 1) OVER w AS s2,
             |    lead(event_type, 2) OVER w AS s3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT s1 || '>' || s2 || '>' || s3 AS path, count(*) AS n
             |FROM p WHERE s3 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10""".stripMargin)),

    // first-order Markov transitions between event types per user —
    // the user-journey flow matrix; row-normalized at 6dp
    "q_markov_transitions" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Sessionize.markovTransitions(Registry.events(s, dir),
            "user_id", "ts", "event_id", "event_type")
          .orderBy($"from_state", $"to_state")
      },
      Some("""WITH p AS (
             |  SELECT event_type AS from_state,
             |         lead(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS to_state
             |  FROM events),
             |g AS (SELECT from_state, to_state, count(*) AS n
             |      FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2)
             |SELECT from_state, to_state, n,
             |       round(n / sum(n) OVER (PARTITION BY from_state), 6) AS p
             |FROM g ORDER BY from_state, to_state""".stripMargin)),

    "q_sessionize_batch" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.operators.Sessionize.byGap(
          Registry.events(s, dir).select($"user_id", $"ts"),
          "user_id", "ts", gapMs = 30L * 60L * 1000L)
          .groupBy($"user_id", $"session_seq")
          .agg(count(lit(1)).as("n_events"),
            min(unix_millis($"ts")).as("start_ms"),
            max(unix_millis($"ts")).as("end_ms"))
          .orderBy($"user_id", $"session_seq")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
             |f AS (
             |  SELECT user_id, ms,
             |    CASE WHEN lag(ms) OVER w IS NULL
             |           OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
             |s AS (
             |  SELECT user_id, ms,
             |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ms
             |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_seq
             |  FROM f)
             |SELECT user_id, session_seq, count(*) AS n_events,
             |       min(ms) AS start_ms, max(ms) AS end_ms
             |FROM s GROUP BY user_id, session_seq
             |ORDER BY user_id, session_seq""".stripMargin)),

    // ordered funnel view → click → purchase: each step must occur
    // strictly after the user's earliest completion of the previous one;
    // one key shuffle reused by every stage and the final count. Sliced to
    // the first two days so the fixture actually distributes users across
    // ALL four stages (the full month completes every funnel)
    "q_event_funnel" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.operators.Sessionize.funnelStages(
            Registry.events(s, dir).filter($"ts" < lit("2024-01-03")),
            "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
          .groupBy($"funnel_stage").agg(count(lit(1)).as("n_users"))
          .orderBy($"funnel_stage")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
             |        WHERE ts < TIMESTAMP '2024-01-03'),
             |s0 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ms END) AS v0
             |       FROM e GROUP BY 1),
             |s1 AS (SELECT e.user_id, min(CASE WHEN event_type = 'click' AND ms > v0 THEN ms END) AS v1
             |       FROM e JOIN s0 USING (user_id) GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(CASE WHEN event_type = 'purchase' AND ms > v1 THEN ms END) AS v2
             |       FROM e JOIN s1 USING (user_id) GROUP BY 1),
             |st AS (
             |  SELECT s0.user_id,
             |    CASE WHEN v2 IS NOT NULL THEN 3 WHEN v1 IS NOT NULL THEN 2
             |         WHEN v0 IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage
             |  FROM s0 JOIN s1 USING (user_id) JOIN s2 USING (user_id))
             |SELECT funnel_stage, count(*) AS n_users FROM st
             |GROUP BY funnel_stage ORDER BY funnel_stage""".stripMargin)),

    // daily purchase-retention matrix: users cohorted by first-purchase
    // day, each (cohort, offset) cell = users purchasing again offset days
    // later (11 cohorts × offsets on the fixture — integer day arithmetic
    // both engines compute identically)
    "q_cohort_retention" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.operators.Sessionize.cohortRetention(
            Registry.events(s, dir).filter($"event_type" === "purchase"),
            "user_id", "ts",
            epoch0Ms = 1704067200000L, periodMs = 86400000L)
          .orderBy($"cohort_period", $"period_offset")
      },
      Some("""WITH e AS (
             |  SELECT user_id, (epoch_ms(ts) - 1704067200000) // 86400000 AS p
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, min(p) AS cohort_period FROM e GROUP BY 1),
             |a AS (SELECT DISTINCT user_id, p FROM e)
             |SELECT cohort_period, p - cohort_period AS period_offset,
             |       count(*) AS n_keys
             |FROM a JOIN c USING (user_id)
             |GROUP BY cohort_period, period_offset
             |ORDER BY cohort_period, period_offset""".stripMargin)))

  /** Unrolled two-level binary-segmentation replay (mirrors
    * [[graft.operators.TimeSeries.changepoints]]): exact scaled-integer
    * partial sums, double gains from exact integers, struct-max argmax
    * with the (gain, −i) key, left-joined re-segmentation per level. */
  private def changepointOracleSql: String = {
    def level(l: Int): String =
      s"""a$l AS (
         |  SELECT k, t, v6, seg,
         |    CAST(row_number() OVER (PARTITION BY k, seg ORDER BY t) AS BIGINT) AS i,
         |    CAST(sum(v6) OVER (PARTITION BY k, seg ORDER BY t
         |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(count(*) OVER (PARTITION BY k, seg) AS BIGINT) AS n,
         |    CAST(sum(v6) OVER (PARTITION BY k, seg) AS BIGINT) AS s
         |  FROM lv${l - 1}),
         |g$l AS (
         |  SELECT k, seg, (m).g AS g, -((m).ni) AS sp FROM (
         |    SELECT k, seg, max(struct_pack(
         |      g := (CAST(cum AS DOUBLE) * CAST(cum AS DOUBLE) / i
         |            + CAST(s - cum AS DOUBLE) * CAST(s - cum AS DOUBLE) / (n - i)
         |            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / 1e12,
         |      ni := -i)) AS m
         |    FROM a$l WHERE i >= 5 AND n - i >= 5 GROUP BY 1, 2)
         |  WHERE (m).g > 5.0),
         |r$l AS (
         |  SELECT a.k, $l AS level, a.seg AS segment, a.t AS split_at,
         |         a.i AS n_left, a.n - a.i AS n_right, round(b.g, 6) AS gain
         |  FROM a$l a JOIN g$l b ON b.k = a.k AND b.seg = a.seg AND a.i = b.sp),
         |lv$l AS (
         |  SELECT a.k, a.t, a.v6,
         |    CASE WHEN b.k IS NULL THEN a.seg
         |         WHEN a.i <= b.sp THEN a.seg || 'L' ELSE a.seg || 'R' END AS seg
         |  FROM a$l a LEFT JOIN g$l b ON b.k = a.k AND b.seg = a.seg)""".stripMargin
    s"""WITH lv0 AS (
       |  SELECT event_type AS k, CAST(ts AS DATE) AS t,
       |    CAST(round(round(avg(value
       |      + CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-18' THEN 10.0 ELSE 0 END
       |      + CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-25' THEN 5.0 ELSE 0 END
       |      ), 6) * 1e6) AS BIGINT) AS v6,
       |    '' AS seg
       |  FROM events GROUP BY 1, 2),
       |${level(1)},
       |${level(2)}
       |SELECT k AS event_type, level, segment,
       |  strftime(split_at, '%Y-%m-%d') AS split_day, n_left, n_right, gain
       |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
       |ORDER BY event_type, level, segment""".stripMargin
  }
}
