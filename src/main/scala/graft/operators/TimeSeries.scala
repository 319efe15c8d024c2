package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: reindex a keyed, possibly-gappy series onto
 * its complete per-key calendar spine and carry observations forward — the
 * resample/reindex + ffill step every metrics or feature pipeline runs
 * before modeling (pandas `asfreq`/`ffill`, the reference has no temporal
 * surface at all, so this is added capability).
 */
object TimeSeries {

  /**
   * Gap-fill a keyed daily series: for each key, generate every calendar
   * day between its first and last observation (`sequence` + `explode` —
   * a map-side generator, spine length linear in each key's span), left
   * join the observations back, and forward-fill the value column with the
   * running `last(_, ignoreNulls)` window. Adds an `observed` flag so
   * downstream consumers can distinguish carried values from real ones.
   *
   * Scale shape: one aggregate for the per-key span, one key-partitioned
   * window pass for the fill. Both spine and fill shuffle on the key, and
   * AQE coalesces the small side; no driver loops, no per-key collect. At
   * 100 TB the dominant cost is the single window sort per key — exactly
   * the minimum any order-dependent fill requires.
   *
   * `daily` must be one row per (key, date); `dateCol` must be a DATE.
   */
  def gapFillForwardDaily(daily: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__ts_lo"), max(col(dateCol)).as("__ts_hi"))
      .select(col(keyCol),
        explode(sequence(col("__ts_lo"), col("__ts_hi"), expr("interval 1 day")))
          .as(dateCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, dateCol), "left")
      .withColumn("observed", col(valueCol).isNotNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /**
   * Daily calendar-spine gap fill with LINEAR interpolation — the
   * numeric sibling of `gapFillForwardDaily` for continuous metrics
   * (rates, balances, sensor readings) where carrying the last value
   * flat would bias trends. Every gap is interior by construction (the
   * spine spans each key's own [min, max] observed dates, so both
   * edges are observed): a missing day gets
   * prev + (next − prev) · (day − prevDay)/(nextDay − prevDay),
   * rounded 6dp. Same scale shape as the forward fill — one spine
   * explode, one left join, two window passes over the SAME key
   * partitioning (Catalyst reuses one sort/shuffle for both frames).
   */
  def gapFillInterpolateDaily(daily: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__ts_lo"), max(col(dateCol)).as("__ts_hi"))
      .select(col(keyCol),
        explode(sequence(col("__ts_lo"), col("__ts_hi"), expr("interval 1 day")))
          .as(dateCol))
    val back = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    spine.join(daily, Seq(keyCol, dateCol), "left")
      .withColumn("observed", v.isNotNull)
      .withColumn("__pv", last(v, ignoreNulls = true).over(back))
      .withColumn("__pd", last(when(v.isNotNull, col(dateCol)), ignoreNulls = true).over(back))
      .withColumn("__nv", first(v, ignoreNulls = true).over(fwd))
      .withColumn("__nd", first(when(v.isNotNull, col(dateCol)), ignoreNulls = true).over(fwd))
      .withColumn(valueCol,
        when(col("observed"), round(v, 6)).otherwise(round(
          col("__pv") + (col("__nv") - col("__pv")) *
            datediff(col(dateCol), col("__pd")) /
            datediff(col("__nd"), col("__pd")), 6)))
      .drop("__pv", "__pd", "__nv", "__nd")
  }

  /**
   * OHLC downsampling: per (key, time bucket), the first / max / min /
   * last observation by event time — the classic bar aggregation
   * (finance candles, but equally "state at window edges" for any
   * metrics rollup). First/last are ORDER-DEPENDENT, which a plain
   * groupBy cannot express; the scalable shape is min/max of
   * (ts, tiebreak, value) structs — struct ordering compares fields
   * left-to-right, so the agg stays a hash aggregate with map-side
   * partials: ONE shuffle, no window sort at all. Ties on ts break by
   * `idCol` so the result is total-order deterministic.
   */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, bucket: String = "1 hour"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(keyCol).as("key"),
      window(col(tsCol), bucket).getField("start").as("bucket_start"),
      col(tsCol).cast("timestamp").as("__ts"),
      col(idCol).cast("long").as("__id"),
      col(valCol).cast("double").as("v"))
    base.groupBy($"key", $"bucket_start").agg(
      min(struct($"__ts", $"__id", $"v")).getField("v").as("open"),
      max($"v").as("high"),
      min($"v").as("low"),
      max(struct($"__ts", $"__id", $"v")).getField("v").as("close"),
      count(lit(1)).as("n_obs"))
  }

  /**
   * Exponentially weighted moving average per key (pandas
   * `ewm(alpha).mean()` with `adjust=False`): the recursive smoothing
   *
   *   s_1 = v_1;   s_i = α·v_i + (1−α)·s_{i−1}
   *
   * A recursive dependence is NOT a window function (each row needs the
   * previous row's OUTPUT, not its input), so the scalable shape is the
   * packSequences secondary-sort idiom: ONE key shuffle, in-order
   * partition scan with a per-key fold — state is one double per key,
   * rows stream through. The closed-form alternative (v_j·(1−α)^(−j)
   * running sums) overflows for long series, so the fold is also the
   * numerically right shape.
   *
   * Arithmetic is written exactly as `α·v + (1−α)·s` so an oracle doing
   * the same IEEE operations in the same per-key order reproduces it
   * bitwise (pick α with an exact binary representation — 0.25, 0.5 —
   * and `1−α` is exact too).
   *
   * Ordering within a key is (`tsCol`, `idCol`) — the id breaks
   * timestamp ties so the fold order is total and deterministic.
   */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("v"))
      .repartition(col("key"))
      .sortWithinPartitions($"key", $"ts", $"id")
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var first = true
        var s = 0.0
        it.map { case (k, ts, id, v) =>
          if (k != curKey) { curKey = k; first = true }
          s = if (first) { first = false; v } else alpha * v + (1 - alpha) * s
          (k, ts, id, v, s)
        }
      }
      .toDF("key", "ts", "id", "v", "ewma")
      .select($"key".as(keyCol), $"ts".as(tsCol), $"id".as(idCol),
        $"v".as(valCol), $"ewma")
  }

  /**
   * Rolling z-score anomaly detection per key: each observation scored
   * against the mean/stddev of its `lookback` PRECEDING observations
   * (current row excluded — the score must not contaminate its own
   * baseline), flagged when |z| exceeds `threshold`. Rows with fewer
   * than `minPoints` prior observations or zero dispersion get a null z
   * and no flag.
   *
   * One key-partitioned window sort — the minimum any order-dependent
   * rolling statistic needs; at 100 TB the window state is `lookback`
   * rows per key, never the key's history. z is rounded to 4dp so the
   * two engines' (equivalent, differently-associated) variance
   * accumulations cannot disagree in the last ulp.
   */
  def rollingZscore(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, lookback: Int = 20,
      minPoints: Int = 5, threshold: Double = 3.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-lookback, -1)
    df.select(col(keyCol), col(tsCol), col(idCol),
        col(valCol).cast("double").as("__v"))
      .withColumn("__n", count($"__v").over(w))
      .withColumn("__mu", avg($"__v").over(w))
      .withColumn("__sd", stddev_samp($"__v").over(w))
      .withColumn("z",
        when($"__n" >= minPoints && $"__sd" > 0,
          round(($"__v" - $"__mu") / $"__sd", 4)))
      .withColumn("is_anomaly", coalesce(abs($"z") > threshold, lit(false)))
      .drop("__n", "__mu", "__sd")
      .withColumnRenamed("__v", valCol)
  }

  /**
   * Time-weighted average value per (key, bucket) — TWAP: each
   * observation holds until the next one (or the bucket edge), and the
   * bucket's average weights values by that holding time. The honest
   * mean for irregularly-sampled state (prices, gauges, settings) where
   * a plain avg over-counts bursts. Observations cap at the bucket end;
   * the last observation of a bucket extends to the edge. A bucket with
   * one observation gets that value (weight = its tail span).
   *
   * One key-partitioned window (`lead`) + one hash aggregate — same
   * shuffle budget as the plain bucket mean. 6dp rounding on the
   * weighted mean (duration arithmetic is exact µs integers).
   */
  def twap(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, bucket: String = "1 hour"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val base = df.select(col(keyCol).as("key"),
        unix_micros(col(tsCol).cast("timestamp")).as("tUs"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("v"),
        window(col(tsCol), bucket).getField("start").as("bucket_start"),
        unix_micros(window(col(tsCol), bucket).getField("end")).as("bEndUs"))
      .withColumn("nextUs", lead($"tUs", 1).over(
        Window.partitionBy($"key").orderBy($"tUs", $"id")))
      .withColumn("holdUs",
        least(coalesce($"nextUs", $"bEndUs"), $"bEndUs") - $"tUs")
      // a zero hold (duplicate timestamp) still carries epsilon-free
      // weight 0 — the later duplicate wins the interval, which is the
      // standard last-observation-carried-forward reading
      .filter($"holdUs" >= 0)
    base.groupBy($"key", $"bucket_start")
      .agg(count(lit(1)).as("n_obs"),
        round(sum($"v" * $"holdUs") / sum($"holdUs"), 6).as("twap"))
  }

  /**
   * Lag-k autocorrelation per key: Pearson correlation between each
   * observation and the one `lag` steps earlier in (ts, id) order — the
   * seasonality / persistence screen of a time-series profile. One
   * key-partitioned window pass to align the lagged pairs, then one hash
   * aggregate; keys with fewer than `lag`+2 observations (no variance in
   * a 1-pair sample) come out null and are kept, so the caller sees every
   * key it asked about. 6dp rounding for cross-engine hash stability.
   */
  def lagAutocorr(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, lag: Int = 1): DataFrame = {
    require(lag >= 1, "lag must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(keyCol), col(tsCol), col(idCol),
        col(valCol).cast("double").as("__v"))
      .withColumn("__prev", org.apache.spark.sql.functions.lag($"__v", lag).over(w))
      .groupBy(col(keyCol))
      .agg(count($"__prev").as("n_pairs"),
        round(corr($"__v", $"__prev"), 6).as(s"acf_$lag"))
  }

  /**
   * Cross-correlation lead–lag scan between two keyed daily series:
   * Pearson correlation of A_t against B_{t+lag} for every lag in
   * [−maxLag, maxLag], pooled across keys — "do clicks lead purchases,
   * and by how many days?". The A side explodes once per lag (2·maxLag+1
   * rows, a literal array — no join blow-up beyond that constant), the
   * match is an equi-join on (key, shifted day), and one hash aggregate
   * per lag finishes it. `best` marks the lag with the highest |corr|
   * (ties to the smaller lag), computed over the lag-sized result.
   */
  def crossCorr(a: DataFrame, b: DataFrame, keyCol: String, dateCol: String,
      aVal: String, bVal: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, "maxLag must be >= 0")
    val spark = a.sparkSession
    import spark.implicits._
    val lags = (-maxLag to maxLag).toArray
    val aSide = a.select(col(keyCol).as("__k"), col(dateCol).as("__d"),
        col(aVal).cast("double").as("__a"))
      .withColumn("lag", explode(array(lags.map(lit(_)): _*)))
      .withColumn("__d", date_add($"__d", $"lag"))
    val bSide = b.select(col(keyCol).as("__k"), col(dateCol).as("__d"),
      col(bVal).cast("double").as("__b"))
    val byLag = aSide.join(bSide, Seq("__k", "__d"))
      .groupBy($"lag")
      .agg(count(lit(1)).cast("int").as("n_pairs"),
        round(corr($"__a", $"__b"), 6).as("xcorr"))
    val w = Window.orderBy(abs($"xcorr").desc, $"lag".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // the window runs over 2·maxLag+1 rows — a constant-size frame, not
    // a data-sized single partition
    byLag.withColumn("best",
      $"lag" === first($"lag").over(w))
  }

  /**
   * One-sided CUSUM changepoint detection per key: the classic
   * drift detector for metric shifts too small for a z-score spike.
   * Against a per-key baseline mean μ (from the first `baselineN`
   * observations — the "known good" calibration window), accumulate
   *
   *   hi_t = max(0, hi_{t−1} + (v_t − μ − slack))
   *   lo_t = max(0, lo_{t−1} − (v_t − μ + slack))
   *
   * and flag when either sum crosses `threshold` (then reset that sum —
   * the standard restart-after-alarm convention). The fold is a
   * sequential recurrence like `ewma`, so the engine side is the same
   * secondary-sort mapPartitions pass (O(1) state per key), and with
   * the baseline mean rounded to 6dp the trajectory replays exactly in
   * a recursive CTE. `slack` and `threshold` are in value units
   * (commonly k·σ and h·σ).
   */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, baselineN: Int, slack: Double,
      threshold: Double): DataFrame = {
    require(baselineN >= 1, "baselineN must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("v"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"key").orderBy($"ts", $"id")))
    val mu = base.filter($"__rn" <= baselineN)
      .groupBy($"key").agg(round(avg($"v"), 6).as("mu"))
    base.join(mu, "key")
      .repartition(col("key"))
      .sortWithinPartitions($"key", $"ts", $"id")
      .as[(Long, java.sql.Timestamp, Long, Double, Int, Double)]
      .mapPartitions { it =>
        // the CARRIED sums are rounded to 6dp each step (not just at
        // emission) — the rounding-anchor device that lets a recursive
        // CTE carry the identical state
        def r6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        var curKey = Long.MinValue
        var hi = 0.0
        var lo = 0.0
        it.map { case (k, ts, id, v, _, m) =>
          if (k != curKey) { curKey = k; hi = 0.0; lo = 0.0 }
          hi = r6(math.max(0.0, hi + (v - m - slack)))
          lo = r6(math.max(0.0, lo - (v - m + slack)))
          val alarmHi = hi > threshold
          val alarmLo = lo > threshold
          val outHi = hi
          val outLo = lo
          if (alarmHi) hi = 0.0
          if (alarmLo) lo = 0.0
          (k, ts, id, v, m, outHi, outLo, alarmHi, alarmLo)
        }
      }
      .toDF("key", "ts", "id", "v", "mu", "cusum_hi", "cusum_lo",
        "alarm_hi", "alarm_lo")
      .select($"key".as(keyCol), $"ts".as(tsCol), $"id".as(idCol),
        $"v".as(valCol), $"mu", $"cusum_hi", $"cusum_lo",
        $"alarm_hi", $"alarm_lo")
  }

  /**
   * Classical additive seasonal decomposition (v = trend + seasonal +
   * residual) of a daily series per key, with an ODD period (e.g. 7 for
   * weekly): trend is the centered moving average of the full ±period/2
   * window (null at the edges where the window is short — no padding
   * lies), the seasonal component is the per-phase mean of the
   * detrended series re-centered to sum to zero over one period, and
   * the residual is what's left. Phase = day-of-week-style
   * `datediff mod period` from a fixed epoch, so gaps in the calendar
   * can't shift phases. Pure windows + two phase-keyed aggregates —
   * every stage replays in SQL, 6dp anchors.
   */
  def seasonalDecompose(daily: DataFrame, keyCol: String, dateCol: String,
      valCol: String, period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd >= 3 (centered MA), got $period")
    val spark = daily.sparkSession
    import spark.implicits._
    val half = period / 2
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(-half, half)
    val v = col(valCol).cast("double")
    val base = daily.select(col(keyCol), col(dateCol), v.as("v"))
      .withColumn("phase",
        pmod(datediff(col(dateCol), lit(java.sql.Date.valueOf("1970-01-01"))),
          lit(period)))
      .withColumn("trend",
        when(count($"v").over(w) === period, round(avg($"v").over(w), 6)))
      .withColumn("detrended", $"v" - $"trend")
    val phaseMeans = base.groupBy(col(keyCol), $"phase")
      .agg(round(avg($"detrended"), 6).as("phase_mean"))
    val centered = phaseMeans
      .withColumn("seasonal", round($"phase_mean" -
        avg($"phase_mean").over(Window.partitionBy(col(keyCol))), 6))
      .select(col(keyCol), $"phase", $"seasonal")
    base.join(centered, Seq(keyCol, "phase"))
      .select(col(keyCol), col(dateCol), $"phase", $"v", $"trend", $"seasonal",
        round($"v" - $"trend" - $"seasonal", 6).as("residual"))
  }

  /**
   * Exact rolling median per key over the `lookback` preceding
   * observations plus the current one — the robust alternative to a
   * rolling mean for spiky series (the denoiser monitoring pipelines
   * actually want). Linear interpolation on even counts (the
   * quantile_cont definition both engines share). Implemented as
   * sort_array over a bounded window collect — per-row memory is
   * O(lookback), which is the honest cost of an exact order statistic;
   * for unbounded windows use an approximate sketch instead. One key
   * shuffle, one window sort.
   */
  def rollingMedian(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, lookback: Int): DataFrame = {
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-lookback, Window.currentRow)
    val sorted = sort_array(collect_list(col(valCol).cast("double")).over(w))
    val n = size(sorted)
    val mid = element_at(sorted, ((n + 1) / 2).cast("int"))
    val lo = element_at(sorted, (n / 2).cast("int"))
    val hi = element_at(sorted, (n / 2).cast("int") + 1)
    df.select(col(keyCol), col(tsCol), col(idCol),
        col(valCol).cast("double").as(valCol))
      .withColumn("n_window", n)
      .withColumn("rolling_median", round(
        when(n % 2 === 1, mid).otherwise((lo + hi) / 2.0), 6))
  }

  /**
   * Holt's linear-trend double exponential smoothing per key — the
   * trend-aware sibling of `ewma` and the standard short-horizon
   * forecaster for metrics with drift:
   *
   *   l_t = α·v_t + (1−α)·(l_{t−1} + b_{t−1})
   *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
   *
   * initialized l₁ = v₁, b₁ = 0; `forecast` = l_t + b_t is the
   * one-step-ahead prediction made at row t. The fold is a sequential
   * recurrence (not a window function), so the engine side is the same
   * secondary-sort mapPartitions idiom as `ewma`: one shuffle on the
   * key, sorted (ts, id) within partitions, single streaming pass —
   * per-key state is two doubles, so this scales to any number of keys
   * and any series length. With exact-binary α/β (e.g. 0.5, 0.25) and
   * the SQL replay written with the SAME expression structure, the
   * trajectories match bitwise — no rounding needed.
   */
  def holtLinear(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("v"))
      .repartition(col("key"))
      .sortWithinPartitions($"key", $"ts", $"id")
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var first = true
        var l = 0.0
        var b = 0.0
        it.map { case (k, ts, id, v) =>
          if (k != curKey) { curKey = k; first = true }
          if (first) { first = false; l = v; b = 0.0 }
          else {
            val lPrev = l
            l = alpha * v + (1 - alpha) * (l + b)
            b = beta * (l - lPrev) + (1 - beta) * b
          }
          (k, ts, id, v, l, b, l + b)
        }
      }
      .toDF("key", "ts", "id", "v", "level", "trend", "forecast")
      .select($"key".as(keyCol), $"ts".as(tsCol), $"id".as(idCol),
        $"v".as(valCol), $"level", $"trend", $"forecast")
  }

  /** Per-(key, ts) 6dp-anchored series: duplicate timestamps collapse to
    * their mean first (Mann–Kendall and Theil–Sen assume distinct times),
    * and the 6dp anchor makes tie detection and pair signs engine-exact. */
  private def dailySeries(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy(col(keyCol).as("__k"), col(tsCol).as("__t"))
      .agg(round(avg(col(valCol).cast("double")), 6).as("__v"))
  }

  /** Drop-and-report cap for the per-key-quadratic trend statistics
    * (the capBuckets posture): a key whose series exceeds `maxPoints`
    * is DROPPED from the result rather than silently running an n²
    * pair join — S over 100k points is ~5·10⁹ sign pairs per key, past
    * any useful trend signal (downsample the series first instead).
    * Purely LAZY: no job runs at plan-construction time (an eager log
    * probe here was a surprising side effect for an API that otherwise
    * returns lazy DataFrames). The observability half lives in
    * [[droppedTrendKeys]] — the hotLandmarks/hotMediaBuckets report
    * pattern — so a key missing from the output stays distinguishable
    * from absent input. */
  private def capSeries(s: DataFrame, maxPoints: Long): DataFrame = {
    import s.sparkSession.implicits._
    val counts = s.groupBy($"__k").agg(count(lit(1)).as("__npk"))
    s.join(counts.filter($"__npk" <= maxPoints).select($"__k"),
      Seq("__k"), "left_semi")
  }

  /** Report half of the trend-statistic series cap ([[mannKendall]],
    * [[theilSen]]): the keys whose per-(key, ts) collapsed series
    * exceed `maxPointsPerKey` — i.e. exactly the keys those operators
    * DROP rather than run per-key-quadratic pair joins over. Returns
    * (key, n_points), largest first. Run this when a key is missing
    * from a trend result; downsample those series and re-run. */
  def droppedTrendKeys(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, maxPointsPerKey: Long = 100000L): DataFrame = {
    import df.sparkSession.implicits._
    dailySeries(df, keyCol, tsCol, valCol)
      .groupBy($"__k").agg(count(lit(1)).as("n_points"))
      .filter($"n_points" > maxPointsPerKey)
      .select($"__k".as(keyCol), $"n_points")
      .orderBy($"n_points".desc)
  }

  /**
   * Mann–Kendall trend test per key (Mann 1945, Kendall 1975): the
   * nonparametric monotone-trend detector a metric pipeline runs before
   * trusting "the score is drifting up". S = Σ_{i<j} sign(v_j − v_i)
   * over time-ordered pairs, tie-corrected variance
   * Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18, and the
   * continuity-corrected z. Duplicate timestamps collapse to their mean
   * first; S and the tie counts are exact integers (signs are taken on
   * 6dp-anchored values, so engines can't disagree at a tie boundary).
   * Returns (key, n, s, var_s 4dp, z 4dp, trend at the two-sided 5%
   * level: increasing / decreasing / no_trend).
   *
   * Contract (like behaviorSimilarity): feed per-key SERIES-sized data —
   * the pair join is per-key quadratic by definition of S; the join
   * stays keyed, so keys parallelize.
   */
  def mannKendall(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, maxPointsPerKey: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = capSeries(dailySeries(df, keyCol, tsCol, valCol), maxPointsPerKey)
    val pairs = s.as("a").join(s.as("b"),
        $"a.__k" === $"b.__k" && $"a.__t" < $"b.__t")
      .groupBy($"a.__k".as("__k"))
      .agg(sum(signum($"b.__v" - $"a.__v").cast("long")).as("__s"))
    val nn = s.groupBy($"__k").agg(count(lit(1)).as("__n"))
    val ties = s.groupBy($"__k", $"__v").agg(count(lit(1)).as("__t"))
      .groupBy($"__k")
      .agg(sum($"__t" * ($"__t" - 1) * (lit(2) * $"__t" + 5)).as("__tt"))
    nn.join(pairs, Seq("__k"), "left").join(ties, Seq("__k"))
      .select($"__k", $"__n", coalesce($"__s", lit(0L)).as("__s"), $"__tt")
      .withColumn("__var",
        ($"__n" * ($"__n" - 1) * (lit(2) * $"__n" + 5) - $"__tt")
          .cast("double") / 18.0)
      .withColumn("__z", round(
        when($"__s" > 0, ($"__s" - 1).cast("double") / sqrt($"__var"))
          .when($"__s" < 0, ($"__s" + 1).cast("double") / sqrt($"__var"))
          .otherwise(lit(0.0)), 4))
      .select($"__k".as(keyCol), $"__n".as("n"), $"__s".as("s"),
        round($"__var", 4).as("var_s"), $"__z".as("z"),
        when($"__z" > 1.96, "increasing")
          .when($"__z" < -1.96, "decreasing")
          .otherwise("no_trend").as("trend"))
  }

  /**
   * Theil–Sen robust slope per key (Theil 1950, Sen 1968): the median of
   * all pairwise slopes (v_j − v_i)/(x_j − x_i) over time-ordered pairs —
   * a 29%-breakdown alternative to the OLS `regr_slope`, immune to the
   * outlier days that wreck a least-squares trend. The intercept is the
   * median of v − slope·x (Sen's convention). Medians use the
   * deterministic order-statistic convention (mean of the two middle
   * values when even), slopes anchored at 10dp so the median VALUE is
   * engine-exact. `xCol` must be numeric (cast dates to day numbers
   * upstream). Returns (key, n, n_pairs, slope 6dp, intercept 6dp).
   * Same per-key-quadratic contract as [[mannKendall]].
   */
  def theilSen(df: DataFrame, keyCol: String, xCol: String,
      valCol: String, maxPointsPerKey: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = capSeries(dailySeries(df, keyCol, xCol, valCol), maxPointsPerKey)
      .select($"__k", $"__t".cast("double").as("__x"), $"__v")
    val slopes = s.as("a").join(s.as("b"),
        $"a.__k" === $"b.__k" && $"a.__x" < $"b.__x")
      .select($"a.__k".as("__k"),
        round(($"b.__v" - $"a.__v") / ($"b.__x" - $"a.__x"), 10).as("__sl"))
    val slope = medianBy(slopes, "__k", "__sl").withColumnRenamed("__med", "__slope")
    val resid = s.join(slope, "__k")
      .select($"__k", $"__slope",
        round($"__v" - $"__slope" * $"__x", 10).as("__r"))
    val icept = medianBy(resid, "__k", "__r").withColumnRenamed("__med", "__icept")
    val nn = s.groupBy($"__k").agg(count(lit(1)).as("n"))
    val np = slopes.groupBy($"__k").agg(count(lit(1)).as("n_pairs"))
    nn.join(np, Seq("__k"), "left").join(slope, "__k").join(icept, "__k")
      .select($"__k".as(keyCol), $"n",
        coalesce($"n_pairs", lit(0L)).as("n_pairs"),
        round($"__slope", 6).as("slope"), round($"__icept", 6).as("intercept"))
  }

  /**
   * Mean-shift changepoint detection per key via binary segmentation
   * (Scott & Knott 1974 shape): at each level, every current segment
   * evaluates all admissible splits and takes the one maximizing the
   * SSE-reduction gain
   *
   *   gain(i) = S_L²/n_L + S_R²/n_R − S²/n   (per-segment partial sums)
   *
   * accepting it when gain > `penalty` (value² units) and both halves
   * keep `minSegment` points; accepted halves recurse up to `maxDepth`.
   * Values are 6dp-anchored and summed as EXACT scaled integers, so the
   * gains — doubles derived from exact integers — and the (gain, −i)
   * argmax are engine-exact. Duplicate timestamps collapse to their mean
   * first.
   *
   * Returns one row per ACCEPTED split: (key, level, segment path
   * "L/R…", split_at = last timestamp of the left half, n_left, n_right,
   * gain 6dp). Scale: every window partitions by (key, segment); the
   * level loop is `maxDepth` keyed passes — nothing global, nothing
   * driver-side.
   */
  def changepoints(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, maxDepth: Int = 2, minSegment: Int = 5,
      penalty: Double = 1.0): DataFrame = {
    require(maxDepth >= 1 && minSegment >= 1, "need maxDepth, minSegment >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var cur = dailySeries(df, keyCol, tsCol, valCol)
      .select($"__k", $"__t", round($"__v" * 1e6).cast("long").as("__v6"),
        lit("").as("__seg"))
    var out: DataFrame = null
    for (level <- 1 to maxDepth) {
      val w = Window.partitionBy($"__k", $"__seg").orderBy($"__t")
      val wa = Window.partitionBy($"__k", $"__seg")
      val anno = cur
        .withColumn("__i", row_number().over(w).cast("long"))
        .withColumn("__cum", sum($"__v6").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__n", count(lit(1)).over(wa))
        .withColumn("__S", sum($"__v6").over(wa))
      val gain = ($"__cum".cast("double") * $"__cum".cast("double") / $"__i"
        + ($"__S" - $"__cum").cast("double") *
          ($"__S" - $"__cum").cast("double") / ($"__n" - $"__i")
        - $"__S".cast("double") * $"__S".cast("double") / $"__n") / lit(1e12)
      val best = anno
        .filter($"__i" >= minSegment && $"__n" - $"__i" >= minSegment)
        .withColumn("__gain", gain)
        .groupBy($"__k", $"__seg")
        .agg(max(struct($"__gain".as("g"), (-$"__i").as("ni"))).as("m"))
        .select($"__k", $"__seg", $"m.g".as("__g"), (-$"m.ni").as("__sp"))
        .filter($"__g" > penalty)
      val rec = anno.join(best, Seq("__k", "__seg"))
        .filter($"__i" === $"__sp")
        .select($"__k", lit(level).as("level"), $"__seg".as("segment"),
          $"__t".as("split_at"), $"__sp".as("n_left"),
          ($"__n" - $"__sp").as("n_right"), round($"__g", 6).as("gain"))
      out = if (out == null) rec else out.unionByName(rec)
      cur = anno.join(best, Seq("__k", "__seg"), "left")
        .select($"__k", $"__t", $"__v6",
          when($"__sp".isNull, $"__seg")
            .when($"__i" <= $"__sp", concat($"__seg", lit("L")))
            .otherwise(concat($"__seg", lit("R"))).as("__seg"))
    }
    out.withColumnRenamed("__k", keyCol)
      .orderBy(col(keyCol), $"level", $"segment")
  }

  /** Deterministic per-key median: mean of the two middle order
    * statistics (rank by value, ties by nothing — equal values make the
    * tie-break irrelevant to the median VALUE). Keyed windows only. */
  private def medianBy(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
    df.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter($"__rn" === (($"__m" + 1) / 2).cast("long") ||
        $"__rn" === ($"__m" / 2).cast("long") + 1)
      .groupBy(col(keyCol)).agg(avg(col(valCol)).as("__med"))
  }
}
