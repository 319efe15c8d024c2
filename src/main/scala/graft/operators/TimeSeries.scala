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
}
