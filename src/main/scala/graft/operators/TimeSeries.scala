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
}
