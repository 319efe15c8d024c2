package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The one hot-key cap every pair generator shares: keep only rows
 * whose key group has ≤ `maxPerKey` members, measured by an unordered
 * count window over the key columns themselves. Partitioned on the
 * self-join's own key, the window's hash exchange IS the join's on the
 * sort-merge scale path (no extra stage); under a broadcast plan it
 * costs the one exchange the window needs. A group LARGER than the cap
 * is dropped WHOLESALE — the documented drop-and-log posture
 * ([[Dedup.hotBuckets]], [[ImageHash.hotMediaBuckets]],
 * [[AudioFingerprint.hotLandmarks]] are the report halves).
 *
 * Callers (all enforcing the same contract): the banded media LSH
 * joins, audio landmark matching, source-overlap fingerprints,
 * association-rule baskets. Kept in ONE place so a change to the cap
 * semantics cannot drift between them.
 */
object Caps {
  def capByCount(df: DataFrame, keys: Seq[String], maxPerKey: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    df.withColumn("__capn", count(lit(1)).over(w))
      .filter(col("__capn") <= maxPerKey)
      .drop("__capn")
  }
}
