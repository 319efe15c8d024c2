package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Keyed snapshot maintenance (MERGE / upsert) without a table format:
 * the relational core of Delta/Iceberg `MERGE INTO`, expressed as one
 * full-outer join on the key.
 *
 *   - key in both       → the update row wins (per-column coalesce)
 *   - key only in update → insert
 *   - key only in base   → carried forward unchanged
 *
 * One shuffle on the key; on bucketed layouts (`Formats.writeBucketed`)
 * the join runs exchange-free, which is the 100 TB posture for a
 * periodically-refreshed snapshot: bucket once, merge every increment
 * without reshuffling the base.
 */
object Merge {

  /** `updates` must carry the key plus a subset of `base`'s columns;
    * columns absent from `updates` are carried from `base` everywhere.
    *
    * Two deliberate divergences from Delta/Iceberg `MERGE INTO`, both
    * consequences of the per-column coalesce:
    *   - an update row carrying an explicit NULL in an updatable column
    *     KEEPS the base value — this operator cannot null out a field
    *     (encode "clear" as a sentinel value if you need it);
    *   - duplicate keys in `updates` fan out via the join (one output row
    *     per duplicate) instead of raising a cardinality error the way
    *     transactional MERGE does — deduplicate updates first if the
    *     source may carry repeats. */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val updatable = updates.columns.toSet - key
    val outCols = base.columns.filter(_ != key).map { c =>
      if (updatable(c)) coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
      else col(s"b.$c").as(c)
    }
    base.as("b").join(updates.as("u"), Seq(key), "full_outer")
      .select(col(key) +: outCols.toSeq: _*)
  }
}
