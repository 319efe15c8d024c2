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

  /**
   * Version-aware upsert: an update replaces the base row only when its
   * (version, tie) pair is strictly newer — a late or replayed update is
   * a no-op. This makes the apply IDEMPOTENT and delivery-order safe: a
   * change stream converges to the same snapshot no matter how its rows
   * are micro-batched or reordered across batches, which is the CDC-apply
   * posture a streaming pipeline needs (plain `upsert` assumes the caller
   * ordered the batches). Whole rows swap — unlike `upsert`'s per-column
   * coalesce, an explicit NULL in a winning update is honored.
   *
   * `updates` must carry ALL of `base`'s columns and at most one row per
   * key (compact with `latestByKey` first). A NULL version sorts OLDEST:
   * a NULL-versioned update still inserts a missing key but never beats
   * an existing row, and a NULL-versioned base row loses to any versioned
   * update — explicit presence markers decide existence, so no side's
   * version column doubles as the join probe. One key shuffle, like
   * `upsert`.
   */
  def versionedUpsert(base: DataFrame, updates: DataFrame, key: String,
      versionCol: String, tieCol: String): DataFrame = {
    val b = base.withColumn("__b_present", lit(true)).as("b")
    val u = updates.withColumn("__u_present", lit(true)).as("u")
    // NULL version/tie comparisons resolve to false → keep base (NULL is
    // oldest); base-side NULL version loses via the reversed probe below
    val strictlyNewer = coalesce(
      col(s"u.$versionCol") > col(s"b.$versionCol") ||
        (col(s"u.$versionCol") === col(s"b.$versionCol") &&
          col(s"u.$tieCol") > col(s"b.$tieCol")),
      col(s"b.$versionCol").isNull && col(s"u.$versionCol").isNotNull)
    val takeU = col("u.__u_present").isNotNull &&
      (col("b.__b_present").isNull || strictlyNewer)
    val outCols = base.columns.filter(_ != key).map { c =>
      when(takeU, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)
    }
    b.join(u, Seq(key), "full_outer")
      .select(col(key) +: outCols.toSeq: _*)
  }

  /**
   * Change-log compaction: keep each key's LATEST version from an
   * append-only change stream (row_number over the key ordered by the
   * version column descending, ties broken by `tieCol` descending so the
   * result is deterministic when several changes share a timestamp).
   * One key shuffle; Spark 3.5+ plans the rank filter as WindowGroupLimit,
   * so only each key's top row survives the sort buffer.
   */
  def latestByKey(changes: DataFrame, key: String, versionCol: String,
      tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col(tieCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * SCD Type-2 apply: `history` rows are (key, attrs…, valid_from_ms,
   * valid_to_ms) with NULL valid_to marking the current version;
   * `updates` carry (key, attrs…, ts_ms) — at most one update per key
   * (deduplicate upstream like `upsert`). For each updated key the
   * current row closes at the update's timestamp and a new open row is
   * appended; closed history and untouched keys pass through unchanged.
   *
   * One key-keyed left join over the current slice plus a union with the
   * (unchanged) closed slice — history grows append-only, the classic
   * dimension-table maintenance pass on a bucketed-by-key layout.
   */
  def scd2(history: DataFrame, updates: DataFrame, key: String,
      tsCol: String): DataFrame = {
    val attrCols = history.columns.filter(c =>
      c != key && c != "valid_from_ms" && c != "valid_to_ms").toSeq
    val closed = history.filter(col("valid_to_ms").isNotNull)
    val current = history.filter(col("valid_to_ms").isNull)
    // close updated current rows (untouched keys keep NULL valid_to)
    val closedNow = current.as("b")
      .join(updates.select(col(key), col(tsCol)).as("u"), Seq(key), "left")
      .select(col(key) +: (attrCols.map(c => col(s"b.$c").as(c)) :+
        col("b.valid_from_ms").as("valid_from_ms") :+
        col(s"u.$tsCol").cast("long").as("valid_to_ms")): _*)
    // new open versions from the updates
    val opened = updates
      .select(col(key) +: (attrCols.map(col) :+
        col(tsCol).cast("long").as("valid_from_ms") :+
        lit(null).cast("long").as("valid_to_ms")): _*)
    closed.select(closedNow.columns.map(col): _*)
      .unionByName(closedNow)
      .unionByName(opened)
  }
}
