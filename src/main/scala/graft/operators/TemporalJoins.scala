package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark has no built-in form of: as-of (backward)
 * join and interval/range join. Both are expressed as shuffle-on-key plans
 * that survive scale — no cartesian product, no per-key collect.
 *
 * (The reference engine has no temporal joins; these belong to the
 * training-data-pipeline surface, e.g. joining telemetry to the latest
 * model-version row or windowing events around incidents.)
 */
object TemporalJoins {

  /**
   * As-of join: per join key, for each left row the single right row with
   * the greatest `rightTsCol` ≤ the left row's `leftTsCol` (`direction =
   * "backward"`, the default) or the smallest `rightTsCol` ≥ it
   * (`direction = "forward"`).
   *
   * Plan: union both sides tagged, ONE shuffle on `keyCols`, one window
   * pass carrying the latest right values forward with
   * `last(ignoreNulls = true)`, then keep the left rows. This is the
   * sort-merge formulation: no join explosion, no per-key memory beyond
   * the window frame, skew limited to genuinely hot keys.
   *
   * Wide-table hygiene: only the DISTINCT left (keys, ts) probe points
   * ride the union+window shuffle/sort — two left rows with the same keys
   * and timestamp get the same as-of match by definition, so the match is
   * computed once per probe point and the left payload columns equi-join
   * back on (keys, ts) afterwards (null-safe, 1:1 because the probe side
   * is distinct). A 200-column left table is never sorted inside a window
   * partition, and nothing depends on row ids or recompute determinism.
   *
   * Right rows sort before left rows at equal timestamps (ties are "at or
   * before"). If the right side has several rows at the same (key, ts) the
   * greatest `rightOrder` wins — pass a unique column (e.g. the event id)
   * for deterministic output. Null join keys never match (equi-join
   * semantics). Right value columns should be non-null: each is carried
   * independently, so a null value would be filled from an older right row
   * for that column only.
   *
   * @param rightValueCols right columns to surface (prefixed `right_`)
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, rightValueCols: Seq[String],
      rightOrder: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val reserved = rightValueCols.map(c => s"right_$c") ++
      Seq("__ts", "__side", "__ord") ++ keyCols.map(k => s"__asof_$k")
    val clash = left.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"left side already has column(s) ${clash.mkString(", ")} — rename before joining")
    val spark = left.sparkSession
    import spark.implicits._

    // __ord keeps the rightOrder column's NATIVE type (casting e.g. a UUID
    // string to long would null it out and silently lose the tie-break);
    // left rows order as null, which is fine — each left row is its own
    // output, only right-vs-right order matters.
    val ordType = rightOrder.map(right.schema(_).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)

    val leftCols = left.columns.toSeq
    // slim left: only the distinct (keys, ts) probe points enter the union
    // (column pruning reaches the scan, so this branch reads just the slim
    // columns; the distinct also collapses duplicate probe points before
    // the window sort)
    val lSlim = rightValueCols.foldLeft(
      left.select(keyCols.map(col) :+ col(leftTsCol).as("__ts"): _*).distinct()
        .withColumn("__side", lit(1))
        .withColumn("__ord", lit(null).cast(ordType))) { (df, c) =>
      df.withColumn(s"right_$c", lit(null).cast(right.schema(c).dataType)) }

    // null join keys and null timestamps never match (ASOF semantics: a
    // null comparison is no match): drop such right rows so the nulls-first/
    // nulls-last window order can't let them fill anything
    val rAligned = rightValueCols.foldLeft(
      keyCols.foldLeft(right.filter(col(rightTsCol).isNotNull)) {
          (df, k) => df.filter(col(k).isNotNull) }
        .withColumn("__ts", col(rightTsCol))
        .withColumn("__side", lit(0))
        .withColumn("__ord",
          rightOrder.map(col(_).cast(ordType)).getOrElse(lit(0L).cast(ordType)))) {
      (df, c) => df.withColumn(s"right_$c", col(c)) }

    val unionCols = (keyCols ++ rightValueCols.map(c => s"right_$c") ++
      Seq("__ts", "__side", "__ord")).map(col)
    val unioned = lSlim.select(unionCols: _*).unionByName(rAligned.select(unionCols: _*))

    // backward: ascending traversal, last-seen right row = latest ≤ ts.
    // forward: DESCENDING traversal, last-seen right row = earliest ≥ ts.
    // Right rows sort before left at equal timestamps either way (__side 0
    // first), keeping equality inside the match.
    val tsOrder = if (direction == "backward") $"__ts".asc else $"__ts".desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, $"__side".asc, $"__ord".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightValueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"right_$c", last(col(s"right_$c"), ignoreNulls = true).over(w)) }

    // a left row with a null timestamp matches nothing (under the forward
    // direction's descending order it would otherwise sort after every
    // right row and pick up the earliest one)
    val matched = rightValueCols.foldLeft(filled.filter($"__side" === 1)) { (df, c) =>
      df.withColumn(s"right_$c", when($"__ts".isNotNull, col(s"right_$c"))) }
      .select(keyCols.map(k => col(k).as(s"__asof_$k")) ++
        (col("__ts").as("__asof_ts") +: rightValueCols.map(c => col(s"right_$c"))): _*)

    // join the payload back per probe point: null-safe so left rows with
    // null keys/ts find their (null-filled) probe row; 1:1 because the
    // probe side is distinct over exactly these columns
    val joinCond = (keyCols.map(k => col(k) <=> col(s"__asof_$k")) :+
      (col(leftTsCol) <=> col("__asof_ts"))).reduce(_ && _)
    left.join(matched, joinCond)
      .select((leftCols ++ rightValueCols.map(c => s"right_$c")).map(col): _*)
  }

  /**
   * As-of join with a maximum-staleness bound (pandas `merge_asof`'s
   * `tolerance`): a match farther than `toleranceMs` from the left
   * timestamp is nulled out — the left row survives unmatched. A
   * post-projection over `asofJoin` carrying the right timestamp, so the
   * shuffle/window plan is identical to the unbounded form.
   */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, rightValueCols: Seq[String],
      toleranceMs: Long, rightOrder: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(toleranceMs >= 0, s"toleranceMs must be non-negative: $toleranceMs")
    val carried =
      if (rightValueCols.contains(rightTsCol)) rightValueCols
      else rightValueCols :+ rightTsCol
    val joined = asofJoin(left, right, keyCols, leftTsCol, rightTsCol,
      carried, rightOrder, direction)
    val rts = col(s"right_$rightTsCol")
    val diff =
      if (direction == "backward") unix_millis(col(leftTsCol)) - unix_millis(rts)
      else unix_millis(rts) - unix_millis(col(leftTsCol))
    val within = rts.isNotNull && diff <= toleranceMs
    val bounded = carried.foldLeft(joined) { (df, c) =>
      df.withColumn(s"right_$c", when(within, col(s"right_$c"))) }
    if (carried == rightValueCols) bounded else bounded.drop(s"right_$rightTsCol")
  }

  /**
   * Nearest-direction as-of join (pandas `merge_asof(direction=
   * "nearest")`): per key, each left row takes whichever right row is
   * CLOSER in time — the latest at-or-before or the earliest strictly-
   * after — with ties going backward (the at-or-before row). The
   * sensor-alignment join: neither pure direction is right when clocks
   * drift both ways. Optional `toleranceMs` nulls out matches farther
   * than the bound in the chosen direction.
   *
   * Plan: the same slim-probe union as `asofJoin`, ONE shuffle + ONE
   * sort — the backward candidate reads from the running frame
   * (unboundedPreceding..current) and the forward candidate from the
   * mirrored frame (current..unboundedFollowing) over the SAME window
   * ordering, so both frames share the sort. Same-ts right rows land in
   * the preceding frame (they sort before the probe), i.e. a distance-0
   * match is always a backward win. Ties among right rows at one
   * timestamp break by greatest `rightOrder` backward and smallest
   * forward (both deterministic; pass a unique column).
   */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, rightValueCols: Seq[String],
      rightOrder: Option[String] = None,
      toleranceMs: Option[Long] = None): DataFrame = {
    val reserved = rightValueCols.map(c => s"right_$c") ++
      Seq("__ts", "__side", "__ord", "asof_dir") ++ keyCols.map(k => s"__asof_$k")
    val clash = left.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"left side already has column(s) ${clash.mkString(", ")} — rename before joining")
    val spark = left.sparkSession
    import spark.implicits._

    val ordType = rightOrder.map(right.schema(_).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val leftCols = left.columns.toSeq
    val carried =
      if (rightValueCols.contains(rightTsCol)) rightValueCols
      else rightValueCols :+ rightTsCol

    val lSlim = carried.foldLeft(
      left.select(keyCols.map(col) :+ col(leftTsCol).as("__ts"): _*).distinct()
        .withColumn("__side", lit(1))
        .withColumn("__ord", lit(null).cast(ordType))) { (df, c) =>
      df.withColumn(s"right_$c", lit(null).cast(right.schema(c).dataType)) }
    val rAligned = carried.foldLeft(
      keyCols.foldLeft(right.filter(col(rightTsCol).isNotNull)) {
          (df, k) => df.filter(col(k).isNotNull) }
        .withColumn("__ts", col(rightTsCol))
        .withColumn("__side", lit(0))
        .withColumn("__ord",
          rightOrder.map(col(_).cast(ordType)).getOrElse(lit(0L).cast(ordType)))) {
      (df, c) => df.withColumn(s"right_$c", col(c)) }

    val unionCols = (keyCols ++ carried.map(c => s"right_$c") ++
      Seq("__ts", "__side", "__ord")).map(col)
    val unioned = lSlim.select(unionCols: _*).unionByName(rAligned.select(unionCols: _*))

    val order = Seq($"__ts".asc, $"__side".asc, $"__ord".asc)
    val back = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val filled = carried.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__b_$c", last(col(s"right_$c"), ignoreNulls = true).over(back))
        .withColumn(s"__f_$c", first(col(s"right_$c"), ignoreNulls = true).over(fwd)) }

    // distance in the ts column's native resolution: ms for timestamps,
    // raw units for numeric time axes (toleranceMs is read in the same
    // unit in that case)
    def asNum(c: org.apache.spark.sql.Column, src: String) =
      if (src == "timestamp") unix_millis(c) else c.cast("long")
    val leftIsTs = left.schema(leftTsCol).dataType ==
      org.apache.spark.sql.types.TimestampType
    val kind = if (leftIsTs) "timestamp" else "numeric"
    val bd = asNum($"__ts", kind) - asNum(col(s"__b_$rightTsCol"), kind)
    val fd = asNum(col(s"__f_$rightTsCol"), kind) - asNum($"__ts", kind)
    val within = (d: org.apache.spark.sql.Column) =>
      toleranceMs.map(t => d <= t).getOrElse(lit(true))
    val bOk = col(s"__b_$rightTsCol").isNotNull && within(bd)
    val fOk = col(s"__f_$rightTsCol").isNotNull && within(fd)
    // backward wins ties (covers the distance-0 same-ts case by frame
    // construction too); null left ts matches nothing
    val useB = $"__ts".isNotNull && bOk && (!fOk || bd <= fd)
    val useF = $"__ts".isNotNull && fOk && !useB

    val chosen = carried.foldLeft(
      filled.filter($"__side" === 1)
        .withColumn("asof_dir",
          when(useB, lit("backward")).when(useF, lit("forward")))) { (df, c) =>
      df.withColumn(s"right_$c",
        when(useB, col(s"__b_$c")).when(useF, col(s"__f_$c"))) }
      .select(keyCols.map(k => col(k).as(s"__asof_$k")) ++
        (col("__ts").as("__asof_pt") +: col("asof_dir") +:
          carried.map(c => col(s"right_$c"))): _*)

    val joinCond = (keyCols.map(k => col(k) <=> col(s"__asof_$k")) :+
      (col(leftTsCol) <=> col("__asof_pt"))).reduce(_ && _)
    val out = left.join(chosen, joinCond)
      .select((leftCols ++ rightValueCols.map(c => s"right_$c") :+ "asof_dir").map(col): _*)
    out
  }

  /**
   * Interval/range join without a cartesian: each right interval
   * [loCol, hiCol] explodes into fixed-width time bins, the join runs on
   * (key, bin) *equality* — a plain shuffle join Catalyst handles — and the
   * exact containment predicate filters the bin-granular candidates.
   *
   * Choose `binWidth` near the typical interval span: each right row then
   * lands in O(1) bins and each left point probes exactly one bin. (A naive
   * `left.join(right, keys && lo <= pt && pt <= hi)` degenerates to a
   * per-key cartesian — a non-equi condition gives Spark nothing to hash
   * on. This keeps the equality key.)
   *
   * @param leftPointCol  numeric point column on the left (e.g. epoch µs)
   * @param loCol, hiCol  interval bounds on the right, same unit
   * @param binWidth      bin size in the same unit as the point column
   * @return inner join of left × matching right rows (right columns
   *         prefixed `r_` on name collisions)
   */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftPointCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("__bin",
      floor(col(leftPointCol) / binWidth).cast("long"))
    val collisions = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    val rRenamed = collisions.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c") }
    def rcol(c: String): String = if (collisions(c)) s"r_$c" else c
    // lo > hi rows can't satisfy the containment predicate; exclude them
    // BEFORE the explode (sequence(start, stop) throws when start > stop,
    // which would crash the job where the naive join just drops the row)
    val rb = rRenamed.filter(col(rcol(loCol)) <= col(rcol(hiCol)))
      .withColumn("__bin",
        explode(sequence(floor(col(rcol(loCol)) / binWidth).cast("long"),
          floor(col(rcol(hiCol)) / binWidth).cast("long"))))
    lb.join(rb, keyCols :+ "__bin")
      .filter(col(rcol(loCol)) <= col(leftPointCol) &&
        col(leftPointCol) <= col(rcol(hiCol)))
      .drop("__bin")
  }

  /**
   * Interval × interval overlap join (closed bounds: overlap iff
   * l.lo ≤ r.hi AND r.lo ≤ l.hi) — the two-sided twin of
   * [[rangeJoinBinned]]. BOTH sides explode into fixed-width bins and
   * join on (key, bin) equality; a pair sharing several bins would
   * duplicate, so each candidate survives only in its CANONICAL bin —
   * the bin of max(l.lo, r.lo), the overlap's start — which dedups
   * without a distinct shuffle. Malformed (hi < lo) intervals are
   * excluded before the explode on both sides (same contract as
   * rangeJoinBinned). Right columns are prefixed `r_` on collisions.
   */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], lLoCol: String, lHiCol: String,
      rLoCol: String, rHiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collisions = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    val rRenamed = collisions.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c") }
    def rcol(c: String): String = if (collisions(c)) s"r_$c" else c
    def binned(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo) <= col(hi))
        .withColumn("__bin", explode(sequence(
          floor(col(lo) / binWidth).cast("long"),
          floor(col(hi) / binWidth).cast("long"))))
    val lb = binned(left, lLoCol, lHiCol)
    val rb = binned(rRenamed, rcol(rLoCol), rcol(rHiCol))
    lb.join(rb, keyCols :+ "__bin")
      .filter(col(lLoCol) <= col(rcol(rHiCol)) &&
        col(rcol(rLoCol)) <= col(lHiCol) &&
        col("__bin") === floor(greatest(col(lLoCol), col(rcol(rLoCol))) / binWidth)
          .cast("long"))
      .drop("__bin")
  }

  /**
   * Interval union / coverage merge per key (gaps-and-islands): collapse
   * overlapping-or-touching [lo, hi] segments into maximal merged
   * intervals — the "total time covered" primitive (uptime from
   * overlapping incident windows, utilization from bookings, masking
   * spans before a cut). Touching means next.lo ≤ running max(hi):
   * [1,5] and [5,9] merge.
   *
   * One key shuffle, one window sort: a new island starts where `lo`
   * exceeds the running max of every earlier interval's `hi` (the
   * running-max formulation handles nested intervals that a lag-based
   * check misses), island ids are a running sum of those flags, and one
   * hash aggregate emits each island's bounds and member count.
   * Numeric or timestamp bounds both work (comparison-only logic).
   */
  def mergeIntervals(df: DataFrame, keyCol: String, loCol: String,
      hiCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(loCol), col(hiCol))
    val prevMax = max(col(hiCol)).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df.filter(col(loCol) <= col(hiCol))
      .withColumn("__new", when(prevMax.isNull || col(loCol) > prevMax, 1)
        .otherwise(0))
      .withColumn("__island",
        sum($"__new").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col(keyCol), $"__island")
      .agg(min(col(loCol)).as("merged_lo"), max(col(hiCol)).as("merged_hi"),
        count(lit(1)).cast("int").as("n_segments"))
      .select(col(keyCol), $"__island".cast("int").as("island"),
        $"merged_lo", $"merged_hi", $"n_segments")
  }
}
