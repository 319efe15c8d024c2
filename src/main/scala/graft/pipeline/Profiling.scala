package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Column profiling (the `ANALYZE TABLE` story for pipeline QA): count,
 * null count, exact distinct count, min/max/mean/stddev per numeric
 * column, melted to one row per column.
 *
 * All metrics for all columns ride ONE aggregate (a single scan — no
 * per-column jobs); the melt is a row-local explode of the aggregate's
 * single output row. The exact `countDistinct` makes Catalyst expand the
 * input once per distinct aggregate: fine for QA runs, but at 100 TB
 * swap it for `approx_count_distinct` (or `Sketches.hllEstimate`) —
 * everything else stays one plain pass. Doubles round to 6dp for
 * cross-engine stability. Known engine divergence: `stddev_samp` of a
 * single non-null value is NaN in Spark but NULL in DuckDB — only
 * relevant for near-empty columns.
 */
object Profiling {

  /**
   * Distributed ordered prefix sums — the partition-offset idiom (same
   * device as `ParseCorpus.rankByIndexWithCache`): range-sort on
   * `order`, label rows with their physical partition, aggregate ONE
   * (count, sum) row per partition, broadcast the cumulative offsets
   * back, and finish with a partition-LOCAL window. No row ever flows
   * through a single global-window task, so the shape survives inputs
   * where every value is distinct (grid = n rows).
   *
   * Adds to each row, under the total order given by `order`:
   *   __i     1-based global row number (long)
   *   __below prefix sum of `value` over rows strictly before
   *   __cum   prefix sum including this row (nulls contribute 0)
   * Sums keep `sum(value)`'s type: exact longs for integral inputs,
   * double (partition-associated) otherwise.
   *
   * Returns (annotated frame, sorted cache). The caller unpersists the
   * cache once done; eviction-triggered recompute is determinism-safe
   * (the rerun replays the same exchange and reuses its shuffle
   * output, so partition labels repeat).
   */
  private[graft] def orderedPrefix(df: DataFrame, order: Seq[Column],
      value: Column): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val marked = df.withColumn("__val", value)
      .orderBy(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = marked.groupBy($"__pid")
      .agg(count(lit(1)).as("__n"), sum($"__val").as("__s"))
    val isLong = agg.schema("__s").dataType ==
      org.apache.spark.sql.types.LongType
    val rows = agg.collect().sortBy(_.getInt(0)) // one row per partition
    val cntOff = rows.map(_.getLong(1)).scanLeft(0L)(_ + _)
    val offsets =
      if (isLong) {
        val sumOff = rows.map(r => if (r.isNullAt(2)) 0L else r.getLong(2))
          .scanLeft(0L)(_ + _)
        rows.indices.map(i => (rows(i).getInt(0), cntOff(i), sumOff(i)))
          .toDF("__pid", "__coff", "__soff")
      } else {
        val sumOff = rows.map(r => if (r.isNullAt(2)) 0.0 else r.getDouble(2))
          .scanLeft(0.0)(_ + _)
        rows.indices.map(i => (rows(i).getInt(0), cntOff(i), sumOff(i)))
          .toDF("__pid", "__coff", "__soff")
      }
    val zero = if (isLong) lit(0L) else lit(0.0)
    val local = Window.partitionBy($"__pid").orderBy(order: _*)
    val out = marked.join(broadcast(offsets), "__pid")
      .withColumn("__i", $"__coff" + row_number().over(local))
      .withColumn("__below", $"__soff" + coalesce(
        sum($"__val").over(local.rowsBetween(Window.unboundedPreceding, -1)), zero))
      .withColumn("__cum", $"__below" + coalesce($"__val", zero))
    (out, marked)
  }

  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"),
        round(avg(col(c).cast("double")), 6).as(s"${c}__mean"),
        round(stddev_samp(col(c).cast("double")), 6).as(s"${c}__stddev"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val packed = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__n").as("n"),
        coalesce(col(s"${c}__nulls"), lit(0L)).as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min"),
        col(s"${c}__max").as("max"),
        col(s"${c}__mean").as("mean"),
        col(s"${c}__stddev").as("stddev"))
    }
    one.select(explode(array(packed: _*)).as("p"))
      .select("p.column", "p.n", "p.n_nulls", "p.n_distinct",
        "p.min", "p.max", "p.mean", "p.stddev")
  }

  /**
   * Fixed-width histogram over `[lo, hi)` with `nBins` buckets: values
   * below `lo` clamp into bin 0, at or above `hi` into the last bin
   * (standard width_bucket-with-clamp semantics, so the counts always sum
   * to the non-null row count). One hash aggregate on a tiny key space —
   * the map-side partials collapse everything, so the shuffle carries at
   * most `nBins` rows per task at any scale.
   */
  def histogram(df: DataFrame, valueCol: String, nBins: Int,
      lo: Double, hi: Double): DataFrame = {
    require(nBins > 0 && hi > lo, s"need nBins > 0 and hi > lo: $nBins, [$lo, $hi)")
    val width = (hi - lo) / nBins
    val v = col(valueCol).cast("double")
    val bin = least(greatest(floor((v - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("int")
    val binLo = col("bin") * width + lo
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), round(binLo, 6).as("bin_lo"),
        round(binLo + width, 6).as("bin_hi"), col("n"))
  }

  /**
   * Distribution drift between a baseline slice and a current slice —
   * the Population Stability Index over the same clamped fixed-width
   * binning as `histogram`: psi_bin = (p − q)·ln(p/q), with both mass
   * fractions floored at `eps` (the standard guard: an empty bin on one
   * side must contribute a large-but-finite term, not ±∞). Total PSI =
   * Σ bins; the conventional alert thresholds are 0.1 (drifting) / 0.25
   * (shifted). Per-bin contributions are returned so the drifted REGION
   * is visible, not just the scalar.
   *
   * Two tiny-key hash aggregates + one bin-keyed outer join — nothing
   * corpus-sized leaves the scan.
   */
  def psiDrift(base: DataFrame, current: DataFrame, valueCol: String,
      nBins: Int, lo: Double, hi: Double, eps: Double = 1e-4): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    def counts(df: DataFrame, out: String) =
      histogram(df, valueCol, nBins, lo, hi).select($"bin", col("n").as(out))
    val bins = spark.range(nBins).select($"id".cast("int").as("bin"))
    // totals come from the already-joined bin rows (clamped binning loses
    // nothing), NOT from a second aggregate over each histogram — that
    // would re-execute both corpus-sized scans just for two scalars
    val total = org.apache.spark.sql.expressions.Window.partitionBy()
    val joined = bins
      .join(counts(base, "nb"), Seq("bin"), "left")
      .join(counts(current, "nc"), Seq("bin"), "left")
      .na.fill(0L, Seq("nb", "nc"))
      .withColumn("t_nb", sum($"nb").over(total))
      .withColumn("t_nc", sum($"nc").over(total))
    val p = greatest($"nb".cast("double") / $"t_nb", lit(eps))
    val q = greatest($"nc".cast("double") / $"t_nc", lit(eps))
    joined.select($"bin", $"nb", $"nc",
        round((p - q) * log(p / q), 6).as("psi_contrib"))
      .orderBy($"bin")
  }

  /**
   * Pairwise Pearson correlation over `cols` — the feature-drift /
   * redundancy screen a profiling pass runs before modeling. All
   * C(n,2) coefficients come out of ONE hash-aggregate pass (every
   * `corr` is an algebraic aggregate with map-side partials over the
   * same scan), then unpivot to tidy (col_x, col_y, r) rows — at 100 TB
   * the cost is one table scan regardless of how many pairs are asked
   * for. Null-containing rows are dropped per pair (corr's own
   * semantics). r is rounded to 6dp so differently-associated co-moment
   * sums can't flip the last ulp across engines.
   */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"${a}__$b")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        col(s"${a}__$b").as("r"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select($"p.col_x", $"p.col_y", $"p.r")
  }

  /**
   * Per-group simple linear regression (OLS y = a·x + b): slope,
   * intercept, R² and n from ONE hash aggregate — `regr_slope` and
   * friends are algebraic aggregates with map-side partials, so the cost
   * is a single keyed scan at any scale (the closed-form sums, never a
   * solver). Rows where either side is null are excluded pairwise
   * (standard regr_* semantics). 6dp rounding keeps the engines'
   * sum-association out of the hash.
   */
  /**
   * Per-group winsorization: values clipped to the group's
   * [pLo, pHi] exact percentiles (linear interpolation — the same
   * definition both engines implement). Outlier taming that preserves
   * row count, the standard pre-normalization step for heavy-tailed
   * features. Two passes over the keyed data: one aggregate for the
   * bounds (group-count-sized), one join-back + clip (map-side after the
   * key join). Adds `winsorized` plus clip flags.
   */
  def winsorize(df: DataFrame, keyCol: String, valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val bounds = df.groupBy(col(keyCol))
      .agg(percentile(v, lit(pLo)).as("__lo"), percentile(v, lit(pHi)).as("__hi"))
    df.join(bounds, keyCol)
      .withColumn("winsorized", least(greatest(v, $"__lo"), $"__hi"))
      .withColumn("clipped_low", v < $"__lo")
      .withColumn("clipped_high", v > $"__hi")
      .drop("__lo", "__hi")
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /**
   * Mann–Whitney U (Wilcoxon rank-sum) between two groups — the
   * nonparametric A/B test that ignores the metric's distribution
   * (heavy-tailed revenue, bounded scores): rank everything pooled
   * (AVERAGE ranks on ties — the exact convention both engines can
   * compute as (rank window + count window)), U₁ = R₁ − n₁(n₁+1)/2,
   * and the normal approximation with the TIE-CORRECTED variance
   *
   *   σ² = n₁n₂/12 · ((N+1) − Σ(tⱼ³−tⱼ)/(N(N−1)))
   *
   * Exact integer/rational arithmetic until the final z (4dp).
   * Requires exactly two distinct group labels.
   *
   * Scale path: ranks are derived ANALYTICALLY from the distinct-value
   * grid, never by sorting the raw rows — groupBy(value, group) counts
   * (one hash-agg shuffle sized by |grid|×2), a DISTRIBUTED cumulative
   * sum over the grid (partition-offset prefix sums, no unpartitioned
   * window — so a fully continuous sample, where grid = n, still
   * parallelizes), and the tie-block average rank
   * (#strictly-below) + (t+1)/2 joined back by value. A raw-row global
   * sort would serialize the whole sample through one task at 100×.
   */
  /** The rank-sum sufficient statistic (g, n, r) computed over the
    * distinct-value grid — exposed so PlanShapeSpec can pin that NO
    * unpartitioned window appears: the grid prefix sums ride the
    * partition-offset idiom ([[orderedPrefix]]), so even a fully
    * continuous sample (grid = n rows) never serializes through one
    * task. Returns (stats, sorted-grid cache to unpersist). */
  private[graft] def mwRankStats(base: DataFrame): (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    val vg = base.groupBy($"__v", $"g").agg(count(lit(1)).as("__c"))
    // average rank of a tie block = (#smaller) + (block+1)/2; __below is
    // an exact long sum, ranks are exact half-integers and __c * __avgr
    // is exact in double, so this is bit-identical to ranking raw rows.
    val (pre, cache) = orderedPrefix(
      vg.groupBy($"__v").agg(sum($"__c").as("__t")), Seq($"__v".asc), $"__t")
    val grid = pre.withColumn("__avgr", $"__below" + ($"__t" + 1) / lit(2.0))
    val stats = vg.join(grid.select($"__v", $"__avgr"), "__v")
      .groupBy($"g")
      .agg(sum($"__c").as("n"), sum($"__c" * $"__avgr").as("r"))
    (stats, cache)
  }

  /**
   * Cliff's delta — the nonparametric EFFECT SIZE beside
   * [[mannWhitneyU]]'s p-value: δ = (#(a>b) − #(a<b)) / (n_a·n_b) over
   * all cross-group pairs, read off the distinct-value grid (never a
   * pair join): #(a>b) = Σ_v c_a(v)·(#b strictly below v), with the
   * below-counts from the partition-offset prefix idiom
   * ([[orderedPrefix]]) — so a fully continuous sample still
   * parallelizes. Pair counts are exact (decimal products), δ is one
   * double division at the end; the magnitude label uses Romano et
   * al.'s |δ| thresholds (0.147 / 0.33 / 0.474) on the 6dp-anchored δ.
   * Groups order lexicographically. One row: (group_1, group_2, n_1,
   * n_2, n_gt, n_lt, n_ties, delta, magnitude).
   */
  def cliffsDelta(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("double").as("__v"))
      .filter($"__v".isNotNull)
    val labels = base.select($"g").distinct().orderBy($"g")
      .collect().map(_.getString(0))
    require(labels.length == 2,
      s"cliffsDelta needs exactly 2 groups, got ${labels.length}")
    val (gA, gB) = (labels(0), labels(1))
    val dec = "decimal(38,0)"
    val vg = base.groupBy($"__v").agg(
      sum(when($"g" === gA, 1L).otherwise(0L)).as("__ca"),
      sum(when($"g" === gB, 1L).otherwise(0L)).as("__cb"))
    val (pre, cache) = orderedPrefix(vg, Seq($"__v".asc), $"__cb")
    val agg = pre.agg(
      sum($"__ca").as("na"), sum($"__cb").as("nb"),
      sum($"__ca".cast(dec) * $"__below".cast(dec)).as("gt"),
      sum($"__ca".cast(dec) * $"__cb".cast(dec)).as("ties")).head()
    cache.unpersist()
    val (na, nb) = (agg.getLong(0), agg.getLong(1))
    val gt = BigDecimal(agg.getDecimal(2))
    val ties = BigDecimal(agg.getDecimal(3))
    val lt = BigDecimal(na) * BigDecimal(nb) - gt - ties
    val delta = BigDecimal(
      (gt.toDouble - lt.toDouble) / (na.toDouble * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mag =
      if (math.abs(delta) < 0.147) "negligible"
      else if (math.abs(delta) < 0.33) "small"
      else if (math.abs(delta) < 0.474) "medium"
      else "large"
    spark.createDataFrame(Seq((gA, gB, na, nb, gt.toLong, lt.toLong,
        ties.toLong, delta, mag)))
      .toDF("group_1", "group_2", "n_1", "n_2", "n_gt", "n_lt", "n_ties",
        "delta", "magnitude")
  }

  /**
   * Two-sample Kolmogorov–Smirnov test: D = max_x |F_a(x) − F_b(x)|
   * over the pooled distinct-value grid, where the ECDF gap is the
   * EXACT integer |n_b·C_a(x) − n_a·C_b(x)| (cumulative counts via the
   * partition-offset prefix idiom — no unpartitioned window, no sort of
   * raw rows), divided once at the end. The asymptotic p-value uses the
   * standard alternating series 2Σ(−1)^{k−1}e^{−2k²λ²} at the
   * effective λ = (√m + 0.12 + 0.11/√m)·D (Numerical-Recipes form,
   * m = n_a·n_b/(n_a+n_b)), truncated at 100 terms — doubles computed
   * from exact integers, so both engines land on the same digits. One
   * row: (group_1, group_2, n_1, n_2, d_stat 6dp, ks_lambda 6dp,
   * p_value 6dp).
   */
  def ksTest(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("double").as("__v"))
      .filter($"__v".isNotNull)
    val labels = base.select($"g").distinct().orderBy($"g")
      .collect().map(_.getString(0))
    require(labels.length == 2,
      s"ksTest needs exactly 2 groups, got ${labels.length}")
    val (gA, gB) = (labels(0), labels(1))
    val dec = "decimal(38,0)"
    val vg = base.groupBy($"__v").agg(
      sum(when($"g" === gA, 1L).otherwise(0L)).as("__ca"),
      sum(when($"g" === gB, 1L).otherwise(0L)).as("__cb"))
    val (preA, cacheA) = orderedPrefix(vg, Seq($"__v".asc), $"__ca")
    val withA = preA.withColumnRenamed("__cum", "__cuma")
      .select($"__v", $"__cuma", $"__cb")
    val (preB, cacheB) = orderedPrefix(withA, Seq($"__v".asc), $"__cb")
    // exact integer gap per grid value; na/nb from one aggregate
    val sizes = vg.agg(sum($"__ca").as("na"), sum($"__cb").as("nb")).head()
    val (na, nb) = (sizes.getLong(0), sizes.getLong(1))
    val gap = preB.select(abs(lit(nb).cast(dec) * $"__cuma".cast(dec) -
        lit(na).cast(dec) * $"__cum".cast(dec)).as("__gap"))
      .agg(max($"__gap")).head().getDecimal(0)
    cacheA.unpersist(); cacheB.unpersist()
    val d = BigDecimal(gap).toDouble / (na.toDouble * nb)
    val m = na.toDouble * nb / (na.toDouble + nb)
    val lam = (math.sqrt(m) + 0.12 + 0.11 / math.sqrt(m)) * d
    // below λ=0.2 the alternating series needs >100 terms, but the true
    // Q_KS is 1 − O(1e-7): both engines return exactly 1 there
    var p = if (lam < 0.2) 1.0 else 0.0
    var k = 1
    while (lam >= 0.2 && k <= 100) {
      p += 2.0 * (if (k % 2 == 1) 1.0 else -1.0) *
        math.exp(-2.0 * k * k * lam * lam)
      k += 1
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.createDataFrame(Seq((gA, gB, na, nb, r6(d), r6(lam),
        r6(math.max(0.0, math.min(1.0, p))))))
      .toDF("group_1", "group_2", "n_1", "n_2", "d_stat", "ks_lambda",
        "p_value")
  }

  /**
   * Hodges–Lehmann shift estimator — the robust "how much bigger is A
   * than B" in the metric's own units: the median of all n_a·n_b
   * cross-group differences, completing the nonparametric trio
   * ([[mannWhitneyU]] answers "is there a shift", [[cliffsDelta]] "how
   * consistently", this one "by how much"). Differences come from the
   * distinct-value GRID cross (grid²-bounded, never row×row), weighted
   * by count products; the median uses the deterministic two-middle
   * convention over the exact integer running weight. Differences are
   * 6dp-anchored, so the selection is engine-exact. One row:
   * (group_1, group_2, n_1, n_2, n_pairs, hl_shift = median(a − b)).
   *
   * Contract: the candidate set is |grid_a|·|grid_b|; feed values whose
   * distinct cardinality is bounded (prices, scores, counts), not
   * unbounded continuous uniques.
   */
  def hodgesLehmann(df: DataFrame, groupCol: String, valCol: String,
      maxGridCells: Long = 100000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("double").as("__v"))
      .filter($"__v".isNotNull)
    val labels = base.select($"g").distinct().orderBy($"g")
      .collect().map(_.getString(0))
    require(labels.length == 2,
      s"hodgesLehmann needs exactly 2 groups, got ${labels.length}")
    val (gA, gB) = (labels(0), labels(1))
    val ga = base.filter($"g" === gA).groupBy($"__v".as("__va"))
      .agg(count(lit(1)).as("__ca"))
    val gb = base.filter($"g" === gB).groupBy($"__v".as("__vb"))
      .agg(count(lit(1)).as("__cb"))
    // enforce the documented grid-cardinality contract BEFORE the cross:
    // two cheap counts instead of a silent |grid_a|x|grid_b| explosion
    val (nga, ngb) = (ga.count(), gb.count())
    require(nga * ngb <= maxGridCells,
      s"hodgesLehmann: $nga x $ngb grid cells exceed maxGridCells=" +
        s"$maxGridCells — bucket/round the value column first")
    val dd = ga.crossJoin(gb)
      .select(round($"__va" - $"__vb", 6).as("__d"),
        ($"__ca" * $"__cb").as("__w"))
      .groupBy($"__d").agg(sum($"__w").as("__w"))
    val (pre, cache) = orderedPrefix(dd, Seq($"__d".asc), $"__w")
    val tot = pre.agg(sum($"__w").as("np"),
      max($"__cum").as("chk")).head()
    val np = tot.getLong(0)
    val k1 = (np + 1) / 2
    val k2 = np / 2 + 1
    val sel = pre.agg(
      min(when($"__cum" >= k1, $"__d")).as("d1"),
      min(when($"__cum" >= k2, $"__d")).as("d2")).head()
    cache.unpersist()
    val hl = BigDecimal((sel.getDouble(0) + sel.getDouble(1)) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sizes = base.groupBy($"g").agg(count(lit(1)).as("n"))
      .orderBy($"g").collect().map(_.getLong(1))
    spark.createDataFrame(Seq((gA, gB, sizes(0), sizes(1), np, hl)))
      .toDF("group_1", "group_2", "n_1", "n_2", "n_pairs", "hl_shift")
  }

  def mannWhitneyU(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val base = df.select(col(groupCol).cast("string").as("g"), v.as("__v"))
      .filter($"__v".isNotNull)
    val (statsDf, gridCache) = mwRankStats(base)
    val stats = statsDf.orderBy($"g").collect()
    gridCache.unpersist()
    require(stats.length == 2,
      s"mannWhitneyU needs exactly 2 groups, got ${stats.length}")
    val (g1, n1, r1) = (stats(0).getString(0), stats(0).getLong(1), stats(0).getDouble(2))
    val (g2, n2) = (stats(1).getString(0), stats(1).getLong(1))
    val nTot = n1 + n2
    val ties = base.groupBy($"__v")
      .agg(count(lit(1)).as("t"))
      .agg(sum($"t" * $"t" * $"t" - $"t").as("tsum")).head().getLong(0)
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val mu = n1 * n2 / 2.0
    val sigma2 = n1.toDouble * n2 / 12.0 *
      ((nTot + 1) - ties.toDouble / (nTot.toDouble * (nTot - 1)))
    val z = BigDecimal((u1 - mu) / math.sqrt(sigma2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((g1, n1, r6(u1), g2, n2, r6(n1.toDouble * n2 - u1), z))
      .toDF("group_1", "n1", "u1", "group_2", "n2", "u2", "z_stat")
  }

  /**
   * CUPED variance reduction for experiment metrics: per-unit
   * pre-period covariate X and in-experiment metric Y, adjusted
   * Y′ = Y − θ·(X − mean(X)) with θ = cov(X,Y)/var(X) fitted over ALL
   * units (the standard single-θ design; per-cohort θ leaks the
   * treatment). Returns per-cohort rows: n, raw mean, adjusted mean,
   * plus the global θ and the variance ratio var(Y′)/var(Y) — the
   * fraction of metric noise the covariate removed. Two scalar
   * aggregates + one map-side adjustment: one scan of the unit table.
   * 6dp anchors on θ/means/ratio.
   */
  /**
   * Spearman rank correlation — Pearson over fractional average ranks,
   * the tie-correct definition. Ranks come from the per-variable
   * distinct-value grid ([[orderedPrefix]], so a fully-continuous input
   * degrades to a parallel range sort, never a single-task window) and
   * are kept as DOUBLED longs (2·avgrank = 2·below + cnt + 1, always
   * integral; Pearson is scale-invariant so the 2 cancels): every sum
   * is exact integer arithmetic, and the final formula runs in IEEE
   * double on exactly-cast sums — bit-identical across engines, 6dp.
   *
   * Inputs joins are value-keyed against grid-sized rank tables; the
   * moment aggregate is one pass. Long moments stay exact below
   * 2^53 (n ≲ 10^5 rows per call — feed it entity-level aggregates, the
   * [[giniLorenz]] contract; a corpus-scale call would move the moments
   * to DECIMAL).
   *
   * @return one row: (n, rho)
   */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(xCol).as("__x"), col(yCol).as("__y"))
      .filter($"__x".isNotNull && $"__y".isNotNull)
    def ranks2(in: Column, key: String, out: String): DataFrame = {
      val grid = base.groupBy(in.as(key)).agg(count(lit(1)).as("__cnt"))
      val (pre, cache) = orderedPrefix(grid, Seq(col(key).asc), $"__cnt")
      val r = pre.select(col(key),
        (lit(2L) * $"__below" + $"__cnt" + lit(1L)).as(out))
      cache.unpersist() // determinism-safe: recompute reuses the exchange
      r
    }
    val joined = base
      .join(ranks2($"__x", "__x", "__rx"), "__x")
      .join(ranks2($"__y", "__y", "__ry"), "__y")
    val m = joined.agg(
      count(lit(1)).as("n"),
      sum($"__rx").as("sx"), sum($"__ry").as("sy"),
      sum($"__rx" * $"__rx").as("sxx"), sum($"__ry" * $"__ry").as("syy"),
      sum($"__rx" * $"__ry").as("sxy"))
    m.select($"n",
      round(
        (($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
            ($"n" * $"syy" - $"sy" * $"sy").cast("double")), 6).as("rho"))
  }

  /**
   * Quantile normalization across groups — map each row's value onto the
   * GLOBAL value distribution at its within-group quantile, the standard
   * batch-effect correction (bioinformatics) applied to corpus curation:
   * quality/perplexity scores whose scales drift by domain or language
   * become comparable, so one global threshold means the same thing
   * everywhere (the global generalization of `perplexityFilter`'s
   * per-language cut).
   *
   * Within-group quantile is `percent_rank` over (value, key) — a
   * deterministic total order both engines define identically; the
   * global quantile function is an exact interpolated percentile grid
   * (`gridSize`+1 points, the winsorize parity device) broadcast to one
   * linear-interpolation expression per row. The group window partitions
   * by group (domain-sized partitions); the grid aggregate is the only
   * global pass. Feed it score tables (entity-sized), not raw events —
   * the [[giniLorenz]] contract.
   *
   * @return (keyCol, groupCol, valCol as double, norm 6dp)
   */
  def quantileNormalize(df: DataFrame, keyCol: String, groupCol: String,
      valCol: String, gridSize: Int = 100): DataFrame = {
    require(gridSize >= 2, s"gridSize must be >= 2, got $gridSize")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol).as("__k"), col(groupCol).as("__g"),
        col(valCol).cast("double").as("__v"))
      .filter($"__v".isNotNull)
    val qs = (0 to gridSize).map(_.toDouble / gridSize)
    val grid = base.agg(percentile($"__v", typedLit(qs)).as("__grid"))
    val w = Window.partitionBy($"__g").orderBy($"__v".asc, $"__k".asc)
    base.withColumn("__pr", percent_rank().over(w))
      .crossJoin(broadcast(grid))
      .withColumn("__pos", $"__pr" * gridSize)
      .withColumn("__lo", floor($"__pos").cast("int"))
      .withColumn("__hi", ceil($"__pos").cast("int"))
      .select($"__k".as(keyCol), $"__g".as(groupCol), $"__v".as(valCol),
        round(element_at($"__grid", $"__lo" + 1) +
          ($"__pos" - $"__lo") * (element_at($"__grid", $"__hi" + 1) -
            element_at($"__grid", $"__lo" + 1)), 6).as("norm"))
  }

  def cuped(units: DataFrame, cohortCol: String, preCol: String,
      postCol: String): DataFrame = {
    val spark = units.sparkSession
    import spark.implicits._
    val x = col(preCol).cast("double")
    val y = col(postCol).cast("double")
    val g = units.agg(round(covar_samp(x, y) / var_samp(x), 6).as("theta"),
      round(avg(x), 6).as("mx")).head()
    val theta = g.getDouble(0); val mx = g.getDouble(1)
    val adjusted = units.withColumn("__yadj", y - lit(theta) * (x - lit(mx)))
    val varRatio = adjusted.agg(
      round(var_samp($"__yadj") / var_samp(y), 6).as("vr")).head().getDouble(0)
    adjusted.groupBy(col(cohortCol).as("cohort"))
      .agg(count(lit(1)).as("n"),
        round(avg(y), 6).as("mean_raw"),
        round(avg($"__yadj"), 6).as("mean_cuped"))
      .withColumn("theta", lit(theta))
      .withColumn("var_ratio", lit(varRatio))
  }

  /**
   * Welch's two-sample t-test between every pair of groups in
   * `keyCol` — the unequal-variance A/B comparison (never pooled
   * variance: group sizes and spreads differ in real experiments):
   *
   *   t = (m₁ − m₂) / √(s₁²/n₁ + s₂²/n₂)
   *
   * with Welch–Satterthwaite degrees of freedom. One grouped moment
   * aggregate (count/mean/variance per group), then a group×group join
   * over the GROUP-COUNT-sized stats frame — the data is scanned once
   * regardless of how many pairs come out. 6dp/2dp rounding anchors;
   * p-values are left to the caller's lookup (no incomplete-beta in
   * the oracle engine) — |t| with df is the decision statistic.
   */
  def welchTTest(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    // group-count-sized; checkpointed so the self-join below reads the
    // materialized stats instead of scanning the fact table twice
    val stats = df.groupBy(col(keyCol).as("g"))
      .agg(count(v).as("n"), round(avg(v), 6).as("m"),
        round(var_samp(v), 6).as("s2"))
      .ckptSer()
    val a = stats.select($"g".as("group_a"), $"n".as("na"), $"m".as("ma"),
      $"s2".as("sa"))
    val b = stats.select($"g".as("group_b"), $"n".as("nb"), $"m".as("mb"),
      $"s2".as("sb"))
    a.join(b, $"group_a" < $"group_b")
      .withColumn("se2", $"sa" / $"na" + $"sb" / $"nb")
      .withColumn("t_stat", round(($"ma" - $"mb") / sqrt($"se2"), 4))
      .withColumn("df_welch", round(
        ($"se2" * $"se2") /
          (($"sa" / $"na") * ($"sa" / $"na") / ($"na" - 1) +
            ($"sb" / $"nb") * ($"sb" / $"nb") / ($"nb" - 1)), 2))
      .select($"group_a", $"group_b", $"na", $"nb", $"ma", $"mb",
        $"t_stat", $"df_welch")
  }

  /**
   * Robust z-score per group: (v − median) / (1.4826·MAD), the
   * outlier score that a single wild value cannot poison (unlike the
   * mean/stddev z-score — its own baseline moves with the outlier).
   * MAD = exact median of |v − median|; the 1.4826 constant rescales
   * to σ-equivalents under normality. Two grouped exact-percentile
   * aggregates + one join-back; 6dp anchors on median/MAD, 4dp on the
   * score. Zero-MAD groups (constant values) score null.
   */
  def robustZscore(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val med = df.groupBy(col(keyCol))
      .agg(round(percentile(v, lit(0.5)), 6).as("__med"))
    val mad = df.join(med, keyCol)
      .groupBy(col(keyCol))
      .agg(round(percentile(abs(v - $"__med"), lit(0.5)), 6).as("__mad"))
    df.join(med, keyCol).join(mad, keyCol)
      .withColumn("robust_z",
        when($"__mad" > 0,
          round((v - $"__med") / (lit(1.4826) * $"__mad"), 4)))
      .withColumnRenamed("__med", "group_median")
      .withColumnRenamed("__mad", "group_mad")
  }

  /**
   * Mutual information between two columns over an equal-frequency
   * grid: both sides quantile-binned (`quantileBin` bounds), then
   * MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over the k×k cell grid — the
   * nonlinear-dependence screen that catches what Pearson `corrPairs`
   * misses. Cell/marginal counts are exact integers; only the final
   * per-cell term is floating (6dp), summed over the grid-sized
   * result. Returns per-cell contributions plus the scalar `mi`.
   */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String,
      k: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val binned = quantileBin(
      quantileBin(df.select(col(xCol).cast("double").as("__x"),
          col(yCol).cast("double").as("__y")), "__x", k)
        .withColumnRenamed("bucket", "bx"), "__y", k)
      .withColumnRenamed("bucket", "by")
    val cells = binned.groupBy($"bx", $"by").agg(count(lit(1)).as("nxy"))
    val total = org.apache.spark.sql.expressions.Window.partitionBy()
    val withMarg = cells
      .withColumn("nx", sum($"nxy").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"bx")))
      .withColumn("ny", sum($"nxy").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"by")))
      .withColumn("n", sum($"nxy").over(total))
      .withColumn("mi_contrib", round(
        $"nxy" / $"n" * log($"nxy" * $"n" / ($"nx" * $"ny")), 6))
    withMarg
      .withColumn("mi", round(sum($"mi_contrib").over(total), 6))
      .select($"bx", $"by", $"nxy", $"mi_contrib", $"mi")
  }

  /**
   * Gini coefficient + Lorenz curve points over a nonnegative value
   * column — the concentration/inequality summary (spend
   * concentration, token-budget skew, shard balance). Exact discrete
   * formulation over values sorted ascending (ties broken by `idCol`
   * for a deterministic curve):
   *
   *   G = (2·Σ i·v_i) / (n·Σ v_i) − (n + 1)/n
   *
   * One distributed range-sort + partition-offset prefix sums (no
   * unpartitioned window — [[orderedPrefix]]); `lorenz` rows are the
   * cumulative population/value shares at each decile boundary
   * (grid-sized output). Returns (decile, pop_share, value_share,
   * gini) with the scalar repeated per row. 6dp. The sort cost still
   * implies the input is an already-AGGREGATED entity table
   * (customers, shards) — key-sized, not event-sized; feed it groupBy
   * output — but an event-sized input now degrades to a parallel
   * sort, not a single-task window.
   */
  def giniLorenz(df: DataFrame, idCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val (ranked, cache) = orderedPrefix(
      df.select(col(idCol), v.as("__v")), Seq($"__v".asc, col(idCol).asc), $"__v")
    val tot = ranked.agg(count(lit(1)).as("n"), sum($"__v").as("t"),
      sum($"__i" * $"__v").as("iv")).head()
    val n = tot.getLong(0); val t = tot.getDouble(1); val iv = tot.getDouble(2)
    val gini = BigDecimal(2.0 * iv / (n * t) - (n + 1.0) / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val res = ranked
      .withColumn("decile", ceil($"__i" * 10.0 / n).cast("int"))
      .groupBy($"decile")
      .agg(max($"__i").as("__maxi"), max($"__cum").as("__maxcum"))
      .select($"decile",
        round($"__maxi" / n.toDouble, 6).as("pop_share"),
        round($"__maxcum" / t, 6).as("value_share"),
        lit(gini).as("gini"))
    cache.unpersist() // determinism-safe: recompute reuses the exchange
    res
  }

  /**
   * Per-group null imputation: missing values filled with the group's
   * mean or exact median (6dp-rounded fill so the replay anchors), an
   * `imputed` flag marking filled rows. One group-stats aggregate +
   * one key join — the standard feature-cleaning pass that must not
   * change row count.
   */
  def imputeByGroup(df: DataFrame, keyCol: String, valCol: String,
      strategy: String = "mean"): DataFrame = {
    require(strategy == "mean" || strategy == "median",
      s"strategy must be mean|median, got $strategy")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val fillAgg = if (strategy == "mean") avg(v) else percentile(v, lit(0.5))
    val fills = df.groupBy(col(keyCol))
      .agg(round(fillAgg, 6).as("__fill"))
    df.join(fills, keyCol)
      .withColumn("imputed", v.isNull && $"__fill".isNotNull)
      .withColumn(valCol, coalesce(v, $"__fill"))
      .drop("__fill")
  }

  /**
   * Kaplan–Meier survival estimator from per-subject (duration,
   * event) rows — duration in whatever unit, event = true for an
   * observed event, false for right-censoring. The time-to-event
   * workhorse (conversion lag, churn, time-to-failure) done as pure
   * relational algebra: durations aggregate to a time-grid (distinct
   * durations — small by construction), the at-risk count at each time
   * is N minus the running count of earlier exits, and the survival
   * curve is the running product Π(1 − d/n) computed as
   * exp(Σ ln(·)) over the grid (grid-sized windows, never
   * subject-sized). Emits one row per DEATH time: (t, n_at_risk,
   * n_events, n_censored_at_t, survival 6dp).
   */
  /**
   * Two-sample log-rank test (Mantel 1966) — "do these two survival
   * curves differ?", the hypothesis test that belongs next to
   * [[kaplanMeier]]'s estimate. At each pooled event time: observed
   * group-1 events d₁ₜ vs the hypergeometric expectation dₜ·n₁ₜ/nₜ and
   * variance dₜ·(n₁ₜ/nₜ)·(n₂ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1); z = Σ(O−E)/√ΣV and
   * χ² = z². At-risk counts are exact integers (per-group cumulative
   * over the pooled time grid); E and V terms are 10dp-anchored and
   * summed as exact decimals, so both engines land on identical digits.
   * Groups order lexicographically (group 1 = smaller label). One row:
   * (group_1, group_2, n_1, n_2, events_1, events_2, o_minus_e 6dp,
   * var_sum 6dp, z 4dp, chi2 4dp).
   *
   * Scale posture: two keyed aggregates plus per-group cumulative sums
   * over the pooled TIME GRID (grid-sized by construction, the
   * [[kaplanMeier]] precedent) — subjects are never sorted globally.
   */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
      eventCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val subj = df.select(col(groupCol).cast("string").as("g"),
      col(durationCol).cast("long").as("t"),
      col(eventCol).cast("boolean").as("ev"))
    val gg = subj.groupBy($"g", $"t")
      .agg(sum(when($"ev", 1L).otherwise(0L)).as("d"),
        sum(lit(1L)).as("obs"))
    val spine = gg.select($"t").distinct()
    val groups = gg.select($"g").distinct()
    val totals = subj.groupBy($"g").agg(count(lit(1)).as("n_g"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"t")
    val before = wg.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val atRisk = spine.crossJoin(groups)
      .join(gg, Seq("g", "t"), "left")
      .select($"g", $"t", coalesce($"d", lit(0L)).as("d"),
        coalesce($"obs", lit(0L)).as("obs"))
      .withColumn("cumb", coalesce(sum($"obs").over(before), lit(0L)))
      .join(totals, "g")
      .withColumn("nat", $"n_g" - $"cumb")
    val ga = groups.orderBy($"g").collect().map(_.getString(0))
    require(ga.length == 2, s"logRank needs exactly 2 groups, got ${ga.length}")
    val (gA, gB) = (ga(0), ga(1))
    val side1 = atRisk.filter($"g" === gA)
      .select($"t", $"d".as("d1"), $"nat".as("na1"))
    val side2 = atRisk.filter($"g" === gB)
      .select($"t", $"d".as("d2"), $"nat".as("na2"))
    val terms = side1.join(side2, "t")
      .withColumn("dt", $"d1" + $"d2")
      .withColumn("nt", $"na1" + $"na2")
      .filter($"dt" > 0)
      .withColumn("e1", round($"dt".cast("double") * $"na1" / $"nt", 10))
      .withColumn("v", round(when($"nt" > 1,
        $"dt".cast("double") * ($"na1".cast("double") / $"nt") *
          ($"na2".cast("double") / $"nt") * ($"nt" - $"dt") / ($"nt" - 1))
        .otherwise(lit(0.0)), 10))
    val agg = terms.agg(
      sum($"d1").as("o1"), sum($"d2").as("o2"),
      sum(round($"e1" * 1e10).cast("decimal(38,0)")).as("e110"),
      sum(round($"v" * 1e10).cast("decimal(38,0)")).as("v10")).head()
    val (o1, o2) = (agg.getLong(0), agg.getLong(1))
    val e1 = agg.getDecimal(2).doubleValue() / 1e10
    val vs = agg.getDecimal(3).doubleValue() / 1e10
    val nTot = totals.orderBy($"g").collect().map(_.getLong(1))
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val om = o1 - e1
    val z = if (vs > 0) r(om / math.sqrt(vs), 4) else 0.0
    val chi2 = if (vs > 0) r(om * om / vs, 4) else 0.0
    spark.createDataFrame(Seq(
      (gA, gB, nTot(0), nTot(1), o1, o2, r(om, 6), r(vs, 6), z, chi2)))
      .toDF("group_1", "group_2", "n_1", "n_2", "events_1", "events_2",
        "o_minus_e", "var_sum", "z", "chi2")
  }

  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val subj = df.select(col(durationCol).cast("long").as("t"),
      col(eventCol).cast("boolean").as("ev"))
    val grid = subj.groupBy($"t")
      .agg(sum(when($"ev", 1L).otherwise(0L)).as("d"),
        sum(when($"ev", 0L).otherwise(1L)).as("c"))
    val ord = org.apache.spark.sql.expressions.Window.orderBy($"t")
    val before = ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val upTo = ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val total = org.apache.spark.sql.expressions.Window.partitionBy()
    grid
      .withColumn("n_at_risk",
        sum($"d" + $"c").over(total) - coalesce(sum($"d" + $"c").over(before), lit(0L)))
      .withColumn("survival",
        // the d == n_at_risk factor is exactly 0 and ln would reject it
        // (DuckDB errors, Spark nulls-and-skips): a -1e9 sentinel term
        // underflows exp to the exact 0.0 the product demands
        round(exp(sum {
          val f = lit(1.0) - $"d".cast("double") / $"n_at_risk"
          when(f > 0, log(f)).otherwise(lit(-1e9))
        }.over(upTo)), 6))
      .filter($"d" > 0)
      .select($"t", $"n_at_risk", $"d".as("n_events"), $"c".as("n_censored"),
        $"survival")
  }

  /**
   * Benford's-law conformance screen over a positive currency-style
   * column: observed first-significant-digit frequencies vs the
   * log10(1 + 1/d) expectation, with per-digit chi-square
   * contributions — the classic fabricated-numbers detector for
   * finance-shaped data. The digit comes from the value scaled to
   * integer cents and stringified (integer formatting is
   * engine-identical; float log10 at power-of-ten boundaries is not).
   * One digit-keyed hash aggregate; 9-row output.
   */
  def benfordScreen(df: DataFrame, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val digit = substring(round(v * 100).cast("long").cast("string"), 1, 1)
      .cast("int")
    val total = org.apache.spark.sql.expressions.Window.partitionBy()
    // filter on the INTEGER cents, not the raw value: v in (0, 0.005)
    // rounds to 0 cents, which would yield digit 0 and a divide-by-zero
    // Benford expectation — sub-cent values carry no leading digit.
    df.filter(round(v * 100).cast("long") >= 1)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("observed_p", round($"n" / sum($"n").over(total), 6))
      .withColumn("benford_p", round(log10(lit(1.0) + lit(1.0) / $"digit"), 6))
      .withColumn("chi_contrib", round(
        ($"observed_p" - $"benford_p") * ($"observed_p" - $"benford_p") /
          $"benford_p", 6))
  }

  /**
   * Order-independent table fingerprint for data contracts / cross-copy
   * diffing: per-row md5-derived 60-bit hashes over the
   * pipe-concatenated column values, combined by EXACT decimal SUM (an
   * order-free combiner — Spark 4's ANSI long sum would overflow, and
   * neither engine has a portable xor aggregate), then reduced mod the
   * Mersenne prime 2^61-1 so the emitted fingerprint is a plain BIGINT
   * (a raw DECIMAL(38,0) ~1e22 is canonicalized differently by
   * downstream consumers; the mod keeps the combiner order-free and the
   * collision bound ~2^-61), plus the row count. Two tables share a
   * fingerprint iff they agree row-for-row as multisets (mod collision).
   * One scan, one scalar aggregate.
   */
  val FingerprintModulus = 2305843009213693951L // 2^61 - 1, Mersenne prime

  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val rowHash = graft.pipeline.Dedup.baseHash60(
      concat_ws("|", cols.map(c => col(c).cast("string")): _*))
    df.agg(count(lit(1)).as("n_rows"),
      (sum(rowHash.cast("decimal(38,0)")) %
        lit(BigDecimal(FingerprintModulus))).cast("long").as("hash_sum"))
  }

  /**
   * Two-component 1-D Gaussian mixture fitted by EM — the in-engine
   * latent-class decomposition for bimodal metrics (organic vs bot
   * traffic, two price regimes) next to the single-Gaussian profile.
   * Deterministic by construction: means init at the exact 25th/75th
   * percentiles, variances at the population variance, equal weights;
   * each EM iteration is ONE aggregate pass over the data (model = 6
   * scalars, collected per iteration exactly like the LDA driver's
   * alpha rows), and every updated parameter is ROUNDED to 6dp before
   * the next pass — the rounding-anchor device that makes the whole
   * trajectory replayable as unrolled MATERIALIZED CTEs
   * (`gmm1dOracleSql`) regardless of either engine's summation order
   * or libm. Degenerate responsibilities (both densities underflow)
   * fall back to the prior weight; variances floor at 1e-6.
   *
   * Returns one row per component: (comp, weight, mu, var,
   * loglik) with the final-model log-likelihood (4dp) repeated on both.
   */
  def gmm1d(df: DataFrame, valCol: String, iterations: Int = 8): DataFrame = {
    require(iterations >= 1, "need at least one EM iteration")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(valCol).cast("double").as("v")).persist()
    try {
      val init = base.agg(
        round(percentile($"v", lit(0.25)), 6).as("mu1"),
        round(percentile($"v", lit(0.75)), 6).as("mu2"),
        round(var_pop($"v"), 6).as("s0")).head()
      var mu1 = init.getDouble(0); var mu2 = init.getDouble(1)
      var s1 = math.max(init.getDouble(2), 1e-6); var s2 = s1
      var w1 = 0.5; var w2 = 0.5

      def pdf(w: Double, mu: Double, s: Double) =
        lit(w) * exp(-($"v" - mu) * ($"v" - mu) / (2 * s)) /
          sqrt(lit(2 * math.Pi * s))

      for (_ <- 1 to iterations) {
        val p1 = pdf(w1, mu1, s1)
        val p2 = pdf(w2, mu2, s2)
        val r1 = when(p1 + p2 > 0, p1 / (p1 + p2)).otherwise(lit(w1))
        val r2 = when(p1 + p2 > 0, p2 / (p1 + p2)).otherwise(lit(w2))
        val row = base.agg(
          sum(r1).as("n1"), sum(r1 * $"v").as("sv1"), sum(r1 * $"v" * $"v").as("sq1"),
          sum(r2).as("n2"), sum(r2 * $"v").as("sv2"), sum(r2 * $"v" * $"v").as("sq2"),
          count(lit(1)).cast("double").as("n")).head()
        val (n1, sv1, sq1) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
        val (n2, sv2, sq2) = (row.getDouble(3), row.getDouble(4), row.getDouble(5))
        val n = row.getDouble(6)
        // the SAME IEEE expressions the SQL replay computes, then the anchor
        w1 = r6(n1 / n); w2 = r6(n2 / n)
        mu1 = r6(sv1 / n1); mu2 = r6(sv2 / n2)
        s1 = math.max(r6(sq1 / n1 - (sv1 / n1) * (sv1 / n1)), 1e-6)
        s2 = math.max(r6(sq2 / n2 - (sv2 / n2) * (sv2 / n2)), 1e-6)
      }
      val ll = BigDecimal(base.agg(
          sum(log(pdf(w1, mu1, s1) + pdf(w2, mu2, s2))).as("ll")).head().getDouble(0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((1, w1, mu1, s1, ll), (2, w2, mu2, s2, ll))
        .toDF("comp", "weight", "mu", "var", "loglik")
    } finally base.unpersist()
  }

  /** The unrolled-CTE SQL replay of `gmm1d` (the q_lr_classifier
    * trajectory pattern): same init, same per-iteration expressions,
    * same 6dp anchors. `sourceSql` must select a single DOUBLE column
    * aliased `v`. */
  def gmm1dOracleSql(sourceSql: String, iterations: Int): String = {
    def pdf(w: String, mu: String, s: String) =
      s"$w * exp(-(v - $mu) * (v - $mu) / (2 * $s)) / sqrt(2 * pi() * $s)"
    def params(step: String) = (s"(SELECT w1 FROM $step)", s"(SELECT w2 FROM $step)",
      s"(SELECT mu1 FROM $step)", s"(SELECT mu2 FROM $step)",
      s"(SELECT s1 FROM $step)", s"(SELECT s2 FROM $step)")
    val steps = (1 to iterations).map { i =>
      val prev = if (i == 1) "init" else s"step${i - 1}"
      val (pw1, pw2, pmu1, pmu2, ps1, ps2) = params(prev)
      val p1 = pdf(pw1, pmu1, ps1)
      val p2 = pdf(pw2, pmu2, ps2)
      s"""step$i AS MATERIALIZED (
         |  SELECT round(n1 / n, 6) AS w1, round(n2 / n, 6) AS w2,
         |         round(sv1 / n1, 6) AS mu1, round(sv2 / n2, 6) AS mu2,
         |         greatest(round(sq1 / n1 - (sv1 / n1) * (sv1 / n1), 6), 1e-6) AS s1,
         |         greatest(round(sq2 / n2 - (sv2 / n2) * (sv2 / n2), 6), 1e-6) AS s2
         |  FROM (
         |    SELECT sum(r1) AS n1, sum(r1 * v) AS sv1, sum(r1 * v * v) AS sq1,
         |           sum(r2) AS n2, sum(r2 * v) AS sv2, sum(r2 * v * v) AS sq2,
         |           CAST(count(*) AS DOUBLE) AS n
         |    FROM (
         |      SELECT v,
         |        CASE WHEN $p1 + $p2 > 0 THEN $p1 / ($p1 + $p2) ELSE $pw1 END AS r1,
         |        CASE WHEN $p1 + $p2 > 0 THEN $p2 / ($p1 + $p2) ELSE $pw2 END AS r2
         |      FROM base)))""".stripMargin
    }
    val last = s"step$iterations"
    val (fw1, fw2, fmu1, fmu2, fs1, fs2) = params(last)
    val fp1 = pdf(fw1, fmu1, fs1)
    val fp2 = pdf(fw2, fmu2, fs2)
    s"""WITH base AS MATERIALIZED ($sourceSql),
       |init AS MATERIALIZED (
       |  SELECT 0.5 AS w1, 0.5 AS w2,
       |         round(quantile_cont(v, 0.25), 6) AS mu1,
       |         round(quantile_cont(v, 0.75), 6) AS mu2,
       |         greatest(round(var_pop(v), 6), 1e-6) AS s1,
       |         greatest(round(var_pop(v), 6), 1e-6) AS s2
       |  FROM base),
       |${steps.mkString(",\n")},
       |ll AS MATERIALIZED (
       |  SELECT round(sum(ln($fp1 + $fp2)), 4) AS loglik FROM base)
       |SELECT comp,
       |  CASE comp WHEN 1 THEN (SELECT w1 FROM $last) ELSE (SELECT w2 FROM $last) END AS weight,
       |  CASE comp WHEN 1 THEN $fmu1 ELSE $fmu2 END AS mu,
       |  CASE comp WHEN 1 THEN (SELECT s1 FROM $last) ELSE (SELECT s2 FROM $last) END AS var,
       |  (SELECT loglik FROM ll) AS loglik
       |FROM (SELECT 1 AS comp UNION ALL SELECT 2) ORDER BY comp""".stripMargin
  }

  /** Poisson(1) inverse-CDF thresholds (cumulative, 9dp literals) shared
    * verbatim by the SQL replay — a u ∈ [0,1) draw maps to the weight
    * whose cumulative bound it falls under, capped at 7. */
  val PoissonCdf: Seq[Double] = Seq(
    0.367879441, 0.735758882, 0.919698603, 0.981011843,
    0.996340153, 0.999405815, 0.999916758)

  /**
   * Poisson-bootstrap confidence interval for a mean — THE distributed
   * bootstrap: resampling-with-replacement is unshardable, but giving
   * every row an independent Poisson(1) weight per replicate is
   * one-pass, embarrassingly parallel, and asymptotically equivalent.
   * Weights are md5-deterministic in (row id, replicate), so the whole
   * procedure — draws, weighted means, percentile CI — replays exactly
   * in SQL. One scan fan-out of B (the replicate count, a literal
   * array), one hash aggregate to B rows, then a B-sized summary:
   * point mean, the exact [α/2, 1−α/2] percentile interval over the
   * 4dp-rounded replicate means (4dp, not 6 — the replicate sums are
   * data-sized, and the anchor must sit far above cross-engine
   * summation-association error), and their stddev as the bootstrap SE.
   */
  def bootstrapMeanCi(df: DataFrame, idCol: String, valCol: String,
      replicates: Int = 32, alpha: Double = 0.05): DataFrame = {
    require(replicates >= 8, "need >= 8 replicates for a meaningful CI")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val u = graft.pipeline.Dedup.baseHash60(
      concat(col(idCol).cast("string"), lit(":"), $"b".cast("string")))
      .cast("double") / lit(math.pow(2, 60))
    val weight = PoissonCdf.zipWithIndex.reverse
      .foldLeft(lit(7): Column) { case (acc, (p, k)) =>
        when(u < p, lit(k)).otherwise(acc)
      }
    val reps = df.select(col(idCol), v.as("__v"))
      .withColumn("b", explode(array((1 to replicates).map(lit(_)): _*)))
      .withColumn("__w", weight)
      .groupBy($"b")
      .agg(round(sum($"__w" * $"__v") / sum($"__w"), 4).as("rep_mean"))
    val point = df.agg(count(v).as("n"), round(avg(v), 4).as("mean"))
    reps.agg(
        round(percentile($"rep_mean", lit(alpha / 2)), 4).as("ci_lo"),
        round(percentile($"rep_mean", lit(1 - alpha / 2)), 4).as("ci_hi"),
        round(stddev_samp($"rep_mean"), 4).as("boot_se"))
      .crossJoin(broadcast(point))
      .select($"n", $"mean", $"ci_lo", $"ci_hi", $"boot_se")
  }

  /**
   * Equal-frequency quantile binning (the feature bucketizer): each row
   * labeled with the bucket its value falls into among `k` buckets
   * bounded at the exact interpolated percentiles i/k. bucket =
   * #{interior bounds ≤ v}, so bucket 0 is below the 1/k-th percentile
   * and boundary-equal values go UP a bucket — the convention a SQL
   * replay states naturally. Bounds come from ONE scalar aggregate
   * (6dp-rounded so engine association order can't wiggle a boundary)
   * broadcast as a 1-row frame; the assignment itself is map-side —
   * scale cost is one pass plus the exact-percentile agg.
   */
  def quantileBin(df: DataFrame, valCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 buckets, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val fracs = (1 until k).map(_.toDouble / k)
    val bounds = df.agg(
      array(fracs.map(f => round(percentile(v, lit(f)), 6)): _*).as("__bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        size(filter($"__bounds", b => v >= b)))
      .drop("__bounds")
  }

  /**
   * Pearson chi-square test of independence between two categorical
   * columns — the feature-dependence / drift screen next to PSI. The
   * observed contingency table is ONE hash aggregate; margins and the
   * full cell grid (including zero-observed cells, which still
   * contribute (0−e)²/e) come from joins over the margin frames — all
   * category-count-sized, never data-sized, so the one corpus scan
   * dominates at any scale. Returns one row:
   * (chi2, dof, n, n_cells). χ² rounded 6dp for cross-engine stability.
   */
  def chiSquareTest(df: DataFrame, colA: String, colB: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = obs.groupBy($"a").agg(sum($"o").as("rowT"))
    val cb = obs.groupBy($"b").agg(sum($"o").as("colT"))
    val grid = ra.crossJoin(cb)
      .join(obs, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    grid
      .withColumn("n", sum($"o").over(tot))
      .withColumn("e", $"rowT" * $"colT" / $"n".cast("double"))
      .agg(
        round(sum(($"o" - $"e") * ($"o" - $"e") / $"e"), 6).as("chi2"),
        ((countDistinct($"a") - 1) * (countDistinct($"b") - 1)).as("dof"),
        first($"n").as("n"),
        count(lit(1)).as("n_cells"))
  }

  /**
   * Weighted median per key: the smallest value whose running weight
   * reaches half the key's total — the robust location statistic for
   * weighted data (quantity-weighted price, token-weighted score). One
   * key-partitioned window sort plus a hash aggregate; exact, no
   * interpolation, so integer-weighted fixtures compare bit-for-bit.
   * Ties in the value can permute cumulative weights within the tie run
   * but never change which VALUE first crosses the threshold, so the
   * result is deterministic under any partitioning.
   */
  def weightedMedian(df: DataFrame, keyCol: String, valCol: String,
      weightCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val byKey = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val cum = byKey.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(keyCol), col(valCol).cast("double").as("__v"),
        col(weightCol).cast("double").as("__w"))
      .withColumn("__cumw", sum($"__w").over(cum))
      .withColumn("__total", sum($"__w").over(byKey))
      .filter($"__cumw" >= $"__total" / 2)
      .groupBy(col(keyCol))
      .agg(min($"__v").as("weighted_median"))
  }

  def olsByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    df.groupBy(col(groupCol))
      .agg(regr_count(y, x).as("n"),
        round(regr_slope(y, x), 6).as("slope"),
        round(regr_intercept(y, x), 6).as("intercept"),
        round(regr_r2(y, x), 6).as("r2"))
  }
}
