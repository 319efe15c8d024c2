package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Labeled-data quality operators for human-feedback pipelines: planted
 * multi-rater label fixtures, inter-annotator agreement (pairwise Cohen's
 * kappa + Fleiss' kappa), and Dawid–Skene EM label aggregation.
 *
 * Scale posture: a label table is items × raters rows; every pass below is
 * either keyed on the item id (pair join, per-item counts) or a
 * class/rater-sized aggregate. Nothing is ever item×item, and the only
 * driver-side values are model-sized scalars and confusion matrices
 * (raters × classes² rows).
 */
object Annotation {

  /**
   * Deterministic multi-rater label fixture over any id column: the true
   * class of item i is baseHash60("cls:"+i) mod K, and rater r (1-based)
   * reports it faithfully unless baseHash60("rater"+r+":"+i) mod 100 falls
   * in the top 10·r% — a planted per-rater error rate of 10r% with a
   * rater-specific confusion direction ((true+r) mod K), so confusion
   * matrices are asymmetric and distinguishable per rater. md5-derived, so
   * a SQL oracle replays the same labels bit-for-bit.
   */
  def plantedLabels(df: DataFrame, idCol: String, nRaters: Int = 3,
      nClasses: Int = 3, shiftedConfusion: Boolean = false): DataFrame = {
    val id = col(idCol).cast("string")
    val trueCls = Dedup.baseHash60(concat(lit("cls:"), id)) % nClasses
    // (true+r) mod K degenerates to a no-op when r ≡ 0 (mod K);
    // shiftedConfusion uses 1 + (r mod K−1) so every rater's planted
    // confusion is a real off-diagonal move — required when the operator
    // under test (Dawid–Skene) must RECOVER per-rater confusion.
    val shift =
      if (shiftedConfusion) lit(1) + col("rater") % (nClasses - 1)
      else col("rater")
    df.select(col(idCol).as("item_id"),
        explode(array((1 to nRaters).map(r => lit(r)): _*)).as("rater"),
        trueCls.as("__t"))
      .withColumn("label",
        when(Dedup.baseHash60(concat(lit("rater"), col("rater").cast("string"),
          lit(":"), col("item_id").cast("string"))) % 100 <
          lit(100) - col("rater") * 10, col("__t"))
          .otherwise((col("__t") + shift) % nClasses))
      .drop("__t")
  }

  /**
   * Inter-annotator agreement: one row per rater pair with Cohen's kappa
   * (observed agreement po vs chance agreement pe from the two raters'
   * marginals), plus a final ("all","all") row carrying Fleiss' kappa over
   * the full rater panel. Requires a complete design (every item labeled by
   * every rater) and enforces it — an incomplete panel fails loudly instead
   * of silently skewing pe.
   *
   * po/pe are exact count ratios; kappa is computed from the 6dp-rounded
   * po/pe so an independent engine reproduces the hash exactly.
   */
  def agreement(labels: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val l = labels.select(col(itemCol).as("__it"),
      col(raterCol).cast("string").as("__r"), col(labelCol).as("__l"))

    // one pass: item count, rater count, completeness check
    val ik = l.groupBy($"__it", $"__l").agg(count(lit(1)).as("c"))
    val perItem = ik.groupBy($"__it").agg(sum($"c").as("tot"),
      sum($"c" * $"c").as("sq"))
    val head = perItem.agg(count(lit(1)), min($"tot"), max($"tot")).head()
    val nItems = head.getLong(0)
    val rCount = head.getLong(1)
    require(nItems > 0, "agreement: empty label table")
    require(rCount == head.getLong(2) && rCount >= 2,
      s"agreement: incomplete design — items carry between ${head.getLong(1)} " +
        s"and ${head.getLong(2)} labels; every item must have the same >=2 raters")

    def kappa6(po: Column, pe: Column): Column = {
      val po6 = round(po, 6); val pe6 = round(pe, 6)
      round((po6 - pe6) / (lit(1.0) - pe6), 6)
    }

    // pairwise Cohen
    val pairs = l.as("a").join(l.as("b"),
      $"a.__it" === $"b.__it" && $"a.__r" < $"b.__r")
    val po = pairs.groupBy($"a.__r".as("ra"), $"b.__r".as("rb"))
      .agg(avg(when($"a.__l" === $"b.__l", 1.0).otherwise(0.0)).as("po"))
    val marg = l.groupBy($"__r", $"__l")
      .agg((count(lit(1)) / nItems.toDouble).as("p"))
    val pe = marg.as("a").join(marg.as("b"),
        $"a.__l" === $"b.__l" && $"a.__r" < $"b.__r")
      .groupBy($"a.__r".as("ra"), $"b.__r".as("rb"))
      .agg(sum($"a.p" * $"b.p").as("pe"))
    val cohen = po.join(pe, Seq("ra", "rb"))
      .select($"ra".as("rater_a"), $"rb".as("rater_b"),
        round($"po", 6).as("po"), round($"pe", 6).as("pe"),
        kappa6($"po", $"pe").as("kappa"))

    // Fleiss over the panel
    val r = rCount.toDouble
    val pbar = perItem
      .agg(avg(($"sq" - r) / (r * (r - 1.0))).as("pbar")).head().getDouble(0)
    val fpe = ik.groupBy($"__l").agg((sum($"c") / (r * nItems)).as("pk"))
      .agg(sum($"pk" * $"pk")).head().getDouble(0)
    val fleiss = spark.range(1).select(lit("all").as("rater_a"),
      lit("all").as("rater_b"), round(lit(pbar), 6).as("po"),
      round(lit(fpe), 6).as("pe"), kappa6(lit(pbar), lit(fpe)).as("kappa"))

    cohen.unionByName(fleiss).orderBy($"rater_a", $"rater_b")
  }

  /**
   * Krippendorff's alpha (nominal) — chance-corrected agreement that,
   * unlike Cohen/Fleiss, accepts MISSING labels: units rated by fewer
   * raters still contribute through the coincidence matrix, and units
   * with fewer than 2 labels are excluded as unpairable. Observed
   * disagreement D_o = 1 − Σ_c o_cc/n with the diagonal coincidences
   * o_cc = Σ_u n_uc(n_uc−1)/(m_u−1); expected D_e = 1 − Σ_c
   * n_c(n_c−1)/(n(n−1)); alpha = 1 − D_o/D_e from the 6dp-rounded
   * D_o/D_e. One row: (n_units, n_pairable, d_o, d_e, alpha).
   *
   * Two unit-keyed hash aggregates and class-sized reductions — no
   * pair join at all (the u-summations collapse the rater pairs
   * algebraically), so the label table may be corpus-sized.
   */
  def krippendorffAlpha(labels: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val nu = labels.select(col(itemCol).as("__it"), col(labelCol).as("__l"))
      .groupBy($"__it", $"__l").agg(count(lit(1)).as("nuc"))
    val mu = nu.groupBy($"__it").agg(sum($"nuc").as("m"))
    val pair = nu.join(mu, "__it").filter($"m" >= 2)
    val head = pair
      .agg(sum($"nuc" * ($"nuc" - 1.0) / ($"m" - 1.0)).as("odiag"),
        sum($"nuc").as("n")).head()
    val nUnits = mu.count()
    val nPairable = mu.filter($"m" >= 2).count()
    require(nPairable > 0, "krippendorffAlpha: no unit has >= 2 labels")
    val odiag = head.getDouble(0)
    val n = head.getLong(1)
    val sumNc = pair.groupBy($"__l").agg(sum($"nuc").as("n_c"))
      .agg(sum($"n_c" * ($"n_c" - 1.0))).head().getDouble(0)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dO = r6(1.0 - odiag / n)
    val dE = r6(1.0 - sumNc / (n.toDouble * (n - 1.0)))
    // D_e = 0 (all pairable labels in one class) leaves alpha undefined —
    // Krippendorff's convention; surface null rather than divide by zero
    val alpha = if (dE == 0.0) null
      else java.lang.Double.valueOf(r6(1.0 - dO / dE))
    spark.range(1).select(lit(nUnits).as("n_units"),
      lit(nPairable).as("n_pairable"), lit(dO).as("d_o"), lit(dE).as("d_e"),
      lit(alpha).cast("double").as("alpha"))
  }

  /**
   * The Dawid–Skene (1979) EM chain over a (item, rater, label) frame:
   * soft class posteriors μ_ik initialized from vote fractions, then per
   * round an M-step (class priors π_k and per-rater row-normalized
   * confusion θ_r[k,l] as μ-weighted count ratios) and an E-step
   * (μ_ik ∝ π_k·Π_r θ_r[k, y_ri], renormalized). Every handoff is
   * anchored at 10dp, and BOTH reductions that are not plain
   * commutative sums — the rater product and the per-item normalizer —
   * fold in a pinned order (rater asc / class asc), so an independent
   * engine replays the trajectory bit-for-bit via ordered list folds.
   *
   * Scale posture: μ is item-sized and every E/M pass is an item-keyed
   * join plus hash aggregates; θ/π are model-sized and broadcast. μ is
   * localCheckpoint'ed per round so lineage stays flat at higher iters.
   * Returns (theta, pi, mu) as frames on internal column names.
   */
  private[graft] def dsChain(labels: DataFrame, itemCol: String,
      raterCol: String, labelCol: String,
      iters: Int): (DataFrame, DataFrame, DataFrame) = {
    require(iters >= 1, s"dawidSkene: iters must be >= 1, got $iters")
    val spark = labels.sparkSession
    import spark.implicits._
    val l = labels.select(col(itemCol).as("__it"),
        col(raterCol).cast("int").as("__r"), col(labelCol).cast("int").as("__l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = l.agg(countDistinct($"__it"), countDistinct($"__r")).head()
    val nItems = head.getLong(0)
    val nRaters = head.getLong(1)
    require(nItems > 0, "dawidSkene: empty label table")

    val kGrid = l.select($"__l".as("__k")).distinct()
    val grid = l.select($"__r").distinct()
      .crossJoin(kGrid).crossJoin(kGrid.select($"__k".as("__o")))

    var mu = l.groupBy($"__it", $"__l".as("__k"))
      .agg(round(count(lit(1)) / nRaters.toDouble, 10).as("__mu"))
    var theta: DataFrame = null
    var pi: DataFrame = null
    for (_ <- 1 to iters) {
      val j = l.join(mu, "__it")
      val num = j.groupBy($"__r", $"__k", $"__l".as("__o"))
        .agg(sum($"__mu").as("__ns"))
      val den = j.groupBy($"__r", $"__k").agg(sum($"__mu").as("__ds"))
      theta = grid.join(den, Seq("__r", "__k"))
        .join(num, Seq("__r", "__k", "__o"), "left")
        .select($"__r", $"__k", $"__o",
          round(coalesce($"__ns", lit(0.0)) / $"__ds", 10).as("__th"))
      pi = mu.groupBy($"__k")
        .agg(round(sum($"__mu") / nItems, 10).as("__pi"))
      val e = l.join(broadcast(theta.withColumnRenamed("__o", "__l")),
          Seq("__r", "__l"))
        .groupBy($"__it", $"__k")
        .agg(aggregate(array_sort(collect_list(struct($"__r", $"__th"))),
          lit(1.0), (acc, x) => acc * x.getField("__th")).as("__prod"))
      val a = e.join(broadcast(pi), "__k")
        .select($"__it", $"__k", ($"__pi" * $"__prod").as("__a"))
      val dn = a.groupBy($"__it")
        .agg(aggregate(array_sort(collect_list(struct($"__k", $"__a"))),
          lit(0.0), (acc, x) => acc + x.getField("__a")).as("__d"))
      mu = a.join(dn, "__it")
        .select($"__it", $"__k", round($"__a" / $"__d", 10).as("__mu"))
        .ckptSer()
    }
    l.unpersist()
    (theta, pi, mu)
  }

  /**
   * Dawid–Skene model output: the fitted per-rater confusion matrices
   * (rater, true_class, observed, theta 6dp) with the class priors
   * appended as rater-0 rows (observed = −1, theta = π_k). The
   * label-quality readout for a crowd/ensemble annotation pipeline —
   * which raters are reliable, and how each one errs.
   */
  def dawidSkene(labels: DataFrame, itemCol: String, raterCol: String,
      labelCol: String, iters: Int = 2): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val (theta, pi, _) = dsChain(labels, itemCol, raterCol, labelCol, iters)
    theta.select($"__r".as("rater"), $"__k".as("true_class"),
        $"__o".as("observed"), round($"__th", 6).as("theta"))
      .unionByName(pi.select(lit(0).as("rater"), $"__k".as("true_class"),
        lit(-1).as("observed"), round($"__pi", 6).as("theta")))
      .orderBy($"rater", $"true_class", $"observed")
  }

  /**
   * Dawid–Skene aggregated labels: per item the MAP class under the
   * final posterior (ties to the smallest class id via the max-struct
   * device — no window) and its 6dp posterior mass. The consensus
   * labels a training set would actually ingest.
   */
  def dawidSkenePosteriors(labels: DataFrame, itemCol: String,
      raterCol: String, labelCol: String, iters: Int = 2): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val (_, _, mu) = dsChain(labels, itemCol, raterCol, labelCol, iters)
    mu.groupBy($"__it")
      .agg(max(struct($"__mu".as("m"), (-$"__k").as("negk"))).as("__b"))
      .select($"__it".as(itemCol), (-$"__b.negk").cast("int").as("map_label"),
        round($"__b.m", 6).as("posterior"))
      .orderBy(col(itemCol))
  }
}
