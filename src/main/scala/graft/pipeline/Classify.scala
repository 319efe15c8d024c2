package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Model-based document scoring trained inside the engine — the
 * fastText-style quality/language classifier every big pretraining corpus
 * runs, reduced to its count arithmetic: a binary multinomial Naive Bayes
 * whose "model" is a token→log-odds DataFrame. Train and score are one
 * plan; there is no driver-side model object, no UDF, and every number is
 * replayable from counts, so a SQL oracle can audit the whole classifier.
 */
object Classify {

  /**
   * Binary multinomial NB with add-α smoothing, trained on `labelCol`
   * (cast to boolean) and applied to every document in the same pass.
   *
   * Per token t: w_t = ln P(t|pos) − ln P(t|neg) with
   * P(t|c) = (c_t,c + α)/(n_c + αV); per document:
   * score = ln(docs_pos/docs_neg) + Σ_occurrences w_t (6dp),
   * `predicted` = score > 0. Zero-token documents score the prior alone.
   * Both classes must be non-empty (the prior's log is undefined
   * otherwise — a caller-side contract, as with any classifier).
   *
   * Scale: the token-stats table is vocabulary-bounded and the globals are
   * one row, so scoring is a term-keyed join plus two broadcasts; training
   * is two hash aggregates. The same shape as `LanguageModel.bigramLmScore`
   * — corpus-sized work only in the event explode and the final doc agg.
   */
  /**
   * Fixed hashed-feature bucket for a token: the value of the first five
   * hex chars of md5(token) mod `numBuckets`. Five chars (< 2^20) so the
   * parse never overflows, md5 so a SQL oracle replays the assignment
   * digit-for-digit on any engine.
   */
  def tokenBucket(tok: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column =
    conv(substring(md5(tok), 1, 5), 16, 10).cast("long") % numBuckets

  /**
   * Logistic regression over hashed token features — the other half of the
   * fastText-classifier pair next to [[nbTokenClassifier]]: where NB is
   * closed-form counts, this is the trained-by-gradient-descent shape, with
   * the hashing trick standing in for a vocabulary (`numBuckets` weights,
   * no token dictionary — the standard trick when the vocabulary at corpus
   * scale is unbounded).
   *
   * Features: x_{d,b} = count of doc d's tokens hashing to bucket b — raw
   * bag-of-words counts, as in any linear text classifier. (NOT
   * length-normalized: fractions put the class gap between two documents
   * at ~1/doclen, which needs weights ~doclen/trust-region — dozens of
   * clamped steps away; unit-scale counts put the learnable gap at ~1 and
   * the optimum within a few steps. The per-coordinate curvature absorbs
   * the scale difference between hot and rare buckets either way.)
   * Training is full-batch DIAGONAL-NEWTON descent with shotgun
   * under-relaxation. Plain GD is hopeless here (the bias gradient is
   * ~10³× the per-bucket gradients — no single learning rate serves
   * both), and UNDAMPED per-coordinate Newton diverges for the dual
   * reason: every document activates ~m buckets at once, each coordinate
   * independently corrects the same shared residual, and the collective
   * step lands ~m× too far (the classic parallel-coordinate-descent
   * hazard). The stable step is the Newton step scaled by 1/m with
   * m = max_d(active buckets of d) — computed from the data, so the
   * damping self-tunes to the corpus. Per step, with
   * p_d = sigmoid(bias + Σ_b w_b x_{d,b}):
   *   g_b = Σ_d (p_d − y_d) x_{d,b},   h_b = Σ_d p_d (1−p_d) x_{d,b}²,
   *   w_b ← w_b − (η/m) round(clamp(g_b / (h_b + 1e-6), ±2), 6)
   * and for the bias the same with x ≡ 1 but WITHOUT the 1/m (it is one
   * coordinate correcting a residual no other coordinate owns whole; in
   * practice it must converge first or the weights chase a moving
   * intercept). The clamp is the usual Newton trust region: once a
   * document saturates, its curvature vanishes and a raw quotient can
   * jump by 10⁶ in one step. The per-coordinate STEP is
   * rounded to 6dp (killing summation-order FP noise, so the trajectory
   * is engine-replayable and a SQL oracle retrains the identical model);
   * the weight update itself is NOT rounded — IEEE arithmetic on
   * identical rounded steps is already deterministic, and rounding would
   * land weights exactly on rounding boundaries (η × 1e-6-grid steps),
   * where engines disagree.
   *
   * Scale: the feature table is built once (one explode + two hash aggs)
   * and cached; each GD step is ONE distributed pass producing a
   * model-sized (`numBuckets`-row) gradient that the driver folds into the
   * weight vector — the same driver↔model round-trip as the LDA trainer,
   * never a driver pass over documents. Weights enter each pass as plan
   * literals (broadcast-by-value), so scoring is corpus-scan + hash-agg
   * with no join at all.
   */
  def lrHashClassifier(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, numBuckets: Int = 64, iterations: Int = 3,
      learnRate: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"), col(labelCol).cast("boolean").cast("int").as("y"))
    val ev = base.select($"doc_id", $"y",
      explode(TextAnalysis.wsTokens(lower($"text"))).as("tok"))
    // per-(doc,bucket) normalized tf; the label rides through (same
    // reasoning as nbTokenClassifier: re-joining it back would shuffle the
    // corpus-sized table a second time)
    val feats = ev
      .select($"doc_id", $"y", tokenBucket($"tok", numBuckets).as("b"))
      .groupBy($"doc_id", $"y", $"b").agg(count(lit(1)).cast("double").as("x"))
      .ckptSer() // reused every GD step: compute the explode once (eager + SER, r14)
    // shotgun damping: the widest doc bounds how far parallel coordinate
    // steps may collectively overshoot (model-sized driver scalar)
    val m = feats.groupBy($"doc_id").count()
      .agg(max($"count")).head.getLong(0).toDouble

    var w = Array.fill(numBuckets)(0.0)
    var bias = 0.0
    def scoreCol(wts: Array[Double], b0: Double) = {
      // the per-doc Σ w_b·x_b is folded in BUCKET ORDER (collect → sort →
      // sequential fold), not via sum(): identical weights then give
      // bit-identical scores on any engine, so the 6dp score rounding can
      // never straddle — scores live on a fine lattice (steps are rounded
      // multiples of η/m) that passes close to rounding boundaries, where
      // an unordered sum's ±1e-14 would otherwise flip the last digit
      val perDoc = feats.groupBy($"doc_id", $"y")
        .agg(aggregate(
          array_sort(collect_list(struct($"b",
            ($"x" * element_at(typedLit(wts.toSeq), ($"b" + 1).cast("int"))).as("wx")))),
          lit(0.0), (acc, e) => acc + e.getField("wx")).as("sw"))
      // zero-token docs never reach feats; restore them with the bias-only
      // score via a left join from the doc universe
      base.select($"doc_id", $"y").join(perDoc.drop("y"), Seq("doc_id"), "left")
        .select($"doc_id", $"y", (lit(b0) + coalesce($"sw", lit(0.0))).as("s"))
    }
    for (_ <- 0 until iterations) {
      // doc-level error + curvature computed once per step (localCheckpoint:
      // the two aggregates below must not re-run the scoring pass)
      val p = scoreCol(w, bias)
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-$"s")))
        .select($"doc_id", ($"p" - $"y").as("err"), ($"p" * (lit(1.0) - $"p")).as("ph"))
        .ckptSer()
      // per-bucket Newton step: one join + hash agg → numBuckets rows
      def clamped(c: org.apache.spark.sql.Column) =
        round(least(greatest(c, lit(-2.0)), lit(2.0)), 6)
      val steps = p.join(feats.select($"doc_id", $"b", $"x"), "doc_id")
        .groupBy($"b").agg(clamped(
          sum($"err" * $"x") / (sum($"ph" * $"x" * $"x") + lit(1e-6))).as("st"))
        .collect()
      // bias step: every doc contributes (zero-token docs included, x ≡ 1)
      val biasStep = p.agg(clamped(sum($"err") / (sum($"ph") + lit(1e-6))))
        .head.getDouble(0)
      val stByB = steps.map(r => r.getAs[Long]("b").toInt -> r.getAs[Double]("st")).toMap
      // plain double update, NO rounding: the steps are already rounded
      // (identical across engines), and IEEE arithmetic on identical
      // inputs is deterministic. Rounding here would be actively harmful —
      // η × 1e-6-grid steps put weights on rounding boundaries, where
      // engines' round() implementations legitimately disagree.
      w = w.zipWithIndex.map { case (wv, i) =>
        wv - learnRate / m * stByB.getOrElse(i, 0.0)
      }
      bias = bias - learnRate * biasStep
      // both gradient actions completed — release this step's blocks, or
      // `iterations` corpus-sized checkpoints pile up on the executors
      p.unpersist(blocking = false)
    }
    val out = scoreCol(w, bias)
      .select($"doc_id", round($"s", 6).as("score"), ($"s" > 0).as("predicted"))
      .ckptSer() // materialize before releasing feats below
    feats.unpersist(blocking = false)
    out
  }

  /**
   * ROC AUC of a scored frame against a boolean label — model evaluation
   * inside the engine, as count arithmetic: group by distinct score, walk
   * the score histogram once, and credit each positive group with the
   * negatives strictly below it plus half its own ties (the Mann–Whitney
   * average-rank formulation). One row out: (auc, n_pos, n_neg).
   *
   * Scale: the cumulative-negatives prefix sum runs over the
   * DISTINCT-score histogram, not the rows — and via the
   * partition-offset idiom ([[Profiling.orderedPrefix]]), so even a
   * fully continuous score column (grid = n rows) never serializes
   * through one window task. All intermediate arithmetic is integer
   * counts in doubles, so the partition-association rewrite is exact
   * and engines agree before the final rounding.
   */
  def rankAuc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val sc = scored.select(col(scoreCol).as("score"),
      col(labelCol).cast("boolean").cast("int").as("y"))
    val g = sc.groupBy($"score").agg(
      sum($"y").cast("double").as("np"),
      (count(lit(1)) - sum($"y")).cast("double").as("nn"))
    val (pre, cache) = graft.pipeline.Profiling.orderedPrefix(
      g, Seq($"score".asc), $"nn")
    val c = pre.withColumn("cumneg", $"__below")
    val tot = sc.agg(sum($"y").cast("double").as("p"),
      (count(lit(1)) - sum($"y")).cast("double").as("n"))
    val res = c.agg(sum(($"cumneg" + $"nn" / 2.0) * $"np").as("num"))
      .crossJoin(broadcast(tot))
      .select(
        // single-class input has no rankable pairs: AUC is undefined —
        // surface that as NULL, not a silent NaN
        when($"p" > 0 && $"n" > 0, round($"num" / ($"p" * $"n"), 6)).as("auc"),
        $"p".cast("long").as("n_pos"), $"n".cast("long").as("n_neg"))
    cache.unpersist() // determinism-safe: recompute reuses the exchange
    res
  }

  /**
   * Threshold metrics for a scored frame: one row of confusion counts
   * plus precision/recall/F1/accuracy at `threshold` (default 0: the
   * sign decision [[lrHashClassifier]] and [[nbTokenClassifier]] emit).
   * Pure count arithmetic; undefined ratios (empty denominators) are
   * NULL, not NaN. One hash aggregate — trivially 100 TB-safe.
   */
  def confusionStats(scored: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double = 0.0): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val b = scored.select((col(scoreCol) > threshold).as("ph"),
      col(labelCol).cast("boolean").as("y"))
    val agg = b.agg(
      sum(when($"ph" && $"y", 1L).otherwise(0L)).as("tp"),
      sum(when($"ph" && !$"y", 1L).otherwise(0L)).as("fp"),
      sum(when(!$"ph" && $"y", 1L).otherwise(0L)).as("fn"),
      sum(when(!$"ph" && !$"y", 1L).otherwise(0L)).as("tn"))
    def ratio(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      when(d > 0, round(n.cast("double") / d, 6))
    agg.select($"tp", $"fp", $"fn", $"tn",
      ratio($"tp", $"tp" + $"fp").as("precision"),
      ratio($"tp", $"tp" + $"fn").as("recall"),
      ratio(lit(2) * $"tp", lit(2) * $"tp" + $"fp" + $"fn").as("f1"),
      ratio($"tp" + $"tn", $"tp" + $"fp" + $"fn" + $"tn").as("accuracy"))
  }

  /**
   * Calibration curve (reliability diagram): scores pass through the
   * sigmoid into probabilities, probabilities bin into `bins` equal-width
   * buckets, and each bucket reports its size, mean predicted
   * probability, and observed positive rate — the table you plot to see
   * whether 0.8 means 80%. Bin edges are exact (floor of p×bins, clamped
   * so p=1 lands in the last bin); means rounded 6dp.
   */
  def calibrationCurve(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val b = scored.select(
      (lit(1.0) / (lit(1.0) + exp(-col(scoreCol)))).as("p"),
      col(labelCol).cast("boolean").cast("int").as("y"))
    b.withColumn("bin",
        least(floor($"p" * bins).cast("int"), lit(bins - 1)))
      .groupBy($"bin").agg(
        count(lit(1)).as("n"),
        round(avg($"p"), 6).as("mean_p"),
        round(avg($"y".cast("double")), 6).as("frac_pos"))
  }

  /**
   * Murphy (1973) decomposition of the Brier score over probability
   * bins: reliability Σ(n_b/N)(p̄_b−ȳ_b)² (calibration error, small is
   * good), resolution Σ(n_b/N)(ȳ_b−ȳ)² (discrimination, big is good),
   * uncertainty ȳ(1−ȳ) — the why behind a Brier number, next to
   * [[calibrationCurve]]'s plot and [[rankAuc]]'s ranking view. The
   * Brier score itself is EXACT: Σ(p₆−10⁶y)² over 6dp-anchored
   * probabilities as integer decimals, one division at the end; the
   * per-bin terms are 10dp-anchored and decimal-summed. One row:
   * (n, brier, reliability, resolution, uncertainty — 6dp). One binned
   * aggregate plus one global aggregate; nothing driver-sized but the
   * bin table.
   */
  def brierDecomposition(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val spark = scored.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val base = scored.select(
      (lit(1.0) / (lit(1.0) + exp(-col(scoreCol)))).as("p"),
      col(labelCol).cast("boolean").cast("long").as("y"))
      .withColumn("p6", round($"p" * 1e6).cast("long"))
      .withColumn("bin", least(floor($"p" * bins).cast("int"), lit(bins - 1)))
    val g = base.agg(count(lit(1)).as("n"), sum($"y").as("sy"),
      sum((($"p6" - $"y" * 1000000L).cast(dec) *
        ($"p6" - $"y" * 1000000L).cast(dec))).as("bsum")).head()
    val n = g.getLong(0)
    // guard BEFORE touching the sums: on empty input they are null, so
    // getLong/getDecimal would die with an opaque null-value error and
    // the means would divide by zero — fail with the actual problem
    require(n > 0, "brierDecomposition: empty input — nothing to decompose")
    val sy = g.getLong(1)
    val brier = BigDecimal(g.getDecimal(2)).toDouble / (n.toDouble * 1e12)
    val ybar = sy.toDouble / n
    val binAgg = base.groupBy($"bin")
      .agg(count(lit(1)).as("nb"), sum($"p6").as("sp6"), sum($"y").as("syb"))
      .withColumn("pb", $"sp6".cast("double") / ($"nb" * 1e6))
      .withColumn("yb", $"syb".cast("double") / $"nb")
      .withColumn("relt", round(
        $"nb" * ($"pb" - $"yb") * ($"pb" - $"yb") / n, 10))
      .withColumn("rest", round(
        $"nb" * ($"yb" - ybar) * ($"yb" - ybar) / n, 10))
      .agg(sum(round($"relt" * 1e10).cast(dec)).as("rel10"),
        sum(round($"rest" * 1e10).cast(dec)).as("res10")).head()
    val rel = BigDecimal(binAgg.getDecimal(0)).toDouble / 1e10
    val res = BigDecimal(binAgg.getDecimal(1)).toDouble / 1e10
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.createDataFrame(Seq((n, r6(brier), r6(rel), r6(res),
        r6(ybar * (1.0 - ybar)))))
      .toDF("n", "brier", "reliability", "resolution", "uncertainty")
  }

  /**
   * Nearest-neighbor covariate matching WITH replacement — the
   * causal-inference prep that turns an observational table into
   * treated/control pairs: within each exact-match stratum, every
   * treated unit takes the control whose balancing score is nearest
   * (|Δ| ≤ caliper; equal-distance ties go to the lower-score side;
   * among equal-score controls the backward side keeps the GREATEST
   * control id and the forward side the smallest — this is
   * [[graft.operators.TemporalJoins.asofJoinNearest]]'s deterministic
   * rule, reused verbatim with the score as the "time" axis, and the
   * rule its oracle replays). Matching WITH replacement keeps every treated decision
   * independent, so the whole match is ONE sorted-union window pass per
   * stratum — no sequential greedy state, no pair matrix. Scores are
   * 6dp-anchored to an integer axis so distances and the caliper compare
   * exactly. Unmatched treated units (nothing within the caliper) drop.
   *
   * Returns (strata…, treated_id, control_id, treated_score,
   * control_score, score_diff, y_treated, y_control) — feed the ATT
   * estimate avg(y_treated − y_control) or a bias check downstream.
   */
  def covariateMatch(units: DataFrame, idCol: String, treatCol: String,
      strataCols: Seq[String], scoreCol: String, outcomeCol: String,
      caliper: Double): DataFrame = {
    require(strataCols.nonEmpty,
      "covariateMatch: need at least one exact-match stratum column " +
        "(the per-stratum window is what keeps the match distributed)")
    require(caliper > 0, "caliper must be > 0")
    val spark = units.sparkSession
    import spark.implicits._
    val s6 = round(round(col(scoreCol).cast("double"), 6) * 1e6).cast("long")
    val treated = units.filter(col(treatCol).cast("boolean")).select(
      strataCols.map(col) ++ Seq(col(idCol).cast("long").as("treated_id"),
        s6.as("score6"), col(outcomeCol).cast("double").as("y_treated")): _*)
    val controls = units.filter(!col(treatCol).cast("boolean")).select(
      strataCols.map(col) ++ Seq(col(idCol).cast("long").as("control_id"),
        s6.as("cscore6"), col(outcomeCol).cast("double").as("y_control")): _*)
    graft.operators.TemporalJoins.asofJoinNearest(treated, controls,
        strataCols, leftTsCol = "score6", rightTsCol = "cscore6",
        rightValueCols = Seq("control_id", "cscore6", "y_control"),
        rightOrder = Some("control_id"),
        toleranceMs = Some(math.round(caliper * 1e6)))
      .filter($"asof_dir".isNotNull)
      .select(strataCols.map(col) ++ Seq($"treated_id",
        $"right_control_id".as("control_id"),
        round($"score6" / 1e6, 6).as("treated_score"),
        round($"right_cscore6" / 1e6, 6).as("control_score"),
        round(abs($"score6" - $"right_cscore6") / 1e6, 6).as("score_diff"),
        $"y_treated", $"right_y_control".as("y_control")): _*)
  }

  def nbTokenClassifier(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, alpha: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"), col(labelCol).cast("boolean").as("pos"))
    // the label rides THROUGH the explode — re-joining the corpus-sized
    // event table back onto base just to recover it would be a whole
    // extra shuffle of the largest table in the plan
    val ev = base.select($"doc_id", $"pos",
      explode(TextAnalysis.wsTokens(lower($"text"))).as("tok"))
    val tc = ev.groupBy($"tok").agg(
      sum(when($"pos", 1L).otherwise(0L)).as("cp"),
      sum(when(!$"pos", 1L).otherwise(0L)).as("cn"))
    val g = tc.select(sum($"cp").as("np"), sum($"cn").as("nn"), count(lit(1)).as("v"))
    val prior = base.select(
      sum(when($"pos", 1L).otherwise(0L)).as("dpos"),
      sum(when(!$"pos", 1L).otherwise(0L)).as("dneg"))
    val weights = tc.crossJoin(broadcast(g)).select($"tok",
      (log(($"cp" + lit(alpha)) / ($"np" + lit(alpha) * $"v")) -
        log(($"cn" + lit(alpha)) / ($"nn" + lit(alpha) * $"v"))).as("w"))
    val sums = ev.join(weights, "tok").groupBy($"doc_id").agg(sum($"w").as("sw"))
    val score = log($"dpos".cast("double") / $"dneg") + coalesce($"sw", lit(0.0))
    base.select($"doc_id").join(sums, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .select($"doc_id", round(score, 6).as("score"), (score > 0).as("predicted"))
  }

  /**
   * Per-class multiclass evaluation (one-vs-rest precision / recall /
   * F1 per label, plus support) from any (predicted, actual) frame —
   * the report card for `knnClassify` / `nbTokenClassifier` beyond
   * binary `confusionStats`. Classes present in either column get a
   * row; 6dp ratios with the 0/0 → 0 convention. One grouped count +
   * two tiny aggregates — confusion-matrix-sized, never data-sized.
   */
  def multiclassEval(pred: DataFrame, predCol: String, actualCol: String): DataFrame = {
    val spark = pred.sparkSession
    import spark.implicits._
    val base = pred.select(col(predCol).cast("long").as("p"),
      col(actualCol).cast("long").as("a"))
    val tp = base.filter($"p" === $"a").groupBy($"a".as("label"))
      .agg(count(lit(1)).as("tp"))
    val predN = base.groupBy($"p".as("label")).agg(count(lit(1)).as("n_pred"))
    val actN = base.groupBy($"a".as("label")).agg(count(lit(1)).as("support"))
    def ratio(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      round(when(d > 0, n.cast("double") / d).otherwise(0.0), 6)
    actN.join(predN, Seq("label"), "full")
      .join(tp, Seq("label"), "left")
      .select($"label",
        coalesce($"support", lit(0L)).as("support"),
        coalesce($"n_pred", lit(0L)).as("n_pred"),
        coalesce($"tp", lit(0L)).as("tp"))
      .withColumn("precision", ratio($"tp", $"n_pred"))
      .withColumn("recall", ratio($"tp", $"support"))
      .withColumn("f1", round(when($"precision" + $"recall" > 0,
        lit(2.0) * $"precision" * $"recall" / ($"precision" + $"recall"))
        .otherwise(0.0), 6))
  }

  /**
   * Isotonic (monotone) probability calibration of classifier scores —
   * binned PAVA via the exact minimax identity: with score-quantile
   * bins j ≤ i ≤ k and A(j,k) = (Σ labels in bins j..k)/(Σ counts),
   *
   *   calibrated(i) = max_{j≤i} min_{k≥i} A(j,k)
   *
   * which equals the pool-adjacent-violators fit and is PURE relational
   * algebra: one quantile binning pass over the data, then two window
   * sweeps over the nBins² grid (grid-sized — never data-sized). The
   * equal-count binning ranks via the Tungsten range-sort + partition
   * offset idiom (`ParseCorpus.rankByIndex`) — a DISTRIBUTED sort, not
   * a single-partition `row_number` window, so the binning pass scales
   * with executors instead of serializing the scored rows. All
   * A(j,k) are integer/integer ratios, so both engines compute
   * IDENTICAL doubles and the minimax picks identically; the final
   * round carries the +1e-9 exact-boundary dodge. Output is one row
   * per bin: (bin, n, mean_score, mean_label, calibrated), calibrated
   * monotone non-decreasing by construction.
   */
  def isotonicCalibrate(scored: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, nBins: Int = 20): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val spark = scored.sparkSession
    import spark.implicits._
    val base = scored.select(col(idCol).as("__id"),
      col(scoreCol).cast("double").as("__s"),
      col(labelCol).cast("long").as("__y"))
    val n = base.count()
    val (binned, sortCache) = isotonicBinned(base, nBins, n)
    val bins = binned.groupBy($"bin")
      .agg(count(lit(1)).as("w"), sum($"__y").as("ysum"),
        round(avg($"__s"), 6).as("mean_score"))
      .ckptSer()
    sortCache.unpersist()
    // cumulative sums over the bin grid -> A(j,k) for every j<=k
    val cum = bins.select($"bin", $"w", $"ysum")
      .withColumn("cw", sum($"w").over(
        org.apache.spark.sql.expressions.Window.orderBy($"bin")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("cy", sum($"ysum").over(
        org.apache.spark.sql.expressions.Window.orderBy($"bin")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val j = cum.select($"bin".as("j"), ($"cw" - $"w").as("cwj"), ($"cy" - $"ysum").as("cyj"))
    val k = cum.select($"bin".as("k"), $"cw".as("cwk"), $"cy".as("cyk"))
    val a = j.crossJoin(k).filter($"j" <= $"k")
      .withColumn("a", ($"cyk" - $"cyj").cast("double") / ($"cwk" - $"cwj"))
    // B(j,i) = min over k>=i of A(j,k): running min from the right per j
    val grid = a.join(
        bins.select($"bin".as("i")), $"j" <= $"i" && $"i" <= $"k")
      .groupBy($"j", $"i").agg(min($"a").as("b"))
    val fit = grid.groupBy($"i").agg(max($"b").as("f"))
    bins.join(fit, $"bin" === $"i")
      .select($"bin", $"w".as("n"), $"mean_score",
        round($"ysum".cast("double") / $"w" + lit(1e-9), 6).as("mean_label"),
        round($"f" + lit(1e-9), 6).as("calibrated"))
  }

  /** Equal-count bin assignment via the distributed range-sort +
    * partition-offset rank (NO global row_number window) — exposed so
    * PlanShapeSpec can pin the plan stays window-free. Returns the
    * binned frame plus the internal sort cache to unpersist. */
  private[graft] def isotonicBinned(base: DataFrame, nBins: Int,
      n: Long): (DataFrame, DataFrame) = {
    import base.sparkSession.implicits._
    val (ranked, sortCache) = graft.corpus.ParseCorpus.rankByIndexWithCache(
      base, Seq($"__s", $"__id"), "__rn")
    (ranked.withColumn("bin", ceil($"__rn" * nBins.toDouble / n).cast("int")),
      sortCache)
  }

  /**
   * k-nearest-neighbor majority-vote classifier over an embedding
   * column: each query's top-k cosine neighbors among the labeled
   * corpus vote; the label with the most votes wins, ties to the
   * SMALLEST label id (deterministic). The training-free baseline
   * classifier every embedding space gets judged by.
   *
   * Built on the exact `Similarity.bruteForceTopK` scorer here (the
   * correctness anchor); at corpus scale swap the neighbor stage for
   * `ivfTopK`/`lshTopK` — the vote is the same label join + one
   * query-keyed aggregate either way, and the argmax is a
   * max-of-struct (votes, best cosine, −label), ONE aggregate, no
   * second shuffle or window pass.
   *
   * Returns (query_id, predicted, votes, n_neighbors).
   */
  def knnClassify(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nn = graft.pipeline.Similarity.bruteForceTopK(corpus, queries, idCol, vecCol, k)
    val labels = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(labelCol).cast("long").as("label"))
    nn.join(labels, "corpus_id")
      .groupBy($"query_id", $"label")
      .agg(count(lit(1)).as("nv"))
      .groupBy($"query_id")
      .agg(max(struct($"nv".as("nv"), (-$"label").as("negl"))).as("__best"),
        sum($"nv").cast("int").as("n_neighbors"))
      .select($"query_id", (-$"__best.negl").as("predicted"),
        $"__best.nv".cast("int").as("votes"), $"n_neighbors")
  }

  /**
   * Split conformal calibration: from a calibration split of
   * nonconformity scores, the threshold with finite-sample (1−α)
   * coverage is the k-th smallest calibration score with
   * k = ⌈(n_cal+1)(1−α)⌉ (Vovk's split-conformal quantile), then the
   * realized coverage is measured on the held-out split. The eval-set
   * gate for "is this model's uncertainty calibrated" — one row:
   * (n_cal, k, threshold, n_test, coverage 6dp).
   *
   * The order statistic is a distributed range-sort + partition-offset
   * rank ([[Profiling.orderedPrefix]]) — no single-task window, no
   * collect of the score column — so the calibration split may be
   * data-sized. k > n_cal (too-small calibration set for the requested
   * α) yields a null threshold and full coverage, the conformal
   * convention for the +∞ quantile.
   */
  def conformalThreshold(df: DataFrame, scoreCol: String, calibCol: String,
      alpha: Double = 0.1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = df.select(col(scoreCol).cast("double").as("__s"),
        col(calibCol).cast("boolean").as("__c"))
      .filter($"__s".isNotNull && $"__c".isNotNull)
    val counts = s.groupBy($"__c").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val nCal = counts.getOrElse(true, 0L)
    val nTest = counts.getOrElse(false, 0L)
    require(nCal > 0, "conformalThreshold: empty calibration split")
    val k = math.ceil((nCal + 1) * (1.0 - alpha)).toLong
    val threshold: Option[Double] =
      if (k > nCal) None
      else {
        val (ranked, cache) =
          Profiling.orderedPrefix(s.filter($"__c"), Seq($"__s".asc), lit(0L))
        val t = ranked.filter($"__i" === k).select($"__s").head().getDouble(0)
        cache.unpersist()
        Some(t)
      }
    val coverage = threshold match {
      case _ if nTest == 0 => None
      case None => Some(1.0)
      case Some(t) => Some(s.filter(!$"__c")
        .agg(avg(when($"__s" <= t, 1.0).otherwise(0.0))).head().getDouble(0))
    }
    spark.range(1).select(lit(nCal).as("n_cal"), lit(k).as("k"),
      lit(threshold.orNull).cast("double").as("threshold"),
      lit(nTest).as("n_test"),
      round(lit(coverage.orNull).cast("double"), 6).as("coverage"))
  }
}
