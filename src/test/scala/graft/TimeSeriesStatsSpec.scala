package graft

import graft.operators.{Sessionize, TimeSeries}
import graft.pipeline.Profiling
import org.apache.spark.sql.functions._

/** Hand-computed pins for the round-6 analytics additions: EWMA fold
  * semantics and key isolation, rolling z-score baseline exclusion,
  * event-pattern regex counting, and correlation-matrix exactness on
  * constructed linear data. */
class TimeSeriesStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("ewma follows the adjust=False recursion and resets per key") {
    val df = Seq(
      (1L, ts(1000L), 10L, 4.0),
      (1L, ts(2000L), 11L, 8.0),
      (1L, ts(3000L), 12L, 8.0),
      (2L, ts(1000L), 20L, 100.0),
      (2L, ts(2000L), 21L, 0.0)).toDF("k", "t", "id", "v")
    val out = TimeSeries.ewma(df, "k", "t", "id", "v", alpha = 0.5)
      .orderBy("k", "t").select($"k", $"ewma").as[(Long, Double)].collect()
    // key 1: 4.0; 0.5*8+0.5*4 = 6.0; 0.5*8+0.5*6 = 7.0
    // key 2 restarts: 100.0; 0.5*0+0.5*100 = 50.0
    assert(out.toSeq == Seq((1L, 4.0), (1L, 6.0), (1L, 7.0),
      (2L, 100.0), (2L, 50.0)))
  }

  test("ewma breaks timestamp ties by the id column") {
    val df = Seq(
      (1L, ts(1000L), 2L, 100.0), // same ts — id orders the fold
      (1L, ts(1000L), 1L, 0.0)).toDF("k", "t", "id", "v")
    val out = TimeSeries.ewma(df, "k", "t", "id", "v", alpha = 0.25)
      .orderBy("id").select($"ewma").as[Double].collect()
    // fold order is id 1 (v=0) then id 2 (v=100): s1=0, s2=25
    assert(out.toSeq == Seq(0.0, 25.0))
  }

  test("rolling z-score excludes the current row and flags the outlier") {
    // 6 calm points then a spike: the spike's baseline is the calm window,
    // so its z is huge; the spike must NOT contaminate its own baseline
    val rows = (1 to 6).map(i => (1L, ts(i * 1000L), i.toLong, 10.0 + (i % 2))) :+
      (1L, ts(7000L), 7L, 1000.0)
    val out = TimeSeries.rollingZscore(rows.toDF("k", "t", "id", "v"),
        "k", "t", "id", "v", lookback = 10, minPoints = 5, threshold = 3.0)
      .orderBy("id").select($"z", $"is_anomaly")
      .as[(Option[Double], Boolean)].collect()
    assert(out.take(5).forall(r => r._1.isEmpty && !r._2),
      "warm-up rows (fewer than minPoints priors) must be unflagged nulls")
    assert(out(6)._1.exists(_ > 100) && out(6)._2, s"spike not flagged: ${out(6)}")
  }

  test("event pattern counts non-overlapping matches in time order") {
    val df = Seq(
      // user 1: v c p v p  → two matches of v[c]*p
      (1L, ts(1000L), 1L, "view"), (1L, ts(2000L), 2L, "click"),
      (1L, ts(3000L), 3L, "purchase"), (1L, ts(4000L), 4L, "view"),
      (1L, ts(5000L), 5L, "purchase"),
      // user 2: p v c c  → purchase precedes the view: no match
      (2L, ts(1000L), 6L, "purchase"), (2L, ts(2000L), 7L, "view"),
      (2L, ts(3000L), 8L, "click"), (2L, ts(4000L), 9L, "click"),
      // user 3: only unmapped types → dropped before the aggregate
      (3L, ts(1000L), 10L, "signup_other")).toDF("k", "t", "id", "typ")
    val out = Sessionize.eventPatternCounts(df, "k", "typ", "t", "id",
        codes = Map("view" -> "v", "click" -> "c", "purchase" -> "p"),
        pattern = "v[c]*p")
      .orderBy("key")
      .select($"key", $"n_matches", $"matched")
      .as[(Long, Int, Boolean)].collect()
    assert(out.toSeq == Seq((1L, 2, true), (2L, 0, false)))
  }

  test("olsByGroup recovers planted slope and intercept exactly") {
    val df = (1 to 40).flatMap { i =>
      Seq(("a", i.toDouble, 2.5 * i + 7.0),  // exact line: slope 2.5, b 7
          ("b", i.toDouble, -3.0 * i + 1.0)) // slope -3, b 1
    }.toDF("g", "x", "y")
    val out = Profiling.olsByGroup(df, "g", "x", "y").orderBy("g")
      .select($"g", $"n", $"slope", $"intercept", $"r2")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.toSeq == Seq(("a", 40L, 2.5, 7.0, 1.0), ("b", 40L, -3.0, 1.0, 1.0)))
  }

  test("lagAutocorr pins alternating series at -1 and keeps sparse keys as nulls") {
    val alt = (1 to 20).map(i => (1L, ts(i * 1000L), i.toLong,
      if (i % 2 == 0) 1.0 else -1.0))
    val sparse = Seq((2L, ts(1000L), 100L, 5.0)) // one obs: zero pairs
    val out = TimeSeries.lagAutocorr((alt ++ sparse).toDF("k", "t", "id", "v"),
        "k", "t", "id", "v", lag = 1)
      .orderBy("k")
      .select($"k", $"n_pairs", $"acf_1")
      .as[(Long, Long, Option[Double])].collect()
    assert(out.toSeq == Seq((1L, 19L, Some(-1.0)), (2L, 0L, None)))
  }

  test("interval overlap join dedups multi-bin pairs and drops malformed rows") {
    import graft.operators.TemporalJoins
    val left = Seq(
      (1L, 10L, 0L, 1000L),   // spans 11 bins at width 100
      (1L, 11L, 500L, 400L),  // malformed: hi < lo -> dropped
      (2L, 12L, 0L, 50L)).toDF("k", "lid", "lo", "hi")
    val right = Seq(
      (1L, 20L, 950L, 2000L), // overlaps lid=10 in many shared bins
      (1L, 21L, 1500L, 1600L), // no overlap
      (2L, 22L, 50L, 60L)).toDF("k", "rid", "lo", "hi")
    // right's lo/hi collide with left's and get auto-prefixed r_ inside;
    // the caller still names them by their ORIGINAL right-side names
    val out = TemporalJoins.intervalOverlapJoin(left, right, Seq("k"),
        "lo", "hi", "lo", "hi", binWidth = 100L)
      .select($"k", $"lid", $"rid").as[(Long, Long, Long)].collect().sorted.toSeq
    // exactly ONE row per overlapping pair despite shared bins; boundary
    // touch (50 == 50) counts — closed bounds
    assert(out == Seq((1L, 10L, 20L), (2L, 12L, 22L)), out.mkString(", "))
  }

  test("weightedMedian picks the first value crossing half the total weight") {
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0), // total 12, half 6 -> 3.0
      ("b", 5.0, 3.0), ("b", 7.0, 1.0),                   // total 4, half 2 -> 5.0
      ("c", 9.0, 2.0), ("c", 4.0, 2.0)                    // total 4, half 2 -> 4.0 (exact boundary)
    ).toDF("k", "v", "w")
    val out = graft.pipeline.Profiling.weightedMedian(df, "k", "v", "w")
      .orderBy("k").as[(String, Double)].collect().toSeq
    assert(out == Seq(("a", 3.0), ("b", 5.0), ("c", 4.0)), out.mkString(", "))
  }

  test("hardNegativesTopK never returns same-label neighbors") {
    import graft.pipeline.Similarity
    // nearest vector to the query shares its label — it must be skipped
    // in favor of the farther different-label one
    val corpus = Seq(
      (1L, Seq(1.0, 0.0), 0L),   // query
      (2L, Seq(0.99, 0.1), 0L),  // nearest but SAME label
      (3L, Seq(0.8, 0.6), 1L),   // different label -> the hard negative
      (4L, Seq(-1.0, 0.0), 1L)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegativesTopK(corpus,
        corpus.filter($"vec_id" === 1L), "vec_id", "embedding", "label", k = 2)
      .orderBy("rnk").select($"corpus_id", $"c_label").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((3L, 1L), (4L, 1L)), out.mkString(", "))
  }

  test("negativeSample is deterministic, k-per-anchor, and never self") {
    import graft.pipeline.TrainingDataset
    val df = (0L until 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = TrainingDataset.negativeSample(df, "doc_id", k = 3)
      .orderBy("anchor_id", "slot")
      .as[(Long, Int, Long)].collect().toSeq
    val b = TrainingDataset.negativeSample(df, "doc_id", k = 3)
      .orderBy("anchor_id", "slot")
      .as[(Long, Int, Long)].collect().toSeq
    assert(a == b, "draws must be deterministic")
    assert(a.size == 150 && a.groupBy(_._1).forall(_._2.size == 3))
    assert(a.forall { case (anchor, _, neg) => anchor != neg }, "self-negative")
  }

  test("chiSquareTest matches a hand-computed 2x2 table, zero cells included") {
    // observed: (x,p)=30, (x,q)=10, (y,p)=10, (y,q)=30 → margins 40/40;
    // e = 20 everywhere → chi2 = 4·(10²/20) = 20
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val out = graft.pipeline.Profiling.chiSquareTest(rows.toDF("a", "b"), "a", "b")
      .as[(Double, Long, Long, Long)].head()
    assert(out == ((20.0, 1L, 80L, 4L)), out)
    // a category pair never observed together still contributes (0−e)²/e
    val sparse = Seq.fill(8)(("x", "p")) ++ Seq.fill(8)(("y", "q"))
    val out2 = graft.pipeline.Profiling.chiSquareTest(sparse.toDF("a", "b"), "a", "b")
      .as[(Double, Long, Long, Long)].head()
    assert(out2._4 == 4L && out2._1 == 16.0, s"perfect association on n=16: $out2")
  }

  test("corrPairs is exact on constructed linear relationships") {
    val df = (1 to 50).map { i =>
      (i.toDouble, 2.0 * i + 3.0, -1.0 * i, (i % 2).toDouble)
    }.toDF("x", "y2x", "negx", "parity")
    val out = Profiling.corrPairs(df, Seq("x", "y2x", "negx"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(("x", "y2x", 1.0), ("x", "negx", -1.0),
      ("y2x", "negx", -1.0)))
    // one aggregate pass: the plan has no join and a single pair of
    // (partial, final) aggregates over one scan
    val plan = Profiling.corrPairs(df, Seq("x", "y2x", "negx", "parity"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"corrPairs must not join:\n$plan")
  }

  test("holtLinear recovers a pure linear ramp: trend converges, residual-free forecast") {
    // v_t = 10 + 2t: with l1=v1, b1=0, the recursion tracks the ramp and
    // the one-step forecast approaches v_{t+1}
    val rows = (0 until 20).map(i => (1L, f"2024-01-01 00:$i%02d:00", i.toLong, 10.0 + 2 * i))
    val df = rows.toDF("k", "ts_s", "id", "v")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = TimeSeries.holtLinear(df, "k", "ts", "id", "v", alpha = 0.5, beta = 0.25)
      .orderBy($"id").collect()
    assert(out.head.getAs[Double]("level") == 10.0 &&
      out.head.getAs[Double]("trend") == 0.0)
    val lastF = out(18).getAs[Double]("forecast")
    val lastV = out(19).getAs[Double]("v")
    assert(math.abs(lastF - lastV) < 0.7, s"forecast $lastF vs next $lastV")
  }

  test("twap weights values by holding time, capped at the bucket edge") {
    // one bucket [10:00, 11:00): v=10 held 15 min, then v=30 held 45 min
    // -> twap = (10*15 + 30*45)/60 = 25
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 10.0),
      (1L, "2024-01-01 10:15:00", 2L, 30.0)
    ).toDF("k", "ts_s", "id", "v").withColumn("ts", to_timestamp($"ts_s"))
    val out = TimeSeries.twap(df, "k", "ts", "id", "v", bucket = "1 hour").collect()
    assert(out.length == 1 && out.head.getAs[Double]("twap") == 25.0, out.toSeq)
  }

  test("rollingMedian interpolates even windows and bounds the frame") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 9.0), (1L, 3L, 5.0), (1L, 4L, 7.0))
      .toDF("k", "id", "v").withColumn("ts", $"id")
    val out = TimeSeries.rollingMedian(df, "k", "ts", "id", "v", lookback = 2)
      .orderBy($"id").collect().map(_.getAs[Double]("rolling_median"))
    // windows: [1]=1, [1,9]=5, [1,9,5]=5, [9,5,7]=7
    assert(out.toSeq == Seq(1.0, 5.0, 5.0, 7.0), out.toSeq)
  }

  test("seasonalDecompose: seasonal sums to zero and recomposes exactly") {
    // 4 weeks of period-7 data: v = 100 + phase bump
    val bumps = Seq(5.0, -3.0, 0.0, 2.0, -1.0, -2.0, -1.0)
    val rows = (0 until 28).map { i =>
      (1L, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        100.0 + bumps(i % 7))
    }
    val out = TimeSeries.seasonalDecompose(
      rows.toDF("k", "day", "v"), "k", "day", "v", period = 7)
      .orderBy($"day").collect()
    val seasonalByPhase = out.map(r =>
      r.getAs[Int]("phase") -> r.getAs[Double]("seasonal")).toMap
    assert(math.abs(seasonalByPhase.values.sum) < 1e-6)
    // interior rows recompose: v = trend + seasonal + residual
    out.filter(r => !r.isNullAt(r.fieldIndex("trend"))).foreach { r =>
      val back = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(back - r.getAs[Double]("v")) < 1e-5, r)
    }
    // the constant-plus-seasonal series has a flat interior trend of 100
    out.filter(r => !r.isNullAt(r.fieldIndex("trend"))).foreach { r =>
      assert(math.abs(r.getAs[Double]("trend") - 100.0) < 1e-6, r)
    }
  }

  test("kaplanMeier reproduces the textbook hand example with censoring") {
    // durations: events at 6,6,6 (n=10 at risk), censored 6; event 7 (n=6);
    // censored 9,10; event 10 (n=3); censored 11,13
    val subj = Seq((6L, true), (6L, true), (6L, true), (6L, false),
      (7L, true), (9L, false), (10L, false), (10L, true), (11L, false),
      (13L, false)).toDF("dur", "ev")
    val out = Profiling.kaplanMeier(subj, "dur", "ev")
      .orderBy($"t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    // S(6) = 1 - 3/10 = 0.7; S(7) = 0.7 * (1 - 1/6); S(10): at-risk 4,
    // one event -> * (1 - 1/4)
    assert(out(0) == (6L, 10L, 3L, 0.7), out.toSeq)
    assert(out(1)._1 == 7L && out(1)._2 == 6L &&
      math.abs(out(1)._4 - 0.7 * 5 / 6) < 1e-6)
    assert(out(2)._1 == 10L && out(2)._2 == 4L &&
      math.abs(out(2)._4 - 0.7 * (5.0 / 6) * 0.75) < 1e-6)
    // everyone dying at the last time hits the exact-zero guard
    val allDie = Seq((1L, true), (1L, true)).toDF("dur", "ev")
    val z = Profiling.kaplanMeier(allDie, "dur", "ev").collect()
    assert(z.head.getDouble(4) == 0.0)
  }

  test("gmm1d recovers a planted two-component mixture") {
    val rng = new scala.util.Random(3)
    val vals = Seq.fill(2000)(10.0 + rng.nextGaussian() * 2) ++
      Seq.fill(1000)(50.0 + rng.nextGaussian() * 3)
    val out = Profiling.gmm1d(vals.toDF("v"), "v", iterations = 12)
      .orderBy($"mu").collect()
    val (w1, mu1) = (out(0).getDouble(1), out(0).getDouble(2))
    val (w2, mu2) = (out(1).getDouble(1), out(1).getDouble(2))
    assert(math.abs(mu1 - 10.0) < 0.5 && math.abs(mu2 - 50.0) < 0.5, (mu1, mu2))
    assert(math.abs(w1 - 2.0 / 3) < 0.05 && math.abs(w2 - 1.0 / 3) < 0.05, (w1, w2))
    assert(out(0).getDouble(4) == out(1).getDouble(4)) // shared loglik
  }

  test("bootstrapMeanCi brackets the true mean with a sane width") {
    val df = (1 to 2000).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "v")
    val r = Profiling.bootstrapMeanCi(df, "id", "v", replicates = 32).head()
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(r.getLong(0) == 2000L)
    assert(lo <= mean && mean <= hi, (lo, mean, hi))
    // sd ~ 28.9 / sqrt(2000) ~ 0.65 -> 95% interval within ~±2
    assert(hi - lo < 4.0 && hi - lo > 0.3, (lo, hi))
  }

  test("tableFingerprint is order- and partitioning-invariant, row-sensitive") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Profiling.tableFingerprint(d, Seq("id", "s")).head()
    val a = fp(df)
    val b = fp(df.orderBy($"s".desc).repartition(5))
    assert(a == b)
    val c = fp(Seq((1L, "x"), (2L, "y"), (3L, "w")).toDF("id", "s"))
    assert(a != c)
  }

  test("benfordScreen on planted digit counts matches hand arithmetic") {
    // 30 values starting with 1, 10 starting with 2
    val vals = Seq.fill(30)(12.34) ++ Seq.fill(10)(250.0)
    val out = Profiling.benfordScreen(vals.toDF("v"), "v")
      .orderBy($"digit").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(out(0).getLong(1) == 30L && out(1).getLong(1) == 10L)
    assert(out(0).getDouble(2) == 0.75 && out(1).getDouble(2) == 0.25)
    assert(out(0).getDouble(3) == 0.30103) // log10(2) rounded 6dp
  }

  test("imputeByGroup fills nulls with the group statistic, count preserved") {
    val df = Seq(("g1", Some(10.0)), ("g1", Some(20.0)), ("g1", None),
      ("g2", None), ("g2", Some(5.0))).toDF("k", "v")
    val mean = Profiling.imputeByGroup(df, "k", "v", "mean")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(mean.length == 5)
    assert(mean.count(_._3) == 2)
    assert(mean.filter(r => r._1 == "g1" && r._3).head._2 == 15.0)
    assert(mean.filter(r => r._1 == "g2" && r._3).head._2 == 5.0)
    val med = Profiling.imputeByGroup(df, "k", "v", "median")
      .filter($"imputed").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(med == Map("g1" -> 15.0, "g2" -> 5.0))
  }

  test("winsorize clips exactly at the group percentiles and keeps row count") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val out = Profiling.winsorize(df, "k", "v", pLo = 0.05, pHi = 0.95)
    assert(out.count() == 100)
    val w = out.select("winsorized").as[Double].collect()
    // interpolated p5 of 1..100 = 5.95, p95 = 95.05
    assert(math.abs(w.min - 5.95) < 1e-9 && math.abs(w.max - 95.05) < 1e-9,
      (w.min, w.max))
    assert(out.filter($"clipped_low").count() == 5)
    assert(out.filter($"clipped_high").count() == 5)
  }

  test("quantileNormalize: shifted groups land on identical global quantiles") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 10.0), (5L, "b", 20.0), (6L, "b", 30.0)).toDF("id", "g", "v")
    val out = Profiling.quantileNormalize(df, "id", "g", "v")
      .orderBy($"id").collect().map(r => (r.getString(1), r.getDouble(3)))
    // global sorted = [1,2,3,10,20,30]: q0 → 1, q50 → 3+0.5·(10−3) = 6.5,
    // q100 → 30 — both groups map onto the SAME global quantile values
    val a = out.filter(_._1 == "a").map(_._2).toSeq
    val b = out.filter(_._1 == "b").map(_._2).toSeq
    assert(a == Seq(1.0, 6.5, 30.0), a)
    assert(b == a)
  }

  test("spearman: textbook no-ties value, tie-correct average ranks, inverse") {
    // classic d² example: 1 − 6·4/(5·24) = 0.8
    val a = Seq((1, 2), (2, 1), (3, 4), (4, 3), (5, 5)).toDF("x", "y")
    val ra = Profiling.spearman(a, "x", "y").collect().head
    assert(ra.getLong(0) == 5L && ra.getDouble(1) == 0.8)
    // ties on x: ranks (1.5, 1.5, 3) vs (1, 2, 3) → 1.5/√3 = 0.866025
    val b = Seq((1, 10), (1, 20), (2, 30)).toDF("x", "y")
    val rb = Profiling.spearman(b, "x", "y").collect().head
    assert(rb.getLong(0) == 3L && math.abs(rb.getDouble(1) - 0.866025) < 1e-9)
    // perfect inverse order
    val c = Seq((1, 9), (2, 8), (3, 7)).toDF("x", "y")
    assert(Profiling.spearman(c, "x", "y").collect().head.getDouble(1) == -1.0)
  }

  test("mannKendall: monotone series detected, constant series is no_trend") {
    val up = (1 to 10).map(i => ("up", i, i.toDouble))
    val flat = (1 to 10).map(i => ("flat", i, 5.0))
    val df = (up ++ flat).toDF("k", "t", "v")
    val out = TimeSeries.mannKendall(df, "k", "t", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getString(5))).toMap
    // strictly increasing: S = C(10,2) = 45, Var = 10*9*25/18 = 125,
    // z = 44/sqrt(125) = 3.9355
    assert(out("up") == ((10L, 45L, 125.0, 3.9355, "increasing")))
    // all tied: S = 0, tie correction kills the variance, z = 0
    assert(out("flat") == ((10L, 0L, 0.0, 0.0, "no_trend")))
  }

  test("mannKendall: an over-cap key drops from the result, others unaffected") {
    // the per-key pair join is quadratic in the series length — a key
    // past maxPointsPerKey is dropped rather than detonating; the
    // surviving key's statistic is unchanged, and droppedTrendKeys is
    // the report half that names exactly the dropped keys
    val big = (1 to 20).map(i => ("big", i, (i % 7).toDouble))
    val small = (1 to 10).map(i => ("small", i, i.toDouble))
    val df = (big ++ small).toDF("k", "t", "v")
    val out = TimeSeries.mannKendall(df, "k", "t", "v", maxPointsPerKey = 10L)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("small"))
    assert(out.head.getLong(2) == 45L) // same S as the uncapped run
    val dropped = TimeSeries.droppedTrendKeys(df, "k", "t", "v",
      maxPointsPerKey = 10L).collect()
    assert(dropped.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("big", 20L)))
  }

  test("mannKendall collapses duplicate timestamps to their mean first") {
    val df = Seq(("k", 1, 0.0), ("k", 1, 2.0), ("k", 2, 5.0))
      .toDF("k", "t", "v") // day 1 mean = 1.0 < 5.0 -> S = +1 over 2 points
    val r = TimeSeries.mannKendall(df, "k", "t", "v").head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)
  }

  test("ksTest: exact max ECDF gap, identical samples accept") {
    // a = {1..4}, b = {3..6}: gap peaks at x=2 (F_a=1/2, F_b=0) and
    // x=4 (F_a=1, F_b=1/2) -> D = 0.5
    val df = (Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(3, 4, 5, 6).map(v => ("b", v.toDouble))).toDF("g", "v")
    val r = Profiling.ksTest(df, "g", "v").head()
    assert(r.getDouble(4) == 0.5, r.toString)
    assert(r.getDouble(6) > 0.5 && r.getDouble(6) < 1.0) // tiny n: accept
    // identical samples: D = 0, p = exactly 1 via the small-lambda rule
    val same = (Seq(1, 2, 3).map(v => ("a", v.toDouble)) ++
      Seq(1, 2, 3).map(v => ("b", v.toDouble))).toDF("g", "v")
    val s = Profiling.ksTest(same, "g", "v").head()
    assert(s.getDouble(4) == 0.0 && s.getDouble(6) == 1.0)
    // disjoint supports, larger n: D = 1, decisive rejection
    val far = (Seq.tabulate(50)(i => ("a", i.toDouble)) ++
      Seq.tabulate(50)(i => ("b", 1000.0 + i))).toDF("g", "v")
    val f = Profiling.ksTest(far, "g", "v").head()
    assert(f.getDouble(4) == 1.0 && f.getDouble(6) < 1e-4)
  }

  test("hodgesLehmann: median cross-group difference, outlier-immune") {
    // a = {10, 12, 14}, b = {1, 2, 1000}: 9 diffs sorted =
    // {-990,-988,-986, 8,9,10,11,12,13} -> median (5th) = 9
    val df = Seq(("a", 10.0), ("a", 12.0), ("a", 14.0),
      ("b", 1.0), ("b", 2.0), ("b", 1000.0)).toDF("g", "v")
    val r = Profiling.hodgesLehmann(df, "g", "v").head()
    assert(r.getLong(4) == 9L && r.getDouble(5) == 9.0, r.toString)
    // even pair count: 2x2 diffs {1,2,3,4} -> (2+3)/2
    val even = Seq(("a", 5.0), ("a", 6.0), ("b", 2.0), ("b", 4.0))
      .toDF("g", "v")
    assert(Profiling.hodgesLehmann(even, "g", "v").head().getDouble(5) == 2.5)
  }

  test("cliffsDelta: hand-computed pair counts, dominance and ties") {
    // a = {1, 2, 3}, b = {2, 2, 0}: gt pairs (a>b): 1>0, 2>0, 3>0, 3>2,
    // 3>2 = 5; lt: 1<2 twice = 2; ties: 2=2 twice = 2; delta = 3/9
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 2.0), ("b", 0.0)).toDF("g", "v")
    val r = Profiling.cliffsDelta(df, "g", "v").head()
    assert(r.getLong(4) == 5L && r.getLong(5) == 2L && r.getLong(6) == 2L)
    assert(r.getDouble(7) == BigDecimal(3.0 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getString(8) == "medium")
    // total dominance: delta 1, large
    val dom = Seq(("a", 9.0), ("a", 8.0), ("b", 1.0)).toDF("g", "v")
    val d = Profiling.cliffsDelta(dom, "g", "v").head()
    assert(d.getDouble(7) == 1.0 && d.getString(8) == "large")
  }

  test("logRank: identical curves give z~0, separated curves reject") {
    // identical: both groups event at t = 1..20
    val same = (1 to 20).flatMap(t => Seq(("a", t, true), ("b", t, true)))
    val s0 = Profiling.logRank(same.toDF("g", "t", "e"), "g", "t", "e").head()
    assert(s0.getDouble(6) == 0.0 && s0.getDouble(8) == 0.0) // O-E, z
    assert(s0.getLong(4) == 20L && s0.getLong(5) == 20L)
    // separated: group a events at 1..10, group b at 11..20 -> strong
    val sep = ((1 to 10).map(t => ("a", t, true)) ++
      (11 to 20).map(t => ("b", t, true))).toDF("g", "t", "e")
    val s1 = Profiling.logRank(sep, "g", "t", "e").head()
    assert(math.abs(s1.getDouble(8)) > 3.0, s"z was ${s1.getDouble(8)}")
    // censored-only group still counts as at-risk
    val cens = (same ++ Seq(("a", 25, false))).toDF("g", "t", "e")
    assert(Profiling.logRank(cens, "g", "t", "e").head().getLong(2) == 21L)
  }

  test("changepoints: planted step found exactly once, flat key silent") {
    val stepped = (1 to 10).map(i => ("a", i, 0.0)) ++
      (11 to 20).map(i => ("a", i, 10.0))
    val flat = (1 to 20).map(i => ("b", i, 3.0))
    val df = (stepped ++ flat).toDF("k", "t", "v")
    val out = TimeSeries.changepoints(df, "k", "t", "v",
      maxDepth = 2, minSegment = 3, penalty = 1.0).collect()
    // one split: key a, level 1, root segment, after t=10, halves 10/10;
    // gain = (100^2/10 + 100^2/10 - 200^2/20)/1 ... in value^2 units:
    // 0/10 + 10000/10 - 10000/20 = 500. Constant halves gain 0 -> no
    // level-2 splits; key b never splits.
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getString(0) == "a" && r.getInt(1) == 1 && r.getString(2) == "")
    assert(r.getInt(3) == 10 && r.getLong(4) == 10L && r.getLong(5) == 10L)
    assert(r.getDouble(6) == 500.0, s"gain was ${r.getDouble(6)}")
  }

  test("theilSen: slope and intercept immune to a single outlier") {
    // five points on y = 2x + 1 plus one wild outlier
    val df = (Seq.tabulate(5)(i => ("k", i + 1, 2.0 * (i + 1) + 1.0)) :+
      (("k", 6, 500.0))).toDF("k", "x", "v")
    val r = TimeSeries.theilSen(df, "k", "x", "v").head()
    assert(r.getLong(1) == 6L && r.getLong(2) == 15L)
    assert(r.getDouble(3) == 2.0, s"slope was ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"intercept was ${r.getDouble(4)}")
  }
}
