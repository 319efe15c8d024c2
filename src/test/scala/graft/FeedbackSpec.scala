package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Annotation, Classify, Preference, TextEval}

/** Human-feedback family: agreement, label aggregation, preference
  * fitting, BLEU, conformal calibration — semantics on closed fixtures. */
class FeedbackSpec extends SparkSpec {
  import spark.implicits._

  private def labelDf(rows: Seq[(Long, Int, Int)]) =
    rows.toDF("item_id", "rater", "label")

  test("agreement: perfect raters give kappa 1, enforced complete design") {
    val perfect = labelDf(for (i <- 0L to 9L; r <- 1 to 3) yield (i, r, (i % 3).toInt))
    val out = Annotation.agreement(perfect, "item_id", "rater", "label").collect()
    assert(out.length == 4) // 3 pairs + fleiss
    assert(out.forall(_.getDouble(4) == 1.0))

    val incomplete = labelDf(Seq((1L, 1, 0), (1L, 2, 0), (2L, 1, 0)))
    val err = intercept[IllegalArgumentException] {
      Annotation.agreement(incomplete, "item_id", "rater", "label").collect()
    }
    assert(err.getMessage.contains("incomplete design"))
  }

  test("agreement: independent raters give kappa near 0") {
    // rater r labels item i with a murmur3 coin flip — independent raters
    val rand = labelDf(for (i <- 0L to 499L; r <- 1 to 2)
      yield (i, r,
        math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s"$r:$i"), 2)))
    val k = Annotation.agreement(rand, "item_id", "rater", "label")
      .filter($"rater_a" === "1").select($"kappa").head().getDouble(0)
    assert(math.abs(k) < 0.15, s"independent raters kappa was $k")
  }

  test("dawidSkene recovers planted rater reliability ordering and truth") {
    val docs = spark.range(0, 300).select($"id".as("doc_id"))
    val labels = Annotation.plantedLabels(docs, "doc_id", nRaters = 5,
      nClasses = 3, shiftedConfusion = true)
    val model = Annotation.dawidSkene(labels, "item_id", "rater", "label")
    val diag = model.filter($"rater" > 0 && $"true_class" === $"observed")
      .groupBy($"rater").agg(avg($"theta").as("acc"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // planted error rates rise 10%..50% with rater id
    assert(diag(1) > diag(3) && diag(3) > diag(5),
      s"diagonal thetas not ordered: $diag")
    assert(diag(1) > 0.8 && diag(5) < 0.7)

    // consensus labels beat any single noisy rater on the planted truth
    val post = Annotation.dawidSkenePosteriors(labels, "item_id", "rater", "label")
    val truth = docs.select($"doc_id".as("item_id"),
      (graft.pipeline.Dedup.baseHash60(concat(lit("cls:"),
        $"doc_id".cast("string"))) % 3).cast("int").as("t"))
    val acc = post.join(truth, "item_id")
      .agg(avg(when($"map_label" === $"t", 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc > 0.95, s"Dawid-Skene truth recovery was $acc")
  }

  test("bradleyTerry: dominant item ranks first, strengths sum to ~1") {
    // a beats b 9:1, b beats c 9:1, a beats c 9:1
    val wins = Seq(("a", "b", 9L), ("b", "a", 1L), ("b", "c", 9L),
      ("c", "b", 1L), ("a", "c", 9L), ("c", "a", 1L)).toDF("i", "j", "wij")
    val fit = Preference.bradleyTerry(wins, iters = 10).collect()
    assert(fit.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(math.abs(fit.map(_.getDouble(1)).sum - 1.0) < 1e-4)
    assert(fit(0).getDouble(1) > fit(1).getDouble(1))

    val big = spark.range(5000).select($"id".cast("string").as("i"),
      ($"id" + 1).cast("string").as("j"), lit(1L).as("wij"))
    val err = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(big)
    }
    assert(err.getMessage.contains("maxItems"))
  }

  test("eloRatings: hand-computed two-period trajectory, guards fire") {
    // p1: a beats b once (E = 0.5 each) → a 1504, b 1496
    // p2: b beats a once → E_b = 1/(1+10^(8/400)), both move back by 8·E_a
    val cmp = Seq(("a", "b", "p1"), ("b", "a", "p2"))
      .toDF("w", "l", "period")
    val fit = Preference.eloRatings(cmp, "w", "l", "period",
      periods = Seq("p1", "p2"), kFactor = 8.0).collect()
    val byItem = fit.map(r => r.getString(0) ->
      (r.getDouble(1), r.getLong(2), r.getInt(3))).toMap
    val eA = 1.0 / (1.0 + math.pow(10.0, -8.0 / 400.0)) // a's p2 expectation
    val expA = BigDecimal(1504.0 + 8.0 * (0.0 - BigDecimal(eA)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(byItem("a")._1 - expA) < 1e-6, s"a was ${byItem("a")._1}")
    assert(byItem("a")._2 == 2 && byItem("b")._2 == 2)
    // b ends ahead: it won as the underdog (gain 8·(1−E_b) > 4), while
    // a's period-1 win at even ratings was worth exactly 4
    assert(byItem("b")._1 > byItem("a")._1 && byItem("b")._3 == 1)
    // zero-sum within rounding: pairwise exchanges cancel
    assert(math.abs(fit.map(_.getDouble(1)).sum - 3000.0) < 1e-4)

    val err = intercept[IllegalArgumentException] {
      Preference.eloRatings(cmp, "w", "l", "period", periods = Seq("p1"))
    }
    assert(err.getMessage.contains("not in the declared grid"))
  }

  test("glickoStep reproduces Glickman (1999)'s worked example") {
    // player r=1500 RD=200 vs (1400, 30, win), (1550, 100, loss),
    // (1700, 300, loss) -> r' ~= 1464.1, RD' ~= 151.4 (paper, section 3)
    val (r, rd) = Preference.glickoStep(1500.0, 200.0, Seq(
      (1400.0, 30.0, 1.0, 1L), (1550.0, 100.0, 0.0, 1L),
      (1700.0, 300.0, 0.0, 1L)))
    assert(math.abs(r - 1464.1) < 0.1, s"rating was $r")
    assert(math.abs(rd - 151.4) < 0.1, s"rd was $rd")
  }

  test("glickoRatings: winners rise with shrinking RD, idle players drift") {
    val cmp = Seq(("a", "b", "p1"), ("a", "b", "p1"), ("a", "c", "p1"))
      .toDF("w", "l", "period")
    val fit = Preference.glickoRatings(cmp, "w", "l", "period",
      periods = Seq("p1", "p2"), c = 63.2).collect()
    val m = fit.map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getInt(4))).toMap
    assert(m("a")._1 > 1500.0 && m("b")._1 < 1500.0 && m("c")._1 < 1500.0)
    assert(m("a")._4 == 1) // undefeated -> rank 1
    // everyone played in p1, so RD fell below the 350 start; the idle p2
    // drifts it back up but the c=63.2 drift cannot reach 350 in one period
    assert(fit.forall(r => r.getDouble(2) < 350.0))
    // b lost twice (more evidence) -> tighter RD than c's single game
    assert(m("b")._2 < m("c")._2)
    assert(m("a")._3 == 3 && m("b")._3 == 2 && m("c")._3 == 1)
  }

  test("eloRatings: period batching is order-free within a period") {
    // 3 items, all comparisons in ONE period: expected scores all use the
    // period-start (equal) ratings, so each item's rating depends only on
    // its win/loss COUNT — a beats b, a beats c, b beats c at E = 0.5
    val cmp = Seq(("a", "b"), ("a", "c"), ("b", "c"))
      .toDF("w", "l").withColumn("period", lit("p1"))
    val fit = Preference.eloRatings(cmp, "w", "l", "period",
      periods = Seq("p1"), kFactor = 8.0).collect()
    val m = fit.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") == 1508.0 && m("b") == 1500.0 && m("c") == 1492.0, s"$m")
  }

  test("preferenceCycles: planted rock-paper-scissors is one cycle") {
    val wins = Seq(("r", "s", 5L), ("s", "p", 5L), ("p", "r", 5L))
      .toDF("i", "j", "wij")
    val out = Preference.preferenceCycles(wins).head()
    assert(out.getLong(0) == 3 && out.getLong(1) == 3) // items, edges
    assert(out.getLong(2) == 1 && out.getLong(3) == 1) // triangles, cycles
    assert(out.getDouble(4) == 1.0)

    val transitive = Seq(("a", "b", 5L), ("b", "c", 5L), ("a", "c", 5L))
      .toDF("i", "j", "wij")
    val t = Preference.preferenceCycles(transitive).head()
    assert(t.getLong(2) == 1 && t.getLong(3) == 0 && t.getDouble(4) == 0.0)
  }

  test("corpusBleu: identical candidate scores 1, truncation pays BP only") {
    val toks = (1 to 40).map(i => s"w$i")
    val same = Seq((1L, "g", toks, toks)).toDF("id", "g", "cand", "ref")
    val r1 = TextEval.corpusBleu(same, "id", "g", "cand", "ref").head()
    // (g, p1..p4, bp, bleu): everything after the group col is 1.0
    assert((1 to 6).forall(i => r1.getDouble(i) == 1.0))

    val cut = Seq((1L, "g", toks.take(20), toks)).toDF("id", "g", "cand", "ref")
    val r2 = TextEval.corpusBleu(cut, "id", "g", "cand", "ref").head()
    // clipped precisions stay 1 (subset), BLEU = BP = e^(1-2) = e^-1
    assert(r2.getDouble(1) == 1.0 && r2.getDouble(4) == 1.0)
    val bp = r2.getDouble(5)
    assert(math.abs(bp - math.exp(-1.0)) < 1e-6)
    assert(r2.getDouble(6) == bp)
  }

  test("corpusBleu clips repeated candidate grams against the reference") {
    // cand repeats "the" 4x, ref has it twice -> p1 = 2/4
    val cand = Seq("the", "the", "the", "the")
    val ref = Seq("the", "cat", "the", "dog")
    val df = Seq((1L, "g", cand, ref)).toDF("id", "g", "cand", "ref")
    val r = TextEval.corpusBleu(df, "id", "g", "cand", "ref", maxN = 1).head()
    assert(r.getDouble(1) == 0.5)
  }

  test("rougeL: hand-computed LCS fractions, identical and empty edges") {
    val segs = Seq(
      ("g1", Seq("a", "b", "c", "d"), Seq("a", "c", "b", "d")), // LCS 3
      ("g2", Seq("x", "y"), Seq("x", "y")),                     // identical
      ("g3", Seq("p", "q"), Seq.empty[String]),                 // empty ref
      ("g4", Seq("r", "r", "s", "r"), Seq("r", "r", "r")))      // repeats: LCS 3
      .toDF("g", "cand", "ref")
    val out = TextEval.rougeL(segs, "g", "cand", "ref", beta = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("g1") == ((0.75, 0.75, 0.75)))
    assert(out("g2") == ((1.0, 1.0, 1.0)))
    assert(out("g3") == ((0.0, 0.0, 0.0)))
    assert(out("g4") == ((0.75, 1.0, round6(2 * 0.75 / 1.75))))
  }

  test("rougeN: clipped counts, recall vs precision denominators") {
    // cand repeats "a" 3x but ref has it twice -> unigram clip = 2 (+b) = 3
    val segs = Seq(
      ("g", 1L, Seq("a", "a", "a", "b"), Seq("a", "b", "a")))
      .toDF("g", "id", "cand", "ref")
    val out = TextEval.rougeN(segs, "id", "g", "cand", "ref", maxN = 2)
      .collect().map(r => r.getInt(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1) == ((0.75, 1.0, round6(2 * 0.75 / 1.75))))
    // bigrams: cand {aa, aa, ab}, ref {ab, ba} -> clip = 1; p = 1/3, r = 1/2
    assert(out(2) == ((round6(1.0 / 3), 0.5, round6(2 * (1.0 / 3) * 0.5 /
      (1.0 / 3 + 0.5)))))
  }

  test("lcs_len kernel: subsequence order respected, nulls match nulls") {
    val df = Seq((Seq("a", "b", "a", "c"), Seq("b", "a", "b", "a")))
      .toDF("x", "y")
      .select(graft.functions.tfunctions.lcs_len($"x", $"y").as("l"))
    assert(df.head().getLong(0) == 3) // "b a a" / "a b a"
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("krippendorffAlpha: perfect agreement is 1, handles missing labels") {
    // items 0..9, raters 1-3, but rater 3 skips odd items; all agree
    val rows = for (i <- 0L to 9L; r <- 1 to 3
      if !(r == 3 && i % 2 == 1)) yield (i, r, (i % 3).toInt)
    val out = Annotation.krippendorffAlpha(labelDf(rows),
      "item_id", "rater", "label").head()
    assert(out.getLong(0) == 10 && out.getLong(1) == 10)
    assert(out.getDouble(4) == 1.0)

    // single-label units are excluded as unpairable, not crashed on
    val sparse = labelDf(Seq((1L, 1, 0), (1L, 2, 0), (2L, 1, 1)))
    val s = Annotation.krippendorffAlpha(sparse,
      "item_id", "rater", "label").head()
    assert(s.getLong(0) == 2 && s.getLong(1) == 1)
  }

  test("krippendorffAlpha: systematic disagreement goes negative") {
    // two raters always disagree across two classes
    val rows = for (i <- 0L to 19L; r <- 1 to 2)
      yield (i, r, if (r == 1) 0 else 1)
    val a = Annotation.krippendorffAlpha(labelDf(rows),
      "item_id", "rater", "label").head().getDouble(4)
    assert(a < 0, s"alpha was $a")
  }

  test("chrF: identical strings score 1, char edits are graded") {
    val same = Seq((1L, "g", "abcdefghij", "abcdefghij")).toDF("id", "g", "c", "r")
    val r1 = TextEval.chrF(same, "id", "g", "c", "r").head()
    assert(r1.getDouble(1) == 1.0 && r1.getDouble(2) == 1.0 &&
      r1.getDouble(3) == 1.0)

    // whitespace is stripped before gramming: space layout is irrelevant
    val spaced = Seq((1L, "g", "ab cdefgh ij", "abcde fghij")).toDF("id", "g", "c", "r")
    val r2 = TextEval.chrF(spaced, "id", "g", "c", "r").head()
    assert(r2.getDouble(3) == 1.0)

    // beta=2 weights recall: a truncated candidate scores worse than
    // one with the same precision but full coverage
    val cut = Seq((1L, "g", "abcde", "abcdefghij")).toDF("id", "g", "c", "r")
    val r3 = TextEval.chrF(cut, "id", "g", "c", "r").head()
    assert(r3.getDouble(1) == 1.0) // pure prefix: precision 1
    assert(r3.getDouble(2) < 0.5 && r3.getDouble(3) < 0.6)
  }

  test("conformalThreshold: exact order statistic and coverage") {
    // calib scores 1..100 -> k = ceil(101*0.9) = 91, threshold = 91
    val d = (1 to 100).map(i => (i.toDouble, true)) ++
      (1 to 50).map(i => (i * 2.0, false))
    val out = Classify.conformalThreshold(d.toDF("s", "c"), "s", "c").head()
    assert(out.getLong(0) == 100 && out.getLong(1) == 91)
    assert(out.getDouble(2) == 91.0)
    // test scores 2,4..100 -> <= 91 are 2..90 even = 45 of 50
    assert(out.getDouble(4) == 0.9)

    // tiny calibration set: k > n -> infinite threshold, full coverage
    val tiny = Seq((1.0, true), (2.0, true), (5.0, false)).toDF("s", "c")
    val t = Classify.conformalThreshold(tiny, "s", "c", alpha = 0.1).head()
    assert(t.isNullAt(2) && t.getDouble(4) == 1.0)
  }
}
