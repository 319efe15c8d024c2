package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Reference-based text evaluation metrics — the eval-harness side of a
 * training-data pipeline (scoring model output or candidate corpora
 * against references).
 */
object TextEval {

  /** n-grams of `a` as space-joined strings (empty array when the
    * sequence is shorter than n — guards Spark's descending `sequence`). */
  private def ngr(a: Column, n: Int): Column =
    when(size(a) >= n,
      transform(sequence(lit(0), size(a) - n),
        i => concat_ws(" ", slice(a, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /**
   * Corpus-level BLEU per group (Papineni et al. 2002): modified n-gram
   * precision p_n for n = 1..maxN with per-segment clipping
   * (Σ min(cand_count, ref_count) / Σ cand_count, summed over a group's
   * segments before dividing — the corpus formulation, not averaged
   * sentence BLEU), multiplicative brevity penalty
   * min(1, e^(1−r/c)) from the group's total candidate/reference
   * lengths, and BLEU = BP · (Π p_n)^(1/maxN). Output one row per
   * group: (group, p1..p_maxN, bp, bleu), 6dp, BLEU computed from the
   * 6dp-anchored precisions/BP so an independent engine replays it.
   *
   * `candCol`/`refCol` are pre-tokenized array<string> columns; `idCol`
   * keys the per-segment clipping join. Scale: each side explodes its
   * own grams exactly once into (segment, n, gram) counts (a shared
   * side-tagged frame looks tidier but its side filter pushes below the
   * aggregate, making each branch generate BOTH sides' grams), one
   * segment+gram-keyed left join, then group-sized aggregates — no
   * window, no driver data; segments may be corpus-sized.
   */
  def corpusBleu(df: DataFrame, idCol: String, groupCol: String,
      candCol: String, refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"corpusBleu: maxN must be 1..8, got $maxN")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
      col(candCol).as("__c"), col(refCol).as("__r"))

    val cand = base
      .select($"__id", $"__g", explode(flatten(array((1 to maxN).map(n =>
        transform(ngr($"__c", n),
          g => struct(lit(n).as("n"), g.as("gram")))): _*))).as("t"))
      .groupBy($"__id", $"__g", $"t.n".as("n"), $"t.gram".as("gram"))
      .agg(count(lit(1)).as("c"))
    val ref = base
      .select($"__id", explode(flatten(array((1 to maxN).map(n =>
        transform(ngr($"__r", n),
          g => struct(lit(n).as("n"), g.as("gram")))): _*))).as("t"))
      .groupBy($"__id", $"t.n".as("n"), $"t.gram".as("gram"))
      .agg(count(lit(1)).as("rc"))
    val clip = cand.join(ref, Seq("__id", "n", "gram"), "left")
      .groupBy($"__g", $"n")
      .agg(sum(least($"c", coalesce($"rc", lit(0L)))).as("clipped"),
        sum($"c").as("total"))

    val precCols = (1 to maxN).map(n =>
      round(max(when($"n" === n, $"clipped" / $"total")), 6).as(s"p$n"))
    val prec = clip.groupBy($"__g").agg(precCols.head, precCols.tail: _*)

    val lens = base.groupBy($"__g")
      .agg(sum(size($"__c")).as("__clen"), sum(size($"__r")).as("__rlen"))
    val bp6 = round(when($"__clen" >= $"__rlen", 1.0)
      .otherwise(exp(lit(1.0) - $"__rlen".cast("double") / $"__clen")), 6)
    val geo = pow((1 to maxN).map(n => col(s"p$n")).reduce(_ * _),
      1.0 / maxN)

    prec.join(lens, "__g")
      .withColumn("bp", bp6)
      .withColumn("bleu", round($"bp" * geo, 6))
      .drop("__clen", "__rlen")
      .withColumnRenamed("__g", groupCol)
      .orderBy(col(groupCol))
  }

  /** character n-grams of string column `s` (1-based substr windows). */
  private def charGrams(s: Column, n: Int): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /**
   * chrF (Popović 2015) per group: character n-gram precision/recall
   * for n = 1..maxN over whitespace-stripped candidate/reference
   * strings, clipped per segment and summed per group before dividing,
   * then F_β per order and the arithmetic mean over orders
   * (chrP, chrR, chrF — 6dp, F computed from the 6dp-anchored P/R).
   * Orders where either side has no grams at all are skipped, matching
   * the metric's convention for too-short corpora.
   *
   * Unlike BLEU's cand-only totals, both sides' counts land in ONE
   * unioned (segment, n, gram) aggregate — no clip join at all: each
   * side explodes once, the union groups once, and everything after is
   * group×order-sized. `candCol`/`refCol` are raw strings (the metric
   * defines its own character tokenization).
   */
  def chrF(df: DataFrame, idCol: String, groupCol: String,
      candCol: String, refCol: String, maxN: Int = 6,
      beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 10, s"chrF: maxN must be 1..10, got $maxN")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
      regexp_replace(col(candCol), "\\s", "").as("__c"),
      regexp_replace(col(refCol), "\\s", "").as("__r"))

    def side(arr: Column, cc: Int, rc: Int): DataFrame = base
      .select($"__id", $"__g", explode(flatten(array((1 to maxN).map(n =>
        transform(charGrams(arr, n),
          g => struct(lit(n).as("n"), g.as("gram")))): _*))).as("t"))
      .select($"__id", $"__g", $"t.n".as("n"), $"t.gram".as("gram"),
        lit(cc.toLong).as("cc"), lit(rc.toLong).as("rc"))

    val b2 = beta * beta
    side($"__c", 1, 0).unionByName(side($"__r", 0, 1))
      .groupBy($"__id", $"__g", $"n", $"gram")
      .agg(sum($"cc").as("cc"), sum($"rc").as("rc"))
      .groupBy($"__g", $"n")
      .agg(sum(least($"cc", $"rc")).as("m"),
        sum($"cc").as("tc"), sum($"rc").as("tr"))
      .filter($"tc" > 0 && $"tr" > 0)
      .select($"__g", round($"m" / $"tc", 6).as("p"),
        round($"m" / $"tr", 6).as("r"))
      .withColumn("f", when($"p" === 0 && $"r" === 0, 0.0)
        .otherwise(round(lit(1.0 + b2) * $"p" * $"r" /
          (lit(b2) * $"p" + $"r"), 6)))
      .groupBy($"__g")
      // the per-order values are exact 6dp decimals, so average them as
      // scaled integers — a float sum's association order straddles
      // round-half boundaries across engines (seen: 0.551491 vs .492)
      .agg(avg6($"p").as("chrp"), avg6($"r").as("chrr"),
        avg6($"f").as("chrf"))
      .withColumnRenamed("__g", groupCol)
      .orderBy(col(groupCol))
  }

  /**
   * ROUGE-N per group (Lin 2004): corpus-level clipped n-gram overlap
   * for each order n = 1..maxN — matches = Σ_segments Σ_grams
   * min(cand_count, ref_count), recall over the reference gram total,
   * precision over the candidate total, F1 from the 6dp-anchored P/R.
   * The recall-oriented complement of [[corpusBleu]] (which only reports
   * precision) — the standard summarization report alongside
   * [[rougeL]]. Returns one row per (group, n).
   *
   * Scale: same shape as BLEU — each side explodes its own grams once,
   * one segment+gram-keyed join for the clip, group×order-sized after.
   */
  def rougeN(df: DataFrame, idCol: String, groupCol: String,
      candCol: String, refCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"rougeN: maxN must be 1..8, got $maxN")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
      col(candCol).as("__c"), col(refCol).as("__r"))
    def side(arr: Column): DataFrame = base
      .select($"__id", $"__g", explode(flatten(array((1 to maxN).map(n =>
        transform(ngr(arr, n),
          g => struct(lit(n).as("n"), g.as("gram")))): _*))).as("t"))
      .groupBy($"__id", $"__g", $"t.n".as("n"), $"t.gram".as("gram"))
      .agg(count(lit(1)).as("__cnt"))
    val cand = side($"__c")
    val ref = side($"__r").withColumnRenamed("__cnt", "__rc")
      .drop("__g")
    val clip = cand.join(ref, Seq("__id", "n", "gram"))
      .groupBy($"__g", $"n")
      .agg(sum(least($"__cnt", $"__rc")).as("__m"))
    val totals = base.select($"__g", explode(array((1 to maxN).map(n =>
        struct(lit(n).as("n"),
          greatest(size($"__c") - (n - 1), lit(0)).cast("long").as("tc"),
          greatest(size($"__r") - (n - 1), lit(0)).cast("long").as("tr"))): _*))
        .as("t"))
      .groupBy($"__g", $"t.n".as("n"))
      .agg(sum($"t.tc").as("__tc"), sum($"t.tr").as("__tr"))
    totals.join(clip, Seq("__g", "n"), "left")
      .select($"__g", $"n",
        round(when($"__tc" > 0, coalesce($"__m", lit(0L)) / $"__tc")
          .otherwise(lit(0.0)), 6).as("p"),
        round(when($"__tr" > 0, coalesce($"__m", lit(0L)) / $"__tr")
          .otherwise(lit(0.0)), 6).as("r"))
      .withColumn("f", when($"p" + $"r" > 0,
        round(lit(2.0) * $"p" * $"r" / ($"p" + $"r"), 6)).otherwise(lit(0.0)))
      .withColumnRenamed("__g", groupCol)
      .orderBy(col(groupCol), $"n")
  }

  /**
   * ROUGE-L per group (Lin 2004): per-segment LCS of the candidate and
   * reference token sequences, P = LCS/|cand|, R = LCS/|ref|,
   * F_β = (1+β²)PR / (R + β²P) with ROUGE's recall-weighted β (default
   * 1.2), then the group means of the 6dp-anchored per-segment values
   * (integer-scaled sums, so engines can't disagree on association).
   * Returns (group, rougel_p, rougel_r, rougel_f, n_segments).
   *
   * The LCS itself is a codegen'd row-local kernel
   * ([[graft.functions.TextKernels.lcsLength]], the O(m·n) two-row DP) —
   * segments are sentence-sized, so the whole metric is one narrow map
   * over the pairs plus a group-keyed aggregate; no join, no window, no
   * shuffle beyond the final groupBy.
   */
  def rougeL(df: DataFrame, groupCol: String, candCol: String,
      refCol: String, beta: Double = 1.2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b2 = beta * beta
    df.select(col(groupCol).as("__g"),
        graft.functions.tfunctions.lcs_len(col(candCol), col(refCol)).as("__l"),
        size(col(candCol)).cast("long").as("__m"),
        size(col(refCol)).cast("long").as("__n"))
      .withColumn("__p",
        when($"__m" > 0, round($"__l" / $"__m", 6)).otherwise(lit(0.0)))
      .withColumn("__r",
        when($"__n" > 0, round($"__l" / $"__n", 6)).otherwise(lit(0.0)))
      .withColumn("__f",
        when($"__p" + $"__r" > 0,
          round(lit(1.0 + b2) * $"__p" * $"__r" /
            ($"__r" + lit(b2) * $"__p"), 6)).otherwise(lit(0.0)))
      .groupBy($"__g")
      .agg(avg6($"__p").as("rougel_p"), avg6($"__r").as("rougel_r"),
        avg6($"__f").as("rougel_f"), count(lit(1)).as("n_segments"))
      .withColumnRenamed("__g", groupCol)
      .orderBy(col(groupCol))
  }

  /** exact mean of 6dp-anchored values: integer-scaled sum, one division */
  private def avg6(c: Column): Column =
    round(sum(round(c * 1e6).cast("long")) / (count(lit(1)) * 1e6), 6)
}
