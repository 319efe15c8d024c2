package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Statistical language-model scoring for corpus curation — the CCNet /
 * KenLM-style quality signal: train an n-gram LM on the corpus itself and
 * score each document's cross-entropy under it. Documents whose perplexity
 * is far above the corpus norm are boilerplate/gibberish candidates; far
 * below are template/repetition candidates. Both tails get filtered in a
 * production pretraining pipeline.
 *
 * Everything is count arithmetic over token-keyed aggregates, so the whole
 * model "fits" in two small DataFrames (bigram and context counts) and the
 * scoring pass is ordinary key joins — no driver-side model object, no UDF.
 */
object LanguageModel {

  /**
   * Bigram LM with add-k smoothing, trained and applied in one plan.
   *
   * Per document: tokens are whitespace-split lowercased words with a
   * `<s>` begin-of-sentence context, giving one (w1, w2) event per token.
   * The model is P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V) where c(w1) is
   * the count of w1 AS A CONTEXT (so the conditional sums to 1) and V is
   * the predicted-token vocabulary size. Output per doc:
   * `cross_entropy` = −mean log2 P (bits/token, 6dp) and
   * `perplexity` = 2^H (4dp). Docs with zero tokens have no events and are
   * absent from the output, as in CCNet.
   *
   * Scale: the event table is corpus-sized but the two count tables are
   * vocabulary-bounded (V and ≤V² rows, in practice ≪ corpus) — the joins
   * are term-keyed shuffles that AQE turns into broadcasts when the vocab
   * is small. One pass builds counts, one pass scores; no per-doc state.
   * The bigram zip is a higher-order-function expression (interpreted, not
   * codegen'd) but runs once per doc — the aggregate/join stages that
   * dominate are all codegen'd.
   */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = TextAnalysis.wsTokens(lower(col(textCol)))
    // zip_with pads the shorter side with null: zipping (<s> +: toks) with
    // toks aligns index i to (prev token, token) and leaves one trailing
    // (last token, null) entry, which the filter drops — bigrams with a
    // BOS context and no window shuffle.
    val events = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(filter(
          zip_with(concat(array(lit("<s>")), toks), toks,
            (a, b) => struct(a.as("w1"), b.as("w2"))),
          p => p.getField("w2").isNotNull)).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val bigrams = events.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val contexts = events.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val vocab = events.select(countDistinct($"w2").as("v"))
    events
      .join(bigrams, Seq("w1", "w2"))
      .join(contexts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (-avg(log2(($"c12" + lit(k)) / ($"c1" + lit(k) * $"v")))).as("h"))
      .select($"doc_id", $"n_tokens",
        round($"h", 6).as("cross_entropy"),
        round(pow(lit(2.0), $"h"), 4).as("perplexity"))
  }

  /**
   * The CCNet filtering step on top of `bigramLmScore`: within each
   * language, keep documents at or below the `quantile` cut of perplexity
   * (CCNet's head/middle/tail split is exactly this with 0.33/0.66).
   * Per-language, because perplexity scales differ by language — a global
   * cut would silently drop whole languages. `pr` is `percent_rank` over
   * (perplexity, doc_id) — a deterministic total order, and a rational
   * (rank−1)/(n−1) both engines compute identically.
   *
   * One window shuffle keyed by language over the (small) scored output;
   * the LM scoring plan underneath is the scalable part.
   */
  def perplexityFilter(df: DataFrame, idCol: String, textCol: String,
      langCol: String, quantile: Double = 0.5, k: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    bigramLmScore(df, idCol, textCol, k)
      .join(df.select(col(idCol).cast("long").as("doc_id"), col(langCol).as("lang")), "doc_id")
      .withColumn("pr", percent_rank().over(
        Window.partitionBy($"lang").orderBy($"perplexity", $"doc_id")))
      .select($"doc_id", $"lang", $"perplexity",
        round($"pr", 6).as("pr"), ($"pr" <= quantile).as("kept"))
  }

  /**
   * Interpolated Kneser–Ney bigram LM — the smoothing family KenLM (and
   * therefore CCNet's quality signal) actually uses, next to the add-k
   * baseline above. Fixed absolute discount D:
   *
   *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1)
   *            + (D · N1+(w1·)/c(w1)) · N1+(·w2)/|bigram types|
   *
   * where N1+(w1·) is the number of distinct continuations of w1 and
   * N1+(·w2) the number of distinct contexts preceding w2 (the
   * "novel-continuation" probability that distinguishes KN from plain
   * backoff). Trained and scored on the corpus itself like
   * [[bigramLmScore]], so every scored event has c ≥ 1 and the model
   * needs no unigram fallback. Output schema matches `bigramLmScore`:
   * (doc_id, n_tokens, cross_entropy bits/token 6dp, perplexity 4dp).
   *
   * Scale: the model tables are the bigram-TYPE aggregates (≤V² rows,
   * vocabulary-bounded); scoring is three term-keyed joins that AQE
   * broadcasts when small, plus the per-doc aggregate. Corpus-sized work
   * is only the event explode and the final doc agg — identical posture
   * to [[bigramLmScore]].
   */
  def kneserNeyLmScore(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = TextAnalysis.wsTokens(lower(col(textCol)))
    val events = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(filter(
          zip_with(concat(array(lit("<s>")), toks), toks,
            (a, b) => struct(a.as("w1"), b.as("w2"))),
          p => p.getField("w2").isNotNull)).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val bigrams = events.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    // context totals AND distinct-continuation counts in one pass over
    // the bigram-type table
    val contexts = bigrams.groupBy($"w1")
      .agg(sum($"c12").as("c1"), count(lit(1)).as("n1f"))
    val continuations = bigrams.groupBy($"w2").agg(count(lit(1)).as("n1p"))
    val nTypes = bigrams.select(count(lit(1)).as("nbt"))
    val d = lit(discount)
    events
      .join(bigrams, Seq("w1", "w2"))
      .join(contexts, Seq("w1"))
      .join(continuations, Seq("w2"))
      .crossJoin(broadcast(nTypes))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (-avg(log2(
          greatest($"c12" - d, lit(0.0)) / $"c1" +
            d * $"n1f" / $"c1" * ($"n1p".cast("double") / $"nbt")))).as("h"))
      .select($"doc_id", $"n_tokens",
        round($"h", 6).as("cross_entropy"),
        round(pow(lit(2.0), $"h"), 4).as("perplexity"))
  }
}
