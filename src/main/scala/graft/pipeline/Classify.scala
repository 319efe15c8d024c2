package graft.pipeline

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
}
