package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-matching data selection — the DSIR recipe (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling"): score
 * every document in a raw pool by how much more likely its hashed
 * bag-of-words features are under a TARGET corpus distribution than under
 * the raw pool's own, then keep the top-weighted slice. The production use
 * is pretraining-data curation against a high-quality exemplar set
 * (Wikipedia/books in the paper); here the target is any caller-supplied
 * DataFrame of exemplar documents.
 */
object DataSelection {

  /**
   * DSIR importance weights + deterministic top-n selection.
   *
   * Features are hashed unigrams ([[Classify.tokenBucket]]: first five
   * md5 hex chars mod `numBuckets` — the SQL-replayable hashing trick the
   * NB/LR classifiers share). Both the target and raw bucket
   * distributions get add-`smoothing` mass over all `numBuckets` buckets,
   * so every bucket's log-likelihood ratio is finite even when one side
   * never saw it. Per raw document:
   *
   *   log w(d) = Σ_tok ln( p̂_target[b(tok)] / p̂_raw[b(tok)] )
   *
   * rounded to 6dp (sums are O(tokens·ratio), well inside the anchor
   * width). The paper's Gumbel-top-k draw is replaced by the
   * deterministic (log_weight desc, doc_id asc) top-`keepN` cut — the
   * reproducible variant, same selection pressure.
   *
   * Scale: both model tables are `numBuckets` rows (broadcast); the raw
   * pool is touched by one token explode + one broadcast join + one
   * doc-keyed aggregate. The top-n cut uses [[Profiling.orderedPrefix]]
   * (range-sort + partition-offset rank) — doc-level rows only, never a
   * single-task window. Zero-token docs carry weight 0 (the empty
   * product) and lose ties to every weighted doc above 0.
   *
   * @return (doc_id, n_tokens, log_weight, selected) — all raw docs
   */
  /** The fitted DSIR model itself: per-bucket log-likelihood ratio
    * ln(p̂_target[b]/p̂_raw[b]) over all `numBuckets` md5 buckets,
    * add-`smoothing` smoothed — a B-row artifact, trainable once and
    * applied anywhere (batch select below, or frozen into a streaming
    * screen). */
  def llrModel(raw: DataFrame, target: DataFrame, textCol: String,
      numBuckets: Int = 1024, smoothing: Double = 0.5): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val rawBuckets = raw
      .select(explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("tok"))
      .select(Classify.tokenBucket($"tok", numBuckets).as("b"))
    llrModelFromRawBuckets(rawBuckets, target, textCol, numBuckets, smoothing)
  }

  /** [[llrModel]] with the raw pool's per-token buckets ALREADY computed —
    * the entry [[dsirSelect]] uses so the raw pool is tokenized and
    * md5-bucketed exactly once (r15 optimization: the select previously
    * ran the corpus-scale explode + md5 twice, once for the raw-side
    * model and once for the per-doc weights; guide §1.2 step 1 — don't
    * compute things twice). Bucket counts, smoothing, and the log-ratio
    * arithmetic are unchanged. */
  private[graft] def llrModelFromRawBuckets(rawBuckets: DataFrame,
      target: DataFrame, textCol: String,
      numBuckets: Int, smoothing: Double): DataFrame = {
    val spark = rawBuckets.sparkSession
    import spark.implicits._
    // smoothed per-bucket ln-prob, dense over 0..B-1
    def logProbs(cts: DataFrame, out: String): DataFrame =
      spark.range(numBuckets).select($"id".as("b"))
        .join(cts, Seq("b"), "left")
        .crossJoin(broadcast(cts.agg(sum($"c").as("t"))))
        .select($"b",
          log((coalesce($"c", lit(0L)) + lit(smoothing)) /
            ($"t" + lit(smoothing * numBuckets))).as(out))
    val targetCts = target
      .select(explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("tok"))
      .select(Classify.tokenBucket($"tok", numBuckets).as("b"))
      .groupBy($"b").agg(count(lit(1)).as("c"))
    val rawCts = rawBuckets.select($"b").groupBy($"b").agg(count(lit(1)).as("c"))
    logProbs(targetCts, "lt").join(logProbs(rawCts, "lr"), "b")
      .select($"b", ($"lt" - $"lr").as("llr"))
  }

  /** Stateless per-row DSIR scorer from a COLLECTED llr model (the B
    * (bucket, llr) pairs): the model rides the plan as a map literal
    * (broadcast-by-value, the lrHashClassifier device), so scoring is a
    * pure projection — it runs append-mode inside a stream with no
    * state and no join. Sequential fold over the token list; the 6dp
    * round absorbs the association difference vs the batch aggregate. */
  def dsirScoreColumn(llr: Seq[(Long, Double)], numBuckets: Int,
      text: Column): Column = {
    require(llr.size == numBuckets, s"model must cover all $numBuckets buckets")
    val m = map(llr.flatMap { case (b, v) => Seq(lit(b), lit(v)) }: _*)
    val ts = TextAnalysis.wsTokens(lower(text))
    round(aggregate(
      transform(ts, t => element_at(m, Classify.tokenBucket(t, numBuckets))),
      lit(0.0), (acc, x) => acc + x), 6)
  }

  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, keepN: Int, numBuckets: Int = 1024,
      smoothing: Double = 0.5): DataFrame = {
    require(keepN >= 1, s"keepN must be >= 1, got $keepN")
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val spark = raw.sparkSession
    import spark.implicits._

    // tokenize + md5-bucket the raw pool ONCE (eager checkpoint), then
    // derive BOTH the raw-side model counts and the per-doc weights from
    // it — previously two independent subtrees each re-ran the
    // corpus-scale explode + md5 (r15; guide §1.2 step 1)
    val rawBuckets = raw
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("tok"))
      .select($"doc_id", Classify.tokenBucket($"tok", numBuckets).as("b"))
      .ckptSer()
    val llr = llrModelFromRawBuckets(rawBuckets, target, textCol,
      numBuckets, smoothing)
    val weights = rawBuckets
      .join(broadcast(llr), "b")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), round(sum($"llr"), 6).as("log_weight"))
    val all = raw.select(col(idCol).cast("long").as("doc_id")).distinct()
      .join(weights, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        coalesce($"log_weight", lit(0.0)).as("log_weight"))
    val (ranked, cache) = Profiling.orderedPrefix(
      all, Seq($"log_weight".desc, $"doc_id".asc), lit(0L))
    val out = ranked.select($"doc_id", $"n_tokens", $"log_weight",
      ($"__i" <= keepN).as("selected"))
    cache.unpersist() // determinism-safe: recompute reuses the exchange
    out
  }
}
