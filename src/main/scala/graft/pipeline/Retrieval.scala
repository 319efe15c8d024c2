package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval: fuse rankings from unrelated scorers (lexical BM25 /
 * Jaccard, dense embedding cosine, recency, …) without calibrating their
 * score scales — reciprocal rank fusion (Cormack et al., SIGIR 2009),
 * the standard trick behind "BM25 + vector" hybrid search. RRF only
 * consumes RANKS, so a cosine in [−1, 1] and a BM25 in [0, 30) fuse
 * cleanly: score(d) = Σ_lists 1/(k + rank_list(d)).
 */
object Retrieval {

  /**
   * Fuse per-key candidate rankings. Each input carries `keyCol` (the
   * query), `idCol` (the candidate), and `scoreCol`; ranks are dense
   * row numbers per key ordered by (score desc, id asc — deterministic
   * ties). Returns (key, id, n_lists, rrf) with rrf rounded to 6dp.
   *
   * Scale: each window partitions by the query key over candidate lists
   * that are top-k-bounded by construction, so no global sort exists
   * anywhere; the fuse is one hash aggregate over ≤ Σ|lists| rows.
   */
  def rrfFuse(rankings: Seq[DataFrame], keyCol: String, idCol: String,
      scoreCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val spark = rankings.head.sparkSession
    import spark.implicits._
    val ranked = rankings.map { r =>
      r.select(col(keyCol).as("key"), col(idCol).as("id"), col(scoreCol).as("score"))
        .withColumn("rank", row_number().over(
          Window.partitionBy($"key").orderBy($"score".desc, $"id".asc)))
    }
    ranked.reduce(_ unionByName _)
      .groupBy($"key", $"id")
      .agg(count(lit(1)).as("n_lists"),
        round(sum(lit(1.0) / ($"rank" + lit(k))), 6).as("rrf"))
      .select($"key".as(keyCol), $"id".as(idCol), $"n_lists", $"rrf")
  }

  /**
   * Sparse lexical ranking: token-set Jaccard similarity of each query
   * document against every corpus document THAT SHARES A TOKEN — the
   * inverted-index candidate generation, so cost scales with posting-list
   * overlap, never |queries|×|corpus|. Top-`k` per query by (jaccard
   * desc, id asc), jaccard rounded to 6dp before ranking so downstream
   * rank fusion is engine-stable.
   */
  /**
   * Maximal-marginal-relevance selection (Carbonell–Goldstein): from each
   * query's top-`poolSize` cosine candidates, greedily pick `k` results
   * maximizing λ·relevance − (1−λ)·max-similarity-to-already-selected —
   * the standard diversity-aware rerank, and in a training-data pipeline
   * the selector that keeps a retrieved context set from being k copies
   * of the same document.
   *
   * Distributed shape: the candidate pool and its per-query pairwise
   * similarity matrix are poolSize-bounded (poolSize² rows per query,
   * e.g. 400 at poolSize=20 — the whole corpus never pairs), and the k−1
   * greedy steps run as k−1 window-argmax passes with EVERY query
   * advancing in parallel; no driver loop over queries. Relevance and
   * pair similarities are 6dp-rounded (like every cosine here), scores
   * 6dp-rounded with corpus-id tie-break, so a SQL oracle replays the
   * selection exactly.
   *
   * Returns (query_id, pick, corpus_id, cosine) with pick 1..k in
   * selection order.
   */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, poolSize: Int = 20,
      lambda: Double = 0.7): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pool = graft.pipeline.Similarity
      .bruteForceTopK(corpus, queries, idCol, vecCol, poolSize)
      .withColumnRenamed("rnk", "rel_rnk")
    // vectors back onto the pool for the pairwise matrix
    val vecs = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).cast("array<double>").as("v"))
    val pv = pool.join(vecs, "corpus_id")
      .select($"query_id", $"corpus_id", $"cosine", $"v")
      .ckptSer()
    val pairSim = pv.as("x").join(pv.as("y"),
        $"x.query_id" === $"y.query_id" && $"x.corpus_id" =!= $"y.corpus_id")
      .select($"x.query_id".as("query_id"), $"x.corpus_id".as("ca"),
        $"y.corpus_id".as("cb"),
        round(graft.pipeline.Similarity.cosine($"x.v", $"y.v"), 6).as("sim"))
      .ckptSer()
    val cand = pv.select($"query_id", $"corpus_id", $"cosine")

    // pick 1: plain relevance argmax (tie by corpus_id, as everywhere)
    val w1 = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"corpus_id".asc)
    var selected = cand.withColumn("r", row_number().over(w1)).filter($"r" === 1)
      .select($"query_id", $"corpus_id", $"cosine", lit(1).as("pick"))
    for (step <- 2 to k) {
      val remaining = cand.join(
        selected.select($"query_id", $"corpus_id"), Seq("query_id", "corpus_id"),
        "left_anti")
      val scored = remaining
        .join(pairSim.withColumnRenamed("ca", "corpus_id"), Seq("query_id", "corpus_id"))
        .join(selected.select($"query_id", $"corpus_id".as("cb")), Seq("query_id", "cb"))
        .groupBy($"query_id", $"corpus_id", $"cosine")
        .agg(max($"sim").as("msim"))
        .select($"query_id", $"corpus_id", $"cosine",
          round(lit(lambda) * $"cosine" - lit(1.0 - lambda) * $"msim", 6).as("score"))
      val ws = Window.partitionBy($"query_id").orderBy($"score".desc, $"corpus_id".asc)
      val next = scored.withColumn("r", row_number().over(ws)).filter($"r" === 1)
        .select($"query_id", $"corpus_id", $"cosine", lit(step).as("pick"))
      selected = selected.unionByName(next).ckptSer()
    }
    selected.select($"query_id", $"pick", $"corpus_id", $"cosine")
  }

  def lexicalJaccardTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def toks(df: DataFrame, out: String) = df.select(col(idCol).as(out),
      explode(array_distinct(TextAnalysis.wsTokens(lower(col(textCol))))).as("tok"))
    val qt = toks(queries, "query_id")
    val ct = toks(corpus, "corpus_id")
    val qn = qt.groupBy($"query_id").agg(count(lit(1)).as("nq"))
    val cn = ct.groupBy($"corpus_id").agg(count(lit(1)).as("nc"))
    val inter = qt.join(ct, "tok")
      .filter($"query_id" =!= $"corpus_id")
      .groupBy($"query_id", $"corpus_id").agg(count(lit(1)).as("ni"))
    inter.join(broadcast(qn), "query_id").join(cn, "corpus_id")
      .withColumn("jaccard",
        round($"ni".cast("double") / ($"nq" + $"nc" - $"ni"), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"query_id").orderBy($"jaccard".desc, $"corpus_id".asc)))
      .filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"corpus_id", $"jaccard")
  }

  /**
   * Graded ranking evaluation — the retrieval-quality scoreboard: per
   * query, nDCG@k (exponential gains (2^rel−1)/log2(pos+1) against the
   * ideal ordering of the query's own grades), MRR (reciprocal rank of
   * the first relevant hit in the top k), AP@k (mean of precision@pos at
   * relevant positions, normalized by min(k, n_rel)), hit and relevant
   * counts. `ranking` carries (query, id, 1-based rank); `truth` carries
   * (query, id, grade ≥ 0) with grade 0 ≡ irrelevant; ranked ids absent
   * from truth score 0.
   *
   * Scale: every window partitions by the query over lists that are
   * top-k-bounded (the ranking side) or per-query truth-sized (the ideal
   * side) — no global sort; the metrics reduce in one hash aggregate per
   * side plus two query-keyed joins. Doubles are rounded to 6dp after
   * the per-query sums (k-bounded, so summation-order noise is far below
   * the rounding grain).
   */
  def rankingEval(ranking: DataFrame, truth: DataFrame, queryCol: String,
      idCol: String, rankCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = ranking.sparkSession
    import spark.implicits._
    val topk = ranking.filter(col(rankCol) <= k)
      .select(col(queryCol).cast("string").as("__q"),
        col(idCol).cast("string").as("__id"),
        col(rankCol).cast("long").as("__pos"))
    val rel = truth.select(col(queryCol).cast("string").as("__q"),
      col(idCol).cast("string").as("__id"),
      col(relCol).cast("double").as("__rel"))
    val w = Window.partitionBy($"__q").orderBy($"__pos")
    val scored = topk.join(rel, Seq("__q", "__id"), "left")
      .withColumn("__rel", coalesce($"__rel", lit(0.0)))
      .withColumn("__gain",
        (pow(lit(2.0), $"__rel") - 1) / log2($"__pos" + 1))
      .withColumn("__relcnt",
        sum(when($"__rel" > 0, 1L).otherwise(0L)).over(w))
      .withColumn("__prec",
        when($"__rel" > 0, $"__relcnt".cast("double") / $"__pos")
          .otherwise(lit(0.0)))
    val perQuery = scored.groupBy($"__q").agg(
      sum($"__gain").as("__dcg"),
      min(when($"__rel" > 0, $"__pos")).as("__first"),
      sum($"__prec").as("__sump"),
      sum(when($"__rel" > 0, 1L).otherwise(0L)).as("hits"))
    val wi = Window.partitionBy($"__q").orderBy($"__rel".desc, $"__id".asc)
    val ideal = rel.withColumn("__r", row_number().over(wi))
      .filter($"__r" <= k)
      .groupBy($"__q").agg(
        sum((pow(lit(2.0), $"__rel") - 1) / log2($"__r" + 1)).as("__idcg"))
    val nrel = rel.filter($"__rel" > 0)
      .groupBy($"__q").agg(count(lit(1)).as("n_rel"))
    perQuery
      .join(ideal, Seq("__q"), "left")
      .join(nrel, Seq("__q"), "left")
      .select($"__q".as("query"),
        round(when(coalesce($"__idcg", lit(0.0)) > 0, $"__dcg" / $"__idcg")
          .otherwise(lit(0.0)), 6).as("ndcg"),
        round(when($"__first".isNotNull, lit(1.0) / $"__first")
          .otherwise(lit(0.0)), 6).as("mrr"),
        round(when(coalesce($"n_rel", lit(0L)) > 0,
            $"__sump" / least(coalesce($"n_rel", lit(0L)), lit(k.toLong)))
          .otherwise(lit(0.0)), 6).as("ap"),
        $"hits", coalesce($"n_rel", lit(0L)).as("n_rel"))
  }
}
