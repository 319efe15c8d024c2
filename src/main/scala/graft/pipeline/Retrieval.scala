package graft.pipeline

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
}
