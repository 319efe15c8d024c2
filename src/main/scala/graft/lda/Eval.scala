package graft.lda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Model-quality metrics for topic models — the evaluation step a user
 * runs after the reference's DisplayTopic (reference has no coherence
 * tooling; this is added capability in the model's own domain).
 */
object Eval {

  /**
   * UMass topic coherence (Mimno et al., EMNLP 2011): for each term set
   * ordered by rank (w₁ strongest),
   *
   *   C = Σ_{i=2..N} Σ_{j<i} log( (D(wᵢ, wⱼ) + 1) / D(wⱼ) )
   *
   * where D counts documents containing a term (or both). Higher (less
   * negative) = the topic's terms actually co-occur in the corpus.
   *
   * Scale shape: the corpus-sized work is ONE distinct doc-term incidence
   * pass filtered to the evaluated terms (a broadcast semi-join — term
   * sets are model-sized); pair counts are a self-join keyed by doc over
   * that filtered incidence (rows ≤ docs × set terms, never the corpus
   * squared); the final per-set aggregate is grid-sized. log via the
   * engine's natural log in both engines; coherence rounded 6dp.
   *
   * @param docs     (docCol, termCol) rows — need not be distinct
   * @param termSets (setCol, rankCol, termCol) — rank 1 = strongest term
   */
  def umassCoherence(docs: DataFrame, docCol: String, termCol: String,
      termSets: DataFrame, setCol: String, rankCol: String,
      setTermCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sets = termSets.select(col(setCol).as("set_id"),
      col(rankCol).cast("int").as("rank"), col(setTermCol).as("term"))
    val evalTerms = sets.select($"term").distinct()
    val incidence = docs
      .select(col(docCol).as("doc"), col(termCol).as("term")).distinct()
      .join(broadcast(evalTerms), "term")
    val dfCounts = incidence.groupBy($"term").agg(count(lit(1)).as("df"))
    // co-document counts for ordered pairs within a set: join the set's
    // terms onto the incidence twice, keyed by doc
    val a = incidence.select($"doc", $"term".as("term_i"))
    val b = incidence.select($"doc", $"term".as("term_j"))
    val pairs = sets.as("si")
      .join(sets.as("sj"),
        col("si.set_id") === col("sj.set_id") &&
          col("si.rank") > col("sj.rank")) // i later than j: denominator is wj
      .select(col("si.set_id").as("set_id"),
        col("si.term").as("term_i"), col("sj.term").as("term_j"))
    val coDoc = a.join(b, "doc")
      .groupBy($"term_i", $"term_j").agg(count(lit(1)).as("d_ij"))
    pairs
      .join(coDoc, Seq("term_i", "term_j"), "left")
      .na.fill(0L, Seq("d_ij"))
      .join(dfCounts.select($"term".as("term_j"), $"df".as("d_j")), "term_j")
      .groupBy($"set_id")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(log(($"d_ij" + 1).cast("double") / $"d_j")), 6).as("coherence"))
  }
}
