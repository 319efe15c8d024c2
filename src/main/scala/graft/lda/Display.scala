package graft.lda

import graft.model.TermEntry
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Model inspection — the reference's read-path "queries"
 * (cc/mrlda/DisplayTopic.java:97-143 and DisplayDocument.java:81-103),
 * expressed as DataFrame plans instead of driver-side scans.
 */
object Display {

  /** Model beta map -> (topic 1..K, termId, elogbeta) DataFrame. */
  def betaToDF(spark: SparkSession, model: LdaModel): DataFrame = {
    import spark.implicits._
    model.beta.iterator.flatMap { case (w, arr) =>
      arr.iterator.zipWithIndex.map { case (v, t) => (t + 1, w, v) }
    }.toSeq.toDF("topic", "termId", "elogbeta")
  }

  /** Top-k terms per topic by E[log β] (reference O4: bounded TreeMap per
    * topic → here a ranking window; ties broken by termId so output is
    * deterministic). */
  def topTermsPerTopic(beta: DataFrame, terms: Dataset[TermEntry], k: Int = 10): DataFrame = {
    val spark = beta.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"topic").orderBy($"elogbeta".desc, $"termId".asc)
    beta.join(broadcast(terms.toDF().select($"termId", $"term")), "termId")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"topic", $"rank", $"term", $"elogbeta".as("score"))
      .orderBy($"topic", $"rank")
  }

  /** Per-document topic proportions from gamma (reference D8). */
  def documentTopics(gammaDocs: DataFrame): DataFrame = {
    val spark = gammaDocs.sparkSession
    import spark.implicits._
    gammaDocs
      .select($"docId", posexplode($"gamma").as(Seq("topicIdx", "g")),
        aggregate($"gamma", lit(0.0), (a, x) => a + x).as("gsum"))
      .select($"docId", ($"topicIdx" + 1).as("topic"), ($"g" / $"gsum").as("proportion"))
  }
}
