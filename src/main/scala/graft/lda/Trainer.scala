package graft.lda

import graft.model.Doc
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Trained model state after an EM run (or one resumable snapshot of it). */
case class LdaModel(
    numTopics: Int,
    numTerms: Int,
    alpha: Array[Double],
    /** termId -> E[log β_·w] per topic (0-based topic index). */
    beta: scala.collection.Map[Int, Array[Double]],
    logLikelihood: Double,
    iterations: Int,
    llHistory: Seq[Double])

/**
 * EM driver loop (reference: cc/mrlda/VariationalInference.java:181-394,
 * SURVEY.md §3.2). One Spark job per iteration instead of one MR job + one
 * merge job + JVM restarts: the corpus stays cached in executor memory across
 * iterations — the reference's dominant per-iteration fixed cost
 * (CONFIG_TIME counter) disappears.
 *
 * Scale posture: the E-step output is partition-combined before its single
 * shuffle; beta is collected once per iteration (K×V doubles) and broadcast —
 * the same memory wall the reference has per-mapper (DocumentMapper.java:116).
 * Convergence: |ΔLL/LL| ≤ 1e-6 or `maxIterations` (Settings.java:56,43).
 */
object Trainer {

  case class Config(
      numTopics: Int,
      maxIterations: Int = 30,
      localIterations: Int = 100,
      convergence: Double = 1e-6,
      alphaInit: Double = 1e-3, // reference VariationalInference.java:160
      symmetricAlpha: Boolean = false,
      randomStartGamma: Boolean = false,
      updateAlpha: Boolean = true,
      seed: Long = 42L,
      prior: Option[DataFrame] = None)

  def train(docs: Dataset[Doc], numTerms: Int, cfg: Config): LdaModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = cfg.numTopics

    var alpha = Array.fill(k)(cfg.alphaInit)
    var beta: scala.collection.Map[Int, Array[Double]] = Map.empty
    var corpus = docs.persist(StorageLevel.MEMORY_AND_DISK)
    val numDocs = corpus.count()

    var lastLL = 0.0
    var history = List.empty[Double]
    var iter = 0
    var converged = false

    while (iter < cfg.maxIterations && !converged) {
      val alphaBc = spark.sparkContext.broadcast(alpha)
      val betaBc = spark.sparkContext.broadcast(beta)

      val estep = EStep.run(corpus, alphaBc, betaBc, numTerms,
        localIterations = cfg.localIterations,
        randomStartGamma = cfg.randomStartGamma && iter == 0,
        learning = true, seed = cfg.seed)
        .persist(StorageLevel.MEMORY_AND_DISK)

      // M-step over the phi side; beta back to the driver for broadcast
      val newBeta = MStep.run(
        estep.filter(!$"isDoc").select($"topic", $"termId", $"logphi"), cfg.prior)
        .collect()
      val betaMap = new java.util.HashMap[Int, Array[Double]]()
      newBeta.foreach { r =>
        val t = r.getAs[Int]("topic") - 1
        val w = r.getAs[Int]("termId")
        var arr = betaMap.get(w)
        if (arr == null) { arr = new Array[Double](k); betaMap.put(w, arr) }
        arr(t) = r.getAs[Double]("elogbeta")
      }
      beta = scala.jdk.CollectionConverters.MapHasAsScala(betaMap).asScala

      // likelihood + alpha update from the doc side
      val docSide = estep.filter($"isDoc").toDF()
      val ll = docSide.agg(sum($"ll")).as[Double].head()
      if (cfg.updateAlpha) {
        if (cfg.symmetricAlpha) {
          val ssTotal = MStep.alphaSufficientStatistics(docSide, k).sum
          val a = AlphaUpdate.updateScalarAlpha(k, numDocs.toInt, alpha(0), ssTotal)
          alpha = Array.fill(k)(a)
        } else {
          val ss = MStep.alphaSufficientStatistics(docSide, k)
          alpha = AlphaUpdate.updateVectorAlpha(k, numDocs.toInt, alpha, ss)
        }
      }

      // rotate gamma into the corpus for the next iteration's warm start
      // (reference renames gamma dirs, VariationalInference.java:358-379);
      // localCheckpoint truncates the growing EM lineage
      val nextCorpus = docSide
        .select($"docId", $"gamma")
        .join(corpus.drop("gamma"), "docId")
        .select($"docId", $"counts", $"numTokens", $"gamma")
        .as[Doc]
        .localCheckpoint()

      corpus.unpersist()
      estep.unpersist()
      corpus = nextCorpus

      history = ll :: history
      if (iter > 0) {
        val rel = math.abs((ll - lastLL) / lastLL)
        if (rel <= cfg.convergence) converged = true
      }
      lastLL = ll
      iter += 1
    }

    LdaModel(k, numTerms, alpha, beta, lastLL, iter, history.reverse)
  }

  /** Held-out inference (reference D5): frozen model, one map-only E-step,
    * returns per-doc gamma and the held-out log-likelihood. */
  def infer(docs: Dataset[Doc], model: LdaModel, localIterations: Int = 100,
      seed: Long = 42L): (DataFrame, Double) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val out = EStep.run(docs,
      spark.sparkContext.broadcast(model.alpha),
      spark.sparkContext.broadcast(model.beta),
      model.numTerms, localIterations, randomStartGamma = false,
      learning = false, seed = seed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gamma = out.filter($"isDoc").select($"docId", $"gamma")
    val ll = out.filter($"isDoc").agg(sum($"ll")).as[Double].head()
    (gamma, ll)
  }
}
