package graft

import graft.corpus.ParseCorpus
import graft.lda.{EStep, MStep}
import org.apache.spark.sql.functions._

/** The fused broadcast-mode iteration must reproduce the distributed
  * M-step exactly: same E[log beta] per (topic, term), same likelihood and
  * alpha statistics as the unfused jobs. */
class FusedMStepSpec extends SparkSpec {
  import spark.implicits._

  private def estepOut = {
    val docs = Seq(
      "apple banana cherry apple", "banana apple zinc", "cherry banana fruit apple",
      "iron copper zinc", "copper iron iron banana", "zinc copper metal")
      .zipWithIndex.map { case (t, i) => (i.toLong, s"d$i", t) }
      .toDF("docId", "title", "text")
    val parsed = ParseCorpus.run(docs)
    val k = 3
    val alphaBc = spark.sparkContext.broadcast(Array.fill(k)(0.1))
    val betaBc = spark.sparkContext.broadcast(
      Map.empty: scala.collection.Map[Int, Array[Double]])
    (EStep.run(parsed.docs, alphaBc, betaBc, parsed.stats.numTerms.toInt,
      localIterations = 10, randomStartGamma = false, learning = true, seed = 7L)
      .persist(), k)
  }

  test("fused iteration equals the distributed M-step and stats jobs") {
    val (estep, k) = estepOut
    try {
      // distributed path
      val betaDistributed = MStep.run(MStep.explodePhi(estep.toDF()), None)
        .collect()
        .map(r => (r.getAs[Int]("topic"), r.getAs[Int]("termId")) -> r.getAs[Double]("elogbeta"))
        .toMap
      val (llD, ssD) = MStep.llAndAlphaStats(estep.filter($"isDoc").toDF(), k)

      // fused path
      val (llF, ssF, lambda) = MStep.splitFused(
        MStep.fusedIterationRows(estep.toDF()).collect(), k)
      val (betaMap, rows) = MStep.finishBetaOnDriver(lambda, k, None)

      assert(math.abs(llF - llD) < 1e-9)
      ssD.zip(ssF).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
      assert(rows.size == betaDistributed.size)
      rows.foreach { case (topic, termId, e) =>
        assert(math.abs(e - betaDistributed((topic, termId))) < 1e-9,
          s"mismatch at ($topic, $termId)")
      }
      // the driver map agrees with the row form
      rows.foreach { case (topic, termId, e) =>
        assert(betaMap(termId)(topic - 1) == e)
      }
    } finally estep.unpersist()
  }
}
