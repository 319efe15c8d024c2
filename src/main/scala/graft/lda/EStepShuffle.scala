package graft.lda

import graft.functions.GammaFuncs.{digamma, logAdd, logGamma}
import graft.lda.EStep.{randomElogBeta, updatePhiTerm}
import graft.model.Doc
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}

/** One document with its terms' beta rows joined in (shuffle E-step input). */
private[lda] case class TermBeta(termId: Int, cnt: Int, elogbeta: Option[Array[Double]])
private[lda] case class DocWithBeta(
    docId: Long, numTokens: Long, gamma: Option[Array[Double]], terms: Seq[TermBeta])

/**
 * Shuffle-join E-step: the scale path for models too large to broadcast
 * (SURVEY.md §7.5 — at V=1M, K=100 the K×V beta is ~800 MB; the reference
 * hits the same wall loading whole beta per mapper, DocumentMapper.java:116).
 *
 * Instead of shipping beta to every task, beta lives as a distributed
 * `(termId, elogbeta array<double>)` table: the corpus is exploded to
 * (doc, term) rows, shuffle-joined with beta on termId, regrouped per doc,
 * and the identical fixed-point kernel (EStep.updatePhiTerm) runs per
 * document. Each task holds only the beta rows its documents reference.
 * Cost: two extra shuffles per iteration (join + regroup) — the classic
 * broadcast-vs-shuffle tradeoff, selected by Trainer on model size.
 */
object EStepShuffle {

  /** The corpus exploded to its beta-join shape: (docId, termId, cnt),
    * hash-partitioned by termId. This frame depends only on `counts`, so
    * it is EM-LOOP-INVARIANT even as the trainer rotates gamma into the
    * corpus each iteration — Trainer hoists and persists it once and
    * passes it back via `run(preExploded = ...)`, after which the
    * per-iteration beta join shuffles only the model-sized beta side
    * (the corpus-nnz-sized exchange happens exactly once per training
    * run instead of once per iteration). */
  def explodeDocs(docs: Dataset[Doc]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    docs.toDF()
      .select($"docId", explode_outer($"counts").as(Seq("termId", "cnt")))
      .select($"docId",
        coalesce($"termId", lit(-1)).as("termId"),
        coalesce($"cnt", lit(0)).as("cnt"))
      .repartition($"termId")
  }

  /** @param beta (termId INT, elogbeta ARRAY<DOUBLE> length K)
    * @param anchorGammaDp fixture-only per-sweep gamma anchor (see
    *                      [[EStep.run]]; the planted shuffle-path
    *                      replay uses it). 0 = off.
    * @param anchorPhiDp   fixture-only anchor on emitted log-phi. */
  def run(
      docs: Dataset[Doc],
      alphaBc: Broadcast[Array[Double]],
      beta: DataFrame,
      numTerms: Int,
      localIterations: Int = 100,
      randomStartGamma: Boolean = false,
      learning: Boolean = true,
      seed: Long = 42L,
      phiFlushEntries: Int = 1 << 20,
      anchorGammaDp: Int = 0,
      anchorPhiDp: Int = 0,
      preExploded: Option[DataFrame] = None): Dataset[EStepRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // explode_outer + sentinel keeps documents with EMPTY counts in the
    // pipeline (a plain explode would silently drop them from gamma/LL,
    // diverging from the broadcast path); term ids are 1-based so -1 is free.
    // Only (docId, termId, cnt) rides the term-keyed shuffle: gamma (K
    // doubles) and numTokens join back per DOC below — carrying them on the
    // exploded rows would multiply the gamma payload by nnz across two
    // shuffles (at K=100, nnz=500 that is ~800 KB/doc instead of ~800 B).
    // The trainer passes the persisted loop-invariant frame; a direct call
    // (planted replays, held-out inference) derives it per invocation.
    val exploded = preExploded.getOrElse(explodeDocs(docs))
    // left join: unseen terms fall back to the seeded random init in the kernel
    val bundles = exploded
      .join(beta.select($"termId", $"elogbeta"), Seq("termId"), "left")
      .groupBy($"docId")
      .agg(collect_list(struct($"termId", $"cnt", $"elogbeta")).as("terms"))
    // bundles is already hash-partitioned by docId from the agg, so this
    // join only shuffles the slim (docId, numTokens, gamma) side
    val grouped = docs.toDF()
      .select($"docId", $"numTokens", $"gamma")
      .join(bundles, Seq("docId"))
      .select($"docId", $"numTokens", $"gamma", $"terms")
      .as[DocWithBeta]

    grouped.mapPartitions { it =>
      val alpha = alphaBc.value
      val k = alpha.length
      val alphaSum = alpha.sum
      val likelihoodAlpha = logGamma(alphaSum) - alpha.map(logGamma).sum
      // partition-invariant ln α, hoisted out of the per-sweep reset (r15)
      val logAlpha = alpha.map(math.log)
      val betaFallback = new java.util.HashMap[Int, Array[Double]]()

      // termId -> K-length log-space phi sums (slot i ↔ topic i+1) — one
      // probe per (doc, term), bit-identical per-slot fold; see EStep (r16)
      val phiAcc = new java.util.HashMap[Int, Array[Double]]()
      def drainPhi(): Vector[EStepRow] = {
        val b = Vector.newBuilder[EStepRow]
        phiAcc.forEach { (termId, arr) =>
          b += EStepRow(isDoc = false, -1L, null, 0.0, termId, arr)
        }
        phiAcc.clear()
        b.result()
      }

      val docRows = it.flatMap { doc =>
        // sortBy: collect_list order is task-scheduling-dependent, and the
        // log-space folds below are not FP-associative — sorting makes
        // shuffle-mode training run-to-run reproducible
        val realTerms = doc.terms.filter(_.termId >= 0).sortBy(_.termId)
        val nnz = realTerms.length
        val termIds = new Array[Int](nnz)
        val termCnt = new Array[Int](nnz)
        val elogbeta = new Array[Array[Double]](nnz)
        val logCnt = new Array[Double](nnz) // ln(count), sweep-invariant (r15)
        var j = 0
        realTerms.foreach { tb =>
          termIds(j) = tb.termId
          termCnt(j) = tb.cnt
          logCnt(j) = math.log(tb.cnt.toDouble)
          elogbeta(j) = tb.elogbeta.getOrElse {
            var v = betaFallback.get(tb.termId)
            if (v == null) {
              v = randomElogBeta(k, tb.termId, numTerms, seed)
              betaFallback.put(tb.termId, v)
            }
            v
          }
          j += 1
        }

        val gamma: Array[Double] =
          doc.gamma match {
            case Some(g) if g.length == k && !randomStartGamma => g.clone()
            case _ => Array.tabulate(k)(i => alpha(i) + doc.numTokens.toDouble / k)
          }
        val updateLogGamma = new Array[Double](k)
        val logPhi = Array.ofDim[Double](nnz, k)
        var likelihoodPhi = 0.0

        var sweep = 1
        var continue = true
        while (continue) {
          likelihoodPhi = 0.0
          var i = 0
          while (i < k) {
            gamma(i) = digamma(gamma(i))
            updateLogGamma(i) = logAlpha(i)
            i += 1
          }
          var w = 0
          while (w < nnz) {
            likelihoodPhi += updatePhiTerm(k, termCnt(w), logCnt(w), elogbeta(w),
              gamma, logPhi(w), updateLogGamma)
            w += 1
          }
          i = 0
          while (i < k) {
            gamma(i) = math.exp(updateLogGamma(i))
            if (anchorGammaDp > 0)
              gamma(i) = BigDecimal(gamma(i))
                .setScale(anchorGammaDp, BigDecimal.RoundingMode.HALF_UP).toDouble
            i += 1
          }
          sweep += 1
          continue = sweep < localIterations
        }

        var sumGamma = 0.0
        var likelihoodGamma = 0.0
        var i = 0
        while (i < k) { sumGamma += gamma(i); likelihoodGamma += logGamma(gamma(i)); i += 1 }
        likelihoodGamma -= logGamma(sumGamma)
        val docLL = likelihoodAlpha + likelihoodGamma + likelihoodPhi

        if (learning) {
          var w = 0
          while (w < nnz) {
            val lp = logPhi(w)
            val acc = phiAcc.get(termIds(w))
            if (acc == null) {
              val arr = new Array[Double](k)
              i = 0
              while (i < k) {
                arr(i) = if (anchorPhiDp > 0)
                  BigDecimal(lp(i)).setScale(anchorPhiDp,
                    BigDecimal.RoundingMode.HALF_UP).toDouble
                else lp(i)
                i += 1
              }
              phiAcc.put(termIds(w), arr)
            } else {
              i = 0
              while (i < k) {
                val v = if (anchorPhiDp > 0)
                  BigDecimal(lp(i)).setScale(anchorPhiDp,
                    BigDecimal.RoundingMode.HALF_UP).toDouble
                else lp(i)
                acc(i) = logAdd(acc(i), v)
                i += 1
              }
            }
            w += 1
          }
        }

        val row = EStepRow(isDoc = true, doc.docId, gamma, docLL, -1, null,
          realTerms.map(tb => tb.termId -> tb.cnt).toMap, doc.numTokens)
        if (phiAcc.size.toLong * k > phiFlushEntries) row +: drainPhi() else Vector(row)
      }

      val phiRows = new Iterator[EStepRow] {
        private lazy val inner = drainPhi().iterator
        def hasNext: Boolean = inner.hasNext
        def next(): EStepRow = inner.next()
      }
      docRows ++ phiRows
    }
  }
}
