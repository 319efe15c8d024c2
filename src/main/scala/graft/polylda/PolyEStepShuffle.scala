package graft.polylda

import graft.functions.GammaFuncs.{digamma, logAdd, logGamma}
import graft.lda.EStep.{randomElogBeta, updatePhiTerm}
import graft.model.PolyDoc
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}

private[polylda] case class PolyTermBeta(
    lang: Int, termId: Int, cnt: Int, elogbeta: Option[Array[Double]])
private[polylda] case class PolyDocWithBeta(
    docId: Long, gamma: Option[Array[Double]], terms: Seq[PolyTermBeta])

/**
 * Shuffle-join polylingual E-step — the scale path when Σ_l K×V_l exceeds
 * broadcast comfort (the polylda reference loads EVERY language's beta into
 * each mapper, polylda/DocumentMapper.java:116-123, compounding the vanilla
 * wall L times). Beta stays a distributed `(lang, termId, elogbeta[])`
 * table; the corpus is double-exploded (language map, then term map),
 * joined on (lang, termId), regrouped per doc, and the tied-gamma kernel
 * runs per document. Per-language counts and token totals are rebuilt from
 * the exploded terms, so nothing map-typed has to ride the groupBy key.
 * Only (docId, lang, termId, cnt) rides the term-keyed shuffle: gamma (K
 * doubles) joins back per DOC, mirroring the vanilla shuffle E-step's
 * payload discipline.
 */
object PolyEStepShuffle {

  /** The corpus double-exploded to its beta-join shape: (docId, lang,
    * termId, cnt), hash-partitioned by the join key. Depends only on
    * `counts`, so it is EM-loop-invariant — PolyTrainer hoists and
    * persists it once and passes it back via `run(preExploded = ...)`
    * (see [[graft.lda.EStepShuffle.explodeDocs]]). */
  def explodeDocs(docs: Dataset[PolyDoc]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // explode_outer + sentinels keep documents with empty maps in the
    // pipeline (same divergence guard as the vanilla shuffle E-step)
    docs.toDF()
      .select($"docId", explode_outer($"counts").as(Seq("lang", "langCounts")))
      .select($"docId", $"lang",
        explode_outer($"langCounts").as(Seq("termId", "cnt")))
      .select($"docId",
        coalesce($"lang", lit(-1)).as("lang"),
        coalesce($"termId", lit(-1)).as("termId"),
        coalesce($"cnt", lit(0)).as("cnt"))
      .repartition($"lang", $"termId")
  }

  /** @param beta (lang INT, termId INT, elogbeta ARRAY<DOUBLE> length K)
    * @param anchorGammaDp fixture-only per-sweep gamma anchor (see
    *                      [[graft.lda.EStep.run]]). 0 = off.
    * @param anchorPhiDp   fixture-only anchor on emitted log-phi. */
  def run(
      docs: Dataset[PolyDoc],
      alphaBc: Broadcast[Array[Double]],
      beta: DataFrame,
      numTermsPerLang: Map[Int, Int],
      localIterations: Int = 100,
      randomStartGamma: Boolean = false,
      learning: Boolean = true,
      seed: Long = 42L,
      phiFlushEntries: Int = 1 << 20,
      anchorGammaDp: Int = 0,
      anchorPhiDp: Int = 0,
      preExploded: Option[DataFrame] = None): Dataset[PolyEStepRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val exploded = preExploded.getOrElse(explodeDocs(docs))
    // left join: unseen (lang, term) pairs fall back to the seeded random
    // init in the kernel
    val bundles = exploded
      .join(beta.select($"lang", $"termId", $"elogbeta"), Seq("lang", "termId"), "left")
      .groupBy($"docId")
      .agg(collect_list(struct($"lang", $"termId", $"cnt", $"elogbeta")).as("terms"))
    // bundles is already hash-partitioned by docId from the agg, so this
    // join only shuffles the slim (docId, gamma) side
    val grouped = docs.toDF()
      .select($"docId", $"gamma")
      .join(bundles, Seq("docId"))
      .select($"docId", $"gamma", $"terms")
      .as[PolyDocWithBeta]

    grouped.mapPartitions { it =>
      val alpha = alphaBc.value
      val k = alpha.length
      val alphaSum = alpha.sum
      val likelihoodAlpha = logGamma(alphaSum) - alpha.map(logGamma).sum
      // partition-invariant ln α, hoisted out of the per-sweep reset (r15)
      val logAlpha = alpha.map(math.log)
      val betaFallback = new java.util.HashMap[Long, Array[Double]]()
      def fallback(lang: Int, termId: Int): Array[Double] = {
        val key = (lang.toLong << 32) | (termId.toLong & 0xFFFFFFFFL)
        var v = betaFallback.get(key)
        if (v == null) {
          v = randomElogBeta(k, termId, numTermsPerLang.getOrElse(lang, 1).max(1),
            seed ^ (lang.toLong << 17))
          betaFallback.put(key, v)
        }
        v
      }

      // (lang, termId) packed Long -> K-length per-topic log-phi sums —
      // one probe per (doc, lang, term), per-slot fold bit-identical (r16)
      val phiAcc = new java.util.HashMap[Long, Array[Double]]()
      def drainPhi(): Vector[PolyEStepRow] = {
        val b = Vector.newBuilder[PolyEStepRow]
        phiAcc.forEach { (key, arr) =>
          b += PolyEStepRow(isDoc = false, -1L, null, 0.0,
            (key >>> 32).toInt, (key & 0xFFFFFFFFL).toInt, arr)
        }
        phiAcc.clear()
        b.result()
      }

      val docRows = it.flatMap { doc =>
        // sorted: collect_list order is nondeterministic and the log-space
        // folds are not FP-associative (see EStepShuffle)
        val realTerms = doc.terms.filter(tb => tb.lang >= 0 && tb.termId >= 0)
          .sortBy(tb => (tb.lang, tb.termId))
        val nnz = realTerms.length
        val langs = new Array[Int](nnz)
        val termIds = new Array[Int](nnz)
        val termCnt = new Array[Int](nnz)
        val elogbeta = new Array[Array[Double]](nnz)
        val logCnt = new Array[Double](nnz) // ln(count), sweep-invariant (r15)
        var totalTokens = 0L
        var j = 0
        realTerms.foreach { tb =>
          langs(j) = tb.lang
          termIds(j) = tb.termId
          termCnt(j) = tb.cnt
          logCnt(j) = math.log(tb.cnt.toDouble)
          elogbeta(j) = tb.elogbeta.getOrElse(fallback(tb.lang, tb.termId))
          totalTokens += tb.cnt
          j += 1
        }

        val gamma: Array[Double] =
          doc.gamma match {
            case Some(g) if g.length == k && !randomStartGamma => g.clone()
            case _ => Array.tabulate(k)(i => alpha(i) + totalTokens.toDouble / k)
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
            val key = (langs(w).toLong << 32) | (termIds(w).toLong & 0xFFFFFFFFL)
            val acc = phiAcc.get(key)
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
              phiAcc.put(key, arr)
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

        // rebuild the per-language maps for the doc row (next corpus input)
        val counts = realTerms.groupBy(_.lang).map { case (l, ts) =>
          l -> ts.map(tb => tb.termId -> tb.cnt).toMap
        }
        val numTokens = realTerms.groupBy(_.lang).map { case (l, ts) =>
          l -> ts.map(_.cnt.toLong).sum
        }

        val row = PolyEStepRow(isDoc = true, doc.docId, gamma, docLL, -1, -1, null,
          counts, numTokens, totalTokens)
        if (phiAcc.size.toLong * k > phiFlushEntries) row +: drainPhi() else Vector(row)
      }

      val phiRows = new Iterator[PolyEStepRow] {
        private lazy val inner = drainPhi().iterator
        def hasNext: Boolean = inner.hasNext
        def next(): PolyEStepRow = inner.next()
      }
      docRows ++ phiRows
    }
  }
}
