package graft.polylda

import graft.functions.GammaFuncs.{digamma, logAdd, logGamma}
import graft.lda.EStep.{randomElogBeta, updatePhiTerm}
import graft.model.PolyDoc
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset

/**
 * One polylingual E-step output row; doc rows carry the tied gamma, phi rows
 * are keyed (lang 0.., termId) and carry the K-length per-topic log-phi
 * array (`logphi(i)` ↔ topic i+1) — the reference's TripleOfInts stream
 * (polylda/DocumentMapper.java:290-296) packed K-per-row like the vanilla
 * [[graft.lda.EStepRow]] (r16): K× fewer encoder rows per partition, the
 * per-slot fold unchanged. Consumers posexplode back to
 * (lang, topic, termId, logphi) via [[PolyTrainer.explodePhi]].
 */
case class PolyEStepRow(
    isDoc: Boolean,
    docId: Long,
    gamma: Array[Double],
    ll: Double,
    lang: Int,
    termId: Int,
    logphi: Array[Double],
    /** doc rows carry the full document (like the reference's gamma side
      * output) so next iteration's corpus needs no rotation join. */
    counts: Map[Int, Map[Int, Int]] = null,
    numTokens: Map[Int, Long] = null,
    totalTokens: Long = 0L)

/**
 * Tied-gamma multilingual variational E-step (reference:
 * cc/mrlda/polylda/DocumentMapper.java:185-305): one gamma per document,
 * fixed-point sweeps iterate every language's terms against that language's
 * beta matrix; per-(lang, topic, term) phi statistics feed the per-language
 * M-step. The per-term math is the exact kernel shared with vanilla LDA
 * (cc.mrlda.DocumentMapper.updatePhi is literally called from the polylda
 * mapper at polylda/DocumentMapper.java:245-247).
 */
object PolyEStep {

  /**
   * @param betaBc per-language model: lang -> (termId -> E[log β] over topics).
   * @param numTermsPerLang vocabulary size per language (drives the random
   *                        init scale for unseen terms, per language like the
   *                        reference's numberOfTerms[languageIndex]).
   */
  /**
   * @param anchorGammaDp fixture-only rounding anchor on each sweep's
   *                      gamma handoff (see [[graft.lda.EStep.run]];
   *                      used by the planted polylda replay). 0 = off.
   * @param anchorPhiDp   fixture-only anchor on emitted log-phi before
   *                      the partition combiner folds them. 0 = off.
   */
  def run(
      docs: Dataset[PolyDoc],
      alphaBc: Broadcast[Array[Double]],
      betaBc: Broadcast[Map[Int, scala.collection.Map[Int, Array[Double]]]],
      numTermsPerLang: Map[Int, Int],
      localIterations: Int = 100,
      randomStartGamma: Boolean = false,
      learning: Boolean = true,
      seed: Long = 42L,
      phiFlushEntries: Int = 1 << 20,
      anchorGammaDp: Int = 0,
      anchorPhiDp: Int = 0): Dataset[PolyEStepRow] = {
    import docs.sparkSession.implicits._

    docs.mapPartitions { it =>
      val alpha = alphaBc.value
      val k = alpha.length
      val beta = betaBc.value
      val betaFallback = new java.util.HashMap[Long, Array[Double]]()
      def elogbeta(lang: Int, termId: Int): Array[Double] = {
        val hit = beta.getOrElse(lang, scala.collection.Map.empty[Int, Array[Double]])
          .getOrElse(termId, null)
        if (hit != null) hit
        else {
          val key = (lang.toLong << 32) | (termId.toLong & 0xFFFFFFFFL)
          var v = betaFallback.get(key)
          if (v == null) {
            v = randomElogBeta(k, termId, numTermsPerLang.getOrElse(lang, 1).max(1),
              seed ^ (lang.toLong << 17))
            betaFallback.put(key, v)
          }
          v
        }
      }

      val alphaSum = alpha.sum
      val likelihoodAlpha = logGamma(alphaSum) - alpha.map(logGamma).sum
      // partition-invariant ln α, hoisted out of the per-sweep reset (r15)
      val logAlpha = alpha.map(math.log)

      // partition-level combiner keyed (lang, termId) — packed into one
      // Long — holding the K-length per-topic array; one probe per
      // (doc, lang, term), per-slot fold bit-identical to the old
      // per-(lang, topic, term) sequence (r16; see graft.lda.EStep).
      // Flushed under the same memory budget (entries × K).
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
        // flatten the language maps once per doc
        val langs = doc.counts.keys.toArray.sorted
        val langTermIds = langs.map(l => doc.counts(l).keys.toArray)
        val langTermCnt = langs.indices.map { li =>
          val l = langs(li); langTermIds(li).map(doc.counts(l))
        }.toArray
        // sweep-invariant per-term E[log β] rows and ln(count), resolved
        // once per document (r15; identical values — see EStep)
        val langLb = langs.indices.map { li =>
          val l = langs(li)
          langTermIds(li).map(elogbeta(l, _))
        }.toArray
        val langLogCnt = langs.indices.map { li =>
          langTermCnt(li).map(c => math.log(c.toDouble))
        }.toArray

        val gamma: Array[Double] =
          doc.gamma match {
            case Some(g) if g.length == k && !randomStartGamma => g.clone()
            case _ => Array.tabulate(k)(i => alpha(i) + doc.totalTokens.toDouble / k)
          }
        val updateLogGamma = new Array[Double](k)
        val logPhi = langs.indices.map(li => Array.ofDim[Double](langTermIds(li).length, k)).toArray
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
          var li = 0
          while (li < langs.length) {
            val ids = langTermIds(li)
            val cnts = langTermCnt(li)
            val lbs = langLb(li)
            val lcs = langLogCnt(li)
            val lps = logPhi(li)
            var w = 0
            while (w < ids.length) {
              likelihoodPhi += updatePhiTerm(k, cnts(w), lcs(w), lbs(w),
                gamma, lps(w), updateLogGamma)
              w += 1
            }
            li += 1
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
          var li = 0
          while (li < langs.length) {
            val lang = langs(li)
            val ids = langTermIds(li)
            val lps = logPhi(li)
            var w = 0
            while (w < ids.length) {
              val lp = lps(w)
              val key = (lang.toLong << 32) | (ids(w).toLong & 0xFFFFFFFFL)
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
            li += 1
          }
        }

        val row = PolyEStepRow(isDoc = true, doc.docId, gamma, docLL, -1, -1, null,
          doc.counts, doc.numTokens, doc.totalTokens)
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
