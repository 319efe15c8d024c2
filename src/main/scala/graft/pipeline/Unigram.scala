package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer training (Kudo, ACL 2018 — the SentencePiece
 * algorithm): the second tokenizer family next to [[Tokenizer]]'s BPE,
 * with the same 100 TB scale split — the ONLY corpus-scale stage is the
 * distributed word-frequency aggregate; everything iterative runs over
 * that model-sized sufficient statistic on the driver, and encoding is
 * distributed again via a broadcast vocabulary.
 *
 *  1. Seed: every substring (≤ `maxPieceLen`) of the capped word table,
 *     weighted by word frequency; the `seedSize` heaviest multi-char
 *     candidates plus every single code point form the initial vocab.
 *  2. EM: per word, forward–backward over the segmentation lattice in
 *     log space (logsumexp — piece probabilities underflow doubles at
 *     realistic word lengths) accumulates expected piece counts; the
 *     M-step renormalizes. Two sub-iterations per round, SentencePiece's
 *     default.
 *  3. Prune: drop the lowest-expected-count multi-char pieces
 *     (`shrinkFactor` per round) until `targetVocab` remains — the
 *     standard reimplementation of SentencePiece's pruning step (the
 *     exact loss-delta ranking differs only on near-tied tails); single
 *     code points are never pruned, so every string stays segmentable.
 *  4. Encode: Viterbi (max-logprob segmentation) per word, distributed
 *     via `mapPartitions` with a broadcast piece table and the same
 *     per-partition word cache as the BPE encoder.
 *
 * All ordering is total (count desc, piece asc), so training is
 * deterministic for a given word-frequency table regardless of
 * partitioning — the property the golden specs pin.
 *
 * Every EM state handoff is ROUNDING-ANCHORED (the same device the
 * GMM/PCA/LR trainers use): forward/backward lattice values to 10dp,
 * posterior exponents to 10dp, expected counts to 4dp before the
 * M-step, log-probs to 8dp after it (and at init). The anchors absorb
 * the ≤1-ulp libm and summation-order differences between engines, so
 * the whole trajectory replays as unrolled SQL (`TokenizerOracles`)
 * instead of being a rows-only model output.
 */
object Unigram {

  // HALF_UP on the exact binary expansion — the repo's anchor convention
  // (mirrors DuckDB round(); Profiling.r6 precedent)
  private def rnd(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Learned model: piece → natural-log probability. */
  case class UnigramModel(logProbs: Map[String, Double], maxPieceLen: Int) {
    /** floor score for code points never seen in training: strictly below
      * every trained piece so unknowns never displace a learned arc */
    lazy val unkLogProb: Double =
      (logProbs.values.foldLeft(Double.MaxValue)(math.min)) - 10.0
  }

  case class Config(
      targetVocab: Int = 4000,
      seedSize: Int = 20000,
      maxPieceLen: Int = 8,
      emSubIters: Int = 2,
      shrinkFactor: Double = 0.75,
      maxWords: Int = 1000000,
      minFreq: Long = 1L,
      maxWordLen: Int = 48)

  /** Train on the corpus: one distributed word-frequency pass, then the
    * EM/prune loop over the capped driver-side table. */
  def train(df: DataFrame, textCol: String, cfg: Config = Config()): UnigramModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = Tokenizer.wordFrequencies(df, textCol)
      .filter($"freq" >= cfg.minFreq && length($"word") <= cfg.maxWordLen)
      .orderBy($"freq".desc, $"word".asc)
      .limit(cfg.maxWords)
      .as[(String, Long)]
      .collect()
    trainFromCounts(rows, cfg)
  }

  /** The exact EM/prune loop over an in-memory word-frequency table —
    * factored out so specs can drive it with hand-built fixtures. */
  private[graft] def trainFromCounts(wordFreqs: Seq[(String, Long)],
      cfg: Config): UnigramModel = {
    val words = wordFreqs.map(_._1).toArray
    val freqs = wordFreqs.map(_._2.toDouble).toArray

    // ---- seed: substring counts, chars always kept ----
    val subCounts = mutable.HashMap.empty[String, Double]
    val chars = mutable.Set.empty[String]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val f = freqs(wi)
      var i = 0
      while (i < w.length) {
        val cpLen = Character.charCount(w.codePointAt(i))
        chars += w.substring(i, i + cpLen)
        var j = i + cpLen
        while (j <= math.min(i + cfg.maxPieceLen, w.length)) {
          subCounts(w.substring(i, j)) = subCounts.getOrElse(w.substring(i, j), 0.0) + f
          j += 1
        }
        i += cpLen
      }
      wi += 1
    }
    val multi = subCounts.iterator.filterNot { case (p, _) => chars.contains(p) }
      .toArray.sortBy { case (p, c) => (-c, p) }.take(cfg.seedSize)
    var vocab: Array[String] = (chars.toArray ++ multi.map(_._1)).sorted
    // init probs ∝ seed counts (chars get their substring count too)
    var logP: mutable.HashMap[String, Double] = {
      val m = mutable.HashMap.empty[String, Double]
      val tot = vocab.iterator.map(p => subCounts.getOrElse(p, 1.0)).sum
      vocab.foreach(p => m(p) = rnd(math.log(subCounts.getOrElse(p, 1.0) / tot), 8))
      m
    }

    // ---- EM + prune rounds ----
    def emRound(): Unit = {
      var it = 0
      while (it < cfg.emSubIters) {
        val expected = mutable.HashMap.empty[String, Double]
        var k = 0
        while (k < words.length) {
          accumulateExpected(words(k), freqs(k), logP, cfg.maxPieceLen, expected)
          k += 1
        }
        // M-step over pieces with nonzero posterior mass; pieces never
        // reached keep a floor so they stay prunable-last, not NaN.
        // Expected counts anchor at 4dp and the total sums in SORTED
        // piece order — the engine-replayability contract (object doc).
        val c4 = vocab.iterator
          .map(p => p -> rnd(expected.getOrElse(p, 0.0), 4)).toSeq
        val tot = math.log(c4.iterator.map(_._2).sum)
        val floor = -1e9
        val next = mutable.HashMap.empty[String, Double]
        c4.foreach { case (p, c) =>
          next(p) = if (c > 0.0) rnd(math.log(c) - tot, 8) else floor
        }
        logP = next
        it += 1
      }
    }

    emRound()
    while (vocab.length > cfg.targetVocab) {
      val multiNow = vocab.filterNot(chars.contains)
      if (multiNow.isEmpty) { // target below the char alphabet: chars-only is final
        return UnigramModel(vocab.iterator.map(p => p -> logP(p)).toMap, cfg.maxPieceLen)
      }
      val keepMulti = math.max(cfg.targetVocab - chars.size,
        math.min(multiNow.length - 1, (multiNow.length * cfg.shrinkFactor).toInt))
      if (keepMulti >= multiNow.length) {
        // cannot shrink further (target below char count): stop
        vocab = (chars.toArray ++ multiNow).sorted
        emRound()
        return UnigramModel(vocab.iterator.map(p => p -> logP(p)).toMap, cfg.maxPieceLen)
      }
      val kept = multiNow.sortBy(p => (-logP(p), p)).take(keepMulti)
      vocab = (chars.toArray ++ kept).sorted
      // renormalize the survivors, then refit
      val keepSet = vocab.toSet
      val mass = {
        val logs = logP.iterator.collect { case (p, lp) if keepSet.contains(p) => lp }.toArray
        logsumexp(logs)
      }
      val renorm = mutable.HashMap.empty[String, Double]
      vocab.foreach(p => renorm(p) = rnd(logP(p) - mass, 8))
      logP = renorm
      emRound()
    }
    UnigramModel(vocab.iterator.map(p => p -> logP(p)).toMap, cfg.maxPieceLen)
  }

  /** forward–backward over one word's segmentation lattice (log space);
    * adds freq-weighted posterior arc mass into `expected` */
  private def accumulateExpected(w: String, freq: Double,
      logP: mutable.HashMap[String, Double], maxLen: Int,
      expected: mutable.HashMap[String, Double]): Unit = {
    val n = w.length
    if (n == 0) return
    val la = Array.fill(n + 1)(Double.NegativeInfinity); la(0) = 0.0
    val lb = Array.fill(n + 1)(Double.NegativeInfinity); lb(n) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      val buf = mutable.ArrayBuffer.empty[Double]
      while (j < i) {
        val lp = logP.get(w.substring(j, i))
        if (lp.isDefined && la(j) != Double.NegativeInfinity)
          buf += la(j) + lp.get
        j += 1
      }
      if (buf.nonEmpty) la(i) = rnd(logsumexp(buf.toArray), 10)
      i += 1
    }
    val z = la(n)
    if (z == Double.NegativeInfinity) return // unsegmentable (never: chars kept)
    i = n - 1
    while (i >= 0) {
      var j = i + 1
      val buf = mutable.ArrayBuffer.empty[Double]
      while (j <= math.min(i + maxLen, n)) {
        val lp = logP.get(w.substring(i, j))
        if (lp.isDefined && lb(j) != Double.NegativeInfinity)
          buf += lp.get + lb(j)
        j += 1
      }
      if (buf.nonEmpty) lb(i) = rnd(logsumexp(buf.toArray), 10)
      i -= 1
    }
    i = 0
    while (i < n) {
      var j = i + 1
      while (j <= math.min(i + maxLen, n)) {
        val piece = w.substring(i, j)
        val lp = logP.get(piece)
        if (lp.isDefined) {
          val post = rnd(la(i) + lp.get + lb(j) - z, 10)
          if (post > -30.0) { // exp(-30) ~ 1e-13: below is numerically irrelevant
            val m = freq * math.exp(post)
            expected(piece) = expected.getOrElse(piece, 0.0) + m
          }
        }
        j += 1
      }
      i += 1
    }
  }

  /** total corpus log-likelihood Σ freq·log Z(word) under a model —
    * spec hook (EM must not lose to a uniform assignment) */
  private[graft] def corpusLogLik(wordFreqs: Seq[(String, Long)],
      model: UnigramModel): Double = {
    val lp = mutable.HashMap.empty[String, Double]
    model.logProbs.foreach { case (k, v) => lp(k) = v }
    wordFreqs.iterator.map { case (w, f) =>
      val n = w.length
      val la = Array.fill(n + 1)(Double.NegativeInfinity); la(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - model.maxPieceLen)
        val buf = mutable.ArrayBuffer.empty[Double]
        while (j < i) {
          val p = lp.get(w.substring(j, i))
          if (p.isDefined && la(j) != Double.NegativeInfinity) buf += la(j) + p.get
          j += 1
        }
        if (buf.nonEmpty) la(i) = logsumexp(buf.toArray)
        i += 1
      }
      f * la(n)
    }.sum
  }

  private def logsumexp(xs: Array[Double]): Double = {
    val m = xs.max
    if (m == Double.NegativeInfinity) m
    else m + math.log(xs.iterator.map(x => math.exp(x - m)).sum)
  }

  /** Viterbi segmentation of one word: max-total-logprob split; unknown
    * code points score `unkLogProb` as single-char pieces. Ties break
    * toward the LONGER final piece (smaller split point scanned first
    * with strict improvement required afterwards). */
  private[graft] def viterbiEncode(w: String, model: UnigramModel): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(Double.NegativeInfinity); best(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - model.maxPieceLen)
      while (j < i) {
        val piece = w.substring(j, i)
        val lp = model.logProbs.get(piece) match {
          case Some(v) => v
          // single code point (possibly a surrogate pair) unseen in training
          case None if i - j <= 2 && w.codePointCount(j, i) == 1 => model.unkLogProb
          case None => Double.NegativeInfinity
        }
        if (lp != Double.NegativeInfinity && best(j) + lp > best(i)) {
          best(i) = best(j) + lp; back(i) = j
        }
        j += 1
      }
      i += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += w.substring(back(k), k); k = back(k) }
    out.reverseIterator.toSeq
  }

  /** The learned vocabulary as a frame: (piece, logprob) — logprob
    * rounded to 8dp so the row set is hash-stable across JVMs. */
  def vocabDf(spark: SparkSession, model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.logProbs.toSeq.sortBy(_._1)
      .map { case (p, lp) => (p, math.rint(lp * 1e8) / 1e8) }
      .toDF("piece", "logprob")
  }

  /** Persist the model as one parquet table (piece, logprob) — the
    * artifact a training pipeline ships; logprobs stored at full
    * precision so load⟲save is exact. */
  def saveModel(spark: SparkSession, model: UnigramModel, dir: String): Unit = {
    import spark.implicits._
    model.logProbs.toSeq.sortBy(_._1).toDF("piece", "logprob")
      .write.mode("overwrite").parquet(s"$dir/pieces")
  }

  /** Load a model persisted by [[saveModel]]. `maxPieceLen` is recovered
    * from the vocabulary itself (the DP only needs an upper bound on
    * piece length, and the longest stored piece IS that bound). */
  def loadModel(spark: SparkSession, dir: String): UnigramModel = {
    import spark.implicits._
    val pieces = spark.read.parquet(s"$dir/pieces")
      .select("piece", "logprob").as[(String, Double)].collect()
    UnigramModel(pieces.toMap, pieces.iterator.map(_._1.length).max)
  }

  /** Distributed Viterbi encode: (doc_id, tokens, n_tokens) — same
    * scale shape as [[Tokenizer.bpeEncode]] (broadcast model, cached
    * per-partition word→pieces map). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: UnigramModel, cacheCap: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cache = mutable.HashMap.empty[String, Seq[String]]
        it.map { case (id, text) =>
          // Locale.ROOT — must match Spark's locale-independent lower()
          // used at training time (see Tokenizer.bpeEncode)
          val ws =
            if (text == null) Array.empty[String]
            else text.toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)
          val toks = ws.iterator.flatMap { w =>
            cache.get(w) match {
              case Some(t) => t
              case None =>
                val t = viterbiEncode(w, model)
                if (cache.size < cacheCap) cache(w) = t
                t
            }
          }.toSeq
          (id, toks, toks.length)
        }
      }
      .toDF("doc_id", "tokens", "n_tokens")
  }
}
