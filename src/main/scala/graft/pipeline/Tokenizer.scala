package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE tokenizer training — the missing piece between the
 * token-count proxies in [[TextAnalysis]] and a real training-data
 * pipeline: learn the merge table FROM the corpus, then encode the
 * corpus WITH it.
 *
 * Scale shape (the same one every production tokenizer trainer uses —
 * corpus-scale work is counting, model-scale work is merging):
 *
 *  1. `wordFrequencies` — ONE distributed pass: explode lowercased
 *     whitespace words, hash-aggregate to (word, freq). Map-side
 *     combining makes the shuffle vocabulary-sized, not corpus-sized;
 *     at 100 TB this is the only stage that touches every byte.
 *  2. `trainBpe` — cap the frequency table to the `maxWords` heaviest
 *     words (freq desc, word asc — deterministic) and collect it: the
 *     capped table is MODEL-sized by construction (same contract as
 *     LDA's K×V beta collect in broadcast mode), and the dropped tail
 *     is frequency-1 noise that cannot win a merge anyway. The exact
 *     Sennrich merge loop then runs driver-side over that sufficient
 *     statistic with incremental pair-count maintenance.
 *  3. `bpeEncode` — distributed again: broadcast the (tiny) merge-rank
 *     map and greedily merge per word inside `mapPartitions`, with a
 *     per-partition word→tokens cache (Zipf makes the hit rate high).
 *
 * Reference behavior anchor: the reference tokenizes with Lucene
 *  analyzers at parse time (ParseCorpus.java:244-293) and never learns
 * subwords; BPE is the training-pipeline extension this engine adds.
 *
 * Algorithm: Sennrich, Haddow & Birch, "Neural Machine Translation of
 * Rare Words with Subword Units" (ACL 2016). Words end with an explicit
 * `</w>` symbol; pair selection is (count desc, left asc, right asc) —
 * a total order, so training is deterministic for a given word-frequency
 * table regardless of partitioning.
 */
object Tokenizer {

  val EndOfWord = "</w>"

  /** Learned model: merges in rank order plus the final symbol vocab. */
  case class BpeModel(merges: Seq[(String, String)], vocab: Seq[String]) {
    /** (left, right) → rank, rank 0 merged first. */
    lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Corpus word-frequency table: one row per distinct lowercased
    * whitespace word with its total occurrence count. The one
    * corpus-scale stage of tokenizer training (oracle-able in plain
    * SQL; the merge loop is not). */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
  }

  /**
   * Learn `numMerges` BPE merges from the corpus. `maxWords` bounds the
   * driver-side sufficient statistic (top words by freq desc, word asc);
   * `minFreq` drops words rarer than the threshold before the cap (the
   * standard trainer knob — a freq-1 tail pair can never beat a real
   * merge, so dropping it changes nothing but the constant).
   */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1000000, minFreq: Long = 1L): BpeModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = wordFrequencies(df, textCol)
      .filter($"freq" >= minFreq)
      .orderBy($"freq".desc, $"word".asc)
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
    trainFromCounts(rows, numMerges)
  }

  /** The exact merge loop over an in-memory word-frequency table —
    * factored out so specs can drive it with hand-built fixtures. */
  private[graft] def trainFromCounts(wordFreqs: Seq[(String, Long)],
      numMerges: Int): BpeModel = {
    // each word as a mutable symbol sequence (code points, then </w>)
    val words: Array[mutable.ArrayBuffer[String]] =
      wordFreqs.map { case (w, _) => toSymbols(w) }.toArray
    val freqs: Array[Long] = wordFreqs.map(_._2).toArray

    // pair → corpus count, and pair → indices of words containing it;
    // maintained incrementally: a merge only touches words that contain
    // the merged pair, so each iteration costs O(affected symbols), not
    // O(corpus vocabulary)
    val stats = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def addWord(i: Int, sign: Long): Unit = {
      val syms = words(i)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val n = stats.getOrElse(p, 0L) + sign * freqs(i)
        if (n == 0L) { stats.remove(p); where.get(p).foreach(_.remove(i)) }
        else {
          stats(p) = n
          if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += i
        }
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < numMerges && stats.nonEmpty) {
      // argmax under the total order (count desc, left asc, right asc)
      var best: (String, String) = null
      var bestN = 0L
      stats.foreach { case (p, n) =>
        if (best == null || n > bestN ||
            (n == bestN && (p._1 < best._1 ||
              (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestN = n
        }
      }
      merges += best
      val merged = best._1 + best._2
      // rewrite only the words that contain the winning pair
      val affected = where.getOrElse(best, mutable.Set.empty).toArray
      affected.foreach { i =>
        addWord(i, -1L)
        words(i) = mergePair(words(i), best._1, best._2, merged)
        addWord(i, 1L)
      }
      stats.remove(best)
      where.remove(best)
      m += 1
    }

    val vocab = (words.iterator.flatten ++
        merges.iterator.map { case (a, b) => a + b }).toSeq.distinct.sorted
    BpeModel(merges.toSeq, vocab)
  }

  /** word → code-point symbols + explicit end-of-word marker */
  private def toSymbols(w: String): mutable.ArrayBuffer[String] = {
    val buf = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      buf += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    buf += EndOfWord
    buf
  }

  /** left-to-right non-overlapping replacement of the adjacent pair */
  private def mergePair(syms: mutable.ArrayBuffer[String], a: String,
      b: String, merged: String): mutable.ArrayBuffer[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += merged; j += 2
      } else { out += syms(j); j += 1 }
    }
    out
  }

  /** GPT-2-style greedy encode of one word: repeatedly merge the
    * lowest-rank adjacent pair until none applies. Reproduces the
    * training segmentation for any word seen with these merges. */
  private[graft] def encodeWord(w: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = toSymbols(w)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestJ = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestJ = j }
        j += 1
      }
      if (bestJ < 0) done = true
      else syms = mergePair(syms, syms(bestJ), syms(bestJ + 1),
        syms(bestJ) + syms(bestJ + 1))
    }
    syms.toSeq
  }

  /** The learned merge table as a frame: (rank, left, right, merged). */
  def mergesDf(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b, a + b) }
      .toDF("rank", "left", "right", "merged")
  }

  /** Dense integer ids for the model vocabulary: position in the sorted
    * vocab — deterministic, so ids are stable across save/load. */
  def vocabIds(model: BpeModel): Map[String, Int] =
    model.vocab.zipWithIndex.toMap

  /** Persist a trained model as two parquet tables (`merges` in rank
    * order, `vocab` with dense ids) — the tokenizer-artifact layout a
    * training pipeline ships to every consumer job. */
  def saveModel(spark: SparkSession, model: BpeModel, dir: String): Unit = {
    import spark.implicits._
    mergesDf(spark, model).write.mode("overwrite").parquet(s"$dir/merges")
    vocabIds(model).toSeq.sortBy(_._2).toDF("piece", "id")
      .write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Load a model persisted by [[saveModel]]; merges come back in rank
    * order and the vocab in id order, so `loadModel(saveModel(m)) == m`. */
  def loadModel(spark: SparkSession, dir: String): BpeModel = {
    import spark.implicits._
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    val vocab = spark.read.parquet(s"$dir/vocab")
      .orderBy("id").select("piece").as[String].collect().toSeq
    BpeModel(merges, vocab)
  }

  /**
   * Distributed encode: (id, tokens, n_tokens) per document. The merge
   * table is driver-held (model-sized) and closure-broadcast; the scan
   * is one `mapPartitions` with a per-partition word→tokens cache
   * (capped — Zipf means the hot head covers most token mass, and the
   * cap keeps a pathological all-distinct partition from growing the
   * map without bound).
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel, cacheCap: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = model.ranks
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cache = mutable.HashMap.empty[String, Seq[String]]
        it.map { case (id, text) =>
          // Locale.ROOT: training lowercased via Spark's locale-independent
          // lower(); a tr-TR executor default would turn "I" into "ı", a
          // symbol training never saw
          val words =
            if (text == null) Array.empty[String]
            else text.toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)
          val toks = words.iterator.flatMap { w =>
            cache.get(w) match {
              case Some(t) => t
              case None =>
                val t = encodeWord(w, ranks)
                if (cache.size < cacheCap) cache(w) = t
                t
            }
          }.toSeq
          (id, toks, toks.length)
        }
      }
      .toDF("doc_id", "tokens", "n_tokens")
  }

  /**
   * Tokenizer fertility by group (usually language): the standard
   * multilingual-tokenizer evaluation — `tokens_per_word` (subword
   * fertility; 1.0 = every word is one piece) and `bytes_per_token`
   * (compression; higher = cheaper text) from encoding the corpus with a
   * trained model. Languages the vocabulary under-serves show up as
   * fertility outliers, which is exactly the signal a token-budget mix
   * planner needs next to raw token counts.
   *
   * Word/byte totals use the encode's own normalization (lowercased
   * whitespace words, byte lengths of the words themselves — separators
   * excluded so the metric is about the vocabulary, not the whitespace).
   * All-integer sums; the two ratios are rounded at 6dp behind a +1e-9
   * boundary dodge (exact rationals can land on round() half-boundaries,
   * the q_impute device).
   */
  def fertilityByGroup(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val enc = bpeEncode(df, idCol, textCol, model)
      .select($"doc_id", $"n_tokens".cast("long").as("n_tokens"))
    val toks = TextAnalysis.wsTokens(lower(col(textCol)))
    val words = df.select(col(idCol).cast("long").as("doc_id"),
      col(groupCol).as("__grp"),
      size(toks).cast("long").as("n_words"),
      octet_length(array_join(toks, "")).cast("long").as("word_bytes"))
    words.join(enc, "doc_id")
      .groupBy($"__grp")
      .agg(sum($"n_tokens").as("n_tokens"), sum($"n_words").as("n_words"),
        sum($"word_bytes").as("word_bytes"))
      .select($"__grp".as(groupCol), $"n_tokens", $"n_words", $"word_bytes",
        round($"n_tokens" / $"n_words" + lit(1e-9), 6).as("tokens_per_word"),
        round($"word_bytes" / $"n_tokens" + lit(1e-9), 6).as("bytes_per_token"))
  }

  /** Encode to dense integer ids (what a training pipeline actually
    * feeds the model): the id lookup rides in the same `mapPartitions`
    * closure as the merge table — NOT a plan-literal map, which would
    * bloat every task's serialized plan at a real vocab size. Tokens
    * outside the vocab (an unseen code point's char piece) map to -1 —
    * the caller's OOV policy decides (real deployments add a
    * byte-fallback alphabet so -1 never occurs). */
  def bpeEncodeIds(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = vocabIds(model)
    bpeEncode(df, idCol, textCol, model)
      .as[(Long, Seq[String], Int)]
      .mapPartitions(_.map { case (id, toks, n) =>
        (id, toks.map(ids.getOrElse(_, -1)), n)
      })
      .toDF("doc_id", "token_ids", "n_tokens")
  }

  // ===================== WordPiece =====================

  /** Continuation-piece marker (BERT convention). */
  val WpCont = "##"
  val WpUnk = "[UNK]"

  /** Strip the continuation marker if present. */
  private def wpBody(s: String): String =
    if (s.startsWith(WpCont)) s.substring(WpCont.length) else s

  /** word → WordPiece symbols: first code point plain, the rest
    * ##-prefixed (no end-of-word marker — continuation is positional). */
  private def toSymbolsWp(w: String): mutable.ArrayBuffer[String] = {
    val buf = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val s = new String(Character.toChars(cp))
      buf += (if (i == 0) s else WpCont + s)
      i += Character.charCount(cp)
    }
    buf
  }

  /**
   * Learn a WordPiece vocabulary: the same incremental merge loop as BPE
   * but pairs are chosen by the WordPiece LIKELIHOOD score
   * count(ab) / (count(a)·count(b)) instead of raw count — the pair whose
   * merge most increases corpus likelihood under a unigram piece model.
   * Scores are compared by Long cross-multiplication (no FP), ties by
   * (left, right) lexicographic, so training is exactly reproducible.
   * Continuation pieces carry the BERT `##` prefix; merging keeps it on
   * the left symbol only (`a`+`##b`→`ab`, `##a`+`##b`→`##ab`).
   */
  def trainWordpiece(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1000000, minFreq: Long = 1L): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = wordFrequencies(df, textCol)
      .filter($"freq" >= minFreq)
      .orderBy($"freq".desc, $"word".asc)
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
    trainWordpieceFromCounts(rows, numMerges)
  }

  /** The exact WordPiece merge loop over an in-memory word-frequency
    * table — factored out so specs can drive it with hand fixtures. */
  private[graft] def trainWordpieceFromCounts(wordFreqs: Seq[(String, Long)],
      numMerges: Int): Seq[String] = {
    val words: Array[mutable.ArrayBuffer[String]] =
      wordFreqs.map { case (w, _) => toSymbolsWp(w) }.toArray
    val freqs: Array[Long] = wordFreqs.map(_._2).toArray

    val pairStats = mutable.HashMap.empty[(String, String), Long]
    val symStats = mutable.HashMap.empty[String, Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def addWord(i: Int, sign: Long): Unit = {
      val syms = words(i)
      var j = 0
      while (j < syms.length) {
        val n = symStats.getOrElse(syms(j), 0L) + sign * freqs(i)
        if (n == 0L) symStats.remove(syms(j)) else symStats(syms(j)) = n
        if (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          val c = pairStats.getOrElse(p, 0L) + sign * freqs(i)
          if (c == 0L) { pairStats.remove(p); where.get(p).foreach(_.remove(i)) }
          else {
            pairStats(p) = c
            if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += i
          }
        }
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    // the vocab must keep the ALPHABET and every intermediate merged
    // piece, not just each word's final segmentation: greedy
    // longest-match can take a longer prefix than training did and then
    // need a shorter piece (or a single character) to finish the word —
    // dropping intermediates would dead-end such words to [UNK] even on
    // the training corpus. (Real WordPiece vocabularies are exactly
    // alphabet + merge results for the same reason.)
    val vocabAcc = mutable.LinkedHashSet.empty[String]
    words.iterator.flatten.foreach(vocabAcc += _)

    var m = 0
    while (m < numMerges && pairStats.nonEmpty) {
      // argmax of n/(ca·cb) via cross-multiplication: n1·ca2·cb2 vs
      // n2·ca1·cb1 (BigInt: three-way products of corpus-scale counts
      // overflow Long at ~2^21 tokens)
      var best: (String, String) = null
      var bestN = 0L
      var bestDen = BigInt(0)
      pairStats.foreach { case (p, n) =>
        val den = BigInt(symStats(p._1)) * BigInt(symStats(p._2))
        val better =
          if (best == null) true
          else {
            val l = BigInt(n) * bestDen
            val r = BigInt(bestN) * den
            l > r || (l == r && (p._1 < best._1 ||
              (p._1 == best._1 && p._2 < best._2)))
          }
        if (better) { best = p; bestN = n; bestDen = den }
      }
      val merged = wpMerge(best._1, best._2)
      vocabAcc += merged
      val affected = where.getOrElse(best, mutable.Set.empty).toArray
      affected.foreach { i =>
        addWord(i, -1L)
        words(i) = mergePair(words(i), best._1, best._2, merged)
        addWord(i, 1L)
      }
      pairStats.remove(best)
      where.remove(best)
      m += 1
    }

    (vocabAcc.toSeq :+ WpUnk).distinct.sorted
  }

  /** `a`+`##b` → `ab`; `##a`+`##b` → `##ab`. */
  private def wpMerge(a: String, b: String): String = a + wpBody(b)

  /**
   * WordPiece ENCODE: greedy longest-match-first against the vocabulary
   * (the standard BERT inference algorithm — independent of how the
   * vocab was trained). A word with any unmatchable remainder becomes a
   * single [UNK]. Distributed exactly like [[bpeEncode]]: stateless
   * `mapPartitions` with a per-partition word cache, map-only plan.
   */
  def wordpieceEncode(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], cacheCap: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vset = vocab.toSet
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val cache = mutable.HashMap.empty[String, Seq[String]]
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)
          val toks = words.iterator.flatMap { w =>
            cache.get(w) match {
              case Some(t) => t
              case None =>
                val t = wpEncodeWord(w, vset)
                if (cache.size < cacheCap) cache(w) = t
                t
            }
          }.toSeq
          (id, toks, toks.length)
        }
      }
      .toDF("doc_id", "tokens", "n_tokens")
  }

  private[graft] def wpEncodeWord(w: String, vocab: Set[String]): Seq[String] = {
    if (w.isEmpty) return Seq.empty
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      var j = w.length
      var foundEnd = -1
      var found: String = null
      while (found == null && j > i) {
        // a candidate boundary may not split a surrogate pair
        val splitsSurrogate = j < w.length &&
          Character.isHighSurrogate(w.charAt(j - 1)) &&
          Character.isLowSurrogate(w.charAt(j))
        if (!splitsSurrogate) {
          val cand = (if (i == 0) "" else WpCont) + w.substring(i, j)
          if (vocab.contains(cand)) { found = cand; foundEnd = j }
        }
        j -= 1
      }
      if (found == null) return Seq(WpUnk)
      out += found
      // advance by the chars actually consumed from w — NOT by the
      // ##-stripped piece length, which under-advances when the raw text
      // itself starts with "##" (the piece then matched without a marker
      // being added, so stripping would double-read those chars)
      i = foundEnd
    }
    out.toSeq
  }

  /** Persist / reload a WordPiece vocabulary (one piece per row with its
    * dense id — the artifact a serving pipeline ships). */
  def saveWordpiece(spark: SparkSession, vocab: Seq[String], dir: String): Unit = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("piece_id", "piece").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  def loadWordpiece(spark: SparkSession, dir: String): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(dir).orderBy($"piece_id")
      .select($"piece").as[String].collect().toSeq
  }
}
