package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline: token counting,
 * quality scoring, language ID, and document fingerprinting. All but the
 * language heuristic are pure `functions._` compositions (codegen'd,
 * pushdown-friendly); language ID ships small built-in stopword profiles.
 */
object TextAnalysis {

  /** whitespace tokens */
  def wsTokens(text: Column): Column = filter(split(text, " "), t => t =!= "")

  /** Distinct sliding word n-grams from raw text (lowercased), empty when
    * the text has fewer than n tokens, null on null text. A codegen'd
    * Catalyst expression (graft.functions.WordNgrams): the equivalent
    * transform(sequence)/slice/concat_ws/array_distinct higher-order-function
    * chain runs interpreted (HOFs get no codegen, measured ~7× slower), and
    * the ScalaUDF this replaced paid a UTF8String↔String converter
    * round-trip per row. Output is string-identical, so the SQL oracles
    * that replay gram construction are unaffected. */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.tfunctions.word_ngrams(lower(text), n)

  /** BPE-ish subword proxy: alpha runs, digit runs, or single punctuation. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeishTokenCount(text: Column): Column = size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /**
   * N-gram novelty: how much text each document adds that the corpus has
   * not seen before it — gram g is "novel" in the doc with the smallest
   * id containing it (first-touch attribution, the same keep-first
   * convention the dedup family uses). The per-doc novelty rate is the
   * corpus-diversity growth curve: sources whose documents stop
   * contributing novel grams are recycling text, the between-doc
   * complement of the WITHIN-doc [[repetitionSignals]].
   *
   * Scale: distinct grams per doc (the codegen'd WordNgrams expression),
   * one gram-keyed min aggregate for first-touch, one gram-keyed join
   * back, one doc-keyed count — never doc × doc, no window. Docs with
   * fewer than n tokens report 0 grams and rate 0.
   */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val grams = df.select(col(idCol).cast("long").as("doc_id"),
      explode(wordNgrams(col(textCol), n)).as("g"))
    val first = grams.groupBy($"g").agg(min($"doc_id").as("fd"))
    val per = grams.join(first, "g")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"doc_id" === $"fd", 1L).otherwise(0L)).as("novel_grams"))
    df.select(col(idCol).cast("long").as("doc_id")).distinct()
      .join(per, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"novel_grams", lit(0L)).as("novel_grams"),
        when(coalesce($"n_grams", lit(0L)) > 0,
          round($"novel_grams" / $"n_grams" + lit(1e-9), 6))
          .otherwise(lit(0.0)).as("novelty_rate"))
  }

  /** Quality features: length, token stats, punctuation/stopword ratios. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = wsTokens(text)
    df.withColumn("n_chars_q", length(text))
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_token_len",
        round(length(regexp_replace(text, " ", "")).cast("double") /
          greatest(size(toks), lit(1)), 4))
      .withColumn("punct_ratio",
        round(size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double") /
          greatest(length(text), lit(1)), 4))
      .withColumn("stopword_ratio",
        // lower(t): match Title-Case/ALL-CAPS prose like the sibling
        // heuristics (languageId, Curation.qualityFlags) do
        round(size(filter(toks, t => lower(t).isin(EnStopwords: _*))).cast("double") /
          greatest(size(toks), lit(1)), 4))
  }

  /** Composite quality score in [0,1] (heuristic band scoring). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality_score",
      round(
        when(col("n_tokens") >= 5 && col("n_tokens") <= 5000, lit(0.4)).otherwise(lit(0.0)) +
          when(col("mean_token_len").between(2.0, 12.0), lit(0.3)).otherwise(lit(0.0)) +
          when(col("punct_ratio") <= 0.2, lit(0.2)).otherwise(lit(0.0)) +
          when(col("stopword_ratio") >= 0.01, lit(0.1)).otherwise(lit(0.0)), 2))

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "by")

  /** tiny per-language function-word profiles for the n-gram/stopword
    * language heuristic (public common word lists) */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "para", "con", "por", "que"),
    "zh" -> Seq.empty) // zh detected by CJK character ratio instead

  /**
   * Heuristic language ID: argmax over per-language function-word hit
   * ratios; CJK char ratio shortcut for zh; "und" (undetermined) when no
   * signal. Declarative: one score column per language, then greatest().
   */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = wsTokens(lower(col(textCol)))
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val scored = LangProfiles.filter(_._2.nonEmpty).foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"score_$lang",
        size(filter(toks, t => t.isin(words: _*))).cast("double") / nToks)
    }
    val cjkRatio = size(regexp_extract_all(col(textCol), lit("[\\u4e00-\\u9fff]"), lit(0)))
      .cast("double") / greatest(length(col(textCol)), lit(1))
    val langs = LangProfiles.keys.filter(l => LangProfiles(l).nonEmpty).toSeq.sorted
    val best = langs.foldLeft(
      struct(lit(0.0).as("s"), lit("und").as("l"))) { (acc, lang) =>
      when(col(s"score_$lang") > acc.getField("s"),
        struct(col(s"score_$lang").as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    scored
      .withColumn("lang_pred",
        when(cjkRatio > 0.25, lit("zh")).otherwise(best.getField("l")))
      .drop(langs.map(l => s"score_$l"): _*)
  }

  /**
   * Code-switching detection: [[languageId]]'s function-word heuristic
   * applied per fixed-width token WINDOW, with adjacent same-language
   * windows merged into spans (gaps-and-islands) — the pass that splits
   * a mixed-language crawl page into monolingual training segments
   * instead of mislabeling the whole document. Window hits are exact
   * integers (argmax ties go to the alphabetically first language, like
   * the doc-level scorer), so the replay is engine-exact.
   *
   * Returns (doc_id, span_idx 1-based, lang, start_tok, end_tok,
   * n_windows): 0-based inclusive token offsets. Scale: one doc-keyed
   * aggregate over (doc, window) cells plus a doc-partitioned islands
   * window — nothing global.
   */
  def languageSpans(df: DataFrame, idCol: String, textCol: String,
      window: Int = 20): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val langs = LangProfiles.keys.filter(l => LangProfiles(l).nonEmpty).toSeq.sorted
    val toks = df.select(col(idCol).as("__id"),
      posexplode(wsTokens(lower(col(textCol)))).as(Seq("__i", "__t")))
    val hitCols = langs.map(l =>
      sum(when($"__t".isin(LangProfiles(l): _*), 1L).otherwise(0L))
        .as(s"__h_$l"))
    val aggs = Seq(min($"__i").as("__s0"), max($"__i").as("__e0")) ++ hitCols
    val scored = toks
      .withColumn("__w", ($"__i" / window).cast("long"))
      .groupBy($"__id", $"__w")
      .agg(aggs.head, aggs.tail: _*)
    val best = langs.foldLeft(
      struct(lit(0L).as("h"), lit("und").as("l"))) { (acc, lang) =>
      when(col(s"__h_$lang") > acc.getField("h"),
        struct(col(s"__h_$lang").as("h"), lit(lang).as("l"))).otherwise(acc)
    }
    val w = W.partitionBy($"__id").orderBy($"__w")
    scored.withColumn("__lang", best.getField("l"))
      .withColumn("__brk",
        when(lag($"__lang", 1).over(w) === $"__lang", 0L).otherwise(1L))
      .withColumn("__g", sum($"__brk").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy($"__id", $"__g")
      .agg(min($"__lang").as("lang"),
        min($"__s0").cast("long").as("start_tok"),
        max($"__e0").cast("long").as("end_tok"),
        count(lit(1)).as("n_windows"))
      .select($"__id".as(idCol), $"__g".cast("int").as("span_idx"),
        $"lang", $"start_tok", $"end_tok", $"n_windows")
  }

  /** Content fingerprint for exact/near-exact grouping: md5 of the
    * whitespace-normalized lowercased text (portable across engines). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /**
   * Gopher-style per-document repetition signals (Rae et al. 2021, table
   * A1): machine-generated and boilerplate-heavy pages repeat themselves,
   * and the repetition fractions are the standard cheap filter for them.
   *
   *   - `n_lines`            non-empty (trimmed) lines
   *   - `dup_line_frac`      repeated line occurrences beyond each line's
   *                          first / total lines
   *   - `dup_line_char_frac` characters in those repeated occurrences /
   *                          characters in all lines
   *   - `top_bigram_char_frac` characters covered by the most frequent
   *                          word bigram (count × gram length, overlaps
   *                          counted per occurrence) / text length
   *   - `dup_bigram_char_frac` characters in bigram occurrences beyond
   *                          each gram's first / text length
   *
   * The two bigram fractions count overlapping occurrences per occurrence
   * (adjacent bigrams share a token), so their raw ratio can exceed 1 on
   * pathologically repetitive text — both clamp to 1, keeping every
   * signal in [0, 1] for downstream thresholding.
   *
   * Bigrams are counted with multiplicity over the lowercased,
   * newline-flattened text (WordNgramsAll — codegen'd). The plan is two
   * doc-keyed hash aggregates (lines, grams) joined back on doc id: every
   * shuffle is keyed by the document, so it scales horizontally — no
   * corpus-global state anywhere. Ratios are rounded to 6dp for
   * cross-engine hash stability.
   */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    val lines = base.select($"doc_id",
        explode(filter(transform(split($"text", "\n"), l => trim(l)), l => l =!= "")).as("line"))
      .groupBy($"doc_id", $"line").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id").agg(
        sum($"cnt").as("n_lines"),
        sum(($"cnt" - 1) * length($"line")).as("dup_chars"),
        sum($"cnt" - 1).as("dup_occ"),
        sum($"cnt" * length($"line")).as("line_chars"))

    val grams = base.select($"doc_id",
        explode(graft.functions.tfunctions.word_ngrams_all(
          lower(regexp_replace($"text", "\n", " ")), 2)).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id").agg(
        max($"cnt" * length($"g")).as("top_chars"),
        sum(($"cnt" - 1) * length($"g")).as("dup_gchars"))

    // anchor on the input so blank/short documents keep a row (all-zero
    // signals) instead of silently vanishing from the output
    base.select($"doc_id", length($"text").as("text_len"))
      .join(lines, Seq("doc_id"), "left")
      .join(grams, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_lines", lit(0L)).as("n_lines"),
        round(coalesce($"dup_occ", lit(0L)).cast("double") /
          greatest($"n_lines", lit(1L)), 6).as("dup_line_frac"),
        round(coalesce($"dup_chars", lit(0L)).cast("double") /
          greatest($"line_chars", lit(1L)), 6).as("dup_line_char_frac"),
        round(least(coalesce($"top_chars", lit(0L)).cast("double") /
          greatest($"text_len", lit(1)), lit(1.0)), 6).as("top_bigram_char_frac"),
        round(least(coalesce($"dup_gchars", lit(0L)).cast("double") /
          greatest($"text_len", lit(1)), lit(1.0)), 6).as("dup_bigram_char_frac"))
  }

  /**
   * Token-histogram Shannon entropy per document — a one-number diversity
   * signal: near 0 bits means the document is one token repeated (spam /
   * template), near log2(n_tokens) means every token is distinct. The
   * identity H = log2(n) − (Σ c·log2 c)/n avoids a per-token division.
   * `entropy_norm` rescales by the max possible for the doc's length so
   * thresholds transfer across document sizes.
   *
   * Plan: two doc-keyed hash aggregates (token counts, then the entropy
   * fold) — the same horizontally-scalable shape as `repetitionSignals`;
   * no corpus-global state. Zero-token docs keep a row with zero entropy.
   */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val stats = base.select($"doc_id", explode(wsTokens(lower($"text"))).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id").agg(
        sum($"cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum($"cnt".cast("double") * log2($"cnt")).as("clogc"))
    base.select($"doc_id").join(stats, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        coalesce($"n_distinct", lit(0L)).as("n_distinct"),
        round(coalesce(log2($"n_tokens") - $"clogc" / $"n_tokens", lit(0.0)), 6)
          .as("entropy_bits"),
        round(coalesce(
          when($"n_tokens" > 1, (log2($"n_tokens") - $"clogc" / $"n_tokens") / log2($"n_tokens"))
            .otherwise(lit(0.0)), lit(0.0)), 6).as("entropy_norm"))
  }

  /**
   * Deflate compression ratio per document — the model-free redundancy
   * signal web-scale curation pipelines gate on (boilerplate, keyword
   * stuffing, and generated spam compress far better than prose; a
   * ratio near 1 flags high-entropy noise). compressed/raw bytes with
   * zlib level 6, raw deflate (nowrap — no header/checksum variance).
   * One Deflater per PARTITION, reset per row (allocation-free inner
   * loop); map-only at any scale. Not SQL-replayable (no deflate in
   * the oracle engine) — correctness is pinned by invariants + the
   * determinism spec instead, and the registry entry takes the
   * rows-only check. Empty documents get ratio null.
   */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String,
      level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level must be 1..9, got $level")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level, true)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished())
            compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed,
            if (raw.length > 0)
              Some(BigDecimal(compressed.toDouble / raw.length)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
            else None)
        }
      }
      .toDF("id", "n_bytes", "n_compressed", "compression_ratio")
      .select(col("id").as(idCol), $"n_bytes", $"n_compressed",
        $"compression_ratio")
  }

  /**
   * Flesch reading-ease per document — a cheap readability prior for
   * corpus quality filtering next to the heuristic/classifier scores:
   *
   *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
   *
   * with syllables approximated as vowel-group runs `[aeiouy]+` per
   * lowercased word (the standard dictionary-free estimate) and
   * sentences as `[.!?]+` runs, floored at 1. Pure column arithmetic
   * over two regexp counts — map-only at any scale, trivially
   * SQL-replayable. Zero-word documents get a null score.
   */
  /**
   * Zipf-law fit per group: OLS slope/R² of log(term frequency) against
   * log(frequency rank). Natural corpora sit near slope −1 with high R²;
   * a flat slope or poor fit flags synthetic, templated, or degenerate
   * text — a corpus-health screen that catches what per-document quality
   * rules can't (the pathology is distributional, not per-row).
   *
   * Rank ties break on (tf DESC, token ASC) so both engines rank
   * identically; slope/R² round to 6dp (the same `regr_*` + round device
   * as [[Profiling.olsByGroup]]). The Window is per-group VOCABULARY-sized
   * — the same bounded-intermediate class as the dictionary rank paths —
   * and the scan collapses to (group, token) counts before anything else,
   * so the 100 TB plan is one tf shuffle + a vocab-sized window + agg.
   */
  def zipfFit(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(groupCol), explode(wsTokens(col(textCol))).as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    val rnk = row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(col("__tf").desc, col("__tok")))
    val lx = log(col("__rnk").cast("double"))
    val ly = log(col("__tf").cast("double"))
    tf.withColumn("__rnk", rnk)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("vocab"),
        round(regr_slope(ly, lx), 6).as("zipf_slope"),
        round(regr_r2(ly, lx), 6).as("zipf_r2"))
  }

  /** DuckDB replay of [[zipfFit]] over a `(grp, text)` relation. */
  def zipfFitOracleSql(relation: String): String =
    s"""WITH rel AS ($relation),
       |tf AS (SELECT grp, token, count(*) AS tf
       |       FROM (SELECT grp, unnest(string_split(text, ' ')) AS token FROM rel)
       |       WHERE token <> '' GROUP BY 1, 2),
       |r AS (SELECT grp, tf,
       |        row_number() OVER (PARTITION BY grp ORDER BY tf DESC, token) AS rnk
       |      FROM tf)
       |SELECT grp, CAST(count(*) AS BIGINT) AS vocab,
       |  round(regr_slope(ln(CAST(tf AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
       |  round(regr_r2(ln(CAST(tf AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6) AS zipf_r2
       |FROM r GROUP BY grp""".stripMargin

  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = size(wsTokens(col(textCol))).cast("double")
    val sentences = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))), lit(1))
      .cast("double")
    val syllables =
      size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
        .cast("double")
    df.select(col(idCol),
      words.cast("long").as("n_words"),
      sentences.cast("long").as("n_sentences"),
      syllables.cast("long").as("n_syllables"),
      when(words > 0,
        round(lit(206.835) - lit(1.015) * (words / sentences) -
          lit(84.6) * (syllables / words), 4)).as("flesch"))
  }
}
