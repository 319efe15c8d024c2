package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Corpus-curation operators a large-scale training-data pipeline needs on
 * top of pairwise dedup: duplicate-cluster assignment (connected
 * components), Gopher/C4-style quality filtering, PII redaction, and
 * deterministic (stratified) sampling.
 *
 * Scale posture: everything except `connectedComponents` is a single
 * codegen'd projection/filter (no shuffle, no UDF) so it pushes down and
 * pipelines with the scan. `connectedComponents` is the one iterative
 * operator; it shuffles only the (tiny, relative to the corpus) edge list.
 */
object Curation {

  /**
   * Connected components over an undirected edge list via min-label
   * propagation: every node repeatedly takes the minimum label in its
   * closed neighborhood until a fixed point. Returns (id, cluster) where
   * cluster is the smallest node id reachable from id.
   *
   * Scale: converges in O(component diameter) join+agg rounds. Near-dup
   * graphs are dense bundles of mutually-similar docs (diameter ≤ ~3), so
   * this beats the constant-factor overhead of large-star/small-star for
   * the dedup use case; each round shuffles only the edge list, never the
   * corpus. Labels are truncated (`localCheckpoint`) per round so the plan
   * does not grow with the iteration count.
   */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIterations: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // loop-invariant, joined on d every round: hash-partition once so
    // each round's label join shuffles only the node-sized label side
    val edges = pairs.select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("d"))
      .union(pairs.select(col(bCol).cast("long").as("s"), col(aCol).cast("long").as("d")))
      .distinct()
      .repartition(col("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select($"s".as("id")).distinct()
      .select($"id", $"id".as("cluster"))
      .ckptSer()
    // labels only ever decrease, so Σ(cluster) strictly decreases while
    // anything changes — one scalar action per round decides convergence
    // coalesce: sum over an EMPTY labels frame is NULL (no pairs at all —
    // every doc a singleton — is a normal input, not a crash)
    def sumClusters(): Long =
      labels.agg(coalesce(sum($"cluster"), lit(0L))).as[Long].head()
    var checksum = sumClusters()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val prev = labels
      labels = edges.join(labels.withColumnRenamed("id", "d"), "d")
        .select($"s".as("id"), $"cluster")
        .union(prev)
        .groupBy($"id").agg(min($"cluster").as("cluster"))
        .ckptSer()
      val next = sumClusters()
      converged = next == checksum
      checksum = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations rounds — " +
          "a component's diameter exceeds maxIterations; raise it " +
          "(silently returning split clusters would let duplicates survive)")
    edges.unpersist()
    labels
  }

  /**
   * Duplicate-cluster assignment: label every document with the smallest
   * doc id in its near-duplicate component (`pairs` from any of the Dedup
   * pair generators); docs in no pair are their own singleton cluster.
   * `keep` marks the cluster representative — filtering on it materializes
   * the keep-one-per-cluster policy transitively (unlike
   * `Dedup.applyKeepSmallest`, which only drops direct pair members).
   */
  def dedupClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"))
      .join(connectedComponents(pairs), Seq("id"), "left")
      .select($"id",
        coalesce($"cluster", $"id").as("cluster"),
        ($"id" === coalesce($"cluster", $"id")).as("keep"))
  }

  /** Gopher/C4-style quality-rule thresholds (Rae et al. 2021 §A1.1,
    * Raffel et al. 2020 §2.2 — public heuristics, re-tuned for the
    * fixture's short synthetic docs). */
  case class QualityRules(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaWordRatio: Double = 0.8,
      minStopwordHits: Int = 2,
      maxDupUnigramRatio: Double = 0.6,
      maxTopBigramRatio: Double = 0.18)

  /**
   * Per-document quality-rule flags + overall `keep`, all as one codegen'd
   * projection (no shuffle — the repetition rules run over the in-row token
   * array, so the filter pipelines with the scan at 100 TB).
   *
   * Rules (one boolean column each): word count band, mean word length
   * band, symbol ratio cap, alphabetic-word floor, distinct-stopword floor,
   * duplicate-unigram cap, top-bigram-fraction cap.
   */
  def qualityFlags(df: DataFrame, textCol: String,
      rules: QualityRules = QualityRules()): DataFrame = {
    val toks = TextAnalysis.wsTokens(lower(col(textCol)))
    val nWords = size(toks)
    val meanLen = length(regexp_replace(col(textCol), " ", "")).cast("double") /
      greatest(nWords, lit(1))
    val symbolRatio = size(regexp_extract_all(col(textCol), lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("double") / greatest(length(col(textCol)), lit(1))
    val alphaWordRatio = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") /
      greatest(nWords, lit(1))
    val stopwordHits = size(array_intersect(array_distinct(toks),
      typedLit(TextAnalysis.EnStopwords)))
    val dupUnigramRatio = lit(1.0) - size(array_distinct(toks)).cast("double") /
      greatest(nWords, lit(1))
    // top-bigram fraction without a shuffle: sort the in-row bigram array,
    // longest equal run = the modal bigram's count (O(n log n) per doc,
    // stays inside whole-stage codegen)
    val bigrams = when(nWords >= 2,
      array_sort(transform(sequence(lit(0), nWords - 2),
        i => concat_ws(" ", slice(toks, i + 1, lit(2))))))
      .otherwise(array().cast("array<string>"))
    val topBigramCount = aggregate(bigrams,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val topBigramRatio = topBigramCount.cast("double") / greatest(size(bigrams), lit(1))

    val flags = Seq(
      "rule_word_count" -> nWords.between(rules.minWords, rules.maxWords),
      "rule_mean_word_len" -> round(meanLen, 4).between(rules.minMeanWordLen, rules.maxMeanWordLen),
      "rule_symbol_ratio" -> (round(symbolRatio, 4) <= rules.maxSymbolRatio),
      "rule_alpha_words" -> (round(alphaWordRatio, 4) >= rules.minAlphaWordRatio),
      "rule_stopwords" -> (stopwordHits >= rules.minStopwordHits),
      "rule_dup_unigrams" -> (round(dupUnigramRatio, 4) <= rules.maxDupUnigramRatio),
      "rule_top_bigram" -> (round(topBigramRatio, 4) <= rules.maxTopBigramRatio))
    val out = flags.foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
    out.withColumn("keep", flags.map(f => col(f._1)).reduce(_ && _))
  }

  /**
   * Benchmark decontamination: corpus documents sharing at least
   * `minShared` distinct word n-grams with any document of a (small)
   * benchmark/eval set. The join key is the n-gram, so the plan is two
   * gram explosions + a shuffle join — never corpus × benchmark. An
   * optional gram-df cap on the CORPUS side drops ubiquitous grams before
   * the join (same skew argument as n-gram Jaccard; the benchmark side is
   * small by construction).
   *
   * @return (corpus idCol, bench_id, shared_ngrams) sorted by caller
   */
  def ngramContamination(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, benchIdCol: String, benchTextCol: String,
      n: Int = 5, minShared: Int = 3,
      maxGramDf: Long = Dedup.DefaultMaxGramDf): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def grams(df: DataFrame, id: String, text: String, out: String) =
      // id keeps its native type — casting a string doc id to long would
      // null it and collapse every document into one group
      df.select(col(id).as(out),
        explode(TextAnalysis.wordNgrams(col(text), n)).as("g"))
    val cg0 = grams(corpus, idCol, textCol, "cid")
    val cg =
      if (maxGramDf == Long.MaxValue) cg0
      else cg0.join(cg0.groupBy($"g").agg(count(lit(1)).as("gdf"))
        .filter($"gdf" <= maxGramDf).select($"g"), "g")
    val bg = grams(bench, benchIdCol, benchTextCol, "bench_id")
    cg.join(bg, "g")
      .groupBy($"cid", $"bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter($"shared_ngrams" >= minShared)
      .withColumnRenamed("cid", idCol)
  }

  /**
   * Cross-document boilerplate line removal (the CCNet/RefinedWeb cleanup
   * step): drop every line that appears VERBATIM in at least `minDocDf`
   * distinct documents (navigation chrome, cookie banners, footers), keep
   * the remaining lines in their original order.
   *
   * Scale posture: one explode to (doc, pos, line); the line document
   * frequency is a hash aggregate keyed by the line itself (map-side
   * partial aggregation collapses the hot lines that motivate the
   * operator, so the shuffle carries one partial count per distinct line
   * per partition — never one row per occurrence); hot lines join back on
   * the line key; the reassembly is the only doc-keyed shuffle. Nothing is
   * ever doc × doc and no line set touches the driver.
   *
   * @return one row per input doc: (idCol, clean_text, removed_lines) —
   *         a fully-boilerplate document keeps its row with empty text
   */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocDf: Long, sep: String = "\n"): DataFrame = {
    require(minDocDf >= 2, s"minDocDf must be >= 2, got $minDocDf")
    val reserved = Set("__pos", "__line", "__boiler", "clean_text", "removed_lines")
    require(!reserved(idCol),
      s"removeBoilerplateLines: $idCol collides with an internal/output name")
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val hot = lines.groupBy($"__line")
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter($"__df" >= minDocDf)
      .select($"__line", lit(true).as("__boiler"))
    lines.join(hot, Seq("__line"), "left")
      .groupBy(col(idCol))
      .agg(
        // collect_list skips the nulls `when` leaves for boilerplate lines;
        // array_sort on (pos, line) structs restores document order
        array_join(transform(
          array_sort(collect_list(when(coalesce($"__boiler", lit(false)) === false,
            struct($"__pos", $"__line")))),
          x => x.getField("__line")), sep).as("clean_text"),
        sum(when(coalesce($"__boiler", lit(false)), 1L).otherwise(0L)).as("removed_lines"))
  }

  /** PII patterns shared by redaction and the DuckDB oracle: Java regex ∩
    * RE2 syntax only (no lookaround, no \b — RE2 lacks them). Order
    * matters: emails contain dots that the IP pattern must not see. */
  /**
   * HTML → text extraction (the first step of every web-corpus pipeline):
   * drop `<script>`/`<style>` elements WITH their contents, strip remaining
   * tags (and single-`>` comments) to spaces, decode the common character
   * entities (after tag-stripping, so a literal `&lt;b&gt;` in prose does
   * not get re-stripped; `&amp;` last, the standard one-pass order), then
   * collapse whitespace. Every regex is Java ∩ RE2 — `(?is)` inline flags,
   * non-greedy `.*?`, no lookaround, no `\b`, no backreferences — so a SQL
   * oracle replays the chain verbatim. An unclosed script/style element
   * degrades gracefully: its tags strip, its text survives.
   *
   * Pure codegen'd `regexp_replace`/`replace` chain — no UDF, no parse
   * tree; the deliberate trade for a distributed scan operator (a DOM
   * parser is what the multimodal decode seam is for).
   */
  def stripHtml(text: Column): Column = {
    val noElems = Seq("script", "style").foldLeft(text) { (c, tag) =>
      regexp_replace(c, s"(?is)<$tag[^>]*>.*?</$tag>", " ")
    }
    val noTags = regexp_replace(noElems, "(?s)<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    // explicit class, not \s: Java's \s includes \x0B (vertical tab) where
    // RE2's does not — the one place the two engines' "whitespace" diverges
    trim(regexp_replace(decoded, "[ \\t\\n\\f\\r\\x0B]+", " "))
  }

  /** Block boundary for [[mainContentBlocks]]: opening/closing
    * block-level tags (Java regex ∩ RE2, shared with the oracle). */
  val BlockTagPattern: String = "(?i)</?(p|div|h[1-6]|li|ul|ol|table|tr|br)[^>]*>"

  /**
   * jusText-style main-content extraction (Pomikálek 2011, simplified):
   * split markup into block-level segments, score each block by LINK
   * DENSITY (characters inside <a> anchors / block characters) and
   * English stopword density, then classify —
   *   boilerplate: link_density > 0.3 (nav/footer/menus), or fewer than
   *   `minChars` characters; good: otherwise, when stopword density ≥
   *   `minStopDensity` (real prose has function words); short: the rest.
   * The page-level complement of the CROSS-document boilerplate remover:
   * this one needs no second document to kill a nav bar. Densities are
   * 6dp-anchored. One posexplode + codegen'd per-block features — no
   * join, no window, no shuffle beyond the final ordering.
   *
   * Returns (doc_id, block_idx, n_chars, link_density, stop_density,
   * label, block_text) for non-empty blocks.
   */
  def mainContentBlocks(df: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 40, minStopDensity: Double = 0.05): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stops = graft.pipeline.TextAnalysis.LangProfiles("en")
    val blocks = df.select(col(idCol).as("doc_id"),
        posexplode(split(col(htmlCol), BlockTagPattern))
          .as(Seq("block_idx", "__raw")))
    val aTexts = regexp_extract_all($"__raw",
      lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))
    val linkChars = aggregate(aTexts, lit(0),
      (acc, t) => acc + length(regexp_replace(t, "(?s)<[^>]*>", "")))
    val text = trim(regexp_replace(
      regexp_replace($"__raw", "(?s)<[^>]*>", " "),
      "[ \\t\\n\\f\\r\\x0B]+", " "))
    val toks = graft.pipeline.TextAnalysis.wsTokens(lower(text))
    blocks
      .withColumn("block_text", text)
      .filter(length($"block_text") > 0)
      .withColumn("n_chars", length($"block_text"))
      .withColumn("link_density",
        round(least(lit(1.0),
          linkChars.cast("double") / greatest($"n_chars", lit(1))), 6))
      .withColumn("stop_density",
        round(size(filter(toks, t => t.isin(stops: _*))).cast("double") /
          greatest(size(toks), lit(1)), 6))
      .withColumn("label",
        when($"link_density" > 0.3, "boilerplate")
          .when($"n_chars" < minChars, "boilerplate")
          .when($"stop_density" >= minStopDensity, "good")
          .otherwise("short"))
      .select($"doc_id", $"block_idx", $"n_chars", $"link_density",
        $"stop_density", $"label", $"block_text")
  }

  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "<IP>",
    "\\+?[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ]?[0-9]{4}" -> "<PHONE>")

  /** Redact emails / IPv4s / phone numbers, returning the scrubbed text and
    * the redaction count. Pure `regexp_replace` chain — codegen'd, no UDF. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    // count each pattern on the PROGRESSIVELY-replaced text, exactly like
    // the replacement fold — counting everything against the original would
    // double-count overlaps (an IP inside an already-redacted email)
    var cur: Column = col(textCol)
    var nRedactions: Column = lit(0)
    PiiPatterns.foreach { case (p, repl) =>
      nRedactions = nRedactions + size(regexp_extract_all(cur, lit(p), lit(0)))
      cur = regexp_replace(cur, p, repl)
    }
    df.withColumn("n_redactions", nRedactions)
      .withColumn("redacted", cur)
  }

  /**
   * Keep-BEST materialization: from each near-dup cluster keep the row
   * with the highest `scoreCol` (ties broken by smallest id) — curation
   * usually wants the best-quality copy of a duplicated page, not the one
   * with the lowest id (`Dedup.applyKeepSmallest`'s policy). One window
   * pass per cluster on top of the connected-components labels; the
   * row_number + top-1 filter plans as WindowGroupLimit, so only each
   * cluster's best row survives the sort buffer.
   */
  def applyKeepBest(df: DataFrame, idCol: String, pairs: DataFrame,
      scoreCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val clustered = dedupClusters(df, idCol, pairs).select($"id", $"cluster")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster").orderBy(col(scoreCol).desc, $"id".asc)
    val kept = clustered
      .join(df.select(col(idCol).cast("long").as("id"), col(scoreCol)), "id")
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1)
      .select($"id".as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /**
   * Leakage-safe dataset split: near-duplicate CLUSTERS (not documents)
   * are the unit of split assignment, so two near-copies can never land
   * one in train and one in test — the standard guard against evaluation
   * contamination when splitting a deduplicatable corpus. Composes the
   * existing pieces: `dedupClusters` (connected components over near-dup
   * pairs) for the cluster root, `assignSplits` keyed by the root instead
   * of the document id. Docs with no near-dup are their own cluster, so
   * the split stays ~uniform at the configured fractions.
   */
  def leakageSafeSplits(df: DataFrame, idCol: String, pairs: DataFrame,
      fractions: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    assignSplits(dedupClusters(df, idCol, pairs).select($"id", $"cluster"),
        "cluster", fractions, salt)
      .select($"id".as(idCol), $"cluster", $"split")
  }

  /**
   * URL canonicalization — the precursor to URL-level dedup in a web
   * corpus (the same page arrives as `HTTPS://Host/...#frag`,
   * `https://host/...?utm_source=...`, …). The chain, every step Java ∩
   * RE2 regex with no lookaround and no replacement backrefs (so a SQL
   * oracle replays it verbatim):
   *
   *   1. drop the fragment (`#` to end of text);
   *   2. lowercase ONLY the scheme+host (the first `…//host` span —
   *      paths are case-sensitive);
   *   3. strip tracking parameters (`utm_*`, `fbclid`, `gclid`) — each
   *      pattern is anchored to a `?`/`&` parameter boundary, so a param
   *      NAMED e.g. `songclid` or `xfbclid` never matches: first the
   *      `&`-prefixed occurrences drop, then a leading `?tracker&`
   *      re-anchors the `?`, then a lone `?tracker` at end of text drops;
   *   4. repair any separator debris (`?&` runs, trailing `?`/`&`);
   *   5. drop a trailing slash.
   *
   * End-of-text anchors are `\z`, not `$`: Java's `$` also matches before
   * a final newline where RE2's does not, and the whole chain must replay
   * identically in a SQL oracle. Port normalization (`:443` → ``) is
   * deliberately out of scope: it needs lookahead or backref replacement,
   * which RE2/engine-portable regex can't express.
   */
  def canonicalizeUrl(url: Column): Column = {
    val trackers = "(utm_[a-z]+|fbclid|gclid)"
    val noFrag = regexp_replace(url, "#[\\s\\S]*", "")
    val hostSpan = "^[^/]*//[^/]*"
    val lowered = concat(
      lower(regexp_extract(noFrag, hostSpan, 0)),
      regexp_replace(noFrag, hostSpan, ""))
    val noAmpTrack = regexp_replace(lowered, s"&$trackers=[^&#]*", "")
    val noLeadTrack = regexp_replace(
      regexp_replace(noAmpTrack, s"\\?$trackers=[^&#]*&", "?"),
      s"\\?$trackers=[^&#]*\\z", "")
    val collapsed = regexp_replace(
      regexp_replace(noLeadTrack, "\\?[?&]+", "?"), "&&+", "&")
    regexp_replace(regexp_replace(collapsed, "[?&]+\\z", ""), "/\\z", "")
  }

  /** md5 of the canonical URL — the key URL-level dedup groups by. */
  def urlFingerprint(url: Column): Column = md5(canonicalizeUrl(url))

  /** Lowercased host of an absolute URL; empty for relative or
    * schemeless references (Java ∩ RE2, shared with the SQL oracle). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))

  /**
   * Host-level link graph from raw markup — the edge list behind every
   * link-authority signal in web-corpus curation (feed the output
   * straight to [[Graphs.pageRank]] / [[Graphs.labelPropagation]];
   * Common Crawl publishes exactly this artifact). `href="..."`
   * attributes are pulled with one codegen'd `regexp_extract_all`,
   * hosts lowercased, relative links (no absolute scheme://host) drop
   * out, and edges aggregate to (src_host, dst_host, n_links).
   *
   * Scale: per-doc regex extraction + ONE (src, dst) hash aggregate
   * whose output is host-pair-sized — map-side combining collapses the
   * within-partition repeats of hot site pairs, so the shuffle carries
   * the distinct-edge table, not one row per anchor tag.
   */
  def linkGraph(df: DataFrame, idCol: String, urlCol: String,
      htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(urlHost(col(urlCol)).as("src_host"),
        explode(regexp_extract_all(col(htmlCol),
          lit("href=\"([^\"]*)\""), lit(1))).as("href"))
      .select($"src_host", urlHost($"href").as("dst_host"))
      .filter($"src_host" =!= "" && $"dst_host" =!= "")
      .groupBy($"src_host", $"dst_host").agg(count(lit(1)).as("n_links"))
  }

  /** 16-digit card-number candidate (optional dash/space group
    * separators) — Java regex ∩ RE2, shared with the SQL oracle. */
  val CardPattern: String = "[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}"

  /** Luhn checksum over a 16-digit candidate (separators stripped), as a
    * pure Column expression: position p from the right doubles when p is
    * even, digits > 9 fold back by −9, valid iff the sum ≡ 0 (mod 10).
    * The checksum is what separates a real card number from any random
    * 16-digit run — regex alone would flood a curation pass with false
    * positives. */
  def luhnValid(candidate: Column): Column = {
    val s = regexp_replace(candidate, "[- ]", "")
    val total = aggregate(sequence(lit(1), lit(16)), lit(0), (acc, i) => {
      val d = s.substr(i, lit(1)).cast("int")
      val doubled = when((lit(17) - i) % 2 === 0, d * 2).otherwise(d)
      acc + when(doubled > 9, doubled - 9).otherwise(doubled)
    })
    total % 10 === 0
  }

  /** Per-document card-number detection: regex candidates, then Luhn
    * validation — (n_candidates, n_cards) columns appended. Detection
    * rather than blind redaction: flagged documents are the unit a
    * curation pipeline drops or routes to review. Single codegen'd
    * projection, no shuffle. */
  def detectCardNumbers(df: DataFrame, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(CardPattern), lit(0))
    df.withColumn("__cands", cands)
      .withColumn("n_candidates", size(col("__cands")))
      .withColumn("n_cards", size(filter(col("__cands"), luhnValid _)))
      .drop("__cands")
  }

  /**
   * Neyman-allocation stratified sampling (Neyman 1934): the
   * minimum-variance way to spend a fixed sample budget across strata —
   * allocate n_h ∝ N_h·S_h (stratum size × stratum standard deviation),
   * so volatile strata get proportionally more samples than proportional
   * allocation would give. Within each stratum the n_h winners are the
   * smallest md5(salt‖key) — the engine-portable deterministic draw the
   * sampling family uses.
   *
   * Anchoring: moments come from exact scaled-integer sums (6dp values,
   * decimal Σv and Σv², so no float association), sd in doubles from
   * those exact integers, per-stratum weights re-anchored at 6dp and
   * summed as exact integers. Allocations are rounded per stratum and
   * capped at N_h, so Σn_h can differ from `totalN` by rounding — the
   * standard practical convention.
   *
   * Returns the SELECTED rows (key, stratum, sample_rank). Scale: one
   * stats aggregate, one broadcast of the strata-sized allocation table,
   * one stratum-partitioned rank window.
   */
  def neymanSample(df: DataFrame, strataCol: String, keyCol: String,
      valCol: String, totalN: Long, salt: String = "graft"): DataFrame = {
    require(totalN >= 1, "totalN must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    val base = df.select(col(strataCol).cast("string").as("__h"),
        col(keyCol).cast("string").as("__key"),
        round(round(col(valCol).cast("double"), 6) * 1e6).cast("long")
          .as("__v6"))
      .filter($"__v6".isNotNull)
    val stats = base.groupBy($"__h")
      .agg(count(lit(1)).as("__n"),
        sum($"__v6".cast(dec)).as("__s"),
        sum(($"__v6".cast(dec) * $"__v6".cast(dec))).as("__ss"))
      .withColumn("__sd", sqrt(greatest(lit(0.0),
        ($"__ss".cast("double") -
          $"__s".cast("double") * $"__s".cast("double") / $"__n") / $"__n"))
        / 1e6)
      .withColumn("__w6", round($"__sd" * $"__n" * 1e6).cast("long"))
    val totalW = stats.agg(sum($"__w6").as("__wt6"))
    val alloc = stats.crossJoin(broadcast(totalW))
      .withColumn("__alloc", least($"__n",
        when($"__wt6" > 0,
          round(lit(totalN.toDouble) * $"__w6" / $"__wt6", 0).cast("long"))
          .otherwise(lit(0L))))
      .select($"__h", $"__alloc")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"__h")
      .orderBy(md5(concat(lit(salt), $"__key")), $"__key")
    base.join(broadcast(alloc), "__h")
      .withColumn("__r", row_number().over(w))
      .filter($"__r" <= $"__alloc")
      .select($"__key".as(keyCol), $"__h".as(strataCol),
        $"__r".as("sample_rank"))
  }

  /** IBAN candidate: country code + 2 check digits + 11–30 alphanumeric
    * (uppercase, contiguous) — Java regex ∩ RE2, shared with the oracle. */
  val IbanPattern: String = "[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}"

  /** ISO 13616 mod-97 IBAN check as a pure Column fold: rotate the first
    * 4 chars to the end, then fold characters left-to-right keeping only
    * acc mod 97 (digits append one decimal digit, letters two as
    * 10 + A..Z offset) — no big integer ever materializes, and the same
    * incremental fold replays in SQL via list_reduce. Valid iff the
    * final remainder is 1. The checksum separates a real IBAN from any
    * alphanumeric run the regex matches. */
  def ibanValid(candidate: Column): Column = {
    val r = concat(candidate.substr(lit(5), length(candidate) - 4),
      candidate.substr(lit(1), lit(4)))
    val total = aggregate(sequence(lit(1), length(r)), lit(0L), (acc, i) => {
      val a = ascii(r.substr(i, lit(1)))
      when(a >= 48 && a <= 57, (acc * 10 + (a - 48)) % 97)
        .otherwise((acc * 100 + (a - 55)) % 97) // 'A'(65) → 10
    })
    total === 1L
  }

  /** Per-document IBAN detection: regex candidates, then the mod-97
    * validation — (n_iban_candidates, n_ibans) appended. Same
    * detect-then-route posture as [[detectCardNumbers]]; one codegen'd
    * projection, no shuffle. */
  def detectIbans(df: DataFrame, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(IbanPattern), lit(0))
    df.withColumn("__icands", cands)
      .withColumn("n_iban_candidates", size(col("__icands")))
      .withColumn("n_ibans", size(filter(col("__icands"), ibanValid _)))
      .drop("__icands")
  }

  /** 8-hex-digit keep boundary for a sampling rate over the md5 space:
    * a key survives iff its first 8 md5 hex digits compare below this
    * string. Fixed-width lowercase hex makes the lexicographic comparison
    * identical across engines (Spark, DuckDB, anything with md5). */
  def hexBoundary(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    if (rate >= 1.0) "g" // sorts above every hex digit → keep all
    else f"${(rate * (1L << 32)).toLong}%08x"
  }

  /** Deterministic sample: keep iff md5(salt ‖ key) falls below the rate
    * boundary. Reproducible across runs, engines, and partitionings —
    * unlike `df.sample`, whose output depends on partition layout. */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "graft"): DataFrame =
    df.filter(substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8)
      < lit(hexBoundary(rate)))

  /**
   * Reproducible global shuffle — the training-order primitive: every
   * epoch's data order must be random-looking yet identical across
   * re-runs (a restarted job must not reorder examples). Each row gets a
   * shard (`hash % numShards`) and a dense 0-based position within its
   * shard by md5 order — change `salt` to get an independent
   * permutation (one salt per epoch).
   *
   * Scale: ONE hash shuffle (partition by shard) and a per-shard sort —
   * no global sort, no single-partition window; shards are the write
   * granularity, so numShards tracks the target file count at 100 TB.
   */
  def deterministicShuffle(df: DataFrame, keyCol: String, numShards: Int,
      salt: String = "graft"): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    import org.apache.spark.sql.expressions.Window
    val draw = md5(concat(lit(salt), col(keyCol).cast("string")))
    df.withColumn("shard", (graft.pipeline.Dedup.baseHash60(
        concat(lit(salt), col(keyCol).cast("string"))) % numShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(draw, col(keyCol).cast("string"))) - 1)
  }

  /** Per-stratum deterministic sampling (training-mix construction): each
    * stratum value gets its own rate; unlisted strata get `defaultRate`.
    * Same md5 mechanics as `deterministicSample`, one codegen'd filter. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val boundary = rates.foldLeft(when(lit(false), lit(""))) {
      case (acc, (stratum, rate)) =>
        acc.when(col(strataCol) === stratum, lit(hexBoundary(rate)))
    }.otherwise(lit(hexBoundary(defaultRate)))
    df.filter(substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8) < boundary)
  }

  /**
   * Weighted deterministic sampling: keep a row iff its md5-uniform draw
   * falls below `weightCol` (a per-row keep probability in [0, 1] — e.g.
   * a quality score, so high-quality documents survive preferentially).
   * Same engine-portable md5 mechanics as `deterministicSample`; the
   * uniform is the first 8 md5 hex digits scaled to [0, 1).
   */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      salt: String = "graft"): DataFrame = {
    val u = conv(substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    df.filter(u < col(weightCol))
  }

  /**
   * Deterministic dataset split (train/val/test): each key's md5-uniform
   * draw lands in one of the cumulative `fractions` bands; returns the
   * input plus a `split` column with the band's name. Engine-portable,
   * partitioning-independent, and stable across runs — the properties a
   * training split must have (a df.randomSplit changes with partitioning).
   * Fractions must sum to 1 (±1e-9).
   */
  def assignSplits(df: DataFrame, keyCol: String, fractions: Seq[(String, Double)],
      salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val u = conv(substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    // round each cumulative boundary to 12dp: the floating fold of the
    // fractions (0.8 + 0.1 = 0.9000000000000001) must not open an
    // engine-divergent band vs an oracle's literal 0.9 — draws are exact
    // k/2^32 multiples, far coarser than 1e-12
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(b => math.rint(b * 1e12) / 1e12)
    val expr = fractions.zip(cum).init.foldRight(lit(fractions.last._1)) {
      case (((name, _), hi), acc) => when(u < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /**
   * Temperature-based mixture rebalancing — the data-mixing move every
   * large pretraining corpus makes (GPT-3 / The Pile shape): domain d with
   * share p_d of the corpus is resampled toward p_d^τ (renormalized), so
   * τ < 1 flattens the mix (upweights rare domains relative to dominant
   * ones) and τ = 1 is a no-op. Materialized as per-domain acceptance
   * rates a_d ∝ n_d^(τ−1), scaled so the most-upweighted domain keeps
   * everything (no domain can exceed rate 1), then applied with the same
   * engine-portable md5 draw as `deterministicSample`. Rates are rounded
   * to 12dp (assignSplits precedent: draws are exact k/2^32 multiples, so
   * a 1e-12-rounded boundary can't open an engine-divergent band).
   *
   * Returns every input row plus `accept_rate` and `kept` — callers
   * filter on `kept`; keeping rejects visible makes the mix auditable.
   *
   * Scale: the domain-count table is domain-cardinality-sized (tiny), so
   * the rate join is a broadcast; the draw is one codegen'd expression.
   * One aggregate + one broadcast join regardless of corpus size.
   */
  def mixtureResample(df: DataFrame, keyCol: String, domainCol: String,
      temperature: Double, salt: String = "graft"): DataFrame = {
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature must be in (0,1]: $temperature")
    val spark = df.sparkSession
    import spark.implicits._
    val weights = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_domain"))
      .select(col(domainCol), pow($"n_domain".cast("double"), lit(temperature - 1.0)).as("w"))
    val maxW = weights.select(max($"w").as("max_w"))
    val rates = weights.crossJoin(broadcast(maxW))
      .select(col(domainCol), round($"w" / $"max_w", 12).as("accept_rate"))
    val u = conv(substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    // null-safe equality: groupBy made a rate row for the NULL domain, and
    // the promised "returns every input row" contract must include it — a
    // plain equi-join would silently drop NULL-domain rows
    df.join(broadcast(rates.withColumnRenamed(domainCol, "__dom")),
        col(domainCol) <=> col("__dom"))
      .drop("__dom")
      .withColumn("kept", u < col("accept_rate"))
  }

  /**
   * Per-key quota: keep at most `maxPerKey` rows per `keyCol` value,
   * chosen by md5 order of the id — a uniform, deterministic,
   * engine-portable "random" pick (domain quota capping: no single
   * source/domain may dominate the training mix).
   *
   * One shuffle (the per-key window sort). When a hot key's cardinality
   * dwarfs `maxPerKey`, bound the sort input first with
   * `deterministicSample` at a rate that still clears the quota with
   * margin — the two compose exactly because both order by the same md5.
   */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, maxPerKey: Int): DataFrame = {
    require(maxPerKey > 0, s"maxPerKey must be positive: $maxPerKey")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__quota_rank", row_number().over(w))
      .filter(col("__quota_rank") <= maxPerKey)
      .drop("__quota_rank")
  }

  /**
   * Keyed pseudonymization: replace identifier columns with salted
   * SHA-256 tokens. Deterministic for a fixed salt, so the SAME id maps
   * to the SAME token everywhere — joins, group-bys, and dedup keys
   * survive tokenization (the property plain redaction destroys), while
   * the raw identifier never leaves the engine. Rotate the salt to break
   * linkability between releases. Nulls stay null. One codegen'd
   * expression per column — no shuffle, no lookup table to leak.
   */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, sha2(concat(lit(salt), col(c).cast("string")), 256)))

  /**
   * Weighted per-key quota: keep the `maxPerKey` rows per key chosen by
   * Efraimidis–Spirakis A-Res weighted sampling WITHOUT replacement —
   * each row scores `u^(1/w)` (u = its deterministic md5 draw, w = its
   * weight) and the top-k scores per key win, which provably samples
   * k rows with probability proportional to weight. The weighted
   * counterpart of `capPerKey`: "keep 10k docs per domain, preferring
   * high-quality ones, reproducibly". Rows with null or non-positive
   * weight score below every positive-weight row (picked only when k
   * exceeds the positive-weight population). Deterministic across runs,
   * engines, and partitionings; one key shuffle, and the per-key top-k
   * plans as WindowGroupLimit (partial limit before the shuffle).
   */
  def weightedCapPerKey(df: DataFrame, keyCol: String, idCol: String,
      weightCol: String, maxPerKey: Int, salt: String = "graft"): DataFrame = {
    require(maxPerKey > 0, s"maxPerKey must be positive: $maxPerKey")
    val u = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    // NaN weights must land in the "not a usable weight" bucket with null
    // and non-positive: Spark's ordering treats NaN as LARGER than every
    // double, so an unguarded NaN score would win every quota slot
    val wd = col(weightCol).cast("double")
    val score = when(wd.isNotNull && !isnan(wd) && wd > 0,
      pow(u, lit(1.0) / wd)).otherwise(lit(-1.0))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(score.desc, col(idCol).asc)
    df.withColumn("__wquota_rank", row_number().over(w))
      .filter(col("__wquota_rank") <= maxPerKey)
      .drop("__wquota_rank")
  }

  /**
   * Token-budget mix construction: each domain contributes documents —
   * picked in deterministic md5 order, so the selection is a uniform
   * "random" sample that is stable across runs, engines, and partition
   * layouts — until its TOKEN budget is exhausted. This is how a training
   * mix is actually specified ("600 B tokens of web, 50 B of code, …"):
   * quotas are in tokens, not documents, because document length varies
   * by orders of magnitude across domains.
   *
   * A document is kept iff the running token total up to AND INCLUDING it
   * stays within the domain's budget (first-fit in md5 order; no
   * backfilling past an oversized document — deterministic and
   * replayable, which backfilling is not). Domains absent from `budgets`
   * get `defaultBudget`; a null domain gets `defaultBudget` too. Returns
   * every input row plus `cum_tokens`, `budget`, and `kept` — rejects stay
   * visible so the mix is auditable (same contract as `mixtureResample`).
   *
   * Scale: one hash shuffle on the domain (the window sort); the budget
   * lookup is a literal CASE chain, zero joins. A domain is one window
   * partition, so a giant domain serializes its cumsum — at that point
   * pre-cut it with `deterministicSample` at `budget / est_domain_tokens`
   * (with margin), which composes exactly because both order by the same
   * md5 draw.
   */
  /**
   * k-anonymity (+ optional l-diversity) suppression over quasi-identifier
   * columns: a row survives only if its full QI combination is shared by
   * at least `k` rows — and, when a sensitive column is given, those rows
   * carry at least `l` distinct sensitive values (so a re-identified group
   * still doesn't disclose the sensitive attribute). The standard release
   * gate before user-derived tables (session logs, profile joins) feed a
   * training-data pipeline.
   *
   * Suppression, not generalization: rows in failing groups are DROPPED
   * (the caller picks coarser QI columns if the yield is too low —
   * generalization hierarchies are domain knowledge this operator should
   * not guess at). Null QI values form their own group, which is the
   * conservative reading (all-null rows only survive if ≥ k of them).
   *
   * Scale: one groupBy over the QI combination (group stats are
   * QI-cardinality-sized) and one co-partitioned join back on the same
   * keys — both shuffles hash on the QI columns, so AQE coalesces or
   * broadcasts the stats side when small. Never row×row.
   */
  /**
   * t-closeness screen (Li, Li & Venkatasubramanian, ICDE 2007) for an
   * ORDERED sensitive attribute: per quasi-identifier equivalence class,
   * the Earth Mover's Distance between the class's sensitive-value
   * distribution and the global one, with the ordered-values closed form
   *
   *   EMD = (1/(m−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|
   *
   * over the m globally-distinct sensitive values. The complement of
   * [[kAnonymize]]'s gates: k bounds membership inference, l bounds
   * attribute diversity, t bounds attribute DISCLOSURE — a class can be
   * large and diverse yet still leak (everyone in it earns "low").
   * Null sensitive values are excluded; returns one row per class:
   * (quasi cols, n, emd 6dp, pass = emd ≤ t).
   *
   * Exact arithmetic: the cumulative difference is the integer
   * N·C_i − n·G_i over cumulative counts (decimal-exact products, no
   * float sums), divided once at the end — engines cannot disagree.
   * Scale: two keyed aggregates plus a class×value grid (both
   * group-sized); the only window partitions by the class.
   */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness: need at least one quasi-identifier")
    require(t > 0 && t <= 1, s"tCloseness: t must be in (0, 1], got $t")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(sensitiveCol).isNotNull)
    val qi = quasiCols.map(col)
    val cls = base.groupBy(qi: _*).agg(count(lit(1)).as("__cn"))
    val gv = base.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__gc"))
    val gstats = gv.agg(count(lit(1)).as("__m"), sum($"__gc").as("__N"))
    val cell = base.groupBy(qi :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__cc"))
    val cellR = cell.select(
      quasiCols.map(c => col(c).as(s"__q_$c")) :+ $"__v".as("__cv") :+ $"__cc": _*)
    val joinCond = quasiCols.map(c => col(c) <=> col(s"__q_$c"))
      .reduce(_ && _) && $"__v" <=> $"__cv"
    val grid = cls.crossJoin(gv)
      .join(cellR, joinCond, "left")
      .select(qi :+ $"__cn" :+ $"__v" :+ $"__gc" :+
        coalesce($"__cc", lit(0L)).as("__cc"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*).orderBy($"__v")
    val dec = "decimal(38,0)"
    val cum = grid.crossJoin(broadcast(gstats))
      .withColumn("__C", sum($"__cc").over(w))
      .withColumn("__G", sum($"__gc").over(w))
      .withColumn("__term", abs($"__N".cast(dec) * $"__C".cast(dec) -
        $"__cn".cast(dec) * $"__G".cast(dec)))
    cum.groupBy(qi :+ $"__cn" :+ $"__m" :+ $"__N": _*)
      .agg(sum($"__term").as("__sa"))
      .select(qi :+ $"__cn".as("n") :+
        round(when($"__m" > 1,
          $"__sa".cast("double") /
            ($"__cn".cast("double") * $"__N".cast("double") * ($"__m" - 1)))
          .otherwise(lit(0.0)), 6).as("emd"): _*)
      .withColumn("pass", $"emd" <= t)
  }

  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int,
      sensitiveCol: Option[String] = None, l: Int = 1): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymize: need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"kAnonymize: k and l must be >= 1 (got k=$k, l=$l)")
    val qi = quasiCols.map(col)
    val lExpr = sensitiveCol match {
      case Some(sc) => countDistinct(col(sc))
      case None => count(lit(1)) // degenerate: group size itself, l=1 passes
    }
    val stats = df.groupBy(qi: _*)
      .agg(count(lit(1)).as("__ka_n"), lExpr.as("__ka_l"))
      .filter(col("__ka_n") >= k && col("__ka_l") >= l)
      .select(quasiCols.map(c => col(c).as(s"__ka_$c")): _*)
    // join, not isin (QI cardinality is data-dependent); null-SAFE equality
    // so the null group matches itself per the contract above
    val cond = quasiCols.map(c => col(c) <=> col(s"__ka_$c")).reduce(_ && _)
    df.join(stats, cond, "left_semi")
  }

  /**
   * ε-differentially-private noisy release of per-group statistics via
   * the Laplace mechanism: count (sensitivity 1) and a [0, clampHi]-
   * clamped sum (sensitivity clampHi), each perturbed by
   * Laplace(Δ/ε) noise drawn through the inverse CDF
   * −(Δ/ε)·sgn(u−½)·ln(1−2|u−½|) from an md5-seeded uniform — the same
   * engine-portable draw the sampling family uses, with +½ LSB so u is
   * never exactly 0. The RELEASE-side gate that composes with
   * [[kAnonymize]]'s suppression gate: k-anonymity bounds
   * re-identification, the Laplace release bounds what any single row
   * can move a published aggregate.
   *
   * Seeded determinism is deliberate and disclosed: it makes the
   * mechanism REPLAYABLE (the oracle recomputes the identical noise), at
   * the price that a release is ε-DP against adversaries who don't hold
   * the salt — production use would draw the salt from a secure RNG per
   * release, changing nothing else.
   *
   * Clamped values are fixed-pointed at 6dp (round → Long) before the
   * sum, so the aggregate is exact integer arithmetic — order-free, and
   * replayable without decimal-rounding-convention mismatches.
   *
   * One groupBy; noise is a per-group projection. Group-cardinality-sized
   * everywhere.
   */
  def dpNoisyRelease(df: DataFrame, groupCol: String, valCol: String,
      eps: Double, clampHi: Double, salt: String = "graft_dp"): DataFrame = {
    require(eps > 0, s"eps must be > 0: $eps")
    require(clampHi > 0, s"clampHi must be > 0: $clampHi")
    val clamped = least(greatest(col(valCol).cast("double"), lit(0.0)), lit(clampHi))
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(round(clamped * lit(1e6)).cast("long")).as("__s6"))
    def lap(delta: Double, tag: String) = {
      val u = (conv(substring(md5(concat(lit(salt + tag),
          col(groupCol).cast("string"))), 1, 8), 16, 10).cast("double") + lit(0.5)) /
        lit(4294967296.0)
      val c = u - lit(0.5)
      lit(-delta / eps) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    }
    g.select(col(groupCol),
      round(col("__n") + lap(1.0, ":n"), 4).as("noisy_count"),
      round(col("__s6").cast("double") / lit(1e6) + lap(clampHi, ":s"), 4)
        .as("noisy_sum"))
  }

  def tokenBudgetMix(df: DataFrame, idCol: String, domainCol: String,
      tokensCol: String, budgets: Map[String, Long], defaultBudget: Long,
      salt: String = "graft"): DataFrame = {
    require(defaultBudget >= 0, s"defaultBudget must be >= 0: $defaultBudget")
    val budget = budgets.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (dom, b)) => acc.when(col(domainCol) === dom, lit(b))
    }.otherwise(lit(defaultBudget))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(domainCol))
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string"))), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // a NULL token count must not poison the classification: sum().over
    // skips NULLs, which would leave that row's cum_tokens (and so its
    // `kept`) NULL — dropped by BOTH filter(kept) and filter(!kept),
    // vanishing from the audit. Count it as 0 tokens instead.
    df.withColumn("cum_tokens",
        sum(coalesce(col(tokensCol).cast("long"), lit(0L))).over(w))
      .withColumn("budget", budget)
      .withColumn("kept", col("cum_tokens") <= col("budget"))
  }

  /**
   * Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
   * Training of Language Models to Fill in the Middle") — the code-model
   * training-data transform: a `rate` fraction of documents is rewritten
   * in PSM order, `preTok + prefix + sufTok + suffix + midTok + middle`,
   * so the model learns infilling from the permuted context; the rest
   * pass through verbatim (the paper's joint objective).
   *
   * Determinism, the property a training transform must have: the
   * apply/skip decision AND both cut points come from the md5-uniform
   * draw ([[deterministicSample]] mechanics — engine-portable,
   * partitioning-independent, rerun-stable). Cuts are character
   * positions a,b drawn uniformly in [0, len] (a ≤ b after the swap);
   * documents shorter than 2 characters pass through. Map-only,
   * all codegen'd built-ins — no UDF, no shuffle.
   *
   * @return (input columns…, fim_applied BOOLEAN, text_out STRING)
   */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      rate: Double = 0.5, salt: String = "graft",
      preTok: String = "<PRE>", sufTok: String = "<SUF>",
      midTok: String = "<MID>"): DataFrame = {
    val id = col(idCol).cast("string")
    val txt = col(textCol)
    val n = length(txt).cast("long")
    def u(tag: String) =
      conv(substring(md5(concat(lit(salt), lit(tag), id)), 1, 8), 16, 10)
        .cast("long")
    val applied =
      substring(md5(concat(lit(salt), lit(":fim:"), id)), 1, 8) <
        lit(hexBoundary(rate)) && n >= lit(2L)
    val c1 = u(":a:") % (n + lit(1L))
    val c2 = u(":b:") % (n + lit(1L))
    val a = least(c1, c2)
    val b = greatest(c1, c2)
    val rewritten = concat(
      lit(preTok), txt.substr(lit(1), a.cast("int")),
      lit(sufTok), txt.substr((b + 1).cast("int"), (n - b).cast("int")),
      lit(midTok), txt.substr((a + 1).cast("int"), (b - a).cast("int")))
    df.withColumn("fim_applied", applied)
      .withColumn("text_out", when(applied, rewritten).otherwise(txt))
  }

  /**
   * T5-style span corruption (Raffel et al. 2020) — the denoising
   * objective's data rewrite: the document splits into fixed
   * `windowChars` windows; each FULL window is masked with probability
   * `rate` (md5-uniform draw per (doc, window) — engine-portable,
   * partition-stable); a masked window's centered `maskChars` span is
   * replaced by the k-th sentinel `<extra_id_k>` in the input while
   * `<extra_id_k>` + the masked content accumulates into the target,
   * which closes with the final sentinel — exactly the
   * input/target pair a denoising trainer consumes.
   *
   * Scale shape: ONE `aggregate` higher-order function over
   * `sequence(0, nWindows-1)` builds input, target, and the running
   * sentinel index in a single left-to-right pass — no explode, no
   * re-aggregation shuffle, no window function; the whole transform is
   * map-only codegen'd expressions. The fold accumulates per-window
   * PIECES (array append = pointer-sized copies) and joins once at the
   * end — accumulating strings directly would copy the whole document
   * once per window (quadratic characters). Still per-document work:
   * multi-MB documents are better chunked first
   * ([[graft.pipeline.Chunking]]).
   *
   * @return (input columns…, input_text, target_text, n_masked)
   */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      windowChars: Int = 40, maskChars: Int = 8, rate: Double = 0.15,
      salt: String = "graft"): DataFrame = {
    require(windowChars > 0 && maskChars > 0 && maskChars <= windowChars,
      s"need 0 < maskChars <= windowChars: $maskChars / $windowChars")
    val w = windowChars.toLong
    val m = maskChars.toLong
    val off = (w - m) / 2 // centered span, deterministic
    val id = col(idCol).cast("string")
    val txt = col(textCol)
    val n = length(txt).cast("long")
    val nWin = greatest(lit(1L), ceil(n.cast("double") / lit(w.toDouble)).cast("long"))
    def sent(k: Column) = concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    def masked(wi: Column) =
      substring(md5(concat(lit(salt), lit(":span:"), id, lit(":"),
        wi.cast("string"))), 1, 8) < lit(hexBoundary(rate)) &&
        (wi + 1) * lit(w) <= n // only FULL windows mask
    val noPieces = typedLit(Seq.empty[String])
    val folded = aggregate(
      sequence(lit(0L), nWin - 1),
      struct(noPieces.as("inp"), noPieces.as("tgt"), lit(0L).as("k")),
      (acc, wi) => {
        val start = wi * lit(w)
        val whole = txt.substr((start + 1).cast("int"), lit(windowChars))
        val pre = txt.substr((start + 1).cast("int"), lit(off.toInt))
        val mid = txt.substr((start + off + 1).cast("int"), lit(maskChars))
        val post = txt.substr((start + off + m + 1).cast("int"),
          lit((w - off - m).toInt))
        when(masked(wi), struct(
          concat(acc.getField("inp"),
            array(pre, sent(acc.getField("k")), post)).as("inp"),
          concat(acc.getField("tgt"),
            array(sent(acc.getField("k")), mid)).as("tgt"),
          (acc.getField("k") + 1).as("k")))
          .otherwise(struct(
            concat(acc.getField("inp"), array(whole)).as("inp"),
            acc.getField("tgt").as("tgt"),
            acc.getField("k").as("k")))
      },
      acc => struct(
        array_join(acc.getField("inp"), "").as("inp"),
        array_join(concat(acc.getField("tgt"),
          array(sent(acc.getField("k")))), "").as("tgt"),
        acc.getField("k").as("k")))
    df.withColumn("__sc", folded)
      .withColumn("input_text", col("__sc.inp"))
      .withColumn("target_text", col("__sc.tgt"))
      .withColumn("n_masked", col("__sc.k"))
      .drop("__sc")
  }
}
