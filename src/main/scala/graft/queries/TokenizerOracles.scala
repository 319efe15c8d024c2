package graft.queries

/**
 * DuckDB oracle SQL generators that REPLAY tokenizer training and
 * encoding as pure relational algebra, so the registry's BPE/WordPiece
 * rows get full hash oracles instead of rows-only checks.
 *
 * The device: a word's segmentation is ONE string of
 * `chr(1)<sym>chr(2)`-wrapped symbols, so
 *
 *  - "merge all non-overlapping (a,b) left-to-right" is exactly SQL
 *    `replace(seg, chr(1)a chr(2)chr(1)b chr(2), chr(1)ab chr(2))` —
 *    `replace` scans left-to-right and never rescans replaced output,
 *    which is precisely `Tokenizer.mergePair`'s semantics, and the
 *    per-symbol wrapping means adjacent matches share no delimiter
 *    characters (a bare space delimiter would miss back-to-back pairs);
 *  - pair/symbol counts come from splitting the segmentation strings
 *    back into lists (grid-sized — the fixture vocabulary is closed);
 *  - each training round is a MATERIALIZED CTE trio (pairs → argmax →
 *    rewritten segs); no-op rounds past the merge supply running dry
 *    are safe (the LEFT JOIN against an empty argmax row keeps segs
 *    unchanged), same unrolling contract as the PCA/LR/PAVA oracles.
 *
 * WordPiece's likelihood argmax n/(count(a)·count(b)) is replayed
 * EXACTLY via a scaled integer key floor(n·2^96/(ca·cb)) in HUGEINT:
 * two distinct rationals with denominators ≤ D differ by ≥ 1/D², so the
 * keys differ as long as 2^96 ≫ D² (holds through corpus sizes of ~4M
 * tokens, far past the test scales); equal rationals get equal keys and
 * fall to the same (left, right) lexicographic tie-break the trainer
 * uses. This mirrors `trainWordpieceFromCounts`'s BigInt
 * cross-multiplication without needing pairwise comparison in SQL.
 *
 * Encoding replays are bounded unrolls too: BPE greedy lowest-rank
 * merging removes ≥1 symbol per round (word length caps the rounds) and
 * WordPiece greedy longest-match consumes ≥1 character per round; both
 * use the word-length bound + slack, with no-op rounds safe.
 */
private[queries] object TokenizerOracles {

  /** Capped word-frequency table — identical to `Tokenizer.trainBpe`'s
    * collect stage (and the already-oracled q_bpe_word_freqs shape).
    * `docsFrom` is any relation providing (doc_id, text) — "documents"
    * for the standalone tokenizer rows, the train-split CTE for the
    * training-dataset capstone. */
  private def wfCte(minFreq: Long, maxWords: Int,
      docsFrom: String = "documents"): String =
    s"""wf AS MATERIALIZED (
       |  SELECT word, freq FROM (
       |    SELECT word, count(*)::BIGINT AS freq FROM (
       |      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word FROM $docsFrom)
       |    GROUP BY word)
       |  WHERE freq >= $minFreq
       |  ORDER BY freq DESC, word ASC LIMIT $maxWords)""".stripMargin

  /** Split a wrapped segmentation string back into its symbol list. */
  private val segList = "string_split(trim(seg, chr(1) || chr(2)), chr(2) || chr(1))"

  // ======================= BPE =======================

  /** The shared BPE training chain: wf, s0, then (b{r}, s{r+1}) per
    * round — b{r} is round r's winning pair (count desc, left asc,
    * right asc), s{r+1} the rewritten segmentations. */
  private def bpeChain(numMerges: Int, minFreq: Long, maxWords: Int,
      docsFrom: String = "documents"): String = {
    val parts = Seq.newBuilder[String]
    parts += wfCte(minFreq, maxWords, docsFrom)
    parts +=
      s"""s0 AS MATERIALIZED (
         |  SELECT list_reduce(list_transform(string_split_regex(word, ''),
         |           c -> chr(1) || c || chr(2)), (x, y) -> x || y)
         |         || chr(1) || '</w>' || chr(2) AS seg, freq FROM wf)""".stripMargin
    for (r <- 0 until numMerges) {
      parts +=
        s"""b$r AS MATERIALIZED (
           |  SELECT a, b FROM (
           |    SELECT l[i] AS a, l[i+1] AS b, sum(freq) AS n FROM (
           |      SELECT unnest(generate_series(1, len(l) - 1)) AS i, l, freq FROM (
           |        SELECT $segList AS l, freq
           |        FROM s$r) WHERE len(l) >= 2)
           |    GROUP BY a, b)
           |  ORDER BY n DESC, a ASC, b ASC LIMIT 1)""".stripMargin
      parts +=
        s"""s${r + 1} AS MATERIALIZED (
           |  SELECT CASE WHEN b.a IS NULL THEN s.seg
           |    ELSE replace(s.seg, chr(1) || b.a || chr(2) || chr(1) || b.b || chr(2),
           |                 chr(1) || b.a || b.b || chr(2)) END AS seg, s.freq
           |  FROM s$r s LEFT JOIN b$r b ON TRUE)""".stripMargin
    }
    "WITH " + parts.result().mkString(",\n")
  }

  /** Oracle for q_bpe_merges: (rank, left, right, merged) in rank order;
    * rounds past the supply running dry contribute no row, matching the
    * trainer's early stop. */
  def bpeMergesSql(numMerges: Int, minFreq: Long, maxWords: Int): String = {
    val union = (0 until numMerges).map(r =>
      s"""SELECT $r AS rank, a AS "left", b AS "right", a || b AS merged FROM b$r""")
      .mkString("\nUNION ALL ")
    bpeChain(numMerges, minFreq, maxWords) +
      "\nSELECT * FROM (" + union + ") ORDER BY rank"
  }

  /** BPE encode replay over the distinct encode-corpus words: greedy
    * lowest-rank adjacent merge per round, all occurrences at once
    * (rank ties across positions cannot occur — ranks are unique per
    * pair). `encRounds` need only cover the longest word's symbol
    * count; extra rounds are no-ops. */
  private def bpeEncodeChain(numMerges: Int, encRounds: Int, minFreq: Long,
      maxWords: Int, trainFrom: String = "documents",
      encodeFrom: String = "documents"): String = {
    val parts = Seq.newBuilder[String]
    val ranks = (0 until numMerges)
      .map(r => s"SELECT $r AS rank, a, b FROM b$r").mkString("\nUNION ALL ")
    parts += "ranks AS MATERIALIZED (" + ranks + ")"
    parts +=
      s"""ew AS MATERIALIZED (
         |  SELECT DISTINCT word FROM (
         |    SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
         |    FROM $encodeFrom))""".stripMargin
    parts +=
      """e0 AS MATERIALIZED (
        |  SELECT word, list_reduce(list_transform(string_split_regex(word, ''),
        |           c -> chr(1) || c || chr(2)), (x, y) -> x || y)
        |         || chr(1) || '</w>' || chr(2) AS seg FROM ew)""".stripMargin
    for (k <- 0 until encRounds) {
      parts +=
        s"""e${k + 1} AS MATERIALIZED (
           |  SELECT s.word, CASE WHEN m.a IS NULL THEN s.seg
           |    ELSE replace(s.seg, chr(1) || m.a || chr(2) || chr(1) || m.b || chr(2),
           |                 chr(1) || m.a || m.b || chr(2)) END AS seg
           |  FROM e$k s LEFT JOIN (
           |    SELECT word, arg_min(a, rank) AS a, arg_min(b, rank) AS b FROM (
           |      SELECT w.word, r.a, r.b, r.rank FROM (
           |        SELECT word, l[i] AS a, l[i+1] AS b FROM (
           |          SELECT word, unnest(generate_series(1, len(l) - 1)) AS i, l FROM (
           |            SELECT word, $segList AS l
           |            FROM e$k) WHERE len(l) >= 2)) w
           |      JOIN ranks r ON r.a = w.a AND r.b = w.b)
           |    GROUP BY word) m ON m.word = s.word)""".stripMargin
    }
    // Loud bound check (r7 ADVICE): encRounds is a fixture invariant —
    // a corpus word needing more merge rounds would silently under-merge
    // and surface only as an opaque oracle hash diff. If any final seg
    // still has a joinable ranked pair, fail the oracle with a message
    // naming the violated bound instead.
    parts +=
      s"""eguard AS MATERIALIZED (
         |  SELECT CASE WHEN count(*) > 0 THEN error(
         |      'bpeEncodeChain: encRounds=$encRounds under-merges — a joinable ranked pair remains')
         |    ELSE 0 END AS ok
         |  FROM (SELECT word, l[i] AS a, l[i+1] AS b FROM (
         |      SELECT word, unnest(generate_series(1, len(l) - 1)) AS i, l FROM (
         |        SELECT word, $segList AS l FROM e$encRounds) WHERE len(l) >= 2)) w
         |    JOIN ranks r ON r.a = w.a AND r.b = w.b)""".stripMargin
    parts +=
      s"""wtoks AS MATERIALIZED (
         |  SELECT word, len($segList) AS n_toks
         |  FROM e$encRounds WHERE (SELECT ok FROM eguard) = 0)""".stripMargin
    bpeChain(numMerges, minFreq, maxWords, trainFrom) + ",\n" +
      parts.result().mkString(",\n")
  }

  /** Per-doc token-count projection shared by the encode oracles:
    * explode doc words, join the per-word token counts, LEFT JOIN so an
    * all-empty doc still emits 0. */
  private def docProjection(extraSelect: String, extraJoin: String): String =
    s"""
       |SELECT d.doc_id, CAST(coalesce(t.n, 0) AS INT) AS n_tokens$extraSelect
       |FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
       |LEFT JOIN (
       |  SELECT doc_id, sum(n_toks) AS n$extraJoin FROM (
       |    SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |      unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
       |    FROM documents) dw JOIN wtoks USING (word)${
         if (extraJoin.nonEmpty) " JOIN wsum USING (word)" else ""}
       |  GROUP BY doc_id) t USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Oracle for q_bpe_encode: (doc_id, n_tokens). */
  def bpeEncodeSql(numMerges: Int, encRounds: Int, minFreq: Long,
      maxWords: Int): String =
    bpeEncodeChain(numMerges, encRounds, minFreq, maxWords) +
      docProjection("", "")

  /** Oracle for q_tokenizer_fertility: per-language subword fertility
    * (tokens/word) and compression (word bytes/token) aggregated from the
    * replayed per-word BPE token counts; integer sums, 6dp ratios behind
    * the +1e-9 half-boundary dodge. */
  def bpeFertilitySql(numMerges: Int, encRounds: Int, minFreq: Long,
      maxWords: Int): String =
    bpeEncodeChain(numMerges, encRounds, minFreq, maxWords) +
      s""",
         |docw AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
         |  FROM documents),
         |fert AS (
         |  SELECT d.lang, sum(w.n_toks)::BIGINT AS n_tokens,
         |    count(*)::BIGINT AS n_words,
         |    sum(strlen(dw.word))::BIGINT AS word_bytes
         |  FROM docw dw JOIN wtoks w USING (word)
         |  JOIN documents d ON d.doc_id = dw.doc_id
         |  GROUP BY 1)
         |SELECT lang, n_tokens, n_words, word_bytes,
         |  round(n_tokens / n_words::DOUBLE + 1e-9, 6) AS tokens_per_word,
         |  round(word_bytes / n_tokens::DOUBLE + 1e-9, 6) AS bytes_per_token
         |FROM fert ORDER BY lang""".stripMargin

  /** Oracle for q_bpe_persisted: (doc_id, n_tokens, ids_sum) with the
    * model's dense vocab ids (sorted final-symbols ∪ merge results,
    * 0-based) — replays `Tokenizer.vocabIds` + `bpeEncodeIds`. */
  def bpePersistedSql(numMerges: Int, encRounds: Int, minFreq: Long,
      maxWords: Int): String = {
    val mergedUnion = (0 until numMerges)
      .map(r => s"SELECT a || b AS piece FROM b$r").mkString("\nUNION ALL ")
    bpeEncodeChain(numMerges, encRounds, minFreq, maxWords) +
      s""",
         |bvocab AS MATERIALIZED (
         |  SELECT piece, CAST(row_number() OVER (ORDER BY piece ASC) - 1 AS INT) AS id FROM (
         |    SELECT DISTINCT piece FROM (
         |      SELECT unnest($segList) AS piece
         |      FROM s$numMerges
         |      UNION ALL $mergedUnion))),
         |wsum AS MATERIALIZED (
         |  SELECT word, sum(v.id)::BIGINT AS ids_sum FROM (
         |    SELECT word, unnest($segList) AS piece
         |    FROM e$encRounds) wt JOIN bvocab v ON v.piece = wt.piece
         |  GROUP BY word)""".stripMargin +
      docProjection(",\n  CAST(coalesce(t.s, 0) AS BIGINT) AS ids_sum",
        ", sum(ids_sum) AS s")
  }

  // ======================= WordPiece =======================

  /** 2^96 — the likelihood-score scaling constant (see object doc). */
  private val WpScale = "79228162514264337593543950336"

  private def wpChain(numMerges: Int, minFreq: Long, maxWords: Int): String = {
    val parts = Seq.newBuilder[String]
    parts += wfCte(minFreq, maxWords)
    parts +=
      """s0 AS MATERIALIZED (
        |  SELECT list_reduce(list_transform(string_split_regex(word, ''),
        |           (c, i) -> chr(1) || CASE WHEN i = 1 THEN c ELSE '##' || c END || chr(2)),
        |           (x, y) -> x || y) AS seg, freq FROM wf)""".stripMargin
    for (r <- 0 until numMerges) {
      parts +=
        s"""b$r AS MATERIALIZED (
           |  SELECT a, b FROM (
           |    SELECT p.a, p.b,
           |           (CAST(p.n AS HUGEINT) * $WpScale)
           |             // (CAST(ca.n AS HUGEINT) * cb.n) AS score
           |    FROM (
           |      SELECT l[i] AS a, l[i+1] AS b, sum(freq) AS n FROM (
           |        SELECT unnest(generate_series(1, len(l) - 1)) AS i, l, freq FROM (
           |          SELECT $segList AS l, freq
           |          FROM s$r) WHERE len(l) >= 2)
           |      GROUP BY a, b) p
           |    JOIN (
           |      SELECT sym, sum(freq) AS n FROM (
           |        SELECT unnest($segList) AS sym, freq
           |        FROM s$r) GROUP BY sym) ca ON ca.sym = p.a
           |    JOIN (
           |      SELECT sym, sum(freq) AS n FROM (
           |        SELECT unnest($segList) AS sym, freq
           |        FROM s$r) GROUP BY sym) cb ON cb.sym = p.b)
           |  ORDER BY score DESC, a ASC, b ASC LIMIT 1)""".stripMargin
      parts +=
        s"""s${r + 1} AS MATERIALIZED (
           |  SELECT CASE WHEN b.a IS NULL THEN s.seg
           |    ELSE replace(s.seg, chr(1) || b.a || chr(2) || chr(1) || b.b || chr(2),
           |                 chr(1) || b.a ||
           |                 CASE WHEN b.b LIKE '##%' THEN substring(b.b, 3) ELSE b.b END
           |                 || chr(2)) END AS seg, s.freq
           |  FROM s$r s LEFT JOIN b$r b ON TRUE)""".stripMargin
    }
    val mergedUnion = (0 until numMerges).map(r =>
      s"SELECT a || CASE WHEN b LIKE '##%' THEN substring(b, 3) ELSE b END AS piece FROM b$r")
      .mkString("\nUNION ALL ")
    "WITH " + parts.result().mkString(",\n") +
      s""",
         |vocab AS MATERIALIZED (
         |  SELECT DISTINCT piece FROM (
         |    SELECT unnest($segList) AS piece FROM s0
         |    UNION ALL SELECT '[UNK]'
         |    UNION ALL $mergedUnion))""".stripMargin
  }

  /** Oracle for q_wordpiece_vocab: (piece_id, piece) — alphabet ∪ merge
    * results ∪ [UNK], sorted, dense 0-based ids. */
  def wordpieceVocabSql(numMerges: Int, minFreq: Long, maxWords: Int): String =
    wpChain(numMerges, minFreq, maxWords) +
      """
        |SELECT CAST(row_number() OVER (ORDER BY piece ASC) - 1 AS INT) AS piece_id, piece
        |FROM vocab ORDER BY piece_id""".stripMargin

  /** Oracle for q_wordpiece_encode: greedy longest-match-first per word
    * as a bounded unroll over (word, pos, toks, failed) state; a word
    * with an unmatchable remainder collapses to a single [UNK]. */
  def wordpieceEncodeSql(numMerges: Int, encRounds: Int, minFreq: Long,
      maxWords: Int): String = {
    val parts = Seq.newBuilder[String]
    parts +=
      """ew AS MATERIALIZED (
        |  SELECT DISTINCT word FROM (
        |    SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
        |    FROM documents))""".stripMargin
    parts += "w0 AS MATERIALIZED (\n  SELECT word, 1 AS pos, 0 AS toks, false AS failed FROM ew)"
    for (k <- 0 until encRounds) {
      parts +=
        s"""w${k + 1} AS MATERIALIZED (
           |  SELECT s.word,
           |    CASE WHEN s.failed OR s.pos > len(s.word) OR m.l IS NULL THEN s.pos
           |         ELSE s.pos + m.l END AS pos,
           |    CASE WHEN s.failed OR s.pos > len(s.word) OR m.l IS NULL THEN s.toks
           |         ELSE s.toks + 1 END AS toks,
           |    CASE WHEN s.failed THEN true
           |         WHEN s.pos <= len(s.word) AND m.l IS NULL THEN true
           |         ELSE false END AS failed
           |  FROM w$k s LEFT JOIN (
           |    SELECT word, max(L) AS l FROM (
           |      SELECT c.word, c.L FROM (
           |        SELECT word, unnest(generate_series(1, len(word) - pos + 1)) AS L,
           |          CASE WHEN pos = 1 THEN '' ELSE '##' END AS pre, pos
           |        FROM w$k WHERE pos <= len(word) AND NOT failed) c
           |      JOIN vocab v ON v.piece = c.pre || substring(c.word, c.pos, c.L))
           |    GROUP BY word) m USING (word))""".stripMargin
    }
    // Loud bound check (r7 ADVICE): a word still mid-scan after
    // encRounds greedy steps would silently report a short token count.
    parts +=
      s"""wguard AS MATERIALIZED (
         |  SELECT CASE WHEN count(*) > 0 THEN error(
         |      'wordpieceEncodeSql: encRounds=$encRounds too small — unfinished words remain')
         |    ELSE 0 END AS ok
         |  FROM w$encRounds WHERE NOT failed AND pos <= len(word))""".stripMargin
    parts +=
      s"""wtoks AS MATERIALIZED (
         |  SELECT word, CASE WHEN failed THEN 1 ELSE toks END AS n_toks
         |  FROM w$encRounds WHERE (SELECT ok FROM wguard) = 0)""".stripMargin
    wpChain(numMerges, minFreq, maxWords) + ",\n" + parts.result().mkString(",\n") +
      docProjection("", "")
  }

  // ======================= training-dataset capstone =======================

  /**
   * Oracle for q_training_dataset — the full capstone composition in one
   * replay, each stage the SQL form its own operator-query already
   * proves: default-rules quality gate → exact dedup (keep-smallest-id
   * per whitespace-normalized md5 fingerprint) → md5-band train/val/test
   * split → the BPE merge-loop replay FITTED ON THE TRAIN SPLIT ONLY →
   * encode replay over every kept doc → greedy sequence packing per
   * (split, group) via the recursive-CTE scan (the q_pack_sequences
   * device), aggregated to (split, grp, pack, n_docs, pack_tokens).
   */
  def trainingDatasetSql(numMerges: Int, encRounds: Int, tokenBudget: Long,
      numGroups: Int): String = {
    // default QualityRules thresholds (Curation.QualityRules())
    val prelude =
      s"""docs0 AS MATERIALIZED (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
         |qtoks AS (
         |  SELECT doc_id, text,
         |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
         |  FROM docs0),
         |qbg AS (
         |  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS g
         |  FROM (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i FROM qtoks)
         |  QUALIFY g IS NOT NULL),
         |qbgtop AS (
         |  SELECT doc_id, max(c) AS top, sum(c) AS nbg FROM (
         |    SELECT doc_id, g, count(*) AS c FROM qbg GROUP BY 1, 2) GROUP BY doc_id),
         |qf AS (
         |  SELECT t.doc_id,
         |    len(tk) AS n_words,
         |    round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / greatest(len(tk), 1), 4) AS mean_len,
         |    round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
         |      / greatest(length(text), 1), 4) AS sym_ratio,
         |    round(CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
         |      / greatest(len(tk), 1), 4) AS alpha_ratio,
         |    len(list_intersect(list_distinct(tk),
         |      ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by'])) AS stop_hits,
         |    round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / greatest(len(tk), 1), 4) AS dup_uni,
         |    round(CAST(coalesce(qbgtop.top, 0) AS DOUBLE) / greatest(coalesce(qbgtop.nbg, 1), 1), 4) AS top_bg
         |  FROM qtoks t LEFT JOIN qbgtop ON t.doc_id = qbgtop.doc_id),
         |kept AS MATERIALIZED (
         |  SELECT d.doc_id, d.text FROM docs0 d JOIN qf USING (doc_id)
         |  WHERE (n_words BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
         |    AND sym_ratio <= 0.1 AND alpha_ratio >= 0.8 AND stop_hits >= 2
         |    AND dup_uni <= 0.6 AND top_bg <= 0.18),
         |kfp AS (
         |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |  FROM kept),
         |kmin AS (SELECT f, min(doc_id) AS k FROM kfp GROUP BY f),
         |splitdocs AS MATERIALIZED (
         |  SELECT doc_id, text,
         |    CASE WHEN u < 0.98 THEN 'train' WHEN u < 0.99 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (
         |    SELECT kept.doc_id, kept.text,
         |      ('0x' || substr(md5('graft' || CAST(kept.doc_id AS VARCHAR)), 1, 8))::BIGINT
         |        / 4294967296.0 AS u
         |    FROM kept JOIN kfp USING (doc_id) JOIN kmin
         |      ON kfp.f = kmin.f AND kept.doc_id = kmin.k)),
         |traindocs AS MATERIALIZED (
         |  SELECT doc_id, text FROM splitdocs WHERE split = 'train')""".stripMargin
    val tokenizer = bpeEncodeChain(numMerges, encRounds, minFreq = 1L,
      maxWords = 1000000, trainFrom = "traindocs", encodeFrom = "splitdocs")
      .stripPrefix("WITH ")
    val packing =
      s"""enc AS MATERIALIZED (
         |  SELECT s.doc_id, s.split,
         |    ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 15))::BIGINT % $numGroups AS grp,
         |    coalesce(t.n, 0) AS tokens
         |  FROM splitdocs s
         |  LEFT JOIN (
         |    SELECT doc_id, sum(n_toks) AS n FROM (
         |      SELECT doc_id,
         |        unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
         |      FROM splitdocs) dw JOIN wtoks USING (word)
         |    GROUP BY doc_id) t ON t.doc_id = s.doc_id),
         |rseq AS (
         |  SELECT enc.*, row_number() OVER (PARTITION BY split, grp ORDER BY doc_id) AS rn
         |  FROM enc),
         |pk AS (
         |  SELECT split, grp, rn, doc_id, tokens, tokens AS acc, 0::BIGINT AS pack
         |  FROM rseq WHERE rn = 1
         |  UNION ALL
         |  SELECT r.split, r.grp, r.rn, r.doc_id, r.tokens,
         |    CASE WHEN s.acc + r.tokens > $tokenBudget THEN r.tokens
         |         ELSE s.acc + r.tokens END,
         |    CASE WHEN s.acc + r.tokens > $tokenBudget THEN s.pack + 1 ELSE s.pack END
         |  FROM pk s JOIN rseq r
         |    ON r.split = s.split AND r.grp = s.grp AND r.rn = s.rn + 1)
         |SELECT split, grp, pack, count(*) AS n_docs,
         |  sum(tokens)::BIGINT AS pack_tokens
         |FROM pk GROUP BY split, grp, pack
         |ORDER BY split, grp, pack""".stripMargin
    "WITH RECURSIVE " + prelude + ",\n" + tokenizer + ",\n" + packing
  }

  // ======================= Unigram (trained model) =======================

  /**
   * The anchored unigram-EM training chain: seed (substring counts,
   * chars always kept, top-`seedSize` multi-char pieces), then
   * `emSubIters` forward–backward E-steps + renormalizing M-steps,
   * replayed exactly thanks to `Unigram`'s rounding anchors (10dp
   * lattice values and posterior exponents, 4dp expected counts, 8dp
   * log-probs — see that object's doc). Replays the NO-PRUNE path the
   * registry configuration takes (fixture vocab ≈ 259 < targetVocab
   * 1000); each lattice position is one unrolled CTE layer, `maxPos`
   * bounding the longest word (extra layers are no-ops).
   */
  private def unigramChain(emSubIters: Int, seedSize: Int, maxPieceLen: Int,
      maxPos: Int, minFreq: Long, maxWords: Int, maxWordLen: Int): String = {
    val P = Seq.newBuilder[String]
    P +=
      s"""uwf AS MATERIALIZED (
         |  SELECT word, freq FROM (
         |    SELECT word, count(*)::BIGINT AS freq FROM (
         |      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word FROM documents)
         |    GROUP BY word)
         |  WHERE freq >= $minFreq AND len(word) <= $maxWordLen
         |  ORDER BY freq DESC, word ASC LIMIT $maxWords)""".stripMargin
    P +=
      s"""usubs AS MATERIALIZED (
         |  SELECT piece, sum(freq)::DOUBLE AS c FROM (
         |    SELECT substring(word, i, l) AS piece, freq
         |    FROM uwf, UNNEST(generate_series(1, len(word))) AS a(i),
         |         UNNEST(generate_series(1, $maxPieceLen)) AS b(l)
         |    WHERE i + l - 1 <= len(word))
         |  GROUP BY piece)""".stripMargin
    P +=
      s"""uvocab AS MATERIALIZED (
         |  SELECT piece FROM usubs WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece FROM (
         |    SELECT piece, c FROM usubs WHERE len(piece) >= 2
         |    ORDER BY c DESC, piece ASC LIMIT $seedSize))""".stripMargin
    P +=
      """ulp0 AS MATERIALIZED (
        |  SELECT v.piece, round(ln(s.c / t.tot), 8) AS lp
        |  FROM uvocab v JOIN usubs s USING (piece)
        |  CROSS JOIN (SELECT sum(s2.c) AS tot FROM uvocab v2 JOIN usubs s2 USING (piece)) t)""".stripMargin
    // Loud bound check (r7 ADVICE): if the longest trained word exceeds
    // maxPos the lattice layers truncate and the replay silently
    // diverges — fail with the violated bound's name instead.
    P +=
      s"""uguard AS MATERIALIZED (
         |  SELECT CASE WHEN max(len(word)) > $maxPos THEN error(
         |      'unigramChain: maxPos=$maxPos < longest corpus word — lattice truncated')
         |    ELSE 0 END AS ok FROM uwf)""".stripMargin
    P +=
      s"""uarcs AS MATERIALIZED (
         |  SELECT w.word, w.freq, t.j, t.i, substring(w.word, t.j + 1, t.i - t.j) AS piece
         |  FROM uwf w, (SELECT a.j, b.i FROM UNNEST(generate_series(0, ${maxWordLen - 1})) AS a(j),
         |               UNNEST(generate_series(1, $maxWordLen)) AS b(i)
         |               WHERE i > j AND i - j <= $maxPieceLen) t
         |  WHERE t.i <= len(w.word)
         |    AND substring(w.word, t.j + 1, t.i - t.j) IN (SELECT piece FROM uvocab)
         |    AND (SELECT ok FROM uguard) = 0)""".stripMargin
    for (t <- 0 until emSubIters) {
      P += s"ula${t}_0 AS (SELECT word, 0 AS pos, CAST(0.0 AS DOUBLE) AS v FROM uwf)"
      for (i <- 1 to maxPos) {
        P +=
          s"""ula${t}_$i AS MATERIALIZED (
             |  SELECT * FROM ula${t}_${i - 1}
             |  UNION ALL
             |  SELECT word, $i AS pos, round(mx + ln(sexp), 10) AS v FROM (
             |    SELECT s.word, s.mx, sum(exp(s.s - s.mx)) AS sexp FROM (
             |      SELECT a.word, p.v + l.lp AS s,
             |             max(p.v + l.lp) OVER (PARTITION BY a.word) AS mx
             |      FROM uarcs a
             |      JOIN ula${t}_${i - 1} p ON p.word = a.word AND p.pos = a.j
             |      JOIN ulp$t l ON l.piece = a.piece
             |      WHERE a.i = $i) s
             |    GROUP BY s.word, s.mx) )""".stripMargin
      }
      P += s"ulb${t}_0 AS (SELECT word, len(word) AS pos, CAST(0.0 AS DOUBLE) AS v FROM uwf)"
      for (d <- 1 to maxPos) {
        P +=
          s"""ulb${t}_$d AS MATERIALIZED (
             |  SELECT * FROM ulb${t}_${d - 1}
             |  UNION ALL
             |  SELECT word, pos, round(mx + ln(sexp), 10) AS v FROM (
             |    SELECT s.word, s.pos, s.mx, sum(exp(s.s - s.mx)) AS sexp FROM (
             |      SELECT a.word, a.j AS pos, l.lp + p.v AS s,
             |             max(l.lp + p.v) OVER (PARTITION BY a.word, a.j) AS mx
             |      FROM uarcs a
             |      JOIN ulb${t}_${d - 1} p ON p.word = a.word AND p.pos = a.i
             |      JOIN ulp$t l ON l.piece = a.piece
             |      WHERE len(a.word) - a.j = $d) s
             |    GROUP BY s.word, s.pos, s.mx) )""".stripMargin
      }
      P +=
        s"""uc4_$t AS MATERIALIZED (
           |  SELECT v.piece, round(coalesce(e.c, 0.0), 4) AS c FROM uvocab v
           |  LEFT JOIN (
           |    SELECT a.piece, sum(a.freq * exp(post)) AS c FROM (
           |      SELECT ar.piece, ar.freq,
           |        round(la.v + l.lp + lb.v - z.v, 10) AS post
           |      FROM uarcs ar
           |      JOIN ula${t}_$maxPos la ON la.word = ar.word AND la.pos = ar.j
           |      JOIN ulb${t}_$maxPos lb ON lb.word = ar.word AND lb.pos = ar.i
           |      JOIN ulp$t l ON l.piece = ar.piece
           |      JOIN ula${t}_$maxPos z ON z.word = ar.word AND z.pos = len(ar.word)) a
           |    WHERE post > -30.0
           |    GROUP BY a.piece) e USING (piece))""".stripMargin
      P +=
        s"""ulp${t + 1} AS MATERIALIZED (
           |  SELECT piece, CASE WHEN c > 0 THEN round(ln(c) - t.lt, 8)
           |                     ELSE -1000000000.0 END AS lp
           |  FROM uc4_$t CROSS JOIN (SELECT ln(sum(c)) AS lt FROM uc4_$t) t)""".stripMargin
    }
    "WITH " + P.result().mkString(",\n")
  }

  /** Oracle for q_unigram_vocab: (piece, logprob) of the trained model. */
  def unigramVocabSql(emSubIters: Int, seedSize: Int, maxPieceLen: Int,
      maxPos: Int, minFreq: Long = 1L, maxWords: Int = 1000000,
      maxWordLen: Int = 48): String =
    unigramChain(emSubIters, seedSize, maxPieceLen, maxPos, minFreq,
      maxWords, maxWordLen) +
      s"\nSELECT piece, round(lp, 8) AS logprob FROM ulp$emSubIters ORDER BY piece"

  /** Oracle for q_unigram_encode: Viterbi per-doc token counts under the
    * trained (replayed) model. Path scores are raw doubles on both
    * engines — sums of the same ≤(word length) 8dp-anchored log-probs —
    * with the trainer's first-smallest-split tie-break. */
  def unigramEncodeSql(emSubIters: Int, seedSize: Int, maxPieceLen: Int,
      maxPos: Int, minFreq: Long = 1L, maxWords: Int = 1000000,
      maxWordLen: Int = 48): String = {
    val P = Seq.newBuilder[String]
    P +=
      """uew AS MATERIALIZED (SELECT DISTINCT word FROM (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word FROM documents))""".stripMargin
    P += "uv0 AS (SELECT word, 0 AS i, CAST(0.0 AS DOUBLE) AS best, 0 AS cnt FROM uew)"
    for (i <- 1 to maxPos) {
      val lo = math.max(0, i - maxPieceLen)
      P +=
        s"""uv$i AS MATERIALIZED (
           |  SELECT * FROM uv${i - 1}
           |  UNION ALL
           |  SELECT word, $i AS i, best, cnt FROM (
           |    SELECT c.word, c.score AS best, c.cnt,
           |           row_number() OVER (PARTITION BY c.word ORDER BY c.score DESC, c.j ASC) AS rn
           |    FROM (
           |      SELECT w.word, t.j, p.best + v.lp AS score, p.cnt + 1 AS cnt
           |      FROM uew w
           |      CROSS JOIN (SELECT unnest(generate_series($lo, ${i - 1})) AS j) t
           |      JOIN uv${i - 1} p ON p.word = w.word AND p.i = t.j
           |      JOIN ulp$emSubIters v ON v.piece = substring(w.word, t.j + 1, $i - t.j)
           |      WHERE len(w.word) >= $i) c)
           |  WHERE rn = 1)""".stripMargin
    }
    // Loud bound check (r7 ADVICE): the inner JOIN at l.i = len(word)
    // silently DROPS any encode word longer than maxPos — fail instead.
    P +=
      s"""ueguard AS MATERIALIZED (
         |  SELECT CASE WHEN max(len(word)) > $maxPos THEN error(
         |      'unigramEncodeSql: maxPos=$maxPos < longest encode word — words would be dropped')
         |    ELSE 0 END AS ok FROM uew)""".stripMargin
    P +=
      s"""uwtoks AS MATERIALIZED (
         |  SELECT w.word, l.cnt AS n_toks FROM uew w
         |  JOIN uv$maxPos l ON l.word = w.word AND l.i = len(w.word)
         |  WHERE (SELECT ok FROM ueguard) = 0)""".stripMargin
    unigramChain(emSubIters, seedSize, maxPieceLen, maxPos, minFreq,
      maxWords, maxWordLen) + ",\n" + P.result().mkString(",\n") +
      s"""
         |SELECT d.doc_id, CAST(coalesce(t.n, 0) AS INT) AS n_tokens
         |FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
         |LEFT JOIN (
         |  SELECT doc_id, sum(n_toks) AS n FROM (
         |    SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |      unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
         |    FROM documents) dw JOIN uwtoks USING (word)
         |  GROUP BY doc_id) t USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
  }

  // ======================= Unigram (planted model) =======================

  /**
   * Oracle for q_unigram_planted_encode: Viterbi segmentation against a
   * FIXED planted piece table whose log-probs are all exact binary
   * quarters — every path score is a sum of ≤ `maxWordLen` exact
   * doubles, so both engines compute IDENTICAL scores and the argmax
   * (with the trainer's first-smallest-split tie-break, replayed here
   * as `row_number() ORDER BY score DESC, j ASC`) picks identically.
   * The DP unrolls one CTE layer per character position (word length
   * bounds the layers). The TRAINED unigram model stays rows-only: its
   * EM accumulates forward–backward mass in hash-map iteration order,
   * which no engine-independent replay can reproduce (see CATALOG.md).
   */
  def unigramPlantedEncodeSql(pieces: Seq[(String, Double)],
      maxPieceLen: Int, maxWordLen: Int): String = {
    val vals = pieces.map { case (p, lp) => s"('$p', $lp)" }.mkString(", ")
    val parts = Seq.newBuilder[String]
    parts += s"uvocab AS MATERIALIZED (SELECT piece, CAST(lp AS DOUBLE) AS lp " +
      s"FROM (VALUES $vals) AS t(piece, lp))"
    parts +=
      """ew AS MATERIALIZED (
        |  SELECT DISTINCT word FROM (
        |    SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
        |    FROM documents))""".stripMargin
    parts += "L0 AS MATERIALIZED (SELECT word, 0 AS i, CAST(0.0 AS DOUBLE) AS best, 0 AS cnt FROM ew)"
    for (i <- 1 to maxWordLen) {
      val lo = math.max(0, i - maxPieceLen)
      parts +=
        s"""L$i AS MATERIALIZED (
           |  SELECT * FROM L${i - 1}
           |  UNION ALL
           |  SELECT word, $i AS i, best, cnt FROM (
           |    SELECT c.word, c.score AS best, c.cnt,
           |           row_number() OVER (PARTITION BY c.word ORDER BY c.score DESC, c.j ASC) AS rn
           |    FROM (
           |      SELECT w.word, t.j, p.best + v.lp AS score, p.cnt + 1 AS cnt
           |      FROM ew w
           |      CROSS JOIN (SELECT unnest(generate_series($lo, ${i - 1})) AS j) t
           |      JOIN L${i - 1} p ON p.word = w.word AND p.i = t.j
           |      JOIN uvocab v ON v.piece = substring(w.word, t.j + 1, $i - t.j)
           |      WHERE len(w.word) >= $i) c)
           |  WHERE rn = 1)""".stripMargin
    }
    // Loud bound check (r7 ADVICE): the inner JOIN at l.i = len(word)
    // silently DROPS any word longer than maxWordLen — fail instead.
    parts +=
      s"""pguard AS MATERIALIZED (
         |  SELECT CASE WHEN max(len(word)) > $maxWordLen THEN error(
         |      'unigramPlantedEncodeSql: maxWordLen=$maxWordLen < longest word — words would be dropped')
         |    ELSE 0 END AS ok FROM ew)""".stripMargin
    parts +=
      s"""wtoks AS MATERIALIZED (
         |  SELECT w.word, l.cnt AS n_toks FROM ew w
         |  JOIN L$maxWordLen l ON l.word = w.word AND l.i = len(w.word)
         |  WHERE (SELECT ok FROM pguard) = 0)""".stripMargin
    "WITH " + parts.result().mkString(",\n") + docProjection("", "")
  }
}
