package graft.queries

import graft.pipeline.{Curation, Dedup}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators as declared queries over the `documents` test
 * table: duplicate-cluster assignment (connected components over near-dup
 * pairs), Gopher/C4-style quality filtering, PII redaction, and
 * deterministic (stratified) sampling. Every query here has an exact DuckDB
 * oracle — the cluster one leans on a recursive CTE, the sampling ones on
 * md5's cross-engine portability.
 */
object CurationQueries {

  import Registry.t

  /** Shared DSIR replay through `allw` (doc_id, n_tokens, log_weight):
    * md5 bucketing, smoothed target/raw log-ratio model (target =
    * lang 'en'), per-doc weight sums — used by the batch select oracle
    * and the streaming screen oracle. */
  private[queries] val dsirWeightCtes: String = {
    val hexv = Seq(65536, 4096, 256, 16, 1).zipWithIndex.map { case (m, i) =>
      s"(strpos('0123456789abcdef', substr(md5(tok), ${i + 1}, 1)) - 1) * $m"
    }.mkString("(", "\n       + ", ")")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
       |  FROM documents),
       |rtok AS (
       |  SELECT doc_id, ts[i] AS tok
       |  FROM toks, UNNEST(generate_series(1, len(ts))) AS u(i)),
       |rb AS MATERIALIZED (
       |  SELECT doc_id, $hexv % 1024 AS b FROM rtok),
       |bk AS (SELECT range AS b FROM range(0, 1024)),
       |tcnt AS (SELECT b, count(*)::BIGINT AS c FROM rb
       |         JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
       |rcnt AS (SELECT b, count(*)::BIGINT AS c FROM rb GROUP BY 1),
       |llr AS MATERIALIZED (
       |  SELECT bk.b,
       |    ln((coalesce(tc.c, 0) + 0.5) /
       |       ((SELECT sum(c)::BIGINT FROM tcnt) + 512.0))
       |  - ln((coalesce(rc.c, 0) + 0.5) /
       |       ((SELECT sum(c)::BIGINT FROM rcnt) + 512.0)) AS llr
       |  FROM bk LEFT JOIN tcnt tc USING (b) LEFT JOIN rcnt rc USING (b)),
       |w AS (
       |  SELECT rb.doc_id, count(*)::BIGINT AS n_tokens,
       |    round(sum(l.llr), 6) AS log_weight
       |  FROM rb JOIN llr l USING (b) GROUP BY 1),
       |allw AS (
       |  SELECT d.doc_id, coalesce(w.n_tokens, 0)::BIGINT AS n_tokens,
       |    coalesce(w.log_weight, 0.0) AS log_weight
       |  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN w USING (doc_id))""".stripMargin
  }

  /** the ngram-Jaccard pair CTEs shared by the cluster oracle (identical to
    * q_dedup_ngram_jaccard's oracle, kept in one place) */
  private val NgramPairsCtes =
    """tok AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tok,
      |         generate_subscripts(list_filter(string_split(lower(text), ' '), x -> x <> ''), 1) AS i
      |  FROM documents),
      |allgrams AS (
      |  SELECT DISTINCT doc_id, g FROM (
      |    SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS g
      |    FROM tok) WHERE g IS NOT NULL),
      |gdf AS (SELECT g, count(*) AS gcnt FROM allgrams GROUP BY g),
      |grams AS (
      |  SELECT allgrams.doc_id, allgrams.g FROM allgrams
      |  JOIN gdf ON allgrams.g = gdf.g WHERE gdf.gcnt <= 100),
      |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4) >= 0.5)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // near-dup pairs → connected components → transitive keep-one policy;
    // the oracle closes the same edge list with a recursive CTE
    "q_dedup_clusters" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2,
          threshold = 0.5, maxGramDf = 100L)
        Curation.dedupClusters(docs, "doc_id", pairs)
          .select($"id".as("doc_id"), $"cluster", $"keep")
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $NgramPairsCtes,
             |edges AS (
             |  SELECT id_a AS s, id_b AS d FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT s, s FROM edges
             |  UNION SELECT e.d, reach.r FROM edges e JOIN reach ON reach.id = e.s),
             |cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
             |SELECT doc_id, coalesce(cc.cluster, doc_id) AS cluster,
             |       doc_id = coalesce(cc.cluster, doc_id) AS keep
             |FROM documents LEFT JOIN cc ON doc_id = cc.id
             |ORDER BY doc_id""".stripMargin)),

    // ENSEMBLE dedup: n-gram-Jaccard and SimHash pair generators union
    // into ONE edge list before the connected-components pass — defense
    // in depth (each method misses different near-dup shapes; the union
    // clusters transitively across methods). The oracle replays both
    // generators (shared ngram CTEs + s-prefixed simhash CTEs) and closes
    // the combined edges with the same recursive CTE.
    "q_dedup_ensemble" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val np = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2,
          threshold = 0.5, maxGramDf = 100L).select($"id_a", $"id_b")
        val sp = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
          .select($"id_a", $"id_b")
        Curation.dedupClusters(docs, "doc_id", np.unionByName(sp).distinct())
          .select($"id".as("doc_id"), $"cluster", $"keep")
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $NgramPairsCtes,
             |stok AS (
             |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
             |  FROM documents),
             |sth AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM stok),
             |scnt AS (SELECT doc_id, count(*) AS n FROM sth GROUP BY doc_id),
             |sbits AS (
             |  SELECT doc_id, b, count(*) FILTER (WHERE ((h >> b) & 1) = 1) AS c
             |  FROM sth CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bs
             |  GROUP BY doc_id, b),
             |ssim AS (
             |  SELECT sbits.doc_id,
             |         sum(CASE WHEN 2 * c > n THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sim
             |  FROM sbits JOIN scnt ON sbits.doc_id = scnt.doc_id GROUP BY sbits.doc_id),
             |sbanded AS (
             |  SELECT doc_id, band, ((sim >> (band * 15)) & 32767) AS chunk, sim
             |  FROM ssim CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bd),
             |spairs AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             |         bit_count(xor(a.sim, b.sim)) AS hamming
             |  FROM sbanded a JOIN sbanded b
             |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id),
             |allpairs AS (
             |  SELECT id_a, id_b FROM pairs
             |  UNION SELECT id_a, id_b FROM spairs WHERE hamming <= 3),
             |edges AS (
             |  SELECT id_a AS s, id_b AS d FROM allpairs
             |  UNION SELECT id_b, id_a FROM allpairs),
             |reach(id, r) AS (
             |  SELECT s, s FROM edges
             |  UNION SELECT e.d, reach.r FROM edges e JOIN reach ON reach.id = e.s),
             |cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
             |SELECT doc_id, coalesce(cc.cluster, doc_id) AS cluster,
             |       doc_id = coalesce(cc.cluster, doc_id) AS keep
             |FROM documents LEFT JOIN cc ON doc_id = cc.id
             |ORDER BY doc_id""".stripMargin)),

    // Gopher/C4-style rule flags, thresholds tuned so the fixture exercises
    // both outcomes of every data-dependent rule
    "q_quality_filter" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.qualityFlags(t(s, dir, "documents"), "text",
          Curation.QualityRules(minWords = 20, maxWords = 5000,
            minMeanWordLen = 3.0, maxMeanWordLen = 10.0, maxSymbolRatio = 0.1,
            minAlphaWordRatio = 0.8, minStopwordHits = 2,
            maxDupUnigramRatio = 0.6, maxTopBigramRatio = 0.1))
          .select($"doc_id", $"rule_word_count", $"rule_stopwords",
            $"rule_dup_unigrams", $"rule_top_bigram", $"keep")
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, text,
             |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS g
             |  FROM (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i FROM toks)
             |  QUALIFY g IS NOT NULL),
             |bgtop AS (
             |  SELECT doc_id, max(c) AS top, sum(c) AS nbg FROM (
             |    SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY doc_id),
             |f AS (
             |  SELECT t.doc_id,
             |    len(tk) AS n_words,
             |    round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / greatest(len(tk), 1), 4) AS mean_len,
             |    round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
             |      / greatest(length(text), 1), 4) AS sym_ratio,
             |    round(CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
             |      / greatest(len(tk), 1), 4) AS alpha_ratio,
             |    len(list_intersect(list_distinct(tk),
             |      ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by'])) AS stop_hits,
             |    round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / greatest(len(tk), 1), 4) AS dup_uni,
             |    round(CAST(coalesce(bgtop.top, 0) AS DOUBLE) / greatest(coalesce(bgtop.nbg, 1), 1), 4) AS top_bg
             |  FROM toks t LEFT JOIN bgtop ON t.doc_id = bgtop.doc_id)
             |SELECT doc_id,
             |  n_words BETWEEN 20 AND 5000 AS rule_word_count,
             |  stop_hits >= 2 AS rule_stopwords,
             |  dup_uni <= 0.6 AS rule_dup_unigrams,
             |  top_bg <= 0.1 AS rule_top_bigram,
             |  (n_words BETWEEN 20 AND 5000) AND (mean_len BETWEEN 3.0 AND 10.0)
             |    AND sym_ratio <= 0.1 AND alpha_ratio >= 0.8 AND stop_hits >= 2
             |    AND dup_uni <= 0.6 AND top_bg <= 0.1 AS keep
             |FROM f ORDER BY doc_id""".stripMargin)),

    // URL-level dedup: two planted surface variants per logical page
    // (upper-case scheme/host + fragment + utm on one, different param
    // order + trailing tracker on the other) must canonicalize to ONE
    // url; 500 docs collapse to 100 canonical pages of 5 docs each
    "q_url_canonicalize" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = t(s, dir, "documents").select($"doc_id",
          when($"doc_id" % 2 === 0,
            concat(lit("HTTPS://Example"), $"doc_id" % 20, lit(".COM/Path"),
              $"doc_id" % 50, lit("/?utm_source=t&id="), $"doc_id" % 100,
              lit("#frag")))
            .otherwise(
              concat(lit("https://example"), $"doc_id" % 20, lit(".com/Path"),
                $"doc_id" % 50, lit("/?id="), $"doc_id" % 100,
                lit("&utm_campaign=c")))
            .as("url"))
        planted
          .groupBy(graft.pipeline.Curation.canonicalizeUrl($"url").as("canonical_url"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy($"canonical_url")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 2 = 0
             |      THEN 'HTTPS://Example' || (doc_id % 20) || '.COM/Path' ||
             |           (doc_id % 50) || '/?utm_source=t&id=' || (doc_id % 100) || '#frag'
             |      ELSE 'https://example' || (doc_id % 20) || '.com/Path' ||
             |           (doc_id % 50) || '/?id=' || (doc_id % 100) || '&utm_campaign=c'
             |    END AS url
             |  FROM documents),
             |c1 AS (SELECT doc_id, regexp_replace(url, '#[\s\S]*', '', 'g') AS u FROM planted),
             |c2 AS (SELECT doc_id,
             |         lower(regexp_extract(u, '^[^/]*//[^/]*')) ||
             |         regexp_replace(u, '^[^/]*//[^/]*', '', 'g') AS u
             |       FROM c1),
             |c3 AS (SELECT doc_id,
             |         regexp_replace(regexp_replace(regexp_replace(u,
             |           '&(utm_[a-z]+|fbclid|gclid)=[^&#]*', '', 'g'),
             |           '\?(utm_[a-z]+|fbclid|gclid)=[^&#]*&', '?', 'g'),
             |           '\?(utm_[a-z]+|fbclid|gclid)=[^&#]*\z', '', 'g') AS u
             |       FROM c2),
             |c4 AS (SELECT doc_id,
             |         regexp_replace(regexp_replace(u, '\?[?&]+', '?', 'g'),
             |                        '&&+', '&', 'g') AS u
             |       FROM c3),
             |c5 AS (SELECT doc_id,
             |         regexp_replace(regexp_replace(u, '[?&]+\z', '', 'g'),
             |                        '/\z', '', 'g') AS u
             |       FROM c4)
             |SELECT u AS canonical_url, count(*) AS n_docs
             |FROM c5 GROUP BY u ORDER BY canonical_url""".stripMargin)),

    // host-level link-graph extraction over planted anchors: hrefs
    // pulled by regex, hosts case-folded, the relative link dropped —
    // the edge list q_pagerank-style authority signals consume
    "q_link_graph" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = t(s, dir, "documents").select($"doc_id",
          concat(lit("https://Site"), $"doc_id" % 20, lit(".COM/p/"), $"doc_id")
            .as("url"),
          concat(
            lit("<a href=\"https://site"), ($"doc_id" + 1) % 20,
            lit(".com/x?utm_source=a\">l1</a>"),
            lit("<a href=\"HTTP://Site"), ($"doc_id" * 3) % 20,
            lit(".com/y#f\">l2</a>"),
            lit("<a href=\"/relative\">r</a>")).as("html"))
        Curation.linkGraph(planted, "doc_id", "url", "html")
          .orderBy($"src_host", $"dst_host")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    'https://Site' || (doc_id % 20) || '.COM/p/' || doc_id AS url,
             |    '<a href="https://site' || ((doc_id + 1) % 20) || '.com/x?utm_source=a">l1</a>' ||
             |    '<a href="HTTP://Site' || ((doc_id * 3) % 20) || '.com/y#f">l2</a>' ||
             |    '<a href="/relative">r</a>' AS html
             |  FROM documents),
             |l AS (
             |  SELECT
             |    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS src_host,
             |    unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
             |  FROM planted),
             |e AS (
             |  SELECT src_host,
             |    lower(regexp_extract(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS dst_host
             |  FROM l)
             |SELECT src_host, dst_host, count(*)::BIGINT AS n_links
             |FROM e WHERE src_host <> '' AND dst_host <> ''
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Luhn-validated card detection: one planted VALID card + one
    // checksum-failing near-miss per flagged doc, so the oracle proves the
    // checksum (not just the regex) separates them
    "q_pii_card_detect" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = t(s, dir, "documents")
          .withColumn("text", when($"doc_id" % 11 === 0,
            concat($"text",
              lit(" card 4111-1111-1111-1111 ref 4111-1111-1111-1112")))
            .otherwise($"text"))
        graft.pipeline.Curation.detectCardNumbers(planted, "text")
          .select($"doc_id", $"n_candidates", $"n_cards")
          .orderBy($"doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0
             |         THEN text || ' card 4111-1111-1111-1111 ref 4111-1111-1111-1112'
             |         ELSE text END AS text
             |  FROM documents),
             |c AS (SELECT doc_id,
             |        regexp_extract_all(text,
             |          '[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}') AS cands
             |      FROM planted)
             |SELECT doc_id, CAST(len(cands) AS INT) AS n_candidates,
             |  CAST(len(list_filter(cands, cc ->
             |    list_sum(list_transform(range(1, 17), i ->
             |      CASE WHEN (17 - i) % 2 = 0
             |           THEN CASE WHEN CAST(substr(replace(replace(cc, '-', ''), ' ', ''), i, 1) AS INT) * 2 > 9
             |                THEN CAST(substr(replace(replace(cc, '-', ''), ' ', ''), i, 1) AS INT) * 2 - 9
             |                ELSE CAST(substr(replace(replace(cc, '-', ''), ' ', ''), i, 1) AS INT) * 2 END
             |           ELSE CAST(substr(replace(replace(cc, '-', ''), ' ', ''), i, 1) AS INT) END)) % 10 = 0)) AS INT) AS n_cards
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ISO 13616 mod-97 IBAN detection: one planted VALID IBAN (the
    // published DE example) + one checksum-broken near-miss per flagged
    // doc — the incremental mod-97 fold replays via list_reduce, so the
    // oracle proves the CHECKSUM separates them, not the regex
    "q_pii_iban_detect" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = t(s, dir, "documents")
          .withColumn("text", when($"doc_id" % 13 === 0,
            concat($"text",
              lit(" iban DE89370400440532013000 ref DE89370400440532013001")))
            .otherwise($"text"))
        graft.pipeline.Curation.detectIbans(planted, "text")
          .select($"doc_id", $"n_iban_candidates", $"n_ibans")
          .orderBy($"doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 13 = 0
             |         THEN text || ' iban DE89370400440532013000 ref DE89370400440532013001'
             |         ELSE text END AS text
             |  FROM documents),
             |c AS (SELECT doc_id,
             |        regexp_extract_all(text, '[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}') AS cands
             |      FROM planted)
             |SELECT doc_id, CAST(len(cands) AS INT) AS n_iban_candidates,
             |  CAST(len(list_filter(cands, ib ->
             |    list_reduce(
             |      list_prepend(0, list_transform(
             |        string_split(substr(ib, 5) || substr(ib, 1, 4), ''),
             |        ch -> CASE WHEN ch BETWEEN '0' AND '9'
             |                   THEN 10 * 1000 + (ascii(ch) - 48)
             |                   ELSE 100 * 1000 + (ascii(ch) - 55) END)),
             |      (acc, x) -> (acc * (x // 1000) + (x % 1000)) % 97) = 1))
             |    AS INT) AS n_ibans
             |FROM c ORDER BY doc_id""".stripMargin)),

    // PII is planted deterministically on doc_id % 5 = 0 (the synthetic
    // corpus has none), then redacted; the oracle mirrors plant + redact
    // HTML → text extraction over deterministically planted markup (the
    // corpus text itself is markup-free, checked): script/style contents
    // die, tags and comments strip, entities decode, whitespace collapses.
    // The oracle replays the identical Java∩RE2 chain.
    "q_html_strip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val html = concat(
          lit("<html><head><title>"), $"source",
          lit("</title><STYLE>p {color: red}</STYLE></head><body><p>"), $"text",
          lit("</p><p>5 &lt; 7 &amp;&amp; &quot;ok&quot;&nbsp;&#39;y&#39;</p>" +
            "<script type=\"text/javascript\">track("), $"doc_id",
          lit(");</script><!-- nav --></body></html>"))
        t(s, dir, "documents")
          .select($"doc_id", Curation.stripHtml(html).as("text_clean"))
          .orderBy($"doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
             |  '<html><head><title>' || source ||
             |  '</title><STYLE>p {color: red}</STYLE></head><body><p>' || text ||
             |  '</p><p>5 &lt; 7 &amp;&amp; &quot;ok&quot;&nbsp;&#39;y&#39;</p>' ||
             |  '<script type="text/javascript">track(' || doc_id ||
             |  ');</script><!-- nav --></body></html>' AS html
             |  FROM documents)
             |SELECT doc_id, trim(regexp_replace(
             |  replace(replace(replace(replace(replace(replace(
             |    regexp_replace(regexp_replace(regexp_replace(html,
             |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
             |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
             |      '(?s)<[^>]*>', ' ', 'g'),
             |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
             |    '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
             |  '[ \t\n\f\r\x0B]+', ' ', 'g')) AS text_clean
             |FROM h ORDER BY doc_id""".stripMargin)),

    // jusText-style block classification: planted nav + footer anchor
    // blocks around the real paragraph — link density kills the chrome,
    // stopword density admits the prose; the oracle replays the block
    // split, the anchor-text sums, and the densities exactly
    "q_main_content" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val html = concat(
          lit("<div><a href=\"/\">home</a> <a href=\"/x\">products and offers</a>" +
            " <a href=\"/y\">about</a></div><p>"),
          $"text",
          lit("</p><div><a href=\"/p\">privacy</a> <a href=\"/t\">terms</a></div>"))
        Curation.mainContentBlocks(
            t(s, dir, "documents").select($"doc_id", html.as("html")),
            "doc_id", "html")
          .orderBy($"doc_id", $"block_idx")
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    '<div><a href="/">home</a> <a href="/x">products and offers</a>'
             |    || ' <a href="/y">about</a></div><p>' || text ||
             |    '</p><div><a href="/p">privacy</a> <a href="/t">terms</a></div>' AS html
             |  FROM documents),
             |b AS (
             |  SELECT doc_id,
             |    generate_subscripts(string_split_regex(html,
             |      '(?i)</?(p|div|h[1-6]|li|ul|ol|table|tr|br)[^>]*>'), 1) - 1 AS block_idx,
             |    unnest(string_split_regex(html,
             |      '(?i)</?(p|div|h[1-6]|li|ul|ol|table|tr|br)[^>]*>')) AS raw
             |  FROM h),
             |f AS (
             |  SELECT doc_id, block_idx, raw,
             |    trim(regexp_replace(regexp_replace(raw, '(?s)<[^>]*>', ' ', 'g'),
             |      '[ \t\n\f\r\x0B]+', ' ', 'g')) AS block_text,
             |    coalesce(list_sum(list_transform(
             |      regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1),
             |      t -> length(regexp_replace(t, '(?s)<[^>]*>', '', 'g')))), 0) AS lc
             |  FROM b),
             |g AS (
             |  SELECT doc_id, block_idx, block_text,
             |    CAST(length(block_text) AS INT) AS n_chars,
             |    round(least(1.0, CAST(lc AS DOUBLE)
             |      / greatest(length(block_text), 1)), 6) AS link_density,
             |    round(CAST(len(list_filter(
             |        list_filter(string_split(lower(block_text), ' '), x -> x <> ''),
             |        t -> list_contains(['the','and','of','to','in','is','that','it','for','was'], t)))
             |      AS DOUBLE)
             |      / greatest(len(list_filter(string_split(lower(block_text), ' '),
             |                 x -> x <> '')), 1), 6) AS stop_density
             |  FROM f WHERE length(block_text) > 0)
             |SELECT doc_id, CAST(block_idx AS INT) AS block_idx,
             |  n_chars, link_density, stop_density,
             |  CASE WHEN link_density > 0.3 THEN 'boilerplate'
             |       WHEN n_chars < 40 THEN 'boilerplate'
             |       WHEN stop_density >= 0.05 THEN 'good'
             |       ELSE 'short' END AS label,
             |  block_text
             |FROM g ORDER BY doc_id, block_idx""".stripMargin)),

    "q_pii_redaction" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = t(s, dir, "documents")
          .withColumn("text", when($"doc_id" % 5 === 0,
            concat($"text", format_string(
              " contact user%d@example.org ip 10.0.%d.%d tel +1 555-123-4567",
              $"doc_id", $"doc_id" % 256, $"doc_id" % 100)))
            .otherwise($"text"))
        Curation.redactPii(planted, "text")
          .select($"doc_id", $"n_redactions", $"redacted")
          .orderBy($"doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN text ||
             |      printf(' contact user%d@example.org ip 10.0.%d.%d tel +1 555-123-4567',
             |             doc_id, doc_id % 256, doc_id % 100)
             |    ELSE text END AS text
             |  FROM documents),
             |r1 AS (SELECT doc_id, text,
             |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
             |  FROM planted),
             |r2 AS (SELECT doc_id, text, t1,
             |  regexp_replace(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS t2
             |  FROM r1)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |    + len(regexp_extract_all(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}'))
             |    + len(regexp_extract_all(t2, '\+?[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ]?[0-9]{4}')) AS INT)
             |    AS n_redactions,
             |  regexp_replace(t2,
             |    '\+?[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ]?[0-9]{4}', '<PHONE>', 'g') AS redacted
             |FROM r2 ORDER BY doc_id""".stripMargin)),

    // md5-keyed deterministic sample at rate 0.3 — reproducible across
    // engines/partitionings, which is exactly what the oracle verifies
    "q_sample_deterministic" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.deterministicSample(t(s, dir, "documents"), "doc_id", rate = 0.3)
          .select($"doc_id").orderBy($"doc_id")
      },
      Some("""SELECT doc_id FROM documents
             |WHERE substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccc'
             |ORDER BY doc_id""".stripMargin)),

    // temperature mixture rebalancing (τ=0.5): dominant languages are
    // downsampled toward the flattened mix; the rarest keeps rate 1.0
    // keyed pseudonymization preserves joins: customer and order keys are
    // tokenized independently (same salt), then joined ON THE TOKENS —
    // per-token order counts must equal the raw join's, proving the same
    // id maps to the same token on both sides. DuckDB replays the salted
    // sha256 bit-for-bit.
    "q_pseudonymize_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = Curation.pseudonymize(
          t(s, dir, "customer").select($"c_custkey", $"c_mktsegment"),
          Seq("c_custkey"), salt = "release1")
        val o = Curation.pseudonymize(
          t(s, dir, "orders").select($"o_custkey", $"o_totalprice"),
          Seq("o_custkey"), salt = "release1")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .groupBy($"c_custkey".as("token"), $"c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"token")
      },
      Some("""SELECT sha256('release1' || CAST(c_custkey AS VARCHAR)) AS token,
             |  c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY 1, 2 ORDER BY token""".stripMargin)),

    // weighted per-source quota (Efraimidis–Spirakis A-Res): 10 docs per
    // source, preferring long ones — the oracle replays u^(1/w) scoring
    // and the per-key top-k in DuckDB (QUALIFY). Scores are plain doubles
    // in both engines; the frozen fixture makes any ulp-level ordering
    // divergence a one-time, loud failure rather than flakiness.
    "q_weighted_quota" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.weightedCapPerKey(t(s, dir, "documents"), "source", "doc_id",
            "n_chars", maxPerKey = 10)
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, source, n_chars FROM (
             |  SELECT doc_id, source, n_chars,
             |    row_number() OVER (PARTITION BY source ORDER BY
             |      CASE WHEN n_chars IS NOT NULL AND n_chars > 0
             |           THEN pow(CAST(('0x' || substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |                      / 4294967296.0,
             |                    1.0 / CAST(n_chars AS DOUBLE))
             |           ELSE -1.0 END DESC,
             |      doc_id ASC) AS rnk
             |  FROM documents)
             |WHERE rnk <= 10 ORDER BY doc_id""".stripMargin)),

    // token-budget mix: each source fills its TOKEN quota in md5 order
    // (src0 gets a raised budget, src1 is zeroed out, the rest get the
    // default) — the oracle replays the same window cumsum over the same
    // md5 ordering, so a tie-break or budget-lookup divergence flips a
    // `kept` bit and fails the hash
    "q_token_budget_mix" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").select($"doc_id", $"source",
          size(graft.pipeline.TextAnalysis.wsTokens($"text")).as("ws_tokens"))
        Curation.tokenBudgetMix(d, "doc_id", "source", "ws_tokens",
            budgets = Map("src0" -> 2000L, "src1" -> 0L), defaultBudget = 1000L)
          .select($"doc_id", $"source", $"ws_tokens", $"cum_tokens",
            $"budget", $"kept")
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS ws_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, source, ws_tokens,
             |    CAST(sum(CAST(ws_tokens AS BIGINT)) OVER (
             |      PARTITION BY source
             |      ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |  FROM toks)
             |SELECT doc_id, source, ws_tokens, cum_tokens,
             |  CAST(CASE source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 0
             |       ELSE 1000 END AS BIGINT) AS budget,
             |  cum_tokens <= (CASE source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 0
             |                 ELSE 1000 END) AS kept
             |FROM c ORDER BY doc_id""".stripMargin)),

    "q_mixture_resample" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.mixtureResample(t(s, dir, "documents"), "doc_id", "lang", temperature = 0.5)
          .select($"doc_id", $"lang", $"accept_rate", $"kept")
          .orderBy($"doc_id")
      },
      Some("""WITH c AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY 1),
             |w AS (SELECT lang, pow(CAST(n AS DOUBLE), 0.5 - 1.0) AS w FROM c),
             |a AS (SELECT lang, round(w / (SELECT max(w) FROM w), 12) AS accept_rate FROM w)
             |SELECT d.doc_id, d.lang, a.accept_rate,
             |  (CAST(('0x' || substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |     / 4294967296.0 < a.accept_rate) AS kept
             |FROM documents d JOIN a USING (lang) ORDER BY doc_id""".stripMargin)),

    // DSIR distribution-matching selection: importance weights of every
    // doc under target (lang='en') vs raw hashed-unigram distributions,
    // deterministic top-125 cut; the oracle replays the md5 bucketing,
    // the smoothed log-ratio model, and the rank
    "q_dsir_select" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        graft.pipeline.DataSelection.dsirSelect(
            docs, docs.filter($"lang" === "en"), "doc_id", "text",
            keepN = 125, numBuckets = 1024)
          .orderBy($"doc_id")
      },
      Some(s"""$dsirWeightCtes
           |SELECT doc_id, n_tokens, log_weight,
           |  row_number() OVER (ORDER BY log_weight DESC, doc_id ASC) <= 125 AS selected
           |FROM allw ORDER BY doc_id""".stripMargin),
      bench = true), // timed: token explode + broadcast model + ranked cut

    // per-language training-mix rates; unlisted languages get the default
    "q_sample_stratified" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
          rates = Map("en" -> 0.5, "zh" -> 0.2, "de" -> 0.25), defaultRate = 0.35)
          .groupBy($"lang").agg(count(lit(1)).as("n_kept"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, count(*) AS n_kept FROM documents
             |WHERE substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8) <
             |  CASE lang WHEN 'en' THEN '80000000' WHEN 'zh' THEN '33333333'
             |            WHEN 'de' THEN '40000000' ELSE '59999999' END
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // benchmark decontamination: the "eval set" is sliced out of docs 0-4
    // (tokens 11..40), so every benchmark doc must hit its source document
    // with ≥ 26 shared 5-grams; the oracle replays gram explosion + join
    "q_decontamination" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val toks = graft.pipeline.TextAnalysis.wsTokens(lower($"text"))
        val bench = docs.filter($"doc_id" < 5)
          .select($"doc_id".as("bench_id"),
            concat_ws(" ", slice(toks, 11, 30)).as("bench_text"))
        Curation.ngramContamination(docs, bench, "doc_id", "text",
            "bench_id", "bench_text", n = 5, minShared = 3)
          .orderBy($"doc_id", $"bench_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
             |  FROM documents),
             |bench AS (
             |  SELECT doc_id AS bench_id, array_to_string(toks[11:40], ' ') AS btext
             |  FROM tok WHERE doc_id < 5),
             |btok AS (
             |  SELECT bench_id, list_filter(string_split(lower(btext), ' '), x -> x <> '') AS toks
             |  FROM bench),
             |cg AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
             |  FROM tok WHERE len(toks) >= 5),
             |bg AS (
             |  SELECT bench_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
             |  FROM btok WHERE len(toks) >= 5)
             |SELECT doc_id, bench_id, count(*) AS shared_ngrams
             |FROM cg JOIN bg USING (g)
             |GROUP BY doc_id, bench_id HAVING count(*) >= 3
             |ORDER BY doc_id, bench_id""".stripMargin)),

    /** cross-document boilerplate line removal: footer lines planted on
      * every/half the docs must be stripped (df >= 10), per-doc unique
      * footers and the original text (df = 1) must survive in order */
    "q_boilerplate_lines" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = t(s, dir, "documents").select($"doc_id",
          concat($"text",
            when($"doc_id" % 2 === 0, lit("\nSubscribe to our newsletter!"))
              .otherwise(lit("")),
            lit("\nAll rights reserved."),
            lit("\nDocument "), $"doc_id".cast("string"), lit(" unique footer"))
            .as("text"))
        Curation.removeBoilerplateLines(planted, "doc_id", "text", minDocDf = 10)
          .orderBy($"doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id, text ||
             |    CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'Subscribe to our newsletter!' ELSE '' END ||
             |    chr(10) || 'All rights reserved.' ||
             |    chr(10) || 'Document ' || doc_id || ' unique footer' AS text
             |  FROM documents),
             |lines AS (
             |  SELECT doc_id, generate_subscripts(string_split(text, chr(10)), 1) AS pos,
             |         unnest(string_split(text, chr(10))) AS line
             |  FROM planted),
             |ldf AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line)
             |SELECT l.doc_id,
             |  coalesce(string_agg(CASE WHEN d.df < 10 THEN l.line END, chr(10) ORDER BY l.pos), '') AS clean_text,
             |  count(CASE WHEN d.df >= 10 THEN 1 END) AS removed_lines
             |FROM lines l JOIN ldf d ON l.line = d.line
             |GROUP BY l.doc_id ORDER BY doc_id""".stripMargin)),

    // the full curation pipeline composed end-to-end: near-dup pairs →
    // connected-component dedup (keep cluster minimum) → Gopher/C4 quality
    // filter → deterministic 50% sample. One declarative plan; the oracle
    // is the composition of the stage oracles (recursive-CTE closure,
    // quality CTE, md5 sampling boundary)
    "q_curation_pipeline" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2,
          threshold = 0.5, maxGramDf = 100L)
        val survivors = Curation.dedupClusters(docs, "doc_id", pairs)
          .filter($"keep").select($"id".as("doc_id"))
        val kept = docs.join(survivors, "doc_id")
        val quality = Curation.qualityFlags(kept, "text",
          Curation.QualityRules(minWords = 20, maxWords = 5000,
            minMeanWordLen = 3.0, maxMeanWordLen = 10.0, maxSymbolRatio = 0.1,
            minAlphaWordRatio = 0.8, minStopwordHits = 2,
            maxDupUnigramRatio = 0.6, maxTopBigramRatio = 0.1))
          .filter($"keep")
        Curation.deterministicSample(quality, "doc_id", 0.5)
          .select($"doc_id")
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $NgramPairsCtes,
             |edges AS (
             |  SELECT id_a AS s, id_b AS d FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT s, s FROM edges
             |  UNION SELECT e.d, reach.r FROM edges e JOIN reach ON reach.id = e.s),
             |cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
             |survivors AS (
             |  SELECT doc_id, text FROM documents LEFT JOIN cc ON doc_id = cc.id
             |  WHERE doc_id = coalesce(cc.cluster, doc_id)),
             |toks2 AS (
             |  SELECT doc_id, text,
             |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |  FROM survivors),
             |bg2 AS (
             |  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS g
             |  FROM (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i FROM toks2)
             |  QUALIFY g IS NOT NULL),
             |bgtop2 AS (
             |  SELECT doc_id, max(c) AS top, sum(c) AS nbg FROM (
             |    SELECT doc_id, g, count(*) AS c FROM bg2 GROUP BY 1, 2) GROUP BY doc_id),
             |qual AS (
             |  SELECT t.doc_id FROM toks2 t LEFT JOIN bgtop2 ON t.doc_id = bgtop2.doc_id
             |  WHERE len(tk) BETWEEN 20 AND 5000
             |    AND round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / greatest(len(tk), 1), 4) BETWEEN 3.0 AND 10.0
             |    AND round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
             |        / greatest(length(text), 1), 4) <= 0.1
             |    AND round(CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
             |        / greatest(len(tk), 1), 4) >= 0.8
             |    AND len(list_intersect(list_distinct(tk),
             |        ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by'])) >= 2
             |    AND round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / greatest(len(tk), 1), 4) <= 0.6
             |    AND round(CAST(coalesce(bgtop2.top, 0) AS DOUBLE) / greatest(coalesce(bgtop2.nbg, 1), 1), 4) <= 0.1)
             |SELECT doc_id FROM qual
             |WHERE substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
             |ORDER BY doc_id""".stripMargin)),

    // weighted sampling: keep probability proportional to document length
    // (clamped to 1) — longer docs survive preferentially; the md5-uniform
    // draw is replayed exactly in SQL
    "q_sample_weighted" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .withColumn("w", least($"n_chars" / 2000.0, lit(1.0)))
        Curation.weightedSample(docs, "doc_id", "w")
          .select($"doc_id").orderBy($"doc_id")
      },
      Some("""SELECT doc_id FROM documents
             |WHERE CAST(('0x' || substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |      / 4294967296.0 < least(n_chars / 2000.0, 1.0)
             |ORDER BY doc_id""".stripMargin)),

    // fill-in-the-middle transform (r11): half the corpus rewritten in
    // PSM order (<PRE> prefix <SUF> suffix <MID> middle) with the
    // apply draw and BOTH character cut points from the engine-portable
    // md5 uniform — the oracle replays draw, cuts, and the three-way
    // substring surgery value-exactly, so any off-by-one in a cut or a
    // swapped segment hash-mismatches
    "q_fim_transform" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.fimTransform(t(s, dir, "documents")
            .filter($"doc_id" < 400), "doc_id", "text")
          .select($"doc_id", $"fim_applied", $"text_out")
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (
             |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
             |         CAST(len(text) AS BIGINT) AS n
             |  FROM documents WHERE doc_id < 400),
             |u AS (
             |  SELECT *,
             |    substr(md5('graft' || ':fim:' || CAST(doc_id AS VARCHAR)), 1, 8)
             |      < '80000000' AND n >= 2 AS applied,
             |    CAST(('0x' || substr(md5('graft' || ':a:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |      % (n + 1) AS c1,
             |    CAST(('0x' || substr(md5('graft' || ':b:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |      % (n + 1) AS c2
             |  FROM d),
             |v AS (SELECT doc_id, text, n, applied,
             |             least(c1, c2) AS a, greatest(c1, c2) AS b FROM u)
             |SELECT doc_id, applied AS fim_applied,
             |  CASE WHEN applied THEN
             |    '<PRE>' || substr(text, 1, CAST(a AS INT)) ||
             |    '<SUF>' || substr(text, CAST(b + 1 AS INT), CAST(n - b AS INT)) ||
             |    '<MID>' || substr(text, CAST(a + 1 AS INT), CAST(b - a AS INT))
             |  ELSE text END AS text_out
             |FROM v ORDER BY doc_id""".stripMargin)),

    // T5 span corruption (r11): per-(doc, window) md5 mask draw, k-th
    // sentinel surgery into the input, sentinel+content into the
    // target, closing sentinel appended. Spark folds it in ONE
    // aggregate HOF (no explode, no shuffle); the oracle rebuilds the
    // identical strings the relational way — windows exploded, running
    // sentinel index as a window sum, string_agg ordered by window —
    // so the two formulations cross-check each other value-exactly.
    "q_span_corrupt" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.spanCorrupt(t(s, dir, "documents")
            .filter($"doc_id" < 300), "doc_id", "text")
          .select($"doc_id", $"input_text", $"target_text", $"n_masked")
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (
             |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
             |         CAST(len(text) AS BIGINT) AS n
             |  FROM documents WHERE doc_id < 300),
             |win AS (
             |  SELECT doc_id, text, n, CAST(t.w AS BIGINT) AS w,
             |    substr(md5('graft' || ':span:' || CAST(doc_id AS VARCHAR)
             |      || ':' || CAST(t.w AS VARCHAR)), 1, 8) < '26666666'
             |      AND (t.w + 1) * 40 <= n AS masked
             |  FROM d, UNNEST(generate_series(0,
             |    greatest(CAST(1 AS BIGINT), CAST(ceil(n / 40.0) AS BIGINT)) - 1)) t(w)),
             |kk AS (
             |  SELECT *, coalesce(sum(CASE WHEN masked THEN 1 ELSE 0 END) OVER (
             |    PARTITION BY doc_id ORDER BY w
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
             |  FROM win),
             |pieces AS (
             |  SELECT doc_id, w, masked, k,
             |    CASE WHEN masked THEN
             |      substr(text, CAST(w * 40 + 1 AS INT), 16) ||
             |      '<extra_id_' || CAST(k AS VARCHAR) || '>' ||
             |      substr(text, CAST(w * 40 + 25 AS INT), 16)
             |    ELSE substr(text, CAST(w * 40 + 1 AS INT), 40) END AS inp,
             |    CASE WHEN masked THEN
             |      '<extra_id_' || CAST(k AS VARCHAR) || '>' ||
             |      substr(text, CAST(w * 40 + 17 AS INT), 8)
             |    ELSE '' END AS tgt
             |  FROM kk)
             |SELECT doc_id,
             |  coalesce(string_agg(inp, '' ORDER BY w), '') AS input_text,
             |  coalesce(string_agg(tgt, '' ORDER BY w), '') ||
             |    '<extra_id_' ||
             |    CAST(CAST(coalesce(sum(CASE WHEN masked THEN 1 ELSE 0 END), 0) AS BIGINT) AS VARCHAR)
             |    || '>' AS target_text,
             |  CAST(coalesce(sum(CASE WHEN masked THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_masked
             |FROM pieces GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // deterministic 80/10/10 train/val/test split: stable under
    // partitioning and across engines (df.randomSplit is neither)
    "q_dataset_split" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.assignSplits(t(s, dir, "documents"), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select($"doc_id", $"split").orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        CAST(('0x' || substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             |        / 4294967296.0 AS u
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // reproducible global shuffle: shard + dense in-shard position by md5
    // order — the per-epoch training-order primitive (salt = epoch).
    // One hash shuffle + per-shard sort; no global sort anywhere
    "q_global_shuffle" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.deterministicShuffle(t(s, dir, "documents"), "doc_id", numShards = 8)
          .select($"doc_id", $"shard", $"pos").orderBy($"doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    ('0x' || substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
             |    md5('graft' || CAST(doc_id AS VARCHAR)) AS draw
             |  FROM documents)
             |SELECT doc_id, CAST(shard AS INT) AS shard,
             |  CAST(row_number() OVER (PARTITION BY shard
             |    ORDER BY draw, CAST(doc_id AS VARCHAR)) - 1 AS INT) AS pos
             |FROM h ORDER BY doc_id""".stripMargin)),

    // keep-BEST policy: each near-dup cluster keeps its longest member
    // (n_chars score), not its smallest id — the curation choice when
    // copies differ in completeness
    "q_dedup_keep_best" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2,
          threshold = 0.5, maxGramDf = 100L)
        Curation.applyKeepBest(docs, "doc_id", pairs, "n_chars")
          .select($"doc_id", $"n_chars")
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $NgramPairsCtes,
             |edges AS (
             |  SELECT id_a AS s, id_b AS d FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT s, s FROM edges
             |  UNION SELECT e.d, reach.r FROM edges e JOIN reach ON reach.id = e.s),
             |cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
             |clustered AS (
             |  SELECT doc_id, coalesce(cc.cluster, doc_id) AS cluster, n_chars
             |  FROM documents LEFT JOIN cc ON doc_id = cc.id),
             |ranked AS (
             |  SELECT doc_id, n_chars, row_number() OVER (
             |    PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC) AS rn
             |  FROM clustered)
             |SELECT doc_id, n_chars FROM ranked WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),

    // split by near-dup CLUSTER, not by doc: near-copies inherit their
    // cluster root's split, so train/test contamination by duplicates is
    // structurally impossible. Oracle = the cluster recursion + the split
    // hash keyed by the cluster id.
    "q_leakage_safe_split" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2,
          threshold = 0.5, maxGramDf = 100L)
        Curation.leakageSafeSplits(docs, "doc_id", pairs,
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .orderBy($"doc_id")
      },
      Some(s"""WITH RECURSIVE $NgramPairsCtes,
             |edges AS (
             |  SELECT id_a AS s, id_b AS d FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT s, s FROM edges
             |  UNION SELECT e.d, reach.r FROM edges e JOIN reach ON reach.id = e.s),
             |cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
             |clustered AS (
             |  SELECT doc_id, coalesce(cc.cluster, doc_id) AS cluster
             |  FROM documents LEFT JOIN cc ON doc_id = cc.id)
             |SELECT doc_id, cluster,
             |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id, cluster,
             |        CAST(('0x' || substr(md5('graft' || CAST(cluster AS VARCHAR)), 1, 8)) AS BIGINT)
             |        / 4294967296.0 AS u
             |      FROM clustered)
             |ORDER BY doc_id""".stripMargin)),

    // k-anonymity + l-diversity release gate: a document survives only if
    // ≥ 8 docs share its (lang, source) quasi-identifier AND those docs
    // span ≥ 2 distinct length buckets (the stand-in sensitive attribute).
    // At sf0.01 only ~18 of ~97 QI groups pass, so suppression genuinely
    // bites; the null-safe group semantics are pinned in CurationSpec.
    "q_k_anonymity" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .withColumn("len_bucket", expr("n_chars div 100"))
        Curation.kAnonymize(docs, Seq("lang", "source"), k = 8,
            sensitiveCol = Some("len_bucket"), l = 2)
          .select($"doc_id", $"lang", $"source")
          .orderBy($"doc_id")
      },
      Some("""WITH g AS (SELECT lang, source
             |          FROM documents
             |          GROUP BY 1, 2
             |          HAVING count(*) >= 8 AND count(DISTINCT n_chars // 100) >= 2)
             |SELECT d.doc_id, d.lang, d.source
             |FROM documents d SEMI JOIN g USING (lang, source)
             |ORDER BY doc_id""".stripMargin)),

    // t-closeness over the same QI as the k-anonymity gate: ordered-EMD
    // of each (lang, source) class's length-bucket distribution vs the
    // global one, exact integer cumulative arithmetic (N·C − n·G), one
    // division at the end — the attribute-DISCLOSURE gate k and l miss
    "q_t_closeness" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .withColumn("len_bucket", expr("n_chars div 200"))
        Curation.tCloseness(docs, Seq("lang", "source"), "len_bucket",
            t = 0.15)
          .orderBy($"lang", $"source")
      },
      Some("""WITH b AS (
             |  SELECT lang, source, n_chars // 200 AS v
             |  FROM documents WHERE n_chars IS NOT NULL),
             |cls AS (SELECT lang, source, count(*) AS cn FROM b GROUP BY 1, 2),
             |gv AS (SELECT v, count(*) AS gc FROM b GROUP BY 1),
             |gs AS (SELECT count(*) AS m, sum(gc) AS nn FROM gv),
             |cell AS (SELECT lang, source, v, count(*) AS cc FROM b GROUP BY 1, 2, 3),
             |grid AS (
             |  SELECT c.lang, c.source, c.cn, g.v, g.gc, coalesce(cell.cc, 0) AS cc
             |  FROM cls c CROSS JOIN gv g
             |  LEFT JOIN cell ON cell.lang = c.lang AND cell.source = c.source
             |                AND cell.v = g.v),
             |cum AS (
             |  SELECT lang, source, cn,
             |    sum(cc) OVER (PARTITION BY lang, source ORDER BY v) AS cml,
             |    sum(gc) OVER (PARTITION BY lang, source ORDER BY v) AS gml
             |  FROM grid),
             |agg AS (
             |  SELECT lang, source, cn,
             |    sum(abs(CAST(gs.nn AS HUGEINT) * cml
             |            - CAST(cn AS HUGEINT) * gml)) AS sa,
             |    max(gs.m) AS m, max(gs.nn) AS nn
             |  FROM cum CROSS JOIN gs GROUP BY 1, 2, 3),
             |fin AS (
             |  SELECT lang, source, cn AS n,
             |    round(CASE WHEN m > 1
             |          THEN CAST(sa AS DOUBLE) / (CAST(cn AS DOUBLE) * nn * (m - 1))
             |          ELSE 0 END, 6) AS emd
             |  FROM agg)
             |SELECT lang, source, n, emd, emd <= 0.15 AS pass
             |FROM fin ORDER BY lang, source""".stripMargin)),

    // ε-DP Laplace release of per-event-type count + clamped value sum:
    // md5-seeded inverse-CDF noise the oracle recomputes EXACTLY (same
    // uniform, same ln, 4dp round), fixed-point 6dp clamped sums so the
    // aggregate is order-free integer arithmetic on both engines
    "q_dp_noisy_release" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.dpNoisyRelease(Registry.events(s, dir), "event_type", "value",
            eps = 1.0, clampHi = 5.0)
          .orderBy($"event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type, count(*) AS n,
             |    sum(CAST(round(least(greatest(CAST(value AS DOUBLE), 0.0), 5.0) * 1e6)
             |        AS BIGINT)) AS s6
             |  FROM events GROUP BY 1),
             |u AS (
             |  SELECT event_type, n, s6,
             |    (('0x' || substr(md5('graft_dp:n' || event_type), 1, 8))::BIGINT + 0.5)
             |      / 4294967296.0 AS un,
             |    (('0x' || substr(md5('graft_dp:s' || event_type), 1, 8))::BIGINT + 0.5)
             |      / 4294967296.0 AS us
             |  FROM g)
             |SELECT event_type,
             |  round(n + (-1.0 / 1.0) * sign(un - 0.5) * ln(1 - 2 * abs(un - 0.5)), 4)
             |    AS noisy_count,
             |  round(CAST(s6 AS DOUBLE) / 1e6
             |        + (-5.0 / 1.0) * sign(us - 0.5) * ln(1 - 2 * abs(us - 0.5)), 4)
             |    AS noisy_sum
             |FROM u ORDER BY event_type""".stripMargin)),

    // Neyman-allocation stratified sample: 500 orders across the
    // order-priority strata, n_h ∝ N_h·S_h over totalprice (exact
    // scaled-integer moments), winners by md5 order — volatile strata
    // get more budget than proportional allocation would give
    "q_neyman_sample" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.neymanSample(t(s, dir, "orders"), "o_orderpriority",
            "o_orderkey", "o_totalprice", totalN = 500L)
          .orderBy($"o_orderkey")
      },
      Some("""WITH base AS (
             |  SELECT o_orderpriority AS h, CAST(o_orderkey AS VARCHAR) AS key,
             |    CAST(round(round(CAST(o_totalprice AS DOUBLE), 6) * 1e6) AS BIGINT) AS v6
             |  FROM orders WHERE o_totalprice IS NOT NULL),
             |st AS (
             |  SELECT h, count(*) AS n,
             |    sum(CAST(v6 AS DECIMAL(38, 0))) AS s,
             |    sum(CAST(v6 AS DECIMAL(38, 0)) * CAST(v6 AS DECIMAL(38, 0))) AS ss
             |  FROM base GROUP BY 1),
             |sd AS (
             |  SELECT h, n,
             |    CAST(round(sqrt(greatest(0.0,
             |      (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n))
             |      / 1e6 * n * 1e6) AS BIGINT) AS w6
             |  FROM st),
             |al AS (
             |  SELECT h, least(n, CASE WHEN (SELECT sum(w6) FROM sd) > 0
             |    THEN CAST(round(500.0 * w6 / (SELECT sum(w6) FROM sd), 0) AS BIGINT)
             |    ELSE 0 END) AS alloc
             |  FROM sd),
             |rk AS (
             |  SELECT b.key, b.h,
             |    CAST(row_number() OVER (PARTITION BY b.h
             |      ORDER BY md5('graft' || b.key), b.key) AS INT) AS r,
             |    al.alloc
             |  FROM base b JOIN al ON al.h = b.h)
             |SELECT key AS o_orderkey, h AS o_orderpriority, r AS sample_rank
             |FROM rk WHERE r <= alloc ORDER BY CAST(key AS BIGINT)""".stripMargin)),

    // per-source quota: at most 10 docs per source (the fixture has 25 per
    // source, so the cap genuinely bites), picked by md5 order of the doc
    // id (deterministic uniform choice the oracle replays exactly)
    "q_domain_quota" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Curation.capPerKey(t(s, dir, "documents"), "source", "doc_id", maxPerKey = 10)
          .select($"doc_id", $"source")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source,
             |         row_number() OVER (PARTITION BY source
             |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 10 ORDER BY doc_id""".stripMargin)),

    // Gopher repetition signals over a planted line structure: the flat
    // fixture text is split into two 80-char lines plus a tail that is a
    // doubled spam line on every third doc (exercising the duplicate-line
    // branch) and a unique line otherwise. The oracle replays the planting
    // and both aggregates exactly.
    // corpus-diversity growth: trigram first-touch attribution — each
    // doc's share of grams the corpus had not seen before it (keep-first
    // by doc_id, the dedup convention); the between-doc complement of
    // the within-doc repetition row below
    "q_ngram_novelty" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.TextAnalysis.ngramNovelty(
            t(s, dir, "documents"), "doc_id", "text", n = 3)
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |g AS (
             |  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
             |  FROM tok, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)),
             |f AS (SELECT g, min(doc_id) AS fd FROM g GROUP BY 1),
             |per AS (
             |  SELECT g.doc_id, count(*)::BIGINT AS n_grams,
             |    sum(CASE WHEN g.doc_id = f.fd THEN 1 ELSE 0 END)::BIGINT AS novel_grams
             |  FROM g JOIN f USING (g) GROUP BY 1)
             |SELECT d.doc_id,
             |  coalesce(per.n_grams, 0)::BIGINT AS n_grams,
             |  coalesce(per.novel_grams, 0)::BIGINT AS novel_grams,
             |  CASE WHEN coalesce(per.n_grams, 0) > 0
             |       THEN round(per.novel_grams / per.n_grams::DOUBLE + 1e-9, 6)
             |       ELSE 0.0 END AS novelty_rate
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    "q_repetition_signals" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = t(s, dir, "documents").select($"doc_id",
          concat(
            substring($"text", 1, 80), lit("\n"),
            substring($"text", 81, 80), lit("\n"),
            when($"doc_id" % 3 === 0,
              lit("Click here to buy now!\nClick here to buy now!"))
              .otherwise(concat(lit("unique tail "), $"doc_id".cast("string"))))
            .as("text"))
        graft.pipeline.TextAnalysis.repetitionSignals(planted, "doc_id", "text")
          .orderBy($"doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    substr(text, 1, 80) || chr(10) || substr(text, 81, 80) || chr(10) ||
             |    CASE WHEN doc_id % 3 = 0
             |         THEN 'Click here to buy now!' || chr(10) || 'Click here to buy now!'
             |         ELSE 'unique tail ' || doc_id END AS text
             |  FROM documents),
             |nz AS (
             |  SELECT doc_id, line FROM (
             |    SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS line
             |    FROM planted) WHERE line <> ''),
             |lc AS (SELECT doc_id, line, count(*) AS cnt FROM nz GROUP BY 1, 2),
             |lstats AS (
             |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_lines,
             |         sum((cnt - 1) * length(line)) AS dup_chars,
             |         sum(cnt - 1) AS dup_occ,
             |         sum(cnt * length(line)) AS line_chars
             |  FROM lc GROUP BY 1),
             |tok AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split(replace(lower(text), chr(10), ' '), ' '), x -> x <> '')) AS tok,
             |    generate_subscripts(list_filter(string_split(replace(lower(text), chr(10), ' '), ' '), x -> x <> ''), 1) AS i
             |  FROM planted),
             |bg AS (
             |  SELECT doc_id, g FROM (
             |    SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS g
             |    FROM tok) WHERE g IS NOT NULL),
             |gc AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY 1, 2),
             |gstats AS (
             |  SELECT doc_id, max(cnt * length(g)) AS top_chars,
             |         sum((cnt - 1) * length(g)) AS dup_gchars
             |  FROM gc GROUP BY 1)
             |SELECT b.doc_id,
             |  coalesce(n_lines, 0) AS n_lines,
             |  round(CAST(coalesce(dup_occ, 0) AS DOUBLE) / greatest(coalesce(n_lines, 0), 1), 6) AS dup_line_frac,
             |  round(CAST(coalesce(dup_chars, 0) AS DOUBLE) / greatest(coalesce(line_chars, 0), 1), 6) AS dup_line_char_frac,
             |  round(least(CAST(coalesce(top_chars, 0) AS DOUBLE) / greatest(length(b.text), 1), 1.0), 6) AS top_bigram_char_frac,
             |  round(least(CAST(coalesce(dup_gchars, 0) AS DOUBLE) / greatest(length(b.text), 1), 1.0), 6) AS dup_bigram_char_frac
             |FROM planted b
             |LEFT JOIN lstats USING (doc_id)
             |LEFT JOIN gstats USING (doc_id)
             |ORDER BY doc_id""".stripMargin)))
}
