package graft.queries

import graft.pipeline.Chunking
import org.apache.spark.sql.functions._

/** Chunking and lexical-ranking capabilities over the documents table,
  * each with an exact DuckDB oracle. */
object RankingQueries {

  import Registry.t

  val defs: Map[String, QueryDef] = Map(

    // graded retrieval scoreboard: per-term BM25 rankings (the q_bm25
    // math, one query per term, 4dp-anchored sort key) evaluated against
    // tf-graded truth (rel = min(3, tf−1), so tf=1 is a planted
    // irrelevant hit) — nDCG@10 / MRR / AP@10 per query; the oracle
    // replays both the ranking and the metric arithmetic
    "q_ranking_eval" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        val terms = Seq("spark", "join", "vector")
        val toks = docs.select($"doc_id",
          graft.pipeline.TextAnalysis.wsTokens(lower($"text")).as("toks"))
        val lens = toks.select($"doc_id", size($"toks").as("dl"))
        val stats = lens.agg(avg($"dl").as("avgdl"), count(lit(1)).as("n"))
        val tf = toks.select($"doc_id", explode($"toks").as("term"))
          .filter($"term".isin(terms: _*))
          .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        val ranking = tf.join(broadcast(dfc), "term").join(lens, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("score", round(
            log(lit(1.0) + ($"n" - $"df" + 0.5) / ($"df" + 0.5)) *
              ($"tf" * 2.2) /
              ($"tf" + (lit(0.25) + $"dl" / $"avgdl" * 0.75) * 1.2), 4))
          .withColumn("rnk", row_number().over(
            Window.partitionBy($"term").orderBy($"score".desc, $"doc_id")))
          .filter($"rnk" <= 10)
          .select($"term", $"doc_id", $"rnk")
        val truth = tf.select($"term", $"doc_id",
          least(lit(3L), $"tf" - 1).as("rel"))
        graft.pipeline.Retrieval.rankingEval(ranking, truth,
            "term", "doc_id", "rnk", "rel", k = 10)
          .orderBy($"query")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
             |  FROM documents),
             |lens AS (SELECT doc_id, len(toks) AS dl FROM tok),
             |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM lens),
             |tf AS (SELECT doc_id, term, count(*) AS tf
             |       FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
             |       WHERE term IN ('spark', 'join', 'vector') GROUP BY 1, 2),
             |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |ranked AS (
             |  SELECT term, doc_id, row_number() OVER (PARTITION BY term
             |      ORDER BY round(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2)
             |        / (tf + (0.25 + 0.75 * dl / avgdl) * 1.2), 4) DESC, doc_id) AS pos
             |  FROM tf JOIN dfc USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
             |  QUALIFY pos <= 10),
             |rel AS (SELECT term, doc_id, CAST(least(3, tf - 1) AS DOUBLE) AS rel FROM tf),
             |sc AS (
             |  SELECT r.term, r.pos, coalesce(rel.rel, 0) AS rel,
             |    (pow(2, coalesce(rel.rel, 0)) - 1) / log2(r.pos + 1) AS gain,
             |    sum(CASE WHEN coalesce(rel.rel, 0) > 0 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY r.term ORDER BY r.pos) AS relcnt
             |  FROM ranked r LEFT JOIN rel ON rel.term = r.term AND rel.doc_id = r.doc_id),
             |pq AS (
             |  SELECT term, sum(gain) AS dcg,
             |    min(CASE WHEN rel > 0 THEN pos END) AS firstpos,
             |    sum(CASE WHEN rel > 0 THEN CAST(relcnt AS DOUBLE) / pos ELSE 0 END) AS sump,
             |    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits
             |  FROM sc GROUP BY term),
             |ideal AS (
             |  SELECT term, sum((pow(2, rel) - 1) / log2(r + 1)) AS idcg FROM (
             |    SELECT term, rel, row_number() OVER (PARTITION BY term
             |        ORDER BY rel DESC, doc_id) AS r FROM rel)
             |  WHERE r <= 10 GROUP BY term),
             |nr AS (SELECT term, count(*) AS n_rel FROM rel WHERE rel > 0 GROUP BY term)
             |SELECT pq.term AS query,
             |  round(CASE WHEN coalesce(idcg, 0) > 0 THEN dcg / idcg ELSE 0 END, 6) AS ndcg,
             |  round(CASE WHEN firstpos IS NOT NULL THEN 1.0 / firstpos ELSE 0 END, 6) AS mrr,
             |  round(CASE WHEN coalesce(n_rel, 0) > 0
             |        THEN sump / least(n_rel, 10) ELSE 0 END, 6) AS ap,
             |  CAST(hits AS BIGINT) AS hits,
             |  CAST(coalesce(n_rel, 0) AS BIGINT) AS n_rel
             |FROM pq LEFT JOIN ideal ON ideal.term = pq.term
             |LEFT JOIN nr ON nr.term = pq.term
             |ORDER BY query""".stripMargin)),

    // 64-token windows, 16-token overlap
    "q_chunk_tokens" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Chunking.chunkByTokens(t(s, dir, "documents"), "doc_id", "text",
            chunkSize = 64, overlap = 16)
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
             |  FROM documents),
             |t2 AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0),
             |st AS (
             |  SELECT doc_id, toks, n,
             |    unnest(list_filter(range(0, n, 48), s -> s = 0 OR s < n - 16)) AS start,
             |    generate_subscripts(list_filter(range(0, n, 48), s -> s = 0 OR s < n - 16), 1) - 1 AS chunk_idx
             |  FROM t2)
             |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             |       CAST(least(64, n - start) AS INT) AS chunk_len,
             |       array_to_string(list_slice(toks, start + 1, least(start + 64, n)), ' ') AS chunk_text
             |FROM st ORDER BY doc_id, chunk_idx""".stripMargin)),

    "q_tfidf_top_terms" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Chunking.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", topK = 3)
          .orderBy($"doc_id", $"rnk")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
             |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
             |scored AS (
             |  SELECT doc_id, tf.term, tf,
             |         round(tf * (ln((n + 1)::DOUBLE / (df + 1)) + 1), 4) AS tfidf
             |  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN nn),
             |ranked AS (
             |  SELECT *, CAST(row_number() OVER (
             |    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INT) AS rnk
             |  FROM scored)
             |SELECT doc_id, rnk, term, tf, tfidf FROM ranked
             |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    "q_bm25" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Chunking.bm25(t(s, dir, "documents"), "doc_id", "text",
            queryTerms = Seq("spark", "join", "vector"))
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
             |  FROM documents),
             |lens AS (SELECT doc_id, len(toks) AS dl FROM tok),
             |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM lens),
             |tf AS (
             |  SELECT doc_id, term, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
             |  WHERE term IN ('spark', 'join', 'vector') GROUP BY doc_id, term),
             |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |c AS (
             |  SELECT doc_id,
             |         ln(1 + (n - df + 0.5) / (df + 0.5))
             |           * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS contrib
             |  FROM tf JOIN dfc USING (term) JOIN lens USING (doc_id) CROSS JOIN stats)
             |SELECT doc_id, round(sum(contrib), 4) AS bm25 FROM c
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // greedy sequence packing (256-token budget, 8 hash groups); the
    // oracle replays the sequential greedy scan with a recursive CTE
    // stepping through each group in doc-id order
    "q_pack_sequences" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Chunking.packSequences(t(s, dir, "documents"), "doc_id", "text",
            tokenBudget = 256L, numGroups = 8)
          .orderBy($"doc_id")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS grp,
             |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS tokens
             |  FROM documents),
             |r AS (SELECT d.*, row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
             |      FROM d),
             |s AS (
             |  SELECT grp, rn, doc_id, tokens, tokens AS acc,
             |         0::BIGINT AS pack, 0::BIGINT AS pack_pos
             |  FROM r WHERE rn = 1
             |  UNION ALL
             |  SELECT r.grp, r.rn, r.doc_id, r.tokens,
             |    CASE WHEN s.acc + r.tokens > 256 THEN r.tokens ELSE s.acc + r.tokens END,
             |    CASE WHEN s.acc + r.tokens > 256 THEN s.pack + 1 ELSE s.pack END,
             |    CASE WHEN s.acc + r.tokens > 256 THEN 0 ELSE s.pack_pos + 1 END
             |  FROM s JOIN r ON r.grp = s.grp AND r.rn = s.rn + 1)
             |SELECT doc_id, grp, pack, pack_pos, tokens FROM s
             |ORDER BY doc_id""".stripMargin)),

    // the packs materialized as training shards (docs concatenated in
    // pack order); the shard text is md5'd so the compared output stays
    // small while still pinning every byte
    "q_packed_shards" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Chunking.packedShards(t(s, dir, "documents"), "doc_id", "text",
            tokenBudget = 256L, numGroups = 8)
          .select($"grp", $"pack", $"n_docs", $"shard_tokens",
            md5($"shard_text").as("shard_md5"))
          .orderBy($"grp", $"pack")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id, text,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS grp,
             |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS tokens
             |  FROM documents),
             |r AS (SELECT d.*, row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
             |      FROM d),
             |s AS (
             |  SELECT grp, rn, doc_id, text, tokens, tokens AS acc,
             |         0::BIGINT AS pack, 0::BIGINT AS pack_pos
             |  FROM r WHERE rn = 1
             |  UNION ALL
             |  SELECT r.grp, r.rn, r.doc_id, r.text, r.tokens,
             |    CASE WHEN s.acc + r.tokens > 256 THEN r.tokens ELSE s.acc + r.tokens END,
             |    CASE WHEN s.acc + r.tokens > 256 THEN s.pack + 1 ELSE s.pack END,
             |    CASE WHEN s.acc + r.tokens > 256 THEN 0 ELSE s.pack_pos + 1 END
             |  FROM s JOIN r ON r.grp = s.grp AND r.rn = s.rn + 1)
             |SELECT grp, pack, count(*) AS n_docs,
             |       CAST(sum(tokens) AS BIGINT) AS shard_tokens,
             |       md5(string_agg(text, chr(10) || chr(10) ORDER BY pack_pos)) AS shard_md5
             |FROM s GROUP BY grp, pack
             |ORDER BY grp, pack""".stripMargin)))
}
