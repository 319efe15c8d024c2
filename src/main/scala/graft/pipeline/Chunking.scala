package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Context-window chunking and lexical ranking (TF-IDF, BM25) for
 * training-data preparation — all declarative, one shuffle per aggregate,
 * scalar corpus statistics carried via broadcast cross-joins (no driver
 * round-trip in the plan).
 */
object Chunking {

  /**
   * Split each document into overlapping token-window chunks: windows of
   * `chunkSize` tokens starting every `chunkSize − overlap` tokens. A final
   * window shorter than `overlap` tokens would be fully contained in its
   * predecessor, so starts beyond `n − overlap` are dropped (except start
   * 0, so every non-empty document yields at least one chunk).
   *
   * Pure per-row generator arithmetic — no shuffle at all; at 100 TB this
   * is a map-only pass.
   */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val n = col("__n")
    val starts = filter(sequence(lit(0), greatest(n - 1, lit(0)), lit(step)),
      s => s === 0 || s < n - overlap)
    df.select(col(idCol), TextAnalysis.wsTokens(lower(col(textCol))).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(n > 0)
      .select(col(idCol), col("__toks"), n,
        posexplode(starts).as(Seq("chunk_idx", "start")))
      .withColumn("chunk_len", least(lit(chunkSize), n - col("start")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("start") + 1, lit(chunkSize))))
      .select(col(idCol), col("chunk_idx"), col("chunk_len"), col("chunk_text"))
  }

  /**
   * Top-k terms per document by smoothed TF-IDF:
   * idf = ln((N + 1) / (df + 1)) + 1, score = tf · idf. N and df ride a
   * broadcast cross-join so the whole computation is one plan (no driver
   * scalar round-trip). Ties break lexicographically on the term.
   */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("id"),
        explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy($"id", $"term").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n"))
    // dfc is vocabulary-sized (unbounded) — shuffle join on term costs no
    // extra exchange (tf is already partitioned by term from the dfc agg);
    // only the 1-row n frame is broadcast
    val scored = tf.join(dfc, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round($"tf" * (log(($"n" + 1).cast("double") / ($"df" + 1)) + 1), 4))
    val w = Window.partitionBy($"id").orderBy($"tfidf".desc, $"term".asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= topK)
      .select($"id".as(idCol), $"rnk", $"term", $"tf", $"tfidf")
  }

  /**
   * Okapi BM25 document scores for a bag of query terms:
   * idf = ln(1 + (N − df + 0.5) / (df + 0.5)),
   * score = Σ_q idf(q) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl)).
   * Returns only documents containing at least one query term.
   */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("id"),
      TextAnalysis.wsTokens(lower(col(textCol))).as("toks"))
    val lens = toks.select($"id", size($"toks").as("dl"))
    val stats = lens.agg(avg($"dl").as("avgdl"), count(lit(1)).as("n"))
    val tf = toks.select($"id", explode($"toks").as("term"))
      .filter($"term".isin(queryTerms: _*))
      .groupBy($"id", $"term").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfc), "term")
      .join(lens, "id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + ($"n" - $"df" + 0.5) / ($"df" + 0.5)) *
          ($"tf" * (k1 + 1)) /
          ($"tf" + (lit(1 - b) + $"dl" / $"avgdl" * b) * k1))
      .groupBy($"id")
      .agg(round(sum($"contrib"), 4).as("bm25"))
      .select($"id".as(idCol), $"bm25")
  }

  /**
   * Materialized training shards on top of `packSequences`: each pack's
   * documents concatenated in pack order with `sep`. A shard's size is
   * bounded by `tokenBudget` BY CONSTRUCTION, so the per-pack
   * collect_list can never blow an executor — the one aggregate is keyed
   * by (grp, pack) and scales with shard count.
   */
  def packedShards(df: DataFrame, idCol: String, textCol: String,
      tokenBudget: Long, numGroups: Int = 8, sep: String = "\n\n"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    packSequences(df, idCol, textCol, tokenBudget, numGroups)
      .join(df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text")),
        "doc_id")
      .groupBy($"grp", $"pack")
      .agg(count(lit(1)).as("n_docs"),
        sum($"tokens").as("shard_tokens"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct($"pack_pos", $"__text"))),
          p => p.getField("__text"))).as("shard_text"))
  }

  /**
   * Inverted index over lowercased whitespace tokens: one row per term
   * with document frequency, collection frequency, and the posting list as
   * a portable `"doc:tf,doc:tf"` string sorted by doc id.
   *
   * Two term-keyed hash aggregates with map-side partials — the classic
   * scalable index build. Terms with df > `maxDf` are dropped (standard IR
   * stopword pruning): at web scale a hot term's posting list is a
   * single-row giant that no executor should materialize, so the safe cap
   * is the default and callers opt INTO unbounded lists explicitly.
   */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perDoc = df.select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
    // df/cf first, and the band filter BEFORE the posting-list aggregate:
    // a hot term must never reach collect_list, or its full posting list
    // materializes on one executor just to be dropped. The join replays
    // the (cheap, map-side-combined) per-doc pass — trading a second scan
    // for bounded executor memory, the right side of the trade at scale.
    val kept = perDoc.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
      .filter($"df" <= maxDf)
    perDoc.join(kept, "term")
      .groupBy($"term").agg(
        first($"df").as("df"),
        first($"cf").as("cf"),
        concat_ws(",", transform(array_sort(collect_list(struct($"doc_id", $"tf"))),
          p => concat_ws(":", p.getField("doc_id").cast("string"),
            p.getField("tf").cast("string")))).as("postings"))
  }

  /**
   * Greedy sequence packing for LLM training batches: documents are dealt
   * into `numGroups` hash groups (md5-derived → oracle-replayable), and
   * each group is scanned in doc-id order, accumulating documents into a
   * pack while the token budget holds; a document that would overflow
   * starts the next pack (an over-budget document gets a pack to itself).
   *
   * Plan: ONE shuffle (repartition by group) + an in-order partition scan
   * (`sortWithinPartitions` + `mapPartitions` — the secondary-sort
   * streaming pattern). Packing is deterministic because group membership
   * and in-group order are data-derived, not partition-derived; at 100 TB
   * raise `numGroups` so each sequential group stream stays short.
   *
   * Returns (doc_id, grp, pack, pack_pos, tokens): pack ids are dense
   * 0-based per group, pack_pos is the document's position in its pack.
   */
  /**
   * Sentence-aligned chunking — the RAG-prep variant of
   * [[chunkByTokens]]: the text splits into sentences at
   * `[.!?]` + whitespace boundaries, and consecutive sentences pack
   * greedily into chunks of at most `maxTokens` whitespace tokens (a
   * sentence that alone exceeds the budget gets its own chunk). A chunk
   * never splits mid-sentence, which is what retrieval embedding actually
   * wants from a chunker.
   *
   * Plan shape: one doc-keyed repartition + in-order partition scan (the
   * same secondary-sort idiom as [[packSequencesFromCounts]] — greedy
   * reset-on-overflow is sequential per doc and NOT a window function).
   * The sentence boundary is marked by a sentinel substitution rather
   * than a lookbehind split so an RE2-based SQL engine (no lookbehind)
   * can replay it; the oracle walks the same greedy recurrence as a
   * recursive CTE. Returns (doc_id, chunk, chunk_text, n_sentences,
   * n_tokens); documents with no non-blank sentence emit nothing.
   */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, boundaryPattern: String = "([.!?]) +"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val marked = regexp_replace(col(textCol), boundaryPattern, "$1\u0001")
    val sents = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(marked, "\u0001")).as(Seq("i", "sent")))
      .filter(length(trim($"sent")) > 0)
      .select($"doc_id", $"i", $"sent",
        size(TextAnalysis.wsTokens($"sent")).as("ntok"))
    val walked = sents
      .repartition($"doc_id")
      .sortWithinPartitions($"doc_id", $"i")
      .as[(Long, Int, String, Int)]
      .mapPartitions { it =>
        var curDoc = Long.MinValue
        var acc = 0L; var chunk = 0L; var pos = 0
        it.map { case (id, _, s, t) =>
          if (id != curDoc) { curDoc = id; acc = t; chunk = 0L; pos = 0 }
          else if (acc + t > maxTokens) { chunk += 1; acc = t; pos = 0 }
          else { acc += t; pos += 1 }
          (id, chunk, pos, s, t)
        }
      }
      .toDF("doc_id", "chunk", "pos", "sent", "ntok")
    // in-chunk order carried explicitly (collect_list arrival order is
    // not a contract): sort the collected (pos, sent) structs
    walked
      .groupBy($"doc_id", $"chunk")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct($"pos", $"sent"))),
          e => e.getField("sent"))).as("chunk_text"),
        count(lit(1)).cast("int").as("n_sentences"),
        sum($"ntok").cast("long").as("n_tokens"))
  }

  def packSequences(df: DataFrame, idCol: String, textCol: String,
      tokenBudget: Long, numGroups: Int = 8): DataFrame =
    packSequencesFromCounts(
      df.withColumn("__pack_tokens",
        size(TextAnalysis.wsTokens(col(textCol))).cast("long")),
      idCol, "__pack_tokens", tokenBudget, numGroups)

  /** As [[packSequences]], but over a PRECOMPUTED per-doc token count —
    * the shape a tokenized pipeline needs (the count is already known
    * from the encode stage; synthesizing text just to re-count it would
    * be O(tokens) per row for nothing). */
  def packSequencesFromCounts(df: DataFrame, idCol: String, tokensCol: String,
      tokenBudget: Long, numGroups: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // fail loudly on ids the long cast would null (null / non-numeric
    // strings) — the downstream non-nullable tuple encoder would otherwise
    // throw an opaque NullPointerException mid-scan, and a silently nulled
    // id would collapse documents into one sort position
    val docId = when(col(idCol).isNull || col(idCol).cast("long").isNull,
        raise_error(concat(lit(s"packSequences: $idCol not castable to long: "),
          coalesce(col(idCol).cast("string"), lit("null")))))
      .otherwise(col(idCol).cast("long"))
    df.select(docId.as("doc_id"),
        (Dedup.baseHash60(col(idCol).cast("string")) % numGroups).as("grp"),
        col(tokensCol).cast("long").as("tokens"))
      .repartition(col("grp"))
      .sortWithinPartitions($"grp", $"doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // a partition holds whole groups in (grp, doc_id) order; state
        // resets on every group boundary
        var curGrp = Long.MinValue
        var acc = 0L; var pack = 0L; var pos = 0L
        it.map { case (id, g, t) =>
          if (g != curGrp) { curGrp = g; acc = t; pack = 0L; pos = 0L }
          else if (acc + t > tokenBudget) { pack += 1; acc = t; pos = 0L }
          else { acc += t; pos += 1 }
          (id, g, pack, pos, t)
        }
      }
      .toDF("doc_id", "grp", "pack", "pack_pos", "tokens")
  }
}
