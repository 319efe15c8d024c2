package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data curation.
 *
 * Design for 100 TB: everything is expressed as shuffle-on-key plans —
 * exact dedup is one hash aggregate; near-dup goes shingle → MinHash
 * signature (one pass, codegen'd) → LSH band explode → bucket join, so
 * candidate generation never compares all pairs. SimHash uses the same
 * banding trick over bit chunks.
 */
object Dedup {

  /** Exact dedup on normalized content: keeps the smallest id per
    * fingerprint group. One hash aggregate, no window needed. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact duplicate *groups* (only fingerprints with >1 doc). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactDedup(df, idCol, textCol).filter(col("dup_count") > 1)

  /** Word shingles: distinct sliding n-grams over whitespace tokens; a
    * document with fewer than n tokens contributes its whole text as one
    * shingle (a null/empty text: one empty-string shingle). Codegen'd
    * Catalyst expression — see `TextAnalysis.wordNgrams`; the coalesce
    * preserves the replaced UDF's null behavior (null text → [""]). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.tfunctions.shingles(coalesce(lower(text), lit("")), n)

  /** 2^31 − 1: modulus of the universal hash family shared with the SQL
    * oracles (products stay < 2^47, safe under ANSI overflow checking). */
  val HashP: Long = 2147483647L

  /** Default gram-frequency cap for `ngramJaccard` / decontamination: the
    * DEFAULT plan must be the scale-safe one. A gram shared by d documents
    * contributes d² join rows, so an uncapped hot gram ("of the") makes the
    * gram self-join quadratic in corpus size; grams in >100k documents carry
    * no near-dup signal anyway. Pass `Long.MaxValue` explicitly to opt into
    * the exact-but-unsafe all-grams plan. */
  val DefaultMaxGramDf: Long = 100000L

  /** 60-bit base hash both Spark and DuckDB compute identically: the first
    * 15 hex chars of md5, parsed as an integer. One md5 per value; the
    * whole hash *family* then derives arithmetically (`hashFamily`), so
    * LSH results are reproducible by a SQL oracle. */
  def baseHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Deterministic (a, b) pairs for h_i(x) = (a_i·x + b_i) mod HashP. */
  def hashFamily(n: Int, seed: Long = 7L): IndexedSeq[(Long, Long)] = {
    val rng = new java.util.Random(seed)
    IndexedSeq.fill(n)((rng.nextInt(32749).toLong + 1L, rng.nextInt(Int.MaxValue).toLong))
  }

  /**
   * MinHash signature as `numHashes` independent min-hashes over the shared
   * universal family, computed in ONE fold over the shingle array (one md5
   * per shingle; the zip_with-least accumulator carries every family member
   * at once) — fully inside codegen, no UDF, no shuffle.
   *
   * NOTE: keep this column in its own Project if a generator references it
   * several times — expressions re-inlined into a generator get no
   * subexpression elimination (`minhashNearDups` does this for the bands).
   */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    aggregate(
      transform(shingleCol, s => baseHash60(s) % HashP),
      array_repeat(lit(HashP), numHashes),
      (acc, h) => zip_with(acc, typedLit(hashFamily(numHashes)),
        (a, f) => least(a, (f.getField("_1") * h + f.getField("_2")) % HashP)))

  /**
   * MinHash+LSH near-duplicate candidate pairs, verified with exact Jaccard
   * over the shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b.
   *
   * bands×rowsPerBand = numHashes; a pair collides if any band matches.
   *
   * Shuffle discipline for 100 TB: the band-exploded self-join carries ONLY
   * (id, band, bucket) — never the shingle sets — so the bands×corpus
   * duplication shuffles a few dozen bytes per row. Shingle sets re-join
   * once per side onto the *deduplicated candidate id-pairs* (a tiny
   * fraction of the corpus) for exact verification.
   */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      jaccardThreshold: Double = 0.7,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = shingleBase(df, idCol, textCol, shingleSize)
    // EAGER localCheckpoint (the winnowNearDups posture, hardened r13):
    // the self-join consumes this frame TWICE — without reuse the whole
    // signature+cap pipeline would compute once per side — but a
    // persist here would never be matched by an unpersist (the result
    // is lazy, so there is no safe release point inside this function),
    // and repeated calls in a long-lived session would pile up cache
    // entries. Checkpoint blocks are reference-tracked (ContextCleaner
    // frees them once the returned plan is unreachable). EAGER, not
    // lazy: a lazily-checkpointed frame double-consumed by a join can
    // have its first materialization raced by a broadcast-exchange
    // thread and the DAG scheduler, which deadlocks inside Spark's
    // checkpoint locking (RDD monitor vs RDDCheckpointData — observed
    // live in the r13 gate); materializing here, single-threaded,
    // before any concurrent consumer exists closes that window.
    // Trade-off: blocks are executor-local and not recomputable — an
    // executor loss between materialization and the final action fails
    // the job (rerun recovers) instead of recomputing.
    val banded = capBuckets(bandedBuckets(base, numHashes, bands), maxBucketSize)
      .ckptSer()

    val candIds = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))
      .distinct()

    verifyJaccard(candIds, base, base, "id_a", "id_b", jaccardThreshold)
  }

  /**
   * Incremental MinHash+LSH: which documents of a NEW batch near-duplicate
   * the existing REFERENCE corpus — the continual-training ingest filter.
   * Same hash family/banding as `minhashNearDups`, but candidates come
   * only from the cross-side bucket join: no ref×ref pairs (the reference
   * was already deduped) and no new×new pairs (dedup the batch separately
   * if needed).
   *
   * Returns (new_id, ref_id, jaccard) with jaccard ≥ threshold. One-shot
   * convenience over `buildMinhashIndex` + `screenAgainstIndex` — callers
   * screening MANY batches (or a stream) build the index once instead.
   */
  def minhashNearDupsAgainst(newDf: DataFrame, refDf: DataFrame,
      idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      jaccardThreshold: Double = 0.7,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    screenAgainstIndex(
      buildMinhashIndex(refDf, idCol, textCol, shingleSize, numHashes, bands,
        maxBucketSize),
      newDf, idCol, textCol, jaccardThreshold, maxBucketSize)

  /**
   * Apply `duplicateSpans`: rebuild each document's text with every marked
   * token range removed — the aggressive boilerplate posture (a window
   * repeated across ≥ minDocFreq documents is template text; C4 cuts such
   * lines, this cuts exact token spans). Returns (doc_id, clean_text,
   * removed_tokens); documents with no spans pass through with their
   * whitespace-normalized token join (token-level surgery can't preserve
   * the original whitespace).
   *
   * Plan shape: tokens posexplode once, spans join back doc-keyed with a
   * range predicate (each doc has FEW spans, so the per-doc fan-out is
   * bounded), survivors re-join ordered by position — every shuffle keyed
   * by doc id. Matching is case-insensitive (spans come from lowercased
   * grams) but the rebuild keeps the ORIGINAL casing: lowercasing never
   * moves a space, so positions index both token sequences identically.
   * Precondition: one row per id (like `duplicateSpans`, duplicate ids
   * are treated as one document; their rebuilt text interleaves).
   */
  def cutSpans(df: DataFrame, idCol: String, textCol: String,
      windowSize: Int = 8, minDocFreq: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val spans = duplicateSpans(df, idCol, textCol, windowSize, minDocFreq)
      .select($"doc_id".as("id"), $"span_start", $"span_end")
    val toks = df.select(col(idCol).cast("long").as("id"),
      posexplode(TextAnalysis.wsTokens(col(textCol))).as(Seq("pos", "tok")))
    val marked = toks.join(spans,
      Seq("id"), "left")
      .withColumn("__in_span",
        $"span_start".isNotNull &&
          $"pos" >= $"span_start" && $"pos" <= $"span_end")
      // a token joins once per span of its doc: it is removed if ANY span
      // covers it (max over tok, not first — deterministic even when the
      // unique-id precondition is violated)
      .groupBy($"id", $"pos")
      .agg(max($"tok").as("tok"), max($"__in_span").as("cut"))
    val perDoc = marked.groupBy($"id")
      .agg(
        // collect_list skips nulls, so cut tokens vanish from the rebuild
        // (same trick as Curation's boilerplate-line removal)
        array_join(transform(array_sort(collect_list(
          when(!$"cut", struct($"pos", $"tok")))), x => x.getField("tok")), " ")
          .as("clean_text"),
        sum(when($"cut", 1L).otherwise(0L)).as("removed_tokens"))
    // anchor on the input ids (distinct: one output row per document even
    // if the precondition is violated): token-less documents keep a row
    // (empty text, zero removed) instead of silently vanishing
    df.select(col(idCol).cast("long").as("doc_id")).distinct()
      .join(perDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"clean_text", lit("")).as("clean_text"),
        coalesce($"removed_tokens", lit(0L)).as("removed_tokens"))
  }

  /** Precomputed LSH reference index: the (capped) banded buckets plus the
    * shingle sets of an already-deduped corpus. At 100 TB this is the
    * durable artifact of the ingest pipeline — built once (one pass over
    * the reference), persisted (`saveMinhashIndex`), and every future
    * batch or stream shuffles only ITS OWN rows against it. */
  case class MinhashRefIndex(banded: DataFrame, base: DataFrame,
      shingleSize: Int, numHashes: Int, bands: Int)

  /** One pass over the reference corpus → reusable screen index. */
  def buildMinhashIndex(refDf: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucketSize: Int = DefaultMaxBucketSize): MinhashRefIndex = {
    val base = shingleBase(refDf, idCol, textCol, shingleSize)
    MinhashRefIndex(capBuckets(bandedBuckets(base, numHashes, bands), maxBucketSize),
      base, shingleSize, numHashes, bands)
  }

  /** Persist an index: banded buckets partitioned BY band (a probe joins
    * on (band, bucket), so band-partition pruning applies), shingle sets
    * as plain parquet, parameters as a 1-row parquet. */
  def saveMinhashIndex(index: MinhashRefIndex, path: String): Unit = {
    val spark = index.banded.sparkSession
    import spark.implicits._
    index.banded.write.mode("overwrite").partitionBy("band").parquet(s"$path/banded")
    index.base.write.mode("overwrite").parquet(s"$path/base")
    Seq((index.shingleSize, index.numHashes, index.bands))
      .toDF("shingleSize", "numHashes", "bands")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  /** Reload a persisted index for screening (build once, screen many). */
  def loadMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): MinhashRefIndex = {
    import spark.implicits._
    val p = spark.read.parquet(s"$path/params")
      .select($"shingleSize", $"numHashes", $"bands")
      .as[(Int, Int, Int)].head()
    // restore the pre-partitionBy column order (partition cols move last)
    val banded = spark.read.parquet(s"$path/banded")
      .select($"id", $"band", $"bucket")
    MinhashRefIndex(banded, spark.read.parquet(s"$path/base"), p._1, p._2, p._3)
  }

  /** Screen a new batch against a prebuilt reference index: cross-side
    * bucket join only (ids-only shuffle), exact-Jaccard verification on
    * the candidate pairs. The new side is banded with the index's own
    * parameters — the hash family is deterministic, so a reloaded index
    * screens identically to a freshly built one.
    *
    * `persistNewSide = false` recomputes the new batch's shingles for the
    * verification join instead of caching them: per-invocation plans are
    * distinct, so a long-running caller (a streaming foreachBatch loop)
    * would otherwise accumulate one cache entry per batch forever. */
  def screenAgainstIndex(index: MinhashRefIndex, newDf: DataFrame,
      idCol: String, textCol: String, jaccardThreshold: Double = 0.7,
      maxBucketSize: Int = DefaultMaxBucketSize,
      persistNewSide: Boolean = true): DataFrame = {
    val spark = newDf.sparkSession
    import spark.implicits._
    val baseNew =
      if (persistNewSide) shingleBase(newDf, idCol, textCol, index.shingleSize)
      else shingleProjection(newDf, idCol, textCol, index.shingleSize)
    val candIds = capBuckets(
        bandedBuckets(baseNew, index.numHashes, index.bands), maxBucketSize).as("a")
      .join(index.banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket")
      .select($"a.id".as("new_id"), $"b.id".as("ref_id"))
      .distinct()
    verifyJaccard(candIds, baseNew, index.base, "new_id", "ref_id", jaccardThreshold)
  }

  /** Per-(band, bucket) population cap for the LSH join — the standard
    * skew posture. Boilerplate (one shingle or signature shared by a huge
    * doc fraction) produces a single giant bucket whose self-join is
    * O(n²); real near-dups still collide in their OTHER, small buckets,
    * and exact-duplicate floods are `exactDupGroups`' job, so dropping an
    * over-cap bucket bounds the candidate explosion at a marginal recall
    * cost. Default 10k: a 10k-doc bucket already yields ~50M candidate
    * pairs — past any useful near-dup signal.
    *
    * SEMANTIC NOTE: the cap is a deliberate recall trade, on by default
    * because unbounded buckets are the known LSH production failure. A
    * near-identical cluster LARGER than the cap (e.g. 15k template pages
    * that are not byte-identical) is dropped wholesale — run
    * [[hotBuckets]] alongside to see exactly what was skipped, and pass
    * `maxBucketSize = Int.MaxValue` for the exact uncapped semantics. */
  val DefaultMaxBucketSize: Int = 10000

  /** Keep only buckets with ≤ `maxBucketSize` members. The population
    * comes from an unordered count window over (band, bucket): ONE
    * shuffle, already on the self-join's key, so the cap adds no
    * exchange to the candidate join (an aggregate+join-back shape costs
    * two). A flooded bucket's rows spill in the window buffer — bounded
    * by the bucket itself, which is exactly what's being measured. */
  private def capBuckets(banded: DataFrame, maxBucketSize: Int): DataFrame = {
    import banded.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"band", $"bucket")
    banded.withColumn("__bn", count(lit(1)).over(w))
      .filter($"__bn" <= maxBucketSize)
      .drop("__bn")
  }

  /** The buckets the cap WOULD drop, with populations — the "log" half of
    * drop-and-log: run it next to a capped dedup to quantify what was
    * skipped (each row is usually a boilerplate cluster worth routing to
    * exact dedup instead). */
  def hotBuckets(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    import df.sparkSession.implicits._
    val base = shingleBase(df, idCol, textCol, shingleSize)
    bandedBuckets(base, numHashes, bands)
      .groupBy($"band", $"bucket")
      .agg(count(lit(1)).as("n"))
      .filter($"n" > maxBucketSize)
  }

  /** Reused (id, shingles) projection: feeds the signature aggregation AND
    * the verification join — without reuse the tokenize+shingle
    * projection would run three times. Eager localCheckpoint, not
    * persist: blocks are reference-tracked and freed once the caller's
    * plan is unreachable, where a persist here could never be matched
    * by an unpersist (see the posture note in [[winnowNearDups]]). */
  private def shingleBase(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame =
    shingleProjection(df, idCol, textCol, shingleSize)
      .ckptSer() // eager: see minhashNearDups posture note (deadlock window)

  /** The uncached (id, shingles) projection behind `shingleBase`. */
  private def shingleProjection(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)

  /** (id, band, bucket) rows for the LSH bucket join.
    *
    * Signature via explode + min-aggregate: ONE md5 base hash per shingle,
    * the `numHashes`-way family derived by multiply-mod; partial min on the
    * map side makes the shuffle one `numHashes`-long row per doc. (Measured
    * faster than a map-side zip_with-least fold over the shingle array —
    * the fold allocates a wide array per element, the min-aggregate stays
    * in tight codegen; and an inline signature column would be re-inlined
    * once per band by the generator.) Band bucket = left fold
    * (acc·31 + h_i) mod P over the band's rows — the same arithmetic the
    * SQL oracles replay. */
  private def bandedBuckets(base: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val fam = hashFamily(numHashes)
    val minCols = fam.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * $"hb" + lit(b)) % HashP).as(s"h$i") }
    val sig = base.select($"id", explode($"sh").as("s"))
      .select($"id", (baseHash60($"s") % HashP).as("hb"))
      .groupBy($"id")
      .agg(minCols.head, minCols.tail: _*)
    val bucketCol = (b: Int) =>
      (b * r + 1 until (b + 1) * r).foldLeft(col(s"h${b * r}")) {
        (acc, i) => (acc * 31 + col(s"h$i")) % HashP }
    sig.select($"id", posexplode(array((0 until bands).map(bucketCol): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** Exact-Jaccard verification of candidate id pairs: shingle sets join
    * back onto the (deduplicated, tiny) pair list, never onto the banded
    * explosion. */
  private def verifyJaccard(candIds: DataFrame, baseA: DataFrame,
      baseB: DataFrame, aCol: String, bCol: String,
      jaccardThreshold: Double): DataFrame = {
    val spark = candIds.sparkSession
    import spark.implicits._
    candIds
      .join(baseA.select(col("id").as(aCol), $"sh".as("sh_a")), aCol)
      .join(baseB.select(col("id").as(bCol), $"sh".as("sh_b")), bCol)
      .withColumn("jaccard",
        round(size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")), 4))
      .filter($"jaccard" >= jaccardThreshold)
      .select(col(aCol), col(bCol), $"jaccard")
  }

  /**
   * Exact n-gram Jaccard over all pairs, computed scalably: join documents
   * on shared grams to count intersections (|A∩B|), derive the union from
   * per-doc set sizes — never materializes the full pair matrix, only pairs
   * that share at least one gram. Documents with fewer than n tokens have
   * no grams and drop out (strict semantics, unlike `shingles`' fallback).
   */
  /** Shared scaffold for the exact n-gram pair measures: df-capped
    * per-doc distinct grams, per-doc set sizes, and pairwise
    * intersection counts over the gram-keyed join. `ordered = false`
    * emits each unordered pair once (id_a < id_b, for symmetric
    * measures); `ordered = true` emits both directions (for asymmetric
    * ones). The gram-frequency cap matters at scale: hot grams
    * ("of the") hit ~every document, turning the gram self-join
    * quadratic on that key; dropping grams with df > maxGramDf from
    * BOTH the intersection and the set sizes keeps the math exact over
    * the remaining discriminative grams. */
  private def gramPairCounts(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxGramDf: Long, ordered: Boolean): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val allGrams = df
      .select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.wordNgrams(col(textCol), n)).as("g"))
    val grams =
      if (maxGramDf == Long.MaxValue) allGrams
      else allGrams.join(
        allGrams.groupBy($"g").agg(count(lit(1)).as("gdf"))
          .filter($"gdf" <= maxGramDf).select($"g"), "g")
    val sizes = grams.groupBy($"id").agg(count(lit(1)).as("n"))
    val pairCond =
      if (ordered) $"a.id" =!= $"b.id" else $"a.id" < $"b.id"
    val inter = grams.as("a").join(grams.as("b"), $"a.g" === $"b.g" && pairCond)
      .groupBy($"a.id".as("id_a"), $"b.id".as("id_b"))
      .agg(count(lit(1)).as("c"))
    (sizes, inter)
  }

  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, n: Int = 2,
      threshold: Double = 0.5, maxGramDf: Long = Dedup.DefaultMaxGramDf): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (sizes, inter) = gramPairCounts(df, idCol, textCol, n, maxGramDf,
      ordered = false)
    inter
      .join(sizes.select($"id".as("id_a"), $"n".as("na")), "id_a")
      .join(sizes.select($"id".as("id_b"), $"n".as("nb")), "id_b")
      .select($"id_a", $"id_b",
        round($"c".cast("double") / ($"na" + $"nb" - $"c"), 4).as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /**
   * N-gram CONTAINMENT — the asymmetric twin of [[ngramJaccard]]:
   * containment(A in B) = |grams(A) ∩ grams(B)| / |grams(A)|. Jaccard
   * misses the quote-inside-a-larger-document case (a short doc fully
   * embedded in a long one has small union-relative overlap but
   * containment ≈ 1), which is exactly the duplication a pretraining
   * corpus accumulates as articles get quoted and aggregated. Emits
   * ORDERED pairs — (a, b) means a's grams are covered by b — so both
   * directions can appear with different scores. Same scale posture as
   * the Jaccard: gram-keyed join with a gram-df cap, never a pair
   * matrix.
   */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, threshold: Double = 0.8,
      maxGramDf: Long = Dedup.DefaultMaxGramDf): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (sizes, inter) = gramPairCounts(df, idCol, textCol, n, maxGramDf,
      ordered = true)
    inter
      .join(sizes.select($"id".as("id_a"), $"n".as("na")), "id_a")
      .select($"id_a", $"id_b",
        round($"c".cast("double") / $"na", 4).as("containment"))
      .filter($"containment" >= threshold)
  }

  /** 60-bit SimHash over whitespace tokens: per bit, sign of Σ±1 across
    * token hashes (bit b = 1 iff (#tokens with bit b set) * 2 > #tokens).
    * 60 bits because `baseHash60` (md5-derived, SQL-reproducible) supplies
    * exactly 60 uniform bits. Computed in ONE `aggregate` pass accumulating
    * all 60 bit-counts per row, instead of 60 separate filter scans over
    * the token-hash array. */
  val SimhashBits = 60

  def simhash(text: Column): Column =
    simhashOfTokens(TextAnalysis.wsTokens(lower(text)))

  /** JVM twin of `baseHash60`: first 15 md5-hex chars as a long. Spark's
    * md5() hashes the UTF-8 bytes — identical here, and the q_dedup_simhash
    * oracle (DuckDB md5 replay) pins the equivalence end-to-end. */
  private[graft] def baseHash60Jvm(s: String): Long =
    graft.functions.TextKernels.hash60(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Same over a pre-tokenized column — lets callers that also need the
    * token count tokenize once in their own Project. Codegen'd Catalyst
    * expression (graft.functions.SimHash60) accumulating all 60 bit-counts
    * in one pass over the token array's UTF8String bytes: the
    * aggregate/zip_with formulation evaluated 60 interpreted lambdas per
    * token, and the ScalaUDF it replaced converted every token to String
    * per row. */
  def simhashOfTokens(toks: Column): Column =
    graft.functions.tfunctions.simhash60(toks)

  /** SimHash near-dup pairs: LSH over 4×15-bit chunks, verified by Hamming
    * distance ≤ maxHamming. Token-less documents carry no signal and are
    * dropped (they would otherwise all collide at signature 0). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // tokenize ONCE in its own Project (the simhash and the token-count
    // guard both read the attribute; inlining would tokenize twice)
    val hashed = df
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.wsTokens(lower(col(textCol))).as("toks"))
      .select($"id", simhashOfTokens($"toks").as("sim"), size($"toks").as("ntok"))
      .filter($"ntok" > 0)
    val banded = hashed.select($"id", $"sim",
        posexplode(array((0 until 4).map(b =>
          shiftright($"sim", b * 15).bitwiseAND(lit(0x7FFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val hamming = (a: Column, b: Column) => bit_count(a.bitwiseXOR(b))
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.chunk" === $"b.chunk" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        hamming($"a.sim", $"b.sim").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter($"hamming" <= maxHamming)
  }

  /** Embedding near-dup: random-hyperplane LSH buckets + exact cosine
    * verification ≥ threshold. Hyperplanes are seeded and broadcast as
    * literals so the plan is deterministic. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int = 12, cosineThreshold: Double = 0.95,
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rng = new java.util.Random(seed)
    val planes: Seq[Seq[Double]] = Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))

    val vecs = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val sigExpr = concat_ws("", planes.map { p =>
      when(Similarity.dot($"v", typedLit(p)) > 0, lit("1")).otherwise(lit("0"))
    }: _*)
    val sig = vecs.withColumn("bucket", sigExpr)

    sig.as("a").join(sig.as("b"), $"a.bucket" === $"b.bucket" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        round(Similarity.cosine($"a.v", $"b.v"), 6).as("cosine"))
      .filter($"cosine" >= cosineThreshold)
  }

  /** Keep-one policy materialization: given the full frame and near-dup
    * pairs, drop every id that appears as the larger member of a pair. */
  def applyKeepSmallest(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /**
   * Semantic (embedding-space) dedup, SemDeDup-style (Abbas et al. 2023):
   * cluster embeddings with the IVF coarse quantizer
   * (`Similarity.buildIvfIndex` — deterministic seeded k-means), then
   * compare pairs only WITHIN a cluster. Semantic near-duplicates land in
   * the same cluster by construction, so the comparison count shrinks from
   * O(n²) to Σ|cluster|², tuned by `nClusters` (the paper runs ~100k
   * clusters at web scale); after the one cid-keyed shuffle the per-cluster
   * work is embarrassingly parallel. Complements `embeddingNearDups`
   * (hyperplane LSH): k-means clusters track the data's actual density
   * where random hyperplanes cut blindly.
   *
   * `maxClusterSize` is the same drop-and-log skew guard as the LSH bucket
   * cap — a degenerate cluster (collapsed embedding model, all-zero rows)
   * would otherwise go quadratic on one key; [[hotClusters]] is the log
   * half, listing exactly what the cap skipped.
   *
   * Returns (id_a, id_b, cid, cosine) with id_a < id_b and cosine ≥
   * threshold; feed to `applyKeepSmallest` for the keep-one policy.
   */
  /** The clusters `semanticDedup`'s cap WOULD drop, with populations —
    * the "log" half of drop-and-log (mirror of [[hotBuckets]] for the
    * LSH cap): run next to a capped dedup to quantify what was skipped;
    * an over-cap cluster usually means a collapsed embedding region
    * worth routing to exact dedup or re-clustering with more centroids. */
  def hotClusters(df: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, kmeansIterations: Int = 3,
      maxClusterSize: Int = DefaultMaxBucketSize): DataFrame = {
    import df.sparkSession.implicits._
    Similarity.buildIvfIndex(df, idCol, vecCol, nClusters, kmeansIterations)
      .assigned
      .groupBy($"cid").agg(count(lit(1)).as("n"))
      .filter($"n" > maxClusterSize)
  }

  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, kmeansIterations: Int = 3,
      cosineThreshold: Double = 0.95,
      maxClusterSize: Int = DefaultMaxBucketSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val assigned = Similarity.buildIvfIndex(df, idCol, vecCol, nClusters,
      kmeansIterations).assigned
    // count window on the join key: one shuffle, reused by the self-join
    // (the capBuckets pattern); eager localCheckpoint because the
    // self-join consumes the capped frame twice and an in-function
    // persist could never be released (minhashNearDups posture)
    val w = Window.partitionBy($"cid")
    val capped = assigned.withColumn("__cn", count(lit(1)).over(w))
      .filter($"__cn" <= maxClusterSize).drop("__cn")
      .ckptSer() // eager: see minhashNearDups posture note (deadlock window)
    capped.as("a").join(capped.as("b"),
        $"a.cid" === $"b.cid" && $"a.corpus_id" < $"b.corpus_id")
      .select($"a.corpus_id".as("id_a"), $"b.corpus_id".as("id_b"),
        $"a.cid".as("cid"),
        round(Similarity.cosine($"a.cv", $"b.cv"), 6).as("cosine"))
      .filter($"cosine" >= cosineThreshold)
  }

  /**
   * Exact substring-level duplicate spans — the span-granular complement of
   * the document-level near-dup operators, after Lee et al. 2021
   * ("Deduplicating Training Data Makes Language Models Better"): any
   * `windowSize`-token window occurring in ≥ `minDocFreq` distinct documents
   * marks duplicated text; overlapping/adjacent marked windows merge into
   * maximal per-document spans, the unit a curation pipeline cuts (or
   * down-weights) instead of dropping whole documents.
   *
   * Spark-first shape (the paper builds a single-node suffix array — a
   * non-starter at 100 TB): windows explode to (doc, pos, gramHash) with the
   * gram hashed to 60 md5-derived bits (`baseHash60`) so the gram-keyed
   * exchange ships 8 bytes, not ~50-byte strings; a hash aggregate keeps
   * hashes whose distinct-doc count reaches `minDocFreq`; marked positions
   * come back via a semi join on the hash, and per-doc gaps-and-islands
   * (break when the gap between marked positions exceeds `windowSize`)
   * merges windows into maximal spans. Every shuffle is keyed by gram hash
   * or doc id — no pair matrix, no global state, and the windowed island
   * scan is per-document. Within-document repeats are deliberately out of
   * scope (one doc = one vote): `TextAnalysis.repetitionSignals` covers
   * intra-doc repetition.
   *
   * Returns (doc_id, span_start, span_end, span_tokens, n_windows): 0-based
   * inclusive token offsets into the whitespace token sequence of
   * lowercase(text); n_windows = number of duplicated windows merged into
   * the span.
   */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      windowSize: Int = 8, minDocFreq: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // consumed twice (df aggregate + mark join) — eager localCheckpoint
    // like shingleBase: reference-tracked blocks instead of a cache
    // entry no unpersist could ever release (minhashNearDups posture)
    val grams = df
      .select(col(idCol).cast("long").as("id"),
        posexplode(graft.functions.tfunctions.word_ngrams_all(
          lower(col(textCol)), windowSize)).as(Seq("pos", "g")))
      .select($"id", $"pos", baseHash60($"g").as("gh"))
      .ckptSer() // eager: see minhashNearDups posture note (deadlock window)
    val dupGrams = grams.groupBy($"gh")
      .agg(count_distinct($"id").as("gdf"))
      .filter($"gdf" >= minDocFreq)
      .select($"gh")
    val w = Window.partitionBy($"id").orderBy($"pos")
    grams.join(dupGrams, Seq("gh"), "left_semi")
      .select($"id", $"pos")
      .withColumn("brk",
        when($"pos" - lag($"pos", 1).over(w) > windowSize, 1).otherwise(0))
      .withColumn("grp", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"id", $"grp")
      .agg(min($"pos").as("span_start"),
        (max($"pos") + windowSize - 1).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select($"id".as("doc_id"), $"span_start", $"span_end",
        ($"span_end" - $"span_start" + 1).as("span_tokens"), $"n_windows")
  }

  /**
   * Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
   * the MOSS code-clone algorithm): hash every k-gram of the whitespace
   * token stream, slide a w-gram window over the hash sequence, keep
   * each window's MINIMUM hash with ties broken RIGHTMOST (the MOSS
   * rule), and dedupe repeated selections. The paper's guarantee: any
   * substring match of at least k+w−1 tokens contributes at least one
   * shared fingerprint, at ~2/(w+1) sample density — position-local
   * fingerprinting, where MinHash is whole-document.
   *
   * A document with fewer than w grams winnows as one window over all
   * its grams. Returns (doc_id, pos, gh): 0-based gram offset and the
   * shared 60-bit md5 base hash ([[baseHash60]], replayable in SQL).
   *
   * Scale: each gram joins at most w window starts (a bounded explode,
   * no doc×doc anything), the per-window argmin is a (doc, window)-keyed
   * struct-min hash aggregate, and no window function or global sort
   * appears anywhere.
   */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val grams = df
      .select(col(idCol).cast("long").as("id"),
        posexplode(graft.functions.tfunctions.word_ngrams_all(
          lower(col(textCol)), k)).as(Seq("pos", "g")))
      .select($"id", $"pos".cast("long").as("pos"), baseHash60($"g").as("gh"))
    val ng = grams.groupBy($"id").agg(count(lit(1)).as("ng"))
    grams.join(ng, "id")
      // window starts covering this gram: every window is w grams except
      // the degenerate short-doc case (ng < w), which winnows as one
      // window [0, ng-1]; lower <= upper always, so sequence() is safe
      .withColumn("s", explode(sequence(
        greatest(lit(0L), $"pos" - (w - 1)),
        least($"pos", greatest(lit(0L), $"ng" - w)))))
      .groupBy($"id", $"s")
      .agg(min(struct($"gh", (-$"pos").as("np"))).as("m"))
      .select($"id", $"m.gh".as("gh"), (-$"m.np").as("pos"))
      .distinct()
      .select($"id".as("doc_id"), $"pos", $"gh")
  }

  /**
   * Near-duplicate pairs by shared winnowing fingerprints — the MOSS
   * scoring step: join documents on fingerprint hash, count DISTINCT
   * shared hashes per pair, and score containment-style as
   * shared / min(|fp_a|, |fp_b|) (a small plagiarized-from document
   * scores high against its source). Pairs below `minShared` drop.
   *
   * Scale: the pair generator is a bucketed equi-join on the fingerprint
   * hash — never doc×doc — and `maxHashDf` drops boilerplate hashes
   * shared by more than that many documents (d docs → d² pair rows; a
   * hash in 100k docs carries no clone signal), the same drop-and-log
   * posture as [[DefaultMaxGramDf]].
   */
  def winnowNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, minShared: Long = 2L,
      maxHashDf: Long = DefaultMaxGramDf): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // EAGER localCheckpoint, not persist: the fingerprint set feeds
    // three consumers (sizes, the hash-df cap, both sides of the pair
    // join), but a persist here would never be matched by an unpersist
    // — the result is lazy, so there is no safe point inside this
    // function to release it, and repeated calls in a long-lived
    // session would pile up cache entries. Checkpoint blocks are
    // reference-tracked (the ContextCleaner frees them once the
    // returned plan is unreachable) and eager=false keeps construction
    // side-effect-free. Trade-off, stated honestly: local checkpoint
    // blocks are executor-local and NOT recomputable — an executor
    // loss between materialization and the final action fails the job
    // instead of recomputing (rerun recovers). Acceptable for a
    // fingerprint table; callers needing lineage-recoverable reuse can
    // persist the winnowFingerprints output themselves and own the
    // unpersist.
    val fpd = winnowFingerprints(df, idCol, textCol, k, w)
      .select($"doc_id", $"gh").distinct()
      .ckptSer() // eager: see minhashNearDups posture note (deadlock window)
    val nf = fpd.groupBy($"doc_id").agg(count(lit(1)).as("nf"))
    val kept = fpd.groupBy($"gh")
      .agg(count(lit(1)).as("hdf"))
      .filter($"hdf" <= maxHashDf)
      .select($"gh")
    val pairs = fpd.join(kept, Seq("gh"), "left_semi").as("a")
      .join(fpd.as("b"),
        $"a.gh" === $"b.gh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= minShared)
    pairs
      .join(nf.select($"doc_id".as("doc_a"), $"nf".as("nfa")), "doc_a")
      .join(nf.select($"doc_id".as("doc_b"), $"nf".as("nfb")), "doc_b")
      .select($"doc_a", $"doc_b", $"shared",
        round($"shared" / least($"nfa", $"nfb"), 6).as("overlap"))
  }

  /**
   * Source-overlap matrix — the corpus-health report "which sources
   * duplicate each other": per source pair, the Jaccard of their
   * DISTINCT content-fingerprint sets ([[TextAnalysis.fingerprint]],
   * whitespace-normalized md5). High overlap means two feeds crawl the
   * same content and one should be dropped before token budgeting.
   * Returns (source_a < source_b, n_a, n_b, shared, jaccard 6dp).
   *
   * Scale: fingerprint sets reduce per source (one hash aggregate), the
   * pair counts come from a fingerprint-keyed self-join (bucketed,
   * source-pair-bounded output) — never doc×doc. The per-fingerprint
   * fan-out is source-count-bounded by construction, but
   * `maxSourcesPerFp` ENFORCES it: a fingerprint present in more than
   * that many sources (universal boilerplate — a cookie banner, an
   * empty page) is dropped from the fingerprint universe BEFORE the
   * set sizes, so shared counts and Jaccard denominators stay
   * consistent. The count is a window over the self-join's own key
   * (the capBuckets shape — no extra exchange).
   */
  def sourceOverlap(df: DataFrame, sourceCol: String,
      textCol: String, maxSourcesPerFp: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fp = Caps.capByCount(
      df.select(col(sourceCol).cast("string").as("src"),
        TextAnalysis.fingerprint(col(textCol)).as("fp")).distinct(),
      Seq("fp"), maxSourcesPerFp)
    val sizes = fp.groupBy($"src").agg(count(lit(1)).as("n"))
    fp.as("a").join(fp.as("b"),
        $"a.fp" === $"b.fp" && $"a.src" < $"b.src")
      .groupBy($"a.src".as("source_a"), $"b.src".as("source_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select($"src".as("source_a"), $"n".as("n_a")), "source_a")
      .join(sizes.select($"src".as("source_b"), $"n".as("n_b")), "source_b")
      .select($"source_a", $"source_b", $"n_a", $"n_b", $"shared",
        round($"shared" / ($"n_a" + $"n_b" - $"shared"), 6).as("jaccard"))
  }

  /** Persistent winnowing reference index: the DISTINCT (id, gh)
    * fingerprint set of a reference corpus plus the (k, w) parameters —
    * the position-local counterpart of [[MinhashRefIndex]], for
    * screening ingest batches for clones/plagiarized spans. */
  case class WinnowRefIndex(fp: DataFrame, k: Int, w: Int)

  /** One winnowing pass over the reference corpus → reusable index. */
  def buildWinnowIndex(refDf: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): WinnowRefIndex = {
    import refDf.sparkSession.implicits._
    WinnowRefIndex(
      winnowFingerprints(refDf, idCol, textCol, k, w)
        .select($"doc_id".as("id"), $"gh").distinct(), k, w)
  }

  /** Persist / reload the winnow index (build once, screen many). */
  def saveWinnowIndex(index: WinnowRefIndex, path: String): Unit = {
    val spark = index.fp.sparkSession
    import spark.implicits._
    index.fp.write.mode("overwrite").parquet(s"$path/fp")
    Seq((index.k, index.w)).toDF("k", "w")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  def loadWinnowIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): WinnowRefIndex = {
    import spark.implicits._
    val p = spark.read.parquet(s"$path/params")
      .select($"k", $"w").as[(Int, Int)].head()
    WinnowRefIndex(spark.read.parquet(s"$path/fp"), p._1, p._2)
  }

  /**
   * Screen a new batch against the winnow index: the new side winnows
   * with the INDEX's parameters, pairs join on fingerprint hash
   * (cross-side only, hash-df capped on the reference side), and score
   * by containment over distinct shared hashes — [[winnowNearDups]]'
   * scoring with new×reference candidates only, so the union of
   * per-micro-batch screens equals one whole-batch screen regardless of
   * how the stream was chopped. Returns (new_id, ref_id, shared,
   * overlap 6dp).
   */
  def screenAgainstWinnowIndex(index: WinnowRefIndex, newDf: DataFrame,
      idCol: String, textCol: String, minShared: Long = 2L,
      maxHashDf: Long = DefaultMaxGramDf): DataFrame =
    screenWithWinnowStats(winnowIndexStats(index, maxHashDf), index, newDf,
      idCol, textCol, minShared)

  /** The index-side aggregates the screen needs: the hash-df-kept hash
    * set and per-reference fingerprint counts. Computed ONCE per index —
    * a streaming caller persists these so per-micro-batch screens never
    * re-scan the (possibly huge) reference fingerprint table. */
  def winnowIndexStats(index: WinnowRefIndex,
      maxHashDf: Long = DefaultMaxGramDf): (DataFrame, DataFrame) = {
    import index.fp.sparkSession.implicits._
    (index.fp.groupBy($"gh").agg(count(lit(1)).as("hdf"))
      .filter($"hdf" <= maxHashDf).select($"gh"),
      index.fp.groupBy($"id").agg(count(lit(1)).as("nf_ref")))
  }

  private[graft] def screenWithWinnowStats(stats: (DataFrame, DataFrame),
      index: WinnowRefIndex, newDf: DataFrame, idCol: String,
      textCol: String, minShared: Long): DataFrame = {
    val spark = newDf.sparkSession
    import spark.implicits._
    val (kept, nfRef) = stats
    val fpNew = winnowFingerprints(newDf, idCol, textCol, index.k, index.w)
      .select($"doc_id".as("new_id"), $"gh").distinct()
    val nfNew = fpNew.groupBy($"new_id").agg(count(lit(1)).as("nf_new"))
    fpNew.join(kept, Seq("gh"), "left_semi")
      .join(index.fp, "gh")
      .groupBy($"new_id", $"id".as("ref_id"))
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= minShared)
      .join(nfNew, "new_id")
      .join(nfRef.select($"id".as("ref_id"), $"nf_ref"), "ref_id")
      .select($"new_id", $"ref_id", $"shared",
        round($"shared" / least($"nf_new", $"nf_ref"), 6).as("overlap"))
  }
}
