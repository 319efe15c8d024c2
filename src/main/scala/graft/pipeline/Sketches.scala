package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed cardinality sketches.
 *
 * HyperLogLog over the shared md5-derived 60-bit hash (`Dedup.baseHash60`):
 * low 8 bits pick one of 256 registers, the rank is the leading-zero count
 * of the remaining 52 bits, and the registers are a plain
 * `groupBy(bucket).max(rank)`. The estimator's harmonic sum runs over
 * INTEGER terms (2^(53−M) as BIGINT), so the result is independent of
 * aggregation order and the whole sketch — registers, bias-corrected
 * estimate, linear-counting small-range branch — is replayed exactly by a
 * DuckDB oracle.
 *
 * 100 TB posture: this is the canonical two-level sketch plan — partial
 * max-per-register map-side, merged by max in one shuffle of ≤ m rows per
 * group, O(m) state per group regardless of input size. Compare
 * `approx_count_distinct` (Spark's built-in HLL++), which is faster but
 * not replayable by an external oracle.
 */
object Sketches {

  /** register count m = 2^8 */
  val HllM = 256

  /** rank domain: 60-bit base hash minus 8 bucket bits */
  val HllW = 52

  /** α_m · m² · 2^53 — the estimator numerator as ONE literal shared with
    * the SQL oracle (the 2^53 factor undoes the integer register scaling) */
  val HllK: Double = 0.7213 / (1 + 1.079 / HllM) * HllM * HllM * 9007199254740992.0

  /**
   * Approximate distinct `keyCol` per `groupCols`, returned as
   * (groupCols..., approx_distinct DOUBLE rounded to 2dp). One-shot
   * composition of `hllSketch` + `hllEstimateFromSketch`.
   */
  def hllEstimate(df: DataFrame, keyCol: String, groupCols: Seq[String],
      outCol: String = "approx_distinct"): DataFrame =
    hllEstimateFromSketch(hllSketch(df, keyCol, groupCols), groupCols, outCol)

  /**
   * The REGISTER TABLE form of the sketch: (groupCols..., __hll_bucket,
   * __hll_m), ≤ m rows per group — the persistable artifact. Build one per
   * ingest slice (day, shard), save as parquet, then `hllMerge` any slice
   * combination and estimate at query time WITHOUT rescanning data:
   * registers merge losslessly by max, so the merged estimate is
   * bit-identical to a single pass over the union. That is the
   * sketch-table pattern at 100 TB — cardinality dashboards over
   * arbitrary date ranges from kilobyte-sized inputs.
   */
  def hllSketch(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    // internal columns are __hll_-prefixed so a caller-supplied group column
    // named e.g. "bucket" can't collide (ambiguous reference / misgrouping)
    val reserved = Set("__hll_bucket", "__hll_r", "__hll_m", "__hll_present",
      "__hll_s_present", "__hll_s", "__hll_v", "__hll_raw", "__hll_est")
    require(groupCols.forall(g => !reserved(g)),
      s"hllSketch: group columns may not use reserved internal names $reserved")
    val h = Dedup.baseHash60(col(keyCol).cast("string"))
    val rest = shiftright(h, 8)
    // rank = leading zeros of the 52-bit remainder + 1 = 53 − bitlength
    val rank = when(rest === 0, lit(HllW + 1))
      .otherwise(lit(HllW + 1) - length(bin(rest)))
    val gcols = groupCols.map(col)
    df.select(gcols :+ h.bitwiseAND(lit(255L)).as("__hll_bucket") :+ rank.as("__hll_r"): _*)
      .groupBy(gcols :+ col("__hll_bucket"): _*)
      .agg(max(col("__hll_r")).as("__hll_m"))
  }

  /** Merge register tables (same groupCols) by register max — lossless,
    * associative, commutative: any grouping of slices estimates
    * identically. ≤ m rows per group in AND out. */
  def hllMerge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "hllMerge: no sketches")
    sketches.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col) :+ col("__hll_bucket"): _*)
      .agg(max(col("__hll_m")).as("__hll_m"))
  }

  /** The estimator tail over a register table (built or merged). */
  def hllEstimateFromSketch(regs: DataFrame, groupCols: Seq[String],
      outCol: String = "approx_distinct"): DataFrame = {
    val gcols = groupCols.map(col)
    regs
      .groupBy(gcols: _*)
      // 2^(53−M) is exact in doubles (M ≥ 1), cast to BIGINT before the sum
      // so the harmonic accumulation is integer — FP-order-independent
      .agg(sum(expr("CAST(power(2, 53 - __hll_m) AS BIGINT)")).as("__hll_s_present"),
        count(lit(1)).as("__hll_present"))
      .withColumn("__hll_v", lit(HllM.toLong) - col("__hll_present"))
      .withColumn("__hll_s",
        col("__hll_s_present") + col("__hll_v") * lit(9007199254740992L))
      .withColumn("__hll_raw", lit(HllK) / col("__hll_s"))
      .withColumn("__hll_est",
        when(col("__hll_v") > 0 && col("__hll_raw") <= lit(2.5 * HllM),
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("__hll_v")))
          .otherwise(col("__hll_raw")))
      .select(gcols :+ round(col("__hll_est"), 2).as(outCol): _*)
  }

  /** count–min depth (independent hash rows) and width (counters per row) */
  val CmD = 4
  val CmW = 512

  /** the multiply-mod family shared with the SQL oracle (seed fixed) */
  val CmFamily: IndexedSeq[(Long, Long)] = Dedup.hashFamily(CmD, seed = 11L)

  /**
   * Count–min frequency estimates for every distinct key: each occurrence
   * increments one of `CmW` counters in each of `CmD` hash rows (a d×w
   * integer grid — ONE bounded-size aggregate regardless of input size);
   * a key's estimate is the min of its d counters, an upper bound on the
   * true count that is tight unless all d buckets collide with other keys.
   * Returns (key, cm_estimate). All-integer → oracle-replayable.
   */
  def cmFrequency(df: DataFrame, keyCol: String): DataFrame =
    cmProbe(cmSketch(df, keyCol), df, keyCol)

  /** The d×w counter grid as a persistable sketch table: (i, bucket, c).
    * Like the HLL register table, build one per ingest slice and
    * `cmMerge` any combination — counters ADD, so the merged grid equals
    * the single-pass grid over the union exactly. */
  def cmSketch(df: DataFrame, keyCol: String): DataFrame =
    cmCoordinates(df, keyCol)
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Merge counter grids by cell-wise sum — exact, any slicing. */
  def cmMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "cmMerge: no sketches")
    sketches.reduce(_.unionByName(_))
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("c")).as("c"))
  }

  /** Estimate each of `keys`' frequencies against a built (or merged)
    * grid: min over the key's d counters. The grid is tiny and broadcast.
    * LEFT join + coalesce-0: a sparse grid stores only touched cells, so
    * a never-inserted probe key must read its absent cells as 0 (estimate
    * 0, the CM definition) rather than vanish or min over survivors. */
  def cmProbe(counters: DataFrame, keys: DataFrame, keyCol: String): DataFrame =
    cmCoordinates(keys, keyCol).distinct()
      .join(broadcast(counters), Seq("i", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_estimate"))

  /** (key, i, bucket) hash coordinates shared by build and probe. */
  private def cmCoordinates(df: DataFrame, keyCol: String): DataFrame = {
    val h = Dedup.baseHash60(col(keyCol).cast("string")) % Dedup.HashP
    val rows = CmFamily.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("i"),
        ((lit(a) * col("h") + lit(b)) % Dedup.HashP % CmW).as("bucket"))
    }
    df.select(col(keyCol).cast("string").as("key"), h.as("h"))
      .select(col("key"), explode(array(rows: _*)).as("ib"))
      .select(col("key"), col("ib.i").as("i"), col("ib.bucket").as("bucket"))
  }

  /** Bloom filter geometry: m bits packed into 62-bit words, k hash
    * functions from the shared multiply-mod family (seeded independently
    * of MinHash/CMS). ~500 keys in 4096 bits with k = 4 → FP rate well
    * under 1%. */
  val BloomBits = 4096
  val BloomK = 4
  // seed 13: distinct from MinHash (7) and count-min (11) so the three
  // sketch families are actually independent hash draws
  private val BloomFamily = Dedup.hashFamily(BloomK, seed = 13L)

  private def bloomPositions(key: org.apache.spark.sql.Column) = {
    val h = Dedup.baseHash60(key.cast("string")) % Dedup.HashP
    array(BloomFamily.map { case (a, b) =>
      (lit(a) * h + lit(b)) % Dedup.HashP % BloomBits }: _*)
  }

  /** bits packed per word: 62 (not 64) so the max shift is 61 — bit 63
    * overflows DuckDB's checked `<<` on signed BIGINT, and bit 62 would
    * flip the sign; staying below both keeps the bitmap replayable. */
  val BloomWordBits = 62

  /**
   * Build the Bloom bitmap: (word INT, bits BIGINT), ≤ m/62 rows total.
   * One hash aggregate over a ≤ m/62 key space — map-side partial bit_or
   * collapses everything, so the shuffle carries a handful of tiny rows per
   * task at any input size. The classic membership pre-filter for
   * "have we already ingested this document id" at 100 TB.
   */
  def bloomBuild(df: DataFrame, keyCol: String): DataFrame =
    df.select(explode(bloomPositions(col(keyCol))).as("pos"))
      .select((col("pos") / BloomWordBits).cast("int").as("word"),
        (col("pos") % BloomWordBits).cast("int").as("bit"))
      .groupBy(col("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("bits"))

  /** Merge Bloom bitmaps by word-wise OR — exact and slicing-independent
    * (set union of the inserted keys), completing the mergeable trio next
    * to `hllMerge` (max) and `cmMerge` (sum). */
  def bloomMerge(blooms: Seq[DataFrame]): DataFrame = {
    require(blooms.nonEmpty, "bloomMerge: no bitmaps")
    blooms.reduce(_.unionByName(_))
      .groupBy(col("word"))
      .agg(expr("bit_or(bits)").as("bits"))
  }

  /** Probe keys against a built bitmap: (key, maybe_present). A key is
    * maybe-present iff ALL k of its bits are set; the bitmap side is tiny
    * and broadcast. No false negatives; false positives at the designed
    * rate (deterministic, so the SQL oracle replays them exactly). */
  def bloomMightContain(bloom: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val probes = keys.select(col(keyCol).cast("string").as("key"),
        explode(bloomPositions(col(keyCol))).as("pos"))
      .select(col("key"), (col("pos") / BloomWordBits).cast("int").as("word"),
        (col("pos") % BloomWordBits).cast("int").as("bit"))
    probes.join(broadcast(bloom), Seq("word"), "left")
      .groupBy(col("key"))
      .agg((min(when(expr("(bits >> bit) & 1") === 1, 1).otherwise(0)) === 1)
        .as("maybe_present"))
  }

  /** bottom-k size for the KMV sketch */
  val KmvK = 128

  /** hash domain size 2^60 as an exact double (60-bit md5 prefix) */
  private val KmvDomain = 1.152921504606846976e18

  /**
   * K-minimum-values sketch: the k smallest distinct 60-bit key hashes per
   * group — the sketch that HLL cannot be: because it keeps actual hash
   * VALUES, two sketches support set INTERSECTION and Jaccard estimates
   * (bottom-k of the union ∩ both sides), not just distinct counts.
   *
   * Scale shape: one hash-dedup aggregate (map-side partials collapse
   * duplicate keys), then `row_number ≤ k` — which Spark plans as
   * WindowGroupLimit, pushing a partial bottom-k BEFORE the shuffle, so
   * the final exchange carries ≤ k rows per group per map partition.
   * Output ≤ k rows per group: the persistable artifact, like the HLL
   * register table.
   */
  def kmvSketch(df: DataFrame, keyCol: String, groupCols: Seq[String],
      k: Int = KmvK): DataFrame = {
    val reserved = Set("__kmv_h", "__kmv_rn")
    require(groupCols.forall(g => !reserved(g)),
      s"kmvSketch: group columns may not use reserved internal names $reserved")
    val gcols = groupCols.map(col)
    val hashed = df
      .select(gcols :+ Dedup.baseHash60(col(keyCol).cast("string")).as("__kmv_h"): _*)
      .groupBy(gcols :+ col("__kmv_h"): _*).agg(lit(1).as("__kmv_rn"))
    bottomK(hashed, groupCols, k)
  }

  /** bottom-k hashes per group via the WindowGroupLimit-planned filter */
  private def bottomK(hashed: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__kmv_h"))
    hashed
      .withColumn("__kmv_rn", row_number().over(w))
      .filter(col("__kmv_rn") <= k)
      .select(groupCols.map(col) :+ col("__kmv_h"): _*)
  }

  /** Merge KMV sketches: bottom-k of the distinct hash union. Lossless for
    * set union — the k smallest hashes of A ∪ B are all within the k
    * smallest of A plus the k smallest of B, so merging sketches equals
    * sketching the union. Associative, commutative, any slicing. */
  def kmvMerge(sketches: Seq[DataFrame], groupCols: Seq[String],
      k: Int = KmvK): DataFrame = {
    require(sketches.nonEmpty, "kmvMerge: no sketches")
    bottomK(sketches.reduce(_.unionByName(_)).distinct(), groupCols, k)
  }

  /** Distinct-count estimator over a (built or merged) sketch: exact when
    * the group has fewer than k hashes (the sketch IS the distinct hash
    * set), else (k−1) · 2^60 / h_(k). */
  def kmvEstimateFromSketch(sketch: DataFrame, groupCols: Seq[String],
      k: Int = KmvK, outCol: String = "kmv_distinct"): DataFrame = {
    val gcols = groupCols.map(col)
    sketch.groupBy(gcols: _*)
      .agg(count(lit(1)).as("__kmv_n"), max(col("__kmv_h")).as("__kmv_hk"))
      .select(gcols :+
        round(when(col("__kmv_n") < k, col("__kmv_n").cast("double"))
          .otherwise(lit((k - 1).toDouble * KmvDomain) / col("__kmv_hk").cast("double")), 2)
          .as(outCol): _*)
  }

  /**
   * Pairwise set-overlap estimates for every unordered pair of scopes in
   * one sketch table: Jaccard = |bottom-k(A ∪ B) ∩ A ∩ B| / |bottom-k(A ∪ B)|
   * (any union-bottom-k hash belonging to A is necessarily within A's own
   * bottom-k, so sketch membership is exact there), and the intersection
   * size estimate = Jaccard · KMV-union-estimate. Everything after the
   * scope-pair fan-out is sketch-sized: ≤ 2k rows per pair.
   * Returns (scope_a, scope_b, kmv_jaccard, kmv_intersect).
   */
  def kmvJaccard(sketch: DataFrame, scopeCol: String, k: Int = KmvK): DataFrame = {
    val scopes = sketch.select(col(scopeCol).as("__kmv_s")).distinct()
    val pairs = scopes.select(col("__kmv_s").as("scope_a"))
      .crossJoin(scopes.select(col("__kmv_s").as("scope_b")))
      .filter(col("scope_a") < col("scope_b"))
    val memA = pairs.join(sketch.withColumnRenamed(scopeCol, "scope_a"), "scope_a")
      .select(col("scope_a"), col("scope_b"), col("__kmv_h"),
        lit(1).as("__in_a"), lit(0).as("__in_b"))
    val memB = pairs.join(sketch.withColumnRenamed(scopeCol, "scope_b"), "scope_b")
      .select(col("scope_a"), col("scope_b"), col("__kmv_h"),
        lit(0).as("__in_a"), lit(1).as("__in_b"))
    val union = memA.unionByName(memB)
      .groupBy(col("scope_a"), col("scope_b"), col("__kmv_h"))
      .agg(max(col("__in_a")).as("__in_a"), max(col("__in_b")).as("__in_b"))
    val w = Window.partitionBy(col("scope_a"), col("scope_b")).orderBy(col("__kmv_h"))
    union
      .withColumn("__kmv_rn", row_number().over(w))
      .filter(col("__kmv_rn") <= k)
      .groupBy(col("scope_a"), col("scope_b"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__in_a") * col("__in_b")).as("__nb"),
        max(col("__kmv_h")).as("__hk"))
      .withColumn("__union_est",
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(lit((k - 1).toDouble * KmvDomain) / col("__hk").cast("double")))
      .select(col("scope_a"), col("scope_b"),
        round(col("__nb").cast("double") / col("__n"), 4).as("kmv_jaccard"),
        round(col("__nb").cast("double") / col("__n") * col("__union_est"), 2)
          .as("kmv_intersect"))
  }

  /** DuckDB replay of `kmvSketch` + `kmvJaccard` over a `(scope, key)`
    * relation — sketch construction, union bottom-k, and both estimators,
    * verbatim. */
  def kmvJaccardOracleSql(keyedRelation: String, k: Int = KmvK): String =
    s"""WITH keyed AS ($keyedRelation),
       |kh AS (SELECT DISTINCT scope,
       |         ('0x' || substr(md5(key), 1, 15))::BIGINT AS h
       |       FROM keyed),
       |sk AS (SELECT scope, h FROM (
       |         SELECT scope, h, row_number() OVER (PARTITION BY scope ORDER BY h) AS rn
       |         FROM kh) WHERE rn <= $k),
       |prs AS (SELECT a.scope AS sa, b.scope AS sb
       |        FROM (SELECT DISTINCT scope FROM sk) a,
       |             (SELECT DISTINCT scope FROM sk) b
       |        WHERE a.scope < b.scope),
       |mem AS (SELECT sa, sb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |          SELECT p.sa, p.sb, s.h, 1 AS in_a, 0 AS in_b
       |          FROM prs p JOIN sk s ON s.scope = p.sa
       |          UNION ALL
       |          SELECT p.sa, p.sb, s.h, 0, 1
       |          FROM prs p JOIN sk s ON s.scope = p.sb)
       |        GROUP BY 1, 2, 3),
       |bot AS (SELECT * FROM (
       |          SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
       |          FROM mem) WHERE rn <= $k),
       |agg AS (SELECT sa, sb, count(*) AS n, sum(in_a * in_b) AS nb, max(h) AS hk
       |        FROM bot GROUP BY 1, 2),
       |est AS (SELECT sa, sb, n, nb,
       |          CASE WHEN n < $k THEN CAST(n AS DOUBLE)
       |               ELSE ${(k - 1).toDouble} * 1152921504606846976 / CAST(hk AS DOUBLE)
       |          END AS union_est
       |        FROM agg)
       |SELECT sa AS scope_a, sb AS scope_b,
       |       round(CAST(nb AS DOUBLE) / n, 4) AS kmv_jaccard,
       |       round(CAST(nb AS DOUBLE) / n * union_est, 2) AS kmv_intersect
       |FROM est""".stripMargin

  /** DuckDB replay of `bloomBuild` + `bloomMightContain`: build over
    * `keyedRelation` (one `key` column), probe `probeRelation`. */
  def bloomOracleSql(keyedRelation: String, probeRelation: String): String = {
    val fam = BloomFamily.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    s"""WITH keyed AS ($keyedRelation),
       |probes AS ($probeRelation),
       |fam(a, b) AS (VALUES $fam),
       |bh AS (SELECT ('0x' || substr(md5(key), 1, 15))::BIGINT % ${Dedup.HashP} AS h
       |       FROM keyed),
       |bpos AS (SELECT (a * h + b) % ${Dedup.HashP} % $BloomBits AS pos
       |         FROM bh CROSS JOIN fam),
       |bloom AS (
       |  SELECT CAST(pos // $BloomWordBits AS INT) AS word,
       |         bit_or(1::BIGINT << CAST(pos % $BloomWordBits AS INT)) AS bits
       |  FROM bpos GROUP BY 1),
       |ph AS (SELECT key, ('0x' || substr(md5(key), 1, 15))::BIGINT % ${Dedup.HashP} AS h
       |       FROM probes),
       |ppos AS (SELECT key, (a * h + b) % ${Dedup.HashP} % $BloomBits AS pos
       |         FROM ph CROSS JOIN fam),
       |pt AS (SELECT key, CAST(pos // $BloomWordBits AS INT) AS word,
       |              CAST(pos % $BloomWordBits AS INT) AS bit
       |       FROM ppos)
       |SELECT pt.key,
       |       min(CASE WHEN (bits >> bit) & 1 = 1 THEN 1 ELSE 0 END) = 1 AS maybe_present
       |FROM pt LEFT JOIN bloom USING (word)
       |GROUP BY pt.key""".stripMargin
  }

  /**
   * Runtime join pruning: collect a built Bloom bitmap (model-sized —
   * ≤ m/62 rows) into a literal word array and return a pure Column
   * predicate testing all k bit positions against it. Filtering the FACT
   * side of a join with this predicate before the shuffle is the
   * runtime-filter posture at 100 TB: the probe is map-only codegen (no
   * explode, no extra shuffle), false positives are removed by the join
   * itself, and no false negatives exist — so the join result is
   * IDENTICAL to the unpruned join while the exchange only carries rows
   * that can possibly match.
   */
  def bloomPruneFilter(bloom: DataFrame, key: Column): Column = {
    val words = new Array[Long](BloomBits / BloomWordBits + 1)
    bloom.collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
    val wordsLit = array(words.toIndexedSeq.map(lit): _*)
    val h = Dedup.baseHash60(key.cast("string")) % Dedup.HashP
    BloomFamily.map { case (a, b) =>
      val pos = (lit(a) * h + lit(b)) % Dedup.HashP % BloomBits
      call_function("shiftright",
        element_at(wordsLit, (pos / BloomWordBits).cast("int") + lit(1)),
        (pos % BloomWordBits).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** DuckDB replay of `cmFrequency` over a one-column `key` relation. */
  def cmOracleSql(keyedRelation: String): String = {
    val fam = CmFamily.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH keyed AS ($keyedRelation),
       |fam(i, a, b) AS (VALUES $fam),
       |h AS (SELECT key,
       |        ('0x' || substr(md5(key), 1, 15))::BIGINT % ${Dedup.HashP} AS h
       |      FROM keyed),
       |eb AS (SELECT key, i, (a * h + b) % ${Dedup.HashP} % $CmW AS bucket
       |       FROM h CROSS JOIN fam),
       |counters AS (SELECT i, bucket, count(*) AS c FROM eb GROUP BY 1, 2),
       |probes AS (SELECT DISTINCT key, i, bucket FROM eb)
       |SELECT p.key, min(c.c) AS cm_estimate
       |FROM probes p JOIN counters c USING (i, bucket)
       |GROUP BY p.key""".stripMargin
  }

  /**
   * Classic Misra–Gries over one partition's keys: at most `m` live
   * counters. A present key increments its counter; an absent key takes a
   * free slot if one exists; otherwise EVERY live counter pays 1 (zeros
   * evicted) and the incoming occurrence is discarded. One such decrement
   * event retires m+1 occurrences, so there are at most n/(m+1) of them
   * and every counter undercounts its true partition frequency by at most
   * n/(m+1). Amortized O(1) per element: each decrement cascade is paid
   * for by the increments that filled the map.
   *
   * Returns (counters, partition row count).
   */
  private[graft] def mgLocal(it: Iterator[String], m: Int): (Map[String, Long], Long) = {
    require(m > 0, "mgLocal: need at least one counter")
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val k = it.next(); n += 1
      counts.get(k) match {
        case Some(c) => counts.update(k, c + 1)
        case None if counts.size < m => counts.update(k, 1L)
        case None =>
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.filterInPlace((_, c) => c > 0)
      }
    }
    (counts.toMap, n)
  }

  /** Mergeable-summaries MG merge (Agarwal et al., PODS 2012): sum the two
    * counter maps pointwise; if more than `m` keys survive, subtract the
    * (m+1)-th largest total from every counter and keep the positive ones.
    * The subtraction charges each of the ≥ m+1 largest counters, so the
    * total undercount across any merge tree stays ≤ n/(m+1). */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long],
      m: Int): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (summed.size <= m) summed
    else {
      val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(m)
      summed.iterator.map { case (k, c) => k -> (c - cut) }
        .filter(_._2 > 0).toMap
    }
  }

  /**
   * EXACT heavy hitters — every key whose true count exceeds ⌊n/k⌋, with
   * its exact count — in two passes, never a full-vocabulary groupBy:
   *
   *   1. candidate pass: one Misra–Gries summary per partition (bounded:
   *      `m` counters each), collected and merged on the driver
   *      (partitions × m entries — model-sized, independent of n). Because
   *      the merged summary undercounts by at most n/(m+1) ≤ n/k, every
   *      true heavy hitter is guaranteed a surviving counter.
   *   2. verify pass: exact counts for the ≤ m candidate keys only — the
   *      shuffle carries at most m rows per map task (map-side partial
   *      agg), regardless of input size or vocabulary.
   *
   * The output is therefore deterministic (exact counts against an exact
   * threshold) even though the intermediate candidate SET depends on
   * partitioning — the candidates are only ever a superset. That is what
   * makes the operator oracle-able: `heavyHittersOracleSql` replays it as
   * a plain GROUP BY ... HAVING, which at test scale is feasible for DuckDB
   * but at 100 TB would shuffle the full vocabulary — the two-pass plan
   * caps the shuffle at m rows per task instead.
   *
   * Returns (keyCol STRING, cnt BIGINT), null keys ignored.
   */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int, m: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counters = if (m > 0) m else 2 * k
    require(counters + 1 >= k,
      s"heavyHitters: $counters counters cannot certify count > n/$k " +
        "(need m + 1 >= k for the Misra-Gries superset guarantee)")
    val keys = df.select(col(keyCol).cast("string").as(keyCol))
      .filter(col(keyCol).isNotNull)
    val summaries = keys.as[String]
      .mapPartitions(it => Iterator.single(mgLocal(it, counters)))
      .collect()
    val n = summaries.iterator.map(_._2).sum
    val candidates = summaries.iterator.map(_._1)
      .foldLeft(Map.empty[String, Long])(mgMerge(_, _, counters))
      .keys.toSeq
    if (candidates.isEmpty || n == 0L)
      keys.limit(0).withColumn("cnt", lit(0L))
    else
      keys.filter(col(keyCol).isin(candidates: _*))
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > lit(n / k))
  }

  /** DuckDB replay of `heavyHitters` over a one-column `(key)` relation:
    * exact counts over the threshold — the candidate machinery is invisible
    * in the result by construction. */
  def heavyHittersOracleSql(keyedRelation: String, k: Int): String =
    s"""WITH keyed AS ($keyedRelation)
       |SELECT key, CAST(count(*) AS BIGINT) AS cnt
       |FROM keyed GROUP BY key
       |HAVING count(*) > (SELECT count(*) // $k FROM keyed)""".stripMargin

  /** The DuckDB replay of `hllEstimate` over a `(scope, key)` relation
    * provided as a WITH-clause body. Kept next to the Scala so the two
    * stay literally in sync (same constants, same branch). */
  def hllOracleSql(keyedRelation: String): String =
    s"""WITH keyed AS ($keyedRelation),
       |h AS (SELECT scope,
       |        ('0x' || substr(md5(key), 1, 15))::BIGINT AS h
       |      FROM keyed),
       |r AS (SELECT scope, h % 256 AS bucket,
       |        CASE WHEN h // 256 = 0 THEN 53
       |             ELSE 53 - length(bin(h // 256)) END AS r
       |      FROM h),
       |regs AS (SELECT scope, bucket, max(r) AS m FROM r GROUP BY 1, 2),
       |agg AS (SELECT scope,
       |          sum(CAST(power(2, 53 - m) AS BIGINT)) AS s_present,
       |          count(*) AS present
       |        FROM regs GROUP BY 1),
       |est AS (SELECT scope, 256 - present AS v,
       |          $HllK / (s_present + (256 - present) * 9007199254740992) AS raw
       |        FROM agg)
       |SELECT scope,
       |  round(CASE WHEN v > 0 AND raw <= ${2.5 * HllM}
       |             THEN 256.0 * ln(256.0 / v) ELSE raw END, 2) AS approx_distinct
       |FROM est""".stripMargin
}
