package graft.queries

import graft.pipeline.{Sketches, Skew}
import org.apache.spark.sql.functions._

/** Statistical aggregates and shuffle-skew utilities, oracle-verified. */
object StatsQueries {

  import Registry.t

  private val tmpRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Probe set shared by both Bloom queries (and their oracles): 10
    * present doc ids + 10 synthetic absent keys — ONE construction, so
    * the Spark and SQL sides cannot drift apart. */
  private def bloomProbes(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    docs.filter($"doc_id" < 10)
      .select($"doc_id".cast("string").as("k"))
      .unionByName(s.range(10).select(concat(lit("absent"), $"id").as("k")))
  }

  private val bloomProbeSql =
    """SELECT CAST(doc_id AS VARCHAR) AS key FROM documents WHERE doc_id < 10
      |UNION ALL SELECT 'absent' || i FROM range(10) t(i)""".stripMargin

  /** (scope, key) relation the HLL query sketches: per-event-type user
    * cardinality (exercises the linear-counting branch — few hundred users)
    * and global event-id cardinality (raw harmonic branch — tens of
    * thousands). Shared verbatim with the DuckDB oracle. */
  private val hllKeyedSql =
    """SELECT 'user:' || event_type AS scope, CAST(user_id AS VARCHAR) AS key FROM events
      |UNION ALL
      |SELECT 'all_events' AS scope, CAST(event_id AS VARCHAR) AS key FROM events""".stripMargin

  /** The token heavy-hitter oracle (count > n/500 over whitespace tokens),
    * shared verbatim by the batch row and the streaming screen so the two
    * cannot drift apart. */
  private[queries] val tokenHeavyHitterOracle: String =
    s"""SELECT key AS token, cnt
       |FROM (${Sketches.heavyHittersOracleSql(
          """SELECT token AS key
            |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            |WHERE token <> ''""".stripMargin, 500)})
       |ORDER BY token""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // HyperLogLog distinct-count sketch (md5-register construction,
    // integer harmonic sum) next to the exact distinct count — BOTH
    // columns hash-verified by the DuckDB replay of the same sketch
    "q_hll_distinct" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        val keyed = ev.select(concat(lit("user:"), $"event_type").as("scope"),
            $"user_id".cast("string").as("key"))
          .unionByName(ev.select(lit("all_events").as("scope"),
            $"event_id".cast("string").as("key")))
        val approx = Sketches.hllEstimate(keyed, "key", Seq("scope"))
        val exact = keyed.groupBy($"scope")
          .agg(count_distinct($"key").as("exact_distinct"))
        exact.join(approx, "scope").orderBy($"scope")
      },
      Some(s"""SELECT k.scope, x.exact_distinct, k.approx_distinct
              |FROM (${Sketches.hllOracleSql(hllKeyedSql)}) k
              |JOIN (SELECT scope, count(DISTINCT key) AS exact_distinct
              |      FROM ($hllKeyedSql) GROUP BY 1) x USING (scope)
              |ORDER BY scope""".stripMargin)),

    // the sketch-TABLE lifecycle: three disjoint event slices sketched
    // independently, each register table round-tripped through parquet,
    // merged by register max, estimated once — HLL merge is lossless, so
    // the oracle is simply the direct single-pass replay over all events
    "q_hll_sketch_merge" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
          .select($"event_id", $"event_type".as("scope"),
            $"user_id".cast("string").as("key"))
        // run counter like the streaming sinks: re-invocation in one JVM
        // must not overwrite part files a previous lazy result still reads
        val base = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"),
          s"graft_hll_sketches_${ProcessHandle.current().pid()}_${tmpRuns.incrementAndGet()}")
        val sketches = (0 until 3).map { i =>
          val p = base.resolve(s"slice_$i").toString
          Sketches.hllSketch(ev.filter($"event_id" % 3 === i), "key", Seq("scope"))
            .write.mode("overwrite").parquet(p)
          s.read.parquet(p)
        }
        Sketches.hllEstimateFromSketch(
            Sketches.hllMerge(sketches, Seq("scope")), Seq("scope"))
          .orderBy($"scope")
      },
      Some(s"""SELECT scope, approx_distinct
              |FROM (${Sketches.hllOracleSql(
                  "SELECT event_type AS scope, CAST(user_id AS VARCHAR) AS key FROM events")})
              |ORDER BY scope""".stripMargin)),

    // count-min frequency sketch next to exact per-user event counts —
    // the estimate is an upper bound (min over 4 hash-row counters), and
    // the whole integer grid is replayed by the DuckDB oracle
    "q_cm_user_counts" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val keyed = Registry.events(s, dir)
          .select($"user_id".cast("string").as("key"))
        val cm = Sketches.cmFrequency(keyed, "key")
        val exact = keyed.groupBy($"key").agg(count(lit(1)).as("exact_count"))
        exact.join(cm, "key")
          .select($"key".cast("long").as("user_id"), $"exact_count", $"cm_estimate")
          .orderBy($"user_id")
      },
      Some(s"""WITH cm AS (${Sketches.cmOracleSql(
                 "SELECT CAST(user_id AS VARCHAR) AS key FROM events")}),
              |exact AS (SELECT CAST(user_id AS VARCHAR) AS key,
              |            count(*) AS exact_count
              |          FROM events GROUP BY 1)
              |SELECT CAST(key AS BIGINT) AS user_id, exact_count, cm_estimate
              |FROM exact JOIN cm USING (key)
              |ORDER BY user_id""".stripMargin)),

    // EXACT heavy hitters (count > n/500) over the corpus token stream via
    // a Misra–Gries candidate pass (512 bounded counters per partition,
    // mergeable-summaries merge) + an exact count of the candidates only —
    // the two-pass plan whose shuffle is capped at m rows per task at any
    // scale. The superset guarantee makes the output exact, so the oracle
    // is the plain GROUP BY ... HAVING it replaces. The test corpus splits
    // 30 frequent tokens from one rare one at this threshold, so the HAVING
    // filter is exercised in both directions. Eviction/merge compression
    // paths are exercised in HeavyHitterSpec (vocab >> counters).
    "q_heavy_hitters" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select(explode(split($"text", " ")).as("token"))
          .filter($"token" =!= "")
        Sketches.heavyHitters(toks, "token", k = 500, m = 512)
          .orderBy($"token")
      },
      Some(StatsQueries.tokenHeavyHitterOracle)),

    // KMV bottom-k sketch: pairwise Jaccard + intersection-size estimates
    // between the per-event-type (user, day) activity sets — the set-overlap
    // question HLL registers cannot answer — next to the exact overlap.
    // Sketch construction, union bottom-k, and both estimators are replayed
    // verbatim by the DuckDB oracle.
    "q_kmv_jaccard" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val keyed = Registry.events(s, dir)
          .select($"event_type".as("scope"),
            concat($"user_id".cast("string"), lit(":"),
              date_format($"ts", "yyyy-MM-dd")).as("key"))
        val kmv = Sketches.kmvJaccard(
          Sketches.kmvSketch(keyed, "key", Seq("scope")), "scope")
        val ex = keyed.distinct()
        val sizes = ex.groupBy($"scope").agg(count(lit(1)).as("c"))
        val inter = ex.select($"scope".as("scope_a"), $"key")
          .join(ex.select($"scope".as("scope_b"), $"key"), Seq("key"))
          .filter($"scope_a" < $"scope_b")
          .groupBy($"scope_a", $"scope_b").agg(count(lit(1)).as("i"))
        inter
          .join(sizes.select($"scope".as("scope_a"), $"c".as("ca")), "scope_a")
          .join(sizes.select($"scope".as("scope_b"), $"c".as("cb")), "scope_b")
          .select($"scope_a", $"scope_b",
            round($"i".cast("double") / ($"ca" + $"cb" - $"i"), 4).as("exact_jaccard"),
            $"i".as("exact_intersect"))
          .join(kmv, Seq("scope_a", "scope_b"))
          .orderBy($"scope_a", $"scope_b")
      },
      Some {
        val keyedSql =
          """SELECT event_type AS scope,
            |       user_id || ':' || strftime(date_trunc('day', ts), '%Y-%m-%d') AS key
            |FROM events""".stripMargin
        s"""WITH ex AS (SELECT DISTINCT scope, key FROM ($keyedSql)),
           |sizes AS (SELECT scope, count(*) AS c FROM ex GROUP BY 1),
           |inter AS (SELECT a.scope AS sa, b.scope AS sb, count(*) AS i
           |          FROM ex a JOIN ex b ON a.key = b.key AND a.scope < b.scope
           |          GROUP BY 1, 2),
           |exact AS (SELECT sa, sb,
           |            round(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 4) AS exact_jaccard,
           |            i AS exact_intersect
           |          FROM inter
           |          JOIN sizes ca ON ca.scope = sa
           |          JOIN sizes cb ON cb.scope = sb),
           |kmv AS (${Sketches.kmvJaccardOracleSql(keyedSql)})
           |SELECT e.sa AS scope_a, e.sb AS scope_b, e.exact_jaccard,
           |       e.exact_intersect, k.kmv_jaccard, k.kmv_intersect
           |FROM exact e JOIN kmv k ON k.scope_a = e.sa AND k.scope_b = e.sb
           |ORDER BY scope_a, scope_b""".stripMargin
      }),

    // runtime Bloom join pruning: the fact side is pre-filtered by a
    // map-only bitmap probe built from the filtered dim keys, then joined —
    // the oracle is the UNPRUNED join, so any pruning artifact (a dropped
    // matching row) fails the hash check; false positives are removed by
    // the join itself
    "q_bloom_prune_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val dim = t(s, dir, "part").filter($"p_brand" === "Brand#11")
          .select($"p_partkey", $"p_type")
        val bloom = Sketches.bloomBuild(dim, "p_partkey")
        val fact = t(s, dir, "lineitem")
          .select($"l_partkey", $"l_extendedprice", $"l_discount")
          .filter(Sketches.bloomPruneFilter(bloom, $"l_partkey"))
        fact.join(dim, fact("l_partkey") === dim("p_partkey"))
          .groupBy($"p_type")
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
          .orderBy($"p_type")
      },
      Some("""SELECT p_type, count(*) AS n_items,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand = 'Brand#11'
             |GROUP BY p_type ORDER BY p_type""".stripMargin)),

    // exact interpolated percentiles per event type (both engines use
    // linear interpolation at rank (n-1)*p)
    "q_value_percentiles" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Registry.events(s, dir)
          .groupBy($"event_type")
          .agg(percentile($"value", lit(0.25)).as("p"),
            percentile($"value", lit(0.5)).as("q"),
            percentile($"value", lit(0.95)).as("r"))
          .select($"event_type", round($"p", 4).as("p25"),
            round($"q", 4).as("p50"), round($"r", 4).as("p95"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.25), 4) AS p25,
             |  round(quantile_cont(value, 0.50), 4) AS p50,
             |  round(quantile_cont(value, 0.95), 4) AS p95
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // the salted join must be RESULT-identical to the plain join — the
    // oracle is the unsalted SQL join, so any salting artifact (dropped or
    // duplicated rows) fails the hash check
    "q_salted_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem").select($"l_partkey", $"l_extendedprice", $"l_discount")
        val part = t(s, dir, "part").select($"p_partkey".as("l_partkey"), $"p_brand")
        Skew.saltedJoin(li, part, "l_partkey", salts = 8)
          .groupBy($"p_brand")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // single-pass numeric column profiling (ANALYZE TABLE-style QA):
    // one aggregate computes every metric for every column, melted to one
    // row per column
    "q_numeric_profile" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.numericProfile(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
          .orderBy($"column")
      },
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS "column", count($c) AS n,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  count(DISTINCT $c) AS n_distinct,
             |  round(CAST(min($c) AS DOUBLE), 6) AS min,
             |  round(CAST(max($c) AS DOUBLE), 6) AS max,
             |  round(avg(CAST($c AS DOUBLE)), 6) AS mean,
             |  round(stddev_samp(CAST($c AS DOUBLE)), 6) AS stddev
             |FROM lineitem""".stripMargin
        Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
          .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
      }),

    // all pairwise Pearson coefficients from ONE aggregate pass over one
    // scan (algebraic aggregates, map-side partials); 6dp rounding keeps
    // the engines' co-moment associativity out of the hash
    "q_corr_matrix" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.corrPairs(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy($"col_x", $"col_y")
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val pairs = for {
          i <- cols.indices; j <- cols.indices if i < j
        } yield (cols(i), cols(j))
        pairs.map { case (a, b) =>
          s"""SELECT '$a' AS col_x, '$b' AS col_y,
             |  round(corr(CAST($a AS DOUBLE), CAST($b AS DOUBLE)), 6) AS r
             |FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_x, col_y")
      }),

    // quantile normalization: each doc's length mapped onto the GLOBAL
    // length distribution at its within-source quantile — scores become
    // cross-domain comparable (batch-effect correction for curation);
    // percent_rank + interpolated-percentile grid, both engine-identical
    "q_quantile_normalize" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.quantileNormalize(
            t(s, dir, "documents"), "doc_id", "source", "n_chars")
          .orderBy($"doc_id")
      },
      Some {
        val qs = (0 to 100).map(_.toDouble / 100)
        val lst = qs.mkString("[", ", ", "]")
        s"""WITH s AS (
           |  SELECT doc_id, source, n_chars::DOUBLE AS v FROM documents),
           |g AS (
           |  SELECT unnest(quantile_cont(v, $lst)) AS gv,
           |    generate_subscripts(quantile_cont(v, $lst), 1) AS i FROM s),
           |p AS (
           |  SELECT doc_id, source, v,
           |    percent_rank() OVER (PARTITION BY source ORDER BY v, doc_id) AS pr
           |  FROM s),
           |x AS (
           |  SELECT doc_id, source, v, pr * 100 AS pos,
           |    floor(pr * 100)::INT AS lo, ceil(pr * 100)::INT AS hi FROM p)
           |SELECT x.doc_id, x.source, x.v AS n_chars,
           |  round(glo.gv + (x.pos - x.lo) * (ghi.gv - glo.gv), 6) AS norm
           |FROM x JOIN g glo ON glo.i = x.lo + 1
           |JOIN g ghi ON ghi.i = x.hi + 1
           |ORDER BY x.doc_id""".stripMargin
      }),

    // Spearman rank correlation (tie-correct fractional ranks) between a
    // customer's order count and their largest order — ranks as doubled
    // longs so every sum is exact integer math; the monotone-association
    // complement of the Pearson row above
    "q_spearman" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "orders").groupBy($"o_custkey")
          .agg(count(lit(1)).as("x"), max($"o_totalprice").as("y"))
        graft.pipeline.Profiling.spearman(c, "x", "y")
      },
      Some("""WITH c AS (
             |  SELECT o_custkey, count(*)::BIGINT AS x, max(o_totalprice) AS y
             |  FROM orders GROUP BY 1),
             |gx AS (SELECT x, count(*)::BIGINT AS cnt FROM c GROUP BY 1),
             |rx AS (SELECT x,
             |    2 * (sum(cnt) OVER (ORDER BY x) - cnt) + cnt + 1 AS rx2 FROM gx),
             |gy AS (SELECT y, count(*)::BIGINT AS cnt FROM c GROUP BY 1),
             |ry AS (SELECT y,
             |    2 * (sum(cnt) OVER (ORDER BY y) - cnt) + cnt + 1 AS ry2 FROM gy),
             |j AS (SELECT rx.rx2, ry.ry2 FROM c
             |      JOIN rx USING (x) JOIN ry USING (y)),
             |m AS (SELECT count(*)::BIGINT AS n,
             |        sum(rx2)::BIGINT AS sx, sum(ry2)::BIGINT AS sy,
             |        sum(rx2 * rx2)::BIGINT AS sxx, sum(ry2 * ry2)::BIGINT AS syy,
             |        sum(rx2 * ry2)::BIGINT AS sxy FROM j)
             |SELECT n, round(
             |    ((n * sxy - sx * sy)::DOUBLE) /
             |    sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE),
             |  6) AS rho
             |FROM m""".stripMargin)),

    // per-group winsorization at exact interpolated percentiles (both
    // engines define quantile_cont/percentile identically); summarized
    // per group so the output is grid-sized
    "q_winsorize" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.winsorize(t(s, dir, "lineitem"),
            "l_returnflag", "l_extendedprice", pLo = 0.05, pHi = 0.95)
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum($"clipped_low".cast("long")).as("n_low"),
            sum($"clipped_high".cast("long")).as("n_high"),
            round(avg($"l_extendedprice"), 4).as("mean_raw"),
            round(avg($"winsorized"), 4).as("mean_winsorized"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH b AS (
             |  SELECT l_returnflag AS k,
             |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS lo,
             |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS hi
             |  FROM lineitem GROUP BY 1),
             |w AS (
             |  SELECT l.l_returnflag AS k, CAST(l.l_extendedprice AS DOUBLE) AS v,
             |    least(greatest(CAST(l.l_extendedprice AS DOUBLE), b.lo), b.hi) AS wv,
             |    CAST(l.l_extendedprice AS DOUBLE) < b.lo AS cl,
             |    CAST(l.l_extendedprice AS DOUBLE) > b.hi AS ch
             |  FROM lineitem l JOIN b ON l.l_returnflag = b.k)
             |SELECT k AS l_returnflag, count(*) AS n,
             |  CAST(sum(CASE WHEN cl THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             |  CAST(sum(CASE WHEN ch THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             |  round(avg(v), 4) AS mean_raw,
             |  round(avg(wv), 4) AS mean_winsorized
             |FROM w GROUP BY k ORDER BY l_returnflag""".stripMargin)),

    // difference-in-differences: md5-parity cohorts × midpoint-date
    // periods over purchase values; DiD from the 4dp cell means
    "q_diff_in_diff" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val p = Registry.events(s, dir).filter($"event_type" === "purchase")
        val span = p.agg(min(to_date($"ts")).as("lo"), max(to_date($"ts")).as("hi"))
        val cells = p.crossJoin(broadcast(span))
          .withColumn("cohort",
            when(graft.pipeline.Dedup.baseHash60(
              concat(lit("did:"), $"user_id".cast("string"))) % 2 === 0,
              "treat").otherwise("control"))
          .withColumn("period",
            when(datediff(to_date($"ts"), $"lo") * 2 < datediff($"hi", $"lo"),
              "pre").otherwise("post"))
          .groupBy($"cohort", $"period")
          .agg(count(lit(1)).as("n"),
            // exact-decimal sum: 2dp inputs make round(avg,4) boundary-
            // exact, so anchor via the identical rational on both engines
            round(sum($"value".cast("decimal(20,2)")).cast("double") /
              count(lit(1)) + lit(1e-9), 4).as("m"))
        val wide = cells.groupBy()
          .pivot(concat($"cohort", lit("_"), $"period"),
            Seq("treat_pre", "treat_post", "control_pre", "control_post"))
          .agg(first($"m"))
        cells.select($"cohort", $"period", $"n", $"m")
          .crossJoin(broadcast(wide.select(
            round(($"treat_post" - $"treat_pre") -
              ($"control_post" - $"control_pre"), 4).as("did"))))
          .orderBy($"cohort", $"period")
      },
      Some("""WITH p AS (
             |  SELECT user_id, value, CAST(date_trunc('day', ts) AS DATE) AS day
             |  FROM events WHERE event_type = 'purchase'),
             |sp AS (SELECT min(day) AS lo, max(day) AS hi FROM p),
             |lab AS (
             |  SELECT CASE WHEN CAST(('0x' || substr(md5('did:' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
             |      THEN 'treat' ELSE 'control' END AS cohort,
             |    CASE WHEN (day - sp.lo) * 2 < (sp.hi - sp.lo)
             |      THEN 'pre' ELSE 'post' END AS period,
             |    value
             |  FROM p, sp),
             |cells AS (
             |  SELECT cohort, period, count(*) AS n,
             |    round(CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE)
             |      / count(*) + 0.000000001, 4) AS m
             |  FROM lab GROUP BY 1, 2),
             |d AS (
             |  SELECT round(
             |    (max(CASE WHEN cohort = 'treat' AND period = 'post' THEN m END)
             |     - max(CASE WHEN cohort = 'treat' AND period = 'pre' THEN m END))
             |    - (max(CASE WHEN cohort = 'control' AND period = 'post' THEN m END)
             |       - max(CASE WHEN cohort = 'control' AND period = 'pre' THEN m END)),
             |    4) AS did
             |  FROM cells)
             |SELECT cohort, period, n, m, d.did FROM cells, d
             |ORDER BY cohort, period""".stripMargin)),

    // CUPED variance reduction: pre-period covariate regression-adjusts
    // the post metric; single global theta, per-cohort adjusted means
    "q_cuped" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val p = Registry.events(s, dir).filter($"event_type" === "purchase")
        val span = p.agg(min(to_date($"ts")).as("lo"), max(to_date($"ts")).as("hi"))
        val units = p.crossJoin(broadcast(span))
          .withColumn("period",
            when(datediff(to_date($"ts"), $"lo") * 2 < datediff($"hi", $"lo"),
              "pre").otherwise("post"))
          .groupBy($"user_id")
          .agg(
            round(sum(when($"period" === "pre", $"value").cast("decimal(20,2)"))
              .cast("double") / count(when($"period" === "pre", $"value"))
              + lit(1e-9), 6).as("x"),
            round(sum(when($"period" === "post", $"value").cast("decimal(20,2)"))
              .cast("double") / count(when($"period" === "post", $"value"))
              + lit(1e-9), 6).as("y"))
          .filter($"x".isNotNull && $"y".isNotNull)
          .withColumn("cohort",
            when(graft.pipeline.Dedup.baseHash60(
              concat(lit("did:"), $"user_id".cast("string"))) % 2 === 0,
              "treat").otherwise("control"))
        graft.pipeline.Profiling.cuped(units, "cohort", "x", "y")
          .orderBy($"cohort")
      },
      Some("""WITH p AS (
             |  SELECT user_id, value, CAST(date_trunc('day', ts) AS DATE) AS day
             |  FROM events WHERE event_type = 'purchase'),
             |sp AS (SELECT min(day) AS lo, max(day) AS hi FROM p),
             |units AS (
             |  SELECT user_id,
             |    round(CAST(sum(CAST(CASE WHEN (day - sp.lo) * 2 < (sp.hi - sp.lo)
             |        THEN value END AS DECIMAL(20,2))) AS DOUBLE)
             |      / count(CASE WHEN (day - sp.lo) * 2 < (sp.hi - sp.lo)
             |              THEN value END) + 0.000000001, 6) AS x,
             |    round(CAST(sum(CAST(CASE WHEN NOT ((day - sp.lo) * 2 < (sp.hi - sp.lo))
             |        THEN value END AS DECIMAL(20,2))) AS DOUBLE)
             |      / count(CASE WHEN NOT ((day - sp.lo) * 2 < (sp.hi - sp.lo))
             |              THEN value END) + 0.000000001, 6) AS y
             |  FROM p, sp GROUP BY user_id, sp.lo, sp.hi),
             |u2 AS (
             |  SELECT user_id, x, y,
             |    CASE WHEN CAST(('0x' || substr(md5('did:' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
             |      THEN 'treat' ELSE 'control' END AS cohort
             |  FROM units WHERE x IS NOT NULL AND y IS NOT NULL),
             |g AS (SELECT round(covar_samp(x, y) / var_samp(x), 6) AS theta,
             |             round(avg(x), 6) AS mx FROM u2),
             |adj AS (SELECT cohort, y, y - g.theta * (x - g.mx) AS yadj
             |        FROM u2, g),
             |vr AS (SELECT round(var_samp(yadj) / var_samp(y), 6) AS var_ratio
             |       FROM adj)
             |SELECT cohort, count(*) AS n,
             |  round(avg(y), 6) AS mean_raw,
             |  round(avg(yadj), 6) AS mean_cuped,
             |  g.theta, vr.var_ratio
             |FROM adj, g, vr GROUP BY cohort, g.theta, vr.var_ratio
             |ORDER BY cohort""".stripMargin)),

    // two-proportion z-test on "heavy buyer" conversion (>= 14
    // purchases — every user purchases at least once in this fixture)
    // between the md5 cohorts; pooled-variance form, exact cells
    "q_proportion_ztest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val conv = Registry.events(s, dir)
          .groupBy($"user_id")
          .agg((sum(($"event_type" === "purchase").cast("int")) >= 14)
            .cast("long").as("converted"))
          .withColumn("cohort",
            when(graft.pipeline.Dedup.baseHash60(
              concat(lit("did:"), $"user_id".cast("string"))) % 2 === 0,
              "treat").otherwise("control"))
        val cells = conv.groupBy($"cohort")
          .agg(count(lit(1)).as("n"), sum($"converted").as("k"))
          .orderBy($"cohort").collect()
        val (n1, k1) = (cells(0).getLong(1), cells(0).getLong(2))
        val (n2, k2) = (cells(1).getLong(1), cells(1).getLong(2))
        val p1 = k1.toDouble / n1; val p2 = k2.toDouble / n2
        val pPool = (k1 + k2).toDouble / (n1 + n2)
        val z = BigDecimal((p1 - p2) /
            math.sqrt(pPool * (1 - pPool) * (1.0 / n1 + 1.0 / n2)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        def r6d(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Seq(("control", n1, k1, r6d(p1), "treat", n2, k2, r6d(p2), z))
          .toDF("group_1", "n1", "k1", "p1", "group_2", "n2", "k2", "p2", "z_stat")
      },
      Some("""WITH conv AS (
             |  SELECT user_id,
             |    CASE WHEN sum(CASE WHEN event_type = 'purchase'
             |                  THEN 1 ELSE 0 END) >= 14
             |         THEN 1 ELSE 0 END AS c
             |  FROM events GROUP BY user_id),
             |lab AS (
             |  SELECT c, CASE WHEN CAST(('0x' || substr(md5('did:' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
             |      THEN 'treat' ELSE 'control' END AS cohort
             |  FROM conv),
             |cells AS (SELECT cohort, count(*) AS n, CAST(sum(c) AS BIGINT) AS k
             |          FROM lab GROUP BY 1),
             |w AS (
             |  SELECT
             |    (SELECT n FROM cells WHERE cohort = 'control') AS n1,
             |    (SELECT k FROM cells WHERE cohort = 'control') AS k1,
             |    (SELECT n FROM cells WHERE cohort = 'treat') AS n2,
             |    (SELECT k FROM cells WHERE cohort = 'treat') AS k2)
             |SELECT 'control' AS group_1, n1, k1,
             |  round(CAST(k1 AS DOUBLE) / n1, 6) AS p1,
             |  'treat' AS group_2, n2, k2,
             |  round(CAST(k2 AS DOUBLE) / n2, 6) AS p2,
             |  round((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2) /
             |    sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
             |      * (1 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
             |      * (1.0 / n1 + 1.0 / n2)), 4) AS z_stat
             |FROM w""".stripMargin)),

    // Mann-Whitney rank-sum between the md5 cohorts: average ranks on
    // ties are exact halves (sums replay bit-for-bit), tie-corrected
    // normal z at 4dp
    // covariate matching with replacement: md5-cohort "treatment" over
    // customers, exact-match on market segment, nearest account balance
    // within a 100.0 caliper (asof-nearest on the 6dp-anchored score
    // axis), order spend as the outcome — the ATT-ready match table
    "q_covariate_match" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val spend = Registry.t(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(round(sum($"o_totalprice"), 2).as("y"))
        val units = Registry.t(s, dir, "customer")
          .join(spend, $"c_custkey" === $"o_custkey", "left")
          .select($"c_custkey".as("id"), $"c_mktsegment".as("seg"),
            $"c_acctbal".as("score"), coalesce($"y", lit(0.0)).as("y"),
            (graft.pipeline.Dedup.baseHash60(
              concat(lit("match:"), $"c_custkey".cast("string"))) % 2 === 0)
              .as("treat"))
        graft.pipeline.Classify.covariateMatch(units, "id", "treat",
            Seq("seg"), "score", "y", caliper = 100.0)
          .orderBy($"treated_id")
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey AS id, round(sum(o_totalprice), 2) AS y
             |  FROM orders GROUP BY 1),
             |u0 AS (
             |  SELECT c_custkey AS id, c_mktsegment AS seg,
             |    CAST(round(round(CAST(c_acctbal AS DOUBLE), 6) * 1e6) AS BIGINT) AS s6,
             |    coalesce(spend.y, 0.0) AS y,
             |    CAST(('0x' || substr(md5('match:' ||
             |      CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0 AS treat
             |  FROM customer LEFT JOIN spend ON spend.id = c_custkey),
             |t AS (SELECT seg, id AS tid, s6, y AS yt FROM u0 WHERE treat),
             |c AS (SELECT seg, id AS cid, s6, y AS yc FROM u0 WHERE NOT treat),
             |u AS (
             |  SELECT seg, s6 AS ts, 1 AS side, NULL::BIGINT AS ord,
             |         NULL::BIGINT AS r_cid, NULL::BIGINT AS r_cs6,
             |         NULL::DOUBLE AS r_yc
             |  FROM (SELECT DISTINCT seg, s6 FROM t)
             |  UNION ALL
             |  SELECT seg, s6, 0, cid, cid, s6, yc FROM c),
             |w AS (
             |  SELECT seg, ts, side,
             |    last_value(r_cid IGNORE NULLS) OVER bwin AS b_cid,
             |    last_value(r_cs6 IGNORE NULLS) OVER bwin AS b_cs6,
             |    last_value(r_yc IGNORE NULLS) OVER bwin AS b_yc,
             |    first_value(r_cid IGNORE NULLS) OVER fwin AS f_cid,
             |    first_value(r_cs6 IGNORE NULLS) OVER fwin AS f_cs6,
             |    first_value(r_yc IGNORE NULLS) OVER fwin AS f_yc
             |  FROM u
             |  WINDOW bwin AS (PARTITION BY seg ORDER BY ts, side, ord
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  fwin AS (PARTITION BY seg ORDER BY ts, side, ord
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
             |ch AS (
             |  SELECT seg, ts,
             |    b_cs6 IS NOT NULL AND ts - b_cs6 <= 100000000 AS b_ok,
             |    f_cs6 IS NOT NULL AND f_cs6 - ts <= 100000000 AS f_ok,
             |    ts - b_cs6 AS bd, f_cs6 - ts AS fd,
             |    b_cid, b_cs6, b_yc, f_cid, f_cs6, f_yc
             |  FROM w WHERE side = 1),
             |sel AS (
             |  SELECT seg, ts,
             |    CASE WHEN b_ok AND (NOT f_ok OR bd <= fd) THEN b_cid
             |         WHEN f_ok THEN f_cid END AS control_id,
             |    CASE WHEN b_ok AND (NOT f_ok OR bd <= fd) THEN b_cs6
             |         WHEN f_ok THEN f_cs6 END AS cs6,
             |    CASE WHEN b_ok AND (NOT f_ok OR bd <= fd) THEN b_yc
             |         WHEN f_ok THEN f_yc END AS y_control
             |  FROM ch)
             |SELECT t.seg, t.tid AS treated_id, sel.control_id,
             |  round(t.s6 / 1e6, 6) AS treated_score,
             |  round(sel.cs6 / 1e6, 6) AS control_score,
             |  round(abs(t.s6 - sel.cs6) / 1e6, 6) AS score_diff,
             |  t.yt AS y_treated, sel.y_control
             |FROM t JOIN sel ON sel.seg = t.seg AND sel.ts = t.s6
             |WHERE sel.control_id IS NOT NULL
             |ORDER BY treated_id""".stripMargin)),

    // two-sample Kolmogorov-Smirnov over the same md5 cohorts: the max
    // ECDF gap as an exact integer argmax over the value grid
    // (partition-offset cumulatives on the Spark side), asymptotic
    // p-value from the 100-term alternating series at the
    // Numerical-Recipes effective lambda
    "q_ks_test" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val p = Registry.events(s, dir).filter($"event_type" === "purchase")
          .withColumn("cohort",
            when(graft.pipeline.Dedup.baseHash60(
              concat(lit("did:"), $"user_id".cast("string"))) % 2 === 0,
              "treat").otherwise("control"))
        graft.pipeline.Profiling.ksTest(p, "cohort", "value")
      },
      Some("""WITH p AS (
             |  SELECT CAST(value AS DOUBLE) AS v,
             |    CASE WHEN CAST(('0x' || substr(md5('did:' ||
             |        CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
             |      THEN 'treat' ELSE 'control' END AS g
             |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
             |vg AS (
             |  SELECT v,
             |    sum(CASE WHEN g = 'control' THEN 1 ELSE 0 END) AS ca,
             |    sum(CASE WHEN g = 'treat' THEN 1 ELSE 0 END) AS cb
             |  FROM p GROUP BY 1),
             |cu AS (
             |  SELECT v, ca, cb,
             |    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             |    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
             |  FROM vg),
             |sz AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
             |              CAST(sum(cb) AS BIGINT) AS nb FROM vg),
             |gp AS (
             |  SELECT max(abs(CAST(sz.nb AS DECIMAL(38, 0)) * CAST(cuma AS DECIMAL(38, 0))
             |               - CAST(sz.na AS DECIMAL(38, 0)) * CAST(cumb AS DECIMAL(38, 0)))) AS gap
             |  FROM cu, sz),
             |dl AS (
             |  SELECT sz.na, sz.nb,
             |    CAST(gap AS DOUBLE) / (CAST(sz.na AS DOUBLE) * sz.nb) AS dd,
             |    (sqrt(CAST(sz.na AS DOUBLE) * sz.nb / (CAST(sz.na AS DOUBLE) + sz.nb))
             |      + 0.12 + 0.11 / sqrt(CAST(sz.na AS DOUBLE) * sz.nb
             |                           / (CAST(sz.na AS DOUBLE) + sz.nb)))
             |      * (CAST(gap AS DOUBLE) / (CAST(sz.na AS DOUBLE) * sz.nb)) AS lam
             |  FROM gp, sz)
             |SELECT 'control' AS group_1, 'treat' AS group_2,
             |  na AS n_1, nb AS n_2, round(dd, 6) AS d_stat,
             |  round(lam, 6) AS ks_lambda,
             |  CASE WHEN lam < 0.2 THEN 1.0
             |       ELSE round(greatest(0.0, least(1.0,
             |         list_sum(list_transform(range(1, 101), k ->
             |           2 * (CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END)
             |             * exp(-2 * k * k * lam * lam))))), 6)
             |  END AS p_value
             |FROM dl""".stripMargin)),

    // Hodges-Lehmann shift over the same md5 cohorts: median of all
    // cross-group differences from the grid cross (never row x row),
    // deterministic two-middle selection on the exact running weight
    "q_hodges_lehmann" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val p = Registry.events(s, dir).filter($"event_type" === "purchase")
          .withColumn("cohort",
            when(graft.pipeline.Dedup.baseHash60(
              concat(lit("did:"), $"user_id".cast("string"))) % 2 === 0,
              "treat").otherwise("control"))
        graft.pipeline.Profiling.hodgesLehmann(p, "cohort", "value")
      },
      Some("""WITH p AS (
             |  SELECT CAST(value AS DOUBLE) AS v,
             |    CASE WHEN CAST(('0x' || substr(md5('did:' ||
             |        CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
             |      THEN 'treat' ELSE 'control' END AS g
             |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
             |ga AS (SELECT v AS va, count(*) AS ca FROM p WHERE g = 'control' GROUP BY 1),
             |gb AS (SELECT v AS vb, count(*) AS cb FROM p WHERE g = 'treat' GROUP BY 1),
             |dd AS (
             |  SELECT d, CAST(sum(w) AS BIGINT) AS w FROM (
             |    SELECT round(a.va - b.vb, 6) AS d, a.ca * b.cb AS w
             |    FROM ga a CROSS JOIN gb b) GROUP BY 1),
             |cu AS (SELECT d, CAST(sum(w) OVER (ORDER BY d
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM dd),
             |k AS (
             |  SELECT na, nb, na * nb AS np,
             |    (na * nb + 1) // 2 AS k1, (na * nb) // 2 + 1 AS k2
             |  FROM (SELECT (SELECT CAST(sum(ca) AS BIGINT) FROM ga) AS na,
             |               (SELECT CAST(sum(cb) AS BIGINT) FROM gb) AS nb))
             |SELECT 'control' AS group_1, 'treat' AS group_2,
             |  na AS n_1, nb AS n_2, np AS n_pairs,
             |  round(((SELECT min(d) FROM cu, k WHERE cum >= k1)
             |       + (SELECT min(d) FROM cu, k WHERE cum >= k2)) / 2.0, 6)
             |    AS hl_shift
             |FROM k""".stripMargin)),

    // Cliff's delta effect size over the same md5 cohorts as
    // q_mann_whitney: cross-group pair counts read off the distinct-value
    // grid (exact decimal products, partition-offset below-counts on the
    // Spark side) — the size-of-effect companion to the rank test's p
    "q_cliffs_delta" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val p = Registry.events(s, dir).filter($"event_type" === "purchase")
          .withColumn("cohort",
            when(graft.pipeline.Dedup.baseHash60(
              concat(lit("did:"), $"user_id".cast("string"))) % 2 === 0,
              "treat").otherwise("control"))
        graft.pipeline.Profiling.cliffsDelta(p, "cohort", "value")
      },
      Some("""WITH p AS (
             |  SELECT CAST(value AS DOUBLE) AS v,
             |    CASE WHEN CAST(('0x' || substr(md5('did:' ||
             |        CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
             |      THEN 'treat' ELSE 'control' END AS g
             |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
             |vg AS (
             |  SELECT v,
             |    sum(CASE WHEN g = 'control' THEN 1 ELSE 0 END) AS ca,
             |    sum(CASE WHEN g = 'treat' THEN 1 ELSE 0 END) AS cb
             |  FROM p GROUP BY 1),
             |pre AS (
             |  SELECT v, ca, cb,
             |    coalesce(sum(cb) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
             |  FROM vg),
             |ag AS (
             |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
             |    sum(CAST(ca AS DECIMAL(38, 0)) * CAST(below AS DECIMAL(38, 0))) AS gt,
             |    sum(CAST(ca AS DECIMAL(38, 0)) * CAST(cb AS DECIMAL(38, 0))) AS ties
             |  FROM pre),
             |fin AS (
             |  SELECT na, nb, CAST(gt AS BIGINT) AS gt, CAST(ties AS BIGINT) AS ties,
             |    CAST(na AS BIGINT) * nb - CAST(gt AS BIGINT)
             |      - CAST(ties AS BIGINT) AS lt
             |  FROM ag),
             |d AS (
             |  SELECT na, nb, gt, lt, ties,
             |    round((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
             |          / (CAST(na AS DOUBLE) * nb), 6) AS delta
             |  FROM fin)
             |SELECT 'control' AS group_1, 'treat' AS group_2,
             |  na AS n_1, nb AS n_2, gt AS n_gt, lt AS n_lt, ties AS n_ties,
             |  delta,
             |  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
             |       WHEN abs(delta) < 0.33 THEN 'small'
             |       WHEN abs(delta) < 0.474 THEN 'medium'
             |       ELSE 'large' END AS magnitude
             |FROM d""".stripMargin)),

    "q_mann_whitney" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val p = Registry.events(s, dir).filter($"event_type" === "purchase")
          .withColumn("cohort",
            when(graft.pipeline.Dedup.baseHash60(
              concat(lit("did:"), $"user_id".cast("string"))) % 2 === 0,
              "treat").otherwise("control"))
        graft.pipeline.Profiling.mannWhitneyU(p, "cohort", "value")
      },
      Some("""WITH p AS (
             |  SELECT CAST(value AS DOUBLE) AS v,
             |    CASE WHEN CAST(('0x' || substr(md5('did:' ||
             |      CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
             |      THEN 'treat' ELSE 'control' END AS cohort
             |  FROM events WHERE event_type = 'purchase'),
             |r AS (
             |  SELECT cohort, v,
             |    rank() OVER (ORDER BY v) AS rmin,
             |    count(*) OVER (PARTITION BY v) AS tie
             |  FROM p),
             |a AS (SELECT cohort, v, rmin + (tie - 1) / 2.0 AS avgr FROM r),
             |st AS (SELECT cohort, count(*) AS n, sum(avgr) AS r
             |       FROM a GROUP BY 1),
             |tq AS (SELECT sum(t * t * t - t) AS tsum FROM (
             |         SELECT count(*) AS t FROM a GROUP BY v)),
             |c AS (
             |  SELECT
             |    (SELECT n FROM st WHERE cohort = 'control') AS n1,
             |    (SELECT r FROM st WHERE cohort = 'control') AS r1,
             |    (SELECT n FROM st WHERE cohort = 'treat') AS n2,
             |    (SELECT tsum FROM tq) AS tsum),
             |f AS (
             |  SELECT n1, n2, r1 - n1 * (n1 + 1) / 2.0 AS u1,
             |    n1 + n2 AS nt, tsum
             |  FROM c)
             |SELECT 'control' AS group_1, n1, round(u1, 6) AS u1,
             |  'treat' AS group_2, n2,
             |  round(CAST(n1 AS DOUBLE) * n2 - u1, 6) AS u2,
             |  round((u1 - n1 * n2 / 2.0) /
             |    sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 *
             |      ((nt + 1) - CAST(tsum AS DOUBLE)
             |        / (CAST(nt AS DOUBLE) * (nt - 1)))), 4) AS z_stat
             |FROM f""".stripMargin)),

    // Welch unequal-variance t-tests between every event-type pair on
    // the value column — the A/B comparison grid off one moment pass
    "q_welch_ttest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.welchTTest(
          Registry.events(s, dir).select($"event_type", $"value"),
          "event_type", "value")
          .orderBy($"group_a", $"group_b")
      },
      Some("""WITH st AS (
             |  SELECT event_type AS g, count(value) AS n,
             |         round(avg(CAST(value AS DOUBLE)), 6) AS m,
             |         round(var_samp(CAST(value AS DOUBLE)), 6) AS s2
             |  FROM events GROUP BY 1),
             |p AS (
             |  SELECT a.g AS group_a, b.g AS group_b,
             |         a.n AS na, b.n AS nb, a.m AS ma, b.m AS mb,
             |         a.s2 / a.n + b.s2 / b.n AS se2,
             |         a.s2 AS sa, b.s2 AS sb
             |  FROM st a JOIN st b ON a.g < b.g)
             |SELECT group_a, group_b, na, nb, ma, mb,
             |  round((ma - mb) / sqrt(se2), 4) AS t_stat,
             |  round((se2 * se2) /
             |    ((sa / na) * (sa / na) / (na - 1) +
             |     (sb / nb) * (sb / nb) / (nb - 1)), 2) AS df_welch
             |FROM p ORDER BY group_a, group_b""".stripMargin)),

    // robust (median/MAD) z-score per user — the outlier screen a wild
    // value cannot poison; exact medians both engines
    "q_robust_zscore" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.robustZscore(
          Registry.events(s, dir).filter($"event_type" === "purchase")
            .select($"user_id", $"event_id", $"value"),
          "user_id", "value")
          .select($"user_id", $"event_id", $"value",
            $"group_median", $"group_mad", $"robust_z")
          .orderBy($"user_id", $"event_id")
      },
      Some("""WITH p AS (
             |  SELECT user_id, event_id, value FROM events
             |  WHERE event_type = 'purchase'),
             |med AS (SELECT user_id,
             |          round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS m
             |        FROM p GROUP BY 1),
             |mad AS (SELECT p.user_id,
             |          round(quantile_cont(abs(CAST(p.value AS DOUBLE) - med.m), 0.5), 6) AS d
             |        FROM p JOIN med USING (user_id) GROUP BY 1)
             |SELECT p.user_id, p.event_id, p.value,
             |       med.m AS group_median, mad.d AS group_mad,
             |       CASE WHEN mad.d > 0 THEN
             |         round((CAST(p.value AS DOUBLE) - med.m) / (1.4826 * mad.d), 4)
             |       END AS robust_z
             |FROM p JOIN med USING (user_id) JOIN mad USING (user_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // binned mutual information between quantity and price — the
    // nonlinear-dependence screen; exact integer cell grid, ln terms
    // only at the 4×4 summary
    "q_mutual_info" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.mutualInformation(t(s, dir, "lineitem"),
            "l_quantity", "l_extendedprice", k = 4)
          .orderBy($"bx", $"by")
      },
      Some("""WITH base AS (
             |  SELECT CAST(l_quantity AS DOUBLE) AS x,
             |         CAST(l_extendedprice AS DOUBLE) AS y
             |  FROM lineitem),
             |bx AS (SELECT list_transform(quantile_cont(x, [0.25,0.5,0.75]),
             |         v -> round(v, 6)) AS b FROM base),
             |by AS (SELECT list_transform(quantile_cont(y, [0.25,0.5,0.75]),
             |         v -> round(v, 6)) AS b FROM base),
             |binned AS (
             |  SELECT CAST(len(list_filter(bx.b, v -> base.x >= v)) AS INT) AS bx,
             |         CAST(len(list_filter(by.b, v -> base.y >= v)) AS INT) AS by
             |  FROM base CROSS JOIN bx CROSS JOIN by),
             |cells AS (SELECT bx, by, count(*) AS nxy FROM binned GROUP BY 1, 2),
             |g AS (
             |  SELECT bx, by, nxy,
             |    sum(nxy) OVER (PARTITION BY bx) AS nx,
             |    sum(nxy) OVER (PARTITION BY by) AS ny,
             |    sum(nxy) OVER () AS n
             |  FROM cells),
             |c AS (SELECT bx, by, CAST(nxy AS BIGINT) AS nxy,
             |        round(nxy / n * ln(nxy * n / (nx * ny)), 6) AS mi_contrib
             |      FROM g)
             |SELECT bx, by, nxy, mi_contrib,
             |       round(sum(mi_contrib) OVER (), 6) AS mi
             |FROM c ORDER BY bx, by""".stripMargin)),

    // Gini + Lorenz deciles of customer spend concentration — the
    // inequality summary; exact discrete formulation, deterministic
    // tie-broken ranking
    "q_gini_spend" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "orders").groupBy($"o_custkey")
          .agg(sum($"o_totalprice").as("spend"))
        graft.pipeline.Profiling.giniLorenz(base, "o_custkey", "spend")
          .orderBy($"decile")
      },
      Some("""WITH base AS (
             |  SELECT o_custkey AS id, CAST(sum(o_totalprice) AS DOUBLE) AS v
             |  FROM orders GROUP BY 1),
             |r AS (
             |  SELECT id, v,
             |    row_number() OVER (ORDER BY v ASC, id ASC) AS i,
             |    sum(v) OVER (ORDER BY v ASC, id ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM base),
             |tot AS (SELECT count(*)::BIGINT AS n, sum(v) AS t,
             |               sum(i * v) AS iv FROM r),
             |g AS (SELECT round(2.0 * iv / (n * t) - (n + 1.0) / n, 6) AS gini
             |      FROM tot)
             |SELECT CAST(ceil(i * 10.0 / tot.n) AS INT) AS decile,
             |       round(max(i) / CAST(tot.n AS DOUBLE), 6) AS pop_share,
             |       round(max(cum) / tot.t, 6) AS value_share,
             |       g.gini
             |FROM r, tot, g
             |GROUP BY 1, tot.n, tot.t, g.gini ORDER BY decile""".stripMargin)),

    // ABC (Pareto) classification by descending cumulative value share:
    // A covers 80%, B to 95%, C the tail — running shares fold in one
    // deterministic order on both engines, so no rounding is needed on
    // the class boundary
    "q_abc_classification" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"spend".desc, $"o_custkey".asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val tot = org.apache.spark.sql.expressions.Window.partitionBy()
        t(s, dir, "orders").groupBy($"o_custkey")
          .agg(sum($"o_totalprice").as("spend"))
          .withColumn("cumshare", sum($"spend").over(w) / sum($"spend").over(tot))
          .withColumn("abc_class",
            when($"cumshare" <= 0.8, "A").when($"cumshare" <= 0.95, "B")
              .otherwise("C"))
          .groupBy($"abc_class")
          .agg(count(lit(1)).as("n_customers"),
            round(sum($"spend"), 2).as("class_spend"),
            round(max($"cumshare"), 6).as("cum_share_max"))
          .orderBy($"abc_class")
      },
      Some("""WITH base AS (
             |  SELECT o_custkey, CAST(sum(o_totalprice) AS DOUBLE) AS spend
             |  FROM orders GROUP BY 1),
             |c AS (
             |  SELECT o_custkey, spend,
             |    sum(spend) OVER (ORDER BY spend DESC, o_custkey ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      / sum(spend) OVER () AS cumshare
             |  FROM base),
             |k AS (SELECT *, CASE WHEN cumshare <= 0.8 THEN 'A'
             |                     WHEN cumshare <= 0.95 THEN 'B'
             |                     ELSE 'C' END AS abc_class FROM c)
             |SELECT abc_class, count(*) AS n_customers,
             |       round(sum(spend), 2) AS class_spend,
             |       round(max(cumshare), 6) AS cum_share_max
             |FROM k GROUP BY 1 ORDER BY abc_class""".stripMargin)),

    // RFM customer segmentation: recency/frequency/monetary quintiles
    // via three exact-percentile binnings (quantileBin composed), the
    // recency score inverted so fresher = higher
    "q_rfm_segments" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val orders = t(s, dir, "orders")
        val horizon = orders.agg(max($"o_orderdate".cast("date")).as("h"))
        val base = orders.groupBy($"o_custkey")
          .agg(max($"o_orderdate".cast("date")).as("last_day"),
            count(lit(1)).as("frequency"),
            round(sum($"o_totalprice"), 2).as("monetary"))
          .crossJoin(broadcast(horizon))
          .select($"o_custkey", datediff($"h", $"last_day").as("recency"),
            $"frequency".cast("double").as("frequency"), $"monetary")
        val r = graft.pipeline.Profiling.quantileBin(base, "recency", 5)
          .withColumnRenamed("bucket", "rb")
        val f = graft.pipeline.Profiling.quantileBin(r, "frequency", 5)
          .withColumnRenamed("bucket", "fb")
        val m = graft.pipeline.Profiling.quantileBin(f, "monetary", 5)
          .withColumnRenamed("bucket", "mb")
        m.select($"o_custkey",
            (lit(5) - $"rb").as("r_score"),
            ($"fb" + 1).as("f_score"),
            ($"mb" + 1).as("m_score"))
          .withColumn("segment", concat($"r_score", $"f_score", $"m_score"))
          .orderBy($"o_custkey")
      },
      Some("""WITH h AS (SELECT CAST(max(o_orderdate) AS DATE) AS h FROM orders),
             |base AS (
             |  SELECT o_custkey,
             |    h.h - CAST(max(o_orderdate) AS DATE) AS recency,
             |    CAST(count(*) AS DOUBLE) AS frequency,
             |    round(sum(o_totalprice), 2) AS monetary
             |  FROM orders, h GROUP BY o_custkey, h.h),
             |b AS (
             |  SELECT
             |    list_transform(quantile_cont(CAST(recency AS DOUBLE),
             |      [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS rbounds,
             |    list_transform(quantile_cont(frequency,
             |      [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS fbounds,
             |    list_transform(quantile_cont(CAST(monetary AS DOUBLE),
             |      [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS mbounds
             |  FROM base),
             |sc AS (
             |  SELECT o_custkey,
             |    5 - CAST(len(list_filter(b.rbounds,
             |      x -> CAST(recency AS DOUBLE) >= x)) AS INT) AS r_score,
             |    CAST(len(list_filter(b.fbounds,
             |      x -> frequency >= x)) AS INT) + 1 AS f_score,
             |    CAST(len(list_filter(b.mbounds,
             |      x -> CAST(monetary AS DOUBLE) >= x)) AS INT) + 1 AS m_score
             |  FROM base CROSS JOIN b)
             |SELECT o_custkey, r_score, f_score, m_score,
             |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
             |    CAST(m_score AS VARCHAR) AS segment
             |FROM sc ORDER BY o_custkey""".stripMargin)),

    // per-group mean imputation preserving row count; summarized per
    // user so the output is key-sized
    "q_impute" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = Registry.events(s, dir)
          .filter($"event_type" === "purchase")
          .select($"user_id", $"event_id",
            when($"event_id" % 7 === 0, lit(null)).otherwise($"value")
              .as("value"))
        graft.pipeline.Profiling.imputeByGroup(planted, "user_id", "value",
            strategy = "mean")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n"),
            sum($"imputed".cast("long")).as("n_imputed"),
            // the raw values are exact 2dp decimals, so a plain
            // round(avg, 4) lands on EXACT half boundaries where the
            // engines' last-ulp sums disagree (seen at sf0.1) — sum as
            // exact DECIMAL instead: identical rational → identical
            // double → identical round on both engines
            // +1e-9 boundary dodge: 2dp-rational means land EXACTLY on
            // x.xxxx5, where Spark's BigDecimal and DuckDB's multiply-
            // based round disagree; the nudge is far below the 1/(100n)
            // spacing of possible means, so only exact ties move — and
            // they move the same way on both engines
            round(sum($"value".cast("decimal(20,6)")).cast("double") /
              count(lit(1)) + lit(1e-9), 4).as("mean_filled"))
          .orderBy($"user_id")
      },
      Some("""WITH planted AS (
             |  SELECT user_id, event_id,
             |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
             |  FROM events WHERE event_type = 'purchase'),
             |fills AS (SELECT user_id, round(avg(value), 6) AS fill
             |          FROM planted GROUP BY user_id),
             |filled AS (
             |  SELECT p.user_id,
             |    p.value IS NULL AND f.fill IS NOT NULL AS imputed,
             |    coalesce(p.value, f.fill) AS value
             |  FROM planted p JOIN fills f USING (user_id))
             |SELECT user_id, count(*) AS n,
             |  CAST(sum(CASE WHEN imputed THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
             |  round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
             |    / count(*) + 0.000000001, 4) AS mean_filled
             |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // two-sample log-rank test over the same conversion-lag subjects as
    // q_kaplan_meier, split by user-id parity: exact at-risk integers on
    // the pooled time grid, 10dp-anchored hypergeometric E/V terms summed
    // as exact decimals — the curve-difference test beside the KM curve
    "q_log_rank" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        val horizon = ev.agg(max(to_date($"ts")).as("h"))
        val subj = ev.groupBy($"user_id")
          .agg(min(to_date($"ts")).as("first_day"),
            min(when($"event_type" === "purchase", to_date($"ts"))).as("conv_day"))
          .crossJoin(broadcast(horizon))
          .select(($"user_id" % 2).cast("string").as("grp"),
            when($"conv_day".isNotNull, datediff($"conv_day", $"first_day"))
              .otherwise(datediff($"h", $"first_day")).as("dur"),
            $"conv_day".isNotNull.as("ev"))
        graft.pipeline.Profiling.logRank(subj, "grp", "dur", "ev")
      },
      Some("""WITH h AS (SELECT CAST(max(date_trunc('day', ts)) AS DATE) AS h FROM events),
             |subj AS (
             |  SELECT CAST(user_id % 2 AS VARCHAR) AS g,
             |         CAST(CASE WHEN conv_day IS NOT NULL
             |              THEN conv_day - first_day
             |              ELSE h.h - first_day END AS BIGINT) AS t,
             |         conv_day IS NOT NULL AS ev
             |  FROM (
             |    SELECT user_id,
             |      CAST(min(date_trunc('day', ts)) AS DATE) AS first_day,
             |      CAST(min(CASE WHEN event_type = 'purchase'
             |                    THEN date_trunc('day', ts) END) AS DATE) AS conv_day
             |    FROM events GROUP BY user_id), h),
             |gg AS (SELECT g, t, sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
             |              count(*) AS obs
             |       FROM subj GROUP BY 1, 2),
             |ar AS (
             |  SELECT gr.g, s.t, coalesce(gg.d, 0) AS d, coalesce(gg.obs, 0) AS obs
             |  FROM (SELECT DISTINCT t FROM gg) s
             |  CROSS JOIN (SELECT DISTINCT g FROM gg) gr
             |  LEFT JOIN gg ON gg.g = gr.g AND gg.t = s.t),
             |tot AS (SELECT g, count(*) AS n_g FROM subj GROUP BY 1),
             |na AS (
             |  SELECT cu.g, cu.t, cu.d, tot.n_g - cu.cumb AS nat FROM (
             |    SELECT g, t, d,
             |      coalesce(sum(obs) OVER (PARTITION BY g ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
             |    FROM ar) cu JOIN tot ON tot.g = cu.g),
             |tm AS (
             |  SELECT a.t, a.d AS d1, a.nat AS na1, b.d AS d2, b.nat AS na2,
             |         a.d + b.d AS dt, a.nat + b.nat AS nt
             |  FROM na a JOIN na b ON a.t = b.t AND a.g = '0' AND b.g = '1'
             |  WHERE a.d + b.d > 0),
             |te AS (
             |  SELECT d1, d2,
             |    round(CAST(dt AS DOUBLE) * na1 / nt, 10) AS e1,
             |    round(CASE WHEN nt > 1
             |          THEN CAST(dt AS DOUBLE) * (CAST(na1 AS DOUBLE) / nt)
             |               * (CAST(na2 AS DOUBLE) / nt) * (nt - dt) / (nt - 1)
             |          ELSE 0 END, 10) AS v
             |  FROM tm),
             |ag AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
             |              CAST(sum(d2) AS BIGINT) AS o2,
             |              sum(CAST(round(e1 * 1e10) AS DECIMAL(38, 0))) AS e110,
             |              sum(CAST(round(v * 1e10) AS DECIMAL(38, 0))) AS v10
             |       FROM te),
             |fin AS (SELECT o1, o2, CAST(e110 AS DOUBLE) / 1e10 AS e1,
             |               CAST(v10 AS DOUBLE) / 1e10 AS vs FROM ag)
             |SELECT '0' AS group_1, '1' AS group_2,
             |  (SELECT count(*) FROM subj WHERE g = '0') AS n_1,
             |  (SELECT count(*) FROM subj WHERE g = '1') AS n_2,
             |  o1 AS events_1, o2 AS events_2,
             |  round(o1 - e1, 6) AS o_minus_e, round(vs, 6) AS var_sum,
             |  CASE WHEN vs > 0 THEN round((o1 - e1) / sqrt(vs), 4) ELSE 0 END AS z,
             |  CASE WHEN vs > 0 THEN round((o1 - e1) * (o1 - e1) / vs, 4)
             |       ELSE 0 END AS chi2
             |FROM fin""".stripMargin)),

    // Kaplan-Meier conversion-lag curve: per user, days from first
    // event to first purchase, right-censored at the corpus horizon;
    // survival = exp(sum ln) running product over the day grid
    "q_kaplan_meier" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ev = Registry.events(s, dir)
        val horizon = ev.agg(max(to_date($"ts")).as("h"))
        val subj = ev.groupBy($"user_id")
          .agg(min(to_date($"ts")).as("first_day"),
            min(when($"event_type" === "purchase", to_date($"ts"))).as("conv_day"))
          .crossJoin(broadcast(horizon))
          .select(
            when($"conv_day".isNotNull, datediff($"conv_day", $"first_day"))
              .otherwise(datediff($"h", $"first_day")).as("dur"),
            $"conv_day".isNotNull.as("ev"))
        graft.pipeline.Profiling.kaplanMeier(subj, "dur", "ev")
          .orderBy($"t")
      },
      Some("""WITH h AS (SELECT CAST(max(date_trunc('day', ts)) AS DATE) AS h FROM events),
             |subj AS (
             |  SELECT CASE WHEN conv_day IS NOT NULL
             |              THEN conv_day - first_day
             |              ELSE h.h - first_day END AS dur,
             |         conv_day IS NOT NULL AS ev
             |  FROM (
             |    SELECT user_id,
             |      CAST(min(date_trunc('day', ts)) AS DATE) AS first_day,
             |      CAST(min(CASE WHEN event_type = 'purchase'
             |                    THEN date_trunc('day', ts) END) AS DATE) AS conv_day
             |    FROM events GROUP BY user_id), h),
             |grid AS (
             |  SELECT CAST(dur AS BIGINT) AS t,
             |         sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
             |         sum(CASE WHEN ev THEN 0 ELSE 1 END) AS c
             |  FROM subj GROUP BY 1),
             |k AS (
             |  SELECT t, d, c,
             |    sum(d + c) OVER () - coalesce(sum(d + c) OVER (
             |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS n_at_risk
             |  FROM grid),
             |s AS (
             |  SELECT t, d, c, n_at_risk,
             |    round(exp(sum(CASE WHEN 1.0 - CAST(d AS DOUBLE) / n_at_risk > 0
             |      THEN ln(1.0 - CAST(d AS DOUBLE) / n_at_risk)
             |      ELSE -1e9 END) OVER (
             |        ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
             |      AS survival
             |  FROM k)
             |SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk,
             |       CAST(d AS BIGINT) AS n_events,
             |       CAST(c AS BIGINT) AS n_censored, survival
             |FROM s WHERE d > 0 ORDER BY t""".stripMargin)),

    // Benford first-digit screen: integer-cents stringified digit (no
    // float log10 boundary risk), per-digit chi-square contributions
    "q_benford" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.benfordScreen(t(s, dir, "lineitem"),
            "l_extendedprice")
          .orderBy($"digit")
      },
      Some("""WITH d AS (
             |  SELECT CAST(substr(CAST(CAST(round(CAST(l_extendedprice AS DOUBLE) * 100)
             |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM lineitem
             |  WHERE CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) >= 1),
             |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
             |p AS (SELECT digit, n,
             |        round(n / sum(n) OVER (), 6) AS observed_p,
             |        round(log10(1.0 + 1.0 / digit), 6) AS benford_p
             |      FROM g)
             |SELECT digit, n, observed_p, benford_p,
             |  round((observed_p - benford_p) * (observed_p - benford_p)
             |    / benford_p, 6) AS chi_contrib
             |FROM p ORDER BY digit""".stripMargin)),

    // order-independent multiset fingerprint (exact decimal hash sum) —
    // the data-contract checksum for cross-copy diffing
    "q_table_fingerprint" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
          .withColumn("price_str",
            $"o_totalprice".cast("decimal(12,2)").cast("string"))
          .withColumn("date_str", $"o_orderdate".cast("date").cast("string"))
        graft.pipeline.Profiling.tableFingerprint(o,
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
            "date_str", "price_str"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(CAST(('0x' || substr(md5(
             |    CAST(o_orderkey AS VARCHAR) || '|' ||
             |    CAST(o_custkey AS VARCHAR) || '|' ||
             |    o_orderstatus || '|' || o_orderpriority || '|' ||
             |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' ||
             |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)), 1, 15))
             |    AS BIGINT) AS DECIMAL(38,0))) % 2305843009213693951
             |    AS BIGINT) AS hash_sum
             |FROM orders""".stripMargin)),

    // two-component 1-D Gaussian mixture via EM: percentile init, one
    // aggregate pass per iteration, 6dp parameter anchors; the oracle
    // unrolls all 8 EM steps as MATERIALIZED CTEs
    "q_gmm1d" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.gmm1d(
          Registry.events(s, dir).filter($"event_type" === "purchase")
            .select($"value"), "value", iterations = 8)
          .orderBy($"comp")
      },
      Some(graft.pipeline.Profiling.gmm1dOracleSql(
        "SELECT CAST(value AS DOUBLE) AS v FROM events WHERE event_type = 'purchase'",
        iterations = 8))),

    // Poisson-bootstrap CI for the mean: 32 md5-deterministic
    // Poisson(1)-weighted replicates, percentile interval — the
    // shardable bootstrap, draws and inverse CDF replayed bit-for-bit
    "q_bootstrap_ci" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select(concat($"l_orderkey".cast("string"), lit("_"),
            $"l_linenumber".cast("string")).as("rid"), $"l_extendedprice")
        graft.pipeline.Profiling.bootstrapMeanCi(li, "rid", "l_extendedprice",
          replicates = 32, alpha = 0.05)
      },
      Some("""WITH base AS (
             |  SELECT CAST(l_orderkey AS VARCHAR) || '_' ||
             |         CAST(l_linenumber AS VARCHAR) AS rid,
             |         CAST(l_extendedprice AS DOUBLE) AS v
             |  FROM lineitem),
             |drawn AS (
             |  SELECT v, b,
             |    CAST(('0x' || substr(md5(rid || ':' || CAST(b AS VARCHAR)), 1, 15))
             |      AS BIGINT) / 1152921504606846976.0 AS u
             |  FROM base CROSS JOIN (SELECT CAST(unnest(range(1, 33)) AS INT) AS b)),
             |weighted AS (
             |  SELECT b, v,
             |    CASE WHEN u < 0.367879441 THEN 0
             |         WHEN u < 0.735758882 THEN 1
             |         WHEN u < 0.919698603 THEN 2
             |         WHEN u < 0.981011843 THEN 3
             |         WHEN u < 0.996340153 THEN 4
             |         WHEN u < 0.999405815 THEN 5
             |         WHEN u < 0.999916758 THEN 6
             |         ELSE 7 END AS w
             |  FROM drawn),
             |reps AS (
             |  SELECT b, round(sum(w * v) / sum(w), 4) AS rep_mean
             |  FROM weighted GROUP BY b),
             |point AS (SELECT count(v) AS n, round(avg(v), 4) AS mean FROM base)
             |SELECT point.n, point.mean,
             |  round(quantile_cont(rep_mean, 0.025), 4) AS ci_lo,
             |  round(quantile_cont(rep_mean, 0.975), 4) AS ci_hi,
             |  round(stddev_samp(rep_mean), 4) AS boot_se
             |FROM reps, point GROUP BY point.n, point.mean""".stripMargin)),

    // equal-frequency quantile binning (feature bucketizer): 10 buckets
    // bounded at exact 6dp-rounded percentiles, summarized per bucket
    "q_quantile_bin" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.quantileBin(t(s, dir, "lineitem"),
            "l_extendedprice", k = 10)
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
            round(min($"l_extendedprice"), 4).as("lo"),
            round(max($"l_extendedprice"), 4).as("hi"))
          .orderBy($"bucket")
      },
      Some("""WITH b AS (
             |  SELECT list_transform(quantile_cont(CAST(l_extendedprice AS DOUBLE),
             |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]), x -> round(x, 6)) AS bounds
             |  FROM lineitem)
             |SELECT CAST(len(list_filter(b.bounds,
             |         x -> CAST(l.l_extendedprice AS DOUBLE) >= x)) AS INT) AS bucket,
             |       count(*) AS n,
             |       round(min(l_extendedprice), 4) AS lo,
             |       round(max(l_extendedprice), 4) AS hi
             |FROM lineitem l CROSS JOIN b
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // chi-square independence screen over two categorical columns; the
    // full cell grid (zero-observed cells included) is replayed in SQL
    "q_chi_square" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.chiSquareTest(t(s, dir, "lineitem"),
          "l_returnflag", "l_linestatus")
      },
      Some("""WITH obs AS (
             |  SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS o
             |  FROM lineitem GROUP BY 1, 2),
             |ra AS (SELECT a, sum(o) AS rowT FROM obs GROUP BY a),
             |cb AS (SELECT b, sum(o) AS colT FROM obs GROUP BY b),
             |grid AS (
             |  SELECT ra.a, cb.b, ra.rowT, cb.colT, coalesce(obs.o, 0) AS o
             |  FROM ra CROSS JOIN cb
             |  LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b),
             |tot AS (SELECT sum(o) AS n FROM grid)
             |SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2,
             |       (count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS dof,
             |       CAST(first(n) AS BIGINT) AS n, count(*) AS n_cells
             |FROM (SELECT g.*, tot.n, g.rowT * g.colT / CAST(tot.n AS DOUBLE) AS e
             |      FROM grid g CROSS JOIN tot)""".stripMargin)),

    // exact weighted median (first value whose running weight crosses
    // half the total) — integer weights, so the threshold is exact in
    // both engines and the picked value compares bit-for-bit
    "q_weighted_median" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.weightedMedian(t(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice", "l_quantity")
          .orderBy($"l_returnflag")
      },
      Some("""WITH w AS (
             |  SELECT l_returnflag AS k, CAST(l_extendedprice AS DOUBLE) AS v,
             |         CAST(l_quantity AS DOUBLE) AS wt
             |  FROM lineitem),
             |c AS (
             |  SELECT k, v,
             |    sum(wt) OVER (PARTITION BY k ORDER BY v
             |                  ROWS UNBOUNDED PRECEDING) AS cumw,
             |    sum(wt) OVER (PARTITION BY k) AS total
             |  FROM w)
             |SELECT k AS l_returnflag, min(v) AS weighted_median
             |FROM c WHERE cumw >= total / 2
             |GROUP BY k ORDER BY l_returnflag""".stripMargin)),

    // per-group OLS from one keyed aggregate (regr_* are algebraic with
    // map-side partials in both engines)
    "q_ols_by_group" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.olsByGroup(t(s, dir, "lineitem"),
          "l_returnflag", "l_quantity", "l_extendedprice")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  regr_count(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) AS n,
             |  round(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS slope,
             |  round(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS intercept,
             |  round(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS r2
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Bloom membership pre-filter: bitmap built over every doc id, probed
    // with 10 present + 10 absent keys; build AND probe replayed in SQL
    // (false positives, if any, are deterministic and match exactly)
    "q_bloom_membership" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val bloom = Sketches.bloomBuild(docs, "doc_id")
        Sketches.bloomMightContain(bloom, bloomProbes(s, docs), "k").orderBy($"key")
      },
      Some(Sketches.bloomOracleSql(
        "SELECT CAST(doc_id AS VARCHAR) AS key FROM documents",
        bloomProbeSql) + "\nORDER BY key")),

    // count-min grids merge by cell-wise SUM (exact): three event slices
    // sketched independently, grids round-tripped through parquet,
    // merged, probed — equals the single-pass grid, so the direct replay
    // oracle applies
    "q_cm_sketch_merge" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val keyed = Registry.events(s, dir)
          .select($"event_id", $"user_id".cast("string").as("key"))
        val base = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"),
          s"graft_cm_sketches_${ProcessHandle.current().pid()}_${tmpRuns.incrementAndGet()}")
        val grids = (0 until 3).map { i =>
          val p = base.resolve(s"slice_$i").toString
          Sketches.cmSketch(keyed.filter($"event_id" % 3 === i), "key")
            .write.mode("overwrite").parquet(p)
          s.read.parquet(p)
        }
        Sketches.cmProbe(Sketches.cmMerge(grids), keyed, "key")
          .select($"key".cast("long").as("user_id"), $"cm_estimate")
          .orderBy($"user_id")
      },
      Some(s"""SELECT CAST(key AS BIGINT) AS user_id, cm_estimate
              |FROM (${Sketches.cmOracleSql(
                  "SELECT CAST(user_id AS VARCHAR) AS key FROM events")})
              |ORDER BY user_id""".stripMargin)),

    // Bloom bitmaps merge by word-wise OR (set union of inserted keys):
    // three doc-id slices built independently, merged, probed against
    // present + absent keys — identical to the single-build bitmap
    "q_bloom_merge" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val blooms = (0 until 3).map(i =>
          Sketches.bloomBuild(docs.filter($"doc_id" % 3 === i), "doc_id"))
        Sketches.bloomMightContain(Sketches.bloomMerge(blooms),
            bloomProbes(s, docs), "k")
          .orderBy($"key")
      },
      Some(Sketches.bloomOracleSql(
        "SELECT CAST(doc_id AS VARCHAR) AS key FROM documents",
        bloomProbeSql) + "\nORDER BY key")),

    // fixed-width histogram with clamp semantics (counts always sum to the
    // non-null rows); tiny key space → map-side partials collapse everything
    "q_value_histogram" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.pipeline.Profiling.histogram(t(s, dir, "lineitem"),
          "l_quantity", nBins = 10, lo = 1.0, hi = 51.0)
          .orderBy($"bin")
      },
      Some("""SELECT bin, round(bin * 5.0 + 1.0, 6) AS bin_lo,
             |       round(bin * 5.0 + 6.0, 6) AS bin_hi, count(*) AS n
             |FROM (
             |  SELECT CAST(least(greatest(floor((CAST(l_quantity AS DOUBLE) - 1.0) / 5.0), 0), 9) AS INT) AS bin
             |  FROM lineitem WHERE l_quantity IS NOT NULL)
             |GROUP BY bin ORDER BY bin""".stripMargin)),

    // declarative data-quality gates in one pass: four row-level rules
    // (one planted to FAIL so violation counting is exercised), key
    // uniqueness, and referential integrity — the pre-training ingest
    // checklist
    "q_data_expectations" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.Expectations
        import graft.pipeline.Expectations.Rule
        val li = t(s, dir, "lineitem")
        Expectations.check(li, Seq(
            Rule("flag_valid", $"l_returnflag".isin("A", "N", "R")),
            Rule("price_positive", $"l_extendedprice" > 0),
            Rule("qty_max_10", $"l_quantity" <= 10), // planted: must fail
            Rule("qty_range", $"l_quantity".between(1, 50))))
          .unionByName(Expectations.checkUnique(li, "unique_order_line",
            Seq("l_orderkey", "l_linenumber")))
          .unionByName(Expectations.checkForeignKey(li, "fk_orderkey",
            "l_orderkey", t(s, dir, "orders"), "o_orderkey"))
          .orderBy($"rule")
      },
      Some("""WITH rowchecks AS (
             |  SELECT
             |    sum(CASE WHEN NOT coalesce(l_returnflag IN ('A', 'N', 'R'), false) THEN 1 ELSE 0 END)::BIGINT AS flag_valid,
             |    sum(CASE WHEN NOT coalesce(l_extendedprice > 0, false) THEN 1 ELSE 0 END)::BIGINT AS price_positive,
             |    sum(CASE WHEN NOT coalesce(l_quantity <= 10, false) THEN 1 ELSE 0 END)::BIGINT AS qty_max_10,
             |    sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, false) THEN 1 ELSE 0 END)::BIGINT AS qty_range
             |  FROM lineitem),
             |uniq AS (
             |  SELECT coalesce(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0)::BIGINT AS v
             |  FROM (SELECT count(*) AS cnt FROM lineitem
             |        GROUP BY l_orderkey, l_linenumber)),
             |fk AS (
             |  SELECT count(*)::BIGINT AS v FROM lineitem l
             |  ANTI JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |    ON l.l_orderkey = o.o_orderkey)
             |SELECT rule, violations, violations = 0 AS pass FROM (
             |  SELECT 'flag_valid' AS rule, flag_valid AS violations FROM rowchecks
             |  UNION ALL SELECT 'price_positive', price_positive FROM rowchecks
             |  UNION ALL SELECT 'qty_max_10', qty_max_10 FROM rowchecks
             |  UNION ALL SELECT 'qty_range', qty_range FROM rowchecks
             |  UNION ALL SELECT 'unique_order_line', v FROM uniq
             |  UNION ALL SELECT 'fk_orderkey', v FROM fk)
             |ORDER BY rule""".stripMargin)),

    // PSI drift between the 1995 and 1996 order-value distributions —
    // per-bin contributions (eps-floored, the standard ±∞ guard) so the
    // drifted region is visible, not just the scalar
    "q_drift_psi" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val orders = t(s, dir, "orders")
        graft.pipeline.Profiling.psiDrift(
          orders.filter(year($"o_orderdate") === 1995),
          orders.filter(year($"o_orderdate") === 1996),
          "o_totalprice", nBins = 10, lo = 0.0, hi = 500000.0)
      },
      Some("""WITH bc AS (
             |  SELECT CAST(least(greatest(floor(CAST(o_totalprice AS DOUBLE) / 50000.0), 0), 9) AS INT) AS bin,
             |         count(*)::BIGINT AS nb
             |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
             |cc AS (
             |  SELECT CAST(least(greatest(floor(CAST(o_totalprice AS DOUBLE) / 50000.0), 0), 9) AS INT) AS bin,
             |         count(*)::BIGINT AS nc
             |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
             |bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
             |tot AS (SELECT (SELECT sum(nb) FROM bc)::BIGINT AS tb,
             |               (SELECT sum(nc) FROM cc)::BIGINT AS tc),
             |j AS (SELECT bin, coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
             |      FROM bins LEFT JOIN bc USING (bin) LEFT JOIN cc USING (bin))
             |SELECT bin, nb, nc,
             |  round((greatest(CAST(nb AS DOUBLE) / tb, 1.0e-4)
             |         - greatest(CAST(nc AS DOUBLE) / tc, 1.0e-4))
             |    * ln(greatest(CAST(nb AS DOUBLE) / tb, 1.0e-4)
             |         / greatest(CAST(nc AS DOUBLE) / tc, 1.0e-4)), 6) AS psi_contrib
             |FROM j, tot ORDER BY bin""".stripMargin)))
}
