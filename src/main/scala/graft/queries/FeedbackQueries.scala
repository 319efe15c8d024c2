package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Human-feedback and evaluation-data operators: inter-annotator agreement,
 * noisy-label aggregation, pairwise-preference fitting, and reference-based
 * text evaluation — the data-QA surface an RLHF / eval-set pipeline needs
 * on top of the curation families.
 */
object FeedbackQueries {

  /** Within-order lineitem pairs as brand-vs-brand preference trials:
    * the pricier line's brand "wins" (price ties to the lexicographically
    * smaller brand), same-brand pairs dropped. One row per comparison
    * with winner/loser brand — the shared fixture for the preference
    * family. */
  private[graft] def brandComparisons(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Registry.t(s, dir, "lineitem")
      .join(Registry.t(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"p_brand")
    li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_linenumber" < $"b.l_linenumber")
      .filter($"a.p_brand" =!= $"b.p_brand")
      .select(
        when($"a.l_extendedprice" > $"b.l_extendedprice", $"a.p_brand")
          .when($"b.l_extendedprice" > $"a.l_extendedprice", $"b.p_brand")
          .when($"a.p_brand" < $"b.p_brand", $"a.p_brand")
          .otherwise($"b.p_brand").as("w"),
        when($"a.l_extendedprice" > $"b.l_extendedprice", $"b.p_brand")
          .when($"b.l_extendedprice" > $"a.l_extendedprice", $"a.p_brand")
          .when($"a.p_brand" < $"b.p_brand", $"b.p_brand")
          .otherwise($"a.p_brand").as("l"))
  }

  /** The shared comparison fixture as oracle SQL (ends with a `wins` CTE). */
  private val winsSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice, p_brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |cmp AS (
      |  SELECT
      |    CASE WHEN a.l_extendedprice > b.l_extendedprice THEN a.p_brand
      |         WHEN b.l_extendedprice > a.l_extendedprice THEN b.p_brand
      |         WHEN a.p_brand < b.p_brand THEN a.p_brand ELSE b.p_brand END AS w,
      |    CASE WHEN a.l_extendedprice > b.l_extendedprice THEN b.p_brand
      |         WHEN b.l_extendedprice > a.l_extendedprice THEN a.p_brand
      |         WHEN a.p_brand < b.p_brand THEN b.p_brand ELSE a.p_brand END AS l
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
      |  WHERE a.p_brand <> b.p_brand),
      |wins AS MATERIALIZED (SELECT w AS i, l AS j, count(*) AS wij
      |                      FROM cmp GROUP BY 1, 2)""".stripMargin

  /** [[brandComparisons]] plus a rating period (the order YEAR): both
    * lines of a pair share the order, so the pair's period is
    * well-defined. The fixture for the period-batched Elo row. */
  private[graft] def brandComparisonsDated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Registry.t(s, dir, "lineitem")
      .join(Registry.t(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"p_brand")
    li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_linenumber" < $"b.l_linenumber")
      .filter($"a.p_brand" =!= $"b.p_brand")
      .join(Registry.t(s, dir, "orders"), $"a.l_orderkey" === $"o_orderkey")
      .select(
        when($"a.l_extendedprice" > $"b.l_extendedprice", $"a.p_brand")
          .when($"b.l_extendedprice" > $"a.l_extendedprice", $"b.p_brand")
          .when($"a.p_brand" < $"b.p_brand", $"a.p_brand")
          .otherwise($"b.p_brand").as("w"),
        when($"a.l_extendedprice" > $"b.l_extendedprice", $"b.p_brand")
          .when($"b.l_extendedprice" > $"a.l_extendedprice", $"a.p_brand")
          .when($"a.p_brand" < $"b.p_brand", $"b.p_brand")
          .otherwise($"a.p_brand").as("l"),
        year($"o_orderdate").cast("string").as("period"))
  }

  /** The synthetic orders table spans 1995–2001 at every SF — the static
    * period grid the Elo replay unrolls over (an absent year is a no-op
    * on both engines; a year OUTSIDE the grid refuses the fit loudly). */
  private val eloPeriods: Seq[String] = (1995 to 2001).map(_.toString)

  /** Unrolled per-period Elo replay (mirrors
    * [[graft.pipeline.Preference.eloRatings]] handoff-for-handoff:
    * expected scores at 10dp against period-start ratings, per-pair delta
    * terms summed as exact DECIMALs so order can't matter, the K-scaled
    * update re-anchored at 10dp). */
  private def eloSql(kFactor: Double, init: Double): String = {
    val sb = new StringBuilder(
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |cmp AS (
        |  SELECT CAST(year(o.o_orderdate) AS VARCHAR) AS p,
        |    CASE WHEN a.l_extendedprice > b.l_extendedprice THEN a.p_brand
        |         WHEN b.l_extendedprice > a.l_extendedprice THEN b.p_brand
        |         WHEN a.p_brand < b.p_brand THEN a.p_brand ELSE b.p_brand END AS w,
        |    CASE WHEN a.l_extendedprice > b.l_extendedprice THEN b.p_brand
        |         WHEN b.l_extendedprice > a.l_extendedprice THEN a.p_brand
        |         WHEN a.p_brand < b.p_brand THEN b.p_brand ELSE a.p_brand END AS l
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
        |  JOIN orders o ON o.o_orderkey = a.l_orderkey
        |  WHERE a.p_brand <> b.p_brand),
        |pw AS MATERIALIZED (SELECT p, w AS i, l AS j, count(*) AS c
        |                    FROM cmp GROUP BY 1, 2, 3),
        |items AS MATERIALIZED (SELECT DISTINCT i FROM
        |  (SELECT i FROM pw UNION ALL SELECT j AS i FROM pw)),
        |g AS MATERIALIZED (SELECT item, CAST(sum(c) AS BIGINT) AS games FROM
        |  (SELECT i AS item, c FROM pw UNION ALL SELECT j AS item, c FROM pw)
        |  GROUP BY 1),""".stripMargin)
    sb.append(s"""
      |r0 AS MATERIALIZED (SELECT i AS item, round($init, 10) AS r FROM items)""".stripMargin)
    eloPeriods.zipWithIndex.foreach { case (p, k0) =>
      val k = k0 + 1
      sb.append(s""",
        |d$k AS MATERIALIZED (
        |  SELECT item, sum(CAST(term AS DECIMAL(28, 10))) AS d FROM (
        |    SELECT pw.i AS item, round(pw.c *
        |        (1 - round(1 / (1 + pow(10, (rj.r - ri.r) / 400.0)), 10)), 10) AS term
        |    FROM pw JOIN r${k - 1} ri ON ri.item = pw.i
        |            JOIN r${k - 1} rj ON rj.item = pw.j
        |    WHERE pw.p = '$p'
        |    UNION ALL
        |    SELECT pw.j AS item, round(pw.c *
        |        (0 - round(1 / (1 + pow(10, (ri.r - rj.r) / 400.0)), 10)), 10) AS term
        |    FROM pw JOIN r${k - 1} ri ON ri.item = pw.i
        |            JOIN r${k - 1} rj ON rj.item = pw.j
        |    WHERE pw.p = '$p') GROUP BY 1),
        |r$k AS MATERIALIZED (
        |  SELECT r.item, round(r.r +
        |      round($kFactor * coalesce(CAST(d.d AS DOUBLE), 0), 10), 10) AS r
        |  FROM r${k - 1} r LEFT JOIN d$k d ON d.item = r.item)""".stripMargin)
    }
    sb.append(s"""
      |SELECT r.item, round(r.r, 6) AS rating, g.games,
      |  CAST(row_number() OVER (ORDER BY round(r.r, 6) DESC, r.item) AS INT) AS rank
      |FROM r${eloPeriods.size} r JOIN g ON g.item = r.item ORDER BY rank""".stripMargin)
    sb.toString
  }

  /** Unrolled per-period Glicko-1 replay (mirrors
    * [[graft.pipeline.Preference.glickoRatings]] handoff-for-handoff:
    * RD drift at 10dp, g and E at 10dp against period-start opponent
    * params, d² terms at 12dp / delta terms at 10dp summed as exact
    * DECIMALs, the denominator re-anchored at 12dp, outputs at 10dp).
    * `q` is written as ln(10)/400 in BOTH engines so they share the
    * double; c² and RD₀ are interpolated as round-tripping literals. */
  private def glickoSql(c: Double, init: Double, initRd: Double): String = {
    val q = "(ln(10) / 400)"
    val q2 = s"($q * $q)"
    val c2 = c * c
    val sb = new StringBuilder(
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |cmp AS (
        |  SELECT CAST(year(o.o_orderdate) AS VARCHAR) AS p,
        |    CASE WHEN a.l_extendedprice > b.l_extendedprice THEN a.p_brand
        |         WHEN b.l_extendedprice > a.l_extendedprice THEN b.p_brand
        |         WHEN a.p_brand < b.p_brand THEN a.p_brand ELSE b.p_brand END AS w,
        |    CASE WHEN a.l_extendedprice > b.l_extendedprice THEN b.p_brand
        |         WHEN b.l_extendedprice > a.l_extendedprice THEN a.p_brand
        |         WHEN a.p_brand < b.p_brand THEN b.p_brand ELSE a.p_brand END AS l
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
        |  JOIN orders o ON o.o_orderkey = a.l_orderkey
        |  WHERE a.p_brand <> b.p_brand),
        |pw AS MATERIALIZED (SELECT p, w AS i, l AS j, count(*) AS c
        |                    FROM cmp GROUP BY 1, 2, 3),
        |items AS MATERIALIZED (SELECT DISTINCT i FROM
        |  (SELECT i FROM pw UNION ALL SELECT j AS i FROM pw)),
        |gm AS MATERIALIZED (SELECT item, CAST(sum(c) AS BIGINT) AS games FROM
        |  (SELECT i AS item, c FROM pw UNION ALL SELECT j AS item, c FROM pw)
        |  GROUP BY 1),""".stripMargin)
    sb.append(s"""
      |g0 AS MATERIALIZED (
      |  SELECT i AS item, round(CAST($init AS DOUBLE), 10) AS r,
      |         round(CAST($initRd AS DOUBLE), 10) AS rd
      |  FROM items)""".stripMargin)
    eloPeriods.zipWithIndex.foreach { case (p, k0) =>
      val k = k0 + 1
      sb.append(s""",
        |s$k AS MATERIALIZED (
        |  SELECT item, r,
        |         round(least(sqrt(rd * rd + $c2), $initRd), 10) AS rd
        |  FROM g${k - 1}),
        |t$k AS MATERIALIZED (
        |  SELECT item, sum(CAST(di AS DECIMAL(30, 12))) AS d2inv,
        |         sum(CAST(dl AS DECIMAL(28, 10))) AS delta
        |  FROM (
        |    SELECT item, round(c * $q2 * g * g * e * (1 - e), 12) AS di,
        |           round(c * g * (s - e), 10) AS dl
        |    FROM (
        |      SELECT item, c, s, g,
        |             round(1 / (1 + pow(10, -g * (ri - rj) / 400.0)), 10) AS e
        |      FROM (
        |        SELECT pw.i AS item, pw.c, 1.0 AS s, si.r AS ri, sj.r AS rj,
        |          round(1 / sqrt(1 + 3 * $q2 * sj.rd * sj.rd / (pi() * pi())), 10) AS g
        |        FROM pw JOIN s$k si ON si.item = pw.i
        |                JOIN s$k sj ON sj.item = pw.j
        |        WHERE pw.p = '$p'
        |        UNION ALL
        |        SELECT pw.j AS item, pw.c, 0.0 AS s, sj.r AS ri, si.r AS rj,
        |          round(1 / sqrt(1 + 3 * $q2 * si.rd * si.rd / (pi() * pi())), 10) AS g
        |        FROM pw JOIN s$k si ON si.item = pw.i
        |                JOIN s$k sj ON sj.item = pw.j
        |        WHERE pw.p = '$p'))) GROUP BY 1),
        |g$k AS MATERIALIZED (
        |  SELECT s.item,
        |    CASE WHEN t.item IS NULL THEN s.r
        |         ELSE round(s.r + $q
        |           / round(1.0 / (s.rd * s.rd) + CAST(t.d2inv AS DOUBLE), 12)
        |           * CAST(t.delta AS DOUBLE), 10) END AS r,
        |    CASE WHEN t.item IS NULL THEN s.rd
        |         ELSE round(sqrt(1.0
        |           / round(1.0 / (s.rd * s.rd) + CAST(t.d2inv AS DOUBLE), 12)), 10)
        |         END AS rd
        |  FROM s$k s LEFT JOIN t$k t ON t.item = s.item)""".stripMargin)
    }
    sb.append(s"""
      |SELECT g.item, round(g.r, 6) AS rating, round(g.rd, 6) AS rd, gm.games,
      |  CAST(row_number() OVER (ORDER BY round(g.r, 6) DESC, g.item) AS INT) AS rank
      |FROM g${eloPeriods.size} g JOIN gm ON gm.item = g.item ORDER BY rank""".stripMargin)
    sb.toString
  }

  /** Unrolled anchored Bradley–Terry MM replay (mirrors
    * [[graft.pipeline.Preference.bradleyTerry]] handoff-for-handoff). */
  private def bradleyTerrySql(iters: Int): String = {
    val sb = new StringBuilder(winsSql)
    sb.append(""",
      |nm AS MATERIALIZED (SELECT i, j, sum(c) AS nij FROM (
      |  SELECT i, j, wij AS c FROM wins
      |  UNION ALL SELECT j AS i, i AS j, wij AS c FROM wins) GROUP BY 1, 2),
      |wv AS MATERIALIZED (SELECT i, sum(wij) AS wi FROM wins GROUP BY 1),
      |items AS MATERIALIZED (SELECT DISTINCT i FROM nm),
      |p0 AS MATERIALIZED (
      |  SELECT i, round(1.0 / (SELECT count(*) FROM items), 10) AS p
      |  FROM items)""".stripMargin)
    for (k <- 1 to iters) {
      sb.append(s""",
        |r$k AS MATERIALIZED (
        |  SELECT n.i, round(coalesce((SELECT wi FROM wv WHERE wv.i = n.i), 0)
        |    / sum(round(n.nij / (pa.p + pb.p), 10)), 10) AS praw
        |  FROM nm n JOIN p${k - 1} pa ON pa.i = n.i
        |            JOIN p${k - 1} pb ON pb.i = n.j
        |  GROUP BY n.i),
        |p$k AS MATERIALIZED (
        |  SELECT i, round(praw / (SELECT sum(praw) FROM r$k), 10) AS p
        |  FROM r$k)""".stripMargin)
    }
    sb.append(s"""
      |SELECT i AS item, round(p, 6) AS strength,
      |  CAST(row_number() OVER (ORDER BY p DESC, i) AS INT) AS rank
      |FROM p$iters ORDER BY rank""".stripMargin)
    sb.toString
  }

  /** 5-rater shifted-confusion planted labels (mirrors
    * [[graft.pipeline.Annotation.plantedLabels]] with shiftedConfusion)
    * plus the unrolled anchored Dawid–Skene EM chain; `finalSelect`
    * projects either the model or the posteriors. Products over raters
    * and the per-item normalizer fold via `list_reduce` in pinned order,
    * matching the Spark side's sorted-array `aggregate` bit-for-bit. */
  private def dawidSkeneSql(iters: Int, finalSelect: String): String = {
    val sb = new StringBuilder(
      """WITH labels AS MATERIALIZED (
        |  SELECT d.doc_id AS item_id, r.rater,
        |    CASE WHEN (CAST(('0x' || substr(md5('rater' || r.rater || ':' ||
        |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100)
        |        < (100 - 10 * r.rater)
        |      THEN CAST(('0x' || substr(md5('cls:' ||
        |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 3
        |      ELSE (CAST(('0x' || substr(md5('cls:' ||
        |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |            + 1 + (r.rater % 2)) % 3
        |    END AS label
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS rater) r),
        |ni AS (SELECT count(DISTINCT item_id) AS n FROM labels),
        |grid AS MATERIALIZED (
        |  SELECT r.rater, k.k, l.l
        |  FROM (SELECT DISTINCT rater FROM labels) r,
        |       (SELECT DISTINCT label AS k FROM labels) k,
        |       (SELECT DISTINCT label AS l FROM labels) l),
        |mu0 AS MATERIALIZED (
        |  SELECT item_id, label AS k, round(count(*) / 5.0, 10) AS mu
        |  FROM labels GROUP BY 1, 2)""".stripMargin)
    for (t <- 1 to iters) {
      sb.append(s""",
        |j$t AS MATERIALIZED (
        |  SELECT lb.item_id, lb.rater, lb.label, m.k, m.mu
        |  FROM labels lb JOIN mu${t - 1} m ON lb.item_id = m.item_id),
        |num$t AS (SELECT rater, k, label AS l, sum(mu) AS s
        |          FROM j$t GROUP BY 1, 2, 3),
        |den$t AS (SELECT rater, k, sum(mu) AS s FROM j$t GROUP BY 1, 2),
        |th$t AS MATERIALIZED (
        |  SELECT g.rater, g.k, g.l, round(coalesce(n.s, 0) / d.s, 10) AS th
        |  FROM grid g JOIN den$t d ON g.rater = d.rater AND g.k = d.k
        |  LEFT JOIN num$t n ON n.rater = g.rater AND n.k = g.k AND n.l = g.l),
        |pi$t AS MATERIALIZED (
        |  SELECT k, round(sum(mu) / (SELECT n FROM ni), 10) AS pi
        |  FROM mu${t - 1} GROUP BY 1),
        |e$t AS MATERIALIZED (
        |  SELECT lb.item_id, t.k,
        |    list_reduce(list(t.th ORDER BY lb.rater), (a, b) -> a * b) AS prod
        |  FROM labels lb JOIN th$t t ON t.rater = lb.rater AND t.l = lb.label
        |  GROUP BY 1, 2),
        |a$t AS MATERIALIZED (
        |  SELECT e.item_id, e.k, p.pi * e.prod AS a
        |  FROM e$t e JOIN pi$t p ON p.k = e.k),
        |dn$t AS (SELECT item_id,
        |           list_reduce(list(a ORDER BY k), (x, y) -> x + y) AS d
        |         FROM a$t GROUP BY 1),
        |mu$t AS MATERIALIZED (
        |  SELECT a.item_id, a.k, round(a.a / d.d, 10) AS mu
        |  FROM a$t a JOIN dn$t d ON a.item_id = d.item_id)""".stripMargin)
    }
    sb.append("\n").append(finalSelect.replace("{T}", iters.toString))
    sb.toString
  }

  private def plantedDsLabels(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Annotation.plantedLabels(Registry.t(s, dir, "documents"),
      "doc_id", nRaters = 5, nClasses = 3, shiftedConfusion = true)

  val defs: Map[String, QueryDef] = Map(

    "q_dawid_skene" -> QueryDef(
      (s, dir) => graft.pipeline.Annotation.dawidSkene(
        plantedDsLabels(s, dir), "item_id", "rater", "label", iters = 2),
      Some(dawidSkeneSql(2,
        """SELECT CAST(rater AS INT) AS rater, CAST(k AS INT) AS true_class,
          |  CAST(l AS INT) AS observed, round(th, 6) AS theta FROM th{T}
          |UNION ALL
          |SELECT 0 AS rater, CAST(k AS INT) AS true_class, -1 AS observed,
          |  round(pi, 6) AS theta FROM pi{T}
          |ORDER BY rater, true_class, observed""".stripMargin))),

    "q_dawid_skene_labels" -> QueryDef(
      (s, dir) => graft.pipeline.Annotation.dawidSkenePosteriors(
        plantedDsLabels(s, dir), "item_id", "rater", "label", iters = 2),
      Some(dawidSkeneSql(2,
        """SELECT item_id, CAST(k AS INT) AS map_label,
          |  round(mu, 6) AS posterior
          |FROM (SELECT item_id, k, mu, row_number()
          |        OVER (PARTITION BY item_id ORDER BY mu DESC, k) AS rn
          |      FROM mu{T})
          |WHERE rn = 1 ORDER BY item_id""".stripMargin))),

    "q_bradley_terry" -> QueryDef(
      (s, dir) => {
        val wins = graft.pipeline.Preference.pairWins(
          brandComparisons(s, dir), "w", "l")
        graft.pipeline.Preference.bradleyTerry(wins, iters = 6)
      },
      Some(bradleyTerrySql(6)),
      bench = true),

    // ROUGE-1/2 per source over the same shifted-window segment pairs as
    // q_rouge_l: corpus-level clipped n-gram matches, recall over the
    // reference total, precision over the candidate total, anchored F1
    "q_rouge_n" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val seg = Registry.t(s, dir, "documents").select($"doc_id", $"source",
          graft.pipeline.TextAnalysis.wsTokens(lower($"text")).as("ts"))
          .select($"doc_id", $"source", slice($"ts", 1, 12).as("cand"),
            slice($"ts", 4, 12).as("ref"))
        graft.pipeline.TextEval.rougeN(seg, "doc_id", "source",
          "cand", "ref", maxN = 2)
      },
      Some("""WITH tok AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
        |  FROM documents),
        |seg AS (SELECT doc_id, source, ts[1:12] AS c, ts[4:15] AS r FROM tok),
        |cg AS (
        |  SELECT doc_id, source, n, g, count(*) AS c FROM (
        |    SELECT doc_id, source, 1 AS n, unnest(c) AS g FROM seg
        |    UNION ALL
        |    SELECT seg.doc_id, seg.source, 2 AS n, c[i] || ' ' || c[i + 1] AS g
        |    FROM seg, UNNEST(generate_series(1, len(c) - 1)) AS u(i))
        |  GROUP BY 1, 2, 3, 4),
        |rg AS (
        |  SELECT doc_id, n, g, count(*) AS c FROM (
        |    SELECT doc_id, 1 AS n, unnest(r) AS g FROM seg
        |    UNION ALL
        |    SELECT seg.doc_id, 2 AS n, r[i] || ' ' || r[i + 1] AS g
        |    FROM seg, UNNEST(generate_series(1, len(r) - 1)) AS u(i))
        |  GROUP BY 1, 2, 3),
        |clip AS (
        |  SELECT cg.source, cg.n, sum(least(cg.c, rg.c)) AS m
        |  FROM cg JOIN rg ON cg.doc_id = rg.doc_id AND cg.n = rg.n AND cg.g = rg.g
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT source, nn.n,
        |    sum(greatest(len(c) - nn.n + 1, 0)) AS tc,
        |    sum(greatest(len(r) - nn.n + 1, 0)) AS tr
        |  FROM seg, (SELECT unnest([1, 2]) AS n) nn GROUP BY 1, 2),
        |pr AS (
        |  SELECT t.source, t.n,
        |    round(CASE WHEN t.tc > 0
        |          THEN CAST(coalesce(clip.m, 0) AS DOUBLE) / t.tc
        |          ELSE 0 END, 6) AS p,
        |    round(CASE WHEN t.tr > 0
        |          THEN CAST(coalesce(clip.m, 0) AS DOUBLE) / t.tr
        |          ELSE 0 END, 6) AS r
        |  FROM tot t LEFT JOIN clip ON clip.source = t.source AND clip.n = t.n)
        |SELECT source, n, p, r,
        |  CASE WHEN p + r > 0 THEN round(2.0 * p * r / (p + r), 6)
        |       ELSE 0 END AS f
        |FROM pr ORDER BY source, n""".stripMargin)),

    // ROUGE-L per source over shifted-window segment pairs (cand = first
    // 12 tokens, ref = tokens 4-15 — overlapping but unequal, so the LCS
    // is nontrivial). The codegen'd O(m·n) LCS kernel is replayed in
    // DuckDB as a recursive-CTE cell-by-cell DP (the 1-D rolling row with
    // a prev-diagonal scalar, one cell per recursion step, bounded by the
    // 12-token fixture slice)
    "q_rouge_l" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val seg = Registry.t(s, dir, "documents").select($"source",
          graft.pipeline.TextAnalysis.wsTokens(lower($"text")).as("ts"))
          .select($"source", slice($"ts", 1, 12).as("cand"),
            slice($"ts", 4, 12).as("ref"))
        graft.pipeline.TextEval.rougeL(seg, "source", "cand", "ref",
          beta = 1.2)
      },
      Some("""WITH RECURSIVE tok AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
        |  FROM documents),
        |sized AS (
        |  SELECT doc_id, source, c, r, len(c) AS m, len(r) AS n
        |  FROM (SELECT doc_id, source, ts[1:12] AS c, ts[4:15] AS r FROM tok)),
        |dp AS (
        |  SELECT doc_id, source, c, r, m, n, 0 AS t,
        |         list_transform(range(0, n + 1), x -> 0) AS d, 0 AS prev
        |  FROM sized
        |  UNION ALL
        |  SELECT doc_id, source, c, r, m, n, t + 1,
        |    list_transform(range(0, n + 1), x ->
        |      CASE WHEN x <> (t % n) + 1 THEN d[CAST(x + 1 AS INT)]
        |           WHEN c[CAST(t // n + 1 AS INT)] = r[CAST((t % n) + 1 AS INT)]
        |             THEN prev + 1
        |           ELSE greatest(d[CAST((t % n) + 1 AS INT)],
        |                         d[CAST((t % n) + 2 AS INT)]) END),
        |    CASE WHEN (t % n) + 1 = n THEN 0 ELSE d[CAST((t % n) + 2 AS INT)] END
        |  FROM dp WHERE t < m * n),
        |lcs AS (
        |  SELECT doc_id, source, m, n,
        |         CASE WHEN m * n = 0 THEN 0 ELSE d[n + 1] END AS l
        |  FROM dp WHERE t = m * n),
        |seg AS (
        |  SELECT source, p, r,
        |    CASE WHEN p + r > 0
        |         THEN round((1 + 1.44) * p * r / (r + 1.44 * p), 6)
        |         ELSE 0 END AS f
        |  FROM (
        |    SELECT source,
        |      CASE WHEN m > 0 THEN round(CAST(l AS DOUBLE) / m, 6) ELSE 0 END AS p,
        |      CASE WHEN n > 0 THEN round(CAST(l AS DOUBLE) / n, 6) ELSE 0 END AS r
        |    FROM lcs))
        |SELECT source,
        |  round(sum(CAST(round(p * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS rougel_p,
        |  round(sum(CAST(round(r * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS rougel_r,
        |  round(sum(CAST(round(f * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS rougel_f,
        |  count(*) AS n_segments
        |FROM seg GROUP BY source ORDER BY source""".stripMargin)),

    // period-batched Elo over the same brand comparisons keyed by order
    // year: expected scores against period-start ratings make each period
    // ONE aggregate (the parallelizable tournament form of Elo), and the
    // anchored trajectory unrolls period-by-period in the oracle
    "q_elo_ratings" -> QueryDef(
      (s, dir) => graft.pipeline.Preference.eloRatings(
        brandComparisonsDated(s, dir), "w", "l", "period",
        periods = eloPeriods, kFactor = 8.0, initialRating = 1500.0),
      Some(eloSql(kFactor = 8.0, init = 1500.0))),

    // Glicko-1 over the same dated comparisons: the rating system DEFINED
    // on rating periods (no batching approximation) — RD drift, then
    // (r, RD) updates against period-start opponent params; the anchored
    // trajectory unrolls period-by-period with exact-decimal term sums
    "q_glicko_ratings" -> QueryDef(
      (s, dir) => graft.pipeline.Preference.glickoRatings(
        brandComparisonsDated(s, dir), "w", "l", "period",
        periods = eloPeriods, c = 63.2),
      Some(glickoSql(c = 63.2, init = 1500.0, initRd = 350.0)),
      bench = true), // timed: the dated pair join + per-period fold

    // cross-system rating agreement: Elo and Glicko ranks over the SAME
    // comparisons, exact Spearman rho = 1 − 6Σd²/(n(n²−1)) on the integer
    // rank permutations plus top-5 overlap — the QA row that says whether
    // two independent raters order the items the same way. The oracle
    // embeds both unrolled replays as derived tables
    "q_rating_agreement" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cmp = brandComparisonsDated(s, dir)
        val e = graft.pipeline.Preference.eloRatings(cmp, "w", "l",
          "period", periods = eloPeriods, kFactor = 8.0)
          .select($"item", $"rank".as("rank_elo"))
        val g = graft.pipeline.Preference.glickoRatings(cmp, "w", "l",
          "period", periods = eloPeriods, c = 63.2)
          .select($"item", $"rank".as("rank_glicko"))
        val j = e.join(g, "item").collect()
        val n = j.length.toLong
        val sd2 = j.map(r =>
          math.pow((r.getInt(1) - r.getInt(2)).toDouble, 2).toLong).sum
        val rho = BigDecimal(1.0 -
          6.0 * sd2 / (n.toDouble * (n.toDouble * n - 1.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val top5 = j.count(r => r.getInt(1) <= 5 && r.getInt(2) <= 5).toLong
        s.createDataFrame(Seq((n, sd2, rho, top5)))
          .toDF("n_items", "sum_d2", "spearman_rho", "top5_overlap")
      },
      Some(s"""WITH j AS (
        |  SELECT e.item, e.rank AS re, g.rank AS rg
        |  FROM (${eloSql(kFactor = 8.0, init = 1500.0)}) e
        |  JOIN (${glickoSql(c = 63.2, init = 1500.0, initRd = 350.0)}) g
        |    ON g.item = e.item),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(re - rg AS BIGINT) * CAST(re - rg AS BIGINT))
        |         AS BIGINT) AS sd2,
        |    CAST(sum(CASE WHEN re <= 5 AND rg <= 5 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS top5
        |  FROM j)
        |SELECT n AS n_items, sd2 AS sum_d2,
        |  round(1.0 - 6.0 * sd2 / (CAST(n AS DOUBLE)
        |        * (CAST(n AS DOUBLE) * n - 1.0)), 6) AS spearman_rho,
        |  top5 AS top5_overlap
        |FROM s""".stripMargin)),

    // streaming Elo twin: per-(period, pair) counts accumulate as
    // complete-mode state, the anchored fold runs on the drained counts —
    // equal to the batch row, so the oracle is shared verbatim
    "q_stream_elo_ratings" -> QueryDef(
      (s, dir) => graft.streaming.PreferenceStream.eloIngest(
        s, dir, periods = eloPeriods),
      Some(eloSql(kFactor = 8.0, init = 1500.0))),

    // streaming twin: comparisons ingest as a stream-static join, the win
    // matrix accumulates as complete-mode state, and the fit runs on the
    // drained state — equal to the batch row, so the oracle is shared
    "q_stream_bradley_terry" -> QueryDef(
      (s, dir) => graft.streaming.PreferenceStream.bradleyTerryIngest(s, dir),
      Some(bradleyTerrySql(6))),

    "q_preference_cycles" -> QueryDef(
      (s, dir) => {
        val wins = graft.pipeline.Preference.pairWins(
          brandComparisons(s, dir), "w", "l")
        graft.pipeline.Preference.preferenceCycles(wins)
      },
      Some(winsSql + """,
        |e AS MATERIALIZED (
        |  SELECT a.i, a.j FROM wins a
        |  LEFT JOIN wins b ON a.i = b.j AND a.j = b.i
        |  WHERE a.wij > coalesce(b.wij, 0)),
        |und AS MATERIALIZED (
        |  SELECT least(i, j) AS a, greatest(i, j) AS b FROM e GROUP BY 1, 2),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM und ab JOIN und bc ON ab.b = bc.a
        |        JOIN und ac ON ac.a = ab.a AND ac.b = bc.b),
        |cyc AS (SELECT count(*) AS n_cycles
        |        FROM e ab JOIN e bc ON ab.j = bc.i
        |        JOIN e ca ON bc.j = ca.i AND ca.j = ab.i
        |        WHERE ab.i < ab.j AND ab.i < bc.j),
        |ni AS (SELECT count(DISTINCT i) AS n_items FROM (
        |         SELECT i FROM wins UNION ALL SELECT j FROM wins)),
        |ne AS (SELECT count(*) AS n_edges FROM e)
        |SELECT n_items, n_edges, n_triangles, n_cycles,
        |  round(n_cycles * 1.0 / n_triangles, 6) AS cycle_rate
        |FROM ni, ne, tri, cyc""".stripMargin)),

    "q_annotator_agreement" -> QueryDef(
      (s, dir) => {
        val labels = graft.pipeline.Annotation.plantedLabels(
          Registry.t(s, dir, "documents"), "doc_id", nRaters = 3, nClasses = 3)
        graft.pipeline.Annotation.agreement(labels, "item_id", "rater", "label")
      },
      Some("""WITH labels AS (
             |  SELECT d.doc_id AS item_id, r.rater,
             |    CASE WHEN (CAST(('0x' || substr(md5('rater' || r.rater || ':' ||
             |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100)
             |        < (100 - 10 * r.rater)
             |      THEN CAST(('0x' || substr(md5('cls:' ||
             |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 3
             |      ELSE (CAST(('0x' || substr(md5('cls:' ||
             |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + r.rater) % 3
             |    END AS label
             |  FROM documents d CROSS JOIN (SELECT unnest([1,2,3]) AS rater) r),
             |n AS (SELECT count(DISTINCT item_id) AS n FROM labels),
             |pairs AS (
             |  SELECT a.rater AS ra, b.rater AS rb, a.label AS la, b.label AS lb
             |  FROM labels a JOIN labels b
             |    ON a.item_id = b.item_id AND a.rater < b.rater),
             |po AS (SELECT ra, rb,
             |         avg(CASE WHEN la = lb THEN 1.0 ELSE 0.0 END) AS po
             |       FROM pairs GROUP BY 1, 2),
             |marg AS (SELECT rater, label, count(*) / (SELECT n FROM n) AS p
             |         FROM labels GROUP BY 1, 2),
             |pe AS (SELECT a.rater AS ra, b.rater AS rb, sum(a.p * b.p) AS pe
             |       FROM marg a JOIN marg b
             |         ON a.label = b.label AND a.rater < b.rater GROUP BY 1, 2),
             |cohen AS (
             |  SELECT CAST(ra AS VARCHAR) AS rater_a, CAST(rb AS VARCHAR) AS rater_b,
             |    round(po.po, 6) AS po, round(pe.pe, 6) AS pe,
             |    round((round(po.po, 6) - round(pe.pe, 6))
             |          / (1 - round(pe.pe, 6)), 6) AS kappa
             |  FROM po JOIN pe USING (ra, rb)),
             |ik AS (SELECT item_id, label, count(*) AS c FROM labels GROUP BY 1, 2),
             |pi AS (SELECT item_id, (sum(c * c) - 3.0) / (3.0 * 2.0) AS p_i
             |       FROM ik GROUP BY 1),
             |pbar AS (SELECT avg(p_i) AS pbar FROM pi),
             |share AS (SELECT label, sum(c) / (3.0 * (SELECT n FROM n)) AS pk
             |          FROM ik GROUP BY 1),
             |fpe AS (SELECT sum(pk * pk) AS pe FROM share),
             |fleiss AS (
             |  SELECT 'all' AS rater_a, 'all' AS rater_b,
             |    round(pbar.pbar, 6) AS po, round(fpe.pe, 6) AS pe,
             |    round((round(pbar.pbar, 6) - round(fpe.pe, 6))
             |          / (1 - round(fpe.pe, 6)), 6) AS kappa
             |  FROM pbar, fpe)
             |SELECT * FROM cohen UNION ALL SELECT * FROM fleiss
             |ORDER BY rater_a, rater_b""".stripMargin)),

    // 4 raters, each labeling only ~70% of items (md5-gated) — the
    // incomplete panel Cohen/Fleiss reject and Krippendorff handles.
    "q_krippendorff_alpha" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val h = graft.pipeline.Dedup.baseHash60 _
        val labels = graft.pipeline.Annotation.plantedLabels(
          Registry.t(s, dir, "documents"), "doc_id", nRaters = 4,
          nClasses = 3, shiftedConfusion = true)
          .filter(h(concat(lit("obs"), $"rater".cast("string"), lit(":"),
            $"item_id".cast("string"))) % 100 < 70)
        graft.pipeline.Annotation.krippendorffAlpha(
          labels, "item_id", "rater", "label")
      },
      Some("""WITH labels AS (
             |  SELECT d.doc_id AS item_id, r.rater,
             |    CASE WHEN (CAST(('0x' || substr(md5('rater' || r.rater || ':' ||
             |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100)
             |        < (100 - 10 * r.rater)
             |      THEN CAST(('0x' || substr(md5('cls:' ||
             |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 3
             |      ELSE (CAST(('0x' || substr(md5('cls:' ||
             |        CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |            + 1 + (r.rater % 2)) % 3 END AS label
             |  FROM documents d
             |  CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS rater) r
             |  WHERE (CAST(('0x' || substr(md5('obs' || r.rater || ':' ||
             |      CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 70),
             |nu AS (SELECT item_id, label, count(*) AS nuc
             |       FROM labels GROUP BY 1, 2),
             |mu AS (SELECT item_id, sum(nuc) AS m FROM nu GROUP BY 1),
             |pair AS (SELECT n.item_id, n.label, n.nuc, m.m
             |         FROM nu n JOIN mu m USING (item_id) WHERE m.m >= 2),
             |occ AS (SELECT sum(nuc * (nuc - 1.0) / (m - 1.0)) AS odiag,
             |               sum(nuc) AS n FROM pair),
             |nc AS (SELECT label, sum(nuc) AS n_c FROM pair GROUP BY 1),
             |stats AS (
             |  SELECT (SELECT count(*) FROM mu) AS n_units,
             |         (SELECT count(*) FROM mu WHERE m >= 2) AS n_pairable,
             |         round(1.0 - (SELECT odiag FROM occ)
             |               / (SELECT n FROM occ), 6) AS d_o,
             |         round(1.0 - (SELECT sum(n_c * (n_c - 1.0)) FROM nc)
             |               / ((SELECT n FROM occ)
             |                  * ((SELECT n FROM occ) - 1.0)), 6) AS d_e)
             |SELECT n_units, n_pairable, d_o, d_e,
             |  round(1.0 - d_o / d_e, 6) AS alpha FROM stats""".stripMargin)),

    // Candidate = first 80% of the space-stripped characters with an
    // md5-planted substitution every ~9th position, so precision AND
    // recall clip on every order.
    "q_chrf_eval" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val h = graft.pipeline.Dedup.baseHash60 _
        val base = Registry.t(s, dir, "documents").select($"doc_id", $"source",
          regexp_replace($"text", "\\s", "").as("r"))
        val pairs = base.withColumn("cand",
          when(length($"r") > 0, concat_ws("",
            transform(sequence(lit(1), ceil(lit(0.8) * length($"r")).cast("int")),
              i => when(h(concat(lit("chr:"), $"doc_id".cast("string"),
                lit(":"), i.cast("string"))) % 9 === 0, lit("x"))
                .otherwise($"r".substr(i, lit(1))))))
            .otherwise(lit("")))
        graft.pipeline.TextEval.chrF(pairs, "doc_id", "source", "cand", "r")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, source, replace(text, ' ', '') AS r FROM documents),
             |pairs AS (
             |  SELECT doc_id, source, r,
             |    CASE WHEN len(r) = 0 THEN '' ELSE
             |      array_to_string(list_transform(
             |        generate_series(1, CAST(ceil(0.8 * len(r)) AS INT)),
             |        i -> CASE WHEN CAST(('0x' || substr(md5('chr:' ||
             |              CAST(doc_id AS VARCHAR) || ':' ||
             |              CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 9 = 0
             |          THEN 'x' ELSE substr(r, i, 1) END), '') END AS c
             |  FROM base),
             |grams AS (
             |  SELECT doc_id, source, n, gram,
             |    sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS cc,
             |    sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS rc
             |  FROM (
             |    SELECT p.doc_id, p.source, n.n, s.side,
             |      unnest(list_transform(generate_series(1,
             |          len(CASE WHEN s.side = 'c' THEN p.c ELSE p.r END) - n.n + 1),
             |        i -> substr(CASE WHEN s.side = 'c' THEN p.c ELSE p.r END,
             |                    i, n.n))) AS gram
             |    FROM pairs p, (SELECT unnest([1,2,3,4,5,6]) AS n) n,
             |         (SELECT unnest(['c','r']) AS side) s)
             |  GROUP BY 1, 2, 3, 4),
             |agg AS (
             |  SELECT source, n, sum(least(cc, rc)) AS mtch,
             |         sum(cc) AS tc, sum(rc) AS tr
             |  FROM grams GROUP BY 1, 2
             |  HAVING sum(cc) > 0 AND sum(rc) > 0),
             |fn AS (
             |  SELECT source, n, round(mtch * 1.0 / tc, 6) AS p,
             |    round(mtch * 1.0 / tr, 6) AS r
             |  FROM agg),
             |fb AS (
             |  SELECT source, n, p, r,
             |    CASE WHEN p = 0 AND r = 0 THEN 0.0
             |         ELSE round(5.0 * p * r / (4.0 * p + r), 6) END AS f_n
             |  FROM fn)
             |SELECT source,
             |  round(sum(CAST(round(p * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS chrp,
             |  round(sum(CAST(round(r * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS chrr,
             |  round(sum(CAST(round(f_n * 1e6) AS BIGINT)) / (count(*) * 1e6), 6) AS chrf
             |FROM fb GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q_conformal_threshold" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val h = graft.pipeline.Dedup.baseHash60 _
        val d = Registry.t(s, dir, "documents").select(
          ($"n_chars" + (h(concat(lit("jit:"), $"doc_id".cast("string"))) % 1000)
            / 1000.0).as("score"),
          (h(concat(lit("split:"), $"doc_id".cast("string"))) % 2 === 0).as("calib"))
        graft.pipeline.Classify.conformalThreshold(d, "score", "calib", alpha = 0.1)
      },
      Some("""WITH s AS (
             |  SELECT n_chars + (CAST(('0x' || substr(md5('jit:' ||
             |      CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000) / 1000.0 AS s,
             |    (CAST(('0x' || substr(md5('split:' ||
             |      CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0) AS c
             |  FROM documents),
             |n AS (SELECT count(*) FILTER (c) AS ncal,
             |             count(*) FILTER (NOT c) AS ntest FROM s),
             |k AS (SELECT CAST(ceil((ncal + 1) * 0.9) AS BIGINT) AS k,
             |             ncal, ntest FROM n),
             |th AS (SELECT __s AS t FROM (
             |         SELECT s AS __s, row_number() OVER (ORDER BY s) AS i
             |         FROM s WHERE c) WHERE i = (SELECT k FROM k)),
             |cov AS (SELECT avg(CASE WHEN s <= (SELECT t FROM th)
             |                   THEN 1.0 ELSE 0.0 END) AS cov
             |        FROM s WHERE NOT c)
             |SELECT ncal AS n_cal, k, (SELECT t FROM th) AS threshold,
             |       ntest AS n_test, round(cov.cov, 6) AS coverage
             |FROM k, cov""".stripMargin)),

    // Candidate corpus: reference truncated to its first 80% tokens with an
    // md5-planted substitution every ~7th position — so every BLEU component
    // (clipping, all four precisions, the brevity penalty) is exercised and
    // both engines derive the identical candidate.
    "q_bleu_eval" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val h = graft.pipeline.Dedup.baseHash60 _
        val base = Registry.t(s, dir, "documents").select($"doc_id", $"source",
          filter(split($"text", " "), t => t =!= "").as("ref"))
        val pairs = base.withColumn("cand",
          when(size($"ref") > 0,
            transform(sequence(lit(1), ceil(lit(0.8) * size($"ref")).cast("int")),
              p => when(h(concat(lit("sub:"), $"doc_id".cast("string"), lit(":"),
                p.cast("string"))) % 7 === 0, lit("the"))
                .otherwise(element_at($"ref", p))))
            .otherwise(array().cast("array<string>")))
        graft.pipeline.TextEval.corpusBleu(pairs, "doc_id", "source", "cand", "ref")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, source,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS ref
             |  FROM documents),
             |pairs AS (
             |  SELECT doc_id, source, ref,
             |    CASE WHEN len(ref) = 0 THEN CAST([] AS VARCHAR[]) ELSE
             |      list_transform(generate_series(1, CAST(ceil(0.8 * len(ref)) AS INT)),
             |        p -> CASE WHEN CAST(('0x' || substr(md5('sub:' ||
             |              CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)),
             |              1, 15)) AS BIGINT) % 7 = 0
             |          THEN 'the' ELSE ref[p] END) END AS cand
             |  FROM base),
             |grams AS (
             |  SELECT doc_id, source, n, gram, side, count(*) AS c
             |  FROM (
             |    SELECT p.doc_id, p.source, n.n, s.side,
             |      unnest(list_transform(generate_series(1,
             |          len(CASE WHEN s.side = 'c' THEN p.cand ELSE p.ref END) - n.n + 1),
             |        i -> array_to_string((CASE WHEN s.side = 'c' THEN p.cand
             |          ELSE p.ref END)[i:i+n.n-1], ' '))) AS gram
             |    FROM pairs p, (SELECT unnest([1,2,3,4]) AS n) n,
             |         (SELECT unnest(['c','r']) AS side) s)
             |  GROUP BY 1, 2, 3, 4, 5),
             |clip AS (
             |  SELECT c.source, c.n,
             |    sum(least(c.c, coalesce(r.c, 0))) AS clipped, sum(c.c) AS total
             |  FROM (SELECT * FROM grams WHERE side = 'c') c
             |  LEFT JOIN (SELECT * FROM grams WHERE side = 'r') r
             |    ON c.doc_id = r.doc_id AND c.n = r.n AND c.gram = r.gram
             |  GROUP BY 1, 2),
             |lens AS (SELECT source, sum(len(cand)) AS clen,
             |                sum(len(ref)) AS rlen FROM pairs GROUP BY 1),
             |prec AS (
             |  SELECT source,
             |    round(max(CASE WHEN n = 1 THEN clipped / total END), 6) AS p1,
             |    round(max(CASE WHEN n = 2 THEN clipped / total END), 6) AS p2,
             |    round(max(CASE WHEN n = 3 THEN clipped / total END), 6) AS p3,
             |    round(max(CASE WHEN n = 4 THEN clipped / total END), 6) AS p4
             |  FROM clip GROUP BY 1)
             |SELECT p.source, p1, p2, p3, p4,
             |  round(CASE WHEN clen >= rlen THEN 1.0
             |        ELSE exp(1.0 - rlen * 1.0 / clen) END, 6) AS bp,
             |  round(round(CASE WHEN clen >= rlen THEN 1.0
             |        ELSE exp(1.0 - rlen * 1.0 / clen) END, 6)
             |        * pow(p1 * p2 * p3 * p4, 0.25), 6) AS bleu
             |FROM prec p JOIN lens l ON p.source = l.source
             |ORDER BY p.source""".stripMargin))
  )
}
