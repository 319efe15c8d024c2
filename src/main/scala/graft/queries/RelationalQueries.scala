package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operator coverage over the TPC-H-ish tables: scans with
 * pushdown, hash/broadcast joins, semi/anti joins, partial-agg groupBys,
 * ranking + frame windows, rollup, set operations, conditional aggregation,
 * and time bucketing. Every query has an exact DuckDB oracle.
 *
 * Conventions for oracle hash-parity: identical column aliases both sides,
 * doubles rounded, DuckDB integer sums cast to BIGINT (DuckDB widens to
 * HUGEINT), timestamps stringified, every query deterministically ordered
 * with tie-free keys.
 */
object RelationalQueries {

  import Registry.t

  val defs: Map[String, QueryDef] = Map(

    // TPC-H Q1 style: scan + filter pushdown + grouped partial agg
    "q1_pricing_summary" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("1998-09-01"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base_price"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // TPC-H Q3 style: 3-way join, agg, tie-free top-10
    "q3_shipping_priority" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val ord = t(s, dir, "orders").filter($"o_orderdate" < lit("1997-01-01"))
        val li = t(s, dir, "lineitem").filter($"l_shipdate" > lit("1997-01-01"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderpriority")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey".asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderpriority,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |  AND l_shipdate > TIMESTAMP '1997-01-01'
             |GROUP BY l_orderkey, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin),
      bench = true),

    // TPC-H Q5 style: 6-table join with two broadcastable dims
    "q5_local_supplier_volume" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val region = t(s, dir, "region").filter($"r_name" === "ASIA")
        val nation = t(s, dir, "nation")
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1998-01-01"))
        val li = t(s, dir, "lineitem")
        val sup = t(s, dir, "supplier")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(sup, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"n_name".asc)
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin),
      bench = true),

    // semi join (EXISTS)
    "q_customers_with_urgent_orders" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
        t(s, dir, "customer")
          .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name", round($"c_acctbal", 2).as("acctbal"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
             |FROM customer WHERE EXISTS (
             |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |  AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // anti join (NOT EXISTS)
    "q_customers_without_orders" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ranking window: top-3 parts by revenue within each brand
    "q_top_parts_per_brand" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val part = t(s, dir, "part")
        val rev = li.join(part, $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand", $"p_partkey")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        val w = Window.partitionBy($"p_brand").orderBy($"revenue".desc, $"p_partkey".asc)
        rev.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"p_brand", $"rnk", $"p_partkey", $"revenue")
          .orderBy($"p_brand", $"rnk")
      },
      Some("""SELECT p_brand, rnk, p_partkey, revenue FROM (
             |  SELECT p_brand, p_partkey,
             |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |    CAST(row_number() OVER (PARTITION BY p_brand
             |      ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC,
             |               p_partkey ASC) AS INT) AS rnk
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY p_brand, p_partkey)
             |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin),
      bench = true),

    // frame window: running quantity per supplier over ship time
    "q_running_supplier_quantity" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem").filter($"l_suppkey" <= 5)
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li.select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            round(sum($"l_quantity").over(w), 2).as("running_qty"))
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
             |FROM lineitem WHERE l_suppkey <= 5
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // rollup (hierarchical grouping sets)
    "q_order_rollup" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"n", $"total")
          .orderBy($"status", $"priority")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // cube (full grouping-set cross product)
    "q_order_cube" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"n", $"total")
          .orderBy($"status", $"priority")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // time-RANGE window frame: per-customer rolling 30-day revenue keyed
    // by order date (not row count) — the frame is value-based, so gaps
    // and same-day ties behave identically in both engines
    "q_rolling_revenue_30d" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy(datediff($"o_orderdate", lit("1970-01-01").cast("date")))
          .rangeBetween(-30, 0)
        t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_orderdate",
            round(sum($"o_totalprice").over(w), 2).as("rolling_30d"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate
             |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2)
             |    AS rolling_30d
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // explicit GROUPING SETS (the general form rollup/cube specialize):
    // per-status totals, per-priority totals, and the grand total in one
    // pass, disambiguated by grouping flags rather than null-coalescing
    "q_grouping_sets" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupingSets(
            Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq.empty),
            $"o_orderstatus", $"o_orderpriority")
          .agg(grouping($"o_orderstatus").as("g_status"),
            grouping($"o_orderpriority").as("g_priority"),
            count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"g_status".cast("int").as("g_status"),
            $"g_priority".cast("int").as("g_priority"), $"n", $"total")
          .orderBy($"status", $"priority")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
             |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY status, priority""".stripMargin)),

    // unpivot (wide → long): one row per (status, metric), the inverse of
    // q_pivot_event_matrix's pivot — metric columns melt into rows
    "q_unpivot_metrics" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(round(sum($"o_totalprice"), 2).as("sum_price"),
            round(avg($"o_totalprice"), 2).as("avg_price"),
            count(lit(1)).cast("double").as("n_orders"))
          .unpivot(
            Array(col("o_orderstatus")),
            Array(col("sum_price"), col("avg_price"), col("n_orders")),
            "metric", "value")
          .orderBy($"o_orderstatus", $"metric")
      },
      Some("""WITH wide AS (
             |  SELECT o_orderstatus,
             |    round(sum(o_totalprice), 2) AS sum_price,
             |    round(avg(o_totalprice), 2) AS avg_price,
             |    CAST(count(*) AS DOUBLE) AS n_orders
             |  FROM orders GROUP BY o_orderstatus)
             |SELECT o_orderstatus, metric, value FROM (
             |  SELECT o_orderstatus, 'sum_price' AS metric, sum_price AS value FROM wide
             |  UNION ALL
             |  SELECT o_orderstatus, 'avg_price', avg_price FROM wide
             |  UNION ALL
             |  SELECT o_orderstatus, 'n_orders', n_orders FROM wide)
             |ORDER BY o_orderstatus, metric""".stripMargin)),

    // lag analytics: days between a customer's consecutive orders
    "q_customer_order_gaps" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
          .filter($"prev_date".isNotNull)
          .select($"o_custkey", $"o_orderkey",
            datediff($"o_orderdate", $"prev_date").as("gap_days"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(date_diff('day', CAST(prev_date AS DATE), CAST(o_orderdate AS DATE)) AS INT) AS gap_days
             |FROM (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |    lag(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS prev_date
             |  FROM orders)
             |WHERE prev_date IS NOT NULL
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // set operations: customers active only in 1995 vs only in 1997
    "q_setop_active_customers" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ord = t(s, dir, "orders")
        def active(y: String, y1: String) = ord
          .filter($"o_orderdate" >= lit(y) && $"o_orderdate" < lit(y1))
          .select($"o_custkey").distinct()
        val only95 = active("1995-01-01", "1996-01-01")
          .except(active("1997-01-01", "1998-01-01"))
        only95.orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey FROM (
             |  SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
             |  EXCEPT
             |  SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
             |ORDER BY o_custkey""".stripMargin)),

    // pivot: per-user event-type count matrix (fixed pivot values keep the
    // schema static — at scale an unbounded pivot would need a distinct
    // pass first, so pin the columns)
    "q_pivot_event_matrix" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Registry.events(s, dir)
          .groupBy($"user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
             |  count(*) FILTER (WHERE event_type = 'click') AS click,
             |  count(*) FILTER (WHERE event_type = 'error') AS error,
             |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
             |  count(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // MERGE/upsert as one full-outer join: refreshed rows win, new keys
    // insert, untouched base rows carry forward (graft.operators.Merge)
    "q_merge_upsert" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "customer")
          .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        val spent = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1997-01-01"))
          .groupBy($"o_custkey").agg(round(sum($"o_totalprice"), 2).as("spent"))
        val updates = spent.select($"o_custkey".as("c_custkey"),
            $"spent".as("c_acctbal"), lit("REFRESHED").as("c_mktsegment"))
          .unionByName(spent.select(($"o_custkey" + 1000000).as("c_custkey"),
            $"spent".as("c_acctbal"), lit("NEW").as("c_mktsegment")))
        graft.operators.Merge.upsert(base, updates, "c_custkey")
          .orderBy($"c_custkey")
      },
      Some("""WITH spent AS (
             |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spent
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  GROUP BY o_custkey),
             |updates AS (
             |  SELECT o_custkey AS c_custkey, spent AS c_acctbal,
             |         'REFRESHED' AS c_mktsegment FROM spent
             |  UNION ALL
             |  SELECT o_custkey + 1000000, spent, 'NEW' FROM spent),
             |base AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer)
             |SELECT c_custkey,
             |  coalesce(u.c_acctbal, b.c_acctbal) AS c_acctbal,
             |  coalesce(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment
             |FROM base b FULL OUTER JOIN updates u USING (c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // change-log compaction: each user's latest event wins (CDC snapshot
    // from an append-only log; ties broken by event id)
    "q_latest_by_key" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        graft.operators.Merge.latestByKey(Registry.events(s, dir),
            "user_id", "ts", "event_id")
          .select($"user_id", $"event_id", $"event_type",
            round($"value", 4).as("value"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, event_id, event_type, round(value, 4) AS value
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // SCD Type-2 apply: updated keys close their current row at the
    // update timestamp and append a new open version; closed history and
    // untouched keys pass through (graft.operators.Merge.scd2)
    "q_merge_scd2" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer")
        val hist = cust
          .withColumn("valid_from_ms", lit(0L))
          .withColumn("valid_to_ms", lit(null).cast("long"))
        val upd = cust.filter($"c_custkey" % 10 === 0)
          .withColumn("c_acctbal", round($"c_acctbal" + 100, 2))
          .withColumn("ts_ms", lit(1000L))
        graft.operators.Merge.scd2(hist, upd, "c_custkey", "ts_ms")
          .orderBy($"c_custkey", $"valid_from_ms")
      },
      Some("""WITH upd AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |         round(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 10 = 0)
             |SELECT h.c_custkey, h.c_name, h.c_nationkey, h.c_acctbal,
             |       h.c_mktsegment, CAST(0 AS BIGINT) AS valid_from_ms,
             |       CASE WHEN u.c_custkey IS NOT NULL
             |            THEN CAST(1000 AS BIGINT) END AS valid_to_ms
             |FROM customer h LEFT JOIN upd u USING (c_custkey)
             |UNION ALL
             |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             |       CAST(1000 AS BIGINT), CAST(NULL AS BIGINT)
             |FROM upd
             |ORDER BY c_custkey, valid_from_ms""".stripMargin)),

    // TPC-H Q4 style: correlated EXISTS + grouped count
    "q_order_priority_check" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ord = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1997-01-01"))
        val li = t(s, dir, "lineitem")
        ord.join(li, $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // conditional aggregation (TPC-H Q14 style promo share)
    "q_promo_revenue_share" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val part = t(s, dir, "part")
        li.join(part, $"l_partkey" === $"p_partkey")
          .groupBy($"p_type")
          .agg(
            round(sum(when($"p_type" === "PROMO", $"l_extendedprice" * (lit(1) - $"l_discount"))
              .otherwise(lit(0.0))), 2).as("promo_revenue"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("total_revenue"),
            count(lit(1)).as("n"))
          .orderBy($"p_type")
      },
      Some("""SELECT p_type,
             |  round(sum(CASE WHEN p_type = 'PROMO'
             |    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2) AS promo_revenue,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
             |  count(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_type ORDER BY p_type""".stripMargin)),

    // multi-level dims: avg balance by region (two broadcast joins)
    "q_acctbal_by_region" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(round(avg($"c_acctbal"), 4).as("avg_bal"),
            countDistinct($"c_custkey").as("customers"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, round(avg(c_acctbal), 4) AS avg_bal,
             |  count(DISTINCT c_custkey) AS customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // time bucketing on the events table (batch form of the streaming agg)
    "q_events_hourly" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Registry.events(s, dir)
          .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm").as("hour"),
            $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
          .orderBy($"hour", $"event_type")
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
      bench = true),

    // hopping (sliding) windows: 1-hour windows every 30 minutes — each
    // event lands in exactly two windows (Spark's window() generator);
    // the oracle constructs both containing windows per event explicitly
    "q_events_hopping" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Registry.events(s, dir)
          .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
          .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("window_start"),
            $"event_type", $"n", $"total_value")
          .orderBy($"window_start", $"event_type")
      },
      Some("""SELECT strftime(time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE,
             |         '%Y-%m-%d %H:%M') AS window_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events CROSS JOIN (VALUES (0), (1)) t(k)
             |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // semi-structured parsing: the events props column is a JSON string;
    // extract a typed field and aggregate on it (from_json/get_json_object
    // family — the standard telemetry-payload shape)
    "q_json_props" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Registry.events(s, dir)
          .select(get_json_object($"props", "$.k").cast("int").as("k"), $"value")
          .groupBy(($"k" % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
          .orderBy($"k_mod")
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
             |  count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin)),

    // grouped distinct + filter pushdown through join
    "q_supplier_part_types" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val part = t(s, dir, "part").filter($"p_size" >= 25)
        li.join(part, $"l_partkey" === $"p_partkey")
          .groupBy($"l_suppkey")
          .agg(countDistinct($"p_type").as("types"),
            countDistinct($"p_brand").as("brands"))
          .filter($"types" >= 3)
          .orderBy($"l_suppkey")
      },
      Some("""SELECT l_suppkey, count(DISTINCT p_type) AS types,
             |  count(DISTINCT p_brand) AS brands
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size >= 25
             |GROUP BY l_suppkey HAVING count(DISTINCT p_type) >= 3
             |ORDER BY l_suppkey""".stripMargin)),

    // anti + semi joins in one query: customers who placed no orders
    // (left_anti) counted per market segment next to those who did
    // (left_semi) — Spark plans both without materializing the join output
    "q_customer_order_presence" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders").select($"o_custkey")
        val without = cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_without"))
        val withOrd = cust.join(ord, $"c_custkey" === $"o_custkey", "left_semi")
          .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_with"))
        withOrd.join(without, Seq("c_mktsegment"), "full_outer")
          .select($"c_mktsegment",
            coalesce($"n_with", lit(0L)).as("n_with"),
            coalesce($"n_without", lit(0L)).as("n_without"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  CAST(count(*) FILTER (WHERE EXISTS (
             |    SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS BIGINT) AS n_with,
             |  CAST(count(*) FILTER (WHERE NOT EXISTS (
             |    SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS BIGINT) AS n_without
             |FROM customer
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // hierarchical totals via ROLLUP (subtotal per returnflag, grand
    // total) — one pass, Catalyst expands the grouping sets; CUBE and
    // GROUPING SETS ride the same Expand operator
    "q_rollup_returns" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)))
}
