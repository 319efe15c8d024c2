package graft.queries

import graft.sources.Formats
import org.apache.spark.sql.functions._

/** Source/sink format coverage: each query pushes a table through a
  * written-and-reread format (CSV, JSON, Hive-partitioned parquet) and
  * aggregates the result — the oracle runs on the ORIGINAL parquet, so any
  * round-trip corruption (types, quoting, partition values) fails the
  * hash check. */
object FormatQueries {

  import Registry.t

  val defs: Map[String, QueryDef] = Map(

    "q_csv_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val n = Formats.csvRoundtrip(t(s, dir, "nation"))
        val r = Formats.csvRoundtrip(t(s, dir, "region"))
        n.join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_nations"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, count(*) AS n_nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    "q_json_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Formats.jsonRoundtrip(t(s, dir, "orders").filter($"o_orderkey" < 1000))
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderkey < 1000
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    "q_orc_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Formats.orcRoundtrip(t(s, dir, "supplier"))
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"), round(sum($"s_acctbal"), 2).as("total_bal"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS total_bal
             |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // generic Text/Text SequenceFile legacy ingestion: write the corpus
    // out as a SequenceFile, read it back, recover typed columns
    "q_seqfile_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Formats.sequenceFileRoundtrip(t(s, dir, "documents"), "doc_id", "text")
          .select($"doc_id".cast("long").as("doc_id"), length($"text").as("n_chars"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, CAST(length(text) AS INT) AS n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "q_partitioned_sink" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Formats.partitionedRoundtrip(
            t(s, dir, "documents").select($"doc_id", $"lang", $"text"), "lang")
          .filter($"lang".isin("en", "zh"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_id"),
            max($"doc_id").as("max_id"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents WHERE lang IN ('en', 'zh')
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // bucketed layout: write both join sides hash-bucketed on the join
    // key, then join AND aggregate on that key with zero exchanges in the
    // plan (asserted in BucketingSpec) — the write is the one shuffle,
    // amortized over every later join/agg on the key. The oracle replays
    // the join on the original tables: any bucket routing error (row in
    // the wrong bucket never meets its match) fails the hash check.
    "q_bucketed_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
        val o = t(s, dir, "orders").select($"o_custkey", $"o_totalprice")
        Formats.writeBucketed(c, "bkt_customer", "c_custkey", 8)
        Formats.writeBucketed(o, "bkt_orders", "o_custkey", 8)
        Formats.bucketedJoin(s, "bkt_customer", "bkt_orders", "c_custkey", "o_custkey")
          .groupBy($"c_custkey", $"c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
      },
      Some("""SELECT c_custkey, c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_mktsegment""".stripMargin)))
}
