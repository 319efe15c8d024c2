package graft.queries

import graft.sources.{Formats, MrldaModelFiles, MrldaSequenceFile, Snapshots, Warc}
import org.apache.spark.sql.functions._

/** Source/sink format coverage: each query pushes a table through a
  * written-and-reread format (CSV, JSON, Hive-partitioned parquet) and
  * aggregates the result — the oracle runs on the ORIGINAL parquet, so any
  * round-trip corruption (types, quoting, partition values) fails the
  * hash check. */
object FormatQueries {

  import Registry.t

  private val runs = new java.util.concurrent.atomic.AtomicInteger(0)

  /** One fixed export location per (kind, JVM), overwritten each run —
    * same bounded-footprint reasoning as Formats.tmp. */
  private def mrldaTmp(kind: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_mrlda", s"${kind}_${ProcessHandle.current().pid()}").toString

  val defs: Map[String, QueryDef] = Map(

    // manifest-versioned snapshots: three commits (base, append, overwrite),
    // then TIME TRAVEL back to v1 and v2 in one result. The oracle replays
    // each version's row set from the original table — any commit-protocol
    // defect (lost files, double-applied append, overwrite leaking priors)
    // breaks the hash.
    "q_snapshot_time_travel" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft_snap").toString
        val orders = t(s, dir, "orders")
        Snapshots.commit(orders.filter($"o_orderkey" % 3 === 0), snapDir) // v0
        Snapshots.commit(orders.filter($"o_orderkey" % 3 === 1), snapDir) // v1 append
        Snapshots.commit(orders.filter($"o_orderkey" % 3 === 2), snapDir,
          append = false) // v2 overwrite
        def agg(v: Long) = Snapshots.readVersion(s, snapDir, v)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .withColumn("version", lit(v))
        agg(1L).unionByName(agg(2L))
          .select($"version", $"o_orderstatus", $"n", $"total")
          .orderBy($"version", $"o_orderstatus")
      },
      Some("""SELECT 1 AS version, o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderkey % 3 IN (0, 1)
             |GROUP BY o_orderstatus
             |UNION ALL
             |SELECT 2 AS version, o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderkey % 3 = 2
             |GROUP BY o_orderstatus
             |ORDER BY version, o_orderstatus""".stripMargin)),

    // incremental consumption: three appended commits, then the change
    // feed for v0→v2 must surface exactly the rows of commits 1 and 2 —
    // the file-diff read a downstream incremental pipeline does
    "q_snapshot_changes" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft_changes").toString
        val orders = t(s, dir, "orders")
        (0 to 2).foreach(i =>
          Snapshots.commit(orders.filter($"o_orderkey" % 3 === i), snapDir))
        Snapshots.readChanges(s, snapDir, fromV = 0L, toV = 2L)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderkey % 3 IN (1, 2)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // row-level semantic diff across an overwrite: v1 drops every 5th
    // order and rewrites the priority of every 7th — the diff must
    // surface exactly the dropped rows and both sides of each rewrite;
    // the oracle reconstructs the same sets from the base table
    "q_snapshot_rowdiff" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft_rowdiff").toString
        val orders = t(s, dir, "orders")
        Snapshots.commit(orders, snapDir)
        val v1 = orders.filter($"o_orderkey" % 5 =!= 0)
          .withColumn("o_orderpriority",
            when($"o_orderkey" % 7 === 0, lit("0-DIFF"))
              .otherwise($"o_orderpriority"))
        Snapshots.commit(v1, snapDir, append = false)
        Snapshots.diffVersions(s, snapDir, 0L, 1L)
          .groupBy($"op", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy($"op", $"o_orderpriority")
      },
      Some("""SELECT op, o_orderpriority, count(*) AS n FROM (
             |  SELECT 'delete' AS op, o_orderpriority FROM orders
             |  WHERE o_orderkey % 5 = 0
             |     OR (o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0)
             |  UNION ALL
             |  SELECT 'insert' AS op, '0-DIFF' AS o_orderpriority FROM orders
             |  WHERE o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0)
             |GROUP BY op, o_orderpriority
             |ORDER BY op, o_orderpriority""".stripMargin)),

    // incremental view maintenance: the (status → count, sum) aggregate
    // maintained by folding per-version change-feed deltas must equal a
    // full recompute over the final table — each refresh read only the
    // delta files. The oracle IS the full recompute.
    "q_snapshot_incremental_agg" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft_ivm").toString
        val orders = t(s, dir, "orders")
        (0 to 2).foreach(i =>
          Snapshots.commit(orders.filter($"o_orderkey" % 3 === i), snapDir))
        Snapshots.incrementalCountSum(s, snapDir, "o_orderstatus", "o_totalprice")
          .select($"key".as("o_orderstatus"), $"n",
            round($"total", 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      bench = true), // timed: snapshot commits + delta-only incremental refresh

    // compaction losslessness: commit orders fragmented across 32 small
    // files, OPTIMIZE into ~1, read the compacted version back and
    // aggregate — the oracle aggregates the original table, so a dropped
    // or duplicated row in the rewrite breaks the hash. File-count
    // reduction itself is asserted in SnapshotsSpec.
    "q_snapshot_compaction" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft_compact").toString
        Snapshots.commit(t(s, dir, "orders").repartition(32), snapDir)
        Snapshots.compact(s, snapDir, targetFileBytes = 1L << 30)
        Snapshots.readLatest(s, snapDir)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // write-audit-publish: three audited commits — the middle one plants
    // negative prices and must bounce at the audit (no version published,
    // staging cleaned) — so the final table is exactly batches 0 and 2,
    // which is what the oracle replays
    "q_snapshot_wap" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.Expectations
        import graft.pipeline.Expectations.Rule
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft_wap").toString
        val o = t(s, dir, "orders")
        val rules = Seq(Rule("positive_price", $"o_totalprice" > 0),
          Rule("nonnull_key", $"o_orderkey".isNotNull))
        Expectations.auditedCommit(o.filter($"o_orderkey" % 3 === 0), snapDir, rules)
        try Expectations.auditedCommit(
            o.filter($"o_orderkey" % 3 === 1)
              .withColumn("o_totalprice", -$"o_totalprice"),
            snapDir, rules)
        catch { case _: Snapshots.AuditFailedException => () } // bounced
        Expectations.auditedCommit(o.filter($"o_orderkey" % 3 === 2), snapDir, rules)
        Snapshots.readLatest(s, snapDir)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderkey % 3 IN (0, 2)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // predicate delete: commit orders, delete one status, read the new
    // version — the oracle is the complement filter; rows where the
    // predicate would be NULL are kept (asserted separately in
    // SnapshotsSpec). The deleted rows must remain readable at v0
    // (time travel), which the second branch checks.
    "q_snapshot_delete" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft_del").toString
        Snapshots.commit(t(s, dir, "orders"), snapDir)
        Snapshots.deleteWhere(s, snapDir, $"o_orderstatus" === "F")
        def agg(v: Long) = Snapshots.readVersion(s, snapDir, v)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .withColumn("version", lit(v))
        agg(0L).unionByName(agg(1L))
          .select($"version", $"o_orderstatus", $"n", $"total")
          .orderBy($"version", $"o_orderstatus")
      },
      Some("""SELECT 0 AS version, o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY o_orderstatus
             |UNION ALL
             |SELECT 1 AS version, o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderstatus <> 'F'
             |GROUP BY o_orderstatus
             |ORDER BY version, o_orderstatus""".stripMargin)),

    // manifest data skipping: commit orders range-clustered on o_orderkey
    // with per-file min/max stats, then answer a key-windowed aggregate
    // through the pruned read path. The oracle filters the original table,
    // so a wrongly-skipped file (missing rows) or a bad residual filter
    // (extra rows) fails the hash; the pruning RATE itself is asserted in
    // SnapshotsSpec.
    "q_snapshot_skipping" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val snapDir = java.nio.file.Files
          .createTempDirectory("graft_skip").toString
        Snapshots.commit(t(s, dir, "orders").repartitionByRange(8, $"o_orderkey"),
          snapDir, statsCols = Seq("o_orderkey"))
        Snapshots.readVersionRange(s, snapDir, 0L, "o_orderkey",
            lo = Some("5000"), hi = Some("15000"))
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderkey BETWEEN 5000 AND 15000
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

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

    // WARC/1.0 round-trip (the Common Crawl wire format): documents →
    // per-record-gzip-member .warc.gz files (one per partition) → the
    // streaming file-parallel reader → headers + payload re-derived.
    // Deterministic record ids and the md5 payload digest are replayed
    // exactly in DuckDB, so any framing error on either side (header
    // bytes, Content-Length, member boundaries) fails the hash check.
    "q_warc_roundtrip" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val path = mrldaTmp("warc")
        Warc.write(Warc.fromDocuments(docs.repartition(4, $"doc_id"),
          "doc_id", "text", "source"), path, gzipPerRecord = true)
        Warc.read(s, path)
          .select(
            regexp_extract($"target_uri", "/([0-9]+)$", 1).cast("long").as("doc_id"),
            $"warc_type", $"record_id",
            $"content_length",
            md5($"payload").as("payload_md5"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, 'response' AS warc_type,
             |  '<urn:uuid:' || md5(CAST(doc_id AS VARCHAR)) || '>' AS record_id,
             |  CAST(strlen(text) AS BIGINT) AS content_length,
             |  md5(text) AS payload_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // the crawl-ingest capstone: HTML pages archived as WARC → the
    // streaming WARC reader → tag/entity strip → word-count gate →
    // exact dedup (keep smallest id per identical clean text). The
    // oracle replays every stage from the raw documents table, so a
    // defect anywhere in the chain (framing, gzip members, strip rules,
    // gate boundary, dedup policy) breaks the hash. The heavier
    // quality-rule set is pinned separately by q_quality_filter.
    "q_crawl_pipeline" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val html = concat(
          lit("<html><head><title>"), $"source",
          lit("</title></head><body><p>"), $"text",
          lit("</p><script>track("), $"doc_id",
          lit(");</script></body></html>"))
        val path = mrldaTmp("crawl")
        Warc.write(
          Warc.fromDocuments(docs.withColumn("html", html), "doc_id", "html", "source")
            .repartition(4, col("record_id")), path, gzipPerRecord = true)
        val cleaned = Warc.read(s, path)
          .select(
            regexp_extract($"target_uri", "/([0-9]+)$", 1).cast("long").as("doc_id"),
            graft.pipeline.Curation.stripHtml(decode($"payload", "UTF-8")).as("text_clean"))
        val gated = cleaned
          .withColumn("n_tokens", size(graft.pipeline.TextAnalysis.wsTokens($"text_clean")))
          .filter($"n_tokens" >= 5)
        gated.groupBy($"text_clean", $"n_tokens")
          .agg(min($"doc_id").as("doc_id"))
          .select($"doc_id", $"n_tokens", md5($"text_clean").as("text_md5"))
          .orderBy($"doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
             |  '<html><head><title>' || source || '</title></head><body><p>' ||
             |  text || '</p><script>track(' || doc_id ||
             |  ');</script></body></html>' AS html
             |  FROM documents),
             |st AS (SELECT doc_id, trim(regexp_replace(
             |  replace(replace(replace(replace(replace(replace(
             |    regexp_replace(regexp_replace(regexp_replace(html,
             |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
             |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
             |      '(?s)<[^>]*>', ' ', 'g'),
             |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
             |    '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
             |  '[ \t\n\f\r\x0B]+', ' ', 'g')) AS t
             |  FROM h),
             |g AS (SELECT doc_id, t, n FROM (
             |  SELECT doc_id, t,
             |    CAST(len(list_filter(string_split(t, ' '), x -> x <> '')) AS INT) AS n
             |  FROM st) WHERE n >= 5)
             |SELECT min(doc_id) AS doc_id, n AS n_tokens, md5(t) AS text_md5
             |FROM g GROUP BY t, n ORDER BY doc_id""".stripMargin)),

    // the reference's NATIVE corpus wire format: dictionary-encode the
    // documents table, export it as SequenceFile<IntWritable,
    // cc.mrlda.Document> (hand-rolled header/record framing — the class
    // isn't on any classpath here), read it back with the split-aware
    // native reader, and explode to (doc_id, term_id, cnt). The oracle
    // recomputes the dictionary encoding from raw text in DuckDB, so any
    // byte-framing error on either side fails the hash check.
    "q_seqfile_mrlda_docs" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val parsed = CorpusQueries.parsedCorpus(s, dir)
        val path = mrldaTmp("docs")
        // tiny sync interval so even the sf0.01 fixture crosses sync
        // markers and a sub-file split size exercises the range reader
        MrldaSequenceFile.writeDocs(parsed.docs, path, syncIntervalBytes = 512)
        MrldaSequenceFile.readDocs(s, path, splitBytes = 16 * 1024).toDF()
          .select($"docId".as("doc_id"), explode($"counts").as(Seq("term_id", "cnt")))
          .orderBy($"doc_id", $"term_id")
      },
      Some("""WITH dict AS (
             |  SELECT CAST(row_number() OVER (ORDER BY df DESC, tf DESC, token ASC) AS INT) AS term_id,
             |         token AS term
             |  FROM (SELECT token, count(DISTINCT doc_id) AS df, count(*) AS tf
             |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) u
             |        WHERE token <> '' GROUP BY token)),
             |tok AS (SELECT doc_id, token, count(*) AS cnt
             |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) u
             |        WHERE token <> '' GROUP BY doc_id, token)
             |SELECT t.doc_id, d.term_id, CAST(t.cnt AS INT) AS cnt
             |FROM tok t JOIN dict d ON t.token = d.term
             |ORDER BY doc_id, term_id""".stripMargin),
      bench = true), // timed: the native legacy-IO write+read path

    // the reference's term-index artifact (SequenceFile<IntWritable,
    // Text>, ParseCorpus.java:517-518): export the dictionary in that
    // layout, read it back with the native reader, oracle against the
    // from-scratch DuckDB dictionary
    "q_seqfile_mrlda_dict" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val parsed = CorpusQueries.parsedCorpus(s, dir)
        val path = mrldaTmp("dict")
        MrldaModelFiles.writeIntTextIndex(parsed.terms.toDF(), path, "termId", "term",
          syncIntervalBytes = 256)
        MrldaModelFiles.readIntTextIndex(s, path, "term_id", "term", splitBytes = 4 * 1024)
          .orderBy($"term_id")
      },
      Some("""SELECT CAST(row_number() OVER (ORDER BY df DESC, tf DESC, token ASC) AS INT) AS term_id,
             |       token AS term
             |FROM (SELECT token, count(DISTINCT doc_id) AS df, count(*) AS tf
             |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) u
             |      WHERE token <> '' GROUP BY token)
             |ORDER BY term_id""".stripMargin)),

    // the reference's informed-prior artifact (SequenceFile<IntWritable,
    // ArrayListOfIntsWritable>, InformedPrior.java:126-170): compile the
    // seed words, round-trip through the legacy layout, explode back
    "q_seqfile_mrlda_prior" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val parsed = CorpusQueries.parsedCorpus(s, dir)
        val seeds = Seq((1, "spark"), (1, "data"), (2, "join"), (2, "query"))
          .toDF("topic", "term")
        val compiled = graft.lda.InformedPrior.compile(seeds, parsed.terms)
          .groupBy($"topic")
          .agg(sort_array(collect_list($"termId")).as("termIds"))
        val path = mrldaTmp("prior")
        MrldaModelFiles.writeInformedPrior(compiled, path)
        MrldaModelFiles.readInformedPrior(s, path)
          .select($"topic", explode($"termIds").as("term_id"))
          .orderBy($"topic", $"term_id")
      },
      Some("""WITH dict AS (
             |  SELECT CAST(row_number() OVER (ORDER BY df DESC, tf DESC, token ASC) AS INT) AS term_id,
             |         token AS term
             |  FROM (SELECT token, count(DISTINCT doc_id) AS df, count(*) AS tf
             |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) u
             |        WHERE token <> '' GROUP BY token)),
             |seeds(topic, term) AS (VALUES (1, 'spark'), (1, 'data'), (2, 'join'), (2, 'query'))
             |SELECT s.topic, d.term_id FROM seeds s JOIN dict d ON s.term = d.term
             |ORDER BY s.topic, d.term_id""".stripMargin)),

    // polylingual variant: fixed language-slot framing
    // (polylda/Document.java:259-287), missing-language slots round-trip
    // as absent map keys
    "q_seqfile_mrlda_poly" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val parsed = PolyldaQueries.parsed(s, dir)
        val path = mrldaTmp("poly")
        MrldaSequenceFile.writePolyDocs(parsed.docs, path, numLanguages = 2,
          syncIntervalBytes = 512)
        MrldaSequenceFile.readPolyDocs(s, path, splitBytes = 16 * 1024).toDF()
          .select($"docId".as("doc_id"), explode($"counts").as(Seq("lang", "m")))
          .select($"doc_id", $"lang", explode($"m").as(Seq("term_id", "cnt")))
          .orderBy($"doc_id", $"lang", $"term_id")
      },
      Some("""WITH l0 AS (
             |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
             |  FROM documents),
             |l1 AS (
             |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
             |           x -> x <> '' AND len(x) % 2 = 0)) AS token
             |  FROM documents WHERE doc_id % 7 <> 0),
             |agg AS (
             |  SELECT CAST(0 AS INT) AS lang, token, count(DISTINCT doc_id) AS df, count(*) AS tf
             |  FROM l0 GROUP BY token
             |  UNION ALL
             |  SELECT CAST(1 AS INT), token, count(DISTINCT doc_id), count(*)
             |  FROM l1 GROUP BY token),
             |dict AS (
             |  SELECT lang,
             |         CAST(row_number() OVER (PARTITION BY lang ORDER BY df DESC, tf DESC, token ASC) AS INT) AS term_id,
             |         token FROM agg),
             |tok AS (
             |  SELECT doc_id, CAST(0 AS INT) AS lang, token, count(*) AS cnt
             |  FROM l0 GROUP BY doc_id, token
             |  UNION ALL
             |  SELECT doc_id, CAST(1 AS INT), token, count(*)
             |  FROM l1 GROUP BY doc_id, token)
             |SELECT t.doc_id, t.lang, d.term_id, CAST(t.cnt AS INT) AS cnt
             |FROM tok t JOIN dict d ON t.lang = d.lang AND t.token = d.token
             |ORDER BY t.doc_id, t.lang, d.term_id""".stripMargin)),

    // schema evolution across ingest epochs: an early epoch lacks a column
    // later epochs carry; mergeSchema reads the union with nulls filled —
    // the 100 TB reality of long-lived datasets. The oracle reconstructs
    // the same epoch split from the original table.
    "q_schema_evolution" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val base = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"),
          s"graft_schema_evo_${ProcessHandle.current().pid()}_${runs.incrementAndGet()}")
        val o = t(s, dir, "orders")
        o.filter($"o_orderkey" < 500)
          .select($"o_orderkey", $"o_totalprice")
          .write.mode("overwrite").parquet(base.resolve("epoch1").toString)
        o.filter($"o_orderkey" >= 500 && $"o_orderkey" < 1000)
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          .write.mode("overwrite").parquet(base.resolve("epoch2").toString)
        s.read.option("mergeSchema", "true")
          .parquet(base.resolve("epoch1").toString, base.resolve("epoch2").toString)
          .groupBy(coalesce($"o_orderstatus", lit("MISSING")).as("status"))
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"status")
      },
      Some("""SELECT CASE WHEN o_orderkey < 500 THEN 'MISSING'
             |            ELSE o_orderstatus END AS status,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderkey < 1000
             |GROUP BY 1 ORDER BY status""".stripMargin)),

    // corrupt-record tolerance: planted malformed JSON must not fail the
    // job — from_json yields null (PERMISSIVE), corrupt rows are counted
    // and excluded from the field aggregate, good rows parse unaffected
    "q_corrupt_tolerance" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val planted = Registry.events(s, dir).select($"event_id", $"event_type",
          when($"event_id" % 13 === 0,
            concat(substring($"props", 1, 6), lit("broken")))
            .otherwise($"props").as("props"))
        planted
          .select($"event_type",
            from_json($"props",
              org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k").as("k"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum(when($"k".isNull, 1).otherwise(0)).as("n_corrupt"),
            sum($"k").as("k_sum"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
             |  CAST(sum(CASE WHEN event_id % 13 <> 0
             |           THEN CAST(json_extract_string(props, '$.k') AS INT) END) AS BIGINT) AS k_sum
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // z-order layout: Morton curve over (partkey, suppkey) — the query
    // buckets the curve into 64 tiles and reports each tile's 2-D bounding
    // box, the exact stats a reader prunes files by. Full SQL replay of
    // the quantize + bit-interleave arithmetic (all integer-exact).
    "q_zorder_layout" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val withZ = graft.sources.ZOrder.withZValue(
          t(s, dir, "lineitem").select($"l_partkey", $"l_suppkey"),
          "l_partkey", "l_suppkey", bits = 16)
        withZ.withColumn("bucket", expr(s"z div ${1L << 26}L"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
            min($"l_partkey").as("min_pk"), max($"l_partkey").as("max_pk"),
            min($"l_suppkey").as("min_sk"), max($"l_suppkey").as("max_sk"))
          .orderBy($"bucket")
      },
      Some(zorderOracleSql)),

    // the N-dimensional curve: three BIGINT keys at 10 bits each (30-bit
    // word), tiled into 64 buckets with per-tile bounding boxes on ALL
    // three dimensions — same integer-exact replay as q_zorder_layout
    "q_zorder_multi" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val withZ = graft.sources.ZOrder.withZValueN(
          t(s, dir, "lineitem").select($"l_orderkey", $"l_partkey", $"l_suppkey"),
          Seq("l_orderkey", "l_partkey", "l_suppkey"), bits = 10)
        withZ.withColumn("bucket", expr(s"z div ${1L << 24}L"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
            min($"l_orderkey").as("min_ok"), max($"l_orderkey").as("max_ok"),
            min($"l_partkey").as("min_pk"), max($"l_partkey").as("max_pk"),
            min($"l_suppkey").as("min_sk"), max($"l_suppkey").as("max_sk"))
          .orderBy($"bucket")
      },
      Some(zorderMultiOracleSql)),

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

  /** DuckDB replay of `ZOrder.withZValueN(Seq(orderkey, partkey,
    * suppkey), bits = 10)`: bit b of column j lands at 3b + (2 − j). */
  private def zorderMultiOracleSql: String = {
    val terms = (0 until 10).flatMap(b => (0 until 3).map(j =>
      s"(((q$j >> $b) & 1) << ${b * 3 + (2 - j)})"))
      .mkString("\n           + ")
    s"""WITH s AS (
       |  SELECT min(l_orderkey) AS min0, max(l_orderkey) AS max0,
       |         min(l_partkey) AS min1, max(l_partkey) AS max1,
       |         min(l_suppkey) AS min2, max(l_suppkey) AS max2
       |  FROM lineitem),
       |q AS (
       |  SELECT l_orderkey, l_partkey, l_suppkey,
       |         ((l_orderkey - min0) * 1023) // greatest(max0 - min0, 1) AS q0,
       |         ((l_partkey - min1) * 1023) // greatest(max1 - min1, 1) AS q1,
       |         ((l_suppkey - min2) * 1023) // greatest(max2 - min2, 1) AS q2
       |  FROM lineitem, s),
       |z AS (SELECT l_orderkey, l_partkey, l_suppkey,
       |        $terms AS z
       |      FROM q)
       |SELECT z // ${1L << 24} AS bucket, count(*) AS n,
       |       min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
       |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
       |       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** DuckDB replay of `ZOrder.withZValue(bits = 16)` over lineitem:
    * same min/max bounds, same integer quantization (`//` = Spark `div`
    * on non-negative operands), same bit interleave, bucketed by the top
    * 6 curve bits. */
  private def zorderOracleSql: String = {
    val terms = (0 until 16).map(b =>
      s"(((qa >> $b) & 1) << ${2 * b + 1}) + (((qb >> $b) & 1) << ${2 * b})")
      .mkString("\n           + ")
    s"""WITH s AS (
       |  SELECT min(l_partkey) AS mina, max(l_partkey) AS maxa,
       |         min(l_suppkey) AS minb, max(l_suppkey) AS maxb
       |  FROM lineitem),
       |q AS (
       |  SELECT l_partkey, l_suppkey,
       |         ((l_partkey - mina) * 65535) // greatest(maxa - mina, 1) AS qa,
       |         ((l_suppkey - minb) * 65535) // greatest(maxb - minb, 1) AS qb
       |  FROM lineitem, s),
       |z AS (SELECT l_partkey, l_suppkey,
       |        $terms AS z
       |      FROM q)
       |SELECT z // 67108864 AS bucket, count(*) AS n,
       |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
       |       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }
}
