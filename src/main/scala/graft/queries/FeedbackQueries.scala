package graft.queries

import org.apache.spark.sql.functions._

/**
 * Human-feedback and evaluation-data operators: inter-annotator agreement,
 * noisy-label aggregation, pairwise-preference fitting, and reference-based
 * text evaluation — the data-QA surface an RLHF / eval-set pipeline needs
 * on top of the curation families.
 */
object FeedbackQueries {

  val defs: Map[String, QueryDef] = Map(

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
             |FROM k, cov""".stripMargin))
  )
}
