package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full LDA pipeline on sf0.001 — parse the documents corpus,
    * train K=5 topics, return the top-10 terms per topic. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all("lda_top_terms").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + pipeline ops. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (name, d) => name -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH/custom-hash/model queries) → rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (name, d) if d.oracle.isDefined => name -> d.oracle.get }

  /** Headline queries timed by Bench. */
  def benchQueries: Seq[String] =
    Registry.all.collect { case (name, d) if d.bench => name }.toSeq.sorted
}
