package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality gates — the expectations pass a production
 * ingest runs before anything trains on the data: each rule is a named
 * predicate evaluated corpus-wide in ONE aggregate pass (conditional
 * counts, no per-rule scans), reported as (rule, violations, pass).
 * Uniqueness and referential integrity need their own keyed aggregates
 * and join, but still one pass per rule family, never per rule.
 */
object Expectations {

  /** A named row-level expectation: `pred` must hold for every row. */
  case class Rule(name: String, pred: Column)

  /** Row-level rules in one aggregate pass over `df`. Rule names are
    * identifiers (they travel through a generated `stack` expression —
    * free-form text would need escaping, so it is rejected instead). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules to check")
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_]+"),
      s"rule name must be an identifier ([A-Za-z0-9_]+): '${r.name}'"))
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = rules.map(r =>
      sum(when(!coalesce(r.pred, lit(false)), 1L).otherwise(0L)).as(r.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    // melt the 1-row wide result to (rule, violations) — stack is
    // codegen'd and keeps rule order
    val stacked = rules.map(r => s"'${r.name}', `${r.name}`").mkString(", ")
    row.selectExpr(s"stack(${rules.size}, $stacked) as (rule, violations)")
      .select($"rule", $"violations", ($"violations" === 0L).as("pass"))
  }

  /**
   * Write-audit-publish: commit `df` as the next snapshot version ONLY if
   * every rule holds on the STAGED files (Snapshots stages the parquet,
   * runs this audit on the staged read-back, and publishes the manifest
   * only on a clean report — a failed batch never becomes visible to any
   * reader and its staging files are deleted). Returns the published
   * version; throws `Snapshots.AuditFailedException` carrying the failed
   * rule rows otherwise. This is the ingestion gate every production
   * training-data table runs: bad batches bounce at the door instead of
   * being discovered downstream.
   */
  def auditedCommit(df: DataFrame, dir: String, rules: Seq[Rule],
      append: Boolean = true, statsCols: Seq[String] = Seq.empty): Long =
    graft.sources.Snapshots.commit(df, dir, append, expectedVersion = None,
      statsCols = statsCols, audit = Some(staged => check(staged, rules)))

  /** Key-uniqueness expectation: rows whose key occurs more than once
    * all count as violations (a keyed aggregate, scale-safe). */
  def checkUnique(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(when($"cnt" > 1, $"cnt").otherwise(0L)), lit(0L)).as("violations"))
      .select(lit(name).as("rule"), $"violations", ($"violations" === 0L).as("pass"))
  }

  /** Referential integrity: child rows whose key has no match in the
    * parent key set (left_anti join — at scale the parent side is the
    * smaller key projection and broadcasts or co-partitions). */
  def checkForeignKey(child: DataFrame, name: String, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val spark = child.sparkSession
    import spark.implicits._
    child.join(parent.select(col(parentKey)).distinct(),
        child(childKey) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("rule"), $"violations", ($"violations" === 0L).as("pass"))
  }
}
