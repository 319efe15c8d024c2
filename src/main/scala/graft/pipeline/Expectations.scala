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
