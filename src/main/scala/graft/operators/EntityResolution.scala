package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.tfunctions
import graft.pipeline.Curation

/**
 * Record linkage / entity resolution: blocked Jaro–Winkler candidate
 * scoring plus transitive closure into entity clusters — the classic
 * dedup shape for NAMES (people, products, merchants) where
 * edit-distance blocking (FuzzyJoin) is too strict and shingle MinHash
 * (Dedup) too loose for short strings.
 *
 * Scale posture mirrors the LSH dedup path: candidates come only from
 * equi-joined BLOCKS (never a global cross join), oversized blocks are
 * dropped-and-loggable via `maxBlockSize` (the drop-and-log posture of
 * Dedup.capBuckets — a block that big means the blocking key is
 * degenerate and needs refinement, not a quadratic grind), and the
 * transitive-closure step runs over the sparse match edge list only
 * (Curation.connectedComponents — shuffles edges, never the corpus).
 * The Jaro–Winkler scorer is a codegen'd expression
 * (functions/TextExpressions.scala JaroWinkler) running byte-level over
 * UTF8String inside whole-stage codegen.
 */
object EntityResolution {

  /**
   * Matched (id_a, id_b, score) pairs: records sharing a blocking key
   * are scored with Jaro–Winkler on `nameCol`, keeping pairs with
   * round(score, 6) >= threshold (the rounding anchors the threshold
   * comparison to what a SQL replay computes). id_a < id_b, so each
   * pair appears once. Blocks larger than `maxBlockSize` are dropped
   * entirely (count them with `hotBlocks` before relying on this).
   */
  def jaroWinklerPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, threshold: Double,
      maxBlockSize: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("__id"),
        col(nameCol).as("__name"), blockKey.as("__block"))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy($"__block")))
      .filter($"__bn" <= maxBlockSize)
      .drop("__bn")
    val a = base.select($"__id".as("id_a"), $"__name".as("name_a"), $"__block")
    val b = base.select($"__id".as("id_b"), $"__name".as("name_b"), $"__block")
    a.join(b, Seq("__block"))
      .filter($"id_a" < $"id_b")
      .withColumn("score", round(tfunctions.jaro_winkler($"name_a", $"name_b"), 6))
      .filter($"score" >= threshold)
      .select($"id_a", $"id_b", $"score")
  }

  /** Blocks `jaroWinklerPairs` would drop at this cap, with populations —
    * the "log" half of drop-and-log. */
  def hotBlocks(df: DataFrame, blockKey: Column, maxBlockSize: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy(blockKey.as("block")).agg(count(lit(1)).as("n"))
      .filter($"n" > maxBlockSize)
  }

  /**
   * Full resolution: every record labeled with its entity cluster (the
   * smallest member id, via connected components over the match pairs;
   * unmatched records are their own singleton entity) plus the
   * canonical name (the name of that smallest member) and whether this
   * row IS the canonical representative.
   */
  def resolveEntities(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, threshold: Double,
      maxBlockSize: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = jaroWinklerPairs(df, idCol, nameCol, blockKey, threshold, maxBlockSize)
    val labeled = Curation.dedupClusters(df, idCol, pairs.select($"id_a", $"id_b"))
      .select($"id", $"cluster".as("entity_id"), $"keep".as("is_canonical"))
    val canon = df.select(col(idCol).cast("long").as("entity_id"),
      col(nameCol).as("canonical_name"))
    labeled.join(canon, "entity_id")
      .select($"id", $"entity_id", $"canonical_name", $"is_canonical")
  }
}
