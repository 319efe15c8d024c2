package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fuzzy (edit-distance) key join via deletion-neighborhood blocking — the
 * SymSpell idea: two strings within Levenshtein distance 1 of each other
 * necessarily share a member of each other's {self + every single-character
 * deletion} set (equal → self; insert/delete → the shorter string itself;
 * substitution → the variant that deletes the differing character). So
 * exploding that neighborhood on both sides and equi-joining on the variant
 * produces a candidate superset, and one exact `levenshtein` check on the
 * (deduplicated) candidates finishes the join.
 *
 * Scale: |key| + 1 variant rows per key — linear blow-up, shuffled on the
 * variant string like any equi-join. Never a cross product, never a
 * per-pair distance matrix; the quadratic work a naive fuzzy join does is
 * replaced by hash lookups, which is why spell-correction at dictionary
 * scale uses exactly this shape.
 */
object FuzzyJoin {

  /** The term plus every single-character-deletion variant, deduplicated.
    * (`sequence` would count DOWN for an empty string, so guard it.) */
  def del1Neighborhood(term: Column): Column =
    when(length(term) < 1, array(term)).otherwise(
      array_distinct(concat(
        array(term),
        transform(sequence(lit(1), length(term)),
          i => concat(term.substr(lit(1), i - 1),
            term.substr(i + 1, length(term)))))))

  /**
   * Distinct (left key, right key, dist) pairs with Levenshtein distance
   * ≤ 1, computed by deletion-neighborhood blocking. Inputs are read as
   * key sets (distinct); callers join the pairs back onto their rows.
   */
  def fuzzyJoinDel1(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.select(col(leftKey).as("l_key")).distinct()
      .select($"l_key", explode(del1Neighborhood($"l_key")).as("variant"))
    val r = right.select(col(rightKey).as("r_key")).distinct()
      .select($"r_key", explode(del1Neighborhood($"r_key")).as("variant"))
    l.join(r, "variant")
      .select($"l_key", $"r_key").distinct()
      .withColumn("dist", levenshtein($"l_key", $"r_key"))
      .filter($"dist" <= 1)
  }

  /**
   * Longest-prefix-match join: each fact string matches the LONGEST
   * entry of a prefix dictionary that prefixes it — the routing-table /
   * category-tree / URL-path lookup. Scalable shape: the fact side
   * explodes one candidate substring PER DISTINCT DICT PREFIX LENGTH
   * (collected to the driver — the dictionary is model-sized by
   * assumption, and its distinct lengths are fewer still), the match is
   * a plain equi-join on the candidate string, and one max-of-struct
   * aggregate keeps the longest hit per fact row. Expansion factor =
   * #distinct prefix lengths, never O(string length), and never a
   * starts_with theta join (which Spark could only plan as a nested
   * loop).
   *
   * Facts with no matching prefix are kept with a null match
   * (left-join semantics). Returns the fact id, the fact string, the
   * matched prefix and its length.
   */
  def longestPrefixJoin(facts: DataFrame, idCol: String, factCol: String,
      dict: DataFrame, prefixCol: String): DataFrame = {
    val spark = facts.sparkSession
    import spark.implicits._
    val lengths = dict.select(length(col(prefixCol)).as("l")).distinct()
      .as[Int].collect().sorted
    require(lengths.nonEmpty, "prefix dictionary is empty")
    val candidates = facts.select(col(idCol).as("__fid"), col(factCol).as("__fact"))
      .withColumn("__cand",
        explode(array_distinct(array(lengths.map(l =>
          substring($"__fact", 1, l)): _*))))
    val d = dict.select(col(prefixCol).as("__cand")).distinct()
    val matched = candidates.join(d, "__cand")
      .groupBy($"__fid")
      .agg(max(struct(length($"__cand").as("plen"), $"__cand".as("pfx"))).as("__best"))
      .select($"__fid", $"__best.pfx".as("matched_prefix"),
        $"__best.plen".as("prefix_len"))
    facts.select(col(idCol).as("__fid"), col(factCol).as("__fact"))
      .join(matched, Seq("__fid"), "left")
      .select($"__fid".as(idCol), $"__fact".as(factCol),
        $"matched_prefix", $"prefix_len")
  }
}
