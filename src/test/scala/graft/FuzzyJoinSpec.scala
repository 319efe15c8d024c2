package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy join: the blocking must admit every
  * distance-≤1 pair (equal / insert / delete / substitute), the exact
  * check must reject candidate pairs at distance 2, and the neighborhood
  * expression must handle degenerate strings. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("del1Neighborhood: self plus each deletion, deduplicated, empty-safe") {
    val out = Seq("cat", "aa", "x", "").toDF("t")
      .select($"t", FuzzyJoin.del1Neighborhood($"t").as("nb"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(out("cat") == Set("cat", "at", "ct", "ca"))
    assert(out("aa") == Set("aa", "a")) // both deletions collapse
    assert(out("x") == Set("x", ""))
    assert(out("") == Set("")) // sequence(1,0) would count down; guard holds
  }

  test("fuzzyJoinDel1 finds all dist-≤1 pairs and only those") {
    val probes = Seq("cat", "hat", "ab", "mouse").toDF("p")
    val dict = Seq("cart", "cat", "dog", "hag", "ba", "house", "abcd").toDF("d")
    val pairs = FuzzyJoin.fuzzyJoinDel1(probes, "p", dict, "d")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pairs == Set(
      ("cat", "cat", 0),     // equal
      ("cat", "cart", 1),    // insertion
      ("hat", "cat", 1),     // substitution
      ("hat", "hag", 1),     // substitution
      ("mouse", "house", 1)  // substitution
    ))
    // "ab" vs "ba": shares variants "a"/"b" (a candidate) but levenshtein
    // is 2 — the exact check must drop it; "ab" vs "abcd" is distance 2
    // and never even a candidate
    assert(!pairs.exists(p => p._1 == "ab"))
  }
}
