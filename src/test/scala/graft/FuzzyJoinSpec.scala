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

  test("longestPrefixJoin matches a naive startsWith scan on random data") {
    val rng = new scala.util.Random(47)
    def word(n: Int) = Seq.fill(n)(('a' + rng.nextInt(3)).toChar).mkString
    val facts = Seq.tabulate(300)(i => (i.toLong, word(2 + rng.nextInt(8))))
    val dictEntries = Seq.fill(40)(word(1 + rng.nextInt(5))).distinct
    val got = FuzzyJoin.longestPrefixJoin(
        facts.toDF("id", "s"), "id", "s",
        dictEntries.toDF("pfx"), "pfx")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("matched_prefix"))).toMap
    val expected = facts.map { case (id, s) =>
      id -> dictEntries.filter(s.startsWith).sortBy(-_.length).headOption
    }.toMap
    assert(got == expected)
  }

  // Values probed from DuckDB's jaro_winkler_similarity (the oracle
  // engine), which computes byte-level textbook Jaro–Winkler with boost
  // threshold 0.7, p=0.1, prefix cap 4; includes the classic textbook
  // pairs (Winkler 1990) and the byte-level unicode fingerprint.
  test("jaroWinkler kernel matches the DuckDB oracle definition exactly") {
    import graft.functions.TextKernels.jaroWinkler
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String): Double = jaroWinkler(u(a), u(b))
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)      // >0.7 but prefix 0
    assert(jw("abcdefgh", "abehcdfg") == 0.8952380952380953) // odd transposition count: integer halving
    assert(jw("aaaaaaaaab", "aaaaaaaaaz") == 0.96)           // prefix capped at 4
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)            // jaro ≤ 0.7: no boost despite prefix
    assert(jw("ababababab", "babababa") == 0.7666666666666666)
    assert(jw("éclair", "eclair") == 0.8492063492063492)     // BYTE-level: 'é' is 2 bytes
    assert(jw("ABC", "ABC") == 1.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("", "ABC") == 0.0)
    assert(jw("", "") == 0.0)                                // DuckDB's both-empty convention
  }

  test("entity resolution clusters transitively and keeps block pruning") {
    val df = Seq(
      (1L, "acme corp", "A"), (2L, "acme corp.", "A"), (3L, "acme korp", "A"),
      (4L, "zenith ltd", "A"), (5L, "acme corp", "B")
    ).toDF("id", "name", "blk")
    val out = graft.operators.EntityResolution
      .resolveEntities(df, "id", "name", col("blk"), threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getBoolean(3))).toMap
    // 1~2 and 2~3 chain into one entity even if 1~3 alone scored lower;
    // 5 matches nothing (different block despite identical name)
    assert(out(1L) == (1L, "acme corp", true))
    assert(out(2L)._1 == 1L && !out(2L)._3)
    assert(out(3L)._1 == 1L)
    assert(out(4L) == (4L, "zenith ltd", true))
    assert(out(5L) == (5L, "acme corp", true))
  }
}
