package graft

import graft.pipeline.{Expectations, Profiling}
import graft.pipeline.Expectations.Rule
import org.apache.spark.sql.functions._

/** Data-quality gates: violation counting (including null predicates),
  * uniqueness and FK families, and PSI drift including the eps guard. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("check counts violations per rule; null predicate = violation") {
    val df = Seq((1, Some(5)), (2, Some(-1)), (3, None), (4, Some(60)))
      .toDF("id", "v")
    val out = Expectations.check(df, Seq(
        Rule("v_positive", $"v" > 0),
        Rule("v_small", $"v" < 50),
        Rule("id_positive", $"id" > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // null v fails both value rules (unknown ≠ verified)
    assert(out.toSeq == Seq(
      ("v_positive", 2L, false), ("v_small", 2L, false), ("id_positive", 0L, true)))
  }

  test("non-identifier rule names are rejected, not spliced into SQL") {
    val df = Seq(1).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(Rule("price isn't negative", $"v" >= 0)))
    }
    assert(e.getMessage.contains("identifier"))
  }

  test("uniqueness counts every member of a duplicated key; FK counts orphans") {
    val child = Seq((1, 10), (2, 10), (3, 11), (4, 99)).toDF("id", "k")
    val uniq = Expectations.checkUnique(child, "u", Seq("k")).collect().head
    assert((uniq.getLong(1), uniq.getBoolean(2)) == ((2L, false))) // both k=10 rows
    val parent = Seq(10, 11).toDF("pk")
    val fk = Expectations.checkForeignKey(child, "fk", "k", parent, "pk").collect().head
    assert((fk.getLong(1), fk.getBoolean(2)) == ((1L, false))) // k=99 orphan
    val clean = Expectations.checkUnique(Seq((1, 1), (2, 2)).toDF("id", "k"), "u", Seq("k"))
      .collect().head
    assert(clean.getLong(1) == 0L && clean.getBoolean(2))
  }

  test("psiDrift: zero on identical slices, positive on a shift, eps-finite") {
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val same = Profiling.psiDrift(base, base, "v", nBins = 5, lo = 0.0, hi = 100.0)
      .agg(sum(abs($"psi_contrib"))).head().getDouble(0)
    assert(same == 0.0)
    // shift all mass into the top half: strong positive PSI, and the
    // now-empty base-side bins hit the eps floor without going infinite
    val shifted = (1 to 100).map(_ => 90.0).toDF("v")
    val rows = Profiling.psiDrift(base, shifted, "v", nBins = 5, lo = 0.0, hi = 100.0)
      .collect().map(r => (r.getInt(0), r.getDouble(3)))
    val total = rows.map(_._2).sum
    assert(total > 0.25, s"expected a 'shifted' PSI, got $total") // conventional alert level
    assert(rows.forall(r => !r._2.isInfinite && !r._2.isNaN))
    // every bin appears even when one side is empty there
    assert(rows.map(_._1).toSeq == (0 until 5))
  }
}
