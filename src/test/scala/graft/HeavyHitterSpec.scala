package graft

import graft.pipeline.Sketches
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitter validation: the local-summary error bound, the
  * mergeable-summaries superset guarantee under eviction pressure
  * (vocabulary ≫ counters), and the end-to-end exactness of the two-pass
  * operator against a direct groupBy. */
class HeavyHitterSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(keys: Seq[String]): Map[String, Long] =
    keys.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("mgLocal is exact while the vocabulary fits the counters") {
    val stream = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val (sum, n) = Sketches.mgLocal(stream.iterator, m = 8)
    assert(n == 9L)
    assert(sum == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("mgLocal under eviction: never overcounts, undercounts by <= n/(m+1)") {
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
        Seq.tabulate(500)(i => s"t${rnd.nextInt(400)}"))
    val m = 9
    val (sum, n) = Sketches.mgLocal(stream.iterator, m)
    assert(n == stream.size.toLong)
    assert(sum.size <= m)
    val exact = exactCounts(stream)
    val bound = n / (m + 1)
    sum.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k overcounted")
      assert(exact(k) - c <= bound, s"$k undercounted past n/(m+1)")
    }
    // superset guarantee: every key with true count > n/(m+1) survives
    exact.collect { case (k, c) if c > bound => k }
      .foreach(k => assert(sum.contains(k), s"heavy key $k evicted"))
  }

  test("mgMerge compression preserves the guarantee across a merge tree") {
    val rnd = new scala.util.Random(13)
    val all = rnd.shuffle(
      Seq.fill(250)("big") ++ Seq.fill(120)("mid") ++
        Seq.tabulate(600)(i => s"t${rnd.nextInt(350)}"))
    val m = 11
    val parts = all.grouped(97).toSeq
    val summaries = parts.map(p => Sketches.mgLocal(p.iterator, m))
    val n = summaries.map(_._2).sum
    val merged = summaries.map(_._1)
      .foldLeft(Map.empty[String, Long])(Sketches.mgMerge(_, _, m))
    assert(merged.size <= m)
    val exact = exactCounts(all)
    val bound = n / (m + 1)
    merged.foreach { case (k, c) => assert(c <= exact(k)) }
    exact.collect { case (k, c) if c > bound => k }
      .foreach(k => assert(merged.contains(k), s"heavy key $k lost in merge"))
  }

  test("heavyHitters is exact on skewed multi-partition data, vocab >> counters") {
    val rnd = new scala.util.Random(29)
    val keys = rnd.shuffle(
      Seq.fill(400)("h1") ++ Seq.fill(250)("h2") ++ Seq.fill(130)("h3") ++
        Seq.tabulate(700)(i => s"tail${rnd.nextInt(450)}"))
    val df = keys.toDF("k").repartition(7)
    val k = 10
    val out = Sketches.heavyHitters(df, "k", k = k, m = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = exactCounts(keys)
    val expected = exact.filter(_._2 > keys.size.toLong / k)
    assert(out == expected)
    assert(out.contains("h1") && out.contains("h2")) // the fixture has real HHs
  }

  test("heavyHitters ignores null keys (threshold over non-null count only)") {
    val df = (Seq.fill(40)(Some("hot")) ++ Seq.fill(10)(Option.empty[String]) ++
      Seq.tabulate(20)(i => Some(s"t$i"))).toDF("k").repartition(3)
    val out = Sketches.heavyHitters(df, "k", k = 3, m = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n = 60 non-null, threshold 20: only "hot" (40) passes
    assert(out == Map("hot" -> 40L))
  }

  test("heavyHitters on empty input returns an empty (key, cnt) frame") {
    val df = spark.emptyDataset[String].toDF("k")
    val out = Sketches.heavyHitters(df, "k", k = 5)
    assert(out.columns.toSeq == Seq("k", "cnt"))
    assert(out.count() == 0)
  }

  test("heavyHitters rejects a counter budget that cannot certify n/k") {
    val df = Seq("a", "b").toDF("k")
    val e = intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, "k", k = 20, m = 4)
    }
    assert(e.getMessage.contains("superset guarantee"))
  }
}
