package graft

import graft.pipeline.Graphs
import org.apache.spark.sql.functions._

/** PageRank against an in-test reference implementation (same 12dp
  * per-iteration rounding), plus the invariants: total mass 1, dangling
  * mass redistributed, hubs outrank leaves. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (3L, 5L)) // 5 dangles

  private def reference(iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var rank = nodes.map(_ -> r12(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outdeg.contains).map(rank).sum
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => rank(e._1) / outdeg(e._1)).sum }
      rank = nodes.map(v => v ->
        r12((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    rank
  }

  test("pageRank matches the reference trajectory, mass conserved") {
    for (iters <- Seq(1, 3)) {
      val got = Graphs.pageRank(edges.toDF("src", "dst"), "src", "dst",
          damping = 0.85, iterations = iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = reference(iters)
      assert(got.keySet == want.keySet)
      got.foreach { case (node, r) =>
        assert(math.abs(r - want(node)) < 1e-9, s"iters=$iters node=$node: $r vs ${want(node)}")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass must be conserved")
    }
  }

  test("authority ordering: the most-linked node outranks sources") {
    val got = Graphs.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // node 1 (in-links from 3 and 4) and 3 (from 1 and 2) dominate node 4
    // (no in-links: floor + dangling share only)
    assert(got(1L) > got(4L) && got(3L) > got(4L))
  }

  test("triangleCount: K4, K4 plus pendant, and a triangle-free path") {
    import spark.implicits._
    // K4: every vertex sits in C(3,2)=3 triangles, 4 triangles total
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = Graphs.triangleCount(k4.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got)
    // pendant vertex 5 joins no triangle and must not appear
    val withPendant = k4 :+ (4L, 5L)
    val got2 = Graphs.triangleCount(withPendant.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got, got2)
    // path graph: no triangles at all
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Graphs.triangleCount(path.toDF("src", "dst"), "src", "dst").count() == 0)
    // duplicate/reversed/self edges canonicalize away
    val messy = k4 ++ Seq((2L, 1L), (3L, 3L), (1L, 2L))
    val got3 = Graphs.triangleCount(messy.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3 == got, got3)
  }

  test("kCore peels a pendant chain off a K4 and keeps the clique") {
    // K4 on 1-4 plus chain 4-5-6: 3-core = exactly the K4 (needs TWO
    // peel rounds: dropping 6 first leaves 5 at degree 1)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core3 = Graphs.kCore(edges, "src", "dst", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core3)
    // k above the max core → empty, and the loop still converges
    assert(Graphs.kCore(edges, "src", "dst", k = 4).count() == 0)
    // 1-core keeps everything (self-loops were never edges)
    assert(Graphs.kCore(edges, "src", "dst", k = 1).count() == 6)
  }

  test("associationRules computes support, confidence, and lift exactly") {
    // 4 baskets: {a,b} x3, {a} x1 => n_a=4, n_b=3, n_ab=3
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (4L, "a")).toDF("basket", "item")
    val out = Graphs.associationRules(rows, "basket", "item", minPairCount = 2L)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("item_a") == "a" && r.getAs[String]("item_b") == "b")
    assert(r.getAs[Long]("n_ab") == 3L)
    assert(r.getAs[Double]("support") == 0.75)
    assert(r.getAs[Double]("confidence") == 0.75)   // 3/4 (a -> b)
    assert(r.getAs[Double]("lift") == 1.0)          // 0.75 / (1.0 * 0.75)
  }

  // two triangles {1,2,3} and {10,11,12} joined by the 3–10 bridge
  private val twoTriangles = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L))

  test("labelPropagation: hand-computed synchronous trajectory, both triangles settle") {
    // sync rounds with (count desc, label asc) argmax, hand-traced:
    // r1: 1→2 2→1 3→1 10→3 11→10 12→10
    // r2: 1→1 2→1 3→1 10→10 11→3 12→3
    // r3: 1→1 2→1 3→1 10→3 11→3 12→3   (stable from here)
    val expect3 = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 3L, 11L -> 3L, 12L -> 3L)
    val expect2 = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 3L, 12L -> 3L)
    def run(iters: Int) =
      Graphs.labelPropagation(twoTriangles.toDF("src", "dst"), "src", "dst", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(2) == expect2)
    assert(run(3) == expect3)
    assert(run(4) == expect3) // fixed point: the two communities persist
  }

  test("labelPropagation symmetrizes: direction of the input edges is irrelevant") {
    val flipped = twoTriangles.map { case (a, b) => (b, a) }
    val a = Graphs.labelPropagation(twoTriangles.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graphs.labelPropagation(flipped.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("shortestPaths: directed hop distances, settled nodes never relabeled") {
    val dirEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got2 = Graphs.shortestPaths(dirEdges, "src", "dst", seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got2 == Map(1L -> 0, 2L -> 1, 3L -> 2))
    // exhaustion before maxHops: node 5 only has an OUT-edge, stays absent
    val got10 = Graphs.shortestPaths(dirEdges, "src", "dst", seeds, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got10 == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("shortestPaths: multi-seed takes the nearest seed; off-graph seeds report 0") {
    val dirEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 1L)).toDF("src", "dst")
    val got = Graphs.shortestPaths(dirEdges, "src", "dst",
        Seq(1L, 4L, 99L).toDF("node"), maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 4 is a seed (dist 0, not 3); 99 is not in the graph but is still at
    // distance 0 from itself; the 3→4 rediscovery must not relabel 4
    assert(got == Map(1L -> 0, 4L -> 0, 99L -> 0, 2L -> 1, 3L -> 2))
  }

  test("linkPrediction: hand-computed wedge scores, direct edges excluded") {
    import graft.pipeline.Graphs
    // path 1-2-3 plus 2-4: pairs at distance 2 through hub 2 are
    // (1,3), (1,4), (3,4); deg(2) = 3, all others 1
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val out = Graphs.linkPrediction(edges, "src", "dst")
      .orderBy($"node_a", $"node_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val aa = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, aa, 1.0), (1L, 4L, 1L, aa, 1.0), (3L, 4L, 1L, aa, 1.0)),
      out.mkString(";"))
    // triangle: every 2-hop pair is also a direct edge -> empty result
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graphs.linkPrediction(tri, "src", "dst").count() == 0)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("coOccurrenceEdges: planted hot key is capped to the md5-order sample") {
    // hot key "h" has 20 members (uncapped: 190 pairs), key "c" has 3
    val rows = (1L to 20L).map(n => ("h", n)) ++
      Seq(("c", 100L), ("c", 101L), ("c", 102L))
    val got = Graphs.coOccurrenceEdges(rows.toDF("k", "n"), "k", "n", maxPerKey = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the cap FIRES: 8 survivors -> C(8,2)=28 pairs, plus the cold key's 3
    assert(got.size == 28 + 3, s"cap did not fire: ${got.size} edges")
    // survivors are exactly the 8 smallest by (md5(id), id) — the
    // deterministic draw the DuckDB oracle replays
    val want = (1L to 20L).sortBy(n => (md5hex(n.toString), n)).take(8).toSet
    val hotNodes = got.filter(_._1 < 100L).flatMap(e => Seq(e._1, e._2))
    assert(hotNodes == want, s"$hotNodes vs $want")
    got.foreach { case (s, d) => assert(s < d, "edges must be src < dst") }
  }

  test("coOccurrenceEdges: dedups across keys and ignores duplicate rows") {
    // pair (1,2) co-occurs under two keys and once via duplicate rows
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L), ("b", 3L))
    val got = Graphs.coOccurrenceEdges(rows.toDF("k", "n"), "k", "n", maxPerKey = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("coOccurrenceEdges: malformed ids neither vanish silently nor steal quota") {
    // 9 numeric members plus two un-castable ids on the same key: the
    // long cast nulls the latter, and nulls sort FIRST in an ascending
    // window — unfiltered they would consume 2 of the 8 cap slots and
    // then silently disappear in the src<dst filter
    val dirty = ((1L to 9L).map(n => ("k", n.toString)) ++
      Seq(("k", "xx"), ("k", null.asInstanceOf[String]))).toDF("k", "n")
    val clean = (1L to 9L).map(n => ("k", n.toString)).toDF("k", "n")
    val gotDirty = Graphs.coOccurrenceEdges(dirty, "k", "n", maxPerKey = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotClean = Graphs.coOccurrenceEdges(clean, "k", "n", maxPerKey = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotDirty == gotClean, "malformed ids changed the draw")
    assert(gotDirty.size == 28, s"full quota must go to real members: ${gotDirty.size}")
  }

  test("linkPrediction: maxDegree drops the hub and scores use post-filter degrees") {
    import graft.pipeline.Graphs
    // star around 10 (degree 3) plus a hub 99 touching 1..5 (degree 5):
    // with maxDegree = 4 the hub and ALL its edges leave the graph, so
    // 1/2/3 have post-filter degree 1 — and the Jaccard denominators
    // must say so (pre-cap degrees would give 1/(2+2-1) = 0.333333)
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (99L, 1L), (99L, 2L), (99L, 3L), (99L, 4L), (99L, 5L)).toDF("src", "dst")
    val out = Graphs.linkPrediction(edges, "src", "dst", maxDegree = 4L)
      .orderBy($"node_a", $"node_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val aa = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, aa, 1.0), (1L, 3L, 1L, aa, 1.0), (2L, 3L, 1L, aa, 1.0)),
      out.mkString(";"))
    // nothing mentions the dropped hub or its leaf-only neighbors
    val nodes = out.flatMap(t => Seq(t._1, t._2)).toSet
    assert(!nodes.contains(99L) && !nodes.contains(4L) && !nodes.contains(5L))
  }

  test("associationRules: an over-cap basket is dropped wholesale") {
    // b1/b2 buy {a,b}, b3 buys {a,c}, and "big" is a 6-item catalog
    // basket; with maxBasketSize = 5 the big basket leaves the pair
    // space AND the basket/item universe, so every statistic is over
    // the 3 surviving baskets
    val rows = (Seq(("b1", "a"), ("b1", "b"), ("b2", "a"), ("b2", "b"),
      ("b3", "a"), ("b3", "c")) ++
      Seq("a", "b", "c", "d", "e", "f").map(("big", _))).toDF("basket", "item")
    val capped = Graphs.associationRules(rows, "basket", "item",
        minPairCount = 2L, maxBasketSize = 5).collect()
    assert(capped.length == 1)
    val r = capped.head
    assert(r.getAs[String]("item_a") == "a" && r.getAs[String]("item_b") == "b")
    assert(r.getAs[Long]("n_ab") == 2L &&
      r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("support") == 0.666667 &&
      r.getAs[Double]("confidence") == 0.666667 &&
      r.getAs[Double]("lift") == 1.0)
    // uncapped, the big basket contributes: (a,c) reaches minPairCount
    val full = Graphs.associationRules(rows, "basket", "item",
        minPairCount = 2L).collect()
    assert(full.map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")))
      .toSet == Set(("a", "b"), ("a", "c")))
  }
}
