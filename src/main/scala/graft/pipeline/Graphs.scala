package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph measures over edge lists. Connected components (for
 * dedup clusters) lives in [[Curation.connectedComponents]]; this adds
 * PageRank — the classic link-graph quality prior a web-corpus pipeline
 * computes over its host/URL graph (Common Crawl publishes exactly this)
 * to weight or filter documents by source authority.
 */
object Graphs {

  /**
   * PageRank by power iteration with dangling-mass redistribution:
   *
   *   rank'(v) = (1−d)/N + d·( Σ_{u→v} rank(u)/outdeg(u) + dangling/N )
   *
   * Each iteration is one edge⋈rank shuffle join + a dst-keyed aggregate —
   * the textbook scalable shape (never an adjacency matrix, no driver
   * state beyond the scalar N). `localCheckpoint` truncates lineage per
   * iteration exactly like `Curation.connectedComponents`. Ranks are
   * rounded to 12dp each iteration so the trajectory is independent of FP
   * summation order — the same determinism device as the IVF k-means
   * (4dp centroids), which is what makes a SQL oracle replay the exact
   * fixed point.
   */
  def pageRank(edges0: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iterations: Int = 10): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges0.sparkSession
    import spark.implicits._
    val edges = edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().ckptSer()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct().ckptSer()
    val n = nodes.count()
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("odeg"))
    // the edge⋈outdeg join is loop-invariant: materialize (src, dst, odeg)
    // once instead of re-joining it every iteration — hash-partitioned by
    // src, the key every round's rank join uses, so localCheckpoint
    // captures the layout and only the node-sized rank side shuffles
    val edgesWithDeg = edges.join(outdeg, "src")
      .select($"src", $"dst", $"odeg").repartition($"src").ckptSer()
    val srcs = outdeg.select($"src").ckptSer()
    var ranks = nodes.select($"node", round(lit(1.0 / n), 12).as("rank")).ckptSer()
    for (_ <- 1 to iterations) {
      val dangling = ranks.join(srcs, ranks("node") === srcs("src"), "left_anti")
        .agg(coalesce(sum($"rank"), lit(0.0)).as("dm"))
      val contribs = edgesWithDeg
        .join(ranks, edgesWithDeg("src") === ranks("node"))
        .select($"dst".as("node"), ($"rank" / $"odeg").as("c"))
        .groupBy($"node").agg(sum($"c").as("contrib"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select($"node",
          round(lit((1 - damping) / n) +
            lit(damping) * (coalesce($"contrib", lit(0.0)) + $"dm" / n), 12).as("rank"))
        .ckptSer()
      // the superseded iteration's checkpoint blocks are dead — release
      // them, or executor storage grows linearly with iterations
      ranks.unpersist(blocking = false)
      ranks = next
    }
    ranks
  }

  /**
   * Personalized PageRank: the random walk teleports to the SEED set
   * (uniformly) instead of to every node — relevance relative to a
   * query set, the recsys/"related entities" variant. Same power
   * iteration, joins, 12dp anchors and checkpoint discipline as
   * `pageRank`; dangling mass also returns to the seeds. Nodes
   * unreachable from the seeds settle at rank 0 — that sparsity is the
   * point. `seeds`' single column is intersected with the graph's node
   * set before normalizing.
   */
  def personalizedPageRank(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, damping: Double = 0.85, iterations: Int = 10): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges0.sparkSession
    import spark.implicits._
    val edges = edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().ckptSer()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct().ckptSer()
    val seedSet = seeds.select(col(seeds.columns.head).cast("long").as("node"))
      .distinct().join(nodes, "node").ckptSer()
    val sc = seedSet.count()
    require(sc > 0, "no seed intersects the graph's node set")
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("odeg"))
    // loop-invariant, joined on src every round — pre-partition once
    // (same device as pageRank)
    val edgesWithDeg = edges.join(outdeg, "src")
      .select($"src", $"dst", $"odeg").repartition($"src").ckptSer()
    val srcs = outdeg.select($"src").ckptSer()
    val tele = nodes
      .join(seedSet.withColumn("__s", lit(1)), Seq("node"), "left")
      .select($"node",
        when($"__s".isNotNull, round(lit(1.0 / sc), 12)).otherwise(lit(0.0))
          .as("tele"))
      .ckptSer()
    var ranks = tele.select($"node", $"tele".as("rank")).ckptSer()
    for (_ <- 1 to iterations) {
      val dangling = ranks.join(srcs, ranks("node") === srcs("src"), "left_anti")
        .agg(coalesce(sum($"rank"), lit(0.0)).as("dm"))
      val contribs = edgesWithDeg
        .join(ranks, edgesWithDeg("src") === ranks("node"))
        .select($"dst".as("node"), ($"rank" / $"odeg").as("c"))
        .groupBy($"node").agg(sum($"c").as("contrib"))
      val next = tele.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select($"node",
          round(lit(1 - damping) * $"tele" +
            lit(damping) * (coalesce($"contrib", lit(0.0)) + $"dm" * $"tele"),
            12).as("rank"))
        .ckptSer()
      ranks.unpersist(blocking = false)
      ranks = next
    }
    ranks
  }

  /**
   * Per-node triangle counts by the degree-ordered edge-iterator
   * algorithm — the standard distributed formulation:
   *
   *  1. canonicalize to distinct undirected edges (a < b);
   *  2. orient every edge from its (degree, id)-smaller endpoint to the
   *     larger — an acyclic orientation whose max out-degree is O(√E)
   *     on any graph, which is what bounds the wedge join;
   *  3. wedges = pairs of out-neighbors (v, w) of a common u, ordered by
   *     the same (degree, id) total order;
   *  4. a wedge closes into a triangle iff the oriented edge v→w exists.
   *
   * Each triangle is found exactly once (u < v < w in orientation
   * order), then credited to all three vertices. Everything is
   * equi-joins + hash aggregates on integer counts — no FP, so a SQL
   * oracle replays it exactly. Returns (node, triangles) for nodes in
   * at least one triangle.
   */
  def triangleCount(edges0: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val und = edges0.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter($"a" =!= $"b")
      .distinct()
    val deg = und.select($"a".as("n")).union(und.select($"b".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("d"))
    // orient by (degree, id); carry the endpoint orders so the wedge
    // pairing below needs no extra degree join
    val oriented = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"), struct($"a", $"da", $"b", $"db"))
          .otherwise(struct($"b".as("a"), $"db".as("da"), $"a".as("b"), $"da".as("db"))).as("e"))
      .select($"e.a".as("u"), $"e.b".as("v"), $"e.db".as("dv"))
    val e1 = oriented.select($"u", $"v", $"dv")
    val e2 = oriented.select($"u", $"v".as("w"), $"dv".as("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .filter($"dv" < $"dw" || ($"dv" === $"dw" && $"v" < $"w"))
      .select($"u", $"v", $"w")
    val triangles = wedges.join(
      oriented.select($"u".as("v"), $"v".as("w")), Seq("v", "w"))
    triangles.select(explode(array($"u", $"v", $"w")).as("node"))
      .groupBy($"node").agg(count(lit(1)).as("triangles"))
  }

  /**
   * Hierarchical rollup (BOM explosion / org-chart aggregation): given
   * child→parent edges of a FOREST and a per-node value, every node's
   * subtree total (own value + all descendants) plus its depth. The
   * distributed shape is ancestor-closure-by-doubling: the (node,
   * ancestor) closure grows by joining the frontier onto itself —
   * O(log depth) rounds, each a plain equi-join, never a per-level
   * driver loop of depth length — then one aggregate credits each
   * node's value to all its ancestors. Closure size is n·depth rows
   * (the honest cost of subtree aggregation without a tree index).
   * Cycles make the doubling loop exceed `maxDepth` and throw.
   */
  def hierarchyRollup(edges: DataFrame, childCol: String, parentCol: String,
      values: DataFrame, idCol: String, valCol: String,
      maxDepth: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(childCol).cast("long").as("c"),
        col(parentCol).cast("long").as("p"))
      .filter($"c" =!= $"p").distinct().ckptSer()
    // closure starts as the direct edges (paths of length 1); PURE
    // doubling — compose the closure with itself — so after k rounds it
    // holds every path of length ≤ 2^k
    var closure = e.select($"c".as("node"), $"p".as("anc"))
      .ckptSer()
    val maxRounds = 32 - Integer.numberOfLeadingZeros(math.max(1, maxDepth - 1))
    var rounds = 0
    var grown = true
    while (grown && rounds < maxRounds) {
      val next = closure.join(
          closure.select($"node".as("anc"), $"anc".as("anc2")), "anc")
        .select($"node", $"anc2".as("anc"))
        .except(closure)
        .ckptSer()
      grown = next.count() > 0
      if (grown) {
        val merged = closure.union(next).distinct().ckptSer()
        closure.unpersist(blocking = false)
        closure = merged
      }
      // the frontier is folded into `merged` (or empty) either way —
      // release its checkpoint blocks in BOTH branches
      next.unpersist(blocking = false)
      rounds += 1
    }
    if (grown)
      throw new IllegalStateException(
        s"hierarchy deeper than $maxDepth (or cyclic) — rollup refused")
    val v = values.select(col(idCol).cast("long").as("node"),
      col(valCol).cast("double").as("v"))
    val descendantSums = closure.select($"anc".as("node"), $"node".as("desc"))
      .join(v.select($"node".as("desc"), $"v"), "desc")
      .groupBy($"node").agg(sum($"v").as("desc_sum"))
    val depths = closure.groupBy($"node").agg(count(lit(1)).as("depth"))
    // materialize the node-sized result, then release the n·depth
    // closure blocks — the caller holds only the small rollup frame
    val out = v.join(descendantSums, Seq("node"), "left")
      .join(depths, Seq("node"), "left")
      .select($"node", round($"v", 2).as("own_value"),
        round($"v" + coalesce($"desc_sum", lit(0.0)), 2).as("subtree_value"),
        coalesce($"depth", lit(0L)).as("depth"))
      .ckptSer()
    closure.unpersist(blocking = false)
    e.unpersist(blocking = false)
    out
  }

  /**
   * HITS hubs-and-authorities over a DIRECTED graph: a(v) = Σ h(u) over
   * in-edges, then h(u) = Σ a(v) over out-edges, each L1-normalized per
   * half-step — the classic bipartite-authority scorer next to
   * PageRank (here: customers as hubs, suppliers as authorities).
   * Each half-step is one edge⋈score join + a keyed aggregate + a
   * scalar normalizer; 12dp anchors after every normalization make the
   * trajectory engine-independent, same device as `pageRank`.
   */
  def hits(edges0: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges0.sparkSession
    import spark.implicits._
    val edges0n = edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().ckptSer()
    // the hub update joins on dst, the authority update on src — keep one
    // checkpointed copy per join key (2× edge storage for zero edge-side
    // shuffles across all iterations; the rank frames stay node-sized)
    val edges = edges0n.repartition($"src").ckptSer()
    val edgesByDst = edges0n.repartition($"dst").ckptSer()
    val nodes = edges0n.select($"src".as("node"))
      .union(edges0n.select($"dst".as("node"))).distinct().ckptSer()
    edges0n.unpersist(blocking = false)
    val n = nodes.count()
    var hubs = nodes.select($"node", round(lit(1.0 / n), 12).as("h")).ckptSer()
    var auths = nodes.select($"node", lit(0.0).as("a")).ckptSer()
    def normalized(df: DataFrame, c: String): DataFrame = {
      val tot = df.agg(sum(col(c)).as("__t"))
      df.crossJoin(broadcast(tot))
        .select($"node", round(col(c) / $"__t", 12).as(c))
    }
    for (_ <- 1 to iterations) {
      val aRaw = edges.join(hubs, edges("src") === hubs("node"))
        .groupBy($"dst".as("node")).agg(sum($"h").as("a"))
      val aNext = normalized(
        nodes.join(aRaw, Seq("node"), "left")
          .select($"node", coalesce($"a", lit(0.0)).as("a")), "a")
        .ckptSer()
      val hRaw = edgesByDst.join(aNext, edgesByDst("dst") === aNext("node"))
        .groupBy($"src".as("node")).agg(sum($"a").as("h"))
      val hNext = normalized(
        nodes.join(hRaw, Seq("node"), "left")
          .select($"node", coalesce($"h", lit(0.0)).as("h")), "h")
        .ckptSer()
      auths.unpersist(blocking = false)
      hubs.unpersist(blocking = false)
      auths = aNext
      hubs = hNext
    }
    hubs.join(auths, "node")
      .select($"node", $"h".as("hub"), $"a".as("authority"))
  }

  /**
   * k-core of an undirected graph: the maximal subgraph where every
   * node keeps degree ≥ k — the standard dense-community / spam-farm
   * peel. Iterative deletion: drop all nodes below degree k, recompute
   * degrees, repeat to the (unique, order-independent) fixpoint. Each
   * round is one degree aggregate + two semi-joins over the shrinking
   * edge list; ONE scalar action (edge count) decides convergence, and
   * `localCheckpoint` truncates lineage per round — the
   * connectedComponents posture. Returns surviving nodes with their
   * in-core degree.
   */
  def kCore(edges0: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIterations: Int = 50): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = edges0.sparkSession
    import spark.implicits._
    val base = edges0.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .filter($"s" =!= $"d")
    var e = base.union(base.select($"d".as("s"), $"s".as("d")))
      .distinct()
      .ckptSer()
    var n = e.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val deg = e.groupBy($"s").agg(count(lit(1)).as("__dg"))
        .filter($"__dg" >= k)
        .select($"s".as("__keep"))
      val next = e
        .join(deg.withColumnRenamed("__keep", "s"), Seq("s"), "left_semi")
        .join(deg.withColumnRenamed("__keep", "d"), Seq("d"), "left_semi")
        .select($"s", $"d")
        .ckptSer()
      val m = next.count()
      converged = m == n
      n = m
      // release the superseded round's checkpoint blocks (the pageRank
      // discipline — otherwise storage grows with peel depth)
      e.unpersist(blocking = false)
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore did not converge in $maxIterations peel rounds")
    e.groupBy($"s".as("node")).agg(count(lit(1)).as("degree"))
  }

  /**
   * Item–item collaborative filtering over binary (basket, item)
   * interactions: similarity(a, b) = n_ab / √(n_a·n_b) (cosine of the
   * binary co-occurrence vectors — the classic "customers also bought"
   * scorer), top-k neighbors per item. Same scale shape as
   * `associationRules`: basket-keyed self-join only, pair space pruned
   * by `minPairCount` BEFORE the marginal joins, then one item-keyed
   * window for the top-k cut. 6dp cosine, ties by neighbor id.
   */
  def itemItemCf(df: DataFrame, basketCol: String, itemCol: String,
      k: Int, minPairCount: Long = 2L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val itemCounts = items.groupBy($"item").agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a").join(items.as("b"), Seq("basket"))
      .filter($"a.item" =!= $"b.item")
      .groupBy($"a.item".as("item"), $"b.item".as("neighbor"))
      .agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= minPairCount)
    val scored = pairs
      .join(itemCounts.select($"item", $"n_item".as("n_a")), "item")
      .join(itemCounts.select($"item".as("neighbor"), $"n_item".as("n_b")),
        "neighbor")
      .withColumn("cosine",
        round($"n_ab" / sqrt($"n_a".cast("double") * $"n_b"), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"item")
      .orderBy($"cosine".desc, $"neighbor".asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"item", $"rnk", $"neighbor", $"n_ab", $"cosine")
  }

  /**
   * Pairwise association rules over (basket, item) rows — market-basket
   * support / confidence / lift, the co-occurrence screen behind
   * "frequently bought together" and feature-cooccurrence audits. For
   * each unordered item pair occurring in ≥ `minPairCount` baskets:
   * support = n_ab/n_baskets, confidence(a→b) = n_ab/n_a, lift =
   * support / (p_a·p_b).
   *
   * Scale shape: items self-join WITHIN a basket only (basket-keyed
   * equi-join) and the pair space is pruned by `minPairCount` BEFORE
   * the per-item joins; baskets are usually bounded (order line
   * counts), so the fan-out is per-basket-quadratic, never
   * corpus-quadratic — and `maxBasketSize` ENFORCES that bound rather
   * than assuming it: a basket with more than `maxBasketSize` distinct
   * items (a crawler session, a catalog-wide order — n items → n²/2
   * pair rows) is dropped WHOLESALE, from the pair space and the
   * basket/item universe alike, so supports, confidences and lifts all
   * describe the same filtered universe. The count comes from a window
   * over the basket key the self-join already shuffles on (the
   * capBuckets shape — no extra exchange). Item frequencies ride a
   * broadcast-sized join back onto the surviving pairs.
   */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 3L, maxBasketSize: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = Caps.capByCount(
      df.select(col(basketCol).as("basket"), col(itemCol).as("item")).distinct(),
      Seq("basket"), maxBasketSize)
    val nBaskets = items.select($"basket").distinct().count().toDouble
    val itemCounts = items.groupBy($"item").agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"), Seq("basket"))
      .filter($"a.item" < $"b.item")
      .groupBy($"a.item".as("item_a"), $"b.item".as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= minPairCount)
    pairs
      .join(itemCounts.select($"item".as("item_a"), $"n_item".as("n_a")), "item_a")
      .join(itemCounts.select($"item".as("item_b"), $"n_item".as("n_b")), "item_b")
      .select($"item_a", $"item_b", $"n_ab", $"n_a", $"n_b",
        round($"n_ab" / nBaskets, 6).as("support"),
        round($"n_ab".cast("double") / $"n_a", 6).as("confidence"),
        round(($"n_ab" / nBaskets) /
          (($"n_a" / nBaskets) * ($"n_b" / nBaskets)), 6).as("lift"))
  }

  /**
   * Community detection by synchronous label propagation (Raghavan et al.
   * 2007): every node starts as its own community; each round a node
   * adopts the most frequent label among its neighbors, ties broken by
   * the SMALLEST label. The async random-order original is
   * irreproducible by design; fixed synchronous rounds with a total
   * tie-break make the trajectory a deterministic relational recurrence
   * (so a SQL oracle replays it exactly), at the cost of possible
   * two-coloring oscillation on bipartite subgraphs — callers pick the
   * iteration budget, exactly like [[pageRank]].
   *
   * Each round is one edge⋈label shuffle join + a (node, label) count
   * aggregate + a per-node argmax — the argmax is `max(struct(count,
   * −label))`, a plain hash aggregate, NOT a window, so no per-node sort
   * and nothing single-task. Self-loops dropped, edges symmetrized and
   * deduped; isolated nodes never enter the edge list and are absent
   * from the output (they are their own singleton communities by
   * definition). `localCheckpoint` + unpersist per round is the
   * [[pageRank]] lineage discipline.
   *
   * @return (node, label) — label = the community representative's id
   */
  def labelPropagation(edges0: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges0.sparkSession
    import spark.implicits._
    val base = edges0
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .filter($"s" =!= $"d")
    // the edge list is loop-invariant and joined on `d` every round:
    // hash-partition it by the join key ONCE — localCheckpoint captures
    // the partitioning, so each round's edge⋈label join shuffles only the
    // node-sized label side, never the edge list (the dominant side by
    // the graph's average degree)
    val edges = base.union(base.select($"d".as("s"), $"s".as("d")))
      .distinct().repartition(col("d")).ckptSer()
    var labels = edges.select($"s".as("node")).distinct()
      .select($"node", $"node".as("label")).ckptSer()
    for (_ <- 1 to iterations) {
      // ONE exchange per round (r15): the join output is partitioned by
      // the join key `d`, so the old groupBy(s, label) → groupBy(s)
      // chain paid TWO exchanges — hash(s, label) then hash(s).
      // Repartitioning by `s` once lets BOTH aggregates run
      // exchange-free (HashPartitioning(s) satisfies the clustering of
      // (s, label) and of (s) — guide §2.4: operations keyed the same
      // way share one exchange).
      val counts = edges.join(labels, edges("d") === labels("node"))
        .select($"s", $"label")
        .repartition($"s")
        .groupBy($"s", $"label").agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) as a single hash aggregate:
      // max of (c, −label) is the top count with the smallest label
      val next = counts
        .groupBy($"s".as("node"))
        .agg(max(struct($"c", (-$"label").as("nl"))).as("m"))
        .select($"node", (-$"m.nl").as("label"))
        .ckptSer()
      labels.unpersist(blocking = false)
      labels = next
    }
    labels
  }

  /**
   * Multi-source BFS: hop distance from the nearest seed, frontier
   * expansion only — each round joins the EDGES against the newly
   * discovered frontier (not the settled set), anti-joins out nodes
   * already labeled, and appends the survivors at distance h. That is
   * the textbook distributed BFS shape: per-round work is proportional
   * to the frontier's out-edges, the settled set is only ever touched by
   * the anti-join, and nothing is re-relaxed (hop metric = first
   * discovery is optimal). One count per round for early exit;
   * `localCheckpoint` + unpersist per round as in [[pageRank]].
   *
   * Directed: follows `srcCol → dstCol` edges as given — pass a
   * symmetrized edge list for undirected distance. Seeds not present in
   * the graph still report distance 0 (they are their own component).
   *
   * @param seeds single-column DataFrame of seed node ids
   * @return (node, dist) for every node within `maxHops` of a seed
   */
  def shortestPaths(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "need at least one hop")
    val spark = edges0.sparkSession
    import spark.implicits._
    // loop-invariant, joined on s against every round's frontier —
    // pre-partition once so only the frontier side shuffles per hop
    val edges = edges0
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .filter($"s" =!= $"d")
      .distinct().repartition($"s").ckptSer()
    var frontier = seeds
      .select(col(seeds.columns.head).cast("long").as("node"))
      .distinct().ckptSer()
    var dist = frontier.select($"node", lit(0).as("dist")).ckptSer()
    var h = 0
    var exhausted = false
    while (h < maxHops && !exhausted) {
      h += 1
      val discovered = edges.join(frontier, edges("s") === frontier("node"))
        .select($"d".as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .ckptSer()
      if (discovered.isEmpty) { exhausted = true }
      else {
        val next = dist.union(discovered.select($"node", lit(h).as("dist")))
          .ckptSer()
        dist.unpersist(blocking = false)
        frontier.unpersist(blocking = false)
        dist = next
        frontier = discovered
      }
    }
    dist
  }

  /**
   * Link prediction scores (Liben-Nowell & Kleinberg 2003) for node
   * pairs at distance 2: common-neighbor count, Adamic–Adar
   * Σ 1/ln(deg(z)) over shared neighbors z (rarer mutual friends weigh
   * more), and neighborhood Jaccard — the classic "which edges are
   * missing" features for graph completion / recommendation. Existing
   * edges are anti-joined out; each pair appears once (a < b).
   * Adamic–Adar terms are 10dp-anchored and summed as exact decimals
   * (a shared neighbor has degree ≥ 2 by construction, so ln is safe).
   *
   * Scale: the wedge join is degree-bounded — nodes above `maxDegree`
   * drop first (the [[triangleCount]] hub posture: a 10⁵-degree hub
   * contributes 10¹⁰ wedges and no ranking signal); everything else is
   * keyed joins over the edge list. ALL scores are computed on the
   * hub-filtered subgraph: degrees, wedges, and the Jaccard
   * denominators are post-filter, so the numbers are internally
   * consistent (a node adjacent to a dropped hub loses that edge from
   * its degree too, not just from its wedge set).
   */
  def linkPrediction(edges0: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Long = 10000L): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val base = edges0
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .filter($"s" =!= $"d")
    val und = base.union(base.select($"d".as("s"), $"s".as("d"))).distinct()
    val deg0 = und.groupBy($"s".as("z")).agg(count(lit(1)).as("deg"))
    val keptNodes = deg0.filter($"deg" <= maxDegree).select($"z")
    val kept = und
      .join(keptNodes.select($"z".as("s")), Seq("s"), "left_semi")
      .join(keptNodes.select($"z".as("d")), Seq("d"), "left_semi")
    // degrees are RECOMPUTED on the hub-filtered subgraph so the
    // Adamic–Adar weights and the Jaccard denominators describe the
    // same graph the wedges were enumerated on — mixing pre-cap
    // degrees with post-cap wedges would under-count neighborhoods
    // adjacent to a dropped hub relative to their own denominators
    val deg = kept.groupBy($"s".as("z")).agg(count(lit(1)).as("deg"))
    val wedges = kept.select($"d".as("a"), $"s".as("z"))
      .join(kept.select($"s".as("z2"), $"d".as("b")), $"z" === $"z2")
      .filter($"a" < $"b")
      .join(deg, "z")
      .select($"a", $"b", round(lit(1.0) / log($"deg"), 10).as("__aa"))
    val cand = wedges.groupBy($"a", $"b")
      .agg(count(lit(1)).as("common_neighbors"),
        sum(round($"__aa" * 1e10).cast("decimal(38,0)")).as("__aa10"))
      .join(kept.select($"s".as("a"), $"d".as("b")), Seq("a", "b"),
        "left_anti")
    cand
      .join(deg.select($"z".as("a"), $"deg".as("__da")), "a")
      .join(deg.select($"z".as("b"), $"deg".as("__db")), "b")
      .select($"a".as("node_a"), $"b".as("node_b"), $"common_neighbors",
        round($"__aa10".cast("double") / 1e10, 6).as("adamic_adar"),
        round($"common_neighbors" /
          ($"__da" + $"__db" - $"common_neighbors"), 6).as("jaccard"))
  }

  /**
   * Capped co-occurrence edge builder: nodes sharing a key value become
   * pairwise edges (src < dst), but a key contributes at most
   * `maxPerKey` nodes to the pairing — the members are chosen by md5
   * order of the node id, a uniform, deterministic, engine-portable
   * draw (the `Curation.capPerKey` posture, replayable in SQL as
   * `row_number() OVER (PARTITION BY key ORDER BY md5(node::varchar),
   * node)`). This is THE safe way to lift "entities that co-occur in a
   * container" into a graph: uncapped, a hot key with n members emits
   * n(n−1)/2 pairs — a single 10⁵-member container is 5·10⁹ edges, a
   * stage-killer at scale — while the cap bounds every key's fan-out at
   * maxPerKey(maxPerKey−1)/2 regardless of skew, the
   * [[linkPrediction]] `maxDegree` / `triangleCount` hub discipline
   * applied one step earlier (at edge CONSTRUCTION, where the quadratic
   * actually detonates).
   *
   * Cost: one per-key window sort over the distinct (key, node) set —
   * node-sized, never pair-sized — then a key-keyed self-equi-join
   * whose per-key fan-out is bounded by the cap. The sampled subgraph
   * preserves community structure in expectation (the draw is uniform
   * within each key), which is what the downstream consumers
   * ([[labelPropagation]], [[linkPrediction]]) need from a
   * co-occurrence prior.
   *
   * @return (src, dst) with src < dst, deduped across keys
   */
  def coOccurrenceEdges(df: DataFrame, keyCol: String, nodeCol: String,
      maxPerKey: Int): DataFrame = {
    require(maxPerKey >= 2, s"maxPerKey must be >= 2 to pair: $maxPerKey")
    val spark = df.sparkSession
    import spark.implicits._
    // try_cast, then drop the resulting nulls: a malformed or null id
    // must neither abort the job (ANSI cast throws on bad strings) nor
    // enter the draw — nulls sort FIRST in an ascending Spark window,
    // so unfiltered they would consume cap quota (displacing real
    // members) and then vanish in the src<dst filter, a silent loss
    val kn = df.select(col(keyCol).as("__k"),
      col(nodeCol).try_cast(org.apache.spark.sql.types.LongType).as("__n"))
      .filter($"__n".isNotNull).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"__k")
      .orderBy(md5($"__n".cast("string")), $"__n")
    val kept = kn.withColumn("__rk", row_number().over(w))
      .filter($"__rk" <= maxPerKey)
      .select($"__k", $"__n")
    kept.as("x").join(kept.as("y"), Seq("__k"))
      .filter($"x.__n" < $"y.__n")
      .select($"x.__n".as("src"), $"y.__n".as("dst"))
      .distinct()
  }
}
