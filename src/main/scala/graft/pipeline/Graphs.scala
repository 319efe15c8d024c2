package graft.pipeline

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
      .distinct().localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("odeg"))
    // the edge⋈outdeg join is loop-invariant: materialize (src, dst, odeg)
    // once instead of re-joining it every iteration
    val edgesWithDeg = edges.join(outdeg, "src")
      .select($"src", $"dst", $"odeg").localCheckpoint()
    val srcs = outdeg.select($"src").localCheckpoint()
    var ranks = nodes.select($"node", round(lit(1.0 / n), 12).as("rank")).localCheckpoint()
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
        .localCheckpoint()
      // the superseded iteration's checkpoint blocks are dead — release
      // them, or executor storage grows linearly with iterations
      ranks.unpersist(blocking = false)
      ranks = next
    }
    ranks
  }
}
