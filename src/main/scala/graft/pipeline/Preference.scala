package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise-preference operators for human-feedback data: Bradley–Terry
 * strength fitting over a win matrix and transitivity (cycle) screening
 * of the majority digraph — the QA a reward-model / RLHF comparison set
 * gets before training.
 *
 * Scale posture: raw comparisons are data-sized and reduce in ONE hash
 * aggregate to the win matrix, which is item²-bounded; everything after
 * (the MM fold, the cycle joins) runs on that bounded frame. The driver
 * fold guards its collect with an explicit item cap so a mis-keyed call
 * (e.g. fitting per-document instead of per-policy) fails loudly instead
 * of OOMing the driver.
 */
object Preference {

  /** (winner, loser) comparison rows → ordered-pair win counts
    * (i, j, wij = times i beat j). One hash aggregate. */
  def pairWins(cmp: DataFrame, winnerCol: String, loserCol: String): DataFrame =
    cmp.groupBy(col(winnerCol).cast("string").as("i"),
        col(loserCol).cast("string").as("j"))
      .agg(count(lit(1)).as("wij"))

  private def r10(x: Double): Double =
    BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Distinct-item guard evaluated DISTRIBUTED, before any collect — a
    * mis-keyed call (per-document instead of per-policy) fails with this
    * message instead of OOMing the driver on the collect itself. Callers
    * persist the pair frame first so the guard count and the collect
    * share one computation of the (possibly expensive) comparison join. */
  private def guardItemCount(op: String, pairFrame: DataFrame,
      maxItems: Int): Unit = {
    import pairFrame.sparkSession.implicits._
    val n = pairFrame.select($"i").union(pairFrame.select($"j"))
      .distinct().count()
    require(n <= maxItems,
      s"$op: $n items exceeds maxItems=$maxItems — " +
        "aggregate comparisons to a bounded item key before fitting")
  }

  /**
   * Bradley–Terry strengths via Hunter's (2004) MM iteration
   *   p_i ← w_i / Σ_{j≠i} n_ij/(p_i+p_j),  renormalized to Σp = 1,
   * from a [[pairWins]]-shaped frame. Every handoff (the per-pair MM
   * term, the raw update, the normalized strength) is anchored at 10dp
   * so an unrolled SQL replay reproduces the trajectory bit-for-bit
   * (the planted-EM device). Items beyond `maxItems` refuse the
   * driver-side fold. Returns (item, strength 6dp, rank) with rank
   * deterministic under ties (strength desc, item asc).
   */
  def bradleyTerry(wins: DataFrame, iters: Int = 6,
      maxItems: Int = 4096): DataFrame = {
    val spark = wins.sparkSession
    import spark.implicits._
    val slim = wins.select($"i".cast("string"), $"j".cast("string"),
      $"wij".cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    guardItemCount("bradleyTerry", slim, maxItems)
    val rows = slim.collect()
    slim.unpersist(blocking = false)
    val items = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    require(items.nonEmpty, "bradleyTerry: empty win matrix")

    val n = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    val w = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    rows.foreach { r =>
      val (i, j, c) = (r.getString(0), r.getString(1), r.getLong(2))
      n((i, j)) += c; n((j, i)) += c; w(i) += c
    }
    var p = items.map(i => i -> r10(1.0 / items.length)).toMap
    for (_ <- 1 to iters) {
      // mirror the SQL replay exactly: anchored per-pair terms, raw
      // update anchored, then anchored renormalization
      val praw = items.map { i =>
        val denom = items.iterator.filter(j => j != i && n.contains((i, j)))
          .map(j => r10(n((i, j)).toDouble / (p(i) + p(j)))).sum
        i -> (if (denom == 0.0) 0.0 else r10(w(i) / denom))
      }.toMap
      val s = items.iterator.map(praw).sum
      p = items.map(i => i -> r10(praw(i) / s)).toMap
    }
    val out = items.map(i => (i, p(i))).sortBy { case (i, pi) => (-pi, i) }
      .zipWithIndex
      .map { case ((i, pi), k) =>
        (i, BigDecimal(pi).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, k + 1) }
    spark.createDataFrame(out.toIndexedSeq)
      .toDF("item", "strength", "rank")
      .orderBy($"rank")
  }

  /**
   * Period-batched Elo ratings — the tournament ("simultaneous update")
   * variant: within a rating period every expected score is computed
   * against the PERIOD-START ratings, so the update order inside a
   * period cannot matter and the whole period reduces to one aggregate.
   * That is the form that parallelizes: sequential per-game Elo is an
   * ordered fold no engine can distribute, while per-period Elo is
   *   R'_i = R_i + K · Σ_{games g of i in period} (s_g − E_g),
   * one keyed aggregate per period over the (period, i, j) win counts.
   *
   * Scale posture: raw comparisons reduce in ONE distributed hash
   * aggregate to per-period pair counts (periods × item² bounded); the
   * period fold runs on the driver over that bounded frame, guarded by
   * `maxItems` like [[bradleyTerry]]. Every handoff is anchored — the
   * per-pair expected score at 10dp, per-pair delta terms summed as
   * exact decimals (order-free), the K-scaled update at 10dp — so an
   * unrolled per-period SQL replay reproduces the trajectory.
   *
   * `periods` fixes the replayable period grid (ascending); data rows
   * whose period is outside it refuse the fit rather than silently
   * reordering history. Returns (item, rating 6dp, games, rank).
   */
  def eloRatings(cmp: DataFrame, winnerCol: String, loserCol: String,
      periodCol: String, periods: Seq[String], kFactor: Double = 8.0,
      initialRating: Double = 1500.0, maxItems: Int = 4096): DataFrame =
    eloFromPairCounts(
      cmp.groupBy(col(periodCol).cast("string").as("p"),
          col(winnerCol).cast("string").as("i"),
          col(loserCol).cast("string").as("j"))
        .agg(count(lit(1)).as("c")),
      periods, kFactor, initialRating, maxItems)

  /** [[eloRatings]] from an already-aggregated (p, i, j, c) win-count
    * frame — the entry the streaming ingest uses on its drained state. */
  def eloFromPairCounts(pairCounts: DataFrame, periods: Seq[String],
      kFactor: Double = 8.0, initialRating: Double = 1500.0,
      maxItems: Int = 4096): DataFrame = {
    val spark = pairCounts.sparkSession
    import spark.implicits._
    val slim = pairCounts.select($"p".cast("string"), $"i".cast("string"),
      $"j".cast("string"), $"c".cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    guardItemCount("eloRatings", slim, maxItems)
    val pw = slim.collect()
    slim.unpersist(blocking = false)
    val items = pw.flatMap(r => Seq(r.getString(1), r.getString(2)))
      .distinct.sorted
    require(items.nonEmpty, "eloRatings: no comparisons")
    val badPeriods = pw.map(_.getString(0)).distinct.filterNot(periods.contains)
    require(badPeriods.isEmpty,
      s"eloRatings: periods ${badPeriods.mkString(",")} not in the declared grid")

    val byPeriod = pw.groupBy(_.getString(0))
    var r = items.map(_ -> r10(initialRating)).toMap
    val games = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (p <- periods) {
      // exact-decimal per-item delta sums: each per-pair term is an
      // exactly-rounded 10dp value, so summing as BigDecimal is
      // order-free — the SQL replay's DECIMAL sum lands on the same digits
      val delta = collection.mutable.Map.empty[String, BigDecimal]
        .withDefaultValue(BigDecimal(0))
      byPeriod.getOrElse(p, Array.empty).foreach { row =>
        val (i, j, c) = (row.getString(1), row.getString(2), row.getLong(3))
        val ei = r10(1.0 / (1.0 + math.pow(10.0, (r(j) - r(i)) / 400.0)))
        val ej = r10(1.0 / (1.0 + math.pow(10.0, (r(i) - r(j)) / 400.0)))
        delta(i) += BigDecimal(r10(c * (1.0 - ei)))
        delta(j) += BigDecimal(r10(c * (0.0 - ej)))
        games(i) += c; games(j) += c
      }
      r = items.map { i =>
        i -> r10(r(i) + r10(kFactor * delta(i).toDouble))
      }.toMap
    }
    val out = items.map { i =>
      (i, BigDecimal(r(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, games(i))
    }.sortBy { case (i, ri, _) => (-ri, i) }.zipWithIndex
      .map { case ((i, ri, g), k) => (i, ri, g, k + 1) }
    spark.createDataFrame(out.toIndexedSeq)
      .toDF("item", "rating", "games", "rank")
      .orderBy($"rank")
  }

  private def r12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Glicko's q constant, ln(10)/400 — written exactly as the SQL replay
    * computes it so both engines share the double. */
  private val GlickoQ: Double = math.log(10.0) / 400.0

  /** One player's Glicko-1 period update (Glickman 1999, steps 2a-2b)
    * from period-start (r, rd) and the aggregated opponent list
    * (rj, rdj, s, count). Anchors: g and E at 10dp, the d² terms at 12dp
    * and the delta terms at 10dp summed as exact decimals, the outputs at
    * 10dp. No games → unchanged (the caller applies the RD drift). */
  private[graft] def glickoStep(r: Double, rd: Double,
      games: Seq[(Double, Double, Double, Long)]): (Double, Double) = {
    if (games.isEmpty) return (r, rd)
    val q = GlickoQ
    var d2inv = BigDecimal(0)
    var delta = BigDecimal(0)
    games.foreach { case (rj, rdj, s, c) =>
      val g = r10(1.0 / math.sqrt(
        1.0 + 3.0 * q * q * rdj * rdj / (math.Pi * math.Pi)))
      val e = r10(1.0 / (1.0 + math.pow(10.0, -g * (r - rj) / 400.0)))
      d2inv += BigDecimal(r12(c * q * q * g * g * e * (1.0 - e)))
      delta += BigDecimal(r10(c * g * (s - e)))
    }
    val denom = r12(1.0 / (rd * rd) + d2inv.toDouble)
    (r10(r + q / denom * delta.toDouble),
      r10(math.sqrt(1.0 / denom)))
  }

  /**
   * Glicko-1 ratings (Glickman 1999) — the rating system DEFINED on
   * rating periods, so unlike Elo no batching approximation is involved:
   * each period drifts every player's deviation
   * (RD ← min(√(RD²+c²), RD₀)), then updates (r, RD) from that period's
   * games against period-START opponent parameters. Low-RD ratings are
   * trustworthy; high-RD players moved fast — the uncertainty signal Elo
   * lacks, which is what a comparison-data pipeline wants before trusting
   * a preference ranking.
   *
   * Same scale posture as [[eloRatings]]: ONE distributed aggregate to
   * per-period pair counts, a guarded driver fold over the bounded
   * frame, every handoff anchored so the per-period SQL replay lands on
   * identical digits. Returns (item, rating 6dp, rd 6dp, games, rank).
   */
  def glickoRatings(cmp: DataFrame, winnerCol: String, loserCol: String,
      periodCol: String, periods: Seq[String], c: Double = 63.2,
      initialRating: Double = 1500.0, initialRd: Double = 350.0,
      maxItems: Int = 4096): DataFrame =
    glickoFromPairCounts(
      cmp.groupBy(col(periodCol).cast("string").as("p"),
          col(winnerCol).cast("string").as("i"),
          col(loserCol).cast("string").as("j"))
        .agg(count(lit(1)).as("c")),
      periods, c, initialRating, initialRd, maxItems)

  /** [[glickoRatings]] from an already-aggregated (p, i, j, c) frame. */
  def glickoFromPairCounts(pairCounts: DataFrame, periods: Seq[String],
      c: Double = 63.2, initialRating: Double = 1500.0,
      initialRd: Double = 350.0, maxItems: Int = 4096): DataFrame = {
    val spark = pairCounts.sparkSession
    import spark.implicits._
    val slim = pairCounts.select($"p".cast("string"), $"i".cast("string"),
      $"j".cast("string"), $"c".cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    guardItemCount("glickoRatings", slim, maxItems)
    val pw = slim.collect()
    slim.unpersist(blocking = false)
    val items = pw.flatMap(r => Seq(r.getString(1), r.getString(2)))
      .distinct.sorted
    require(items.nonEmpty, "glickoRatings: no comparisons")
    val badPeriods = pw.map(_.getString(0)).distinct.filterNot(periods.contains)
    require(badPeriods.isEmpty,
      s"glickoRatings: periods ${badPeriods.mkString(",")} not in the declared grid")

    val byPeriod = pw.groupBy(_.getString(0))
    var state = items.map(_ -> (r10(initialRating), r10(initialRd))).toMap
    val gamesPlayed = collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for (p <- periods) {
      // step 1: deviation drift toward (capped at) the initial RD
      val drifted = state.map { case (i, (r, rd)) =>
        i -> (r, r10(math.min(math.sqrt(rd * rd + c * c), initialRd)))
      }
      // step 2: per-player updates against period-start opponent params
      val rows = byPeriod.getOrElse(p, Array.empty)
      val opp = collection.mutable.Map
        .empty[String, List[(Double, Double, Double, Long)]]
        .withDefaultValue(Nil)
      rows.foreach { row =>
        val (i, j, n) = (row.getString(1), row.getString(2), row.getLong(3))
        val (ri, rdi) = drifted(i)
        val (rj, rdj) = drifted(j)
        opp(i) = (rj, rdj, 1.0, n) :: opp(i)
        opp(j) = (ri, rdi, 0.0, n) :: opp(j)
        gamesPlayed(i) += n; gamesPlayed(j) += n
      }
      state = drifted.map { case (i, (r, rd)) =>
        i -> glickoStep(r, rd, opp(i))
      }
    }
    val out = items.map { i =>
      val (r, rd) = state(i)
      (i,
        BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(rd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        gamesPlayed(i))
    }.sortBy { case (i, r, _, _) => (-r, i) }.zipWithIndex
      .map { case ((i, r, rd, g), k) => (i, r, rd, g, k + 1) }
    spark.createDataFrame(out.toIndexedSeq)
      .toDF("item", "rating", "rd", "games", "rank")
      .orderBy($"rank")
  }

  /**
   * Transitivity screen: build the majority digraph (edge i→j when i
   * beats j strictly more often than j beats i; ties drop the pair) and
   * count directed 3-cycles against all closed triangles. A high cycle
   * rate means the comparison set has no consistent global ranking —
   * the canonical health check before fitting any preference model.
   * One row: (n_items, n_edges, n_triangles, n_cycles, cycle_rate 6dp).
   *
   * Joins run distributed on the item-pair-bounded edge frame; each
   * triangle/cycle is counted once via its minimum vertex.
   */
  def preferenceCycles(wins: DataFrame): DataFrame = {
    val spark = wins.sparkSession
    import spark.implicits._
    val wv = wins.select($"i".cast("string"), $"j".cast("string"),
      $"wij".cast("long"))
    val e = wv.as("a").join(wv.as("b"),
        $"a.i" === $"b.j" && $"a.j" === $"b.i", "left")
      .filter($"a.wij" > coalesce($"b.wij", lit(0L)))
      .select($"a.i".as("i"), $"a.j".as("j"))
    val und = e.select(least($"i", $"j").as("a"), greatest($"i", $"j").as("b"))
      .distinct()
    val nTriangles = und.as("ab").join(und.as("bc"), $"ab.b" === $"bc.a")
      .join(und.as("ac"), $"ac.a" === $"ab.a" && $"ac.b" === $"bc.b")
      .count()
    val nCycles = e.as("ab").join(e.as("bc"), $"ab.j" === $"bc.i")
      .join(e.as("ca"), $"bc.j" === $"ca.i" && $"ca.j" === $"ab.i")
      .filter($"ab.i" < $"ab.j" && $"ab.i" < $"bc.j")
      .count()
    val nItems = wv.select($"i").union(wv.select($"j")).distinct().count()
    val nEdges = e.count()
    val rate =
      if (nTriangles == 0) null
      else java.lang.Double.valueOf(BigDecimal(nCycles.toDouble / nTriangles)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    spark.range(1).select(lit(nItems).as("n_items"), lit(nEdges).as("n_edges"),
      lit(nTriangles).as("n_triangles"), lit(nCycles).as("n_cycles"),
      lit(rate).cast("double").as("cycle_rate"))
  }
}
