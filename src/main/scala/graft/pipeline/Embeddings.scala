package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-column transforms for training-data preparation: L2
 * normalization and symmetric int8 quantization. Pure per-row expression
 * work — map-only at any scale, no UDFs.
 */
object Embeddings {

  /** x / ‖x‖₂ (zero vectors pass through unchanged). Norm via the native
    * codegen'd DotProduct expression — same FP order as the sum-of-squares
    * fold it replaced. */
  def l2Normalize(v: Column): Column = {
    val norm = graft.functions.vfunctions.vec_norm(v)
    when(norm > 0, transform(v, x => x / norm)).otherwise(v)
  }

  /** Symmetric per-vector int8 quantization: q_i = round(x_i · 127 / max|x|)
    * (zero vectors quantize to zeros). Returns array<int> in [-127, 127]. */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x)))
    when(maxAbs > 0,
      transform(v, x => round(x * lit(127.0) / maxAbs, 0).cast("int")))
      .otherwise(transform(v, x => lit(0)))
  }

  /** Seeded Gaussian projection planes (outDim × inDim), shared between
    * `randomProject` and the SQL oracle that replays it as literals. */
  def gaussianPlanes(outDim: Int, inDim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(outDim)(Seq.fill(inDim)(rng.nextGaussian()))
  }

  /** Johnson–Lindenstrauss random projection to `planes.length` output
    * dimensions: out_j = x · plane_j. The planes ride the plan as array
    * literals and each dot product is the native codegen'd DotProduct
    * expression — map-only at any scale, the standard cheap dimensionality
    * reduction before clustering or coarse ANN at 100 TB. */
  def randomProject(v: Column, planes: Seq[Seq[Double]]): Column =
    array(planes.map(p => graft.functions.vfunctions.vec_dot(v, typedlit(p))): _*)

  /** Round-half-away-from-zero at `dp` decimals over the EXACT double
    * value — the same semantics as Spark/DuckDB `round()`, used on the
    * driver so the power-iteration arithmetic matches the SQL replay. */
  private def rnd(x: Double, dp: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(dp, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-dimension result row of [[pcaTopComponent]]. */
  final case class PcaRow(dim: Int, mean: Double, component: Double,
      lambda: Double, explained_ratio: Double)

  /** Per-(component, dimension) result row of [[pcaComponents]]. */
  final case class PcaCompRow(comp: Int, dim: Int, mean: Double,
      component: Double, lambda: Double, explained_ratio: Double)

  /** Driver-side PCA model: per-dim means plus k (component, λ) pairs.
    * Model-sized (k·d doubles) — rides query plans as literals. */
  final case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], lambdas: Array[Double],
      trace: Double)

  /**
   * Distributed PCA, first principal component by power iteration — the
   * linear-algebra core of embedding whitening / SemDeDup-style analysis.
   *
   * Scale shape: the DATA work is ONE `treeAggregate` pass producing
   * d + d² running sums (for d=64 that's 33 KB of state per task — at
   * 100 TB still one scan and a tree reduce); everything after is
   * model-sized driver arithmetic on the d×d covariance, the same
   * posture as the IVF centroid loop. No row ever leaves its executor.
   *
   * Determinism contract (what makes a SQL oracle possible for an
   * eigen-computation): the covariance entries are rounded to 6dp and
   * the iteration state to 10dp each step, so both engines iterate the
   * IDENTICAL matrix with identical intermediate vectors regardless of
   * their summation orders — the same device as the IVF k-means' 4dp
   * centroids. The start vector is uniform 1/√d (exact for power-of-two
   * d) and both sides run exactly `iterations` steps, so even the
   * eigenvector's sign matches. λ is the final ‖C·v‖ (Rayleigh-equal at
   * convergence), explained ratio is λ/trace(C).
   */
  /** The distributed fit behind [[pcaComponents]]: one treeAggregate pass
    * for (n, Σx, Σxxᵀ), then model-sized driver power iteration with
    * Hotelling deflation (C ← C − λ·vvᵀ, re-rounded 6dp) between
    * components. All rounding anchors shared with the SQL oracle. */
  def fitPca(df: org.apache.spark.sql.DataFrame, vecCol: String,
      k: Int, iterations: Int): PcaModel = {
    require(iterations >= 1, "need at least one iteration")
    require(k >= 1, "need at least one component")
    import df.sparkSession.implicits._
    val d = df.select(size(col(vecCol))).head().getInt(0)
    require(k <= d, s"k=$k exceeds dimensionality $d")
    val data = df.select(col(vecCol).cast("array<double>")).as[Seq[Double]].rdd
      .map(_.toArray)
    // one pass: n, per-dim sums, upper-triangular cross-product sums
    val zero = (0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    val (n, s, sxxTri) = data.treeAggregate(zero)(
      seqOp = { case ((cnt, sa, xa), x) =>
        require(x.length == d, s"ragged vector: ${x.length} != $d")
        var i = 0; var t = 0
        while (i < d) {
          sa(i) += x(i)
          var j = i
          while (j < d) { xa(t) += x(i) * x(j); j += 1; t += 1 }
          i += 1
        }
        (cnt + 1, sa, xa)
      },
      combOp = { case ((c1, s1, x1), (c2, s2, x2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        var t = 0
        while (t < x1.length) { x1(t) += x2(t); t += 1 }
        (c1 + c2, s1, x1)
      })
    require(n >= 2, s"PCA needs at least 2 rows, got $n")
    // C_ij = (Σx_i x_j − S_i·S_j/n) / (n−1), rounded 6dp (parity anchor)
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    for (i <- 0 until d; j <- i until d) {
      val c = rnd((sxxTri(t) - s(i) * s(j) / n) / (n - 1), 6)
      cov(i)(j) = c; cov(j)(i) = c; t += 1
    }
    val mean = Array.tabulate(d)(i => rnd(s(i) / n, 8))
    val trace = rnd((0 until d).map(i => cov(i)(i)).sum, 8)
    val comps = Array.ofDim[Array[Double]](k)
    val lambdas = new Array[Double](k)
    // start vector ∝ (1, 2, …, d): deterministic and exactly SQL-
    // replayable like the uniform start, but NOT symmetric — a uniform
    // start is exactly orthogonal to any zero-sum direction (e.g. an
    // alternating component) and the iteration collapses to 0 on it
    val nrm0 = math.sqrt((1 to d).map(i => i.toDouble * i).sum)
    val vStart = Array.tabulate(d)(i => rnd((i + 1) / nrm0, 10))
    for (c <- 0 until k) {
      // power iteration, state rounded 10dp per step
      var v = vStart.clone()
      var lambda = 0.0
      for (it <- 1 to iterations) {
        val w = Array.tabulate(d) { i =>
          var acc = 0.0
          var j = 0
          while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
          rnd(acc, 10)
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        require(nrm > 0, s"power iteration collapsed at component $c step " +
          s"$it — start vector orthogonal to the data range")
        if (it == iterations) lambda = rnd(nrm, 8)
        v = w.map(x => rnd(x / nrm, 10))
      }
      comps(c) = v
      lambdas(c) = lambda
      if (c + 1 < k) { // deflate: C ← round(C − λ·vvᵀ, 6dp)
        for (i <- 0 until d; j <- 0 until d)
          cov(i)(j) = rnd(cov(i)(j) - lambda * v(i) * v(j), 6)
      }
    }
    PcaModel(mean, comps, lambdas, trace)
  }

  /** Top-k principal components as tidy rows (comp, dim, mean, component,
    * lambda, explained_ratio) — see [[fitPca]] for the scale shape and
    * determinism contract. */
  def pcaComponents(df: org.apache.spark.sql.DataFrame, vecCol: String,
      k: Int, iterations: Int = 20): org.apache.spark.sql.DataFrame = {
    val m = fitPca(df, vecCol, k, iterations)
    val d = m.mean.length
    df.sparkSession.createDataFrame(
      for (c <- 0 until k; i <- 0 until d) yield PcaCompRow(
        c, i, m.mean(i), m.components(c)(i), m.lambdas(c),
        rnd(m.lambdas(c) / m.trace, 6)))
  }

  def pcaTopComponent(df: org.apache.spark.sql.DataFrame, vecCol: String,
      iterations: Int = 20): org.apache.spark.sql.DataFrame = {
    import df.sparkSession.implicits._
    pcaComponents(df, vecCol, k = 1, iterations)
      .select($"dim", $"mean", $"component", $"lambda", $"explained_ratio")
  }

  /**
   * Project every vector onto the fitted components: score(x, c) =
   * (x − μ)·v_c, computed as x·v_c − (μ·v_c) with the components and the
   * precomputed mean offsets riding the plan as literals — map-only at
   * any scale via the codegen'd DotProduct, the same serving shape as
   * `randomProject`. Scores rounded 6dp (oracle parity).
   */
  def pcaScores(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, k: Int, iterations: Int = 20)
      : org.apache.spark.sql.DataFrame = {
    import df.sparkSession.implicits._
    val m = fitPca(df, vecCol, k, iterations)
    val scoreCols = (0 until k).map { c =>
      val v = m.components(c)
      val mu = m.mean.zip(v).map { case (a, b) => a * b }.sum
      struct(lit(c).as("comp"),
        round(graft.functions.vfunctions.vec_dot(
          col(vecCol).cast("array<double>"), typedlit(v.toSeq)) - lit(mu), 6)
          .as("score"))
    }
    df.select(col(idCol), explode(array(scoreCols: _*)).as("s"))
      .select(col(idCol), $"s.comp", $"s.score")
  }

  /**
   * The shared DuckDB CTE chain replaying [[fitPca]]: covariance from an
   * explode-join (exact float→double products), then per component the
   * power iteration UNROLLED as one CTE triple (mat-vec, norm, normalize)
   * per step, with a deflation CTE between components — the
   * q_lr_classifier unrolled-trajectory pattern. MATERIALIZED throughout:
   * the covariance is referenced once per unrolled step, and a plain CTE
   * would re-run its whole chain (parquet scan included) per reference.
   * Exposes: `mu(i, mean)`, `tr(trace)`, and per component c
   * `vf{c}(i, v)` (final vector) + `lam{c}(lambda)`.
   */
  private def pcaCteChain(table: String, vecCol: String, d: Int, k: Int,
      iterations: Int): String = {
    val head =
      s"""flat AS MATERIALIZED (
         |  SELECT vec_id, i - 1 AS i, CAST($vecCol[i] AS DOUBLE) AS x
         |  FROM $table, UNNEST(generate_series(1, $d)) t(i)),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM $table),
         |sums AS MATERIALIZED (SELECT i, sum(x) AS s FROM flat GROUP BY i),
         |xx AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxx
         |       FROM flat a JOIN flat b USING (vec_id) GROUP BY a.i, b.i),
         |cov0 AS MATERIALIZED (SELECT xx.i, xx.j,
         |          round((sxx - sa.s * sb.s / nn.n) / (nn.n - 1), 6) AS c
         |        FROM xx JOIN sums sa ON xx.i = sa.i
         |                JOIN sums sb ON xx.j = sb.i CROSS JOIN nn),
         |vstart AS MATERIALIZED (SELECT i - 1 AS i,
         |    round(i / sqrt((SELECT sum(j * j)
         |                    FROM UNNEST(generate_series(1, $d)) s(j))), 10) AS v
         |  FROM UNNEST(generate_series(1, $d)) t(i)),
         |tr AS MATERIALIZED (SELECT round(sum(c), 8) AS trace FROM cov0 WHERE i = j),
         |mu AS MATERIALIZED (SELECT i, round(s / nn.n, 8) AS mean
         |      FROM sums CROSS JOIN nn)""".stripMargin
    val perComp = (0 until k).flatMap { c =>
      val v0 =
        s"""v${c}_0 AS (SELECT i, v FROM vstart)""".stripMargin
      val steps = (1 to iterations).map { s =>
        s"""w${c}_$s AS MATERIALIZED (SELECT c.i, round(sum(c.c * v.v), 10) AS w
           |        FROM cov$c c JOIN v${c}_${s - 1} v ON c.j = v.i GROUP BY c.i),
           |n${c}_$s AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM w${c}_$s),
           |v${c}_$s AS MATERIALIZED (SELECT i, round(w / nrm, 10) AS v
           |        FROM w${c}_$s CROSS JOIN n${c}_$s)""".stripMargin
      }
      val fin =
        s"""lam$c AS MATERIALIZED (SELECT round(nrm, 8) AS lambda FROM n${c}_$iterations),
           |vf$c AS MATERIALIZED (SELECT i, v FROM v${c}_$iterations)""".stripMargin
      val deflate =
        if (c + 1 < k)
          Seq(s"""cov${c + 1} AS MATERIALIZED (
                 |  SELECT c.i, c.j,
                 |    round(c.c - lam$c.lambda * vi.v * vj.v, 6) AS c
                 |  FROM cov$c c JOIN vf$c vi ON c.i = vi.i
                 |               JOIN vf$c vj ON c.j = vj.i
                 |  CROSS JOIN lam$c)""".stripMargin)
        else Seq.empty
      Seq(v0) ++ steps ++ Seq(fin) ++ deflate
    }
    (Seq(head) ++ perComp).mkString(",\n")
  }

  /** DuckDB replay of [[pcaTopComponent]] (k = 1 output shape). */
  def pcaTopComponentOracleSql(table: String, vecCol: String, d: Int,
      iterations: Int): String =
    s"""WITH ${pcaCteChain(table, vecCol, d, 1, iterations)}
       |SELECT v.i AS dim, mu.mean, v.v AS component, lam0.lambda,
       |       round(lam0.lambda / tr.trace, 6) AS explained_ratio
       |FROM vf0 v JOIN mu ON v.i = mu.i CROSS JOIN lam0 CROSS JOIN tr
       |ORDER BY dim""".stripMargin

  /** DuckDB replay of [[pcaComponents]]. */
  def pcaComponentsOracleSql(table: String, vecCol: String, d: Int, k: Int,
      iterations: Int): String = {
    val selects = (0 until k).map { c =>
      s"""SELECT $c AS comp, v.i AS dim, mu.mean, v.v AS component,
         |  lam$c.lambda, round(lam$c.lambda / tr.trace, 6) AS explained_ratio
         |FROM vf$c v JOIN mu ON v.i = mu.i CROSS JOIN lam$c CROSS JOIN tr""".stripMargin
    }
    s"""WITH ${pcaCteChain(table, vecCol, d, k, iterations)}
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY comp, dim""".stripMargin
  }

  /** DuckDB replay of [[pcaScores]]: score = round(x·v − μ·v, 6). */
  def pcaScoresOracleSql(table: String, idCol: String, vecCol: String,
      d: Int, k: Int, iterations: Int): String = {
    val selects = (0 until k).map { c =>
      s"""SELECT f.vec_id AS $idCol, $c AS comp,
         |  round(sum(f.x * v.v) - (SELECT sum(m.mean * v2.v)
         |                          FROM mu m JOIN vf$c v2 ON m.i = v2.i), 6) AS score
         |FROM flat f JOIN vf$c v ON f.i = v.i
         |GROUP BY f.vec_id""".stripMargin
    }
    s"""WITH ${pcaCteChain(table, vecCol, d, k, iterations)}
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY $idCol, comp""".stripMargin
  }
}
