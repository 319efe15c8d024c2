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
  def pcaTopComponent(df: org.apache.spark.sql.DataFrame, vecCol: String,
      iterations: Int = 20): org.apache.spark.sql.DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = df.sparkSession
    import spark.implicits._
    val d = df.select(size(col(vecCol))).head().getInt(0)
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
    // power iteration, state rounded 10dp per step
    var v = Array.fill(d)(rnd(1.0 / math.sqrt(d), 10))
    var lambda = 0.0
    for (k <- 1 to iterations) {
      val w = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
        rnd(acc, 10)
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      if (k == iterations) lambda = rnd(nrm, 8)
      v = w.map(x => rnd(x / nrm, 10))
    }
    val trace = rnd((0 until d).map(cov(_)).zipWithIndex.map { case (r, i) => r(i) }.sum, 8)
    val ratio = rnd(lambda / trace, 6)
    spark.createDataFrame(
      (0 until d).map(i => PcaRow(i, mean(i), v(i), lambda, ratio)))
  }

  /**
   * The DuckDB replay of [[pcaTopComponent]]: covariance from an
   * explode-join (exact float→double products), then the power iteration
   * UNROLLED as one CTE triple (mat-vec, norm, normalize) per step — the
   * q_lr_classifier unrolled-trajectory pattern. `table`/`vecCol` name
   * the source; dimensions and iteration count must match the operator
   * call.
   */
  def pcaTopComponentOracleSql(table: String, vecCol: String, d: Int,
      iterations: Int): String = {
    // MATERIALIZED throughout: cov is referenced once per unrolled step,
    // and a plain CTE would re-run its whole chain (including the parquet
    // scan) per reference — the q_lr_classifier lesson
    val head =
      s"""WITH flat AS MATERIALIZED (
         |  SELECT vec_id, i - 1 AS i, CAST($vecCol[i] AS DOUBLE) AS x
         |  FROM $table, UNNEST(generate_series(1, $d)) t(i)),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM $table),
         |sums AS MATERIALIZED (SELECT i, sum(x) AS s FROM flat GROUP BY i),
         |xx AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxx
         |       FROM flat a JOIN flat b USING (vec_id) GROUP BY a.i, b.i),
         |cov AS MATERIALIZED (SELECT xx.i, xx.j,
         |          round((sxx - sa.s * sb.s / nn.n) / (nn.n - 1), 6) AS c
         |        FROM xx JOIN sums sa ON xx.i = sa.i
         |                JOIN sums sb ON xx.j = sb.i CROSS JOIN nn),
         |v0 AS MATERIALIZED (SELECT i - 1 AS i, round(1.0 / sqrt($d), 10) AS v
         |       FROM UNNEST(generate_series(1, $d)) t(i))""".stripMargin
    val steps = (1 to iterations).map { k =>
      s"""w$k AS MATERIALIZED (SELECT c.i, round(sum(c.c * v.v), 10) AS w
         |        FROM cov c JOIN v${k - 1} v ON c.j = v.i GROUP BY c.i),
         |n$k AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM w$k),
         |v$k AS MATERIALIZED (SELECT i, round(w / nrm, 10) AS v FROM w$k CROSS JOIN n$k)""".stripMargin
    }
    val tail =
      s"""lam AS (SELECT round(nrm, 8) AS lambda FROM n$iterations),
         |tr AS (SELECT round(sum(c), 8) AS trace FROM cov WHERE i = j),
         |mu AS (SELECT i, round(s / nn.n, 8) AS mean FROM sums CROSS JOIN nn)
         |SELECT v.i AS dim, mu.mean, v.v AS component, lam.lambda,
         |       round(lam.lambda / tr.trace, 6) AS explained_ratio
         |FROM v$iterations v JOIN mu ON v.i = mu.i CROSS JOIN lam CROSS JOIN tr
         |ORDER BY dim""".stripMargin
    (Seq(head) ++ steps :+ tail).mkString(",\n")
  }
}
