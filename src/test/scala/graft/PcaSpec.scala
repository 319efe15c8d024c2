package graft

import graft.pipeline.Embeddings
import org.apache.spark.sql.functions._

/** Correctness pins for the distributed PCA beyond the oracle's
  * determinism replay: a planted dominant direction must be recovered,
  * and the component must behave like an eigenvector (unit norm, λ equal
  * to the variance captured along it). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val d = 8

  test("recovers a planted dominant direction") {
    // data = t·u + ε with u the normalized alternating direction and the
    // noise two orders smaller: the top component must align with u
    val u = Array.tabulate(d)(i => if (i % 2 == 0) 1.0 else -1.0)
      .map(_ / math.sqrt(d))
    val rng = new java.util.Random(7)
    val rows = (1 to 300).map { id =>
      val t = rng.nextGaussian() * 5.0
      (id.toLong, Array.tabulate(d)(i => t * u(i) + rng.nextGaussian() * 0.05).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Embeddings.pcaTopComponent(df, "embedding", iterations = 30)
      .orderBy("dim").collect()
    val v = out.map(_.getAs[Double]("component"))
    val align = math.abs(v.zip(u).map { case (a, b) => a * b }.sum)
    assert(align > 0.999, s"top component misaligned with planted direction: $align")
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6, "component not unit norm")
    val ratio = out.head.getAs[Double]("explained_ratio")
    assert(ratio > 0.95, s"planted direction carries ~all variance, got $ratio")
    // λ ≈ variance of the projections t (σ²=25 planted, wide tolerance —
    // 300 draws of a χ²-ish statistic)
    val lambda = out.head.getAs[Double]("lambda")
    assert(lambda > 15 && lambda < 40, s"lambda implausible: $lambda")
  }

  test("isotropic data spreads explained variance evenly") {
    val rng = new java.util.Random(11)
    val rows = (1 to 400).map(id =>
      (id.toLong, Seq.fill(d)(rng.nextGaussian())))
    val out = Embeddings.pcaTopComponent(rows.toDF("vec_id", "embedding"),
      "embedding", iterations = 30).head()
    val ratio = out.getAs[Double]("explained_ratio")
    assert(ratio > 1.0 / d && ratio < 3.0 / d,
      s"isotropic top-component share should be near 1/d, got $ratio")
  }

  test("oracle SQL generator unrolls the requested iteration count") {
    val sql = Embeddings.pcaTopComponentOracleSql("embeddings", "embedding",
      d = 64, iterations = 20)
    assert(sql.contains("v20") && !sql.contains("v21"))
    assert(sql.contains("MATERIALIZED"), "plain CTEs re-scan per reference")
  }
}
