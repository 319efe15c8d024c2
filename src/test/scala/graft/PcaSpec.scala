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

  test("deflation yields an orthogonal second component with smaller variance") {
    // two planted directions with distinct strengths
    val u1 = Array.tabulate(d)(i => if (i < d / 2) 1.0 else 0.0).map(_ / 2.0)
    val u2 = Array.tabulate(d)(i => if (i >= d / 2) 1.0 else 0.0).map(_ / 2.0)
    val rng = new java.util.Random(3)
    val rows = (1 to 400).map { id =>
      val (t1, t2) = (rng.nextGaussian() * 6.0, rng.nextGaussian() * 2.0)
      (id.toLong, Array.tabulate(d)(i =>
        t1 * u1(i) + t2 * u2(i) + rng.nextGaussian() * 0.05).toSeq)
    }
    val out = Embeddings.pcaComponents(rows.toDF("vec_id", "embedding"),
      "embedding", k = 2, iterations = 30).orderBy("comp", "dim").collect()
    val v1 = out.filter(_.getAs[Int]("comp") == 0).map(_.getAs[Double]("component"))
    val v2 = out.filter(_.getAs[Int]("comp") == 1).map(_.getAs[Double]("component"))
    val dot = math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum)
    assert(dot < 1e-4, s"components not orthogonal: |v1·v2| = $dot")
    assert(math.abs(v1.zip(u1).map { case (a, b) => a * b }.sum) > 0.99, "comp 0 != u1")
    assert(math.abs(v2.zip(u2).map { case (a, b) => a * b }.sum) > 0.99, "comp 1 != u2")
    val l1 = out.find(_.getAs[Int]("comp") == 0).get.getAs[Double]("lambda")
    val l2 = out.find(_.getAs[Int]("comp") == 1).get.getAs[Double]("lambda")
    assert(l1 > l2 && l2 > 0, s"eigenvalues not ordered: $l1, $l2")
  }

  test("pcaScores recovers each row's planted coefficient") {
    val u = Array.tabulate(d)(i => if (i % 2 == 0) 1.0 else -1.0)
      .map(_ / math.sqrt(d))
    val rng = new java.util.Random(19)
    val planted = (1 to 200).map(id => id.toLong -> rng.nextGaussian() * 4.0).toMap
    val rows = planted.toSeq.map { case (id, t) =>
      (id, Array.tabulate(d)(i => t * u(i)).toSeq)
    }
    val scores = Embeddings.pcaScores(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1, iterations = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // score = (x − μ)·v = ±(t − mean_t) on noiseless rank-1 data; the
    // sign is the iteration's, so compare against both orientations
    val meanT = planted.values.sum / planted.size
    val errsPos = planted.map { case (id, t) => math.abs(scores(id) - (t - meanT)) }
    val errsNeg = planted.map { case (id, t) => math.abs(scores(id) + (t - meanT)) }
    assert(errsPos.max < 1e-3 || errsNeg.max < 1e-3,
      s"scores diverge from planted coefficients: ${math.min(errsPos.max, errsNeg.max)}")
  }

  test("oracle SQL generator unrolls the requested iteration count") {
    val sql = Embeddings.pcaTopComponentOracleSql("embeddings", "embedding",
      d = 64, iterations = 20)
    assert(sql.contains("v0_20") && !sql.contains("v0_21"))
    assert(sql.contains("MATERIALIZED"), "plain CTEs re-scan per reference")
    val sql2 = Embeddings.pcaComponentsOracleSql("embeddings", "embedding",
      d = 64, k = 2, iterations = 20)
    assert(sql2.contains("cov1") && sql2.contains("vf1") && !sql2.contains("cov2"),
      "k=2 chain must deflate exactly once")
  }
}
