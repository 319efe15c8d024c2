package graft

import graft.pipeline.Retrieval
import org.apache.spark.sql.functions._

/** Rank fusion must consume ranks only (scale-free), count list
  * membership, and break ties deterministically; the lexical ranker must
  * stay sparse (zero-overlap pairs never appear). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: hand-computed reciprocal ranks across two lists") {
    val l1 = Seq((7L, 10L, 0.9), (7L, 11L, 0.8), (7L, 12L, 0.7)).toDF("q", "id", "score")
    val l2 = Seq((7L, 11L, 10.0), (7L, 12L, 5.0), (7L, 13L, 1.0)).toDF("q", "id", "score")
    val out = Retrieval.rrfFuse(Seq(l1, l2), "q", "id", "score")
      .orderBy($"rrf".desc, $"id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // id 11: rank 2 in list1, rank 1 in list2 — the incomparable score
    // scales (0..1 vs 0..10) never mix, only the ranks do
    assert(out.toSeq == Seq(
      (11L, 2L, r6(1.0 / 62 + 1.0 / 61)),
      (12L, 2L, r6(1.0 / 63 + 1.0 / 62)),
      (10L, 1L, r6(1.0 / 61)),
      (13L, 1L, r6(1.0 / 63))))
  }

  test("lexicalJaccardTopK: sparse candidates, exact jaccard, self excluded") {
    val docs = Seq(
      (0L, "a b c"), (1L, "a b c d"), (2L, "x y"), (3L, "a a a")
    ).toDF("doc_id", "text")
    val out = Retrieval.lexicalJaccardTopK(docs, docs.filter($"doc_id" === 0), "doc_id", "text", k = 10)
      .orderBy($"rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // doc 2 shares nothing → absent (sparse); doc 3 distinct-set {a} → 1/3
    assert(out.toSeq == Seq(
      (0L, 1, 1L, 0.75),
      (0L, 2, 3L, 0.333333)))
  }

  test("mmrTopK diversifies: plain top-k is one cluster, MMR spans clusters") {
    // three tight clusters; the query sits in cluster 0, whose 10 members
    // dominate relevance — but they are near-duplicates of each other
    val rng = new scala.util.Random(19)
    val centers = Array.tabulate(3, 64)((c, j) => if (j % 3 == c) 4.0 else 0.5)
    val rows = (0 until 30).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rng.nextGaussian() * 0.05).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 0)
    val plain = graft.pipeline.Similarity
      .bruteForceTopK(df, q, "vec_id", "embedding", k = 5)
      .collect().map(_.getLong(2) % 3).toSet
    assert(plain == Set(0L), s"plain top-5 should be one cluster: $plain")
    val mmr = Retrieval.mmrTopK(df, q, "vec_id", "embedding",
      k = 5, poolSize = 20, lambda = 0.3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(mmr.length == 5 && mmr.map(_._1).toSet == Set(1, 2, 3, 4, 5), mmr.toSeq)
    val clusters = mmr.map(_._2 % 3).toSet
    assert(clusters.size >= 2, s"MMR picks span clusters: $clusters")
    // pick 1 is always the pure-relevance argmax
    val top1 = graft.pipeline.Similarity
      .bruteForceTopK(df, q, "vec_id", "embedding", k = 1)
      .head.getLong(2)
    assert(mmr.find(_._1 == 1).get._2 == top1)
  }

  test("rankingEval: hand-computed nDCG/MRR/AP on a 3-doc ranking") {
    // query q: ranked docs d1,d2,d3; grades d1=0, d2=2, d3=1 (+ d4=3 unranked)
    val ranking = Seq(("q", "d1", 1L), ("q", "d2", 2L), ("q", "d3", 3L))
      .toDF("query", "id", "rnk")
    val truth = Seq(("q", "d2", 2.0), ("q", "d3", 1.0), ("q", "d4", 3.0),
      ("q", "d1", 0.0)).toDF("query", "id", "rel")
    val out = Retrieval.rankingEval(ranking, truth,
      "query", "id", "rnk", "rel", k = 10).head()
    val dcg = 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    val idcg = 7.0 + 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    assert(math.abs(out.getDouble(1) - dcg / idcg) < 1e-6) // ndcg
    assert(out.getDouble(2) == 0.5) // first relevant at pos 2
    // AP: precision at rel positions (1/2, 2/3) over min(k, n_rel=3)
    assert(math.abs(out.getDouble(3) - (0.5 + 2.0 / 3.0) / 3.0) < 1e-6)
    assert(out.getLong(4) == 2 && out.getLong(5) == 3) // hits, n_rel
  }

  test("rankingEval: perfect ranking scores 1 everywhere, empty truth 0") {
    val ranking = Seq(("q", "a", 1L), ("q", "b", 2L), ("z", "a", 1L))
      .toDF("query", "id", "rnk")
    val truth = Seq(("q", "a", 2.0), ("q", "b", 1.0)).toDF("query", "id", "rel")
    val rows = Retrieval.rankingEval(ranking, truth,
      "query", "id", "rnk", "rel", k = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("q").getDouble(1) == 1.0 && rows("q").getDouble(2) == 1.0 &&
      rows("q").getDouble(3) == 1.0)
    assert(rows("z").getDouble(1) == 0.0 && rows("z").getDouble(2) == 0.0 &&
      rows("z").getLong(5) == 0)
  }
}
