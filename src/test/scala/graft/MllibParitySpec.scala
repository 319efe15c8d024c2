package graft

import graft.lda.Trainer
import graft.model.Doc
import org.apache.spark.ml.clustering.{DistributedLDAModel, LDA}
import org.apache.spark.ml.linalg.Vectors

/**
 * Independent cross-engine witness for the non-oracled LDA model outputs:
 * Spark MLlib's EM LDA (BASELINE.md's approach anchor) trained on the
 * same planted-topic corpus must recover the same topic → top-terms sets
 * as graft's trainer, and both variational likelihood bounds must land in
 * the same per-token band. The two engines share NO code — MLlib is
 * GraphX-based EM over a term-doc graph, graft is the reference's
 * variational algorithm — so agreement here pins the model semantics in
 * a way the sbt goldens (which are self-referential) cannot.
 */
class MllibParitySpec extends SparkSpec {

  private val numTopics = 3
  private val termsPerTopic = 10
  private val vocab = numTopics * termsPerTopic // ids 1..30

  /** 120 docs, 40 tokens each: 90% from the doc's planted topic block,
    * 10% uniform noise — seeded, so the corpus is identical per run. */
  private lazy val corpus: Seq[Doc] = {
    val rnd = new java.util.Random(7L)
    (0 until 120).map { i =>
      val t = i % numTopics
      val counts = scala.collection.mutable.Map.empty[Int, Int]
      (0 until 40).foreach { _ =>
        val term =
          if (rnd.nextDouble() < 0.9) t * termsPerTopic + rnd.nextInt(termsPerTopic) + 1
          else rnd.nextInt(vocab) + 1
        counts(term) = counts.getOrElse(term, 0) + 1
      }
      Doc(i.toLong, counts.toMap, counts.values.sum.toLong, None)
    }
  }

  private val planted: Seq[Set[Int]] =
    (0 until numTopics).map(t => (t * termsPerTopic + 1 to (t + 1) * termsPerTopic).toSet)

  private def jaccard(a: Set[Int], b: Set[Int]): Double =
    if (a.isEmpty && b.isEmpty) 1.0 else a.intersect(b).size.toDouble / a.union(b).size

  private def bestMatch(s: Set[Int], cands: Seq[Set[Int]]): Double =
    cands.map(jaccard(s, _)).max

  test("graft and MLlib EM recover the same planted topics; likelihoods land in one band") {
    import spark.implicits._

    // --- graft: the reference's variational EM ---
    val docs = corpus.toDS()
    val model = Trainer.train(docs, vocab,
      Trainer.Config(numTopics = numTopics, maxIterations = 15,
        localIterations = 50, seed = 11L))
    val graftTop: Seq[Set[Int]] = (0 until numTopics).map { t =>
      (1 to vocab).sortBy(id => -model.beta.get(id).map(_(t)).getOrElse(Double.MinValue))
        .take(termsPerTopic).toSet
    }

    // --- MLlib: EM optimizer over the identical doc-term matrix ---
    val features = corpus.map { d =>
      (d.docId, Vectors.sparse(vocab + 1,
        d.counts.toSeq.sortBy(_._1).map { case (id, c) => (id, c.toDouble) }))
    }.toDF("id", "features")
    val mllib = new LDA().setK(numTopics).setOptimizer("em")
      .setMaxIter(30).setSeed(11L).fit(features)
    val mllibTop: Seq[Set[Int]] = mllib.describeTopics(termsPerTopic)
      .select("termIndices").as[Seq[Int]].collect().toSeq.map(_.toSet)

    // both engines recover every planted topic...
    planted.foreach { p =>
      assert(bestMatch(p, graftTop) >= 0.5, s"graft missed planted $p: $graftTop")
      assert(bestMatch(p, mllibTop) >= 0.5, s"mllib missed planted $p: $mllibTop")
    }
    // ...and topic-for-topic, each engine's sets have a counterpart in the other's
    graftTop.foreach(g => assert(bestMatch(g, mllibTop) >= 0.5, s"$g vs $mllibTop"))
    mllibTop.foreach(m => assert(bestMatch(m, graftTop) >= 0.5, s"$m vs $graftTop"))

    // likelihood-band parity: graft's held-out variational bound per token
    // must land in the same band as MLlib's two finite anchors on the same
    // corpus — the EM model's trainingLogLikelihood and the online
    // optimizer's variational bound. (EM → toLocal → logLikelihood returns
    // NaN on this corpus — a known MLlib quirk — so it can't anchor.)
    val totalTokens = corpus.map(_.numTokens).sum.toDouble
    val (_, graftLL) = Trainer.infer(docs, model, localIterations = 50)
    val graftPerTok = graftLL / totalTokens
    val emPerTok = mllib.asInstanceOf[DistributedLDAModel]
      .trainingLogLikelihood / totalTokens
    val onlinePerTok = new LDA().setK(numTopics).setOptimizer("online")
      .setMaxIter(30).setSeed(11L).fit(features).logLikelihood(features) / totalTokens
    Seq("graft" -> graftPerTok, "em" -> emPerTok, "online" -> onlinePerTok).foreach {
      case (n, v) => assert(v < 0 && java.lang.Double.isFinite(v), s"$n per-token LL: $v")
    }
    for (anchor <- Seq(emPerTok, onlinePerTok)) {
      val ratio = graftPerTok / anchor
      assert(ratio > 1.0 / 3 && ratio < 3.0,
        s"per-token bounds diverge: graft=$graftPerTok em=$emPerTok online=$onlinePerTok")
    }
  }
}
