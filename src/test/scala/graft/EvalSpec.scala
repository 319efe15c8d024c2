package graft

import graft.corpus.ParseCorpus
import graft.lda.{Display, Eval, Trainer}
import org.apache.spark.sql.functions._

/** UMass coherence: hand-computed pin plus an end-to-end scoring of real
  * trained topics (the metric's intended use). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("umass coherence matches the hand-computed value") {
    // d1={a,b}, d2={a,b}, d3={a,c}; set ordered a(1), b(2), c(3):
    //   (b,a): ln((2+1)/3)=0;  (c,a): ln((1+1)/3);  (c,b): ln((0+1)/2)
    //   C = ln(2/3) + ln(1/2) = -1.098612
    val docs = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (3L, "c")) // duplicate (3,c) must not double-count
      .toDF("doc_id", "term")
    val sets = Seq((0, 1, "a"), (0, 2, "b"), (0, 3, "c"))
      .toDF("set_id", "rank", "term")
    val out = Eval.umassCoherence(docs, "doc_id", "term",
        sets, "set_id", "rank", "term")
      .as[(Int, Long, Double)].head()
    assert(out == ((0, 3L, -1.098612)), out)
  }

  test("perfectly co-occurring terms score higher than never-co-occurring ones") {
    val docs = (1L to 10L).flatMap(d => Seq((d, "x"), (d, "y"))) ++
      (11L to 15L).map(d => (d, "p")) ++ (16L to 20L).map(d => (d, "q"))
    val sets = Seq((0, 1, "x"), (0, 2, "y"), (1, 1, "p"), (1, 2, "q"))
      .toDF("set_id", "rank", "term")
    val out = Eval.umassCoherence(docs.toDF("doc_id", "term"), "doc_id", "term",
        sets, "set_id", "rank", "term")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(0) > out(1), s"co-occurring set must win: $out")
    assert(out(0) == 0.095310, s"ln(11/10) rounded: ${out(0)}") // ln((10+1)/10)
  }

  test("scores real trained topics end to end") {
    val docs = Registry_docs()
    val parsed = ParseCorpus.run(docs)
    val model = Trainer.train(parsed.docs, parsed.stats.numTerms.toInt,
      Trainer.Config(numTopics = 3, maxIterations = 2, localIterations = 10, seed = 1L))
    val top = Display.topTermsPerTopic(
      Display.betaToDF(spark, model), parsed.terms, k = 4)
    val tok = docs.select($"docId".as("doc_id"),
      explode(split($"text", " ")).as("term")).filter($"term" =!= "")
    val out = Eval.umassCoherence(tok, "doc_id", "term",
        top, "topic", "rank", "term")
      .collect()
    assert(out.length == 3, out.mkString(", "))
    assert(out.forall(r => !r.getDouble(2).isNaN && r.getDouble(2) <= 0.0001),
      "UMass coherence is a sum of log-probabilities-ish terms, ~never positive")
  }

  private def Registry_docs() =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id as docId", "cast(doc_id as string) as title", "text")

  test("isotonicCalibrate pools violators and is monotone (hand PAVA)") {
    import graft.pipeline.Classify
    // 6 units, 3 bins of 2 by score: bin means 1.0, 0.0, 0.5 — the
    // textbook violator: PAVA pools bins 1-2 to 0.5, then pools with
    // bin 3 (0.5) staying level => calibrated = [0.5, 0.5, 0.5]
    val df = Seq(
      (1L, 0.10, 1L), (2L, 0.15, 1L),
      (3L, 0.40, 0L), (4L, 0.45, 0L),
      (5L, 0.80, 1L), (6L, 0.85, 0L)
    ).toDF("id", "score", "y")
    val out = Classify.isotonicCalibrate(df, "id", "score", "y", nBins = 3)
      .orderBy($"bin").collect()
    assert(out.map(_.getDouble(4)).toSeq == Seq(0.5, 0.5, 0.5), out.toSeq)
    // a clean monotone case passes through unpooled
    val mono = Seq((1L, 0.1, 0L), (2L, 0.2, 0L), (3L, 0.5, 0L),
      (4L, 0.6, 1L), (5L, 0.8, 1L), (6L, 0.9, 1L)).toDF("id", "score", "y")
    val m = Classify.isotonicCalibrate(mono, "id", "score", "y", nBins = 3)
      .orderBy($"bin").collect().map(_.getDouble(4))
    assert(m.toSeq == Seq(0.0, 0.5, 1.0), m.toSeq)
    assert(m.sliding(2).forall(p => p(0) <= p(1)))
  }
}
