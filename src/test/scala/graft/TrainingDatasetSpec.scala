package graft

import graft.pipeline.{Curation, Dedup, Tokenizer, TrainingDataset}
import org.apache.spark.sql.functions._

/** End-to-end training-dataset build: conservation (every kept doc in
  * exactly one pack), token-budget compliance, tokenizer leak-freedom,
  * and determinism under repartitioning. */
class TrainingDatasetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val result =
    TrainingDataset.build(docs, "doc_id", "text", tokenBudget = 256L, numMerges = 60)

  test("every kept deduped doc lands in exactly one pack") {
    val kept = Curation.qualityFlags(docs, "text").filter($"keep")
      .select($"doc_id", $"text")
    val nDeduped = Dedup.exactDedup(kept, "doc_id", "text").count()
    assert(nDeduped > 0)
    assert(result.encoded.count() == nDeduped)
    assert(result.encoded.select($"doc_id").distinct().count() == nDeduped)
    val packedDocs = result.packs.agg(sum($"n_docs")).as[Long].head()
    assert(packedDocs == nDeduped, s"packed $packedDocs vs deduped $nDeduped")
  }

  test("every multi-doc pack respects the token budget") {
    // a single over-budget doc gets its own pack (by construction);
    // packs with 2+ docs must be within budget
    val over = result.packs.filter($"n_docs" >= 2 && $"pack_tokens" > 256L).count()
    assert(over == 0)
    assert(result.packs.filter($"pack_tokens" > 0).count() > 0)
  }

  test("pack token totals equal encode totals per split") {
    val fromPacks = result.packs.groupBy($"split")
      .agg(sum($"pack_tokens").as("t")).as[(String, Long)].collect().toMap
    val fromEncode = result.encoded.groupBy($"split")
      .agg(sum($"n_tokens").as("t")).as[(String, Long)].collect().toMap
    assert(fromPacks == fromEncode, s"$fromPacks vs $fromEncode")
  }

  test("the tokenizer is fitted on the train split only (leak-free)") {
    val kept = Curation.qualityFlags(docs, "text").filter($"keep")
      .select($"doc_id", $"text")
    val keepIds = Dedup.exactDedup(kept, "doc_id", "text").select($"keep_id".as("doc_id"))
    val deduped = kept.join(keepIds, "doc_id")
    val train = Curation.assignSplits(deduped, "doc_id",
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01))
      .filter($"split" === "train")
    val direct = Tokenizer.trainBpe(train, "text", numMerges = 60)
    assert(result.model.merges == direct.merges)
  }

  test("the build is deterministic under repartitioning") {
    val again = TrainingDataset.build(docs.repartition(7), "doc_id", "text",
      tokenBudget = 256L, numMerges = 60)
    assert(again.model.merges == result.model.merges)
    val a = result.packs.orderBy("split", "grp", "pack")
      .collect().map(_.toString).toSeq
    val b = again.packs.orderBy("split", "grp", "pack")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
