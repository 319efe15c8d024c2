package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The capstone composition: raw documents → a packed, tokenized training
 * dataset — every stage an operator this engine already verifies on its
 * own, chained the way a production data build chains them:
 *
 *  1. quality gate ([[Curation.qualityFlags]] `keep`)
 *  2. exact dedup, keep-smallest-id ([[Dedup.exactDedup]])
 *  3. deterministic train/val/test split ([[Curation.assignSplits]])
 *  4. BPE training on the TRAIN split ONLY — tokenizer fitting is a
 *     form of training, so fitting it on val/test would leak
 *  5. distributed encode of EVERY split with the train-fitted model
 *  6. per-split sequence packing to the token budget
 *     ([[Chunking.packSequences]] over a synthetic one-token-per-word
 *     text — packing consumes token COUNTS, not text)
 *
 * Output: one row per pack — (split, grp, pack, n_docs, pack_tokens).
 * Corpus-scale stages are all map/hash-agg shaped (each stage's scale
 * posture is pinned by its own operator's tests); the only driver-side
 * state is the BPE merge table (model-sized by construction).
 *
 * Not SQL-expressible (the tokenizer sits mid-pipeline), so the registry
 * row is rows-only; TrainingDatasetSpec pins conservation (every kept
 * doc lands in exactly one pack), budget compliance, leak-freedom (the
 * model equals one trained on the train split alone), and determinism.
 */
object TrainingDataset {

  case class Result(
      model: Tokenizer.BpeModel,
      encoded: DataFrame, // (doc_id, split, n_tokens)
      packs: DataFrame)   // (split, grp, pack, n_docs, pack_tokens)

  def build(docs: DataFrame, idCol: String, textCol: String,
      tokenBudget: Long = 512L,
      numMerges: Int = 200,
      fractions: Seq[(String, Double)] = Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      numGroups: Int = 4): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    val kept = Curation.qualityFlags(docs, textCol).filter($"keep")
      .select(col(idCol), col(textCol))
    val keepIds = Dedup.exactDedup(kept, idCol, textCol).select($"keep_id".as(idCol))
    val deduped = kept.join(keepIds, idCol)
    // eager checkpoint (r15): `split` feeds FOUR independent subtrees
    // (the BPE trainer's word-frequency scan, the encode scan, the
    // split-label join-back, and — through `encoded` — the packer);
    // without it each consumer re-ran the whole gate → exact-dedup →
    // split chain from the scan (guide §1.2 step 1 — don't compute
    // things twice). ckptSer posture as in Dedup (reference-tracked
    // blocks, eager to dodge the lazy-checkpoint deadlock window).
    val split = Curation.assignSplits(deduped, idCol, fractions).ckptSer()

    val model = Tokenizer.trainBpe(
      split.filter($"split" === "train"), textCol, numMerges)

    // eager checkpoint (r15): the packer below filters `encoded` once
    // per split — three recomputations of the distributed BPE encode
    // (the pipeline's most expensive per-row stage) before this was
    // materialized once
    val encoded = Tokenizer.bpeEncode(split, idCol, textCol, model)
      .join(split.select(col(idCol).cast("long").as("doc_id"), $"split"), "doc_id")
      .select($"doc_id", $"split", $"n_tokens")
      .ckptSer()

    // the packer consumes the BPE token counts the encode stage already
    // produced. Packing runs once per split (three filtered passes), so
    // splits can never share a pack.
    val packs = fractions.map(_._1).map { s =>
      Chunking.packSequencesFromCounts(
          encoded.filter($"split" === s), "doc_id", "n_tokens",
          tokenBudget, numGroups)
        .groupBy($"grp", $"pack")
        .agg(count(lit(1)).as("n_docs"), sum($"tokens").as("pack_tokens"))
        .select(lit(s).as("split"), $"grp", $"pack", $"n_docs", $"pack_tokens")
    }.reduce(_.unionByName(_))

    Result(model, encoded, packs)
  }

  /**
   * Deterministic uniform negative sampling for contrastive training:
   * each anchor gets `k` pseudo-random OTHER rows, drawn by an
   * md5-derived index into the id-ranked corpus (`Dedup.baseHash60` —
   * the engine's standard replayable draw) with a +1-mod-n bump when the
   * draw lands on the anchor itself. The complement to
   * `Similarity.hardNegativesTopK`: uniform negatives for the bulk of a
   * batch, hard negatives for the informative tail.
   *
   * Scale shape: the id→index map is the corpus-build ranking (sort +
   * per-partition offsets — no single-partition window); the draw is
   * map-only; resolving indices back to ids is one join keyed by the
   * index. Returns (anchor_id, slot, negative_id).
   */
  def negativeSample(df: DataFrame, idCol: String, k: Int,
      salt: String = "neg"): DataFrame = {
    require(k >= 1, "need at least one negative per anchor")
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    require(n >= 2, s"negative sampling needs at least 2 rows, got $n")
    val ranked = graft.corpus.ParseCorpus.rankByIndex(
        df.select(col(idCol).cast("long").as("id")), Seq(col("id").asc), "rank")
      .select($"id", ($"rank" - 1).as("idx")) // 0-based
    val draws = ranked
      .select($"id".as("anchor_id"), $"idx".as("aidx"),
        explode(array((1 to k).map(lit(_)): _*)).as("slot"))
      .withColumn("h", pmod(Dedup.baseHash60(
        concat($"anchor_id", lit(s":$salt:"), $"slot")), lit(n)))
      .withColumn("nidx",
        when($"h" === $"aidx", ($"h" + 1) % n).otherwise($"h"))
    draws.join(ranked.select($"idx".as("nidx"), $"id".as("negative_id")), "nidx")
      .select($"anchor_id", $"slot", $"negative_id")
  }
}
