package graft

import graft.pipeline.Tokenizer
import org.apache.spark.sql.functions._

/** Train-batch/apply-stream parity: the streaming BPE encode must emit
  * exactly the batch encode's per-doc rows (stateless operator, append
  * mode — THE property that makes one tokenizer definition serve both
  * the backfill and the live ingest path). */
class StreamingTokenizeSpec extends SparkSpec {
  import spark.implicits._

  test("streaming bpe token counts equal the batch encode") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.DocsStream.bpeTokenCounts(spark, dir)
      .as[(Long, Int)].collect().toSeq

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = Tokenizer.trainBpe(docs, "text",
      numMerges = 200, maxWords = 50000, minFreq = 2L)
    val batch = Tokenizer.bpeEncode(docs, "doc_id", "text", model)
      .select($"doc_id", $"n_tokens").orderBy($"doc_id")
      .as[(Long, Int)].collect().toSeq

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
