package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming ingestion over the `documents` table: the batch curation
 * operators are stateless Column transforms, so they run UNCHANGED inside
 * a Structured Streaming query — the point of building them declaratively.
 * This is the streaming half of the batch/streaming unification story:
 * one operator definition, two execution modes.
 */
object DocsStream {

  private val counter = new AtomicInteger(0)

  /** documents.parquet is a single file; the streaming file source wants a
    * directory, so expose it via StreamDirs (path-keyed, staleness-aware). */
  private def streamableDocsDir(dir: String): String =
    StreamDirs.linkedDir("graft_docs_stream",
      java.nio.file.Paths.get(dir, "documents.parquet"), Seq("documents_0.parquet"))

  /**
   * `TextAnalysis.qualityScore` applied to a document STREAM, aggregated
   * to (quality_score, n_docs). The scoring projection is the exact batch
   * operator; only the source (`readStream`) and sink differ. Complete
   * mode on a single-file source ⇒ output equals the batch aggregation,
   * so the plain SQL oracle applies.
   */
  def qualityScoreCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamableDocsDir(dir))
    val name = s"graft_docs_quality_${counter.incrementAndGet()}"
    val q = TextAnalysis.qualityScore(stream, "text")
      .groupBy($"quality_score")
      .agg(count(lit(1)).as("n_docs"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"quality_score")
  }

  /**
   * Streaming heavy-hitter screen: exact per-token counts as streaming
   * state (complete mode — the counts table is vocabulary-sized, the
   * bounded-dictionary regime; an unbounded-vocab stream would front this
   * with the Misra–Gries candidate pass exactly as the batch
   * [[graft.pipeline.Sketches.heavyHitters]] does), then the count > n/k
   * cut applied to the drained state with n = the same state's total.
   * Equals the batch heavy-hitter row by construction, so the shared
   * oracle applies verbatim.
   */
  def heavyHitterScreen(spark: SparkSession, dir: String, k: Int = 500): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamableDocsDir(dir))
    val name = s"graft_docs_hh_${counter.incrementAndGet()}"
    val q = stream
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    val state = spark.table(name)
    val n = state.agg(sum($"cnt")).head.getLong(0)
    state.filter($"cnt" > lit(n / k)).orderBy($"token")
  }

  /**
   * Train-batch / apply-stream DSIR screening: the per-bucket llr model
   * is fitted ONCE on the batch corpus (target = lang 'en'), collapsed
   * to a B-entry map literal, and applied to the document stream as a
   * pure per-row projection — append mode, no state, no join; the
   * incoming-data arm of the batch `q_dsir_select`. Per-doc weights
   * equal the batch rows at 6dp, so the batch weight oracle applies.
   */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val llr = graft.pipeline.DataSelection
      .llrModel(docs, docs.filter($"lang" === "en"), "text", numBuckets = 1024)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val stream = spark.readStream.schema(docs.schema)
      .parquet(streamableDocsDir(dir))
    val name = s"graft_docs_dsir_${counter.incrementAndGet()}"
    val q = stream.select($"doc_id",
        size(TextAnalysis.wsTokens(lower($"text"))).cast("long").as("n_tokens"),
        graft.pipeline.DataSelection.dsirScoreColumn(llr, 1024, $"text")
          .as("log_weight"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"doc_id")
  }

  /**
   * Train-batch / apply-stream tokenization — the production serving
   * shape: the BPE model is learned ONCE from the batch corpus (driver
   * artifact), then the stateless distributed encode runs unchanged
   * inside a streaming query (`mapPartitions` over the stream, append
   * mode, no state). Per-doc token counts equal the batch
   * `q_bpe_encode` rows exactly — StreamingTokenizeSpec pins the
   * parity.
   */
  def bpeTokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.pipeline.Tokenizer.trainBpe(docs, "text",
      numMerges = 200, maxWords = 50000, minFreq = 2L)
    val stream = spark.readStream.schema(docs.schema)
      .parquet(streamableDocsDir(dir))
    val name = s"graft_docs_bpe_${counter.incrementAndGet()}"
    val q = graft.pipeline.Tokenizer.bpeEncode(stream, "doc_id", "text", model)
      .select($"doc_id", $"n_tokens")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy($"doc_id")
  }
}
