package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming ingest dedup: a document stream screened per micro-batch
 * against a prebuilt MinHash reference index (`Dedup.MinhashRefIndex`)
 * via `foreachBatch` — the continual-training ingest filter as a
 * streaming query, and the streaming half of the batch/streaming
 * unification story for the dedup operators.
 *
 * Each micro-batch runs the EXACT batch operator
 * (`Dedup.screenAgainstIndex`), so batch and streaming semantics are
 * identical by construction. Because candidates only ever cross
 * new×reference (never new×new), the union of per-batch results is
 * independent of how the stream happens to be micro-batched — screening
 * the batch in one piece or in N triggers yields the same pairs. The
 * query forces multiple micro-batches (`maxFilesPerTrigger = 1`) to
 * exercise exactly that invariant, and the batch SQL oracle applies
 * unchanged.
 *
 * 100 TB posture: the reference index is built ONCE (or loaded from its
 * parquet form via `Dedup.loadMinhashIndex`) and cached; each trigger
 * shuffles only its own micro-batch against the index buckets. State
 * lives in the index, not in streaming state stores — nothing grows with
 * stream lifetime (`persistNewSide = false` keeps even the cache
 * footprint per-batch).
 */
object DedupStream {

  private val counter = new AtomicInteger(0)

  /**
   * The `q_dedup_incremental` scenario as a stream: the planted new batch
   * (30 exact copies of reference docs + 30 novel synthetic docs) arrives
   * as TWO parquet files consumed one per trigger; every micro-batch is
   * screened against the reference corpus index and appended to a parquet
   * sink. Returns (new_id, ref_id, jaccard) — identical to the batch
   * operator's output.
   */
  def incrementalScreen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = counter.incrementAndGet()
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_dedup_stream_${ProcessHandle.current().pid()}_$run")
    val incoming = base.resolve("incoming").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // the planted ingest batch — ONE construction shared with
    // q_dedup_incremental and its oracle (PipelineQueries)
    val newBatch = graft.queries.PipelineQueries.plantedIngestBatch(docs)
    // two files → two triggers under maxFilesPerTrigger=1
    newBatch.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(incoming)
    newBatch.filter($"doc_id" % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(incoming)

    // build the reference index once, outside the trigger loop
    val index = Dedup.buildMinhashIndex(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 8)

    val stream = spark.readStream
      .schema(newBatch.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(incoming)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.screenAgainstIndex(index, batch, "doc_id", "text",
          jaccardThreshold = 0.5, persistNewSide = false)
          .write.mode("append").parquet(out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(out).orderBy($"new_id", $"ref_id")
  }

  /**
   * Winnow twin of [[incrementalScreen]]: the clone+novel ingest batch
   * arrives as two files consumed one per trigger, each micro-batch
   * screened against a prebuilt winnowing fingerprint index
   * (`Dedup.screenAgainstWinnowIndex`). Candidates only ever cross
   * new×reference, so the per-batch union equals the one-shot screen and
   * the batch oracle applies unchanged.
   */
  def winnowScreen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = counter.incrementAndGet()
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_winnow_stream_${ProcessHandle.current().pid()}_$run")
    val incoming = base.resolve("incoming").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val newBatch = graft.queries.PipelineQueries.winnowIngestBatch(docs)
    newBatch.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(incoming)
    newBatch.filter($"doc_id" % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(incoming)

    val index = Dedup.buildWinnowIndex(docs, "doc_id", "text")
    index.fp.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // index-side aggregates once, OUTSIDE the trigger loop — per-batch
    // screens join against these instead of re-scanning the index
    val stats = Dedup.winnowIndexStats(index)
    stats._1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    stats._2.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val stream = spark.readStream
      .schema(newBatch.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(incoming)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.screenWithWinnowStats(stats, index, batch, "doc_id", "text",
          minShared = 2L)
          .write.mode("append").parquet(out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    stats._1.unpersist(blocking = false)
    stats._2.unpersist(blocking = false)
    index.fp.unpersist(blocking = false)
    spark.read.parquet(out).orderBy($"new_id", $"ref_id")
  }
}
