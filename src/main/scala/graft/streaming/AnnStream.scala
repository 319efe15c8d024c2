package graft.streaming

import graft.pipeline.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming vector-index maintenance: embedding micro-batches appended to
 * a persisted IVF index via `foreachBatch` — the continual-ingest half of
 * the ANN story, mirroring `DedupStream.incrementalScreen` for the dedup
 * index.
 *
 * Each micro-batch runs the EXACT batch operator
 * (`Similarity.appendIvfIndex`): assign the new vectors against the
 * FROZEN coarse quantizer and append them into their `cid=` list
 * partitions. Because assignment is per-row against frozen centroids,
 * the final index is independent of how the stream was micro-batched —
 * ingesting in one piece or N triggers yields identical lists, so the
 * batch `q_ann_ivf_incremental` oracle applies unchanged to a probe of
 * the post-ingest index.
 *
 * 100 TB posture: centroids are model-sized and loaded once; each
 * trigger does one scan of its own micro-batch (no shuffle — assignment
 * is a map) and appends files under the probed partition layout. Nothing
 * lives in streaming state stores. In production the append lands
 * through a versioned snapshot commit for exactly-once (see
 * `sources.Snapshots` / `q_stream_snapshot_ingest`); here the fixture
 * stream is replay-free so a plain append shows the operator itself.
 */
object AnnStream {

  /**
   * The `q_ann_ivf_incremental` scenario as a stream: the quantizer is
   * trained on the EVEN vectors only and persisted; the ODD vectors
   * arrive as two parquet files consumed one per trigger and are
   * appended per micro-batch; the reloaded index is then probed.
   * Returns (query_id, rnk, corpus_id, cosine) — identical to the batch
   * incremental build.
   */
  def incrementalIvfIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // createTempDirectory (not a pid+counter name): a restarted JVM can
    // reuse the pid with the counter back at 1, and a leftover streaming
    // checkpoint under the same path would replay a half-committed batch
    // into the fresh index — duplicate appends
    val base = java.nio.file.Files.createTempDirectory("graft_ann_stream_")
    val incoming = base.resolve("incoming").toString
    val ckpt = base.resolve("ckpt").toString
    val idxPath = base.resolve("ivf").toString

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = Similarity.buildIvfIndex(e.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", nCentroids = 16, kmeansIterations = 3)
    Similarity.saveIvfIndex(idx, idxPath)

    // odd half → two files → two triggers under maxFilesPerTrigger=1
    val odd = e.filter($"vec_id" % 2 =!= 0)
    odd.filter($"vec_id" % 4 === 1).coalesce(1)
      .write.mode("append").parquet(incoming)
    odd.filter($"vec_id" % 4 === 3).coalesce(1)
      .write.mode("append").parquet(incoming)

    val stream = spark.readStream
      .schema(odd.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(incoming)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.appendIvfIndex(spark, idxPath, batch, "vec_id", "embedding")
      }
      .start()
    q.processAllAvailable()
    q.stop()

    Similarity.probeIvf(Similarity.loadIvfIndex(spark, idxPath),
      e.filter($"vec_id" < 5), "vec_id", "embedding", k = 10, nProbe = 8)
      .orderBy($"query_id", $"rnk")
  }
}
