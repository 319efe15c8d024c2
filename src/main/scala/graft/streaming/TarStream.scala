package graft.streaming

import graft.util.Ckpt._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming twin of the WebDataset tar ingest: shards land as FILES
 * (exactly how a crawl delivers them), a binaryFile stream picks each
 * one up, and the per-shard explode ([[graft.sources.TarShards]]) is
 * map-only and stateless — so the accumulated rows are independent of
 * micro-batching and the batch `q_tar_shards` oracle applies to the
 * streamed result unchanged (one shard per trigger forces 8 real
 * batches).
 */
object TarStream {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Build the q_tar_shards shards, deliver them as one file each,
    * stream-ingest with per-batch explode into a parquet sink, and
    * return the accumulated entry rows (grp, name, size, offset,
    * payload_md5). */
  def tarIngestSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = counter.incrementAndGet()
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_tar_ingest_${ProcessHandle.current().pid()}_$run")
    val incoming = base.resolve("incoming")
    val ckpt = base.resolve("ckpt").toString
    val sink = base.resolve("rows").toString
    java.nio.file.Files.createDirectories(incoming)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" < 200)
      .select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .map { case (d, text) => (d % 8, f"doc_$d%05d.txt", text.getBytes("UTF-8")) }
      .toDF("grp", "name", "payload")
    // 8 shard blobs, written as the files a crawler would deposit;
    // filenames carry (grp, part) so a group that split at the shard
    // bound cannot overwrite its own earlier parts
    graft.sources.TarShards.packTarGroups(docs, "grp", "name", "payload")
      .select($"grp", $"part", $"tar").as[(Long, Int, Array[Byte])]
      .collect() // 8 shards — delivery-sized, not corpus-sized
      .foreach { case (g, p, tar) =>
        java.nio.file.Files.write(incoming.resolve(f"shard_$g%03d_$p%03d.tar"), tar)
      }

    val stream = spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"))
      .option("maxFilesPerTrigger", 1)
      .load(incoming.toString)
      .select($"path", $"content")
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = batch.as[(String, Array[Byte])].flatMap { case (path, tar) =>
          // group parse INSIDE the try: an unexpected file in the
          // watched directory drops instead of failing the batch
          try {
            val g = path.split('/').last.stripPrefix("shard_")
              .stripSuffix(".tar").split('_')(0).toLong
            graft.sources.TarShards.listEntries(tar).map { e =>
              (g, e.name, e.size, e.offset,
                graft.sources.TarShards.extract(tar, e))
            }
          } catch { case scala.util.control.NonFatal(_) => Nil }
        }.toDF("grp", "name", "size", "offset", "payload")
        // batchId-keyed overwrite makes the sink idempotent: foreachBatch
        // is at-least-once, so a retried micro-batch rewrites its own
        // directory instead of appending duplicate rows
        rows.select($"grp", $"name", $"size", $"offset",
            md5($"payload").as("payload_md5"))
          .write.mode("overwrite").parquet(s"$sink/batch_$batchId")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // materialize off the temp sink (delivery-sized), then reclaim the
    // per-run scratch tree — repeated invocations must not pile up
    // tmpdir. Durability trade-off, stated honestly: after the delete,
    // the eager localCheckpoint's executor-local blocks are the ONLY
    // copy of the result — an executor loss afterwards loses it rather
    // than recomputing (acceptable for this delivery-sized demo; a
    // production caller would own the sink directory's lifetime and
    // defer cleanup past its own durable write).
    val sinkPath = java.nio.file.Paths.get(sink)
    val haveBatches = java.nio.file.Files.isDirectory(sinkPath) && {
      val s = java.nio.file.Files.list(sinkPath)
      try s.anyMatch(p => p.getFileName.toString.startsWith("batch_"))
      finally s.close()
    }
    val result =
      if (!haveBatches) // zero committed micro-batches: empty, not AnalysisException
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "grp LONG, name STRING, size LONG, offset LONG, payload_md5 STRING"))
      else spark.read.parquet(s"$sink/batch_*")
        .orderBy($"grp", $"name").ckptSer()
    deleteRecursively(base)
    result
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      val it = java.nio.file.Files.walk(p)
      try it.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach { f => java.nio.file.Files.deleteIfExists(f); () }
      finally it.close()
    }
  }
}
