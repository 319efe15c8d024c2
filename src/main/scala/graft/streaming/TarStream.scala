package graft.streaming

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
    // 8 shard blobs, written as the files a crawler would deposit
    graft.sources.TarShards.packTarGroups(docs, "grp", "name", "payload")
      .select($"grp", $"tar").as[(Long, Array[Byte])]
      .collect() // 8 shards — delivery-sized, not corpus-sized
      .foreach { case (g, tar) =>
        java.nio.file.Files.write(incoming.resolve(f"shard_$g%03d.tar"), tar)
      }

    val stream = spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"))
      .option("maxFilesPerTrigger", 1)
      .load(incoming.toString)
      .select($"path", $"content")
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.as[(String, Array[Byte])].flatMap { case (path, tar) =>
          val g = path.split('/').last.stripPrefix("shard_")
            .stripSuffix(".tar").toLong
          try graft.sources.TarShards.listEntries(tar).map { e =>
            (g, e.name, e.size, e.offset,
              graft.sources.TarShards.extract(tar, e))
          } catch { case scala.util.control.NonFatal(_) => Nil }
        }.toDF("grp", "name", "size", "offset", "payload")
        rows.select($"grp", $"name", $"size", $"offset",
            md5($"payload").as("payload_md5"))
          .write.mode("append").parquet(sink)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(sink).orderBy($"grp", $"name")
  }
}
