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

  /** Build the q_tar_shards shards, deliver them as one file each,
    * stream-ingest with per-batch explode into a parquet sink, and
    * return the accumulated entry rows (grp, name, size, offset,
    * payload_md5). */
  def tarIngestSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" < 200)
      .select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .map { case (d, text) => (d % 8, f"doc_$d%05d.txt", text.getBytes("UTF-8")) }
      .toDF("grp", "name", "payload")
    // 8 shard blobs, written as the files a crawler would deposit;
    // filenames carry (grp, part) so a group that split at the shard
    // bound cannot overwrite its own earlier parts
    val shards = graft.sources.TarShards.packTarGroups(docs, "grp", "name", "payload")
      .select($"grp", $"part", $"tar").as[(Long, Int, Array[Byte])]
      .collect() // 8 shards — delivery-sized, not corpus-sized
    FileIngest.run(spark, "tar_ingest",
      deliver = incoming => shards.foreach { case (g, part, tar) =>
        java.nio.file.Files.write(incoming.resolve(f"shard_$g%03d_$part%03d.tar"), tar)
        ()
      },
      maxFilesPerTrigger = 1, // one shard per trigger: 8 real batches
      rowsOf = batch => batch.as[(String, Array[Byte])]
        .flatMap { case (path, tar) =>
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
        .select($"grp", $"name", $"size", $"offset",
          md5($"payload").as("payload_md5")),
      emptyDdl = "grp LONG, name STRING, size LONG, offset LONG, payload_md5 STRING",
      order = Seq($"grp", $"name"))
  }
}
