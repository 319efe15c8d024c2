package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Streaming twin of the WebM/Matroska ingest ([[graft.pipeline
 * .WebmDemux]], r15): `.webm` files land in a watched directory (the
 * crawl-delivery shape), a binaryFile stream picks each one up, and the
 * per-file demux + frame-header read is map-only and stateless ACROSS
 * files, so the accumulated per-track rows are independent of
 * micro-batching and equal the batch route row for row — the
 * q_stream_webm_ingest query pins exactly that. Corrupt files drop
 * (demux None) instead of failing the batch; the sink is idempotent
 * (batchId-keyed overwrite, the at-least-once foreachBatch contract).
 */
object WebmStream {

  /** Deterministic per-doc WebM — the canonical planted fixture
    * ([[graft.pipeline.CodecHeaders.plantedWebmForDoc]]), shared by
    * the file writer, the batch comparison path, and
    * q_webm_codec_headers so all consumers demux THE SAME bytes. */
  private[graft] def webmForDoc(id: Long, text: String): Array[Byte] =
    graft.pipeline.CodecHeaders.plantedWebmForDoc(id, text)

  /** Demux one named `.webm` payload into a per-video-track row
    * (doc_id, codec, n_frames, n_key, width, height) with the keyframe
    * count taken from the BITSTREAM headers; anything undemuxable
    * yields nothing. Shared by the streaming batches and the batch
    * comparison path. */
  private[graft] def demuxRow(path: String, bytes: Array[Byte])
      : Seq[(Long, String, Int, Int, Int, Int)] =
    try {
      val id = path.split('/').last.stripPrefix("doc_")
        .stripSuffix(".webm").toLong
      graft.pipeline.WebmDemux.demux(bytes).toSeq.map { info =>
        val t = info.videoTrack
        val nKey = (0 until t.nFrames).count(i =>
          graft.pipeline.CodecHeaders.frameFacts(t.codecId,
            graft.pipeline.WebmDemux.frameBytes(bytes, t, i)).exists(_._1))
        (id, t.codecId, t.nFrames, nKey, t.width, t.height)
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** Build per-doc `.webm` files, deliver them to a watched directory,
    * stream-ingest with per-batch demux into a parquet sink, and return
    * the accumulated per-track rows (the [[FileIngest]] scaffold). */
  def webmIngestSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" < 24)
      .select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .collect() // 24 docs — delivery-sized, not corpus-sized
    FileIngest.run(spark, "webm_ingest",
      deliver = incoming => docs.foreach { case (id, text) =>
        java.nio.file.Files.write(incoming.resolve(f"doc_$id%05d.webm"),
          webmForDoc(id, text))
        ()
      },
      maxFilesPerTrigger = 6, // 24 files -> 4 real micro-batches
      rowsOf = batch => batch.as[(String, Array[Byte])]
        .flatMap { case (path, bytes) => demuxRow(path, bytes) }
        .toDF("doc_id", "codec", "n_frames", "n_key", "width", "height"),
      emptyDdl = "doc_id LONG, codec STRING, n_frames INT, n_key INT, " +
        "width INT, height INT",
      order = Seq($"doc_id"))
  }
}
