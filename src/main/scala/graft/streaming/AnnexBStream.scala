package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Streaming twin of the raw Annex-B elementary-stream ingest
 * ([[graft.pipeline.H264Codec.decodeAnnexBStream]], r11): `.h264` files
 * land in a watched directory (exactly how a camera feed or an ffmpeg
 * raw-bitstream dump delivers them), a binaryFile stream picks each one
 * up, and the per-file GOP decode is map-only and stateless ACROSS
 * files (all decoder state lives within one elementary stream), so the
 * accumulated per-frame rows are independent of micro-batching and the
 * batch decode path's results apply to the streamed result unchanged —
 * the q_stream_annexb_ingest query pins the two routes equal row by
 * row. Corrupt or foreign files drop instead of failing the batch; the
 * sink is idempotent (batchId-keyed overwrite, the at-least-once
 * foreachBatch contract).
 */
object AnnexBStream {

  /** Deterministic per-doc elementary stream: a 3-frame IPPP GOP over
    * the doc's closed-form frame geometry, as raw Annex-B bytes.
    * Shared by the file writer and the batch comparison path so both
    * decode THE SAME bitstream. */
  private[graft] def esForDoc(id: Long, text: String): (Int, Int, Array[Byte]) = {
    val len = text.codePointCount(0, text.length)
    val w = 32 + 2 * (len % 8)
    val h = 32 + 2 * ((len + id) % 6).toInt
    val frames = Seq((0, 0), (1, 1), (2, 1)).map { case (dx, dy) =>
      gradientFrame(w, h, dx, dy)
    }
    val gop = graft.pipeline.H264Codec.encodeGop(frames, qp = 26, avcc = false)
    (w, h, gop.flatten.toArray)
  }

  private def gradientFrame(w: Int, h: Int, dx: Int, dy: Int)
      : graft.pipeline.MediaCodecs.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val sx = math.max(0, math.min(w - 1, x - dx))
        val sy = math.max(0, math.min(h - 1, y - dy))
        val o = (y * w + x) * 3
        rgb(o) = ((sx * 255) / (w - 1)).toByte
        rgb(o + 1) = ((sy * 255) / (h - 1)).toByte
        rgb(o + 2) = (((sx + sy) * 255) / (w + h - 2)).toByte
        x += 1
      }
      y += 1
    }
    graft.pipeline.MediaCodecs.Bmp(w, h, rgb)
  }

  /** Decode one named `.h264` payload into per-frame rows (doc_id,
    * frame, width, height, rgb_sum); anything undecodable — bad name,
    * corrupt bytes — yields nothing. Shared by the streaming batches
    * and the batch comparison path. */
  private[graft] def decodeRows(path: String, es: Array[Byte])
      : Seq[(Long, Int, Int, Int, Long)] =
    try {
      val id = path.split('/').last.stripPrefix("doc_")
        .stripSuffix(".h264").toLong
      graft.pipeline.H264Codec.decodeAnnexBIterator(es).zipWithIndex.collect {
        case (Some(b), i) =>
          (id, i, b.width, b.height,
            b.rgb.foldLeft(0L)((a, c) => a + (c & 0xff)))
      }.toSeq
    } catch { case scala.util.control.NonFatal(_) => Nil }

  /** Build per-doc `.h264` files, deliver them to a watched directory,
    * stream-ingest with per-batch GOP decode into a parquet sink, and
    * return the accumulated per-frame rows (doc_id, frame, width,
    * height, rgb_sum) — the [[FileIngest]] scaffold owns the scratch
    * tree, idempotent sink, and durability posture. */
  def annexBIngestSink(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" < 16)
      .select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .collect() // 16 docs — delivery-sized, not corpus-sized
    FileIngest.run(spark, "annexb_ingest",
      deliver = incoming => docs.foreach { case (id, text) =>
        val (_, _, es) = esForDoc(id, text)
        java.nio.file.Files.write(incoming.resolve(f"doc_$id%05d.h264"), es)
        ()
      },
      maxFilesPerTrigger = 4, // 16 files -> 4 real micro-batches
      rowsOf = batch => batch.as[(String, Array[Byte])]
        .flatMap { case (path, es) => decodeRows(path, es) }
        .toDF("doc_id", "frame", "width", "height", "rgb_sum"),
      emptyDdl = "doc_id LONG, frame INT, width INT, height INT, rgb_sum LONG",
      order = Seq($"doc_id", $"frame"))
  }
}
