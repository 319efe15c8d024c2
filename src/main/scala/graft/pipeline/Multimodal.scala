package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media row: opaque binary payload + typed metadata. */
case class MediaRow(
    mediaId: Long,
    kind: String, // image | audio | video
    payload: Array[Byte],
    width: Int,
    height: Int,
    sampleRateHz: Int)

/** Extracted features for one media item. */
case class MediaFeatures(
    mediaId: Long,
    kind: String,
    nBytes: Int,
    features: Array[Float])

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed batch-wise in `mapPartitions`.
 *
 * The decode step is a DETERMINISTIC STUB (this container has no
 * image/audio codecs): `decodeStub` derives a fixed-size feature vector
 * from the payload bytes. The Spark-side contract — schema, partition-wise
 * batching, feature shape, join-back pattern — is real and tested; swap
 * `decodeStub` for a JNI/codec call in production.
 */
object Multimodal {

  val FeatureDim = 16

  /** STUB: stands in for image decode + model feature extraction. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    i = 0
    while (i < FeatureDim) {
      val x = h ^ (h >>> 29) ^ (i.toLong * 0x9E3779B97F4A7C15L)
      out(i) = ((x % 1000003L).toFloat / 1000003f)
      i += 1
    }
    out
  }

  /** Batch feature extraction over the binary column; one decoder init per
    * partition (the expensive part in a real codec), then row streaming. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: initialize decoder/model once per partition here
      it.map { m =>
        MediaFeatures(m.mediaId, m.kind, m.payload.length, decodeStub(m.payload))
      }
    }
  }

  /** Frame sampling plumbing for video-like payloads: split the payload
    * into `n` evenly spaced "frames" (stub: byte slices) and emit one row
    * per frame — the explode-shape a real frame sampler produces. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val step = math.max(1, m.payload.length / n)
      (0 until n).iterator.map { i =>
        val start = math.min(i.toLong * step, math.max(0, m.payload.length - 1)).toInt
        val end = math.min(start + step, m.payload.length)
        val slice = java.util.Arrays.copyOfRange(m.payload, start, end)
        (m.mediaId, i, slice.length, decodeStub(slice))
      }
    }.toDF("mediaId", "frame", "n_bytes", "features")
  }

  /** Resize plumbing: payload transformed to the new dimensions' byte
    * budget with metadata updated in the same pass (stub: proportional
    * truncate/keep — a real impl calls the codec's scaler). Composes with
    * extractFeatures/sampleFrames downstream. */
  def resize(media: Dataset[MediaRow], newWidth: Int, newHeight: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      // Long arithmetic: 65536x65536 overflows Int to 0 and would truncate
      // every payload to one byte
      val oldArea = math.max(1L, m.width.toLong * m.height)
      val targetLen = math.max(1L,
        m.payload.length.toLong * (newWidth.toLong * newHeight) / oldArea).toInt
      m.copy(
        payload = java.util.Arrays.copyOf(m.payload, targetLen),
        width = newWidth, height = newHeight)
    }
  }

  /** Build a deterministic media table from any text table (test fixture:
    * payload = utf8 bytes). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val kind = id % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        MediaRow(id, kind, bytes, width = 64, height = 64, sampleRateHz = 16000)
      }
  }
}
