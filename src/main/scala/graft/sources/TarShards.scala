package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/**
 * POSIX ustar tar shards — the WebDataset convention for multimodal
 * training data: a corpus ships as many medium-sized `.tar` files whose
 * entries are the samples (image/audio/text payloads named by sample
 * key). This is a pure-JVM reader/writer for that container (IEEE Std
 * 1003.1 ustar layout: 512-byte headers, octal size field, 8-space
 * checksum convention, NUL-block terminator), cross-witnessed against
 * GNU tar in the spec, plus the two Dataset-level operators a pipeline
 * needs: pack table rows into per-group shards and explode shard blobs
 * back into rows.
 *
 * Determinism: headers write mode 0644, uid/gid 0, mtime 0 — archive
 * bytes depend only on (name, payload) sequence, so shard blobs are
 * content-addressable and replayable (no wall clock anywhere).
 *
 * Scale shape: both operators are map-only over whole shards (a shard
 * is the unit of parallelism, exactly how WebDataset is consumed);
 * nothing shuffles but the rows themselves, and [[packTarGroups]]'s
 * one groupBy is the unavoidable shard-assignment exchange.
 *
 * Reference scope anchor: the Mr.LDA reference reads SequenceFiles
 * (sources/MrldaSequenceFile.scala); tar shards are the modern
 * multimodal counterpart — beyond-reference capability.
 */
object TarShards {

  /** One archive member: `offset` is where the PAYLOAD starts (its
    * header sits 512 bytes earlier). */
  case class TarEntry(name: String, size: Long, offset: Long)

  private val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the GNU/POSIX common form)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  /** Serialize (name, payload) pairs as one ustar archive. Names must
    * fit the classic 100-byte field (WebDataset keys do). */
  def writeTar(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    for ((name, payload) <- files) {
      val nb = name.getBytes("US-ASCII")
      require(nb.length > 0 && nb.length <= 100,
        s"tar entry name must be 1..100 bytes: '$name'")
      val hdr = new Array[Byte](BlockSize)
      System.arraycopy(nb, 0, hdr, 0, nb.length)
      System.arraycopy(octal(420, 8), 0, hdr, 100, 8) // mode 0644
      System.arraycopy(octal(0, 8), 0, hdr, 108, 8) // uid
      System.arraycopy(octal(0, 8), 0, hdr, 116, 8) // gid
      System.arraycopy(octal(payload.length.toLong, 12), 0, hdr, 124, 12)
      System.arraycopy(octal(0, 12), 0, hdr, 136, 12) // mtime 0: determinism
      hdr(156) = '0' // regular file
      System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, hdr, 257, 8)
      // checksum: header bytes summed with the checksum field as spaces,
      // stored as 6 octal digits + NUL + space
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < BlockSize) { sum += hdr(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = "0" * (6 - cs.length) + cs
      System.arraycopy((csPad + "\u0000 ").getBytes("US-ASCII"), 0, hdr, 148, 8)
      out ++= hdr
      out ++= payload
      val rem = payload.length % BlockSize
      if (rem != 0) out ++= new Array[Byte](BlockSize - rem)
    }
    out ++= new Array[Byte](2 * BlockSize) // end-of-archive marker
    out.toArray
  }

  /** Walk an archive's headers: (name, size, payload offset) per
    * member, checksum-verified. Stops at the NUL terminator block;
    * throws on a corrupt header (callers on untrusted data wrap in the
    * usual corrupt-drop try). */
  def listEntries(tar: Array[Byte]): Seq[TarEntry] = {
    val out = ArrayBuffer.empty[TarEntry]
    var pos = 0
    while (pos + BlockSize <= tar.length) {
      if ((0 until BlockSize).forall(i => tar(pos + i) == 0)) return out.toSeq
      var expect = 0L
      var i = 0
      while (i < BlockSize) {
        expect += (if (i >= 148 && i < 156) ' '.toInt else tar(pos + i) & 0xff)
        i += 1
      }
      def field(off: Int, len: Int): String = {
        val end = (off until off + len).find(j => tar(pos + j) == 0)
          .getOrElse(off + len)
        new String(tar, pos + off, end - off, "US-ASCII").trim
      }
      val stored = java.lang.Long.parseLong(field(148, 8), 8)
      require(stored == expect, s"tar header checksum mismatch at $pos")
      val size = java.lang.Long.parseLong(field(124, 12), 8)
      val name = field(0, 100)
      val typeflag = tar(pos + 156)
      require(pos + BlockSize + size <= tar.length, s"tar entry overruns at $pos")
      // only regular files carry sample payloads; dirs/links skip
      if (typeflag == '0' || typeflag == 0) out += TarEntry(name, size, pos + BlockSize)
      pos += BlockSize + (((size + BlockSize - 1) / BlockSize) * BlockSize).toInt
    }
    out.toSeq
  }

  def extract(tar: Array[Byte], e: TarEntry): Array[Byte] =
    java.util.Arrays.copyOfRange(tar, e.offset.toInt, (e.offset + e.size).toInt)

  /**
   * Pack rows into one tar shard per group — the WebDataset writer:
   * entries are (name, payload), ordered by name WITHIN the shard so
   * the archive bytes are deterministic under any upstream
   * partitioning. One hash aggregate (the shard-assignment shuffle);
   * the serialization is per-group local.
   *
   * @return (group, tar, n_entries, tar_bytes)
   */
  def packTarGroups(df: DataFrame, groupCol: String, nameCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("long").as("grp"),
        col(nameCol).cast("string").as("name"), col(payloadCol).as("payload"))
      .as[(Long, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (g, rows) =>
        val files = rows.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
        val tar = writeTar(files)
        (g, tar, files.length, tar.length)
      }
      .toDF("grp", "tar", "n_entries", "tar_bytes")
  }

  /** Explode shard blobs back into sample rows — the WebDataset
    * reader: map-only per shard, corrupt archives drop instead of
    * failing the stage. @return (shard id, name, size, offset, payload) */
  def readTarRows(df: DataFrame, idCol: String, tarCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(tarCol).as("tar"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, tar) =>
        try listEntries(tar).map(e => (id, e.name, e.size, e.offset, extract(tar, e)))
        catch { case scala.util.control.NonFatal(_) => Nil }
      }
      .toDF("id", "name", "size", "offset", "payload")
  }
}
