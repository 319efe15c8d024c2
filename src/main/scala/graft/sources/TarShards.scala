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
    * fit the classic 100-byte field (WebDataset keys do) and be pure
    * printable ASCII — `getBytes("US-ASCII")` would otherwise silently
    * replace foreign characters with '?', letting two distinct names
    * collide inside one shard; reject loudly instead. */
  def writeTar(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    for ((name, payload) <- files) {
      require(name.forall(c => c >= 0x20 && c < 0x7f),
        s"tar entry name must be printable ASCII: '$name'")
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
    * usual corrupt-drop try).
    *
    * Foreign-writer fidelity (third-party WebDataset shards routinely
    * carry deep sample keys): the POSIX ustar `prefix` field (offset
    * 345) is honored — `prefix + '/' + name` reconstructs paths the
    * 100-byte name field alone would silently truncate; GNU `L`
    * long-name pseudo-entries are STITCHED onto the following member
    * (the payload IS its real name); pax `x` extended headers override
    * the next member's name via their `path` record. Name bytes decode
    * as UTF-8 (a strict superset of the ASCII our own writer emits). */
  def listEntries(tar: Array[Byte]): Seq[TarEntry] = {
    val out = ArrayBuffer.empty[TarEntry]
    var pos = 0
    // a pending long name from a GNU 'L' or pax 'x' pseudo-entry,
    // consumed by (and only by) the immediately following member
    var pendingName: Option[String] = None
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
        new String(tar, pos + off, end - off, "UTF-8").trim
      }
      val stored = java.lang.Long.parseLong(field(148, 8), 8)
      require(stored == expect, s"tar header checksum mismatch at $pos")
      val size = java.lang.Long.parseLong(field(124, 12), 8)
      // a negative size (crafted '-' in the octal field) would advance
      // pos BACKWARD below — an infinite-loop DoS on untrusted archives
      require(size >= 0, s"negative tar entry size at $pos")
      val typeflag = tar(pos + 156)
      require(pos + BlockSize + size <= tar.length, s"tar entry overruns at $pos")
      val payloadOff = pos + BlockSize
      def payloadString(): String = {
        val end = (0 until size.toInt).find(j => tar(payloadOff + j) == 0)
          .getOrElse(size.toInt)
        new String(tar, payloadOff, end, "UTF-8")
      }
      typeflag.toChar match {
        case 'L' => // GNU long name: payload = next member's real name
          pendingName = Some(payloadString())
        case 'x' => // pax extended header: records are "len key=value\n"
          val path = payloadString().split('\n').iterator
            .map(_.split("=", 2)).collectFirst {
              case Array(k, v) if k.split(' ').last == "path" => v
            }
          if (path.isDefined) pendingName = path
        case '0' | '\u0000' => // regular file (NUL typeflag is the pre-POSIX v7 form)
          val name = pendingName.getOrElse {
            val base = field(0, 100)
            // prefix is POSIX-ustar only (magic "ustar\0"); the GNU
            // format (magic "ustar  ") reuses that header region
            val posixUstar = new String(tar, pos + 257, 5, "US-ASCII") == "ustar" &&
              tar(pos + 262) == 0
            val prefix = if (posixUstar) field(345, 155) else ""
            if (prefix.nonEmpty) s"$prefix/$base" else base
          }
          pendingName = None
          out += TarEntry(name, size, payloadOff)
        case 'K' | 'g' => // GNU long LINKNAME / pax global header:
          // metadata for something other than the next member's name —
          // leave any pending name for the member it belongs to
        case _ => // dirs/links/etc: no sample payload; a pending long
          // name was for THIS member — consume it so it cannot leak
          // onto the next one
          pendingName = None
      }
      pos += BlockSize + (((size + BlockSize - 1) / BlockSize) * BlockSize).toInt
    }
    out.toSeq
  }

  def extract(tar: Array[Byte], e: TarEntry): Array[Byte] =
    java.util.Arrays.copyOfRange(tar, e.offset.toInt, (e.offset + e.size).toInt)

  /**
   * Pack rows into tar shards per group — the WebDataset writer:
   * entries are (name, payload), name-ordered WITHIN the group so the
   * archive bytes are deterministic under any upstream partitioning.
   * One shard-assignment exchange (the group sort rides the same
   * shuffle via `flatMapSortedGroups`); the serialization is per-group
   * local and STREAMING: a shard is cut whenever the next entry would
   * push it past `maxEntriesPerShard` entries or `maxShardBytes`
   * archive bytes, so driver-chosen group keys can never materialize
   * an unbounded group on one executor (the enforced-bound posture of
   * [[graft.pipeline.Caps.capByCount]], but SPLITTING instead of
   * dropping — a writer must not lose samples). Parts are numbered
   * 0,1,… in name order, so the split is itself deterministic. An
   * entry larger than `maxShardBytes` on its own still ships (alone in
   * its shard) — bounding memory, not rejecting data.
   *
   * @return (group, part, tar, n_entries, tar_bytes)
   */
  def packTarGroups(df: DataFrame, groupCol: String, nameCol: String,
      payloadCol: String, maxEntriesPerShard: Int = 65536,
      maxShardBytes: Long = 1L << 30): DataFrame = {
    require(maxEntriesPerShard >= 1,
      s"maxEntriesPerShard must be >= 1: $maxEntriesPerShard")
    require(maxShardBytes >= 3L * BlockSize, // header + 2-block terminator
      s"maxShardBytes must fit at least one header + terminator: $maxShardBytes")
    val spark = df.sparkSession
    import spark.implicits._
    // archive cost of one member: header block + payload rounded up
    def entryCost(payloadLen: Int): Long =
      BlockSize + ((payloadLen.toLong + BlockSize - 1) / BlockSize) * BlockSize
    df.select(col(groupCol).cast("long").as("grp"),
        col(nameCol).cast("string").as("name"), col(payloadCol).as("payload"))
      .as[(Long, String, Array[Byte])]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("name")) { (g, rows) =>
        val it = rows.buffered
        new Iterator[(Long, Int, Array[Byte], Int, Int)] {
          private var part = 0
          def hasNext: Boolean = it.hasNext
          def next(): (Long, Int, Array[Byte], Int, Int) = {
            val files = ArrayBuffer.empty[(String, Array[Byte])]
            var bytes = 2L * BlockSize // end-of-archive marker
            while (it.hasNext && files.length < maxEntriesPerShard &&
                (files.isEmpty ||
                  bytes + entryCost(it.head._3.length) <= maxShardBytes)) {
              val r = it.next()
              bytes += entryCost(r._3.length)
              files += ((r._2, r._3))
            }
            val tar = writeTar(files.toSeq)
            val res = (g, part, tar, files.length, tar.length)
            part += 1
            res
          }
        }
      }
      .toDF("grp", "part", "tar", "n_entries", "tar_bytes")
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
