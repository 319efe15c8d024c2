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

  /** A name the classic 100-byte ustar field transports verbatim:
    * 1..100 printable-ASCII chars. Anything else (UTF-8 keys, deep
    * paths) rides a pax `x` extended header instead — `US-ASCII`
    * truncation/`?`-substitution would silently collide two distinct
    * sample keys inside one shard. */
  private def isPlainName(name: String): Boolean =
    name.nonEmpty && name.length <= 100 &&
      name.forall(c => c >= 0x20 && c < 0x7f)

  /** One pax extended-header record, `"%d %s=%s\n"` where the decimal
    * prefix counts the WHOLE record including itself (POSIX.1-2001
    * pax(1)); the length is the fixpoint of digits(len) + rest. */
  private[graft] def paxRecord(key: String, value: String): Array[Byte] = {
    val kv = s" $key=$value\n".getBytes("UTF-8")
    var len = kv.length + 1
    while (String.valueOf(len).length + kv.length != len)
      len = String.valueOf(len).length + kv.length
    String.valueOf(len).getBytes("US-ASCII") ++ kv
  }

  /** Placeholder for the 100-byte name field of a pax-named member:
    * printable-ASCII projection, truncated — readers that honor the pax
    * `path` record (ours, GNU, bsdtar) never see it. */
  private def asciiFallback(name: String): String = {
    val s = name.map(c => if (c >= 0x20 && c < 0x7f) c else '_').take(100)
    if (s.isEmpty) "_" else s
  }

  /** Exact archive bytes one member contributes: header block + padded
    * payload, plus a pax `x` pseudo-entry (its own header + padded
    * record) when the name needs one. [[packTarGroups]] budgets its
    * byte bound with this, so predicted and written shard sizes agree. */
  def entryCost(name: String, payloadLen: Int): Long = {
    def padded(n: Long): Long = ((n + BlockSize - 1) / BlockSize) * BlockSize
    val base = BlockSize + padded(payloadLen.toLong)
    if (isPlainName(name)) base
    else base + BlockSize + padded(paxRecord("path", name).length.toLong)
  }

  /** Serialize (name, payload) pairs as one ustar archive, written into
    * ONE exactly-sized array (no growth doubling, no final copy — at a
    * 1 GiB shard bound an ArrayBuffer build peaks at 2-3x the archive
    * per writer task). Plain 1..100-byte printable-ASCII names go in
    * the classic header field; longer or non-ASCII names (UTF-8 is
    * legal in pax) are carried by a pax `x` extended header with a
    * length-prefixed `path` record — the same form [[listEntries]]
    * parses and GNU tar emits, so foreign readers reconstruct the key
    * exactly. Empty names reject loudly. */
  def writeTar(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    files.foreach { case (name, _) =>
      require(name.nonEmpty, "tar entry name must be non-empty")
    }
    val total = files.iterator
      .map { case (n, p) => entryCost(n, p.length) }.sum + 2L * BlockSize
    require(total <= Int.MaxValue.toLong,
      s"tar archive exceeds 2 GiB ($total bytes); lower the shard bound")
    val out = new Array[Byte](total.toInt)
    var pos = 0
    // header at `pos`: name field (<=100 ASCII bytes), size, typeflag;
    // checksum = bytes summed with the checksum field as spaces, stored
    // as 6 octal digits + NUL + space
    def putHeader(nameAscii: Array[Byte], size: Int, typeflag: Byte): Unit = {
      System.arraycopy(nameAscii, 0, out, pos, nameAscii.length)
      System.arraycopy(octal(420, 8), 0, out, pos + 100, 8) // mode 0644
      System.arraycopy(octal(0, 8), 0, out, pos + 108, 8) // uid
      System.arraycopy(octal(0, 8), 0, out, pos + 116, 8) // gid
      System.arraycopy(octal(size.toLong, 12), 0, out, pos + 124, 12)
      System.arraycopy(octal(0, 12), 0, out, pos + 136, 12) // mtime 0: determinism
      out(pos + 156) = typeflag
      System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, out, pos + 257, 8)
      java.util.Arrays.fill(out, pos + 148, pos + 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < BlockSize) { sum += out(pos + i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = "0" * (6 - cs.length) + cs
      System.arraycopy((csPad + "\u0000 ").getBytes("US-ASCII"), 0, out, pos + 148, 8)
      pos += BlockSize
    }
    def putPayload(p: Array[Byte]): Unit = {
      System.arraycopy(p, 0, out, pos, p.length)
      pos += ((p.length + BlockSize - 1) / BlockSize) * BlockSize // NUL pad pre-zeroed
    }
    for ((name, payload) <- files) {
      if (!isPlainName(name)) {
        val rec = paxRecord("path", name)
        putHeader(asciiFallback(s"PaxHeaders.0/$name").getBytes("US-ASCII"),
          rec.length, 'x')
        putPayload(rec)
      }
      val headerName =
        if (isPlainName(name)) name.getBytes("US-ASCII")
        else asciiFallback(name).getBytes("US-ASCII")
      putHeader(headerName, payload.length, '0')
      putPayload(payload)
    }
    // the trailing 2-block end-of-archive marker is the pre-zeroed tail
    out
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
          // where the decimal prefix counts the WHOLE record including
          // itself — parse by the prefix (not by '\n' splitting) so a
          // path value legally containing a newline survives. A pax
          // `size` override (members > 8 GiB, beyond this Array[Byte]
          // reader) rejects loudly rather than misparsing every
          // subsequent header at the stale octal size.
          var off = 0
          val lim = size.toInt
          while (off < lim) {
            var sp = off
            while (sp < lim && tar(payloadOff + sp) != ' ') sp += 1
            require(sp > off && sp < lim, s"pax record missing length prefix at $pos")
            val recLen = new String(tar, payloadOff + off, sp - off, "US-ASCII").toInt
            require(recLen > sp - off + 1 && off + recLen <= lim,
              s"pax record length out of range at $pos")
            require(tar(payloadOff + off + recLen - 1) == '\n',
              s"pax record missing terminator at $pos")
            val body = new String(tar, payloadOff + sp + 1,
              off + recLen - 1 - (sp + 1), "UTF-8")
            val eq = body.indexOf('=')
            require(eq > 0, s"pax record missing '=' at $pos")
            body.substring(0, eq) match {
              case "path" => pendingName = Some(body.substring(eq + 1))
              case "size" => throw new IllegalArgumentException(
                s"pax size override unsupported (member > 8 GiB?) at $pos")
              case _ => () // mtime/atime/uid/…: no bearing on samples
            }
            off += recLen
          }
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
                  bytes + entryCost(it.head._2, it.head._3.length) <= maxShardBytes)) {
              val r = it.next()
              bytes += entryCost(r._2, r._3.length)
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
