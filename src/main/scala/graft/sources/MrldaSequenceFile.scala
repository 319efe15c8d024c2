package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

import graft.model.{Doc, PolyDoc}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.{DataOutputBuffer, SequenceFile}
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Native reader/writer for the reference's on-disk corpora:
 * `SequenceFile<IntWritable, cc.mrlda.Document>` and the polylingual
 * variant — the wire format a migrating Mr.LDA user's existing corpus
 * directories are stored in.
 *
 * Value layout (reference cc/mrlda/Document.java:143-176 readFields /
 * 241-263 write): `int numEntries, (int termId, int count)*numEntries,
 * int numTopics, double*numTopics` — plain big-endian `DataOutput`
 * framing, no varints. `numEntries <= 0` means a null content map and
 * `numTopics <= 0` a null gamma. The polylingual layout
 * (polylda/Document.java:176-223 / 259-287) prefixes a language-slot
 * count and repeats the `(numEntries, pairs*)` block per slot. The key
 * is a plain `IntWritable` (4-byte big-endian document id), assigned at
 * ParseCorpus.java:575-580 and written uncompressed at
 * ParseCorpus.java:669-676 (`NonEmptySequenceFileOutputFormat`).
 *
 * Neither `cc.mrlda.Document` nor its cloud9 `HMapII` exist on this
 * classpath, so decoding goes through Hadoop's raw-record API
 * (`Reader.nextRawKey/nextRawValue`), which never instantiates the
 * declared key/value classes, plus a hand-rolled header/record framer on
 * the write side that stamps the reference's class names verbatim.
 *
 * Scale posture: reads are SPLIT by byte ranges at sync markers —
 * exactly `SequenceFileInputFormat`'s split semantics, re-expressed as a
 * Spark scan — so one multi-GB reducer output file fans out across
 * executors instead of pinning a single task. Writes emit one file per
 * partition and skip empty partitions (the reference's
 * `NonEmptySequenceFileOutputFormat` S4 behavior).
 */
object MrldaSequenceFile {

  /** Hadoop `Configuration` is a Writable, not java-serializable; this
    * wrapper ships it into task closures (Spark's own equivalent is
    * `private[spark]`). Shared with the other hand-framed sources (Warc). */
  private[sources] final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Class names exactly as the reference jobs stamp them into headers
    * (ParseCorpus.java:671-672, polylda/ParseCorpus.java). */
  val KeyClassName = "org.apache.hadoop.io.IntWritable"
  val DocClassName = "cc.mrlda.Document"
  val PolyDocClassName = "cc.mrlda.polylda.Document"

  /** Hadoop's sync economics: a 16-byte marker (plus a -1 length escape)
    * every ~2000 bytes of records (SequenceFile.SYNC_INTERVAL). */
  val DefaultSyncIntervalBytes = 2000

  /** Default split size for reads; small files stay one split. */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  // ---------------------------------------------------------------------
  // value codecs (byte level, shared by writer and tests)
  // ---------------------------------------------------------------------

  /** Serialize one vanilla document value (Document.java:241-263).
    * Entries are written termId-ascending — the reference's HMapII
    * iteration order is arbitrary and readers must not depend on it, but
    * a sorted writer makes our own files byte-deterministic. */
  def encodeDoc(counts: Map[Int, Int], gamma: Option[Array[Double]]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(counts.size)
    counts.toSeq.sortBy(_._1).foreach { case (id, cnt) =>
      out.writeInt(id); out.writeInt(cnt)
    }
    writeGamma(out, gamma)
    out.flush()
    bytes.toByteArray
  }

  /** Serialize one polylingual document value (polylda/Document.java:
    * 259-287): `numLanguages` fixed slots, each `(numEntries, pairs*)`;
    * a language absent from `counts` is an empty (null) slot. */
  def encodePolyDoc(counts: Map[Int, Map[Int, Int]], numLanguages: Int,
      gamma: Option[Array[Double]]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(numLanguages)
    (0 until numLanguages).foreach { lang =>
      val slot = counts.getOrElse(lang, Map.empty)
      out.writeInt(slot.size)
      slot.toSeq.sortBy(_._1).foreach { case (id, cnt) =>
        out.writeInt(id); out.writeInt(cnt)
      }
    }
    writeGamma(out, gamma)
    out.flush()
    bytes.toByteArray
  }

  private def writeGamma(out: DataOutputStream, gamma: Option[Array[Double]]): Unit =
    gamma match {
      case Some(g) if g.nonEmpty =>
        out.writeInt(g.length); g.foreach(out.writeDouble)
      case _ => out.writeInt(0)
    }

  /** Decode one vanilla document value into (counts, numTokens, gamma) —
    * mirrors Document.readFields (Document.java:143-176): token total is
    * derived, not stored. */
  def decodeDoc(bytes: Array[Byte]): (Map[Int, Int], Long, Option[Array[Double]]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val numEntries = in.readInt()
    var tokens = 0L
    val b = Map.newBuilder[Int, Int]
    var i = 0
    while (i < numEntries) {
      val id = in.readInt(); val cnt = in.readInt()
      b += id -> cnt; tokens += cnt; i += 1
    }
    (b.result(), tokens, readGamma(in))
  }

  /** Decode one polylingual value (polylda/Document.java:176-223): empty
    * slots (the reference's null HMapII) become absent map keys. */
  def decodePolyDoc(bytes: Array[Byte])
      : (Map[Int, Map[Int, Int]], Map[Int, Long], Long, Option[Array[Double]]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val numLanguages = in.readInt()
    val slots = Map.newBuilder[Int, Map[Int, Int]]
    val perLang = Map.newBuilder[Int, Long]
    var total = 0L
    var lang = 0
    while (lang < numLanguages) {
      val numEntries = in.readInt()
      if (numEntries > 0) {
        val b = Map.newBuilder[Int, Int]
        var langTokens = 0L
        var i = 0
        while (i < numEntries) {
          val id = in.readInt(); val cnt = in.readInt()
          b += id -> cnt; langTokens += cnt; i += 1
        }
        slots += lang -> b.result()
        perLang += lang -> langTokens
        total += langTokens
      }
      lang += 1
    }
    (slots.result(), perLang.result(), total, readGamma(in))
  }

  private def readGamma(in: DataInputStream): Option[Array[Double]] = {
    val n = in.readInt()
    // allocation guard (hostile-input fuzz finding, r12): the length is
    // untrusted bytes — a crafted claim of 2^28 doubles would allocate
    // gigabytes BEFORE the stream EOFs. The record's remaining bytes
    // bound the only honest length (callers decode whole value-byte
    // arrays, so available() is exact); reject loudly past it.
    if (n > 0)
      require(n.toLong * 8L <= in.available(),
        s"gamma length $n exceeds the record's remaining bytes")
    if (n <= 0) None else Some(Array.fill(n)(in.readDouble()))
  }

  // ---------------------------------------------------------------------
  // container writer (hand-rolled uncompressed record format, version 6)
  // ---------------------------------------------------------------------

  /**
   * SequenceFile header, version 6 uncompressed: `SEQ\x06`, key/value
   * class names (Hadoop `Text.writeString`: vint length + UTF-8 — class
   * names are short so the vint is one byte), two compression booleans,
   * a 4-byte metadata entry count (0), and the 16-byte sync marker.
   */
  private def writeHeader(out: DataOutputStream, keyClassName: String,
      valueClassName: String, sync: Array[Byte]): Unit = {
    out.write("SEQ".getBytes("UTF-8"))
    out.writeByte(6)
    writeVIntString(out, keyClassName)
    writeVIntString(out, valueClassName)
    out.writeBoolean(false) // value compression
    out.writeBoolean(false) // block compression
    out.writeInt(0)         // metadata entries
    out.write(sync)
  }

  /** Hadoop `WritableUtils.writeVInt`: [-112, 127] inline in one byte,
    * larger magnitudes as a size marker + big-endian payload bytes. Full
    * form, not just the short-string fast path — titles and terms in the
    * index files can exceed 127 bytes. */
  private[sources] def writeVInt(out: DataOutputStream, value: Int): Unit = {
    if (value >= -112 && value <= 127) out.writeByte(value)
    else {
      var i = value
      var len = -112
      if (i < 0) { i ^= -1; len = -120 }
      var tmp = i
      while (tmp != 0) { tmp >>>= 8; len -= 1 }
      out.writeByte(len)
      val size = if (len < -120) -(len + 120) else -(len + 112)
      var idx = size - 1
      while (idx >= 0) { out.writeByte(((i >> (8 * idx)) & 0xff).toInt); idx -= 1 }
    }
  }

  private[sources] def readVInt(in: DataInputStream): Int = {
    val first = in.readByte()
    if (first >= -112) first.toInt
    else {
      val negative = first < -120
      // Hadoop's size marker counts ITSELF: total bytes = -119-v / -111-v,
      // payload bytes are one fewer
      val payload = (if (negative) -119 - first else -111 - first) - 1
      var i = 0L
      var n = 0
      while (n < payload) { i = (i << 8) | (in.readByte() & 0xff); n += 1 }
      (if (negative) i ^ -1L else i).toInt
    }
  }

  /** Hadoop `Text` serialization: vint byte length + UTF-8 bytes. */
  private[sources] def writeText(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    writeVInt(out, b.length)
    out.write(b)
  }

  private[sources] def readText(in: DataInputStream): String = {
    val len = readVInt(in)
    val b = new Array[Byte](len)
    in.readFully(b)
    new String(b, "UTF-8")
  }

  private def writeVIntString(out: DataOutputStream, s: String): Unit =
    writeText(out, s)

  /** Deterministic per-file sync marker (Hadoop uses an MD5 of a UUID;
    * we hash the file name so fixtures are byte-reproducible). */
  private def syncFor(name: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s"graft-mrlda:$name".getBytes("UTF-8"))

  private final class RecordWriter(out: DataOutputStream, sync: Array[Byte],
      syncIntervalBytes: Int) {
    private var sinceSync = 0
    def write(key: Array[Byte], value: Array[Byte]): Unit = {
      if (sinceSync >= syncIntervalBytes) {
        out.writeInt(-1) // sync escape
        out.write(sync)
        sinceSync = 0
      }
      val recordLen = key.length + value.length
      out.writeInt(recordLen)
      out.writeInt(key.length)
      out.write(key)
      out.write(value)
      sinceSync += 8 + recordLen
    }
  }

  private[sources] def intKey(v: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream(4); val o = new DataOutputStream(b)
    o.writeInt(v); b.toByteArray
  }

  /** Write a corpus in the reference's vanilla wire format: one file per
    * non-empty partition (S4), uncompressed records, sync-marked. */
  def writeDocs(docs: Dataset[Doc], path: String,
      syncIntervalBytes: Int = DefaultSyncIntervalBytes): Unit =
    writeRaw(docs, path, KeyClassName, DocClassName, syncIntervalBytes) { doc =>
      (intKey(checkedDocId(doc.docId)), encodeDoc(doc.counts, doc.gamma))
    }

  /** Polylingual variant: `numLanguages` fixes the slot-array width the
    * reference stores explicitly (polylda/Document.java:259-264). */
  def writePolyDocs(docs: Dataset[PolyDoc], path: String, numLanguages: Int,
      syncIntervalBytes: Int = DefaultSyncIntervalBytes): Unit =
    writeRaw(docs, path, KeyClassName, PolyDocClassName, syncIntervalBytes) { doc =>
      (intKey(checkedDocId(doc.docId)), encodePolyDoc(doc.counts, numLanguages, doc.gamma))
    }

  private def checkedDocId(docId: Long): Int = {
    require(docId >= Int.MinValue && docId <= Int.MaxValue,
      s"docId $docId does not fit the reference's IntWritable key")
    docId.toInt
  }

  /** Generic distributed writer: any (key bytes, value bytes) encoding
    * under any declared class names — the other reference artifacts
    * (term/title indices, alpha, beta) ride the same container framing. */
  private[sources] def writeRaw[T](ds: Dataset[T], path: String,
      keyClassName: String, valueClassName: String, syncIntervalBytes: Int)(
      encode: T => (Array[Byte], Array[Byte])): Unit = {
    val spark = ds.sparkSession
    val confBc = spark.sparkContext.broadcast(
      new SerializableConf(spark.sparkContext.hadoopConfiguration))
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    ds.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (it.isEmpty) Iterator.empty // S4: no empty part files
      else {
        val name = f"part-$idx%05d"
        val file = new Path(path, name)
        // task-commit protocol: write under an attempt-unique temp name,
        // publish by rename — a speculative or zombie second attempt can
        // never truncate/interleave a final file another attempt already
        // produced (both attempts write identical bytes; last rename wins
        // whole-file). The dotted prefix keeps abandoned temps invisible
        // to the reader's hidden-file filter.
        val ctx = org.apache.spark.TaskContext.get()
        val attempt = if (ctx == null) "local" else ctx.taskAttemptId().toString
        val tmpFile = new Path(path, s".${name}.$attempt.tmp")
        val taskFs = file.getFileSystem(confBc.value.value)
        val out = new DataOutputStream(new java.io.BufferedOutputStream(
          taskFs.create(tmpFile, true)))
        val sync = syncFor(name)
        try {
          writeHeader(out, keyClassName, valueClassName, sync)
          val w = new RecordWriter(out, sync, syncIntervalBytes)
          it.foreach { t => val (k, v) = encode(t); w.write(k, v) }
        } finally out.close()
        taskFs.delete(file, false) // clear a previous attempt's publish
        if (!taskFs.rename(tmpFile, file)) {
          taskFs.delete(tmpFile, false)
          throw new java.io.IOException(s"could not publish $tmpFile as $file")
        }
        Iterator.single(name)
      }
    }.count(): Unit
  }

  // ---------------------------------------------------------------------
  // distributed split-aware reader
  // ---------------------------------------------------------------------

  private case class Split(path: String, start: Long, end: Long)

  /** Read a vanilla-format corpus directory (or single file) into typed
    * docs. Any uncompressed or record-compressed SequenceFile whose
    * values carry the Document layout decodes — the declared value class
    * is never instantiated. */
  def readDocs(spark: SparkSession, path: String,
      splitBytes: Long = DefaultSplitBytes): Dataset[Doc] = {
    import spark.implicits._
    scanRaw(spark, path, splitBytes) { case (key, bytes) =>
      val (counts, tokens, gamma) = decodeDoc(bytes)
      Doc(decodeIntKey(key).toLong, counts, tokens, gamma)
    }.toDS()
  }

  /** Polylingual read: per-language bags + derived token totals. */
  def readPolyDocs(spark: SparkSession, path: String,
      splitBytes: Long = DefaultSplitBytes): Dataset[PolyDoc] = {
    import spark.implicits._
    scanRaw(spark, path, splitBytes) { case (key, bytes) =>
      val (counts, perLang, total, gamma) = decodePolyDoc(bytes)
      PolyDoc(decodeIntKey(key).toLong, counts, perLang, total, gamma)
    }.toDS()
  }

  private[sources] def decodeIntKey(key: Array[Byte]): Int = {
    require(key.length == 4, s"expected 4-byte IntWritable key, got ${key.length} bytes")
    new DataInputStream(new ByteArrayInputStream(key)).readInt()
  }

  /** Generic split-aware scan yielding raw (key bytes, value bytes) —
    * shared by the corpus readers and the model-artifact readers. */
  private[sources] def scanRaw[T: scala.reflect.ClassTag](spark: SparkSession, path: String,
      splitBytes: Long)(decode: ((Array[Byte], Array[Byte])) => T)
      : org.apache.spark.rdd.RDD[T] = {
    val sc = spark.sparkContext
    val conf = sc.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val status = fs.getFileStatus(new Path(path))
    val files =
      if (status.isDirectory)
        fs.listStatus(new Path(path)).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
      else Seq(status)
    val splits = ArrayBuffer.empty[Split]
    files.foreach { f =>
      val len = f.getLen
      var off = 0L
      while (off < len) {
        val end = math.min(off + math.max(splitBytes, 1L), len)
        splits += Split(f.getPath.toString, off, end)
        off = end
      }
    }
    val confBc = sc.broadcast(new SerializableConf(conf))
    sc.parallelize(splits.toSeq, math.max(splits.size, 1))
      .flatMap(s => readSplit(confBc.value.value, s).map(decode))
  }

  /**
   * One split: sync to the first record boundary at/after `start`, then
   * read records until the first sync past `end` — the exact ownership
   * rule of `SequenceFileRecordReader` (a record belongs to the split
   * whose range contains its preceding sync/launch point), so byte-range
   * splits neither drop nor duplicate records.
   */
  /** `Reader.init` eagerly resolves the declared value class; alias the
    * reference's class names to a loadable placeholder via Hadoop's
    * `WritableName` registry (its public renamed-class escape hatch).
    * The raw-record API never instantiates it, so any Writable works.
    * Idempotent, called once per executor JVM. */
  @transient private lazy val registerAliases: Unit =
    Seq(DocClassName, PolyDocClassName,
      "edu.umd.cloud9.io.map.HMapIDW",
      "edu.umd.cloud9.io.pair.PairOfIntFloat",
      "edu.umd.cloud9.io.array.ArrayListOfIntsWritable").foreach { name =>
      org.apache.hadoop.io.WritableName.addName(
        classOf[org.apache.hadoop.io.BytesWritable], name)
    }

  private def readSplit(conf: Configuration, s: Split): Iterator[(Array[Byte], Array[Byte])] = {
    registerAliases
    val reader = new SequenceFile.Reader(conf, SequenceFile.Reader.file(new Path(s.path)))
    var open = true
    // close at task end even if the consumer stops early (limit) or a
    // decode/read error aborts mid-iteration — otherwise each abandoned
    // split leaks an open file handle until GC
    Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
      _ => if (open) { open = false; reader.close() }
    })
    try {
      if (s.start > 0) reader.sync(s.start)
      var more = reader.getPosition < s.end
      if (!more) { reader.close(); open = false; Iterator.empty }
      else new Iterator[(Array[Byte], Array[Byte])] {
        private val keyBuf = new DataOutputBuffer()
        private val valBytes = reader.createValueBytes()
        private var nextRec: (Array[Byte], Array[Byte]) = _
        advance()

        private def advance(): Unit = {
          nextRec = null
          if (!more) return
          val pos = reader.getPosition
          keyBuf.reset()
          val keyLen = reader.nextRawKey(keyBuf)
          if (keyLen < 0) { more = false }
          else if (pos >= s.end && reader.syncSeen()) {
            // record begins past a sync beyond our range: the next split owns it
            more = false
          } else {
            val key = java.util.Arrays.copyOfRange(keyBuf.getData, 0, keyLen)
            val vout = new ByteArrayOutputStream()
            reader.nextRawValue(valBytes)
            valBytes.writeUncompressedBytes(new DataOutputStream(vout))
            nextRec = (key, vout.toByteArray)
          }
          if (!more || nextRec == null) { reader.close(); open = false }
        }

        override def hasNext: Boolean = nextRec != null
        override def next(): (Array[Byte], Array[Byte]) = {
          val r = nextRec
          if (r == null) throw new NoSuchElementException
          advance()
          r
        }
      }
    } catch {
      case t: Throwable =>
        if (open) reader.close()
        throw t
    }
  }
}
