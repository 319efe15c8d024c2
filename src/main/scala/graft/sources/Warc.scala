package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, DataInputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC/1.0 (ISO 28500) reader and writer — the wire format of web-crawl
 * corpora (Common Crawl), i.e. the on-disk shape the raw end of an LLM
 * data pipeline actually ingests. Hand-rolled framing from the public
 * spec: each record is a header block (`WARC/1.0` + `Name: value` lines,
 * CRLF line ends) terminated by a blank line, then exactly
 * `Content-Length` payload bytes, then CRLFCRLF.
 *
 * Scale posture: WARC is NOT splittable (gzip members carry no sync
 * markers a generic splitter can find), so parallelism is one task per
 * FILE — exactly how production crawl pipelines run, because crawl
 * archives are built as many ~1 GB files by construction. The reader
 * parallelizes the file listing and STREAMS each file (memory is
 * O(largest record), never O(file) — no `binaryFiles` whole-file
 * loads). `.warc.gz` files decode through `GZIPInputStream`, whose
 * concatenated-member handling covers both one-stream-per-file and the
 * member-per-record layout crawlers emit for record-level seeks.
 */
object Warc {

  /** Parsed record: the WARC headers that matter + raw payload bytes. */
  case class WarcRecord(warcType: String, recordId: String, targetUri: String,
      warcDate: String, contentLength: Long, payload: Array[Byte])

  /**
   * Read every record of every `*.warc` / `*.warc.gz` file under `path`
   * into (warc_type, record_id, target_uri, warc_date, content_length,
   * payload). One task per file; records stream lazily off the open
   * file handle.
   */
  def read(spark: SparkSession, path: String): DataFrame = {
    val confBc = spark.sparkContext.broadcast(
      new MrldaSequenceFile.SerializableConf(spark.sparkContext.hadoopConfiguration))
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(path)).toSeq
      .map(_.getPath.toString)
      .filter(p => p.endsWith(".warc") || p.endsWith(".warc.gz"))
      .sorted
    import spark.implicits._
    spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { file =>
        val p = new Path(file)
        val raw: InputStream = p.getFileSystem(confBc.value.value).open(p)
        val in = if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
        recordIterator(new DataInputStream(new BufferedInputStream(in)))
      }
      .map(r => (r.warcType, r.recordId, r.targetUri, r.warcDate,
        r.contentLength, r.payload))
      .toDF("warc_type", "record_id", "target_uri", "warc_date",
        "content_length", "payload")
  }

  /** GZIPOutputStream writing ONE gzip member and releasing its native
    * Deflater on `finishMember()` without closing the underlying stream
    * (plain `finish()` would leak a native Deflater per record). */
  private final class MemberGzip(out: java.io.OutputStream)
      extends GZIPOutputStream(out) {
    def finishMember(): Unit = { finish(); `def`.end() }
  }

  /**
   * Write `df` as WARC response records, one file per partition
   * (`part-NNNNN.warc[.gz]`). Expects columns (record_id, target_uri,
   * warc_date, payload binary) — see `fromDocuments` for the standard
   * projection. `gzipPerRecord = true` emits each record as its own
   * gzip MEMBER (the crawl layout that allows per-record random access
   * given an offset index); `false` writes plain `.warc`.
   */
  def write(df: DataFrame, path: String, gzipPerRecord: Boolean = true): Unit = {
    val spark = df.sparkSession
    val confBc = spark.sparkContext.broadcast(
      new MrldaSequenceFile.SerializableConf(spark.sparkContext.hadoopConfiguration))
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    val ext = if (gzipPerRecord) ".warc.gz" else ".warc"
    df.select(col("record_id").cast("string"), col("target_uri").cast("string"),
        col("warc_date").cast("string"), col("payload").cast("binary"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = TaskContext.get()
          val part = tc.partitionId()
          // task-commit protocol: write to an attempt-suffixed temp file
          // and RENAME into place — a retried/speculative attempt can
          // never interleave bytes with a concurrent writer of the same
          // partition file (rename is the atomic publish; first attempt
          // to land wins, losers' temps are swept below)
          val fs = new Path(path).getFileSystem(confBc.value.value)
          val finalFile = new Path(path, f"part-$part%05d$ext")
          val tmpFile = new Path(path,
            f".part-$part%05d.attempt-${tc.taskAttemptId()}$ext.tmp")
          val out = fs.create(tmpFile, true)
          try {
            it.foreach { r =>
              val rec = recordBytes(r.getString(0), r.getString(1),
                r.getString(2), r.getAs[Array[Byte]](3))
              if (gzipPerRecord) {
                val gz = new MemberGzip(out)
                gz.write(rec)
                gz.finishMember() // member trailer; `out` stays open
              } else out.write(rec)
            }
          } finally out.close()
          if (!fs.rename(tmpFile, finalFile)) fs.delete(tmpFile, false)
          ()
        }
      }
    // sweep temps of failed/superseded attempts (readers filter on
    // extension, so leftovers are harmless, but don't leave litter)
    fs.listStatus(new Path(path)).filter(_.getPath.getName.endsWith(".tmp"))
      .foreach(st => fs.delete(st.getPath, false))
  }

  /** The standard projection from the `documents` table to writable WARC
    * rows: deterministic record ids (md5 of the doc id — no random
    * UUIDs; re-runs must produce identical archives), a urn-style
    * target URI carrying the doc id, and a fixed archive date. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    docs.select(
      concat(lit("<urn:uuid:"), md5(col(idCol).cast("string")), lit(">")).as("record_id"),
      concat(lit("https://graft.invalid/"), col(sourceCol), lit("/"),
        col(idCol).cast("string")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("warc_date"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** One WARC/1.0 response record, fully framed. */
  private[sources] def recordBytes(recordId: String, targetUri: String,
      warcDate: String, payload: Array[Byte]): Array[Byte] = {
    val header =
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Record-ID: $recordId\r\n" +
        s"WARC-Date: $warcDate\r\n" +
        s"WARC-Target-URI: $targetUri\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        "\r\n"
    val out = new ByteArrayOutputStream(header.length + payload.length + 4)
    out.write(header.getBytes(UTF_8))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(UTF_8))
    out.toByteArray
  }

  /** Lazy pull-parser over one (possibly multi-member-gzip) WARC stream.
    * Closes the stream at EOF. Tolerates LF-only line ends and a missing
    * final record terminator (both appear in the wild). Payload bytes
    * are counted, never scanned — binary-safe by construction. */
  private[sources] def recordIterator(in: DataInputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      advance()

      override def hasNext: Boolean = !done
      override def next(): WarcRecord = {
        if (done) throw new NoSuchElementException("past end of WARC stream")
        val r = nextRec
        advance()
        r
      }

      private def advance(): Unit = {
        val headers = readHeaderBlock()
        if (headers == null) { done = true; in.close(); return }
        val h = headers.map { line =>
          val i = line.indexOf(':')
          if (i < 0) (line, "") else (line.take(i).trim, line.drop(i + 1).trim)
        }.toMap
        val len = h.getOrElse("Content-Length",
          throw new IllegalStateException(
            s"WARC record missing Content-Length (headers: ${headers.mkString("|")})")).toLong
        require(len <= Int.MaxValue, s"record payload too large: $len")
        val payload = new Array[Byte](len.toInt)
        in.readFully(payload)
        // the record terminator (CRLFCRLF) reads as blank lines and is
        // skipped by the next readHeaderBlock — nothing to consume here,
        // so a next record's 'W' is never eaten by trailer handling
        nextRec = WarcRecord(h.getOrElse("WARC-Type", ""),
          h.getOrElse("WARC-Record-ID", ""), h.getOrElse("WARC-Target-URI", ""),
          h.getOrElse("WARC-Date", ""), len, payload)
      }

      /** Header lines up to the blank separator; null at clean EOF.
        * Skips blank lines BEFORE the version line (the inter-record
        * terminator), then requires `WARC/…`. */
      private def readHeaderBlock(): Seq[String] = {
        var first = readLine()
        while (first != null && first.isEmpty) first = readLine()
        if (first == null) return null
        if (!first.startsWith("WARC/"))
          throw new IllegalStateException(s"expected WARC version line, got '$first'")
        val buf = Seq.newBuilder[String]
        var line = readLine()
        while (line != null && line.nonEmpty) { buf += line; line = readLine() }
        buf.result()
      }

      /** One LF-terminated line with trailing CR stripped; "" for a blank
        * line; null at EOF before any byte. */
      private def readLine(): String = {
        val first = in.read()
        if (first < 0) return null
        val sb = new ByteArrayOutputStream(128)
        var b = first
        while (b >= 0 && b != '\n') {
          if (b != '\r') sb.write(b)
          b = in.read()
        }
        new String(sb.toByteArray, UTF_8)
      }
    }
}
