package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, lit, max, min}
import org.apache.spark.sql.types.{DataType, NumericType, StructType}

/**
 * Manifest-versioned parquet snapshots — the minimal lakehouse commit
 * protocol (the Delta/Iceberg core) for reproducible training data: every
 * commit writes its data files to a version-private directory and then
 * publishes ONE manifest file whose atomic create is the commit point.
 *
 *   - Readers resolve a version to an explicit file list from its
 *     manifest — they never LIST the data tree, so half-written files,
 *     failed commits, and eventually-consistent object-store listings are
 *     invisible by construction.
 *   - Writers race on the manifest create (`rename` onto a fresh name
 *     fails if it exists): optimistic concurrency, last loser retries.
 *   - Old versions stay readable forever (time travel) until a GC pass
 *     deletes manifests; "what data trained this model" is answered by a
 *     version number instead of a directory copy.
 *
 * At 100 TB the manifest is KB-sized text (file paths), the data files
 * are immutable parquet, and an `append` commit reuses every prior file —
 * commit cost is proportional to NEW data only.
 */
object Snapshots {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long) = new Path(dir, f"_manifests/v$v%06d.manifest")

  /** Highest committed version, if any. Manifest names are fixed-width so
    * this is a lexicographic max over one small directory listing. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val mdir = new Path(dir, "_manifests")
    if (!f.exists(mdir)) None
    else {
      val vs = f.listStatus(mdir).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toLong }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** A committed version: the table schema at commit time (header line)
    * plus the explicit file list, plus optional per-(file, column) min/max
    * stats lines used for scan pruning. The schema rides in the manifest
    * so an EMPTY version (or an empty change window) still reads as a
    * typed, zero-row DataFrame instead of a schemaless one. Stats keys are
    * scheme-stripped paths (`Path.toUri.getPath`) so `file:/` vs `file:///`
    * spellings can't split an entry from its file. */
  private case class Manifest(schemaDdl: Option[String], files: Seq[String],
      stats: Map[(String, String), (Option[String], Option[String])],
      statsCols: Seq[String])

  /** min/max values are base64-wrapped in the manifest (a string column's
    * extremes may contain tabs/newlines); `-` marks "no value" (all-null
    * file), which pruning treats as "keep". */
  private def encStat(v: Option[String]): String =
    v.map(s => java.util.Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8)))
      .getOrElse("-")

  private def decStat(t: String): Option[String] =
    if (t == "-") None
    else Some(new String(java.util.Base64.getDecoder.decode(t), StandardCharsets.UTF_8))

  private def pathKey(s: String): String = new Path(s).toUri.getPath

  private def readManifestFull(spark: SparkSession, dir: String, v: Long): Manifest = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, v)
    require(f.exists(p), s"snapshot version $v does not exist under $dir")
    val in = f.open(p)
    val lines = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0).foreach(bytes.write(buf, 0, _))
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
    } finally in.close()
    val stats = lines.collect { case l if l.startsWith("#stats\t") =>
      l.split("\t", -1) match {
        case Array(_, path, c, mn, mx) => (path, c) -> (decStat(mn), decStat(mx))
      }
    }.toMap
    Manifest(
      lines.collectFirst { case l if l.startsWith("#schema\t") => l.stripPrefix("#schema\t") },
      lines.filterNot(_.startsWith("#")),
      stats,
      lines.collectFirst { case l if l.startsWith("#statsCols\t") =>
        l.stripPrefix("#statsCols\t").split(",").toSeq.filter(_.nonEmpty) }
        .getOrElse(Seq.empty))
  }

  private def readManifest(spark: SparkSession, dir: String, v: Long): Seq[String] =
    readManifestFull(spark, dir, v).files

  private def emptyWithSchema(spark: SparkSession, ddl: Option[String]): DataFrame =
    ddl.map(d => spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(d)))
      .getOrElse(spark.emptyDataFrame)

  /**
   * Commit `df` as the next version. `append = true` carries the previous
   * version's files forward; `false` makes this version a full overwrite
   * (prior versions remain readable). Returns the committed version.
   *
   * `expectedVersion` is the optimistic-transaction guard: a caller that
   * read version v−1, derived this commit from it, and passes `Some(v)`
   * is guaranteed either to publish exactly v or to throw because a
   * concurrent committer got there first (the manifest `rename` onto a
   * fresh name is the atomic claim — verified non-overwriting on the
   * local FS, the HDFS rename contract elsewhere). Without it the commit
   * targets whatever the latest version is at entry, last-writer-wins.
   * A lost race throws — the caller retries, re-reading its base.
   *
   * `statsCols` opts files into per-file min/max manifest stats for those
   * columns, computed by one aggregate pass over the NEW files only (so,
   * like the commit itself, stats cost is proportional to new data — an
   * append onto 100 TB re-stats only the appended files and carries every
   * prior stats line forward verbatim). Readers prune with
   * `readVersionRange`; files committed without stats are never pruned.
   */
  /** Thrown by an audited commit whose staged data failed its audit; the
    * staged files are already cleaned up when this escapes. Each row of
    * `report` is one failed rule as the audit function reported it. */
  final case class AuditFailedException(report: Seq[org.apache.spark.sql.Row])
    extends RuntimeException(
      s"snapshot audit failed: ${report.map(_.toString).mkString("; ")}")

  def commit(df: DataFrame, dir: String, append: Boolean = true,
      expectedVersion: Option[Long] = None, statsCols: Seq[String] = Seq.empty,
      audit: Option[DataFrame => DataFrame] = None): Long = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val v = expectedVersion.getOrElse(latestVersion(spark, dir).map(_ + 1).getOrElse(0L))
    require(v >= 0, s"snapshot version must be >= 0: $v")
    val dataDir = new Path(dir, f"data/v$v%06d-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.parquet(dataDir.toString)
    // write–AUDIT–publish: the audit runs on the STAGED files (what
    // readers would actually see), between the data write and the
    // manifest publish. A failed audit deletes the staging dir and
    // throws — the commit point was never reached, so concurrent readers
    // never saw a row of the rejected batch. The audit fn returns report
    // rows with a boolean `pass` column; any false row fails the commit.
    audit.foreach { a =>
      val bad = a(spark.read.parquet(dataDir.toString))
        .filter(!col("pass")).collect()
      if (bad.nonEmpty) {
        f.delete(dataDir, true)
        throw AuditFailedException(bad.toSeq)
      }
    }
    val newFiles = f.listStatus(dataDir).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .map(_.toString).sorted.toSeq
    val statLines: Seq[String] =
      if (statsCols.isEmpty) Seq.empty
      else {
        val aggs = statsCols.flatMap(c => Seq(
          min(col(c)).cast("string"), max(col(c)).cast("string")))
        spark.read.parquet(dataDir.toString)
          .groupBy(input_file_name().as("__file"))
          .agg(aggs.head, aggs.tail: _*)
          .collect().toSeq // one row per new file — manifest-sized
          .flatMap { r =>
            statsCols.zipWithIndex.map { case (c, i) =>
              s"#stats\t${pathKey(r.getString(0))}\t$c\t" +
                s"${encStat(Option(r.getString(1 + 2 * i)))}\t" +
                encStat(Option(r.getString(2 + 2 * i)))
            }
          }
      }
    val prior = if (append && v > 0) readManifestFull(spark, dir, v - 1)
      else Manifest(None, Seq.empty, Map.empty, Seq.empty)
    val carried = prior.files
    val carriedStats = prior.stats.map { case ((p, c), (mn, mx)) =>
      s"#stats\t$p\t$c\t${encStat(mn)}\t${encStat(mx)}"
    }.toSeq.sorted
    val tmp = new Path(dir, s"_manifests/.tmp-${java.util.UUID.randomUUID()}")
    f.mkdirs(new Path(dir, "_manifests"))
    val out = f.create(tmp, true)
    // the table's stats set rides in the header so rewrite commits
    // (compact, deleteWhere) can re-stat without every call site having
    // to remember the column list; an append inherits the prior set
    val effectiveStatsCols =
      if (statsCols.nonEmpty) statsCols
      else if (append) prior.statsCols else Seq.empty
    val headers = Seq(s"#schema\t${df.schema.toDDL}",
      s"#committedAt\t${System.currentTimeMillis()}") ++
      (if (effectiveStatsCols.nonEmpty)
        Seq(s"#statsCols\t${effectiveStatsCols.mkString(",")}") else Seq.empty)
    try out.write(((headers ++ (carriedStats ++ statLines)) ++ (carried ++ newFiles))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rename onto a fresh name is the atomic commit point: if a concurrent
    // committer already published this version, rename returns false and
    // this commit's data dir is dead weight for GC — never half-visible
    if (!f.rename(tmp, manifestPath(dir, v))) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"snapshot commit race lost: version $v already exists under $dir")
    }
    v
  }

  /**
   * Compaction (the OPTIMIZE pass): rewrite the latest version's data as
   * ~`targetFileBytes`-sized files and publish the result as a new version
   * with identical rows. Small-file pressure is the operational failure
   * mode of an append-heavy table at scale — thousands of KB-files per
   * day turn every scan into a metadata storm; compaction amortizes them
   * away without blocking readers (old versions stay live until vacuum).
   * The file-count choice comes from the manifest's own byte accounting,
   * not a row count guess.
   */
  def compact(spark: SparkSession, dir: String, targetFileBytes: Long = 128L << 20,
      statsCols: Seq[String] = Seq.empty): Long = {
    val v = latestVersion(spark, dir)
    require(v.isDefined, s"nothing to compact under $dir")
    val f = fs(spark, dir)
    val m = readManifestFull(spark, dir, v.get)
    val bytes = m.files.map(p => f.getFileStatus(new Path(p)).getLen).sum
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val data = readVersion(spark, dir, v.get).repartition(nFiles)
    // a rewrite must not silently turn off data skipping: default to the
    // table's recorded stats set when the caller doesn't override
    commit(data, dir, append = false, expectedVersion = Some(v.get + 1),
      statsCols = if (statsCols.nonEmpty) statsCols else m.statsCols)
  }

  /**
   * Vacuum: delete every data file not referenced by a retained manifest,
   * and the manifests below `retainVersions` from the latest. Bounds the
   * storage cost of time travel; after vacuum, only the retained window
   * is readable. Returns the number of deleted data files.
   */
  def vacuum(spark: SparkSession, dir: String, retainVersions: Int = 2): Long = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val f = fs(spark, dir)
    val latest = latestVersion(spark, dir).getOrElse(return 0L)
    val cutoff = latest - retainVersions + 1
    val mdir = new Path(dir, "_manifests")
    // operate on the versions that actually EXIST: a young table (fewer
    // versions than the retention window) or a previously-vacuumed one has
    // gaps below the cutoff, and assuming contiguity would crash the
    // live-set read
    val existing = f.listStatus(mdir).map(_.getPath)
      .collect { case p if p.getName.startsWith("v") && p.getName.endsWith(".manifest") =>
        p.getName.stripPrefix("v").stripSuffix(".manifest").toLong -> p }
      .sortBy(_._1)
    existing.filter(_._1 < cutoff).foreach { case (_, p) => f.delete(p, false) }
    val live = existing.collect { case (v, _) if v >= cutoff => v }
      .flatMap(readManifest(spark, dir, _)).toSet
    val dataRoot = new Path(dir, "data")
    if (!f.exists(dataRoot)) return 0L
    var deleted = 0L
    f.listStatus(dataRoot).foreach { sub =>
      val all = f.listStatus(sub.getPath)
      val dead = all.filter(s => !live.contains(s.getPath.toString))
      dead.foreach { s =>
        if (f.delete(s.getPath, false) && s.getPath.getName.endsWith(".parquet")) deleted += 1
      }
      // drop the per-version dir once nothing in it is referenced
      if (dead.length == all.length) f.delete(sub.getPath, true)
    }
    deleted
  }

  /** Read an exact committed version (time travel). An empty version
    * reads as a typed zero-row DataFrame (schema from the manifest). */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val m = readManifestFull(spark, dir, v)
    if (m.files.isEmpty) emptyWithSchema(spark, m.schemaDdl)
    else spark.read.parquet(m.files: _*)
  }

  /**
   * Incremental read (change feed): the rows ADDED between two committed
   * versions, resolved as the file-set difference of their manifests —
   * zero data reads beyond the new files themselves, because files are
   * immutable and appends only ever add paths. This is how a downstream
   * incremental pipeline (dedup screen, index refresh, training-shard
   * builder) consumes the table without rescanning history. An overwrite
   * inside the window surfaces only files still live at `toV` — the
   * change feed is "what's new in toV relative to fromV", not an event
   * log.
   */
  def readChanges(spark: SparkSession, dir: String, fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"change window must run forward: $fromV..$toV")
    val before = readManifest(spark, dir, fromV).toSet
    val to = readManifestFull(spark, dir, toV)
    val added = to.files.filterNot(before)
    // "no changes" is a typed empty frame — consumers column-select it
    if (added.isEmpty) emptyWithSchema(spark, to.schemaDdl)
    else spark.read.parquet(added: _*)
  }

  /**
   * Incremental view maintenance for an additive (count, sum) aggregate
   * over an APPEND-ONLY snapshot dir: the maintained view at version N
   * is view(N−1) merged with the aggregate of just the N−1→N change
   * feed — each refresh reads only the delta files, never the full
   * table. This is the materialized-view refresh loop every lakehouse
   * runs; at 100 TB the delta is hours of ingest while the table is
   * years, which is the entire point.
   *
   * Contract: additive measures only, and append-only history (an
   * overwrite or delete commit invalidates the fold — such dirs need a
   * full recompute, which is why [[readChanges]] is append-shaped too).
   * Returns (key, n, total) for every key ever seen.
   */
  def incrementalCountSum(spark: SparkSession, dir: String,
      keyCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val vmax = latestVersion(spark, dir)
    require(vmax.isDefined, s"no committed snapshot under $dir")
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy(col(keyCol).as("key"))
        .agg(count(lit(1)).as("n"), sum(col(valCol)).as("total"))
    var view = aggOf(readVersion(spark, dir, 0L))
    for (v <- 1L to vmax.get) {
      val delta = aggOf(readChanges(spark, dir, v - 1, v))
        .select(col("key"), col("n").as("dn"), col("total").as("dtotal"))
      view = view.join(delta, Seq("key"), "full_outer")
        .select(col("key"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("total"), lit(0.0)) + coalesce(col("dtotal"), lit(0.0))).as("total"))
    }
    view
  }

  /**
   * Row-level semantic diff between two versions: multiset except in
   * both directions, tagged `insert` (in v2, not v1) / `delete` (in v1,
   * not v2). An update surfaces as a delete of the old row plus an
   * insert of the new one. Unlike [[readChanges]] (file-level, append
   * shaped) this is correct across OVERWRITE and delete commits — the
   * audit query "what actually changed between yesterday's table and
   * today's", at the cost of reading both versions.
   */
  def diffVersions(spark: SparkSession, dir: String, v1: Long, v2: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = readVersion(spark, dir, v1)
    val b = readVersion(spark, dir, v2)
    b.exceptAll(a).withColumn("op", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("delete")))
  }

  /** Read the latest committed version. */
  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir)
    require(v.isDefined, s"no committed snapshot under $dir")
    readVersion(spark, dir, v.get)
  }

  /** A version's commit wall-clock time (epoch millis), if recorded —
    * manifests written before the `#committedAt` header lack it. */
  def commitTime(spark: SparkSession, dir: String, v: Long): Option[Long] = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, v)
    require(f.exists(p), s"snapshot version $v does not exist under $dir")
    val in = f.open(p)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      Iterator.continually(reader.readLine()).takeWhile(_ != null)
        .collectFirst { case l if l.startsWith("#committedAt\t") =>
          l.stripPrefix("#committedAt\t").toLong }
    } finally in.close()
  }

  /**
   * Timestamp time travel (TIMESTAMP AS OF): the latest version committed
   * at or before `tsMillis`. Pre-header manifests (no recorded commit
   * time) count as arbitrarily old — always eligible — so upgrading a
   * table never makes its history unreadable. Throws if every version is
   * newer than the asked-for time.
   */
  def readAsOf(spark: SparkSession, dir: String, tsMillis: Long): DataFrame = {
    val f = fs(spark, dir)
    val mdir = new Path(dir, "_manifests")
    require(f.exists(mdir), s"no committed snapshot under $dir")
    val versions = f.listStatus(mdir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }.sorted
    val eligible = versions.filter(v =>
      commitTime(spark, dir, v).forall(_ <= tsMillis))
    require(eligible.nonEmpty,
      s"no snapshot version under $dir committed at or before $tsMillis")
    readVersion(spark, dir, eligible.max)
  }

  /**
   * Predicate delete (the governance / right-to-be-forgotten pass):
   * publish a new version containing every current row EXCEPT those where
   * `predicate` is TRUE — rows where it evaluates NULL are kept (delete
   * removes what provably matches, it doesn't launder unknowns). A full
   * overwrite commit: prior versions still hold the deleted rows until
   * `vacuum` reclaims them, which is the documented two-step of every
   * manifest-based table format (logical delete now, physical scrub at
   * vacuum). Returns the new version.
   */
  def deleteWhere(spark: SparkSession, dir: String,
      predicate: Column, statsCols: Seq[String] = Seq.empty): Long = {
    val v = latestVersion(spark, dir)
    require(v.isDefined, s"nothing to delete under $dir")
    val m = readManifestFull(spark, dir, v.get)
    val kept = readVersion(spark, dir, v.get)
      .filter(!org.apache.spark.sql.functions.coalesce(predicate, lit(false)))
    // same skip-preservation rule as compact: the rewrite re-stats the
    // table's recorded stats columns unless explicitly overridden
    commit(kept, dir, append = false, expectedVersion = Some(v.get + 1),
      statsCols = if (statsCols.nonEmpty) statsCols else m.statsCols)
  }

  /**
   * Shallow clone (zero-copy branching): start a NEW table at `targetDir`
   * whose v0 manifest references the SOURCE's latest data files verbatim —
   * no data is copied, so cloning a 100 TB table costs one manifest
   * write. The clone then evolves independently (appends, deletes,
   * compaction land under its own `data/` tree). Ownership caveat, same
   * as every shallow-clone design: the clone's `vacuum` only scans its
   * OWN data root and cannot touch shared files, but a vacuum on the
   * SOURCE can delete files the clone still references — treat cloned
   * sources as retention-pinned, or compact the clone first (its rewrite
   * copies the rows it keeps). Returns the clone's version (always 0).
   */
  def cloneLatest(spark: SparkSession, dir: String, targetDir: String): Long = {
    val v = latestVersion(spark, dir)
    require(v.isDefined, s"no committed snapshot under $dir")
    val f = fs(spark, targetDir)
    require(latestVersion(spark, targetDir).isEmpty,
      s"clone target $targetDir already has committed versions")
    val src = manifestPath(dir, v.get)
    val in = fs(spark, dir).open(src)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0).foreach(bos.write(buf, 0, _))
      bos.toByteArray
    } finally in.close()
    // the clone is a NEW commit: its v0 carries the clone wall-clock, not
    // the source's — readAsOf(clone, t) must not resolve for t before the
    // clone existed
    val restamped = new String(bytes, StandardCharsets.UTF_8)
      .split("\n").map { l =>
        if (l.startsWith("#committedAt\t"))
          s"#committedAt\t${System.currentTimeMillis()}" else l
      }.mkString("\n")
    val tmp = new Path(targetDir, s"_manifests/.tmp-${java.util.UUID.randomUUID()}")
    f.mkdirs(new Path(targetDir, "_manifests"))
    val out = f.create(tmp, true)
    try out.write(restamped.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!f.rename(tmp, manifestPath(targetDir, 0L))) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"snapshot clone race lost: version 0 already exists under $targetDir")
    }
    0L
  }

  /** Stats-aware ordering for pruning decisions. Numeric columns compare
    * as BigDecimal (string-cast doubles may arrive in scientific
    * notation); everything else compares as UTF-8 BYTES — the binary
    * ordering Spark's string min/max uses — because Java's String
    * compareTo (UTF-16 code units) disagrees with it above the BMP, and a
    * pruning comparator that disagrees with the stats writer is how files
    * get wrongly skipped. Date/timestamp string forms are fixed-width
    * ISO, so byte order is value order there too. */
  private def statCompare(dt: DataType)(a: String, b: String): Int = dt match {
    case _: NumericType =>
      // a float column's extremes can be "NaN"/"Infinity" (Spark's max
      // treats NaN as the largest double) — BigDecimal can't parse those,
      // and a crash here would make the version unreadable via the pruned
      // path. Declaring the values equal makes both bound checks pass, so
      // the file is conservatively KEPT (never wrongly skipped).
      try new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
      catch { case _: NumberFormatException => 0 }
    case _ => java.util.Arrays.compareUnsigned( // bytes are SIGNED in Java;
      // UTF8String orders them unsigned, and 0xF0… must sort above ASCII
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))
  }

  /**
   * The file lists behind a range-pruned read of `column` ∈ [`lo`, `hi`]
   * (either bound optional, both inclusive, values in string-cast form):
   * (files kept, total files in the version). A file survives unless its
   * recorded [min, max] provably misses the range; files with no stats
   * for the column — committed before stats, different stats set, or
   * all-null — are kept conservatively. Exposed so tests (and operators
   * reporting scan amplification) can see the pruning rate, not just the
   * pruned result.
   */
  def filesInRange(spark: SparkSession, dir: String, v: Long, column: String,
      lo: Option[String], hi: Option[String]): (Seq[String], Int) =
    filesInRangeOf(readManifestFull(spark, dir, v), column, lo, hi)

  private def filesInRangeOf(m: Manifest, column: String,
      lo: Option[String], hi: Option[String]): (Seq[String], Int) = {
    val dt = m.schemaDdl.map(d => StructType.fromDDL(d).apply(column).dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)
    val cmp = statCompare(dt) _
    val kept = m.files.filter { file =>
      m.stats.get((pathKey(file), column)) match {
        case Some((Some(mn), Some(mx))) =>
          // keep iff [mn, mx] intersects [lo, hi]
          lo.forall(l => cmp(mx, l) >= 0) && hi.forall(h => cmp(mn, h) <= 0)
        case _ => true
      }
    }
    (kept, m.files.size)
  }

  /**
   * Data-skipping read: version `v` restricted to `column` ∈ [`lo`, `hi`],
   * scanning only the files whose manifest stats can contain the range and
   * applying the residual row filter on the survivors — so results are
   * EXACTLY `readVersion(...).filter(between)`, files skipped or not. This
   * is the payoff of the stats lines (and of committing range- or
   * z-order-clustered data): a time- or key-windowed read of a 100 TB
   * table opens the handful of files whose ranges overlap the window
   * instead of every file ever committed. Pruning never consults data —
   * one manifest read decides the scan set.
   */
  def readVersionRange(spark: SparkSession, dir: String, v: Long, column: String,
      lo: Option[String], hi: Option[String]): DataFrame = {
    // ONE manifest read serves both the prune and the residual filter —
    // on an object store each manifest open is a remote GET
    val m = readManifestFull(spark, dir, v)
    val dt = m.schemaDdl.map(d => StructType.fromDDL(d).apply(column).dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)
    val (kept, _) = filesInRangeOf(m, column, lo, hi)
    val base = if (kept.isEmpty) emptyWithSchema(spark, m.schemaDdl)
      else spark.read.parquet(kept: _*)
    val bounds: Seq[Column] =
      lo.map(l => col(column) >= lit(l).cast(dt)).toSeq ++
        hi.map(h => col(column) <= lit(h).cast(dt)).toSeq
    bounds.foldLeft(base)(_.filter(_))
  }
}
