package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Format round-trips: write a frame out in another format/layout and read
 * it back with the original schema. Each call uses a fresh temp directory
 * (safe under repeated driver runs); schemas are supplied on read so CSV
 * and JSON restore exact types.
 */
object Formats {

  /** One FIXED location per (format, column set), overwritten on every
    * call: repeated verify/bench runs keep at most one copy per distinct
    * round-tripped shape on disk (a fresh temp dir per call would leak a
    * full dataset copy each run — deleteOnExit cannot remove non-empty
    * directories). */
  private def tmp(prefix: String, df: DataFrame): String = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_roundtrip")
    Files.createDirectories(base)
    // keyed by the frame's canonicalized plan (two different frames with
    // the same columns must not clobber each other before their lazy
    // reads run) and by the JVM (two concurrent drivers must not race);
    // bounded: one dir per distinct round-tripped plan per process
    val key = Integer.toHexString(df.queryExecution.logical.semanticHash())
    val pid = ProcessHandle.current().pid()
    base.resolve(s"${prefix}_${key}_$pid").toString
  }

  def csvRoundtrip(df: DataFrame): DataFrame = {
    val path = tmp("csv", df)
    // nullValue sentinel keeps null vs empty-string distinct (the default
    // "" collapses empty strings to null on read); multiLine parses
    // embedded newlines the writer quotes
    df.write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N")
      .csv(path)
    df.sparkSession.read
      .option("header", "true").option("nullValue", "\\N")
      .option("multiLine", "true")
      .schema(df.schema).csv(path)
  }

  /**
   * Generic Text/Text SequenceFile round-trip — the generic legacy-data
   * path (the reference's OWN Writable formats have native readers in
   * [[MrldaSequenceFile]]/[[MrldaModelFiles]]; this covers everything
   * else stored as plain Text pairs). RDD-level on purpose: SequenceFile
   * is an RDD-era
   * Hadoop format, and `saveAsSequenceFile`/`sequenceFile` are its native
   * Spark API — each partition writes/reads its own file, so the path
   * scales like any other file source.
   */
  def sequenceFileRoundtrip(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val pairs = df.selectExpr(s"cast($keyCol as string)", s"cast($valueCol as string)")
    val path = tmp("seqfile", pairs)
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    pairs.rdd.map(r => (r.getString(0), r.getString(1))).saveAsSequenceFile(path)
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](path).toDF(keyCol, valueCol)
  }

  def jsonRoundtrip(df: DataFrame): DataFrame = {
    val path = tmp("json", df)
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** ORC sink + read-back (the other columnar format Spark ships a native
    * vectorized reader for; types round-trip exactly, no schema needed —
    * supplied anyway to pin column order). */
  def orcRoundtrip(df: DataFrame): DataFrame = {
    val path = tmp("orc", df)
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.schema(df.schema).orc(path)
  }

  /** Hive-style partitioned parquet sink + read-back; filters on the
    * partition column prune directories at the source (the 100 TB layout
    * for any column with bounded cardinality). */
  def partitionedRoundtrip(df: DataFrame, partCol: String): DataFrame = {
    val path = tmp("part", df)
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
    // explicit schema: keeps the partition column's ORIGINAL type (Hive
    // partition inference would retype '0001' as int) and column order
    df.sparkSession.read.schema(df.schema).parquet(path)
  }

  /**
   * Bucketed external table: hash-partitioned into `buckets` files by
   * `key` and sorted by it within each bucket. The 100 TB join layout —
   * two tables bucketed on the same key with the same bucket count
   * sort-merge join with NO shuffle on either side (the write is the one
   * shuffle, amortized over every subsequent join/aggregate on that key).
   *
   * The `repartition(buckets, key)` aligns write tasks with bucket
   * boundaries (both use Murmur3 `pmod(hash(key), n)`), so each bucket is
   * ONE file and the on-read sort order is usable — otherwise every write
   * task emits a file per bucket it sees, and Spark must re-sort.
   */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val path = tmp(s"bucket_$table", df)
    df.repartition(buckets, df(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Shuffle-free co-located equi-join of two tables written by
    * `writeBucketed` with the same bucket count, on their respective
    * bucket keys. The merge hint keeps the planner on sort-merge join (a
    * small side would otherwise broadcast — which also avoids shuffle but
    * ignores the bucket layout this demonstrates). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
