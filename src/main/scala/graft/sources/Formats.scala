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
    * directories). Keyed by column names so two tables round-tripped in
    * one query don't clobber each other's files before the lazy read. */
  private def tmp(prefix: String, df: DataFrame): String = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_roundtrip")
    Files.createDirectories(base)
    val key = Integer.toHexString(df.columns.mkString(",").hashCode)
    base.resolve(s"${prefix}_$key").toString
  }

  def csvRoundtrip(df: DataFrame): DataFrame = {
    val path = tmp("csv", df)
    df.write.mode("overwrite").option("header", "true").csv(path)
    df.sparkSession.read.option("header", "true").schema(df.schema).csv(path)
  }

  def jsonRoundtrip(df: DataFrame): DataFrame = {
    val path = tmp("json", df)
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** Hive-style partitioned parquet sink + read-back; filters on the
    * partition column prune directories at the source (the 100 TB layout
    * for any column with bounded cardinality). */
  def partitionedRoundtrip(df: DataFrame, partCol: String): DataFrame = {
    val path = tmp("part", df)
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
