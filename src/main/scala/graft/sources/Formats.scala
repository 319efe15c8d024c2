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

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(s"graft_$prefix")
    d.toFile.deleteOnExit()
    d.resolve("data").toString
  }

  def csvRoundtrip(df: DataFrame): DataFrame = {
    val path = tmp("csv")
    df.write.option("header", "true").csv(path)
    df.sparkSession.read.option("header", "true").schema(df.schema).csv(path)
  }

  def jsonRoundtrip(df: DataFrame): DataFrame = {
    val path = tmp("json")
    df.write.json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** Hive-style partitioned parquet sink + read-back; filters on the
    * partition column prune directories at the source (the 100 TB layout
    * for any column with bounded cardinality). */
  def partitionedRoundtrip(df: DataFrame, partCol: String): DataFrame = {
    val path = tmp("part")
    df.write.partitionBy(partCol).parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
