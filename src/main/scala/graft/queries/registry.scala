package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared capability: a Spark plan + (when SQL-expressible) a DuckDB
  * oracle over the same parquet tables. `bench` marks headline queries the
  * Bench main times. */
case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  /** table loader: parquet table by name from the scale-factor dir */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table has shipped with different physical `ts` layouts
    * across test-data generations — TIMESTAMP(NANOS) (which Spark 4 only
    * reads as long under the nanosAsLong legacy conf) and plain
    * timestamp[us] (read as TIMESTAMP_NTZ) — so normalize whatever the
    * scan produced to microsecond TimestampType. The session timezone is
    * pinned UTC everywhere, so the NTZ→LTZ cast preserves the instant and
    * DuckDB's date_trunc agrees at every granularity we aggregate on. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long: integral div (double division loses ns ulps at 2^60)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(spark, dir, "events"))
  }

  lazy val all: Map[String, QueryDef] =
    RelationalQueries.defs ++ CorpusQueries.defs ++ PipelineQueries.defs ++
      CurationQueries.defs ++ StreamingQueries.defs ++ PolyldaQueries.defs ++
      TemporalQueries.defs ++ RankingQueries.defs ++ StatsQueries.defs ++
      FormatQueries.defs ++ FeedbackQueries.defs
}
