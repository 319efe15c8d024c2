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

  /** The events table carries TIMESTAMP(NANOS) which Spark 4's parquet
    * reader rejects; read nanos as long and convert to microsecond
    * timestamps (DuckDB's date_trunc on the ns original agrees at the
    * granularities we aggregate on). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integral: double division loses ns ulps at 2^60
  }

  lazy val all: Map[String, QueryDef] =
    RelationalQueries.defs ++ CorpusQueries.defs ++ PipelineQueries.defs ++
      CurationQueries.defs ++ StreamingQueries.defs ++ PolyldaQueries.defs ++
      TemporalQueries.defs ++ RankingQueries.defs ++ StatsQueries.defs ++
      FormatQueries.defs
}
