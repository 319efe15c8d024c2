package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming ingest for pairwise-preference data: comparisons arrive as a
 * stream, the win matrix accumulates as complete-mode state, and the
 * Bradley–Terry fit runs on the drained (item²-bounded) state — the shape
 * a reward-model data pipeline uses when comparisons trickle in from a
 * labeling service. The stream side joins the STATIC enriched lineitem
 * table (stream-static inner join, no watermark needed), and the ordered
 * linenumber predicate counts each within-order pair exactly once, so the
 * drained matrix — and therefore the fit — equals the batch
 * `q_bradley_terry` row and shares its unrolled SQL oracle verbatim.
 */
object PreferenceStream {

  private val counter = new AtomicLong(0L)

  def bradleyTerryIngest(spark: SparkSession, dir: String,
      iters: Int = 6): DataFrame = {
    import spark.implicits._
    val liPath = java.nio.file.Paths.get(dir, "lineitem.parquet")
    val streamDir = StreamDirs.linkedDir("graft_li_stream", liPath,
      Seq("lineitem_0.parquet"))
    val liSchema = spark.read.parquet(liPath.toString).schema
    val part = spark.read.parquet(s"$dir/part.parquet")

    def enrich(df: DataFrame): DataFrame =
      df.join(part, df("l_partkey") === part("p_partkey"))
        .select(df("l_orderkey").as("ok"), df("l_linenumber").as("ln"),
          df("l_extendedprice").as("px"), part("p_brand").as("brand"))

    val staticSide = enrich(spark.read.parquet(liPath.toString))
    val streamSide = enrich(
      spark.readStream.schema(liSchema).parquet(streamDir))

    val cmp = streamSide.as("a").join(staticSide.as("b"),
        $"a.ok" === $"b.ok" && $"a.ln" < $"b.ln")
      .filter($"a.brand" =!= $"b.brand")
      .select(
        when($"a.px" > $"b.px", $"a.brand")
          .when($"b.px" > $"a.px", $"b.brand")
          .when($"a.brand" < $"b.brand", $"a.brand")
          .otherwise($"b.brand").as("i"),
        when($"a.px" > $"b.px", $"b.brand")
          .when($"b.px" > $"a.px", $"a.brand")
          .when($"a.brand" < $"b.brand", $"b.brand")
          .otherwise($"a.brand").as("j"))

    val name = s"graft_bt_ingest_${counter.incrementAndGet()}"
    val q = cmp.groupBy($"i", $"j").agg(count(lit(1)).as("wij"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    graft.pipeline.Preference.bradleyTerry(spark.table(name), iters)
  }

  /**
   * Streaming twin of the period-batched Elo row: comparisons ingest as
   * the same stream-static join, the per-(period, pair) win counts
   * accumulate as complete-mode state (periods × item² bounded), and the
   * anchored period fold runs on the drained counts — identical to the
   * batch `q_elo_ratings` row, so it shares the unrolled oracle verbatim.
   * The period comes from a second static join (orders' year), which the
   * stream-static planner handles like the part dimension.
   */
  def eloIngest(spark: SparkSession, dir: String, periods: Seq[String],
      kFactor: Double = 8.0, initialRating: Double = 1500.0): DataFrame = {
    import spark.implicits._
    val liPath = java.nio.file.Paths.get(dir, "lineitem.parquet")
    val streamDir = StreamDirs.linkedDir("graft_li_stream", liPath,
      Seq("lineitem_0.parquet"))
    val liSchema = spark.read.parquet(liPath.toString).schema
    val part = spark.read.parquet(s"$dir/part.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", year($"o_orderdate").cast("string").as("period"))

    def enrich(df: DataFrame): DataFrame =
      df.join(part, df("l_partkey") === part("p_partkey"))
        .select(df("l_orderkey").as("ok"), df("l_linenumber").as("ln"),
          df("l_extendedprice").as("px"), part("p_brand").as("brand"))

    val staticSide = enrich(spark.read.parquet(liPath.toString))
    val streamSide = enrich(
      spark.readStream.schema(liSchema).parquet(streamDir))

    val cmp = streamSide.as("a").join(staticSide.as("b"),
        $"a.ok" === $"b.ok" && $"a.ln" < $"b.ln")
      .filter($"a.brand" =!= $"b.brand")
      .join(orders, $"a.ok" === $"o_orderkey")
      .select($"period".as("p"),
        when($"a.px" > $"b.px", $"a.brand")
          .when($"b.px" > $"a.px", $"b.brand")
          .when($"a.brand" < $"b.brand", $"a.brand")
          .otherwise($"b.brand").as("i"),
        when($"a.px" > $"b.px", $"b.brand")
          .when($"b.px" > $"a.px", $"a.brand")
          .when($"a.brand" < $"b.brand", $"b.brand")
          .otherwise($"a.brand").as("j"))

    val name = s"graft_elo_ingest_${counter.incrementAndGet()}"
    val q = cmp.groupBy($"p", $"i", $"j").agg(count(lit(1)).as("c"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    graft.pipeline.Preference.eloFromPairCounts(spark.table(name),
      periods, kFactor, initialRating)
  }
}
