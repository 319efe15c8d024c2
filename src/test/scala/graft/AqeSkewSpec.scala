package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Proof that the session's AQE skew-join posture actually engages: a
  * planted hot key must make the runtime split its partition (the final
  * adaptive plan marks the join `skew=true`), and the result must equal
  * the plain join. GraftSession turns the feature on; this spec keeps it
  * from silently regressing to a config that never fires. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a planted skewed join partition (skew=true in the plan)") {
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production thresholds are hundreds of MB; scale them to fixture
      // size so the planted hot key crosses them the way a 100 TB hot key
      // crosses the defaults
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // no broadcast: skew handling only applies to sort-merge/shuffle joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // hot key 0 carries 200k fat rows; 100 cold keys carry 100 each
      val facts = spark.range(210000).select(
        when($"id" < 200000, lit(0L)).otherwise(($"id" % 100) + 1).as("k"),
        concat(lit("x" * 64), $"id").as("payload"))
      val dim = spark.range(101).select($"id".as("k"),
        concat(lit("dim"), $"id").as("attr"))

      val joined = facts.join(dim, "k")
      // collect() executes THIS queryExecution (count() would build a new
      // one, leaving joined's adaptive plan un-finalized)
      val n = joined.collect().length
      assert(n == 210000, s"inner join must preserve all facts, got $n")

      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an adaptive plan root")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
