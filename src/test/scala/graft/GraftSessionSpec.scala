package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The tuned session builder: configs land, extensions register. */
class GraftSessionSpec extends AnyFunSuite {

  test("local session carries the tuned defaults and the SQL functions") {
    // spark.sql.extensions is a static conf — getOrCreate would silently
    // ignore it on a pre-existing session, so start from a clean slate
    // (suites run sequentially in the forked test JVM; the next suite's
    // getOrCreate simply builds a fresh session)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = GraftSession.local("graft-session-spec", cores = 2)
    try {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "8")
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
      // extensions installed at construction: graft SQL functions resolve
      val d = spark.sql("SELECT digamma(2.5) AS d").head().getDouble(0)
      assert(d == graft.functions.GammaFuncs.digamma(2.5))
      val n = spark.sql("SELECT nfc_normalize('ok') AS n").head().getString(0)
      assert(n == "ok")
      // the opt-in range-join binning rule is injected (no-op until the
      // bin-width conf is set — presence is what we pin here)
      val rules = spark.sessionState.optimizer.extendedOperatorOptimizationRules
      assert(rules.exists(_.getClass.getName.contains("RangeJoinBinRewrite")), rules.map(_.getClass.getName))
    } finally spark.stop()
  }
}
