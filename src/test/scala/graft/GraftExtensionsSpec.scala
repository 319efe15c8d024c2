package graft

import graft.functions.GammaFuncs

/** The custom Catalyst expressions exposed as SQL functions. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate the shared kernels") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT digamma(2.5) AS d, trigamma(2.5) AS t, lgamma(2.5) AS g, log_add(1.0, 2.0) AS a")
      .head()
    assert(row.getDouble(0) == GammaFuncs.digamma(2.5))
    assert(row.getDouble(1) == GammaFuncs.trigamma(2.5))
    assert(row.getDouble(2) == GammaFuncs.logGamma(2.5))
    assert(row.getDouble(3) == GammaFuncs.logAdd(1.0, 2.0))
  }

  test("SQL functions accept non-double numeric input via cast") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT digamma(3) AS d").head().getDouble(0)
    assert(v == GammaFuncs.digamma(3.0))
  }

  test("extension class injects the same builders") {
    // constructing the injector exercises the builder table; builders are
    // the same objects register() installs
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    assert(GraftExtensions.all.map(_._1) ==
      Seq("digamma", "trigamma", "lgamma", "log_add"))
  }
}
