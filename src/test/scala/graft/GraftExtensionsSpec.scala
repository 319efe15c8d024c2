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

  test("nfc_normalize composes decomposed sequences and is idempotent") {
    GraftExtensions.register(spark)
    // "cafe" + combining acute (U+0301) must compose to single-char é
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    spark.createDataFrame(Seq(Tuple1(decomposed))).toDF("t").createOrReplaceTempView("nfc_in")
    val row = spark.sql(
      "SELECT nfc_normalize(t) AS n, length(nfc_normalize(t)) AS l, " +
        "nfc_normalize(nfc_normalize(t)) AS n2, nfc_normalize('plain') AS p FROM nfc_in")
      .head()
    assert(row.getString(0) == composed)
    assert(row.getInt(1) == 4)
    assert(row.getString(2) == composed)
    assert(row.getString(3) == "plain")
  }

  test("logsumexp works as a SQL aggregate") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1, 0.0), (1, 0.0), (2, math.log(3.0))).toDF("g", "x")
      .createOrReplaceTempView("lse_in")
    val rows = spark.sql("SELECT g, logsumexp(x) AS v FROM lse_in GROUP BY g ORDER BY g")
      .collect()
    assert(math.abs(rows(0).getDouble(1) - math.log(2.0)) < 1e-12)
    assert(math.abs(rows(1).getDouble(1) - math.log(3.0)) < 1e-12)
  }

  test("extension class injects the same builders") {
    // constructing the injector exercises the builder table; builders are
    // the same objects register() installs
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    assert(GraftExtensions.all.map(_._1) ==
      Seq("digamma", "trigamma", "lgamma", "log_add", "vec_dot",
        "word_ngrams", "shingles", "simhash60", "nfc_normalize",
        "fold_accents", "porter_stem", "jaro_winkler", "lcs_len",
        "logsumexp"))
  }

  test("lcs_len is callable from SQL over token arrays") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT lcs_len(array('a','b','a','c'), array('b','a','b','a')) AS l, " +
        "lcs_len(array('x'), array()) AS z").head()
    assert(out.getLong(0) == 3L && out.getLong(1) == 0L)
  }

  test("jaro_winkler is callable from SQL with the byte-level kernel") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS a, jaro_winkler('', 'x') AS b")
      .head()
    assert(out.getDouble(0) == 0.9611111111111111)
    assert(out.getDouble(1) == 0.0)
  }

  test("fold_accents strips diacritics, lowercases, keeps ASCII buffers") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT fold_accents('Caf\u00e9 N\u00fcrnberg ni\u00f1o') AS a, " +
        "fold_accents('cafe\u0301') AS b, " + // decomposed input folds too
        "fold_accents('Plain ASCII') AS c, fold_accents('lower') AS d")
      .head()
    assert(out.getString(0) == "cafe nurnberg nino")
    assert(out.getString(1) == "cafe")
    assert(out.getString(2) == "plain ascii")
    assert(out.getString(3) == "lower")
  }

  test("vec_dot matches the aggregate/zip_with composition bitwise") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(1e-8, 2e8, -3.5)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val rows = df.select(
      graft.functions.vfunctions.vec_dot($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        .as("composed")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // SQL name, with the float->double cast in the builder
    val v = spark.sql("SELECT vec_dot(array(1.0, 2.0), array(3, 4)) AS d").head().getDouble(0)
    assert(v == 11.0)
  }

  test("vec_dot null semantics mirror zip_with padding") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // length mismatch => null (zip_with pads, the fold absorbs the null);
    // null element => null; null array => null
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),
      (Some(Seq(Double.NaN)), None))
      .toDF("a", "b")
    val out = df.select(graft.functions.vfunctions.vec_dot($"a", $"b").as("d")).collect()
    assert(out.forall(_.isNullAt(0)))
    val withNullElem = spark.sql(
      "SELECT vec_dot(array(1.0, CAST(NULL AS DOUBLE)), array(1.0, 2.0)) AS d")
    assert(withNullElem.head().isNullAt(0))
  }

  test("vec_dot stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // non-foldable input (derived from range) so neither ConstantFolding
    // nor ConvertToLocalRelation evaluates the projection at optimize time
    val df = spark.range(3)
      .select(array($"id".cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select($"a", $"b", graft.functions.vfunctions.vec_dot($"a", $"b").as("d"))
    // `*(n)` marks operators fused into a WholeStageCodegen stage; the
    // vec_dot projection must carry it (a CodegenFallback expression would
    // strand its Project outside any codegen stage)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("vec_dot")), physical)
    assert(df.orderBy("d").collect().map(_.getDouble(2)).toSeq == Seq(8.0, 11.0, 14.0))
  }
}
