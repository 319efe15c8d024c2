package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM/codegen on the smallest SF — run every headline query
    // once at sf0.001 so timed runs measure the plan, not first-call
    // classloading/codegen of each query's distinct operator set
    SparkEntry.benchQueries.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"[bench] warm $name failed: $e") }
    }
    // the EM training queries run hundreds of small stages per iteration;
    // one sf0.001 pass leaves their per-iteration driver/codegen paths
    // half-JIT'd (repeat-run timings keep dropping for ~3 runs). A second
    // warm pass at sf0.01 gets the timed sf0.1 run to steady state.
    Seq("lda_top_terms", "lda_top_terms_shuffle").foreach { name =>
      if (SparkEntry.queries.contains(name))
        try SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").count()
        catch { case e: Throwable => System.err.println(s"[bench] warm2 $name failed: $e") }
    }

    val results = SparkEntry.benchQueries.map { name =>
      // settle the JVM between queries: the GC kicks ContextCleaner's
      // weak-ref processing (mass shuffle/broadcast unregistration from
      // prior queries), and the sleep lets that drain OUTSIDE the timed
      // window — without it the cleanup flood lands inside whichever
      // query runs next (the shuffle-training row was up to 3× noisier)
      System.gc()
      Thread.sleep(2000)
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
