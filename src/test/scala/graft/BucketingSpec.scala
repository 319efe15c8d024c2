package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._

/** Bucketed-table layout: the join AND the aggregate on the bucket key
  * must run with zero exchanges, and results must equal the plain join. */
class BucketingSpec extends SparkSpec {

  test("bucketed join + agg on the bucket key is exchange-free and exact") {
    import spark.implicits._
    val left = (1 to 200).map(i => (i.toLong, s"seg${i % 5}")).toDF("k", "seg")
    val right = (1 to 600).map(i => (i % 250 + 1L, i * 1.5)).toDF("fk", "amt")
    Formats.writeBucketed(left, "bspec_left", "k", 4)
    Formats.writeBucketed(right, "bspec_right", "fk", 4)

    val joined = Formats.bucketedJoin(spark, "bspec_left", "bspec_right", "k", "fk")
      .groupBy($"k", $"seg")
      .agg(count(lit(1)).as("n"), round(sum($"amt"), 2).as("total"))
    val rows = joined.collect()

    // the bucketed layout must remove EVERY exchange: the scan's hash
    // partitioning feeds the sort-merge join and the partial+final agg
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"), physical)
    assert(physical.contains("SortMergeJoin"), physical)
    assert(physical.contains("Bucketed: true"), physical)

    // result identity with the plain (shuffled) join
    val expected = left.join(right, $"k" === $"fk")
      .groupBy($"k", $"seg")
      .agg(count(lit(1)).as("n"), round(sum($"amt"), 2).as("total"))
      .collect()
    assert(rows.map(_.toString).sorted.toSeq == expected.map(_.toString).sorted.toSeq)
  }

  test("one file per bucket, so the on-disk sort order is usable") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toString)).toDF("k", "v")
    Formats.writeBucketed(df, "bspec_files", "k", 4)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED bspec_files")
      .filter($"col_name" === "Location").select($"data_type").head().getString(0)
    val files = new java.io.File(new java.net.URI(loc))
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, files.map(_.getName).mkString(", "))
  }
}
