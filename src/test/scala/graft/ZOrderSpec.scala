package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

/** Layout-quality proof for the z-order write: tiles must bound BOTH
  * dimensions (the whole point of the curve), where a single-column sort
  * bounds only its own key. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("z-order tiles prune files on both dimensions; single sort on one") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey")
    val zdir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val sdir = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    ZOrder.zorderWrite(li, "l_partkey", "l_suppkey", zdir, numFiles = 16)
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(sdir)

    // how many files a reader must touch for a predicate slice, judged by
    // the same per-file min/max a parquet footer would carry
    def filesHit(path: String, c: String, lo: Long, hi: Long): Long =
      ZOrder.fileBounds(spark, path, Seq("l_partkey", "l_suppkey"))
        .filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi).count()

    val nz = spark.read.parquet(zdir).inputFiles.length
    val ns = spark.read.parquet(sdir).inputFiles.length
    assert(nz >= 8, s"expected a multi-file z layout, got $nz")

    // 1/8-of-domain slices (suppkey ∈ [0,99], partkey ∈ [0,1999] in the
    // fixture — read actual bounds so the test tracks the data)
    val (minPk, maxPk, minSk, maxSk) = ZOrder.bounds(li, "l_partkey", "l_suppkey")
    val skHi = minSk + (maxSk - minSk) / 8
    val pkHi = minPk + (maxPk - minPk) / 8

    val zSk = filesHit(zdir, "l_suppkey", minSk, skHi)
    val zPk = filesHit(zdir, "l_partkey", minPk, pkHi)
    val sSk = filesHit(sdir, "l_suppkey", minSk, skHi)
    // z-order: a 1/8 slice on EITHER dimension touches a minority of the
    // files (16 files ≈ 4×4 grid → ~1/4 per quarter-slice). The file
    // boundaries come from range-partitioner SAMPLING whose seed is the
    // RDD id — deterministic per plan but dependent on suite execution
    // order — so the bound allows one boundary-straddling file of slack
    // (nz/2 exactly was observed to flake at 9/16 under reordered runs).
    assert(zSk <= nz * 5 / 8, s"z-order suppkey slice hit $zSk of $nz files")
    assert(zPk <= nz * 5 / 8, s"z-order partkey slice hit $zPk of $nz files")
    // the partkey-sorted layout cannot prune on suppkey at all
    assert(sSk >= ns - 1, s"sorted layout pruned suppkey ($sSk of $ns)?")

    // the layout pass must not change the data
    assert(spark.read.parquet(zdir).count() == li.count())
    assert(spark.read.parquet(zdir).agg(sum($"l_partkey"), sum($"l_suppkey")).head() ==
      li.agg(sum($"l_partkey"), sum($"l_suppkey")).head())
  }

  test("z-value edges: constant dimension, bits=1, exact interleave") {
    val df = Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L)).toDF("a", "b")
    // b constant → its range clamps to 1 and qb = 0: z carries only a's
    // lanes. bits=2, a range 3, m=3: qa = a·3 div 3 = a; bit p of qa lands
    // at position 2p+1, so qa=3 (binary 11) → z = 0b1010 = 10.
    val z2 = ZOrder.withZValue(df, "a", "b", bits = 2)
      .select($"a", $"z").as[(Long, Long)].collect().toMap
    assert(z2 == Map(0L -> 0L, 1L -> 2L, 2L -> 8L, 3L -> 10L))
    // bits=1: m=1, qa = a div 3 → 0 below the max, 1 at it; z = qa << 1
    val z1 = ZOrder.withZValue(df, "a", "b", bits = 1)
      .select($"a", $"z").as[(Long, Long)].collect().toMap
    assert(z1 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 2L))
  }
}
