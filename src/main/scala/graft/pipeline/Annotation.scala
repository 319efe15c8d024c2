package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Labeled-data quality operators for human-feedback pipelines: planted
 * multi-rater label fixtures, inter-annotator agreement (pairwise Cohen's
 * kappa + Fleiss' kappa), and Dawid–Skene EM label aggregation.
 *
 * Scale posture: a label table is items × raters rows; every pass below is
 * either keyed on the item id (pair join, per-item counts) or a
 * class/rater-sized aggregate. Nothing is ever item×item, and the only
 * driver-side values are model-sized scalars and confusion matrices
 * (raters × classes² rows).
 */
object Annotation {

  /**
   * Deterministic multi-rater label fixture over any id column: the true
   * class of item i is baseHash60("cls:"+i) mod K, and rater r (1-based)
   * reports it faithfully unless baseHash60("rater"+r+":"+i) mod 100 falls
   * in the top 10·r% — a planted per-rater error rate of 10r% with a
   * rater-specific confusion direction ((true+r) mod K), so confusion
   * matrices are asymmetric and distinguishable per rater. md5-derived, so
   * a SQL oracle replays the same labels bit-for-bit.
   */
  def plantedLabels(df: DataFrame, idCol: String, nRaters: Int = 3,
      nClasses: Int = 3): DataFrame = {
    val id = col(idCol).cast("string")
    val trueCls = Dedup.baseHash60(concat(lit("cls:"), id)) % nClasses
    df.select(col(idCol).as("item_id"),
        explode(array((1 to nRaters).map(r => lit(r)): _*)).as("rater"),
        trueCls.as("__t"))
      .withColumn("label",
        when(Dedup.baseHash60(concat(lit("rater"), col("rater").cast("string"),
          lit(":"), col("item_id").cast("string"))) % 100 <
          lit(100) - col("rater") * 10, col("__t"))
          .otherwise((col("__t") + col("rater")) % nClasses))
      .drop("__t")
  }

  /**
   * Inter-annotator agreement: one row per rater pair with Cohen's kappa
   * (observed agreement po vs chance agreement pe from the two raters'
   * marginals), plus a final ("all","all") row carrying Fleiss' kappa over
   * the full rater panel. Requires a complete design (every item labeled by
   * every rater) and enforces it — an incomplete panel fails loudly instead
   * of silently skewing pe.
   *
   * po/pe are exact count ratios; kappa is computed from the 6dp-rounded
   * po/pe so an independent engine reproduces the hash exactly.
   */
  def agreement(labels: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val l = labels.select(col(itemCol).as("__it"),
      col(raterCol).cast("string").as("__r"), col(labelCol).as("__l"))

    // one pass: item count, rater count, completeness check
    val ik = l.groupBy($"__it", $"__l").agg(count(lit(1)).as("c"))
    val perItem = ik.groupBy($"__it").agg(sum($"c").as("tot"),
      sum($"c" * $"c").as("sq"))
    val head = perItem.agg(count(lit(1)), min($"tot"), max($"tot")).head()
    val nItems = head.getLong(0)
    val rCount = head.getLong(1)
    require(nItems > 0, "agreement: empty label table")
    require(rCount == head.getLong(2) && rCount >= 2,
      s"agreement: incomplete design — items carry between ${head.getLong(1)} " +
        s"and ${head.getLong(2)} labels; every item must have the same >=2 raters")

    def kappa6(po: Column, pe: Column): Column = {
      val po6 = round(po, 6); val pe6 = round(pe, 6)
      round((po6 - pe6) / (lit(1.0) - pe6), 6)
    }

    // pairwise Cohen
    val pairs = l.as("a").join(l.as("b"),
      $"a.__it" === $"b.__it" && $"a.__r" < $"b.__r")
    val po = pairs.groupBy($"a.__r".as("ra"), $"b.__r".as("rb"))
      .agg(avg(when($"a.__l" === $"b.__l", 1.0).otherwise(0.0)).as("po"))
    val marg = l.groupBy($"__r", $"__l")
      .agg((count(lit(1)) / nItems.toDouble).as("p"))
    val pe = marg.as("a").join(marg.as("b"),
        $"a.__l" === $"b.__l" && $"a.__r" < $"b.__r")
      .groupBy($"a.__r".as("ra"), $"b.__r".as("rb"))
      .agg(sum($"a.p" * $"b.p").as("pe"))
    val cohen = po.join(pe, Seq("ra", "rb"))
      .select($"ra".as("rater_a"), $"rb".as("rater_b"),
        round($"po", 6).as("po"), round($"pe", 6).as("pe"),
        kappa6($"po", $"pe").as("kappa"))

    // Fleiss over the panel
    val r = rCount.toDouble
    val pbar = perItem
      .agg(avg(($"sq" - r) / (r * (r - 1.0))).as("pbar")).head().getDouble(0)
    val fpe = ik.groupBy($"__l").agg((sum($"c") / (r * nItems)).as("pk"))
      .agg(sum($"pk" * $"pk")).head().getDouble(0)
    val fleiss = spark.range(1).select(lit("all").as("rater_a"),
      lit("all").as("rater_b"), round(lit(pbar), 6).as("po"),
      round(lit(fpe), 6).as("pe"), kappa6(lit(pbar), lit(fpe)).as("kappa"))

    cohen.unionByName(fleiss).orderBy($"rater_a", $"rater_b")
  }
}
