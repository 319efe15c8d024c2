package graft

import graft.golden.GoldenGen
import org.apache.spark.sql.types.DoubleType

/**
 * Golden pinning for the three registry queries whose outputs the driver
 * can only rows-check (EM model outputs, not SQL-expressible): the seed-42
 * sf0.01 fixtures under src/test/resources/golden/ are the contract, so a
 * model-output regression fails `sbt test` instead of passing the rows-only
 * gate silently. The reference pins the same surface with golden files
 * (src/test/java/cc/mrlda/VariationalInferenceTest.java:28-62).
 *
 * Discrete columns (topic, rank, term, docId, lang) must match exactly;
 * double columns (score, proportion) at 1e-6 relative / 1e-9 absolute —
 * training is deterministic up to parallel partial-agg FP merge order
 * (~1e-12 relative, see LdaSpec), so 1e-6 is three orders looser than the
 * run-to-run jitter and six orders tighter than any real model change.
 *
 * Regenerate after an intentional model change:
 *   sbt "Test/runMain graft.golden.GoldenGen"
 */
class LdaGoldenSpec extends SparkSpec {

  private def tolerant(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-9 || math.abs(a - b) <= 1e-6 * math.max(math.abs(a), math.abs(b))

  test("lda_top_terms_shuffle reproduces the broadcast golden fixture (scale-path parity)") {
    // the shuffle-join E-step (beta never on the driver — the 100 TB path)
    // must land on the same model as the broadcast path at real corpus
    // size, not just on the 10-doc toy in TrainerPathsSpec. Slightly looser
    // tolerance: cross-path FP drift stacks per iteration.
    assume(new java.io.File(GoldenGen.SfDir).isDirectory,
      s"${GoldenGen.SfDir} not present on this machine")
    val golden = scala.io.Source.fromURL(
      getClass.getClassLoader.getResource("golden/lda_top_terms_sf001.tsv"), "UTF-8")
      .getLines().toSeq
    val live = GoldenGen.render(spark, "lda_top_terms_shuffle", GoldenGen.SfDir)
    assert(live.size == golden.size)
    live.tail.zip(golden.tail).foreach { case (l, g) =>
      val lv = l.split("\t", -1)
      val gv = g.split("\t", -1)
      assert(lv.take(3).sameElements(gv.take(3)), // topic, rank, term exact
        s"shuffle path diverged from broadcast golden: $l vs $g")
      val (a, b) = (lv(3).toDouble, gv(3).toDouble)
      assert(math.abs(a - b) <= 1e-5 * math.max(math.abs(a), math.abs(b)),
        s"score drift between paths: $a vs $b")
    }
  }

  GoldenGen.Queries.foreach { case (name, file) =>
    test(s"$name matches the committed sf0.01 golden fixture") {
      assume(new java.io.File(GoldenGen.SfDir).isDirectory,
        s"${GoldenGen.SfDir} not present on this machine")
      val url = getClass.getClassLoader.getResource(s"golden/$file")
      assert(url != null, s"golden fixture golden/$file missing — run GoldenGen")
      val golden = scala.io.Source.fromURL(url, "UTF-8").getLines().toSeq
      val df = graft.queries.Registry.all(name).fn(spark, GoldenGen.SfDir)
      val schema = df.schema
      val live = GoldenGen.render(spark, name, GoldenGen.SfDir)

      assert(live.head == golden.head, s"$name: schema drift — ${live.head} vs ${golden.head}")
      assert(live.size == golden.size,
        s"$name: ${live.size - 1} rows vs golden ${golden.size - 1}")
      val doubleCols = schema.fields.map(_.dataType == DoubleType)
      live.tail.zip(golden.tail).zipWithIndex.foreach { case ((l, g), i) =>
        val lv = l.split("\t", -1)
        val gv = g.split("\t", -1)
        assert(lv.length == gv.length, s"$name row $i: field count ${lv.length} vs ${gv.length}")
        lv.indices.foreach { j =>
          if (doubleCols(j) && lv(j) != "␀" && gv(j) != "␀") {
            assert(tolerant(lv(j).toDouble, gv(j).toDouble),
              s"$name row $i col ${schema.fieldNames(j)}: ${lv(j)} vs golden ${gv(j)}")
          } else {
            assert(lv(j) == gv(j),
              s"$name row $i col ${schema.fieldNames(j)}: '${lv(j)}' vs golden '${gv(j)}'")
          }
        }
      }
    }
  }
}
