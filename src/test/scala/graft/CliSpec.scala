package graft

import java.nio.file.Files

/** End-to-end drive of the CLI tools (the reference's user surface):
  * raw text → ParseCorpusCli → TrainCli (checkpointing) → resume via
  * --model-index → DisplayTopicCli artifacts readable. */
class CliSpec extends SparkSpec {

  private def writeRaw(lines: Seq[String]): String = {
    val f = Files.createTempDirectory("graft_cli_").resolve("corpus.txt")
    Files.writeString(f, lines.mkString("\n") + "\n")
    f.toString
  }

  test("ParseCorpusCli → TrainCli → resume → DisplayTopic round-trip") {
    spark // force shared session so CLI getOrCreate reuses it
    val raw = writeRaw(Seq(
      "d0\tapple banana cherry", "d1\tbanana apple apple", "d2\tcherry banana fruit",
      "d3\tapple fruit fruit cherry", "d4\tbanana banana apple",
      "d5\tiron copper zinc", "d6\tcopper iron iron", "d7\tzinc copper metal",
      "d8\tiron metal metal zinc", "d9\tcopper copper zinc"))
    val corpusDir = Files.createTempDirectory("graft_cli_corpus_").toString
    val modelDir = Files.createTempDirectory("graft_cli_model_").toString

    cli.ParseCorpusCli.main(Array("--input", raw, "--output", corpusDir))
    assert(spark.read.parquet(s"$corpusDir/document").count() == 10)
    assert(spark.read.parquet(s"$corpusDir/term").count() == 8)
    assert(spark.read.parquet(s"$corpusDir/title").count() == 10)

    cli.TrainCli.main(Array("--corpus", corpusDir, "--output", modelDir,
      "--topics", "2", "--iterations", "3", "--local-iterations", "10", "--seed", "42"))
    assert(spark.read.parquet(s"$modelDir/alpha-3").count() == 2)
    assert(spark.read.parquet(s"$modelDir/beta-3").count() > 0)
    assert(spark.read.parquet(s"$modelDir/gamma-3").count() == 10)

    // resume two more iterations from snapshot 3 (reference -modelindex)
    cli.TrainCli.main(Array("--corpus", corpusDir, "--output", modelDir,
      "--topics", "2", "--iterations", "5", "--local-iterations", "10", "--seed", "42",
      "--model-index", "3"))
    assert(spark.read.parquet(s"$modelDir/alpha-5").count() == 2)

    cli.DisplayTopicCli.main(Array("--model", modelDir, "--index", "5",
      "--corpus", corpusDir, "--top", "3"))
    cli.DisplayDocumentCli.main(Array("--model", modelDir, "--index", "5", "--rows", "5"))
  }

  test("polylingual CLI: parse + train") {
    spark
    val raw = writeRaw(Seq(
      "d0\tapple banana\tpomme banane", "d1\tbanana apple\tbanane pomme",
      "d2\tiron copper\tnull", "d3\tcopper iron\tcuivre fer"))
    val corpusDir = Files.createTempDirectory("graft_cli_poly_").toString
    val modelDir = Files.createTempDirectory("graft_cli_polym_").toString
    cli.ParseCorpusCli.main(Array("--input", raw, "--output", corpusDir,
      "--languages", "2"))
    assert(spark.read.parquet(s"$corpusDir/document").count() == 4)
    cli.TrainCli.main(Array("--corpus", corpusDir, "--output", modelDir,
      "--topics", "2", "--iterations", "2", "--local-iterations", "5",
      "--languages", "2", "--seed", "3"))
    assert(spark.read.parquet(s"$modelDir/alpha-2").count() == 2)
    assert(spark.read.parquet(s"$modelDir/beta-2").groupBy("lang").count().count() == 2)
    cli.DisplayTopicCli.main(Array("--model", modelDir, "--index", "2",
      "--corpus", corpusDir, "--top", "2", "--languages", "2"))
  }
}
