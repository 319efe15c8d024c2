package graft

import graft.corpus.ParseCorpus
import graft.functions.PorterStemmer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Porter stemmer pinned against the algorithm's own published vectors:
 * every rule-table example from Porter (1980) that is a whole-word
 * stemming (single-step examples from the paper are intermediates, so
 * full-pipeline expectations here are derived by running ALL steps by
 * hand), plus the paper's two worked multi-step examples
 * (generalizations→gener, oscillators→oscil).
 */
class PorterStemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    // step 1a (whole-word: later steps don't touch these)
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b + cleanup rules
    "feed" -> "feed", "matting" -> "mat", "mating" -> "mate",
    "meetings" -> "meet", "milling" -> "mill", "messing" -> "mess",
    "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
    "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
    "controlling" -> "control", "hopping" -> "hop",
    // step 1c
    "happy" -> "happi", "sky" -> "sky", "key" -> "kei",
    "conspiracy" -> "conspiraci",
    // step 2 (full pipeline through steps 4/5)
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valency" -> "valenc", "hesitancy" -> "hesit",
    "digitizer" -> "digit", "conformably" -> "conform",
    "radically" -> "radic", "differently" -> "differ", "vilely" -> "vile",
    "analogously" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formality" -> "formal", "sensitivity" -> "sensit",
    "sensibility" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electricity" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "homologous" -> "homolog",
    "communism" -> "commun", "activate" -> "activ",
    "angularity" -> "angular", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "roll" -> "roll",
    // the paper's worked multi-step examples
    "generalizations" -> "gener", "oscillators" -> "oscil",
    // guards
    "as" -> "as", "is" -> "is", "a" -> "a", "be" -> "be")

  test("published Porter vectors") {
    val bad = vectors.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in -> ${PorterStemmer.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  test("fixture-vocabulary stem map matches the q_porter_stem oracle") {
    // the exact 31-word map the q_porter_stem DuckDB oracle hard-codes —
    // if the kernel and this table ever disagree, fix the oracle too
    val fixture = Map(
      "agg" -> "agg", "batch" -> "batch", "big" -> "big",
      "column" -> "column", "customer" -> "custom", "data" -> "data",
      "dup" -> "dup", "fast" -> "fast", "filter" -> "filter",
      "group" -> "group", "hash" -> "hash", "join" -> "join",
      "key" -> "kei", "line" -> "line", "merge" -> "merg",
      "order" -> "order", "part" -> "part", "query" -> "queri",
      "row" -> "row", "scan" -> "scan", "slow" -> "slow",
      "small" -> "small", "sort" -> "sort", "spark" -> "spark",
      "stream" -> "stream", "table" -> "tabl", "value" -> "valu",
      "vector" -> "vector", "window" -> "window")
    fixture.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"$in")
    }
  }
}

/** The codegen'd expression + SQL registration + english analyzer chain. */
class PorterStemSparkSpec extends SparkSpec {

  test("porter_stem expression and SQL function agree with the kernel") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val words = Seq("generalizations", "oscillators", "running", "sky", "", "查").toDF("w")
    val viaCol = words.select(graft.functions.tfunctions.porter_stem($"w")).as[String].collect()
    words.createOrReplaceTempView("pw")
    val viaSql = spark.sql("SELECT porter_stem(w) FROM pw").as[String].collect()
    val want = Seq("gener", "oscil", "run", "sky", "", "查")
    assert(viaCol.toSeq == want && viaSql.toSeq == want)
  }

  test("english analyzer: segment, possessive, stop, stem") {
    val an = ParseCorpus.Analyzers.english
    assert(an("The operator's conditional queries are failing!") ==
      Seq("oper", "condit", "queri", "fail"))
    // apostrophe stays word-internal (UAX#29), non-possessive survives
    assert(an("don't panic") == Seq("don't", "panic"))
    // CJK still segments per ideograph
    assert(an("数据 processing") == Seq("数", "据", "process"))
  }

  test("english analyzer drives ParseCorpus end to end") {
    import spark.implicits._
    val lines = Seq(
      (1L, "doc1", "The relational tables are merging"),
      (2L, "doc2", "conditional merges of the tables")).toDF("docId", "title", "text")
    val r = ParseCorpus.run(lines,
      ParseCorpus.Config(analyzer = Some(ParseCorpus.Analyzers.english)))
    val terms = r.terms.collect().map(_.term).sorted.toSeq
    assert(terms == Seq("condit", "merg", "relat", "tabl"))
  }
}
