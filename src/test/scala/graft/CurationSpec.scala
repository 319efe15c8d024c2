package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

/** Curation-operator validation: transitive cluster closure, quality-rule
  * edge cases, PII redaction, and sampling determinism/rate accuracy. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplate line removal drops hot lines, keeps order, keeps empty docs") {
    // "footer" appears in 3 docs (>= minDocDf 2) → removed everywhere;
    // doc 3 is ONLY boilerplate → survives as an empty-text row;
    // doc 1's unique lines keep their original order around the removal
    val df = Seq(
      (1L, "alpha\nfooter\nbeta"),
      (2L, "gamma\nfooter"),
      (3L, "footer"),
      (4L, "delta")).toDF("id", "text")
    val out = Curation.removeBoilerplateLines(df, "id", "text", minDocDf = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("removed_lines"))).toMap
    assert(out == Map(
      1L -> ("alpha\nbeta", 1L),
      2L -> ("gamma", 1L),
      3L -> ("", 1L),
      4L -> ("delta", 0L)))
  }

  test("boilerplate line removal at the minDocDf boundary") {
    // df(shared)=2: hot at minDocDf=2, kept at minDocDf=3
    val df = Seq((1L, "a\nshared"), (2L, "b\nshared")).toDF("id", "text")
    val at2 = Curation.removeBoilerplateLines(df, "id", "text", minDocDf = 2)
      .collect().map(r => r.getAs[String]("clean_text")).toSet
    assert(at2 == Set("a", "b"))
    val at3 = Curation.removeBoilerplateLines(df, "id", "text", minDocDf = 3)
      .collect().map(r => r.getAs[String]("clean_text")).toSet
    assert(at3 == Set("a\nshared", "b\nshared"))
  }

  test("connected components closes chains transitively") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    // and an isolated edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val cc = Curation.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedupClusters keeps one representative per component, singletons survive") {
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Curation.dedupClusters(docs, "doc_id", pairs)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cluster"), r.getAs[Boolean]("keep")))
    assert(out.toSet == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
  }

  test("quality flags catch repetition, missing stopwords, and short docs") {
    val good = "the quick brown fox jumps over a lazy dog and then runs " +
      "far away to find some tasty food for its hungry little pups today"
    val repetitive = ("spam ham " * 30).trim // one bigram dominates
    val noStop = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val short = "too short"
    val df = Seq((1L, good), (2L, repetitive), (3L, noStop), (4L, short))
      .toDF("doc_id", "text")
    val rules = Curation.QualityRules(minWords = 10, minStopwordHits = 2,
      maxDupUnigramRatio = 0.6, maxTopBigramRatio = 0.2)
    val out = Curation.qualityFlags(df, "text", rules).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[Boolean]("rule_word_count"),
          r.getAs[Boolean]("rule_top_bigram"), r.getAs[Boolean]("rule_stopwords"))).toMap
    assert(out(1L)._1, "clean doc should pass")
    assert(!out(2L)._1 && !out(2L)._3, "repetitive doc should fail the top-bigram rule")
    assert(!out(3L)._1 && !out(3L)._4, "stopword-free doc should fail the stopword rule")
    assert(!out(4L)._1 && !out(4L)._2, "short doc should fail the word-count rule")
  }

  test("PII redaction scrubs emails, IPs, and phone numbers") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.co.uk or 192.168.1.100 or +1 555-867-5309"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = Curation.redactPii(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_redactions"), r.getAs[String]("redacted"))).toMap
    assert(out(1L)._1 == 3)
    assert(out(1L)._2 == "reach me at <EMAIL> or <IP> or <PHONE>")
    assert(out(2L) == (0, "no pii here at all"))
  }

  test("deterministic sampling is reproducible and hits the target rate") {
    val df = (0L until 10000L).toDF("id")
    val a = Curation.deterministicSample(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Curation.deterministicSample(df.repartition(7), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02, s"rate off: ${a.size}")
    // rate 1.0 keeps everything (boundary special case)
    assert(Curation.deterministicSample(df, "id", 1.0).count() == 10000L)
  }

  test("weightedSample keeps rows in proportion to their weight") {
    val df = (0L until 8000L).map(i => (i, if (i % 2 == 0) 0.9 else 0.1))
      .toDF("id", "w")
    val kept = Curation.weightedSample(df, "id", "w")
      .groupBy($"w").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(math.abs(kept(0.9) / 4000.0 - 0.9) < 0.03, s"high: ${kept(0.9)}")
    assert(math.abs(kept(0.1) / 4000.0 - 0.1) < 0.03, s"low: ${kept(0.1)}")
    // weight 0 keeps nothing; weight 1 keeps everything
    val edge = (0L until 100L).map(i => (i, if (i < 50) 0.0 else 1.0)).toDF("id", "w")
    val e = Curation.weightedSample(edge, "id", "w").select($"id").as[Long].collect()
    assert(e.forall(_ >= 50L) && e.length == 50)
  }

  test("stripHtml: elements, tags, entities, comments, degraded input") {
    val cases = Seq(
      // script/style contents die, tags become spaces, text survives
      (1L, "<html><body><p>Hello <b>world</b></p><script>var x = '<p>';</script></body></html>",
        "Hello world"),
      (2L, "<STYLE type=\"a\">p { color: red }</STYLE>kept", "kept"),
      // entities decode AFTER stripping: literal markup in prose survives
      (3L, "a &lt;b&gt; c &amp;&amp; d &quot;q&quot; &#39;s&#39;&nbsp;end",
        "a <b> c && d \"q\" 's' end"),
      // case-insensitive element match, attributes in the open tag
      (4L, "<SCRIPT src=\"x.js\">alert(1)</SCRIPT>after", "after"),
      // unclosed script: tags strip, contents degrade to visible text
      (5L, "<script>orphan(); <p>tail</p>", "orphan(); tail"),
      // comment with a single terminating > strips as a tag
      (6L, "pre <!-- nav bar --> post", "pre post"),
      (7L, "  already   plain\n\ttext  ", "already plain text"))
    val out = cases.map(c => (c._1, c._2)).toDF("id", "html")
      .select($"id", Curation.stripHtml($"html").as("clean"))
      .orderBy($"id").as[(Long, String)].collect()
    cases.zip(out).foreach { case ((id, _, want), (gotId, got)) =>
      assert(gotId == id && got == want, s"doc $id: got '$got', want '$want'")
    }
  }

  test("mixtureResample flattens the domain mix at τ<1, no-ops at τ=1") {
    // domain A dominates 9:1 → at τ=0.5, a_A = 9^-0.5 = 1/3, a_B = 1.0
    val df = (0L until 10000L).map(i => (i, if (i % 10 == 0) "B" else "A"))
      .toDF("id", "dom")
    val out = Curation.mixtureResample(df, "id", "dom", temperature = 0.5)
    val rates = out.select($"dom", $"accept_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("B") == 1.0)
    assert(math.abs(rates("A") - 1.0 / 3.0) < 1e-12)
    val kept = out.filter($"kept").groupBy($"dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("B") == 1000L, "most-upweighted domain keeps everything")
    assert(math.abs(kept("A") / 9000.0 - 1.0 / 3.0) < 0.02, s"A kept: ${kept("A")}")
    // partitioning independence (the md5 draw, not Spark's sample)
    val repart = Curation.mixtureResample(df.repartition(13), "id", "dom", 0.5)
      .filter($"kept").select($"id").as[Long].collect().toSet
    assert(repart == out.filter($"kept").select($"id").as[Long].collect().toSet)
    // τ=1 is the identity mix: every row kept at rate 1
    val flat = Curation.mixtureResample(df, "id", "dom", temperature = 1.0)
    assert(flat.filter(!$"kept" || $"accept_rate" =!= 1.0).count() == 0)
    // NULL domains form their own group and keep their rows (the
    // "every input row returns" contract survives the rate join)
    val withNull = Seq((1L, Some("A")), (2L, None), (3L, None))
      .toDF("id", "dom")
    val nulls = Curation.mixtureResample(withNull, "id", "dom", 0.5)
    assert(nulls.count() == 3)
    assert(nulls.filter($"dom".isNull).count() == 2)
  }

  test("assignSplits: every key gets exactly one stable band, rates hold") {
    val df = (0L until 10000L).map(Tuple1(_)).toDF("id")
    val splits = Curation.assignSplits(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = splits.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / 10000.0 - 0.8) < 0.02, counts.toString)
    assert(math.abs(counts("val") / 10000.0 - 0.1) < 0.01, counts.toString)
    assert(math.abs(counts("test") / 10000.0 - 0.1) < 0.01, counts.toString)
    // stable under repartitioning (the property randomSplit lacks)
    val a = splits.select($"id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.assignSplits(df.repartition(13), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("capPerKey keeps exactly the quota per key, deterministically") {
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val kept = Curation.capPerKey(df, "source", "id", maxPerKey = 25)
    val counts = kept.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSet == Set(25L) && counts.size == 4)
    // same pick under different partitioning; under-quota keys untouched
    val again = Curation.capPerKey(df.repartition(11), "source", "id", 25)
      .select($"id").as[Long].collect().toSet
    assert(again == kept.select($"id").as[Long].collect().toSet)
    assert(Curation.capPerKey(df, "source", "id", 1000).count() == 1000L)
  }

  test("stratified sampling applies per-stratum rates") {
    val df = (0L until 6000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val kept = Curation.stratifiedSample(df, "id", "lang",
        rates = Map("en" -> 0.5, "zh" -> 0.1))
      .groupBy($"lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(math.abs(kept("en") / 3000.0 - 0.5) < 0.05, s"en: ${kept("en")}")
    assert(math.abs(kept("zh") / 3000.0 - 0.1) < 0.05, s"zh: ${kept("zh")}")
  }

  test("canonicalizeUrl: case, fragments, trackers, debris, edge shapes") {
    val cases = Seq(
      // scheme+host lowercase, path case kept, fragment dropped
      "HTTPS://Example.COM/PaTh#frag" -> "https://example.com/PaTh",
      // tracker stripped mid-query, separator repaired
      "https://a.com/p?utm_source=x&id=7" -> "https://a.com/p?id=7",
      "https://a.com/p?id=7&utm_campaign=c" -> "https://a.com/p?id=7",
      // tracker-only query vanishes entirely (and the trailing slash)
      "https://a.com/p/?utm_medium=m" -> "https://a.com/p",
      // fbclid between real params
      "https://a.com/p?a=1&fbclid=xyz&b=2" -> "https://a.com/p?a=1&b=2",
      // no scheme/host span: passes through the host step untouched
      "relative/path?gclid=g" -> "relative/path",
      // params NAMED like trackers with a prefix are NOT trackers — the
      // patterns anchor at the parameter boundary
      "https://a.com/p?songclid=AAA" -> "https://a.com/p?songclid=AAA",
      "https://a.com/p?xfbclid=1&b=2" -> "https://a.com/p?xfbclid=1&b=2",
      // consecutive leading trackers all drop, the ? re-anchors
      "https://a.com/p?utm_a=1&utm_b=2&id=7" -> "https://a.com/p?id=7",
      // nothing to canonicalize
      "https://a.com/q?x=1" -> "https://a.com/q?x=1")
    val out = cases.map(_._1).toDF("url")
      .select(Curation.canonicalizeUrl($"url").as("c")).as[String].collect()
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"got $got, want $want")
    }
    // the fingerprint groups surface variants together
    val fps = Seq("HTTPS://A.com/p?utm_source=1", "https://a.com/p")
      .toDF("url").select(Curation.urlFingerprint($"url")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("applyKeepBest keeps the highest-scoring member of each cluster") {
    val docs = Seq(
      (1L, "shared text body one", 10L),
      (2L, "shared text body one extended", 25L),  // best of cluster {1,2,3}
      (3L, "shared text body one x", 12L),
      (4L, "completely different content", 7L))    // singleton survives
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Curation.applyKeepBest(docs, "doc_id", pairs, "n_chars")
      .select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L))
    // WindowGroupLimit: only each cluster's top row survives the sort
    val plan = Curation.applyKeepBest(docs, "doc_id", pairs, "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("leakageSafeSplits: a near-dup cluster never straddles splits") {
    import graft.pipeline.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val withCopies = docs.unionByName(
      docs.filter($"doc_id" < 10).select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val pairs = Dedup.ngramJaccard(withCopies, "doc_id", "text", n = 2,
      threshold = 0.5, maxGramDf = 100L)
    val split = Curation.leakageSafeSplits(withCopies, "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // every cluster maps to exactly one split...
    val straddling = split.groupBy($"cluster")
      .agg(countDistinct($"split").as("ns")).filter($"ns" > 1).count()
    assert(straddling == 0)
    // ...including the planted multi-doc clusters (the guard is non-vacuous)
    val multi = split.groupBy($"cluster").count().filter($"count" > 1).count()
    assert(multi >= 10, s"expected planted clusters, got $multi")
    // copies inherit the ORIGINAL's cluster and split
    val orig = split.filter($"doc_id" < 10)
      .select($"doc_id", $"split".as("s_orig"))
    val copies = split.filter($"doc_id" >= 1000000)
      .select(($"doc_id" - 1000000).as("doc_id"), $"split".as("s_copy"))
    assert(orig.join(copies, "doc_id").filter($"s_orig" =!= $"s_copy").count() == 0)
  }

  test("tokenBudgetMix: first-fit in md5 order, per-domain budgets, null domain") {
    import org.apache.spark.sql.functions.{concat, lit, md5}
    val docs = Seq(
      (1L, Some("web"), 400), (2L, Some("web"), 400), (3L, Some("web"), 400),
      (4L, Some("code"), 900),
      (5L, None, 50), (6L, None, 100)
    ).toDF("id", "dom", "toks")
    val out = Curation.tokenBudgetMix(docs, "id", "dom", "toks",
      budgets = Map("web" -> 800L, "code" -> 100L), defaultBudget = 120L)
    // per-domain kept token totals never exceed the budget
    val sums = out.filter($"kept").groupBy($"dom")
      .agg(org.apache.spark.sql.functions.sum($"toks").as("s"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(sums.getOrElse(Some("web"), 0L) <= 800L)
    assert(!sums.contains(Some("code"))) // 900 > 100: nothing fits
    // null domain uses the default budget: only the 50-token doc can fit
    // alongside the 100-token one in SOME order; exactly first-fit decides
    val nullKept = out.filter($"dom".isNull && $"kept").count()
    assert(nullKept >= 1)
    // the keep set is exactly the md5-order first-fit prefix per domain
    val webOrder = docs.filter($"dom" === "web")
      .orderBy(md5(concat(lit("graft"), $"id".cast("string"))), $"id")
      .select($"id").as[Long].collect().toSeq
    val webKept = out.filter($"dom" === "web" && $"kept")
      .select($"id").as[Long].collect().toSet
    assert(webKept == webOrder.take(2).toSet) // 400+400 fits, third breaks 800
    // deterministic across re-evaluation and repartitioning
    val again = Curation.tokenBudgetMix(docs.repartition(7), "id", "dom", "toks",
      budgets = Map("web" -> 800L, "code" -> 100L), defaultBudget = 120L)
      .filter($"kept").select($"id").as[Long].collect().toSet
    assert(again == out.filter($"kept").select($"id").as[Long].collect().toSet)
    // a NULL token count classifies as 0 tokens — kept is never NULL, so
    // the row can't vanish from both the mix and the reject audit
    val withNull = Seq((1L, "web", Some(10)), (2L, "web", None))
      .toDF("id", "dom", "toks")
    val nOut = Curation.tokenBudgetMix(withNull, "id", "dom", "toks",
      budgets = Map.empty, defaultBudget = 100L)
    assert(nOut.filter($"kept".isNull).count() == 0)
    assert(nOut.filter($"kept").count() == 2)
  }

  test("weightedCapPerKey: NaN weights rank with unusable weights, not first") {
    val rows = (1L to 30L).map(i => (i, "k", 1.0)) ++
      Seq((31L, "k", Double.NaN), (32L, "k", Double.NaN))
    val out = Curation.weightedCapPerKey(rows.toDF("id", "key", "w"),
      "key", "id", "w", maxPerKey = 10)
    assert(out.count() == 10)
    assert(out.filter($"id" >= 31L).count() == 0,
      "NaN-weight rows must not win quota slots")
  }

  test("weightedCapPerKey: quota holds, weight biases the pick, weight<=0 last") {
    val rows = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", if (i <= 100) 1000.0 else 1.0)) :+
      (201L, "a", 0.0) :+ (202L, "a", -5.0)
    val df = rows.toDF("id", "key", "w")
    val out = Curation.weightedCapPerKey(df, "key", "id", "w", maxPerKey = 20)
    val perKey = out.groupBy($"key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perKey.values.forall(_ == 20))
    // heavy rows (w=1000, ids<=100) should dominate the winners
    val heavy = out.filter($"id" <= 100).count()
    assert(heavy >= 30, s"expected weight bias toward heavy rows, got $heavy/40")
    // zero/negative weights only win when k exceeds positive-weight rows
    assert(out.filter($"id" >= 201L).count() == 0)
    // deterministic under repartitioning
    val again = Curation.weightedCapPerKey(df.repartition(13), "key", "id", "w", 20)
      .select($"id").as[Long].collect().toSet
    assert(again == out.select($"id").as[Long].collect().toSet)
  }

  test("detectCardNumbers: Luhn separates real cards from 16-digit noise") {
    val docs = Seq(
      (1L, "pay with 4111-1111-1111-1111 thanks"),        // valid (Visa test)
      (2L, "pay with 4111-1111-1111-1112 thanks"),        // checksum fails
      (3L, "ref 5500 0000 0000 0004 and 1234567890123456"), // one valid, one not
      (4L, "no digits here"),
      (5L, "order 4111111111111111")                      // valid, no separators
    ).toDF("doc_id", "text")
    val out = Curation.detectCardNumbers(docs, "text")
      .select($"doc_id", $"n_candidates", $"n_cards")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      (1L, 1, 1), (2L, 1, 0), (3L, 2, 1), (4L, 0, 0), (5L, 1, 1)))
  }

  test("deterministicShuffle: dense per-shard positions, salt-keyed permutation") {
    val df = (0L until 200L).map(i => (i, s"doc$i")).toDF("id", "text")
    val a = Curation.deterministicShuffle(df, "id", numShards = 4)
      .select($"id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // positions within each shard are exactly 0..n-1
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length).toSeq, s"shard $shard")
    }
    // stable under repartitioning (the reproducibility contract)
    val b = Curation.deterministicShuffle(df.repartition(7), "id", numShards = 4)
      .select($"id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // a different salt (epoch) produces a different permutation
    val c = Curation.deterministicShuffle(df, "id", numShards = 4, salt = "epoch2")
      .select($"id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(c.sortBy(_._1).toSeq != a.sortBy(_._1).toSeq)
    // and the order within a shard is not the insertion order (it shuffles)
    val shard0 = a.filter(_._2 == a(0)._2).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
  }

  test("linkGraph: href extraction, host case-fold, relative links dropped") {
    import graft.pipeline.Curation
    val df = Seq(
      (1L, "https://A.com/p/1",
        "<a href=\"https://B.COM/x\">b</a><a href=\"http://b.com/y\">b2</a>" +
        "<a href=\"/rel\">r</a><a href=\"mailto:x@y.z\">m</a>"),
      (2L, "HTTPS://a.com/p/2", "<a href=\"https://b.com/z\">b</a>"),
      (3L, "no-url-here", "<a href=\"https://c.com/\">c</a>")
    ).toDF("id", "url", "html")
    val out = Curation.linkGraph(df, "id", "url", "html")
      .orderBy($"src_host", $"dst_host").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // doc 3's src url has no scheme://host -> its edge drops; the two
    // a.com docs fold case and aggregate to one (a.com, b.com) edge of 3
    assert(out.toSeq == Seq(("a.com", "b.com", 3L)))
  }

  test("kAnonymize: suppresses small QI groups; the null group is a group") {
    val df = Seq(
      (1L, Some("a"), "x"), (2L, Some("a"), "x"), (3L, Some("a"), "x"),
      (4L, Some("b"), "y"), (5L, Some("b"), "y"), // size 2 -> dropped at k=3
      (6L, None, "z"), (7L, None, "z"), (8L, None, "z")
    ).toDF("id", "lang", "src")
    val kept = Curation.kAnonymize(df, Seq("lang", "src"), k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 6L, 7L, 8L))
  }

  test("dpNoisyRelease: deterministic, partition-independent, clamp-bounded") {
    val df = Seq(("a", 2.0), ("a", 9.0), ("a", -3.0), ("b", 1.0), ("b", 4.0))
      .toDF("g", "v")
    val rel = Curation.dpNoisyRelease(df, "g", "v", eps = 1.0, clampHi = 5.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // identical under repartitioning (seeded noise + fixed-point sums)
    val rel2 = Curation.dpNoisyRelease(df.repartition(7), "g", "v", 1.0, 5.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rel == rel2)
    // one adversarial row (value 1e9) moves the release by at most clampHi:
    // the noise is a pure function of the group key, so the deltas are the
    // clamped-sum deltas — the sensitivity the ε guarantee is priced on
    val spiked = Seq(("a", 2.0), ("a", 9.0), ("a", 1e9), ("b", 1.0), ("b", 4.0))
      .toDF("g", "v")
    val rs = Curation.dpNoisyRelease(spiked, "g", "v", 1.0, 5.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // row count unchanged -> noisy_count identical; sum delta: the -3.0
    // row clamped to 0, the 1e9 row clamped to 5 -> exactly +5
    assert(rs("a")._1 == rel("a")._1)
    assert(math.abs(rs("a")._2 - rel("a")._2 - 5.0) < 1e-9)
    assert(rs("b") == rel("b"))
    intercept[IllegalArgumentException] {
      Curation.dpNoisyRelease(df, "g", "v", eps = 0.0, clampHi = 5.0)
    }
  }

  test("mainContentBlocks: nav dies by link density, prose survives") {
    val html = "<div><a href=\"/\">home</a> <a href=\"/x\">about us</a></div>" +
      "<p>the quick brown fox jumped over the lazy dog and it was glad " +
      "that the day is warm for everyone in the field today</p>" +
      "<div>ok</div>"
    val out = graft.pipeline.Curation.mainContentBlocks(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .orderBy($"block_idx").collect()
    assert(out.length == 3, out.mkString(";"))
    // anchors-only block: link chars dominate -> boilerplate
    assert(out(0).getString(5) == "boilerplate" &&
      out(0).getDouble(3) > 0.3)
    // prose block: zero links, heavy function words -> good
    assert(out(1).getString(5) == "good" && out(1).getDouble(3) == 0.0 &&
      out(1).getDouble(4) >= 0.05)
    // tiny trailing block: under minChars -> boilerplate
    assert(out(2).getString(5) == "boilerplate" && out(2).getInt(2) < 40)
  }

  test("neymanSample: volatile strata get the budget, constant strata none") {
    // stratum a: constant (sd 0); b: sd 1; c: sd 3 (same sizes) ->
    // allocation 0 : 100·(1/4) : 100·(3/4)
    val rows =
      (1 to 400).map(i => ("a", s"a$i", 5.0)) ++
      (1 to 400).map(i => ("b", s"b$i", if (i % 2 == 0) 1.0 else -1.0)) ++
      (1 to 400).map(i => ("c", s"c$i", if (i % 2 == 0) 3.0 else -3.0))
    val df = rows.toDF("h", "k", "v")
    val out = Curation.neymanSample(df, "h", "k", "v", totalN = 100L)
      .groupBy($"h").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("a"), s"constant stratum sampled: $out")
    assert(out("b") == 25L && out("c") == 75L, s"$out")
    // determinism: same call, same winners
    val first = Curation.neymanSample(df, "h", "k", "v", totalN = 100L)
      .collect().map(_.getString(0)).sorted
    val second = Curation.neymanSample(df, "h", "k", "v", totalN = 100L)
      .collect().map(_.getString(0)).sorted
    assert(first.sameElements(second))
  }

  test("ibanValid: published example IBANs pass, checksum flips fail") {
    // DE/GB/FR examples from the ISO 13616 registry docs; the -01 twin
    // differs only in the last digit
    val df = Seq("DE89370400440532013000", "GB82WEST12345698765432",
      "FR1420041010050500013M02606", "DE89370400440532013001",
      "GB82WEST12345698765431").toDF("iban")
    val out = df.select($"iban",
      graft.pipeline.Curation.ibanValid($"iban").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out("DE89370400440532013000") && out("GB82WEST12345698765432") &&
      out("FR1420041010050500013M02606"))
    assert(!out("DE89370400440532013001") && !out("GB82WEST12345698765431"))
  }

  test("tCloseness: hand-computed ordered EMD, balanced class passes") {
    // global sensitive values {0, 1} are 3/3; classes A = all-0, B =
    // all-1 (EMD 0.5 each), C = one of each (EMD 0)
    val df = Seq(("A", 0), ("A", 0), ("B", 1), ("B", 1), ("C", 0), ("C", 1))
      .toDF("qi", "s")
    val out = Curation.tCloseness(df, Seq("qi"), "s", t = 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out("A") == ((2L, 0.5, false)))
    assert(out("B") == ((2L, 0.5, false)))
    assert(out("C") == ((2L, 0.0, true)))
    // single global value: EMD degenerates to 0 for every class
    val one = Seq(("A", 7), ("B", 7)).toDF("qi", "s")
    assert(Curation.tCloseness(one, Seq("qi"), "s", t = 0.1)
      .collect().forall(r => r.getDouble(2) == 0.0 && r.getBoolean(3)))
  }

  test("kAnonymize: l-diversity drops constant-sensitive groups") {
    val df = Seq(
      // group (a,x): 4 rows but ONE sensitive value -> fails l=2
      (1L, "a", "x", 10), (2L, "a", "x", 10), (3L, "a", "x", 10), (4L, "a", "x", 10),
      // group (b,y): 4 rows, two sensitive values -> passes
      (5L, "b", "y", 10), (6L, "b", "y", 20), (7L, "b", "y", 10), (8L, "b", "y", 20)
    ).toDF("id", "lang", "src", "salary")
    val kept = Curation.kAnonymize(df, Seq("lang", "src"), k = 3,
        sensitiveCol = Some("salary"), l = 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L, 6L, 7L, 8L))
    // same data without the sensitive requirement keeps both groups
    val all = Curation.kAnonymize(df, Seq("lang", "src"), k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("fimTransform: PSM reassembly inverts, pass-through intact, partition-stable") {
    import spark.implicits._
    val docs = (0L until 200L).map(d => (d, s"alpha$d bravo charlie delta echo$d"))
      .toDF("doc_id", "text")
    val out = Curation.fimTransform(docs, "doc_id", "text")
      .select($"doc_id", $"text", $"fim_applied", $"text_out").collect()
    val applied = out.filter(_.getBoolean(2))
    // rate 0.5 over the md5 space: roughly half transform
    assert(applied.length > 60 && applied.length < 140, applied.length)
    applied.foreach { r =>
      val t = r.getString(3)
      assert(t.startsWith("<PRE>"), t)
      // PSM order: <PRE> p <SUF> s <MID> m; reassembling p + m + s
      // must reproduce the original document exactly
      val body = t.stripPrefix("<PRE>")
      val Array(p, rest) = body.split("<SUF>", 2)
      val Array(sfx, m) = rest.split("<MID>", 2)
      assert(p + m + sfx == r.getString(1), s"doc ${r.getLong(0)}")
    }
    out.filterNot(_.getBoolean(2)).foreach { r =>
      assert(r.getString(3) == r.getString(1), "pass-through must be verbatim")
    }
    // deterministic under partitioning (df.sample is not)
    val again = Curation.fimTransform(docs.repartition(7), "doc_id", "text")
      .select($"doc_id", $"text_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r => assert(again(r.getLong(0)) == r.getString(3)))
    // a sub-2-char doc never transforms (no cuttable middle)
    val tiny = Curation.fimTransform(Seq((1L, "x")).toDF("doc_id", "text"),
      "doc_id", "text", rate = 1.0).head()
    assert(!tiny.getAs[Boolean]("fim_applied") && tiny.getAs[String]("text_out") == "x")
  }

  test("spanCorrupt: sentinel surgery inverts; only full windows mask; stable") {
    import spark.implicits._
    // 200 docs of 5 full 40-char windows + an 11-char tail window
    val docs = (0L until 200L).map { d =>
      val body = (0 until 5).map(wi => f"w$wi%02dd$d%03d".padTo(40, 'x')).mkString
      (d, body + "tail_chars.")
    }.toDF("doc_id", "text")
    val out = Curation.spanCorrupt(docs, "doc_id", "text", rate = 0.4)
      .select($"doc_id", $"text", $"input_text", $"target_text", $"n_masked")
      .collect()
    val sentinel = "<extra_id_(\\d+)>".r
    var totalMasked = 0L
    out.foreach { r =>
      val (orig, inp, tgt, k) =
        (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))
      totalMasked += k
      // target = k sentinel-led spans + the closing sentinel
      assert(sentinel.findAllIn(tgt).size == k + 1, tgt)
      assert(tgt.endsWith(s"<extra_id_$k>"), tgt)
      // invert: replace <extra_id_i> in the input with target span i
      val spans = sentinel.split(tgt.stripSuffix(s"<extra_id_$k>")).drop(1)
      assert(spans.length == k, s"${spans.length} != $k")
      val rebuilt = spans.zipWithIndex.foldLeft(inp) { case (acc, (sp, i)) =>
        acc.replace(s"<extra_id_$i>", sp)
      }
      assert(rebuilt == orig, s"doc ${r.getLong(0)} does not invert")
      // the 11-char tail window is never a mask site: input tail intact
      assert(inp.endsWith("tail_chars."), inp)
    }
    // rate 0.4 over 200 docs x 5 full windows = ~400 expected masks
    assert(totalMasked > 280 && totalMasked < 520, totalMasked)
    // deterministic under partitioning
    val again = Curation.spanCorrupt(docs.repartition(7), "doc_id", "text",
      rate = 0.4).select($"doc_id", $"input_text", $"target_text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    out.foreach(r =>
      assert(again(r.getLong(0)) == (r.getString(2), r.getString(3))))
    // empty doc: nothing masks, target is the lone closing sentinel
    val e = Curation.spanCorrupt(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text", rate = 1.0).head()
    assert(e.getAs[String]("input_text") == "" &&
      e.getAs[String]("target_text") == "<extra_id_0>" &&
      e.getAs[Long]("n_masked") == 0L)
  }
}
