package graft

import graft.pipeline.Chunking

/** Edge-case pins for chunking and lexical ranking (the sf0.01 oracle
  * checks the exact math; these pin the boundary rules). */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk reconstruction: de-overlapped chunks rebuild the token stream") {
    val rng = new java.util.Random(17L)
    val docs = (0L until 120L).map { i =>
      (i, Seq.fill(1 + rng.nextInt(60))(s"w${rng.nextInt(9)}").mkString(" "))
    }.toDF("id", "text")
    for ((size, overlap) <- Seq((8, 0), (8, 4), (5, 2), (16, 15))) {
      val chunks = Chunking.chunkByTokens(docs, "id", "text", size, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
        .groupBy(_._1)
      val original = docs.collect()
        .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
        .toMap
      original.foreach { case (id, toks) =>
        val cs = chunks(id).sortBy(_._2).map(_._3.split(" ").toSeq)
        // every chunk within size; first starts the doc; dropping each
        // chunk's first `overlap` tokens (except chunk 0) rebuilds the doc
        assert(cs.forall(_.length <= size), s"doc $id size/$overlap")
        val rebuilt = cs.head ++ cs.tail.flatMap(_.drop(overlap))
        assert(rebuilt == toks, s"doc $id ($size,$overlap): $rebuilt vs $toks")
      }
    }
  }

  test("chunking drops trailing windows contained in their predecessor") {
    // 10 tokens, size 8, overlap 4 -> starts 0 and 4 only (start 8 would
    // cover tokens already inside [4, 10))
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val out = Chunking.chunkByTokens(docs, "id", "text", chunkSize = 8, overlap = 4)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"chunk_len", $"chunk_text").collect()
    assert(out.length == 2)
    assert(out(0).getInt(1) == 8 && out(0).getString(2).startsWith("t1 "))
    assert(out(1).getInt(1) == 6 && out(1).getString(2) == "t5 t6 t7 t8 t9 t10")
  }

  test("short and empty documents chunk to one row and zero rows") {
    val docs = Seq((1L, "a b c"), (2L, "   ")).toDF("id", "text")
    val out = Chunking.chunkByTokens(docs, "id", "text", chunkSize = 8, overlap = 4)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("chunk_text") == "a b c")
  }

  test("tfidf ranks a document's rare term above a corpus-wide term") {
    val docs = Seq(
      (1L, "common common rare rare"),
      (2L, "common common common"),
      (3L, "common other other")).toDF("id", "text")
    val top = Chunking.tfidfTopTerms(docs, "id", "text", topK = 1)
      .orderBy($"id").select($"term").as[String].collect()
    assert(top.toSeq == Seq("rare", "common", "other"))
  }

  test("bm25 favors higher tf and penalizes longer documents") {
    val docs = Seq(
      (1L, "spark spark spark pad"),
      (2L, "spark pad pad pad"),
      (3L, "spark " + Seq.fill(50)("pad").mkString(" ")),
      (4L, "nothing here")).toDF("id", "text")
    val scores = Chunking.bm25(docs, "id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set(1L, 2L, 3L))
    assert(scores(1L) > scores(2L) && scores(2L) > scores(3L))
  }

  test("packSequences: budget respected, positions dense, partitioning-invariant") {
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill(5 + (i % 37).toInt)("w").mkString(" ")))
      .toDF("id", "text")
    val packed = Chunking.packSequences(docs, "id", "text", tokenBudget = 60L,
      numGroups = 4)
    val rows = packed.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 200)
    // every multi-doc pack within budget (over-budget docs would sit alone;
    // none here since max doc = 41 tokens < 60)
    val byPack = rows.groupBy(r => (r._2, r._3))
    assert(byPack.values.forall(_.map(_._5).sum <= 60L))
    // pack ids dense from 0 per group; positions dense from 0 per pack,
    // following doc-id order
    rows.groupBy(_._2).foreach { case (_, g) =>
      val packs = g.map(_._3).distinct.sorted.toIndexedSeq
      assert(packs.toSeq == (0L until packs.length.toLong).toSeq)
    }
    byPack.values.foreach { p =>
      assert(p.sortBy(_._1).map(_._4).toSeq == (0L until p.length).toSeq)
    }
    // result independent of input partitioning
    val re = Chunking.packSequences(docs.repartition(7), "id", "text", 60L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(re.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    // the precomputed-count path packs identically to the text path
    val counted = docs.withColumn("n",
      org.apache.spark.sql.functions.size(
        graft.pipeline.TextAnalysis.wsTokens($"text")).cast("long"))
    val fromCounts = Chunking.packSequencesFromCounts(counted, "id", "n", 60L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(fromCounts.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
  }

  test("chunkBySentences: greedy packing never splits a sentence") {
    // sentences of 3/4/5/2 tokens; budget 7 → [s1 s2]=7, [s3 s4]=7
    val df = Seq(
      (1L, "one two three. four five six seven! eight nine ten eleven twelve? last words."),
      (2L, ""), // no sentences → no rows
      (3L, "a b c d e f g h i j k l") // one unpunctuated 12-token sentence
    ).toDF("doc_id", "text")
    val got = Chunking.chunkBySentences(df, "doc_id", "text", maxTokens = 7)
      .orderBy($"doc_id", $"chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, "one two three. four five six seven!", 2, 7L),
      (1L, 1L, "eight nine ten eleven twelve? last words.", 2, 7L),
      (3L, 0L, "a b c d e f g h i j k l", 1, 12L)), got.toSeq)
    // an over-budget sentence gets its own chunk; neighbors are unharmed
    val big = Seq((9L, "tiny one. w1 w2 w3 w4 w5 w6 w7 w8 w9 w10. after words."))
      .toDF("doc_id", "text")
    val got2 = Chunking.chunkBySentences(big, "doc_id", "text", maxTokens = 4)
      .orderBy($"chunk").collect().map(r => (r.getLong(1), r.getString(2)))
    assert(got2.toSeq == Seq(
      (0L, "tiny one."), (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10."),
      (2L, "after words.")), got2.toSeq)
  }
}
