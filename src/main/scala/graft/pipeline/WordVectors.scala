package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Count-based distributed word embeddings: positive PMI co-occurrence
 * matrix + truncated spectral factorization — the classic pre-neural
 * embedding trainer (Levy & Goldberg showed SGNS implicitly factorizes
 * exactly this matrix), trained entirely inside the engine.
 *
 * Scale split mirrors `Embeddings.fitPca`: the DATA-sized work
 * (token positions, windowed co-occurrence counts, PPMI) is pure
 * DataFrame aggregation — linear in corpus size, ×window fan-out via
 * offset equi-joins, never a per-doc quadratic join; the VOCAB²-sized
 * PPMI matrix is model-sized by construction (vocabularies cap at
 * ~10⁵-ish; this path asserts ≤ 10⁴) and collapses to the driver for
 * the power iteration with deflation, every state rounded (10dp
 * vectors, 8dp norms, 6dp matrix) so the trajectory replays exactly in
 * unrolled MATERIALIZED CTEs.
 */
object WordVectors {

  private def rnd(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Directed co-occurrence counts within ±window positions, built by
    * `window` offset equi-joins on (doc, position) — returns
    * (term_a, term_b, n) with both directions present. */
  def cooccurrence(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(TextAnalysis.wsTokens(lower(col(textCol)))).as(Seq("pos", "term")))
      .ckptSer()
    val shifted = (1 to window).map { off =>
      toks.select($"doc", ($"pos" + off).as("pos"), $"term".as("right_term"))
    }.reduce(_ unionByName _)
    val directed = toks.join(shifted, Seq("doc", "pos"))
      .select($"term".as("term_a"), $"right_term".as("term_b"))
    directed.unionByName(
        directed.select($"term_b".as("term_a"), $"term_a".as("term_b")))
      .groupBy($"term_a", $"term_b").agg(count(lit(1)).as("n"))
  }

  /** PPMI(a,b) = max(0, ln(n_ab·N / (n_a·n_b))), 6dp — rows with zero
    * PPMI are dropped (the matrix consumer re-densifies). */
  def ppmi(cooc: DataFrame): DataFrame = {
    val spark = cooc.sparkSession
    import spark.implicits._
    val total = cooc.agg(sum($"n").cast("double").as("nn"))
    val marg = cooc.groupBy($"term_a").agg(sum($"n").as("na"))
    cooc.join(marg, "term_a")
      .join(marg.select($"term_a".as("term_b"), $"na".as("nb")), "term_b")
      .crossJoin(broadcast(total))
      .select($"term_a", $"term_b",
        round(log($"n" * $"nn" / ($"na" * $"nb")), 6).as("ppmi"))
      .filter($"ppmi" > 0)
  }

  /**
   * Spectral embedding rows (term, comp, value, lambda): top-k
   * eigenvectors of the dense PPMI matrix by power iteration with
   * deflation — `Embeddings.fitPca`'s exact state-rounding contract
   * ((i+1)-ramp start, 10dp vectors, 8dp lambda, 6dp deflation) so
   * `oracleSql` replays the trajectory.
   */
  def spectralEmbed(docs: DataFrame, idCol: String, textCol: String,
      window: Int, k: Int, iterations: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ppmiDf = ppmi(cooccurrence(docs, idCol, textCol, window))
      .ckptSer()
    // guard BEFORE collecting the dense matrix: one cheap distinct-count
    // aggregate decides whether the vocab is model-sized — an oversized
    // vocab must fail with this error, not an OOM mid-collect.
    val dGuard = ppmiDf.select(explode(array($"term_a", $"term_b")).as("t"))
      .agg(countDistinct($"t")).head().getLong(0)
    require(dGuard >= 2 && dGuard <= 10000,
      s"vocab size $dGuard outside the model-sized range")
    val p = ppmiDf
      .collect().map(r => (r.getString(1), r.getString(0), r.getDouble(2)))
    ppmiDf.unpersist()
    // vocab = every term seen in any co-occurrence (alphabetical ids)
    val vocab = p.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val d = vocab.length
    require(k >= 1 && k <= d && iterations >= 1, "bad k/iterations")
    val idx = vocab.zipWithIndex.toMap
    val m = Array.ofDim[Double](d, d)
    p.foreach { case (b, a, v) => m(idx(a))(idx(b)) = v }

    val nrm0 = math.sqrt((1 to d).map(i => i.toDouble * i).sum)
    val vStart = Array.tabulate(d)(i => rnd((i + 1) / nrm0, 10))
    val rows = Seq.newBuilder[(String, Int, Double, Double)]
    for (c <- 0 until k) {
      var v = vStart.clone()
      var lambda = 0.0
      for (it <- 1 to iterations) {
        val w = Array.tabulate(d) { i =>
          var acc = 0.0
          var j = 0
          while (j < d) { acc += m(i)(j) * v(j); j += 1 }
          rnd(acc, 10)
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        require(nrm > 0, s"power iteration collapsed at component $c step $it")
        if (it == iterations) lambda = rnd(nrm, 8)
        v = w.map(x => rnd(x / nrm, 10))
      }
      for (i <- 0 until d) rows += ((vocab(i), c, v(i), lambda))
      if (c + 1 < k)
        for (i <- 0 until d; j <- 0 until d)
          m(i)(j) = rnd(m(i)(j) - lambda * v(i) * v(j), 6)
    }
    rows.result().toDF("term", "comp", "value", "lambda")
  }

  /** Unrolled DuckDB replay of [[spectralEmbed]] over the `documents`
    * table: co-occurrence + PPMI as data CTEs, the dense matrix as a
    * vocab×vocab grid, then the per-component step triples and
    * deflation exactly as `Embeddings.pcaCteChain` writes them. */
  def oracleSql(window: Int, k: Int, iterations: Int): String = {
    val selects = (0 until k).map { c =>
      s"""SELECT vb.term, $c AS comp, v.v AS value, lam$c.lambda
         |FROM vf$c v JOIN vocab vb ON v.i = vb.i CROSS JOIN lam$c""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${cteChain(window, k, iterations)}
       |$selects
       |ORDER BY comp, term""".stripMargin
  }

  /** The shared CTE chain (see [[oracleSql]]); exposes `toks`, `vocab`,
    * and per component `vf{c}` + `lam{c}`. */
  private def cteChain(window: Int, k: Int, iterations: Int): String = {
    val offsets = (1 to window).map(o =>
      s"""SELECT doc, pos + $o AS pos, term AS right_term FROM toks""")
      .mkString("\n  UNION ALL\n  ")
    val head =
      s"""toks AS MATERIALIZED (
         |  SELECT doc_id AS doc, generate_subscripts(tk, 1) AS pos, unnest(tk) AS term
         |  FROM (SELECT doc_id,
         |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
         |        FROM documents)),
         |sh AS MATERIALIZED (
         |  $offsets),
         |dir AS MATERIALIZED (
         |  SELECT t.term AS term_a, s.right_term AS term_b
         |  FROM toks t JOIN sh s ON t.doc = s.doc AND t.pos = s.pos),
         |cooc AS MATERIALIZED (
         |  SELECT term_a, term_b, count(*) AS n FROM (
         |    SELECT term_a, term_b FROM dir
         |    UNION ALL SELECT term_b, term_a FROM dir)
         |  GROUP BY 1, 2),
         |nn AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM cooc),
         |marg AS MATERIALIZED (SELECT term_a, sum(n) AS na FROM cooc GROUP BY 1),
         |pp AS MATERIALIZED (
         |  SELECT c.term_a, c.term_b,
         |         round(ln(c.n * nn.nn / (a.na * b.na)), 6) AS ppmi
         |  FROM cooc c JOIN marg a ON c.term_a = a.term_a
         |  JOIN marg b ON c.term_b = b.term_a CROSS JOIN nn
         |  WHERE round(ln(c.n * nn.nn / (a.na * b.na)), 6) > 0),
         |vocab AS MATERIALIZED (
         |  SELECT term, row_number() OVER (ORDER BY term) - 1 AS i
         |  FROM (SELECT DISTINCT term_a AS term FROM pp
         |        UNION SELECT DISTINCT term_b FROM pp)),
         |dd AS (SELECT count(*)::BIGINT AS d FROM vocab),
         |m0 AS MATERIALIZED (
         |  SELECT va.i, vb.i AS j, coalesce(p.ppmi, 0.0) AS c
         |  FROM vocab va CROSS JOIN vocab vb
         |  LEFT JOIN pp p ON p.term_a = va.term AND p.term_b = vb.term),
         |vstart AS MATERIALIZED (
         |  SELECT i, round((i + 1) / (SELECT sqrt(sum((i + 1) * (i + 1)))
         |                             FROM vocab), 10) AS v
         |  FROM vocab)""".stripMargin
    val perComp = (0 until k).flatMap { c =>
      val v0 = s"v${c}_0 AS (SELECT i, v FROM vstart)"
      val steps = (1 to iterations).map { s =>
        s"""w${c}_$s AS MATERIALIZED (
           |  SELECT g.i, round(coalesce(sum(g.c * v.v), 0.0), 10) AS w
           |  FROM m$c g JOIN v${c}_${s - 1} v ON g.j = v.i GROUP BY g.i),
           |n${c}_$s AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM w${c}_$s),
           |v${c}_$s AS MATERIALIZED (SELECT i, round(w / nrm, 10) AS v
           |  FROM w${c}_$s CROSS JOIN n${c}_$s)""".stripMargin
      }
      val fin =
        s"""lam$c AS MATERIALIZED (SELECT round(nrm, 8) AS lambda FROM n${c}_$iterations),
           |vf$c AS MATERIALIZED (SELECT i, v FROM v${c}_$iterations)""".stripMargin
      val deflate =
        if (c + 1 < k)
          Seq(s"""m${c + 1} AS MATERIALIZED (
                 |  SELECT g.i, g.j,
                 |    round(g.c - lam$c.lambda * vi.v * vj.v, 6) AS c
                 |  FROM m$c g JOIN vf$c vi ON g.i = vi.i
                 |              JOIN vf$c vj ON g.j = vj.i
                 |  CROSS JOIN lam$c)""".stripMargin)
        else Seq.empty
      Seq(v0) ++ steps ++ Seq(fin) ++ deflate
    }
    (Seq(head) ++ perComp).mkString(",\n")
  }

  /**
   * Document embeddings from the fitted word vectors: each document's
   * vector is the per-component MEAN of its tokens' spectral values
   * (out-of-vocab tokens skipped), rounded 6dp — the bag-of-vectors
   * doc representation. The word model is vocab×k (model-sized) and
   * broadcast-joins onto the token stream; one doc-keyed aggregate.
   */
  def embedDocuments(docs: DataFrame, idCol: String, textCol: String,
      window: Int, k: Int, iterations: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wv = spectralEmbed(docs, idCol, textCol, window, k, iterations)
    val toks = docs.select(col(idCol).as("doc"),
      explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("term"))
    toks.join(broadcast(wv), "term")
      .groupBy($"doc", $"comp")
      .agg(round(avg($"value"), 6).as("value"), count(lit(1)).as("n_tokens"))
      .select($"doc".as(idCol), $"comp", $"value", $"n_tokens")
  }

  /** DuckDB replay of [[embedDocuments]]. */
  def docOracleSql(window: Int, k: Int, iterations: Int): String = {
    val selects = (0 until k).map { c =>
      s"""SELECT t.doc, $c AS comp, round(avg(v.v), 6) AS value,
         |       count(*) AS n_tokens
         |FROM toks t JOIN vocab vb ON t.term = vb.term
         |JOIN vf$c v ON vb.i = v.i
         |GROUP BY t.doc""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${cteChain(window, k, iterations)},
       |docvecs AS ($selects)
       |SELECT doc AS doc_id, comp, value, n_tokens
       |FROM docvecs ORDER BY doc_id, comp""".stripMargin
  }
}
