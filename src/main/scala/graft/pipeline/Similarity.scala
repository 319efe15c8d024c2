package graft.pipeline

import graft.util.Ckpt._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Baseline: exact brute-force cosine top-k (broadcast the query set, scan
 * the corpus once — embarrassingly parallel, no shuffle until the small
 * per-query top-k agg). Scale path: random-hyperplane LSH bucketing so each
 * query only scores its bucket(s) — same plan shape as Dedup.embeddingNearDups.
 */
object Similarity {

  // native codegen'd expressions (graft.functions.DotProduct) — semantics
  // and FP summation order identical to the aggregate/zip_with composition
  // they replaced, but fused into whole-stage codegen instead of the
  // interpreted higher-order-function path (see VectorExpressions.scala)
  def dot(a: Column, b: Column): Column = graft.functions.vfunctions.vec_dot(a, b)
  def l2norm(a: Column): Column = graft.functions.vfunctions.vec_norm(a)
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /**
   * Exact top-k neighbors for each query vector. Queries should be small
   * (broadcast); corpus is scanned once. Ties broken by corpus id so the
   * result is deterministic.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter($"corpus_id" =!= $"query_id")
      .select($"query_id", $"corpus_id", round(cosine($"cv", $"qv"), 6).as("cosine"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"corpus_id".asc)
    scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"corpus_id", $"cosine")
  }

  /**
   * Reciprocal best match between two embedding sets: pairs (a, b)
   * where b is a's nearest neighbor in B AND a is b's nearest in A —
   * the mutual-top-1 criterion of bilingual-lexicon induction and
   * cross-modal entity alignment (one-directional top-1 is noisy;
   * mutuality is the standard precision filter). Two broadcast-scan
   * top-1 passes (swap `ivfTopK` in for the candidate stage at scale)
   * joined on agreement; ties break by smaller id on both sides, so
   * the match set is deterministic.
   */
  def reciprocalBestMatch(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val ab = bruteForceTopK(b, a, idCol, vecCol, k = 1)
      .select($"query_id".as("id_a"), $"corpus_id".as("id_b"),
        $"cosine".as("cosine_ab"))
    val ba = bruteForceTopK(a, b, idCol, vecCol, k = 1)
      .select($"query_id".as("id_b"), $"corpus_id".as("id_a"),
        $"cosine".as("cosine_ba"))
    ab.join(ba, Seq("id_a", "id_b"))
      .select($"id_a", $"id_b", $"cosine_ab".as("cosine"))
  }

  /**
   * Hard-negative mining for contrastive training: for each query
   * vector, the k most-similar corpus vectors whose LABEL differs —
   * exactly the "hardest negatives" a triplet/InfoNCE batch wants. Same
   * broadcast-scan shape as [[bruteForceTopK]] (the exact baseline; at
   * scale the IVF/LSH paths supply the candidates), with the label
   * predicate pushed into the scan filter so same-label pairs never
   * reach the scorer.
   */
  def hardNegativesTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(labelCol).cast("long").as("c_label"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(labelCol).cast("long").as("q_label"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter($"corpus_id" =!= $"query_id" && $"c_label" =!= $"q_label")
      .select($"query_id", $"corpus_id", $"c_label",
        round(cosine($"cv", $"qv"), 6).as("cosine"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"corpus_id".asc)
    scored.withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"corpus_id", $"c_label", $"cosine")
  }

  /**
   * IVF-style approximate top-k: a coarse k-means quantizer (Lloyd
   * iterations, deterministic init by hashed id) partitions the corpus into
   * `nCentroids` inverted lists; each query exactly reranks only the
   * `nProbe` lists nearest to it. The scale path complement to `lshTopK`:
   * centroids are model-sized (nCentroids × dim doubles, driver/broadcast),
   * assignment and rerank are single corpus passes, and the probed fraction
   * (`nProbe / nCentroids`) directly trades recall for compute.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      kmeansIterations: Int = 5, roundCentroids: Boolean = true): DataFrame = {
    val index = buildIvfIndex(corpus, idCol, vecCol, nCentroids,
      kmeansIterations, roundCentroids)
    probeIvf(index, queries, idCol, vecCol, k, nProbe)
  }

  /** A built IVF index: the coarse quantizer (model-sized) plus the
    * assigned inverted lists (corpus-sized, distributed). */
  case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Persist an index: centroids + inverted lists as parquet, the lists
    * partitioned BY cid — a probe that touches nProbe lists reads only
    * those partitions (partition pruning on the list files). */
  def saveIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cid", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    index.assigned.write.mode("overwrite")
      .partitionBy("cid").parquet(s"$path/lists")
  }

  /**
   * Incremental index maintenance: assign NEW vectors against the frozen
   * coarse quantizer and append them to the persisted inverted lists —
   * no retraining, no rewrite of existing lists (the appended files land
   * inside their `cid=` partitions, so probes keep pruning correctly).
   * This is how a 100 TB vector index absorbs a daily embedding batch:
   * centroid drift is handled by an occasional full rebuild, not by
   * blocking ingest on one. Probing after append is IDENTICAL to having
   * assigned all vectors with these centroids in one pass (oracled by
   * `q_ann_ivf_incremental`).
   */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newVectors: DataFrame, idCol: String, vecCol: String): Unit = {
    import spark.implicits._
    val cents = loadCentroids(spark, path)
    newVectors.select(col(idCol).cast("long").as("corpus_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cid", element_at(
        graft.functions.vfunctions.vec_nearest_centroids(
          $"cv", typedLit(cents.map(_.toSeq).toSeq), 1), 1))
      .write.mode("append").partitionBy("cid").parquet(s"$path/lists")
  }

  /** The persisted coarse quantizer, cid-ordered — the ONE decoder of the
    * centroid layout, shared by load and append so they can't drift. */
  private def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .orderBy($"cid").select($"centroid").as[Seq[Double]]
      .collect().map(_.toArray)
  }

  /** Reload a persisted index for probing (build once, query many). */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    import spark.implicits._
    // restore the pre-partitionBy column order (partition cols move last)
    val lists = spark.read.parquet(s"$path/lists")
      .select($"corpus_id", $"cv", $"cid")
    IvfIndex(loadCentroids(spark, path), lists)
  }

  /** Build the index: deterministic seeded k-means + final assignment. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, kmeansIterations: Int = 5,
      roundCentroids: Boolean = true): IvfIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // eager checkpoint (r15): the projected corpus feeds the init collect,
    // every Lloyd iteration, AND the final assignment — each previously
    // re-ran the upstream scan/projection (guide §1.2 step 1). ckptSer
    // posture as in Dedup (reference-tracked blocks).
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .ckptSer()

    // deterministic init: the nCentroids vectors with smallest md5-hashed
    // id (md5 so a SQL oracle can replay the choice; id tie-break)
    var centroids: Array[Array[Double]] = c
      .orderBy(md5($"corpus_id".cast("string")), $"corpus_id")
      .limit(nCentroids)
      .select($"cv").as[Seq[Double]].collect().map(_.toArray)

    // assignment/probing by the codegen'd NearestCentroids expression:
    // squared-L2, ties by centroid index — identical semantics (and FP
    // arithmetic) to the ScalaUDF it replaced, which converted the vector
    // AND the full centroid table to Scala collections per row
    def nearestCol(v: Column, cents: Array[Array[Double]], n: Int): Column =
      graft.functions.vfunctions.vec_nearest_centroids(
        v, typedLit(cents.map(_.toSeq).toSeq), n)

    // Lloyd iterations: distributed assignment, model-sized centroid
    // update. `roundCentroids` (oracle mode, the default) rounds means to
    // 4 dp so the centroid trajectory is independent of FP summation order
    // (and replayable by a SQL oracle); at embedding scale ~0.1 the
    // quantization is far below cluster separation. Pass false for the
    // exact unrounded trajectory (recall pinned in SimilaritySpec).
    for (_ <- 0 until kmeansIterations) {
      val mean = if (roundCentroids) round(avg($"x"), 4) else avg($"x")
      val updated = c.withColumn("cid", element_at(nearestCol($"cv", centroids, 1), 1))
        .select($"cid", posexplode($"cv").as(Seq("i", "x")))
        .groupBy($"cid", $"i").agg(mean.as("m"))
        .collect()
      val byCid = updated.groupBy(_.getAs[Int]("cid"))
      centroids = centroids.indices.map { cid =>
        byCid.get(cid).map { rows =>
          val arr = new Array[Double](centroids(cid).length)
          rows.foreach(r => arr(r.getAs[Int]("i")) = r.getAs[Double]("m"))
          arr
        }.getOrElse(centroids(cid)) // empty list keeps its centroid
      }.toArray
    }

    val assigned = c.withColumn("cid", element_at(nearestCol($"cv", centroids, 1), 1))
    IvfIndex(centroids, assigned)
  }

  /** Probe a built (or reloaded) index: each query exactly reranks only
    * its `nProbe` nearest inverted lists. */
  def probeIvf(index: IvfIndex, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    def nearestCol(v: Column, cents: Array[Array[Double]], n: Int): Column =
      graft.functions.vfunctions.vec_nearest_centroids(
        v, typedLit(cents.map(_.toSeq).toSeq), n)
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cid", explode(nearestCol($"qv", index.centroids, nProbe)))

    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"corpus_id".asc)
    index.assigned.join(broadcast(q), Seq("cid"))
      .filter($"corpus_id" =!= $"query_id")
      .select($"query_id", $"corpus_id", round(cosine($"cv", $"qv"), 6).as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"corpus_id", $"cosine")
  }

  /**
   * Product-quantization codebooks: `books(s)(code)` is the `subDim`-wide
   * centroid for code `code` of subspace `s`. Model-sized
   * (numSubspaces × codebookSize × subDim doubles) — lives on the driver
   * and enters plans as literals, exactly like the IVF coarse quantizer.
   */
  case class PqCodebooks(dim: Int, subDim: Int, books: Array[Array[Array[Double]]])

  /**
   * Train product-quantization codebooks: the embedding is split into
   * `numSubspaces` contiguous slices and each slice gets its own
   * `codebookSize`-centroid k-means (same deterministic recipe as
   * [[buildIvfIndex]]: md5-ordered init, squared-L2 argmin with
   * centroid-index tie-break, 4dp-rounded means, empty clusters keep their
   * centroid — so a SQL oracle replays the full trajectory).
   *
   * All subspaces train in ONE distributed pass per Lloyd iteration: the
   * per-subspace assignment explodes into (s, cid, i, x) and a single hash
   * aggregate updates every codebook at once — iterations × 1 shuffle, not
   * iterations × numSubspaces.
   */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      numSubspaces: Int = 4, codebookSize: Int = 8,
      kmeansIterations: Int = 2): PqCodebooks = {
    require(dim % numSubspaces == 0, s"dim $dim not divisible by $numSubspaces")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / numSubspaces
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))

    // init: slices of the codebookSize md5-first vectors (one scan, every
    // subspace initialized from the same rows — the oracle slices one c0)
    val initFull: Array[Array[Double]] = c
      .orderBy(md5($"corpus_id".cast("string")), $"corpus_id")
      .limit(codebookSize)
      .select($"cv").as[Seq[Double]].collect().map(_.toArray)
    var books: Array[Array[Array[Double]]] = Array.tabulate(numSubspaces) { s =>
      initFull.map(_.slice(s * subDim, (s + 1) * subDim))
    }

    def subSlice(s: Int): Column = slice($"cv", s * subDim + 1, subDim)
    def codeCol(s: Int, bks: Array[Array[Array[Double]]]): Column =
      element_at(graft.functions.vfunctions.vec_nearest_centroids(
        subSlice(s), typedLit(bks(s).map(_.toSeq).toSeq), 1), 1)

    for (_ <- 0 until kmeansIterations) {
      val subs = array((0 until numSubspaces).map { s =>
        struct(lit(s).as("s"), codeCol(s, books).as("cid"), subSlice(s).as("sv"))
      }: _*)
      val updated = c.select(explode(subs).as("e"))
        .select($"e.s".as("s"), $"e.cid".as("cid"), posexplode($"e.sv").as(Seq("i", "x")))
        .groupBy($"s", $"cid", $"i").agg(round(avg($"x"), 4).as("m"))
        .collect()
      val byKey = updated.groupBy(r => (r.getAs[Int]("s"), r.getAs[Int]("cid")))
      books = Array.tabulate(numSubspaces) { s =>
        books(s).zipWithIndex.map { case (old, cid) =>
          byKey.get((s, cid)).map { rows =>
            val arr = new Array[Double](subDim)
            rows.foreach(r => arr(r.getAs[Int]("i")) = r.getAs[Double]("m"))
            arr
          }.getOrElse(old)
        }
      }
    }
    PqCodebooks(dim, subDim, books)
  }

  /** Encode a corpus against trained codebooks: per vector, one small int
    * code per subspace. THIS is the PQ payoff at 100 TB — the scored
    * representation is numSubspaces bytes per vector instead of dim
    * floats, so the whole index fits executor memory and the raw vectors
    * never enter the scoring join. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebooks): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val numSubspaces = cb.books.length
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val codes = array((0 until numSubspaces).map { s =>
      element_at(graft.functions.vfunctions.vec_nearest_centroids(
        slice($"cv", s * cb.subDim + 1, cb.subDim),
        typedLit(cb.books(s).map(_.toSeq).toSeq), 1), 1)
    }: _*)
    c.select($"corpus_id", codes.as("codes"))
  }

  /**
   * PQ approximate top-k by asymmetric distance computation: queries keep
   * their exact vector; each corpus vector is represented only by its
   * codes, scored as cosine(query, reconstruction) where reconstruction =
   * concat of the coded centroids. dot(q, recon) decomposes into per-
   * subspace dots against looked-up centroid literals — no corpus vector
   * is read after encoding, and the entire scoring pass is codegen'd
   * expressions over a (corpus_id, codes) table.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, numSubspaces: Int = 4,
      codebookSize: Int = 8, kmeansIterations: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb = trainPq(corpus, idCol, vecCol, dim, numSubspaces, codebookSize,
      kmeansIterations)
    val enc = pqEncode(corpus, idCol, vecCol, cb)
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))

    def cent(s: Int): Column = element_at(
      typedLit(cb.books(s).map(_.toSeq).toSeq),
      element_at($"codes", s + 1) + 1)
    def qSub(s: Int): Column = slice($"qv", s * cb.subDim + 1, cb.subDim)
    val dotSum = (0 until numSubspaces).map(s => dot(qSub(s), cent(s))).reduce(_ + _)
    val cNorm2 = (0 until numSubspaces).map(s => dot(cent(s), cent(s))).reduce(_ + _)

    val w = Window.partitionBy($"query_id").orderBy($"cosine_pq".desc, $"corpus_id".asc)
    enc.crossJoin(broadcast(q))
      .filter($"corpus_id" =!= $"query_id")
      .select($"query_id", $"corpus_id",
        round(dotSum / (l2norm($"qv") * sqrt(cNorm2)), 6).as("cosine_pq"))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"corpus_id", $"cosine_pq")
  }

  /**
   * Binary sign quantization + Hamming search — the extreme end of the
   * vector-compression family (float32 → int8 → PQ codes → 1 bit/dim):
   * each embedding collapses to sign bits packed into two longs (for
   * dim ≤ 128), and neighbor candidates rank by Hamming distance, i.e.
   * two XORs and two popcounts per pair. For random-hyperplane-ish
   * embeddings, Hamming distance is a monotone estimator of angular
   * distance; production stacks use exactly this as the cheap first-pass
   * filter before an exact rerank. Everything is integer arithmetic, so
   * the SQL oracle replays it bit-exactly.
   *
   * The packed representation is 32-dim words (weights ≤ 2³¹, so every
   * partial sum stays positive — no sign-bit/overflow divergence between
   * engines, DuckDB's checked BIGINT addition included); dims beyond the
   * vector length contribute 0.
   */
  def signBits(v: Column, lo: Int, hi: Int): Column = {
    require(hi - lo <= 32, "one packed word covers at most 32 dims")
    (lo until hi).map { i =>
      when(element_at(v, i + 1) > 0, lit(1L << (hi - 1 - i))).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def hammingTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val words = (dim + 31) / 32
    def packed(df: DataFrame, id: String) = df.select(
      col(idCol).cast("long").as(id) +:
      (0 until words).map { w =>
        signBits(col(vecCol).cast("array<double>"),
          w * 32, math.min((w + 1) * 32, dim)).as(s"${id}_b$w")
      }: _*)
    val c = packed(corpus, "corpus_id")
    val q = packed(queries, "query_id")
    val hamming = (0 until words).map { w =>
      bit_count(col(s"corpus_id_b$w").bitwiseXOR(col(s"query_id_b$w")))
    }.reduce(_ + _)
    val win = Window.partitionBy($"query_id").orderBy($"hamming".asc, $"corpus_id".asc)
    c.crossJoin(broadcast(q))
      .filter($"corpus_id" =!= $"query_id")
      .select($"query_id", $"corpus_id", hamming.cast("int").as("hamming"))
      .withColumn("rnk", row_number().over(win)).filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"corpus_id", $"hamming")
  }

  /**
   * IVF-PQ: the two scale mechanisms composed — the coarse quantizer
   * prunes each query to `nProbe` inverted lists (IVF), and within the
   * probed lists vectors are represented only by product-quantization
   * codes of their RESIDUAL (v − coarse centroid), scored by asymmetric
   * distance (PQ). This is the standard serving shape for billion-vector
   * indexes: list pruning bounds compute, residual codes bound memory
   * (numSubspaces small ints per vector), and the raw vectors appear in
   * no per-query plan at all.
   *
   * cosine(q, c_cid + recon) decomposes into literal-table lookups:
   * dot(q, c) plus per-subspace dots of q against the coded residual
   * centroids; the reconstruction norm likewise. All terms are summed in
   * a fixed subspace order so a SQL oracle reproduces the score
   * bit-for-bit after the shared 6dp rounding.
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, nCentroids: Int = 16, nProbe: Int = 8,
      numSubspaces: Int = 4, codebookSize: Int = 8, ivfIterations: Int = 3,
      pqIterations: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val idx = buildIvfIndex(corpus, idCol, vecCol, nCentroids, ivfIterations)
    val centsLit = typedLit(idx.centroids.map(_.toSeq).toSeq)
    // residuals vs the assigned coarse centroid; PQ codebooks train on the
    // residual distribution (pooled across lists, as FAISS does)
    // eager checkpoint (r15): the residual frame feeds the PQ init
    // collect, both PQ Lloyd iterations, and the code encode — each
    // previously recomputed the coarse assignment + residual subtraction
    val resid = idx.assigned.withColumn("rv",
      zip_with($"cv", element_at(centsLit, $"cid" + 1), (a, b) => a - b))
      .ckptSer()
    val cb = trainPq(resid, "corpus_id", "rv", dim, numSubspaces,
      codebookSize, pqIterations)
    def codeOf(s: Int): Column = element_at(
      graft.functions.vfunctions.vec_nearest_centroids(
        slice($"rv", s * cb.subDim + 1, cb.subDim),
        typedLit(cb.books(s).map(_.toSeq).toSeq), 1), 1)
    // the index rows a query scans: (corpus_id, cid, codes) — no vectors
    val enc = resid.select($"corpus_id", $"cid",
      array((0 until numSubspaces).map(codeOf): _*).as("codes"))

    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cid", explode(
        graft.functions.vfunctions.vec_nearest_centroids(
          $"qv", centsLit, nProbe)))

    val cCol = element_at(centsLit, $"cid" + 1)
    def rs(s: Int): Column = element_at(
      typedLit(cb.books(s).map(_.toSeq).toSeq),
      element_at($"codes", s + 1) + 1)
    def qSub(s: Int): Column = slice($"qv", s * cb.subDim + 1, cb.subDim)
    def cSub(s: Int): Column = slice(cCol, s * cb.subDim + 1, cb.subDim)
    val dotQ = (0 until numSubspaces).map(s => dot(qSub(s), rs(s)))
      .foldLeft(dot($"qv", cCol))(_ + _)
    val cr = (0 until numSubspaces).map(s => dot(cSub(s), rs(s))).reduce(_ + _)
    val rr = (0 until numSubspaces).map(s => dot(rs(s), rs(s))).reduce(_ + _)
    val reconNorm2 = dot(cCol, cCol) + lit(2.0) * cr + rr

    val w = Window.partitionBy($"query_id").orderBy($"cosine_ivfpq".desc, $"corpus_id".asc)
    enc.join(broadcast(q), Seq("cid"))
      .filter($"corpus_id" =!= $"query_id")
      .select($"query_id", $"corpus_id",
        round(dotQ / (l2norm($"qv") * sqrt(reconNorm2)), 6).as("cosine_ivfpq"))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"corpus_id", $"cosine_ivfpq")
  }

  /**
   * LSH-bucketed approximate top-k: random-hyperplane signatures with
   * `nTables` independent tables; candidates = bucket collisions in any
   * table; exact rerank within candidates. Recall grows with tables/shorter
   * signatures. This is the 100 TB path: each query scores only its
   * candidate set, never the full corpus.
   */
  /** Seeded random-hyperplane tables, shared between `lshTopK` and the SQL
    * oracle generator (same constants → the oracle replays the bucketing). */
  def lshTables(dim: Int, bitsPerTable: Int, nTables: Int,
      seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(nTables)(Seq.fill(bitsPerTable)(Seq.fill(dim)(rng.nextGaussian())))
  }

  /**
   * Recall@k of an approximate neighbor result against exact ground
   * truth — THE quality metric of the ANN trade-off (probe fewer lists,
   * lose how much?). Inputs are any two (query_id, rnk, corpus_id)
   * frames from the topK family (brute force as truth, IVF/PQ/LSH/
   * Hamming as the approximation); per query:
   *
   *   recall = |approx∩truth within rnk ≤ k| / |truth within rnk ≤ k|
   *
   * The denominator is the truth's actual row count (≤ k — boundary
   * queries near the corpus edge have fewer than k neighbors), so a
   * perfect approximation always scores 1.0. Query-keyed equi-joins
   * only: both inputs are k-rows-per-query frames, so this costs nothing
   * next to the searches themselves.
   */
  def annRecallAtK(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = truth.sparkSession
    import spark.implicits._
    val tq = truth.filter($"rnk" <= k).select($"query_id", $"corpus_id")
    val aq = approx.filter($"rnk" <= k).select($"query_id", $"corpus_id")
    val hits = tq.join(aq, Seq("query_id", "corpus_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("n_hits"))
    tq.groupBy($"query_id").agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("query_id"), "left")
      .select($"query_id", $"n_truth",
        coalesce($"n_hits", lit(0L)).as("n_hits"),
        round(coalesce($"n_hits", lit(0L)) / $"n_truth" + lit(1e-9), 6)
          .as("recall"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, bitsPerTable: Int = 8,
      nTables: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val tables = lshTables(dim, bitsPerTable, nTables, seed)

    def sigs(v: Column): Column = array(tables.zipWithIndex.map { case (planes, ti) =>
      struct(lit(ti).as("table"),
        concat_ws("", planes.map { p =>
          when(dot(v, typedLit(p)) > 0, lit("1")).otherwise(lit("0"))
        }: _*).as("bucket"))
    }: _*)

    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .select($"corpus_id", $"cv", explode(sigs($"cv")).as("sig"))
      .select($"corpus_id", $"cv", $"sig.table".as("table"), $"sig.bucket".as("bucket"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .select($"query_id", $"qv", explode(sigs($"qv")).as("sig"))
      .select($"query_id", $"qv", $"sig.table".as("table"), $"sig.bucket".as("bucket"))

    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter($"corpus_id" =!= $"query_id")
      .select($"query_id", $"corpus_id", $"cv", $"qv")
      .dropDuplicates("query_id", "corpus_id")

    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"corpus_id".asc)
    cand.select($"query_id", $"corpus_id", round(cosine($"cv", $"qv"), 6).as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"corpus_id", $"cosine")
  }
}
