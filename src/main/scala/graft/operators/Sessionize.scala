package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch gap-based sessionization — the backfill twin of the streaming
 * sessionizer (streaming/EventsStream.sessionize): a new session starts
 * whenever the gap to the key's previous event exceeds `gapMs`.
 *
 * One shuffle on the key; the lag flag and its running sum share the same
 * window specification, so Catalyst evaluates both in a single sort pass.
 * Session ids are per-key 0-based sequence numbers: data-derived, so the
 * assignment is deterministic under any input partitioning (ties in the
 * timestamp can permute rows within a session but never move a row across
 * sessions — a tied row's gap is 0 regardless of tie order).
 */
object Sessionize {

  /**
   * First-order Markov transition matrix over per-key event sequences:
   * P(next = b | current = a) from consecutive (ts, id)-ordered event
   * pairs — the user-journey summary behind flow diagrams and
   * next-step prediction baselines. One key-partitioned lead window +
   * one (from, to)-keyed aggregate; row-probabilities via a
   * from-keyed window over the state-space-sized result. 6dp rounds.
   */
  def markovTransitions(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, stateCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val pairs = df
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter($"__next".isNotNull)
      .groupBy(col(stateCol).as("from_state"), $"__next".as("to_state"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy($"from_state")
    pairs.withColumn("p", round($"n" / sum($"n").over(rowTotal), 6))
  }

  /** Appends `session_seq` (0-based per key) to `df`. */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val ms = unix_millis(col(tsCol))
    val prev = lag(ms, 1).over(w)
    val newSession = when(prev.isNull || ms - prev > gapMs, 1).otherwise(0)
    df.withColumn("session_seq",
      (sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
        .cast("long"))
  }

  /**
   * Ordered funnel per key: how far through `steps` (an ordered list of
   * event types) each key progressed, where step i+1 must occur strictly
   * AFTER the key's earliest completion of step i. One aggregate per step
   * level over a single key-grouped pass: stage k's timestamp is
   * min(ts of step k events later than stage k−1's timestamp) — a
   * conditional-min chain, no self-joins, no per-key sort. Returns
   * (key, funnel_stage) with stage ∈ [0, steps.length].
   */
  def funnelStages(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("key"))
    val base = df.select(col(keyCol).as("key"), col(typeCol).as("t"),
      unix_millis(col(tsCol)).as("ms"))
    // stage timestamps as a chain of per-key window mins over the SAME
    // unordered partition spec: one shuffle on the key, every level reuses
    // it, and the final groupBy(key) also reuses it (no second exchange).
    // s_i = min ms of step-i events strictly later than s_{i-1}; a missing
    // earlier stage nulls the condition, so progression stops — exactly
    // the ordered-funnel semantics.
    val staged = steps.indices.foldLeft(base) { (acc, i) =>
      val cond =
        if (i == 0) col("t") === steps.head
        else col("t") === steps(i) && col("ms") > col(s"s${i - 1}")
      acc.withColumn(s"s$i", min(when(cond, col("ms"))).over(w))
    }
    val firsts = steps.indices.map(i => first(col(s"s$i")).as(s"s$i"))
    // ascending fold so the DEEPEST stage's check ends up outermost:
    // when(s_last, n)...otherwise(when(s_0, 1).otherwise(0))
    val stage = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"s$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    staged.groupBy(col("key"))
      .agg(firsts.head, firsts.tail: _*)
      .select(col("key").as(keyCol), stage.as("funnel_stage"))
  }

  /**
   * Cohort retention: keys are cohorted by the period of their FIRST
   * event (period = floor((ms − epoch0) / periodMs)), and each
   * (cohort, offset) cell counts keys still active `offset` periods
   * later. Two key-grouped aggregates plus a distinct — every shuffle
   * keyed by the key or the (small) cohort grid; the classic
   * activity-matrix query at any scale. Returns
   * (cohort_period, period_offset, n_keys).
   */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String,
      epoch0Ms: Long, periodMs: Long): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    val ev = df.select(col(keyCol).as("key"),
      floor((unix_millis(col(tsCol)) - lit(epoch0Ms)) / lit(periodMs)).as("period"))
    val cohorts = ev.groupBy(col("key")).agg(min(col("period")).as("cohort_period"))
    ev.distinct()
      .join(cohorts, "key")
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /**
   * Event-sequence pattern matching (MATCH_RECOGNIZE-lite / the core of
   * complex-event processing): each key's events are serialized in
   * (ts, id) order into a code string via `codes` (event type → one
   * char), and `pattern` — a regex over those codes, e.g. `v[ce]*p` for
   * "a view leading through clicks/errors to a purchase" — is counted
   * non-overlapping left-to-right (the semantics both regex engines
   * share).
   *
   * Scale shape: ONE key shuffle; the per-key state is the code string
   * (one byte per event — the same order of memory a session window
   * would hold), built as a hash aggregate via sort_array(collect_list)
   * rather than a window sort. Event types outside `codes` are dropped
   * before the aggregate, so the string only holds pattern-relevant
   * events. Returns (key, n_events, seq_len, n_matches, matched).
   */
  def eventPatternCounts(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, idCol: String, codes: Map[String, String],
      pattern: String): DataFrame = {
    require(codes.values.forall(_.length == 1), "codes must map to single chars")
    val spark = df.sparkSession
    import spark.implicits._
    val code = codes.foldLeft(lit(null).cast("string")) { case (acc, (t, c)) =>
      when(col(typeCol) === t, lit(c)).otherwise(acc)
    }
    df.select(col(keyCol).as("key"), code.as("c"),
        col(tsCol).cast("timestamp").as("ts"), col(idCol).cast("long").as("id"))
      .filter($"c".isNotNull)
      .groupBy($"key")
      .agg(count(lit(1)).as("n_events"),
        concat_ws("", transform(
          array_sort(collect_list(struct($"ts", $"id", $"c"))),
          s => s.getField("c"))).as("seq"))
      .select($"key", $"n_events", length($"seq").as("seq_len"),
        size(regexp_extract_all($"seq", lit(pattern), lit(0))).as("n_matches"))
      .withColumn("matched", $"n_matches" > 0)
  }

  /**
   * Frequent 3-step journey mining: the top-k most common consecutive
   * (state → state → state) paths across all keys — the sequence
   * summary one level deeper than `markovTransitions`' pair matrix.
   * Two leads over one key-partitioned window (same sort), one path
   * aggregate, top-k by (count desc, path asc).
   */
  def frequentPaths3(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, stateCol: String, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.withColumn("__s2", lead(col(stateCol), 1).over(w))
      .withColumn("__s3", lead(col(stateCol), 2).over(w))
      .filter($"__s3".isNotNull)
      .groupBy(concat_ws(">", col(stateCol), $"__s2", $"__s3").as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path".asc)
      .limit(topK)
  }

  /**
   * Behavioral-similarity pairs: users whose coded event SEQUENCES are
   * close in edit distance — "who behaves like whom" for cohorting and
   * bot-ring detection. Candidates are blocked by sequence-length BAND
   * (edit distance ≥ length difference, so pairs beyond the band can't
   * reach the similarity floor — the block is a correctness-preserving
   * prune, not an approximation) and adjacent bands are included for
   * boundary pairs. similarity = 1 − dist/max(len); pairs at or above
   * `minSimilarity` survive. Never a global cross join: band-keyed
   * equi-join only, with per-band population bounded by the band
   * construction.
   */
  def behaviorSimilarity(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, idCol: String, codes: Map[String, String],
      minSimilarity: Double): DataFrame = {
    require(minSimilarity > 0 && minSimilarity < 1, "minSimilarity in (0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    val code = codes.foldLeft(lit(null).cast("string")) { case (acc, (t, c)) =>
      when(col(typeCol) === t, lit(c)).otherwise(acc)
    }
    val seqs = df.select(col(keyCol).cast("long").as("key"), code.as("c"),
        col(tsCol).cast("timestamp").as("ts"), col(idCol).cast("long").as("id"))
      .filter($"c".isNotNull)
      .groupBy($"key")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct($"ts", $"id", $"c"))),
        s => s.getField("c"))).as("seq"))
      .withColumn("len", length($"seq"))
    // length blocking with an EXACT integer bound: edit distance is at
    // least the length difference, so sim >= s forces
    // |lenA - lenB| <= (1-s)·maxSeqLen; one side explodes its length
    // into that ±delta window and the join is a plain integer equi-join
    // — a complete, float-free prune (delta is corpus-bounded: coded
    // session sequences, not documents)
    val maxLen = seqs.agg(max($"len")).head().getInt(0)
    val delta = math.ceil((1 - minSimilarity) * maxLen).toInt
    val a = seqs.select($"key".as("id_a"), $"seq".as("seq_a"), $"len".as("len_a"))
    val b = seqs.select($"key".as("id_b"), $"seq".as("seq_b"), $"len".as("len_b"))
      .withColumn("len_a", explode(array(
        (-delta to delta).map(o => $"len_b" + o): _*)))
    a.join(b, Seq("len_a"))
      .filter($"id_a" < $"id_b")
      .withColumn("dist", levenshtein($"seq_a", $"seq_b"))
      .withColumn("similarity",
        round(lit(1.0) - $"dist" / greatest($"len_a", $"len_b"), 6))
      .filter($"similarity" >= minSimilarity)
      .select($"id_a", $"id_b", $"len_a", $"len_b", $"dist", $"similarity")
  }
}
