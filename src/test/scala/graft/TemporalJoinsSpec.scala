package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** Edge-case pins for the temporal joins: no-match nulls, equal-timestamp
  * ties, same-(key, ts) right duplicates, and interval boundary inclusion
  * across bin borders. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join keeps left payload columns out of the window (slim shuffle)") {
    // wide-table posture: only the distinct (keys, ts) probe points may
    // ride the union+window sort — payload columns equi-join back after
    val left = Seq((1L, "a", 10L, "payload-x", 3.14))
      .toDF("id", "k", "ts", "wide_payload_str", "wide_payload_num")
    val right = Seq(("a", 5L, 1.0)).toDF("k", "rts", "v")
    val joined = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
    val windows = joined.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty, "expected a Window in the asof plan")
    windows.foreach { w =>
      val carried = w.child.output.map(_.name).toSet
      assert(!carried.exists(_.startsWith("wide_payload")),
        s"payload columns rode the window sort: $carried")
      assert(!carried.contains("id"), s"non-key left columns rode the window: $carried")
    }
    // and the result is still right
    val row = joined.select($"id", $"right_v").collect().head
    assert(row.getLong(0) == 1L && row.getDouble(1) == 1.0)
  }

  test("asof join picks latest right row at or before each left row") {
    val left = Seq(
      (1L, "a", 100L), // after both right rows for a
      (2L, "a", 15L),  // between the two
      (3L, "a", 5L),   // before any -> null
      (4L, "b", 50L),  // other key
      (5L, "c", 50L)   // key with no right rows -> null
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("a", 10L, 1.0),
      ("a", 20L, 2.0),
      ("b", 50L, 3.0) // equal timestamp: counts as "at or before"
    ).toDF("k", "rts", "v")

    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("rts", "v"))
      .orderBy($"id")
      .select($"id", $"right_rts", $"right_v")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))

    assert(out.toSeq == Seq(
      (1L, Some(20L), Some(2.0)),
      (2L, Some(10L), Some(1.0)),
      (3L, None, None),
      (4L, Some(50L), Some(3.0)),
      (5L, None, None)))
  }

  test("asof join never matches null keys to each other") {
    val left = Seq((1L, Option.empty[String], 10L), (2L, Option("a"), 10L))
      .toDF("id", "k", "ts")
    val right = Seq((Option.empty[String], 5L, 1.0), (Option("a"), 5L, 2.0))
      .toDF("k", "rts", "v")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .orderBy($"id").select($"right_v").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(2.0)))
  }

  test("asof join treats null timestamps as no-match on either side") {
    val left = Seq((1L, "a", Option(10L)), (2L, "a", Option.empty[Long]))
      .toDF("id", "k", "ts")
    val right = Seq(("a", Option(5L), 1.0), ("a", Option.empty[Long], 99.0))
      .toDF("k", "rts", "v")
    val back = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .orderBy($"id").select($"right_v").collect().map(r => Option(r.get(0)))
    assert(back.toSeq == Seq(Some(1.0), None))
    val fwd = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
        direction = "forward")
      .orderBy($"id").select($"right_v").collect().map(r => Option(r.get(0)))
    assert(fwd.toSeq == Seq(None, None)) // no right row at/after ts=10; null ts no match
  }

  test("range join excludes malformed (hi < lo) intervals instead of crashing") {
    val points = Seq((1L, "a", 10L)).toDF("pid", "k", "pt")
    val intervals = Seq(("a", 5L, 15L, 1L), ("a", 100L, 50L, 2L))
      .toDF("k", "lo", "hi", "iid")
    val out = TemporalJoins.rangeJoinBinned(points, intervals, Seq("k"),
      "pt", "lo", "hi", binWidth = 10L).select($"iid").as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }

  test("forward asof join picks earliest right row at or after each left row") {
    val left = Seq(
      (1L, "a", 5L),   // before both -> rts 10
      (2L, "a", 15L),  // between -> rts 20
      (3L, "a", 20L),  // equal timestamp counts
      (4L, "a", 25L),  // after all -> null
      (5L, "c", 5L)    // no right rows -> null
    ).toDF("id", "k", "ts")
    val right = Seq(("a", 10L, 1.0), ("a", 20L, 2.0)).toDF("k", "rts", "v")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("rts", "v"), direction = "forward")
      .orderBy($"id")
      .select($"id", $"right_rts").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    assert(out.toSeq == Seq(
      (1L, Some(10L)), (2L, Some(20L)), (3L, Some(20L)), (4L, None), (5L, None)))
  }

  test("nearest asof picks the closer side, ties backward, tolerance bounds both") {
    val left = Seq(
      (1L, "a", 12L),  // dist 2 back (10), 8 fwd (20) -> backward 10
      (2L, "a", 18L),  // dist 8 back, 2 fwd -> forward 20
      (3L, "a", 15L),  // tie (5 both ways) -> backward 10
      (4L, "a", 20L),  // exact hit -> backward 20 at distance 0
      (5L, "a", 100L), // back dist 80 > tol, no fwd -> null
      (6L, "b", 7L)    // no right rows for key b -> null
    ).toDF("id", "k", "ts")
    val right = Seq(("a", 10L, 1.0), ("a", 20L, 2.0)).toDF("k", "rts", "v")
    val out = TemporalJoins.asofJoinNearest(left, right, Seq("k"), "ts", "rts",
        Seq("rts", "v"), toleranceMs = Some(50L))
      .orderBy($"id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("right_rts"))),
        Option(r.getAs[String]("asof_dir"))))
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some("backward")),
      (2L, Some(20L), Some("forward")),
      (3L, Some(10L), Some("backward")),
      (4L, Some(20L), Some("backward")),
      (5L, None, None),
      (6L, None, None)), out.toSeq)
  }

  test("nearest asof falls forward when only backward violates tolerance") {
    val left = Seq((1L, "a", 95L)).toDF("id", "k", "ts")
    val right = Seq(("a", 10L, 1.0), ("a", 101L, 2.0)).toDF("k", "rts", "v")
    val out = TemporalJoins.asofJoinNearest(left, right, Seq("k"), "ts", "rts",
      Seq("rts", "v"), toleranceMs = Some(20L)).collect()
    assert(out.head.getAs[Long]("right_rts") == 101L)
    assert(out.head.getAs[String]("asof_dir") == "forward")
  }

  test("asof join breaks same-(key, ts) right duplicates by rightOrder") {
    val left = Seq((1L, "a", 10L)).toDF("id", "k", "ts")
    val right = Seq(("a", 10L, 7L, 1.0), ("a", 10L, 9L, 2.0), ("a", 10L, 8L, 3.0))
      .toDF("k", "rts", "rid", "v")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("rid", "v"), rightOrder = Some("rid")).collect()
    assert(out.head.getAs[Long]("right_rid") == 9L)
    assert(out.head.getAs[Double]("right_v") == 2.0)
  }

  test("range join includes both boundaries and crosses bin borders") {
    // bin width 10: interval [8, 21] spans bins 0..2
    val points = Seq((1L, "a", 7L), (2L, "a", 8L), (3L, "a", 15L),
      (4L, "a", 21L), (5L, "a", 22L), (6L, "b", 15L)).toDF("pid", "k", "pt")
    val intervals = Seq(("a", 8L, 21L, 100L)).toDF("k", "lo", "hi", "iid")
    val out = TemporalJoins.rangeJoinBinned(points, intervals, Seq("k"),
        "pt", "lo", "hi", binWidth = 10L)
      .select($"pid").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 3L, 4L))
  }

  test("nearest asof matches a naive driver-side computation on random data") {
    val rng = new scala.util.Random(23)
    val left = Seq.tabulate(200)(i =>
      (i.toLong, s"k${rng.nextInt(4)}", rng.nextInt(500).toLong)).toDF("id", "k", "ts")
    val rightRows = Seq.tabulate(80)(i =>
      (s"k${rng.nextInt(4)}", rng.nextInt(500).toLong, i.toLong))
    val right = rightRows.toDF("k", "rts", "rid")
    val tol = 60L

    val fast = TemporalJoins.asofJoinNearest(left, right, Seq("k"), "ts", "rts",
        Seq("rts", "rid"), rightOrder = Some("rid"), toleranceMs = Some(tol))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(r.fieldIndex("right_rid"))).map(_.asInstanceOf[Long]),
          Option(r.getAs[String]("asof_dir")))).toMap

    val byKey = rightRows.groupBy(_._1)
    def naive(k: String, ts: Long): (Option[Long], Option[String]) = {
      val rs = byKey.getOrElse(k, Nil)
      // backward: max (rts <= ts), ties by max rid; forward: min (rts > ts),
      // ties by min rid — the operator's documented conventions
      val b = rs.filter(_._2 <= ts).sortBy(r => (r._2, r._3)).lastOption
      val f = rs.filter(_._2 > ts).sortBy(r => (r._2, r._3)).headOption
      val bOk = b.exists(r => ts - r._2 <= tol)
      val fOk = f.exists(r => r._2 - ts <= tol)
      if (bOk && (!fOk || ts - b.get._2 <= f.get._2 - ts))
        (Some(b.get._3), Some("backward"))
      else if (fOk) (Some(f.get._3), Some("forward"))
      else (None, None)
    }
    val expected = left.collect().map(r =>
      r.getLong(0) -> naive(r.getString(1), r.getLong(2))).toMap
    assert(fast.size == 200 && fast == expected)
  }

  test("mergeIntervals matches a naive sweep merge on random data") {
    val rng = new scala.util.Random(31)
    val ivRows = Seq.tabulate(300) { _ =>
      val lo = rng.nextInt(900).toLong
      (s"k${rng.nextInt(5)}", lo, lo + rng.nextInt(60).toLong)
    }
    val got = TemporalJoins.mergeIntervals(ivRows.toDF("k", "lo", "hi"), "k", "lo", "hi")
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getInt(4)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq).toMap
    val expected = ivRows.groupBy(_._1).view.mapValues { rs =>
      val sorted = rs.map(r => (r._2, r._3)).sortBy(identity)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
      sorted.foreach { case (lo, hi) =>
        if (out.nonEmpty && lo <= out.last._2) {
          val (mlo, mhi, n) = out.remove(out.size - 1)
          out += ((mlo, math.max(mhi, hi), n + 1))
        } else out += ((lo, hi, 1))
      }
      out.toSeq
    }.toMap
    assert(got == expected)
  }

  test("asof join matches a naive join+window implementation on random data") {
    val rng = new scala.util.Random(5)
    val left = Seq.tabulate(200)(i =>
      (i.toLong, s"k${rng.nextInt(4)}", rng.nextInt(500).toLong)).toDF("id", "k", "ts")
    val right = Seq.tabulate(80)(i =>
      (s"k${rng.nextInt(4)}", rng.nextInt(500).toLong, i.toLong)).toDF("k", "rts", "rid")

    val fast = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("rid"), rightOrder = Some("rid"))
      .select($"id", $"right_rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    // naive: all qualifying right rows, keep max (rts, rid), left-join back
    // so left rows with no qualifying match keep a null
    val matches = left.join(right, Seq("k"))
      .filter($"rts" <= $"ts")
      .groupBy($"id")
      .agg(max(struct($"rts", $"rid")).as("m"))
      .select($"id", $"m.rid".as("rid"))
    val naive = left.select($"id").join(matches, Seq("id"), "left")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    assert(fast.size == 200 && fast == naive)
  }

  test("range join matches the naive non-equi join on random data") {
    val rng = new scala.util.Random(11)
    val points = Seq.tabulate(300)(i =>
      (i.toLong, s"k${rng.nextInt(5)}", rng.nextInt(1000).toLong))
      .toDF("pid", "k", "pt")
    val intervals = Seq.tabulate(60) { i =>
      val lo = rng.nextInt(950).toLong
      (s"k${rng.nextInt(5)}", lo, lo + rng.nextInt(120).toLong, i.toLong)
    }.toDF("k", "lo", "hi", "iid")

    val binned = TemporalJoins.rangeJoinBinned(points, intervals, Seq("k"),
        "pt", "lo", "hi", binWidth = 64L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("k"))
      .filter($"lo" <= $"pt" && $"pt" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(binned == naive && naive.nonEmpty)
  }

  test("Merge.upsert: update wins, new key inserts, untouched rows carry forward") {
    import graft.operators.Merge
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "bal", "seg")
    // partial-column update: no "seg" column → seg carried from base everywhere
    val updates = Seq((2L, 99.0), (9L, 1.0)).toDF("k", "bal")
    val out = Merge.upsert(base, updates, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)).orNull))
    assert(out.toSeq == Seq(
      (1L, 10.0, "a"),   // untouched
      (2L, 99.0, "b"),   // updated bal, carried seg
      (3L, 30.0, "c"),   // untouched
      (9L, 1.0, null)))  // inserted; non-updatable column absent → null
  }

  test("asofJoinTolerance nulls matches older than the bound, keeps the row") {
    import graft.operators.TemporalJoins
    val left = Seq((1L, 100L), (2L, 1000L)).toDF("k", "ms")
      .select($"k", timestamp_millis($"ms").as("ts"))
    val right = Seq((1L, 90L, 7.0), (2L, 100L, 9.0)).toDF("k", "ms", "v")
      .select($"k", timestamp_millis($"ms").as("ts"), $"v")
    val out = TemporalJoins.asofJoinTolerance(left, right, Seq("k"),
        "ts", "ts", Seq("v"), toleranceMs = 50L)
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // k=1: 10ms stale → within 50ms; k=2: 900ms stale → nulled, row kept
    assert(out.toSeq == Seq((1L, Some(7.0)), (2L, None)))
    // the right_ts carrier column is dropped when not requested
    assert(!TemporalJoins.asofJoinTolerance(left, right, Seq("k"),
      "ts", "ts", Seq("v"), 50L).columns.contains("right_ts"))
  }

  test("Merge.scd2: updates close the current version and append a new one") {
    import graft.operators.Merge
    val history = Seq(
      (1L, 10.0, 0L, Some(100L)), // closed old version of key 1
      (1L, 11.0, 100L, None),     // current version of key 1
      (2L, 20.0, 0L, None))       // current version of key 2 (untouched)
      .toDF("k", "bal", "valid_from_ms", "valid_to_ms")
    val updates = Seq((1L, 12.0, 500L)).toDF("k", "bal", "ts")
    val out = Merge.scd2(history, updates, "k", "ts")
      .orderBy($"k", $"valid_from_ms").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      (1L, 10.0, 0L, Some(100L)),  // closed history untouched
      (1L, 11.0, 100L, Some(500L)),// current closed at update ts
      (1L, 12.0, 500L, None),      // new open version
      (2L, 20.0, 0L, None)))       // untouched key stays open
  }

  test("Merge.versionedUpsert: newer wins, stale is a no-op, NULL honored, " +
      "apply order can't change the converged snapshot") {
    import graft.operators.Merge
    val base = Seq(
      (1L, 100L, 5L, Option("a")),  // will be beaten by v200
      (2L, 100L, 5L, Option("b")),  // update is STALE (v50) → keeps base
      (3L, 100L, 5L, Option("c")))  // same version, higher tie → update wins
      .toDF("k", "v", "tie", "payload")
    val updates = Seq(
      (1L, 200L, 1L, Option.empty[String]), // newer + explicit NULL payload
      (2L, 50L, 9L, Option("stale")),
      (3L, 100L, 7L, Option("c2")),
      (4L, 10L, 1L, Option("new")))         // insert
      .toDF("k", "v", "tie", "payload")
    val out = Merge.versionedUpsert(base, updates, "k", "v", "tie")
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getString(3))))
    assert(out.toSeq == Seq(
      (1L, 200L, 1L, None),        // newer version, NULL overwrites
      (2L, 100L, 5L, Some("b")),   // stale update ignored
      (3L, 100L, 7L, Some("c2")),  // tie-break on tie column
      (4L, 10L, 1L, Some("new")))) // insert

    // NULL versions sort oldest: a NULL-versioned update still inserts a
    // missing key, but never beats an existing row — and no phantom
    // all-null row appears for the inserted key
    val nullV = Seq(
      (1L, Option.empty[Long], 1L, Option("ghost")),   // stale vs base v100
      (9L, Option.empty[Long], 1L, Option("inserted"))) // new key
      .toDF("k", "v", "tie", "payload")
    val nOut = Merge.versionedUpsert(
        base.select($"k", $"v".cast("long").as("v"), $"tie", $"payload"),
        nullV, "k", "v", "tie")
      .orderBy($"k").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(3)) None else Some(r.getString(3))))
    assert(nOut.toSeq == Seq(
      (1L, Some(100L), Some("a")),   // NULL update loses to v100
      (2L, Some(100L), Some("b")),
      (3L, Some(100L), Some("c")),
      (9L, None, Some("inserted")))) // NULL insert lands whole, not phantom

    // order independence: applying two disjoint-in-time batches in either
    // order converges to the same snapshot
    val early = Seq((7L, 1L, 1L, Option("old"))).toDF("k", "v", "tie", "payload")
    val late = Seq((7L, 9L, 1L, Option("new"))).toDF("k", "v", "tie", "payload")
    val empty = base.filter($"k" < 0)
    val ab = Merge.versionedUpsert(
      Merge.versionedUpsert(empty, early, "k", "v", "tie"), late, "k", "v", "tie")
    val ba = Merge.versionedUpsert(
      Merge.versionedUpsert(empty, late, "k", "v", "tie"), early, "k", "v", "tie")
    assert(ab.collect().toSeq == ba.collect().toSeq)
    assert(ab.select($"payload").as[String].head() == "new")
  }

  test("gapFillForwardDaily: complete per-key spine, carried values, observed flags") {
    import graft.operators.TimeSeries
    val daily = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-04", 20.0), // 2-day gap
      (2L, "2024-01-02", 5.0))                            // single observation
      .toDF("k", "d", "v")
      .select($"k", to_date($"d").as("d"), $"v")
    val out = TimeSeries.gapFillForwardDaily(daily, "k", "d", "v")
      .orderBy($"k", $"d")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", 10.0, true),
      (1L, "2024-01-02", 10.0, false), // carried forward
      (1L, "2024-01-03", 10.0, false),
      (1L, "2024-01-04", 20.0, true),  // real observation replaces the carry
      (2L, "2024-01-02", 5.0, true)))  // no gap → spine is the observation
  }

  test("ohlcBars: hand-computed bars, ts ties broken by id") {
    import graft.operators.TimeSeries
    val rows = Seq(
      // user 1, hour 10: open=first by ts (3.0), close=last (1.0)
      (1L, "2024-01-01 10:05:00", 100L, 3.0),
      (1L, "2024-01-01 10:20:00", 101L, 9.0),
      (1L, "2024-01-01 10:50:00", 102L, 1.0),
      // user 1, hour 11: single row — all four edges equal
      (1L, "2024-01-01 11:10:00", 103L, 7.0),
      // user 2, hour 10: ts tie — open is the smaller event_id
      (2L, "2024-01-01 10:30:00", 201L, 4.0),
      (2L, "2024-01-01 10:30:00", 200L, 6.0)
    ).toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
    val got = TimeSeries.ohlcBars(rows, "user_id", "ts", "event_id", "value")
      .orderBy($"key", $"bucket_start").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1L, 3.0, 9.0, 1.0, 1.0, 3L),
      (1L, 7.0, 7.0, 7.0, 7.0, 1L),
      (2L, 6.0, 6.0, 4.0, 4.0, 2L)), got.toSeq)
  }
}
