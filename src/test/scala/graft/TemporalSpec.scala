package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.TemporalOps

/** Unit tests for the temporal join operators on tiny literal fixtures:
  * tie semantics, no-match NULLs, band boundaries, bucket crossings. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("eventDeltas yields per-key inter-arrival seconds, null on first event") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:00:45")),
      (1L, 12L, ts("2024-01-01 10:02:00")),
      (2L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val out = graft.ops.WindowOps.eventDeltas("user_id", "ts",
      tieBreak = Seq("event_id"))(events)
      .select("event_id", "delta_seconds").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out === Map(10L -> None, 11L -> Some(45L), 12L -> Some(75L),
      20L -> None))
  }

  test("asOfJoin attaches latest right row at or before left time") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after two signups -> latest wins
      (2L, 10L, ts("2024-01-01 08:30:00")), // between the two
      (3L, 10L, ts("2024-01-01 07:00:00")), // before any -> nulls
      (4L, 20L, ts("2024-01-01 09:00:00"))  // exact tie -> inclusive
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 08:00:00"), 1.0),
      (101L, 10L, ts("2024-01-01 09:00:00"), 2.0),
      (102L, 20L, ts("2024-01-01 09:00:00"), 3.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TemporalOps.asOfJoin(right, "user_id", "ts", "ts",
      Seq("event_id", "value"), "event_id")(left)
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out === Set(
      (1L, 101L, 2.0), (2L, 100L, 1.0), (3L, -1L, -1.0), (4L, 102L, 3.0)))
  }

  test("asOfJoin breaks equal-timestamp right ties by tieBreak, later wins") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (5L, 1L, ts("2024-01-01 09:00:00"), 5.0),
      (9L, 1L, ts("2024-01-01 09:00:00"), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TemporalOps.asOfJoin(right, "user_id", "ts", "ts",
      Seq("event_id", "value"), "event_id")(left)
      .select("asof_event_id").as[Long].collect()
    assert(out.toSeq === Seq(9L))
  }

  test("asOfJoin tie-break is numeric, not lexicographic, and ignores null-ts right rows") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (9L, 1L, Some(ts("2024-01-01 09:00:00")), 9.0),
      (10L, 1L, Some(ts("2024-01-01 09:00:00")), 10.0), // 10 > 9 numerically
      (99L, 1L, None, 99.0) // null ts must never match
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TemporalOps.asOfJoin(right, "user_id", "ts", "ts",
      Seq("event_id", "value"), "event_id")(left)
      .select("asof_event_id").as[Long].collect()
    assert(out.toSeq === Seq(10L))
  }

  test("eventTransitions: in-user pairs, conditional probabilities, edge users") {
    import graft.ops.WindowOps
    // u1: a -> b -> a -> c (pairs a→b, b→a, a→c)
    // u2: a -> b            (pair a→b)
    // u3: single event — no successor, vanishes entirely
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a", 1L),
      (1L, ts("2024-01-01 09:01:00"), "b", 2L),
      (1L, ts("2024-01-01 09:02:00"), "a", 3L),
      (1L, ts("2024-01-01 09:03:00"), "c", 4L),
      (2L, ts("2024-01-01 09:00:00"), "a", 5L),
      (2L, ts("2024-01-01 09:05:00"), "b", 6L),
      (3L, ts("2024-01-01 09:00:00"), "z", 7L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = WindowOps.eventTransitions("user_id", "ts", "event_type",
      tieBreak = Seq("event_id"))(ev)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out === Seq(("a", "b", 2L, 2.0 / 3), ("a", "c", 1L, 1.0 / 3),
      ("b", "a", 1L, 1.0)))
    // conditional probabilities sum to 1 per from_type
    val sums = WindowOps.eventTransitions("user_id", "ts", "event_type",
      tieBreak = Seq("event_id"))(ev)
      .groupBy("from_type").agg(sum("p").as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
    // pairs never cross users: z (u3) and c (u1-final) emit nothing
    assert(!out.exists(t => t._1 == "z" || t._1 == "c"))
    // r13 ADVICE: a NULL-ts event must NOT fabricate transition pairs
    // (it used to sort nulls-first and splice into the journey)
    val withNull = ev.unionByName(Seq(
      (1L, Option.empty[java.sql.Timestamp], "x", 9L))
      .toDF("user_id", "ts", "event_type", "event_id"))
    val out2 = WindowOps.eventTransitions("user_id", "ts", "event_type",
      tieBreak = Seq("event_id"))(withNull)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out2 === out.toSeq) // identical matrix — NULL-ts row inert
  }

  test("activityProfile: arithmetic dow/hour, shares per key, NULL drop") {
    import graft.ops.WindowOps
    // 2024-01-01 was a MONDAY -> dow 0; 2024-01-06 a Saturday -> dow 5
    val ev = Seq(
      (Some(ts("2024-01-01 09:15:00")), "a"),
      (Some(ts("2024-01-01 09:45:00")), "a"), // same (0, 9) cell
      (Some(ts("2024-01-06 23:05:00")), "a"),
      (Some(ts("2024-01-01 00:00:00")), "b"), // midnight edge -> hour 0
      (None, "a")
    ).toDF("ts", "k")
    val out = WindowOps.activityProfile("k", "ts")(ev)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out(("a", 0, 9)) === (2L, 2.0 / 3))
    assert(out(("a", 5, 23)) === (1L, 1.0 / 3))
    assert(out(("b", 0, 0)) === (1L, 1.0))
    assert(out.size === 3)
  }

  test("burstiness: metronome vs bursty, exact sufficient statistics, edge users") {
    import graft.ops.WindowOps
    val ev = Seq(
      // u1 metronome: gaps 60, 60, 60 -> cv 0 -> B = -1
      (1L, ts("2024-01-01 09:00:00"), 1L), (1L, ts("2024-01-01 09:01:00"), 2L),
      (1L, ts("2024-01-01 09:02:00"), 3L), (1L, ts("2024-01-01 09:03:00"), 4L),
      // u2 bursty: gaps 1, 1, 598 -> high cv -> B > 0
      (2L, ts("2024-01-01 09:00:00"), 5L), (2L, ts("2024-01-01 09:00:01"), 6L),
      (2L, ts("2024-01-01 09:00:02"), 7L), (2L, ts("2024-01-01 09:10:00"), 8L),
      // u3 single event: no gaps, excluded
      (3L, ts("2024-01-01 09:00:00"), 9L),
      // u4 simultaneous pair: gap 0 -> mean 0 -> NULL cv/B, not NaN
      (4L, ts("2024-01-01 09:00:00"), 10L),
      (4L, ts("2024-01-01 09:00:00"), 11L))
      .toDF("user_id", "ts", "event_id")
    val out = WindowOps.burstiness("user_id", "ts",
      tieBreak = Seq("event_id"))(ev)
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getLong(1) === 4L && u1.getLong(2) === 3L)
    assert(u1.getDouble(3) === 60.0 && u1.getDouble(4) === 0.0 &&
      u1.getDouble(5) === -1.0)
    val u2 = out(2L)
    // gaps 1,1,598: mean 200, var = (3·357602 − 600²)/9 = 79200.666…
    assert(u2.getDouble(3) === 200.0)
    assert(u2.getDouble(5) > 0.15) // decisively bursty
    assert(!out.contains(3L))
    val u4 = out(4L)
    assert(u4.getDouble(3) === 0.0 && u4.isNullAt(4) && u4.isNullAt(5))
  }

  test("decayedCounts: exact dyadic weights, clamping at both ends, NULL drop") {
    import graft.ops.TemporalOps
    val now = java.sql.Timestamp.valueOf("2024-01-11 00:00:00")
    val ev = Seq(
      (Some(ts("2024-01-10 12:00:00")), "a"), // age 0.5 d -> k=0, w=1
      (Some(ts("2024-01-09 12:00:00")), "a"), // age 1.5 d -> k=1, w=1/2
      (Some(ts("2024-01-05 00:00:00")), "a"), // age 6 d   -> k=6, w=1/64
      (Some(ts("2024-01-12 00:00:00")), "a"), // FUTURE -> k=0, w=1
      (Some(ts("2020-01-01 00:00:00")), "a"), // ancient -> k=kMax, w=2^-8
      (None, "a"),                            // NULL ts drops
      (Some(ts("2024-01-10 00:00:00")), "b")  // age 1 d -> k=1, w=1/2
    ).toDF("ts", "event_type")
    val out = TemporalOps.decayedCounts(Seq("event_type"), "ts", now,
      halfLifeSeconds = 86400L, kMax = 8)(ev)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // a: 1 + 1/2 + 1/64 + 1 + 2^-8 — every term dyadic, the sum exact
    assert(out("a") === (5L, 1.0 + 0.5 + 1.0 / 64 + 1.0 + 1.0 / 256))
    assert(out("b") === (1L, 0.5))
  }

  test("ohlcBuckets: deterministic open/close under ts ties, NULL handling") {
    import graft.ops.TemporalOps
    val ev = Seq(
      // one 1h bucket for key "a": open 5 (earliest), close 7 (latest);
      // two rows SHARE ts 09:30 — tieBreak id decides 3 < 4 -> high=9 mid
      (Some(ts("2024-01-01 09:00:00")), "a", Some(5.0), 1L),
      (Some(ts("2024-01-01 09:30:00")), "a", Some(9.0), 3L),
      (Some(ts("2024-01-01 09:30:00")), "a", Some(2.0), 4L),
      (Some(ts("2024-01-01 09:59:00")), "a", Some(7.0), 5L),
      (None, "a", Some(99.0), 6L),                      // NULL ts drops
      (Some(ts("2024-01-01 09:10:00")), "a", None, 7L), // NULL value drops
      (Some(ts("2024-01-01 10:05:00")), "a", Some(1.0), 8L) // next bucket
    ).toDF("ts", "event_type", "value", "event_id")
    val out = TemporalOps.ohlcBuckets("ts", "value", "1 hour",
      keys = Seq("event_type"), tieBreak = Seq("event_id"))(ev)
      .orderBy("bucket_start").collect()
    assert(out.length === 2)
    val b0 = out(0)
    assert(b0.getDouble(2) === 5.0 && b0.getDouble(3) === 9.0 &&
      b0.getDouble(4) === 2.0 && b0.getDouble(5) === 7.0 &&
      b0.getLong(6) === 4L)
    val b1 = out(1)
    assert(b1.getDouble(2) === 1.0 && b1.getDouble(5) === 1.0 &&
      b1.getLong(6) === 1L)
    // ts tie at the bucket CLOSE: latest (ts, id) wins deterministically
    val tied = Seq(
      (ts("2024-01-01 09:30:00"), "a", 9.0, 3L),
      (ts("2024-01-01 09:30:00"), "a", 2.0, 4L))
      .toDF("ts", "event_type", "value", "event_id")
    val t = TemporalOps.ohlcBuckets("ts", "value", "1 hour",
      keys = Seq("event_type"), tieBreak = Seq("event_id"))(tied).head()
    assert(t.getDouble(2) === 9.0 && t.getDouble(5) === 2.0)
  }

  test("eventPaths: consecutive routes, short users excluded, top-k order") {
    import graft.ops.WindowOps
    // u1: a b a c -> paths "a -> b -> a", "b -> a -> c"
    // u2: a b a   -> path  "a -> b -> a"
    // u3: x y     -> too short for 3 steps, contributes nothing
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a", 1L),
      (1L, ts("2024-01-01 09:01:00"), "b", 2L),
      (1L, ts("2024-01-01 09:02:00"), "a", 3L),
      (1L, ts("2024-01-01 09:03:00"), "c", 4L),
      (2L, ts("2024-01-01 09:00:00"), "a", 5L),
      (2L, ts("2024-01-01 09:01:00"), "b", 6L),
      (2L, ts("2024-01-01 09:02:00"), "a", 7L),
      (3L, ts("2024-01-01 09:00:00"), "x", 8L),
      (3L, ts("2024-01-01 09:01:00"), "y", 9L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = WindowOps.eventPaths("user_id", "ts", "event_type",
      steps = 3, k = 10, tieBreak = Seq("event_id"))(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out === Seq("a -> b -> a" -> 2L, "b -> a -> c" -> 1L))
    // k truncates after the (n desc, path asc) order
    val top1 = WindowOps.eventPaths("user_id", "ts", "event_type",
      steps = 3, k = 1, tieBreak = Seq("event_id"))(ev).collect()
    assert(top1.length === 1 && top1.head.getString(0) === "a -> b -> a")
    // steps = 2 degenerates to the transition pairs (as counts)
    val pairs = WindowOps.eventPaths("user_id", "ts", "event_type",
      steps = 2, k = 10, tieBreak = Seq("event_id"))(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pairs("a -> b") === 2L && pairs("x -> y") === 1L)
  }

  test("eventFunnel: strictly-after sequential matching, per-step conversion") {
    import graft.ops.WindowOps
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01"), "view"),
      (1L, ts("2024-01-01 00:00:02"), "click"),
      (1L, ts("2024-01-01 00:00:03"), "purchase"),   // full funnel
      (2L, ts("2024-01-01 00:00:01"), "click"),      // click BEFORE view: no
      (2L, ts("2024-01-01 00:00:02"), "view"),
      (2L, ts("2024-01-01 00:00:03"), "click"),      // ...but this one counts
      (3L, ts("2024-01-01 00:00:01"), "view"),       // stalls at step 0
      (4L, ts("2024-01-01 00:00:01"), "purchase"),   // never enters
      (5L, ts("2024-01-01 00:00:05"), "view"),
      (5L, ts("2024-01-01 00:00:04"), "click")       // before the view: no
    ).toDF("user_id", "ts", "event_type")
    val out = WindowOps.eventFunnel("user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))(df)
      .orderBy("step")
      .select("step", "step_name", "users", "conversion")
      .as[(Long, String, Long, Double)].collect()
    assert(out === Array(
      (0L, "view", 4L, 1.0), (1L, "click", 2L, 0.5),
      (2L, "purchase", 1L, 0.25)))
  }

  test("cohortRetention: Monday-week cohorts, whole-week offsets, distinct users") {
    import graft.ops.WindowOps
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // Monday wk A (cohort)
      (1L, ts("2024-01-10 10:00:00")),  // wk A+1
      (1L, ts("2024-01-18 10:00:00")),  // wk A+2
      (2L, ts("2024-01-03 10:00:00")),  // same cohort week A
      (2L, ts("2024-01-09 10:00:00")),  // wk A+1
      (3L, ts("2024-01-08 10:00:00"))   // cohort wk B = A+1
    ).toDF("user_id", "ts")
    val out = WindowOps.cohortRetention("user_id", "ts")(df)
      .orderBy("cohort_week", "week_offset")
      .select("cohort_week", "week_offset", "active_users")
      .as[(java.sql.Date, Long, Long)].collect()
    val wkA = java.sql.Date.valueOf("2024-01-01")
    val wkB = java.sql.Date.valueOf("2024-01-08")
    assert(out === Array(
      (wkA, 0L, 2L), (wkA, 1L, 2L), (wkA, 2L, 1L), (wkB, 0L, 1L)))
  }

  test("asOfJoin forward attaches earliest right at or after; tolerance nulls distant matches") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),   // next signup 10:00:00 (inclusive)
      (2L, 1L, ts("2024-01-01 11:30:00")),   // next signup 12:00:00, within tol
      (3L, 1L, ts("2024-01-02 13:00:00")),   // no later signup -> NULLs
      (4L, 2L, ts("2024-01-01 00:00:00")))   // nearest is 3h away, tol 1h -> NULLs
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (11L, 1L, ts("2024-01-01 12:00:00"), 2.0),
      (12L, 2L, ts("2024-01-01 03:00:00"), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = TemporalOps.asOfJoin(right, "user_id", "ts", "ts",
      Seq("event_id", "value"), "event_id",
      direction = "forward", toleranceSeconds = Some(3600L))(left)
      .orderBy("event_id")
      .select("event_id", "asof_event_id").as[(Long, Option[Long])].collect()
    assert(out === Array((1L, Some(10L)), (2L, Some(11L)), (3L, None),
      (4L, None)))
  }

  test("asOfJoin forward: equal-timestamp right ties break to the SMALLER tie-break") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (20L, 1L, ts("2024-01-01 01:00:00"), 1.0),
      (21L, 1L, ts("2024-01-01 01:00:00"), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = TemporalOps.asOfJoin(right, "user_id", "ts", "ts",
      Seq("event_id"), "event_id", direction = "forward")(left)
      .select("asof_event_id").as[Long].head()
    assert(out === 20L)
  }

  test("asOfJoin nearest: closer side wins, equidistant ties backward, tolerance binds") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:10:00")), // 10 min after A, 50 min before B -> A
      (2L, 1L, ts("2024-01-01 10:50:00")), // 50 after A, 10 before B -> B
      (3L, 1L, ts("2024-01-01 10:30:00")), // EQUIDISTANT -> backward (A)
      (4L, 2L, ts("2024-01-01 05:00:00")), // only a later right exists -> it
      (5L, 3L, ts("2024-01-01 05:00:00"))) // only an earlier right -> it
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), 1.0), // A
      (11L, 1L, ts("2024-01-01 11:00:00"), 2.0), // B
      (20L, 2L, ts("2024-01-01 08:00:00"), 3.0),
      (30L, 3L, ts("2024-01-01 01:00:00"), 4.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = TemporalOps.asOfJoin(right, "user_id", "ts", "ts",
      Seq("event_id"), "event_id", direction = "nearest")(left)
      .orderBy("event_id")
      .select("asof_event_id").as[Long].collect()
    assert(out.toSeq === Seq(10L, 11L, 10L, 20L, 30L))
    // tolerance nulls the nearest match when even IT is too far
    val tol = TemporalOps.asOfJoin(right, "user_id", "ts", "ts",
      Seq("event_id"), "event_id", direction = "nearest",
      toleranceSeconds = Some(3600L))(left)
      .orderBy("event_id")
      .select("asof_event_id").as[Option[Long]].collect()
    assert(tol.toSeq === Seq(Some(10L), Some(11L), Some(10L), None, None))
    // non-timestamp time columns are a construction-time error
    intercept[IllegalArgumentException](
      TemporalOps.asOfJoin(
        Seq((1L, 1L)).toDF("event_id", "user_id")
          .withColumn("ts", $"event_id"),
        "user_id", "ts", "ts", Seq("event_id"), "event_id",
        direction = "nearest")(
        Seq((1L, 1L)).toDF("event_id", "user_id")
          .withColumn("ts", $"event_id")))
  }

  test("asOfJoin backward tolerance: match kept within, nulled beyond") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:30:00")),   // 30 min after -> kept
      (2L, 1L, ts("2024-01-01 13:00:00")))   // 3h after -> nulled
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, ts("2024-01-01 10:00:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = TemporalOps.asOfJoin(right, "user_id", "ts", "ts",
      Seq("event_id"), "event_id", toleranceSeconds = Some(3600L))(left)
      .orderBy("event_id")
      .select("asof_event_id").as[Option[Long]].collect()
    assert(out === Array(Some(10L), None))
  }

  test("scd2History compresses unchanged runs and closes validity intervals") {
    val df = Seq(
      (1L, 1L, Some(ts("2024-01-01 00:00:00")), "A"),
      (2L, 1L, Some(ts("2024-01-01 01:00:00")), "A"), // unchanged -> compressed
      (3L, 1L, Some(ts("2024-01-01 02:00:00")), "B"),
      (4L, 1L, Some(ts("2024-01-01 03:00:00")), "B"), // unchanged -> compressed
      (5L, 1L, Some(ts("2024-01-01 04:00:00")), "A"), // back to A = a NEW version
      (6L, 2L, Some(ts("2024-01-01 00:30:00")), "X"),
      (7L, 2L, None, "Y")                             // undatable -> dropped
    ).toDF("event_id", "user_id", "ts", "state")
    val out = TemporalOps.scd2History("user_id", "ts", Seq("state"), "event_id")(df)
      .orderBy("user_id", "valid_from")
      .select("user_id", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Long)].collect()
    assert(out === Array(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00")), 0L),
      (1L, "B", ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 04:00:00")), 0L),
      (1L, "A", ts("2024-01-01 04:00:00"), None, 1L),
      (2L, "X", ts("2024-01-01 00:30:00"), None, 1L)))
  }

  test("scd2History: same-timestamp changes order by the tie-break") {
    val df = Seq(
      (10L, 1L, ts("2024-01-01 00:00:00"), "A"),
      (11L, 1L, ts("2024-01-01 00:00:00"), "B")
    ).toDF("event_id", "user_id", "ts", "state")
    val out = TemporalOps.scd2History("user_id", "ts", Seq("state"), "event_id")(df)
      .orderBy("is_current")
      .select("state", "is_current").as[(String, Long)].collect()
    // A (event 10) precedes B (event 11): A's interval closes at the same
    // instant, B stays current
    assert(out === Array(("A", 0L), ("B", 1L)))
  }

  test("bandJoin keeps pairs within [0, width] inclusive, across buckets") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:30"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts("2024-01-01 10:00:30")), // delta 0 -> keep
      (11L, 1L, ts("2024-01-01 10:01:30")), // delta 60 = width -> keep (next bucket)
      (12L, 1L, ts("2024-01-01 10:01:31")), // delta 61 -> drop
      (13L, 1L, ts("2024-01-01 10:00:29")), // negative -> drop
      (14L, 2L, ts("2024-01-01 10:00:40"))  // other key -> drop
    ).toDF("event_id", "user_id", "ts")
    val out = TemporalOps.bandJoin(right, "user_id", "ts", "ts", 60L)(left)
      .select("r_event_id").as[Long].collect().toSet
    assert(out === Set(10L, 11L))
  }

  test("bandJoin emits each qualifying pair exactly once") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((2L, 1L, ts("2024-01-01 00:00:10"))).toDF("event_id", "user_id", "ts")
    val out = TemporalOps.bandJoin(right, "user_id", "ts", "ts", 3600L)(left)
    assert(out.count() === 1L)
    assert(out.select("delta_us").as[Long].head() === 10000000L)
  }

  test("resample emits every bucket in [first, last], fills gaps forward") {
    // user 1: events in hours 10 and 13 — hours 11, 12 are gaps
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:05:00"), 5.0),
      (1L, 11L, ts("2024-01-01 10:55:00"), 7.5), // same bucket, later -> v_last
      (1L, 12L, ts("2024-01-01 13:01:00"), 9.0),
      (2L, 20L, ts("2024-01-01 00:30:00"), 1.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TemporalOps.resample("user_id", "ts", "value", 3600L,
      tieBreak = "event_id")(events)
      .orderBy("user_id", "bucket_ts")
      .select("user_id", "n_events", "v_last", "v_ffill")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 2L, Some(7.5), 7.5), // hour 10: two events, last one wins
      (1L, 0L, None, 7.5),      // hour 11: gap, forward-filled
      (1L, 0L, None, 7.5),      // hour 12: gap
      (1L, 1L, Some(9.0), 9.0), // hour 13
      (2L, 1L, Some(1.0), 1.0)))
  }

  test("resample tie-break picks the higher (ts, tieBreak) event in a bucket") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, 11L, ts("2024-01-01 10:00:00"), 2.0) // same ts, higher id wins
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TemporalOps.resample("user_id", "ts", "value", 3600L,
      tieBreak = "event_id")(events)
      .select("v_last").as[Double].collect()
    assert(out.toSeq === Seq(2.0))
  }

  test("cumulativeDistinct counts first occurrences only, per key") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 12L, ts("2024-01-01 10:02:00"), "a"), // repeat: no increment
      (1L, 13L, ts("2024-01-01 10:03:00"), "c"),
      (2L, 20L, ts("2024-01-01 09:00:00"), "a")  // other key restarts
    ).toDF("user_id", "event_id", "ts", "v")
    val out = graft.ops.WindowOps.cumulativeDistinct("user_id", "v",
      Seq("ts", "event_id"))(events)
      .orderBy("user_id", "event_id")
      .select("distinct_so_far").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L, 2L, 3L, 1L))
  }

  test("sessionStats: per-session bounds, duration, count") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:10:00")), // same session (gap 600 < 1800)
      (1L, 12L, ts("2024-01-01 11:00:00")), // new session (gap 3000)
      (2L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val out = graft.ops.WindowOps.sessionStats("user_id", "ts", 1800L,
      tieBreak = Seq("event_id"))(events)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "duration_s", "n_events")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq(
      (1L, 1L, 600L, 2L), (1L, 2L, 0L, 1L), (2L, 1L, 0L, 1L)))
  }

  test("intervalJoin: half-open overlap, one row per pair across bucket spans") {
    // left interval [10:00, 10:30); rights probe every boundary class
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
      .toDF("iv_id", "user_id", "s", "e")
    val right = Seq(
      (10L, 1L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:20:00")), // inside
      (11L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")), // contains (spans many buckets)
      (12L, 1L, ts("2024-01-01 10:29:59"), ts("2024-01-01 10:40:00")), // tail overlap
      (13L, 1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:40:00")), // abuts: half-open -> no
      (14L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")), // abuts before -> no
      (15L, 2L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:20:00")), // other key
      (16L, 1L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:15:00")), // instant inside -> yes, overlap 0
      (17L, 1L, ts("2024-01-01 10:20:00"), ts("2024-01-01 10:05:00"))  // inverted -> dropped
    ).toDF("iv_id", "user_id", "s", "e")
    val out = TemporalOps.intervalJoin(right, "user_id", "s", "e", "s", "e",
      widthSeconds = 300L)(left)
      .select("r_iv_id", "overlap_us").as[(Long, Long)].collect().sortBy(_._1)
    // exactly one row per overlapping pair, even when intervals share
    // many buckets (the 2h-wide right row 11); the instant matches its
    // strict container with zero measure
    assert(out.toSeq === Seq(
      (10L, 600000000L), (11L, 1800000000L), (12L, 1000000L), (16L, 0L)))
  }

  test("applyChanges: last change wins, deletes remove, delete-then-upsert recreates") {
    val snapshot = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", "U", ts("2024-01-01 10:00:00"), 1L), // superseded
      (1L, "a2", "U", ts("2024-01-01 11:00:00"), 2L), // wins: update
      (2L, "x", "D", ts("2024-01-01 10:00:00"), 3L),  // delete
      (3L, "y", "D", ts("2024-01-01 10:00:00"), 4L),  // delete...
      (3L, "c2", "U", ts("2024-01-01 12:00:00"), 5L), // ...then recreate
      (9L, "new", "U", ts("2024-01-01 10:00:00"), 6L), // insert
      (8L, "no", "D", ts("2024-01-01 10:00:00"), 7L)  // delete absent: no-op
    ).toDF("k", "v", "op", "chg_ts", "chg_id")
    val out = TemporalOps.applyChanges(changes, "k", "chg_ts", "chg_id",
      "op")(snapshot)
      .orderBy("k").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "a2"), (3L, "c2"), (9L, "new")))
  }

  test("applyChanges: equal-timestamp changes resolve by tieBreak; unknown op throws") {
    val snapshot = Seq((1L, "a")).toDF("k", "v")
    val tied = Seq(
      (1L, "lo", "U", ts("2024-01-01 10:00:00"), 1L),
      (1L, "hi", "U", ts("2024-01-01 10:00:00"), 2L) // higher tieBreak wins
    ).toDF("k", "v", "op", "chg_ts", "chg_id")
    val out = TemporalOps.applyChanges(tied, "k", "chg_ts", "chg_id",
      "op")(snapshot).as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "hi")))
    val bad = Seq((1L, "z", "X", ts("2024-01-01 10:00:00"), 1L))
      .toDF("k", "v", "op", "chg_ts", "chg_id")
    val e = intercept[Exception] {
      TemporalOps.applyChanges(bad, "k", "chg_ts", "chg_id",
        "op")(snapshot).collect()
    }
    assert(e.getMessage != null)
  }

  test("timeWeightedAvg weights values by holding duration; last event weightless") {
    val events = Seq(
      // user 1: v=10 holds 10s, v=30 holds 30s -> twa = (100+900)/40 = 25
      (1L, 10L, ts("2024-01-01 10:00:00"), 10L),
      (1L, 11L, ts("2024-01-01 10:00:10"), 30L),
      (1L, 12L, ts("2024-01-01 10:00:40"), 999L), // last: no weight
      (2L, 20L, ts("2024-01-01 09:00:00"), 5L)    // single event: vanishes
    ).toDF("user_id", "event_id", "ts", "v")
    val out = graft.ops.WindowOps.timeWeightedAvg("user_id", "ts", "v",
      tieBreak = "event_id")(events)
      .select("user_id", "twa", "dur_us").as[(Long, Double, Long)].collect()
    assert(out.toSeq === Seq((1L, 25.0, 40000000L)))
  }

  test("rollingAgg trailing frame: short head frames average what exists") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 2L),
      (1L, 11L, ts("2024-01-01 10:01:00"), 4L),
      (1L, 12L, ts("2024-01-01 10:02:00"), 6L),
      (1L, 13L, ts("2024-01-01 10:03:00"), 8L),
      (2L, 20L, ts("2024-01-01 09:00:00"), 5L)
    ).toDF("user_id", "event_id", "ts", "v")
    val out = graft.ops.WindowOps.rollingAgg(Seq("user_id"),
      Seq("ts", "event_id"), "v", k = 3)(events)
      .orderBy("user_id", "event_id")
      .select("rolling_sum", "rolling_n", "rolling_mean")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (2L, 1L, 2.0), (6L, 2L, 3.0), (12L, 3L, 4.0), (18L, 3L, 6.0),
      (5L, 1L, 5.0)))
  }

  test("ewmaSmooth runs the exact recurrence in (ts, tieBreak) order") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, 11L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, 12L, ts("2024-01-01 12:00:00"), 0.0),
      (2L, 20L, ts("2024-01-01 09:00:00"), 4.0),
      (3L, 30L, null.asInstanceOf[Timestamp], 9.0) // dropped
    ).toDF("user_id", "event_id", "ts", "value")
    val out = graft.ops.WindowOps.ewmaSmooth("user_id", "ts", "value",
      alpha = 0.5, tieBreak = "event_id")(events)
      .orderBy("user_id", "ts")
      .select("user_id", "value", "ewma").as[(Long, Double, Double)]
      .collect()
    // y1=10, y2=.5*20+.5*10=15, y3=.5*0+.5*15=7.5 (alpha .5 is exact)
    assert(out.toSeq === Seq(
      (1L, 10.0, 10.0), (1L, 20.0, 15.0), (1L, 0.0, 7.5), (2L, 4.0, 4.0)))
  }

  test("ewmaSmooth same-timestamp events fold in tieBreak order") {
    val events = Seq(
      (1L, 11L, ts("2024-01-01 10:00:00"), 8.0),
      (1L, 10L, ts("2024-01-01 10:00:00"), 0.0) // lower id folds first
    ).toDF("user_id", "event_id", "ts", "value")
    val out = graft.ops.WindowOps.ewmaSmooth("user_id", "ts", "value",
      alpha = 0.5, tieBreak = "event_id")(events)
      .orderBy("event_id").select("ewma").as[Double].collect()
    assert(out.toSeq === Seq(0.0, 4.0)) // y(10)=0, y(11)=.5*8+.5*0
  }

  test("ewmaSmooth exactOrder=false streaming fold is bit-equal to the exact mode") {
    // same recurrence, same IEEE op sequence — only the execution shape
    // changes (secondary sort + O(1)-state mapPartitions instead of a
    // per-key collected array), so results must match EXACTLY, not just
    // within tolerance, on the real fixture event stream
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = graft.ops.WindowOps.ewmaSmooth("user_id", "ts", "value",
      alpha = 0.3, tieBreak = "event_id")(events)
      .select(col("user_id"), col("event_id"), col("ewma"))
    val fast = graft.ops.WindowOps.ewmaSmooth("user_id", "ts", "value",
      alpha = 0.3, tieBreak = "event_id", exactOrder = false)(events)
      .select(col("user_id"), col("event_id"), col("ewma"))
    assert(exact.count() === fast.count())
    assert(exact.except(fast).isEmpty && fast.except(exact).isEmpty)
  }

  test("resample drops NULL-timestamp rows and keys with no datable events") {
    val events = Seq(
      (1L, 10L, Some(ts("2024-01-01 10:00:00")), 5.0),
      (1L, 11L, Option.empty[Timestamp], 6.0),
      (3L, 30L, Option.empty[Timestamp], 7.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TemporalOps.resample("user_id", "ts", "value", 3600L,
      tieBreak = "event_id")(events)
      .select("user_id", "n_events").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 1L)))
  }

  test("lagFeatures: per-key offsets, honest NULL boundaries, one shuffle") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
      (2L, 1L, 5.0))
      .toDF("k", "ord", "v")
    val out = graft.ops.WindowOps.lagFeatures(Seq("k"), Seq("ord"), "v",
      lags = Seq(1, -1))(df)
      .orderBy("k", "ord")
      .select("k", "ord", "v_lag_1", "v_lead_1")
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    assert(out.toSeq === Seq(
      (1L, 1L, None, Some(20.0)),
      (1L, 2L, Some(10.0), Some(30.0)),
      (1L, 3L, Some(20.0), None),
      (2L, 1L, None, None))) // keys never leak into each other
    intercept[IllegalArgumentException](
      graft.ops.WindowOps.lagFeatures(Seq("k"), Seq("ord"), "v", Seq(0))(df))
    intercept[IllegalArgumentException](
      graft.ops.WindowOps.lagFeatures(Seq("k"), Seq("ord"), "v", Seq(1, 1))(df))
  }

  test("cusumShift accumulates one-sided evidence, resets at zero, flags over threshold") {
    import spark.implicits._
    // target 10, slack 1: values 10,16,16,2 -> sp: 0,5,10,1; sn: 0,0,0,7
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, Option(10.0)),
      (1L, ts("2024-01-01 11:00:00"), 2L, Option(16.0)),
      (1L, ts("2024-01-01 12:00:00"), 3L, Option(16.0)),
      (1L, ts("2024-01-01 13:00:00"), 4L, Option(2.0)),
      (1L, ts("2024-01-01 14:00:00"), 5L, Option.empty[Double]))
      .toDF("k", "t", "tb", "v")
    val out = graft.ops.WindowOps.cusumShift("k", "t", "v",
      target = 10.0, slack = 1.0, threshold = 9.0, tieBreak = "tb")(df)
      .orderBy("tb")
      .select("cusum_pos", "cusum_neg", "shift_flag")
      .as[(Double, Double, Boolean)].collect()
    assert(out.map(_._1).toSeq === Seq(0.0, 5.0, 10.0, 1.0, 1.0))
    assert(out.map(_._2).toSeq === Seq(0.0, 0.0, 0.0, 7.0, 7.0))
    assert(out.map(_._3).toSeq ===
      Seq(false, false, true, false, false)) // flags only over threshold
    // NULL value (row 5) updated nothing: statistics carried verbatim
    intercept[IllegalArgumentException](
      graft.ops.WindowOps.cusumShift("k", "t", "v", 10.0, -1.0, 9.0, "tb")(df))
  }

  test("cusumShift exactOrder=false: O(1)-memory scan matches the exact fold") {
    import spark.implicits._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def run(exact: Boolean) =
      graft.ops.WindowOps.cusumShift("user_id", "ts", "value",
        target = 20.0, slack = 2.0, threshold = 60.0, tieBreak = "event_id",
        exactOrder = exact)(ev)
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "event_id", "cusum_pos", "cusum_neg", "shift_flag")
        .as[(Long, Long, Double, Double, Boolean)].collect()
    val a = run(true); val b = run(false)
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case ((k1, e1, p1, n1, f1), (k2, e2, p2, n2, f2)) =>
      assert(k1 === k2 && e1 === e2 && f1 === f2)
      assert(math.abs(p1 - p2) <= 1e-12 && math.abs(n1 - n2) <= 1e-12)
    }
  }

  test("holtSmooth: level/trend recurrence, ramp tracking, NULL poisoning") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), Option(10.0)),
      (1L, 11L, ts("2024-01-01 11:00:00"), Option(20.0)),
      (1L, 12L, ts("2024-01-01 12:00:00"), Option(30.0)),
      (2L, 20L, ts("2024-01-01 09:00:00"), Option(4.0)),
      (2L, 21L, ts("2024-01-01 10:00:00"), Option.empty[Double]), // poison
      (2L, 22L, ts("2024-01-01 11:00:00"), Option(5.0)) // stays poisoned
    ).toDF("user_id", "event_id", "ts", "value")
    val out = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.5, beta = 0.5, tieBreak = "event_id")(events)
      .orderBy("event_id")
      .select("level", "trend", "forecast").collect()
    // user 1 hand-rolled at alpha=beta=0.5 (exact halves):
    // l1=10 b1=0; l2=.5*20+.5*10=15, b2=.5*5+0=2.5;
    // l3=.5*30+.5*17.5=23.75, b3=.5*8.75+.5*2.5=5.625
    assert(out(0).getDouble(0) === 10.0 && out(0).getDouble(1) === 0.0)
    assert(out(1).getDouble(0) === 15.0 && out(1).getDouble(1) === 2.5 &&
      out(1).getDouble(2) === 17.5)
    assert(out(2).getDouble(0) === 23.75 && out(2).getDouble(1) === 5.625)
    // user 2: a NULL value poisons the tail
    assert(out(3).getDouble(0) === 4.0)
    assert((4 to 5).forall(i => out(i).isNullAt(0) && out(i).isNullAt(2)))
    // a perfect ramp's forecast converges onto the next value
    val ramp = (1 to 30).map(i =>
      (9L, i.toLong, ts(f"2024-01-01 10:${i}%02d:00"), Option(i * 10.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val last = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.5, beta = 0.5, tieBreak = "event_id")(ramp)
      .orderBy(col("event_id").desc).select("forecast").head().getDouble(0)
    assert(math.abs(last - 310.0) < 1.0, s"ramp forecast $last")
    intercept[IllegalArgumentException](graft.ops.WindowOps.holtSmooth(
      "user_id", "ts", "value", alpha = 0.0, beta = 0.5,
      tieBreak = "event_id")(events))
  }

  test("holtSmooth damped (phi): hand recurrence, phi=1 identity, mode parity") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 4.0),
      (1L, 11L, ts("2024-01-01 11:00:00"), 8.0),
      (1L, 12L, ts("2024-01-01 12:00:00"), 8.0)
    ).toDF("user_id", "event_id", "ts", "value")
    // hand-rolled at alpha=beta=phi=0.5 (exact halves):
    // l1=4 b1=0 f1=4; bD=0: l2=.5*8+.5*4=6, b2=.5*2+.5*0=1,
    //   f2=6+.5*1=6.5;
    // bD=.5: l3=.5*8+.5*6.5=7.25, b3=.5*1.25+.5*.5=0.875,
    //   f3=7.25+.4375=7.6875
    val out = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.5, beta = 0.5, tieBreak = "event_id", phi = 0.5)(events)
      .orderBy("event_id").select("level", "trend", "forecast").collect()
    assert(out(0).getDouble(0) === 4.0 && out(0).getDouble(2) === 4.0)
    assert(out(1).getDouble(0) === 6.0 && out(1).getDouble(1) === 1.0 &&
      out(1).getDouble(2) === 6.5)
    assert(out(2).getDouble(0) === 7.25 &&
      out(2).getDouble(1) === 0.875 && out(2).getDouble(2) === 7.6875)
    // phi = 1 explicit IS the classic op (same code path, pinned)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val classic = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, tieBreak = "event_id")(ev)
    val phi1 = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, tieBreak = "event_id", phi = 1.0)(ev)
    assert(classic.except(phi1).isEmpty && phi1.except(classic).isEmpty)
    // the damped production scan is bit-equal to the damped fold
    val exactD = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, tieBreak = "event_id", phi = 0.8)(ev)
      .select("user_id", "event_id", "level", "trend", "forecast")
    val fastD = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, tieBreak = "event_id",
      exactOrder = false, phi = 0.8)(ev)
      .select("user_id", "event_id", "level", "trend", "forecast")
    assert(exactD.count() === fastD.count())
    assert(exactD.except(fastD).isEmpty && fastD.except(exactD).isEmpty)
    // same parity for damped holtWinters (ring + phi interplay)
    val exactW = graft.ops.WindowOps.holtWinters("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, gamma = 0.2, period = 4,
      tieBreak = "event_id", phi = 0.8)(ev)
      .select("user_id", "event_id", "level", "trend", "seasonal",
        "forecast")
    val fastW = graft.ops.WindowOps.holtWinters("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, gamma = 0.2, period = 4,
      tieBreak = "event_id", exactOrder = false, phi = 0.8)(ev)
      .select("user_id", "event_id", "level", "trend", "seasonal",
        "forecast")
    assert(exactW.except(fastW).isEmpty && fastW.except(exactW).isEmpty)
    intercept[IllegalArgumentException](graft.ops.WindowOps.holtSmooth(
      "user_id", "ts", "value", alpha = 0.5, beta = 0.5,
      tieBreak = "event_id", phi = 0.0)(events))
  }

  test("holtSmooth exactOrder=false streaming scan is bit-equal to the exact fold") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, tieBreak = "event_id")(events)
      .select("user_id", "event_id", "level", "trend")
    val fast = graft.ops.WindowOps.holtSmooth("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, tieBreak = "event_id",
      exactOrder = false)(events)
      .select("user_id", "event_id", "level", "trend")
    assert(exact.count() === fast.count())
    assert(exact.except(fast).isEmpty && fast.except(exact).isEmpty)
  }

  test("holtWinters: hand recurrence at exact halves, seasonal learning, NULL poisoning") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), Option(10.0)),
      (1L, 11L, ts("2024-01-01 11:00:00"), Option(20.0)),
      (1L, 12L, ts("2024-01-01 12:00:00"), Option(30.0)),
      (1L, 13L, ts("2024-01-01 13:00:00"), Option(40.0)),
      (2L, 20L, ts("2024-01-01 09:00:00"), Option(4.0)),
      (2L, 21L, ts("2024-01-01 10:00:00"), Option.empty[Double]), // poison
      (2L, 22L, ts("2024-01-01 11:00:00"), Option(5.0)) // stays poisoned
    ).toDF("user_id", "event_id", "ts", "value")
    val out = graft.ops.WindowOps.holtWinters("user_id", "ts", "value",
      alpha = 0.5, beta = 0.5, gamma = 0.5, period = 2,
      tieBreak = "event_id")(events)
      .orderBy("event_id")
      .select("level", "trend", "seasonal", "forecast").collect()
    // hand-rolled at alpha=beta=gamma=1/2, period 2 (exact halves):
    // t1: l=10 b=0 s=0 q=[0,0] f=10
    // t2: sm=0: l=15 b=2.5 s=2.5 q=[0,2.5] f=17.5
    // t3: sm=0: l=23.75 b=5.625 s=3.125 q=[2.5,3.125] f=31.875
    // t4: sm=2.5: l=33.4375 b=7.65625 s=4.53125 f=44.21875
    assert(out(0).getDouble(0) === 10.0 && out(0).getDouble(1) === 0.0 &&
      out(0).getDouble(2) === 0.0 && out(0).getDouble(3) === 10.0)
    assert(out(1).getDouble(0) === 15.0 && out(1).getDouble(1) === 2.5 &&
      out(1).getDouble(2) === 2.5 && out(1).getDouble(3) === 17.5)
    assert(out(2).getDouble(0) === 23.75 &&
      out(2).getDouble(1) === 5.625 && out(2).getDouble(2) === 3.125 &&
      out(2).getDouble(3) === 31.875)
    assert(out(3).getDouble(0) === 33.4375 &&
      out(3).getDouble(1) === 7.65625 &&
      out(3).getDouble(2) === 4.53125 && out(3).getDouble(3) === 44.21875)
    // user 2: a NULL value poisons the tail (all four outputs)
    assert(out(4).getDouble(0) === 4.0)
    assert((5 to 6).forall(i => out(i).isNullAt(0) && out(i).isNullAt(3)))
    // a clean 2-cycle (10,20,10,20,...) is LEARNED: late forecasts hit
    // the next value closely, where trend-only Holt oscillates
    val cyc = (1 to 60).map(i =>
      (9L, i.toLong, ts(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00"),
        Option(if (i % 2 == 1) 10.0 else 20.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val fc = graft.ops.WindowOps.holtWinters("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, gamma = 0.5, period = 2,
      tieBreak = "event_id")(cyc)
      .orderBy("event_id").select("forecast").collect()
    // forecast at 0-based row i predicts row i+1's value, which is
    // 1-based step i+2: 10 on odd steps, 20 on even
    val errs = (40 until 59).map { i =>
      val next = if ((i + 2) % 2 == 1) 10.0 else 20.0
      math.abs(fc(i).getDouble(0) - next)
    }
    assert(errs.max < 2.0, s"late cycle errors: ${errs.max}")
    intercept[IllegalArgumentException](graft.ops.WindowOps.holtWinters(
      "user_id", "ts", "value", alpha = 0.5, beta = 0.5, gamma = 0.5,
      period = 1, tieBreak = "event_id")(events))
    intercept[IllegalArgumentException](graft.ops.WindowOps.holtWinters(
      "user_id", "ts", "value", alpha = 0.5, beta = 0.5, gamma = 1.5,
      period = 2, tieBreak = "event_id")(events))
  }

  test("holtWinters exactOrder=false ring-buffer scan is bit-equal to the exact fold") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = graft.ops.WindowOps.holtWinters("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, gamma = 0.2, period = 4,
      tieBreak = "event_id")(events)
      .select("user_id", "event_id", "level", "trend", "seasonal",
        "forecast")
    val fast = graft.ops.WindowOps.holtWinters("user_id", "ts", "value",
      alpha = 0.3, beta = 0.1, gamma = 0.2, period = 4,
      tieBreak = "event_id", exactOrder = false)(events)
      .select("user_id", "event_id", "level", "trend", "seasonal",
        "forecast")
    assert(exact.count() === fast.count())
    assert(exact.except(fast).isEmpty && fast.except(exact).isEmpty)
  }

  test("rollingCorr: exact Pearson on full frames, NULL on partial/degenerate") {
    // y = 2x + 1 over one key: every full frame correlates exactly 1
    val lin = (1 to 15).map(i => ("k", i, i.toDouble, 2.0 * i + 1.0))
      .toDF("g", "i", "x", "y")
    val out = graft.ops.WindowOps.rollingCorr(Seq("g"), Seq("i"),
      "x", "y", window = 5)(lin).orderBy("i").collect()
    assert(out.take(4).forall(_.isNullAt(5)),
      "partial frames must be NULL")
    // sqrt(v)·sqrt(v) reassembles v only to rounding — a perfect line
    // correlates to 1 within a few ulp, not bit-exactly
    assert(out.drop(4).forall(r => math.abs(r.getDouble(5) - 1.0) < 1e-12))
    assert(out.map(_.getAs[Long]("n")).toSeq ===
      (1 to 4).map(_.toLong) ++ Seq.fill(11)(5L))
    // anti-correlated series -> -1; constant x -> NULL (zero variance)
    val anti = (1 to 8).map(i => ("k", i, i.toDouble, -3.0 * i))
      .toDF("g", "i", "x", "y")
    assert(graft.ops.WindowOps.rollingCorr(Seq("g"), Seq("i"),
      "x", "y", window = 4)(anti).orderBy(col("i").desc)
      .head().getDouble(5) + 1.0 < 1e-12)
    val const = (1 to 6).map(i => ("k", i, 7.0, i.toDouble))
      .toDF("g", "i", "x", "y")
    assert(graft.ops.WindowOps.rollingCorr(Seq("g"), Seq("i"),
      "x", "y", window = 4)(const).collect().forall(_.isNullAt(5)))
    // NULL rows are excluded BEFORE framing: frames span observed pairs
    val gappy = Seq(("k", 1, Option(1.0), Option(2.0)),
      ("k", 2, Option.empty[Double], Option(9.0)),
      ("k", 3, Option(2.0), Option(4.0)),
      ("k", 4, Option(3.0), Option(6.0))).toDF("g", "i", "x", "y")
    val g = graft.ops.WindowOps.rollingCorr(Seq("g"), Seq("i"),
      "x", "y", window = 3)(gappy).orderBy("i").collect()
    assert(g.length === 3 && math.abs(g(2).getDouble(5) - 1.0) < 1e-12 &&
      g(2).getAs[Long]("n") === 3L)
    intercept[IllegalArgumentException](graft.ops.WindowOps.rollingCorr(
      Seq("g"), Seq("i"), "x", "y", window = 1)(lin))
  }

  test("rollingCorr exact=false: double sufficient stats within 1e-12 of exact") {
    // realistic co-moving noisy series over two keys — the production
    // knob must agree with the exact decimal mode to ~1e-12 relative
    val rnd = new scala.util.Random(17)
    val rows = for (g <- Seq("a", "b"); i <- 1 to 60) yield {
      val x = 50.0 + 10.0 * math.sin(i / 5.0) + rnd.nextDouble()
      val y = 0.7 * x + 5.0 * rnd.nextDouble()
      (g, i, math.rint(x * 100) / 100, math.rint(y * 100) / 100)
    }
    val df = rows.toDF("g", "i", "x", "y")
    def run(exact: Boolean) = graft.ops.WindowOps.rollingCorr(
      Seq("g"), Seq("i"), "x", "y", window = 10, exact = exact)(df)
      .orderBy("g", "i")
      .select("g", "i", "n", "corr").collect()
    val ex = run(exact = true)
    val fa = run(exact = false)
    assert(ex.length === fa.length)
    ex.zip(fa).foreach { case (e, f) =>
      assert(e.getString(0) === f.getString(0) && e.getInt(1) === f.getInt(1))
      assert(e.getAs[Long]("n") === f.getAs[Long]("n"))
      assert(e.isNullAt(3) === f.isNullAt(3),
        s"NULL contract must match at ${e.getString(0)}/${e.getInt(1)}")
      if (!e.isNullAt(3)) {
        val (ev, fv) = (e.getDouble(3), f.getDouble(3))
        assert(math.abs(ev - fv) <= 1e-12 * math.max(1.0, math.abs(ev)),
          s"corr diverged: exact=$ev fast=$fv")
      }
    }
    // the fast plan carries no decimal arithmetic anywhere
    val fastPlan = graft.ops.WindowOps.rollingCorr(
      Seq("g"), Seq("i"), "x", "y", window = 10, exact = false)(df)
      .queryExecution.optimizedPlan.toString
    assert(!fastPlan.toLowerCase.contains("decimal"))
  }

  test("rollingCorr exact=true: cumulative-sum overflow raises, never NULL-aliases") {
    // |x| = 1e9 quantizes to 1e18; each square is 1e36, so ~200 rows
    // push the CUMULATIVE Σx² past decimal(38,0) without any single
    // row overflowing — exactly the silent-NULL aliasing the guard
    // exists for (r15 ADVICE)
    val rows = (1 to 200).map(i => ("k", i, 1e9 + i, 2.0 * i + (i % 7)))
    val df = rows.toDF("g", "i", "x", "y")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // ANSI on (the Spark 4 default, this session's mode): the decimal
    // sum itself throws NUMERIC_VALUE_OUT_OF_RANGE — already loud
    val ansiEx = intercept[Exception] {
      graft.ops.WindowOps.rollingCorr(
        Seq("g"), Seq("i"), "x", "y", window = 5)(df).collect()
    }
    assert(msgs(ansiEx).exists(m =>
      m.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
        m.contains("rollingCorr(exact=true)")))
    // ANSI off: the sum would return NULL and alias the legitimate
    // NULL outputs — THE guard's case: raise_error fires instead
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ex = intercept[Exception] {
        graft.ops.WindowOps.rollingCorr(
          Seq("g"), Seq("i"), "x", "y", window = 5)(df).collect()
      }
      assert(msgs(ex).exists(_.contains("rollingCorr(exact=true)")),
        s"expected the overflow fail-fast, got: ${msgs(ex).mkString(" | ")}")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
    // same shape on exact=false: bounded frames, no cumulative growth,
    // finishes fine
    val ok = graft.ops.WindowOps.rollingCorr(
      Seq("g"), Seq("i"), "x", "y", window = 5, exact = false)(df)
      .filter(col("corr").isNotNull).count()
    assert(ok > 0)
  }

  test("kaplanMeier: hand curve, censoring leaves risk set, d=n poisons se") {
    import spark.implicits._
    // durations (censored): 1(d) 1(d) 2(c) 3(d) 3(d) 4(c), n0 = 6
    val d = Seq((1L, false), (1L, false), (2L, true), (3L, false),
      (3L, false), (4L, true)).toDF("t", "c")
    val out = graft.ops.WindowOps.kaplanMeier(col("t"), col("c"))(d)
      .orderBy("t").collect()
    assert(out.length === 4)
    // t=1: nr 6, d 2 -> S = 1·(1 − 2/6); Greenwood 2/(6·4)
    val s1 = 1.0 * (1.0 - 2.0 / 6.0)
    assert(out(0).getAs[Long]("n_risk") === 6L &&
      out(0).getAs[Long]("n_death") === 2L)
    assert(out(0).getAs[Double]("survival") === s1)
    assert(out(0).getAs[Double]("se") === s1 * math.sqrt(2.0 / 24.0))
    // t=2: censored-only — S unchanged, risk set shrinks
    assert(out(1).getAs[Long]("n_risk") === 4L &&
      out(1).getAs[Long]("n_censor") === 1L)
    assert(out(1).getAs[Double]("survival") === s1 * (1.0 - 0.0 / 4.0))
    // t=3: nr 3, d 2 -> S = S1·(1 − 2/3)
    val s3 = (s1 * (1.0 - 0.0 / 4.0)) * (1.0 - 2.0 / 3.0)
    assert(out(2).getAs[Long]("n_risk") === 3L)
    assert(out(2).getAs[Double]("survival") === s3)
    // t=4: last censored subject; curve flat
    assert(out(3).getAs[Long]("n_risk") === 1L &&
      out(3).getAs[Double]("survival") === s3 * (1.0 - 0.0 / 1.0))
    // Nelson–Aalen cumulative hazard rides the same fold
    assert(out(0).getAs[Double]("cum_hazard") === 0.0 + 2.0 / 6.0)
    assert(out(2).getAs[Double]("cum_hazard") ===
      (0.0 + 2.0 / 6.0 + 0.0 / 4.0) + 2.0 / 3.0)
    // d = n at a time: survival exactly 0, se NULL from there on —
    // but the hazard stays defined (d/n = 1)
    val all = Seq((1L, false), (1L, false), (2L, false)).toDF("t", "c")
    val o2 = graft.ops.WindowOps.kaplanMeier(col("t"), col("c"))(all)
      .orderBy("t").collect()
    assert(o2(0).getAs[Double]("survival") === 1.0 - 2.0 / 3.0)
    assert(o2(1).getAs[Double]("survival") === 0.0 &&
      o2(1).isNullAt(o2(1).fieldIndex("se")))
    assert(o2(1).getAs[Double]("cum_hazard") === 2.0 / 3.0 + 1.0 / 1.0)
    // NULL time or censored rows drop; groups stay independent
    val g = Seq(("a", 1L, false), ("a", 2L, true), ("b", 1L, true),
      ("b", 5L, false)).toDF("g", "t", "c")
    val og = graft.ops.WindowOps.kaplanMeier(col("t"), col("c"),
      Seq("g"))(g).orderBy("g", "t").collect()
    assert(og.length === 4)
    assert(og(0).getAs[Double]("survival") === 1.0 - 1.0 / 2.0)
    assert(og(2).getAs[Double]("survival") === 1.0 - 0.0 / 2.0)
    assert(og(3).getAs[Long]("n_risk") === 1L &&
      og(3).getAs[Double]("survival") === 1.0 * (1.0 - 1.0 / 1.0))
  }

  test("rmst: hand area under the KM steps, horizon clipping, negative-time raise") {
    import spark.implicits._
    // the kaplanMeier hand fixture: S = 2/3, 2/3, 2/9, 2/9 at t=1..4
    val d = Seq((1L, false), (1L, false), (2L, true), (3L, false),
      (3L, false), (4L, true)).toDF("t", "c")
    val s1 = 1.0 * (1.0 - 2.0 / 6.0)
    val s2 = s1 * (1.0 - 0.0 / 4.0)
    val s3 = s2 * (1.0 - 2.0 / 3.0)
    val s4 = s3 * (1.0 - 0.0 / 1.0)
    // tau = 3.5: full segments to t=3, half a step of S(3), no tail
    val r = graft.ops.WindowOps.rmst(col("t"), col("c"), tau = 3.5)(d)
      .head()
    assert(r.getAs[Long]("n") === 6L && r.getAs[Double]("tau") === 3.5)
    val exp35 = 0.0 +
      (1.0 * (1.0 - 0.0) + 0.0) + (s1 * (2.0 - 1.0) + 0.0) +
      (s2 * (3.0 - 2.0) + 0.0) + (s3 * (3.5 - 3.0) + s4 * (3.5 - 3.5))
    assert(r.getAs[Double]("rmst") === exp35)
    // tau past the last time adds the flat tail S(t_last)*(tau - t_last)
    val r10 = graft.ops.WindowOps.rmst(col("t"), col("c"), tau = 10.0)(d)
      .head().getAs[Double]("rmst")
    assert(r10 === 0.0 + (1.0 * (1.0 - 0.0) + 0.0) +
      (s1 * (2.0 - 1.0) + 0.0) + (s2 * (3.0 - 2.0) + 0.0) +
      (s3 * (4.0 - 3.0) + s4 * (10.0 - 4.0)))
    // tau inside the first step: only the leading S=1 sliver counts
    val rHalf = graft.ops.WindowOps.rmst(col("t"), col("c"), tau = 0.5)(d)
      .head().getAs[Double]("rmst")
    assert(rHalf === 0.5)
    // a negative time raises loudly (the origin-0 contract)
    val neg = Seq((-1L, false), (2L, false)).toDF("t", "c")
    val ex = intercept[Exception] {
      graft.ops.WindowOps.rmst(col("t"), col("c"), tau = 5.0)(neg)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("negative time")))
    intercept[IllegalArgumentException](
      graft.ops.WindowOps.rmst(col("t"), col("c"), tau = 0.0)(d))
  }

  test("survivalQuantile: median crossing, never-crossed NULL, q contract") {
    import spark.implicits._
    // S = 2/3, 2/3, 2/9, 2/9 at t=1..4: first S <= 0.5 is t=3
    val d = Seq((1L, false), (1L, false), (2L, true), (3L, false),
      (3L, false), (4L, true)).toDF("t", "c")
    val r = graft.ops.WindowOps.survivalQuantile(col("t"), col("c"))(d)
      .head()
    assert(r.getAs[Long]("n") === 6L && r.getAs[Double]("q") === 0.5)
    assert(r.getAs[Long]("t") === 3L)
    // a shallow quantile crosses at the first death time
    val r2 = graft.ops.WindowOps.survivalQuantile(col("t"), col("c"),
      q = 0.25)(d).head()
    assert(r2.getAs[Long]("t") === 1L)
    // a curve that never drops to 1-q reads NULL t honestly
    val shallow = Seq((1L, false), (2L, true), (3L, true), (4L, true))
      .toDF("t", "c")
    val rn = graft.ops.WindowOps.survivalQuantile(col("t"), col("c"))(
      shallow).head()
    assert(rn.getAs[Long]("n") === 4L && rn.isNullAt(rn.fieldIndex("t")))
    // per-group independence on the grouped path
    val g = Seq(("a", 1L, false), ("a", 2L, false), ("b", 1L, true),
      ("b", 2L, true)).toDF("g", "t", "c")
    val og = graft.ops.WindowOps.survivalQuantile(col("t"), col("c"),
      groupCols = Seq("g"))(g).orderBy("g").collect()
    assert(og(0).getAs[Long]("t") === 1L &&
      og(1).isNullAt(og(1).fieldIndex("t")))
    intercept[IllegalArgumentException](
      graft.ops.WindowOps.survivalQuantile(col("t"), col("c"), q = 1.0)(d))
  }
}
