package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Frames, Temporal}

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin backward picks the latest right row at-or-before, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 08:30:00")),
      (3L, 10L, ts("2024-01-01 07:00:00")),  // before any right row
      (4L, 11L, ts("2024-01-01 10:00:00"))   // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 100L),
      (10L, ts("2024-01-01 09:30:00"), 101L),
      (10L, ts("2024-01-01 10:00:00"), 102L)  // equal ts: inclusive
    ).toDF("user_id", "click_ts", "click_id")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "click_ts")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(out === Array((1L, 102L), (2L, 100L), (3L, -1L), (4L, -1L)))
  }

  test("asofJoin forward mirrors backward; tolerance voids distant matches") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 11:00:00"), 200L))
      .toDF("user_id", "click_ts", "click_id")
    val fwd = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "click_ts",
      direction = "forward").collect()
    assert(fwd.head.getLong(4) === 200L)
    val tight = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "click_ts",
      direction = "forward", toleranceSeconds = Some(1800L)).collect()
    assert(tight.head.isNullAt(4))
  }

  test("asofJoin nearest: smallest absolute gap, ties to backward, per-side tolerance") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // back 30m vs fwd 20m -> fwd
      (2L, 10L, ts("2024-01-01 09:40:00")),  // back 10m vs fwd 40m -> back
      (3L, 10L, ts("2024-01-01 09:55:00")),  // equidistant 25m -> backward wins
      (4L, 10L, ts("2024-01-01 08:00:00")),  // only forward exists
      (5L, 11L, ts("2024-01-01 10:00:00"))   // no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 100L),
      (10L, ts("2024-01-01 10:20:00"), 101L)
    ).toDF("user_id", "click_ts", "click_id")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "click_ts",
        direction = "nearest")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(out === Array((1L, 101L), (2L, 100L), (3L, 100L), (4L, 100L), (5L, -1L)))
    // tolerance voids each side independently: 15m keeps nothing for
    // event 1 (both gaps > 15m) but keeps event 2's 10m backward match
    val tol = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "click_ts",
        direction = "nearest", toleranceSeconds = Some(900L))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(tol === Array((1L, -1L), (2L, 100L), (3L, -1L), (4L, -1L), (5L, -1L)))
  }

  test("asofJoin tolerance is microsecond-exact at the sub-second boundary") {
    // gap = tol + 0.4 s: unix_timestamp-based gaps TRUNCATE the 0.4 s
    // and would admit the match; the unix_micros comparison must
    // reject it in ALL THREE directions. gap = tol exactly must be
    // admitted (inclusive) in all three.
    val tol = 60L
    def lf = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    def rightAt(t: String, id: Long) =
      Seq((10L, java.sql.Timestamp.valueOf(t), id)).toDF("user_id", "click_ts", "click_id")
    val over = "2024-01-01 09:58:59.6"   // 60.4 s before left
    val overF = "2024-01-01 10:01:00.4"  // 60.4 s after left
    val exact = "2024-01-01 09:59:00"    // exactly 60 s before
    val exactF = "2024-01-01 10:01:00"   // exactly 60 s after
    for ((dir, t) <- Seq(("backward", over), ("forward", overF),
                         ("nearest", over), ("nearest", overF))) {
      val out = Temporal.asofJoin(lf, rightAt(t, 500L), Seq("user_id"),
        "ts", "click_ts", direction = dir, toleranceSeconds = Some(tol)).collect()
      assert(out.head.isNullAt(4), s"$dir admitted gap=tol+0.4s ($t)")
    }
    for ((dir, t) <- Seq(("backward", exact), ("forward", exactF),
                         ("nearest", exact), ("nearest", exactF))) {
      val out = Temporal.asofJoin(lf, rightAt(t, 501L), Seq("user_id"),
        "ts", "click_ts", direction = dir, toleranceSeconds = Some(tol)).collect()
      assert(!out.head.isNullAt(4) && out.head.getLong(4) === 501L,
        s"$dir rejected gap=tol exactly ($t)")
    }
    // nearest with BOTH sides out of tolerance yields no match even
    // though an untoleranced nearest would pick the backward one
    val both = rightAt(over, 502L).unionByName(rightAt(overF, 503L))
    val n = Temporal.asofJoin(lf, both, Seq("user_id"), "ts", "click_ts",
      direction = "nearest", toleranceSeconds = Some(tol)).collect()
    assert(n.head.isNullAt(4), "nearest admitted an out-of-tolerance side")
  }

  test("asofJoin: null-key rows never match (SQL equality semantics)") {
    val left = Seq(
      (1L, Some(10L), ts("2024-01-01 10:00:00")),
      (2L, None: Option[Long], ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), ts("2024-01-01 09:00:00"), 100L),
      (None: Option[Long], ts("2024-01-01 09:30:00"), 999L)
    ).toDF("user_id", "click_ts", "click_id")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", "click_ts")
      .orderBy("event_id").collect()
    assert(out(0).getLong(4) === 100L)     // normal match
    assert(out(1).isNullAt(4))             // null-key left row: kept, unmatched
    assert(out.length === 2)
  }

  test("asofJoin equals the per-row max-subquery formulation on real events") {
    val ev = Tables.table(spark, TestSpark.sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = Frames.uniqueFirst(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id")),
      Seq("user_id", "click_ts"), Seq(col("click_id")))
    val got = Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts")
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // naive reference: join all earlier clicks, keep the latest
    val naive = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("p.ts") >= col("c.click_ts"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max(struct(col("c.click_ts"), col("c.click_id"))).as("m"))
      .select(col("event_id"), col("m.click_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === naive)
  }

  test("rangeJoinBucketed equals the BETWEEN theta-join") {
    val points = Seq(
      (1L, 5L, ts("2024-01-01 10:30:00")),
      (2L, 5L, ts("2024-01-01 13:00:00")),
      (3L, 6L, ts("2024-01-01 10:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (5L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (5L, 101L, ts("2024-01-01 12:59:00"), ts("2024-01-01 14:00:00"))
    ).toDF("user_id", "session_id", "session_start", "session_end")
    val got = Temporal.rangeJoinBucketed(points, intervals, Seq("user_id"),
      "ts", "session_start", "session_end")
      .select("event_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, Seq("user_id"))
      .filter(col("ts") >= col("session_start") && col("ts") <= col("session_end"))
      .select("event_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got === Set((1L, 100L), (2L, 101L)))
  }

  test("connectedComponents labels every vertex with its cluster minimum") {
    val vertices = (1L to 8L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 6L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L))
  }

  test("connectedComponents union-find path equals label propagation") {
    val rnd = new scala.util.Random(7)
    val vertices = (1L to 400L).toDF("id")
    // random sparse graph + a long chain (stresses multi-round propagation)
    val edges = (Seq.fill(120)((rnd.nextInt(400) + 1L, rnd.nextInt(400) + 1L)) ++
      (300L until 340L).map(i => (i, i + 1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.connectedComponentsPropagation(vertices, edges, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
  }

  test("connectedComponents: empty edge set, duplicate edges, dense cliques") {
    // empty edges: every vertex is its own component (the driver
    // path's empty labels frame must still coalesce correctly)
    val vs = (1L to 5L).toDF("id")
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(vs, none)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      (1L to 5L).map(i => i -> i).toMap)
    // duplicate + reversed edges and two dense cliques (the replica-
    // corpus shape the primitive union-find was rebuilt for): labels
    // must be each clique's minimum id, and agree with propagation
    val cliqueA = for { a <- 10L to 29L; b <- 10L to 29L if a < b } yield (a, b)
    val cliqueB = for { a <- 50L to 69L; b <- 50L to 69L if a < b } yield (a, b)
    val edges = (cliqueA ++ cliqueB ++ cliqueA.map(_.swap) ++ cliqueA)
      .toDF("id_a", "id_b")
    val verts = ((10L to 29L) ++ (50L to 69L) :+ 99L).toDF("id")
    val fast = Dedup.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 29L).forall(fast(_) == 10L))
    assert((50L to 69L).forall(fast(_) == 50L))
    assert(fast(99L) === 99L)
    val slow = Dedup.connectedComponentsPropagation(verts, edges, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
  }

  test("dedupByNearDup keeps exactly one doc per near-dup cluster") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (9L, "z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByNearDup(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 9L))
  }

  test("stratifiedSampleDeterministic is partitioning-invariant and per-stratum sized") {
    val df = (1L to 20000L).map(i => (i, if (i % 3 == 0) "F" else "O")).toDF("id", "k")
    val frac = Map("F" -> 0.10, "O" -> 0.02)
    val s1 = Frames.stratifiedSampleDeterministic(df, "k", frac, "id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Frames.stratifiedSampleDeterministic(df.repartition(13), "k", frac, "id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    val byK = Frames.stratifiedSampleDeterministic(df, "k", frac, "id")
      .groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byK("F") / 6666.0 - 0.10) < 0.02)
    assert(math.abs(byK("O") / 13334.0 - 0.02) < 0.01)
  }

  test("cohortRetention: crafted churn matrix is exact; repeats collapse") {
    import graft.operators.Temporal
    // period length 100 s; (user, period) pairs with known churn:
    // cohort 0 = users 1,2,3 — u1 stays 3 periods, u2 two, u3 one;
    // cohort 1 = user 4, active in periods 1 and 3.
    // u1 has TWO events in period 0 (must collapse to one active).
    val evs = Seq(
      (1L, 5L), (1L, 95L), (1L, 105L), (1L, 210L),
      (2L, 10L), (2L, 150L),
      (3L, 20L),
      (4L, 130L), (4L, 350L)
    ).map { case (u, s) => (u, new java.sql.Timestamp(s * 1000L)) }
      .toDF("user_id", "ts")
    val got = Temporal.cohortRetention(evs, "user_id", "ts",
        periodSeconds = 100L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((3L, 3L, 1000000L)),
      (0L, 1L) -> ((2L, 3L, 666666L)),
      (0L, 2L) -> ((1L, 3L, 333333L)),
      (1L, 0L) -> ((1L, 1L, 1000000L)),
      (1L, 2L) -> ((1L, 1L, 1000000L))))
  }

  test("attributionFirstLast: window bound, ties by id, no-touch nulls, post-conv excluded") {
    import java.sql.Timestamp
    def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)
    // user 1: touch at t=0 (click), touch at t=100 (view), conv at
    // t=150 with window 120 -> t=0 OUTSIDE (150-120=30), first=last
    // window touch differs: first in-window = t=100 view... craft
    // richer: add a signup at t=100 too (same ts, larger id) to pin
    // the tie-break; a click at t=200 AFTER the conversion must not
    // attribute. user 2: conversion with no touches -> nulls.
    val ev = Seq(
      (1L, 1L, "click", ts(0)),
      (2L, 1L, "view", ts(100)),
      (3L, 1L, "signup", ts(100)),
      (4L, 1L, "purchase", ts(150)),
      (5L, 1L, "click", ts(200)),
      (6L, 2L, "purchase", ts(50)),
      // user 3: both touches inside the window, distinct ts
      (7L, 3L, "click", ts(10)),
      (8L, 3L, "view", ts(60)),
      (9L, 3L, "purchase", ts(100))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Temporal.attributionFirstLast(ev, "user_id", "ts",
        "event_type", "event_id", "purchase",
        Seq("click", "view", "signup"), windowSeconds = 120L)
      .collect().map(r => r.getLong(0) -> (
        (if (r.isNullAt(2)) -1L else r.getLong(2)),
        Option(r.getString(3)).getOrElse(""),
        (if (r.isNullAt(4)) -1L else r.getLong(4)),
        Option(r.getString(5)).getOrElse(""))).toMap
    // conv 4: t=0 click is outside [30, 150]; the t=100 pair ties on
    // ts -> first breaks to id 2 (view), last to id 3 (signup); the
    // t=200 click is after the conversion and never counts
    assert(out(4L) === ((2L, "view", 3L, "signup")))
    // conv 6: no touches at all -> all-null credit
    assert(out(6L) === ((-1L, "", -1L, "")))
    // conv 9: first = click@10, last = view@60
    assert(out(9L) === ((7L, "click", 8L, "view")))
  }
}
