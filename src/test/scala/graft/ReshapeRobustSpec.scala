package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-2 SQL-surface extensions (unpivot,
  * cube, range windows, forward fill, MAD outliers, fuzzy pairs,
  * transitions, gap fill) beyond their DuckDB hash oracles.
  */
class ReshapeRobustSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sf = TestSpark.sfDir

  test("unpivot emits exactly one row per (input row, value column)") {
    val n = Tables.table(spark, sf, "lineitem").count()
    val m = SparkEntry.queries("q_unpivot")(spark, sf).count()
    assert(m === n * 4)
  }

  test("cube contains the rollup subtotals plus column-2-only slices") {
    val rows = SparkEntry.queries("q_cube")(spark, sf).collect()
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys.contains(("ALL", "ALL")))
    // cube-only grouping set: (ALL, ls) for a real linestatus
    assert(keys.exists { case (rf, ls) => rf == "ALL" && ls != "ALL" })
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    val n = Tables.table(spark, sf, "lineitem").count()
    assert(grand.head.getAs[Long]("n") === n)
  }

  test("range-frame trailing sum equals a per-row correlated recount") {
    val out = SparkEntry.queries("q_window_range")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("tsec"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    ev.take(200).foreach { case (id, u, ts, _) =>
      val expect = byUser(u).filter(e => e._3 >= ts - 3600 && e._3 <= ts).map(_._4).sum
      assert(out(id) === expect, s"event $id")
    }
  }

  test("forward fill carries the last purchase value, null before any") {
    val out = SparkEntry.queries("q_fill_forward")(spark, sf).collect()
    val ev = Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("user_id"), col("ts"), col("event_id")).collect()
    val expected = scala.collection.mutable.HashMap[Long, Option[Double]]()
    val lastByUser = scala.collection.mutable.HashMap[Long, Option[Double]]()
    ev.foreach { r =>
      val u = r.getLong(1)
      if (r.getString(3) == "purchase") lastByUser(u) = Some(r.getDouble(4))
      expected(r.getLong(0)) = lastByUser.getOrElse(u, None)
    }
    out.foreach { r =>
      val got = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(got === expected(r.getLong(0)), s"event ${r.getLong(0)}")
    }
  }

  test("MAD outlier stats: known values on a hand-built group") {
    val df = Seq.tabulate(9)(i => ("P", (i + 1) * 100.0))
      .toDF("o_orderpriority", "o_totalprice")
    // cents: 10000..90000; median 50000; adev {40000,30000,...,0,...,40000}
    // MAD = 20000; outliers beyond 3*MAD=60000: none
    val cents = df.select(col("o_orderpriority"),
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("pc"))
    val med = cents.groupBy(col("o_orderpriority"))
      .agg(percentile(col("pc"), lit(0.5)).as("med_c"))
    val r = med.head()
    assert(r.getDouble(1) === 50000.0)
  }

  test("fuzzy pairs: symmetric blocking never pairs across first tokens") {
    val rows = SparkEntry.queries("q_fuzzy_pairs")(spark, sf).collect()
    rows.foreach { r =>
      val a = r.getString(0).split(" ")(0)
      val b = r.getString(1).split(" ")(0)
      assert(a === b)
      assert(r.getInt(2) <= 4 && r.getInt(2) >= 1)
    }
  }

  test("transition counts sum to (events - first event per user)") {
    val total = Tables.table(spark, sf, "events").count()
    val users = Tables.table(spark, sf, "events").select("user_id").distinct().count()
    val sumN = SparkEntry.queries("events_transitions")(spark, sf)
      .agg(sum("n")).head().getLong(0)
    assert(sumN === total - users)
  }

  test("gap fill covers the full day span densely and keeps real counts") {
    val out = SparkEntry.queries("events_gapfill")(spark, sf).collect()
    val types = out.map(_.getString(0)).distinct
    val perType = out.groupBy(_.getString(0)).map(_._2.length).toSet
    assert(perType.size === 1, "every type spans the same dense grid")
    val sumN = out.map(_.getLong(2)).sum
    assert(sumN === Tables.table(spark, sf, "events").count())
    assert(types.sorted === types)
  }
}
