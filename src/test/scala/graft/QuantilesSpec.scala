package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quantiles

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val alpha = 0.01
  private val gamma = Quantiles.gammaFor(alpha)

  test("gammaFor: the DDSketch accuracy identity (gamma-1)/(gamma+1) == alpha") {
    assert(math.abs((gamma - 1) / (gamma + 1) - alpha) < 1e-12)
  }

  test("bucket midpoint estimates every value within relative error alpha") {
    val vals = Seq(0.01, 0.5, 1.0, 3.14159, 42.0, 901.82, 104997.88, 1e7)
    val df = vals.toDF("x")
    val r = df.select(col("x"),
        Quantiles.ddBucket(col("x"), gamma).as("b"))
      .collect()
    r.foreach { row =>
      val x = row.getDouble(0); val b = row.getLong(1)
      val est = math.exp(b * math.log(gamma)) * 2.0 / (1 + gamma)
      assert(math.abs(est - x) / x <= alpha + 1e-9,
        s"x=$x bucket=$b est=$est")
    }
  }

  test("quantile reads land within alpha of the exact quantile") {
    // deterministic skewed data: x_i = 1.0003^i spans ~3 decades
    val vals = (0 until 20000).map(i => math.pow(1.0003, i))
    val df = vals.toDF("x")
    val sk = Quantiles.ddSketch(df, "x", gamma)
    val out = Quantiles.ddQuantiles(sk, gamma,
        Seq(500000L, 900000L, 990000L))
      .orderBy("q_micro").collect()
    val sorted = vals.sorted
    Seq(0.5, 0.9, 0.99).zip(out).foreach { case (q, row) =>
      val exact = sorted((q * (vals.size - 1)).toLong.toInt)
      val est = row.getAs[Long]("est_cents") / 100.0
      assert(math.abs(est - exact) / exact <= alpha + 0.01,
        s"q=$q exact=$exact est=$est")
      // rank bookkeeping: the answering bucket's cum straddles rank_k
      val rank = row.getAs[Long]("rank_k")
      val cum = row.getAs[Long]("cum"); val cnt = row.getAs[Long]("cnt")
      assert(cum > rank && cum - cnt <= rank)
    }
  }

  test("shard merge == one-shot global sketch, row for row") {
    val df = (1 to 5000).map(i => (i % 7, (i % 997) + 0.25)).toDF("k", "x")
    val global = Quantiles.ddSketch(df, "x", gamma)
      .orderBy("bucket").collect()
    val shards = (0 until 7).map(i =>
      Quantiles.ddSketch(df.filter(col("k") === i), "x", gamma))
    val merged = Quantiles.mergeSketches(shards)
      .orderBy("bucket").collect()
    assert(merged.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      global.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("grouped sketch == per-group independent sketches") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", i * 0.5)).toDF("g", "x")
    val grouped = Quantiles.ddQuantiles(
        Quantiles.ddSketch(df, "x", gamma, groupCols = Seq("g")),
        gamma, Seq(500000L), groupCols = Seq("g"))
      .orderBy("g").collect()
    (0 until 3).foreach { i =>
      val solo = Quantiles.ddQuantiles(
          Quantiles.ddSketch(df.filter(col("g") === s"g$i"), "x", gamma),
          gamma, Seq(500000L)).collect().head
      val g = grouped(i)
      assert(g.getAs[Long]("bucket") === solo.getAs[Long]("bucket"))
      assert(g.getAs[Long]("n") === solo.getAs[Long]("n"))
      assert(g.getAs[Long]("est_cents") === solo.getAs[Long]("est_cents"))
    }
  }

  test("non-positive values excluded; empty sketch reads empty") {
    val df = Seq(-1.0, 0.0, 2.0).toDF("x")
    val sk = Quantiles.ddSketch(df, "x", gamma)
    assert(sk.agg(sum("cnt")).collect().head.getLong(0) === 1L)
    val empty = Quantiles.ddSketch(Seq(-5.0).toDF("x"), "x", gamma)
    assert(Quantiles.ddQuantiles(empty, gamma, Seq(500000L)).isEmpty)
  }

  test("deterministic under repartition (exact integer sketch)") {
    val df = (1 to 4000).map(i => i + 0.125).toDF("x")
    val a = Quantiles.ddQuantiles(
      Quantiles.ddSketch(df.repartition(17), "x", gamma), gamma,
      Seq(500000L, 999000L)).orderBy("q_micro").collect().toSeq
    val b = Quantiles.ddQuantiles(
      Quantiles.ddSketch(df.coalesce(1), "x", gamma), gamma,
      Seq(500000L, 999000L)).orderBy("q_micro").collect().toSeq
    assert(a === b)
  }
}
