package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class EntrySkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("driver t1 smoke: entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query analyzes (schema known without execution)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, TestSpark.sfDir).schema
      assert(schema.nonEmpty, s"$name has empty schema")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("saltedJoin matches plain join results") {
    val left = (1 to 1000).map(i => (if (i < 900) "hot" else s"k$i", i)).toDF("k", "v")
    val right = Seq(("hot", "H"), ("k950", "A")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain === salted)
  }

  test("saltedJoin matches plain left join (unmatched left rows kept once)") {
    val left = (1 to 200).map(i => (if (i < 150) "hot" else s"k$i", i)).toDF("k", "v")
    val right = Seq(("hot", "H")).toDF("k", "tag")
    val plain = left.join(right, Seq("k"), "left")
      .agg(count(lit(1)), sum("v"), count("tag")).head()
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 4, joinType = "left")
      .agg(count(lit(1)), sum("v"), count("tag")).head()
    assert(plain === salted)
  }

  test("saltedJoin refuses right/full outer (would duplicate unmatched right rows)") {
    val l = Seq(("a", 1)).toDF("k", "v")
    val r = Seq(("a", "x"), ("b", "y")).toDF("k", "tag")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, r, "k", saltFactor = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, r, "k", saltFactor = 4, joinType = "full_outer")
    }
  }

  test("saltedJoinHotKeys (two-path) matches the plain join") {
    val left = (1 to 2000).map(i =>
      (if (i < 1500) "hot" else if (i < 1800) "warm" else s"k$i", i)).toDF("k", "v")
    val right = Seq(("hot", "H"), ("warm", "W"), ("k1900", "C")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).agg(count(lit(1)), sum("v"), count("tag")).head()
    val two = Skew.saltedJoinHotKeys(left, right, "k", saltFactor = 4, topN = 2)
      .agg(count(lit(1)), sum("v"), count("tag")).head()
    assert(plain === two)
    // left-join flavor: unmatched cold keys survive exactly once
    val plainL = left.join(right, Seq("k"), "left").agg(count(lit(1)), count("tag")).head()
    val twoL = Skew.saltedJoinHotKeys(left, right, "k", saltFactor = 4, topN = 2,
      joinType = "left").agg(count(lit(1)), count("tag")).head()
    assert(plainL === twoL)
  }

  test("saltedJoinHotKeys keeps null-key left rows under a left join") {
    val left = (Seq.fill(50)("hot") ++ Seq("k1", null, null)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "v")
    val right = Seq(("hot", "H")).toDF("k", "tag")
    val plain = left.join(right, Seq("k"), "left")
      .agg(count(lit(1)), count("tag")).head()
    val two = Skew.saltedJoinHotKeys(left, right, "k", saltFactor = 4, topN = 1,
      joinType = "left").agg(count(lit(1)), count("tag")).head()
    assert(plain === two)
  }

  test("bloomSemiJoin equals the plain semi-join") {
    val big = (1L to 5000L).map(i => (i % 97, i)).toDF("k", "v")
    val small = Seq(3L, 11L, 96L).toDF("k")
    val plain = big.join(small, Seq("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Skew.bloomSemiJoin(big, small, "k", expectedItems = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain === bloom)

    // string keys go through mightContainString
    val bigS = (1 to 500).map(i => (s"k${i % 37}", i)).toDF("k", "v")
    val smallS = Seq("k3", "k11").toDF("k")
    val plainS = bigS.join(smallS, Seq("k"), "left_semi").count()
    val bloomS = Skew.bloomSemiJoin(bigS, smallS, "k", expectedItems = 100L).count()
    assert(plainS === bloomS)

    // unsupported key type rejected (stat.bloomFilter itself refuses
    // doubles at analysis time; our own guard covers any that slip)
    intercept[Exception] {
      Skew.bloomSemiJoin(Seq(1.5).toDF("k"), Seq(1.5).toDF("k"), "k")
    }
  }

  test("saltedAgg two-phase sums equal direct aggregation") {
    val df = (1 to 5000).map(i => (if (i % 10 == 0) "cold" + i else "hot", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, "k", saltFactor = 8,
      partialAggs = Seq("s" -> sum(col("v")), "n" -> count(lit(1))),
      finalAggs = Seq("s" -> ((c: org.apache.spark.sql.Column) => sum(c)),
        "n" -> ((c: org.apache.spark.sql.Column) => sum(c))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct === salted)
  }

  test("hotKeys surfaces the heavy hitter first") {
    val df = (1 to 100).map(i => if (i < 80) "hot" else s"k$i").toDF("k")
    val top = Skew.hotKeys(df, "k", 3).collect()
    assert(top.head.getString(0) === "hot" && top.head.getLong(1) === 79L)
  }

  test("bucketed tables join without a shuffle Exchange") {
    import graft.operators.Bucketing
    val o = Tables.table(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.table(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_quantity").withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(li, "b_lineitem", "o_orderkey", 4, Seq("o_orderkey"))
    // broadcast disabled: only bucket co-location can avoid the
    // shuffle, so this asserts the real payoff (SMJ, no Exchange)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(Bucketing.isShuffleFree(joined),
        "bucketed join should plan without Exchange:\n" + joined.queryExecution.executedPlan)
      assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
      // results match the plain join; the un-bucketed join DOES shuffle
      assert(joined.count() === o.join(li, Seq("o_orderkey")).count())
      assert(!Bucketing.isShuffleFree(o.join(li, Seq("o_orderkey"))))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
