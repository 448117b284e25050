package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB posture.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins;
  * salting is the explicit tool for aggregate skew and for joins
  * whose hot keys are known or measurable. Both helpers keep the
  * transformation declarative so Catalyst still prunes/pushes around
  * them.
  */
object Skew {

  /** Join types for which salting is output-equivalent to the plain
    * join: unmatched RIGHT rows never survive these, so exploding the
    * right side saltFactor ways cannot duplicate output. right/full
    * outer would emit each unmatched right row once per salt.
    */
  private val SaltSafeJoinTypes =
    Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")

  /** Salted equi-join: the skewed (large, hot-keyed) left side gets a
    * random salt in [0, saltFactor); the right side is exploded
    * saltFactor ways so every (key, salt) pair finds its match. Hot
    * keys then spread over saltFactor reducers instead of one.
    * Right side grows saltFactor× — use for dimension-ish right
    * sides, or pre-filter to the known-hot keys.
    *
    * Restricted to inner/left-flavored join types: for right or full
    * outer joins the exploded right side would surface unmatched
    * right rows saltFactor times (salt the other side instead).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    require(SaltSafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched right rows " +
        s"saltFactor times; supported: inner/cross/left/left_semi/left_anti")
    val saltedLeft = left.withColumn("__salt",
      (rand(seed = 42L) * saltFactor).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase (partial + final) aggregation with an explicit salt —
    * for the rare aggregate whose combiner state is large enough that
    * one hot key overwhelms a single reducer even with map-side
    * partial aggregation. `partialAggs` must be re-aggregatable
    * (sum/count/min/max style).
    */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
                partialAggs: Seq[(String, Column)],
                finalAggs: Seq[(String, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", (rand(seed = 42L) * saltFactor).cast("int"))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(partialAggs.head._2.as(partialAggs.head._1),
        partialAggs.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(col(key))
      .agg(finalAggs.head._2(col(finalAggs.head._1)).as(finalAggs.head._1),
        finalAggs.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }

  /** Bloom-prefiltered semi-join: build a Bloom filter over the small
    * side's keys (driver-collected, broadcast — millions of keys fit
    * in MBs), drop big-side rows that cannot match BEFORE the
    * shuffle, then run the exact left_semi join on the survivors.
    * Output-identical to the plain semi-join (false positives only
    * pass the pre-filter, never the join); the win is shuffle volume
    * ∝ matching keys + fpp instead of the whole big side. The same
    * shape Spark's runtime row-level filtering applies to shuffle
    * joins, here as an explicit operator usable on any plan.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
                    expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.functions.udf
    import org.apache.spark.sql.types._
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    // stat.bloomFilter only supports integral and string keys — match
    // its hashing exactly on the probe side
    val mightContain = big.schema(key).dataType match {
      case StringType => udf((v: String) => bc.value.mightContainString(v))
      case ByteType | ShortType | IntegerType | LongType =>
        udf((v: Long) => bc.value.mightContainLong(v))
      case t => throw new IllegalArgumentException(
        s"bloomSemiJoin: unsupported key type $t (integral or string only)")
    }
    big.filter(col(key).isNotNull && mightContain(col(key).cast(
        if (big.schema(key).dataType == StringType) StringType else LongType)))
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  /** Top-N heavy keys with counts — the measurement step before
    * deciding to salt. One pass, partial-aggregated.
    */
  def hotKeys(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)

  /** Two-path salted join — the production skew pattern: measure the
    * hot keys (one cheap aggregate), salt ONLY the rows carrying
    * them, and run the cold majority through a plain equi-join. The
    * right side is exploded saltFactor ways only for the hot keys, so
    * the blow-up is bounded by |hotKeys| x saltFactor rows instead of
    * |right| x saltFactor. Output-equal to a plain join (asserted in
    * tests); same join-type restriction as [[saltedJoin]].
    */
  def saltedJoinHotKeys(left: DataFrame, right: DataFrame, key: String,
                        saltFactor: Int, topN: Int = 20,
                        joinType: String = "inner"): DataFrame = {
    val hot = hotKeys(left, key, topN).select(col(key)).collect()
      .map(_.get(0)).filter(_ != null).toIndexedSeq
    if (hot.isEmpty) left.join(right, Seq(key), joinType)
    else {
      // null-safe hot test: isin(null) is NULL, which would make BOTH
      // path filters reject null-key left rows — under a left join
      // those rows must survive (on the cold path; null never
      // equi-matches, so cold is also where they belong)
      val isHot = coalesce(col(key).isin(hot: _*), lit(false))
      // the cold path keeps the full right side: right rows with hot
      // keys simply find no cold-left partner in an equi-join
      val coldJoin = left.filter(!isHot).join(right, Seq(key), joinType)
      val hotJoin = saltedJoin(left.filter(isHot), right.filter(isHot),
        key, saltFactor, joinType)
      coldJoin.unionByName(hotJoin)
    }
  }
}
