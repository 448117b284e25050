package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portable DDSketch — relative-error quantiles with MERGEABLE
  * bounded state (Masson, Lee & Law, VLDB 2019). The missing member
  * of the portable sketch family beside [[Bloom]] (membership),
  * [[CountMin]] (frequency) and [[Hll]] (distinct count): "what is
  * p99 of this 100 TB column" without sorting it.
  *
  * A value x > 0 lands in bucket ceil(ln(x)/ln(γ)) — buckets are
  * geometric intervals (γ^{i−1}, γ^i], so the estimate 2γ^i/(1+γ)
  * is within relative error EXACTLY ±α at both bucket edges, where
  * γ = (1+α)/(1−α) (the paper's indexing — floor+arithmetic-midpoint
  * would leak to α/(1−α)). The sketch is just the per-bucket exact
  * count table:
  *
  *   - bounded: #buckets ≤ log_γ(max/min) — a few hundred for any
  *     physical quantity at α = 1% — regardless of row count;
  *   - one-pass and shuffle-light: the groupBy's key space is the
  *     bucket set, so map-side combine reduces every partition to
  *     sketch-sized rows before the only corpus shuffle;
  *   - mergeable by construction: bucket counts add — shard sketches
  *     re-aggregate to EXACTLY the global sketch (q_ddsketch_merged
  *     is the oracle-pinned proof), which is what makes it deployable
  *     per-executor / per-day / per-source and foldable later;
  *   - fully portable: bucketing is floor(ln·/lnγ) and counts are
  *     exact integers, so an external SQL engine replays the entire
  *     sketch AND every quantile read bit-for-bit (the ln divisor and
  *     the midpoint constant are inlined as JVM-printed doubles so
  *     both engines parse the identical IEEE value).
  *
  * Quantile read (rank semantics, 0-indexed): rank_k =
  * floor(q·(n−1)) in exact micro-integer arithmetic; the answer is
  * the first bucket whose cumulative count exceeds rank_k; the value
  * estimate is the bucket's 2γ^i/(1+γ) published in floored
  * CENTS (relative error is α anyway — cents keep the floor far from
  * any engine's 1-ulp exp() jitter).
  *
  * Values ≤ 0 are excluded by contract (DDSketch's log cannot see
  * them); callers with signed data sketch magnitudes per sign.
  *
  * Reference has no counterpart (extension track). Cf. Spark's own
  * approx_percentile (KLL-ish) — not portable, not replayable.
  */
object Quantiles {

  /** γ for a target relative accuracy α. */
  def gammaFor(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    (1.0 + alpha) / (1.0 - alpha)
  }

  /** Geometric bucket index: ceil(ln(x)/ln(γ)), x > 0. */
  def ddBucket(x: Column, gamma: Double): Column =
    ceil(log(x) / lit(math.log(gamma))).cast("long")

  /** The sketch: exact counts per geometric bucket, optionally keyed
    * by grouping columns (per-window / per-source sketches). State is
    * groups × buckets rows; the shuffle is map-side combined to that.
    */
  def ddSketch(df: DataFrame, valueCol: String, gamma: Double,
               groupCols: Seq[String] = Seq.empty): DataFrame = {
    val keyed = df.filter(col(valueCol) > 0)
      .withColumn("bucket", ddBucket(col(valueCol), gamma))
    keyed.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold shard sketches into one — bucket counts add. The proof
    * that per-shard sketching ≡ global sketching is associativity of
    * the count aggregate; q_ddsketch_merged pins it against the
    * oracle.
    */
  def mergeSketches(sketches: Seq[DataFrame],
                    groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(sketches.nonEmpty, "mergeSketches: no sketches")
    sketches.reduce(_.unionByName(_))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile reads from a sketch: one row per (group, q_micro) with
    * the 0-indexed rank, the answering bucket, its counts and the
    * midpoint estimate in floored cents. The cumulative walk is a
    * window over the SKETCH (a few hundred rows per group), never the
    * data.
    */
  def ddQuantiles(sketch: DataFrame, gamma: Double, qMicros: Seq[Long],
                  groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(qMicros.nonEmpty && qMicros.forall(q => q >= 0 && q < 1000000L),
      s"qMicros must be in [0, 1e6), got $qMicros")
    val spark = sketch.sparkSession
    import spark.implicits._
    val part = groupCols.map(col)
    // ungrouped reads: the same bounded single partition, but through
    // a non-foldable constant key (Frames.tinyWindow) so WindowExec
    // does not warn on every sketch read
    val cumW = (if (part.isEmpty) Frames.tinyWindow(col("bucket"), col("bucket"))
                else Window.partitionBy(part: _*).orderBy(col("bucket")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = if (part.isEmpty) Frames.tinyWindowTotal(col("bucket"))
               else Window.partitionBy(part: _*)
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(totW))
    val qdf = qMicros.toDF("q_micro")
    val lnG = math.log(gamma)
    val midC = 100.0 * 2.0 / (1.0 + gamma)
    cum.join(broadcast(qdf),
        col("cum") > expr("q_micro * (n - 1) div 1000000"))
      .groupBy((groupCols :+ "q_micro").map(col): _*)
      .agg(min(struct(col("bucket"), col("cnt"), col("cum"), col("n"))).as("m"))
      .select((groupCols.map(col) ++ Seq(
        col("q_micro"),
        expr("q_micro * (m.n - 1) div 1000000").as("rank_k"),
        col("m.bucket").as("bucket"),
        col("m.cnt").as("cnt"),
        col("m.cum").as("cum"),
        col("m.n").as("n"),
        floor(lit(midC) *
          exp(col("m.bucket").cast("double") * lit(lnG)))
          .cast("long").as("est_cents"))): _*)
  }

  /** JVM-printed double literal for oracle SQL interpolation — both
    * engines parse the identical IEEE value.
    */
  def sqlDouble(d: Double): String = {
    val s = d.toString
    require(s.toDouble == d, s"double literal does not round-trip: $s")
    s
  }
}
