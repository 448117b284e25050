package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column utilities for training-data pipelines: L2
  * normalization, per-group mean pooling (centroids), and int8
  * quantization. All per-row work is expression-level (no UDFs); the
  * only shuffle is the mean-pool aggregation, which moves quantized
  * longs — exact, order-independent addition, so results are
  * reproducible cluster-or-laptop (and DuckDB-oracle-checkable).
  */
object Embeddings {

  /** float[] -> double[] (element-wise widen; all math in doubles). */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** L2 norm via a sequential left fold — deterministic IEEE order. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(asDouble(v), lit(0.0), (acc, x) => acc + x * x))

  /** L2-normalize `vecCol` into `outCol`. DataFrame-level so the norm
    * is computed ONCE per row (a Column-level normalize would clone
    * the fold into every element's division). Zero vectors -> null.
    */
  def normalized(df: DataFrame, vecCol: String, outCol: String = "normalized"): DataFrame =
    df.withColumn("__norm", nullif(l2Norm(col(vecCol)), lit(0.0)))
      .withColumn(outCol, transform(asDouble(col(vecCol)), x => x / col("__norm")))
      .drop("__norm")

  /** Per-group mean-pooled centroids, exact: elements are quantized
    * to 1e-6 steps (floor(x*1e6+0.5)) and summed as longs — addition
    * commutes, so the shuffle order cannot change the result — then
    * divided back at the end. Output: (key, pos, sum_q6, n, centroid)
    * one row per (group, dimension); `assembled` regroups to arrays.
    */
  def meanPoolQuantized(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol), posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy(col(keyCol), col("pos"))
      .agg(sum(floor(col("x") * lit(1000000.0) + lit(0.5)).cast(LongType)).as("sum_q6"),
        count(lit(1)).as("n"))
      .withColumn("centroid",
        col("sum_q6").cast(DoubleType) / col("n").cast(DoubleType) / lit(1000000.0))

  /** [[meanPoolQuantized]] regrouped into one centroid array per key. */
  def meanPoolVectors(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    meanPoolQuantized(df, keyCol, vecCol)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("centroid")))).as("pc"))
      .select(col(keyCol), transform(col("pc"), p => p.getField("centroid")).as("centroid"))

  /** Symmetric int8 quantization: scale = 127 / max|x| per vector,
    * codes = clamp(floor(x*scale + 0.5), -127, 127) (floor(+0.5) =
    * half-up — identical in any engine, unlike round()'s tie rules).
    * Zero vectors quantize to all-zero codes with null scale.
    */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   scaleCol: String = "scale", codesCol: String = "codes"): DataFrame =
    df.withColumn(scaleCol,
        lit(127.0) / nullif(array_max(transform(asDouble(col(vecCol)), x => abs(x))), lit(0.0)))
      .withColumn(codesCol,
        transform(asDouble(col(vecCol)), x =>
          when(col(scaleCol).isNull, lit(0))
            .otherwise(greatest(lit(-127L), least(lit(127L),
              floor(x * col(scaleCol) + lit(0.5)))).cast(IntegerType))))

  /** Mean squared reconstruction error of int8 codes vs the original
    * vector — the quality gauge for the quantization. Sequential
    * fold, deterministic.
    */
  def dequantMse(vec: Column, codes: Column, scale: Column): Column =
    aggregate(zip_with(asDouble(vec), codes, (x, c) =>
        (x - c.cast(DoubleType) / scale) * (x - c.cast(DoubleType) / scale)),
      lit(0.0), (acc, e) => acc + e) / size(vec).cast(DoubleType)
}
