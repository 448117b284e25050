package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Embeddings

class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalized vectors have unit norm; zero vectors go null") {
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Embeddings.normalized(df, "embedding").orderBy("vec_id").collect()
    val v1 = out(0).getSeq[Double](2)
    assert(math.abs(v1(0) - 0.6) < 1e-12 && math.abs(v1(1) - 0.8) < 1e-12)
    assert(out(1).getSeq[Double](2).forall(_ == null) ||
      out(1).getSeq[java.lang.Double](2).forall(_ == null))
  }

  test("meanPoolVectors matches a naive per-position average (1e-6 quantized)") {
    val e = Tables.table(spark, TestSpark.sfDir, "embeddings")
    val pooled = Embeddings.meanPoolVectors(e, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val naive = e.select(col("label"), posexplode(Embeddings.asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("c"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    naive.foreach { case (l, vec) =>
      vec.zip(pooled(l)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 2e-6, s"label $l: $a vs $b") }
    }
  }

  test("meanPoolQuantized is partitioning-invariant (exact long sums)") {
    val e = Tables.table(spark, TestSpark.sfDir, "embeddings")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(key(Embeddings.meanPoolQuantized(e, "label", "embedding")) ===
      key(Embeddings.meanPoolQuantized(e.repartition(7), "label", "embedding")))
  }

  test("int8 quantization saturates at ±127 and reconstructs within bound") {
    val e = Tables.table(spark, TestSpark.sfDir, "embeddings").limit(200)
    val q = Embeddings.quantizeInt8(e, "embedding")
    val codes = q.select(explode(col("codes")).as("c")).agg(max(abs(col("c")))).head().getInt(0)
    assert(codes <= 127)
    // max element of each vector maps to exactly ±127
    val sat = q.select(size(filter(col("codes"), c => abs(c) === 127)).as("n")).agg(min("n")).head().getInt(0)
    assert(sat >= 1)
    val mse = q.select(Embeddings.dequantMse(col("embedding"), col("codes"), col("scale")).as("m"))
      .agg(max("m")).head().getDouble(0)
    // per-element error <= 0.5/scale; scale >= 127/max|x| keeps MSE tiny
    assert(mse < 1e-4, s"mse $mse")
  }
}
