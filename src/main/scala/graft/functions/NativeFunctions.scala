package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}

/** Column wrappers for graft's native Catalyst expressions. */
object NativeFunctions {
  /** Fused-loop cosine similarity over two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlShims.column(
      CosineSimilarity(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  /** Single-pass 63-bit SimHash over an array<string> token column. */
  def simhash(tokens: Column): Column =
    GraftSqlShims.column(SimHash(GraftSqlShims.expression(tokens)))

  /** Single-pass MinHash signature over an array<long> hash column. */
  def minhashSignature(hashes: Column, numHashes: Int, seed: Long = 42L): Column =
    GraftSqlShims.column(
      MinHashSignature(GraftSqlShims.expression(hashes), numHashes, seed))

  /** One-pass LSH bucket array (tables longs) for an array<float>. */
  def hyperplaneBuckets(v: Column, dim: Int, numPlanes: Int, tables: Int,
                        seed: Long = 42L): Column =
    GraftSqlShims.column(
      HyperplaneBuckets(GraftSqlShims.expression(v), dim, numPlanes, tables, seed))

  /** Bounded top-k aggregate column: array<struct<cos,id>> of the k
    * best (score desc, id asc) pairs; partial-aggregation friendly.
    */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    GraftSqlShims.column(
      TopKPairs(GraftSqlShims.expression(score), GraftSqlShims.expression(id), k)
        .toAggregateExpression())
}
