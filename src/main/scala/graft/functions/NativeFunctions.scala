package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}

/** Column wrappers for graft's native Catalyst expressions. */
object NativeFunctions {
  /** Fused-loop cosine similarity over two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlShims.column(
      CosineSimilarity(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))
}
