package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-suite codegen compile sweep: every declared query runs with
  * `spark.sql.codegen.fallback=false`, so malformed generated Java
  * from ANY expression fails the build loudly instead of silently
  * demoting its stage to interpreted execution (a 2-3x slowdown with
  * no functional signal — exactly how the PqAdcScore margin-stripping
  * bug shipped: results stayed correct, only the plan got slow).
  */
class CodegenCompileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every declared query executes with codegen fallback disabled") {
    val old = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try { fn(spark, TestSpark.sfDir).queryExecution.toRdd.count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(300)}") }
      }
      assert(failures.isEmpty,
        s"queries failed with codegen fallback disabled:\n${failures.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", old)
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
