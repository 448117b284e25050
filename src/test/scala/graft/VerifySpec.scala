package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for Verify's failure manifest — the round-6 mechanism that
  * makes a failing query an explicit artifact (errors.json) instead of
  * a silently-missing parquet dir. The manifest exists specifically to
  * catch silent failures, so its own emission path must not be able to
  * fail silently.
  */
class VerifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_verify").toString

  test("dumpQueries records failures, deletes their output, keeps good dumps") {
    val out = tempDir()
    // pre-seed stale output for the failing query: a prior run's
    // leftovers must not survive a failure (the driver's compare would
    // otherwise diff stale data that errors.json says is dead)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$out/q_bad/stale"))
    val queries = Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "q_good" -> ((s, _) => s.range(5).select(col("id"))),
      "q_bad" -> ((_, _) => throw new RuntimeException("boom\n\"quoted\"")),
      // analysis-time failures surface lazily inside the write job —
      // the manifest must catch those too, not just eager throws
      "q_bad_lazy" -> ((s, _) => s.range(1).selectExpr("no_such_col")))
    val errors = Verify.dumpQueries(spark, TestSpark.sfDir, out, queries, 60L)
    Verify.writeJsonMap(s"$out/errors.json", errors)

    assert(errors.keySet === Set("q_bad", "q_bad_lazy"))
    assert(errors("q_bad").contains("boom"))
    // good query still dumped and readable
    assert(spark.read.parquet(s"$out/q_good").count() === 5)
    // failed queries left NO output — on-disk state agrees with the manifest
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/q_bad")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/q_bad_lazy")))
    // the manifest is valid JSON with control chars and quotes escaped
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json"))
    assert(json.contains("\"q_bad\""))
    assert(json.contains("\\n") && json.contains("\\\""))
    assert(!json.contains("boom\n"), "raw newline would break json.load")
  }

  test("a clean run writes an empty manifest, not a missing file") {
    val out = tempDir()
    val errors = Verify.dumpQueries(spark, TestSpark.sfDir, out,
      Seq("q_ok" -> ((s, _) => s.range(3).select(col("id")))), 60L)
    Verify.writeJsonMap(s"$out/errors.json", errors)
    assert(errors.isEmpty)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json")) === "{}")
  }
}
