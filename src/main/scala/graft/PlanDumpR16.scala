package graft

import org.apache.spark.sql.SparkSession

/** Round-16 optimization tooling: dump `explain("formatted")` for the
  * named queries to `plans/r16/<query>_<tag>.txt` — the before/after
  * plan evidence OPTIMIZATION_r16.md cites. Not part of the driver
  * contract.
  *
  * Usage: `runMain graft.PlanDumpR16 <tag> <query> [<query> ...]`
  * (SPARK_GRAFT_SF_DIR selects the data dir, default sf0.1 so the
  * plans match the bench's scale; AQE initial plans — the SAME form
  * Bench executes from.)
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR16 <tag> <query>...")
    val tag = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plans-r16")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("plans/r16")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).trim
      java.nio.file.Files.write(dir.resolve(s"${name}_${tag}.txt"),
        (txt + "\n").getBytes("UTF-8"))
      println(s"[plans-r16] wrote plans/r16/${name}_${tag}.txt")
    }
    spark.stop()
  }
}
