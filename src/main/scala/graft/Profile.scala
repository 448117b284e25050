package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): runs the
  * named queries N times each in one session to split plan/codegen
  * compile cost from steady-state execution.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
