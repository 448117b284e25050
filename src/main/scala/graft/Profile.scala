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
    // runs 1-3 drop the cache first (Bench's conditions: codegen-warm
    // after run1, cache-cold); runs 4-5 keep it (steady-state)
    for (name <- names; i <- 1 to 5) {
      if (i <= 3) spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val mode = if (i <= 3) "cache-cold" else "cache-warm"
      println(f"[profile] $name run$i ($mode): ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
