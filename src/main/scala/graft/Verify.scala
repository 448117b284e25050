package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query subset]
    // (the driver passes two; the subset is a local iteration aid and
    // also filters oracle_sql.json so check_oracle.py sees a
    // consistent pair)
    val (sfDir, outDir) = (args(0), args(1))
    val subset: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query wall-clock budget (mirrors Bench): one pathological
    // plan cannot stall the whole correctness dump
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    // queries that failed to dump: name -> error message. Written to
    // errors.json so a failure is an explicit artifact the downstream
    // compare can surface, never a silently-missing key (a round-5
    // schema regression hid 20 failing queries exactly this way).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => subset.forall(_(name)) }
      .foreach { case (name, fn) =>
      val task = pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try task.get(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          task.cancel(true)
          errors(name) = s"timeout after ${timeoutSec}s"
          System.err.println(s"[verify] $name failed: timeout after ${timeoutSec}s")
        case e: Throwable =>
          val cause = Option(e.getCause).getOrElse(e)
          errors(name) = s"${cause.getClass.getSimpleName}: ${Option(cause.getMessage).getOrElse("")}"
          System.err.println(s"[verify] $name failed: ${cause.getMessage}")
      }
      // several operators persist intermediates the returned plan still
      // references; left alone they accumulate across the ~100-query
      // dump and squeeze execution memory (same pathology Bench clears)
      spark.sharedState.cacheManager.clearCache()
    }
    pool.shutdownNow()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => subset.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // explicit failure manifest — always written (possibly "{}") so the
    // driver can distinguish "no failures" from "file never produced"
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size}/${SparkEntry.queries.size} queries FAILED to dump: ${errors.keys.mkString(", ")}")
    }
    spark.stop()
  }
}
