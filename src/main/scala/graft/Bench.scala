package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

/** Per-round benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, one JSON line to stdout.
  *
  * Each query runs under a wall-clock budget (default 120 s,
  * SPARK_GRAFT_QUERY_TIMEOUT_SEC to override): on timeout the
  * query's Spark jobs are cancelled via its job group and the query
  * records -1 — one pathological plan cannot eat the whole round.
  */
/** Per-run throwaway warehouse dirs for the driver mains (Bench and
  * Verify). Each run gets an empty dir under java.io.tmpdir, deleted
  * on JVM exit — session state can no longer leak between rounds or
  * between mains through cwd's spark-warehouse.
  * SPARK_GRAFT_WAREHOUSE overrides (local debugging of artifacts).
  */
object BenchWarehouse {
  def freshDir(tag: String): String =
    sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", {
      val p = java.nio.file.Files.createTempDirectory(s"graft_wh_${tag}_")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(p.toFile)
      }
      p.toString
    })
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "120").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // fresh per-run warehouse: the default cwd spark-warehouse
      // accumulates index artifacts across rounds AND across
      // Verify/ScaleSmoke runs (measured 566 MB / 540 tables by round
      // 11), so "cold" bench numbers depended on what earlier runs
      // left behind — stale-dir stats during writes, and cached-index
      // queries silently skipping their build when a prior run's
      // table happened to survive. A throwaway dir makes every bench
      // run start from the SAME empty state: pass 1 is honestly cold
      // (builds included), pass 2 honestly warm.
      .config("spark.sql.warehouse.dir", BenchWarehouse.freshDir("bench"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warm-up: JIT/codegen compilation, parquet footer reads
    // and FS metadata are one-time session costs — without this the
    // first timed query absorbs them all (~3 s of noise at sf0.1).
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings", "events")
      .foreach { tbl =>
        try Tables.table(spark, sfDir, tbl).limit(1).collect()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $tbl skipped: ${e.getMessage}") }
      }

    // Local iteration aid: SPARK_GRAFT_ONLY=q1,q2 times a subset
    // (driver leaves it unset -> full run).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // Steady-state warm-up: run every selected query once, untimed, at
    // the smallest scale factor. The generated code for a query is
    // path-independent, so this fills the codegen cache and lets the
    // JVM JIT the exact operator paths the timed runs execute —
    // the timed section then measures engine THROUGHPUT (the quantity
    // that survives a 1000-executor scale-up), not one-time Janino/JIT
    // compilation that amortizes to zero on any real workload.
    // SPARK_GRAFT_WARMUP=0 disables; a missing sf0.001 dir skips.
    val warmDir = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0" &&
        warmDir != sfDir && new java.io.File(warmDir).isDirectory) {
      val t0 = System.nanoTime()
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_(n)) }
        .foreach { case (name, fn) =>
          try fn(spark, warmDir).queryExecution.toRdd.count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] warmup $name skipped: ${e.getMessage}") }
        }
      System.err.println(f"[bench] sf0.001 warmup pass: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // the warmup pass persists the same LSH/dedup intermediates the
      // timed queries do — drop them so the FIRST timed query starts
      // from the same clean slate the per-query clearCache gives the rest
      spark.sharedState.cacheManager.clearCache()
    }
    // name-sorted: Map iteration order is hash-arbitrary, which made
    // run order — and which dedup query pays the shared signature
    // cache's materialization — differ between runs
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names(n) })
      .toSeq.sortBy(_._1)

    val pool = Executors.newSingleThreadExecutor()
    def timedPass(): Seq[(String, Double)] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val task = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          // materialize the FULL result (every projected column, the
          // declared ordering) — df.count() would let Catalyst prune
          // computed columns and drop sorts, timing a different query
          // than Verify writes
          try fn(spark, sfDir).queryExecution.toRdd.count()
          finally spark.sparkContext.clearJobGroup()
        }
      })
      val ok =
        try { task.get(timeoutSec, TimeUnit.SECONDS); true }
        catch {
          case _: TimeoutException =>
            spark.sparkContext.cancelJobGroup(name)
            task.cancel(true)
            System.err.println(s"[bench] $name timed out after ${timeoutSec}s")
            false
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // Several operators persist intermediates (LSH signature tables,
      // dedup inverted indexes) that stay referenced by the returned
      // plan and so cannot be unpersisted inside the operator. Left
      // alone they accumulate across the 99-query run, squeezing
      // execution memory until late queries spend their time in GC
      // (measured: text_chunks 5.9 s in the full run vs 0.6 s in
      // isolation). Dropping the cache AFTER the timer keeps each
      // query's own caching inside its measurement while restoring
      // isolation between queries.
      spark.sharedState.cacheManager.clearCache()
      // settle the heap OUTSIDE the timer: without this, GC debt from
      // a heavy query (dropped caches, codegen churn) is collected
      // during the NEXT query's timed section — measured 2-3x
      // inflation of cheap queries late in the 100+-query run
      System.gc()
      name -> (if (ok) elapsed else -1.0)
    }
    // BUILD/SERVE SPLIT (round-12 verdict task 3). The hermetic
    // warehouse makes pass 1 honestly COLD: it pays every one-time
    // index/tokenizer-artifact build (plus residual JIT). Pass 2 runs
    // the identical queries against the artifacts pass 1 left in the
    // warehouse — the SERVE cost, the number that corresponds to a
    // deployed pipeline's steady state and the only number comparable
    // round-over-round. So:
    //   - headline "value"  = serve total (pass 2),
    //   - "total_cold"      = pass-1 total (builds included),
    //   - per-query maps: "queries" (serve), and in BENCH_SELF.json
    //     also "queries_cold" and "queries_build" (max(0, cold−serve),
    //     the one-time build share attributable to each query).
    // SPARK_GRAFT_BENCH_RUNS=1 collapses serve=cold (single pass);
    // passes beyond 2 are published as totals_rerun spread evidence.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val cold = timedPass()
    // each rerun records its own failure count: a query that fails only
    // in a rerun would otherwise be silently dropped from that pass's
    // total, making the rerun look FASTER than pass 1 (round-7 advice)
    val rerunPasses: Seq[Seq[(String, Double)]] =
      (2 to nRuns).map(_ => timedPass())
    val serve = rerunPasses.headOption.getOrElse(cold)
    val rerunStats: Seq[(Double, Int)] = rerunPasses.map { pass =>
      (pass.map(_._2).filter(_ >= 0).sum, pass.count(_._2 < 0))
    }
    pool.shutdownNow()
    // Locale.ROOT: the f interpolator is locale-sensitive — a comma
    // decimal separator (de_DE etc.) would make the JSON unparseable
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(rows: Seq[(String, Double)]): String =
      rows.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val coldMap = cold.toMap
    val build = serve.map { case (k, s) =>
      val c = coldMap.getOrElse(k, -1.0)
      k -> (if (s >= 0 && c >= 0) math.max(0.0, c - s) else -1.0)
    }
    val coldTotal = cold.map(_._2).filter(_ >= 0).sum
    val serveTotal = serve.map(_._2).filter(_ >= 0).sum
    // full per-query maps -> BENCH_SELF.json only. The 113-query map in
    // one stdout line overflowed the driver's tail capture in round 2
    // ("parsed": null — the round lost its official number), so stdout
    // gets a COMPACT line: the totals plus a fixed headline subset.
    // serializer for the rerun stats; `cap` bounds how many passes the
    // deliberately-compact stdout line carries — a large
    // SPARK_GRAFT_BENCH_RUNS must not overflow the driver's tail
    // capture, the exact failure the compact line exists to avoid.
    // BENCH_SELF.json keeps every pass (cap = Int.MaxValue).
    def rerunJson(cap: Int): String =
      if (rerunStats.isEmpty) ""
      else {
        val kept = rerunStats.take(cap)
        val omitted =
          if (rerunStats.size > cap) s""","reruns_omitted":${rerunStats.size - cap}"""
          else ""
        s""","totals_rerun":[${kept.map(s => fmt(s._1)).mkString(",")}]""" +
          s""","n_failed_rerun":[${kept.map(_._2).mkString(",")}]""" + omitted
      }
    val shared = s""""unit":"sec","sf":"$sfDir","n_queries":${serve.size}""" +
      s""","n_failed":${serve.count(_._2 < 0)}""" +
      s""","total_cold":${fmt(coldTotal)},"n_failed_cold":${cold.count(_._2 < 0)}""" +
      s""","serve_equals_cold":${rerunPasses.isEmpty}"""
    val full = s"""{"metric":"total","value":${fmt(serveTotal)},$shared,"queries":${qmap(serve)},"queries_cold":${qmap(cold)},"queries_build":${qmap(build)}${rerunJson(Int.MaxValue)}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SELF.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val headline = Seq("q1_pricing_summary", "q3_shipping_priority",
      "dedup_minhash_lsh", "sim_topk_ivf", "text_bpe_tokens",
      "q_window_suite", "events_sessionize", "q_curation_pipeline",
      "q_curation_v2", "q_curation_v3")
    val serveMap = serve.toMap
    val hq = headline.flatMap(n => serveMap.get(n).map(v => "\"" + n + "\":" + fmt(v)))
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${fmt(serveTotal)},$shared,"queries":$hq${rerunJson(8)}}"""
    spark.stop()
    // LAST line on stdout, nothing after it
    println(compact)
  }
}
