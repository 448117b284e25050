package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mortonInterleave2 places a's bits even, b's bits odd") {
    // a=0b101 (bits 0,2 set -> result bits 0,4), b=0b011 (bits 0,1 -> result bits 1,3)
    val df = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.mortonInterleave2(col("a"), col("b"), 3).as("z"))
    assert(df.head().getLong(0) === ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)))
    // identity corners: (0,0) -> 0; all-ones interleaves to all-ones
    val corners = Seq((0L, 0L), (65535L, 65535L)).toDF("a", "b")
      .select(Layout.mortonInterleave2(col("a"), col("b"), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(corners(0) === 0L)
    assert(corners(1) === (1L << 32) - 1)
  }

  test("quantizeLinear maps [min,max] onto [0, 2^bits) monotonically; constant column -> 0") {
    val df = Seq(10L, 20L, 55L, 100L).toDF("x")
      .select(Layout.quantizeLinear(col("x"), 10L, 100L, 8).as("q"))
    val qs = df.collect().map(_.getLong(0))
    assert(qs(0) === 0L && qs(3) === 255L)
    assert(qs.sameElements(qs.sorted), "quantization must be monotone")
    val const = Seq(7L, 7L).toDF("x")
      .select(Layout.quantizeLinear(col("x"), 7L, 7L, 8).as("q"))
      .collect().map(_.getLong(0))
    assert(const.forall(_ === 0L))
    // a millis-epoch-wide span would silently exceed the exact 2^53
    // arithmetic bound: the guard must fire at plan build
    val e = intercept[IllegalArgumentException] {
      Layout.quantizeLinear(col("x"), 0L, 3L * 1000L * 86400L * 365L * 60L, 16)
    }
    assert(e.getMessage.contains("pre-scale"))
    // an inverted domain must fail the same loud way, not silently
    // divide by a negative range into meaningless negative buckets
    val eInv = intercept[IllegalArgumentException] {
      Layout.quantizeLinear(col("x"), 100L, 10L, 8)
    }
    assert(eInv.getMessage.contains("inverted domain"))
    // empty input: loud failure at the stats pass, never an NPE
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val e2 = intercept[IllegalArgumentException] {
      Layout.zorderKeyed(empty, col("a"), col("b"))
    }
    assert(e2.getMessage.contains("nothing to cluster"))
  }

  test("zorderKeyed buckets are small rectangles, not full-range stripes") {
    val o = Tables.table(spark, TestSpark.sfDir, "orders")
      .withColumn("ck", col("o_custkey").cast(LongType))
      .withColumn("od", datediff(col("o_orderdate").cast(DateType),
        lit("1970-01-01").cast(DateType)).cast(LongType))
    val keyed = Layout.zorderKeyed(o, col("ck"), col("od"), bits = 16, bucketBits = 6)
    val g = o.agg(max("ck") - min("ck"), max("od") - min("od")).head()
    val (spanCk, spanOd) = (g.getLong(0).toDouble, g.getLong(1).toDouble)
    val env = keyed.groupBy("zbucket")
      .agg(((max("ck") - min("ck")) / spanCk).as("fck"),
           ((max("od") - min("od")) / spanOd).as("fod"),
           count(lit(1)).as("n"))
      .filter(col("n") >= 5) // tiny buckets trivially have tiny spans
      .collect()
    assert(env.length > 10, s"expected many populated buckets, got ${env.length}")
    val meanFck = env.map(_.getDouble(1)).sum / env.length
    val meanFod = env.map(_.getDouble(2)).sum / env.length
    // 6 top bits = 3 bits per dim = an 8x8 grid: each bucket should
    // cover ~1/8 of EITHER dimension, not a full-range stripe. A
    // single-column range layout would put ~1.0 on the other dim.
    assert(meanFck < 0.3, s"custkey envelope fraction $meanFck too wide")
    assert(meanFod < 0.3, s"orderdate envelope fraction $meanFod too wide")
  }

  test("zorderKeyedN: 3-D buckets are sub-cubes on every dimension") {
    val o = Tables.table(spark, TestSpark.sfDir, "orders")
      .withColumn("ck", col("o_custkey").cast(LongType))
      .withColumn("od", datediff(col("o_orderdate").cast(DateType),
        lit("1970-01-01").cast(DateType)).cast(LongType))
      .withColumn("tp", floor(col("o_totalprice")).cast(LongType))
    val keyed = Layout.zorderKeyedN(o, Seq(col("ck"), col("od"), col("tp")),
      bits = 10, bucketBits = 6)
    val g = o.agg(max("ck") - min("ck"), max("od") - min("od"),
      max("tp") - min("tp")).head()
    val spans = (0 until 3).map(i => g.getLong(i).toDouble)
    val env = keyed.groupBy("zbucket")
      .agg(((max("ck") - min("ck")) / spans(0)).as("f0"),
           ((max("od") - min("od")) / spans(1)).as("f1"),
           ((max("tp") - min("tp")) / spans(2)).as("f2"),
           count(lit(1)).as("n"))
      .filter(col("n") >= 5)
      .collect()
    assert(env.length > 10, s"expected many populated buckets, got ${env.length}")
    (1 to 3).foreach { i =>
      val mean = env.map(_.getDouble(i)).sum / env.length
      // 6 top bits over 3 dims = 2 bits/dim: each bucket spans ~1/4 of
      // each dimension — far from a full-range stripe on ANY of them
      assert(mean < 0.6, s"dim $i envelope fraction $mean too wide")
    }
  }

  test("writeZOrdered produces files whose min/max footers prune on both dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      val o = Tables.table(spark, TestSpark.sfDir, "orders")
        .withColumn("ck", col("o_custkey").cast(LongType))
        .withColumn("od", datediff(col("o_orderdate").cast(DateType),
          lit("1970-01-01").cast(DateType)).cast(LongType))
      Layout.writeZOrdered(o, dir, col("ck"), col("od"), numFiles = 16)
      val back = spark.read.parquet(dir)
      assert(back.count() === o.count(), "clustering must not lose rows")
      assert(!back.columns.contains("zkey"), "internal key dropped")
      val g = o.agg(min("ck"), max("ck"), min("od"), max("od")).head()
      val (spanCk, spanOd) =
        ((g.getLong(1) - g.getLong(0)).toDouble, (g.getLong(3) - g.getLong(2)).toDouble)
      val perFile = back
        .groupBy(input_file_name().as("f"))
        .agg(((max("ck") - min("ck")) / spanCk).as("fck"),
             ((max("od") - min("od")) / spanOd).as("fod"))
        .collect()
      assert(perFile.length > 4, s"expected several files, got ${perFile.length}")
      val meanFck = perFile.map(_.getDouble(1)).sum / perFile.length
      val meanFod = perFile.map(_.getDouble(2)).sum / perFile.length
      // the whole point: a reader filtering ck (or od) to a point can
      // prune most files from footer stats alone. Unclustered writes
      // measure ~1.0 on both.
      assert(meanFck < 0.5, s"per-file custkey envelope $meanFck too wide")
      assert(meanFod < 0.5, s"per-file orderdate envelope $meanFod too wide")
    } finally {
      val p = java.nio.file.Paths.get(dir)
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  test("zorder pruning proof: dimB point-band prunes most files; 1-col-sorted control prunes none") {
    // The layout loop's CLOSING measurement (round-8 verdict task 6):
    // a reader filtering on the SECOND dimension alone skips files by
    // footer min/max, which a custkey-only range sort cannot give it.
    // "Prunable" below is computed exactly the way a parquet reader
    // does: the file's [min, max] envelope misses the predicate band.
    def rmrf(dir: String): Unit = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
    val zDir = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    val cDir = java.nio.file.Files.createTempDirectory("graft-cprune").toString
    try {
      val o = Tables.table(spark, TestSpark.sfDir, "orders")
        .withColumn("ck", col("o_custkey").cast(LongType))
        .withColumn("od", datediff(col("o_orderdate").cast(DateType),
          lit("1970-01-01").cast(DateType)).cast(LongType))
      Layout.writeZOrdered(o, zDir, col("ck"), col("od"), numFiles = 16)
      // control: the single-column layout a naive pipeline writes —
      // range-partitioned and sorted on custkey only
      o.repartitionByRange(16, col("ck")).sortWithinPartitions("ck")
        .write.mode("overwrite").parquet(cDir)
      val g = o.agg(min("od"), max("od")).head()
      val (lo, hi) = (g.getLong(0), g.getLong(1))
      // an od band covering ~1/8 of the date span, centered
      val mid = lo + (hi - lo) / 2
      val (bandLo, bandHi) = (mid, mid + (hi - lo) / 8)
      def prunableFraction(dir: String): (Double, Long) = {
        val files = spark.read.parquet(dir)
          .groupBy(input_file_name().as("f"))
          .agg(min("od").as("mn"), max("od").as("mx"))
          .collect()
        assert(files.length >= 8, s"expected >=8 files in $dir")
        val prunable = files.count(r => r.getLong(1) > bandHi || r.getLong(2) < bandLo)
        (prunable.toDouble / files.length, files.length.toLong)
      }
      val (zFrac, zn) = prunableFraction(zDir)
      val (cFrac, cn) = prunableFraction(cDir)
      info(f"z-order prunable: ${zFrac * 100}%.0f%% of $zn files; " +
        f"ck-sorted control: ${cFrac * 100}%.0f%% of $cn files")
      // answers must agree regardless of layout
      val zAns = spark.read.parquet(zDir)
        .filter(col("od").between(bandLo, bandHi)).count()
      val cAns = spark.read.parquet(cDir)
        .filter(col("od").between(bandLo, bandHi)).count()
      assert(zAns === cAns && zAns > 0)
      assert(zFrac >= 0.25, f"z-order should skip >=25%% of files, got ${zFrac * 100}%.0f%%")
      assert(cFrac <= 0.1, f"ck-sorted control should skip ~nothing, got ${cFrac * 100}%.0f%%")
      assert(zFrac > cFrac + 0.2, "z-order must beat the control by a wide margin")
    } finally { rmrf(zDir); rmrf(cDir) }
  }

  test("zoneMapAudit: clustered layout prunes, hashed layout reads everything") {
    val df = (0L until 100L).toDF("k")
    val audit = Layout.zoneMapAudit(df, col("k"), nFiles = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val clustered = audit.filter(_._1 == "clustered").sortBy(_._2)
    val hashed = audit.filter(_._1 == "hashed")
    // both layouts partition the rows
    assert(clustered.map(_._3).sum === 100L)
    assert(hashed.map(_._3).sum === 100L)
    // clustered files are DISJOINT key ranges covering [0, 99]
    assert(clustered.map(_._2) === Array(0L, 1L, 2L, 3L))
    for (Array(a, b) <- clustered.sliding(2))
      assert(a._5 < b._4, s"clustered envelopes must be disjoint: $a vs $b")
    // predicate is k in [min + span/4, min + 35*span/100] = [24, 34]:
    // only clustered file 0 ([0,24]) and file 1 ([25,49]) intersect it
    assert(clustered.map(f => f._2 -> f._6).toMap ===
      Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
    // hashed envelopes all straddle the predicate -> zero files pruned
    assert(hashed.forall(_._6),
      "every hashed file must be read — that's the point of the audit")
  }

  test("zorderPruneAudit: z-order reads sel(a)x sel(b) files, single-dim sorts read full stripes") {
    // 64x64 uniform grid: spans 0..63 on both dims. Predicate defaults:
    // a in [63*25//100, 63*35//100] = [15, 22], b in [25, 37].
    // sorted_a files are single-a stripes -> exactly a in 15..22 read (8);
    // sorted_b -> b in 25..37 (13); z-order cells are 8x8 rectangles ->
    // acell {1,2} x bcell {3,4} = 4 files read.
    val grid = (for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b))
      .toDF("a", "b")
    val audit = Layout.zorderPruneAudit(grid, col("a"), col("b"),
        bits = 16, bucketBits = 6)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(7)))
    val byLayout = audit.groupBy(_._1)
    // each layout partitions all 4096 rows
    for ((_, rows) <- byLayout) assert(rows.map(_._2).sum === 4096L)
    def readCount(l: String) = byLayout(l).count(_._3)
    assert(readCount("sorted_a") === 8)
    assert(readCount("sorted_b") === 13)
    assert(readCount("zorder") === 4)
  }

  test("bloomSkipAudit: blooms prune point probes where hashed min/max cannot") {
    val df = (0L until 1000L).toDF("k")
    val audit = Layout.bloomSkipAudit(df, col("k"), nFiles = 8,
        mBits = 4096, kHashes = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4)))
    assert(audit.length === 16, "2 layouts x 8 probes")
    val present = audit.filter(_._3)
    val absent = audit.filterNot(_._3)
    assert(present.length === 8 && absent.length === 8,
      "the grid probes of a dense domain all exist; the +max ones never do")
    // range tier: clustered admits exactly 1 file; hashed admits ALL —
    // every hashed file spans the whole domain
    assert(present.filter(_._1 == "clustered").forall(_._5 === 1L))
    assert(present.filter(_._1 == "hashed").forall(_._5 === 8L))
    // bloom tier: the present key's home file always hits (no false
    // negatives), and false positives stay far below the file count
    assert(present.forall(_._4 >= 1L), "bloom can never miss a present key")
    assert(present.forall(_._4 <= 3L),
      s"fp blowout: ${present.mkString(", ")}")
    // absent keys: range prunes trivially (past max); bloom may
    // false-positive but never fabricates a range hit
    assert(absent.forall(_._5 === 0L))
    assert(absent.forall(_._4 <= 3L))
    // loud on empties
    assert(intercept[IllegalArgumentException] {
      Layout.bloomSkipAudit(spark.emptyDataFrame.withColumn("k", lit(1L))
        .filter(lit(false)), col("k"))
    }.getMessage.contains("empty"))
  }

  test("zoneMapAudit refuses empty/all-null input loudly") {
    val ex = intercept[IllegalArgumentException] {
      Layout.zoneMapAudit(Seq.empty[Long].toDF("k"), col("k"), nFiles = 4)
    }
    assert(ex.getMessage.contains("empty"))
  }

  test("compactionPlan: deterministic FFD per partition, big files kept") {
    // one partition, targetDiv=2 smallDiv=1: tot=42 -> cap=22, floor=22,
    // every file small. FFD (bytes DESC, id ASC) into capacity 22:
    // 9,8 -> g0 (rem 5); 7 -> g1 (15); 6 -> g1 (9); 5 -> g0 (0);
    // 4 -> g1 (5); 3 -> g1 (2)
    val m = Seq(("a", 1L, 9L), ("a", 2L, 8L), ("a", 3L, 7L), ("a", 4L, 6L),
      ("a", 5L, 5L), ("a", 6L, 4L), ("a", 7L, 3L))
      .toDF("part", "fid", "bytes")
    val plan = Layout.compactionPlan(m, "part", "fid", "bytes",
        targetDiv = 2L, smallDiv = 1L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(plan === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 0L, 6L -> 1L, 7L -> 1L))
    // defaults (targetDiv=4, smallDiv=4): tot=42 -> cap=11, floor=2 ->
    // everything >= 2 bytes keeps grp = -1 (big enough to leave alone)
    val keep = Layout.compactionPlan(m, "part", "fid", "bytes")
      .collect().map(_.getLong(3))
    assert(keep.forall(_ === -1L))
  }

  test("compactionPlan: caps derive per partition; invariant under input partitioning") {
    val m = (1L to 20L).map(i => ("p" + (i % 3), i, i * 10L))
      .toDF("part", "fid", "bytes")
    val a = Layout.compactionPlan(m, "part", "fid", "bytes")
      .orderBy("partition", "file_id").collect().toSeq
    val b = Layout.compactionPlan(m.repartition(13), "part", "fid", "bytes")
      .orderBy("partition", "file_id").collect().toSeq
    assert(a === b, "plan must not depend on the input's physical partitioning")
    // every packed group fits its partition's capacity
    val grouped = a.map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    for (((part, grp), files) <- grouped.filter(_._3 >= 0)
           .groupBy(t => (t._1, t._3))) {
      val tot = grouped.filter(_._1 == part).map(_._2).sum
      val cap = tot / 4 + 1
      assert(files.map(_._2).sum <= cap,
        s"group $grp in $part overflows capacity $cap")
    }
  }

  test("compactionPlan refuses an oversized partition file list loudly") {
    val m = (1L to 50L).map(i => ("p", i, 10L)).toDF("part", "fid", "bytes")
    val ex = intercept[Exception] {
      Layout.compactionPlan(m, "part", "fid", "bytes",
        maxFilesPerPartition = 10L).collect()
    }
    assert(ex.getMessage.contains("maxFilesPerPartition") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxFilesPerPartition")))
  }
}
