package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-dimensional data-layout clustering (Z-order / Morton curves).
  *
  * Why this is a first-class 100 TB operator: parquet scan pruning is
  * only as good as the correlation between file boundaries and the
  * filter columns. Range-partitioning on ONE column gives perfect
  * pruning on that column and none on any other; interleaving the
  * bits of TWO (or more) rank-bucketed columns produces files whose
  * min/max envelopes are small RECTANGLES in the combined key space,
  * so file-level (and row-group-level) min/max statistics prune scans
  * filtered on EITHER dimension. This is the standard lakehouse
  * OPTIMIZE ZORDER BY shape, built here from public Morton-curve
  * math on top of plain `repartitionByRange` + parquet stats.
  *
  * Everything is integer arithmetic end-to-end (rank buckets via
  * exact long division, bit interleave via shift/mask), so an
  * external SQL engine replays the layout key bit-for-bit.
  */
object Layout {

  /** Exact long division helper: (a - (a mod b)) / b. Both operands
    * stay < 2^53 so the IEEE divide of an exact multiple is exact;
    * matches integer `//` in any engine. pmod keeps negatives safe.
    */
  private def intDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast(LongType)

  /** Quantize a long column to [0, 2^bits) by linear min/max scaling:
    * bucket = ((x - min) * (2^bits - 1)) div (max - min). Constant
    * column (max == min) pins every row to bucket 0. Integer-exact:
    * (x-min) <= range and range * (2^bits - 1) stays < 2^53 for any
    * 32-bit-ish domain at bits <= 16.
    */
  def quantizeLinear(x: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "bits must be in [1, 16]")
    // (x - min) * (2^bits - 1) must stay EXACT through the long
    // multiply AND the 2^53 double mantissa intDiv relies on: a
    // millis/nanos-epoch column would silently scramble the curve —
    // fail at plan build instead (pre-scale such domains to
    // seconds/days; scan pruning needs rank buckets, not precision)
    require(maxV >= minV,
      s"quantizeLinear: inverted domain [$minV, $maxV] — pass the true min/max")
    require((maxV - minV) <= (1L << 53) / ((1L << bits) - 1),
      s"quantizeLinear: domain span ${maxV - minV} x (2^$bits-1) exceeds the " +
        "exact-arithmetic bound (2^53) — pre-scale the dimension " +
        "(e.g. millis/nanos -> seconds or days)")
    if (maxV == minV) lit(0L)
    else intDiv((x.cast(LongType) - lit(minV)) * lit((1L << bits) - 1),
      lit(maxV - minV))
  }

  /** Morton (Z-order) bit interleave of two `bits`-wide non-negative
    * longs: result bit 2i is a's bit i, bit 2i+1 is b's bit i. A
    * static fold of shift/mask terms — whole-stage-codegen folds it
    * into straight-line long arithmetic, no UDF, no allocation.
    */
  def mortonInterleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "bits must be in [1, 16]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton interleave: result bit (i·n + j) is
    * dimension j's bit i — the bits of all `n` quantized dimensions
    * cycle round-robin, so every dimension contributes equally to
    * every prefix of the key (the property that makes the top bits a
    * balanced n-D grid). Requires n·bits <= 62. Two dimensions
    * reduce exactly to [[mortonInterleave2]].
    */
  def mortonInterleaveN(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, "need at least two dimensions")
    require(bits >= 1 && dims.size * bits <= 62,
      s"${dims.size} dims x $bits bits exceeds the 62-bit key budget")
    val n = dims.size
    (for { i <- 0 until bits; j <- 0 until n } yield
      shiftleft(shiftright(dims(j), i).bitwiseAND(lit(1L)), i * n + j)
    ).reduce(_ bitwiseOR _)
  }

  /** [[zorderKeyed]] for any number of dimensions: one stats pass for
    * all min/max pairs, then the map-only N-way interleave. Bucket =
    * the key's top `bucketBits` bits (a balanced grid of
    * ~2^(bucketBits/n) cells per dimension).
    */
  def zorderKeyedN(df: DataFrame, dims: Seq[Column], bits: Int = 16,
                   bucketBits: Int = 6,
                   keyCol: String = "zkey", bucketCol: String = "zbucket"): DataFrame = {
    val n = dims.size
    require(n >= 2 && n * bits <= 62, "dims x bits exceeds the 62-bit key budget")
    require(bucketBits >= 1 && bucketBits <= n * bits, "bucketBits out of range")
    val aggs = dims.flatMap(d =>
      Seq(min(d.cast(LongType)), max(d.cast(LongType))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    require(!bounds.anyNull,
      "zorder bounds: input is empty or a dimension is all-null — nothing to cluster")
    val quantized = dims.zipWithIndex.map { case (d, j) =>
      quantizeLinear(d, bounds.getLong(2 * j), bounds.getLong(2 * j + 1), bits)
    }
    df.withColumn(keyCol, mortonInterleaveN(quantized, bits))
      .withColumn(bucketCol, shiftright(col(keyCol), n * bits - bucketBits))
  }

  /** Min/max bounds of two long-valued expressions in one aggregate
    * pass (a single 4-value row collected to the driver — KB-scale,
    * the same "tiny stats, plan literal" discipline as the ANN
    * codebooks).
    */
  def bounds2(df: DataFrame, a: Column, b: Column): (Long, Long, Long, Long) = {
    val r = df.agg(min(a.cast(LongType)), max(a.cast(LongType)),
      min(b.cast(LongType)), max(b.cast(LongType))).head()
    require(!r.anyNull,
      "zorder bounds: input is empty or a dimension is all-null — nothing to cluster")
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Attach the Z-order key and its top-bits cluster bucket for two
    * long-valued dimensions. `bits` rank-bucket resolution per
    * dimension; `bucketBits` of the interleaved key's HIGH bits form
    * the cluster id (2^bucketBits clusters, each a ~2^-(bucketBits/2)
    * fraction rectangle of both dimensions). Stats pass + map-only
    * key computation; no shuffle here — the write path decides the
    * partitioning.
    */
  def zorderKeyed(df: DataFrame, dimA: Column, dimB: Column,
                  bits: Int = 16, bucketBits: Int = 6,
                  keyCol: String = "zkey", bucketCol: String = "zbucket"): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits, "bucketBits out of range")
    val (minA, maxA, minB, maxB) = bounds2(df, dimA, dimB)
    val key = mortonInterleave2(
      quantizeLinear(dimA, minA, maxA, bits),
      quantizeLinear(dimB, minB, maxB, bits), bits)
    df.withColumn(keyCol, key)
      .withColumn(bucketCol, shiftright(col(keyCol), 2 * bits - bucketBits))
  }

  /** Zone-map pruning audit: the quantified case for layout work.
    *
    * Simulates the same rows written under two file layouts — RANGE-
    * CLUSTERED on the key (file = linear key bucket, the layout a
    * sorted write produces) vs HASHED (file = portable hash of the
    * key, the layout an unsorted shuffle produces) — computes each
    * file's zone map (min/max of the key, exactly what a parquet
    * footer stores), and marks which files a range predicate
    * `key BETWEEN lo AND hi` must read (`must_read` = the file's
    * [min,max] envelope intersects [lo,hi]). The contrast IS the
    * pruning evidence: clustered layouts read O(selectivity) of the
    * files, hashed layouts read ALL of them — at 100 TB that is the
    * difference between scanning 3 files and 3,000.
    *
    * The predicate bounds are fractions of the observed key span
    * (`lo = min + span·loNum/den`, integer math), so the audit is
    * scale-factor-invariant and the oracle replays it exactly.
    * Plan shape: one min/max stats pass (single row to the driver,
    * inlined as literals), then ONE corpus scan — both layouts'
    * (layout, file) rows come off a 2-way explode of the same row,
    * aggregated by the 2·nFiles grouping keys with map-side partials.
    */
  def zoneMapAudit(df: DataFrame, key: Column, nFiles: Int,
                   loNum: Long = 25, hiNum: Long = 35, den: Long = 100,
                   seed: Long = 97L): DataFrame = {
    require(nFiles >= 2, "need at least two files")
    require(den > 0 && loNum >= 0 && hiNum >= loNum && hiNum <= den,
      "predicate fractions must satisfy 0 <= loNum <= hiNum <= den")
    val r = df.agg(min(key.cast(LongType)), max(key.cast(LongType))).head()
    require(!r.anyNull, "zoneMapAudit: input is empty or the key is all-null")
    val (minK, maxK) = (r.getLong(0), r.getLong(1))
    val span = maxK - minK
    require(span <= (1L << 53) / nFiles,
      s"zoneMapAudit: key span $span x $nFiles files exceeds the " +
        "exact-arithmetic bound (2^53) — pre-scale the key")
    val lo = minK + span * loNum / den
    val hi = minK + span * hiNum / den
    val k = key.cast(LongType)
    val clustered = intDiv((k - lit(minK)) * lit(nFiles.toLong), lit(span + 1))
    val hashed = pmod(Frames.portableHash(k, seed), lit(nFiles.toLong))
    // file ids precomputed in a Project (see [[zorderPruneAudit]]:
    // expressions inlined into a Generate lose subexpression sharing)
    df.select(k.as("k"), clustered.as("__fc"), hashed.as("__fh"))
      .select(col("k"),
        explode(array(
          struct(lit("clustered").as("layout"), col("__fc").as("file_id")),
          struct(lit("hashed").as("layout"), col("__fh").as("file_id")))).as("lf"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))
      .withColumn("must_read",
        !(col("max_key") < lit(lo) || col("min_key") > lit(hi)))
  }

  /** Two-dimensional pruning audit: [[zoneMapAudit]]'s lesson taken to
    * the layout [[zorderKeyed]] exists to produce. The same rows under
    * THREE layouts — Z-ORDER buckets (file = the Morton key's top
    * bits), SORTED_A (file = linear bucket of dimension a: perfect
    * pruning on a, none on b), SORTED_B (the mirror) — each file's 2-D
    * min/max envelope, and which files a conjunctive range predicate
    * `a BETWEEN .. AND b BETWEEN ..` must read (a file is skipped
    * when EITHER dimension's envelope misses its range — exactly the
    * parquet footer stats test). The numbers make the OPTIMIZE ZORDER
    * case: z-order reads ~sel(a)·sel(b) of the files; a single-dim
    * sort reads the full stripe of its unsorted dimension.
    *
    * Predicate bounds are integer fractions of each dimension's
    * observed span (scale-invariant, oracle-replayable). Plan shape:
    * one 4-stat bounds pass, then ONE corpus scan — all three
    * layouts' rows come off a 3-way explode, aggregated by
    * 3·2^bucketBits grouping keys with map-side partials.
    */
  /** Bloom file-skipping audit — the POINT-LOOKUP leg of the layout
    * trio (zone maps prune ranges, z-order prunes conjunctive ranges,
    * per-file Blooms prune equality probes — the Delta/Iceberg
    * bloom-filter column story, quantified). The same rows under a
    * range-CLUSTERED vs a HASHED file layout; per file, a portable
    * Bloom position set over the key (the [[Bloom]] module's
    * double-square mixer, so an external engine replays every bit)
    * plus the min/max envelope; then for each probe key — a grid of
    * span-fraction keys plus `nAbsent` guaranteed-absent keys — how
    * many files each pruning tier must read:
    *
    *  - `n_files_range`: files whose [min,max] admits the probe — ~1
    *    under CLUSTERED, ALL files under HASHED (every file spans the
    *    domain: min/max stats are useless exactly where hashing put
    *    the rows);
    *  - `n_files_bloom`: files whose Bloom has all k probe positions
    *    set — ~(1 + fp·nFiles) under EITHER layout; the Bloom is the
    *    tier that stays selective when the layout can't be.
    *
    * Plan: one 2-stat bounds pass, one presence semi-probe, then ONE
    * corpus scan exploded 2 ways for file stats and once more (×k
    * positions) for the per-file position sets; probe-side work is
    * probes × files — bounded. Scale-safe: nothing corpus-sized joins
    * anything corpus-sized.
    */
  def bloomSkipAudit(df: DataFrame, key: Column, nFiles: Int = 16,
                     mBits: Int = 4096, kHashes: Int = 4,
                     probeFracs: Seq[Long] = Seq(13L, 37L, 61L, 83L),
                     den: Long = 100L, nAbsent: Int = 4,
                     seed: Long = 97L): DataFrame = {
    require(nFiles >= 2, "need at least two files")
    require(mBits >= 64 && kHashes >= 1 && kHashes <= 8, "bad bloom params")
    require(probeFracs.nonEmpty && probeFracs.forall(f => f >= 0 && f <= den),
      "probe fractions must sit in [0, den]")
    val spark = df.sparkSession
    val r = df.agg(min(key.cast(LongType)), max(key.cast(LongType))).head()
    require(!r.anyNull, "bloomSkipAudit: input is empty or the key is all-null")
    val (minK, maxK) = (r.getLong(0), r.getLong(1))
    val span = maxK - minK
    require(span <= (1L << 53) / nFiles,
      "bloomSkipAudit: key span x files exceeds the exact-arithmetic bound")
    val k = key.cast(LongType)
    val clustered = intDiv((k - lit(minK)) * lit(nFiles.toLong), lit(span + 1))
    val hashed = pmod(Frames.portableHash(k, seed), lit(nFiles.toLong))
    val layered = df
      .select(k.as("k"), clustered.as("__fc"), hashed.as("__fh"))
      .select(col("k"), explode(array(
        struct(lit("clustered").as("layout"), col("__fc").as("file_id")),
        struct(lit("hashed").as("layout"), col("__fh").as("file_id")))).as("lf"))
      .select(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"),
        col("k"))
    val fileStats = layered.groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))
    val filePos = layered
      .select(col("layout"), col("file_id"),
        explode(array(Bloom.posColumns(col("k"), mBits, kHashes): _*)).as("pos"))
      .distinct()
    // probe keys: span-fraction grid (present iff the key exists) +
    // guaranteed-absent keys past the max
    val gridKeys = probeFracs.map(f => minK + span * f / den)
    val absentKeys = (1 to nAbsent).map(i => maxK + i.toLong)
    import spark.implicits._
    val probes = (gridKeys ++ absentKeys).distinct.toDF("probe_key")
    val presentSet = df.select(k.as("probe_key"))
      .join(broadcast(probes), Seq("probe_key"), "left_semi")
      .distinct().collect().map(_.getLong(0)).toSet
    val probesFlagged = (gridKeys ++ absentKeys).distinct
      .map(p => (p, presentSet.contains(p))).toDF("probe_key", "present")
    val probePos = probesFlagged
      .select(col("probe_key"),
        explode(array(Bloom.posColumns(col("probe_key"), mBits, kHashes): _*))
          .as("pos"))
      .distinct()
    val probeNPos = probePos.groupBy(col("probe_key"))
      .agg(count(lit(1)).as("__need"))
    val bloomHits = filePos
      .join(broadcast(probePos), Seq("pos"))
      .groupBy(col("layout"), col("file_id"), col("probe_key"))
      .agg(count(lit(1)).as("__got"))
      .join(broadcast(probeNPos), Seq("probe_key"))
      .filter(col("__got") === col("__need"))
      .groupBy(col("layout"), col("probe_key"))
      .agg(count(lit(1)).as("n_files_bloom"))
    val rangeHits = fileStats
      .crossJoin(broadcast(probesFlagged.select(col("probe_key"))))
      .filter(col("probe_key") >= col("min_key") &&
        col("probe_key") <= col("max_key"))
      .groupBy(col("layout"), col("probe_key"))
      .agg(count(lit(1)).as("n_files_range"))
    val grid = Seq("clustered", "hashed").toDF("layout")
      .crossJoin(probesFlagged)
    grid
      .join(bloomHits, Seq("layout", "probe_key"), "left")
      .join(rangeHits, Seq("layout", "probe_key"), "left")
      .select(col("layout"), col("probe_key"), col("present"),
        coalesce(col("n_files_bloom"), lit(0L)).as("n_files_bloom"),
        coalesce(col("n_files_range"), lit(0L)).as("n_files_range"))
  }

  def zorderPruneAudit(df: DataFrame, dimA: Column, dimB: Column,
                       bits: Int = 16, bucketBits: Int = 6,
                       loNumA: Long = 25, hiNumA: Long = 35,
                       loNumB: Long = 40, hiNumB: Long = 60,
                       den: Long = 100): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits, "bucketBits out of range")
    require(den > 0 && loNumA >= 0 && hiNumA >= loNumA && hiNumA <= den &&
      loNumB >= 0 && hiNumB >= loNumB && hiNumB <= den,
      "predicate fractions must satisfy 0 <= lo <= hi <= den")
    val (minA, maxA, minB, maxB) = bounds2(df, dimA, dimB)
    val nFiles = 1L << bucketBits
    require(maxA - minA <= (1L << 53) / nFiles &&
      maxB - minB <= (1L << 53) / nFiles,
      "zorderPruneAudit: dimension span x files exceeds the exact-arithmetic bound")
    val loA = minA + (maxA - minA) * loNumA / den
    val hiA = minA + (maxA - minA) * hiNumA / den
    val loB = minB + (maxB - minB) * loNumB / den
    val hiB = minB + (maxB - minB) * hiNumB / den
    val a = dimA.cast(LongType)
    val b = dimB.cast(LongType)
    val zb = shiftright(mortonInterleave2(
      quantizeLinear(dimA, minA, maxA, bits),
      quantizeLinear(dimB, minB, maxB, bits), bits), 2 * bits - bucketBits)
    val fa = intDiv((a - lit(minA)) * lit(nFiles), lit(maxA - minA + 1))
    val fb = intDiv((b - lit(minB)) * lit(nFiles), lit(maxB - minB + 1))
    // file ids are computed in a PROJECT before the explode: inside a
    // Generate the Morton expression would be inlined per struct with
    // no common-subexpression elimination (the quantize terms repeat
    // 2x per bit), knocking the hot path out of efficient codegen —
    // measured ~4x slower than this shape on the orders audit
    df.select(a.as("a"), b.as("b"),
        zb.as("__zb"), fa.as("__fa"), fb.as("__fb"))
      .select(col("a"), col("b"),
        explode(array(
          struct(lit("zorder").as("layout"), col("__zb").as("file_id")),
          struct(lit("sorted_a").as("layout"), col("__fa").as("file_id")),
          struct(lit("sorted_b").as("layout"), col("__fb").as("file_id")))).as("lf"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .withColumn("must_read",
        !(col("max_a") < lit(loA) || col("min_a") > lit(hiA) ||
          col("max_b") < lit(loB) || col("min_b") > lit(hiB)))
  }

  /** Small-file compaction planner: per-partition first-fit-decreasing
    * bin packing of the files below a size floor into target-size
    * output groups — the OPTIMIZE/compact planning pass every
    * lakehouse table needs once streaming writers start leaving
    * thousands of KB-sized files per partition.
    *
    * The manifest is (partition, file_id, bytes) rows. Per partition:
    * target group capacity C = partition_bytes/targetDiv + 1 and
    * small-file floor T = C/smallDiv (integer math — both derived
    * from the data, so the plan is scale-invariant and replayable);
    * files with bytes >= T keep `grp` = -1 (already big enough to
    * leave alone); smaller files are FFD-packed (bytes DESC, file_id
    * ASC placement order — the same deterministic greedy as
    * [[Frames.packSequencesFfd]], so an external engine replays the
    * exact assignment) into groups 0,1,2,… of capacity C. Every small
    * file fits an empty group by construction (T <= C).
    *
    * Scale shape: one manifest-sized shuffle for the per-partition
    * totals, then one groupByKey over PARTITIONS — each task buffers
    * one partition's FILE LIST (not its data; bounded by
    * maxFilesPerPartition, default 4M files = 64 MB of task memory),
    * and the plan's output is manifest-sized. The files themselves
    * are never read: this is the planner, the rewrite executes it.
    */
  def compactionPlan(manifest: DataFrame, partCol: String, fileCol: String,
                     bytesCol: String, targetDiv: Long = 4L,
                     smallDiv: Long = 4L,
                     maxFilesPerPartition: Long = 4000000L): DataFrame = {
    require(targetDiv > 0 && smallDiv > 0, "divisors must be positive")
    require(maxFilesPerPartition > 0, "maxFilesPerPartition must be positive")
    val spark = manifest.sparkSession
    import spark.implicits._
    val totals = manifest.groupBy(col(partCol))
      .agg(sum(col(bytesCol).cast(LongType)).as("__tot"))
    val rows = manifest
      .join(broadcast(totals), Seq(partCol))
      .select(col(partCol).cast(StringType).as("partition"),
        col(fileCol).cast(LongType).as("file_id"),
        col(bytesCol).cast(LongType).as("bytes"),
        (intDiv(col("__tot"), lit(targetDiv)) + lit(1L)).as("cap"))
      .as[(String, Long, Long, Long)]
    rows.groupByKey(_._1).flatMapGroups { (part, it) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      var over = false
      while (it.hasNext && !over) {
        buf += it.next()
        if (buf.length > maxFilesPerPartition) over = true
      }
      if (over) throw new IllegalStateException(
        s"compactionPlan: partition '$part' exceeds maxFilesPerPartition=" +
          s"$maxFilesPerPartition manifest rows — split the partition or raise " +
          "the bound (each task buffers one partition's file list)")
      val cap = buf.head._4
      val floor = cap / smallDiv
      val files = buf.toArray.sortBy { case (_, id, b, _) => (-b, id) }
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      files.iterator.map { case (_, id, b, _) =>
        if (b >= floor) (part, id, b, -1L)
        else {
          var i = 0
          while (i < rem.length && rem(i) < b) i += 1
          if (i == rem.length) rem += (cap - b) else rem(i) -= b
          (part, id, b, i.toLong)
        }
      }
    }.toDF("partition", "file_id", "bytes", "grp")
  }

  /** Write `df` parquet clustered by the Z-order of two dimensions:
    * range-partition on the key (equal-size files via the range
    * sampler), sort within each file so row-group stats are tight,
    * drop the internal key columns. After this, a reader filtering
    * on EITHER dimension prunes most files from the parquet
    * footer min/max alone — the test asserts the per-file envelope
    * shrinkage directly.
    */
  def writeZOrdered(df: DataFrame, path: String, dimA: Column, dimB: Column,
                    numFiles: Int, bits: Int = 16): Unit = {
    val keyed = zorderKeyed(df, dimA, dimB, bits)
    keyed.repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey", "zbucket")
      .write.mode("overwrite").parquet(path)
  }
}
