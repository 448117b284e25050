package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persisted IMAGE near-dup index — the pixel-tier member of the
  * serve-many index family beside [[DedupIndex]] (exact text),
  * [[NearDupIndex]] (near-dup text), [[EditIndex]] (fuzzy keys) and
  * [[IvfIndex]] (vectors): "is any of today's crawled images within
  * Hamming d of an image EVER admitted?" answered from 8-byte
  * perceptual hashes ([[ImageHash]]) without re-decoding, let alone
  * re-reading, the historical corpus.
  *
  * The index stores HASHES, not pixels — TWO tiers per image
  * (gradient dHash + spectral pHash from [[ImageHash.imageHashes]]),
  * and matches on the 128-bit COMBINED Hamming distance
  * `bit_count(d⊕d') + bit_count(p⊕p') <= maxBits`: a near-dup must
  * look alike in BOTH the gradient and frequency domains, which is
  * strictly more selective than either word alone. Blocking is
  * banded Hamming over the 128-bit concatenation dhash‖phash:
  * `nBands` equal bands (nBands/2 from each word), and by pigeonhole
  * any pair within maxBits < nBands TOTAL differing bits has at
  * least one band with ZERO differing bits — an exact band-value
  * match — so the probe is a per-band equi-join, never all-pairs.
  * (The two-word rule is the one-word rule on the concatenation:
  * the bands partition all 128 bits, so maxBits < nBands forces a
  * clean band regardless of how the differing bits split across
  * words. Both sides must band identically — build params persist
  * in `_stats` and every probe reads them from there.)
  *
  * Default geometry is 4 bands × 32 bits: band VALUES live in a
  * 2^32 space, so the band-key Bloom digest keeps clearing clean
  * batches until the index holds ~nBands·2^32 ≈ 1.7·10^10 images —
  * effectively unbounded for a single index (the r13 16-bit-band
  * geometry saturated at ~262k rows; that caveat no longer applies).
  * nBands=8 (16-bit bands, maxBits up to 7) remains available where
  * recall at higher radii matters more than digest headroom.
  *
  * Tables under a prefix:
  *   - `{prefix}_hashes` (id, dhash, phash) — admitted hashes: the
  *     id-clash guard and rebuild source;
  *   - `{prefix}_bands` (bk, id, dhash, phash) — band postings with
  *     both full hashes DENORMALIZED (the BM25-postings trick):
  *     verification (`bit_count(xor)+bit_count(xor)`) runs map-side
  *     behind the broadcast probe, candidates never shuffle. bk
  *     packs (band, value) into one long: band·2^48 + value
  *     (collision-free: values < 2^32 <= 2^48);
  *   - `{prefix}_bdigest` — Bloom words over bk: the map-only
  *     prefilter that drops never-seen band keys before the join;
  *   - `{prefix}_stats` — n_images, max_bits, n_bands, digest
  *     params, lineage ledger; probes read params from here so a
  *     gate can never band differently than the build did;
  *   - `{prefix}_intent` — torn-append marker (shared discipline).
  */
object ImageHashIndex {

  private def requireNotTorn(spark: SparkSession, prefix: String,
                             op: String): Unit =
    require(!spark.catalog.tableExists(s"${prefix}_intent"),
      s"$op: image index $prefix has a pending append intent marker " +
        s"(${prefix}_intent) — a prior append crashed mid-fold; rebuild " +
        "the index (or restore a consistent snapshot) first.")

  private case class Meta(nImages: Long, maxBits: Int, nBands: Int,
                          lineage: String, mBits: Int, k: Int)

  private def readMeta(spark: SparkSession, prefix: String): Meta = {
    val r = spark.table(s"${prefix}_stats").head()
    Meta(r.getAs[Long]("n_images"), r.getAs[Int]("max_bits"),
      r.getAs[Int]("n_bands"), r.getAs[String]("lineage"),
      r.getAs[Int]("digest_mbits"), r.getAs[Int]("digest_k"))
  }

  /** (id, dhash, phash) projection with the loud id/hash contract:
    * null ids or hashes would silently defeat the clash guard and
    * pair reporting, so they raise ([[EditIndex]]'s discipline);
    * callers filter undecodable images (null hashes from [[ImageHash
    * .imageHashes]]) explicitly first — dropping them here silently
    * would misreport corpus accounting.
    */
  private def keyed(df: DataFrame, idCol: String, dhashCol: String,
                    phashCol: String): DataFrame = {
    def hashOrRaise(c: String, out: String): Column =
      when(col(c).isNull,
        raise_error(concat(lit(s"ImageHashIndex: null hash ('$c') for id '"),
          col(idCol).cast("string"),
          lit("' — filter undecodable images before indexing"))))
        .otherwise(col(c).cast(LongType)).as(out)
    df.select(
      when(col(idCol).isNull || col(idCol).try_cast(LongType).isNull,
        raise_error(concat(lit(s"ImageHashIndex: id column '$idCol' value '"),
          coalesce(col(idCol).cast("string"), lit("NULL")),
          lit("' is not castable to LONG — ids must be non-null integers"))))
        .otherwise(col(idCol).try_cast(LongType)).as("id"),
      hashOrRaise(dhashCol, "dhash"),
      hashOrRaise(phashCol, "phash"))
  }

  private def requireGeometry(op: String, maxBits: Int, nBands: Int): Unit = {
    require(nBands >= 4 && nBands % 2 == 0 && 128 % nBands == 0 &&
        128 / nBands <= 32,
      s"$op: nBands $nBands must be even, divide 128, and give bands of " +
        "<= 32 bits (so band values pack under the band index at bit 48); " +
        "4 (32-bit bands) and 8 (16-bit bands) are the useful geometries")
    require(maxBits >= 0 && maxBits < nBands,
      s"$op: maxBits $maxBits needs nBands > maxBits (pigeonhole " +
        "completeness over the 128-bit dhash‖phash concatenation)")
  }

  /** (bk, id, dhash, phash) band postings of a keyed frame: the
    * 128-bit concatenation splits into nBands equal bands, nBands/2
    * from each 64-bit word. bk packs (band, value) collision-free:
    * value < 2^bandBits <= 2^32, so the band index shifted past bit
    * 48 can never alias another band's value range.
    */
  private def banded(k: DataFrame, nBands: Int): DataFrame = {
    val bandBits = 128 / nBands
    val perWord = nBands / 2
    def wordBands(word: Column, base: Int): Seq[Column] =
      (0 until perWord).map { j =>
        lit((base + j).toLong << 48) + shiftrightunsigned(word, j * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))
      }
    k.select(explode(array(
        wordBands(col("dhash"), 0) ++ wordBands(col("phash"), perWord): _*))
        .as("bk"),
      col("id"), col("dhash"), col("phash"))
  }

  /** Combined 128-bit Hamming distance — the match semantic. */
  private def combinedDist(da: Column, db: Column, pa: Column,
                           pb: Column): Column =
    (bit_count(da.bitwiseXOR(db)) + bit_count(pa.bitwiseXOR(pb)))
      .cast(LongType)

  private def writeDigest(spark: SparkSession, prefix: String,
                          digest: DataFrame): Unit = {
    Bucketing.dropTableAndLocation(spark, s"${prefix}_bdigest")
    digest.write.mode("overwrite").saveAsTable(s"${prefix}_bdigest")
  }

  private def appendDigestWords(spark: SparkSession, prefix: String,
                                delta: DataFrame): Unit =
    delta.write.mode("append").saveAsTable(s"${prefix}_bdigest")

  private def writeStats(spark: SparkSession, prefix: String, nImages: Long,
                         maxBits: Int, nBands: Int, lineage: String,
                         mBits: Int, digestK: Int): Unit = {
    Bucketing.dropTableAndLocation(spark, s"${prefix}_stats")
    spark.range(1).select(
        lit(nImages).as("n_images"), lit(maxBits).as("max_bits"),
        lit(nBands).as("n_bands"), lit(lineage).as("lineage"),
        lit(mBits).as("digest_mbits"), lit(digestK).as("digest_k"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
  }

  def buildImageIndex(hashes: DataFrame, idCol: String, dhashCol: String,
                      phashCol: String, prefix: String, maxBits: Int = 3,
                      nBands: Int = 4, lineage: String = "full",
                      digestK: Int = 4): Unit = {
    requireGeometry("buildImageIndex", maxBits, nBands)
    val spark = hashes.sparkSession
    val k = keyed(hashes, idCol, dhashCol, phashCol)
    Bucketing.dropTableAndLocation(spark, s"${prefix}_hashes")
    k.write.mode("overwrite").saveAsTable(s"${prefix}_hashes")
    Bucketing.dropTableAndLocation(spark, s"${prefix}_bands")
    banded(spark.table(s"${prefix}_hashes"), nBands)
      .write.mode("overwrite").saveAsTable(s"${prefix}_bands")
    val nImages = spark.table(s"${prefix}_hashes").count()
    val mBits = Retrieval.digestSizing(nImages * nBands)
    writeDigest(spark, prefix, Bloom.blockedDigestDf(
      spark.table(s"${prefix}_bands").select(col("bk")).distinct(),
      "bk", mBits, digestK))
    writeStats(spark, prefix, nImages, maxBits, nBands, lineage, mBits,
      digestK)
    Bucketing.dropTableAndLocation(spark, s"${prefix}_intent")
  }

  /** All (delta_id, index_id, dist <= maxBits) pairs between a probe
    * batch's hashes and everything ever admitted, dist = the combined
    * 128-bit Hamming distance — the oracle replays this as a
    * brute-force cross join (the banded filter is pigeonhole-complete
    * over the concatenation, verification exact).
    *
    * Plan shape: delta band keys are delta-sized × nBands; the
    * digest drops keys the index has never seen (and with 32-bit
    * band values it keeps doing so at any realistic corpus size);
    * survivors BROADCAST into the band-postings scan whose
    * denormalized hashes let the combined `bit_count(xor)` verify
    * MAP-SIDE — candidates never shuffle, and the one exchange
    * carries match-set-sized rows into the final distinct.
    */
  def gateImageMatches(spark: SparkSession, prefix: String,
                       delta: DataFrame, idCol: String, dhashCol: String,
                       phashCol: String): DataFrame = {
    requireNotTorn(spark, prefix, "gateImageMatches")
    val m = readMeta(spark, prefix)
    val dk = banded(keyed(delta, idCol, dhashCol, phashCol), m.nBands)
      .select(col("bk"), col("id").as("delta_id"),
        col("dhash").as("delta_dhash"), col("phash").as("delta_phash"))
    val flagged = Bloom.blockedDigestFlagged(dk, col("bk"),
      spark.table(s"${prefix}_bdigest"), m.mBits, m.k)
    if (flagged.isEmpty)
      spark.range(0).select(lit(0L).as("delta_id"),
        lit(0L).as("index_id"), lit(0L).as("dist"))
    else broadcast(flagged)
      .join(spark.table(s"${prefix}_bands")
        .select(col("bk"), col("id").as("index_id"),
          col("dhash").as("index_dhash"), col("phash").as("index_phash")),
        Seq("bk"))
      .withColumn("dist", combinedDist(col("delta_dhash"), col("index_dhash"),
        col("delta_phash"), col("index_phash")))
      .filter(col("dist") <= m.maxBits)
      .select(col("delta_id"), col("index_id"), col("dist"))
      .distinct()
  }

  /** Append NEW images in O(delta): hashes + band postings land
    * beside the existing tables, the band digest grows by the
    * delta's nonzero Bloom words (full rebuild only at a
    * [[Retrieval.digestSizing]] resize boundary), the fold is
    * bracketed by the intent marker, and re-submitted ids are
    * refused (an id collision would fork verification).
    */
  def appendToImageIndex(spark: SparkSession, prefix: String,
                         newImgs: DataFrame, idCol: String, dhashCol: String,
                         phashCol: String, lineageTag: String = ""): Unit = {
    require(!newImgs.isEmpty, "appendToImageIndex: delta is empty — " +
      "nothing to append (guard upstream, or skip the fold)")
    requireNotTorn(spark, prefix, "appendToImageIndex")
    val m = readMeta(spark, prefix)
    val deltaFp = IndexStore.corpusFingerprint(newImgs,
      Seq(idCol, dhashCol, phashCol))
    val entry = if (lineageTag.nonEmpty) s"$lineageTag:$deltaFp" else deltaFp
    val k = keyed(newImgs, idCol, dhashCol, phashCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val clash = spark.table(s"${prefix}_hashes")
        .join(k.select(col("id")), Seq("id"), "left_semi")
        .select(col("id")).limit(1).collect()
      require(clash.isEmpty,
        s"appendToImageIndex: delta re-submits image id " +
          s"${clash.headOption.map(_.get(0)).getOrElse("")} already in " +
          s"$prefix — append is for NEW images; rebuild to replace")
      Bucketing.dropTableAndLocation(spark, s"${prefix}_intent")
      spark.range(1).select(lit(entry).as("entry"),
          lit(m.nImages).as("n_images_before"))
        .write.mode("overwrite").saveAsTable(s"${prefix}_intent")
      k.write.mode("append").saveAsTable(s"${prefix}_hashes")
      val bands = banded(k, m.nBands)
      bands.write.mode("append").saveAsTable(s"${prefix}_bands")
      val nTotal = m.nImages + k.count()
      val mBits = Retrieval.digestSizing(nTotal * m.nBands)
      if (mBits == m.mBits)
        appendDigestWords(spark, prefix, Bloom.blockedDigestDf(
          bands.select(col("bk")).distinct(), "bk", mBits, m.k))
      else // resize boundary: the one full-postings rebuild
        writeDigest(spark, prefix, Bloom.blockedDigestDf(
          spark.table(s"${prefix}_bands").select(col("bk")).distinct(),
          "bk", mBits, m.k))
      writeStats(spark, prefix, nTotal, m.maxBits, m.nBands,
        s"${m.lineage}+$entry", mBits, m.k)
      Bucketing.dropTableAndLocation(spark, s"${prefix}_intent") // commit
    } finally k.unpersist(blocking = false)
  }

  private val Tables = Seq("hashes", "bands", "bdigest", "stats")

  /** Build-once gate keyed by hash-corpus fingerprint + params. */
  def imageIndexCached(hashes: DataFrame, idCol: String, dhashCol: String,
                       phashCol: String, maxBits: Int = 3, nBands: Int = 4,
                       namespace: String = "imgidx_v2"): String = {
    val spark = hashes.sparkSession
    val fp = IndexStore.corpusFingerprint(hashes,
      Seq(idCol, dhashCol, phashCol))
    val prefix = s"${namespace}_${fp}_d${maxBits}b$nBands"
    val have = Tables.forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildImageIndex(hashes, idCol, dhashCol, phashCol, prefix,
      maxBits, nBands, lineage = fp)
    prefix
  }

  /** Build-once gate for the appended composite, idempotent via the
    * lineage ledger (the [[EditIndex.editAppendCached]] shape).
    */
  def imageAppendCached(base: DataFrame, delta: DataFrame,
                        idCol: String, dhashCol: String, phashCol: String,
                        maxBits: Int = 3, nBands: Int = 4,
                        namespace: String = "imgidx_v2"): String = {
    val spark = base.sparkSession
    val baseFp = IndexStore.corpusFingerprint(base,
      Seq(idCol, dhashCol, phashCol))
    val deltaFp = IndexStore.corpusFingerprint(delta,
      Seq(idCol, dhashCol, phashCol))
    val prefix = s"${namespace}_${baseFp}_plus_${deltaFp}_d${maxBits}b$nBands"
    val have = Tables.forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildImageIndex(base, idCol, dhashCol, phashCol, prefix,
      maxBits, nBands, lineage = baseFp)
    val lineage = spark.table(s"${prefix}_stats").head()
      .getAs[String]("lineage")
    if (!IvfIndex.lineageHasFingerprint(lineage, deltaFp))
      appendToImageIndex(spark, prefix, delta, idCol, dhashCol, phashCol)
    prefix
  }
}
