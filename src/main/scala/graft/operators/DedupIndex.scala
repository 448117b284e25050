package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.NativeFunctions

/** Persisted exact-dedup fingerprint index — the dedup-family member
  * of the serve-many index split ([[Retrieval]] BM25, [[IvfIndex]]):
  * "dedup today's arrivals against everything EVER ingested" without
  * re-reading the historical corpus. [[Dedup.exactDedup]] answers the
  * one-shot question; at 100 TB the question is incremental, and the
  * corpus must never be re-scanned per batch.
  *
  * Tables under a prefix:
  *   - `{prefix}_fps` (fp, text_md5, keep_id) — one row per distinct
  *     text ever ingested: the portable polynomial fingerprint (the
  *     LONG key the Bloom digest is built over), the md5 the EXACT
  *     tier confirms on (fp is 64-bit — a hash-only dedup would make
  *     silent false dups at corpus scale), and the surviving id;
  *   - `{prefix}_fpdigest` — Bloom words over fp (mBits/8 bytes);
  *   - `{prefix}_stats` — n_fps, lineage ledger, digest params;
  *   - `{prefix}_intent` — crash marker (the [[IvfIndex]] torn-append
  *     discipline: appends are in-place, so a retry after a crash
  *     must be refused loudly, never allowed to duplicate rows).
  *
  * Gate cost shape: tier 1 is a MAP-ONLY Bloom probe of the batch
  * (the digest rides the plan as a literal); when it flags NOTHING —
  * the common all-new batch — the index is never read at all. Only
  * flagged rows (true dups + the sized FP rate) reach tier 2, one
  * semi-join against the fps table's (md5, keep_id) projection.
  * Null text is a VALUE: null-text rows dedup against each other
  * (the [[Dedup.exactDedup]] contract), keyed by an empty-string
  * sentinel distinct from any real md5.
  */
object DedupIndex {

  private def requireNotTorn(spark: SparkSession, prefix: String,
                             op: String): Unit =
    require(!spark.catalog.tableExists(s"${prefix}_intent"),
      s"$op: dedup index $prefix has a pending append intent marker " +
        s"(${prefix}_intent) — a prior append crashed between its first " +
        "write and its commit; rebuild the index (or restore a " +
        "consistent snapshot) before gating or appending.")

  /** (id, fp, text_md5) projection shared by build and gate — ONE
    * definition, so a delta row fingerprints exactly as a rebuild
    * would fingerprint it.
    */
  private def keyed(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("id"),
      coalesce(NativeFunctions.polyFingerprint(col(textCol)), lit(0L)).as("fp"),
      coalesce(md5(col(textCol)), lit("")).as("text_md5"))

  def buildDedupIndex(corpus: DataFrame, idCol: String, textCol: String,
                      prefix: String, lineage: String = "full",
                      digestK: Int = 4): Unit = {
    val spark = corpus.sparkSession
    val fps = keyed(corpus, idCol, textCol)
      .groupBy(col("fp"), col("text_md5"))
      .agg(min(col("id")).as("keep_id"))
    Bucketing.dropTableAndLocation(spark, s"${prefix}_fps")
    fps.write.mode("overwrite").saveAsTable(s"${prefix}_fps")
    val nFps = spark.table(s"${prefix}_fps").count()
    val mBits = Retrieval.digestSizing(nFps)
    writeDigest(spark, prefix,
      Bloom.blockedDigestDf(spark.table(s"${prefix}_fps"), "fp",
        mBits, digestK))
    Bucketing.dropTableAndLocation(spark, s"${prefix}_stats")
    spark.range(1).select(
        lit(nFps).as("n_fps"),
        lit(lineage).as("lineage"),
        lit(mBits).as("digest_mbits"),
        lit(digestK).as("digest_k"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
    Bucketing.dropTableAndLocation(spark, s"${prefix}_intent")
  }

  private def writeDigest(spark: SparkSession, prefix: String,
                          digest: org.apache.spark.sql.DataFrame): Unit = {
    Bucketing.dropTableAndLocation(spark, s"${prefix}_fpdigest")
    digest.write.mode("overwrite").saveAsTable(s"${prefix}_fpdigest")
  }

  /** O(delta) digest maintenance (the [[NearDupIndex]] discipline):
    * only the delta's nonzero words append as rows; the probe's
    * bit_or fold per idx is exact because Bloom bits only turn on.
    * Full rewrites happen at build and resize only, compacting the
    * appended rows away.
    */
  private def appendDigestWords(spark: SparkSession, prefix: String,
                                delta: org.apache.spark.sql.DataFrame): Unit =
    delta.write.mode("append").saveAsTable(s"${prefix}_fpdigest")

  private case class Meta(nFps: Long, lineage: String, mBits: Int, k: Int)

  private def readMeta(spark: SparkSession, prefix: String): Meta = {
    val row = spark.table(s"${prefix}_stats").head()
    Meta(row.getAs[Long]("n_fps"), row.getAs[String]("lineage"),
      row.getAs[Int]("digest_mbits"), row.getAs[Int]("digest_k"))
  }

  /** Gate a delta against the index AND against itself: every delta
    * row comes back with `is_dup` and `dup_of` (the surviving id it
    * duplicates — an index keep_id when the text was ever ingested,
    * else the delta's own first occurrence by id). A row is NEW —
    * the append set — iff `!is_dup`.
    *
    * Plan shape: one delta-sized shuffle on the text key (the
    * in-batch first-occurrence window), a map-only digest probe, and
    * — ONLY when the digest flags something — one join of the
    * flagged md5 set against the fps table's two-column projection.
    * An all-new batch never reads the index.
    */
  def gateNewDocs(spark: SparkSession, prefix: String, delta: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    requireNotTorn(spark, prefix, "gateNewDocs")
    val meta = readMeta(spark, prefix)
    val w = Window.partitionBy(col("text_md5")).orderBy(col("id"))
    val dd = keyed(delta, idCol, textCol)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__first_id", first(col("id")).over(w))
    val flagged = Bloom.blockedDigestFlagged(dd, col("fp"),
        spark.table(s"${prefix}_fpdigest"), meta.mBits, meta.k)
      .select(col("text_md5")).distinct()
    val hits =
      if (flagged.isEmpty)
        spark.emptyDataFrame
          .select(lit("").as("text_md5"), lit(0L).as("__keep"))
          .limit(0)
      else
        spark.table(s"${prefix}_fps")
          .select(col("text_md5"), col("keep_id").as("__keep"))
          .join(flagged, Seq("text_md5"), "left_semi")
    dd.join(hits, Seq("text_md5"), "left")
      .select(col("id"), col("fp"), col("text_md5"),
        (col("__keep").isNotNull || col("__rn") > 1).as("is_dup"),
        coalesce(col("__keep"),
          when(col("__rn") > 1, col("__first_id"))).as("dup_of"))
  }

  /** Append the gated survivors of a delta in O(delta): one
    * fps-append of the batch's new distinct texts, a digest grown by
    * APPENDING the delta's nonzero Bloom words as rows
    * ([[appendDigestWords]]; the full fp column is re-scanned only
    * on a [[Retrieval.digestSizing]] resize boundary), stats/ledger
    * update. The
    * two-tier disjointness guard refuses re-submitted texts loudly —
    * the same "append is for NEW rows" contract as the other index
    * families — and the intent marker brackets the non-atomic fold
    * exactly as in [[IvfIndex.appendToIvfIndex]].
    */
  def appendToDedupIndex(spark: SparkSession, prefix: String,
                         delta: DataFrame, idCol: String, textCol: String,
                         lineageTag: String = ""): Unit = {
    require(!delta.isEmpty, "appendToDedupIndex: delta is empty — " +
      "nothing to append (guard upstream, or skip the fold)")
    requireNotTorn(spark, prefix, "appendToDedupIndex")
    val meta = readMeta(spark, prefix)
    val deltaFp = IndexStore.corpusFingerprint(delta, Seq(idCol, textCol))
    val entry = if (lineageTag.nonEmpty) s"$lineageTag:$deltaFp" else deltaFp
    val fps = keyed(delta, idCol, textCol)
      .groupBy(col("fp"), col("text_md5"))
      .agg(min(col("id")).as("keep_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val flagged = Bloom.blockedDigestFlagged(fps, col("fp"),
          spark.table(s"${prefix}_fpdigest"), meta.mBits, meta.k)
        .select(col("text_md5"))
      if (!flagged.isEmpty) {
        val clash = spark.table(s"${prefix}_fps")
          .join(flagged, Seq("text_md5"), "left_semi")
          .select(col("keep_id")).limit(1).collect()
        require(clash.isEmpty,
          s"appendToDedupIndex: delta re-submits a text already in $prefix " +
            s"(surviving id ${clash.headOption.map(_.get(0)).getOrElse("")}) " +
            "— gate the delta first (gateNewDocs) and append only !is_dup rows")
      }
      Bucketing.dropTableAndLocation(spark, s"${prefix}_intent")
      spark.range(1).select(lit(entry).as("entry"),
          lit(meta.nFps).as("n_fps_before"))
        .write.mode("overwrite").saveAsTable(s"${prefix}_intent")
      fps.write.mode("append").saveAsTable(s"${prefix}_fps")
      val nDelta = fps.count()
      val nTotal = meta.nFps + nDelta
      // re-sized for the grown count at every append; same mBits →
      // append only the delta's nonzero words (the stored digest is
      // never touched), resize boundary → the one full fp-column
      // rebuild
      val mBits = Retrieval.digestSizing(nTotal)
      if (mBits == meta.mBits)
        appendDigestWords(spark, prefix,
          Bloom.blockedDigestDf(fps, "fp", mBits, meta.k))
      else
        writeDigest(spark, prefix,
          Bloom.blockedDigestDf(spark.table(s"${prefix}_fps"), "fp",
            mBits, meta.k))
      Bucketing.dropTableAndLocation(spark, s"${prefix}_stats")
      spark.range(1).select(
          lit(nTotal).as("n_fps"),
          lit(s"${meta.lineage}+$entry").as("lineage"),
          lit(mBits).as("digest_mbits"),
          lit(meta.k).as("digest_k"))
        .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
      Bucketing.dropTableAndLocation(spark, s"${prefix}_intent") // commit
    } finally fps.unpersist(blocking = false)
  }

  /** Build-once gate keyed by corpus fingerprint. */
  def dedupIndexCached(corpus: DataFrame, idCol: String, textCol: String,
                       namespace: String = "ddidx_v1"): String = {
    val spark = corpus.sparkSession
    val fp = IndexStore.corpusFingerprint(corpus, Seq(idCol, textCol))
    val prefix = s"${namespace}_$fp"
    val have = Seq("fps", "fpdigest", "stats")
      .forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildDedupIndex(corpus, idCol, textCol, prefix, lineage = fp)
    prefix
  }

  /** Build-once gate for the gated-append composite (base fingerprint
    * + delta fingerprint), idempotent via the lineage ledger — the
    * [[IvfIndex.ivfAppendCached]] pattern for the dedup family.
    */
  def dedupAppendCached(base: DataFrame, delta: DataFrame,
                        idCol: String, textCol: String): String = {
    val spark = base.sparkSession
    val baseFp = IndexStore.corpusFingerprint(base, Seq(idCol, textCol))
    val deltaFp = IndexStore.corpusFingerprint(delta, Seq(idCol, textCol))
    val prefix = s"ddidx_v1_${baseFp}_plus_$deltaFp"
    val have = Seq("fps", "fpdigest", "stats")
      .forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildDedupIndex(base, idCol, textCol, prefix, lineage = baseFp)
    // the ledger key is the FULL delta's fingerprint carried as the
    // entry's TAG — the appended rows are the gated survivors, whose
    // own fingerprint differs whenever the delta held a dup, so tag
    // membership (not fp membership) is what makes a second call a
    // ledger hit. An all-dup delta appends nothing and leaves no
    // entry: the retry re-gates, which is O(delta) and answer-stable.
    if (!IvfIndex.lineageHasTag(spark, prefix, deltaFp)) {
      val survivors = gateNewDocs(spark, prefix, delta, idCol, textCol)
        .filter(!col("is_dup")).select(col("id"))
      val newDocs = delta.join(
        survivors.withColumnRenamed("id", idCol), Seq(idCol), "left_semi")
      if (!newDocs.isEmpty)
        appendToDedupIndex(spark, prefix, newDocs, idCol, textCol,
          lineageTag = deltaFp)
    }
    prefix
  }
}
