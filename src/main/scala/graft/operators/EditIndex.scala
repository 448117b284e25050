package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persisted edit-similarity (entity-resolution) index — the FUZZY-KEY
  * member of the serve-many index split beside [[DedupIndex]] (exact
  * text) and [[NearDupIndex]] (near-dup text): "is any of today's
  * arriving names/titles within Levenshtein d of a record EVER
  * admitted?" answered without re-reading, let alone re-gramming, the
  * historical corpus. [[EditSimilarity.editSimilarityJoin]] is the
  * one-shot form this index amortizes.
  *
  * Tables under a prefix:
  *   - `{prefix}_grams` (gram, id, s, len) — ALL distinct q-grams of
  *     every admitted string, with the string and its length
  *     DENORMALIZED into each posting (the BM25-postings trick: the
  *     one corpus-keyed join — postings ⋈ strings — is paid at build
  *     time so the probe path never shuffles candidate-sized rows to
  *     fetch verification strings; measured 2x on a saturated-gram
  *     corpus). Storing the full gram set (not a prefix) is
  *     what makes the probe's ONE-SIDED prefix filter complete under
  *     ANY term order: if ed(x, y) <= d then |G(x) ∩ G(y)| >=
  *     |G(x)| − q·d, and x's (q·d+1)-prefix cannot avoid that
  *     intersection — so the INDEX side never depends on gram
  *     frequencies, and frequency drift as the index grows can never
  *     break correctness, only shift probe cost;
  *   - `{prefix}_strs` (id, s, len) — the verification tier
  *     (levenshtein runs against stored strings) and the length-band
  *     fallback for degenerate probe strings;
  *   - `{prefix}_gramfreq` (gram, f) — rarity hints for probe-side
  *     prefix selection, APPEND-only rows SUM-folded on read (the
  *     Bloom-digest discipline applied to counts: order is a
  *     performance hint, completeness holds for any order, so stale
  *     folds are harmless by construction). A delta gram absent from
  *     the table ranks rarest at f=0 — correctly, since it can match
  *     no posting;
  *   - `{prefix}_gdigest` — Bloom words over xxhash64(gram): the
  *     map-only prefilter that lets a batch sharing NO gram with the
  *     index skip the postings entirely;
  *   - `{prefix}_stats` — n_strs, q, max_dist, digest params, lineage
  *     ledger; gates read q/d from here so a probe can never gram
  *     differently than the build did;
  *   - `{prefix}_intent` — torn-append marker (shared discipline).
  */
object EditIndex {

  private def requireNotTorn(spark: SparkSession, prefix: String,
                             op: String): Unit =
    require(!spark.catalog.tableExists(s"${prefix}_intent"),
      s"$op: edit index $prefix has a pending append intent marker " +
        s"(${prefix}_intent) — a prior append crashed mid-fold; rebuild " +
        "the index (or restore a consistent snapshot) first.")

  private def gramKey(gram: Column): Column = xxhash64(gram)

  private case class Meta(nStrs: Long, q: Int, maxDist: Int,
                          lineage: String, mBits: Int, k: Int)

  private def readMeta(spark: SparkSession, prefix: String): Meta = {
    val r = spark.table(s"${prefix}_stats").head()
    Meta(r.getAs[Long]("n_strs"), r.getAs[Int]("q"), r.getAs[Int]("max_dist"),
      r.getAs[String]("lineage"), r.getAs[Int]("digest_mbits"),
      r.getAs[Int]("digest_k"))
  }

  /** (id, s, len, grams) projection shared by build and gate — one
    * definition, the [[EditSimilarity]] gram recipe.
    */
  private def keyed(df: DataFrame, idCol: String, strCol: String,
                    q: Int): DataFrame =
    df.select(col(idCol).cast(LongType).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
      .withColumn("grams", array_distinct(
        when(col("len") < q, array(col("s")))
          .otherwise(transform(sequence(lit(0), col("len") - q),
            i => col("s").substr(i + lit(1), lit(q))))))

  private def writeDigest(spark: SparkSession, prefix: String,
                          words: Array[Long]): Unit = {
    import spark.implicits._
    Bucketing.dropTableAndLocation(spark, s"${prefix}_gdigest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq
      .toDF("idx", "word").coalesce(1)
      .write.mode("overwrite").saveAsTable(s"${prefix}_gdigest")
  }

  private def appendDigestWords(spark: SparkSession, prefix: String,
                                deltaWords: Array[Long]): Unit = {
    import spark.implicits._
    val nz = deltaWords.zipWithIndex
      .collect { case (w, i) if w != 0L => (i.toLong, w) }
    if (nz.nonEmpty)
      nz.toSeq.toDF("idx", "word").coalesce(1)
        .write.mode("append").saveAsTable(s"${prefix}_gdigest")
  }

  private def readDigest(spark: SparkSession, prefix: String,
                         mBits: Int): Array[Long] = {
    val rows = spark.table(s"${prefix}_gdigest")
      .groupBy(col("idx")).agg(bit_or(col("word")).as("word")).collect()
    val words = new Array[Long](mBits / 64)
    require(rows.length == words.length,
      s"gram digest ${prefix}_gdigest has ${rows.length} words, expected ${words.length}")
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  def buildEditIndex(corpus: DataFrame, idCol: String, strCol: String,
                     prefix: String, maxDist: Int = 1, q: Int = 3,
                     lineage: String = "full", digestK: Int = 4): Unit = {
    require(maxDist >= 0 && q >= 1, "bad edit-index params")
    val spark = corpus.sparkSession
    val k = keyed(corpus, idCol, strCol, q)
    Bucketing.dropTableAndLocation(spark, s"${prefix}_strs")
    k.select(col("id"), col("s"), col("len"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_strs")
    val grams = k.select(col("id"), col("s"), col("len"),
      explode(col("grams")).as("gram"))
    Bucketing.dropTableAndLocation(spark, s"${prefix}_grams")
    grams.write.mode("overwrite").saveAsTable(s"${prefix}_grams")
    Bucketing.dropTableAndLocation(spark, s"${prefix}_gramfreq")
    spark.table(s"${prefix}_grams")
      .groupBy(col("gram")).agg(count(lit(1)).as("f"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_gramfreq")
    val nStrs = spark.table(s"${prefix}_strs").count()
    val nGramRows = spark.table(s"${prefix}_grams").count()
    val mBits = Retrieval.digestSizing(nGramRows)
    writeDigest(spark, prefix, Bloom.buildLongKeyBloom(
      spark.table(s"${prefix}_grams")
        .select(gramKey(col("gram")).as("gk")).distinct(),
      "gk", mBits, digestK))
    Bucketing.dropTableAndLocation(spark, s"${prefix}_stats")
    spark.range(1).select(
        lit(nStrs).as("n_strs"), lit(q).as("q"), lit(maxDist).as("max_dist"),
        lit(lineage).as("lineage"),
        lit(mBits).as("digest_mbits"), lit(digestK).as("digest_k"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
    Bucketing.dropTableAndLocation(spark, s"${prefix}_intent")
  }

  /** All (delta_id, index_id, dist <= maxDist) pairs between a probe
    * batch and everything ever admitted — TRUE edit-distance
    * semantics (the one-sided prefix filter is complete, and
    * verification is exact levenshtein), which is what the oracle
    * replays as a brute-force cross join.
    *
    * Plan shape: delta grams + rarity ranking are delta-sized (the
    * freq lookup scans the vocab-sized gramfreq column, never the
    * corpus); the digest prefilter drops every probe gram the index
    * has never seen — an all-new batch reads NO postings; the
    * surviving prefix grams BROADCAST into the postings scan, whose
    * denormalized (s, len) lets the length band and exact levenshtein
    * run MAP-SIDE in the same stage — candidates never shuffle, and
    * the one exchange after the scan carries match-set-sized rows
    * into the final distinct. Degenerate probe strings (fewer than
    * q·d+1 distinct grams — outside the lemma) fall back to an exact
    * length-band equi-join against the strs table, taken only when
    * such strings exist in the batch.
    */
  def gateEditMatches(spark: SparkSession, prefix: String,
                      delta: DataFrame, idCol: String,
                      strCol: String): DataFrame = {
    requireNotTorn(spark, prefix, "gateEditMatches")
    val m = readMeta(spark, prefix)
    val prefixLen = m.q * m.maxDist + 1
    val dd = keyed(delta, idCol, strCol, m.q)
      .withColumn("n_grams", size(col("grams")))
    val longs = dd.filter(col("n_grams") >= prefixLen)
      .select(col("id").as("delta_id"), col("s").as("delta_s"),
        col("len").as("delta_len"), explode(col("grams")).as("gram"))
    // rarity: left join against the SUM-folded freq table; absent
    // grams rank rarest at 0 (they can match no posting)
    val freq = spark.table(s"${prefix}_gramfreq")
      .groupBy(col("gram")).agg(sum(col("f")).as("f"))
    val byRarity = Window.partitionBy(col("delta_id"))
      .orderBy(col("f"), col("gram"))
    val pref = longs.join(freq, Seq("gram"), "left")
      .withColumn("f", coalesce(col("f"), lit(0L)))
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefixLen)
      .select(col("delta_id"), col("delta_s"), col("delta_len"), col("gram"))
    val words = readDigest(spark, prefix, m.mBits)
    val flagged = pref.filter(Bloom.longKeyBloomMayContain(
      gramKey(col("gram")), words, m.mBits, m.k))
    val empty = spark.range(0).select(lit(0L).as("delta_id"),
      lit(0L).as("index_id"), lit(0L).as("dist"))
    // probe = broadcast of the (batch-sized) flagged prefix grams into
    // the postings scan; verification is MAP-SIDE on the denormalized
    // (s, len) — no candidate-sized exchange, no strings fetch. A pair
    // sharing several prefix grams verifies that many times; the final
    // distinct collapses multiplicity on the MATCH set only.
    val longPairs =
      if (flagged.isEmpty) empty
      else broadcast(flagged)
        .join(spark.table(s"${prefix}_grams")
          .select(col("gram"), col("id").as("index_id"),
            col("s").as("index_s"), col("len").as("index_len")),
          Seq("gram"))
        .filter(abs(col("delta_len") - col("index_len")) <= m.maxDist)
        .withColumn("dist",
          levenshtein(col("delta_s"), col("index_s")).cast(LongType))
        .filter(col("dist") <= m.maxDist)
        .select(col("delta_id"), col("index_id"), col("dist"))
    val shorts = dd.filter(col("n_grams") < prefixLen)
      .select(col("id").as("delta_id"), col("s").as("delta_s"),
        explode(sequence(col("len") - m.maxDist,
          col("len") + m.maxDist)).as("len"))
    val shortPairs =
      if (shorts.isEmpty) empty
      else shorts
        .join(spark.table(s"${prefix}_strs")
          .select(col("id").as("index_id"), col("s").as("index_s"),
            col("len")), Seq("len"))
        .withColumn("dist",
          levenshtein(col("delta_s"), col("index_s")).cast(LongType))
        .filter(col("dist") <= m.maxDist)
        .select(col("delta_id"), col("index_id"), col("dist"))
    // tiers are disjoint (a delta string is long xor degenerate); the
    // distinct collapses shared-prefix-gram multiplicity within the
    // long tier, over match-set-sized rows
    longPairs.unionByName(shortPairs).distinct()
  }

  /** Append NEW records in O(delta): their strings, full gram
    * postings and per-gram counts land beside the existing tables
    * (per-record facts — probe answers over build(base)+append(delta)
    * are identical to build(base ∪ delta) because gate completeness
    * never depended on frequency order), the gram digest grows by
    * appending the delta's nonzero Bloom words ([[appendDigestWords]];
    * a full postings scan only on a [[Retrieval.digestSizing]] resize
    * boundary, which also compacts the SUM-folded freq rows away),
    * and the whole fold is bracketed by the intent marker. The id
    * guard refuses a record id already admitted — an id collision
    * would fork verification.
    */
  def appendToEditIndex(spark: SparkSession, prefix: String,
                        newRecs: DataFrame, idCol: String, strCol: String,
                        lineageTag: String = ""): Unit = {
    require(!newRecs.isEmpty, "appendToEditIndex: delta is empty — " +
      "nothing to append (guard upstream, or skip the fold)")
    requireNotTorn(spark, prefix, "appendToEditIndex")
    val m = readMeta(spark, prefix)
    val deltaFp = IndexStore.corpusFingerprint(newRecs, Seq(idCol, strCol))
    val entry = if (lineageTag.nonEmpty) s"$lineageTag:$deltaFp" else deltaFp
    val k = keyed(newRecs, idCol, strCol, m.q)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val clash = spark.table(s"${prefix}_strs")
        .join(k.select(col("id")), Seq("id"), "left_semi")
        .select(col("id")).limit(1).collect()
      require(clash.isEmpty,
        s"appendToEditIndex: delta re-submits record id " +
          s"${clash.headOption.map(_.get(0)).getOrElse("")} already in " +
          s"$prefix — append is for NEW records; rebuild to replace")
      Bucketing.dropTableAndLocation(spark, s"${prefix}_intent")
      spark.range(1).select(lit(entry).as("entry"),
          lit(m.nStrs).as("n_strs_before"))
        .write.mode("overwrite").saveAsTable(s"${prefix}_intent")
      k.select(col("id"), col("s"), col("len"))
        .write.mode("append").saveAsTable(s"${prefix}_strs")
      val grams = k.select(col("id"), col("s"), col("len"),
        explode(col("grams")).as("gram"))
      grams.write.mode("append").saveAsTable(s"${prefix}_grams")
      grams.groupBy(col("gram")).agg(count(lit(1)).as("f"))
        .write.mode("append").saveAsTable(s"${prefix}_gramfreq")
      val nTotal = m.nStrs + k.count()
      val nGramRows = spark.table(s"${prefix}_grams").count()
      val mBits = Retrieval.digestSizing(nGramRows)
      if (mBits == m.mBits)
        appendDigestWords(spark, prefix, Bloom.buildLongKeyBloom(
          grams.select(gramKey(col("gram")).as("gk")).distinct(),
          "gk", mBits, m.k))
      else {
        // resize boundary: the one full-postings rebuild; also
        // compact the SUM-folded freq rows
        writeDigest(spark, prefix, Bloom.buildLongKeyBloom(
          spark.table(s"${prefix}_grams")
            .select(gramKey(col("gram")).as("gk")).distinct(),
          "gk", mBits, m.k))
        val folded = spark.table(s"${prefix}_gramfreq")
          .groupBy(col("gram")).agg(sum(col("f")).as("f"))
          .localCheckpoint() // sever lineage before the overwrite
        Bucketing.dropTableAndLocation(spark, s"${prefix}_gramfreq")
        folded.write.mode("overwrite").saveAsTable(s"${prefix}_gramfreq")
      }
      Bucketing.dropTableAndLocation(spark, s"${prefix}_stats")
      spark.range(1).select(
          lit(nTotal).as("n_strs"), lit(m.q).as("q"),
          lit(m.maxDist).as("max_dist"),
          lit(s"${m.lineage}+$entry").as("lineage"),
          lit(mBits).as("digest_mbits"), lit(m.k).as("digest_k"))
        .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
      Bucketing.dropTableAndLocation(spark, s"${prefix}_intent") // commit
    } finally k.unpersist(blocking = false)
  }

  /** Build-once gate keyed by corpus fingerprint + gram params. */
  def editIndexCached(corpus: DataFrame, idCol: String, strCol: String,
                      maxDist: Int = 1, q: Int = 3,
                      namespace: String = "edidx_v1"): String = {
    val spark = corpus.sparkSession
    val fp = IndexStore.corpusFingerprint(corpus, Seq(idCol, strCol))
    val prefix = s"${namespace}_${fp}_q${q}d$maxDist"
    val have = Seq("grams", "strs", "gramfreq", "gdigest", "stats")
      .forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildEditIndex(corpus, idCol, strCol, prefix, maxDist, q,
      lineage = fp)
    prefix
  }

  /** Build-once gate for the appended composite, idempotent via the
    * lineage ledger (the [[NearDupIndex.nearDupAppendCached]] shape;
    * every gram param is part of the key).
    */
  def editAppendCached(base: DataFrame, delta: DataFrame,
                       idCol: String, strCol: String,
                       maxDist: Int = 1, q: Int = 3): String = {
    val spark = base.sparkSession
    val baseFp = IndexStore.corpusFingerprint(base, Seq(idCol, strCol))
    val deltaFp = IndexStore.corpusFingerprint(delta, Seq(idCol, strCol))
    val prefix = s"edidx_v1_${baseFp}_plus_${deltaFp}_q${q}d$maxDist"
    val have = Seq("grams", "strs", "gramfreq", "gdigest", "stats")
      .forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildEditIndex(base, idCol, strCol, prefix, maxDist, q,
      lineage = baseFp)
    val lineage = spark.table(s"${prefix}_stats").head()
      .getAs[String]("lineage")
    if (!IvfIndex.lineageHasFingerprint(lineage, deltaFp))
      appendToEditIndex(spark, prefix, delta, idCol, strCol)
    prefix
  }
}
