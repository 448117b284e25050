package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persisted edit-similarity (entity-resolution) index — the FUZZY-KEY
  * member of the serve-many index split beside [[DedupIndex]] (exact
  * text) and [[NearDupIndex]] (near-dup text): "is any of today's
  * arriving names/titles within Levenshtein d of a record EVER
  * admitted?" answered without re-reading, let alone re-keying, the
  * historical corpus. [[EditSimilarity.editSimilarityJoin]] is the
  * one-shot form this index amortizes.
  *
  * TWO CANDIDATE STRATEGIES, chosen at build time and recorded in the
  * stats table so probes can never key differently than the build did:
  *
  *   - `deletion` (default for maxDist <= 2): postings are the 64-bit
  *     hashes of each string's DELETION NEIGHBORHOOD — the string
  *     with up to d characters removed ([[EditSimilarity]]'s scaladoc
  *     proves completeness). The blocking key carries the whole
  *     string's entropy minus d characters, so low-entropy corpora
  *     (zero-padded ids, constant prefixes) cost the SAME as
  *     high-entropy ones: per-key posting lists hold genuine
  *     lookalikes only, never gram-share cohorts. No frequency
  *     table, no rarity window, no degenerate tier (the scheme is
  *     complete at every length). This is the remedy for the
  *     saturated-gram-space failure mode the q-gram tier documents.
  *   - `qgram` (maxDist >= 3, where C(len, d) variant counts stop
  *     paying): the Gravano prefix-filter postings, kept exactly as
  *     before — full gram sets denormalized with (s, len), SUM-folded
  *     gram frequencies as probe-side rarity hints, length-band
  *     fallback for degenerate strings.
  *
  * Tables under a prefix (strategy-dependent):
  *   - `{prefix}_strs` (id, s, len) — admitted strings: the id-clash
  *     guard, the qgram degenerate fallback, and rebuild source;
  *   - `{prefix}_dels` (vk, id, s, len) — deletion mode: variant-hash
  *     postings with the string DENORMALIZED (the BM25-postings
  *     trick) so verification runs map-side behind a broadcast probe;
  *   - `{prefix}_grams` / `{prefix}_gramfreq` — qgram mode postings
  *     and rarity hints (append-only rows SUM-folded on read);
  *   - `{prefix}_gdigest` — Bloom words over the posting keys
  *     (variant hashes / xxhash64(gram)): the map-only prefilter that
  *     lets a batch sharing NO key with the index skip the postings
  *     entirely;
  *   - `{prefix}_stats` — n_strs, q, max_dist, strategy, digest
  *     params, lineage ledger;
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
                          lineage: String, mBits: Int, k: Int,
                          strategy: String, prefixLen: Int)

  private def readMeta(spark: SparkSession, prefix: String): Meta = {
    val t = spark.table(s"${prefix}_stats")
    val r = t.head()
    // del_prefix_len arrived with the FastSS prefix-pruning tier;
    // pre-existing stats rows read as 0 (unpruned), the behavior
    // those indexes were built with
    val pl = if (t.columns.contains("del_prefix_len"))
      r.getAs[Int]("del_prefix_len") else 0
    Meta(r.getAs[Long]("n_strs"), r.getAs[Int]("q"), r.getAs[Int]("max_dist"),
      r.getAs[String]("lineage"), r.getAs[Int]("digest_mbits"),
      r.getAs[Int]("digest_k"), r.getAs[String]("strategy"), pl)
  }

  /** (id, s, len, grams) projection shared by build and gate — one
    * definition, the [[EditSimilarity]] gram recipe. The id cast is
    * LOUD: a null or non-castable id would flow through as a null
    * that never equi-joins — silently defeating both the append
    * id-clash guard and pair reporting — so it raises instead.
    */
  private def keyed(df: DataFrame, idCol: String, strCol: String,
                    q: Int): DataFrame =
    df.select(
        when(col(idCol).isNull || col(idCol).try_cast(LongType).isNull,
          raise_error(concat(lit(s"EditIndex: id column '$idCol' value '"),
            coalesce(col(idCol).cast("string"), lit("NULL")),
            lit("' is not castable to LONG — ids must be non-null integers"))))
          .otherwise(col(idCol).try_cast(LongType)).as("id"),
        col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
      .withColumn("grams", array_distinct(
        when(col("len") < q, array(col("s")))
          .otherwise(transform(sequence(lit(0), col("len") - q),
            i => col("s").substr(i + lit(1), lit(q))))))

  /** (vk, id, s, len) deletion-variant postings of a keyed frame;
    * `prefixLen` > 0 prunes generation to the string's first
    * prefixLen chars ([[EditSimilarity.deletionVariants]]'s FastSS
    * tier — the param is persisted in stats so probes can never key
    * differently than the build did).
    */
  private def variantKeys(k: DataFrame, maxDist: Int,
                          prefixLen: Int): DataFrame =
    k.select(col("id"), col("s"), col("len"),
        explode(EditSimilarity.deletionVariants(col("s"), maxDist,
          prefixLen)).as("v"))
      .select(xxhash64(col("v")).as("vk"), col("id"), col("s"), col("len"))

  private def writeDigest(spark: SparkSession, prefix: String,
                          digest: DataFrame): Unit = {
    Bucketing.dropTableAndLocation(spark, s"${prefix}_gdigest")
    digest.write.mode("overwrite").saveAsTable(s"${prefix}_gdigest")
  }

  private def appendDigestWords(spark: SparkSession, prefix: String,
                                delta: DataFrame): Unit =
    delta.write.mode("append").saveAsTable(s"${prefix}_gdigest")

  private def writeStats(spark: SparkSession, prefix: String, nStrs: Long,
                         q: Int, maxDist: Int, lineage: String,
                         mBits: Int, digestK: Int, strategy: String,
                         prefixLen: Int): Unit = {
    Bucketing.dropTableAndLocation(spark, s"${prefix}_stats")
    spark.range(1).select(
        lit(nStrs).as("n_strs"), lit(q).as("q"), lit(maxDist).as("max_dist"),
        lit(lineage).as("lineage"),
        lit(mBits).as("digest_mbits"), lit(digestK).as("digest_k"),
        lit(strategy).as("strategy"), lit(prefixLen).as("del_prefix_len"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
  }

  def buildEditIndex(corpus: DataFrame, idCol: String, strCol: String,
                     prefix: String, maxDist: Int = 1, q: Int = 3,
                     lineage: String = "full", digestK: Int = 4,
                     strategy: String = "auto", prefixLen: Int = 0): Unit = {
    require(maxDist >= 0 && q >= 1, "bad edit-index params")
    val strat = EditSimilarity.resolveStrategy(strategy, math.max(maxDist, 1))
    val spark = corpus.sparkSession
    val k = keyed(corpus, idCol, strCol, q)
    Bucketing.dropTableAndLocation(spark, s"${prefix}_strs")
    k.select(col("id"), col("s"), col("len"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_strs")
    val nStrs = spark.table(s"${prefix}_strs").count()
    if (strat == "deletion") {
      Bucketing.dropTableAndLocation(spark, s"${prefix}_dels")
      variantKeys(k, math.max(maxDist, 1), prefixLen)
        .write.mode("overwrite").saveAsTable(s"${prefix}_dels")
      val nPostings = spark.table(s"${prefix}_dels").count()
      val mBits = Retrieval.digestSizing(nPostings)
      writeDigest(spark, prefix, Bloom.blockedDigestDf(
        spark.table(s"${prefix}_dels").select(col("vk")).distinct(),
        "vk", mBits, digestK))
      writeStats(spark, prefix, nStrs, q, maxDist, lineage, mBits, digestK,
        strat, prefixLen)
    } else {
      val grams = k.select(col("id"), col("s"), col("len"),
        explode(col("grams")).as("gram"))
      Bucketing.dropTableAndLocation(spark, s"${prefix}_grams")
      grams.write.mode("overwrite").saveAsTable(s"${prefix}_grams")
      Bucketing.dropTableAndLocation(spark, s"${prefix}_gramfreq")
      spark.table(s"${prefix}_grams")
        .groupBy(col("gram")).agg(count(lit(1)).as("f"))
        .write.mode("overwrite").saveAsTable(s"${prefix}_gramfreq")
      val nGramRows = spark.table(s"${prefix}_grams").count()
      val mBits = Retrieval.digestSizing(nGramRows)
      writeDigest(spark, prefix, Bloom.blockedDigestDf(
        spark.table(s"${prefix}_grams")
          .select(gramKey(col("gram")).as("gk")).distinct(),
        "gk", mBits, digestK))
      writeStats(spark, prefix, nStrs, q, maxDist, lineage, mBits, digestK,
        strat, prefixLen)
    }
    Bucketing.dropTableAndLocation(spark, s"${prefix}_intent")
  }

  /** All (delta_id, index_id, dist <= maxDist) pairs between a probe
    * batch and everything ever admitted — TRUE edit-distance
    * semantics (both candidate strategies are complete, and
    * verification is exact levenshtein), which is what the oracle
    * replays as a brute-force cross join.
    *
    * Plan shape, deletion mode: delta variant keys are delta-sized ×
    * (len·d); the digest prefilter drops every probe key the index
    * has never seen — an all-new batch reads NO postings; surviving
    * keys BROADCAST into the postings scan, whose denormalized
    * (s, len) lets the length band and exact levenshtein run
    * MAP-SIDE in the same stage — candidates never shuffle, and the
    * one exchange after the scan carries match-set-sized rows into
    * the final distinct. Per-key posting lists hold genuine
    * lookalikes only, so candidate counts track TRUE matches, not
    * gram saturation.
    *
    * Plan shape, qgram mode: as before — delta rarity ranking over
    * the SUM-folded freq table, digest prefilter, broadcast prefix
    * grams into the postings scan, map-side verify, degenerate
    * strings through an exact length-band equi-join.
    */
  def gateEditMatches(spark: SparkSession, prefix: String,
                      delta: DataFrame, idCol: String,
                      strCol: String): DataFrame = {
    requireNotTorn(spark, prefix, "gateEditMatches")
    val m = readMeta(spark, prefix)
    val empty = spark.range(0).select(lit(0L).as("delta_id"),
      lit(0L).as("index_id"), lit(0L).as("dist"))
    if (m.strategy == "deletion") {
      val dk = variantKeys(keyed(delta, idCol, strCol, m.q),
        math.max(m.maxDist, 1), m.prefixLen)
        .select(col("vk"), col("id").as("delta_id"),
          col("s").as("delta_s"), col("len").as("delta_len"))
      val flagged = Bloom.blockedDigestFlagged(dk, col("vk"),
        spark.table(s"${prefix}_gdigest"), m.mBits, m.k)
      if (flagged.isEmpty) empty
      else broadcast(flagged)
        .join(spark.table(s"${prefix}_dels")
          .select(col("vk"), col("id").as("index_id"),
            col("s").as("index_s"), col("len").as("index_len")),
          Seq("vk"))
        .filter(abs(col("delta_len") - col("index_len")) <= m.maxDist)
        .withColumn("dist",
          levenshtein(col("delta_s"), col("index_s"), m.maxDist).cast(LongType))
        .filter(col("dist") >= 0L)
        .select(col("delta_id"), col("index_id"), col("dist"))
        .distinct()
    } else {
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
      val flagged = Bloom.blockedDigestFlagged(pref, gramKey(col("gram")),
        spark.table(s"${prefix}_gdigest"), m.mBits, m.k)
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
            levenshtein(col("delta_s"), col("index_s"), m.maxDist).cast(LongType))
          .filter(col("dist") >= 0L)
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
            levenshtein(col("delta_s"), col("index_s"), m.maxDist).cast(LongType))
          .filter(col("dist") >= 0L)
          .select(col("delta_id"), col("index_id"), col("dist"))
      // tiers are disjoint (a delta string is long xor degenerate); the
      // distinct collapses shared-prefix-gram multiplicity within the
      // long tier, over match-set-sized rows
      longPairs.unionByName(shortPairs).distinct()
    }
  }

  /** Append NEW records in O(delta): their strings and posting rows
    * (variant hashes / gram postings + per-gram counts) land beside
    * the existing tables (per-record facts — probe answers over
    * build(base)+append(delta) are identical to build(base ∪ delta)
    * because gate completeness never depends on corpus statistics),
    * the key digest grows by appending the delta's nonzero Bloom
    * words ([[appendDigestWords]]; a full postings scan only on a
    * [[Retrieval.digestSizing]] resize boundary, which also compacts
    * the SUM-folded freq rows away in qgram mode), and the whole fold
    * is bracketed by the intent marker. The id guard refuses a record
    * id already admitted — an id collision would fork verification.
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
      val nTotal = m.nStrs + k.count()
      if (m.strategy == "deletion") {
        val dels = variantKeys(k, math.max(m.maxDist, 1), m.prefixLen)
        dels.write.mode("append").saveAsTable(s"${prefix}_dels")
        val nPostings = spark.table(s"${prefix}_dels").count()
        val mBits = Retrieval.digestSizing(nPostings)
        if (mBits == m.mBits)
          appendDigestWords(spark, prefix, Bloom.blockedDigestDf(
            dels.select(col("vk")).distinct(), "vk", mBits, m.k))
        else // resize boundary: the one full-postings rebuild
          writeDigest(spark, prefix, Bloom.blockedDigestDf(
            spark.table(s"${prefix}_dels").select(col("vk")).distinct(),
            "vk", mBits, m.k))
        writeStats(spark, prefix, nTotal, m.q, m.maxDist,
          s"${m.lineage}+$entry", mBits, m.k, m.strategy, m.prefixLen)
      } else {
        val grams = k.select(col("id"), col("s"), col("len"),
          explode(col("grams")).as("gram"))
        grams.write.mode("append").saveAsTable(s"${prefix}_grams")
        grams.groupBy(col("gram")).agg(count(lit(1)).as("f"))
          .write.mode("append").saveAsTable(s"${prefix}_gramfreq")
        val nGramRows = spark.table(s"${prefix}_grams").count()
        val mBits = Retrieval.digestSizing(nGramRows)
        if (mBits == m.mBits)
          appendDigestWords(spark, prefix, Bloom.blockedDigestDf(
            grams.select(gramKey(col("gram")).as("gk")).distinct(),
            "gk", mBits, m.k))
        else {
          // resize boundary: the one full-postings rebuild; also
          // compact the SUM-folded freq rows
          writeDigest(spark, prefix, Bloom.blockedDigestDf(
            spark.table(s"${prefix}_grams")
              .select(gramKey(col("gram")).as("gk")).distinct(),
            "gk", mBits, m.k))
          val folded = spark.table(s"${prefix}_gramfreq")
            .groupBy(col("gram")).agg(sum(col("f")).as("f"))
            .localCheckpoint() // sever lineage before the overwrite
          Bucketing.dropTableAndLocation(spark, s"${prefix}_gramfreq")
          folded.write.mode("overwrite").saveAsTable(s"${prefix}_gramfreq")
        }
        writeStats(spark, prefix, nTotal, m.q, m.maxDist,
          s"${m.lineage}+$entry", mBits, m.k, m.strategy, m.prefixLen)
      }
      Bucketing.dropTableAndLocation(spark, s"${prefix}_intent") // commit
    } finally k.unpersist(blocking = false)
  }

  private def tablesFor(strategy: String): Seq[String] =
    if (strategy == "deletion") Seq("dels", "strs", "gdigest", "stats")
    else Seq("grams", "strs", "gramfreq", "gdigest", "stats")

  /** Build-once gate keyed by corpus fingerprint + params + strategy. */
  def editIndexCached(corpus: DataFrame, idCol: String, strCol: String,
                      maxDist: Int = 1, q: Int = 3,
                      namespace: String = "edidx_v1",
                      strategy: String = "auto",
                      prefixLen: Int = 0): String = {
    val spark = corpus.sparkSession
    val strat = EditSimilarity.resolveStrategy(strategy, math.max(maxDist, 1))
    val fp = IndexStore.corpusFingerprint(corpus, Seq(idCol, strCol))
    val pl = if (prefixLen > 0) s"p$prefixLen" else ""
    val prefix = s"${namespace}_${fp}_q${q}d$maxDist${pl}_$strat"
    val have = tablesFor(strat)
      .forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildEditIndex(corpus, idCol, strCol, prefix, maxDist, q,
      lineage = fp, strategy = strat, prefixLen = prefixLen)
    prefix
  }

  /** Build-once gate for the appended composite, idempotent via the
    * lineage ledger (the [[NearDupIndex.nearDupAppendCached]] shape;
    * every param is part of the key).
    */
  def editAppendCached(base: DataFrame, delta: DataFrame,
                       idCol: String, strCol: String,
                       maxDist: Int = 1, q: Int = 3,
                       strategy: String = "auto"): String = {
    val spark = base.sparkSession
    val strat = EditSimilarity.resolveStrategy(strategy, math.max(maxDist, 1))
    val baseFp = IndexStore.corpusFingerprint(base, Seq(idCol, strCol))
    val deltaFp = IndexStore.corpusFingerprint(delta, Seq(idCol, strCol))
    val prefix =
      s"edidx_v1_${baseFp}_plus_${deltaFp}_q${q}d${maxDist}_$strat"
    val have = tablesFor(strat)
      .forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildEditIndex(base, idCol, strCol, prefix, maxDist, q,
      lineage = baseFp, strategy = strat)
    val lineage = spark.table(s"${prefix}_stats").head()
      .getAs[String]("lineage")
    if (!IvfIndex.lineageHasFingerprint(lineage, deltaFp))
      appendToEditIndex(spark, prefix, delta, idCol, strCol)
    prefix
  }
}
