package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Sparse lexical retrieval over the corpus — the BM25 side of a
  * training-data pipeline (decontamination probes, targeted corpus
  * audits, "find the documents about X" curation queries) that the
  * dense ANN stack in [[Similarity]] does not cover.
  *
  * Scale shape: classic inverted-index retrieval re-expressed as
  * joins. The corpus is reduced once to per-(doc, term) frequencies
  * (one map-side-combined aggregate), the query panel's term list is
  * broadcast so candidate generation is a map-side hash probe of the
  * tf table (docs sharing no term with any query are dropped before
  * anything widens), and the only other corpus-keyed exchange is
  * attaching per-doc lengths. Nothing is ever queries × docs.
  *
  * Portability (the oracle replays every step): scores are fixed to
  * integer micro-units via the floor(score · 1e6) discipline used by
  * the LM family. Per-term scores are floored to longs FIRST and the
  * per-doc total is a sum of longs — order-independent and exact, so
  * ranking ties are broken on integers, never on float summation
  * order. The double math inside one term keeps a fixed operation
  * order (written identically in the DuckDB twin); ln is the only
  * transcendental, same as the green bigram-LM rows.
  */
object Retrieval {

  /** Okapi BM25 top-k: for each query (a bag of distinct terms),
    * score every document sharing at least one term and keep the k
    * best. Output: (query_id, rank, doc_id, score_micro, n_terms)
    * with rank 1..k dense per query; ties break on ascending doc_id
    * so the cut is total and engine-independent.
    *
    * `queries` needs (qidCol, qtermsCol: array<string>); duplicate
    * terms within one query are collapsed (set semantics — the
    * standard bag-of-words probe, and what keeps the candidate join
    * a set intersection).
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Robertson/Sparck
    * Jones with the +1 floor, so idf > 0 always — a term present in
    * every document still contributes, it just contributes least).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtermsCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.cleanTokens(col(textCol))).as("token"))
    // (doc, term) frequencies: THE shuffle of this operator; map-side
    // combine collapses repeats before the exchange
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // per-doc lengths from tf (narrower than re-shuffling raw tokens)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // single-row corpus stats; exact longs so avgdl enters the score
    // as dl·N/T in one fixed-order double expression, never as a
    // pre-divided constant two engines could round differently
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // query terms, set semantics; panel-sized -> broadcast both ways
    val qt = queries.select(col(qidCol).as("query_id"),
        explode(col(qtermsCol)).as("token"))
      .distinct()
    // df restricted to probed terms (tiny), then candidates = one
    // broadcast hash probe of tf: a doc sharing no term with any
    // query never leaves the scan
    val qdf = dfreq.join(broadcast(qt.select(col("token")).distinct()),
      Seq("token"))
    val cand = tf.join(broadcast(qt.join(qdf, Seq("token"))), Seq("token"))
    scoreCandidates(cand.join(dl, Seq("doc_id")), stats, k, k1, b)
  }

  /** Shared BM25 scoring tail over gated candidates — ONE definition
    * for the inline path and the persisted-index probe path, so the
    * two are arithmetically identical by construction. `cand` needs
    * (query_id, doc_id, tf, df, dl); `stats` is the single-row
    * (n_docs, total_tokens).
    */
  private def scoreCandidates(cand: DataFrame, stats: DataFrame,
                              k: Int, k1: Double, b: Double): DataFrame = {
    val scored = cand.crossJoin(broadcast(stats))
      .withColumn("ts_micro",
        floor(
          log(lit(1.0) +
              (col("n_docs").cast(DoubleType) - col("df") + lit(0.5)) /
              (col("df").cast(DoubleType) + lit(0.5))) *
            (col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
            (col("tf").cast(DoubleType) +
              lit(k1) * (lit(1.0 - b) +
                lit(b) * col("dl").cast(DoubleType) * col("n_docs") /
                  col("total_tokens"))) *
            lit(1000000.0)).cast(LongType))
    val perDoc = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("ts_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    perDoc.withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }

  /** Build the PERSISTED BM25 inverted index — the build-once side of
    * the deployment split [[bm25TopK]] folds into every run. Three
    * catalog tables under `prefix`:
    *   - `{prefix}_postings` (token, doc_id, tf, dl) — the posting
    *     list with the doc length DENORMALIZED into each posting (the
    *     classic layout: the one corpus-keyed join, postings ⋈
    *     lengths, is paid here at build time so the probe path never
    *     shuffles corpus-sized data), bucketed+sorted by token;
    *   - `{prefix}_termstats` (token, df) — vocab-sized, bucketed by
    *     token;
    *   - `{prefix}_stats` — the single row (n_docs, total_tokens).
    *
    * Bucketing by token means a future big-PANEL probe (a query set
    * too large to broadcast) can sort-merge against the postings with
    * no Exchange on the index side; the broadcast gate in
    * [[bm25TopKFromIndex]] stays the default for panel-sized probes.
    */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String,
                     prefix: String, buckets: Int = 32): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.cleanTokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      Bucketing.writeBucketed(tf.join(dl, Seq("doc_id"))
          .select(col("token"), col("doc_id"), col("tf"), col("dl")),
        s"${prefix}_postings", "token", buckets, Seq("token", "doc_id"))
      Bucketing.writeBucketed(
        tf.groupBy(col("token")).agg(count(lit(1)).as("df")),
        s"${prefix}_termstats", "token", buckets, Seq("token"))
      val spark = docs.sparkSession
      Bucketing.dropTableAndLocation(spark, s"${prefix}_stats")
      dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
        .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
    } finally tf.unpersist(blocking = false)
  }

  /** BM25 top-k against the PERSISTED index: identical semantics and
    * bit-identical scores to [[bm25TopK]] (the scoring tail is the
    * same code), but the probe plan touches ONLY the index tables —
    * no corpus scan, no tokenize, no tf aggregation, no corpus-keyed
    * shuffle. Per probe run the work is: broadcast the panel's terms,
    * hash-probe the postings scan, and reduce candidate-sized data —
    * the index build's corpus passes are amortized across every
    * query panel served from it.
    */
  def bm25TopKFromIndex(spark: SparkSession, prefix: String,
                        queries: DataFrame, qidCol: String, qtermsCol: String,
                        k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val postings = spark.table(s"${prefix}_postings")
    val termstats = spark.table(s"${prefix}_termstats")
    val stats = spark.table(s"${prefix}_stats")
    require(postings.columns.sameElements(Array("token", "doc_id", "tf", "dl")),
      s"malformed postings table ${prefix}_postings: ${postings.columns.mkString(",")}")
    require(termstats.columns.sameElements(Array("token", "df")),
      s"malformed termstats table ${prefix}_termstats: ${termstats.columns.mkString(",")}")
    require(stats.columns.sameElements(Array("n_docs", "total_tokens")) &&
      stats.count() == 1,
      s"malformed stats table ${prefix}_stats — must be the single corpus-stats row")
    val qt = queries.select(col(qidCol).as("query_id"),
        explode(col(qtermsCol)).as("token"))
      .distinct()
    val qdf = termstats.join(broadcast(qt.select(col("token")).distinct()),
      Seq("token"))
    val cand = postings.join(broadcast(qt.join(qdf, Seq("token"))), Seq("token"))
    scoreCandidates(cand, stats, k, k1, b)
  }

  /** Build-once gate for the persisted index: returns the table
    * prefix, building only when the fingerprint-keyed tables are
    * absent — [[IndexStore.ivfCentroidsCached]]'s train-once contract
    * at inverted-index scale. The fingerprint covers doc ids AND
    * text, so any corpus change re-keys (and rebuilds); stale indexes
    * for dead corpora are dropped by table-name prefix hygiene, not
    * silently served.
    */
  def bm25IndexCached(docs: DataFrame, idCol: String, textCol: String,
                      buckets: Int = 32): String = {
    val spark = docs.sparkSession
    val fp = IndexStore.corpusFingerprint(docs, Seq(idCol, textCol))
    val prefix = s"bm25_v1_$fp"
    val have = Seq("postings", "termstats", "stats")
      .forall(s => spark.catalog.tableExists(s"${prefix}_$s"))
    if (!have) buildBm25Index(docs, idCol, textCol, prefix, buckets)
    prefix
  }

  /** Maximal-marginal-relevance re-rank: from each query's candidate
    * shortlist, greedily select `k` results that trade relevance
    * against redundancy — pick argmax of
    * `lambda·rel − (1−lambda)·max_sim_to_already_selected`, ties to
    * the smallest id. The standard diversity pass between ANN
    * retrieval and consumption (dedup-aware context selection, "don't
    * return five near-copies of the same document").
    *
    * `cands` needs (query_id, id, rel: double, vec: array<float>) —
    * a top-N shortlist with vectors attached. Output: (query_id,
    * rank 1..k, id, rel, mmr).
    *
    * Scale shape: greedy selection is inherently sequential IN k, so
    * it runs where the data is — one shuffle groups each query's
    * shortlist into an array (N structs; panel-sized output), and the
    * whole k-round selection is a single bounded fold over that array
    * (O(k·N·k·dim) per query, all inside codegen-able HOFs — never a
    * driver loop, never an iterative join). The accumulator holds
    * VALUES (selected structs), not captured expression chains, so
    * the HOF re-evaluation trap documented on gopher_repetition does
    * not apply. Cross-engine: rel and the pairwise sims come from the
    * native cosine (bit-matches DuckDB's list_cosine_similarity), and
    * the mixing arithmetic is fixed-order over those — the oracle
    * replays the greedy rounds stage by stage.
    */
  def mmrRerank(cands: DataFrame, k: Int, lambda: Double = 0.7): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val grouped = cands.groupBy(col("query_id"))
      .agg(collect_list(struct(col("id"), col("rel"), col("vec"))).as("cs"))
    val emptySel = expr(
      "cast(array() as array<struct<id:bigint,rel:double,mmr:double,vec:array<float>>>)")
    val selected = aggregate(
      sequence(lit(1), lit(k)),
      struct(emptySel.as("sel"), col("cs").as("rem")),
      (acc, _) => {
        val sel = acc.getField("sel")
        val rem = acc.getField("rem")
        // score every remaining candidate against the CURRENT selected
        // set; (mmr, -id) makes array_max a total argmax with ties to
        // the smallest id
        val scored = transform(rem, c => struct(
          (lit(lambda) * c.getField("rel") -
            lit(1.0 - lambda) * coalesce(
              array_max(transform(sel, s =>
                Similarity.cosine(c.getField("vec"), s.getField("vec")))),
              lit(0.0))).as("mmr"),
          (-c.getField("id")).as("negid"),
          c.as("c")))
        val best = array_max(scored)
        val bc = best.getField("c")
        when(size(rem) === 0, acc).otherwise(struct(
          concat(sel, array(struct(
            bc.getField("id").as("id"),
            bc.getField("rel").as("rel"),
            best.getField("mmr").as("mmr"),
            bc.getField("vec").as("vec")))).as("sel"),
          filter(rem, r =>
            r.getField("id") =!= bc.getField("id")).as("rem")))
      }).getField("sel")
    grouped.select(col("query_id"), posexplode(selected).as(Seq("p", "s")))
      .select(col("query_id"), (col("p") + 1).cast(IntegerType).as("rank"),
        col("s.id").as("id"), col("s.rel").as("rel"), col("s.mmr").as("mmr"))
  }

  /** Per-query retrieval diagnostics over a BM25 result: how many of
    * the probe's terms matched the top-ranked document, the score
    * spread between rank 1 and rank k (collapse = ambiguous probe),
    * and the candidate depth actually filled. The tuning card for
    * probe quality — panel-sized everywhere past the input.
    */
  def bm25QueryDiagnostics(topk: DataFrame): DataFrame =
    topk.groupBy(col("query_id"))
      .agg(max(col("rank")).as("depth"),
        max(when(col("rank") === 1, col("score_micro"))).as("best_micro"),
        min(col("score_micro")).as("worst_micro"),
        max(when(col("rank") === 1, col("n_terms"))).as("best_n_terms"))
      .withColumn("spread_micro", col("best_micro") - col("worst_micro"))

  /** Reciprocal-rank fusion — the hybrid-retrieval merge step
    * (Cormack/Clarke/Büttcher 2009): combine ranked runs from
    * DIFFERENT retrieval systems (BM25 lexical, dense ANN, …) into
    * one list by summing 1/(k0 + rank) per appearance. Rank-based,
    * so incomparable score scales (micro-BM25 vs cosine) never need
    * calibration — which is exactly why production hybrid search
    * uses RRF as the default merge.
    *
    * Each run needs (query_id, rank, id). Contribution is the EXACT
    * long floor-division 10^9 div (k0 + rank): no float exists
    * anywhere, so fusion scores, their ties, and the final cut are
    * bit-identical in any engine. Output: (query_id, rank 1..k, id,
    * rrf_micro, n_runs) — n_runs telling how many systems surfaced
    * the hit (the agreement signal).
    *
    * Scale shape: inputs are top-k runs, i.e. panel-sized (queries ×
    * per-run k), so the union + one (query_id, id) aggregate + one
    * per-query window all operate on panel-sized data; corpus cost
    * lives in the upstream runs.
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "need at least one run")
    require(k > 0 && k0 >= 0, "k must be positive, k0 non-negative")
    def intDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast(LongType)
    val contrib = runs.map(_.select(col("query_id"), col("id"),
      intDiv(lit(1000000000L), lit(k0.toLong) + col("rank").cast(LongType))
        .as("c")))
    val fused = contrib.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("rrf_micro"), count(lit(1)).as("n_runs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"),
        col("rrf_micro"), col("n_runs"))
  }
}
