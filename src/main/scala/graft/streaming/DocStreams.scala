package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.operators.{Dedup, TextAnalysis}

/** Streaming document-ingest operators — the live twins of the batch
  * corpus-health tooling, written once against the unified
  * DataFrame API so the SAME declarative definition executes as a
  * batch job or a Structured Streaming query (asserted equal in
  * StreamingSpec).
  */
object DocStreams {

  /** Windowed per-source ingest health — the live dashboard feed
    * behind [[graft.operators.TextAnalysis.sourceHealthReport]]'s
    * batch card: per (event-time window, source), the doc count,
    * token volume, PII incidence, and hashed-linear-quality keep
    * count of arriving documents. The batch card's exact-duplicate
    * column is deliberately absent here: corpus-wide dup membership
    * needs unbounded state (every md5 ever seen) — in a live pipeline
    * that column comes from the periodic batch card, not the stream.
    *
    * One definition, both modes: on a static frame this is a plain
    * windowed aggregation; on a stream, pass `watermarkSeconds` so
    * state for closed windows is dropped (without it a streaming
    * aggregation accumulates windows forever). Every per-doc signal
    * is map-only (bound token array → score, staged PII regexes), so
    * the streaming plan is stateless up to the single windowed
    * aggregation — the canonical scalable shape.
    *
    * `docs` needs (tsCol timestamp, sourceCol string, textCol
    * string).
    */
  def sourceHealthWindowed(docs: DataFrame, weights: Array[Long],
                           windowSeconds: Long = 3600L,
                           watermarkSeconds: Option[Long] = None,
                           tsCol: String = "ts", sourceCol: String = "source",
                           textCol: String = "text"): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val withWm = watermarkSeconds.fold(docs)(w =>
      docs.withWatermark(tsCol, s"$w seconds"))
    val perDoc = withWm.select(col(tsCol).as("ts"), col(sourceCol).as("source"),
        TextAnalysis.cleanTokens(col(textCol)).as("toks"),
        TextAnalysis.piiRedact(col(textCol)).as("p"))
      .select(col("ts"), col("source"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        TextAnalysis.linearScoreExpr(col("toks"), weights).as("score"),
        (col("p.n_emails") + col("p.n_ipv4") + col("p.n_phones") > 0L)
          .as("has_pii"))
    perDoc
      .groupBy(window(col("ts"), s"$windowSeconds seconds"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("has_pii"), 1L).otherwise(0L)).as("n_pii_docs"),
        sum(when(col("score") >= 0L, 1L).otherwise(0L)).as("n_keep_quality"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_docs"), col("n_tokens"), col("n_pii_docs"),
        col("n_keep_quality"))
  }

  /** Streaming near-duplicate ingest gate — the live twin of
    * [[graft.operators.Dedup.minhashNearDupPairsCross]]: as documents
    * arrive, flag every one that is a verified near-duplicate of a
    * STATIC reference corpus (yesterday's index), emitting (id, ts)
    * exactly once per flagged doc. This is the quarantine feed an
    * ingest pipeline consumes before a batch dedup pass ever runs.
    *
    * One definition, both modes: on a static frame it degenerates to
    * the batch cross-dedup's flagged-delta set (asserted equal in
    * StreamingSpec); on a stream, pass `watermarkSeconds` so the
    * exactly-once id suppression uses watermark-bounded state
    * (`dropDuplicatesWithinWatermark`).
    *
    * Scale shape: the stream side is map-only through shingle →
    * signature → band buckets (the same portable hash family as the
    * batch operators), then two STATELESS stream-static joins — the
    * (band, bucket) candidate probe against the corpus bucket index
    * and the corpus_id probe against the shingle-set table, both
    * built ONCE by [[graft.operators.Dedup.nearDupIndex]] and reused
    * every micro-batch. The stream's compact per-doc hash set (KBs)
    * rides through the candidate join for the exact-Jaccard verify;
    * the only stateful operator is the final per-id suppression.
    * Near-dups WITHIN the stream are deliberately out of scope — that
    * is a stream-stream band self-join with unbounded state; inside
    * one ingest window the periodic batch pass owns it.
    */
  def nearDupGateStream(docs: DataFrame, corpus: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        corpusIdCol: String = "doc_id",
                        corpusTextCol: String = "text",
                        numHashes: Int = 64, bands: Int = 16,
                        shingleWidth: Int = 3, threshold: Double = 0.8,
                        seed: Long = 42L, portable: Boolean = false,
                        tsCol: String = "ts",
                        watermarkSeconds: Option[Long] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val (index, sets) = Dedup.nearDupIndex(corpus, corpusIdCol, corpusTextCol,
      numHashes, bands, shingleWidth, seed, portable)
    val sh =
      if (portable)
        graft.functions.NativeFunctions.polyShingleHashes(
          Dedup.tokens(col(textCol)), shingleWidth)
      else Dedup.shingleHashes(col(textCol), shingleWidth)
    val withWm = watermarkSeconds.fold(docs)(w =>
      docs.withWatermark(tsCol, s"$w seconds"))
    val sig = withWm
      .select(col(idCol).as("id"), col(tsCol).as("ts"), sh.as("sh"))
      .withColumn("sig", graft.functions.NativeFunctions.minhashSignature(
        col("sh"), numHashes, seed, portable))
      .withColumn("bk",
        if (portable) Dedup.lshBucketsPoly(col("sig"), bands, r)
        else Dedup.lshBuckets(col("sig"), bands, r))
    val flagged = sig
      .select(col("id"), col("ts"), col("sh"), explode(col("bk")).as("b"))
      .select(col("id"), col("ts"), col("sh"), col("b.band"), col("b.bucket"))
      .join(index, Seq("band", "bucket"))
      .join(sets, Seq("corpus_id"))
      .withColumn("jaccard",
        size(array_intersect(col("sh"), col("corpus_sh"))).cast(DoubleType) /
          size(array_union(col("sh"), col("corpus_sh"))).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id"), col("ts"))
    if (watermarkSeconds.isDefined) flagged.dropDuplicatesWithinWatermark(Seq("id"))
    else flagged.dropDuplicates(Seq("id"))
  }
}
