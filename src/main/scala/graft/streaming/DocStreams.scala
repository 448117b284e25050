package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextAnalysis

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
}
