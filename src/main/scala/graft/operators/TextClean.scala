package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-cleaning operators for training-data preparation: markup
  * stripping, PII redaction, control-char removal, whitespace
  * normalization. All pure codegen'd regexp expressions — map-side
  * only, no UDFs — and every pattern is RE2-compatible (no
  * backreferences or lookaround), so the DuckDB oracle replays the
  * exact same pipeline.
  */
object TextClean {

  /** Replace HTML/XML-ish tags with a space (space, not empty, so
    * `a<br>b` keeps a token boundary).
    */
  def stripMarkup(c: Column): Column =
    regexp_replace(c, "<[^>]+>", " ")

  /** Redact email addresses. */
  def redactEmails(c: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", token)

  /** Redact long digit runs (ids, phone-ish, card-ish numbers). */
  def redactLongNumbers(c: Column, minDigits: Int = 6,
                        token: String = "<NUM>"): Column =
    regexp_replace(c, s"\\d{$minDigits,}", token)

  /** Drop ASCII control characters (keeps \n semantics out of the
    * question by removing them along with the rest).
    */
  def stripControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x1f\\x7f]", "")

  /** Collapse whitespace runs to single spaces and trim. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The standard cleaning pipeline, in redaction-safe order: markup
    * out first (tags may contain emails), then redactions, then
    * control chars, then whitespace normalization.
    */
  def cleaned(c: Column): Column =
    normalizeWhitespace(stripControlChars(
      redactLongNumbers(redactEmails(stripMarkup(c)))))

  /** Fraction of characters removed/replaced by cleaning — a cheap
    * boilerplate/noise signal (null for empty input).
    */
  def shrinkRatio(c: Column): Column =
    (length(c) - length(cleaned(c))).cast(DoubleType) /
      nullif(length(c), lit(0)).cast(DoubleType)
}
