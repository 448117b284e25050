package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Column-level helpers bridging the reference engine's expression
  * semantics (Polars exprs) onto Spark `Column`s.
  *
  * Each helper notes the reference site it re-expresses
  * (file:line into /root/reference).
  */
object ColumnOps {

  /** Regex extract of `group`, null on no-match.
    *
    * Reference: `str.extract(pat, group)` (wd_tmdb.py:20-25,
    * wikidata.py:71). Spark's `regexp_extract` returns "" on no
    * match; the reference returns null — wrap with nullif.
    */
  def extractFirst(c: Column, pattern: String, group: Int = 1): Column =
    nullif(regexp_extract(c, pattern, group), lit(""))

  /** All regex matches as an array (wikidata.py:55 `str.extract_all`). */
  def extractAll(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(0))

  /** Replace FIRST regex match only (Polars `str.replace`,
    * wd_opencritic.py:88-90). Spark `regexp_replace` replaces all;
    * the capture-the-rest trick replaces only the first occurrence.
    * (?s) makes the leading .*? cross newlines so the first match
    * anywhere in a multi-line value is found, matching Polars.
    */
  def replaceFirst(c: Column, pattern: String, replacement: String): Column =
    regexp_replace(c, s"(?s)^(.*?)$pattern", s"$$1$replacement")

  /** Null-propagating printf-ish template (Polars `pl.format`,
    * wd_tmdb.py:218-224 etc.). `{}` placeholders; ANY null argument
    * nulls the whole result (Spark `concat` already propagates null).
    */
  def fmt(template: String, args: Column*): Column = {
    val pieces = template.split("\\{\\}", -1)
    require(pieces.length == args.length + 1,
      s"fmt: template has ${pieces.length - 1} placeholders, got ${args.length} args")
    val parts: Seq[Column] =
      pieces.zip(args.map(Option(_)) :+ None).flatMap { case (s, a) =>
        (if (s.isEmpty) Nil else Seq(lit(s))) ++ a.toSeq
      }.toSeq
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }

  /** Per-row "this key value occurs exactly once in the frame"
    * (Polars `is_unique()`, wd_tmdb.py:240,323). Window count — no
    * orderBy, so partial aggregation-style whole-partition frame.
    */
  def isUniqueOver(keys: Column*): Column =
    count(lit(1)).over(Window.partitionBy(keys: _*)) === 1

  /** ISO-8601 datetime string -> date (Polars `strptime(Date,"%+")`,
    * wd_opencritic.py:94). Null on unparsable (non-strict), handles
    * the `...T...Z` SPARQL shape.
    */
  def strptimeDate(c: Column): Column = to_date(try_to_timestamp(c))

  /** Non-strict cast: null on failure (Polars `cast(strict=False)`,
    * wd_tmdb.py:23). Spark 4 runs ANSI-on by default where plain
    * cast throws — `try_cast` restores null-on-failure.
    *
    * For integral targets a regex pre-guard short-circuits
    * non-numeric strings to null BEFORE try_cast sees them: TryEval
    * materializes a JVM exception per failing row, which costs more
    * than the cast itself on mostly-bad columns (measured 3 s for
    * 150k rows). try_cast still handles overflow inside the guard.
    */
  def castLenient(c: Column, to: DataType): Column =
    if (to == ByteType || to == ShortType || to == IntegerType || to == LongType)
      when(c.rlike("^\\s*[+-]?\\d+\\s*$"), c.try_cast(to))
    else c.try_cast(to)

  /** List first element, null-safe on empty (Polars `list.first()`,
    * wd_tmdb.py:81). ANSI-safe: `try_element_at` nulls out-of-range.
    */
  def listFirst(c: Column): Column = try_element_at(c, lit(1))

  /** Membership in a driver-known small set (Polars `is_in` over an
    * imploded frame, wikidata.py:70-71). Broadcast-literal isin.
    */
  def isInSet(c: Column, values: Seq[Any]): Column =
    if (values.isEmpty) lit(false) else c.isin(values: _*)

  /** Closed-left interval (Polars `is_between(closed="left")`,
    * test_polars_requests.py:24). Spark `between` is closed-both.
    */
  def betweenLeft(c: Column, lo: Column, hi: Column): Column =
    c >= lo && c < hi

  /** Current wall-clock as a plan-build-time LITERAL, truncated to
    * seconds (polars_utils.py:54-56 `now()` — evaluated once, not
    * per row / per query-start).
    */
  def nowLit(): Column = {
    val secs = java.time.Instant.now().getEpochSecond
    lit(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(secs)))
  }
}
