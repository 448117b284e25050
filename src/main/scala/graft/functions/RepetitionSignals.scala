package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass Gopher §A1.2 repetition signals (Rae et al. 2021,
  * arXiv:2112.11446): the full 15-field struct TextAnalysis
  * .repetitionSignals documents — duplicate line/paragraph counts and
  * chars, top-{2,3,4}-gram char mass, duplicate-5-gram occurrences,
  * and the composed integer-exact `pass` flag — computed in ONE pass
  * per document with hashmap accumulators.
  *
  * Exists because the HOF formulation (kept as
  * TextAnalysis.repetitionSignalsHof, the tested reference twin) is
  * quadratic per document: Catalyst higher-order functions re-evaluate
  * a captured non-attribute expression for every array element, so
  * passing the tokenize chain into four wordGrams calls re-split the
  * document O(tokens) times per gram order — 62.9 s at sf0.1, 28% of
  * the whole 131-query bench. This expression is the same cure
  * ShingleBucketCounts applied to DSIR (3.5 s -> 0.9 s).
  *
  * Bit-parity contract with the HOF twin (asserted value-identical on
  * real corpus data in TextAnalysisSpec):
  *  - pieces: Java-regex split on "\n" / "\n\n" with limit -1 (exactly
  *    functions.split), each piece trimmed of ASCII 0x20 ONLY (exactly
  *    functions.trim — NOT Java String.trim, which eats tabs), empties
  *    dropped;
  *  - tokens: space-trim then split "\\s+", empties dropped;
  *  - all char counts are CODE POINTS (Spark length()), not UTF-16
  *    units;
  *  - top-gram ties break to the code-point-smallest gram — identical
  *    to sort_array's UTF8String binary order, since UTF-8 byte order
  *    equals code point order (Java String.compareTo does NOT: it
  *    orders by UTF-16 unit, which misorders supplementary planes).
  *
  * Scale shape: map-only scalar, inside WholeStageCodegen via
  * SelfComputeCodegen; per-row cost O(chars + tokens x gram width).
  */
case class RepetitionSignals(child: Expression)
    extends UnaryExpression with SelfComputeCodegen {
  import RepetitionSignals._

  override def dataType: DataType = Schema
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_signals"

  def compute(t: UTF8String): InternalRow = {
    val text = t.toString
    val nChars = cpLen(text)
    val (nLines, dLineCnt, lineChars, dLineChars) =
      pieceStats(LineRe.split(text, -1))
    val (nParas, dParaCnt, paraChars, dParaChars) =
      pieceStats(ParaRe.split(text, -1))
    val toks = tokenize(text)
    val top2 = topGramChars(toks, 2)
    val top3 = topGramChars(toks, 3)
    val top4 = topGramChars(toks, 4)
    val (n5, d5) = dupGrams(toks, 5)
    val pass = dLineCnt * 10L <= nLines * 3L &&
      dLineChars * 10L <= lineChars * 2L &&
      dParaCnt * 10L <= nParas * 3L &&
      dParaChars * 10L <= paraChars * 2L &&
      top2 * 10L <= nChars * 2L &&
      top3 * 100L <= nChars * 18L &&
      top4 * 100L <= nChars * 16L &&
      d5 * 100L <= n5 * 15L
    InternalRow(nLines, dLineCnt, dLineChars, lineChars,
      nParas, dParaCnt, dParaChars, paraChars,
      top2, top3, top4, n5, d5, nChars, pass)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionSignals {
  val Schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_line_cnt", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("n_paras", LongType, nullable = false),
    StructField("dup_para_cnt", LongType, nullable = false),
    StructField("dup_para_chars", LongType, nullable = false),
    StructField("para_chars", LongType, nullable = false),
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_chars", LongType, nullable = false),
    StructField("top4_chars", LongType, nullable = false),
    StructField("n_5grams", LongType, nullable = false),
    StructField("dup5_occ", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("pass", BooleanType, nullable = false)))

  // compiled once; identical automata to functions.split's patterns
  private val LineRe = java.util.regex.Pattern.compile("\n")
  private val ParaRe = java.util.regex.Pattern.compile("\n\n")
  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** functions.trim semantics: strip ASCII space (0x20) only. */
  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Code-point order == UTF-8 byte order == sort_array's UTF8String
    * binary order; String.compareTo would misorder surrogate pairs.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** (count, dupCount, chars, dupChars) over trimmed non-empty pieces;
    * a duplicate is any occurrence beyond the first of an identical
    * piece (= size - size(array_distinct)), its chars counted whole.
    */
  private def pieceStats(parts: Array[String]): (Long, Long, Long, Long) = {
    val seen = new java.util.HashSet[String]()
    var n = 0L
    var chars = 0L
    var dupChars = 0L
    var i = 0
    while (i < parts.length) {
      val p = trimSpaces(parts(i))
      if (!p.isEmpty) {
        n += 1L
        val len = cpLen(p)
        chars += len
        if (!seen.add(p)) dupChars += len
      }
      i += 1
    }
    (n, n - seen.size, chars, dupChars)
  }

  /** cleanTokens: space-trim, split \s+, drop empties. */
  private def tokenize(text: String): Array[String] = {
    val raw = WsRe.split(trimSpaces(text), -1)
    var keep = 0
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) keep += 1
      i += 1
    }
    if (keep == raw.length) raw
    else {
      val out = new Array[String](keep)
      var j = 0
      i = 0
      while (i < raw.length) {
        if (!raw(i).isEmpty) { out(j) = raw(i); j += 1 }
        i += 1
      }
      out
    }
  }

  private def gram(toks: Array[String], start: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(toks(start + k))
      k += 1
    }
    sb.toString
  }

  /** occurrences x code-point chars of the most frequent word n-gram,
    * ties to the code-point-smallest gram; 0 when fewer than n tokens.
    */
  private def topGramChars(toks: Array[String], n: Int): Long = {
    val m = toks.length - n + 1
    if (m <= 0) return 0L
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < m) {
      counts.merge(gram(toks, i, n), 1L,
        (a: java.lang.Long, b: java.lang.Long) => a + b)
      i += 1
    }
    var best: String = null
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      if (c > bestC || (c == bestC && cpCompare(e.getKey, best) < 0)) {
        best = e.getKey
        bestC = c
      }
    }
    bestC * cpLen(best)
  }

  /** (total n-grams, occurrences beyond each gram's first). */
  private def dupGrams(toks: Array[String], n: Int): (Long, Long) = {
    val m = toks.length - n + 1
    if (m <= 0) return (0L, 0L)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < m) {
      seen.add(gram(toks, i, n))
      i += 1
    }
    (m.toLong, (m - seen.size).toLong)
  }
}
