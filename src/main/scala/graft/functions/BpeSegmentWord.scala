package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE segmentation of ONE word: applies a learned merge
  * list (TextAnalysis.trainBpeMerges output order) and returns the
  * framed symbol string (sep + symbol + sep per symbol, the framing
  * TextAnalysis documents). Replaces the chained-literal-replace
  * formulation, which rebuilt the framed string once per merge and
  * nested one expression per merge — at thousands of merges that tree
  * breaks analysis/codegen, and at 6 it was the suite's slowest query.
  *
  * Algorithm: standard min-rank BPE encode — repeatedly find the
  * lowest-rank adjacent symbol pair present in the word and merge all
  * its occurrences left-to-right. This is EXACTLY equivalent to
  * replaying the merges in training order (what the DuckDB oracle
  * does), not an approximation:
  *
  *  - a merge learned at round r can only pair symbols that exist
  *    before round r, i.e. symbols created by merges < r — so once
  *    every rank < r is absent from the word, no later merge can
  *    re-create rank-< r pairs (new adjacencies always involve the
  *    just-created symbol, which only occurs in pairs learned
  *    AFTER it existed);
  *  - merging "all occurrences left-to-right, non-overlapping" is
  *    precisely what a literal string replace of the framed pair
  *    does ("a a a a" with merge (a,a) gives [aa, aa]).
  *
  * By induction the two processes pass through identical states.
  * Equality with the replace chain is asserted per-document in
  * TextAnalysisSpec.
  *
  * Cost: O(len^2) per word worst case, INDEPENDENT of merge-list
  * size (the rank map is a hash lookup per adjacent pair), so
  * 100k-merge production tokenizers are fine — the merge list lives
  * in one driver-held map referenced by codegen, not in the
  * expression tree.
  *
  * Symbols never contain the separator: training excludes
  * separator-bearing tokens, so learned pair halves are sep-free and
  * the `a + sep + b` rank key is unambiguous. A degenerate input word
  * containing the separator itself yields separator symbols that
  * match no learned pair — the same no-op the literal replace
  * produces (its pattern would need a separator inside a pair half).
  */
case class BpeSegmentWord(child: Expression, merges: Seq[String])
    extends UnaryExpression with SelfComputeCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_segment_word"

  private val Sep = '\u001F'

  // pair halves in training order + rank lookup keyed "a<sep>b"
  // (merges are stored exactly in that form)
  @transient private lazy val pairA: Array[String] =
    merges.map(p => p.substring(0, p.indexOf(Sep))).toArray
  @transient private lazy val pairB: Array[String] =
    merges.map(p => p.substring(p.indexOf(Sep) + 1)).toArray
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      if (!m.containsKey(merges(i))) m.put(merges(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  def compute(u: UTF8String): UTF8String = {
    val w = u.toString
    // symbols start as code points (surrogate pairs stay whole)
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    var done = syms.size < 2 || merges.isEmpty
    while (!done) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + Sep + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Integer.MAX_VALUE) done = true
      else {
        // merge ALL its occurrences left-to-right, non-overlapping
        val a = pairA(bestRank)
        val b = pairB(bestRank)
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            out.add(a + b); k += 2
          } else {
            out.add(syms.get(k)); k += 1
          }
        }
        syms = out
        if (syms.size < 2) done = true
      }
    }
    // frame: sep + symbol + sep per symbol (adjacent symbols share
    // nothing — TWO separators stand between them)
    val sb = new java.lang.StringBuilder(w.length * 2 + 2)
    sb.append(Sep)
    var s = 0
    while (s < syms.size) {
      if (s > 0) { sb.append(Sep); sb.append(Sep) }
      sb.append(syms.get(s))
      s += 1
    }
    sb.append(Sep)
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
