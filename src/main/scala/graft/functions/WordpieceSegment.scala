package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first WordPiece segmentation — the third
  * tokenizer family's ENCODE side beside [[BpeSegmentWord]] (merge
  * replay) and [[UnigramSegmentWord]] (Viterbi): at each cursor take
  * the LONGEST vocab piece starting there; if no piece matches
  * (impossible for corpus-trained vocabs, which keep every single
  * char) the whole word degrades to the "[UNK]" piece — BERT's rule.
  *
  * Deployed simplification, stated loudly: ONE position-independent
  * vocabulary; '##' marks non-initial pieces in the OUTPUT only
  * (canonical WordPiece trains separate initial/continuation
  * inventories — the plumbing here is identical, the inventory split
  * is a training-side refinement). Greedy longest-match is total and
  * engine-independent by construction (no scores, no ties), which is
  * what lets the DuckDB oracle replay it as a cursor walk over a
  * precomputed match table.
  *
  * Cost: O(len·maxLen) hash lookups per word, vocab-size-independent
  * (the [[UnigramViterbi]] argument); the vocab lives in one
  * driver-held set referenced by codegen.
  */
object WordpieceGreedy {
  val Unk = "[UNK]"

  /** Code-point trie over the vocab — the apply-side probe structure.
    * The hash-set formulation below probes substring+hash for EVERY
    * candidate length at every cursor (O(maxLen) allocations+hashes
    * per position, ~25 for a trained vocab); the trie walk descends
    * only while a vocab piece actually extends, so a cursor costs the
    * length of the longest extendable prefix (typically 2-4 steps)
    * and allocates nothing until the winning piece is cut. Longest
    * terminal depth == longest hash-set match by construction
    * (equality asserted in TextAnalysisSpec).
    */
  final class TrieNode {
    var terminal: Boolean = false
    val children = new java.util.HashMap[Integer, TrieNode]()
  }

  def buildTrie(vocab: Seq[String]): TrieNode = {
    val root = new TrieNode
    vocab.foreach { p =>
      var node = root
      var off = 0
      while (off < p.length) {
        val cp = p.codePointAt(off)
        var next = node.children.get(cp)
        if (next == null) {
          next = new TrieNode
          node.children.put(cp, next)
        }
        node = next
        off += Character.charCount(cp)
      }
      node.terminal = true
    }
    root
  }

  def decodeTrie(w: String, root: TrieNode, maxLen: Int): Array[String] = {
    // code-point boundaries (surrogate pairs stay whole)
    val starts = new java.util.ArrayList[Integer](w.length + 1)
    var off = 0
    while (off < w.length) {
      starts.add(off)
      off += Character.charCount(w.codePointAt(off))
    }
    starts.add(w.length)
    val L = starts.size - 1
    if (L == 0) return Array.empty
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < L) {
      val lim = math.min(maxLen, L - i)
      var node = root
      var found = 0
      var l = 0
      var o = starts.get(i).intValue()
      while (l < lim && node != null) {
        val cp = w.codePointAt(o)
        o += Character.charCount(cp)
        node = node.children.get(cp)
        l += 1
        if (node != null && node.terminal) found = l
      }
      if (found == 0) return Array(Unk)
      val piece = w.substring(starts.get(i), starts.get(i + found))
      out.add(if (i == 0) piece else "##" + piece)
      i += found
    }
    out.toArray(new Array[String](out.size))
  }

  def decode(w: String, vocab: java.util.HashSet[String],
             maxLen: Int): Array[String] = {
    // code-point boundaries (surrogate pairs stay whole)
    val starts = new java.util.ArrayList[Integer](w.length + 1)
    var off = 0
    while (off < w.length) {
      starts.add(off)
      off += Character.charCount(w.codePointAt(off))
    }
    starts.add(w.length)
    val L = starts.size - 1
    if (L == 0) return Array.empty
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < L) {
      var l = math.min(maxLen, L - i)
      var found = 0
      while (l >= 1 && found == 0) {
        if (vocab.contains(w.substring(starts.get(i), starts.get(i + l))))
          found = l
        else l -= 1
      }
      if (found == 0) return Array(Unk)
      val piece = w.substring(starts.get(i), starts.get(i + found))
      out.add(if (i == 0) piece else "##" + piece)
      i += found
    }
    out.toArray(new Array[String](out.size))
  }

  def buildVocabSet(vocab: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
}

/** Greedy WordPiece segmentation of one word — returns the framed
  * piece string ([[UnigramViterbi.frame]]'s layout, so the same
  * splitters read both tokenizers' output).
  */
case class WordpieceSegmentWord(child: Expression, vocab: Seq[String],
                                maxLen: Int)
    extends UnaryExpression with SelfComputeCodegen {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "wordpiece_segment_word"

  @transient private lazy val trie = WordpieceGreedy.buildTrie(vocab)

  def compute(u: UTF8String): UTF8String = {
    val w = u.toString
    UnigramViterbi.frame(WordpieceGreedy.decodeTrie(w, trie, maxLen), w.length)
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
