package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Viterbi decode for the unigram-LM (SentencePiece-family)
  * tokenizer: segment ONE word into the maximum-likelihood piece
  * sequence under integer micro log-prob scores.
  *
  * DP over code-point positions i = 0..L:
  *   dp(i) = max over piece lengths l in [1, min(maxLen, i)] with
  *           piece = w[i-l, i) in vocab of dp(i-l) + score(piece);
  *   TIES RESOLVE TO THE LARGER l (the longer last piece) — a total,
  *   engine-independent rule the DuckDB oracle replays with the same
  *   CASE order. Scores are floor(10⁶·ln(cnt/total)) longs, so the
  *   comparison is integer arithmetic with no float-summation-order
  *   hazard; per-piece scores are ≥ -40e6 and words are short, so a
  *   path sum never approaches Long range.
  *
  * A code point absent from the vocab cannot occur when the vocab
  * was trained on the corpus being segmented (training keeps EVERY
  * single-char piece); the `unkMicro` fallback exists so a serving
  * path over unseen text degrades to a scored single-char piece
  * instead of throwing mid-task.
  *
  * Cost: O(len·maxLen) hash lookups per word, independent of vocab
  * size — the vocab lives in one driver-held map referenced by
  * codegen (the [[BpeSegmentWord]] deployment shape).
  */
object UnigramViterbi {
  val Sep = '\u001F'

  final case class Result(pieces: Array[String], scoreMicro: Long)

  def decode(w: String, score: java.util.HashMap[String, java.lang.Long],
             maxLen: Int, unkMicro: Long): Result = {
    // code-point boundaries (surrogate pairs stay whole)
    val starts = new java.util.ArrayList[Integer](w.length + 1)
    var off = 0
    while (off < w.length) {
      starts.add(off)
      off += Character.charCount(w.codePointAt(off))
    }
    starts.add(w.length)
    val L = starts.size - 1
    if (L == 0) return Result(Array.empty, 0L)
    val dp = new Array[Long](L + 1)
    val lChoice = new Array[Int](L + 1)
    var i = 1
    while (i <= L) {
      var best = Long.MinValue
      var bestL = 0
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val piece = w.substring(starts.get(i - l), starts.get(i))
        val s = score.get(piece)
        val sv: Long =
          if (s != null) s.longValue()
          else if (l == 1) unkMicro
          else Long.MinValue
        if (sv != Long.MinValue) {
          val cand = dp(i - l) + sv
          // >= : on a tie the LARGER l (seen later) wins
          if (cand >= best) { best = cand; bestL = l }
        }
        l += 1
      }
      dp(i) = best
      lChoice(i) = bestL
      i += 1
    }
    // backtrack
    val out = new java.util.ArrayList[String]()
    var p = L
    while (p > 0) {
      val l = lChoice(p)
      out.add(0, w.substring(starts.get(p - l), starts.get(p)))
      p -= l
    }
    Result(out.toArray(new Array[String](out.size)), dp(L))
  }

  /** Frame pieces exactly like the BPE path: sep + piece + sep, with
    * TWO separators between adjacent pieces — splittable by the same
    * symbol splitter.
    */
  def frame(pieces: Array[String], wLen: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(wLen * 2 + 2)
    sb.append(Sep)
    var s = 0
    while (s < pieces.length) {
      if (s > 0) { sb.append(Sep); sb.append(Sep) }
      sb.append(pieces(s))
      s += 1
    }
    sb.append(Sep)
    UTF8String.fromString(sb.toString)
  }

  def buildScoreMap(vocab: Seq[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
    vocab.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }
}

/** Viterbi segmentation of one word under a trained unigram vocab —
  * returns the framed piece string (see [[UnigramViterbi.frame]]).
  */
case class UnigramSegmentWord(child: Expression, vocab: Seq[(String, Long)],
                              maxLen: Int, unkMicro: Long)
    extends UnaryExpression with SelfComputeCodegen {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_segment_word"

  @transient private lazy val scoreMap = UnigramViterbi.buildScoreMap(vocab)

  def compute(u: UTF8String): UTF8String = {
    val w = u.toString
    val r = UnigramViterbi.decode(w, scoreMap, maxLen, unkMicro)
    UnigramViterbi.frame(r.pieces, w.length)
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Total micro log-prob of one word's Viterbi segmentation — the
  * other half of [[UnigramSegmentWord]], same DP, long output.
  */
case class UnigramScoreWord(child: Expression, vocab: Seq[(String, Long)],
                            maxLen: Int, unkMicro: Long)
    extends UnaryExpression with SelfComputeCodegen {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_score_word"

  @transient private lazy val scoreMap = UnigramViterbi.buildScoreMap(vocab)

  def compute(u: UTF8String): Long =
    UnigramViterbi.decode(u.toString, scoreMap, maxLen, unkMicro).scoreMicro
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Both tokenizer outputs of ONE Viterbi decode —
  * struct(n_pieces: long, lp_micro: long). [[UnigramSegmentWord]] and
  * [[UnigramScoreWord]] run the identical DP; a projection that wants
  * the piece count AND the score paid it twice per word. Values are
  * the same integers by construction (same decode); equality with the
  * two-pass form is pinned in TextAnalysisSpec. An empty word decodes
  * to (0, 0) — exactly the old pair's contribution (the count path
  * framed zero pieces; the score path filtered empties out).
  */
case class UnigramPieceStats(child: Expression, vocab: Seq[(String, Long)],
                             maxLen: Int, unkMicro: Long)
    extends UnaryExpression with SelfComputeCodegen {
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("lp_micro", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_piece_stats"

  @transient private lazy val scoreMap = UnigramViterbi.buildScoreMap(vocab)

  def compute(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val r = UnigramViterbi.decode(u.toString, scoreMap, maxLen, unkMicro)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](r.pieces.length.toLong, r.scoreMicro))
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
