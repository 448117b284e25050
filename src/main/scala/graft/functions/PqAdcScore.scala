package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native asymmetric-distance-computation (ADC) score for product
  * quantization: given a corpus row's PQ codes (`array<int>`, one
  * code per subspace) and a query's precomputed lookup table
  * (`array<bigint>`, `m * ksub` entries — the exact integer partial
  * dot of the query's j-th quantized subvector with every codeword
  * of subspace j at index `j * ksub + code`), returns the total
  * approximate dot product `sum_j tab[j * ksub + codes[j]]`.
  *
  * This is the PQ search kernel: scoring a candidate costs m table
  * lookups and adds — no per-pair vector math, no allocation — and
  * the operands are an m-byte code row and a table that lives once
  * per query. Stays inside whole-stage codegen. Integer domain end
  * to end (entries quantized to floor(x * 2^20)), so products stay
  * exact and any SQL engine replays the identical ranking.
  *
  * Null on malformed input (a null element, a code outside
  * [0, ksub), or a table not covering it) rather than an exception —
  * ANSI-safe. Declared input types make the analyzer insert casts
  * (e.g. an `array<int>` table literal) instead of letting raw
  * ArrayData reads misinterpret element widths.
  */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  require(ksub > 0, "ksub must be positive")

  // strict declared types: raw ArrayData accessors read fixed element
  // widths, so a silently-accepted array<int> table would return
  // garbage (UnsafeArrayData) or throw (GenericArrayData) at runtime
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<bigint> tab), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val tab = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0L
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      val idx = j * ksub + c
      if (c < 0 || c >= ksub || idx >= tab.numElements()) return null
      if (tab.isNullAt(idx)) return null
      s += tab.getLong(idx)
      j += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      // NOTE: no generated line may BEGIN with "||" — the code-block
      // margin stripping in Spark's codegen treats a leading '|' as a
      // margin char and silently deletes it, producing uncompilable
      // Java that demotes the whole stage to interpreted execution
      // (caught by the fallback-is-fatal PlanShapeSpec test)
      s"""
         |final int $m = $a.numElements();
         |long $s = 0L;
         |boolean $bad = false;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($a.isNullAt($j)) { $bad = true; break; }
         |  final int $c = $a.getInt($j);
         |  final int $idx = $j * $ksub + $c;
         |  if ($c < 0 || $c >= $ksub || $idx >= $b.numElements() ||
         |      $b.isNullAt($idx)) { $bad = true; break; }
         |  $s += $b.getLong($idx);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
