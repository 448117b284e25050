package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native builder for a query's PQ ADC lookup table: given the
  * quantized query vector (`array<bigint>`, floor(x * 2^20) per
  * entry) and the flat quantized codebook (entry `i = j*ksub + c` is
  * subspace j's codeword c as dsub longs), emits the `m * ksub`
  * exact integer partial dot products
  * `tab[i] = dot(qv[j*dsub .. j*dsub+dsub), codebook[i])` in one
  * fused loop.
  *
  * Replaces a transform/zip_with/aggregate HOF chain that evaluated
  * interpreted lambdas per entry (measured ~0.7 ms per query row at
  * m=8, ksub=16 — longer than scoring the candidates it feeds).
  * One table per QUERY row, so this is never the per-pair hot path,
  * but it gates the whole ADC stage. Entries where the query vector
  * is shorter than the subspace span are null (HOF-parity: zip_with
  * pads with null and the sum propagates it).
  */
case class PqAdcTable(child: Expression, codebook: Array[Array[Long]], ksub: Int)
    extends UnaryExpression with SelfComputeCodegen {

  require(ksub > 0 && codebook.nonEmpty && codebook.length % ksub == 0,
    "codebook length must be a positive multiple of ksub")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_table"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> quantized query vector, got $t")
  }

  @transient private lazy val dsub: Int = codebook(0).length

  def compute(qv: ArrayData): ArrayData = {
    val entries = codebook.length
    val out = new Array[Any](entries)
    val n = qv.numElements()
    var i = 0
    while (i < entries) {
      val cw = codebook(i)
      val off = (i / ksub) * dsub
      if (off + dsub <= n) {
        var s = 0L
        var t = 0
        var sawNull = false
        while (t < dsub && !sawNull) {
          if (qv.isNullAt(off + t)) sawNull = true
          else s += qv.getLong(off + t) * cw(t)
          t += 1
        }
        out(i) = if (sawNull) null else java.lang.Long.valueOf(s)
      } else out(i) = null
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
