package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise MAX of fixed-length long arrays — [[ArraySum]]'s
  * sibling for register-style state: each input row contributes an
  * array<long> of `len` register values and the group's result is the
  * per-position maximum. The use is HyperLogLog register merging as
  * ONE stateful aggregation (the streaming-legal shape): per-row
  * register vectors are map-only, and a group's distinct-count state
  * is exactly `len` longs regardless of how many rows it absorbs —
  * max is idempotent and commutative, so late/merged state is safe by
  * construction.
  *
  * Null input arrays are ignored; null ELEMENTS and length mismatches
  * are rejected loudly (the [[ArraySum]] contract).
  */
case class ArrayMax(child: Expression, len: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(len >= 1, "len must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "array_max_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != len)
        throw new IllegalArgumentException(
          s"array_max_agg: expected length $len, got ${arr.numElements()}")
      var i = 0
      while (i < len) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"array_max_agg: null element at position $i")
        val x = arr.getLong(i)
        if (x > buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * len)
    var i = 0
    while (i < len) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](len)
    var i = 0
    while (i < len) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Per-document HyperLogLog register vector over an array<string>
  * token column: array<long> of length `m` where position b holds the
  * max rank of the doc's tokens hashing to bucket b (the portable
  * mixer — [[graft.operators.Hll]]'s recipe), 0 for untouched
  * buckets. One pass per doc, feeding [[ArrayMax]] as the single
  * stateful windowed aggregation.
  */
case class HllRegisters(child: Expression, m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with SelfComputeCodegen {

  require(m >= 16 && m <= (1 << 16) && (m & (m - 1)) == 0,
    s"m must be a power of two in [16, 2^16], got $m")

  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hll_registers"

  def compute(arr: ArrayData): ArrayData = {
    val regs = new Array[Long](m)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h1 = SketchExpressions.polyFold(arr.getUTF8String(i).toString, 1000003L)
        val h2 = (h1 * h1 % P * 1000003L + 54321L) % P
        val rank = if (h2 == 0L) 31L
          else (java.lang.Long.numberOfTrailingZeros(h2) + 1).toLong
        val b = (h1 % m).toInt
        if (rank > regs(b)) regs(b) = rank
      }
      i += 1
    }
    new GenericArrayData(regs)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
