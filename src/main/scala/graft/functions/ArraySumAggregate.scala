package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of fixed-length long arrays — the histogram-
  * vector aggregation primitive: each input row contributes an
  * array<long> of `len` counters and the group's result is the
  * per-position total. The classic use is ONE stateful aggregation
  * over pre-vectorized per-row counts (e.g. per-document counts of a
  * fixed reference vocabulary) where a (key, position) explode would
  * either multiply the stream len-fold or force a second stateful
  * aggregation — which Structured Streaming restricts. State is
  * exactly `len` longs per group regardless of input size.
  *
  * Null input arrays are ignored; null ELEMENTS are rejected loudly
  * (a silent 0 would corrupt counts). Arrays shorter/longer than
  * `len` are rejected loudly too — a length mismatch is a caller bug.
  */
case class ArraySum(child: Expression, len: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(len >= 1, "len must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "array_sum_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != len)
        throw new IllegalArgumentException(
          s"array_sum_agg: expected length $len, got ${arr.numElements()}")
      var i = 0
      while (i < len) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"array_sum_agg: null element at position $i")
        buf(i) += arr.getLong(i)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
