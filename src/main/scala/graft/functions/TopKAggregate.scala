package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) pairs in a
  * fixed-size heap. As a TypedImperativeAggregate it participates in
  * partial aggregation — every map task reduces its slice to <= k
  * pairs per group BEFORE the shuffle, so a per-key top-k costs a
  * shuffle of n_groups x k rows instead of the full window sort over
  * every scored row. Ordering: score descending, ties broken by
  * lowest id (identical to the row_number window formulation it
  * replaces — asserted in tests).
  *
  * Output: array<struct<cos: double, id: long>> sorted best-first.
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cos", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedBestFirst()
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Fixed-capacity min-heap over (score, id): the WORST kept pair sits
  * at the root for O(log k) eviction. "Worse" = lower score, ties =
  * higher id (so the kept set matches score-desc/id-asc ranking).
  */
final class TopKBuffer(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0 && worse(scores(pos), ids(pos), scores((pos - 1) / 2), ids((pos - 1) / 2))) {
      swap(pos, (pos - 1) / 2); pos = (pos - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var pos = 0
    var done = false
    while (!done) {
      val l = 2 * pos + 1; val r = 2 * pos + 2
      var worst = pos
      if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == pos) done = true
      else { swap(pos, worst); pos = worst }
    }
  }

  def offer(s: Double, i: Long): Unit =
    if (n < k) {
      scores(n) = s; ids(n) = i; n += 1; siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i; siftDown()
    }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var j = 0
    while (j < n) { f(scores(j), ids(j)); j += 1 }
  }

  def sortedBestFirst(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var j = 0
    while (j < n) { out(j) = (scores(j), ids(j)); j += 1 }
    out.sortWith { case ((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2) }
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var j = 0
    while (j < n) { bb.putDouble(scores(j)); bb.putLong(ids(j)); j += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }
}
