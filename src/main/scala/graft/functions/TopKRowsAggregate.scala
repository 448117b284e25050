package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Generic bounded top-k aggregate: keeps the k SMALLEST rows by an
  * arbitrary orderable `ord` expression (encode a descending field by
  * negating it), carrying an arbitrary `payload`. The generalization
  * of [[TopKPairs]] beyond (double, long): same bounded-heap
  * partial-aggregation shape — every map task reduces its slice to
  * <= k rows per group before the shuffle, so per-group top-k costs
  * n_groups x k shuffled rows instead of a full window sort of every
  * row (row_number over a 3-value grouping column sorts the whole
  * table on 3 reducers; this stays map-parallel).
  *
  * Output: array<struct<ord, payload>> sorted ascending by ord
  * (best first). Rows with null ord are ignored.
  */
case class TopKRows(ord: Expression, payload: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(ord, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", ord.dataType),
      StructField("payload", payload.dataType))),
    containsNull = false)
  override def prettyName: String = "topk_rows"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  private def rowSchema = StructType(Seq(
    StructField("ord", ord.dataType), StructField("payload", payload.dataType)))

  @transient private lazy val serProj = UnsafeProjection.create(rowSchema)

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(k, ordering)

  override def update(buf: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val o = ord.eval(input)
    if (o != null)
      // eval results may be views into reused buffers — copy on keep
      buf.offer(InternalRow.copyValue(o), () => InternalRow.copyValue(payload.eval(input)))
    buf
  }

  override def merge(buf: TopKRowsBuffer, other: TopKRowsBuffer): TopKRowsBuffer = {
    other.foreach((o, p) => buf.offer(o, () => p))
    buf
  }

  override def eval(buf: TopKRowsBuffer): Any =
    new GenericArrayData(buf.sortedBestFirst().map { case (o, p) =>
      new GenericInternalRow(Array[Any](o, p))
    })

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = {
    val rows = buf.sortedBestFirst()
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(rows.length)
    rows.foreach { case (o, p) =>
      val u = serProj(new GenericInternalRow(Array[Any](o, p)))
      dos.writeInt(u.getSizeInBytes)
      dos.write(u.getBytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val b = new Array[Byte](len)
      dis.readFully(b)
      val u = new UnsafeRow(2)
      u.pointTo(b, len)
      val o = InternalRow.copyValue(u.get(0, ord.dataType))
      buf.offer(o, () => InternalRow.copyValue(u.get(1, payload.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), payload = newChildren(1))
}

/** Fixed-capacity max-heap over ord values: the WORST (largest) kept
  * row sits at the root for O(log k) eviction. Payloads are
  * materialized lazily — a row that loses at the root never pays its
  * payload copy.
  */
final class TopKRowsBuffer(val k: Int, ordering: Ordering[Any]) {
  private val ords = new Array[Any](k)
  private val payloads = new Array[Any](k)
  private var n = 0

  private def worse(a: Any, b: Any): Boolean = ordering.gt(a, b)

  private def swap(a: Int, b: Int): Unit = {
    val to = ords(a); ords(a) = ords(b); ords(b) = to
    val tp = payloads(a); payloads(a) = payloads(b); payloads(b) = tp
  }

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0 && worse(ords(pos), ords((pos - 1) / 2))) {
      swap(pos, (pos - 1) / 2); pos = (pos - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var pos = 0
    var done = false
    while (!done) {
      val l = 2 * pos + 1; val r = 2 * pos + 2
      var worst = pos
      if (l < n && worse(ords(l), ords(worst))) worst = l
      if (r < n && worse(ords(r), ords(worst))) worst = r
      if (worst == pos) done = true
      else { swap(pos, worst); pos = worst }
    }
  }

  def offer(o: Any, payload: () => Any): Unit =
    if (n < k) {
      ords(n) = o; payloads(n) = payload(); n += 1; siftUp(n - 1)
    } else if (worse(ords(0), o)) {
      ords(0) = o; payloads(0) = payload(); siftDown()
    }

  def foreach(f: (Any, Any) => Unit): Unit = {
    var j = 0
    while (j < n) { f(ords(j), payloads(j)); j += 1 }
  }

  def sortedBestFirst(): Array[(Any, Any)] = {
    val out = new Array[(Any, Any)](n)
    var j = 0
    while (j < n) { out(j) = (ords(j), payloads(j)); j += 1 }
    out.sortWith { case ((o1, _), (o2, _)) => ordering.lt(o1, o2) }
  }
}
