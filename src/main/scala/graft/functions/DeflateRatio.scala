package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib compression ratio of a document's UTF-8 bytes, in integer
  * micro-units: floor(10⁶ · deflate_len / raw_len). The classic
  * cheap repetition/randomness proxy a web-corpus filter runs beside
  * the Gopher/C4 rule cards — boilerplate and generated spam
  * compress far below prose (ratio ≪ 1), while encrypted/binary
  * junk refuses to compress (ratio near or above 1 on short inputs,
  * the deflate framing overhead).
  *
  * DEFLATE output is deterministic for a fixed level on one JVM
  * family but NOT portable across engines (DuckDB cannot replay it),
  * so this signal is ScalaTest-verified, never oracle-checked — the
  * one component class where the repo's exact-replay discipline is
  * structurally impossible and monotonicity/determinism tests are
  * the honest substitute.
  *
  * Empty input returns 10⁶ (ratio 1 — "incompressible"); the public
  * wrapper [[graft.operators.TextAnalysis.compressionRatioMicro]]
  * null-guards empty text BEFORE this expression runs, so the
  * sentinel never surfaces (a LongType codegen expression cannot
  * itself return null — the generated slot is a primitive long).
  *
  * Scale: map-only where the text is; the Deflater is created and
  * disposed per row (a pooled per-partition instance would need the
  * codec-lifecycle mold — at ~30 µs/KB the allocation is not the
  * cost).
  */
case class DeflateRatioMicro(child: Expression, level: Int = 6)
    extends UnaryExpression with SelfComputeCodegen {
  require(level >= 1 && level <= 9, "deflate level in [1,9]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio_micro"

  def compute(u: UTF8String): Long = {
    val raw = u.getBytes
    if (raw.isEmpty) return 1000000L
    val d = new java.util.zip.Deflater(level, true) // raw, no zlib header
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n * 1000000L / raw.length
    } finally d.end()
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
