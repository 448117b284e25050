package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Number of shingle hashes (array<long>, [[PolyShingleHashes]]
  * values) whose `kHashes` Bloom bit positions are ALL set in the
  * `words` bit array — the map-only probe side of the portable Bloom
  * decontamination gate ([[graft.operators.Bloom]]).
  *
  * Bit positions derive from the portable double-squaring mixer so an
  * external SQL engine replays membership — false positives included
  * — bit-for-bit:
  *
  *   h1 = h mod p                          (p = 1e9+7; h already < p)
  *   h2 = ((h1*h1 mod p) * 1000003 + 54321) mod p
  *   pos_i = (h1 + i*h2) mod p mod mBits,  i = 1..kHashes
  *
  * The square mix keeps pos_1..pos_k from being a bare affine ladder
  * of h (the correlation trap RademacherBuckets hit); every product
  * stays < 2^63 (h1*h1 < 1e18; i*h2 < 8e9·for k ≤ 8).
  *
  * The bit array rides in the expression (closure-serialized, shipped
  * once per task — the NearestCells discipline): mBits/64 longs, so a
  * 2^21-bit filter is 32 KB. One virtual call per row; the loop is
  * allocation-free.
  */
case class BloomShingleHits(child: Expression, words: Array[Long],
                            mBits: Int, kHashes: Int)
    extends UnaryExpression with SelfComputeCodegen {

  require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 26),
    s"mBits must be a multiple of 64 in [64, 2^26], got $mBits")
  require(kHashes >= 1 && kHashes <= 8, s"kHashes must be in [1, 8], got $kHashes")
  require(words.length == mBits / 64,
    s"words has ${words.length} longs, expected ${mBits / 64} for $mBits bits")

  private val P = 1000000007L

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_shingle_hits"

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    var hits = 0
    var s = 0
    while (s < n) {
      val h = arr.getLong(s)
      val h1 = ((h % P) + P) % P
      val h2 = ((h1 * h1 % P) * 1000003L + 54321L) % P
      var all = true
      var i = 1
      while (all && i <= kHashes) {
        val pos = (h1 + i * h2) % P % mBits
        if (((words((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L) all = false
        i += 1
      }
      if (all) hits += 1
      s += 1
    }
    hits
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Integer.valueOf(compute(v.asInstanceOf[ArrayData]))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
