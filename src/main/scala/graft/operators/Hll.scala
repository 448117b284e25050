package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.NativeFunctions

/** Portable HyperLogLog distinct counting — the bounded-state answer
  * to "how many distinct terms?" when the vocabulary itself is too
  * hot to shuffle. Spark's `approx_count_distinct` is HLL++ over
  * xxhash — not replayable outside the JVM; this formulation derives
  * bucket and rank from the shared portable mixer, so an external SQL
  * engine rebuilds the register table and the estimate bit-for-bit.
  *
  * Per occurrence (map-only): h1 = poly-fold(token) mod p, h2 =
  * square-mix(h1); bucket = h1 mod m, rank = trailing-zeros(h2) + 1
  * (h2 = 0 caps at 31). Registers = max rank per bucket — ONE
  * aggregate whose key space is m, so map-side combine reduces every
  * partition to ≤ m rows before the only shuffle ([[CountMin]]'s
  * scale shape, for distinct counting). Estimator: the standard
  * bias-corrected harmonic mean with linear-counting small-range
  * correction. Every float op is portable: 2^-rank terms are exact
  * dyadic rationals summed exactly (m·2^-31 fits 53 bits), the alpha
  * constant is computed from literals in a fixed op order, and the
  * only transcendental (the small-range ln) follows the drift
  * queries' precedent of bit-equal libm ln across engines.
  */
object Hll {

  private val P = 1000000007L

  private def checkM(m: Int): Unit =
    require(m >= 16 && m <= (1 << 16) && (m & (m - 1)) == 0,
      s"m must be a power of two in [16, 2^16], got $m")

  /** The bias-corrected estimate from (v_zero, hit-register harmonic
    * sum): alpha·m²/hsum with the linear-counting small-range branch.
    * Fixed literal op order — both engines fold the identical doubles.
    */
  private def estimate(vZero: org.apache.spark.sql.Column,
                       hsumHit: org.apache.spark.sql.Column,
                       m: Int): org.apache.spark.sql.Column = {
    val mD = m.toDouble
    val hsum = hsumHit + vZero.cast("double")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(mD))
    val raw = alpha * lit(mD) * lit(mD) / hsum
    val est = when(vZero > 0L && raw <= lit(2.5) * lit(mD),
      lit(mD) * log(lit(mD) / vZero.cast("double"))).otherwise(raw)
    floor(est).cast("long")
  }

  /** One-row card: exact distinct count (the EVAL side — the
    * vocab-keyed aggregate HLL exists to avoid), the register state
    * summary, and the HLL estimate. `m` registers = m longs of state.
    */
  def hllDistinctCard(docs: DataFrame, textCol: String, m: Int): DataFrame =
    cardFromRegisters(docs, textCol, hllRegisters(docs, textCol, m), m)

  /** The register table over a corpus's token stream: (bucket, mj) —
    * max trailing-zero rank per bucket, ≤ m rows. ONE aggregate whose
    * key space is m, map-side-combined; this is the sketch STATE a
    * long-lived monitor persists
    * ([[graft.operators.IndexStore.saveHllRegisters]]) and merges
    * ([[mergeRegisters]]).
    */
  def hllRegisters(docs: DataFrame, textCol: String, m: Int): DataFrame = {
    checkM(m)
    val toks = docs.select(explode(Dedup.tokens(col(textCol))).as("tok"))
    val h1 = pmod(NativeFunctions.polyFingerprint(col("tok")), lit(P))
    val h2 = pmod(pmod(h1 * h1, lit(P)) * lit(1000003L) + lit(54321L), lit(P))
    val rank = when(h2 === 0L, lit(31))
      .otherwise(bit_count(h2.bitwiseAND(-h2) - lit(1L)) + lit(1))
    toks.select((h1 % lit(m.toLong)).as("bucket"), rank.as("rank"))
      .groupBy(col("bucket")).agg(max(col("rank")).as("mj"))
  }

  /** Merge two register tables by per-bucket max. HLL's merge is
    * idempotent, commutative and associative, so state built over a
    * corpus split ANY way re-merges to the single-pass register table
    * bit-for-bit (the `text_hll_merged` oracle's claim). ≤ 2m rows
    * in, ≤ m rows out; the union's aggregate key space is m.
    */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("mj"))
      .unionByName(b.select(col("bucket"), col("mj")))
      .groupBy(col("bucket")).agg(max(col("mj")).as("mj"))

  /** One-row card from a PRE-BUILT register table (served or merged
    * state), with the exact distinct count over `docs` beside it as
    * the eval truth — identical schema to [[hllDistinctCard]], so the
    * served/merged queries share its oracle. Degenerate case: an
    * EMPTY register table (empty corpus) must read v_zero = m,
    * hsum_hit = 0 → the linear-counting branch gives m·ln(m/m) = 0,
    * never NULL — hence the coalesces on the empty-relation aggregate.
    */
  def cardFromRegisters(docs: DataFrame, textCol: String, regs: DataFrame,
                        m: Int): DataFrame = {
    checkM(m)
    // 2^-mj as 1/(1<<mj): exact dyadic, no pow() rounding question
    val hit = regs.agg(count(lit(1)).as("n_regs"),
      coalesce(
        sum(lit(1.0) / call_function("shiftleft", lit(1L), col("mj").cast("int"))),
        lit(0.0)).as("hsum_hit"))
    val toks = docs.select(explode(Dedup.tokens(col(textCol))).as("tok"))
    val exact = toks.agg(countDistinct(col("tok")).as("exact_distinct"))
    val vZero = lit(m.toLong) - col("n_regs")
    exact.crossJoin(hit)
      .select(col("exact_distinct"), vZero.as("v_zero"),
        estimate(vZero, col("hsum_hit"), m).as("est_distinct"))
  }

  /** Per-group distinct-count card: [[hllDistinctCard]] keyed by a
    * group column — the vocabulary-richness signal per source (a
    * template-spam source collapses it). ONE aggregate keyed by
    * (group, bucket) — groups·m rows total — then a group-sized
    * finish; the exact countDistinct beside it is the eval truth.
    */
  def hllDistinctByGroup(docs: DataFrame, textCol: String, groupCol: String,
                         m: Int): DataFrame = {
    checkM(m)
    val toks = docs.select(col(groupCol).as("grp"),
      explode(Dedup.tokens(col(textCol))).as("tok"))
    val h1 = pmod(NativeFunctions.polyFingerprint(col("tok")), lit(P))
    val h2 = pmod(pmod(h1 * h1, lit(P)) * lit(1000003L) + lit(54321L), lit(P))
    val rank = when(h2 === 0L, lit(31))
      .otherwise(bit_count(h2.bitwiseAND(-h2) - lit(1L)) + lit(1))
    val regs = toks
      .select(col("grp"), (h1 % lit(m.toLong)).as("bucket"), rank.as("rank"))
      .groupBy(col("grp"), col("bucket")).agg(max(col("rank")).as("mj"))
    val hit = regs.groupBy(col("grp")).agg(count(lit(1)).as("n_regs"),
      sum(lit(1.0) / call_function("shiftleft", lit(1L), col("mj").cast("int")))
        .as("hsum_hit"))
    val exact = toks.groupBy(col("grp"))
      .agg(countDistinct(col("tok")).as("exact_distinct"))
    val vZero = lit(m.toLong) - col("n_regs")
    exact.join(hit, Seq("grp"))
      .select(col("grp").as(groupCol), col("exact_distinct"),
        vZero.as("v_zero"), estimate(vZero, col("hsum_hit"), m).as("est_distinct"))
  }
}
