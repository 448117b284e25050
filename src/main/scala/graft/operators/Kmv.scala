package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NativeFunctions

/** Portable KMV (k-minimum-values) theta sketch — distinct counting
  * with SET OPERATIONS, the thing [[Hll]] cannot do: union, and
  * crucially INTERSECTION ("how much vocabulary do crawl A and crawl
  * B share?"), plus one-sided differences A∖B / B∖A, from k-sized
  * state per corpus (Bar-Yossef et al. 2002; the DataSketches
  * theta-sketch lineage).
  *
  * Per group, the sketch is the k smallest DISTINCT values of a
  * uniform-ish portable hash u ∈ [0, P). If the group holds n ≥ k
  * distinct terms, the k-th smallest hash sits near k·P/n, so
  * n̂ = (k−1)·P / u_(k) — relative error ~1/√k. Fewer than k distinct
  * terms means the sketch IS the set: estimates degrade to exact (the
  * branch is exercised at sf0.001 where small sources hold fewer
  * than k distinct tokens).
  *
  * Set algebra: the k smallest of S_A ∪ S_B equals the k smallest of
  * A ∪ B (each side's survivors are its k smallest), so union
  * estimates need only the two sketches. For intersection, θ = the
  * union sketch's k-th value: every hash below θ survives with the
  * same inclusion rule on both sides, so |{u < θ : u ∈ S_A ∩ S_B}|
  * scaled by P/θ estimates |A ∩ B|, and Jaccard is that count over
  * min(k, |union sketch|) directly.
  *
  * Everything is exact integer arithmetic on a deterministic hash —
  * an external SQL engine replays sketch contents AND every estimate
  * bit-for-bit (text_kmv_overlap). The hash is the shared portable
  * mixer ([[CountMin]]/[[Bloom]]'s recipe): square-mix of the
  * code-point polynomial fingerprint — the extra mix matters here
  * because KMV reads the hash's ORDER, and raw poly fingerprints of
  * short tokens are tiny values that would flood the bottom-k.
  *
  * Scale shape: one distinct on (group, term-hash) — corpus-vocab
  * sized, the unavoidable pass — then a bounded-heap aggregate
  * ([[graft.functions.TopKRows]]) whose partial aggregation reduces
  * every map task to ≤ k rows per group BEFORE the shuffle; never a
  * full per-group sort. All pair math runs on k-sized sketch rows.
  *
  * Reference has no counterpart (extension track).
  */
object Kmv {

  val P = 1000000007L

  /** Uniform-ish portable hash in [0, P): square-mix of the poly
    * fingerprint (the CountMin h2 recipe, so the oracle replay shares
    * the family's SQL idiom).
    */
  def uniformHash(term: Column): Column = {
    val h1 = pmod(NativeFunctions.polyFingerprint(term), lit(P))
    pmod(pmod(h1 * h1, lit(P)) * lit(1000003L) + lit(54321L), lit(P))
  }

  /** Per-group sketch rows (grp, u, rn): the k smallest distinct
    * hashes, rn = 1..min(k, distinct).
    */
  def kmvSketch(df: DataFrame, groupCol: String, termCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"kmvSketch: k must be >= 2, got $k")
    df.select(col(groupCol).as("grp"),
        uniformHash(col(termCol)).as("u"))
      .filter(col("u").isNotNull)
      .distinct()
      .groupBy(col("grp"))
      .agg(NativeFunctions.topkRows(col("u"), col("u"), k).as("tk"))
      .select(col("grp"), posexplode(col("tk")))
      .select(col("grp"), col("col.ord").as("u"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  /** Per-group distinct estimate from a sketch: exact below k, else
    * (k−1)·P / u_(k) in integer arithmetic.
    */
  def kmvEstimates(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("grp"))
      .agg(count(lit(1)).as("m"), max(col("u")).as("theta"))
      .select(col("grp"), col("m"), col("theta"),
        when(col("m") < k, col("m"))
          .otherwise(expr(s"${(k - 1).toLong * P}L div theta")).as("est"))

  /** The pairwise overlap card: for every group pair (a < b), KMV
    * estimates of |A|, |B|, |A ∪ B|, |A ∩ B| and Jaccard beside the
    * EXACT values — the eval-card mold ([[Bloom.evalCard]]): the
    * sketch column is the deployable path, the exact column is the
    * small-scale truth it is graded against. All estimate math is on
    * k-sized sketches; the exact side is the only corpus-width work.
    */
  def overlapCard(df: DataFrame, groupCol: String, termCol: String,
                  k: Int): DataFrame = {
    val terms = df.select(col(groupCol).as("grp"), col(termCol).as("term"))
      .distinct()
    val sk = kmvSketch(df, groupCol, termCol, k)
    val per = kmvEstimates(sk, k)
    val pairs = per.select(col("grp").as("src_a"), col("est").as("est_a"))
      .join(per.select(col("grp").as("src_b"), col("est").as("est_b")),
        col("src_a") < col("src_b"))
    // union-side rows: each pair pulls both sketches' hash rows
    val sideA = pairs.select(col("src_a"), col("src_b"))
      .join(sk.select(col("grp").as("src_a"), col("u")), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("u"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val sideB = pairs.select(col("src_a"), col("src_b"))
      .join(sk.select(col("grp").as("src_b"), col("u")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("u"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val byU = sideA.unionByName(sideB)
      .groupBy(col("src_a"), col("src_b"), col("u"))
      .agg(max(col("in_a")).as("has_a"), max(col("in_b")).as("has_b"))
    val byPair = Window.partitionBy(col("src_a"), col("src_b"))
    val ranked = byU
      .withColumn("rn", row_number().over(byPair.orderBy(col("u"))))
      .withColumn("m_u", count(lit(1)).over(byPair))
    // θ: the union's k-th smallest hash; P (nothing truncated) when
    // the combined sketch holds fewer than k distinct hashes
    val theta = ranked.filter(col("rn") === k)
      .select(col("src_a"), col("src_b"), col("u").as("theta"))
    val kmvStats = ranked
      .join(theta, Seq("src_a", "src_b"), "left")
      .withColumn("theta", coalesce(col("theta"), lit(P)))
      .groupBy(col("src_a"), col("src_b"))
      .agg(max(col("m_u")).as("m_union"), max(col("theta")).as("theta"),
        sum(when(col("has_a") === 1 && col("has_b") === 1 &&
          col("u") < col("theta"), 1L).otherwise(0L)).as("n_ib"),
        // difference counters (below θ, one-sided): the rest of the
        // sketch set algebra — every hash below θ is a uniform sample
        // of the union, so one-sided members estimate A∖B and B∖A by
        // the same P/θ scaling as the intersection
        sum(when(col("has_a") === 1 && col("has_b") === 0 &&
          col("u") < col("theta"), 1L).otherwise(0L)).as("n_ab"),
        sum(when(col("has_a") === 0 && col("has_b") === 1 &&
          col("u") < col("theta"), 1L).otherwise(0L)).as("n_ba"))
      .select(col("src_a"), col("src_b"),
        when(col("m_union") < k, col("m_union"))
          .otherwise(expr(s"${(k - 1).toLong * P}L div theta"))
          .as("est_union"),
        when(col("theta") === P, col("n_ib"))
          .otherwise(expr(s"n_ib * ${P}L div theta")).as("est_inter"),
        when(col("theta") === P, col("n_ab"))
          .otherwise(expr(s"n_ab * ${P}L div theta")).as("est_a_minus_b"),
        when(col("theta") === P, col("n_ba"))
          .otherwise(expr(s"n_ba * ${P}L div theta")).as("est_b_minus_a"),
        // saturated denominator is k-1 (only hashes strictly below θ —
        // the union's k-th smallest — are effective samples), matching
        // est_inter/est_union's P/θ-over-(k-1) convention; unsaturated
        // (θ = P) it degrades to m_union
        expr(s"n_ib * 1000000L div least(CAST(${k - 1} AS BIGINT), m_union)")
          .as("jacc_micro"))
    // exact side: per-group distinct counts and pairwise intersections
    val exactG = terms.groupBy(col("grp")).agg(count(lit(1)).as("exact_n"))
    val exactInter = terms.select(col("grp").as("src_a"), col("term"))
      .join(terms.select(col("grp").as("src_b"), col("term")), Seq("term"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    pairs
      .join(kmvStats, Seq("src_a", "src_b"))
      .join(exactG.select(col("grp").as("src_a"), col("exact_n").as("exact_a")),
        Seq("src_a"))
      .join(exactG.select(col("grp").as("src_b"), col("exact_n").as("exact_b")),
        Seq("src_b"))
      .join(exactInter, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("exact_union",
        col("exact_a") + col("exact_b") - col("exact_inter"))
      .select(col("src_a"), col("src_b"),
        col("est_a"), col("est_b"), col("est_union"), col("est_inter"),
        col("est_a_minus_b"), col("est_b_minus_a"),
        col("jacc_micro"),
        col("exact_a"), col("exact_b"), col("exact_union"),
        col("exact_inter"),
        (col("exact_a") - col("exact_inter")).as("exact_a_minus_b"),
        (col("exact_b") - col("exact_inter")).as("exact_b_minus_a"),
        expr("exact_inter * 1000000L div exact_union").as("exact_jacc_micro"))
  }
}
