package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NativeFunctions

/** Portable count-min sketch over a corpus's token stream — the
  * bounded-state answer to "how often does this term occur?" when the
  * vocabulary is too hot to shuffle. The counter table is depth×width
  * cells (4×1024 here = 4 K longs); the occurrence stream reduces
  * into it through ONE aggregate whose distinct-key space is d·w, so
  * map-side combine compresses every partition's contribution to d·w
  * rows before the only shuffle — at 100 TB the wire cost is
  * partitions·d·w, independent of vocabulary or corpus size. Spark
  * ships `count_min_sketch` natively, but its murmur-based layout is
  * not replayable outside the JVM; this one derives cell positions
  * from the shared portable mixer (h1 = poly-fold, h2 = square-mix,
  * pos_j = (h1 + j·h2) mod p mod width — [[Bloom]]'s recipe), so an
  * external SQL engine rebuilds the EXACT counter table and every
  * estimate, collisions included.
  *
  * CMS guarantee: est ≥ true always (counters only over-count on
  * collisions); est ≤ true + ε·N with probability 1−δ for
  * ε = e/width, δ = e^−depth. Both sides of that contract are what
  * [[heavyHittersCard]] measures.
  */
object CountMin {

  private val P = 1000000007L

  private[graft] def checkParams(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width >= 16 && width <= (1 << 22), s"width must be in [16, 2^22], got $width")
  }

  /** (j, pos) cells of one token occurrence, j = 1..depth. */
  private[graft] def cells(tok: Column, depth: Int, width: Int): Column = {
    val h1 = pmod(NativeFunctions.polyFingerprint(tok), lit(P))
    val h2 = pmod(pmod(h1 * h1, lit(P)) * lit(1000003L) + lit(54321L), lit(P))
    array((1 to depth).map(j => struct(lit(j).as("j"),
      (pmod(h1 + lit(j.toLong) * h2, lit(P)) % lit(width.toLong)).as("pos"))): _*)
  }

  /** The counter table: one row per touched (j, pos) cell with its
    * occurrence count. ≤ depth·width rows total regardless of corpus
    * size; the groupBy's key space is the cell grid, so the shuffle
    * is map-side-combined to grid-sized per partition.
    */
  def cmsCounters(docs: DataFrame, textCol: String, depth: Int,
                  width: Int): DataFrame = {
    checkParams(depth, width)
    docs.select(explode(Dedup.tokens(col(textCol))).as("tok"))
      .select(explode(cells(col("tok"), depth, width)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimate for each probe term: min over the term's depth
    * cells — the classic CMS read. `probes` is (term)-rows,
    * panel-sized; the join against the grid-sized counter table is
    * broadcast-able from either side.
    */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, termCol: String,
                  depth: Int, width: Int): DataFrame = {
    checkParams(depth, width)
    probes.select(col(termCol).as("term"),
        explode(cells(col(termCol), depth, width)).as("c"))
      .select(col("term"), col("c.j").as("j"), col("c.pos").as("pos"))
      .join(counters, Seq("j", "pos"), "left")
      .groupBy(col("term"))
      // an untouched cell means count 0 — the estimate is 0, not null
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  /** Per-window point estimates over a WINDOWED counter grid (from
    * [[graft.streaming.DocStreams.cmsCountersWindowed]]): for every
    * (event-time window × probe term), the min over the term's depth
    * cells in THAT window's grid. This is the read side of the
    * windowed monitor — grids are the compact state a stream
    * materializes; any term's per-window frequency is answerable
    * later without re-scanning the corpus. The windows × (panel ·
    * depth) expansion is bounded on both axes (windows by the time
    * span, the panel by the caller), and untouched cells read as 0,
    * never null.
    */
  def cmsEstimateByWindow(counters: DataFrame, probes: DataFrame,
                          termCol: String, depth: Int, width: Int,
                          windowCol: String = "window_start"): DataFrame = {
    checkParams(depth, width)
    val wins = counters.select(col(windowCol)).distinct()
    val pc = probes.select(col(termCol).as("term"),
        explode(cells(col(termCol), depth, width)).as("c"))
      .select(col("term"), col("c.j").as("j"), col("c.pos").as("pos"))
    wins.crossJoin(broadcast(pc))
      .join(counters, Seq(windowCol, "j", "pos"), "left")
      .groupBy(col(windowCol), col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  /** Merge two counter grids by per-cell SUM — CMS counters are pure
    * additive state, so grids built over a corpus split ANY way
    * re-merge to the single-pass grid bit-for-bit (the
    * `text_cms_merged` oracle's claim). This is how a long-lived
    * monitor folds a day's saved grid into the running total, and
    * how per-shard grids combine without re-scanning anything.
    * ≤ 2·depth·width rows in, ≤ depth·width out.
    */
  def mergeGrids(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("j"), col("pos"), col("cnt"))
      .unionByName(b.select(col("j"), col("pos"), col("cnt")))
      .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))

  /** Heavy-hitters accuracy card from a PRE-BUILT counter grid
    * (served or merged state): the exact top-K terms over `docs` (the
    * EVAL side — a vocab-keyed aggregate the sketch exists to avoid
    * in production) against their estimates read from `counters`.
    * Identical schema to [[heavyHittersCard]], so the served/merged
    * queries share its oracle. Invariant both engines must agree on:
    * est_n ≥ exact_n for every row, with equality unless the term's
    * every row collides.
    */
  def heavyHittersCardFrom(counters: DataFrame, docs: DataFrame,
                           textCol: String, depth: Int, width: Int,
                           topK: Int): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val toks = docs.select(explode(Dedup.tokens(col(textCol))).as("tok"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok").asc).limit(topK)
    cmsEstimate(counters, top.select(col("tok")), "tok", depth, width)
      .join(top.withColumnRenamed("tok", "term"), Seq("term"))
      .select(col("term"), col("exact_n"), col("est_n"))
      .orderBy(col("exact_n").desc, col("term").asc)
  }

  /** [[heavyHittersCardFrom]] with the grid built inline over the
    * same corpus — the one-shot card.
    */
  def heavyHittersCard(docs: DataFrame, textCol: String, depth: Int,
                       width: Int, topK: Int): DataFrame =
    heavyHittersCardFrom(cmsCounters(docs, textCol, depth, width), docs,
      textCol, depth, width, topK)
}
