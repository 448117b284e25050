package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality tooling: column profiling, declarative constraint
  * checks, and snapshot diffing — the validation layer a 100 TB
  * ingest runs BEFORE data reaches training (the deequ/expectations
  * shape, re-expressed as plain aggregates so Catalyst fuses the
  * whole check suite into a single pass wherever possible).
  *
  * Everything reports COUNTS as exact longs; float statistics are
  * quantized with the repo's floor(x·100 + 0.5) integer-cents
  * discipline so external engines replay the profile bit-for-bit.
  */
object Quality {

  /** Per-column profile of numeric columns: row count, null count,
    * exact distinct count, min/max, and the integer-cents sum. ONE
    * aggregate pass for all requested columns (count_distinct adds
    * expand-style partials but stays a single shuffle); emitted as
    * one row per column via an explicit stack, so the card is
    * (n_cols) rows regardless of corpus size.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    def cents(c: Column): Column =
      floor(c.cast(DoubleType) * lit(100.0) + lit(0.5)).cast(LongType)
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(cents(col(c))).as(s"${c}__min_cents"),
        max(cents(col(c))).as(s"${c}__max_cents"),
        sum(cents(col(c))).as(s"${c}__sum_cents"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack the single aggregate row via explode — a union of selects
    // over the unpersisted aggregate would re-evaluate it (= rescan
    // the corpus) once per column
    one.select(explode(array(cols.map { c =>
        struct(lit(c).as("column"),
          col(s"${c}__n").as("n_rows"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min_cents").as("min_cents"),
          col(s"${c}__max_cents").as("max_cents"),
          col(s"${c}__sum_cents").as("sum_cents"))
      }: _*)).as("r"))
      .select(col("r.column"), col("r.n_rows"), col("r.n_nulls"),
        col("r.n_distinct"), col("r.min_cents"), col("r.max_cents"),
        col("r.sum_cents"))
  }

  /** Declarative row-level constraint suite: each (name, predicate)
    * counts its violating rows (predicate FALSE or NULL — a null
    * check result is a violation, not a free pass: the deequ
    * convention that catches missing data). All checks fuse into ONE
    * conditional aggregate over one scan; output is one row per
    * check — (check, n_violations, pass) — so a 50-check suite on
    * 100 TB still costs a single pass.
    */
  def checkConstraints(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // single-row explode, not a union of selects (same rescan trap as
    // profileNumeric): the whole suite stays one scan + one 1-row stage
    one.select(explode(array(checks.map { case (name, _) =>
        struct(lit(name).as("check"),
          coalesce(col(name), lit(0L)).as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.check"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Windowed constraint monitoring — [[checkConstraints]] per
    * event-time window, the live-feed twin: (window_start, check,
    * n_violations, pass) so a quality regression pages within one
    * ingest window instead of at the next batch audit. One definition
    * runs as a batch job or a Structured Streaming query (pass
    * `watermarkSeconds` on a stream so closed-window state drops);
    * the ONLY stateful operator is the single windowed conditional
    * aggregate — checks-many longs of state per open window — and the
    * per-check stacking is a map-only explode of each closed row.
    */
  def checkConstraintsWindowed(df: DataFrame, checks: Seq[(String, Column)],
                               windowSeconds: Long = 3600L,
                               watermarkSeconds: Option[Long] = None,
                               tsCol: String = "ts"): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    require(windowSeconds > 0, "window must be positive")
    val withWm = watermarkSeconds.fold(df)(w =>
      df.withWatermark(tsCol, s"$w seconds"))
    val aggs = checks.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(name)
    }
    withWm.groupBy(window(col(tsCol), s"$windowSeconds seconds"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start"),
        explode(array(checks.map { case (name, _) =>
          struct(lit(name).as("check"),
            coalesce(col(name), lit(0L)).as("n_violations"))
        }: _*)).as("r"))
      .select(col("window_start"), col("r.check"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Key-uniqueness violation count: rows beyond the first per key
    * (0 = the column set is a key). One map-combined aggregate.
    */
  def uniquenessViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1L), lit(0L)).as("n_violations"),
        count(when(col("c") > 1L, 1)).as("n_duplicate_keys"))

  /** Referential-integrity violation count: child rows whose key has
    * no parent (null child keys excluded — nullable FKs are a
    * different check). A left-anti join that broadcasts whichever
    * side the planner finds small; at 100 TB prefer a bloom-filter
    * pre-gate ([[Skew.bloomSemiJoin]]) when the parent is huge.
    */
  def referentialViolations(child: DataFrame, childKey: String,
                            parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  /** Snapshot diff — the corpus-refresh audit: given snapshot A and
    * snapshot B keyed by `idCol`, classify every id as added /
    * removed / changed / unchanged (changed = both present, md5 of
    * `payloadCol` differs) and return the four exact counts in one
    * row. ONE full outer join on the id (both sides pre-reduced to
    * (id, md5) — fixed-width rows, never full payloads through the
    * shuffle); the summary aggregate is single-row.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
                   payloadCol: String): DataFrame = {
    // null payloads hash as '' — presence is signalled by the hash
    // column's non-nullness after the outer join, so a null payload
    // must never produce a null hash (it would read as a missing row)
    def keyed(df: DataFrame, h: String) =
      df.select(col(idCol).as("id"),
        md5(coalesce(col(payloadCol).cast(StringType), lit(""))).as(h))
    val j = keyed(a, "ha").join(keyed(b, "hb"), Seq("id"), "full")
    j.agg(
      count(when(col("ha").isNull, 1)).as("n_added"),
      count(when(col("hb").isNull, 1)).as("n_removed"),
      count(when(col("ha").isNotNull && col("hb").isNotNull &&
        col("ha") =!= col("hb"), 1)).as("n_changed"),
      count(when(col("ha") === col("hb"), 1)).as("n_unchanged"))
  }

  /** SCD Type-2 history bootstrap: every row of the first snapshot
    * becomes an open validity interval `[version, null)` marked
    * current. Output schema — the contract [[scd2Apply]] folds into —
    * is (id, payload, valid_from, valid_to, is_current).
    */
  def scd2Init(snap: DataFrame, idCol: String, payloadCol: String,
               version: Long): DataFrame = {
    requireUniqueIds(snap, idCol, "scd2Init")
    snap.select(col(idCol).as("id"), col(payloadCol).as("payload"),
      lit(version).as("valid_from"),
      lit(null).cast(LongType).as("valid_to"),
      lit(true).as("is_current"))
  }

  /** Fold one new snapshot (observed at `version`) into a slowly-
    * changing-dimension Type-2 history — the lakehouse pattern that
    * turns periodic full snapshots into queryable row-level validity
    * intervals ("what did doc X say at version V?"):
    *
    *   - unchanged id (payload null-safe-equal): current row rides
    *     through untouched;
    *   - changed id: the current row CLOSES (`valid_to = version`,
    *     no longer current) and a new open row starts at `version`;
    *   - removed id: the current row closes with no successor;
    *   - added id: a new open row starts at `version`.
    *
    * Scale shape: already-closed history passes through with no join
    * (in a lakehouse layout that slice is untouched storage — only
    * the current slice is rewritten per fold); the current slice and
    * the snapshot meet in ONE full-outer shuffle on id. History grows
    * append-only, so N folds cost N snapshot-sized joins, never a
    * re-derivation from all snapshots. Payload comparison is
    * null-safe (`<=>`) — a null payload is a VALUE, distinct from
    * the id being absent.
    *
    * Snapshot ids must be unique (guarded loudly — a duplicate id
    * would silently fork an id's timeline); versions must be applied
    * in increasing order, which the fold checks against the open
    * rows' `valid_from`.
    */
  def scd2Apply(history: DataFrame, snap: DataFrame, idCol: String,
                payloadCol: String, version: Long): DataFrame = {
    requireUniqueIds(snap, idCol, "scd2Apply")
    val cur = history.filter(col("is_current"))
      .select(col("id"), col("payload"), col("valid_from"),
        lit(true).as("__cur"))
    val dead = history.filter(!col("is_current"))
    val s = snap.select(col(idCol).as("id"),
      col(payloadCol).as("new_payload"), lit(true).as("__new"))
    val j = cur.join(s, Seq("id"), "full_outer")
      .withColumn("__cur", coalesce(col("__cur"), lit(false)))
      .withColumn("__new", coalesce(col("__new"), lit(false)))
    // an out-of-order version would write intervals that end before
    // they start; the guard rides the join projection (no extra pass)
    val fromChecked = when(col("valid_from") < lit(version), col("valid_from"))
      .otherwise(raise_error(concat(
        lit(s"scd2Apply: version $version is not after open valid_from "),
        col("valid_from"))))
    val same = col("payload") <=> col("new_payload")
    val kept = j.filter(col("__cur") && col("__new") && same)
      .select(col("id"), col("payload"), col("valid_from"),
        lit(null).cast(LongType).as("valid_to"), lit(true).as("is_current"))
    val closedNow = j.filter(col("__cur") && (!col("__new") || !same))
      .select(col("id"), col("payload"), fromChecked.as("valid_from"),
        lit(version).as("valid_to"), lit(false).as("is_current"))
    val openedNow = j.filter(col("__new") && (!col("__cur") || !same))
      .select(col("id"), col("new_payload").as("payload"),
        lit(version).as("valid_from"),
        lit(null).cast(LongType).as("valid_to"), lit(true).as("is_current"))
    dead.unionByName(kept).unionByName(closedNow).unionByName(openedNow)
  }

  /** Point-in-time read of an SCD Type-2 history: the rows valid AT
    * `version` — `valid_from <= version < valid_to` (open intervals
    * never end). The "what did the corpus say at version V" time
    * travel query the history table exists to answer; map-only (one
    * filter, no join, no window), so it rides any scan pruning the
    * history layout provides.
    */
  def scd2AsOf(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= lit(version) &&
        (col("valid_to").isNull || col("valid_to") > lit(version)))
      .select(col("id"), col("payload"))

  /** k-anonymity audit — the re-identification risk card a privacy
    * review reads before a corpus ships: group rows by the
    * quasi-identifier columns, then histogram the equivalence-class
    * sizes. A row in a class of size k is hidden among k-1 others;
    * `k = 1` rows are singletons (unique quasi-identifier
    * combinations — directly re-identifiable). Output: one row per
    * distinct class size `k` with the class count and the row count
    * it covers. Null QI values are VALUES (they group together, as
    * an attacker would group them).
    *
    * Scale: ONE shuffle on the quasi-identifier key (map-side
    * combined); the histogram re-aggregation is class-count-sized.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityAudit: no quasi-identifier columns")
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_classes"))
      .select(col("k"), col("n_classes"),
        (col("k") * col("n_classes")).as("n_rows"))
  }

  /** k-anonymity suppression — the standard release transform: drop
    * every row whose quasi-identifier equivalence class is smaller
    * than `kMin`, so each surviving row is indistinguishable from at
    * least kMin-1 others on the QI columns. A window count over the
    * QI partition (one shuffle, NO join, no second scan); the class
    * size rides along as `k` for the audit trail.
    */
  def kAnonymitySuppress(df: DataFrame, qiCols: Seq[String],
                         kMin: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymitySuppress: no quasi-identifier columns")
    require(kMin >= 1, "kMin must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
    df.withColumn("k", count(lit(1)).over(w)).filter(col("k") >= kMin)
  }

  /** Distinct l-diversity audit — k-anonymity's necessary companion:
    * a class can be large (k-safe) yet carry ONE sensitive value, so
    * membership alone discloses it (the homogeneity attack). Output:
    * one row per distinct l (= distinct sensitive values in a QI
    * class) with how many classes and rows sit at that diversity.
    * Nulls in the sensitive column are ignored by the distinct count
    * (both engines' COUNT(DISTINCT) semantics — documented, not
    * accidental); null QI values group as VALUES like the k-audit.
    *
    * Scale: one QI-key shuffle with map-side partial distinct, then
    * a class-count-sized histogram re-aggregation.
    */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "lDiversityAudit: no quasi-identifier columns")
    require(!qiCols.contains(sensitiveCol),
      "lDiversityAudit: sensitive column cannot be a quasi-identifier")
    df.groupBy(qiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("l"),
        count(lit(1)).as("__n"))
      .groupBy(col("l")).agg(count(lit(1)).as("n_classes"),
        sum(col("__n")).as("n_rows"))
  }

  /** l-diversity suppression: drop every row whose QI class holds
    * fewer than `lMin` distinct sensitive values; the class's l rides
    * along for the audit trail. One shuffle, NO join: the distinct
    * count is size(collect_set) over the QI window — state per class
    * is the sensitive DOMAIN within it (bounded by the attribute's
    * cardinality, never by class size).
    */
  def lDiversitySuppress(df: DataFrame, qiCols: Seq[String],
                         sensitiveCol: String, lMin: Long): DataFrame = {
    require(qiCols.nonEmpty, "lDiversitySuppress: no quasi-identifier columns")
    require(lMin >= 1, "lMin must be positive")
    require(!qiCols.contains(sensitiveCol),
      "lDiversitySuppress: sensitive column cannot be a quasi-identifier")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*)
    df.withColumn("l",
        size(collect_set(col(sensitiveCol)).over(w)).cast("long"))
      .filter(col("l") >= lMin)
  }

  /** t-closeness audit — the third leg of the privacy trio (after
    * k-anonymity and l-diversity): a class can be large AND diverse
    * yet still leak by SKEW — if 90% of one source's docs are one
    * language while the corpus is uniform, membership in the class
    * shifts an attacker's posterior. Per QI class, the distance
    * between the class's sensitive-value distribution and the GLOBAL
    * distribution; for an unordered attribute the t-closeness EMD
    * degenerates to total variation, ½·Σ|p(v) − q(v)|.
    *
    * Arithmetic is EXACT: with class size n, corpus size N, class
    * counts c(v) and global counts g(v), ½·Σ|c(v)/n − g(v)/N| =
    * Σ|c(v)·N − g(v)·n| / (2·n·N) — numerator and denominator are
    * integers, carried as DECIMAL(38,0) (a 100 TB corpus overflows
    * the i64 product), and the published `t_micro` is the integer
    * floor of 10⁶·t, so the oracle reproduces it bit-for-bit with no
    * float-summation-order hazard. Null sensitive values are
    * excluded from both distributions (the l-diversity convention);
    * null QI values are VALUES.
    *
    * Scale: one (QI, value) shuffle, then class-count-sized work —
    * the grid is classes × |sensitive domain| with the domain side
    * broadcast; nothing corpus-sized flows past the first partial
    * aggregation.
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "tClosenessAudit: no quasi-identifier columns")
    require(!qiCols.contains(sensitiveCol),
      "tClosenessAudit: sensitive column cannot be a quasi-identifier")
    val dec = DecimalType(38, 0)
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select((qiCols.map(col) :+ col(sensitiveCol).as("__s")): _*)
    val cv = base.groupBy((qiCols.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val cls = cv.groupBy(qiCols.map(col): _*).agg(sum(col("__cnt")).as("n"))
    val gv = base.groupBy(col("__s")).agg(count(lit(1)).as("__gcnt"))
    val tot = gv.agg(sum(col("__gcnt")).cast(dec).as("__N"))
    // null-safe match on the QI key: null QI values are VALUES (they
    // form a class), so a plain equi-join would zero their counts
    val cvR = cv.toDF((qiCols.map("__r_" + _) :+ "__rs" :+ "__cnt"): _*)
    val onQi = qiCols.map(q => col(q) <=> col("__r_" + q)).reduce(_ && _)
    val grid = cls
      .crossJoin(broadcast(gv))                 // classes × domain
      .crossJoin(broadcast(tot))                // singleton total
      .join(broadcast(cvR), onQi && col("__s") === col("__rs"), "left")
      .withColumn("__c", coalesce(col("__cnt"), lit(0L)).cast(dec))
    val diff = abs(col("__c") * col("__N") -
      col("__gcnt").cast(dec) * col("n").cast(dec))
    grid.groupBy((qiCols.map(col) :+ col("n") :+ col("__N")): _*)
      .agg(sum(diff).as("__t_num"))
      .select((qiCols.map(col) :+ col("n").cast("long").as("n") :+
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __t_num) DIV " +
          "(CAST(2 AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * __N) " +
          "AS BIGINT)").as("t_micro")): _*)
  }

  /** t-closeness suppression: drop every row whose QI class sits
    * farther than `tMaxMicro` (micro-units of total variation) from
    * the corpus-wide sensitive distribution; `t_micro` rides along
    * for the audit trail. The class card from [[tClosenessAudit]] is
    * classes-sized, so it re-enters as a broadcast build side — the
    * corpus flows exactly once.
    */
  def tClosenessSuppress(df: DataFrame, qiCols: Seq[String],
                         sensitiveCol: String, tMaxMicro: Long): DataFrame = {
    require(tMaxMicro >= 0, "tMaxMicro must be non-negative")
    val card = tClosenessAudit(df, qiCols, sensitiveCol)
      .filter(col("t_micro") <= tMaxMicro)
      .select((qiCols.map(q => col(q).as("__r_" + q)) :+ col("t_micro")): _*)
    val onQi = qiCols.map(q => col(q) <=> col("__r_" + q)).reduce(_ && _)
    df.join(broadcast(card), onQi, "inner")
      .drop(qiCols.map("__r_" + _): _*)
  }

  /** Differentially-private count release — the publication step after
    * the k-anonymity/l-diversity/t-closeness audits: per-key counts
    * plus two-sided geometric noise (the discrete Laplace mechanism;
    * ε-DP for counting queries at the released granularity), clamped
    * at zero. Noise magnitude is the geometric inverse-CDF
    * floor(ln(u)/ln(α)) with α = e^(−ε), i.e. floor(ln(u)/−ε), sign
    * from an independent hash bit.
    *
    * THE CAVEAT, stated loudly: `u` here is a SEEDED DETERMINISTIC
    * uniform derived from the key's portable fingerprint — which
    * makes the release replayable by the oracle and the tests, and
    * makes it NOT actually private (deterministic noise can be
    * inverted by anyone holding the seed). This is the mechanism's
    * PLUMBING — schema, clamping, inverse-CDF arithmetic, integer
    * exactness — with the randomness stubbed the same way the
    * multimodal codecs stub their decoders; a production release
    * swaps the hash-uniform for a CSPRNG draw and nothing else
    * changes. ln/division stay portable by the repo's
    * exact-integer-rational-to-double discipline.
    *
    * Scale: ONE key shuffle (the count), map-only noise.
    */
  def dpNoisyCounts(df: DataFrame, keyCols: Seq[String], epsilon: Double,
                    seed: Long): DataFrame = {
    require(keyCols.nonEmpty, "dpNoisyCounts: no key columns")
    require(epsilon > 0, "epsilon must be positive")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val keyStr = concat_ws("\u001F",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*)
    val h = TextAnalysis.polyFingerprint(keyStr)
    val p = Frames.HashP
    val u = (pmod(Frames.portableHash(h, seed), lit(p)) + lit(1L))
      .cast("double") / lit((p + 1).toDouble)
    val mag = floor(log(u) / lit(-epsilon)).cast("long")
    val sign = when(pmod(Frames.portableHash(h, seed + 1), lit(2L)) === 0L,
      lit(1L)).otherwise(lit(-1L))
    counts
      .withColumn("noise", sign * mag)
      .withColumn("n_noisy", greatest(lit(0L), col("n") + col("noise")))
  }

  /** DP-style noisy SUM/MEAN release with per-contributor bounding —
    * the step between the k-anon/l-div/t-close audits and publishing
    * any numeric aggregate ([[dpNoisyCounts]] covers counting
    * queries; sums need SENSITIVITY control first):
    *
    *   1. clamp every value into [clampLo, clampHi] (outliers can no
    *      longer dominate the release),
    *   2. keep at most `maxPerActor` rows per (key, actor) — ranked
    *      by clamped value ASC, a total order whose ties are harmless
    *      because tied rows contribute identical values — so one
    *      actor's influence on any key's sum is bounded by
    *      Δ = maxPerActor · max(|clampLo|, |clampHi|),
    *   3. add two-sided geometric noise calibrated to the bounded
    *      sensitivities — Δ/ε on the sum, maxPerActor/ε on the count
    *      (one actor still owns up to maxPerActor KEPT rows) — clamp
    *      the released count at zero, and derive the mean from the
    *      NOISY sum over the NOISY count (post-processing — releasing
    *      both costs the two budgets already spent, no more).
    *
    * Values must be pre-quantized integers (cents/micros — the
    * repo's exact-integer discipline); everything through the clamp
    * and bound is integer-exact, and the noise magnitude reuses
    * [[dpNoisyCounts]]'s seeded inverse-CDF plumbing — including its
    * loudly-stated caveat: the SEEDED uniform makes the release
    * replayable (oracle, tests, the sensitivity spec) and therefore
    * NOT actually private; production swaps in a CSPRNG draw and
    * nothing else changes.
    *
    * Output per key: (keyCols..., n_kept, sum_clamped, sum_noisy,
    * n_noisy, mean_micro = max(0, sum_noisy)·10^6 div max(1, n_noisy)).
    *
    * Scale: one (key, actor) shuffle for the bound, one key shuffle
    * for the release — no joins, map-only noise.
    */
  def dpNoisySum(df: DataFrame, keyCols: Seq[String], actorCol: String,
                 valueCol: String, clampLo: Long, clampHi: Long,
                 maxPerActor: Int, epsilon: Double, seed: Long): DataFrame = {
    require(keyCols.nonEmpty, "dpNoisySum: no key columns")
    require(epsilon > 0, "epsilon must be positive")
    require(clampLo <= clampHi, s"dpNoisySum: clampLo $clampLo > clampHi $clampHi")
    require(maxPerActor >= 1, "maxPerActor must be >= 1")
    val delta = maxPerActor * math.max(math.abs(clampLo), math.abs(clampHi))
    require(delta > 0, "dpNoisySum: zero sensitivity (clamp range is {0}) — " +
      "the release would be exact; widen the clamp or use dpNoisyCounts")
    val clamped = df.select(
      (keyCols.map(col) :+ col(actorCol).as("__actor") :+
        least(greatest(col(valueCol).cast("long"), lit(clampLo)),
          lit(clampHi)).as("__v")): _*)
    val byActor = org.apache.spark.sql.expressions.Window.partitionBy(
      (keyCols.map(col) :+ col("__actor")): _*).orderBy(col("__v"))
    val bounded = clamped
      .withColumn("__rn", row_number().over(byActor))
      .filter(col("__rn") <= maxPerActor)
    val sums = bounded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), sum(col("__v")).as("sum_clamped"))
    val keyStr = concat_ws("\u001F",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*)
    val h = TextAnalysis.polyFingerprint(keyStr)
    val p = Frames.HashP
    def draw(sd: Long): Column =
      (pmod(Frames.portableHash(h, sd), lit(p)) + lit(1L))
        .cast("double") / lit((p + 1).toDouble)
    // sum noise at scale Δ/ε; count noise at scale maxPerActor/ε —
    // after per-actor bounding one actor still owns up to maxPerActor
    // KEPT rows, so the released count's sensitivity is maxPerActor,
    // not 1. Identical expression shape on both engines so the
    // floored doubles agree.
    val sumMag = floor(log(draw(seed)) * lit(delta.toDouble) / lit(-epsilon))
      .cast("long")
    val sumSign = when(pmod(Frames.portableHash(h, seed + 1), lit(2L)) === 0L,
      lit(1L)).otherwise(lit(-1L))
    val cntMag = floor(log(draw(seed + 2)) * lit(maxPerActor.toDouble) /
      lit(-epsilon)).cast("long")
    val cntSign = when(pmod(Frames.portableHash(h, seed + 3), lit(2L)) === 0L,
      lit(1L)).otherwise(lit(-1L))
    sums
      .withColumn("sum_noisy", col("sum_clamped") + sumSign * sumMag)
      .withColumn("n_noisy",
        greatest(lit(0L), col("n_kept") + cntSign * cntMag))
      // mean is post-processing of the two releases; the numerator is
      // clamped at zero like the count so the integer division stays
      // on non-negative operands (Spark `div` truncates toward zero,
      // DuckDB `//` floors — they agree only above zero)
      .withColumn("mean_micro",
        expr("greatest(0L, sum_noisy) * 1000000L div greatest(1L, n_noisy)"))
  }

  /** DP BUDGET LEDGER — the missing piece between "a release" and "a
    * release POLICY": [[dpNoisyCounts]]/[[dpNoisySum]] each spend
    * (ε, Δ) per call, and under sequential composition the privacy
    * loss against one table is the SUM of the ε's ever spent on it.
    * The ledger is a tiny catalog table recording every release —
    * (seq, table_id, release_id, mechanism, eps_micro, delta) — and
    * [[dpLedgerSpend]] refuses LOUDLY once a spend would push a
    * table's cumulative ε past the caller's cap: the (ε·10^6)-integer
    * arithmetic is exact, so "at the cap" admits and "one micro-ε
    * over" refuses, deterministically.
    *
    * Idempotency: re-spending an already-recorded (table_id,
    * release_id) is a no-op success — the lineage-ledger replay
    * discipline ([[IvfIndex.lineageHasTag]]), so a retried pipeline
    * stage never double-charges the budget it already spent.
    *
    * Scale: the ledger is releases-sized (driver-bounded by policy —
    * a cap of ε=1 at ε≥0.01 per release holds ≤ 100 rows), read with
    * one tiny scan per spend; no corpus data ever enters it.
    */
  def dpLedgerSpend(spark: org.apache.spark.sql.SparkSession,
                    ledgerTable: String, tableId: String, releaseId: String,
                    mechanism: String, epsilon: Double, delta: Long,
                    epsCapMicro: Long): Unit = synchronized {
    require(epsilon > 0, "epsilon must be positive")
    require(epsCapMicro > 0, "epsCapMicro must be positive")
    require(tableId.nonEmpty && releaseId.nonEmpty && mechanism.nonEmpty,
      "dpLedgerSpend: tableId, releaseId and mechanism must be non-empty")
    // nearest-micro quantization: floor would turn 0.3 into 299999µ
    // through the binary representation; rint keeps decimal policy
    // numbers exact at the ledger grain
    val epsMicro = math.rint(epsilon * 1e6).toLong
    require(epsMicro >= 1,
      s"dpLedgerSpend: epsilon $epsilon below the 10^-6 ledger grain")
    val (spent, maxSeq, dup) =
      if (!spark.catalog.tableExists(ledgerTable)) {
        // a fresh session with an in-memory catalog can meet a STALE
        // ledger location left by a previous session (the metadata is
        // gone, the directory is not) — saveAsTable would refuse the
        // location; this session's ledger starts empty, so clear it
        Bucketing.dropTableAndLocation(spark, ledgerTable)
        (0L, 0L, false)
      } else {
        val rows = spark.table(ledgerTable)
          .filter(col("table_id") === tableId)
          .select(col("seq"), col("release_id"), col("eps_micro")).collect()
        (rows.map(_.getAs[Long]("eps_micro")).sum,
          spark.table(ledgerTable).agg(coalesce(max(col("seq")), lit(0L)))
            .head().getLong(0),
          rows.exists(_.getAs[String]("release_id") == releaseId))
      }
    if (dup) return // replay: the budget was already charged
    require(spent + epsMicro <= epsCapMicro,
      s"dpLedgerSpend: release '$releaseId' (ε=${epsMicro}µ) on table " +
        s"'$tableId' would spend ${spent + epsMicro}µ of the ${epsCapMicro}µ " +
        s"cap (already spent: ${spent}µ over prior releases) — the table's " +
        "privacy budget is exhausted; raise the policy cap deliberately or " +
        "stop releasing")
    spark.range(1).select(
        lit(maxSeq + 1L).as("seq"), lit(tableId).as("table_id"),
        lit(releaseId).as("release_id"), lit(mechanism).as("mechanism"),
        lit(epsMicro).as("eps_micro"), lit(delta).as("delta"))
      .coalesce(1)
      .write.mode("append").saveAsTable(ledgerTable)
  }

  /** The ledger as an audit card: every release in seq order with the
    * running cumulative spend per table — what a release-review reads
    * and the oracle replays.
    */
  def dpLedgerCard(spark: org.apache.spark.sql.SparkSession,
                   ledgerTable: String): DataFrame = {
    val byTable = org.apache.spark.sql.expressions.Window
      .partitionBy(col("table_id")).orderBy(col("seq"))
    spark.table(ledgerTable)
      .withColumn("cum_eps_micro", sum(col("eps_micro")).over(byTable))
      .select(col("seq"), col("table_id"), col("release_id"),
        col("mechanism"), col("eps_micro"), col("delta"),
        col("cum_eps_micro"))
  }

  /** [[dpNoisyCounts]] behind the ledger: the spend is charged (and
    * the cap enforced) BEFORE any release computes. Same output.
    */
  def dpNoisyCountsBudgeted(df: DataFrame, keyCols: Seq[String],
                            epsilon: Double, seed: Long, ledgerTable: String,
                            tableId: String, releaseId: String,
                            epsCapMicro: Long): DataFrame = {
    dpLedgerSpend(df.sparkSession, ledgerTable, tableId, releaseId,
      mechanism = "counts", epsilon = epsilon, delta = 1L,
      epsCapMicro = epsCapMicro)
    dpNoisyCounts(df, keyCols, epsilon, seed)
  }

  /** [[dpNoisySum]] behind the ledger — Δ recorded is the bounded
    * sum sensitivity maxPerActor · max(|lo|, |hi|).
    */
  def dpNoisySumBudgeted(df: DataFrame, keyCols: Seq[String],
                         actorCol: String, valueCol: String, clampLo: Long,
                         clampHi: Long, maxPerActor: Int, epsilon: Double,
                         seed: Long, ledgerTable: String, tableId: String,
                         releaseId: String, epsCapMicro: Long): DataFrame = {
    val delta = maxPerActor * math.max(math.abs(clampLo), math.abs(clampHi))
    dpLedgerSpend(df.sparkSession, ledgerTable, tableId, releaseId,
      mechanism = "sum", epsilon = epsilon, delta = delta,
      epsCapMicro = epsCapMicro)
    dpNoisySum(df, keyCols, actorCol, valueCol, clampLo, clampHi,
      maxPerActor, epsilon, seed)
  }

  /** Benford first-digit audit — the cheap fabricated-data detector
    * for naturally-occurring positive magnitudes (prices, counts,
    * durations spanning orders of magnitude): the leading decimal
    * digit of organic data follows log10(1 + 1/d); synthetic,
    * clamped, or copy-pasted columns don't. One 9-key map-side-
    * combined aggregate regardless of corpus size.
    *
    * digit(x) = floor(x / 10^floor(log10 x)) — transcendentals stay
    * per-row and the published numbers are exact integers (counts
    * and micro-rates), so the oracle replays the card bit-for-bit.
    * The Benford expectations are data-independent and inlined as
    * precomputed micro literals on BOTH engines ([[benfordExpectedMicro]]).
    *
    * Output per digit 1..9 (digits with zero rows still appear):
    * (digit, n_d, n, obs_micro = n_d·10^6 div n, exp_micro,
    * dev_micro = |obs − exp|). Values ≤ 0 are excluded by contract.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // RENORMALIZE stray buckets instead of clamping: floating-point
    // digit extraction can land a 10 (floor(log10 x) rounded LOW at a
    // power of ten — the true leading digit is 1, the exponent was
    // one too small) or a 0 (rounded HIGH just below a power of ten —
    // the true digit is 9). Mapping 10->1 and 0->9 restores the TRUE
    // digit, keeps every positive row inside the nine released
    // buckets, and makes the card robust to the two engines rounding
    // the same edge value differently (both roundings land on the
    // same renormalized digit)
    val d0 = floor(col(valueCol).cast("double") /
      pow(lit(10.0), floor(log10(col(valueCol).cast("double")))))
      .cast("long")
    val digits = df.filter(col(valueCol) > 0)
      .select(when(d0 > 9, lit(1L)).when(d0 < 1, lit(9L)).otherwise(d0)
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
    val frame = benfordExpectedMicro.toSeq
      .map { case (d, e) => (d, e) }.toDF("digit", "exp_micro")
    frame.join(digits, Seq("digit"), "left")
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
      .withColumn("n", sum(col("n_d")).over(
        Frames.tinyWindowTotal(col("digit")))) // 9-digit card
      .filter(col("n") > 0)
      .select(col("digit"), col("n_d"), col("n"),
        expr("n_d * 1000000L div n").as("obs_micro"),
        col("exp_micro"),
        abs(expr("n_d * 1000000L div n") - col("exp_micro")).as("dev_micro"))
  }

  /** floor(10^6 · log10(1 + 1/d)) for d = 1..9, precomputed so both
    * engines read identical integers rather than re-deriving them
    * through their own log implementations.
    */
  val benfordExpectedMicro: Seq[(Long, Long)] =
    (1 to 9).map(d =>
      d.toLong -> math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)

  /** Loud snapshot-uniqueness guard: one snapshot-sized aggregate —
    * the price of never silently forking an id's SCD timeline.
    */
  private def requireUniqueIds(snap: DataFrame, idCol: String,
                               op: String): Unit = {
    val dup = snap.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"$op: snapshot has duplicate id ${dup.headOption.map(_.get(0)).getOrElse("")} " +
        "— SCD2 requires one row per id per snapshot")
  }
}
