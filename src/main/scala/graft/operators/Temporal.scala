package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators: as-of (nearest-earlier/later match) and
  * interval containment (range join).
  *
  * Scale posture: both avoid the naive per-row subquery / theta-join
  * formulations. The as-of join is the union-merge shape — ONE
  * shuffle on the join keys, one sort, a running last_value — i.e.
  * exactly what a dedicated merge-as-of operator does physically.
  * The range join buckets intervals so containment becomes an
  * equi-join, turning an O(n x m) BroadcastNestedLoop into a shuffle
  * join on (key, bucket).
  */
object Temporal {

  /** As-of join: for every left row, the single right row with the
    * greatest `rightTime` <= `leftTime` (direction "backward", the
    * default), smallest `rightTime` >= `leftTime` ("forward"), or
    * smallest absolute time gap ("nearest" — exact microsecond gaps,
    * ties to the backward match), matching within `keys`. Right
    * columns come back null-prefixed by nothing — caller renames;
    * unmatched left rows keep nulls (left-outer semantics).
    * `tolerance` (seconds, optional) voids matches further than the
    * given gap (applied per direction before the nearest choice).
    *
    * Right rows must be unique per (keys, rightTime) — dedup first
    * (e.g. Frames.uniqueFirst) or matches among equal timestamps are
    * tie-broken arbitrarily. The three strategies mirror Polars
    * `join_asof(strategy=backward|forward|nearest)`.
    *
    * Implementation: tag + union + per-key sort; the right payload is
    * carried forward with last_value(ignoreNulls) over the running
    * window. At equal timestamps the right row sorts BEFORE the left
    * row, so matches are inclusive (>= / <=) in both directions
    * ("nearest" needs no forward inclusivity: an equal-time match has
    * backward gap zero and always wins). "nearest" still costs ONE
    * shuffle and ONE sort — both window frames share the ascending
    * (time, side) order.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               direction: String = "backward",
               toleranceSeconds: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asofJoin: direction must be backward|forward|nearest, got $direction")
    val leftPayload = left.columns.filterNot(c => keys.contains(c))
    val rightPayload = right.columns.filterNot(c => keys.contains(c))
    val overlap = leftPayload.toSet intersect rightPayload.toSet
    require(overlap.isEmpty,
      s"asofJoin: overlapping non-key columns $overlap — rename before joining")

    val l = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        struct(leftPayload.map(col).toSeq: _*).as("__lp") :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col).toSeq: _*).schema.fields)).as("__rp")): _*)
    val r = right
      // SQL equality semantics: a null join key matches nothing. The
      // window partition WOULD group null-key rows from both sides
      // together, so null-key right rows must be dropped up front
      // (null-key left rows stay and get the left-outer null fill).
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
          lit(null).cast(org.apache.spark.sql.types.StructType(
            left.select(leftPayload.map(col).toSeq: _*).schema.fields)).as("__lp") :+
          struct(rightPayload.map(col).toSeq: _*).as("__rp")): _*)

    val withTol = if (direction == "nearest") {
      val asc = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("__t").asc, col("__side").asc)
      val wb = asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the frame includes the current (left) row, whose __rp is null —
      // ignoreNulls skips it, so no off-by-one is needed
      val wf = asc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val both = l.unionByName(r)
        .withColumn("__mb", last(col("__rp"), ignoreNulls = true).over(wb))
        .withColumn("__mf", first(col("__rp"), ignoreNulls = true).over(wf))
        .filter(col("__side") === 1)
      val gb = unix_micros(col("__t")) -
        unix_micros(col("__mb").getField(rightTime))
      val gf = unix_micros(col("__mf").getField(rightTime)) -
        unix_micros(col("__t"))
      val bOk = toleranceSeconds.fold(col("__mb").isNotNull)(tol =>
        col("__mb").isNotNull && gb <= tol * 1000000L)
      val fOk = toleranceSeconds.fold(col("__mf").isNotNull)(tol =>
        col("__mf").isNotNull && gf <= tol * 1000000L)
      both.withColumn("__m",
          when(bOk && (!fOk || gb <= gf), col("__mb"))
            .when(fOk, col("__mf")))
    } else {
      val ordered =
        if (direction == "backward")
          Window.partitionBy(keys.map(col): _*).orderBy(col("__t").asc, col("__side").asc)
        else
          Window.partitionBy(keys.map(col): _*).orderBy(col("__t").desc, col("__side").asc)
      val w = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

      val matched = l.unionByName(r)
        .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
        .filter(col("__side") === 1)

      toleranceSeconds.fold(matched) { tol =>
        // microsecond gaps, like the "nearest" branch: unix_timestamp
        // truncates sub-second parts, which would admit gap = tol+0.4s
        // under backward but reject it under nearest
        val gap =
          if (direction == "backward")
            unix_micros(col("__t")) - unix_micros(col("__m").getField(rightTime))
          else
            unix_micros(col("__m").getField(rightTime)) - unix_micros(col("__t"))
        matched.withColumn("__m", when(gap <= tol * 1000000L, col("__m")))
      }
    }

    withTol.select(
      (keys.map(col) ++
        leftPayload.map(c => col("__lp").getField(c).as(c)) ++
        rightPayload.map(c => col("__m").getField(c).as(c))): _*)
  }

  /** Interval-containment join: left rows (point `timeCol`) matched
    * to right rows (interval [startCol, endCol], inclusive both ends)
    * sharing `keys`. Buckets of `bucketSeconds` turn containment into
    * an equi-join on (keys, bucket): each interval is exploded into
    * the buckets it covers (intervals >> bucketSeconds multiply —
    * size the bucket near the typical interval length), each point
    * maps to exactly one bucket, and the exact BETWEEN filter runs
    * on the equi-join's output. No nested-loop join, no per-key
    * cross product.
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                        timeCol: String, startCol: String, endCol: String,
                        bucketSeconds: Long = 3600L): DataFrame = {
    val overlap = left.columns.toSet intersect right.columns.toSet -- keys
    require(overlap.isEmpty,
      s"rangeJoinBucketed: overlapping non-key columns $overlap — rename first")
    val b = lit(bucketSeconds)
    val lb = left.withColumn("__bucket", floor(unix_timestamp(col(timeCol)) / b))
    val rb = right.withColumn("__bucket",
      explode(sequence(floor(unix_timestamp(col(startCol)) / b),
        floor(unix_timestamp(col(endCol)) / b))))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Cohort-retention matrix — the classic engagement analysis: bucket
    * every actor by the period of their FIRST event (the cohort), then
    * for each (cohort, period offset) report how many of the cohort's
    * actors were active — retention as an exact integer
    * micro-fraction. Offset 0 is the cohort's own period (retention
    * 10^6 by construction — a built-in sanity row).
    *
    * Periods are floor(epoch seconds / periodSeconds) — integer
    * arithmetic end-to-end, so the matrix replays exactly in any
    * engine.
    *
    * Scale shape: events collapse FIRST to distinct (actor, period) —
    * the one corpus-sized shuffle, map-side combined; everything after
    * is actor-sized (cohort = min period per actor, a same-key
    * aggregate) then (cohort, offset)-sized. No window over the raw
    * event stream, no per-period rescan.
    */
  def cohortRetention(events: DataFrame, actorCol: String, tsCol: String,
                      periodSeconds: Long = 7L * 86400L): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val up = events.select(col(actorCol).as("actor"),
        expr(s"floor(unix_timestamp($tsCol) / $periodSeconds)")
          .cast("long").as("period"))
      .distinct()
    val cohort = up.groupBy(col("actor")).agg(min(col("period")).as("cohort"))
    val sizes = cohort.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_cohort"))
    up.join(cohort, Seq("actor"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"), col("n_cohort"),
        expr("n_active * 1000000 div n_cohort").as("retention_micro"))
      .orderBy(col("cohort"), col("offset"))
  }

  /** First/last-touch conversion attribution — the standard
    * marketing-analytics question: for every CONVERSION event, which
    * preceding TOUCH (within a lookback window) gets the credit?
    * First-touch credits the touch that STARTED the journey, last-
    * touch the one that closed it; both are returned per conversion
    * (ids and types; null when no touch fell in the window).
    *
    * Semantics are total and engine-independent: a touch qualifies
    * when `conv.ts - window <= touch.ts <= conv.ts` (microsecond
    * arithmetic on the actual timestamps — no second truncation);
    * first = min, last = max by (ts_us, event_id), so equal-timestamp
    * touches break ties by id identically everywhere.
    *
    * Scale shape: ONE shuffle (by the actor key) and no join — every
    * event row computes its trailing-window touch extrema with two
    * conditional struct aggregates over a RANGE frame [-window, 0]
    * on event-time micros (state = one struct per frame bound, the
    * shape a RANGE window keeps incremental), then conversions are
    * filtered out. The classic join formulation (conversions x
    * touches per user) is what the oracle replays; this plan never
    * materializes the pair blowup a bursty user would create.
    */
  def attributionFirstLast(events: DataFrame, actorCol: String,
                           tsCol: String, typeCol: String, idCol: String,
                           convType: String, touchTypes: Seq[String],
                           windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and must not include the conversion type")
    val tsUs = unix_micros(col(tsCol))
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val touchStruct = when(isTouch,
      struct(tsUs.as("us"), col(idCol).cast("long").as("id"),
        col(typeCol).as("tp")))
    val w = Window.partitionBy(col(actorCol)).orderBy(tsUs)
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    events
      .select(col("*"), min(touchStruct).over(w).as("__first"),
        max(touchStruct).over(w).as("__last"))
      .filter(col(typeCol) === convType)
      .select(col(idCol).cast("long").as("conv_id"),
        col(actorCol).as("actor"),
        col("__first.id").as("first_touch_id"),
        col("__first.tp").as("first_touch_type"),
        col("__last.id").as("last_touch_id"),
        col("__last.tp").as("last_touch_type"))
  }
}
