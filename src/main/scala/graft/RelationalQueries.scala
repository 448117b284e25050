package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.ColumnOps._
import graft.operators.Frames

/** SURVEY.md §2 operator inventory, expressed as verifiable queries
  * over the driver's synthetic tables, each with a DuckDB-equivalent
  * oracle. Conventions for exact hash-parity with the oracle:
  *
  *  - Every query ends in a TOTAL ORDER (unique sort key) so row
  *    order is identical in both engines. Catalyst's EliminateSorts
  *    removes the sort under count()-style benchmarks, so it costs
  *    nothing where ordering is unobservable.
  *  - Cross-row float sums are quantized per-row to integer cents
  *    (floor(x*100+0.5)) and summed as exact longs: addition is
  *    order-independent, so both engines produce bit-identical
  *    results. Per-row double arithmetic (same IEEE op tree) is
  *    already deterministic.
  *  - Timestamps in output are formatted to strings (parquet
  *    physical-type drift between engines is not our problem then).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Exact cross-row sum of a double expression: quantize per-row to
    * integer cents with floor(x*100+0.5) — the same IEEE multiply/add/
    * floor in both engines — then sum exactly as longs. (Summing via
    * DECIMAL is NOT portable: Spark casts double→decimal through the
    * shortest string repr, DuckDB through the exact binary expansion,
    * and the 10th-decimal roundings disagree often enough to drift a
    * 60k-row sum.)
    */
  private def dsum(c: Column): Column =
    sum(floor(c * lit(100.0) + lit(0.5))).cast(DoubleType) / lit(100.0)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ extensionQueries

  private lazy val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- flagship aggregation (bench headline) ----
    "q1_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- spark.sql surface: the same engine drives ANSI SQL text
    //      directly (3-way join + cents-exact aggregation; Catalyst
    //      plans it identically to the DataFrame form) ----
    "q3_shipping_priority" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer")
      t(s, d, "orders").createOrReplaceTempView("orders")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_orderkey,
             CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
             CAST(o_orderdate AS STRING) AS o_orderdate, o_orderpriority
           FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING' AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority
           ORDER BY revenue DESC, l_orderkey
           LIMIT 100""")
    }),

    // ---- corpus heavy hitters: global top-k tokens. TakeOrdered
    //      (orderBy+limit) after a map-partial count aggregation —
    //      each executor ships only its local top candidates ----
    "q_top_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)),

    // ---- P1/P5/P7 projection + alias ----
    "q_select_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice").as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price"))),

    // ---- P2 with_columns + X12 arithmetic ----
    "q_with_columns" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
        .withColumn("disc_price", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .withColumn("flagged", col("l_discount") + lit(0.01) > lit(0.05))
        .drop("l_extendedprice", "l_discount")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_price"), col("flagged"))),

    // ---- P3/P4 drop + rename ----
    "q_rename_drop" -> ((s, d) =>
      t(s, d, "customer")
        .withColumnRenamed("c_name", "name")
        .drop("c_acctbal", "c_nationkey")
        .orderBy(col("c_custkey"))),

    // ---- P6 bulk prefix rename ----
    "q_prefix_columns" -> ((s, d) =>
      Frames.prefixColumns(t(s, d, "region"), "wd_").orderBy(col("wd_r_regionkey"))),

    // ---- F1/F7/F8 filter with boolean algebra ----
    "q_filter_bool" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter((col("l_returnflag") === "R" || col("l_linestatus") =!= "F") &&
          !(col("l_quantity") < 10))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus"), col("l_quantity"))),

    // ---- F2/F3 null handling (nulls synthesized via nullif) ----
    "q_filter_nulls" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("prio", nullif(col("o_orderpriority"), lit("1-URGENT")))
        .select(col("o_orderkey"), col("prio"))
        .na.drop()
        .orderBy(col("o_orderkey"))),

    // ---- F4 is_unique via window count ----
    "q_is_unique" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("u", isUniqueOver(col("o_custkey")))
        .filter(col("u"))
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))),

    // ---- F5 is_in broadcast set ----
    "q_isin" -> ((s, d) =>
      t(s, d, "nation")
        .filter(isInSet(col("n_name"), Seq("NATION_1", "NATION_3", "NATION_5", "NO_SUCH")))
        .orderBy(col("n_nationkey"))),

    // ---- F6 closed-left between ----
    "q_between_left" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(betweenLeft(col("l_quantity"), lit(10.0), lit(20.0)))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // ---- J1 left equi-join, coalesced same-name key ----
    "q_join_left" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val cust = t(s, d, "customer").withColumnRenamed("c_custkey", "o_custkey")
        .select(col("o_custkey"), col("c_name"), col("c_mktsegment"))
      orders.join(cust, Seq("o_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- J2 left equi-join, different key names, right key dropped ----
    "q_join_left_keys" -> ((s, d) => {
      val sup = t(s, d, "supplier")
      val nat = t(s, d, "nation")
      sup.join(nat, sup("s_nationkey") === nat("n_nationkey"), "left")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- left_semi (EXISTS idiom) ----
    "q_join_semi" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val orders = t(s, d, "orders").withColumnRenamed("o_custkey", "c_custkey")
      cust.join(orders.select("c_custkey"), Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- left_anti (NOT EXISTS idiom) ----
    "q_join_anti" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val orders = t(s, d, "orders").withColumnRenamed("o_custkey", "c_custkey")
      cust.join(orders.select("c_custkey"), Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- reference idiom: left join then filter right-null (wd_tmdb.py:241) ----
    "q_anti_via_left_join" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val orders = t(s, d, "orders")
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
      Frames.uniqueFirst(orders, Seq("c_custkey"), Seq(col("o_orderkey")))
        .join(cust, Seq("c_custkey"), "right")
        .filter(col("o_orderkey").isNull)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- A1 unique(subset, maintain_order) as explicit-order first-row ----
    "q_unique_first" -> ((s, d) =>
      Frames.uniqueFirst(t(s, d, "lineitem"), Seq("l_orderkey"),
          Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_extendedprice")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .orderBy(col("l_orderkey"))),

    // ---- A2 unique(keep="none") ----
    "q_unique_keep_none" -> ((s, d) =>
      Frames.uniqueKeepNone(t(s, d, "lineitem"), Seq("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .orderBy(col("l_orderkey"))),

    // ---- O-S1 + O-L1 sort + limit (top-n) ----
    "q_sort_limit" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // ---- full outer join (beyond the reference's left-only surface) ----
    "q_join_full" -> ((s, d) => {
      val bigCust = t(s, d, "customer").filter(col("c_custkey") > 400)
        .select(col("c_custkey").as("custkey"), col("c_name"))
      val firstOrders = Frames.uniqueFirst(
        t(s, d, "orders").select(col("o_custkey").as("custkey"), col("o_orderkey")),
        Seq("custkey"), Seq(col("o_orderkey")))
      bigCust.join(firstOrders, Seq("custkey"), "full_outer")
        .orderBy(col("custkey"), col("c_name"), col("o_orderkey"))
    }),

    // ---- set ops: intersect / except (distinct semantics) ----
    "q_intersect_except" -> ((s, d) => {
      val custNations = t(s, d, "customer").select(col("c_nationkey").as("nk")).distinct()
      val suppNations = t(s, d, "supplier").select(col("s_nationkey").as("nk")).distinct()
      custNations.intersect(suppNations).withColumn("op", lit("both"))
        .unionByName(custNations.except(suppNations).withColumn("op", lit("cust_only")))
        .orderBy(col("op"), col("nk"))
    }),

    // ---- deterministic train/val/test split: multiplicative id hash
    //      into contiguous bucket ranges — reproducible under any
    //      partitioning, map-side only, and every row lands in
    //      exactly one split ----
    "q_train_val_split" -> ((s, d) =>
      Frames.hashSplit(t(s, d, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split")).agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"))
        .orderBy(col("split"))),

    // ---- U1 name-aligned vertical concat ----
    "q_union_by_name" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("kind"))
      val sup = t(s, d, "supplier").select(lit("supplier").as("kind"), col("s_name").as("name"), col("s_suppkey").as("id"))
      Frames.concatFrames(Seq(c, sup)).orderBy(col("kind"), col("id"))
    }),

    // ---- N1 explode ----
    "q_explode_split" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
        .orderBy(col("p_partkey"), col("word"))),

    // ---- N3/N4 struct build + deep field access ----
    "q_struct_field" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("o", struct(col("o_custkey").as("cust"),
          struct(col("o_totalprice").as("price"), col("o_orderstatus").as("status")).as("inner")))
        .select(col("o_orderkey"), col("o.cust").as("cust"),
          col("o.inner.price").as("price"), col("o").getField("inner").getField("status").as("status"))
        .orderBy(col("o_orderkey"))),

    // ---- N5/N6 array build, first element, join ----
    "q_array_ops" -> ((s, d) =>
      t(s, d, "nation")
        .withColumn("arr", array(col("n_name"), col("n_nationkey").cast(StringType)))
        .select(col("n_nationkey"), listFirst(col("arr")).as("first_el"),
          size(col("arr")).as("n"), array_join(col("arr"), ",").as("joined"))
        .orderBy(col("n_nationkey"))),

    // ---- C1 when/then/otherwise ----
    "q_when_case" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, lit("big"))
            .when(col("o_totalprice") > 100000, lit("mid"))
            .otherwise(lit("small")).as("bucket"))
        .orderBy(col("o_orderkey"))),

    // ---- X1 regex extract (null on no-match) + X7 lenient cast ----
    "q_regex_extract" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          castLenient(extractFirst(col("c_name"), "#(\\d+)"), LongType).as("name_num"),
          extractFirst(col("c_name"), "(zzz\\d+)").as("no_match"))
        .orderBy(col("c_custkey"))),

    // ---- X2 regex extract_all ----
    "q_regex_extract_all" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), array_join(extractAll(col("text"), "\\b[a-z]{4}\\b"), "|").as("words4"))
        .orderBy(col("doc_id"))),

    // ---- X3 replace FIRST match only ----
    "q_replace_first" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), replaceFirst(col("text"), "the", "THE").as("replaced"))
        .orderBy(col("doc_id"))),

    // ---- X4 JSON decode with declared schema ----
    "q_json_decode" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).getField("k").as("k"))
        .orderBy(col("event_id"))),

    // ---- X5 null-propagating format ----
    "q_format_nullprop" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          fmt("order-{} prio-{}", col("o_orderkey"), nullif(col("o_orderpriority"), lit("1-URGENT"))).as("msg"))
        .orderBy(col("o_orderkey"))),

    // ---- X6 ISO-8601 strptime to date ----
    "q_strptime_date" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("iso", date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .select(col("o_orderkey"), strptimeDate(col("iso")).cast(StringType).as("parsed"))
        .orderBy(col("o_orderkey"))),

    // ---- X7 lenient cast: success and failure paths ----
    "q_cast_lenient" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          castLenient(substring(col("o_orderpriority"), 1, 1), LongType).as("prio_num"),
          castLenient(col("o_orderstatus"), IntegerType).as("bad_cast"))
        .orderBy(col("o_orderkey"))),

    // ---- X8 round (half away from zero in both engines) ----
    "q_round_half" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 0).as("rounded"),
          round(col("o_totalprice"), -2).as("rounded_h"))
        .orderBy(col("o_orderkey"))),

    // ---- X9/X10 date parts + truncation, string-rendered ----
    "q_date_trunc" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss").as("ts_sec"),
          col("ts").cast(DateType).cast(StringType).as("ts_date"))
        .orderBy(col("event_id"))),

    // ---- aggregation: min/max/count/count-distinct ----
    "q_agg_stats" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(min(col("value")).as("min_v"), max(col("value")).as("max_v"),
          count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("sum_v"))
        .orderBy(col("event_type"))),

    // ---- group-by + having ----
    "q_group_having" -> ((s, d) =>
      t(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("bal"))
        .filter(col("n") > 10)
        .orderBy(col("c_nationkey"))),

    // ---- window: running sum (decimal-exact) ----
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))).over(w)
            .cast(DoubleType) / lit(100.0)).as("running"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- top-k per group: bounded-heap aggregate (map-side partial
    //      top-3 per task; the row_number window equivalent sorts the
    //      whole table on as many reducers as there are groups — 3
    //      here. Equality with the window form asserted in
    //      FramesSpec.) ----
    "q_topk_per_group" -> ((s, d) => {
      val ord = struct((-col("l_extendedprice")).as("np"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val payload = struct(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.NativeFunctions.topkRows(ord, payload, 3).as("tk"))
        .select(col("l_returnflag"), posexplode(col("tk")).as(Seq("r0", "p")))
        .select(col("l_returnflag"), (col("r0") + 1).cast(IntegerType).as("rk"),
          col("p.payload.l_orderkey").as("l_orderkey"),
          col("p.payload.l_linenumber").as("l_linenumber"),
          col("p.payload.l_extendedprice").as("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("rk"))
    }),

    // ---- O-L3 seeded exact sample (deterministic in-engine; no
    //      cross-engine oracle -> rows-only check, asserted in tests) ----
    "q_sample_seeded" -> ((s, d) =>
      Frames.sampleExactPortable(t(s, d, "orders").select(col("o_orderkey")),
          100, seed = 42L, idCol = "o_orderkey")
        .orderBy(col("o_orderkey"))),

    // ---- rollup: hierarchical subtotals (extension beyond the
    //      reference's flat aggregation; labels coalesced so null
    //      ordering never differs between engines) ----
    "q_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy(col("rf"), col("ls"))),

    // ---- pivot: fixed value list so the schema is known without a
    //      driver-side distinct pass (the values-free overload runs an
    //      eager collect — never at 100 TB) ----
    "q_pivot_status" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))),

    // ---- window-function suite: rank family over a tie-bearing
    //      order (deterministic under ties), sequence family over a
    //      total order (lag/lead/ntile need one) ----
    "q_window_suite" -> ((s, d) => {
      val ties = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      val total = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          rank().over(ties).as("rk"),
          dense_rank().over(ties).as("drk"),
          percent_rank().over(ties).as("pr"),
          ntile(4).over(total).as("quartile"),
          lag(col("o_totalprice"), 1).over(total).as("prev_price"),
          lead(col("o_orderkey"), 1).over(total).as("next_key"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- skew mitigation, oracle-locked: a salted join/agg must be
    //      output-identical to its plain form (the salt only spreads
    //      hot keys over more reducers) ----
    "q_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val ord = t(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      graft.operators.Skew.saltedJoin(li, ord, "l_orderkey", saltFactor = 4)
        .groupBy(col("o_orderstatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- bloom-prefiltered semi-join (exact output; the bloom only
    //      prunes the big side before the shuffle) ----
    "q_bloom_semi_join" -> ((s, d) => {
      val hot = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey").as("l_orderkey"))
      graft.operators.Skew.bloomSemiJoin(
          t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          hot, "l_orderkey", expectedItems = 100000L)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    "q_salted_agg" -> ((s, d) =>
      graft.operators.Skew.saltedAgg(
          t(s, d, "lineitem")
            .select(col("l_returnflag"),
              floor(col("l_quantity") * lit(100.0) + lit(0.5)).cast(LongType).as("q100")),
          "l_returnflag", saltFactor = 8,
          partialAggs = Seq("sum_q100" -> sum(col("q100")), "n" -> count(lit(1))),
          finalAggs = Seq("sum_q100" -> ((c: Column) => sum(c)),
            "n" -> ((c: Column) => sum(c))))
        .select(col("l_returnflag"),
          (col("sum_q100").cast(DoubleType) / lit(100.0)).as("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"))),

    // ---- deterministic stratified sample (per-status fractions via
    //      multiplicative id hash — reproducible under any
    //      partitioning, pure map-side filter) ----
    "q_stratified_sample" -> ((s, d) =>
      Frames.stratifiedSampleDeterministic(t(s, d, "orders"), "o_orderstatus",
          Map("F" -> 0.10, "O" -> 0.05), "o_orderkey", defaultFraction = 0.20)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))),

    // ---- O-L2 soft cap with sampling (LimitWarning) ----
    "q_limit_warning" -> ((s, d) =>
      Frames.limitWithWarning(t(s, d, "orders").select(col("o_orderkey")), n = 250,
          idCol = Some("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    // ---- events: tumbling-window aggregation (batch form) ----
    "q_events_tumbling" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
        .orderBy(col("hour"), col("event_type")))
  )

  /** Round-2 widening of the SQL surface: reshaping (unpivot/cube),
    * time-frame windows, forward fill, robust (median/MAD) outlier
    * stats, and edit-distance fuzzy matching. Grouped separately only
    * to keep the base map readable.
    */
  private lazy val extensionQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- melt wide metric columns into (metric, value) rows —
    //      map-only reshape (each input row emits 4 output rows, no
    //      shuffle until the presentation sort) ----
    "q_unpivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        // (l_orderkey, l_linenumber) is NOT unique in this corpus —
        // value joins the sort for a total order
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"), col("value"))),

    // ---- cube: all 2^k grouping-set subtotals in one pass (partial
    //      aggregation expands each input row into its grouping sets
    //      map-side; one shuffle on the expanded keys) ----
    "q_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy(col("rf"), col("ls"))),

    // ---- time-based RANGE frame: trailing 1-hour sum per user. The
    //      frame is defined on the ORDER BY value (epoch seconds), not
    //      row position — Spark and DuckDB agree that RANGE includes
    //      all peers of the boundary values. Cents-quantized sum. ----
    "q_window_range" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
        .rangeBetween(-3600L, 0L)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("tsec"),
          floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("cents"))
        .withColumn("trail_1h_cents", sum(col("cents")).over(w))
        .select(col("event_id"), col("user_id"), col("trail_1h_cents"))
        .orderBy(col("event_id"))
    }),

    // ---- forward fill: carry the last non-null observation forward
    //      per key (last(ignoreNulls) over an unbounded-preceding ROWS
    //      frame — the standard sparse->dense time-series densify) ----
    "q_fill_forward" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("purchase_v",
          when(col("event_type") === "purchase", col("value")))
        .withColumn("last_purchase_v",
          last(col("purchase_v"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("last_purchase_v"))
        .orderBy(col("event_id"))
    }),

    // ---- robust outlier stats per group, entirely in the exact
    //      cents-integer domain: median and MAD interpolate between
    //      integers (dyadic fractions — bit-identical cross-engine),
    //      so the 3-MAD outlier comparison is exact, never a float
    //      boundary coin-flip. Medians come from the rank-offset
    //      selection operator (sort + middle rows), NOT Spark's exact
    //      `percentile`, whose per-group value-map buffer is a memory
    //      hazard at 100 TB value domains; group-sized med/mad frames
    //      are broadcast back ----
    "q_mad_outliers" -> ((s, d) => {
      val cents = t(s, d, "orders")
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast(LongType).as("pc"))
      // the median frame is GROUPS-sized (5 rows here) but costs a
      // full rank pipeline to produce, and the MAD stage consumes
      // `adev` three times (cutpoints, cells, rank) — persist the
      // tiny result once instead of re-deriving the pipeline per
      // consumer (a ≤groups-row persist, not a corpus one)
      val med = Frames.exactMedianByGroup(cents, "o_orderpriority", "pc", "med_c")
        .persist()
      val adev = cents.join(broadcast(med), Seq("o_orderpriority"))
        .withColumn("adev_c", abs(col("pc") - col("med_c")))
      val mad = Frames.exactMedianByGroup(adev, "o_orderpriority", "adev_c", "mad_c")
      adev.join(broadcast(mad), Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"))
        .agg(max(col("med_c")).as("med_c"), max(col("mad_c")).as("mad_c"),
          count(when(col("adev_c") > lit(3.0) * col("mad_c"), lit(1))).as("n_outliers"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- per-group winsorization: clamp to interpolated [p01, p99].
    //      The oracle replays the rank-offset interpolation op-for-op
    //      rather than using quantile_cont: DuckDB's interpolation
    //      order diverges from lo+(hi-lo)*frac by 1 ulp on real data
    //      (measured), and clamped outputs carry the cutoff verbatim ----
    "q_winsorize" -> ((s, d) => {
      val cents = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast(LongType).as("pc"))
      Frames.winsorizeByGroup(cents, "o_orderpriority", "pc", 0.01, 0.99)
        .select(col("o_orderkey"), col("o_orderpriority"), col("pc"), col("pc_w"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- CDC upsert: latest-wins apply of an update set onto a base
    //      table (anti-join + union — the merge-into shape) ----
    "q_upsert" -> ((s, d) => {
      val base = t(s, d, "orders")
      val updates = base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * lit(2.0))
        .withColumn("o_orderstatus", lit("U"))
      Frames.upsert(base, updates, "o_orderkey")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- weighted sample (rows-only: seeded-xxhash keys have no
    //      DuckDB twin; determinism/bias asserted in FramesSpec) ----
    "q_sample_weighted" -> ((s, d) =>
      Frames.weightedSampleDeterministic(
          t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice")),
          n = 100, weightCol = "o_totalprice", idCol = "o_orderkey")
        .orderBy(col("o_orderkey"))),

    // ---- explode variants: posexplode_outer keeps rows whose array
    //      is empty/null (with null pos+value) and emits the element
    //      index — the lossless flatten for downstream re-nesting.
    //      NULLS FIRST is pinned explicitly: Spark and DuckDB default
    //      opposite null orders ----
    "q_explode_variants" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          filter(split(trim(col("text")), "\\s+"), t => length(t) >= 9).as("long_toks"))
        .select(col("doc_id"), posexplode_outer(col("long_toks")).as(Seq("pos", "token")))
        .orderBy(col("doc_id"), col("pos").asc_nulls_first)),

    // ---- explicit GROUPING SETS with grouping_id: the general form
    //      rollup/cube specialize; gid disambiguates a real NULL group
    //      key from a subtotal marker ----
    "q_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
             grouping_id(l_returnflag, l_linestatus) AS gid,
             COUNT(*) AS n
           FROM lineitem_gs
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
           ORDER BY rf, ls, gid""")
    }),

    // ---- Pearson correlation from exact integer moment sums:
    //      integer-quantized values (quantity is integral; price to
    //      whole dollars so sum(y^2) stays far from long overflow even
    //      at sf100), five exact long sums per group, one fixed double
    //      op tree at the end (sqrt is IEEE-correctly-rounded, so the
    //      tree is bit-stable). The built-in corr() accumulates
    //      doubles in partition order (nondeterministic across
    //      engines AND runs); this formulation is deterministic at any
    //      parallelism ----
    "q_corr_exact" -> ((s, d) => {
      val c = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_quantity") + lit(0.5)).cast(LongType).as("x"),
          floor(col("l_extendedprice") + lit(0.5)).cast(LongType).as("y"))
      c.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("l_returnflag"),
          ((col("n").cast(DoubleType) * col("sxy") - col("sx").cast(DoubleType) * col("sy")) /
            sqrt(col("n").cast(DoubleType) * col("sxx") - col("sx").cast(DoubleType) * col("sx")) /
            sqrt(col("n").cast(DoubleType) * col("syy") - col("sy").cast(DoubleType) * col("sy")))
            .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- fuzzy matching: blocked levenshtein self-join over the
    //      distinct name vocabulary. Blocking key (first token) bounds
    //      the candidate pairs; the quadratic edit-distance work runs
    //      on vocabulary size, never corpus size ----
    "q_fuzzy_pairs" -> ((s, d) => {
      val names = t(s, d, "part").select(col("p_name")).distinct()
        .select(col("p_name"), split(col("p_name"), " ").getItem(0).as("blk"))
      names.as("x").join(names.as("y"),
          col("x.blk") === col("y.blk") && col("x.p_name") < col("y.p_name"))
        .select(col("x.p_name").as("name_a"), col("y.p_name").as("name_b"),
          levenshtein(col("x.p_name"), col("y.p_name")).as("dist"))
        .filter(col("dist") <= 4)
        .orderBy(col("name_a"), col("name_b"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
           CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING' AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 100""",
    "q_top_tokens" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token FROM documents)
         SELECT token, COUNT(*) AS n FROM toks WHERE token <> ''
         GROUP BY token ORDER BY n DESC, token LIMIT 20""",
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
           COUNT(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q_pivot_status" ->
      """SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_window_suite" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS rk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS drk,
           percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS pr,
           ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile,
           lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS prev_price,
           lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS next_key
         FROM orders ORDER BY o_orderkey""",
    "q_join_full" ->
      """WITH bc AS (
           SELECT c_custkey AS custkey, c_name FROM customer WHERE c_custkey > 400),
         fo AS (
           SELECT o_custkey AS custkey, MIN(o_orderkey) AS o_orderkey
           FROM orders GROUP BY 1)
         SELECT COALESCE(bc.custkey, fo.custkey) AS custkey, bc.c_name, fo.o_orderkey
         FROM bc FULL OUTER JOIN fo ON bc.custkey = fo.custkey
         ORDER BY custkey, c_name NULLS FIRST, o_orderkey NULLS FIRST""",
    "q_intersect_except" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
         SELECT nk, 'both' AS op FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
         UNION ALL
         SELECT nk, 'cust_only' AS op FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
         ORDER BY op, nk""",
    "q_train_val_split" ->
      """WITH s AS (
           SELECT doc_id,
             CASE WHEN b < 8000 THEN 'train'
                  WHEN b < 9000 THEN 'val'
                  ELSE 'test' END AS split
           FROM (SELECT doc_id,
             ((((doc_id % 1000000007) * 1000003 % 1000000007) * 999983) % 1000000007) % 10000 AS b
             FROM documents))
         SELECT split, COUNT(*) AS n, MIN(doc_id) AS min_id
         FROM s GROUP BY split ORDER BY split""",
    "q_salted_join" ->
      """SELECT o_orderstatus,
           CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
           COUNT(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
         ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q_salted_agg" ->
      """SELECT l_returnflag,
           CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
           COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_stratified_sample" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE ((((o_orderkey % 1000000007) * 1000003 % 1000000007) * 999983) % 1000000007) % 10000 <
           (CASE o_orderstatus WHEN 'F' THEN 1000 WHEN 'O' THEN 500 ELSE 2000 END)
         ORDER BY o_orderkey""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(floor((l_quantity) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
         CAST(SUM(CAST(floor((l_extendedprice) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
         CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
         CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_charge,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_select_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice AS price
         FROM lineitem ORDER BY l_orderkey, l_linenumber, price""",
    "q_with_columns" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 - l_discount) AS disc_price,
         l_discount + 0.01 > 0.05 AS flagged
         FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_price, flagged""",
    "q_rename_drop" ->
      """SELECT c_custkey, c_name AS name, c_mktsegment
         FROM customer ORDER BY c_custkey""",
    "q_prefix_columns" ->
      """SELECT r_regionkey AS wd_r_regionkey, r_name AS wd_r_name
         FROM region ORDER BY wd_r_regionkey""",
    "q_filter_bool" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
         FROM lineitem
         WHERE (l_returnflag = 'R' OR l_linestatus <> 'F') AND NOT (l_quantity < 10)
         ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity""",
    "q_filter_nulls" ->
      """SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio
         FROM orders WHERE NULLIF(o_orderpriority, '1-URGENT') IS NOT NULL
         ORDER BY o_orderkey""",
    "q_is_unique" ->
      """SELECT o_orderkey, o_custkey FROM (
           SELECT o_orderkey, o_custkey, COUNT(*) OVER (PARTITION BY o_custkey) AS c
           FROM orders) WHERE c = 1 ORDER BY o_orderkey""",
    "q_isin" ->
      """SELECT * FROM nation WHERE n_name IN ('NATION_1','NATION_3','NATION_5','NO_SUCH')
         ORDER BY n_nationkey""",
    "q_between_left" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
         FROM lineitem WHERE l_quantity >= 10.0 AND l_quantity < 20.0
         ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q_join_left" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_join_left_keys" ->
      """SELECT s_suppkey, s_name, n_name
         FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
         ORDER BY s_suppkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_anti_via_left_join" ->
      """SELECT c_custkey, c_name FROM customer
         LEFT JOIN (SELECT o_custkey, MIN(o_orderkey) AS o_orderkey FROM orders GROUP BY o_custkey) o
           ON c_custkey = o.o_custkey
         WHERE o.o_orderkey IS NULL ORDER BY c_custkey""",
    "q_unique_first" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
           SELECT l_orderkey, l_linenumber, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
           FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""",
    "q_unique_keep_none" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
           SELECT l_orderkey, l_linenumber, l_partkey,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS c
           FROM lineitem) WHERE c = 1 ORDER BY l_orderkey""",
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""",
    "q_union_by_name" ->
      """SELECT * FROM (
           SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
           UNION ALL
           SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind FROM supplier)
         ORDER BY kind, id""",
    "q_explode_split" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
         FROM part ORDER BY p_partkey, word""",
    "q_struct_field" ->
      """SELECT o_orderkey, o_custkey AS cust, o_totalprice AS price, o_orderstatus AS status
         FROM orders ORDER BY o_orderkey""",
    "q_array_ops" ->
      """SELECT n_nationkey, [n_name, CAST(n_nationkey AS VARCHAR)][1] AS first_el,
         len([n_name, CAST(n_nationkey AS VARCHAR)]) AS n,
         array_to_string([n_name, CAST(n_nationkey AS VARCHAR)], ',') AS joined
         FROM nation ORDER BY n_nationkey""",
    "q_when_case" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 300000 THEN 'big'
              WHEN o_totalprice > 100000 THEN 'mid'
              ELSE 'small' END AS bucket
         FROM orders ORDER BY o_orderkey""",
    "q_regex_extract" ->
      """SELECT c_custkey,
         TRY_CAST(NULLIF(regexp_extract(c_name, '#(\d+)', 1), '') AS BIGINT) AS name_num,
         NULLIF(regexp_extract(c_name, '(zzz\d+)', 1), '') AS no_match
         FROM customer ORDER BY c_custkey""",
    "q_regex_extract_all" ->
      """SELECT doc_id, COALESCE(array_to_string(regexp_extract_all(text, '\b[a-z]{4}\b'), '|'), '') AS words4
         FROM documents ORDER BY doc_id""",
    "q_replace_first" ->
      """SELECT doc_id, regexp_replace(text, 'the', 'THE') AS replaced
         FROM documents ORDER BY doc_id""",
    "q_json_decode" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events ORDER BY event_id""",
    "q_format_nullprop" ->
      """SELECT o_orderkey,
         'order-' || o_orderkey || ' prio-' || NULLIF(o_orderpriority, '1-URGENT') AS msg
         FROM orders ORDER BY o_orderkey""",
    "q_strptime_date" ->
      """SELECT o_orderkey,
         CAST(CAST(TRY_CAST(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS TIMESTAMP) AS DATE) AS VARCHAR) AS parsed
         FROM orders ORDER BY o_orderkey""",
    "q_cast_lenient" ->
      """SELECT o_orderkey,
         TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
         TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast
         FROM orders ORDER BY o_orderkey""",
    "q_round_half" ->
      """SELECT o_orderkey, round(o_totalprice, 0) AS rounded, round(o_totalprice, -2) AS rounded_h
         FROM orders ORDER BY o_orderkey""",
    "q_date_trunc" ->
      """SELECT event_id,
         strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_sec,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS ts_date
         FROM events ORDER BY event_id""",
    "q_agg_stats" ->
      """SELECT event_type, MIN(value) AS min_v, MAX(value) AS max_v,
         COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
         CAST(SUM(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_v
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_group_having" ->
      """SELECT c_nationkey, COUNT(*) AS n,
         CAST(SUM(CAST(floor((c_acctbal) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS bal
         FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 10
         ORDER BY c_nationkey""",
    "q_window_running" ->
      """SELECT o_orderkey, o_custkey,
         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
           OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running
         FROM orders ORDER BY o_orderkey""",
    "q_topk_per_group" ->
      """SELECT l_returnflag, rk, l_orderkey, l_linenumber, l_extendedprice FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity) AS rk
           FROM lineitem) WHERE rk <= 3 ORDER BY l_returnflag, rk""",
    "q_events_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
         COUNT(*) AS n, CAST(SUM(CAST(floor((value) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_v
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
           UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, metric, value""",
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
           COUNT(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q_window_range" ->
      """SELECT event_id, user_id,
           CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY tsec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_1h_cents
         FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events)
         ORDER BY event_id""",
    "q_fill_forward" ->
      """SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_v
         FROM events ORDER BY event_id""",
    "q_winsorize" ->
      """WITH c AS (
           SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc FROM orders),
         r AS (
           SELECT o_orderpriority, pc,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY pc) AS rk,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM c),
         q AS (
           SELECT o_orderpriority,
             MAX(CASE WHEN rk = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.01) AS BIGINT) + 1
               THEN CAST(pc AS DOUBLE) END) AS lo0,
             MAX(CASE WHEN rk = least(CAST(floor(CAST(n - 1 AS DOUBLE) * 0.01) AS BIGINT) + 2, n)
               THEN CAST(pc AS DOUBLE) END) AS lo1,
             MAX(CASE WHEN rk = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1
               THEN CAST(pc AS DOUBLE) END) AS hi0,
             MAX(CASE WHEN rk = least(CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 2, n)
               THEN CAST(pc AS DOUBLE) END) AS hi1,
             MAX(n) AS nn
           FROM r GROUP BY 1),
         q2 AS (
           SELECT o_orderpriority,
             lo0 + (lo1 - lo0) *
               (CAST(nn - 1 AS DOUBLE) * 0.01 - floor(CAST(nn - 1 AS DOUBLE) * 0.01)) AS lo,
             hi0 + (hi1 - hi0) *
               (CAST(nn - 1 AS DOUBLE) * 0.99 - floor(CAST(nn - 1 AS DOUBLE) * 0.99)) AS hi
           FROM q)
         SELECT c.o_orderkey, c.o_orderpriority, c.pc,
           greatest(q2.lo, least(q2.hi, CAST(c.pc AS DOUBLE))) AS pc_w
         FROM c JOIN q2 USING (o_orderpriority) ORDER BY c.o_orderkey""",
    "q_mad_outliers" ->
      """WITH cents AS (
           SELECT o_orderpriority, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc
           FROM orders),
         med AS (
           SELECT o_orderpriority, quantile_cont(pc, 0.5) AS med_c FROM cents GROUP BY 1),
         adev AS (
           SELECT c.o_orderpriority, abs(c.pc - m.med_c) AS adev_c
           FROM cents c JOIN med m USING (o_orderpriority)),
         mad AS (
           SELECT o_orderpriority, quantile_cont(adev_c, 0.5) AS mad_c FROM adev GROUP BY 1)
         SELECT a.o_orderpriority, max(m.med_c) AS med_c, max(d.mad_c) AS mad_c,
           COUNT(*) FILTER (a.adev_c > 3.0 * d.mad_c) AS n_outliers, COUNT(*) AS n
         FROM adev a JOIN med m USING (o_orderpriority) JOIN mad d USING (o_orderpriority)
         GROUP BY a.o_orderpriority ORDER BY a.o_orderpriority""",
    "q_limit_warning" ->
      """WITH h AS (
           SELECT o_orderkey,
             ((((o_orderkey + 42) % 1000000007) * ((o_orderkey + 42) % 1000000007))
               % 1000000007 * 1000003 + 54321) % 1000000007 AS v
           FROM orders)
         SELECT o_orderkey FROM (
           SELECT o_orderkey FROM h ORDER BY (v * v) % 1000000007, o_orderkey LIMIT 250)
         ORDER BY o_orderkey""",
    "q_sample_seeded" ->
      """WITH h AS (
           SELECT o_orderkey,
             ((((o_orderkey + 42) % 1000000007) * ((o_orderkey + 42) % 1000000007))
               % 1000000007 * 1000003 + 54321) % 1000000007 AS v
           FROM orders)
         SELECT o_orderkey FROM (
           SELECT o_orderkey FROM h ORDER BY (v * v) % 1000000007, o_orderkey LIMIT 100)
         ORDER BY o_orderkey""",
    "q_sample_weighted" ->
      """WITH h AS (
           SELECT o_orderkey, o_totalprice,
             ((((o_orderkey + 42) % 1000000007) * ((o_orderkey + 42) % 1000000007))
               % 1000000007 * 1000003 + 54321) % 1000000007 AS v
           FROM orders WHERE o_totalprice > 0)
         SELECT o_orderkey, o_totalprice FROM (
           SELECT o_orderkey, o_totalprice FROM h
           ORDER BY ln(((v * v) % 1000000007 + 1) / 1000000007.0) / o_totalprice DESC,
             o_orderkey
           LIMIT 100)
         ORDER BY o_orderkey""",
    "q_upsert" ->
      """WITH updates AS (
           SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2.0 AS o_totalprice
           FROM orders WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
         UNION ALL
         SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM orders b
         WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = b.o_orderkey)
         ORDER BY o_orderkey""",
    "q_explode_variants" ->
      """WITH d AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) >= 9) AS l
           FROM documents)
         SELECT doc_id, u.pos, u.token FROM d,
           LATERAL (SELECT unnest(
             CASE WHEN l IS NULL OR len(l) = 0
               THEN [struct_pack(pos := CAST(NULL AS INTEGER), token := CAST(NULL AS VARCHAR))]
               ELSE list_transform(l, (x, i) -> struct_pack(pos := CAST(i - 1 AS INTEGER), token := x))
             END) AS u) s
         ORDER BY doc_id, u.pos NULLS FIRST""",
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
           grouping(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY rf, ls, gid""",
    "q_corr_exact" ->
      """WITH c AS (
           SELECT l_returnflag,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
           FROM lineitem),
         m AS (
           SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
           FROM c GROUP BY l_returnflag)
         SELECT l_returnflag,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) AS corr_qty_price
         FROM m ORDER BY l_returnflag""",
    "q_fuzzy_pairs" ->
      """WITH names AS (
           SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS blk FROM part)
         SELECT x.p_name AS name_a, y.p_name AS name_b,
           levenshtein(x.p_name, y.p_name) AS dist
         FROM names x JOIN names y ON x.blk = y.blk AND x.p_name < y.p_name
         WHERE levenshtein(x.p_name, y.p_name) <= 4
         ORDER BY name_a, name_b"""
  )
}
