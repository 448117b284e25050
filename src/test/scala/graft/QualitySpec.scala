package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileNumeric: exact counts/nulls/distinct and integer-cents stats") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.5), (2.0, null), (2.0, -3.25), (null, 10.5))
      .toDF("a", "b")
    val p = Quality.profileNumeric(df, Seq("a", "b"))
      .orderBy("column").collect()
    val a = p(0); val b = p(1)
    assert(a.getString(0) === "a")
    assert(a.getLong(1) === 4L && a.getLong(2) === 1L && a.getLong(3) === 2L)
    assert(a.getLong(4) === 100L && a.getLong(5) === 200L && a.getLong(6) === 500L)
    assert(b.getLong(2) === 1L && b.getLong(3) === 2L)
    // floor(-3.25*100 + 0.5) = floor(-324.5) = -325 (half-up toward +inf)
    assert(b.getLong(4) === -325L && b.getLong(5) === 1050L)
  }

  test("benfordAudit: exact digit counts, zero-digit rows kept, non-positives dropped") {
    val df = Seq(1.0, 19.0, 23.0, 999.0, 4321.0, 150000.0, -5.0, 0.0)
      .toDF("x")
    val r = Quality.benfordAudit(df, "x").orderBy("digit").collect()
    assert(r.length === 9, "all nine digits must appear")
    val byDigit = r.map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(5))).toMap
    // digits: 1,1,2,9,4,1 — six positive values
    assert(byDigit(1L)._1 === 3L && byDigit(2L)._1 === 1L &&
      byDigit(4L)._1 === 1L && byDigit(9L)._1 === 1L)
    assert(byDigit(3L)._1 === 0L && byDigit(7L)._1 === 0L)
    assert(r.forall(_.getLong(2) === 6L), "n counts positives only")
    // obs_micro is exact integer division; dev is vs the precomputed
    // expectation table
    assert(byDigit(1L)._3 === 3L * 1000000L / 6L)
    val exp = Quality.benfordExpectedMicro.toMap
    assert(byDigit(1L)._4 === math.abs(500000L - exp(1L)))
    // a Benford-conforming synthetic set scores low total deviation:
    // x = 10^(i/N) has log-uniform mantissas by construction
    val conf = (0 until 4000).map(i => math.pow(10.0, i / 4000.0 * 3.0))
      .toDF("x")
    val dev = Quality.benfordAudit(conf, "x")
      .agg(sum("dev_micro")).head().getLong(0)
    assert(dev < 30000L, s"log-uniform data must be near-Benford, got $dev")
    // empty input: no rows (n = 0 guard)
    assert(Quality.benfordAudit(df.filter(col("x") < 0 && col("x") > 0),
      "x").isEmpty)
  }

  test("checkConstraints: null predicate is a violation, all checks one pass") {
    val df = Seq[(java.lang.Double, String)](
      (1.0, "A"), (99.0, "N"), (null, "R"), (5.0, null))
      .toDF("q", "f")
    val r = Quality.checkConstraints(df, Seq(
        "q_range" -> col("q").between(1.0, 50.0),
        "f_valid" -> col("f").isin("A", "N", "R")))
      .orderBy("check").collect()
    assert(r.map(x => x.getString(0) -> x.getLong(1)).toMap ===
      Map("f_valid" -> 1L, "q_range" -> 2L)) // null q AND 99.0 violate
    assert(r.forall(x => x.getBoolean(2) === (x.getLong(1) == 0L)))
    // empty input: zero violations, pass = true
    val empty = Quality.checkConstraints(df.filter(lit(false)),
      Seq("any" -> col("q").isNotNull)).collect()
    assert(empty.head.getLong(1) === 0L && empty.head.getBoolean(2))
  }

  test("uniqueness + referential violations count exactly") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("k")
    val parent = Seq(1L, 2L).toDF("p")
    val fk = Quality.referentialViolations(child, "k", parent, "p").head()
    assert(fk.getLong(0) === 1L) // only 9L orphans; null excluded
    val uq = Quality.uniquenessViolations(
      Seq(1L, 1L, 1L, 2L, 3L).toDF("k"), Seq("k")).head()
    assert(uq.getLong(0) === 2L && uq.getLong(1) === 1L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly; null-safe") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"),
      (4L, null: String)).toDF("id", "t")
    val b = Seq((2L, "y"), (3L, "z2"), (4L, null: String),
      (5L, "new")).toDF("id", "t")
    val r = Quality.snapshotDiff(a, b, "id", "t").head()
    assert(r.getLong(0) === 1L, "added: id 5")
    assert(r.getLong(1) === 1L, "removed: id 1")
    assert(r.getLong(2) === 1L, "changed: id 3")
    // id 2 (same text) and id 4 (null == null payload) are unchanged —
    // a null payload must NOT read as a missing row
    assert(r.getLong(3) === 2L, "unchanged: ids 2 and 4")
  }

  test("constraint suite and profile are ONE scan each (no per-check rescans)") {
    val docs = Tables.table(spark, TestSpark.sfDir, "lineitem")
    val suite = Quality.checkConstraints(docs, Seq(
      "a" -> (col("l_quantity") > 0.0),
      "b" -> (col("l_discount") <= 0.05),
      "c" -> col("l_returnflag").isNotNull))
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans(suite) === 1, "a union-of-selects would rescan per check")
    val prof = Quality.profileNumeric(docs, Seq("l_quantity", "l_discount", "l_tax"))
    assert(scans(prof) === 1, "profile must not rescan per column")
  }

  test("scd2: every interval class, two folds, null payload is a value") {
    def snap(rows: Seq[(Long, String)]) = rows.toDF("id", "text")
    // v1: ids 1..4; v2: 1 unchanged, 2 changed, 3 removed, 5 added
    val h1 = Quality.scd2Init(snap(Seq(1L -> "a", 2L -> "b", 3L -> "c",
      4L -> "d")), "id", "text", version = 1L)
    val h2 = Quality.scd2Apply(h1, snap(Seq(1L -> "a", 2L -> "b2",
      4L -> "d", 5L -> "e")), "id", "text", version = 2L)
    def rows(h: org.apache.spark.sql.DataFrame) =
      h.orderBy("id", "valid_from").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    assert(rows(h2) === Seq(
      (1L, "a", 1L, -1L, true),
      (2L, "b", 1L, 2L, false), (2L, "b2", 2L, -1L, true),
      (3L, "c", 1L, 2L, false),
      (4L, "d", 1L, -1L, true),
      (5L, "e", 2L, -1L, true)))
    // second fold: a re-opened id changes AGAIN; a removed id returns
    val h3 = Quality.scd2Apply(h2, snap(Seq(1L -> "a", 2L -> "b3",
      3L -> "c", 4L -> "d", 5L -> "e")), "id", "text", version = 5L)
    assert(rows(h3) === Seq(
      (1L, "a", 1L, -1L, true),
      (2L, "b", 1L, 2L, false), (2L, "b2", 2L, 5L, false),
        (2L, "b3", 5L, -1L, true),
      (3L, "c", 1L, 2L, false), (3L, "c", 5L, -1L, true),
      (4L, "d", 1L, -1L, true),
      (5L, "e", 2L, -1L, true)))
    // null payload is a VALUE: null -> "x" is a change, null -> null is not
    val n1 = Quality.scd2Init(
      Seq[(Long, String)](1L -> null, 2L -> null).toDF("id", "text"),
      "id", "text", version = 1L)
    val n2 = Quality.scd2Apply(n1,
      Seq[(Long, String)](1L -> "x", 2L -> null).toDF("id", "text"),
      "id", "text", version = 2L)
    assert(rows(n2) === Seq(
      (1L, null, 1L, 2L, false), (1L, "x", 2L, -1L, true),
      (2L, null, 1L, -1L, true)))
    // duplicate snapshot ids fork a timeline -> loud
    assert(intercept[IllegalArgumentException] {
      Quality.scd2Apply(h3, snap(Seq(1L -> "a", 1L -> "a2")), "id", "text", 6L)
    }.getMessage.contains("duplicate id"))
    // out-of-order version -> loud (interval would end before it starts)
    val err = intercept[Exception] {
      Quality.scd2Apply(h3, snap(Seq(2L -> "b4")), "id", "text", 5L).collect()
    }
    assert(err.getMessage.contains("not after"), s"got: ${err.getMessage}")
    // as-of reads: each version's slice reproduces that snapshot exactly
    def asOf(v: Long) = Quality.scd2AsOf(h3, v).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(asOf(1L) === Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    assert(asOf(2L) === Seq(1L -> "a", 2L -> "b2", 4L -> "d", 5L -> "e"))
    assert(asOf(3L) === asOf(2L), "between versions = latest fold before")
    assert(asOf(5L) === Seq(1L -> "a", 2L -> "b3", 3L -> "c", 4L -> "d",
      5L -> "e"))
    assert(asOf(0L).isEmpty, "before the first version nothing is valid")
  }

  test("k-anonymity: audit histogram exact; suppression drops small classes") {
    // classes: (a,x)x3, (a,y)x2, (b,x)x1, (null,x)x2 — null QI is a VALUE
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "x"),
      (4L, "a", "y"), (5L, "a", "y"),
      (6L, "b", "x"),
      (7L, null, "x"), (8L, null, "x")
    ).toDF("id", "qi1", "qi2")
    val audit = Quality.kAnonymityAudit(df, Seq("qi1", "qi2"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(audit === Seq((1L, 1L, 1L), (2L, 2L, 4L), (3L, 1L, 3L)))
    // suppression at kMin=2: the singleton (b,x) row disappears, every
    // survivor carries its class size
    val kept = Quality.kAnonymitySuppress(df, Seq("qi1", "qi2"), kMin = 2)
      .select("id", "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 2L, 5L -> 2L,
      7L -> 2L, 8L -> 2L))
    // kMin=1 keeps everything; empty QI list is loud
    assert(Quality.kAnonymitySuppress(df, Seq("qi1"), 1).count() === 8L)
    assert(intercept[IllegalArgumentException] {
      Quality.kAnonymityAudit(df, Seq.empty)
    }.getMessage.contains("quasi-identifier"))
  }

  test("l-diversity: homogeneity caught, suppression carries l, nulls ignored") {
    // class A: 4 rows, ONE sensitive value (k-safe, l-unsafe — the
    // homogeneity attack row); class B: 3 rows, 3 values; class C has
    // a null sensitive value that must NOT count toward l
    val df = Seq(
      ("A", "s1"), ("A", "s1"), ("A", "s1"), ("A", "s1"),
      ("B", "s1"), ("B", "s2"), ("B", "s3"),
      ("C", "s1"), ("C", null)
    ).toDF("qi", "sens")
    val audit = Quality.lDiversityAudit(df, Seq("qi"), "sens")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit === Map(1L -> ((2L, 6L)), 3L -> ((1L, 3L))),
      s"audit histogram wrong: $audit")
    val kept = Quality.lDiversitySuppress(df, Seq("qi"), "sens", lMin = 2)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(kept.forall(_._1 == "B") && kept.length === 3 &&
      kept.forall(_._2 === 3L),
      s"only the 3-diverse class may survive lMin=2: ${kept.toSeq}")
    // sensitive column may not double as a QI
    assert(intercept[IllegalArgumentException] {
      Quality.lDiversityAudit(df, Seq("sens"), "sens")
    }.getMessage.contains("quasi-identifier"))
  }

  test("dpNoisySum: one actor's rows perturb the release by at most Δ") {
    // clampHi=100, maxPerActor=2 -> Δ=200. Identical seed means the
    // per-key noise cancels in the difference, so |release(spiked) −
    // release(base)| per key is EXACTLY the clamped-bounded
    // contribution of the extra actor — which must be <= Δ no matter
    // how many or how huge the actor's raw rows are.
    val base = Seq(("A", 1L, 40L), ("A", 1L, 60L), ("A", 2L, 80L),
      ("B", 3L, 10L), ("B", 4L, 990L)).toDF("k", "actor", "v")
    val spike = Seq(("A", 99L, 1000000L), ("A", 99L, 500000L),
      ("A", 99L, 250000L), ("A", 99L, 125000L)).toDF("k", "actor", "v")
    def release(df: org.apache.spark.sql.DataFrame) =
      Quality.dpNoisySum(df, Seq("k"), "actor", "v",
          clampLo = 0L, clampHi = 100L, maxPerActor = 2,
          epsilon = 0.5, seed = 5L)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val b = release(base)
    val s = release(base.unionByName(spike))
    assert(math.abs(s("A") - b("A")) <= 200L,
      s"actor influence ${s("A") - b("A")} exceeds sensitivity 200")
    assert(s("B") === b("B"), "untouched key must release identically")
    // clamping caps each kept value: 4 huge rows -> 2 kept at 100 each
    assert(s("A") - b("A") === 200L)
    // deterministic under repartition; mean clamps at zero operands
    val all = Quality.dpNoisySum(base.repartition(7), Seq("k"), "actor", "v",
      0L, 100L, 2, 0.5, 5L).collect()
    assert(all.map(r => r.getString(0) -> r.getLong(3)).toMap === b)
    all.foreach { r =>
      assert(r.getLong(4) >= 0L, "n_noisy must clamp at zero")
      assert(r.getLong(5) >= 0L, "mean_micro must stay non-negative")
    }
    // degenerate clamp range refused (release would be exact)
    assert(intercept[IllegalArgumentException] {
      Quality.dpNoisySum(base, Seq("k"), "actor", "v", 0L, 0L, 2, 0.5, 5L)
    }.getMessage.contains("sensitivity"))
  }

  test("dpNoisyCounts: inverse-CDF noise replays from the seed, clamps at zero") {
    val df = Seq(("en", "a"), ("en", "a"), ("en", "a"), ("fr", "b"),
      ("fr", "b"), ("zh", "c")).toDF("lang", "source")
    val got = Quality.dpNoisyCounts(df, Seq("lang", "source"),
        epsilon = 0.5, seed = 7L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // replay the mechanism in plain JVM arithmetic
    val P = 1000000007L
    def poly(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, b) => (a * 1000003L + b) % P)
    def portable(h: Long, seed: Long): Long = {
      val h1 = ((h + seed) % P + P) % P
      val h2 = (h1 * h1 % P * 1000003L + 54321L) % P
      h2 * h2 % P
    }
    def expected(lang: String, source: String, n: Long): (Long, Long, Long) = {
      val hh = poly(lang + "" + source)
      val u = (portable(hh, 7L) % P + 1).toDouble / (P + 1).toDouble
      val mag = math.floor(math.log(u) / -0.5).toLong
      val sign = if (portable(hh, 8L) % 2 == 0) 1L else -1L
      val noise = sign * mag
      (n, noise, math.max(0L, n + noise))
    }
    assert(got(("en", "a")) === expected("en", "a", 3L))
    assert(got(("fr", "b")) === expected("fr", "b", 2L))
    assert(got(("zh", "c")) === expected("zh", "c", 1L))
    // clamping: released counts can never go negative
    assert(got.values.forall(_._3 >= 0L))
    // deterministic under repartitioning; different seed → different release
    val again = Quality.dpNoisyCounts(df.repartition(5),
        Seq("lang", "source"), 0.5, 7L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(again === got)
    val other = Quality.dpNoisyCounts(df, Seq("lang", "source"), 0.5, 99L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(other !== got.map { case (k, v) => k -> v._2 },
      "a different seed must move the noise somewhere")
    assert(intercept[IllegalArgumentException] {
      Quality.dpNoisyCounts(df, Seq.empty, 0.5, 7L)
    }.getMessage.contains("key columns"))
  }

  test("DP budget ledger: cumulative spend, loud exhaustion, idempotent replay, per-table isolation") {
    val ledger = "dpl_spec"
    graft.operators.Bucketing.dropTableAndLocation(spark, ledger)
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 1L, 30L))
      .toDF("k", "actor", "v")
    val cap = 1000000L // ε = 1.0 in micro units
    // two releases through the budgeted wrappers: 400000µ + 300000µ
    Quality.dpNoisyCountsBudgeted(df, Seq("k"), epsilon = 0.4, seed = 1L,
      ledger, "t1", "rel1", cap).collect()
    Quality.dpNoisySumBudgeted(df, Seq("k"), "actor", "v", 0L, 100L, 2,
      epsilon = 0.3, seed = 2L, ledger, "t1", "rel2", cap).collect()
    val card = Quality.dpLedgerCard(spark, ledger)
      .orderBy("seq").collect()
    assert(card.map(_.getAs[Long]("eps_micro")).toSeq
      === Seq(400000L, 300000L))
    assert(card.last.getAs[Long]("cum_eps_micro") === 700000L)
    assert(card.last.getAs[Long]("delta") === 200L) // 2 · max(|0|,|100|)
    // exhaustion: 700000 + 500000 > cap refuses LOUDLY, spends nothing
    val ex = intercept[IllegalArgumentException] {
      Quality.dpLedgerSpend(spark, ledger, "t1", "rel3", "counts",
        epsilon = 0.5, delta = 1L, epsCapMicro = cap)
    }
    assert(ex.getMessage.contains("budget is exhausted"))
    assert(spark.table(ledger).count() === 2L)
    // exactly-at-cap admits (integer arithmetic: 700000 + 300000 == cap)
    Quality.dpLedgerSpend(spark, ledger, "t1", "rel4", "counts",
      epsilon = 0.3, delta = 1L, epsCapMicro = cap)
    assert(spark.table(ledger).count() === 3L)
    // replaying an admitted release id is a no-op, never double-charges
    Quality.dpLedgerSpend(spark, ledger, "t1", "rel1", "counts",
      epsilon = 0.4, delta = 1L, epsCapMicro = cap)
    assert(spark.table(ledger).count() === 3L)
    // a DIFFERENT table spends from its own budget
    Quality.dpLedgerSpend(spark, ledger, "t2", "rel1", "counts",
      epsilon = 0.9, delta = 1L, epsCapMicro = cap)
    val cum = Quality.dpLedgerCard(spark, ledger)
      .groupBy("table_id").agg(max("cum_eps_micro").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cum === Map("t1" -> 1000000L, "t2" -> 900000L))
    graft.operators.Bucketing.dropTableAndLocation(spark, ledger)
  }

  test("DP ledger survives a stale location left by a previous session") {
    // an in-memory catalog forgets the table between sessions but the
    // warehouse directory survives — the first spend of a new session
    // must clear it instead of tripping LOCATION_ALREADY_EXISTS
    val ledger = "dpl_stale"
    graft.operators.Bucketing.dropTableAndLocation(spark, ledger)
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      .getPath
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(wh, ledger))
    Quality.dpLedgerSpend(spark, ledger, "t", "r1", "counts",
      epsilon = 0.5, delta = 1L, epsCapMicro = 1000000L)
    assert(spark.table(ledger).count() === 1L)
    graft.operators.Bucketing.dropTableAndLocation(spark, ledger)
  }

  test("t-closeness: skew in exact micro-units; null QI is a class, null sensitive excluded") {
    // global (nulls excluded): s1=6, s2=2, s3=2, N=10
    //   A (n=4, p=(3,1,0)/4):      Σ|c·N−g·n| = 6+2+8  = 16 → 16/80 = 0.20
    //   B (n=4, p=(1,1,2)/4):      Σ       = 14+2+12 = 28 → 28/80 = 0.35
    //   null QI (n=2, p=(2,0,0)/2): Σ       = 8+4+4   = 16 → 16/40 = 0.40
    val df = Seq(
      ("A", "s1"), ("A", "s1"), ("A", "s1"), ("A", "s2"), ("A", null),
      ("B", "s1"), ("B", "s2"), ("B", "s3"), ("B", "s3"),
      (null, "s1"), (null, "s1")
    ).toDF("qi", "sens")
    val audit = Quality.tClosenessAudit(df, Seq("qi"), "sens")
      .collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(audit === Map(Some("A") -> ((4L, 200000L)),
      Some("B") -> ((4L, 350000L)), None -> ((2L, 400000L))),
      s"audit card wrong: $audit")
    // suppression at tMax=0.2: only class A survives; its null-sens
    // row is kept too (distance is a CLASS property), carrying t_micro
    val kept = Quality.tClosenessSuppress(df, Seq("qi"), "sens",
        tMaxMicro = 200000L)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(kept.length === 5 && kept.forall(_._1 == "A") &&
      kept.forall(_._2 === 200000L),
      s"only class A may survive tMax=0.2: ${kept.toSeq}")
    // a uniform corpus is distance zero everywhere
    val uniform = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("qi", "sens")
    val zero = Quality.tClosenessAudit(uniform, Seq("qi"), "sens").collect()
    assert(zero.forall(_.getLong(2) === 0L))
    assert(intercept[IllegalArgumentException] {
      Quality.tClosenessAudit(df, Seq("sens"), "sens")
    }.getMessage.contains("quasi-identifier"))
  }
}
