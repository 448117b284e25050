package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bucketing, DedupIndex}

class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cleanup(prefix: String): Unit =
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .foreach(Bucketing.dropTableAndLocation(spark, _))

  test("gate classifies in-index dups, in-batch dups and new docs exactly") {
    cleanup("ddg")
    val base = Seq((10L, "alpha"), (11L, "beta"), (12L, "alpha"))
      .toDF("doc_id", "text") // "alpha" kept at id 10 inside the base
    DedupIndex.buildDedupIndex(base, "doc_id", "text", "ddg")
    assert(spark.table("ddg_fps").count() === 2) // base deduped internally
    val delta = Seq(
      (20L, "alpha"),  // in-index dup -> dup_of the BASE keeper 10
      (21L, "gamma"),  // new
      (22L, "gamma"),  // in-batch dup -> dup_of the delta's first, 21
      (23L, "delta")   // new
    ).toDF("doc_id", "text")
    val got = DedupIndex.gateNewDocs(spark, "ddg", delta, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(got === Seq((20L, true, 10L), (21L, false, -1L),
      (22L, true, 21L), (23L, false, -1L)))
    // append only the survivors; the index then refuses re-submission
    val survivors = delta.filter(col("doc_id").isin(21L, 23L))
    DedupIndex.appendToDedupIndex(spark, "ddg", survivors, "doc_id", "text")
    assert(spark.table("ddg_fps").count() === 4)
    assert(intercept[IllegalArgumentException] {
      DedupIndex.appendToDedupIndex(spark, "ddg",
        Seq((30L, "gamma")).toDF("doc_id", "text"), "doc_id", "text")
    }.getMessage.contains("re-submits"))
    // empty delta and torn intent are loud (the shared discipline)
    assert(intercept[IllegalArgumentException] {
      DedupIndex.appendToDedupIndex(spark, "ddg",
        delta.filter(col("doc_id") < 0), "doc_id", "text")
    }.getMessage.contains("delta is empty"))
    spark.range(1).selectExpr("'x' as entry", "0L as n_fps_before")
      .write.mode("overwrite").saveAsTable("ddg_intent")
    assert(intercept[IllegalArgumentException] {
      DedupIndex.gateNewDocs(spark, "ddg", delta, "doc_id", "text")
    }.getMessage.contains("intent marker"))
    cleanup("ddg")
  }

  test("an all-new batch never reads the fps table (digest-only gate)") {
    cleanup("ddn")
    DedupIndex.buildDedupIndex(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"),
      "doc_id", "text", "ddn")
    // drop the fps table: if the gate touched it for a batch the
    // digest clears, this would throw — the all-new fast path is a
    // BEHAVIORAL guarantee, not a plan nicety (at 100 TB the fps
    // table is the corpus-sized artifact; the digest is KBs)
    Bucketing.dropTableAndLocation(spark, "ddn_fps")
    val got = DedupIndex.gateNewDocs(spark, "ddn",
        Seq((9L, "brand-new text")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSeq
    assert(got === Seq((9L, false)))
    cleanup("ddn")
  }

  test("gated append equals arrival-order keep-first over base then delta") {
    val docs = Tables.table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(300).cache()
    docs.count()
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val dupArrivals = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val delta = docs.filter(col("doc_id") % 3 === 0).unionByName(dupArrivals)
    val prefix = DedupIndex.dedupAppendCached(base, delta, "doc_id", "text")
    val got = spark.table(s"${prefix}_fps")
      .select("text_md5", "keep_id").orderBy("text_md5").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // JVM replay of the arrival-order semantics
    val baseRows = base.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val deltaRows = delta.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bk = baseRows.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
    val dn = deltaRows.filterNot(r => bk.contains(r._2))
      .groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (bk ++ dn).toSeq.map { case (t, id) => (m(t), id) }
      .sortBy(_._1)
    assert(got === want, "appended index diverged from the arrival replay")
    // idempotent: a second cached call appends nothing
    val n1 = spark.table(s"${prefix}_fps").count()
    assert(DedupIndex.dedupAppendCached(base, delta, "doc_id", "text")
      === prefix)
    assert(spark.table(s"${prefix}_fps").count() === n1)
  }

  test("dirty-delta cached append is a ledger hit on the second call") {
    val docs = Tables.table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(60).cache()
    docs.count()
    val base = docs.filter(col("doc_id") % 2 === 0)
    // delta re-submits base texts under new ids AND brings new docs:
    // the appended survivors' fingerprint differs from the delta's, so
    // ledger idempotence must key on the DELTA fingerprint as a tag
    val delta = docs.filter(col("doc_id") % 2 === 1).unionByName(
      base.limit(5).select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    val prefix = DedupIndex.dedupAppendCached(base, delta, "doc_id", "text")
    val deltaFp = graft.operators.IndexStore.corpusFingerprint(
      delta, Seq("doc_id", "text"))
    assert(graft.operators.IvfIndex.lineageHasTag(spark, prefix, deltaFp),
      "the fold's ledger entry must be findable by the FULL delta's " +
        "fingerprint, or every retry silently re-gates")
    val lineage1 = spark.table(s"${prefix}_stats").head()
      .getAs[String]("lineage")
    assert(DedupIndex.dedupAppendCached(base, delta, "doc_id", "text")
      === prefix)
    assert(spark.table(s"${prefix}_stats").head().getAs[String]("lineage")
      === lineage1, "a ledger-hit retry must not write a second entry")
  }

  private def digestWords(table: String): Seq[(Long, Long)] =
    // the SEMANTIC digest: appended delta-word rows OR-fold per idx
    // (exactly what the index's own readDigest does)
    spark.table(table).groupBy(col("idx"))
      .agg(bit_or(col("word")).as("word")).orderBy("idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("append digest union == fresh-build digest (no resize crossed)") {
    cleanup("ddu"); cleanup("ddv")
    val base = spark.range(0, 50)
      .selectExpr("id as doc_id", "concat('text body ', id) as text")
    val delta = spark.range(50, 80)
      .selectExpr("id as doc_id", "concat('text body ', id) as text")
    DedupIndex.buildDedupIndex(base, "doc_id", "text", "ddu")
    DedupIndex.appendToDedupIndex(spark, "ddu", delta, "doc_id", "text")
    DedupIndex.buildDedupIndex(base.unionByName(delta), "doc_id", "text", "ddv")
    assert(spark.table("ddu_stats").head().getAs[Int]("digest_mbits")
      === spark.table("ddv_stats").head().getAs[Int]("digest_mbits"))
    assert(digestWords("ddu_fpdigest") === digestWords("ddv_fpdigest"),
      "O(delta) OR-union digest diverged from a full rebuild")
    cleanup("ddu"); cleanup("ddv")
  }

  test("append digest across a resize boundary == fresh-build digest") {
    cleanup("ddr"); cleanup("dds")
    // 16 bits/key: the floor 2^20 holds to 65536 keys; 61k base + 9k
    // delta crosses it, forcing the full-rebuild branch
    val base = spark.range(0, 61000)
      .selectExpr("id as doc_id", "concat('row ', id) as text")
    val delta = spark.range(61000, 70000)
      .selectExpr("id as doc_id", "concat('row ', id) as text")
    DedupIndex.buildDedupIndex(base, "doc_id", "text", "ddr")
    val before = spark.table("ddr_stats").head().getAs[Int]("digest_mbits")
    DedupIndex.appendToDedupIndex(spark, "ddr", delta, "doc_id", "text")
    val after = spark.table("ddr_stats").head().getAs[Int]("digest_mbits")
    assert(after === before * 2, s"expected a resize, got $before -> $after")
    DedupIndex.buildDedupIndex(base.unionByName(delta), "doc_id", "text", "dds")
    assert(digestWords("ddr_fpdigest") === digestWords("dds_fpdigest"),
      "resize-boundary rebuild diverged from a fresh build")
    cleanup("ddr"); cleanup("dds")
  }
}
