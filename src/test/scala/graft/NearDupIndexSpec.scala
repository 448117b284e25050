package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bucketing, Dedup, NearDupIndex}

class NearDupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cleanup(prefix: String): Unit =
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .foreach(Bucketing.dropTableAndLocation(spark, _))

  private def docs = Tables.table(spark, TestSpark.sfDir, "documents")
    .select(col("doc_id"), col("text"))

  test("from-index gate equals the inline cross-pairs answer row-for-row") {
    val d = docs.limit(300).cache(); d.count()
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    val delta = d.filter(col("doc_id") % 5 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("delta_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val inline = rows(Dedup.minhashNearDupPairsCross(delta, corpus,
      "doc_id", "text", threshold = 0.5, portable = true))
    assert(inline.nonEmpty, "test slice produced no near-dup pairs")
    val prefix = NearDupIndex.nearDupIndexCached(corpus, "doc_id", "text",
      portable = true)
    val fromIdx = rows(NearDupIndex.gateNearDups(spark, prefix, delta,
      "doc_id", "text", threshold = 0.5))
    assert(fromIdx === inline, "index gate diverged from the inline cross")
    // cache hit serves the same prefix without a rebuild
    assert(NearDupIndex.nearDupIndexCached(corpus, "doc_id", "text",
      portable = true) === prefix)
  }

  test("append is invisible: gate over built+appended equals full rebuild") {
    val d = docs.limit(300).cache(); d.count()
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    val c1 = corpus.filter(col("doc_id") % 4 =!= 1)
    val c2 = corpus.filter(col("doc_id") % 4 === 1)
    val delta = d.filter(col("doc_id") % 5 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("delta_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val merged = NearDupIndex.nearDupAppendCached(c1, c2, "doc_id", "text",
      portable = true)
    val full = NearDupIndex.nearDupIndexCached(corpus, "doc_id", "text",
      portable = true)
    val a = rows(NearDupIndex.gateNearDups(spark, merged, delta,
      "doc_id", "text", threshold = 0.5))
    val b = rows(NearDupIndex.gateNearDups(spark, full, delta,
      "doc_id", "text", threshold = 0.5))
    assert(a.nonEmpty && a === b, "appended index diverged from the rebuild")
    // idempotent: the delta is in the lineage, a second call is a no-op
    val n1 = spark.table(s"${merged}_sets").count()
    assert(NearDupIndex.nearDupAppendCached(c1, c2, "doc_id", "text",
      portable = true) === merged)
    assert(spark.table(s"${merged}_sets").count() === n1)
    // re-submitting an indexed doc id is loud
    assert(intercept[IllegalArgumentException] {
      NearDupIndex.appendToNearDupIndex(spark, merged, c2.limit(1),
        "doc_id", "text")
    }.getMessage.contains("re-submits"))
  }

  test("all-new batch skips the index; empty delta and torn intent are loud") {
    cleanup("ndh")
    NearDupIndex.buildNearDupIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog today"))
        .toDF("doc_id", "text"),
      "doc_id", "text", "ndh", portable = true)
    // the all-new fast path is BEHAVIORAL: with the postings and sets
    // tables dropped, a batch whose buckets the digest has never seen
    // still gates (to zero pairs) — the index is never read
    Bucketing.dropTableAndLocation(spark, "ndh_buckets")
    Bucketing.dropTableAndLocation(spark, "ndh_sets")
    val got = NearDupIndex.gateNearDups(spark, "ndh",
      Seq((9L, "completely unrelated words about melon harvesting seasons"))
        .toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5)
    assert(got.count() === 0L)
    assert(intercept[IllegalArgumentException] {
      NearDupIndex.appendToNearDupIndex(spark, "ndh",
        docs.filter(col("doc_id") < 0), "doc_id", "text")
    }.getMessage.contains("delta is empty"))
    spark.range(1).selectExpr("'x' as entry", "0L as n_docs_before")
      .write.mode("overwrite").saveAsTable("ndh_intent")
    assert(intercept[IllegalArgumentException] {
      NearDupIndex.gateNearDups(spark, "ndh",
        Seq((9L, "z")).toDF("doc_id", "text"), "doc_id", "text", 0.5)
    }.getMessage.contains("intent marker"))
    cleanup("ndh")
  }
}
