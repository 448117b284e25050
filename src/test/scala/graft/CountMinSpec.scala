package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CountMin
import graft.functions.SketchExpressions

class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L
  private def cells(tok: String, depth: Int, width: Int): Seq[(Int, Long)] = {
    val h1 = SketchExpressions.polyFold(tok, 1000003L)
    val h2 = (h1 * h1 % P * 1000003L + 54321L) % P
    (1 to depth).map(j => j -> (h1 + j.toLong * h2) % P % width)
  }

  private val docs = Seq(
    (1L, "alpha beta gamma alpha alpha"),
    (2L, "beta gamma delta epsilon zeta"),
    (3L, "eta theta iota kappa lambda mu nu xi omicron pi rho sigma"))

  test("counters and estimates match the independent JVM replay") {
    val (d, w) = (4, 64)
    val df = docs.toDF("doc_id", "text")
    // replay the counter grid from occurrences
    val occ = docs.flatMap(_._2.trim.split("\\s+"))
    val grid = occ.flatMap(cells(_, d, w)).groupBy(identity)
      .map { case (cell, g) => cell -> g.size.toLong }
    val gotCounters = CountMin.cmsCounters(df, "text", d, w)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCounters === grid)
    // every term's estimate = min over its cells
    val terms = occ.distinct
    val est = CountMin.cmsEstimate(CountMin.cmsCounters(df, "text", d, w),
        terms.toDF("term"), "term", d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      val expect = cells(t, d, w).map(c => grid.getOrElse(c, 0L)).min
      assert(est(t) === expect, s"term $t")
    }
  }

  test("CMS law: est >= exact everywhere; tiny width forces a strict over-estimate") {
    val (d, w) = (2, 16) // 17+ distinct terms in 16 columns: pigeonhole
    val df = docs.toDF("doc_id", "text")
    val occ = docs.flatMap(_._2.trim.split("\\s+"))
    val exact = occ.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val card = CountMin.heavyHittersCard(df, "text", d, w, topK = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(card.map(_._1).toSet === exact.keySet)
    card.foreach { case (t, ex, es) =>
      assert(ex === exact(t))
      assert(es >= ex, s"CMS must never under-count: $t $es < $ex")
    }
    assert(card.exists { case (_, ex, es) => es > ex },
      "16 columns over 17+ terms must collide somewhere")
  }

  test("absent terms estimate as collision mass, never negative or null") {
    val (d, w) = (4, 64)
    val df = docs.toDF("doc_id", "text")
    val est = CountMin.cmsEstimate(CountMin.cmsCounters(df, "text", d, w),
        Seq("neverseen", "alsounseen").toDF("term"), "term", d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size === 2 && est.values.forall(_ >= 0L))
  }

  test("guards fail loudly") {
    val df = docs.toDF("doc_id", "text")
    intercept[IllegalArgumentException] { CountMin.cmsCounters(df, "text", 0, 64) }
    intercept[IllegalArgumentException] { CountMin.cmsCounters(df, "text", 9, 64) }
    intercept[IllegalArgumentException] { CountMin.cmsCounters(df, "text", 4, 8) }
    intercept[IllegalArgumentException] {
      CountMin.heavyHittersCard(df, "text", 4, 64, topK = 0)
    }
  }

  test("grids merged over any corpus split equal the single-pass grid bit-for-bit") {
    val df = Tables.table(spark, TestSpark.sfDir, "documents").limit(300)
    val full = CountMin.cmsCounters(df, "text", 4, 256)
      .orderBy("j", "pos").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // two different splits — CMS add is associative/commutative, so
    // the fold must be split-invariant
    for (k <- Seq(2L, 7L)) {
      val merged = CountMin.mergeGrids(
          CountMin.cmsCounters(df.filter(col("doc_id") % k === 0), "text", 4, 256),
          CountMin.cmsCounters(df.filter(col("doc_id") % k =!= 0), "text", 4, 256))
        .orderBy("j", "pos").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      assert(merged.toSeq === full.toSeq, s"merge over %$k split diverged")
    }
    // merging an empty grid is the identity
    val empty = CountMin.cmsCounters(df.filter(lit(false)), "text", 4, 256)
    val id = CountMin.mergeGrids(CountMin.cmsCounters(df, "text", 4, 256), empty)
      .orderBy("j", "pos").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(id.toSeq === full.toSeq, "empty-grid merge is not the identity")
  }
}
