package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Kmv

class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 256

  // two groups over a shared universe: A = ids 0..3999,
  // B = ids 2000..7999 -> |A|=4000, |B|=6000, inter=2000, union=8000
  private lazy val corpus = {
    val a = (0 until 4000).map(i => ("A", s"term_$i"))
    val b = (2000 until 8000).map(i => ("B", s"term_$i"))
    (a ++ b).toDF("grp", "term")
  }

  test("sketch: exactly min(k, distinct) rows, ascending distinct hashes") {
    val sk = Kmv.kmvSketch(corpus, "grp", "term", K)
    val rows = sk.filter(col("grp") === "A").orderBy("rn").collect()
    assert(rows.length === K)
    val us = rows.map(_.getAs[Long]("u"))
    assert(us.toSeq === us.sorted.toSeq)
    assert(us.distinct.length === us.length)
    assert(rows.map(_.getAs[Long]("rn")).toSeq === (1 to K).map(_.toLong))
    // a tiny group is stored whole
    val tiny = Seq(("T", "x"), ("T", "y"), ("T", "x")).toDF("grp", "term")
    assert(Kmv.kmvSketch(tiny, "grp", "term", K).count() === 2L)
  }

  test("distinct estimates within 4/sqrt(k) relative error; exact below k") {
    val est = Kmv.kmvEstimates(Kmv.kmvSketch(corpus, "grp", "term", K), K)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("est")).toMap
    val tol = 4.0 / math.sqrt(K) // ~25%
    assert(math.abs(est("A") - 4000.0) / 4000.0 <= tol, s"est A = ${est("A")}")
    assert(math.abs(est("B") - 6000.0) / 6000.0 <= tol, s"est B = ${est("B")}")
    val small = (0 until 100).map(i => ("S", s"t$i")).toDF("grp", "term")
    val se = Kmv.kmvEstimates(Kmv.kmvSketch(small, "grp", "term", K), K)
      .collect().head
    assert(se.getAs[Long]("est") === 100L && se.getAs[Long]("m") === 100L)
  }

  test("overlap card: union/intersection/jaccard estimates vs exact") {
    val card = Kmv.overlapCard(corpus, "grp", "term", K).collect()
    assert(card.length === 1)
    val r = card.head
    assert(r.getAs[String]("src_a") === "A" && r.getAs[String]("src_b") === "B")
    assert(r.getAs[Long]("exact_a") === 4000L)
    assert(r.getAs[Long]("exact_b") === 6000L)
    assert(r.getAs[Long]("exact_union") === 8000L)
    assert(r.getAs[Long]("exact_inter") === 2000L)
    assert(r.getAs[Long]("exact_jacc_micro") === 250000L)
    assert(r.getAs[Long]("exact_a_minus_b") === 2000L)
    assert(r.getAs[Long]("exact_b_minus_a") === 4000L)
    val tol = 4.0 / math.sqrt(K)
    assert(math.abs(r.getAs[Long]("est_union") - 8000.0) / 8000.0 <= tol)
    // intersection/difference errors compound (theta from union,
    // membership from both sketches) — grant a looser band but
    // demand real signal
    assert(math.abs(r.getAs[Long]("est_inter") - 2000.0) / 2000.0 <= 2 * tol)
    assert(math.abs(r.getAs[Long]("est_a_minus_b") - 2000.0) / 2000.0 <= 2 * tol)
    assert(math.abs(r.getAs[Long]("est_b_minus_a") - 4000.0) / 4000.0 <= 2 * tol)
    assert(math.abs(r.getAs[Long]("jacc_micro") - 250000.0) / 250000.0 <= 2 * tol)
    // sketch-internal consistency: below-theta counters partition the
    // union sketch, so the three estimates re-add to the union
    assert(r.getAs[Long]("est_inter") + r.getAs[Long]("est_a_minus_b") +
      r.getAs[Long]("est_b_minus_a") <= r.getAs[Long]("est_union") + 3,
      "P/theta-scaled parts must not exceed the union estimate (+rounding)")
  }

  test("small groups: whole card degrades to exact") {
    val df = (Seq.tabulate(50)(i => ("X", s"t$i")) ++
      Seq.tabulate(60)(i => ("Y", s"t${i + 30}"))).toDF("grp", "term")
    val r = Kmv.overlapCard(df, "grp", "term", K).collect().head
    assert(r.getAs[Long]("est_a") === 50L)
    assert(r.getAs[Long]("est_b") === 60L)
    assert(r.getAs[Long]("est_union") === 90L)
    assert(r.getAs[Long]("est_inter") === 20L)
    assert(r.getAs[Long]("est_a_minus_b") === 30L)
    assert(r.getAs[Long]("est_b_minus_a") === 40L)
    assert(r.getAs[Long]("jacc_micro") === 20L * 1000000L / 90L)
    assert(r.getAs[Long]("exact_inter") === 20L)
    assert(r.getAs[Long]("exact_a_minus_b") === 30L)
    assert(r.getAs[Long]("exact_b_minus_a") === 40L)
  }

  test("disjoint groups: zero intersection both ways") {
    val df = (Seq.tabulate(30)(i => ("X", s"x$i")) ++
      Seq.tabulate(30)(i => ("Y", s"y$i"))).toDF("grp", "term")
    val r = Kmv.overlapCard(df, "grp", "term", K).collect().head
    assert(r.getAs[Long]("est_inter") === 0L)
    assert(r.getAs[Long]("jacc_micro") === 0L)
    assert(r.getAs[Long]("exact_inter") === 0L)
  }

  test("deterministic under repartition") {
    val a = Kmv.overlapCard(corpus.repartition(23), "grp", "term", K)
      .collect().head.toSeq
    val b = Kmv.overlapCard(corpus.coalesce(1), "grp", "term", K)
      .collect().head.toSeq
    assert(a === b)
  }
}
