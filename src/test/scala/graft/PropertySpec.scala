package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.ColumnOps
import graft.operators.{Dedup, TextAnalysis}

/** Property-based tests mirroring the reference's hypothesis suites
  * (test_polars_requests.py:267-309, test_polars_utils.py:63-72):
  * schema preservation, row-count preservation, null handling —
  * driven by generated inputs rather than fixtures.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic generator sampling (scalatestplus bridge is not in
    * the offline cache; raw ScalaCheck with a fixed seed gives the
    * same property coverage reproducibly).
    */
  private def forAll[T](g: Gen[T], cases: Int = 8)(body: T => Unit): Unit =
    (0 until cases).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(" ")))
      .map(_.mkString(" ").take(200))

  test("fmt: output is null iff any argument is null") {
    forAll(Gen.listOfN(20, Gen.option(Gen.alphaNumStr.map(_.take(8))))) {
      vals =>
        val df = vals.toDF("v")
          .select(col("v"), ColumnOps.fmt("pre-{}-post", col("v")).as("f"))
        df.collect().foreach { r =>
          assert(r.isNullAt(1) === r.isNullAt(0))
          if (!r.isNullAt(1)) assert(r.getString(1) === s"pre-${r.getString(0)}-post")
        }
    }
  }

  test("extractFirst: null exactly when the pattern misses") {
    forAll(Gen.listOfN(20, Gen.alphaNumStr.map(_.take(10)))) { vals =>
      val df = vals.toDF("v")
        .select(col("v"), ColumnOps.extractFirst(col("v"), "(\\d+)").as("x"))
      df.collect().foreach { r =>
        val expected = "\\d+".r.findFirstIn(r.getString(0))
        assert(Option(r.getString(1)) === expected)
      }
    }
  }

  test("shingleHashes: row count preserved, every set non-empty for non-empty text") {
    forAll(Gen.listOfN(10, asciiText.retryUntil(_.trim.nonEmpty))) { texts =>
      val df = texts.toDF("t")
        .select(Dedup.shingleHashes(col("t"), 3).as("sh"))
      val rows = df.collect()
      assert(rows.length === texts.length)
      rows.foreach(r => assert(r.getSeq[Long](0).nonEmpty))
    }
  }

  test("simhash of identical text is identical; tokenCount >= 1") {
    forAll(asciiText.retryUntil(_.trim.nonEmpty)) { t =>
      val df = Seq(t, t).toDF("t").select(
        Dedup.simhash(col("t")).as("s"),
        TextAnalysis.tokenCount(col("t")).as("n"))
      val rows = df.collect()
      assert(rows(0).getLong(0) === rows(1).getLong(0))
      assert(rows(0).getInt(1) >= 1)
    }
  }

  test("sampleExact: n rows out for any n <= size, all distinct input rows") {
    forAll(Gen.chooseNum(1, 50)) { n =>
      val df = (1 to 50).toDF("v")
      val out = graft.operators.Frames.sampleExact(df, n, seed = 1L)
        .collect().map(_.getInt(0))
      assert(out.length === n && out.distinct.length === n)
    }
  }
}
