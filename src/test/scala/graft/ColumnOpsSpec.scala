package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ColumnOps._

class ColumnOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extractFirst returns null on no-match (Polars str.extract parity)") {
    val df = Seq("tt12345", "nope", "tt9").toDF("s")
      .select(extractFirst(col("s"), "tt(\\d+)").as("x"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("12345"), None, Some("9")))
  }

  test("fmt null-propagates like pl.format") {
    val df = Seq((Some("Q1"), Some(5)), (None, Some(5)), (Some("Q2"), None))
      .toDF("q", "n")
      .select(fmt("wd:{} v={}!", col("q"), col("n")).as("s"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("wd:Q1 v=5!"), None, None))
  }

  test("fmt rejects arg-count mismatch") {
    intercept[IllegalArgumentException] { fmt("{} {}", lit(1)) }
  }

  test("replaceFirst replaces only the first match (Polars str.replace parity)") {
    val df = Seq("aXbXc").toDF("s").select(replaceFirst(col("s"), "X", "_").as("r"))
    assert(df.head().getString(0) === "a_bXc")
  }

  test("replaceFirst finds the first match after a newline (DOTALL)") {
    val df = Seq("line1\nliXne2\nliXne3").toDF("s")
      .select(replaceFirst(col("s"), "X", "_").as("r"))
    assert(df.head().getString(0) === "line1\nli_ne2\nliXne3")
  }

  test("betweenLeft is closed-left open-right") {
    val df = Seq(9, 10, 19, 20).toDF("n")
      .select(betweenLeft(col("n"), lit(10), lit(20)).as("b"))
    assert(df.collect().map(_.getBoolean(0)).toSeq === Seq(false, true, true, false))
  }

  test("isUniqueOver marks singleton keys only (Polars is_unique)") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
      .withColumn("u", isUniqueOver(col("k")))
    assert(df.filter(col("u")).select("v").collect().map(_.getInt(0)).toSeq === Seq(3))
  }

  test("castLenient nulls on failure (strict=False parity under ANSI)") {
    spark.conf.set("spark.sql.ansi.enabled", "true")
    val df = Seq("12", "x").toDF("s").select(castLenient(col("s"), LongType).as("n"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq ===
      Seq(Some(12L), None))
  }

  test("listFirst null-safe on empty list (Polars list.first)") {
    val df = Seq(Seq("a", "b"), Seq.empty[String]).toDF("l")
      .select(listFirst(col("l")).as("f"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq === Seq(Some("a"), None))
  }

  test("strptimeDate parses ISO8601 with Z suffix, null on garbage") {
    val df = Seq("2023-01-02T03:04:05Z", "garbage").toDF("s")
      .select(strptimeDate(col("s")).cast(StringType).as("d"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("2023-01-02"), None))
  }

  test("nowLit is a literal truncated to seconds") {
    val v = Seq(1).toDF("x").select(nowLit().as("t")).head().getTimestamp(0)
    assert(v.getNanos === 0)
  }
}
