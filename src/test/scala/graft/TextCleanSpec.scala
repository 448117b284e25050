package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextClean}

class TextCleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cleaning pipeline strips markup, redacts PII, normalizes whitespace") {
    val df = Seq(
      "Contact <b>us</b> at  team@example.com   or call 5551234567.",
      "plain text stays",
      "tag<br>boundary",
      "short 12345 stays, 123456 goes",
      "ctrlchar gone"
    ).toDF("t").select(TextClean.cleaned(col("t")).as("c"))
    val rows = df.collect().map(_.getString(0))
    assert(rows(0) === "Contact us at <EMAIL> or call <NUM>.")
    assert(rows(1) === "plain text stays")
    assert(rows(2) === "tag boundary")
    assert(rows(3) === "short 12345 stays, <NUM> goes")
    assert(rows(4) === "ctrlchar gone")
  }

  test("shrinkRatio is null on empty, zero on clean text, positive on noisy") {
    val rows = Seq("", "clean", "<a><b><c>x</c></b></a>").toDF("t")
      .select(TextClean.shrinkRatio(col("t")).as("r")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) === 0.0)
    assert(rows(2).getDouble(0) > 0.5)
  }

  test("repetition signals flag duplicated lines and token spam") {
    val rows = Seq(
      "line one\nline two\nline one\nline three",
      "spam spam spam spam ham",
      "all distinct tokens here"
    ).toDF("t").select(
      graft.operators.TextAnalysis.dupLineFraction(col("t")).as("dl"),
      graft.operators.TextAnalysis.maxTokenFreqRatio(col("t")).as("mt"))
      .collect()
    assert(rows(0).getDouble(0) === 0.25)          // 1 dup of 4 lines
    assert(rows(1).getDouble(1) === 0.8)           // 4/5 spam
    assert(rows(2).getDouble(0) === 0.0)
    assert(rows(2).getDouble(1) === 0.25)          // 1/4
  }

  test("maxNgramFreqRatio flags repeated phrases") {
    val rows = Seq(
      "buy now buy now buy now buy now",
      "every bigram here is quite different truly"
    ).toDF("t").select(
      graft.operators.TextAnalysis.maxNgramFreqRatio(col("t"), 2).as("r")).collect()
    // "buy now"/"now buy" repeat heavily in the spam text
    assert(rows(0).getDouble(0) > 0.5)
    assert(rows(1).getDouble(0) < 0.2)
  }

  test("writePartitionedParquet prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/out"
    val docs = Tables.table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    graft.operators.Frames.writePartitionedParquet(docs, dir, Seq("lang"))
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    // partition pruning: the lang filter becomes a PartitionFilter, not a data filter
    val p = back.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$p")
  }

  test("minhashJaccardEstimate tracks exact jaccard within sketch error") {
    val docs = Tables.table(spark, TestSpark.sfDir, "documents")
    val sets = docs.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("sh"))
    val sigs = sets.withColumn("sig", Dedup.minhashSignature(col("sh"), 256))
    val pairs = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("exact"),
        Dedup.minhashJaccardEstimate(col("a.sig"), col("b.sig")).as("est"))
      .filter(col("exact") > 0.2)
      .limit(200).collect()
    assert(pairs.nonEmpty)
    // stderr at k=256 ≈ 0.031; allow 5 sigma
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.16,
        s"exact ${r.getDouble(0)} vs est ${r.getDouble(1)}")
    }
  }
}
