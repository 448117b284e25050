package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
// DataFrame appears in gateSet's signature
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bucketing, EditIndex}

class EditIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cleanup(prefix: String): Unit =
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .foreach(Bucketing.dropTableAndLocation(spark, _))

  private def gateSet(prefix: String, delta: DataFrame): Set[(Long, Long, Long)] =
    EditIndex.gateEditMatches(spark, prefix, delta, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  for (strat <- Seq("deletion", "qgram")) {
    test(s"[$strat] gate == brute-force cross truth on real customer names") {
      cleanup("edg")
      val cust = Tables.table(spark, "/root/testdata/sf0.001", "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("s"))
      val corp = cust.filter(col("id") % 5 =!= 0)
      val delta = cust.filter(col("id") % 5 === 0)
      EditIndex.buildEditIndex(corp, "id", "s", "edg", maxDist = 1, q = 3,
        strategy = strat)
      val truth = delta.select(col("id").as("delta_id"), col("s").as("ds"))
        .join(corp.select(col("id").as("index_id"), col("s").as("cs")),
          levenshtein(col("ds"), col("cs")) <= 1)
        .withColumn("dist", levenshtein(col("ds"), col("cs")).cast("long"))
        .select("delta_id", "index_id", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gateSet("edg", delta) === truth)
      assert(truth.nonEmpty, "fixture must exercise real matches")
      cleanup("edg")
    }

    test(s"[$strat] append ≡ rebuild: gate answers identical after an O(delta) fold") {
      cleanup("eda")
      cleanup("edb")
      val cust = Tables.table(spark, "/root/testdata/sf0.001", "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("s"))
      val corp = cust.filter(col("id") % 5 =!= 0)
      val delta = cust.filter(col("id") % 5 === 0)
      EditIndex.buildEditIndex(corp, "id", "s", "eda", maxDist = 1, q = 3,
        strategy = strat)
      EditIndex.buildEditIndex(corp.filter(col("id") % 4 =!= 1), "id", "s",
        "edb", maxDist = 1, q = 3, strategy = strat)
      EditIndex.appendToEditIndex(spark, "edb",
        corp.filter(col("id") % 4 === 1), "id", "s")
      assert(gateSet("edb", delta) === gateSet("eda", delta))
      // ledger lineage records the append
      assert(spark.table("edb_stats").head().getAs[String]("lineage")
        .contains("+"))
      cleanup("eda")
      cleanup("edb")
    }
  }

  test("a batch sharing no key with the index never reads postings or strings") {
    cleanup("edn")
    val corp = Seq((1L, "aaaa bbbb"), (2L, "cccc dddd")).toDF("id", "s")
    EditIndex.buildEditIndex(corp, "id", "s", "edn", maxDist = 1, q = 3)
    // drop the postings AND strings tables: if the gate touched
    // either for an all-novel batch the query would fail loudly
    Bucketing.dropTableAndLocation(spark, "edn_dels")
    Bucketing.dropTableAndLocation(spark, "edn_strs")
    val novel = Seq((10L, "xxxx yyyy zzzz")).toDF("id", "s")
    assert(EditIndex.gateEditMatches(spark, "edn", novel, "id", "s").isEmpty)
  }

  test("[qgram] degenerate probe strings take the exact length-band fallback") {
    cleanup("eds")
    val corp = Seq((1L, "ab"), (2L, "xy"), (3L, "abcdefgh"), (4L, "b"))
      .toDF("id", "s")
    EditIndex.buildEditIndex(corp, "id", "s", "eds", maxDist = 1, q = 3,
      strategy = "qgram")
    // probe "ab" (1 distinct gram < q*d+1): within distance 1 of
    // index "ab"(0) and "b"(1); not "xy"(2) or the long string
    val got = gateSet("eds", Seq((10L, "ab")).toDF("id", "s"))
    assert(got === Set((10L, 1L, 0L), (10L, 4L, 1L)))
  }

  test("[deletion] short strings need no fallback: complete at every length") {
    cleanup("edd")
    val corp = Seq((1L, "ab"), (2L, "xy"), (3L, "abcdefgh"), (4L, "b"),
      (5L, "")).toDF("id", "s")
    EditIndex.buildEditIndex(corp, "id", "s", "edd", maxDist = 1, q = 3,
      strategy = "deletion")
    val got = gateSet("edd", Seq((10L, "ab"), (11L, "")).toDF("id", "s"))
    // "ab": matches "ab"(0), "b"(1); "": matches ""(0), "b"(1)
    assert(got === Set((10L, 1L, 0L), (10L, 4L, 1L),
      (11L, 5L, 0L), (11L, 4L, 1L)))
  }

  test("[deletion] maxDist=2 gate == brute-force cross truth (two-deletion variants)") {
    cleanup("ed2")
    val cust = Tables.table(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val corp = cust.filter(col("id") % 5 =!= 0)
    val delta = cust.filter(col("id") % 5 === 0)
    EditIndex.buildEditIndex(corp, "id", "s", "ed2", maxDist = 2, q = 3,
      strategy = "deletion")
    val truth = delta.select(col("id").as("delta_id"), col("s").as("ds"))
      .join(corp.select(col("id").as("index_id"), col("s").as("cs")),
        levenshtein(col("ds"), col("cs")) <= 2)
      .withColumn("dist", levenshtein(col("ds"), col("cs")).cast("long"))
      .select("delta_id", "index_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gateSet("ed2", delta) === truth)
    // d=2 must find strictly more than d=1 on this fixture
    assert(truth.exists(_._3 === 2L), "fixture must exercise dist-2 matches")
    cleanup("ed2")
  }

  test("[deletion] FastSS-pruned index (prefixLen persisted): gate and append == brute truth") {
    cleanup("edp")
    cleanup("edpa")
    // entropy-trailing names -> the documented remedy: reverse(s)
    // (levenshtein is reversal-invariant); prune variants to the
    // first 12 chars of the reversed string. prefixLen rides in
    // stats, so the gate's probe keys band exactly like the build.
    val cust = Tables.table(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("id"), reverse(col("c_name")).as("s"))
    val corp = cust.filter(col("id") % 5 =!= 0)
    val delta = cust.filter(col("id") % 5 === 0)
    EditIndex.buildEditIndex(corp, "id", "s", "edp", maxDist = 2,
      strategy = "deletion", prefixLen = 12)
    assert(spark.table("edp_stats").head().getAs[Int]("del_prefix_len")
      === 12)
    val truth = delta.select(col("id").as("delta_id"), col("s").as("ds"))
      .join(corp.select(col("id").as("index_id"), col("s").as("cs")),
        levenshtein(col("ds"), col("cs")) <= 2)
      .withColumn("dist", levenshtein(col("ds"), col("cs")).cast("long"))
      .select("delta_id", "index_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gateSet("edp", delta) === truth)
    assert(truth.nonEmpty)
    // append inherits the persisted prefixLen: fold ≡ rebuild
    EditIndex.buildEditIndex(corp.filter(col("id") % 4 =!= 1), "id", "s",
      "edpa", maxDist = 2, strategy = "deletion", prefixLen = 12)
    EditIndex.appendToEditIndex(spark, "edpa",
      corp.filter(col("id") % 4 === 1), "id", "s")
    assert(gateSet("edpa", delta) === truth)
    cleanup("edp")
    cleanup("edpa")
  }

  test("torn intent marker refuses gate and append loudly") {
    cleanup("edt")
    val corp = Seq((1L, "hello world")).toDF("id", "s")
    EditIndex.buildEditIndex(corp, "id", "s", "edt", maxDist = 1, q = 3)
    spark.range(1).select(lit("torn").as("entry"), lit(1L).as("n_strs_before"))
      .write.mode("overwrite").saveAsTable("edt_intent")
    val probe = Seq((2L, "hello wurld")).toDF("id", "s")
    assertThrows[IllegalArgumentException] {
      EditIndex.gateEditMatches(spark, "edt", probe, "id", "s")
    }
    assertThrows[IllegalArgumentException] {
      EditIndex.appendToEditIndex(spark, "edt", probe, "id", "s")
    }
  }

  test("re-submitted record id refused; empty delta refused") {
    cleanup("edr")
    val corp = Seq((1L, "hello world"), (2L, "other name")).toDF("id", "s")
    EditIndex.buildEditIndex(corp, "id", "s", "edr", maxDist = 1, q = 3)
    assertThrows[IllegalArgumentException] {
      EditIndex.appendToEditIndex(spark, "edr",
        Seq((1L, "different text")).toDF("id", "s"), "id", "s")
    }
    assertThrows[IllegalArgumentException] {
      EditIndex.appendToEditIndex(spark, "edr",
        corp.filter(lit(false)), "id", "s")
    }
  }

  test("non-numeric or null id raises loudly instead of null-casting") {
    cleanup("edx")
    def chainContains(t: Throwable, s: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(x => Option(x.getMessage).exists(_.contains(s)))
    val bad = Seq(("not-a-number", "hello")).toDF("id", "s")
    val ex = intercept[Exception] {
      EditIndex.buildEditIndex(bad, "id", "s", "edx", maxDist = 1, q = 3)
    }
    assert(chainContains(ex, "not castable to LONG"))
    val nul = Seq((null.asInstanceOf[java.lang.Long], "hello"))
      .toDF("id", "s")
    val ex2 = intercept[Exception] {
      EditIndex.buildEditIndex(nul, "id", "s", "edx", maxDist = 1, q = 3)
    }
    assert(chainContains(ex2, "not castable to LONG"))
    cleanup("edx")
  }
}
