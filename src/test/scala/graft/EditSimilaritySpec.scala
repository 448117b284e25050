package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EditSimilarity

class EditSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(df: DataFrame, maxDist: Int): Set[(Long, Long, Long)] = {
    val a = df.select(col("id").as("a_id"), col("s").as("a_s"))
    val b = df.select(col("id").as("b_id"), col("s").as("b_s"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_s"), col("b_s")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def joined(df: DataFrame, maxDist: Int, q: Int = 3,
                     strategy: String = "auto",
                     prefixLen: Int = 0): Set[(Long, Long, Long)] =
    EditSimilarity.editSimilarityJoin(df, "id", "s", maxDist, q, strategy,
        prefixLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // the adversarial panel: substitutions, inserts, deletes, repeats
  // (distinct-gram collapse), degenerate shorts, empty, unicode,
  // plus far-apart strings that must NOT pair
  private lazy val panel = Seq(
    1L -> "wikidata analytics engine",
    2L -> "wikidata analytics enginX",     // 1 sub of 1
    3L -> "wikidat analytics engine",      // 1 del of 1
    4L -> "wikidata aanalytics engine",    // 1 ins of 1
    5L -> "wikidata analytics",            // far from 1 (7 dels)
    6L -> "aaaaaaaaaaaaaaaa",              // 1 distinct gram
    7L -> "aaaaaaaaaaaaaaab",              // 1 sub of 6, 3 distinct grams
    8L -> "aaaaaaaaaaaaaab",               // 1 del of 7
    9L -> "ab",                            // shorter than q
    10L -> "ba",                           // 2 subs of 9
    11L -> "",                             // empty
    12L -> "b",                            // 1 ins of 11, 1 from 9? no: dist 1 to ""
    13L -> "café résumé",   // unicode
    14L -> "cafe résumé",        // 1 sub of 13
    15L -> "totally different string here"
  ).toDF("id", "s")

  for (strat <- Seq("deletion", "qgram")) {
    test(s"[$strat] == brute force on the adversarial panel, d=1") {
      assert(joined(panel, 1, strategy = strat) === brute(panel, 1))
    }

    test(s"[$strat] == brute force on the adversarial panel, d=2") {
      assert(joined(panel, 2, strategy = strat) === brute(panel, 2))
    }

    test(s"[$strat] no self-pairs, a_id < b_id, null strings dropped") {
      val df = Seq((1L, "abc"), (2L, "abc"), (3L, null))
        .toDF("id", "s")
      assert(joined(df, 1, strategy = strat) === Set((1L, 2L, 0L)))
    }

    test(s"[$strat] deterministic under repartition") {
      val r1 = joined(panel.repartition(13), 1, strategy = strat)
      val r2 = joined(panel.repartition(1), 1, strategy = strat)
      assert(r1 === r2)
    }

    test(s"[$strat] customer names at sf0.001: == brute force on real data") {
      val cust = Tables.table(spark, "/root/testdata/sf0.001", "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("s"))
      assert(joined(cust, 1, strategy = strat) === brute(cust, 1))
    }
  }

  test("== brute force at q=2 and q=4 (qgram completeness is q-independent)") {
    assert(joined(panel, 1, q = 2, strategy = "qgram") === brute(panel, 1))
    assert(joined(panel, 2, q = 4, strategy = "qgram") === brute(panel, 2))
  }

  test("maxDist=0 finds exactly the exact-duplicate pairs") {
    val df = Seq(1L -> "same", 2L -> "same", 3L -> "Same", 4L -> "same ")
      .toDF("id", "s")
    assert(joined(df, 0) === Set((1L, 2L, 0L)))
  }

  test("auto resolves to deletion at d<=2, qgram above; deletion refuses d>2") {
    assert(EditSimilarity.resolveStrategy("auto", 1) === "deletion")
    assert(EditSimilarity.resolveStrategy("auto", 2) === "deletion")
    assert(EditSimilarity.resolveStrategy("auto", 3) === "qgram")
    assertThrows[IllegalArgumentException] {
      EditSimilarity.resolveStrategy("deletion", 3)
    }
    assertThrows[IllegalArgumentException] {
      EditSimilarity.resolveStrategy("nonsense", 1)
    }
  }

  test("deletion variants: exact neighborhood, distinct, empty-safe") {
    val out = Seq(("abc", 0)).toDF("s", "z")
      .select(EditSimilarity.deletionVariants(col("s"), 1).as("v"))
      .head().getSeq[String](0).toSet
    assert(out === Set("abc", "bc", "ac", "ab"))
    val out2 = Seq(("abc", 0)).toDF("s", "z")
      .select(EditSimilarity.deletionVariants(col("s"), 2).as("v"))
      .head().getSeq[String](0).toSet
    assert(out2 === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    val empty = Seq(("", 0)).toDF("s", "z")
      .select(EditSimilarity.deletionVariants(col("s"), 2).as("v"))
      .head().getSeq[String](0).toSet
    assert(empty === Set(""))
    // repeats collapse via distinct
    val rep = Seq(("aaa", 0)).toDF("s", "z")
      .select(EditSimilarity.deletionVariants(col("s"), 1).as("v"))
      .head().getSeq[String](0).toSet
    assert(rep === Set("aaa", "aa"))
  }

  test("FastSS prefix pruning: == brute force at every prefixLen, d=1 and d=2") {
    // the truncation lemma says completeness holds at EVERY l — sweep
    // small l so the panel's edits land beyond, at, and inside the
    // prefix boundary (the adversarial cases for a pruned generator)
    for (pl <- Seq(3, 4, 7, 12); d <- Seq(1, 2)) {
      assert(joined(panel, d, strategy = "deletion", prefixLen = pl)
        === brute(panel, d), s"prefixLen=$pl d=$d diverged from brute force")
    }
  }

  test("FastSS prefix pruning on real data: customer names reversed, d=2") {
    // c_name carries its entropy in the trailing digits, so the
    // documented remedy applies: key on reverse(s) (levenshtein is
    // reversal-invariant — identical pairs and distances), prune to
    // the first 12 chars of the reversed string
    val cust = Tables.table(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("id"), reverse(col("c_name")).as("s"))
    assert(joined(cust, 2, strategy = "deletion", prefixLen = 12)
      === brute(cust, 2))
  }

  test("verify prefilter on == off == brute on panel and real names, both strategies") {
    // the L1 bound is a necessary condition: toggling it must never
    // change the pair set, only the verify-tier cost
    for (strat <- Seq("deletion", "qgram"); d <- Seq(1, 2)) {
      val off = EditSimilarity.editSimilarityJoin(panel, "id", "s", d,
          strategy = strat, verifyPrefilter = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val on = EditSimilarity.editSimilarityJoin(panel, "id", "s", d,
          strategy = strat, verifyPrefilter = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(on === off, s"[$strat d=$d] prefilter changed the pair set")
      assert(on === brute(panel, d), s"[$strat d=$d] diverged from brute")
    }
  }

  test("charCountSig: L1 bound holds (L1 <= 2·ed) on every panel pair") {
    // property check of the filter's soundness lemma over all pairs
    val sigs = panel.select(col("id"), col("s"),
        graft.functions.NativeFunctions.charCountSig(col("s")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def l1(a: Long, b: Long): Long =
      (0 until 16).map(k => math.abs(((a >>> (4 * k)) & 15L) -
        ((b >>> (4 * k)) & 15L))).sum
    def ed(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    for (Seq((_, sa, ga), (_, sb, gb)) <- sigs.toSeq.combinations(2))
      assert(l1(ga, gb) <= 2L * ed(sa, sb),
        s"L1 bound violated for '$sa' vs '$sb'")
  }

  test("prefix pruning cuts variant counts; degenerate prefixLen refused") {
    val n = Seq(("abcdefghijklmnopqr", 0)).toDF("s", "z")
    def count(pl: Int): Int = n
      .select(size(EditSimilarity.deletionVariants(col("s"), 2, pl)).as("c"))
      .head().getInt(0)
    assert(count(0) === 1 + 18 + 18 * 17 / 2) // 172 unpruned (distinct: all)
    assert(count(12) === 1 + 12 + 12 * 11 / 2) // 79: only prefix positions
    // a prefix the budget can fully delete would key everything to ""
    assertThrows[IllegalArgumentException] {
      n.select(EditSimilarity.deletionVariants(col("s"), 2, 2)).head()
    }
  }

  test("qgram path releases its internal cache deterministically") {
    val before = spark.sparkContext.getPersistentRDDs.size
    joined(panel, 1, strategy = "qgram")
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1,
      "gram-prefix cache must be unpersisted after materialization " +
        "(+1 allowed for the localCheckpoint result itself)")
  }
}
