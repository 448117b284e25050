package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bloom
import graft.functions.SketchExpressions

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L
  private val M = 1 << 12 // 4096 bits — small enough to stress FPs
  private val K = 4
  private val W = 3

  // independent JVM replay of the whole chain: tokens -> distinct
  // w-shingle poly hashes -> k positions
  private def shingleHashes(text: String): Seq[Long] = {
    val toks = text.trim.split("\\s+").toSeq
    val sh = if (toks.length < W) Seq(toks.mkString(" "))
      else toks.sliding(W).map(_.mkString(" ")).toSeq
    sh.map(s => SketchExpressions.polyFold(s, 1000003L)).distinct
  }

  private def positions(h: Long): Seq[Long] = {
    val h1 = ((h % P) + P) % P
    val h2 = (h1 * h1 % P * 1000003L + 54321L) % P
    (1 to K).map(i => (h1 + i.toLong * h2) % P % M)
  }

  private val refDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "sphinx of black quartz judge my vow"))
  private val corpusDocs = Seq(
    (10L, "the quick brown fox naps all day"),      // shares "the quick brown", "quick brown fox"
    (11L, "five dozen liquor jugs on the shelf"),   // shares "five dozen liquor", "dozen liquor jugs"
    (12L, "completely novel text about databases"), // clean
    (13L, "rows columns partitions shuffles sorts"))// clean

  test("build + card match the independent JVM replay, FPs and all") {
    val ref = refDocs.toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val words = Bloom.buildBloomWords(ref, "text", M, K, W)
    // replay the build
    val bits = scala.collection.mutable.Set.empty[Long]
    refDocs.foreach { case (_, t) =>
      shingleHashes(t).foreach(h => positions(h).foreach(bits += _)) }
    val expectWords = new Array[Long](M / 64)
    bits.foreach(p => expectWords((p >> 6).toInt) |= (1L << (p & 63)))
    assert(words.toSeq === expectWords.toSeq, "bit array diverges from replay")
    // replay the card
    val got = Bloom.contaminationCard(corpus, "doc_id", "text", words, M, K, W)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    corpusDocs.foreach { case (id, t) =>
      val sh = shingleHashes(t)
      val hits = sh.count(h => positions(h).forall(bits.contains))
      assert(got(id) === ((sh.length, hits, hits > 0)), s"doc $id diverges")
    }
  }

  test("no false negatives: every truly-overlapping doc is flagged at ANY sizing") {
    val ref = refDocs.toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    for (m <- Seq(64, 1 << 10, 1 << 15)) {
      val words = Bloom.buildBloomWords(ref, "text", m, K, W)
      val flagged = Bloom.contaminationCard(corpus, "doc_id", "text", words, m, K, W)
        .filter(col("contaminated")).select("id").collect().map(_.getLong(0)).toSet
      val refSh = refDocs.flatMap(d => shingleHashes(d._2)).toSet
      val truly = corpusDocs.filter(d => shingleHashes(d._2).exists(refSh)).map(_._1).toSet
      assert(truly.subsetOf(flagged), s"m=$m missed ${truly -- flagged}")
    }
  }

  test("bloomEval: n_missed structurally 0; undersized filter shows FPs") {
    val ref = refDocs.toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val mTiny = 64 // near-saturated: false positives virtually certain
    val tiny = Bloom.buildBloomWords(ref, "text", mTiny, K, W)
    // expected flags from the independent replay (mod mTiny positions)
    def posM(h: Long, m: Int): Seq[Long] = {
      val h1 = ((h % P) + P) % P
      val h2 = (h1 * h1 % P * 1000003L + 54321L) % P
      (1 to K).map(i => (h1 + i.toLong * h2) % P % m)
    }
    val bits = refDocs.flatMap(d => shingleHashes(d._2).flatMap(posM(_, mTiny))).toSet
    val expectFlagged = corpusDocs.filter(d =>
      shingleHashes(d._2).exists(h => posM(h, mTiny).forall(bits.contains))).map(_._1).toSet
    val r = Bloom.bloomEval(corpus, ref, "doc_id", "text", tiny, mTiny, K, W).head()
    assert(r.getLong(0) === 4L)                              // n_docs
    assert(r.getLong(1) === expectFlagged.size.toLong)       // flags replay
    assert(r.getLong(2) === 2L)                              // 2 truly contaminated
    assert(r.getLong(3) === (expectFlagged.size - 2).toLong) // rest are FPs
    assert(r.getLong(3) >= 1L, "tiny filter must show at least one FP")
    assert(r.getLong(4) === 0L, "false negatives are impossible")
    val sized = Bloom.buildBloomWords(ref, "text", 1 << 15, K, W)
    val r2 = Bloom.bloomEval(corpus, ref, "doc_id", "text", sized, 1 << 15, K, W).head()
    assert(r2.getLong(4) === 0L)
    assert(r2.getLong(3) <= r.getLong(3), "bigger filter cannot have more FPs here")
  }

  test("decontaminateExact equals the plain exact truth at ANY filter sizing") {
    val ref = refDocs.toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val refSh = refDocs.flatMap(d => shingleHashes(d._2)).toSet
    val truth = corpusDocs.map { case (id, t) =>
      id -> shingleHashes(t).count(refSh) }.toMap
    // 64 bits is near-saturated (bloom FPs certain); the confirm join
    // must erase them — the filter is invisible in the answer
    for (m <- Seq(64, 1 << 12)) {
      val words = Bloom.buildBloomWords(ref, "text", m, K, W)
      val got = Bloom.decontaminateExact(corpus, ref, "doc_id", "text",
          words, m, K, W)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      corpusDocs.foreach { case (id, _) =>
        assert(got(id) === ((truth(id).toLong, truth(id) > 0)), s"m=$m doc $id")
      }
    }
  }

  test("partitioning-invariant and deterministic") {
    val ref = refDocs.toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val w1 = Bloom.buildBloomWords(ref, "text", M, K, W)
    val w2 = Bloom.buildBloomWords(ref.repartition(5), "text", M, K, W)
    assert(w1.toSeq === w2.toSeq, "build must not depend on partitioning")
    val a = Bloom.contaminationCard(corpus, "doc_id", "text", w1, M, K, W)
      .collect().map(_.toSeq).toSet
    val b = Bloom.contaminationCard(corpus.repartition(3), "doc_id", "text", w1, M, K, W)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("guards fail loudly") {
    val ref = refDocs.toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Bloom.buildBloomWords(ref, "text", 100, K, W) }
    intercept[IllegalArgumentException] { Bloom.buildBloomWords(ref, "text", M, 0, W) }
    intercept[IllegalArgumentException] { Bloom.buildBloomWords(ref, "text", M, 9, W) }
    intercept[IllegalArgumentException] {
      Bloom.buildBloomWords(ref.filter(lit(false)), "text", M, K, W)
    }
    // words length must match mBits (a stale artifact-shaped mistake)
    intercept[IllegalArgumentException] {
      Bloom.contaminationCard(ref, "doc_id", "text", new Array[Long](3), M, K, W)
    }
  }

  test("a NULL-text doc reads (0, 0, false) — never NULL through the gate") {
    val ref = refDocs.toDF("doc_id", "text")
    val words = Bloom.buildBloomWords(ref, "text", M, K, W)
    val corpus = (corpusDocs.map { case (id, t) => (id, Option(t)) } :+
      (99L, None: Option[String])).toDF("doc_id", "text")
    val card = Bloom.contaminationCard(corpus, "doc_id", "text", words, M, K, W)
    val r = card.filter(col("id") === 99L).head()
    assert(!r.anyNull, "null-text row produced NULL card fields")
    assert(r.getAs[Int]("n_shingles") === 0 && r.getAs[Long]("n_hits") === 0L &&
      !r.getAs[Boolean]("contaminated"))
    // a downstream keep-filter retains it instead of silently dropping
    assert(card.filter(!col("contaminated")).filter(col("id") === 99L).count() === 1L)
  }
}
