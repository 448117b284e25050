package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Hll
import graft.functions.SketchExpressions

class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L
  private def reg(tok: String, m: Int): (Long, Int) = {
    val h1 = SketchExpressions.polyFold(tok, 1000003L)
    val h2 = (h1 * h1 % P * 1000003L + 54321L) % P
    val rank = if (h2 == 0L) 31 else java.lang.Long.numberOfTrailingZeros(h2) + 1
    (h1 % m, rank)
  }

  // 5000 distinct synthetic tokens spread over 40 docs — enough to
  // exercise the raw-harmonic branch at m=256
  private def bigCorpus = (0 until 40).map { d =>
    (d.toLong, (0 until 125).map(i => s"tok${d * 125 + i}").mkString(" "))
  }

  test("registers and estimate match the independent JVM replay") {
    val m = 256
    val df = bigCorpus.toDF("doc_id", "text")
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    bigCorpus.flatMap(_._2.split("\\s+")).foreach { t =>
      val (b, r) = reg(t, m)
      regs(b) = math.max(regs.getOrElse(b, 0), r)
    }
    val vZero = m - regs.size
    val hsum = regs.values.map(r => 1.0 / (1L << r)).sum + vZero.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val raw = alpha * m * m / hsum
    val est = if (vZero > 0 && raw <= 2.5 * m)
      m.toDouble * math.log(m.toDouble / vZero) else raw
    val row = Hll.hllDistinctCard(df, "text", m).head()
    assert(row.getLong(0) === 5000L)
    assert(row.getLong(1) === vZero.toLong)
    assert(row.getLong(2) === math.floor(est).toLong)
  }

  test("estimate lands within the HLL error band (5σ at m=256)") {
    val row = Hll.hllDistinctCard(bigCorpus.toDF("doc_id", "text"), "text", 256).head()
    val (exact, est) = (row.getLong(0).toDouble, row.getLong(2).toDouble)
    val sigma = 1.04 / math.sqrt(256.0)
    assert(math.abs(est - exact) / exact < 5 * sigma,
      s"est $est vs exact $exact out of band")
  }

  test("duplicating the corpus leaves registers — and the estimate — unchanged") {
    val df = bigCorpus.toDF("doc_id", "text")
    val doubled = df.unionByName(df.withColumn("doc_id", col("doc_id") + 1000L))
    val a = Hll.hllDistinctCard(df, "text", 256).head()
    val b = Hll.hllDistinctCard(doubled, "text", 256).head()
    assert(a.getLong(0) === b.getLong(0))
    assert(a.getLong(1) === b.getLong(1) && a.getLong(2) === b.getLong(2),
      "registers must be idempotent under duplicate occurrences")
  }

  test("hllDistinctByGroup: per-group estimates track per-group vocab sizes") {
    // group a: 2000 distinct terms; group b: 40 distinct terms
    val docs = (0 until 20).map { d =>
      ("a", (0 until 100).map(i => s"rich${d * 100 + i}").mkString(" "))
    } ++ (0 until 20).map { d =>
      ("b", (0 until 40).map(i => s"poor$i").mkString(" "))
    }
    val out = Hll.hllDistinctByGroup(docs.toDF("source", "text"), "text",
        "source", 256)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(out("a")._1 === 2000L && out("b")._1 === 40L)
    val sigma = 1.04 / math.sqrt(256.0)
    assert(math.abs(out("a")._2 - 2000.0) / 2000.0 < 5 * sigma)
    assert(math.abs(out("b")._2 - 40.0) / 40.0 < 5 * sigma)
    // the richness gap the card exists to surface
    assert(out("a")._2 > 10 * out("b")._2)
  }

  test("guards fail loudly") {
    val df = bigCorpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Hll.hllDistinctCard(df, "text", 100) }
    intercept[IllegalArgumentException] { Hll.hllDistinctCard(df, "text", 8) }
    intercept[IllegalArgumentException] { Hll.hllDistinctCard(df, "text", 1 << 17) }
  }

  test("registers merged over any corpus split equal the single-pass table bit-for-bit") {
    val df = Tables.table(spark, TestSpark.sfDir, "documents").limit(300)
    val full = Hll.hllRegisters(df, "text", 64)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    for (k <- Seq(2L, 7L)) {
      val merged = Hll.mergeRegisters(
          Hll.hllRegisters(df.filter(col("doc_id") % k === 0), "text", 64),
          Hll.hllRegisters(df.filter(col("doc_id") % k =!= 0), "text", 64))
        .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(merged.toSeq === full.toSeq, s"merge over %$k split diverged")
    }
    // idempotence: merging a table with itself is the identity (the
    // property that makes late/replayed state safe)
    val regs = Hll.hllRegisters(df, "text", 64)
    val self = Hll.mergeRegisters(regs, regs)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(self.toSeq === full.toSeq, "self-merge is not the identity")
  }

  test("empty corpus reads (0, m, 0), never NULL") {
    val df = bigCorpus.toDF("doc_id", "text").filter(lit(false))
    val r = Hll.hllDistinctCard(df, "text", 64).head()
    assert(!r.anyNull, "degenerate card has NULLs")
    assert(r.getLong(0) === 0L && r.getLong(1) === 64L && r.getLong(2) === 0L)
  }
}
