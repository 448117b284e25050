package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bucketing, ImageHash, ImageHashIndex, Multimodal}

class ImageHashIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cleanup(prefix: String): Unit =
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .foreach(Bucketing.dropTableAndLocation(spark, _))

  private def fixtureHashes(n: Int): DataFrame = {
    val blobs = Multimodal.synthMediaBlobs(
        spark.range(n.toLong).select(col("id").as("doc_id")), "doc_id",
        "bmp_near")
      .withColumn("format", lit("bmp"))
    ImageHash.imageHashes(blobs, "id", "bytes", "format")
      .filter(col("dhash").isNotNull && col("phash").isNotNull)
      .select(col("id"), col("dhash"), col("phash"))
  }

  private def gateSet(prefix: String, delta: DataFrame): Set[(Long, Long, Long)] =
    ImageHashIndex.gateImageMatches(spark, prefix, delta, "id", "dhash",
        "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Brute-force COMBINED-distance cross truth: dist =
    * bit_count(d⊕d') + bit_count(p⊕p') over the 128-bit pair.
    */
  private def bruteCross(delta: DataFrame, corp: DataFrame,
                         maxBits: Int): Set[(Long, Long, Long)] =
    delta.select(col("id").as("delta_id"), col("dhash").as("dh"),
        col("phash").as("ph"))
      .join(corp.select(col("id").as("index_id"), col("dhash").as("ch"),
          col("phash").as("cp")),
        (bit_count(col("dh").bitwiseXOR(col("ch")))
          + bit_count(col("ph").bitwiseXOR(col("cp")))) <= maxBits)
      .withColumn("dist",
        (bit_count(col("dh").bitwiseXOR(col("ch")))
          + bit_count(col("ph").bitwiseXOR(col("cp")))).cast("long"))
      .select("delta_id", "index_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("gate == brute-force combined-Hamming cross truth on the near-dup fixture") {
    cleanup("img")
    val hashes = fixtureHashes(300).cache(); hashes.count()
    val corp = hashes.filter(col("id") % 5 =!= 0)
    val delta = hashes.filter(col("id") % 5 === 0)
    ImageHashIndex.buildImageIndex(corp, "id", "dhash", "phash", "img",
      maxBits = 3, nBands = 4)
    val truth = bruteCross(delta, corp, 3)
    assert(gateSet("img", delta) === truth)
    assert(truth.nonEmpty, "fixture must exercise real matches")
    hashes.unpersist(blocking = false)
    cleanup("img")
  }

  test("nBands=8 (16-bit bands, maxBits=6 > any one word's budget): gate == brute truth") {
    // maxBits > 3 forces pairs whose differing bits SPLIT across the
    // dhash and phash words — the two-word pigeonhole case: 6 < 8
    // bands total, so some band (in either word) is clean even when
    // neither word alone is within 3.
    cleanup("imw")
    val hashes = fixtureHashes(200).cache(); hashes.count()
    val corp = hashes.filter(col("id") % 5 =!= 0)
    val delta = hashes.filter(col("id") % 5 === 0)
    ImageHashIndex.buildImageIndex(corp, "id", "dhash", "phash", "imw",
      maxBits = 6, nBands = 8)
    assert(gateSet("imw", delta) === bruteCross(delta, corp, 6))
    hashes.unpersist(blocking = false)
    cleanup("imw")
  }

  test("append ≡ rebuild: gate answers identical after an O(delta) fold") {
    cleanup("ima")
    cleanup("imb")
    val hashes = fixtureHashes(300).cache(); hashes.count()
    val corp = hashes.filter(col("id") % 5 =!= 0)
    val delta = hashes.filter(col("id") % 5 === 0)
    ImageHashIndex.buildImageIndex(corp, "id", "dhash", "phash", "ima",
      maxBits = 3, nBands = 4)
    ImageHashIndex.buildImageIndex(corp.filter(col("id") % 4 =!= 1),
      "id", "dhash", "phash", "imb", maxBits = 3, nBands = 4)
    ImageHashIndex.appendToImageIndex(spark, "imb",
      corp.filter(col("id") % 4 === 1), "id", "dhash", "phash")
    assert(gateSet("imb", delta) === gateSet("ima", delta))
    assert(spark.table("imb_stats").head().getAs[String]("lineage")
      .contains("+"))
    hashes.unpersist(blocking = false)
    cleanup("ima")
    cleanup("imb")
  }

  test("append ≡ rebuild across a digest-resize boundary") {
    // digestSizing doubles mBits once 16·(nImages·nBands) crosses the
    // current size: with nBands=4 and the 2^20-bit floor the first
    // boundary is at 16384 images. Build below it, append across it,
    // and require (a) the digest actually resized, (b) the folded
    // index answers exactly like a fresh build at the combined
    // corpus — the same equality the text families pin. Hashes are
    // synthetic (the index is hash-agnostic): xxhash64 mixes give
    // well-spread 64-bit words without decoding 17k images.
    cleanup("imr")
    cleanup("imrf")
    def synth(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id"),
        xxhash64(col("id")).as("dhash"),
        xxhash64(col("id"), lit("p")).as("phash"))
    val base = synth(0L, 16000L)
    val delta = synth(16000L, 17000L)
    ImageHashIndex.buildImageIndex(base, "id", "dhash", "phash", "imr",
      maxBits = 3, nBands = 4)
    val mBefore = spark.table("imr_stats").head().getAs[Int]("digest_mbits")
    ImageHashIndex.appendToImageIndex(spark, "imr", delta, "id", "dhash",
      "phash")
    val mAfter = spark.table("imr_stats").head().getAs[Int]("digest_mbits")
    assert(mAfter > mBefore,
      s"append must cross the resize boundary ($mBefore -> $mAfter)")
    ImageHashIndex.buildImageIndex(synth(0L, 17000L), "id", "dhash",
      "phash", "imrf", maxBits = 3, nBands = 4)
    assert(spark.table("imrf_stats").head().getAs[Int]("digest_mbits")
      === mAfter, "fresh build at the combined corpus sizes identically")
    // probe with near-misses of indexed hashes (flip one dhash bit of
    // ids 0..99): answers must match the fresh build exactly
    val probe = spark.range(100L).select((col("id") + 90000000L).as("id"),
      xxhash64(col("id")).bitwiseXOR(lit(1L)).as("dhash"),
      xxhash64(col("id"), lit("p")).as("phash"))
    val got = gateSet("imr", probe)
    assert(got === gateSet("imrf", probe))
    assert(got.nonEmpty, "bit-flip probes must land within maxBits")
    cleanup("imr")
    cleanup("imrf")
  }

  test("torn marker, re-submitted id, empty delta, null hash all refused loudly") {
    cleanup("imt")
    val hs = Seq((1L, 42L, 7L), (2L, 99L, 8L)).toDF("id", "dhash", "phash")
    ImageHashIndex.buildImageIndex(hs, "id", "dhash", "phash", "imt")
    // torn intent marker
    spark.range(1).select(lit("torn").as("entry"), lit(2L).as("n_images_before"))
      .write.mode("overwrite").saveAsTable("imt_intent")
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.gateImageMatches(spark, "imt",
        Seq((9L, 42L, 7L)).toDF("id", "dhash", "phash"), "id", "dhash",
        "phash")
    }
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.appendToImageIndex(spark, "imt",
        Seq((9L, 42L, 7L)).toDF("id", "dhash", "phash"), "id", "dhash",
        "phash")
    }
    Bucketing.dropTableAndLocation(spark, "imt_intent")
    // re-submitted id; empty delta
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.appendToImageIndex(spark, "imt",
        Seq((1L, 7L, 9L)).toDF("id", "dhash", "phash"), "id", "dhash",
        "phash")
    }
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.appendToImageIndex(spark, "imt",
        hs.filter(lit(false)), "id", "dhash", "phash")
    }
    // null hash raises (undecodable images must be filtered upstream)
    def chainContains(t: Throwable, s: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(x => Option(x.getMessage).exists(_.contains(s)))
    val ex = intercept[Exception] {
      ImageHashIndex.buildImageIndex(
        Seq((5L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(3L)))
          .toDF("id", "dhash", "phash"),
        "id", "dhash", "phash", "imt2")
    }
    assert(chainContains(ex, "null hash"))
    // pigeonhole param guard (maxBits must stay below TOTAL bands)
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.buildImageIndex(hs, "id", "dhash", "phash", "imt3",
        maxBits = 4, nBands = 4)
    }
    // geometry guard: bands wider than 32 bits can't pack under the
    // band index (nBands=2 would mean whole-word bands)
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.buildImageIndex(hs, "id", "dhash", "phash", "imt3",
        maxBits = 1, nBands = 2)
    }
    cleanup("imt")
    cleanup("imt2")
    cleanup("imt3")
  }
}
