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
      .filter(col("dhash").isNotNull).select(col("id"), col("dhash"))
  }

  private def gateSet(prefix: String, delta: DataFrame): Set[(Long, Long, Long)] =
    ImageHashIndex.gateImageMatches(spark, prefix, delta, "id", "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def bruteCross(delta: DataFrame, corp: DataFrame,
                         maxBits: Int): Set[(Long, Long, Long)] =
    delta.select(col("id").as("delta_id"), col("dhash").as("dh"))
      .join(corp.select(col("id").as("index_id"), col("dhash").as("ch")),
        bit_count(col("dh").bitwiseXOR(col("ch"))) <= maxBits)
      .withColumn("dist",
        bit_count(col("dh").bitwiseXOR(col("ch"))).cast("long"))
      .select("delta_id", "index_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("gate == brute-force Hamming cross truth on the near-dup fixture") {
    cleanup("img")
    val hashes = fixtureHashes(300).cache(); hashes.count()
    val corp = hashes.filter(col("id") % 5 =!= 0)
    val delta = hashes.filter(col("id") % 5 === 0)
    ImageHashIndex.buildImageIndex(corp, "id", "dhash", "img",
      maxBits = 3, nBands = 4)
    val truth = bruteCross(delta, corp, 3)
    assert(gateSet("img", delta) === truth)
    assert(truth.nonEmpty, "fixture must exercise real matches")
    hashes.unpersist(blocking = false)
    cleanup("img")
  }

  test("nBands=2 (32-bit band values): gate == brute truth — bk packing is collision-free") {
    cleanup("imw")
    val hashes = fixtureHashes(200).cache(); hashes.count()
    val corp = hashes.filter(col("id") % 5 =!= 0)
    val delta = hashes.filter(col("id") % 5 === 0)
    ImageHashIndex.buildImageIndex(corp, "id", "dhash", "imw",
      maxBits = 1, nBands = 2)
    assert(gateSet("imw", delta) === bruteCross(delta, corp, 1))
    hashes.unpersist(blocking = false)
    cleanup("imw")
  }

  test("append ≡ rebuild: gate answers identical after an O(delta) fold") {
    cleanup("ima")
    cleanup("imb")
    val hashes = fixtureHashes(300).cache(); hashes.count()
    val corp = hashes.filter(col("id") % 5 =!= 0)
    val delta = hashes.filter(col("id") % 5 === 0)
    ImageHashIndex.buildImageIndex(corp, "id", "dhash", "ima",
      maxBits = 3, nBands = 4)
    ImageHashIndex.buildImageIndex(corp.filter(col("id") % 4 =!= 1),
      "id", "dhash", "imb", maxBits = 3, nBands = 4)
    ImageHashIndex.appendToImageIndex(spark, "imb",
      corp.filter(col("id") % 4 === 1), "id", "dhash")
    assert(gateSet("imb", delta) === gateSet("ima", delta))
    assert(spark.table("imb_stats").head().getAs[String]("lineage")
      .contains("+"))
    hashes.unpersist(blocking = false)
    cleanup("ima")
    cleanup("imb")
  }

  test("torn marker, re-submitted id, empty delta, null hash all refused loudly") {
    cleanup("imt")
    val hs = Seq((1L, 42L), (2L, 99L)).toDF("id", "dhash")
    ImageHashIndex.buildImageIndex(hs, "id", "dhash", "imt")
    // torn intent marker
    spark.range(1).select(lit("torn").as("entry"), lit(2L).as("n_images_before"))
      .write.mode("overwrite").saveAsTable("imt_intent")
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.gateImageMatches(spark, "imt",
        Seq((9L, 42L)).toDF("id", "dhash"), "id", "dhash")
    }
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.appendToImageIndex(spark, "imt",
        Seq((9L, 42L)).toDF("id", "dhash"), "id", "dhash")
    }
    Bucketing.dropTableAndLocation(spark, "imt_intent")
    // re-submitted id; empty delta
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.appendToImageIndex(spark, "imt",
        Seq((1L, 7L)).toDF("id", "dhash"), "id", "dhash")
    }
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.appendToImageIndex(spark, "imt",
        hs.filter(lit(false)), "id", "dhash")
    }
    // null hash raises (undecodable images must be filtered upstream)
    def chainContains(t: Throwable, s: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(x => Option(x.getMessage).exists(_.contains(s)))
    val ex = intercept[Exception] {
      ImageHashIndex.buildImageIndex(
        Seq((5L, null.asInstanceOf[java.lang.Long])).toDF("id", "dhash"),
        "id", "dhash", "imt2")
    }
    assert(chainContains(ex, "null hash"))
    // pigeonhole param guard
    assertThrows[IllegalArgumentException] {
      ImageHashIndex.buildImageIndex(hs, "id", "dhash", "imt3",
        maxBits = 4, nBands = 4)
    }
    cleanup("imt")
    cleanup("imt2")
    cleanup("imt3")
  }
}
