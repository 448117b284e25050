package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ImageHash, Multimodal}

class ImageHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureHashes(n: Int): DataFrame = {
    val blobs = Multimodal.synthMediaBlobs(
        spark.range(n.toLong).select(col("id").as("doc_id")), "doc_id", "bmp_near")
      .withColumn("format", lit("bmp"))
    ImageHash.imageHashes(blobs, "id", "bytes", "format")
  }

  test("dhashPairs == brute-force Hamming join (d=3 and d=2; dhash and phash)") {
    val hashes = fixtureHashes(200).filter(col("dhash").isNotNull).cache()
    for (hcol <- Seq("dhash", "phash"); maxBits <- Seq(2, 3)) {
      val got = ImageHash.dhashPairs(hashes, "id", hcol, maxBits, nBands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val a = hashes.select(col("id").as("a_id"), col(hcol).as("a_h"))
      val b = hashes.select(col("id").as("b_id"), col(hcol).as("b_h"))
      val brute = a.join(b, col("a_id") < col("b_id"))
        .withColumn("dist",
          bit_count(col("a_h").bitwiseXOR(col("b_h"))).cast("long"))
        .filter(col("dist") <= maxBits)
        .select("a_id", "b_id", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute, s"$hcol maxBits=$maxBits")
      assert(brute.nonEmpty, "fixture must exercise real near-dup pairs")
    }
    hashes.unpersist(blocking = false)
  }

  test("same pixels through BMP and PNG containers hash identically") {
    // pixel-level hashing must see through the container: identical
    // images in different lossless formats are the same image
    val pix = (k: Int) => ((k * 37 + 11) % 256)
    val bmp = Multimodal.buildBmp(12, 9, pix)
    val png = Multimodal.buildPng(12, 9, pix)
    assert(ImageHash.dhash64(bmp, "bmp") === ImageHash.dhash64(png, "png"))
    assert(ImageHash.ahash64(bmp, "bmp") === ImageHash.ahash64(png, "png"))
    assert(ImageHash.phash64(bmp, "bmp") === ImageHash.phash64(png, "png"))
    assert(ImageHash.dhash64(bmp, "bmp") != null)
    assert(ImageHash.phash64(bmp, "bmp") != null)
  }

  test("near-identical images land within a few bits; unrelated far apart") {
    val base = (k: Int) => ((k * 53 + 7) % 256)
    val nudged = (k: Int) => if (k < 3) (base(k) + 3) % 256 else base(k)
    val other = (k: Int) => ((k * 101 + 91) % 256)
    val h1 = ImageHash.dhash64(Multimodal.buildBmp(16, 12, base), "bmp")
    val h2 = ImageHash.dhash64(Multimodal.buildBmp(16, 12, nudged), "bmp")
    val h3 = ImageHash.dhash64(Multimodal.buildBmp(16, 12, other), "bmp")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) <= 4, s"nudge moved ${ham(h1, h2)} bits")
    assert(ham(h1, h3) > 8, s"unrelated only ${ham(h1, h3)} bits apart")
    // the DCT tier shows the same near/far structure
    val p1 = ImageHash.phash64(Multimodal.buildBmp(16, 12, base), "bmp")
    val p2 = ImageHash.phash64(Multimodal.buildBmp(16, 12, nudged), "bmp")
    val p3 = ImageHash.phash64(Multimodal.buildBmp(16, 12, other), "bmp")
    assert(ham(p1, p2) <= 8, s"phash nudge moved ${ham(p1, p2)} bits")
    assert(ham(p1, p3) > 8, s"phash unrelated only ${ham(p1, p3)} bits apart")
  }

  test("decompression bomb: huge header dims rejected before decode") {
    // crafted PNG IHDR claiming a 100k x 100k canvas (10^10 px)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes("US-ASCII"))
    def be32(v: Long): Array[Byte] = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    ihdr.write(be32(100000L)); ihdr.write(be32(100000L))
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val body = ihdr.toByteArray
    out.write(be32(13L)) // IHDR data length
    out.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    out.write(be32(crc.getValue))
    assert(ImageHash.dhash64(out.toByteArray, "png") === null)
    assert(ImageHash.lumaGrid(out.toByteArray, "png") === null)
  }

  test("magic/format mismatch and garbage degrade to null, never throw") {
    val bmp = Multimodal.buildBmp(4, 4, _ => 7)
    assert(ImageHash.dhash64(bmp, "png") === null)    // BMP labeled png
    assert(ImageHash.dhash64(bmp, "webp") === null)   // unsupported format
    // gif/tiff magic checks: a mislabeled blob must not flow to
    // whatever reader ImageIO sniffs (the declared-format contract)
    assert(ImageHash.dhash64(bmp, "gif") === null)    // BMP labeled gif
    assert(ImageHash.dhash64(bmp, "tiff") === null)   // BMP labeled tiff
    assert(ImageHash.dhash64(bmp, "tif") === null)
    assert(ImageHash.dhash64(
      Multimodal.buildGif(8, 8, palBits = 2, v89 = true), "tiff") === null)
    assert(ImageHash.dhash64(Array.fill[Byte](64)(0x41), "bmp") === null)
    assert(ImageHash.dhash64(Array.empty[Byte], "bmp") === null)
    assert(ImageHash.dhash64(null, "bmp") === null)
  }

  test("undecodable blobs keep their row with null hashes in imageHashes") {
    val rows = Seq(
      (1L, Multimodal.buildBmp(8, 6, k => k % 256), "bmp"),
      (2L, Array.fill[Byte](10)(1), "bmp"),
      (3L, null.asInstanceOf[Array[Byte]], "bmp"))
      .toDF("id", "bytes", "format")
    val out = ImageHash.imageHashes(rows, "id", "bytes", "format")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("pigeonhole guard: maxBits >= nBands and degenerate bands refused loudly") {
    val hashes = fixtureHashes(8)
    assertThrows[IllegalArgumentException] {
      ImageHash.dhashPairs(hashes, "id", "dhash", maxBits = 4, nBands = 4)
    }
    assertThrows[IllegalArgumentException] {
      ImageHash.dhashPairs(hashes, "id", "dhash", maxBits = 1, nBands = 7)
    }
    assertThrows[IllegalArgumentException] {
      ImageHash.dhashPairs(hashes, "id", "dhash", maxBits = 0, nBands = 1)
    }
  }

  test("banding == brute force at every legal band width (2/8/32 bands)") {
    val hashes = fixtureHashes(120).filter(col("dhash").isNotNull).cache()
    val a = hashes.select(col("id").as("a_id"), col("dhash").as("a_h"))
    val b = hashes.select(col("id").as("b_id"), col("dhash").as("b_h"))
    for ((nBands, maxBits) <- Seq((2, 1), (8, 5), (32, 9))) {
      val got = ImageHash.dhashPairs(hashes, "id", "dhash", maxBits, nBands)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = a.join(b, col("a_id") < col("b_id"))
        .withColumn("dist",
          bit_count(col("a_h").bitwiseXOR(col("b_h"))).cast("long"))
        .filter(col("dist") <= maxBits)
        .select("a_id", "b_id", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute, s"nBands=$nBands maxBits=$maxBits")
    }
    hashes.unpersist(blocking = false)
  }
}
