package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.util.Actions

class MultimodalActionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decodeMedia: schema contract, null blobs, oversize guard, determinism") {
    val df = Seq(
      (1L, Some("img-bytes-aaaa".getBytes("UTF-8")), "png"),
      (2L, None: Option[Array[Byte]], "png"),
      (3L, Some(Array.fill[Byte](128)(7)), "wav")
    ).toDF("media_id", "bytes", "format")
    val out = Multimodal.decodeMedia(df, "bytes", "format")
    assert(out.schema("decoded").dataType.simpleString === Multimodal.DecodedType.simpleString)
    val rows = out.orderBy("media_id").collect()
    assert(rows(1).isNullAt(3))                       // null blob -> null decode
    val d1 = rows(0).getStruct(3)
    assert(d1.getStruct(0).getString(0) === "png")    // meta.format
    assert(d1.getSeq[Float](1).length === 16)         // feature dim
    // deterministic: same bytes -> same features
    val again = Multimodal.decodeMedia(df, "bytes", "format")
      .orderBy("media_id").collect()(0).getStruct(3).getSeq[Float](1)
    assert(again === d1.getSeq[Float](1))
    // oversize guard
    val big = Multimodal.decodeMedia(df, "bytes", "format", maxBytes = 64)
      .orderBy("media_id").collect()
    assert(big(2).isNullAt(3) && !big(0).isNullAt(3))
  }

  test("PureJvmCodec: BMP round-trip undoes bottom-up rows, BGR order and stride padding") {
    // 5x3: row bytes 15, stride 16 — the padding byte is exercised
    val (w, h) = (5, 3)
    def pix(k: Int): Int = (k * 11 + 3) % 256
    val bytes = Multimodal.buildBmp(w, h, pix)
    val codec = new Multimodal.PureJvmCodec()
    val (meta, feats) = codec.decode(bytes, "bmp")
    assert(meta.getString(0) === "bmp")
    assert(meta.getInt(1) === w && meta.getInt(2) === h)
    assert(feats(0) === w.toFloat && feats(1) === h.toFloat)
    // top-left pixel is k=0,1,2 in top-down RGB order — wrong row
    // order or channel order lands on different bytes
    assert(feats(2) === pix(0).toFloat)
    assert(feats(3) === pix(1).toFloat)
    assert(feats(4) === pix(2).toFloat)
    val expSum = (0 until w * h * 3).map(pix).sum
    assert(feats(5) === expSum.toFloat)
    assert(feats(6) === (0 until w * h * 3).map(pix).max.toFloat)
  }

  test("PureJvmCodec: PPM decodes to the same features as the equivalent BMP") {
    def pix(k: Int): Int = (k * 7 + 40) % 256
    val codec = new Multimodal.PureJvmCodec()
    val (mB, fB) = codec.decode(Multimodal.buildBmp(6, 4, pix), "bmp")
    val (mP, fP) = codec.decode(Multimodal.buildPpm(6, 4, pix), "ppm")
    assert(mB.getString(0) === "bmp" && mP.getString(0) === "ppm")
    assert(fB.toSeq === fP.toSeq)
  }

  test("PureJvmCodec: WAV round-trip — samples, duration, zero-skipping crossings") {
    // signs: + - 0 0 - + : crossings at (+,-) and (-,+) with the zeros
    // skipped but sign carried across them
    val samples = Array(1000, -2000, 0, 0, -1, 32767)
    val codec = new Multimodal.PureJvmCodec()
    val (meta, f) = codec.decode(
      Multimodal.buildWav(8000, samples.length, samples(_)), "wav")
    assert(meta.getString(0) === "wav")
    assert(meta.getLong(4) === samples.length * 1000L / 8000L) // duration_ms
    assert(f(0) === 1f && f(1) === 8000f && f(2) === samples.length.toFloat)
    assert(f(3) === 1000f && f(4) === 32767f)
    assert(f(5) === samples.map(math.abs).sum.toFloat)
    assert(f(6) === 2f)
  }

  test("PureJvmCodec: malformed media decodes to null; unknown formats hit the stub") {
    val codec = new Multimodal.PureJvmCodec()
    val good = Multimodal.buildBmp(4, 4, _ => 1)
    assert(codec.decode(good.take(30), "bmp") === null)         // truncated
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(codec.decode(badMagic, "bmp") === null)
    val bpp8 = good.clone(); bpp8(28) = 8                       // unsupported depth
    assert(codec.decode(bpp8, "bmp") === null)
    assert(codec.decode("nonsense".getBytes, "wav") === null)
    assert(codec.decode("P5 2 2 255 ".getBytes, "ppm") === null) // P5 != P6
    val viaStub = codec.decode("opaque".getBytes, "mp4")
    assert(viaStub != null && viaStub._2.length === 16)          // stub dim
  }

  test("PureJvmCodec: PNG via ImageIO decodes to the same features as the equivalent PPM") {
    def pix(k: Int): Int = (k * 13 + 21) % 256
    val codec = new Multimodal.PureJvmCodec()
    // PNG is lossless: the ImageIO path must land on the byte-exact
    // pixels the pure-JVM PPM parser reads from the same formula
    val (mP, fP) = codec.decode(Multimodal.buildPpm(7, 5, pix), "ppm")
    val (mG, fG) = codec.decode(Multimodal.buildPng(7, 5, pix), "png")
    assert(mP.getString(0) === "ppm" && mG.getString(0) === "png")
    assert(mG.getInt(1) === 7 && mG.getInt(2) === 5)
    assert(fP.toSeq === fG.toSeq)
    // a scanline long enough to split across two stored zlib blocks
    // (22000*3+1 > 65535) exercises the multi-block writer
    val wide = Multimodal.buildPng(22000, 1, k => (k * 3 + 1) % 256)
    val (mW, fW) = codec.decode(wide, "png")
    assert(mW.getInt(1) === 22000 && mW.getInt(2) === 1)
    assert(fW(2) === 1f && fW(3) === 4f && fW(4) === 7f)
  }

  test("PureJvmCodec: JPEG via ImageIO — real compressed round-trip metadata") {
    // JPEG is lossy, so the contract is meta + plausible features,
    // not formula-exact pixels; bytes come from the JDK's own encoder
    val img = new java.awt.image.BufferedImage(9, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 9)
      img.setRGB(x, y, ((x * 20) << 16) | ((y * 30) << 8) | 40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val codec = new Multimodal.PureJvmCodec()
    val (meta, f) = codec.decode(bos.toByteArray, "jpg")
    assert(meta.getString(0) === "jpg")
    assert(meta.getInt(1) === 9 && meta.getInt(2) === 6)
    assert(f(0) === 9f && f(1) === 6f)
    assert(f.forall(x => x >= 0f && x.isFinite))
  }

  test("PureJvmCodec: crafted/mislabeled compressed images degrade to null") {
    val codec = new Multimodal.PureJvmCodec()
    val good = Multimodal.buildPng(4, 4, _ => 9)
    // truncated MID-IDAT (into the pixel stream itself — ImageIO
    // forgives a missing CRC/IEND tail): reader throws, dispatch
    // degrades to null
    assert(codec.decode(good.take(good.length - 45), "png") === null)
    // magic/format disagreement: refuse, never content-sniff into a
    // different decoder
    assert(codec.decode(good, "jpg") === null)
    assert(codec.decode(Multimodal.buildBmp(4, 4, _ => 1), "png") === null)
    // decompression bomb: IHDR claiming a ~4.3-gigapixel canvas must
    // be rejected from the HEADER, before any pixel allocation
    val bomb = good.clone()
    def putBe(off: Int, v: Int): Unit = {
      bomb(off) = ((v >>> 24) & 0xFF).toByte; bomb(off + 1) = ((v >>> 16) & 0xFF).toByte
      bomb(off + 2) = ((v >>> 8) & 0xFF).toByte; bomb(off + 3) = (v & 0xFF).toByte
    }
    putBe(16, 65535); putBe(20, 65535) // IHDR width/height at offsets 16/20
    // fix the IHDR CRC so only the DIMENSIONS are implausible
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 4 + 13)
    putBe(29, crc.getValue.toInt)
    val t0 = System.nanoTime()
    assert(codec.decode(bomb, "png") === null)
    assert((System.nanoTime() - t0) < 2e9.toLong,
      "bomb rejection must come from the header, not an attempted decode")
  }

  test("resizeMedia: target dims in meta, byte cap, null passthrough") {
    val df = Seq(
      (1L, Some(Array.fill[Byte](500)(3)), "png"),
      (2L, None: Option[Array[Byte]], "png"),
      (3L, Some(Array.fill[Byte](8)(9)), "png")
    ).toDF("media_id", "bytes", "format")
    val rows = Multimodal.resizeMedia(df, "bytes", "format", width = 10, height = 10)
      .orderBy("media_id").collect()
    val r1 = rows(0).getStruct(3)
    assert(r1.getAs[Array[Byte]](0).length === 100)   // capped at w*h
    val m1 = r1.getStruct(1)
    assert(m1.getInt(1) === 10 && m1.getInt(2) === 10 && m1.getLong(4) === 100L)
    assert(rows(1).isNullAt(3))                       // null blob passes through
    assert(rows(2).getStruct(3).getAs[Array[Byte]](0).length === 8) // short stays
  }

  test("codec close() fires even when a limit abandons the iterator early") {
    MultimodalActionsSpec.opens.set(0)
    MultimodalActionsSpec.closes.set(0)
    val df = (1 to 64).map(i => (i.toLong, s"bytes-$i".getBytes("UTF-8"), "png"))
      .toDF("media_id", "bytes", "format")
      .repartition(2)
    val out = Multimodal.decodeMedia(df, "bytes", "format",
      codec = new MultimodalActionsSpec.CountingCodec)
    // limit(1) stops consuming the partition iterator before it drains
    assert(out.limit(1).collect().length === 1)
    assert(MultimodalActionsSpec.opens.get() > 0)
    assert(MultimodalActionsSpec.closes.get() === MultimodalActionsSpec.opens.get(),
      s"opens=${MultimodalActionsSpec.opens.get()} closes=${MultimodalActionsSpec.closes.get()}")
  }

  test("decoded features flow into the Similarity operators") {
    val df = Seq(
      (1L, "aaaa".getBytes("UTF-8"), "png"),
      (2L, "aaaa".getBytes("UTF-8"), "png"),
      (3L, "zzzz-different".getBytes("UTF-8"), "png")
    ).toDF("vec_id", "bytes", "format")
    val feats = Multimodal.decodeMedia(df, "bytes", "format")
      .select(col("vec_id"), col("decoded.features").as("embedding"))
    val pairs = feats.as("a").join(feats.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        graft.operators.Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-9)  // identical bytes -> identical vecs
    assert(pairs((1L, 3L)) < 0.99)
  }

  test("sampleFrameIndices: even spread, short videos untouched") {
    val df = Seq(100, 3, 0).toDF("n")
      .select(Multimodal.sampleFrameIndices(col("n"), 4).as("idx"))
    val rows = df.collect().map(_.getSeq[Int](0))
    assert(rows(0) === Seq(0, 25, 50, 75))
    assert(rows(1) === Seq(0, 1, 2))
    assert(rows(2) === Seq(0))
  }

  test("logGroup fences and refuses nesting; warn records categories") {
    var ran = false
    Actions.logGroup("g1") { ran = true }
    assert(ran)
    intercept[IllegalStateException] {
      Actions.logGroup("outer") { Actions.logGroup("inner") { } }
    }
    Actions.warn("too slow", Actions.SlowQueryWarning)
    assert(Actions.recentWarnings().exists(w =>
      w.category === "SlowQueryWarning" && w.message === "too slow"))
  }
}

object MultimodalActionsSpec {
  // static counters: tasks run in the same JVM under local[*], so the
  // serialized codec copies still bump the shared atomics
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)

  class CountingCodec extends Multimodal.MediaCodec {
    private val stub = new Multimodal.DeterministicStubCodec(16)
    override def open(): Unit = opens.incrementAndGet()
    override def close(): Unit = closes.incrementAndGet()
    override def decode(bytes: Array[Byte], format: String): (org.apache.spark.sql.Row, Array[Float]) =
      stub.decode(bytes, format)
  }
}
