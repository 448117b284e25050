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

  test("PureJvmCodec: G.711 mu-law and A-law decode to the reference table values") {
    val codec = new Multimodal.PureJvmCodec()
    // mu-law spot values from the public Sun/ITU reference arithmetic:
    // 0xFF -> 0, 0x7F -> -0 (quantizes to 0), 0x00 -> -32124, 0x80 -> 32124
    val muBytes = Array(0xFF, 0x7F, 0x00, 0x80)
    val (mMu, fMu) = codec.decode(
      Multimodal.buildWavG711(8000, muBytes.length, aLaw = false, muBytes(_)), "wav")
    assert(mMu.getString(0) === "wav")
    assert(fMu(3) === 0f)                  // first: 0xFF decodes to 0
    assert(fMu(4) === 32124f)              // last: 0x80 is max positive
    assert(fMu(5) === (0 + 0 + 32124 + 32124).toFloat)
    // A-law spot values: 0x55 -> -8 (xor cancels to segment 0),
    // 0xD5 -> +8, 0x7F -> -848 (segment 2), 0xFF -> +848
    val aBytes = Array(0x55, 0xD5, 0x7F, 0xFF)
    val (mA, fA) = codec.decode(
      Multimodal.buildWavG711(8000, aBytes.length, aLaw = true, aBytes(_)), "wav")
    assert(mA.getString(0) === "wav")
    assert(fA(3) === -8f && fA(4) === 848f)
    assert(fA(5) === (8 + 8 + 848 + 848).toFloat)
    // duration counts SAMPLES (1/byte), not byte pairs
    assert(mMu.getLong(4) === muBytes.length * 1000L / 8000L)
  }

  test("PureJvmCodec: IMA ADPCM decodes the clamped predictor fold; structural violations null") {
    val codec = new Multimodal.PureJvmCodec()
    // independent JVM replay of the spec fold
    def replay(pred0: Int, idx0: Int, nibs: Array[Int]): Array[Int] = {
      val step = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25,
        28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
        130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
        4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
        11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
        27086, 29794, 32767)
      val adj = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
      var pred = pred0; var idx = idx0
      pred0 +: nibs.map { nib =>
        val s = step(idx)
        var d = s >> 3
        if ((nib & 1) != 0) d += s >> 2
        if ((nib & 2) != 0) d += s >> 1
        if ((nib & 4) != 0) d += s
        pred = math.max(-32768, math.min(32767, if ((nib & 8) != 0) pred - d else pred + d))
        idx = math.max(0, math.min(88, idx + adj(nib)))
        pred
      }
    }
    val nibs = Array.tabulate(16)(i => (i * 7 + 3) % 16)
    val want = replay(-1200, 30, nibs)
    val (meta, f) = codec.decode(
      Multimodal.buildWavAdpcm(8000, -1200, 30, nibs.length, nibs(_)), "wav")
    assert(meta.getString(0) === "wav")
    assert(f(2) === (nibs.length + 1).toFloat)     // samples = header + nibbles
    assert(f(3) === want.head.toFloat && f(4) === want.last.toFloat)
    assert(f(5) === want.map(math.abs).sum.toFloat)
    // clamping exercised: saturate upward from near the rail
    val up = codec.decode(
      Multimodal.buildWavAdpcm(8000, 32000, 88, 8, _ => 7), "wav")
    assert(up._2(4) === 32767f, "positive clamp must saturate at 32767")
    // structural violations: stereo ADPCM, out-of-range step index
    val mono = Multimodal.buildWavAdpcm(8000, 0, 0, 8, _ => 0)
    val stereo = mono.clone(); stereo(22) = 2
    assert(codec.decode(stereo, "wav") === null)
    val badIdx = mono.clone(); badIdx(46) = 90
    assert(codec.decode(badIdx, "wav") === null)
  }

  test("PureJvmCodec: MP3 frame-header metadata walks validated frames only") {
    val codec = new Multimodal.PureJvmCodec()
    val b = Multimodal.buildMp3(nFrames = 3, brIdx = 9, srIdx = 0)
    val (meta, f) = codec.decode(b, "mp3")
    assert(meta.getString(0) === "mp3")
    assert(f(1) === 44100f && f(3) === 128f && f(4) === 3f)
    assert(meta.getLong(4) === 3L * 1152 * 1000 / 44100)
    // a truncated final frame is not counted — metadata reflects only
    // frames whose full length fits
    val truncated = b.take(b.length - 10)
    val t = codec.decode(truncated, "mp3")
    assert(t != null && t._2(4) === 2f)
    // garbage after the ID3 tag -> no validated frame -> null
    val garbage = b.clone(); garbage(10 + 16) = 0x00
    assert(codec.decode(garbage, "mp3") === null)
    // reserved bitrate code (15) rejects the frame
    val badBr = b.clone(); badBr(10 + 16 + 2) = (15 << 4).toByte
    assert(codec.decode(badBr, "mp3") === null)
  }

  test("PureJvmCodec: FLAC STREAMINFO metadata; structural violations are null") {
    val codec = new Multimodal.PureJvmCodec()
    val b = Multimodal.buildFlac(rate = 16000, channels = 2, bps = 16,
      totalSamples = 5000L)
    val (meta, f) = codec.decode(b, "flac")
    assert(meta.getString(0) === "flac")
    assert(f(0) === 2f && f(1) === 16000f && f(2) === 5000f && f(3) === 16f)
    assert(meta.getLong(4) === 5000L * 1000 / 16000)
    // 36-bit total-sample field: the high nibble shares byte 21 with bps
    val big = Multimodal.buildFlac(44100, 1, 24, (1L << 35) + 7)
    val (mB, fB) = codec.decode(big, "flac")
    assert(fB(3) === 24f && mB.getLong(4) === ((1L << 35) + 7) * 1000 / 44100)
    // truncation, bad magic, non-STREAMINFO first block: all null
    assert(codec.decode(b.take(41), "flac") === null)
    val badMagic = b.clone(); badMagic(0) = 'X'
    assert(codec.decode(badMagic, "flac") === null)
    val badType = b.clone(); badType(4) = 0x84.toByte // type 4 first
    assert(codec.decode(badType, "flac") === null)
  }

  test("PureJvmCodec: OGG Vorbis id header + last-page granule duration") {
    val codec = new Multimodal.PureJvmCodec()
    val b = Multimodal.buildOgg(rate = 24000, channels = 1,
      nominalBps = 66000, totalSamples = 9000L)
    val (meta, f) = codec.decode(b, "ogg")
    assert(meta.getString(0) === "ogg")
    assert(f(0) === 1f && f(1) === 24000f && f(2) === 9000f && f(3) === 66f)
    assert(meta.getLong(4) === 9000L * 1000 / 24000)
    // truncated to the BOS page alone: duration falls back to the
    // first page's granule (0), id fields still served
    val bosOnly = b.take(b.length - 27)
    val t = codec.decode(bosOnly, "ogg")
    assert(t != null && t._1.getLong(4) === 0L && t._2(1) === 24000f)
    // structural violations: bad capture, non-BOS first page, a
    // non-vorbis id packet, nonzero vorbis version
    val badCap = b.clone(); badCap(0) = 'X'
    assert(codec.decode(badCap, "ogg") === null)
    val notBos = b.clone(); notBos(5) = 0
    assert(codec.decode(notBos, "ogg") === null)
    val notVorbis = b.clone(); notVorbis(29) = 'x'
    assert(codec.decode(notVorbis, "ogg") === null)
    val badVer = b.clone(); badVer(35) = 1
    assert(codec.decode(badVer, "ogg") === null)
  }

  test("PureJvmCodec: JPEG SOF marker walk — dimensions/channels, loud nulls") {
    val codec = new Multimodal.PureJvmCodec()
    val b = Multimodal.buildJpegMeta(640, 480, 3)
    val (meta, f) = codec.decode(b, "jpeg")
    assert(meta.getString(0) === "jpeg")
    assert(meta.getInt(1) === 640 && meta.getInt(2) === 480)
    assert(f(0) === 640f && f(1) === 480f && f(2) === 3f && f(3) === 8f)
    // grayscale single-component frame
    val g = codec.decode(Multimodal.buildJpegMeta(31, 17, 1), "jpg")
    assert(g._2(2) === 1f && g._1.getInt(1) === 31 && g._1.getInt(2) === 17)
    // truncation anywhere in the marker stream is a null, never a guess
    assert(codec.decode(b.take(3), "jpeg") === null)
    assert(codec.decode(b.take(20), "jpeg") === null)  // mid-APP0
    assert(codec.decode(b.take(b.length - 12), "jpeg") === null) // mid-SOF
    // bad magic / mislabeled blob
    val badMagic = b.clone(); badMagic(1) = 0x00
    assert(codec.decode(badMagic, "jpeg") === null)
    assert(codec.decode(Multimodal.buildPng(4, 3, _ => 1), "jpeg") === null)
    // a marker byte that is not FF-led breaks the walk loudly
    val badMarker = b.clone(); badMarker(2) = 0x00
    assert(codec.decode(badMarker, "jpeg") === null)
    // SOS/EOI arriving before any SOF: no frame header to serve
    val sosFirst = b.clone()
    // overwrite the APP0 marker code with SOS (length bytes follow)
    sosFirst(3) = 0xDA.toByte
    assert(codec.decode(sosFirst, "jpeg") === null)
    // decompression-bomb guard: a 65k x 65k SOF canvas is refused
    // before anything downstream can size a buffer from it
    val bomb = Multimodal.buildJpegMeta(65535, 65535, 3)
    assert(codec.decode(bomb, "jpeg") === null)
    // a REAL entropy-complete JPEG still takes the pixel path: write
    // one through ImageIO and confirm features come from pixels (7
    // elements, sum_rgb > 0 — the meta tier would put 0 at index 5)
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 5).foreach(x =>
      img.setRGB(x, y, 0x808080)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val real = codec.decode(bos.toByteArray, "jpg")
    assert(real._1.getInt(1) === 5 && real._1.getInt(2) === 4)
    assert(real._2(5) > 0f, "real JPEG must decode pixels, not fall to meta")
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
    // avi has no real decoder in the tier (yet) — it must fall through
    // to the deterministic stub; mp4/webp/tiff/mkv used to sit here
    // and graduated to real box/RIFF/IFD/EBML walks
    val viaStub = codec.decode("opaque".getBytes, "avi")
    assert(viaStub != null && viaStub._2.length === 16)          // stub dim
    // and the same garbage bytes under the REAL mp4/mkv decoders are
    // loud nulls, not stub answers
    assert(codec.decode("opaque".getBytes, "mp4") === null)
    assert(codec.decode("opaque".getBytes, "mkv") === null)
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

  test("PureJvmCodec: GIF logical screen descriptor — LE dims, palette size, loud nulls") {
    val codec = new Multimodal.PureJvmCodec()
    val b = Multimodal.buildGif(320, 200, palBits = 5, v89 = true)
    val (meta, f) = codec.decode(b, "gif")
    assert(meta.getString(0) === "gif")
    assert(meta.getInt(1) === 320 && meta.getInt(2) === 200)
    assert(f(0) === 320f && f(1) === 200f)
    assert(f(2) === 32f, "palette = 2^palBits entries")
    assert(f(3) === 89f && f(4) === 1f)
    // GIF87a variant
    val g87 = codec.decode(Multimodal.buildGif(7, 9, 1, v89 = false), "gif")
    assert(g87._2(3) === 87f && g87._2(2) === 2f)
    // dims are LITTLE endian: width 0x0140 must not read as 0x4001
    assert(meta.getInt(1) !== 0x4001)
    // truncation: header cut, and a declared GCT the blob can't hold
    assert(codec.decode(b.take(5), "gif") === null)
    assert(codec.decode(b.take(12), "gif") === null)
    assert(codec.decode(b.take(13 + 10), "gif") === null) // mid-GCT
    // bad magic / mislabeled blob
    val badMagic = b.clone(); badMagic(4) = '8'.toByte
    assert(codec.decode(badMagic, "gif") === null)
    assert(codec.decode(Multimodal.buildPng(4, 3, _ => 1), "gif") === null)
    // zero dims refused
    val zeroW = b.clone(); zeroW(6) = 0; zeroW(7) = 0
    assert(codec.decode(zeroW, "gif") === null)
    // bomb guard: 65535 x 65535 logical screen refused
    val bomb = Multimodal.buildGif(65535, 65535, 1, v89 = true)
    assert(codec.decode(bomb, "gif") === null)
  }

  test("PureJvmCodec: MP4 box walk — mvhd v0/v1, first nonzero tkhd, loud nulls") {
    val codec = new Multimodal.PureJvmCodec()
    val b = Multimodal.buildMp4(640, 360, timescale = 1000,
      durationUnits = 90000L, nTracks = 2, v1 = false)
    val (meta, f) = codec.decode(b, "mp4")
    assert(meta.getString(0) === "mp4")
    assert(meta.getInt(1) === 640 && meta.getInt(2) === 360)
    assert(meta.getInt(3) === 2, "n_frames slot carries track count")
    assert(meta.getLong(4) === 90000L, "90000 units at 1000 Hz = 90000 ms")
    assert(f(2) === 2f && f(3) === 1000f && f(4) === 90000f)
    // v1 (64-bit FullBox) layout must land the same duration_ms
    val v1 = codec.decode(Multimodal.buildMp4(640, 360, 3000, 270000L, 1,
      v1 = true), "mp4")
    assert(v1._1.getLong(4) === 90000L && v1._1.getInt(1) === 640)
    // .mov/.m4v dispatch aliases hit the same walk
    assert(codec.decode(b, "mov")._1.getInt(1) === 640)
    // truncation at every structural depth nulls out
    assert(codec.decode(b.take(7), "mp4") === null)
    assert(codec.decode(b.take(40), "mp4") === null)    // mid-moov
    assert(codec.decode(b.take(b.length - 4), "mp4") === null) // torn moov
    // first box must be ftyp
    val noFtyp = b.clone(); noFtyp(4) = 'x'.toByte
    assert(codec.decode(noFtyp, "mp4") === null)
    // a box size smaller than its own header is refused
    val badSize = b.clone(); badSize(0) = 0; badSize(1) = 0; badSize(2) = 0; badSize(3) = 4
    assert(codec.decode(badSize, "mp4") === null)
    // odd timescale: duration_ms is integer-truncated from mvhd units
    val audio = codec.decode(Multimodal.buildMp4(1, 1, 8000, 16001L, 1,
      v1 = false), "mp4")
    assert(audio._1.getLong(4) === 2000L, "16001*1000/8000 truncates to 2000")
  }

  test("PureJvmCodec: JPEG EXIF orientation in both byte orders; torn EXIF degrades, not nulls") {
    val codec = new Multimodal.PureJvmCodec()
    for (o <- 1 to 8; be <- Seq(false, true)) {
      val r = codec.decode(
        Multimodal.buildJpegMeta(100, 80, 3, orientation = o,
          exifBigEndian = be), "jpeg")
      assert(r._1.getInt(1) === 100 && r._1.getInt(2) === 80)
      assert(r._2(4) === o.toFloat, s"o=$o be=$be")
      assert(r._2(5) === (if (be) 2f else 1f))
    }
    // no EXIF segment: orientation absent (0), image still decodes
    val plain = codec.decode(Multimodal.buildJpegMeta(100, 80, 3), "jpeg")
    assert(plain._2(4) === 0f && plain._2(5) === 0f)
    // torn EXIF (TIFF truncated mid-IFD by shrinking the APP1 length)
    // degrades to absent — an optional attachment must not null a
    // structurally sound image
    val b = Multimodal.buildJpegMeta(100, 80, 3, orientation = 6)
    val app1 = b.indexOfSlice("Exif".getBytes("US-ASCII")) - 4 // marker pos
    assert((b(app1) & 0xFF) === 0xFF && (b(app1 + 1) & 0xFF) === 0xE1)
    val torn = b.clone()
    // keep "Exif\0\0" + TIFF header + IFD count, cut the entries: the
    // walk sees a count whose entries escape the segment
    torn(app1 + 2) = 0; torn(app1 + 3) = 18
    // splice out the now-orphaned tail so the next marker follows the
    // shortened segment
    val spliced = torn.take(app1 + 2 + 18) ++ b.drop(app1 + 2 +
      (((b(app1 + 2) & 0xFF) << 8) | (b(app1 + 3) & 0xFF)))
    val t = codec.decode(spliced, "jpeg")
    assert(t !== null, "torn EXIF must not null the image")
    assert(t._2(4) === 0f, "torn EXIF reads as absent")
    // out-of-range orientation value reads as absent
    val bad = b.clone()
    val oIdx = { // value field of tag 274 (II): after tag,type,count
      val tiff0 = app1 + 10
      tiff0 + 8 + 2 + 8 // header + count + (tag 2, type 2, count 4)
    }
    bad(oIdx) = 9 // invalid: EXIF range is 1..8
    val rb = codec.decode(bad, "jpeg")
    assert(rb._2(4) === 0f)
  }

  test("PureJvmCodec: WebM — EBML vints, unknown-length Segment, float duration") {
    val codec = new Multimodal.PureJvmCodec()
    // minimal + wide-vint/unknown-Segment encodings of the same movie
    // must decode identically
    Seq(false, true).foreach { wide =>
      val r = codec.decode(Multimodal.buildWebm(640, 360, 1000000L,
        25000.0, 2, wideSizes = wide), "webm")
      assert(r._1.getString(0) === "webm", s"wide=$wide")
      assert(r._1.getInt(1) === 640 && r._1.getInt(2) === 360)
      assert(r._1.getInt(3) === 2 && r._1.getLong(4) === 25000L)
      assert(r._2(3) === 1000000f)
    }
    // non-default timescale: 500000 ns ticks halve the ms duration,
    // odd tick counts truncate
    val halfTick = codec.decode(Multimodal.buildWebm(64, 48, 500000L,
      30001.0, 1, wideSizes = false), "mkv")
    assert(halfTick._1.getLong(4) === 15000L)
    // float32 duration path (fixture writes float64): hand-build
    def el(id: Array[Byte], body: Array[Byte]): Array[Byte] =
      id ++ Array((0x80 | body.length).toByte) ++ body
    val f32 = java.lang.Float.floatToIntBits(2500f)
    val info32 = el(Array(0x15, 0x49, 0xA9, 0x66).map(_.toByte),
      el(Array(0x44.toByte, 0x89.toByte), Array(
        (f32 >> 24).toByte, (f32 >> 16).toByte, (f32 >> 8).toByte, f32.toByte)))
    val base = Multimodal.buildWebm(32, 24, 1000000L, 1.0, 1, wideSizes = false)
    // splice: header + segment(id+size) rebuilt with info32 + tracks
    // is overkill — instead decode a fresh build and check default
    // timescale applies when TimecodeScale is absent
    val headerOnly = base.take(
      4 + 1 + (2 + 1 + 4)) // EBML el: id(4) size(1) docEl(id 2 + size 1 + "webm")
    val tracksStart = base.indexOfSlice(Seq(0x16, 0x54, 0xAE, 0x6B).map(_.toByte))
    val tracksBytes = base.drop(tracksStart)
    val segBody = info32 ++ tracksBytes
    val seg = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte) ++
      Array((0x80 | segBody.length).toByte) ++ segBody
    val spliced = codec.decode(headerOnly ++ seg, "webm")
    assert(spliced._1.getLong(4) === 2500L,
      "float32 duration + default 1e6 timescale")
    // audio-only movie (no Video element anywhere) nulls: no dims
    val audioOnly = {
      val b = Multimodal.buildWebm(8, 8, 1000000L, 100.0, 1, wideSizes = false)
      // blank the Video element id (0xE0) into a skipped unknown id
      val i = b.indexOfSlice(Seq(0xE0.toByte))
      b.updated(i, 0xEC.toByte) // Void element: legal, ignored
    }
    assert(codec.decode(audioOnly, "webm") === null)
    // bad DocType, truncation, torn size vint
    val badDoc = Multimodal.buildWebm(8, 8, 1000000L, 100.0, 1, false)
    val di = badDoc.indexOfSlice("webm".getBytes("US-ASCII"))
    badDoc(di) = 'x'.toByte
    assert(codec.decode(badDoc, "webm") === null)
    val ok = Multimodal.buildWebm(8, 8, 1000000L, 100.0, 1, false)
    assert(codec.decode(ok.take(ok.length - 3), "webm") === null)
    // a child size escaping its parent nulls (corrupt Info size)
    val esc = ok.clone()
    val infoIdx = esc.indexOfSlice(Seq(0x15, 0x49, 0xA9, 0x66).map(_.toByte))
    esc(infoIdx + 4) = 0xFE.toByte // size 0x7E > remaining payload
    assert(codec.decode(esc, "webm") === null)
    // bomb guard: giga-canvas refused
    assert(codec.decode(Multimodal.buildWebm(1 << 14, 1 << 13, 1000000L,
      10.0, 1, false), "webm") === null)
  }

  test("PureJvmCodec: AVIF — ispe/pixi out of meta/iprp/ipco, all three brands") {
    val codec = new Multimodal.PureJvmCodec()
    Seq(0, 1, 2).foreach { brand =>
      val r = codec.decode(Multimodal.buildAvif(512, 384, 3, 8, brand), "avif")
      assert(r._1.getString(0) === "avif")
      assert(r._1.getInt(1) === 512 && r._1.getInt(2) === 384)
      assert(r._2(2) === 3f && r._2(3) === 8f && r._2(4) === brand.toFloat)
    }
    // heic alias dispatches to the same walk
    val alias = codec.decode(Multimodal.buildAvif(16, 16, 1, 10, 2), "heic")
    assert(alias._1.getInt(1) === 16 && alias._2(3) === 10f)
    val b = Multimodal.buildAvif(512, 384, 3, 8, 0)
    // unknown major brand nulls
    val badBrand = b.clone(); badBrand(8) = 'x'.toByte
    assert(codec.decode(badBrand, "avif") === null)
    // truncation anywhere inside the meta tree nulls (torn ipco)
    assert(codec.decode(b.take(b.length - 20), "avif") === null)
    // a box size escaping its parent nulls
    val badSize = b.clone(); badSize(0) = 0; badSize(1) = 0
    badSize(2) = 0; badSize(3) = 4
    assert(codec.decode(badSize, "avif") === null)
    // missing ispe (ipco holds only pixi) nulls; missing pixi only
    // zeroes channels/depth
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ t.getBytes("US-ASCII") ++ body
    def fullbox(t: String, body: Array[Byte]): Array[Byte] =
      box(t, Array[Byte](0, 0, 0, 0) ++ body)
    val ftyp = box("ftyp", "avif".getBytes("US-ASCII") ++ be32(0) ++
      "avifmif1".getBytes("US-ASCII"))
    val pixiOnly = ftyp ++ fullbox("meta",
      box("iprp", box("ipco", fullbox("pixi", Array[Byte](1, 8)))))
    assert(codec.decode(pixiOnly, "avif") === null)
    val ispeOnly = ftyp ++ fullbox("meta",
      box("iprp", box("ipco", fullbox("ispe", be32(24) ++ be32(18)))))
    val io = codec.decode(ispeOnly, "avif")
    assert(io._1.getInt(1) === 24 && io._1.getInt(2) === 18)
    assert(io._2(2) === 0f && io._2(3) === 0f)
    // zero dims and giga-canvas refused
    val zero = ftyp ++ fullbox("meta",
      box("iprp", box("ipco", fullbox("ispe", be32(0) ++ be32(18)))))
    assert(codec.decode(zero, "avif") === null)
    val bomb = ftyp ++ fullbox("meta",
      box("iprp", box("ipco", fullbox("ispe", be32(1 << 20) ++ be32(1 << 12)))))
    assert(codec.decode(bomb, "avif") === null)
  }

  test("PureJvmCodec: WebP — VP8 lossy sync, VP8L bit-packing, VP8X canvas") {
    val codec = new Multimodal.PureJvmCodec()
    val lossy = codec.decode(Multimodal.buildWebp(320, 240, 0, alpha = false), "webp")
    assert(lossy._1.getString(0) === "webp")
    assert(lossy._1.getInt(1) === 320 && lossy._1.getInt(2) === 240)
    assert(lossy._2(2) === 0f && lossy._2(3) === 0f)
    val ll = codec.decode(Multimodal.buildWebp(1, 1, 1, alpha = true), "webp")
    assert(ll._1.getInt(1) === 1 && ll._1.getInt(2) === 1, "VP8L stores dims-1")
    assert(ll._2(2) === 1f && ll._2(3) === 1f)
    val x = codec.decode(Multimodal.buildWebp(70000, 2, 2, alpha = false), "webp")
    assert(x._1.getInt(1) === 70000, "VP8X canvas is 24-bit — beyond u16")
    assert(x._2(2) === 2f)
    // corrupted VP8 sync code nulls
    val b = Multimodal.buildWebp(320, 240, 0, alpha = false)
    val badSync = b.clone(); badSync(23) = 0
    assert(codec.decode(badSync, "webp") === null)
    // VP8L nonzero version nulls (reserved by spec)
    val lb = Multimodal.buildWebp(5, 5, 1, alpha = false)
    val badVer = lb.clone(); badVer(24) = (badVer(24) | 0xE0).toByte
    assert(codec.decode(badVer, "webp") === null)
    // RIFF size larger than the blob, wrong magic, truncation
    val badRiff = b.clone(); badRiff(4) = 0x7F.toByte; badRiff(5) = 0x7F.toByte
    assert(codec.decode(badRiff, "webp") === null)
    val notWebp = b.clone(); notWebp(8) = 'A'.toByte
    assert(codec.decode(notWebp, "webp") === null)
    assert(codec.decode(b.take(19), "webp") === null)
    // bomb guard: VP8X can declare a giga-canvas — refused
    assert(codec.decode(Multimodal.buildWebp(1 << 20, 1 << 12, 2,
      alpha = false), "webp") === null)
  }

  test("PureJvmCodec: TIFF IFD walk — both byte orders, mixed SHORT/LONG") {
    val codec = new Multimodal.PureJvmCodec()
    val le = codec.decode(Multimodal.buildTiff(800, 600, 3, bigEndian = false), "tiff")
    assert(le._1.getString(0) === "tiff")
    assert(le._1.getInt(1) === 800 && le._1.getInt(2) === 600)
    assert(le._2(2) === 3f && le._2(3) === 0f && le._2(4) === 5f)
    val be = codec.decode(Multimodal.buildTiff(800, 600, 1, bigEndian = true), "tif")
    assert(be._1.getInt(1) === 800 && be._1.getInt(2) === 600,
      "big-endian SHORT is left-justified in the value field")
    assert(be._2(3) === 1f)
    // wrong magic / torn IFD / truncation
    val b = Multimodal.buildTiff(800, 600, 3, bigEndian = false)
    val badMagic = b.clone(); badMagic(2) = 43
    assert(codec.decode(badMagic, "tiff") === null)
    assert(codec.decode(b.take(7), "tiff") === null)
    assert(codec.decode(b.take(b.length - 6), "tiff") === null) // mid-entries
    val badIfd = b.clone(); badIfd(4) = 0x7F.toByte
    assert(codec.decode(badIfd, "tiff") === null)
    // a file with no width/height tags is refused
    val pngBytes = Multimodal.buildPng(4, 3, _ => 1)
    assert(codec.decode(pngBytes, "tiff") === null)
    // bomb guard
    assert(codec.decode(Multimodal.buildTiff(65000, 65000, 1,
      bigEndian = false), "tiff") === null)
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
