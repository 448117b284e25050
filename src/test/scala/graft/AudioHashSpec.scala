package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AudioHash, Multimodal}

class AudioHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("audiohashPairs == brute-force Hamming truth on the wav_near panel") {
    val blobs = Multimodal.synthMediaBlobs(
      spark.range(240L).select(col("id").as("doc_id")), "doc_id", "wav_near")
    val hashes = AudioHash.audioHashes(blobs, "id", "bytes", "format").cache()
    assert(hashes.filter(col("audiohash").isNull).count() === 0L)
    val got = AudioHash.audiohashPairs(hashes, "id", "audiohash",
        maxBits = 3, nBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val truth = hashes.select(col("id").as("a_id"), col("audiohash").as("ha"))
      .join(hashes.select(col("id").as("b_id"), col("audiohash").as("hb")),
        col("a_id") < col("b_id"))
      .withColumn("dist",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("dist") <= 3)
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth)
    assert(truth.nonEmpty, "the near panel must exercise real pairs")
    hashes.unpersist(blocking = false)
  }

  test("codec invariance: PCM-16 and mu-law containers of the SAME samples hash identically") {
    // pick samples that ARE exact G.711 codeword values: decode a
    // deterministic byte stream through the public mu-law table
    // arithmetic, then write those samples as plain PCM-16 — two
    // different containers (formats 1 and 7) carrying one stream
    def mulaw(uIn: Int): Int = { // the public ITU arithmetic
      val u = ~uIn & 0xFF
      var t = ((u & 0x0F) << 3) + 0x84
      t <<= (u & 0x70) >> 4
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }
    val n = 200
    val bytes = Array.tabulate(n)(i => (i * 37 + 11) % 256)
    val samples = bytes.map(mulaw)
    val pcm = Multimodal.buildWav(8000, n, samples(_))
    val g711 = Multimodal.buildWavG711(8000, n, aLaw = false, bytes(_))
    val hPcm = AudioHash.audiohash64(pcm)
    val hMu = AudioHash.audiohash64(g711)
    assert(hPcm != null && hMu != null)
    assert(hPcm === hMu, "container must not leak into the fingerprint")
    assert(AudioHash.envhash64(pcm) === AudioHash.envhash64(g711),
      "container must not leak into the envelope word either")
  }

  test("persisted audio index (ImageHashIndex reused on envhash‖audiohash): gate == brute combined truth") {
    import graft.operators.{Bucketing, ImageHashIndex}
    def cleanup(p: String): Unit =
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith(p))
        .foreach(Bucketing.dropTableAndLocation(spark, _))
    cleanup("aud")
    val blobs = Multimodal.synthMediaBlobs(
      spark.range(300L).select(col("id").as("doc_id")), "doc_id", "wav_near")
    val hashes = AudioHash.audioHashes(blobs, "id", "bytes", "format")
      .filter(col("audiohash").isNotNull && col("envhash").isNotNull)
      .select(col("id"), col("envhash"), col("audiohash")).cache()
    hashes.count()
    val corp = hashes.filter(col("id") % 5 =!= 0)
    val delta = hashes.filter(col("id") % 5 === 0)
    ImageHashIndex.buildImageIndex(corp, "id", "envhash", "audiohash",
      "aud", maxBits = 3, nBands = 4)
    val truth = delta.select(col("id").as("delta_id"), col("envhash").as("de"),
        col("audiohash").as("da"))
      .join(corp.select(col("id").as("index_id"), col("envhash").as("ce"),
          col("audiohash").as("ca")),
        (bit_count(col("de").bitwiseXOR(col("ce")))
          + bit_count(col("da").bitwiseXOR(col("ca")))) <= 3)
      .withColumn("dist",
        (bit_count(col("de").bitwiseXOR(col("ce")))
          + bit_count(col("da").bitwiseXOR(col("ca")))).cast("long"))
      .select("delta_id", "index_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = ImageHashIndex.gateImageMatches(spark, "aud", delta,
        "id", "envhash", "audiohash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth)
    assert(truth.nonEmpty, "the near panel must exercise real index matches")
    hashes.unpersist(blocking = false)
    cleanup("aud")
  }

  test("2x upsampling (sample duplication) leaves both fingerprint words unchanged") {
    // area-mapping normalizes the time axis: bucket t of a 2n-sample
    // clip covers exactly twice the range of bucket t at n samples,
    // so duplicating every sample (nearest-neighbor resampling to 2x
    // the rate) reproduces every bucket mean — the fingerprint hears
    // the waveform, not the sample rate. Holds EXACTLY when buckets
    // tile evenly; this is the designed robustness the near-dup use
    // case needs (the same clip re-encoded at a different rate).
    val n = 256 * 65 // multiple of both grid sizes: buckets tile exactly
    def s(i: Int): Int = ((i * 2503 + 7919) % 65536) - 32768
    val base = Multimodal.buildWav(8000, n, s)
    val up2 = Multimodal.buildWav(16000, 2 * n, i => s(i / 2))
    assert(AudioHash.audiohash64(base) === AudioHash.audiohash64(up2))
    assert(AudioHash.envhash64(base) === AudioHash.envhash64(up2))
  }

  test("ADPCM and A-law fixtures fingerprint non-null and deterministically") {
    val blobs = Multimodal.synthMediaBlobs(
      spark.range(40L).select(col("id").as("doc_id")), "doc_id", "wav_adpcm")
      .unionByName(Multimodal.synthMediaBlobs(
        spark.range(40L, 80L).select(col("id").as("doc_id")), "doc_id",
        "wav_alaw"))
    val h1 = AudioHash.audioHashes(blobs, "id", "bytes", "format")
      .orderBy("id").collect().map(r => (r.getLong(0), r.get(1)))
    assert(h1.forall(_._2 != null))
    val h2 = AudioHash.audioHashes(blobs, "id", "bytes", "format")
      .orderBy("id").collect().map(r => (r.getLong(0), r.get(1)))
    assert(h1.toSeq === h2.toSeq)
  }

  test("garbage, truncation, wrong format, empty and bomb blobs degrade to null") {
    // structural garbage
    assert(AudioHash.audiohash64("not a wav at all".getBytes) == null)
    assert(AudioHash.audiohash64(Array.emptyByteArray) == null)
    assert(AudioHash.audiohash64(null) == null)
    // a valid header whose data chunk claims bytes past the blob
    val good = Multimodal.buildWav(8000, 64, i => i * 100 - 3000)
    val truncated = good.take(good.length - 10)
    assert(AudioHash.audiohash64(truncated) == null)
    // zero samples: nothing to frame
    assert(AudioHash.audiohash64(Multimodal.buildWav(8000, 0, _ => 0)) == null)
    // bomb guard: a blob claiming more samples than MaxSamples is
    // refused BEFORE decode (nothing buffered)
    val bomb = Multimodal.buildWav(8000, (AudioHash.MaxSamples + 8).toInt,
      _ => 0)
    assert(AudioHash.audiohash64(bomb) == null)
    // non-wav formats stay metadata-tier: the hash column is null
    val mp3 = Multimodal.synthMediaBlobs(
      spark.range(5L).select(col("id").as("doc_id")), "doc_id", "mp3")
    assert(AudioHash.audioHashes(mp3, "id", "bytes", "format")
      .filter(col("audiohash").isNotNull).count() === 0L)
  }

  test("clips in the 8.4M–16.7M sample window hash without failure (Long bucket bounds)") {
    // t·n in Int overflows past n = 2^31/256 ≈ 8.39M, a length
    // MaxSamples=16M explicitly admits (~2 min of 44.1 kHz stereo);
    // the Int form crashed with ArrayIndexOutOfBounds here. The fold
    // must stay a total function over every admissible n.
    val n = 9_000_000
    def s(i: Int): Int = ((i * 2503 + 7919) % 65536) - 32768
    val blob = Multimodal.buildWav(44100, n, s)
    val h1 = AudioHash.audiohash64(blob)
    val e1 = AudioHash.envhash64(blob)
    assert(h1 != null && e1 != null)
    assert(h1 === AudioHash.audiohash64(blob), "fold must be deterministic")
  }

  test("a crafted chunk declaring len near 2^31 degrades to null, not a task failure") {
    // Int bound check `pos + 8 + len > b.length` wraps negative for
    // len = 0x7FFFFFF0, passing the check and then wrapping pos — a
    // ~60-byte hostile blob crashed the walker. Contract: null on any
    // structural violation.
    def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    val bomb =
      "RIFF".getBytes("US-ASCII") ++ le32(52) ++ "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++
        Array[Byte](1, 0, 1, 0) ++ le32(8000) ++ le32(16000) ++
        Array[Byte](2, 0, 16, 0) ++
        "data".getBytes("US-ASCII") ++ le32(0x7FFFFFF0) ++
        Array.fill[Byte](8)(0)
    assert(AudioHash.audiohash64(bomb) == null)
    assert(AudioHash.envhash64(bomb) == null)
  }

  test("the near panel's variant nudge lands a few bits apart, groups stay far") {
    val blobs = Multimodal.synthMediaBlobs(
      spark.range(40L).select(col("id").as("doc_id")), "doc_id", "wav_near")
    val hs = AudioHash.audioHashes(blobs, "id", "bytes", "format")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within a base group: distance 0..3 (the oracle-checked panel
    // property); across groups: essentially random 64-bit words
    val withinMax = (0L until 40L by 4).map { g =>
      (g until g + 4).combinations(2).map { case Seq(a, b) =>
        java.lang.Long.bitCount(hs(a) ^ hs(b)) }.max
    }.max
    assert(withinMax <= 6, s"within-group distances blew up: $withinMax")
    val acrossMin = (0L until 36L by 4).map(g =>
      java.lang.Long.bitCount(hs(g) ^ hs(g + 4))).min
    assert(acrossMin > 6, s"across-group distances collapsed: $acrossMin")
  }
}
