package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sample-tier perceptual AUDIO fingerprinting — the audio member of
  * the near-dup family beside MinHash (text), IVF/sign-bit ANN
  * (embeddings) and dHash/pHash (images): a crawled multimodal
  * corpus dedups its audio by decoded-SAMPLE structure, not byte
  * equality (the same clip re-containered, re-companded through
  * G.711, or ADPCM-coded hashes differently as bytes but lands a few
  * bits apart as audio).
  *
  * The fingerprint is the pHash recipe transposed to time-frequency:
  *
  *   1. decode the WAV container to linear PCM through the ONE shared
  *      walker ([[Multimodal.walkWavSamples]] — PCM-16, A-law, mu-law
  *      and IMA-ADPCM all land here), with the pre-decode sample-count
  *      bomb guard;
  *   2. area-map the sample stream onto 256 buckets (8 time windows ×
  *      32 points; bucket t covers samples [t·n/256,
  *      max(t·n/256+1, (t+1)·n/256)) — the [[ImageHash]] grid rule in
  *      one dimension, every bucket nonempty at any clip length, mean
  *      as sum div count with JVM/DuckDB-agreeing truncation toward
  *      zero);
  *   3. per window, the quantized-integer DCT-II ([[ImageHash
  *      .dctBasisQ]], the SAME 8×32 basis — computed once, inlined
  *      into the oracle) gives 8 spectral coefficients: 8 windows ×
  *      8 frequencies = 64 ints, |coeff| <= 32·2^14·2^15 = 2^34,
  *      exact int64;
  *   4. bit b set iff coeff(b) exceeds the block's LOWER MEDIAN (the
  *      32nd smallest of the 64) — pHash's total integer rule, no
  *      float ever enters.
  *
  * Spectral signs survive the small sample perturbations (gain-ish
  * nudges, companding error) that flip any exact or first/last-sample
  * scheme, which is exactly the near-dup property the pairing needs.
  *
  * Scale shape: hashing is MAP-ONLY where the bytes live (one 64-bit
  * word out per clip). Pairing and persisted indexing REUSE the
  * banded-Hamming machinery verbatim — [[ImageHash.dhashPairs]] for
  * one-shot pairs and [[ImageHashIndex]] for the serve-many index are
  * hash-agnostic (they consume 64-bit words, not pixels).
  *
  * Reference has no counterpart (extension track); this closes the
  * near-dup family's last missing modality named by the r13 verdict.
  */
object AudioHash {

  /** 8 time windows × 32 area-mapped points each. */
  val Windows = 8
  val PointsPerWindow = 32

  /** Pre-decode sample-count cap (the audio decompression-bomb
    * guard): 16M samples ≈ 33 min at 8 kHz — far beyond any fixture,
    * small enough that one task never buffers more than 64 MB.
    */
  val MaxSamples: Long = 16L << 20

  /** 64-bit spectral fingerprint of a WAV blob; null on any decode
    * failure (garbage bytes, unknown codec, truncated blocks, bomb
    * guard) — kept as null, never a task failure, the [[ImageHash]]
    * degradation contract.
    */
  def audiohash64(bytes: Array[Byte]): java.lang.Long = {
    val samples = decodeSamples(bytes)
    if (samples == null || samples.length == 0) null
    else java.lang.Long.valueOf(hashFromSamples(samples))
  }

  /** 64-bit ENVELOPE fingerprint — the second, independent audio
    * word (dHash's gradient rule in amplitude space, where
    * [[audiohash64]] is pHash's spectral rule): mean |sample| over 65
    * area-mapped buckets, bit t set iff bucket t+1's envelope exceeds
    * bucket t's. Amplitude DYNAMICS are what the spectral signs
    * ignore, so the pair (envhash, audiohash) is a 128-bit two-view
    * fingerprint — exactly the dhash‖phash shape, which is what lets
    * the persisted AUDIO near-dup index reuse [[ImageHashIndex]]
    * verbatim (hash-agnostic, 4×32-bit bands, no digest-saturation
    * caveat) with combined-distance semantics.
    */
  def envhash64(bytes: Array[Byte]): java.lang.Long = {
    val samples = decodeSamples(bytes)
    if (samples == null || samples.length == 0) null
    else java.lang.Long.valueOf(envhashFromSamples(samples))
  }

  private def decodeSamples(bytes: Array[Byte]): Array[Int] = {
    val buf = new scala.collection.mutable.ArrayBuilder.ofInt
    val cr = Multimodal.walkWavSamples(bytes, MaxSamples)(buf += _)
    if (cr == null) null else buf.result()
  }

  /** The framed-DCT fold, exposed for spec-level equivalence checks
    * (a G.711 fixture decoded by hand must hash identically to the
    * same bytes through [[audiohash64]]).
    */
  private[operators] def hashFromSamples(s: Array[Int]): Long = {
    val n = s.length
    val nBuckets = Windows * PointsPerWindow
    // 1-D area mapping: integer division truncates toward zero in
    // BOTH engines (JVM / and DuckDB //), so negative bucket means
    // replay exactly
    // bucket bounds in Long: t·n overflows Int past n ≈ 2^31/256 ≈
    // 8.39M samples, which MaxSamples=16M admits (≈2 min of 44.1 kHz
    // stereo) — Int form crashed there; Long form matches the BIGINT
    // oracle at every admissible n
    val p = new Array[Long](nBuckets)
    var t = 0
    while (t < nBuckets) {
      val i0 = (t.toLong * n / nBuckets).toInt
      val i1 = math.max(i0 + 1, ((t + 1).toLong * n / nBuckets).toInt)
      var sum = 0L
      var i = i0
      while (i < i1) { sum += s(i); i += 1 }
      p(t) = sum / (i1 - i0)
      t += 1
    }
    // per-window spectral coefficients through the shared quantized
    // DCT basis: d(w·8 + u) = Σ_j T(u)(j)·p(w·32 + j)
    val d = new Array[Long](64)
    var w = 0
    while (w < Windows) {
      var u = 0
      while (u < Windows) {
        var acc = 0L
        var j = 0
        while (j < PointsPerWindow) {
          acc += ImageHash.dctBasisQ(u)(j) * p(w * PointsPerWindow + j)
          j += 1
        }
        d(w * Windows + u) = acc
        u += 1
      }
      w += 1
    }
    val median = d.sorted.apply(31)
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (d(b) > median) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** The amplitude-envelope fold behind [[envhash64]]. */
  private[operators] def envhashFromSamples(s: Array[Int]): Long = {
    val n = s.length
    val nb = 64 + 1 // adjacent compares: one extra bucket yields 64 bits
    val q = new Array[Long](nb)
    var t = 0
    while (t < nb) {
      // same Long form as hashFromSamples — 65·16M fits Int but the
      // two folds stay symmetric by contract
      val i0 = (t.toLong * n / nb).toInt
      val i1 = math.max(i0 + 1, ((t + 1).toLong * n / nb).toInt)
      var sum = 0L
      var i = i0
      while (i < i1) { sum += math.abs(s(i).toLong); i += 1 }
      q(t) = sum / (i1 - i0)
      t += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (q(b + 1) > q(b)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** (id, audiohash, envhash) per clip — map-only, one row per input
    * with ONE decode feeding both words, null hashes for undecodable
    * blobs (kept, so corpus accounting stays complete; filter
    * downstream). Only the `wav` container carries a sample tier
    * (mp3/flac/ogg stay metadata-tier by declared scope); other
    * formats degrade to null.
    */
  def audioHashes(df: DataFrame, idCol: String, bytesCol: String,
                  formatCol: String): DataFrame = {
    val schema = df.schema
    val idIdx = schema.fieldIndex(idCol)
    val bytesIdx = schema.fieldIndex(bytesCol)
    val formatIdx = schema.fieldIndex(formatCol)
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("audiohash", LongType),
      StructField("envhash", LongType)))
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val bytes =
          if (row.isNullAt(bytesIdx)) null else row.getAs[Array[Byte]](bytesIdx)
        val fmt = if (row.isNullAt(formatIdx)) null else row.getString(formatIdx)
        if (fmt == null || fmt.toLowerCase != "wav") Row(id, null, null)
        else {
          val samples = decodeSamples(bytes)
          if (samples == null || samples.length == 0) Row(id, null, null)
          else Row(id,
            java.lang.Long.valueOf(hashFromSamples(samples)),
            java.lang.Long.valueOf(envhashFromSamples(samples)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** All (a_id, b_id, dist) audio near-dup pairs with
    * hamming(h_a, h_b) <= maxBits — delegates to the hash-agnostic
    * banded-Hamming join ([[ImageHash.dhashPairs]]): same pigeonhole
    * completeness, same never-all-pairs plan.
    */
  def audiohashPairs(hashes: DataFrame, idCol: String, hashCol: String,
                     maxBits: Int = 3, nBands: Int = 4): DataFrame =
    ImageHash.dhashPairs(hashes, idCol, hashCol, maxBits, nBands)
}
