package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) as opaque `binary` columns plus typed
  * metadata, with decode/feature-extraction as per-partition batch
  * transforms.
  *
  * The actual codecs are STUBBED (this container ships no image/audio
  * libraries): `DeterministicStubCodec` derives pseudo-features from
  * the bytes so the Spark-side contract — schema, batch shape,
  * partition-level resource lifecycle, null handling — is real and
  * tested. A production deployment swaps in a codec binding (e.g.
  * javacpp/ffmpeg) behind the same `MediaCodec` trait; nothing else
  * changes.
  *
  * Scale notes: decode runs where the bytes already are (mapPartitions,
  * no shuffle); feature vectors are fixed-size float arrays so
  * downstream similarity/dedup reuse the Similarity operators; blob
  * columns should be size-capped upstream (`maxBytes` guard) so a
  * single 4 GiB video cannot OOM an executor task.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType)))

  /** Decoded per-media output: typed metadata + feature vector. */
  val DecodedType: StructType = StructType(Seq(
    StructField("meta", MediaMetaType),
    StructField("features", ArrayType(FloatType))))

  /** Partition-lifecycle codec: `open()` once per partition (model
    * weights, codec contexts), `decode` per blob, `close()` at end.
    */
  trait MediaCodec extends Serializable {
    def open(): Unit = ()
    def close(): Unit = ()
    /** @return (meta row values, feature vector) or null for undecodable */
    def decode(bytes: Array[Byte], format: String): (Row, Array[Float])
  }

  /** Deterministic fake: features are a seeded hash-derived vector,
    * metadata parsed from the first bytes. Stands in for a real
    * decoder — *** replace via the codec parameter in production ***.
    */
  final class DeterministicStubCodec(dim: Int = 16) extends MediaCodec {
    override def decode(bytes: Array[Byte], format: String): (Row, Array[Float]) = {
      if (bytes == null || bytes.isEmpty) return null
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val rnd = new scala.util.Random(h)
      val features = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      val meta = Row(format, bytes.length % 1920, bytes.length % 1080,
        1 + (bytes.length % 30), bytes.length.toLong)
      (meta, features)
    }
  }

  private def wavLeInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def wavLeShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** G.711 mu-law byte -> 16-bit linear PCM (the public Sun/ITU
    * reference arithmetic; pure function, so the oracle replays the
    * same expression over the fixture's byte formula).
    */
  private[operators] def mulawToLinear(uIn: Int): Int = {
    val u = ~uIn & 0xFF
    var t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte -> 16-bit linear PCM (same provenance). */
  private[operators] def alawToLinear(aIn: Int): Int = {
    val a = aIn ^ 0x55
    var t = (a & 0x0F) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  private val AdpcmStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val AdpcmIndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** RIFF/WAVE chunk walk + per-format sample decode, streamed into
    * `add` — the ONE definition of WAV decoding, shared by
    * [[PureJvmCodec]]'s feature fold and [[AudioHash]]'s spectral
    * fingerprint (which buffers the samples it frames). Handles
    * audioFormat 1 (16-bit PCM), 6 (A-law), 7 (mu-law) and 0x11
    * (IMA ADPCM, mono). Returns (channels, rate), or null on any
    * structural violation — bad lengths, truncated blocks, unknown
    * codes — or when the PRE-DECODE sample count (known exactly from
    * the chunk walk: dataLen/2 for PCM-16, dataLen for G.711,
    * blocks·(1 + 2·(blockAlign−4)) for ADPCM) exceeds `maxSamples`,
    * the audio analog of the image decoder's decompression-bomb
    * guard: nothing is decoded, let alone buffered, for a blob that
    * claims more samples than the caller will hold. ADPCM with >1
    * channel degrades to null (interleaved stereo words are out of
    * scope).
    */
  private[operators] def walkWavSamples(b: Array[Byte], maxSamples: Long)
                                       (add: Int => Unit): (Int, Int) = {
    if (b == null || b.length < 44 || b(0) != 'R' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
      b(10) != 'V' || b(11) != 'E') return null
    var pos = 12
    var audioFormat = 0
    var channels = 0
    var rate = 0
    var bits = 0
    var blockAlign = 0
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val len = wavLeInt(b, pos + 4)
      // bound check in Long: a declared len near 2^31 makes the Int
      // sum wrap negative, passing the check and then wrapping pos —
      // a ~60-byte crafted blob must degrade to null, not crash
      if (len < 0 || pos.toLong + 8 + len > b.length) return null
      if (id == "fmt ") {
        if (len < 16) return null
        audioFormat = wavLeShort(b, pos + 8)
        channels = wavLeShort(b, pos + 10)
        rate = wavLeInt(b, pos + 12)
        blockAlign = wavLeShort(b, pos + 20)
        bits = wavLeShort(b, pos + 22)
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = len
      }
      // advance in Long too (pos+8+len <= b.length proved above, so
      // the +1 alignment pad keeps the result within Int range)
      pos = (pos.toLong + 8 + len + (len & 1)).toInt // word-aligned
    }
    if (channels <= 0 || rate <= 0 || dataOff < 0) return null
    audioFormat match {
      case 1 => // 16-bit linear PCM
        if (bits != 16) return null
        val n = dataLen / 2
        if (n > maxSamples) return null
        var i = 0
        while (i < n) { add(wavLeShort(b, dataOff + i * 2).toShort.toInt); i += 1 }
      case 6 | 7 => // G.711 A-law / mu-law: one byte per sample
        if (bits != 8) return null
        if (dataLen > maxSamples) return null
        val dec: Int => Int = if (audioFormat == 6) alawToLinear else mulawToLinear
        var i = 0
        while (i < dataLen) { add(dec(b(dataOff + i) & 0xFF)); i += 1 }
      case 0x11 => // IMA ADPCM, mono blocks of blockAlign bytes
        if (channels != 1 || blockAlign < 5 || bits != 4) return null
        if (dataLen.toLong / blockAlign * (1L + 2L * (blockAlign - 4)) >
          maxSamples) return null
        var blk = dataOff
        while (blk + blockAlign <= dataOff + dataLen) {
          // 4-byte block header: int16 predictor (= sample 0), index
          var pred = wavLeShort(b, blk).toShort.toInt
          var idx = b(blk + 2) & 0xFF
          if (idx > 88) return null
          add(pred)
          var i = 0
          val nNibbles = (blockAlign - 4) * 2
          while (i < nNibbles) {
            val byte = b(blk + 4 + (i >> 1)) & 0xFF
            val nib = if ((i & 1) == 0) byte & 0x0F else (byte >> 4) & 0x0F
            val step = AdpcmStep(idx)
            var diff = step >> 3
            if ((nib & 1) != 0) diff += step >> 2
            if ((nib & 2) != 0) diff += step >> 1
            if ((nib & 4) != 0) diff += step
            pred = if ((nib & 8) != 0) pred - diff else pred + diff
            if (pred > 32767) pred = 32767
            if (pred < -32768) pred = -32768
            idx += AdpcmIndexAdj(nib)
            if (idx < 0) idx = 0
            if (idx > 88) idx = 88
            add(pred)
            i += 1
          }
          blk += blockAlign
        }
      case _ => return null
    }
    (channels, rate)
  }

  /** Real pure-JVM decoder for the formats that need no external
    * library — BMP (24-bit uncompressed), PPM (P6 binary), WAV (PCM
    * 16-bit) — with the deterministic stub as fallback for everything
    * else. Width/height/duration and the feature vector come from the
    * ACTUAL decoded payload: BMP rows are stored bottom-up with
    * 4-byte stride padding and BGR channel order, and the parser
    * undoes all three (the corner-pixel features in the oracle-checked
    * decode queries fail if any is mishandled).
    *
    * Image features (7): [width, height, r00, g00, b00, sum_rgb,
    * max_chan] — top-left pixel RGB plus whole-image channel sum/max.
    * Audio features (7): [channels, sample_rate, n_samples, s_first,
    * s_last, sum_abs, zero_crossings].
    * Sums stay < 2^24 for fixture-sized media so the float features
    * are integer-exact; production embeddings replace this extractor,
    * the parsing does not change.
    */
  final class PureJvmCodec(fallback: MediaCodec = new DeterministicStubCodec())
      extends MediaCodec {
    override def open(): Unit = fallback.open()
    override def close(): Unit = fallback.close()

    private def leInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    private def leShort(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

    private def imageFeatures(fmt: String, w: Int, h: Int,
                              rgb: (Int, Int) => (Int, Int, Int),
                              nBytes: Long): (Row, Array[Float]) = {
      var sum = 0L
      var maxC = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = rgb(x, y)
          sum += r + g + b
          if (r > maxC) maxC = r
          if (g > maxC) maxC = g
          if (b > maxC) maxC = b
          x += 1
        }
        y += 1
      }
      val (r0, g0, b0) = if (w > 0 && h > 0) rgb(0, 0) else (0, 0, 0)
      val meta = Row(fmt, w, h, 1, nBytes)
      (meta, Array[Float](w.toFloat, h.toFloat, r0.toFloat, g0.toFloat,
        b0.toFloat, sum.toFloat, maxC.toFloat))
    }

    /** 24bpp uncompressed BITMAPINFOHEADER BMP; null on anything else. */
    private def decodeBmp(b: Array[Byte]): (Row, Array[Float]) = {
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
      val dataOff = leInt(b, 10)
      val w = leInt(b, 18)
      val hRaw = leInt(b, 22)
      val bottomUp = hRaw > 0
      // math.abs(Int.MinValue) is still negative — reject explicitly
      if (hRaw == Int.MinValue) return null
      val h = math.abs(hRaw)
      val bpp = leShort(b, 28)
      val compression = leInt(b, 30)
      if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return null
      // stride in Long: w near 2^31/3 overflows Int and would produce a
      // negative stride that slips past the bounds guard below
      val strideL = ((w.toLong * 3 + 3) / 4) * 4
      if (dataOff < 0 || dataOff.toLong + strideL * h > b.length) return null
      val stride = strideL.toInt
      def rgb(x: Int, y: Int): (Int, Int, Int) = {
        val srcRow = if (bottomUp) h - 1 - y else y
        val o = dataOff + srcRow * stride + x * 3
        // stored B,G,R
        ((b(o + 2) & 0xFF), (b(o + 1) & 0xFF), (b(o) & 0xFF))
      }
      imageFeatures("bmp", w, h, rgb, b.length.toLong)
    }

    /** P6 binary PPM, maxval 255; null on anything else. */
    private def decodePpm(b: Array[Byte]): (Row, Array[Float]) = {
      if (b.length < 9 || b(0) != 'P' || b(1) != '6') return null
      // header = three whitespace-separated ints after "P6", then ONE
      // whitespace byte before the pixel payload ('#' comments allowed)
      var pos = 2
      val vals = new Array[Int](3)
      var vi = 0
      while (vi < 3) {
        while (pos < b.length &&
          (b(pos) == ' ' || b(pos) == '\n' || b(pos) == '\r' || b(pos) == '\t')) {
          pos += 1
          if (pos < b.length && b(pos) == '#') {
            while (pos < b.length && b(pos) != '\n') pos += 1
          }
        }
        var v = 0
        var any = false
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
          v = v * 10 + (b(pos) - '0'); pos += 1; any = true
        }
        if (!any) return null
        vals(vi) = v
        vi += 1
      }
      pos += 1 // the single whitespace after maxval
      val (w, h, maxv) = (vals(0), vals(1), vals(2))
      if (w <= 0 || h <= 0 || maxv != 255) return null
      if (pos.toLong + 3L * w * h > b.length) return null
      val dataOff = pos
      def rgb(x: Int, y: Int): (Int, Int, Int) = {
        val o = dataOff + (y * w + x) * 3
        ((b(o) & 0xFF), (b(o + 1) & 0xFF), (b(o + 2) & 0xFF))
      }
      imageFeatures("ppm", w, h, rgb, b.length.toLong)
    }

    /** RIFF/WAVE, PCM (format 1), 16-bit; null on anything else. */
    /** Streaming audio-feature fold shared by every WAV codec path:
      * (first, last, sum|s|, zero crossings) over the decoded sample
      * stream — no sample buffer is ever materialized, so decode
      * memory is O(1) regardless of blob length.
      */
    private final class SampleAcc {
      var n = 0L
      var first = 0
      var last = 0
      var sumAbs = 0L
      var zc = 0
      private var prevSign = 0
      def add(s: Int): Unit = {
        if (n == 0) first = s
        last = s
        sumAbs += math.abs(s)
        val sign = if (s > 0) 1 else if (s < 0) -1 else 0
        if (n > 0 && sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
        if (sign != 0) prevSign = sign
        n += 1
      }
    }

    /** RIFF/WAVE decode through the shared object-level walker
      * ([[Multimodal.walkWavSamples]] — also the sample source for
      * [[AudioHash]]'s spectral fingerprint): every codec path feeds
      * the same [[SampleAcc]] fold, so the feature row is
      * format-independent: (channels, rate, samples/channel, first,
      * last, sum|s|, zero crossings).
      */
    private def decodeWav(b: Array[Byte]): (Row, Array[Float]) = {
      val acc = new SampleAcc
      val cr = walkWavSamples(b, Long.MaxValue)(acc.add)
      if (cr == null) return null
      val (channels, rate) = cr
      val n = acc.n
      val durationMs = n * 1000L / channels / rate
      val meta = Row("wav", 0, 0, 1, durationMs)
      (meta, Array[Float](channels.toFloat, rate.toFloat, (n / channels).toFloat,
        acc.first.toFloat, acc.last.toFloat, acc.sumAbs.toFloat, acc.zc.toFloat))
    }

    /** MP3 frame-HEADER metadata — duration/bitrate without decoding
      * a single sample (the cheap corpus-audit tier for compressed
      * audio): skip a leading ID3v2 tag by its syncsafe length, then
      * walk consecutive MPEG-1/2/2.5 Layer III frame headers summing
      * per-frame samples and bytes. Bounded by the blob; any
      * structural violation (bad sync, reserved bitrate/rate codes,
      * frame past the end) stops the walk — metadata comes from the
      * frames actually validated. Features: (channels, rate,
      * samples, bitrate_kbps_mean, n_frames, 0, 0).
      */
    private def decodeMp3Meta(b: Array[Byte]): (Row, Array[Float]) = {
      var pos = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
          ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
        pos = 10 + sz
      }
      val brV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
      val brV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
      val srV1 = Array(44100, 48000, 32000)
      var nFrames = 0L
      var samples = 0L
      var rate = 0
      var channels = 0
      var brSum = 0L
      var ok = pos >= 0
      while (ok && pos + 4 <= b.length) {
        val h = ((b(pos) & 0xFF) << 24) | ((b(pos + 1) & 0xFF) << 16) |
          ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
        if ((h >>> 21) != 0x7FF) ok = false
        else {
          val verBits = (h >> 19) & 3      // 0=2.5, 2=MPEG2, 3=MPEG1
          val layerBits = (h >> 17) & 3    // 1 = Layer III
          val brIdx = (h >> 12) & 0xF
          val srIdx = (h >> 10) & 3
          val padding = (h >> 9) & 1
          val mode = (h >> 6) & 3          // 3 = mono
          if (verBits == 1 || layerBits != 1 || brIdx == 0 || brIdx == 15 ||
            srIdx == 3) ok = false
          else {
            val v1 = verBits == 3
            val br = (if (v1) brV1 else brV2)(brIdx) // kbit/s
            val sr = srV1(srIdx) / (verBits match {
              case 3 => 1; case 2 => 2; case _ => 4 })
            val spf = if (v1) 1152 else 576
            val frameLen = spf / 8 * br * 1000 / sr + padding
            if (frameLen <= 0 || pos + frameLen > b.length) ok = false
            else {
              nFrames += 1
              samples += spf
              rate = sr
              channels = if (mode == 3) 1 else 2
              brSum += br
              pos += frameLen
            }
          }
        }
      }
      if (nFrames == 0 || rate == 0) return null
      val durationMs = samples * 1000L / rate
      val meta = Row("mp3", 0, 0, 1, durationMs)
      (meta, Array[Float](channels.toFloat, rate.toFloat, samples.toFloat,
        (brSum / nFrames).toFloat, nFrames.toFloat, 0f, 0f))
    }

    /** FLAC STREAMINFO metadata — sample rate / channels / bit depth /
      * total samples (→ duration) from the mandatory first metadata
      * block, no frame decode (the corpus-audit tier, same mold as
      * [[decodeMp3Meta]]). The spec fixes STREAMINFO as the FIRST
      * block after the fLaC magic with a 34-byte body; anything else
      * (bad magic, wrong type/length, truncation) is a null, never a
      * guess. Features: (channels, rate, total_samples,
      * bits_per_sample, 0, 0, 0).
      */
    private def decodeFlacMeta(b: Array[Byte]): (Row, Array[Float]) = {
      if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') return null
      val btype = b(4) & 0x7F
      val blen = ((b(5) & 0xFF) << 16) | ((b(6) & 0xFF) << 8) | (b(7) & 0xFF)
      if (btype != 0 || blen != 34) return null
      val rate = ((b(18) & 0xFF) << 12) | ((b(19) & 0xFF) << 4) |
        ((b(20) & 0xFF) >>> 4)
      val channels = ((b(20) >> 1) & 0x7) + 1
      val bps = (((b(20) & 1) << 4) | ((b(21) & 0xFF) >>> 4)) + 1
      val total = ((b(21) & 0xFL) << 32) | ((b(22) & 0xFFL) << 24) |
        ((b(23) & 0xFFL) << 16) | ((b(24) & 0xFFL) << 8) | (b(25) & 0xFFL)
      if (rate <= 0) return null
      val durationMs = total * 1000L / rate
      val meta = Row("flac", 0, 0, 1, durationMs)
      (meta, Array[Float](channels.toFloat, rate.toFloat, total.toFloat,
        bps.toFloat, 0f, 0f, 0f))
    }

    /** OGG Vorbis metadata — channels / rate / nominal bitrate from
      * the identification header in the first (BOS) page, and
      * duration from the LAST page's granule position (total PCM
      * samples by Vorbis convention) found by a reverse capture-
      * pattern scan — the standard cheap duration estimate, no
      * packet decode. CRCs are not verified (audit tier reads
      * headers, it doesn't prove stream integrity). Any structural
      * violation → null. Features: (channels, rate, granule_samples,
      * nominal_kbps, 0, 0, 0).
      */
    private def decodeOggMeta(b: Array[Byte]): (Row, Array[Float]) = {
      def isCapture(p: Int): Boolean = p >= 0 && p + 27 <= b.length &&
        b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' &&
        b(p + 3) == 'S' && b(p + 4) == 0
      if (!isCapture(0) || (b(5) & 0x02) == 0) return null // first page = BOS
      val nSeg = b(26) & 0xFF
      val p = 27 + nSeg
      if (p + 30 > b.length) return null
      var payloadLen = 0
      var i = 0
      while (i < nSeg) { payloadLen += b(27 + i) & 0xFF; i += 1 }
      if (payloadLen < 30) return null
      def le32(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      if (b(p) != 1 || b(p + 1) != 'v' || b(p + 2) != 'o' || b(p + 3) != 'r' ||
        b(p + 4) != 'b' || b(p + 5) != 'i' || b(p + 6) != 's') return null
      if (le32(p + 7) != 0) return null // vorbis_version must be 0
      val channels = b(p + 11) & 0xFF
      val rate = le32(p + 12)
      val nominal = le32(p + 20)
      if (channels <= 0 || rate <= 0) return null
      // FORWARD page walk for the last granule: each page's extent is
      // derived from its own segment table, so an 'OggS\0' byte run
      // INSIDE a packet payload can never be mistaken for a page
      // header (the reverse-scan hazard: a payload-embedded capture
      // pattern would have its neighbors read as a garbage granule).
      // Still O(pages), no packet decode; trailing garbage stops the
      // walk and the last COMPLETE page's granule stands.
      var granule = 0L
      var off = 0
      var walking = true
      while (walking && isCapture(off)) {
        val ns = b(off + 26) & 0xFF
        if (off + 27 + ns > b.length) walking = false
        else {
          var pay = 0
          var j = 0
          while (j < ns) { pay += b(off + 27 + j) & 0xFF; j += 1 }
          val end = off + 27 + ns + pay
          if (end > b.length) walking = false
          else {
            var g = 0L
            var k = 0
            while (k < 8) { g |= (b(off + 6 + k) & 0xFFL) << (8 * k); k += 1 }
            if (g >= 0) granule = g // -1 = "no packets finish here"
            off = end
          }
        }
      }
      val durationMs = granule * 1000L / rate
      val meta = Row("ogg", 0, 0, 1, durationMs)
      (meta, Array[Float](channels.toFloat, rate.toFloat, granule.toFloat,
        (nominal / 1000).toFloat, 0f, 0f, 0f))
    }

    /** JPEG SOF metadata — dimensions / channels / sample precision
      * from the frame header, no entropy decode (the corpus-audit
      * tier, same mold as [[decodeFlacMeta]]): walk the marker
      * stream from SOI, skipping APPn/COM/DQT/DHT/... segments by
      * their big-endian lengths, to the first SOFn (any frame type
      * except DHT C4 / JPG C8 / DAC CC, which share the Cx range but
      * are not frames). A marker stream that reaches SOS or EOI
      * before any SOF, a fill-byte run off the end, a length field
      * past the buffer, or a canvas over the pixel cap is a null,
      * never a guess.
      *
      * EXIF: an APP1 segment opening "Exif\0\0" carries an embedded
      * TIFF whose IFD-0 tag 274 is the ORIENTATION a crawler must
      * honor before any pixel work (both byte orders; SHORT left-
      * justified in the value field — the [[decodeTiffMeta]] rule).
      * EXIF is an optional attachment, so a torn/malformed one
      * degrades to orientation 0 ("absent" — EXIF's valid range is
      * 1..8) rather than nulling an otherwise-sound image; the SOF
      * contract above stays the loud tier. Features: (width, height,
      * channels, precision_bits, orientation 0|1..8, exif_byte_order
      * 0=none|1=II|2=MM, 0).
      */
    private def decodeJpegMeta(b: Array[Byte]): (Row, Array[Float]) = {
      if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
        return null
      var orient = 0
      var exifOrder = 0
      // parse the APP1-embedded TIFF in [t0, end); any structural slip
      // leaves (orient, exifOrder) at absent
      def readExif(t0: Int, end: Int): Unit = {
        if (t0 + 8 > end) return
        val le =
          if (b(t0) == 'I' && b(t0 + 1) == 'I') true
          else if (b(t0) == 'M' && b(t0 + 1) == 'M') false
          else return
        def u16(o: Int): Int =
          if (le) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
          else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
        def u32(o: Int): Long =
          if (le) (u16(o) & 0xFFFFL) | ((u16(o + 2) & 0xFFFFL) << 16)
          else ((u16(o) & 0xFFFFL) << 16) | (u16(o + 2) & 0xFFFFL)
        if (u16(t0 + 2) != 42) return
        val ifd = u32(t0 + 4)
        if (ifd < 8 || t0 + ifd + 2 > end) return
        val i0 = t0 + ifd.toInt
        val n = u16(i0)
        if (i0 + 2 + 12 * n > end) return
        var i = 0
        while (i < n) {
          val e = i0 + 2 + 12 * i
          // tag 274 (Orientation), type 3 (SHORT), count 1; SHORT is
          // left-justified in the value field in BOTH byte orders
          if (u16(e) == 274 && u16(e + 2) == 3 && u32(e + 4) == 1L) {
            val v = u16(e + 8)
            if (v >= 1 && v <= 8) { orient = v; exifOrder = if (le) 1 else 2 }
          }
          i += 1
        }
      }
      var pos = 2
      while (pos + 2 <= b.length) {
        if ((b(pos) & 0xFF) != 0xFF) return null
        // fill bytes: any number of FFs may pad before a marker code
        while (pos + 1 < b.length && (b(pos + 1) & 0xFF) == 0xFF) pos += 1
        if (pos + 2 > b.length) return null
        val marker = b(pos + 1) & 0xFF
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) pos += 2 // standalone
        else if (marker == 0xD9 || marker == 0xDA) return null // EOI/SOS before SOF
        else {
          if (pos + 4 > b.length) return null
          val len = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
          if (len < 2 || pos + 2 + len > b.length) return null
          if (marker == 0xE1 && len >= 8 &&
            b(pos + 4) == 'E' && b(pos + 5) == 'x' && b(pos + 6) == 'i' &&
            b(pos + 7) == 'f' && b(pos + 8) == 0 && b(pos + 9) == 0)
            readExif(pos + 10, pos + 2 + len)
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (len < 8) return null
            val precision = b(pos + 4) & 0xFF
            val h = ((b(pos + 5) & 0xFF) << 8) | (b(pos + 6) & 0xFF)
            val w = ((b(pos + 7) & 0xFF) << 8) | (b(pos + 8) & 0xFF)
            val nc = b(pos + 9) & 0xFF
            if (w <= 0 || h <= 0 || nc <= 0 || len != 8 + 3 * nc) return null
            if (w.toLong * h > MaxImagePixels) return null // bomb guard
            return (Row("jpeg", w, h, 1, 0L),
              Array[Float](w.toFloat, h.toFloat, nc.toFloat,
                precision.toFloat, orient.toFloat, exifOrder.toFloat, 0f))
          }
          pos += 2 + len
        }
      }
      null
    }

    /** GIF87a/GIF89a header decode — the logical screen descriptor
      * right after the 6-byte magic: width/height as LITTLE-endian
      * u16 (GIF is the one LE format in this tier — BMP aside — the
      * others are network order), then the packed byte whose bit 7
      * flags a global color table and whose low 3 bits n size it as
      * 2^(n+1) entries. Same audit-tier contract as the JPEG walk:
      * truncation, bad magic, or zero dims null out; features carry
      * (w, h, palette entries, version87|89, gct flag, 0, 0).
      */
    private def decodeGifMeta(b: Array[Byte]): (Row, Array[Float]) = {
      if (b.length < 13) return null
      val magicOk = b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == '8'.toByte &&
        (b(4) == '7'.toByte || b(4) == '9'.toByte) && b(5) == 'a'.toByte
      if (!magicOk) return null
      val version = if (b(4) == '7'.toByte) 87 else 89
      val w = (b(6) & 0xFF) | ((b(7) & 0xFF) << 8)
      val h = (b(8) & 0xFF) | ((b(9) & 0xFF) << 8)
      if (w <= 0 || h <= 0) return null
      if (w.toLong * h > MaxImagePixels) return null // bomb guard
      val packed = b(10) & 0xFF
      val hasGct = (packed & 0x80) != 0
      val palette = if (hasGct) 1 << ((packed & 0x07) + 1) else 0
      // a declared global color table must actually fit in the blob
      // (3 bytes per entry after the 13-byte header)
      if (hasGct && 13 + 3 * palette > b.length) return null
      (Row("gif", w, h, 1, 0L),
        Array[Float](w.toFloat, h.toFloat, palette.toFloat,
          version.toFloat, if (hasGct) 1f else 0f, 0f, 0f))
    }

    /** ISO-BMFF (MP4/MOV) metadata walk — the video tier. Top-level
      * boxes are (u32 BE size, 4cc type) headers skipped by length;
      * size==1 upgrades to a u64 largesize, size==0 means
      * to-end-of-blob. Inside `moov` we read `mvhd` (timescale +
      * duration in timescale units → duration_ms) and scan each
      * `trak`'s `tkhd` (16.16 fixed-point presentation width/height;
      * audio tracks carry zeros, so the first NONZERO pair wins).
      * Both v0 (u32 times) and v1 (u64 times) FullBox layouts are
      * handled. No sample tables are touched — this is the same
      * header-audit contract as the JPEG/FLAC walks: corrupt sizes,
      * missing moov/mvhd, or a canvas past the pixel cap null out.
      * Features: (w, h, n_tracks, timescale, duration_units, 0, 0);
      * meta.n_frames carries the track count (frame counts live in
      * sample tables a metadata audit must not pay to read).
      */
    private def decodeMp4Meta(b: Array[Byte]): (Row, Array[Float]) = {
      def beInt(off: Int): Long =
        ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
          ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
      def beLong(off: Int): Long = (beInt(off) << 32) | beInt(off + 4)
      def fourcc(off: Int): String =
        new String(b, off, 4, "US-ASCII")
      // (payloadStart, boxEnd) for the box whose header starts at off,
      // or null when the header is torn / the size is absurd
      def boxBounds(off: Int, limit: Int): (Int, Int) = {
        if (off + 8 > limit) return null
        val sz = beInt(off)
        if (sz == 0) (off + 8, limit) // to-end
        else if (sz == 1) {
          if (off + 16 > limit) return null
          val lsz = beLong(off + 8)
          if (lsz < 16 || lsz > (limit - off).toLong) null
          else (off + 16, off + lsz.toInt)
        } else if (sz < 8 || sz > (limit - off).toLong) null
        else (off + 8, off + sz.toInt)
      }
      if (b.length < 16 || fourcc(4) != "ftyp") return null
      var timescale = 0L
      var durationUnits = -1L
      var nTracks = 0
      var w = 0
      var h = 0
      var pos = 0
      while (pos + 8 <= b.length) {
        val bb = boxBounds(pos, b.length)
        if (bb == null) return null
        val (payload, end) = bb
        if (fourcc(pos + 4) == "moov") {
          var cpos = payload
          while (cpos + 8 <= end) {
            val cb = boxBounds(cpos, end)
            if (cb == null) return null
            val (cpl, cend) = cb
            fourcc(cpos + 4) match {
              case "mvhd" =>
                if (cpl + 4 > cend) return null
                val v = b(cpl) & 0xFF
                if (v == 1) {
                  if (cpl + 32 > cend) return null
                  timescale = beInt(cpl + 20)
                  durationUnits = beLong(cpl + 24)
                } else {
                  if (cpl + 20 > cend) return null
                  timescale = beInt(cpl + 12)
                  durationUnits = beInt(cpl + 16)
                }
              case "trak" =>
                nTracks += 1
                var tpos = cpl
                while (tpos + 8 <= cend) {
                  val tb = boxBounds(tpos, cend)
                  if (tb == null) return null
                  val (tpl, tend) = tb
                  if (fourcc(tpos + 4) == "tkhd") {
                    if (tpl + 4 > tend) return null
                    val tv = b(tpl) & 0xFF
                    val wOff = if (tv == 1) tpl + 88 else tpl + 76
                    if (wOff + 8 > tend) return null
                    // 16.16 fixed point; fractional dims never appear
                    // in practice — truncate toward the integer part
                    val tw = (beInt(wOff) >> 16).toInt
                    val th = (beInt(wOff + 4) >> 16).toInt
                    if (w == 0 && h == 0 && tw > 0 && th > 0) {
                      w = tw; h = th
                    }
                  }
                  tpos = tend
                }
              case _ => () // udta/iods/free… skipped by length
            }
            cpos = cend
          }
        }
        pos = end
      }
      if (timescale <= 0L || durationUnits < 0L || nTracks == 0) return null
      if (w.toLong * h > MaxImagePixels) return null // bomb guard
      if (durationUnits > Long.MaxValue / 1000L) return null
      val durMs = durationUnits * 1000L / timescale
      (Row("mp4", w, h, nTracks, durMs),
        Array[Float](w.toFloat, h.toFloat, nTracks.toFloat,
          timescale.toFloat, durationUnits.toFloat, 0f, 0f))
    }

    /** WebP metadata decode — RIFF container ("RIFF" + LE u32 size +
      * "WEBP"), then ONE of the three first-chunk layouts:
      *   VP8␣ (lossy):   3-byte frame tag, 0x9D012A sync, then LE u16
      *                   pairs whose low 14 bits are width/height;
      *   VP8L (lossless): 0x2F signature then a LE u32 packing
      *                   width-1 (14 bits), height-1 (14 bits), an
      *                   alpha bit, and a 3-bit version that MUST be
      *                   zero;
      *   VP8X (extended): flags byte (bit 4 = alpha) + 24-bit LE
      *                   canvas width-1 / height-1.
      * Features: (w, h, variant 0|1|2, alpha, 0, 0, 0). Torn
      * container, wrong sync/signature, or nonzero VP8L version null
      * out — same loudness contract as the rest of the tier.
      */
    private def decodeWebpMeta(b: Array[Byte]): (Row, Array[Float]) = {
      if (b.length < 20) return null
      if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return null
      if (b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return null
      val riffSize = leInt(b, 4).toLong & 0xFFFFFFFFL
      if (riffSize + 8 > b.length) return null // declared size must fit
      val tag = new String(b, 12, 4, "US-ASCII")
      val csize = leInt(b, 16).toLong & 0xFFFFFFFFL
      val p = 20
      if (p + csize > b.length) return null
      var w = 0; var h = 0; var variant = -1; var alpha = 0
      tag match {
        case "VP8 " =>
          if (csize < 10) return null
          if ((b(p + 3) & 0xFF) != 0x9D || (b(p + 4) & 0xFF) != 0x01 ||
            (b(p + 5) & 0xFF) != 0x2A) return null
          w = leShort(b, p + 6) & 0x3FFF
          h = leShort(b, p + 8) & 0x3FFF
          variant = 0
        case "VP8L" =>
          if (csize < 5 || (b(p) & 0xFF) != 0x2F) return null
          val bits = leInt(b, p + 1).toLong & 0xFFFFFFFFL
          w = ((bits & 0x3FFF) + 1).toInt
          h = (((bits >> 14) & 0x3FFF) + 1).toInt
          alpha = ((bits >> 28) & 0x1).toInt
          if (((bits >> 29) & 0x7) != 0) return null // version must be 0
          variant = 1
        case "VP8X" =>
          if (csize < 10) return null
          val flags = b(p) & 0xFF
          alpha = (flags >> 4) & 0x1
          def le24(off: Int): Int = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
            ((b(off + 2) & 0xFF) << 16)
          w = le24(p + 4) + 1
          h = le24(p + 7) + 1
          variant = 2
        case _ => return null
      }
      if (w <= 0 || h <= 0) return null
      if (w.toLong * h > MaxImagePixels) return null // bomb guard
      (Row("webp", w, h, 1, 0L),
        Array[Float](w.toFloat, h.toFloat, variant.toFloat, alpha.toFloat,
          0f, 0f, 0f))
    }

    /** TIFF IFD-0 metadata walk, BOTH byte orders ("II" little / "MM"
      * big — the one format in this tier where endianness is data,
      * not spec). Header: order mark, magic 42, u32 offset to IFD0;
      * IFD: u16 entry count then 12-byte entries (tag, type, count,
      * value-or-offset). SHORT(3)/LONG(4) values with count==1 are
      * read inline from the value field — left-justified, so a
      * big-endian SHORT sits in the field's FIRST two bytes (getting
      * this wrong is the classic TIFF parser bug the spec warns
      * about). Tags read: 256 width, 257 height, 277 samples/pixel.
      * Features: (w, h, spp, endian 0|1, n_entries, 0, 0).
      */
    private def decodeTiffMeta(b: Array[Byte]): (Row, Array[Float]) = {
      if (b.length < 8) return null
      val le =
        if (b(0) == 'I' && b(1) == 'I') true
        else if (b(0) == 'M' && b(1) == 'M') false
        else return null
      def u16(off: Int): Int =
        if (le) leShort(b, off)
        else ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
      def u32(off: Int): Long =
        if (le) leInt(b, off).toLong & 0xFFFFFFFFL
        else ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
          ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
      if (u16(2) != 42) return null
      val ifd = u32(4)
      if (ifd < 8 || ifd + 2 > b.length) return null
      val off0 = ifd.toInt
      val n = u16(off0)
      if (n <= 0 || off0 + 2 + 12 * n + 4 > b.length) return null
      var w = 0L; var h = 0L; var spp = 1L
      var i = 0
      while (i < n) {
        val e = off0 + 2 + 12 * i
        val tag = u16(e)
        val typ = u16(e + 2)
        val count = u32(e + 4)
        // inline scalar reads only: SHORT is left-justified in the
        // 4-byte value field regardless of byte order
        val v: Long =
          if (count != 1L) -1L
          else if (typ == 3) u16(e + 8).toLong
          else if (typ == 4) u32(e + 8)
          else -1L
        if (v >= 0) tag match {
          case 256 => w = v
          case 257 => h = v
          case 277 => spp = v
          case _   => ()
        }
        i += 1
      }
      if (w <= 0 || h <= 0) return null
      if (w * h > MaxImagePixels) return null // bomb guard
      (Row("tiff", w.toInt, h.toInt, 1, 0L),
        Array[Float](w.toFloat, h.toFloat, spp.toFloat,
          if (le) 0f else 1f, n.toFloat, 0f, 0f))
    }

    /** AVIF/HEIF metadata walk — the modern-crawl IMAGE side of the
      * ISO-BMFF family ([[decodeMp4Meta]] is the movie side; the
      * difference is that still images hang their properties off a
      * `meta` FULLBOX, not `moov`): brand-checked `ftyp`, then
      * meta → iprp → ipco, reading the first `ispe` (image spatial
      * extents: u32 width/height after the FullBox header) and, when
      * present, `pixi` (u8 channel count + per-channel bit depth).
      * Same audit-tier contract: unknown brand, torn boxes at any
      * depth, a missing ispe, zero dims, or a canvas past the pixel
      * cap null out; a missing pixi only zeroes channels/depth (it is
      * optional in the wild). No item payloads (mdat) are touched.
      * Features: (w, h, channels, bit_depth, brand 0=avif|1=mif1|
      * 2=heic, 0, 0).
      */
    private def decodeAvifMeta(b: Array[Byte]): (Row, Array[Float]) = {
      def beInt(off: Int): Long =
        ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
          ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
      def beLong(off: Int): Long = (beInt(off) << 32) | beInt(off + 4)
      def fourcc(off: Int): String = new String(b, off, 4, "US-ASCII")
      // (payloadStart, boxEnd) — the decodeMp4Meta discipline: null on
      // torn headers or sizes that escape the enclosing box
      def boxBounds(off: Int, limit: Int): (Int, Int) = {
        if (off + 8 > limit) return null
        val sz = beInt(off)
        if (sz == 0) (off + 8, limit)
        else if (sz == 1) {
          if (off + 16 > limit) return null
          val lsz = beLong(off + 8)
          if (lsz < 16 || lsz > (limit - off).toLong) null
          else (off + 16, off + lsz.toInt)
        } else if (sz < 8 || sz > (limit - off).toLong) null
        else (off + 8, off + sz.toInt)
      }
      if (b.length < 16 || fourcc(4) != "ftyp") return null
      val brand = fourcc(8) match {
        case "avif" | "avis" => 0
        case "mif1" => 1
        case "heic" | "heix" => 2
        case _ => return null
      }
      var w = 0L; var h = 0L
      var channels = 0; var depth = 0
      var sawIspe = false
      // first ispe/pixi win — HEIF collections may carry per-item
      // properties; the audit reads the primary (first-listed) ones
      def walkIpco(from: Int, to: Int): Boolean = {
        var p = from
        while (p + 8 <= to) {
          val pb = boxBounds(p, to)
          if (pb == null) return false
          val (ppl, pend) = pb
          fourcc(p + 4) match {
            case "ispe" if !sawIspe =>
              if (ppl + 12 > pend) return false // FullBox vf + w + h
              w = beInt(ppl + 4); h = beInt(ppl + 8)
              sawIspe = true
            case "pixi" if channels == 0 =>
              if (ppl + 5 > pend) return false
              val n = b(ppl + 4) & 0xFF
              if (ppl + 5 + n > pend) return false
              channels = n
              if (n > 0) depth = b(ppl + 5) & 0xFF
            case _ => ()
          }
          p = pend
        }
        true
      }
      def walkIprp(from: Int, to: Int): Boolean = {
        var p = from
        while (p + 8 <= to) {
          val pb = boxBounds(p, to)
          if (pb == null) return false
          if (fourcc(p + 4) == "ipco" && !walkIpco(pb._1, pb._2)) return false
          p = pb._2
        }
        true
      }
      var pos = 0
      while (pos + 8 <= b.length) {
        val bb = boxBounds(pos, b.length)
        if (bb == null) return null
        val (payload, end) = bb
        if (fourcc(pos + 4) == "meta") {
          if (payload + 4 > end) return null // meta is a FullBox
          var cpos = payload + 4
          while (cpos + 8 <= end) {
            val cb = boxBounds(cpos, end)
            if (cb == null) return null
            if (fourcc(cpos + 4) == "iprp" && !walkIprp(cb._1, cb._2))
              return null
            cpos = cb._2
          }
        }
        pos = end
      }
      if (!sawIspe || w <= 0 || h <= 0) return null
      if (w * h > MaxImagePixels) return null // bomb guard
      (Row("avif", w.toInt, h.toInt, 1, 0L),
        Array[Float](w.toFloat, h.toFloat, channels.toFloat,
          depth.toFloat, brand.toFloat, 0f, 0f))
    }

    /** WebM/Matroska (EBML) metadata walk — the OTHER web video
      * container beside ISO-BMFF ([[decodeMp4Meta]]): variable-length
      * integers instead of fixed box headers. Element = (ID vint with
      * its length marker KEPT, size vint with the marker STRIPPED,
      * payload); an all-ones size means unknown-length (streamed
      * Matroska writes its Segment that way) and extends to the
      * enclosing limit. We check the EBML magic + DocType
      * webm/matroska, then inside Segment read Info's TimecodeScale
      * (uint ns/tick, default 1e6) and Duration (IEEE float32/64 in
      * ticks), and each Tracks/TrackEntry's Video PixelWidth/Height
      * (first nonzero wins — audio entries carry no Video element).
      * Cluster payloads are skipped by size, never parsed. Loudness:
      * bad magic/DocType, torn vints, sizes escaping the parent, a
      * missing Info/Duration, or a pixel-bomb canvas null out.
      * Features: (w, h, n_tracks, timecode_scale, duration_ticks
      * (truncated), 0, 0).
      */
    private def decodeWebmMeta(b: Array[Byte]): (Row, Array[Float]) = {
      // returns (value, nextOffset) or null on a torn/oversized vint;
      // keepMarker distinguishes ID reads from size reads
      def vint(off: Int, limit: Int, keepMarker: Boolean): (Long, Int) = {
        if (off >= limit) return null
        val first = b(off) & 0xFF
        if (first == 0) return null // > 8-byte vint: not EBML
        val n = Integer.numberOfLeadingZeros(first) - 24 + 1 // 1..8
        if (off + n > limit) return null
        var v = (if (keepMarker) first else first ^ (1 << (8 - n))).toLong
        var i = 1
        while (i < n) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
        (v, off + n)
      }
      // size whose value bits are ALL ones = unknown length
      def isUnknown(size: Long, encodedLen: Int): Boolean =
        size == (1L << (7 * encodedLen)) - 1
      def uint(from: Int, to: Int): Long = {
        if (to - from > 8) return -1L
        var v = 0L; var i = from
        while (i < to) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
        v
      }
      def float(from: Int, to: Int): Double = (to - from) match {
        case 4 => java.lang.Float.intBitsToFloat(uint(from, to).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(uint(from, to))
        case _ => Double.NaN
      }
      // walk `limit`-bounded children, calling f(id, payloadFrom,
      // payloadTo); returns false on structural violation
      def walk(from: Int, limit: Int)(f: (Long, Int, Int) => Boolean): Boolean = {
        var p = from
        while (p < limit) {
          val idR = vint(p, limit, keepMarker = true)
          if (idR == null) return false
          val szStart = idR._2
          val szR = vint(szStart, limit, keepMarker = false)
          if (szR == null) return false
          val encLen = szR._2 - szStart
          val end =
            if (isUnknown(szR._1, encLen)) limit
            else if (szR._1 > (limit - szR._2).toLong) return false
            else szR._2 + szR._1.toInt
          if (!f(idR._1, szR._2, end)) return false
          p = end
        }
        true
      }
      if (b.length < 8) return null
      var docTypeOk = false
      var scale = 1000000L // EBML default: 1 ms ticks
      var dur = Double.NaN
      var w = 0L; var h = 0L
      var nTracks = 0
      val ok = walk(0, b.length) {
        case (0x1A45DFA3L, f, t) => // EBML header
          walk(f, t) {
            case (0x4282L, df, dt) => // DocType
              val s = new String(b, df, dt - df, "US-ASCII")
              docTypeOk = s == "webm" || s == "matroska"
              true
            case _ => true
          }
        case (0x18538067L, f, t) => // Segment
          walk(f, t) {
            case (0x1549A966L, inf, int) => // Info
              walk(inf, int) {
                case (0x2AD7B1L, sf, st) =>
                  scale = uint(sf, st); scale > 0
                case (0x4489L, df, dt) =>
                  dur = float(df, dt); !dur.isNaN && dur >= 0
                case _ => true
              }
            case (0x1654AE6BL, trf, trt) => // Tracks
              walk(trf, trt) {
                case (0xAEL, tef, tet) => // TrackEntry
                  nTracks += 1
                  walk(tef, tet) {
                    case (0xE0L, vf, vt) => // Video
                      walk(vf, vt) {
                        case (0xB0L, pf, pt) =>
                          if (w == 0L) w = uint(pf, pt); w >= 0
                        case (0xBAL, pf, pt) =>
                          if (h == 0L) h = uint(pf, pt); h >= 0
                        case _ => true
                      }
                    case _ => true
                  }
                case _ => true
              }
            case _ => true // Clusters/SeekHead/etc: skipped by size
          }
        case _ => true
      }
      if (!ok || !docTypeOk) return null
      if (dur.isNaN || scale <= 0L || nTracks == 0) return null
      if (w <= 0L || h <= 0L) return null
      if (w * h > MaxImagePixels) return null // bomb guard
      val durMs = (dur * scale / 1e6).toLong
      (Row("webm", w.toInt, h.toInt, nTracks, durMs),
        Array[Float](w.toFloat, h.toFloat, nTracks.toFloat,
          scale.toFloat, dur.toFloat, 0f, 0f))
    }

    /** Pixel cap for compressed formats: a crafted IHDR/SOF claiming
      * a billion-pixel canvas must be rejected BEFORE any pixel
      * buffer is allocated (the decompression-bomb guard — the same
      * bounds-check discipline the BMP parser applies to its stride).
      */
    private val MaxImagePixels = 64L << 20

    /** PNG/JPEG through `javax.imageio` (public JDK, zero new deps).
      * Hardening for untrusted corpus bytes: (1) the blob's magic
      * must AGREE with its declared format — ImageIO content-sniffs,
      * and a mislabeled blob silently decoding as a different format
      * would skew per-format corpus stats; (2) dimensions are read
      * from the header via the ImageReader and capped before
      * `read()` allocates anything; (3) any reader exception (torn
      * IDAT, bad CRC, truncated entropy stream) degrades to null via
      * the dispatch's catch. Features are the same 7-element
      * extractor the uncompressed formats use, from the ACTUAL
      * decoded pixels — for PNG (lossless) the oracle predicts them
      * from the fixture formula exactly; JPEG is lossy, so its
      * verification is meta + roundtrip tests, not formulas.
      */
    private def decodeImageIo(b: Array[Byte], fmt: String): (Row, Array[Float]) = {
      val isPng = b.length >= 8 && (b(0) & 0xFF) == 0x89 &&
        b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte
      val isJpg = b.length >= 3 && (b(0) & 0xFF) == 0xFF &&
        (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF
      if (fmt == "png" && !isPng) return null
      if ((fmt == "jpg" || fmt == "jpeg") && !isJpg) return null
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) return null
          val img = reader.read(0)
          def rgb(x: Int, y: Int): (Int, Int, Int) = {
            val p = img.getRGB(x, y)
            ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
          }
          imageFeatures(fmt, w, h, rgb, b.length.toLong)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    }

    override def decode(bytes: Array[Byte], format: String): (Row, Array[Float]) = {
      if (bytes == null || bytes.isEmpty) return null
      val fmt = if (format == null) "" else format.toLowerCase
      // corpus bytes are untrusted: any parser slip (crafted header fields
      // that evade the bounds guards) must degrade to null, not fail the task
      try {
        fmt match {
          case "bmp" => decodeBmp(bytes)
          case "ppm" => decodePpm(bytes)
          case "wav" => decodeWav(bytes)
          case "mp3" => decodeMp3Meta(bytes)
          case "flac" => decodeFlacMeta(bytes)
          case "ogg" => decodeOggMeta(bytes)
          case "gif" => decodeGifMeta(bytes)
          case "mp4" | "mov" | "m4v" => decodeMp4Meta(bytes)
          case "avif" | "heic" | "heif" => decodeAvifMeta(bytes)
          case "webm" | "mkv" => decodeWebmMeta(bytes)
          case "webp" => decodeWebpMeta(bytes)
          case "tiff" | "tif" => decodeTiffMeta(bytes)
          case "png" => decodeImageIo(bytes, fmt)
          case "jpg" | "jpeg" =>
            // two tiers: full pixel decode when the entropy stream is
            // intact (features from actual pixels), else the SOF
            // metadata walk — a header-complete but payload-less or
            // payload-torn JPEG still yields dimensions/channels for
            // the corpus audit instead of vanishing as null
            val full =
              try decodeImageIo(bytes, fmt)
              catch { case scala.util.control.NonFatal(_) => null }
            if (full != null) full else decodeJpegMeta(bytes)
          case _     => fallback.decode(bytes, format)
        }
      } catch {
        case scala.util.control.NonFatal(_) => null
      }
    }
  }

  // ---- fixture builders: the inverse of the parsers, used by the
  // oracle-checked decode queries and tests to synthesize REAL media
  // bytes in-plan (no binary files in the container). Kept here so
  // builder and parser agree on one definition of the formats. ----

  /** 24bpp bottom-up BMP. `pix(k)` supplies channel k of the image in
    * TOP-DOWN row-major RGB order (k in [0, w*h*3)); the builder
    * reorders to the on-disk bottom-up BGR layout with stride padding.
    */
  def buildBmp(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, "dims must be positive")
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val out = new Array[Byte](54 + dataSize)
    def putLeInt(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def putLeShort(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLeInt(2, out.length); putLeInt(10, 54)
    putLeInt(14, 40); putLeInt(18, w); putLeInt(22, h)
    putLeShort(26, 1); putLeShort(28, 24); putLeInt(30, 0); putLeInt(34, dataSize)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val k = (y * w + x) * 3
        val o = 54 + (h - 1 - y) * stride + x * 3
        out(o + 2) = (pix(k) & 0xFF).toByte     // R
        out(o + 1) = (pix(k + 1) & 0xFF).toByte // G
        out(o) = (pix(k + 2) & 0xFF).toByte     // B
        x += 1
      }
      y += 1
    }
    out
  }

  /** P6 PPM, maxval 255; `pix(k)` as in [[buildBmp]] (PPM is already
    * top-down RGB, no padding).
    */
  def buildPpm(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, "dims must be positive")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var k = 0
    while (k < w * h * 3) { out(header.length + k) = (pix(k) & 0xFF).toByte; k += 1 }
    out
  }

  /** Minimal deterministic PNG: 8-bit RGB, filter 0 scanlines, one
    * IDAT whose zlib stream uses STORED deflate blocks — no
    * compressor involved, so the bytes are a pure function of the
    * pixels (any inflater, including ImageIO's, reads them), and the
    * fixture is as deterministic as [[buildBmp]]'s. `pix(k)` supplies
    * channel k in top-down row-major RGB order.
    */
  def buildPng(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, "dims must be positive")
    val bos = new java.io.ByteArrayOutputStream()
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
      .foreach(bos.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      bos.write((len >>> 24) & 0xFF); bos.write((len >>> 16) & 0xFF)
      bos.write((len >>> 8) & 0xFF); bos.write(len & 0xFF)
      val tb = typ.getBytes("US-ASCII")
      bos.write(tb, 0, tb.length)
      bos.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue
      bos.write(((c >>> 24) & 0xFF).toInt); bos.write(((c >>> 16) & 0xFF).toInt)
      bos.write(((c >>> 8) & 0xFF).toInt); bos.write((c & 0xFF).toInt)
    }
    val ihdr = new Array[Byte](13)
    def putBeInt(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >>> 24) & 0xFF).toByte; ihdr(off + 1) = ((v >>> 16) & 0xFF).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xFF).toByte; ihdr(off + 3) = (v & 0xFF).toByte
    }
    putBeInt(0, w); putBeInt(4, h)
    ihdr(8) = 8  // bit depth
    ihdr(9) = 2  // color type: truecolor RGB
    // ihdr(10..12) = 0: deflate compression, adaptive filter, no interlace
    chunk("IHDR", ihdr)
    // raw image stream: per scanline one filter byte (0 = None) + RGB
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    var off = 0
    while (y < h) {
      raw(off) = 0; off += 1
      var i = 0
      while (i < w * 3) {
        raw(off) = (pix(y * w * 3 + i) & 0xFF).toByte
        off += 1; i += 1
      }
      y += 1
    }
    // zlib wrapper: header, stored (uncompressed) deflate blocks of
    // <= 65535 bytes, Adler-32 of the raw stream
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01)
    var p = 0
    while (p < raw.length) {
      val n = math.min(65535, raw.length - p)
      val last = p + n >= raw.length
      z.write(if (last) 1 else 0)
      z.write(n & 0xFF); z.write((n >>> 8) & 0xFF)
      z.write((~n) & 0xFF); z.write(((~n) >>> 8) & 0xFF)
      z.write(raw, p, n)
      p += n
    }
    val ad = new java.util.zip.Adler32()
    ad.update(raw)
    val a = ad.getValue
    z.write(((a >>> 24) & 0xFF).toInt); z.write(((a >>> 16) & 0xFF).toInt)
    z.write(((a >>> 8) & 0xFF).toInt); z.write((a & 0xFF).toInt)
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Uncompressed YUV4MPEG2 (Y4M) motion fixture, colorspace `Cmono`
    * (one full-resolution luma plane per frame, no chroma): the
    * plain-text stream header, then `nFrames` frames each introduced
    * by its own `FRAME\n` marker — the mplayer/ffmpeg interchange
    * format, fully public and byte-deterministic. `lum(f, y, x)` in
    * [0, 255] supplies the luma plane, so the oracle replays every
    * pixel from the fixture formula (the buildBmp/buildWav
    * discipline lifted to the time axis).
    */
  def buildY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int, nFrames: Int,
               lum: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && fpsNum > 0 && fpsDen > 0 && nFrames >= 0,
      "bad y4m fixture params")
    val header =
      s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 Cmono\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + nFrames * (frameMark.length + w * h))
    header.copyToArray(out, 0)
    var pos = header.length
    var f = 0
    while (f < nFrames) {
      frameMark.copyToArray(out, pos)
      pos += frameMark.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(pos) = (lum(f, y, x) & 0xFF).toByte; pos += 1; x += 1 }
        y += 1
      }
      f += 1
    }
    out
  }

  /** Y4M stream walk, streaming each frame's LUMA plane into
    * `onFrame(w, h, frameIdx, lumaOffsetInBlob)` — the ONE definition of
    * Y4M decoding, shared by [[VideoHash]]'s spatiotemporal
    * fingerprint. Handles colorspaces `Cmono` (luma only), `C420*`
    * (chroma subsampled 2×2, skipped) and `C444` (full chroma,
    * skipped) — the fingerprint is luma-tier by design, matching
    * [[ImageHash]]'s BT.601 luma reduction. Returns
    * (w, h, nFrames, fpsNum, fpsDen), or null on any structural
    * violation — bad magic, malformed header tokens, truncated
    * frames — or when the PRE-DECODE total luma sample count
    * (nFrames·w·h, known exactly from the frame geometry and the
    * remaining byte count before any pixel is touched) exceeds
    * `maxLuma`, or the frame count exceeds `maxFrames` (the
    * decompression-bomb guards: VideoHash buffers O(nFrames)
    * reduced accumulators, so both axes are capped). All byte
    * arithmetic in Long — a crafted W/H near 2^31 must degrade to
    * null, never wrap (the walkWavSamples contract).
    */
  private[operators] def walkY4mFrames(b: Array[Byte], maxLuma: Long,
                                       maxFrames: Int)
                                      (onFrame: (Int, Int, Int, Int) => Unit)
      : (Int, Int, Int, Int, Int) = {
    val magic = "YUV4MPEG2"
    if (b == null || b.length < magic.length + 1) return null
    var i = 0
    while (i < magic.length) {
      if (b(i) != magic.charAt(i).toByte) return null
      i += 1
    }
    // header line: space-separated parameter tokens up to '\n'
    var hdrEnd = magic.length
    while (hdrEnd < b.length && b(hdrEnd) != '\n') hdrEnd += 1
    if (hdrEnd >= b.length) return null
    var w = -1L
    var h = -1L
    var fpsNum = -1L
    var fpsDen = -1L
    var chromaPerLuma = -1 // chroma bytes per luma byte, ×4 (mono=0, 420=2, 444=8)
    var p = magic.length
    while (p < hdrEnd) {
      if (b(p) != ' ') return null
      p += 1
      var tEnd = p
      while (tEnd < hdrEnd && b(tEnd) != ' ') tEnd += 1
      if (tEnd == p) return null
      val tok = new String(b, p, tEnd - p, "US-ASCII")
      def num(s: String): Long =
        if (s.nonEmpty && s.forall(c => c >= '0' && c <= '9') && s.length <= 10)
          s.toLong else -1L
      tok.charAt(0) match {
        case 'W' => w = num(tok.substring(1))
        case 'H' => h = num(tok.substring(1))
        case 'F' =>
          val parts = tok.substring(1).split(":", -1)
          if (parts.length != 2) return null
          fpsNum = num(parts(0)); fpsDen = num(parts(1))
        case 'C' =>
          val cs = tok.substring(1)
          chromaPerLuma =
            if (cs == "mono") 0
            else if (cs.startsWith("420")) 2
            else if (cs == "444") 8
            else return null // 422/alpha variants out of declared scope
        case 'I' | 'A' | 'X' => () // interlacing / aspect / comments: ignored
        case _ => return null
      }
      p = tEnd
    }
    if (chromaPerLuma < 0) chromaPerLuma = 2 // spec default is 420
    if (w <= 0 || h <= 0 || fpsNum <= 0 || fpsDen <= 0) return null
    if (w > (1L << 20) || h > (1L << 20)) return null
    val lumaBytes = w * h // <= 2^40, exact in Long
    val frameBytes = lumaBytes + lumaBytes * chromaPerLuma / 4
    val frameMark = 6L // "FRAME\n"
    // pre-decode bomb guard: frame count is exact from the byte
    // budget (every frame costs frameMark + frameBytes, parameters
    // on FRAME lines only add bytes), so cap BEFORE touching pixels
    val remaining = b.length.toLong - (hdrEnd + 1)
    val maxPossibleFrames = remaining / (frameMark + frameBytes)
    if (maxPossibleFrames > maxFrames ||
      maxPossibleFrames * lumaBytes > maxLuma) return null
    var pos = (hdrEnd + 1).toLong
    var f = 0
    while (pos < b.length) {
      // FRAME marker with optional parameters up to '\n'
      if (pos + 6 > b.length) return null
      if (b(pos.toInt) != 'F' || b(pos.toInt + 1) != 'R' ||
        b(pos.toInt + 2) != 'A' || b(pos.toInt + 3) != 'M' ||
        b(pos.toInt + 4) != 'E') return null
      var fe = pos + 5
      while (fe < b.length && b(fe.toInt) != '\n') fe += 1
      if (fe >= b.length) return null
      pos = fe + 1
      if (pos + frameBytes > b.length) return null
      onFrame(w.toInt, h.toInt, f, pos.toInt)
      pos += frameBytes
      f += 1
      if (f > maxFrames) return null // params-free recount exceeded: hostile
    }
    if (f == 0) return null
    (w.toInt, h.toInt, f, fpsNum.toInt, fpsDen.toInt)
  }

  /** Mono PCM-16 WAV at `rate` Hz; `sample(i)` in [-32768, 32767]. */
  def buildWav(rate: Int, n: Int, sample: Int => Int): Array[Byte] = {
    require(rate > 0 && n >= 0, "rate must be positive")
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def putLeInt(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def putLeShort(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLeInt(4, 36 + dataLen)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putLeInt(16, 16); putLeShort(20, 1); putLeShort(22, 1)
    putLeInt(24, rate); putLeInt(28, rate * 2); putLeShort(32, 2); putLeShort(34, 16)
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLeInt(40, dataLen)
    var i = 0
    while (i < n) { putLeShort(44 + i * 2, sample(i) & 0xFFFF); i += 1 }
    out
  }

  /** Mono G.711 WAV (audioFormat 6 = A-law, 7 = mu-law): one byte per
    * sample, `byteAt(i)` supplying the RAW companded byte — the
    * fixture chooses bytes directly, so the oracle replays the decode
    * table as arithmetic over the same byte formula (no encoder in
    * the loop to disagree about rounding).
    */
  def buildWavG711(rate: Int, n: Int, aLaw: Boolean,
                   byteAt: Int => Int): Array[Byte] = {
    require(rate > 0 && n >= 0, "rate must be positive")
    val out = new Array[Byte](44 + n)
    def putLeInt(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def putLeShort(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLeInt(4, 36 + n)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putLeInt(16, 16); putLeShort(20, if (aLaw) 6 else 7); putLeShort(22, 1)
    putLeInt(24, rate); putLeInt(28, rate); putLeShort(32, 1); putLeShort(34, 8)
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLeInt(40, n)
    var i = 0
    while (i < n) { out(44 + i) = (byteAt(i) & 0xFF).toByte; i += 1 }
    out
  }

  /** Mono IMA-ADPCM WAV (audioFormat 0x11), ONE block: 4-byte header
    * (predictor = sample 0, step index) + `nNibbles` 4-bit codes from
    * `nibAt(i)` (low nibble first). The decode is a sequential
    * clamped fold, so the oracle replays it as a recursive CTE over
    * the same nibble formula — fixture and parser share this one
    * definition of the block layout.
    */
  def buildWavAdpcm(rate: Int, predictor: Int, index: Int, nNibbles: Int,
                    nibAt: Int => Int): Array[Byte] = {
    require(rate > 0 && nNibbles >= 0 && nNibbles % 2 == 0,
      "rate must be positive, nNibbles even")
    require(index >= 0 && index <= 88, "step index must be in [0, 88]")
    val blockAlign = 4 + nNibbles / 2
    val out = new Array[Byte](44 + blockAlign)
    def putLeInt(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def putLeShort(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLeInt(4, 36 + blockAlign)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putLeInt(16, 16); putLeShort(20, 0x11); putLeShort(22, 1)
    putLeInt(24, rate); putLeInt(28, rate * blockAlign / (nNibbles + 1))
    putLeShort(32, blockAlign); putLeShort(34, 4)
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLeInt(40, blockAlign)
    putLeShort(44, predictor & 0xFFFF)
    out(46) = index.toByte
    out(47) = 0
    var i = 0
    while (i < nNibbles) {
      val lo = nibAt(i) & 0x0F
      val hi = nibAt(i + 1) & 0x0F
      out(48 + i / 2) = (lo | (hi << 4)).toByte
      i += 2
    }
    out
  }

  /** Deterministic MP3 fixture: `nFrames` valid MPEG-1 Layer III
    * frame headers (no padding, zeroed payload — the metadata parser
    * never reads past the header) behind an ID3v2 tag of `id3Len`
    * payload bytes. brIdx/srIdx index the public header tables.
    */
  def buildMp3(nFrames: Int, brIdx: Int, srIdx: Int,
               id3Len: Int = 16): Array[Byte] = {
    require(nFrames >= 0 && brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2,
      "bad mp3 fixture params")
    val brV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val srV1 = Array(44100, 48000, 32000)
    val frameLen = 1152 / 8 * brV1(brIdx) * 1000 / srV1(srIdx)
    val out = new Array[Byte](10 + id3Len + nFrames * frameLen)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 3; out(4) = 0; out(5) = 0
    out(6) = ((id3Len >> 21) & 0x7F).toByte; out(7) = ((id3Len >> 14) & 0x7F).toByte
    out(8) = ((id3Len >> 7) & 0x7F).toByte; out(9) = (id3Len & 0x7F).toByte
    var f = 0
    while (f < nFrames) {
      val off = 10 + id3Len + f * frameLen
      out(off) = 0xFF.toByte
      out(off + 1) = 0xFB.toByte                   // MPEG1, Layer III, no CRC
      out(off + 2) = ((brIdx << 4) | (srIdx << 2)).toByte // no padding
      out(off + 3) = 0xC0.toByte                   // mono
      f += 1
    }
    out
  }

  /** Deterministic FLAC fixture: fLaC magic + one last-flagged
    * STREAMINFO block (the spec's mandatory first block) carrying the
    * given stream parameters; min/max frame size and MD5 stay zero
    * ("unknown" per spec) — the metadata parser never reads frames.
    */
  def buildFlac(rate: Int, channels: Int, bps: Int,
                totalSamples: Long, blockSize: Int = 4096): Array[Byte] = {
    require(rate > 0 && rate < (1 << 20) && channels >= 1 && channels <= 8 &&
      bps >= 4 && bps <= 32 && totalSamples >= 0 && totalSamples < (1L << 36),
      "bad flac fixture params")
    val out = new Array[Byte](42)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last-metadata-block + type 0 (STREAMINFO)
    out(5) = 0; out(6) = 0; out(7) = 34
    out(8) = (blockSize >> 8).toByte; out(9) = blockSize.toByte
    out(10) = (blockSize >> 8).toByte; out(11) = blockSize.toByte
    out(18) = (rate >> 12).toByte
    out(19) = ((rate >> 4) & 0xFF).toByte
    out(20) = (((rate & 0xF) << 4) | ((channels - 1) << 1) |
      ((bps - 1) >> 4)).toByte
    out(21) = ((((bps - 1) & 0xF) << 4) | ((totalSamples >> 32) & 0xF).toInt).toByte
    out(22) = ((totalSamples >> 24) & 0xFF).toByte
    out(23) = ((totalSamples >> 16) & 0xFF).toByte
    out(24) = ((totalSamples >> 8) & 0xFF).toByte
    out(25) = (totalSamples & 0xFF).toByte
    out
  }

  /** Deterministic OGG Vorbis fixture: a BOS page carrying the
    * 30-byte identification header, then an empty EOS page whose
    * granule position is the stream's total-sample count (the field
    * duration estimation reads). Page CRCs stay zero — the metadata
    * parser doesn't verify them.
    */
  def buildOgg(rate: Int, channels: Int, nominalBps: Int,
               totalSamples: Long): Array[Byte] = {
    require(rate > 0 && channels >= 1 && channels <= 255 &&
      nominalBps >= 0 && totalSamples >= 0, "bad ogg fixture params")
    def page(headerType: Int, granule: Long, seq: Int,
             payload: Array[Byte]): Array[Byte] = {
      val nSeg = if (payload.isEmpty) 0 else 1
      require(payload.length < 255, "fixture payload must fit one segment")
      val out = new Array[Byte](27 + nSeg + payload.length)
      out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
      out(4) = 0 // stream structure version
      out(5) = headerType.toByte
      var i = 0
      while (i < 8) { out(6 + i) = ((granule >> (8 * i)) & 0xFF).toByte; i += 1 }
      out(14) = 1 // serial number (any constant)
      i = 0
      while (i < 4) { out(18 + i) = ((seq >> (8 * i)) & 0xFF).toByte; i += 1 }
      out(26) = nSeg.toByte
      if (nSeg == 1) out(27) = payload.length.toByte
      payload.copyToArray(out, 27 + nSeg)
      out
    }
    val id = new Array[Byte](30)
    id(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(id, 1)
    id(11) = channels.toByte
    var i = 0
    while (i < 4) { id(12 + i) = ((rate >> (8 * i)) & 0xFF).toByte; i += 1 }
    i = 0
    while (i < 4) { id(20 + i) = ((nominalBps >> (8 * i)) & 0xFF).toByte; i += 1 }
    id(28) = 0xB8.toByte // blocksize_0=2^8, blocksize_1=2^11
    id(29) = 1           // framing bit
    page(0x02, 0L, 0, id) ++ page(0x04, totalSamples, 1, Array.emptyByteArray)
  }

  /** Header-complete JPEG fixture: SOI, an APP0/JFIF segment, a COM
    * segment and a DQT stub (so the SOF walk has real segments to
    * skip), then a baseline SOF0 carrying the given geometry, then
    * EOI — no entropy-coded scan, which is exactly the shape the
    * metadata tier exists for (ImageIO cannot decode it; the SOF
    * walk must). Every SOF field is a pure function of the params,
    * so an external engine predicts the decode without a JPEG
    * library.
    */
  def buildJpegMeta(w: Int, h: Int, channels: Int,
                    orientation: Int = 0,
                    exifBigEndian: Boolean = false): Array[Byte] = {
    require(w > 0 && w < 65536 && h > 0 && h < 65536 &&
      channels >= 1 && channels <= 4 &&
      orientation >= 0 && orientation <= 8, "bad jpeg fixture params")
    val out = new java.io.ByteArrayOutputStream()
    def m(code: Int): Unit = { out.write(0xFF); out.write(code) }
    def seg(code: Int, body: Array[Byte]): Unit = {
      m(code)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      out.write(body, 0, body.length)
    }
    m(0xD8) // SOI
    seg(0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    if (orientation > 0) {
      // APP1 "Exif\0\0" + embedded TIFF: IFD-0 with software tag 305
      // (a LONG-typed decoy the reader must skip) and orientation 274
      // (SHORT, left-justified value field), tag-sorted as TIFF asks
      val tiff = new java.io.ByteArrayOutputStream()
      def p16(v: Int): Unit =
        if (exifBigEndian) { tiff.write((v >> 8) & 0xFF); tiff.write(v & 0xFF) }
        else { tiff.write(v & 0xFF); tiff.write((v >> 8) & 0xFF) }
      def p32(v: Long): Unit =
        if (exifBigEndian) { p16(((v >> 16) & 0xFFFF).toInt); p16((v & 0xFFFF).toInt) }
        else { p16((v & 0xFFFF).toInt); p16(((v >> 16) & 0xFFFF).toInt) }
      val oc = if (exifBigEndian) 'M' else 'I'
      tiff.write(oc); tiff.write(oc)
      p16(42); p32(8L) // IFD-0 right after the header
      p16(2)           // two entries
      p16(274); p16(3); p32(1L) // orientation, SHORT x1
      p16(orientation); p16(0)  // left-justified SHORT value
      p16(305); p16(4); p32(1L); p32(7L) // software: LONG decoy
      p32(0L) // next-IFD pointer
      seg(0xE1, "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
        tiff.toByteArray)
    }
    seg(0xFE, "graft fixture".getBytes("US-ASCII")) // COM
    seg(0xDB, new Array[Byte](65)) // DQT: pq/tq byte + 64 zero entries
    val sof = new Array[Byte](6 + 3 * channels)
    sof(0) = 8 // precision bits
    sof(1) = ((h >> 8) & 0xFF).toByte; sof(2) = (h & 0xFF).toByte
    sof(3) = ((w >> 8) & 0xFF).toByte; sof(4) = (w & 0xFF).toByte
    sof(5) = channels.toByte
    var c = 0
    while (c < channels) {
      sof(6 + 3 * c) = (c + 1).toByte // component id
      sof(7 + 3 * c) = 0x11           // 1x1 sampling
      sof(8 + 3 * c) = 0              // quant table 0
      c += 1
    }
    seg(0xC0, sof) // SOF0 (baseline)
    m(0xD9)        // EOI
    out.toByteArray
  }

  /** Deterministic media fixtures from an id column: REAL BMP/PPM/WAV
    * bytes whose dimensions, pixels and samples follow documented
    * id-indexed formulas, so an external engine can predict what a
    * correct decoder must extract without parsing the format itself:
    *
    *   image:  w = 4 + id%13, h = 3 + id%11,
    *           channel k (top-down row-major RGB) = (id*31 + k*7) % 256
    *   audio:  mono 8 kHz PCM-16, n = 32 + id%96 samples,
    *           sample i = (id*7919 + i*2503) % 65536 - 32768
    *
    * The decode queries pair this with [[PureJvmCodec]]: bytes are
    * built, round-tripped through the actual parser, and the oracle
    * recomputes the same features from the formulas — a wrong stride,
    * row order or channel order fails the hash.
    */
  /** Minimal valid GIF: magic + logical screen descriptor + (optional)
    * global color table + trailer. `palBits` in [1,8] sizes the table
    * at 2^palBits entries (the descriptor's low 3 bits store
    * palBits-1); `v89` picks GIF89a vs GIF87a.
    */
  def buildGif(w: Int, h: Int, palBits: Int, v89: Boolean): Array[Byte] = {
    require(w > 0 && w < 65536 && h > 0 && h < 65536 &&
      palBits >= 1 && palBits <= 8, "bad gif fixture params")
    val pal = 1 << palBits
    val out = new Array[Byte](13 + 3 * pal + 1)
    val magic = if (v89) "GIF89a" else "GIF87a"
    magic.getBytes("US-ASCII").copyToArray(out)
    out(6) = (w & 0xFF).toByte; out(7) = ((w >> 8) & 0xFF).toByte
    out(8) = (h & 0xFF).toByte; out(9) = ((h >> 8) & 0xFF).toByte
    out(10) = (0x80 | ((palBits - 1) & 0x07)).toByte // GCT flag + size
    out(11) = 0 // background color index
    out(12) = 0 // aspect
    var i = 0
    while (i < 3 * pal) { out(13 + i) = ((i * 11) % 256).toByte; i += 1 }
    out(out.length - 1) = 0x3B.toByte // trailer
    out
  }

  /** Minimal ISO-BMFF blob: ftyp + a `free` box (exercises the
    * skip-by-length path) + moov{mvhd, nTracks×trak{tkhd}, udta}.
    * The FIRST trak carries the video dimensions (16.16 fixed); the
    * rest are audio-like all-zero-dims tracks. `v1` selects the
    * 64-bit FullBox layout for both mvhd and tkhd.
    */
  def buildMp4(w: Int, h: Int, timescale: Int, durationUnits: Long,
               nTracks: Int, v1: Boolean): Array[Byte] = {
    require(w > 0 && w < 65536 && h > 0 && h < 65536 && timescale > 0 &&
      durationUnits >= 0 && nTracks >= 1, "bad mp4 fixture params")
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val mvhd = {
      val times =
        if (v1) Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
          be32(timescale.toLong) ++ be64(durationUnits)
        else Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
          be32(timescale.toLong) ++ be32(durationUnits)
      // rate(4) volume(2) reserved(10) matrix(36) predefined(24) next(4)
      box("mvhd", times ++ be32(0x00010000L) ++ Array[Byte](1, 0) ++
        new Array[Byte](10) ++ identityMatrix ++ new Array[Byte](24) ++
        be32(nTracks + 1L))
    }
    def tkhd(tw: Int, th: Int, trackId: Int): Array[Byte] = {
      val head =
        if (v1) Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++
          be32(trackId.toLong) ++ be32(0) ++ be64(durationUnits)
        else Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
          be32(trackId.toLong) ++ be32(0) ++ be32(durationUnits)
      box("tkhd", head ++ new Array[Byte](8) ++ // reserved
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++  // layer/alt/volume/res
        identityMatrix ++
        be32(tw.toLong << 16) ++ be32(th.toLong << 16))
    }
    val traks = (1 to nTracks).map { t =>
      box("trak", tkhd(if (t == 1) w else 0, if (t == 1) h else 0, t))
    }
    val udta = box("udta", box("name", "graft fixture".getBytes("US-ASCII")))
    val moov = box("moov", (Seq(mvhd) ++ traks :+ udta).reduce(_ ++ _))
    out.write(box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isom".getBytes("US-ASCII")))
    out.write(box("free", new Array[Byte](12)))
    out.write(moov)
    out.toByteArray
  }

  /** Minimal WebM (EBML/Matroska): header with DocType "webm", then
    * a Segment holding Info (TimecodeScale ns/tick + Duration as a
    * BE float64 in ticks), Tracks (one video TrackEntry with
    * PixelWidth/Height plus `nTracks-1` audio entries carrying no
    * Video element), and an opaque Cluster the parser must skip by
    * size. `wideSizes` stresses the vint layer: sizes are encoded in
    * 2 bytes where 1 would do (legal EBML) and the Segment itself is
    * written UNKNOWN-length (the streamed-Matroska shape: size vint
    * all-ones, payload to end).
    */
  def buildWebm(w: Int, h: Int, timecodeScaleNs: Long, durationTicks: Double,
                nTracks: Int, wideSizes: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && timecodeScaleNs > 0 && durationTicks >= 0 &&
      nTracks >= 1, "bad webm fixture params")
    def beBytes(v: Long, n: Int): Array[Byte] =
      (1 to n).map(i => ((v >> (8 * (n - i))) & 0xFF).toByte).toArray
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      beBytes(id, n)
    }
    def sizeVint(sz: Int, wide: Boolean): Array[Byte] = {
      require(sz <= 0x3FFE, "fixture sizes are <= 2-byte vints")
      if (!wide && sz < 0x7F) Array((0x80 | sz).toByte)
      else Array((0x40 | (sz >> 8)).toByte, (sz & 0xFF).toByte)
    }
    def el(id: Long, body: Array[Byte], wide: Boolean = false): Array[Byte] =
      idBytes(id) ++ sizeVint(body.length, wide) ++ body
    def uintBody(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      beBytes(v, n)
    }
    val header = el(0x1A45DFA3L,
      el(0x4282L, "webm".getBytes("US-ASCII"), wideSizes))
    val info = el(0x1549A966L,
      el(0x2AD7B1L, uintBody(timecodeScaleNs)) ++
        el(0x4489L, beBytes(
          java.lang.Double.doubleToLongBits(durationTicks), 8), wideSizes))
    val video = el(0xAEL,
      el(0x83L, uintBody(1L)) ++
        el(0xE0L, el(0xB0L, uintBody(w.toLong), wideSizes) ++
          el(0xBAL, uintBody(h.toLong))))
    val audios = (2 to nTracks).map(_ =>
      el(0xAEL, el(0x83L, uintBody(2L)) ++ el(0x86L,
        "A_OPUS".getBytes("US-ASCII"))))
    val tracks = el(0x1654AE6BL, (video +: audios).reduce(_ ++ _))
    val cluster = el(0x1F43B675L, Array.fill[Byte](6)(0x5A))
    val segBody = info ++ tracks ++ cluster
    val segment =
      if (wideSizes) // unknown-length Segment: all-ones 1-byte size
        idBytes(0x18538067L) ++ Array(0xFF.toByte) ++ segBody
      else el(0x18538067L, segBody)
    header ++ segment
  }

  /** Minimal AVIF/HEIF: brand-carrying ftyp, then a meta FullBox
    * holding hdlr('pict') and iprp/ipco with one ispe (spatial
    * extents) and one pixi (channel count + per-channel depth), then
    * a token mdat. Brand 0=avif, 1=mif1, 2=heic — the three the
    * parser admits.
    */
  def buildAvif(w: Int, h: Int, channels: Int, depth: Int,
                brand: Int): Array[Byte] = {
    require(w > 0 && h > 0 && channels >= 1 && channels <= 8 &&
      depth >= 1 && depth <= 16 && brand >= 0 && brand <= 2,
      "bad avif fixture params")
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    def fullbox(typ: String, body: Array[Byte]): Array[Byte] =
      box(typ, Array[Byte](0, 0, 0, 0) ++ body)
    val brandStr = Seq("avif", "mif1", "heic")(brand)
    val ftyp = box("ftyp", brandStr.getBytes("US-ASCII") ++ be32(0) ++
      (brandStr + "mif1miaf").getBytes("US-ASCII"))
    val hdlr = fullbox("hdlr", be32(0) ++ "pict".getBytes("US-ASCII") ++
      new Array[Byte](13)) // reserved(12) + empty name NUL
    val ispe = fullbox("ispe", be32(w.toLong) ++ be32(h.toLong))
    val pixi = fullbox("pixi", Array(channels.toByte) ++
      Array.fill(channels)(depth.toByte))
    val meta = fullbox("meta",
      hdlr ++ box("iprp", box("ipco", ispe ++ pixi)))
    val mdat = box("mdat", Array[Byte](0x42))
    ftyp ++ meta ++ mdat
  }

  private val identityMatrix: Array[Byte] = {
    val m = new Array[Byte](36)
    m(1) = 1  // entry 0 = 0x00010000 ([0,0])
    m(17) = 1 // entry 4 = 0x00010000 ([1,1])
    m(32) = 0x40 // entry 8 = 0x40000000 ([2,2])
    m
  }

  /** Minimal WebP: RIFF/WEBP + one of VP8␣ (lossy, variant 0),
    * VP8L (lossless, variant 1), VP8X (extended canvas, variant 2).
    * Lossy carries no alpha bit; the others take `alpha`.
    */
  def buildWebp(w: Int, h: Int, variant: Int, alpha: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && variant >= 0 && variant <= 2, "bad webp params")
    require(variant != 0 || (w <= 0x3FFF && h <= 0x3FFF), "lossy dims are 14-bit")
    require(variant != 1 || (w <= 0x4000 && h <= 0x4000), "vp8l dims-1 are 14-bit")
    def le32(v: Long): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val (tag, payload) = variant match {
      case 0 =>
        val p = new Array[Byte](10)
        // 3-byte frame tag: keyframe, version 0, show_frame — exact
        // bits unread by the metadata walk; zeros are a valid keyframe
        p(3) = 0x9D.toByte; p(4) = 0x01; p(5) = 0x2A
        p(6) = (w & 0xFF).toByte; p(7) = ((w >> 8) & 0x3F).toByte
        p(8) = (h & 0xFF).toByte; p(9) = ((h >> 8) & 0x3F).toByte
        ("VP8 ", p)
      case 1 =>
        val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
          (if (alpha) 1L << 28 else 0L)
        ("VP8L", Array(0x2F.toByte) ++ le32(bits))
      case _ =>
        val p = new Array[Byte](10)
        if (alpha) p(0) = 0x10
        p(4) = ((w - 1) & 0xFF).toByte
        p(5) = (((w - 1) >> 8) & 0xFF).toByte
        p(6) = (((w - 1) >> 16) & 0xFF).toByte
        p(7) = ((h - 1) & 0xFF).toByte
        p(8) = (((h - 1) >> 8) & 0xFF).toByte
        p(9) = (((h - 1) >> 16) & 0xFF).toByte
        ("VP8X", p)
    }
    val chunk = tag.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload
    "RIFF".getBytes("US-ASCII") ++ le32(4L + chunk.length) ++
      "WEBP".getBytes("US-ASCII") ++ chunk
  }

  /** Minimal single-IFD TIFF in either byte order: header, then an
    * IFD with width/height/bits/compression/samples-per-pixel
    * entries (tag-sorted, as the spec requires) and a zero next-IFD
    * pointer. SHORT values are left-justified in the value field —
    * the detail the parser's test matrix exists to catch.
    */
  def buildTiff(w: Int, h: Int, spp: Int, bigEndian: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && spp >= 1 && spp <= 8, "bad tiff params")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      else { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit =
      if (bigEndian) {
        out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
      } else {
        out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
        out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
      }
    def entryShort(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1L)
      w16(v); w16(0) // SHORT left-justified in the 4-byte field
    }
    def entryLong(tag: Int, v: Long): Unit = { w16(tag); w16(4); w32(1L); w32(v) }
    out.write(if (bigEndian) 'M' else 'I'); out.write(if (bigEndian) 'M' else 'I')
    w16(42)
    w32(8L) // IFD0 right after the header
    w16(5)  // entry count
    entryLong(256, w.toLong)  // ImageWidth as LONG
    entryShort(257, h)        // ImageLength as SHORT (mixed types on purpose)
    entryShort(258, 8)        // BitsPerSample
    entryShort(259, 1)        // Compression: none
    entryShort(277, spp)      // SamplesPerPixel
    w32(0L) // next IFD
    out.toByteArray
  }

  def synthMediaBlobs(df: DataFrame, idCol: String, format: String): DataFrame = {
    val outSchema = StructType(Seq(StructField("id", LongType),
      StructField("bytes", BinaryType), StructField("format", StringType)))
    df.select(col(idCol).cast(LongType).as("id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = format match {
          case "bmp" => buildBmp((4 + id % 13).toInt, (3 + id % 11).toInt,
            k => ((id * 31L + k * 7L) % 256L).toInt)
          // near-dup panel for the pixel-hash tier: ids in the same
          // base group (id div 4) share dims and pixel formula except
          // a variant-sized nudge on the top-left pixel — hashes land
          // identical or a few bits apart WITHIN a group, far across
          // groups, so dhash pairing has real structure to find and
          // the oracle can predict every bit from (base, variant)
          case "bmp_near" =>
            val base = id / 4
            val v = id % 4
            buildBmp((4 + base % 13).toInt, (3 + base % 11).toInt,
              k => (((base * 31L + k * 7L) % 256L +
                (if (k < 3) v else 0L)) % 256L).toInt)
          case "ppm" => buildPpm((4 + id % 13).toInt, (3 + id % 11).toInt,
            k => ((id * 31L + k * 7L) % 256L).toInt)
          case "png" => buildPng((4 + id % 13).toInt, (3 + id % 11).toInt,
            k => ((id * 31L + k * 7L) % 256L).toInt)
          case "wav" => buildWav(8000, (32 + id % 96).toInt,
            i => (((id * 7919L + i * 2503L) % 65536L) - 32768L).toInt)
          // near-dup panel for the audio-fingerprint tier (the
          // bmp_near shape in sample space): ids in the same base
          // group (id div 4) share length and sample formula except a
          // variant-sized nudge on the first 3 samples — fingerprints
          // land identical or a few bits apart WITHIN a group, far
          // across groups, and the oracle predicts every bit from
          // (base, variant)
          case "wav_near" =>
            val base = id / 4
            val v = id % 4
            buildWav(8000, (32 + base % 96).toInt,
              i => ((((base * 7919L + i * 2503L) % 65536L +
                (if (i < 3) v else 0L)) % 65536L) - 32768L).toInt)
          case "wav_mulaw" => buildWavG711(8000, (32 + id % 96).toInt,
            aLaw = false, i => ((id * 131L + i * 29L) % 256L).toInt)
          case "wav_alaw" => buildWavG711(8000, (32 + id % 96).toInt,
            aLaw = true, i => ((id * 131L + i * 29L) % 256L).toInt)
          case "wav_adpcm" => buildWavAdpcm(8000,
            predictor = (((id * 7919L) % 65536L) - 32768L).toInt,
            index = (id % 89L).toInt,
            nNibbles = (16 + 2 * (id % 8L)).toInt,
            nibAt = i => ((id * 13L + i * 5L) % 16L).toInt)
          case "y4m" =>
            val (w, h) = ((8 + id % 5).toInt, (6 + id % 3).toInt)
            buildY4m(w, h, (12 + id % 3).toInt, 1, (8 + id % 9).toInt,
              (f, y, x) =>
                ((id * 31L + (f.toLong * h * w + y.toLong * w + x) * 7L)
                  % 256L).toInt)
          // near-dup panel for the video-fingerprint tier (the
          // wav_near shape in pixel-time space): ids in the same base
          // group (id div 4) share geometry and luma formula except a
          // variant-sized nudge on the first 3 pixels of frame 0 —
          // fingerprints land identical or a few bits apart WITHIN a
          // group, far across groups, and the oracle predicts every
          // bit from (base, variant)
          case "y4m_near" =>
            val base = id / 4
            val v = id % 4
            val (w, h) = ((8 + base % 5).toInt, (6 + base % 3).toInt)
            buildY4m(w, h, (12 + base % 3).toInt, 1, (8 + base % 9).toInt,
              (f, y, x) => {
                val i = f.toLong * h * w + y.toLong * w + x
                ((base * 31L + i * 7L + (if (i < 3) v else 0L)) % 256L).toInt
              })
          case "mp3" => buildMp3(nFrames = (2 + id % 4L).toInt,
            brIdx = 9, srIdx = 0)
          case "flac" => buildFlac(rate = (8000L * (1 + id % 3)).toInt,
            channels = (1 + id % 2).toInt, bps = 16,
            totalSamples = 1000 + id % 4096)
          case "ogg" => buildOgg(rate = (8000L * (1 + id % 3)).toInt,
            channels = (1 + id % 2).toInt,
            nominalBps = (64000L + 1000L * (id % 8)).toInt,
            totalSamples = 2000 + id % 4096)
          case "jpeg" => buildJpegMeta((16 + id % 240).toInt,
            (16 + id % 180).toInt,
            channels = if (id % 5 == 0) 1 else 3)
          case "jpeg_exif" => buildJpegMeta((16 + id % 240).toInt,
            (16 + id % 180).toInt, channels = 3,
            orientation = (1 + id % 8).toInt,
            exifBigEndian = id % 2 == 1)
          case "gif" => buildGif((8 + id % 200).toInt, (8 + id % 160).toInt,
            palBits = (1 + id % 8).toInt, v89 = id % 3 != 0)
          case "mp4" => buildMp4((16 + id % 304).toInt, (16 + id % 176).toInt,
            timescale = (1000L * (1 + id % 3)).toInt,
            durationUnits = 10000 + id % 90000,
            nTracks = (1 + id % 3).toInt, v1 = id % 4 == 0)
          case "webm" => buildWebm((16 + id % 624).toInt, (16 + id % 344).toInt,
            timecodeScaleNs = 500000L * (1 + id % 2),
            durationTicks = (30000 + id % 90000).toDouble,
            nTracks = (1 + id % 2).toInt,
            wideSizes = id % 3 == 0)
          case "avif" => buildAvif((8 + id % 320).toInt, (8 + id % 240).toInt,
            channels = (1 + id % 4).toInt,
            depth = if (id % 4 == 3) 10 else 8,
            brand = (id % 3).toInt)
          case "webp" => buildWebp((8 + id % 300).toInt, (8 + id % 200).toInt,
            variant = (id % 3).toInt,
            alpha = id % 3 != 0 && id % 2 == 1)
          case "tiff" => buildTiff((8 + id % 500).toInt, (8 + id % 400).toInt,
            spp = (1 + id % 4).toInt, bigEndian = id % 2 == 1)
          case other => throw new IllegalArgumentException(
            s"synthMediaBlobs: unknown format $other")
        }
        // the G.711/ADPCM variants are WAV containers, and the EXIF
        // variant is a JPEG — the decoder dispatches on the container
        // format, not the synth key
        val fmtOut =
          if (format.startsWith("wav")) "wav"
          else if (format.startsWith("y4m")) "y4m"
          else if (format == "jpeg_exif") "jpeg"
          else format
        Row(id, bytes, fmtOut)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode + feature-extract a binary column into a `decoded` struct
    * column. Null or oversized blobs yield null (never fail the
    * task); per-partition open/close brackets the codec lifecycle.
    */
  def decodeMedia(df: DataFrame, bytesCol: String, formatCol: String,
                  codec: MediaCodec = new DeterministicStubCodec(),
                  maxBytes: Int = 64 << 20,
                  outputCol: String = "decoded"): DataFrame = {
    val schema = df.schema
    val bytesIdx = schema.fieldIndex(bytesCol)
    val formatIdx = schema.fieldIndex(formatCol)
    val outSchema = schema.add(StructField(outputCol, DecodedType))
    df.mapPartitions { rows =>
      codec.open()
      // close() must fire even when a downstream limit/take abandons
      // the iterator before it drains — the task-completion listener
      // guarantees exactly one close per task; the closed flag keeps
      // the fast drained path from double-closing.
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; codec.close() }
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeOnce())
      val it = rows.map { row =>
        val bytes = if (row.isNullAt(bytesIdx)) null else row.getAs[Array[Byte]](bytesIdx)
        val fmt = if (row.isNullAt(formatIdx)) null else row.getString(formatIdx)
        val decoded: Row =
          if (bytes == null || bytes.length > maxBytes) null
          else codec.decode(bytes, fmt) match {
            case null => null
            case (meta, features) => Row(meta, features)
          }
        Row.fromSeq(row.toSeq :+ decoded)
      }
      new scala.collection.AbstractIterator[Row] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) closeOnce(); h }
        def next(): Row = it.next()
      }
    }(Encoders.row(outSchema))
  }

  /** Resize/transcode plumbing: binary media in, binary media out
    * with the target dimensions in typed metadata. The pixel work is
    * the codec's; the stub deterministically folds the source bytes
    * to `min(len, width*height)` bytes so schema, null handling and
    * partition lifecycle are real and testable. Runs where the bytes
    * are (mapPartitions, no shuffle); oversized blobs pass through
    * as null like [[decodeMedia]].
    */
  def resizeMedia(df: DataFrame, bytesCol: String, formatCol: String,
                  width: Int, height: Int, maxBytes: Int = 64 << 20,
                  outputCol: String = "resized"): DataFrame = {
    require(width > 0 && height > 0, "target dims must be positive")
    val schema = df.schema
    val bytesIdx = schema.fieldIndex(bytesCol)
    val formatIdx = schema.fieldIndex(formatCol)
    val outType = StructType(Seq(
      StructField("bytes", BinaryType), StructField("meta", MediaMetaType)))
    val outSchema = schema.add(StructField(outputCol, outType))
    val cap = math.min(width.toLong * height, Int.MaxValue.toLong).toInt
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = if (row.isNullAt(bytesIdx)) null else row.getAs[Array[Byte]](bytesIdx)
        val fmt = if (row.isNullAt(formatIdx)) null else row.getString(formatIdx)
        val out: Row =
          if (bytes == null || bytes.isEmpty || bytes.length > maxBytes) null
          else {
            val resized = java.util.Arrays.copyOf(bytes, math.min(bytes.length, cap))
            Row(resized, Row(fmt, width, height, 1, resized.length.toLong))
          }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
  }

  /** Evenly sample `n` frame indices out of a frame count — the
    * pure-plan part of video frame sampling (the per-frame decode
    * itself goes through [[decodeMedia]]).
    */
  def sampleFrameIndices(nFrames: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    when(nFrames <= n, sequence(lit(0), greatest(nFrames - 1, lit(0))))
      .otherwise(transform(sequence(lit(0), lit(n - 1)),
        i => (i * nFrames / n).cast(IntegerType)))
}
