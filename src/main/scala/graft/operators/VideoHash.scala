package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Frame-tier perceptual VIDEO fingerprinting — the last member of
  * the near-dup family beside MinHash (text), IVF/sign-bit ANN
  * (embeddings), dHash/pHash (images) and the spectral audio
  * fingerprint: a crawled multimodal corpus dedups its video by
  * decoded-LUMA structure over time, not byte equality (the same
  * clip re-containered, re-sampled to a different frame rate, or
  * spatially re-scaled hashes differently as bytes but lands a few
  * bits apart as moving pictures).
  *
  * The fingerprint is [[AudioHash]]'s recipe with the 1-D sample
  * axis replaced by the (time × space) luma field:
  *
  *   1. decode the Y4M container through the ONE shared walker
  *      ([[Multimodal.walkY4mFrames]] — Cmono/C420/C444 all land
  *      here), with the pre-decode luma-count and frame-count bomb
  *      guards;
  *   2. area-map the frame axis onto 8 temporal windows (window t
  *      covers frames [t·F/8, max(t·F/8+1, (t+1)·F/8)) — the
  *      [[ImageHash]] grid rule on time, every window nonempty at
  *      any clip length, Long bounds by contract) and each frame's
  *      pixels onto an 8×4 spatial cell grid (the same rule on x
  *      and y); a window's 32 cell values are the integer means of
  *      luma over (cell pixels × window frames), truncation
  *      agreeing between JVM `/` and DuckDB `//` on the nonnegative
  *      sums;
  *   3. per window, the quantized-integer DCT-II ([[ImageHash
  *      .dctBasisQ]], the SAME 8×32 basis) over the 32 cells
  *      (row-major: 4 rows × 8 columns) gives 8 spatial-frequency
  *      coefficients: 8 windows × 8 frequencies = 64 ints, exact
  *      int64;
  *   4. bit b set iff coeff(b) exceeds the block's LOWER MEDIAN
  *      (the 32nd smallest of the 64) — pHash's total integer rule,
  *      no float ever enters.
  *
  * Spatial-frequency signs per time window survive the small luma
  * perturbations (re-encode noise, brightness-ish nudges) that flip
  * any exact scheme, and the area maps make both axes
  * resolution-invariant: duplicating every frame (2× frame rate) or
  * every pixel (2× spatial upscale) reproduces every window-cell
  * mean exactly when the grids tile.
  *
  * The second word, [[envhash64]], is the [[AudioHash.envhash64]]
  * analog — global mean luma over 65 area-mapped temporal buckets,
  * bit t set iff bucket t+1 exceeds bucket t: BRIGHTNESS DYNAMICS,
  * which the per-window spatial signs ignore, so (envhash, vidhash)
  * is a 128-bit two-view fingerprint — exactly the dhash‖phash
  * shape, which is what lets the persisted VIDEO near-dup index
  * reuse [[ImageHashIndex]] verbatim (hash-agnostic, 4×32-bit
  * bands, combined-distance semantics) under a `vididx` namespace.
  *
  * Scale shape: hashing is MAP-ONLY where the bytes live (two 64-bit
  * words out per clip; per-task state is O(nFrames) 33-long reduced
  * accumulators, capped by the walker's frame guard). Pairing and
  * persisted indexing REUSE the banded-Hamming machinery verbatim —
  * [[ImageHash.dhashPairs]] for one-shot pairs and [[ImageHashIndex]]
  * for the serve-many index consume 64-bit words, not pixels.
  *
  * Reference has no counterpart (extension track); this closes the
  * near-dup family's last missing modality named by the r14 verdict.
  */
object VideoHash {

  /** 8 temporal windows × (8 columns × 4 rows) spatial cells. */
  val Windows = 8
  val SpatialCols = 8
  val SpatialRows = 4
  val CellsPerWindow: Int = SpatialCols * SpatialRows

  /** Envelope fold: 65 temporal buckets → 64 adjacent compares. */
  val EnvBuckets = 65

  /** Pre-decode total-luma cap (the video decompression-bomb guard,
    * matching the image decoder's pixel cap): 64M luma samples, so
    * one task never walks more than 64 MB of frame payload.
    */
  val MaxLumaSamples: Long = 64L << 20

  /** Frame-count cap: the fold buffers 33 longs per frame (32 cell
    * sums + the global sum), so 64k frames bound task state at
    * ~17 MB even for tiny-frame streams.
    */
  val MaxFrames: Int = 1 << 16

  /** 64-bit spatiotemporal fingerprint of a Y4M blob; null on any
    * decode failure (garbage bytes, unknown colorspace, truncated
    * frames, bomb guards) — kept as null, never a task failure, the
    * [[ImageHash]] degradation contract.
    */
  def vidhash64(bytes: Array[Byte]): java.lang.Long = {
    val a = accumulate(bytes)
    if (a == null) null else java.lang.Long.valueOf(hashFromAccum(a))
  }

  /** 64-bit brightness-envelope fingerprint — the second, independent
    * video word (see class doc).
    */
  def envhash64(bytes: Array[Byte]): java.lang.Long = {
    val a = accumulate(bytes)
    if (a == null) null else java.lang.Long.valueOf(envhashFromAccum(a))
  }

  /** Per-frame reduced state: cellSums(f) = 32 luma sums over the
    * frame's area-mapped cells; totals(f) = the frame's global luma
    * sum; cellPix(j) = pixels per cell (constant across frames —
    * geometry is per-stream in Y4M).
    */
  private[operators] final case class Accum(
      w: Int, h: Int, nFrames: Int,
      cellSums: Array[Array[Long]], totals: Array[Long],
      cellPix: Array[Long])

  private[operators] def accumulate(bytes: Array[Byte]): Accum = {
    val cellSums = new scala.collection.mutable.ArrayBuffer[Array[Long]]
    val totals = new scala.collection.mutable.ArrayBuffer[Long]
    val res = Multimodal.walkY4mFrames(bytes, MaxLumaSamples, MaxFrames) {
      (w, h, _, off) =>
        val sums = new Array[Long](CellsPerWindow)
        var rr = 0
        while (rr < SpatialRows) {
          val y0 = (rr.toLong * h / SpatialRows).toInt
          val y1 = math.max(y0 + 1, ((rr + 1).toLong * h / SpatialRows).toInt)
          var cc = 0
          while (cc < SpatialCols) {
            val x0 = (cc.toLong * w / SpatialCols).toInt
            val x1 = math.max(x0 + 1, ((cc + 1).toLong * w / SpatialCols).toInt)
            var acc = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { acc += bytes(off + y * w + x) & 0xFF; x += 1 }
              y += 1
            }
            sums(rr * SpatialCols + cc) = acc
            cc += 1
          }
          rr += 1
        }
        // cells overlap when w<8 or h<4 (the nonempty-cell rule), so
        // the global total is its own full-plane pass
        var total = 0L
        var i = 0
        val n = w * h
        while (i < n) { total += bytes(off + i) & 0xFF; i += 1 }
        cellSums += sums
        totals += total
    }
    if (res == null) null
    else {
      val (w, h, nFrames, _, _) = res
      val cellPix = new Array[Long](CellsPerWindow)
      var rr = 0
      while (rr < SpatialRows) {
        val y0 = (rr.toLong * h / SpatialRows).toInt
        val y1 = math.max(y0 + 1, ((rr + 1).toLong * h / SpatialRows).toInt)
        var cc = 0
        while (cc < SpatialCols) {
          val x0 = (cc.toLong * w / SpatialCols).toInt
          val x1 = math.max(x0 + 1, ((cc + 1).toLong * w / SpatialCols).toInt)
          cellPix(rr * SpatialCols + cc) = (y1 - y0).toLong * (x1 - x0)
          cc += 1
        }
        rr += 1
      }
      Accum(w, h, nFrames, cellSums.toArray, totals.toArray, cellPix)
    }
  }

  /** The windowed-DCT fold, exposed for spec-level equivalence
    * checks. p(t·32 + j) = mean luma of cell j over window t's
    * frames; d(t·8 + u) = Σ_j dctBasisQ(u)(j)·p(t·32 + j); bit rule
    * is the shared lower-median sign fold.
    */
  private[operators] def hashFromAccum(a: Accum): Long = {
    val f = a.nFrames
    val p = new Array[Long](Windows * CellsPerWindow)
    var t = 0
    while (t < Windows) {
      val f0 = (t.toLong * f / Windows).toInt
      val f1 = math.max(f0 + 1, ((t + 1).toLong * f / Windows).toInt)
      var j = 0
      while (j < CellsPerWindow) {
        var sum = 0L
        var ff = f0
        while (ff < f1) { sum += a.cellSums(ff)(j); ff += 1 }
        p(t * CellsPerWindow + j) = sum / ((f1 - f0) * a.cellPix(j))
        j += 1
      }
      t += 1
    }
    val d = new Array[Long](64)
    var w = 0
    while (w < Windows) {
      var u = 0
      while (u < Windows) {
        var acc = 0L
        var j = 0
        while (j < CellsPerWindow) {
          acc += ImageHash.dctBasisQ(u)(j) * p(w * CellsPerWindow + j)
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

  /** The brightness-envelope fold behind [[envhash64]]: 65 temporal
    * buckets of global mean luma, adjacent-gradient bits.
    */
  private[operators] def envhashFromAccum(a: Accum): Long = {
    val f = a.nFrames
    val planePix = a.w.toLong * a.h
    val q = new Array[Long](EnvBuckets)
    var t = 0
    while (t < EnvBuckets) {
      val f0 = (t.toLong * f / EnvBuckets).toInt
      val f1 = math.max(f0 + 1, ((t + 1).toLong * f / EnvBuckets).toInt)
      var sum = 0L
      var ff = f0
      while (ff < f1) { sum += a.totals(ff); ff += 1 }
      q(t) = sum / ((f1 - f0) * planePix)
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

  /** (id, vidhash, envhash) per clip — map-only, one row per input
    * with ONE decode feeding both words, null hashes for undecodable
    * blobs (kept, so corpus accounting stays complete; filter
    * downstream). Only the `y4m` container carries a frame tier
    * (mp4/webm stay metadata-tier by declared scope); other formats
    * degrade to null.
    */
  def videoHashes(df: DataFrame, idCol: String, bytesCol: String,
                  formatCol: String): DataFrame = {
    val schema = df.schema
    val idIdx = schema.fieldIndex(idCol)
    val bytesIdx = schema.fieldIndex(bytesCol)
    val formatIdx = schema.fieldIndex(formatCol)
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("vidhash", LongType),
      StructField("envhash", LongType)))
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val bytes =
          if (row.isNullAt(bytesIdx)) null else row.getAs[Array[Byte]](bytesIdx)
        val fmt = if (row.isNullAt(formatIdx)) null else row.getString(formatIdx)
        if (fmt == null || fmt.toLowerCase != "y4m") Row(id, null, null)
        else {
          val a = accumulate(bytes)
          if (a == null) Row(id, null, null)
          else Row(id,
            java.lang.Long.valueOf(hashFromAccum(a)),
            java.lang.Long.valueOf(envhashFromAccum(a)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** All (a_id, b_id, dist) video near-dup pairs with
    * hamming(h_a, h_b) <= maxBits — delegates to the hash-agnostic
    * banded-Hamming join ([[ImageHash.dhashPairs]]): same pigeonhole
    * completeness, same never-all-pairs plan.
    */
  def vidhashPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   maxBits: Int = 3, nBands: Int = 4): DataFrame =
    ImageHash.dhashPairs(hashes, idCol, hashCol, maxBits, nBands)
}
