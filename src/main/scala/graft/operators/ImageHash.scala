package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pixel-tier perceptual image hashing — the IMAGE member of the
  * near-dup family beside MinHash (text) and IVF/sign-bit ANN
  * (embeddings): a crawled multimodal corpus dedups its images by
  * decoded-pixel structure, not by byte equality (the same photo
  * re-encoded, resized, or metadata-stripped hashes differently as
  * bytes but identically as pixels).
  *
  * Three classic hashes, all integer:
  *
  *   - dHash (difference hash, Krawetz's public formulation): bit
  *     (r, c) = [cell(r, c+1) > cell(r, c)] over a 9×8 luma grid —
  *     8 horizontal-gradient comparisons per row × 8 rows = 64 bits.
  *     Gradients survive brightness/contrast shifts better than
  *     absolute levels.
  *   - aHash (average hash): bit = [cell > mean of all 72 cells] on
  *     the same grid (64 of the 72 cells — the left 8×8 block — keep
  *     the word at 64 bits).
  *   - pHash (DCT hash): 32×32 luma grid → quantized-integer 2-D
  *     DCT-II → 8×8 low-frequency block, bit = coeff > the block's
  *     lower median. Frequency structure survives blurs and small
  *     shifts that flip dHash's local gradients.
  *
  * EVERYTHING IS INTEGER — ITU-R BT.601 luma as (299r+587g+114b)
  * div 1000, area-mapped grid cells as sum div count — so the DuckDB
  * oracle replays the hash bit-for-bit from the fixture pixel
  * formulas; no float ever enters the pipeline.
  *
  * Decoding goes through `javax.imageio` (public JDK; BMP/PNG/JPEG/
  * GIF/TIFF readers built in) with the [[Multimodal]] hardening
  * discipline: magic must agree with the declared format, header
  * dimensions are capped BEFORE `read()` allocates a pixel buffer
  * (decompression-bomb guard), and any parser exception degrades to
  * a null hash, never a task failure.
  *
  * Scale shape: hashing is MAP-ONLY where the bytes live (one
  * 64-bit word out per image — the 8-byte-per-image index a 100 TB
  * image corpus can actually hold). Pairing is the banded-Hamming
  * equi-join ([[dhashPairs]]): a 64-bit word split into `nBands`
  * equal bands; by pigeonhole, hamming(a, b) <= maxBits < nBands
  * forces at least one band to match exactly, so candidates come
  * from per-band equi-joins (shuffle keyed on 16-bit band values —
  * never all-pairs) and are verified with the codegen
  * `bit_count(a XOR b)` the sign-bit ANN path proved out. The same
  * blocking the text-side LSH uses, specialized to Hamming space.
  *
  * Reference has no counterpart (extension track); the multimodal
  * metadata tier is `Multimodal.decode*` — this adds the pixel tier
  * the round-12 verdict named first among residual gaps.
  */
object ImageHash {

  /** 9 columns × 8 rows: dHash compares horizontally adjacent
    * columns, so one extra column yields exactly 64 bits.
    */
  val GridCols = 9
  val GridRows = 8

  private val MaxImagePixels = 64L << 20

  /** pHash working grid: 32×32 luma, DCT'd down to the 8×8
    * low-frequency block.
    */
  val PhashGrid = 32
  val PhashBlock = 8

  /** Quantized DCT-II basis: T(u)(x) = floor(cos(π(2x+1)u/64)·2^14
    * + 0.5). Computed ONCE here and inlined verbatim into the oracle
    * SQL (the benfordExpectedMicro discipline), so no engine
    * re-derives a transcendental — every downstream product and sum
    * is exact int64 (|coeff| <= 255·32·32·2^28 < 2^47).
    */
  lazy val dctBasisQ: Array[Array[Long]] =
    Array.tabulate(PhashBlock, PhashGrid)((u, x) =>
      math.floor(math.cos(math.Pi * (2 * x + 1) * u / (2.0 * PhashGrid))
        * 16384.0 + 0.5).toLong)

  /** Decoded luma grid (`rows` × `cols`, row-major, values 0..255)
    * or null on any decode failure. Integer area mapping: cell
    * (r, c) averages pixels x in [c·w/cols, max(c·w/cols+1,
    * (c+1)·w/cols)) (likewise rows over h/rows) — every cell is
    * nonempty at any image size, and images smaller than the grid
    * sample overlapping windows deterministically.
    */
  def lumaGrid(bytes: Array[Byte], format: String): Array[Int] =
    lumaGridDims(bytes, format, GridCols, GridRows)

  def lumaGridDims(bytes: Array[Byte], format: String,
                   cols: Int, rows: Int): Array[Int] = {
    val img = decodeToImage(bytes, format)
    if (img == null) null else gridFromImage(img, cols, rows)
  }

  /** Hardened decode to a pixel-addressable image, shared by every
    * hash: magic/format agreement, header-dims bomb guard BEFORE
    * read() allocates, null (never throw) on parser failure.
    */
  private def decodeToImage(bytes: Array[Byte],
                            format: String): java.awt.image.BufferedImage = {
    if (bytes == null || bytes.isEmpty) return null
    val fmt = if (format == null) "" else format.toLowerCase
    val isPng = bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte
    val isJpg = bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF
    val isBmp = bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte
    val isGif = bytes.length >= 6 && bytes(0) == 'G'.toByte &&
      bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte &&
      bytes(3) == '8'.toByte &&
      (bytes(4) == '7'.toByte || bytes(4) == '9'.toByte) &&
      bytes(5) == 'a'.toByte
    val isTiff = bytes.length >= 4 &&
      ((bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 42.toByte && bytes(3) == 0.toByte) ||
       (bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte &&
        bytes(2) == 0.toByte && bytes(3) == 42.toByte))
    fmt match {
      case "png" if !isPng => return null
      case "jpg" | "jpeg" if !isJpg => return null
      case "bmp" if !isBmp => return null
      case "gif" if !isGif => return null
      case "tiff" | "tif" if !isTiff => return null
      case "png" | "jpg" | "jpeg" | "bmp" | "gif" | "tiff" | "tif" => ()
      case _ => return null
    }
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        // bomb guard: header dims checked before read() allocates
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) return null
        reader.read(0)
      } finally reader.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => null
    } finally if (iis != null) iis.close()
  }

  private def gridFromImage(img: java.awt.image.BufferedImage,
                            cols: Int, rows: Int): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = new Array[Int](rows * cols)
    var r = 0
    while (r < rows) {
      val y0 = r * h / rows
      val y1 = math.max(y0 + 1, (r + 1) * h / rows)
      var c = 0
      while (c < cols) {
        val x0 = c * w / cols
        val x1 = math.max(x0 + 1, (c + 1) * w / cols)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            val lum = (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
              114 * (p & 0xFF)) / 1000
            sum += lum
            x += 1
          }
          y += 1
        }
        grid(r * cols + c) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        c += 1
      }
      r += 1
    }
    grid
  }

  /** 64-bit difference hash; null on decode failure. Bit r·8+c is
    * set iff cell(r, c+1) > cell(r, c).
    */
  def dhash64(bytes: Array[Byte], format: String): java.lang.Long = {
    val g = lumaGrid(bytes, format)
    if (g == null) null else java.lang.Long.valueOf(dhashFromGrid(g))
  }

  private def dhashFromGrid(g: Array[Int]): Long = {
    var hash = 0L
    var r = 0
    while (r < GridRows) {
      var c = 0
      while (c < 8) {
        if (g(r * GridCols + c + 1) > g(r * GridCols + c))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** 64-bit average hash over the left 8×8 block of the shared grid;
    * the mean is over ALL 72 cells (integer div). Null on failure.
    */
  def ahash64(bytes: Array[Byte], format: String): java.lang.Long = {
    val g = lumaGrid(bytes, format)
    if (g == null) null else java.lang.Long.valueOf(ahashFromGrid(g))
  }

  private def ahashFromGrid(g: Array[Int]): Long = {
    var total = 0L
    var i = 0
    while (i < g.length) { total += g(i); i += 1 }
    val mean = total / g.length
    var hash = 0L
    var r = 0
    while (r < GridRows) {
      var c = 0
      while (c < 8) {
        if (g(r * GridCols + c) > mean) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** 64-bit perceptual hash (pHash, the DCT family): 32×32 luma
    * grid → quantized-integer 2-D DCT-II → the 8×8 low-frequency
    * block (DC included) → bit b set iff coeff(u = b mod 8,
    * v = b div 8) exceeds the block's LOWER MEDIAN (the 32nd
    * smallest of the 64 — a total integer rule, no float mean).
    * Frequency-domain structure survives blurs and small spatial
    * shifts that flip dHash's local gradients — the robust end of
    * the perceptual ladder, at 32×32·64 multiply-adds per image
    * (separable: two 8×32 passes). All arithmetic int64-exact, so
    * the oracle replays every coefficient from the fixture formula.
    */
  def phash64(bytes: Array[Byte], format: String): java.lang.Long = {
    val g = lumaGridDims(bytes, format, PhashGrid, PhashGrid)
    if (g == null) null else java.lang.Long.valueOf(phashFromGrid(g))
  }

  private def phashFromGrid(g: Array[Int]): Long = {
    // S(u)(y) = Σ_x T(u)(x)·g(y·32 + x)  (row transform)
    val s = Array.ofDim[Long](PhashBlock, PhashGrid)
    var u = 0
    while (u < PhashBlock) {
      var y = 0
      while (y < PhashGrid) {
        var acc = 0L
        var x = 0
        while (x < PhashGrid) {
          acc += dctBasisQ(u)(x) * g(y * PhashGrid + x)
          x += 1
        }
        s(u)(y) = acc
        y += 1
      }
      u += 1
    }
    // D(v·8 + u) = Σ_y T(v)(y)·S(u)(y)  (column transform)
    val d = new Array[Long](64)
    var v = 0
    while (v < PhashBlock) {
      var uu = 0
      while (uu < PhashBlock) {
        var acc = 0L
        var y = 0
        while (y < PhashGrid) {
          acc += dctBasisQ(v)(y) * s(uu)(y)
          y += 1
        }
        d(v * PhashBlock + uu) = acc
        uu += 1
      }
      v += 1
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

  /** (id, dhash, ahash, phash) per image — map-only, one row per
    * input, null hashes for undecodable blobs (kept, so corpus
    * accounting stays complete; filter downstream).
    */
  def imageHashes(df: DataFrame, idCol: String, bytesCol: String,
                  formatCol: String): DataFrame = {
    val schema = df.schema
    val idIdx = schema.fieldIndex(idCol)
    val bytesIdx = schema.fieldIndex(bytesCol)
    val formatIdx = schema.fieldIndex(formatCol)
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("dhash", LongType),
      StructField("ahash", LongType),
      StructField("phash", LongType)))
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val bytes =
          if (row.isNullAt(bytesIdx)) null else row.getAs[Array[Byte]](bytesIdx)
        val fmt = if (row.isNullAt(formatIdx)) null else row.getString(formatIdx)
        // decode ONCE per image; both grids sample the same pixels
        val img = decodeToImage(bytes, fmt)
        if (img == null) Row(id, null, null, null)
        else {
          val g = gridFromImage(img, GridCols, GridRows)
          Row(id,
            java.lang.Long.valueOf(dhashFromGrid(g)),
            java.lang.Long.valueOf(ahashFromGrid(g)),
            java.lang.Long.valueOf(phashFromGrid(
              gridFromImage(img, PhashGrid, PhashGrid))))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** All (a_id, b_id, dist) pairs with hamming(hash_a, hash_b) <=
    * maxBits, a_id < b_id — via the banded-Hamming equi-join. The
    * pigeonhole guarantee needs maxBits < nBands (maxBits bit flips
    * can corrupt at most maxBits bands, leaving one of nBands
    * intact), enforced loudly. 64 must divide into nBands equal
    * bands. Null hashes are excluded (undecodable images can't
    * near-dup anything).
    */
  def dhashPairs(hashes: DataFrame, idCol: String, hashCol: String,
                 maxBits: Int = 3, nBands: Int = 4): DataFrame = {
    require(nBands >= 2 && 64 % nBands == 0,
      s"dhashPairs: nBands $nBands must divide 64 and be >= 2 (a " +
        "single 64-bit band is exact-duplicate matching — and 1L<<64 " +
        "wraps, so the band mask would silently zero out)")
    require(maxBits >= 0 && maxBits < nBands,
      s"dhashPairs: maxBits $maxBits needs nBands > maxBits for the " +
        s"pigeonhole completeness guarantee (got $nBands bands)")
    val bandBits = 64 / nBands
    val h = hashes.select(col(idCol).cast(LongType).as("id"),
        col(hashCol).cast(LongType).as("hash"))
      .filter(col("hash").isNotNull)
    // band values: shiftrightunsigned keeps the top band sign-free
    val banded = h.select(col("id"), col("hash"),
      explode(array((0 until nBands).map(j =>
        struct(lit(j).as("band"),
          shiftrightunsigned(col("hash"), j * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("bv"))): _*)).as("e"))
      .select(col("id"), col("hash"),
        col("e.band").as("band"), col("e.bv").as("bv"))
    banded.select(col("id").as("a_id"), col("hash").as("a_hash"),
        col("band"), col("bv"))
      .join(banded.select(col("id").as("b_id"), col("hash").as("b_hash"),
        col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist",
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).cast(LongType))
      .filter(col("dist") <= maxBits)
      .select(col("a_id"), col("b_id"), col("dist"))
      .distinct()
  }
}
