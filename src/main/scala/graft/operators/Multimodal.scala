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
