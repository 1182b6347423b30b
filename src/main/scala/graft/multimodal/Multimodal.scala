package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video travel as opaque `binary`
  * columns plus typed metadata structs; per-row media work runs in
  * batched `mapPartitions` (the Scala analogue of mapInPandas — one
  * iterator per partition, library handles amortized across the whole
  * partition, no per-row UDF dispatch).
  *
  * The actual codecs are NOT in this container, so `RealImageDecoder`
  * is an explicit stub (`???`) and tests/pipelines run the
  * deterministic `FakeImageDecoder`; everything around the decode —
  * schemas, encoders, partition batching, feature shapes — is real and
  * is what a 1000-executor job would ship. Decoders are `Serializable`
  * task-side singletons: one instance per executor task, closed over by
  * the partition iterator, never per row.
  */
object Multimodal {

  /** Decoded-media metadata carried next to the payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  trait ImageDecoder extends Serializable {
    /** (width, height, channels, format) of an encoded image. */
    def decodeMeta(bytes: Array[Byte]): (Int, Int, Int, String)

    /** Row-major decoded pixel bytes (possibly resized). */
    def decodePixels(bytes: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** Production decoder — wire an actual codec here (JAI/ImageIO/ffmpeg
    * bindings). Deliberately unimplemented in this environment.
    */
  object RealImageDecoder extends ImageDecoder {
    def decodeMeta(bytes: Array[Byte]): (Int, Int, Int, String) = ???
    def decodePixels(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = ???
  }

  /** Deterministic stand-in: dimensions and "pixels" derived from the
    * payload bytes, so plumbing tests are reproducible end to end.
    */
  object FakeImageDecoder extends ImageDecoder {
    def decodeMeta(bytes: Array[Byte]): (Int, Int, Int, String) = {
      val w = 8 + (math.abs(java.util.Arrays.hashCode(bytes)) % 56)
      val h = 8 + (math.abs(java.util.Arrays.hashCode(bytes) / 64) % 56)
      (w, h, 3, "fake")
    }
    def decodePixels(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val out = new Array[Byte](width * height * 3)
      var i = 0
      while (i < out.length) {
        out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length)
        i += 1
      }
      out
    }
  }

  /** Attach decoded metadata to a binary column: batched mapPartitions,
    * output schema = input ++ media struct.
    */
  def withImageMeta(df: DataFrame, binCol: String,
      decoder: ImageDecoder = FakeImageDecoder): DataFrame = {
    val outSchema = StructType(df.schema :+ StructField("media", MediaMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (w, h, c, f) = decoder.decodeMeta(bytes)
        Row.fromSeq(r.toSeq :+ Row(w, h, c, f))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Feature extraction: 16-bin L2-normalized byte histogram of the
    * decoded payload — a real, deterministic feature pipeline with the
    * exact shape (fixed-length float array per row) an embedding model
    * would produce.
    */
  def withByteHistogram(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(
      df.schema :+ StructField("features", ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val hist = new Array[Long](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
        var ss = 0.0
        hist.foreach(v => ss += v.toDouble * v)
        val n = if (ss == 0) 1.0 else math.sqrt(ss)
        Row.fromSeq(r.toSeq :+ hist.map(v => (v / n).toFloat).toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Frame sampling for video-like payloads: split the payload into
    * `frameSize`-byte frames and keep every `stride`-th — array<binary>
    * output, the batch shape a real frame sampler produces.
    */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int,
      stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    val outSchema = StructType(
      df.schema :+ StructField("frames", ArrayType(BinaryType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val frames = bytes.grouped(frameSize).zipWithIndex
          .collect { case (f, i) if i % stride == 0 => f }
          .toSeq
        Row.fromSeq(r.toSeq :+ frames)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
