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
  * `RealImageDecoder` decodes PNG/JPEG with the JDK's own
  * `javax.imageio` (headless-safe, zero extra jars); the deterministic
  * `FakeImageDecoder` remains for plumbing tests that want payload-
  * derived shapes. Decoders are `Serializable` task-side singletons:
  * one instance per executor task, closed over by the partition
  * iterator, never per row.
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

  /** Production decoder on the JDK's `javax.imageio` — PNG + JPEG ship
    * with every Java 17 runtime, no native libs, headless-safe. The
    * reader is resolved from the byte stream (no filename sniffing), so
    * a mixed-format binary column decodes per row.
    */
  object RealImageDecoder extends ImageDecoder {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO

    // ImageIO defaults to a disk-backed stream cache — one temp file
    // per decode. In-memory payloads never need it, and at thousands of
    // images per task the temp-file churn dominates the codec itself.
    ImageIO.setUseCache(false)

    private def readImage(bytes: Array[Byte]): (java.awt.image.BufferedImage, String) = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException("unrecognized image format")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          (reader.read(0), reader.getFormatName.toLowerCase)
        } finally reader.dispose()
      } finally iis.close()
    }

    def decodeMeta(bytes: Array[Byte]): (Int, Int, Int, String) = {
      val (img, fmt) = readImage(bytes)
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents, fmt)
    }

    /** Row-major RGB bytes at the requested size; resizing is explicit
      * nearest-neighbor so decoded pixels are bit-identical across JVMs
      * (AWT's interpolating scalers are not pinned by spec).
      */
    def decodePixels(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val (img, _) = readImage(bytes)
      val sw = img.getWidth
      val sh = img.getHeight
      val argb = img.getRGB(0, 0, sw, sh, null, 0, sw)
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val sy = if (height == sh) y else (y.toLong * sh / height).toInt
        var x = 0
        while (x < width) {
          val sx = if (width == sw) x else (x.toLong * sw / width).toInt
          val rgb = argb(sy * sw + sx)
          val o = (y * width + x) * 3
          out(o) = ((rgb >> 16) & 0xff).toByte
          out(o + 1) = ((rgb >> 8) & 0xff).toByte
          out(o + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Encode row-major RGB bytes as a PNG (lossless — decode inverts it
    * exactly). Used by tests and the t19 oracle query to synthesize
    * deterministic images whose decoded form DuckDB can re-derive.
    */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be width*height*3 bytes")
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        img.setRGB(x, y,
          ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
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

  /** Animated multi-frame GIF from grayscale frames — the JDK's own
    * `javax.imageio` GIF plugin writes frame sequences natively
    * (prepareWriteSequence/writeToSequence), the same zero-jar trick
    * that makes RealImageDecoder real. Frames use an EXPLICIT 256-level
    * gray palette: GIF is indexed color, and a full gray palette makes
    * palette index == gray value, so every pixel byte survives the
    * round trip bit-exact — which is what lets an oracle re-derive
    * decoded checksums analytically.
    */
  def encodeAnimatedGif(width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "a GIF needs at least one frame")
    require(frames.forall(_.length == width * height),
      "each frame must be width*height grayscale bytes")
    javax.imageio.ImageIO.setUseCache(false)
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        img.getRaster.setDataElements(0, 0, width, height, px)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Decode EVERY frame of a multi-frame container (animated GIF) to
    * (width, height, grayscale bytes) — gray taken from the low channel
    * of the decoded ARGB, exact for gray-palette GIFs.
    */
  def decodeAllFrames(bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("unrecognized container format")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        // allowSearch=true: GIF has no frame-count header, the reader
        // must walk the stream — fine for in-memory payloads
        val n = reader.getNumImages(true)
        (0 until n).map { i =>
          val img = reader.read(i)
          val w = img.getWidth
          val h = img.getHeight
          val argb = img.getRGB(0, 0, w, h, null, 0, w)
          val px = new Array[Byte](w * h)
          var j = 0
          while (j < px.length) { px(j) = (argb(j) & 0xff).toByte; j += 1 }
          (w, h, px)
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Frame sampling on a REAL container column: decode each row's
    * animated GIF, keep every `stride`-th frame (by original frame
    * index). Output schema = input ++ (n_frames int, frames
    * array<binary>) — n_frames is the DECODER's total frame count, so a
    * container the codec can't fully walk fails here, not downstream.
    * Same batched-mapPartitions shape as the byte-slicing sampleFrames
    * below: codec state amortizes across the partition, rows never pay
    * per-row UDF dispatch.
    */
  def sampleContainerFrames(df: DataFrame, binCol: String,
      stride: Int): DataFrame = {
    require(stride > 0)
    val outSchema = StructType(df.schema
      :+ StructField("n_frames", IntegerType, nullable = false)
      :+ StructField("frames", ArrayType(BinaryType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val all = decodeAllFrames(r.getAs[Array[Byte]](binIdx))
        val kept = all.zipWithIndex
          .collect { case ((_, _, px), i) if i % stride == 0 => px }
        Row.fromSeq(r.toSeq :+ all.length :+ kept)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Encode 16-bit signed PCM mono samples as a WAV container via the
    * JDK's own `javax.sound.sampled` (zero extra jars, the audio twin
    * of `encodePng`). PCM is lossless, so `decodeWav` inverts this
    * bit-exact — which is what lets an oracle re-derive decoded sample
    * statistics analytically.
    */
  /** Audio SPI providers resolved ONCE per JVM (public ServiceLoader
    * API). `AudioSystem.getAudioInputStream`/`write` re-scan every
    * installed provider PER CALL and pay a probe exception for each
    * non-matching reader — measured 31–33 µs/row against 1.7–2.2 µs
    * with the matching provider held (tools.CodecBench; this was the
    * dominant constant of the t33/t34/t41 codec trio). The cached
    * classes ARE the JDK codec — only the per-row service lookup and
    * probe-exception churn are hoisted; emitted bytes are identical
    * (CodecBench asserts it).
    */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toSeq
    // standard PCM WAV reader first: the common path probes exactly one
    val (wav, rest) = all.partition(_.getClass.getSimpleName == "WaveFileReader")
    wav ++ rest
  }

  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE writer installed"))
  }

  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // little-endian per the format below
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream(44 + pcm.length)
    try wavWriter.write(ais, AudioFileFormat.Type.WAVE, baos)
    finally ais.close()
    baos.toByteArray
  }

  /** Decode a WAV payload to (sampleRate, channels, bitsPerSample,
    * samples) — 16-bit signed PCM reassembled per the stream's own
    * declared endianness, so a container from any writer decodes
    * correctly, not just our encoder's.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Int, Array[Short]) = {
    val in = new java.io.ByteArrayInputStream(bytes)
    val ais = audioReaders.iterator.flatMap { r =>
      try Some(r.getAudioInputStream(in))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          in.reset(); None
      }
    }.nextOption().getOrElse(throw new
      javax.sound.sampled.UnsupportedAudioFileException(
        "no installed audio reader matches the payload"))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"only 16-bit PCM supported, got ${fmt.getSampleSizeInBits}")
      val data = ais.readAllBytes()
      val n = data.length / 2
      val out = new Array[Short](n)
      val le = !fmt.isBigEndian
      var i = 0
      while (i < n) {
        val lo = data(2 * i) & 0xff
        val hi = data(2 * i + 1) & 0xff
        out(i) = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits, out)
    } finally ais.close()
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
