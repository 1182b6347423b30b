package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def payloads = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .limit(50)
    .withColumn("payload", encode($"text", "UTF-8"))

  test("withImageMeta attaches a typed media struct per row") {
    val got = Multimodal.withImageMeta(payloads, "payload")
    assert(got.schema("media").dataType == Multimodal.MediaMetaSchema)
    val metas = got.select("media.width", "media.height", "media.channels", "media.format")
      .as[(Int, Int, Int, String)].collect()
    assert(metas.length == 50)
    assert(metas.forall { case (w, h, c, f) =>
      w >= 8 && w < 64 && h >= 8 && h < 64 && c == 3 && f == "fake" })
    // deterministic: second run identical
    val again = Multimodal.withImageMeta(payloads, "payload")
      .select("media.width").as[Int].collect().toSeq
    assert(again == got.select("media.width").as[Int].collect().toSeq)
  }

  test("byte-histogram features are unit-norm fixed-shape vectors") {
    val feats = Multimodal.withByteHistogram(payloads, "payload")
      .select("features").as[Seq[Float]].collect()
    assert(feats.forall(_.length == 16))
    assert(feats.forall(f => math.abs(f.map(x => x * x).sum - 1.0) < 1e-3))
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val one = Seq(("a", Array.tabulate(100)(_.toByte))).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(one, "payload", frameSize = 10, stride = 2)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(frames.length == 5) // 10 frames, every 2nd
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (20 until 30).map(_.toByte))
  }

  test("animated GIF round-trips every frame's gray bytes exactly") {
    val w = 11; val h = 5
    val frames = (0 until 4).map(f =>
      Array.tabulate(w * h)(i => ((f * 7 + i * 13) % 256).toByte))
    val gif = Multimodal.encodeAnimatedGif(w, h, frames)
    // a real multi-frame container, not concatenated stills
    assert(gif.take(6).map(_.toChar).mkString.startsWith("GIF8"))
    val decoded = Multimodal.decodeAllFrames(gif)
    assert(decoded.length == 4)
    decoded.zip(frames).foreach { case ((dw, dh, px), expected) =>
      assert((dw, dh) == (w, h))
      assert(px.toSeq == expected.toSeq) // full gray palette: lossless
    }
  }

  test("sampleContainerFrames decodes real GIF frames, keeps stride-th") {
    val w = 8; val h = 8
    val mk = (docId: Int) => (0 until 5).map(f =>
      Array.tabulate(w * h)(i => ((docId * 31 + f * 7 + i) % 256).toByte))
    val df = Seq(
      (1, Multimodal.encodeAnimatedGif(w, h, mk(1))),
      (2, Multimodal.encodeAnimatedGif(w, h, mk(2)))).toDF("id", "gif")
    val out = Multimodal.sampleContainerFrames(df, "gif", stride = 2)
      .select($"id", $"n_frames", $"frames")
      .as[(Int, Int, Seq[Array[Byte]])].collect().sortBy(_._1)
    out.foreach { case (id, nf, kept) =>
      assert(nf == 5)
      assert(kept.length == 3) // frames 0, 2, 4
      kept.zip(Seq(0, 2, 4)).foreach { case (px, f) =>
        assert(px.toSeq == mk(id)(f).toSeq, s"doc $id frame $f")
      }
    }
  }

  test("WAV PCM16 round-trips samples, format, and endianness exactly") {
    val samples = Array.tabulate(777)(i => (((i * 37) % 4001) - 2000).toShort)
    val wav = Multimodal.encodeWavPcm16(8000, samples)
    // a real RIFF/WAVE container
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    assert(wav.slice(8, 12).map(_.toChar).mkString == "WAVE")
    val (sr, ch, bits, dec) = Multimodal.decodeWav(wav)
    assert((sr, ch, bits) == (8000, 1, 16))
    assert(dec.toSeq == samples.toSeq) // PCM is lossless
    // extremes survive the byte split
    val edge = Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue)
    val (_, _, _, dec2) = Multimodal.decodeWav(Multimodal.encodeWavPcm16(44100, edge))
    assert(dec2.toSeq == edge.toSeq)
  }

  test("decodeWav rejects non-audio bytes") {
    intercept[Exception] {
      Multimodal.decodeWav(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
  }

  test("RealImageDecoder round-trips PNG pixels exactly") {
    val w = 13; val h = 7
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 17 + 3) % 256).toByte)
    val png = Multimodal.encodePng(w, h, rgb)
    val (dw, dh, dc, fmt) = Multimodal.RealImageDecoder.decodeMeta(png)
    assert((dw, dh, dc, fmt) == (w, h, 3, "png"))
    val decoded = Multimodal.RealImageDecoder.decodePixels(png, w, h)
    assert(decoded.toSeq == rgb.toSeq) // PNG is lossless
  }

  test("RealImageDecoder reads JPEG meta and nearest-neighbor resizes") {
    val w = 16; val h = 16
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0x000000)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", baos)
    val jpeg = baos.toByteArray
    val (dw, dh, dc, fmt) = Multimodal.RealImageDecoder.decodeMeta(jpeg)
    assert((dw, dh, dc, fmt) == (w, h, 3, "jpeg"))
    // resize to 8x8 samples every other pixel; output shape is exact
    val px = Multimodal.RealImageDecoder.decodePixels(jpeg, 8, 8)
    assert(px.length == 8 * 8 * 3)
    // determinism: decoding twice is bit-identical
    assert(px.toSeq == Multimodal.RealImageDecoder.decodePixels(jpeg, 8, 8).toSeq)
  }

  test("RealImageDecoder rejects non-image bytes") {
    intercept[IllegalArgumentException] {
      Multimodal.RealImageDecoder.decodeMeta(Array[Byte](1, 2, 3))
    }
  }

  test("withImageMeta runs the real decoder over a binary column") {
    import spark.implicits._
    val rows = (0 until 8).map { i =>
      val w = 8 + i; val h = 6 + i
      val rgb = Array.tabulate(w * h * 3)(j => ((i * 31 + j) % 256).toByte)
      (i.toLong, Multimodal.encodePng(w, h, rgb))
    }
    val df = rows.toDF("id", "payload")
    val metas = Multimodal.withImageMeta(df, "payload", Multimodal.RealImageDecoder)
      .select($"id", $"media.width", $"media.height", $"media.channels", $"media.format")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(metas.toSeq == (0 until 8).map(i => (i.toLong, 8 + i, 6 + i, 3, "png")))
  }
}
