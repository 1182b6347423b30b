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

  test("RealImageDecoder is an explicit stub") {
    intercept[NotImplementedError] {
      Multimodal.RealImageDecoder.decodeMeta(Array[Byte](1, 2))
    }
  }
}
