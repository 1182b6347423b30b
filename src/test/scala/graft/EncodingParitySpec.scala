package graft

import org.apache.spark.sql.functions._

/** Event-time encoding parity: the SAME events data stored as
  * nanos-as-long BIGINT, TIMESTAMP, and TIMESTAMP_NTZ must produce
  * IDENTICAL results from the event-time queries — the contract behind
  * Tables.tsMicros/tsUtc. This is the regression test for the round-7
  * incident (fixture regenerated NANOS -> MICROS, 10 queries died at
  * analysis): any future encoding the accessors claim to support gets
  * proven here at query level, not just type level.
  */
class EncodingParitySpec extends SparkTestBase {
  import spark.implicits._

  // one fixture dir per encoding, each holding an events.parquet with
  // identical instants
  private lazy val dirs: Map[String, String] = {
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val micros = Tables.tsMicros(src)
    def dir(tag: String)(recode: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): (String, String) = {
      val d = tmpDir(s"enc_$tag")
      recode(src.withColumn("__us", micros)).drop("__us")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      tag -> d
    }
    Map(
      dir("long")(df => df.withColumn("ts", col("__us") * 1000L)),
      dir("tz")(df => df.withColumn("ts", timestamp_micros(col("__us")))),
      dir("ntz")(df => df.withColumn("ts",
        timestamp_micros(col("__us")).cast("timestamp_ntz"))))
  }

  private def resolvedType(tag: String): String =
    spark.read.parquet(s"${dirs(tag)}/events.parquet")
      .schema("ts").dataType.simpleString

  test("the three encodings resolve to three distinct Spark types") {
    assert(resolvedType("long") == "bigint")
    assert(resolvedType("tz") == "timestamp")
    assert(resolvedType("ntz") == "timestamp_ntz")
  }

  test("tumbling windows (e01) are identical across all ts encodings") {
    val results = dirs.map { case (tag, d) =>
      tag -> graft.queries.EventOps.e01TumblingWindows.fn(spark, d)
        .collect().toSeq
    }
    val expected = results("long")
    assert(expected.nonEmpty)
    results.foreach { case (tag, rows) =>
      assert(rows == expected, s"encoding $tag diverged from nanos-as-long")
    }
  }

  test("sessionization (e02) is identical across all ts encodings") {
    val results = dirs.map { case (tag, d) =>
      tag -> graft.queries.EventOps.e02Sessionize.fn(spark, d)
        .collect().toSeq
    }
    val expected = results("long")
    assert(expected.nonEmpty)
    results.foreach { case (tag, rows) =>
      assert(rows == expected, s"encoding $tag diverged from nanos-as-long")
    }
  }

  test("an unsupported encoding fails loudly naming the actual type") {
    val bad = Seq((1L, "x")).toDF("ts", "v")
      .withColumn("ts", col("ts").cast("string"))
    val e = intercept[IllegalArgumentException](Tables.tsMicros(bad))
    assert(e.getMessage.contains("StringType") && e.getMessage.contains("ts"))
  }
}
