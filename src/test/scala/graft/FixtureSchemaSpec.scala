package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-drift guard: the driver regenerates /root/testdata between
  * rounds, and an encoding change must fail HERE — one test naming the
  * actual parquet logical types — not as N opaque analysis errors
  * spread across suites (round-7 incident: events.ts switched
  * TIMESTAMP(NANOS) -> TIMESTAMP_MICROS and took 10 queries plus 6
  * suites down with DATATYPE_MISMATCH noise).
  */
class FixtureSchemaSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def schemaOf(name: String) =
    spark.read.parquet(s"$sf/$name.parquet").schema

  test("every fixture table is readable and lists its resolved schema") {
    Tables.names.foreach { n =>
      val s = schemaOf(n)
      info(s"$n: ${s.simpleString}")
      assert(s.nonEmpty, s"$n resolved to an empty schema")
    }
  }

  test("events.ts is a supported event-time encoding (else name the actual type)") {
    val df = spark.read.parquet(s"$sf/events.parquet")
    val dt = df.schema("ts").dataType
    assert(
      dt == LongType || dt == TimestampType || dt == TimestampNTZType,
      s"events.ts regenerated with unsupported encoding $dt — " +
        "extend Tables.tsMicros/tsUtc for it; full schema: " +
        df.schema.simpleString)
    // and the adaptive accessors must actually resolve it
    Tables.tsMicros(df)
    Tables.tsUtc(df)
  }

  test("columns the query suite depends on are present") {
    val expected = Map(
      "events" -> Set("event_id", "user_id", "event_type", "value", "ts"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"),
      "lineitem" -> Set("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
      "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
    expected.foreach { case (table, cols) =>
      val have = schemaOf(table).fieldNames.toSet
      val missing = cols -- have
      assert(missing.isEmpty,
        s"$table lost expected columns $missing — actual: ${have.toSeq.sorted}")
    }
  }
}
