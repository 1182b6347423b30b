package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The reconciliation checksum's contract: a commutative-monoid
  * digest sum that is invariant to row order / partitioning / split
  * boundaries and sensitive to any single-field mutation — plus the
  * q67 oracle row's flags re-asserted from the query itself.
  */
class ReconcileSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = (1L to 1000L)
    .map(i => (i, s"name_$i", i * 37 % 101)).toDF("id", "name", "v")
  private val canon = concat_ws("|",
    col("id").cast("string"), col("name"), col("v").cast("string"))

  test("checksum is invariant to row order and partitioning") {
    val base = Reconcile.checksum(df, canon)
    assert(Reconcile.checksum(df.repartition(13), canon) == base)
    assert(Reconcile.checksum(
      df.orderBy(col("v").desc, col("id").desc), canon) == base)
    assert(Reconcile.checksum(df.coalesce(1), canon) == base)
    assert(Reconcile.checksum(df.repartitionByRange(7, col("v")), canon) == base)
  }

  test("a one-unit mutation in one row flips the checksum") {
    val mut = df.withColumn("v",
      when(col("id") === 500, col("v") + 1).otherwise(col("v")))
    assert(Reconcile.checksum(mut, canon) != Reconcile.checksum(df, canon))
  }

  test("Mersenne monoid: disjoint-split checksums combine to the whole") {
    val parts = Seq(
      df.filter(col("id") % 3 === 0),
      df.filter(col("id") % 3 === 1),
      df.filter(col("id") % 3 === 2))
    val combined = Reconcile.combine(parts.map(Reconcile.checksum(_, canon)))
    assert(combined == Reconcile.checksum(df, canon))
  }

  test("q67: roundtrip re-union matches, one-cent mutation mismatches") {
    val rows = graft.queries.Relational.q67ReconcileChecksum
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("variant") ->
        ((r.getAs[Long]("checksum"), r.getAs[Boolean]("matches_base"))))
      .toMap
    assert(rows("base")._2 && rows("roundtrip")._2)
    assert(rows("roundtrip")._1 == rows("base")._1)
    assert(!rows("mutated")._2 && rows("mutated")._1 != rows("base")._1)
  }
}
