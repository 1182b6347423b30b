package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IvmSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(k: String, n: Int, start: Int): DataFrame =
    (start until start + n).map(i => (k, i.toLong)).toDF("k", "v")

  private def collectState(df: DataFrame): Map[String, Seq[Any]] =
    df.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap

  private val vals = Seq("v" -> $"v".cast("decimal(19,0)"))

  test("append-only: merge of arbitrary batch splits equals full recompute, extrema included") {
    val all = rows("a", 5, 0).union(rows("b", 3, 10))
    val split1 = all.filter($"v" % 2 === 0)
    val split2 = all.filter($"v" % 2 === 1)
    val merged = Ivm.merge(Seq("k"),
      Ivm.partialize(split1, Seq("k"), vals),
      Ivm.partialize(split2, Seq("k"), vals))
    val full = Ivm.partialize(all, Seq("k"), vals)
    assert(collectState(merged) == collectState(full))
    // and a three-way uneven split merges to the same state
    val merged3 = Ivm.merge(Seq("k"),
      Ivm.partialize(all.filter($"v" < 2), Seq("k"), vals),
      Ivm.partialize(all.filter($"v" >= 2 && $"v" < 11), Seq("k"), vals),
      Ivm.partialize(all.filter($"v" >= 11), Seq("k"), vals))
    assert(collectState(merged3) == collectState(full))
  }

  test("signed: retractions subtract exactly; fully-retracted group vanishes") {
    val base = rows("a", 4, 0).union(rows("gone", 2, 100))
    val baseState = Ivm.partializeSigned(base, Seq("k"), vals, lit(1L))
    // retract all of "gone" and one row of "a"; insert two new "a" rows
    val delta = Seq(
      ("gone", 100L, -1L), ("gone", 101L, -1L), ("a", 0L, -1L),
      ("a", 50L, 1L), ("a", 51L, 1L)).toDF("k", "v", "s")
    val deltaState = Ivm.partializeSigned(delta, Seq("k"), vals, $"s")
    val merged = Ivm.merge(Seq("k"), baseState, deltaState)
    val surviving = rows("a", 3, 1).union(Seq(("a", 50L), ("a", 51L)).toDF("k", "v"))
    val expect = Ivm.partializeSigned(surviving, Seq("k"), vals, lit(1L))
    assert(collectState(merged) == collectState(expect))
    assert(merged.filter($"k" === "gone").count() == 0)
  }

  test("merge of one state is idempotent (re-aggregation changes nothing)") {
    val st = Ivm.partialize(rows("a", 5, 0), Seq("k"), vals)
    assert(collectState(Ivm.merge(Seq("k"), st)) == collectState(st))
  }

  test("merge rejects state frames with unrecognized columns") {
    val bad = rows("a", 2, 0).withColumnRenamed("v", "__cnt")
      .withColumn("mystery", lit(1))
    intercept[IllegalArgumentException] {
      Ivm.merge(Seq("k"), bad)
    }
  }
}
