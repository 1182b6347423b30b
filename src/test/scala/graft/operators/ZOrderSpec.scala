package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Morton-key math (Spark == plain-Scala reference) and the layout
  * claim itself: the same 2-D box predicate must decode fewer parquet
  * rows under z-ordered row groups than under a single-column sort,
  * because interleaved clustering keeps min/max stats tight on both
  * dimensions.
  */
class ZOrderSpec extends SparkTestBase {

  test("morton key equals the reference bit-interleave") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (65535L, 65535L), (12345L, 54321L), (40000L, 7L))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.interleave16($"a", $"b")).as[Long].collect()
    val want = pairs.map { case (a, b) => ZOrder.interleave16(a, b) }
    assert(got.toSeq == want)
    // spot-pin one value against the definition: bits of a at even
    // positions, b at odd → (a=3, b=5) = 0b100111 = 39
    assert(ZOrder.interleave16(3L, 5L) == 39L)
  }

  /** Rows the parquet reader actually decoded (scan output before any
    * post-scan filter) — row groups pruned by pushed min/max stats
    * never reach this count.
    */
  private def decodedRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, plan.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("2-D box predicate decodes fewer rows under z-order than single-column sort") {
    import spark.implicits._
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val root = tmpDir("zorder")
    val (pMin, sMin) = li.agg(min($"l_partkey"), min($"l_suppkey"))
      .as[(Long, Long)].collect().head
    val (pM, sM) = li.agg(max($"l_partkey"), max($"l_suppkey"))
      .as[(Long, Long)].collect().head
    // 64 files, one row group each: file == row group, so row-group
    // pruning is observable as decoded-row counts. Dimensions are
    // min-max scaled to 16 bits first — raw interleave of an 11-bit
    // and a 7-bit key collapses toward a partkey sort (measured: only
    // 22% gain unscaled vs >50% scaled).
    li.withColumn("zkey",
        ZOrder.interleave16(
          ZOrder.normalize16($"l_partkey", pMin, pM),
          ZOrder.normalize16($"l_suppkey", sMin, sM)))
      .repartitionByRange(64, $"zkey").sortWithinPartitions($"zkey")
      .drop("zkey")
      .write.parquet(s"$root/z")
    li.repartitionByRange(64, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.parquet(s"$root/linear")

    def box(path: String): DataFrame =
      spark.read.parquet(path)
        .filter($"l_partkey" <= pM / 4 && $"l_suppkey" <= sM / 4)
    val zRows = decodedRows(box(s"$root/z"))
    val linRows = decodedRows(box(s"$root/linear"))
    val matched = box(s"$root/z").count()
    assert(matched == box(s"$root/linear").count()) // same answer either way
    // the single-column sort prunes on l_partkey only (~1/4 decoded);
    // z-order prunes on both dimensions and must decode strictly less
    assert(zRows < linRows,
      s"z-order decoded $zRows rows vs linear $linRows")
    assert(zRows.toDouble <= linRows * 0.5,
      s"expected >=50% row-group skipping gain: z=$zRows linear=$linRows matched=$matched")
  }
}
