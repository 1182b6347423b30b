package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PathOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("deriveTableName matches reference cases (data-query.py:62-68)") {
    assert(PathOps.deriveTableName("report 2024.csv") == "report_2024")
    assert(PathOps.deriveTableName("Report 2024-Q1.final.csv") == "report_2024_q1_final")
    assert(PathOps.deriveTableName("Customers.CSV") == "customers")
    assert(PathOps.deriveTableName("noext") == "noext")
    assert(PathOps.deriveTableName("weird name!@#.csv") == "weird_name___")
  }

  test("deriveTableName column expression agrees with driver-side fn") {
    val names = Seq("report 2024.csv", "A-B.c.d.CSV", "x_1.txt")
    val got = names.toDF("f")
      .select(PathOps.deriveTableName(col("f"))).as[String].collect().toSeq
    assert(got == names.map(PathOps.deriveTableName))
  }

  test("operation routing from path (data-query.py:212-229)") {
    val df = Seq("insert/a.csv", "update/sub/b.csv", "delete/c.csv",
      "other/d.csv", "e.csv").toDF("path")
      .select(PathOps.operationFromPath(col("path")).as("op"),
        PathOps.fileNameFromPath(col("path")).as("f"))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("insert", "update", "delete", "other", "e.csv"))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("a.csv", "b.csv", "c.csv", "d.csv", "e.csv"))
    val valid = df.filter(PathOps.isValidOperation(col("op"))).count()
    assert(valid == 3)
  }

  test("nextVersion = MAX+1, null -> 0 (data-query.py:70-85)") {
    val ctrl = Seq(("a.csv", 1L), ("a.csv", 2L), ("b.csv", 7L))
      .toDF("file_name", "file_version")
    assert(PathOps.nextVersion(ctrl, "a.csv") == 3L)
    assert(PathOps.nextVersion(ctrl, "b.csv") == 8L)
    assert(PathOps.nextVersion(ctrl, "new.csv") == 1L)
  }

  test("assignVersions continues per-file history across a batch") {
    val ctrl = Seq(("a.csv", 2L)).toDF("file_name", "file_version")
    val arrivals = Seq(("a.csv", 10L), ("a.csv", 20L), ("b.csv", 30L))
      .toDF("file_name", "ord")
    val got = PathOps.assignVersions(ctrl, arrivals, col("ord"))
      .select("file_name", "file_version").as[(String, Long)]
      .collect().toSet
    assert(got == Set(("a.csv", 3L), ("a.csv", 4L), ("b.csv", 1L)))
  }
}
