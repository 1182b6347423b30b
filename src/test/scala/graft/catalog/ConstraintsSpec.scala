package graft.catalog

import graft.SparkTestBase

class ConstraintsSpec extends SparkTestBase {
  import spark.implicits._

  test("violating commit fails loudly with per-constraint counts; table unchanged") {
    val cat = new Catalog(spark, tmpDir("cons1"))
    cat.overwrite("t", Seq((1L, 10), (2L, 20)).toDF("id", "score"))
    cat.registerConstraints("t", Map(
      "score_range" -> "score BETWEEN 0 AND 100",
      "id_positive" -> "id > 0"))
    // a clean commit passes
    cat.overwrite("t", Seq((1L, 10), (3L, 99)).toDF("id", "score"))
    val e = intercept[IllegalArgumentException] {
      cat.overwrite("t", Seq((0L, 10), (4L, 150), (5L, 200)).toDF("id", "score"))
    }
    assert(e.getMessage.contains("score_range") && e.getMessage.contains("2 rows"))
    assert(e.getMessage.contains("id_positive") && e.getMessage.contains("1 rows"))
    // nothing landed: the last good version still serves
    assert(cat.read("t").as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (3L, 99)))
  }

  test("NULL passes like ANSI CHECK; explicit IS NOT NULL catches it") {
    val cat = new Catalog(spark, tmpDir("cons2"))
    cat.overwrite("t", Seq((1L, Option(5))).toDF("id", "v"))
    cat.registerConstraints("t", Map("v_small" -> "v < 10"))
    cat.overwrite("t", Seq((1L, None: Option[Int])).toDF("id", "v")) // null passes
    cat.registerConstraints("t", Map("v_notnull" -> "v IS NOT NULL"))
    intercept[IllegalArgumentException] {
      cat.overwrite("t", Seq((2L, None: Option[Int])).toDF("id", "v"))
    }
  }

  test("appendLog validates the batch; constraints survive later meta rewrites") {
    val cat = new Catalog(spark, tmpDir("cons3"))
    cat.appendLog("log", Seq((1L, "a")).toDF("id", "v"))
    cat.registerConstraints("log", Map("v_nonempty" -> "length(v) > 0"))
    cat.appendLog("log", Seq((2L, "b")).toDF("id", "v"))
    // a pk registration rewrites meta — constraints must persist
    cat.registerPrimaryKey("log", Seq("id"))
    assert(cat.constraints("log") == Map("v_nonempty" -> "length(v) > 0"))
    intercept[IllegalArgumentException] {
      cat.appendLog("log", Seq((3L, "")).toDF("id", "v"))
    }
    assert(cat.read("log").count() == 2)
  }
}
