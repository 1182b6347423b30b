package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TableDiff

class TableDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("diff classifies insert/delete/update and skips unchanged rows") {
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "v", "n")
    val next = Seq((2L, "b", 20), (3L, "C", 30), (4L, "d", 40)).toDF("id", "v", "n")
    val got = TableDiff.diff(old, next, Seq("id"))
      .as[(String, Long, String, Int)].collect().toSet
    assert(got == Set(
      ("delete", 1L, "a", 10),   // old values
      ("update", 3L, "C", 30),   // new values
      ("insert", 4L, "d", 40)))
  }

  test("null transitions are changes; null-keyed comparisons stay null-safe") {
    val old = Seq((1L, Option("a")), (2L, None: Option[String])).toDF("id", "v")
    val next = Seq((1L, None: Option[String]), (2L, None: Option[String])).toDF("id", "v")
    val got = TableDiff.diff(old, next, Seq("id"))
      .as[(String, Long, Option[String])].collect().toSet
    // 2 is unchanged (null <=> null); 1 changed a -> null
    assert(got == Set(("update", 1L, None)))
  }

  test("diffVersions yields the change feed between two committed versions") {
    val cat = new Catalog(spark, tmpDir("catdiff"), graceVersions = 8)
    cat.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    cat.registerPrimaryKey("t", Seq("id"))
    val v1 = cat.currentVersion("t")
    cat.overwrite("t", Seq((1L, "a2"), (3L, "c")).toDF("id", "v"))
    val v2 = cat.currentVersion("t")
    val feed = cat.diffVersions("t", v1, v2)
      .as[(String, Long, String)].collect().toSet
    assert(feed == Set(("update", 1L, "a2"), ("delete", 2L, "b"),
      ("insert", 3L, "c")))
    // reverse direction inverts the feed
    val rev = cat.diffVersions("t", v2, v1)
      .as[(String, Long, String)].collect().toSet
    assert(rev == Set(("update", 1L, "a"), ("insert", 2L, "b"),
      ("delete", 3L, "c")))
  }
}
