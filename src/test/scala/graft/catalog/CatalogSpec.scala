package graft.catalog

import graft.SparkTestBase

class CatalogSpec extends SparkTestBase {
  import spark.implicits._

  test("createIfAbsent with all-string schema, append, overwrite, PKs") {
    val cat = new Catalog(spark, tmpDir("cat"))
    assert(!cat.exists("t"))
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    assert(cat.exists("t"))
    assert(cat.read("t").count() == 0)
    assert(cat.schema("t").fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("id", "string"), ("v", "string")))
    assert(cat.primaryKey("t") == Seq("id"))

    // createIfAbsent is a no-op when the table exists (O9)
    cat.createIfAbsent("t", cat.allStringSchema(Seq("other")), Nil)
    assert(cat.schema("t").fieldNames.toSeq == Seq("id", "v"))

    cat.append("t", Seq(("1", "a"), ("2", "b")).toDF("id", "v"))
    assert(cat.read("t").count() == 2)
    cat.append("t", Seq(("3", "c")).toDF("id", "v"))
    assert(cat.read("t").count() == 3)
    assert(cat.primaryKey("t") == Seq("id")) // survives commits

    // read-modify-overwrite against the live version must not clobber
    val filtered = cat.read("t").filter($"id" =!= "2")
    cat.overwrite("t", filtered)
    assert(cat.read("t").as[(String, String)].collect().toSet ==
      Set("1" -> "a", "3" -> "c"))
    assert(cat.listTables() == Seq("t"))
  }

  test("old versions are pruned after commit") {
    val root = tmpDir("catv")
    val cat = new Catalog(spark, root)
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id")))
    cat.append("t", Seq("1").toDF("id"))
    cat.append("t", Seq("2").toDF("id"))
    val dirs = new java.io.File(s"$root/t").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("v")) == 1, s"expected 1 live version, got ${dirs.toSeq}")
    assert(cat.read("t").count() == 2)
  }
}
