package graft.catalog

import org.apache.spark.sql.functions._

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

  test("interrupted commit leaves the previous version live") {
    val root = tmpDir("catcrash")
    val cat = new Catalog(spark, root)
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id")))
    cat.append("t", Seq("1", "2").toDF("id"))
    // simulate a writer that died after materializing data but before
    // flipping the _current pointer: readers must not see it
    val orphan = new java.io.File(s"$root/t/v9999999999999_deadbeef")
    orphan.mkdirs()
    Seq("9").toDF("id").write.mode("overwrite").parquet(orphan.getPath)
    assert(cat.read("t").as[String].collect().sorted.toSeq == Seq("1", "2"))
    // and a subsequent commit still works
    cat.append("t", Seq("3").toDF("id"))
    assert(cat.read("t").count() == 3)
  }

  test("partial FIRST commit is not resurrected by the pointer-less fallback") {
    val root = tmpDir("catgate")
    val cat = new Catalog(spark, root)
    // a writer died mid-parquet-write of a table's first commit: data
    // files exist, no _SUCCESS, no pointer. The table must not exist.
    val partial = new java.io.File(s"$root/t/v1700000000000_partial")
    Seq("x").toDF("a").write.mode("overwrite").parquet(partial.getPath)
    assert(new java.io.File(partial, "_SUCCESS").delete())
    assert(!cat.exists("t"))
    intercept[Exception](cat.read("t"))
    // ...and a first commit retried on top of the debris works
    cat.createIfAbsent("t", cat.allStringSchema(Seq("a")))
    cat.append("t", Seq("y").toDF("a"))
    assert(cat.read("t").as[String].collect().toSeq == Seq("y"))

    // a partial first BUCKET commit (parquet finished, manifest never
    // written) must not be read back as plain parquet with a phantom
    // __b partition column
    val pb = new java.io.File(s"$root/tb/v1700000000000_pb")
    Seq(("1", "a")).toDF("id", "v")
      .withColumn("__b", lit(0)).write.partitionBy("__b").parquet(pb.getPath)
    assert(new java.io.File(pb, "_SUCCESS").exists()) // parquet job DID finish
    assert(!cat.exists("tb"))
    intercept[Exception](cat.read("tb"))
  }

  test("bucketed-table read is ONE multi-path scan, not a per-bucket union") {
    val cat = new Catalog(spark, tmpDir("catscan"))
    val n = 16
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    cat.registerBucketLayout("t", n)
    cat.overwriteAllBuckets("t", (1 to 200).map(i => (i.toString, s"v$i")).toDF("id", "v"))
    assert(cat.bucketRefs("t").size == n)
    val df = cat.read("t")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.length == 1,
      s"expected one scan over $n bucket dirs, got ${scans.length}:\n${df.queryExecution.optimizedPlan}")
    assert(df.count() == 200)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v")) // no phantom __b
  }

  test("lookupByPk scans exactly one bucket directory") {
    val cat = new Catalog(spark, tmpDir("catpk"))
    val n = 8
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    cat.registerBucketLayout("t", n)
    cat.overwriteAllBuckets("t", (1 to 80).map(i => (i.toString, s"v$i")).toDF("id", "v"))

    val hit = cat.lookupByPk("t", Seq("37"))
    assert(hit.as[(String, String)].collect().toSeq == Seq("37" -> "v37"))
    // the driver-side bucket computation must agree with the planned one
    val b = Seq("37").toDF("id")
      .select(cat.bucketOf(Seq("id"), n).as("b")).head().getInt(0)
    val files = cat.lookupByPk("t", Seq("37")).inputFiles
    assert(files.nonEmpty && files.forall(_.contains(s"__b=$b")),
      s"point read leaked beyond bucket $b: ${files.toSeq}")
    assert(cat.lookupByPk("t", Seq("no-such-key")).isEmpty)

    // unbucketed fallback: filtered full read
    cat.createIfAbsent("plain", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    cat.append("plain", Seq(("1", "a"), ("2", "b")).toDF("id", "v"))
    assert(cat.lookupByPk("plain", Seq("2")).as[(String, String)]
      .collect().toSeq == Seq("2" -> "b"))
  }

  test("partitioned overwrite prunes partitions on filtered reads") {
    val cat = new Catalog(spark, tmpDir("catpart"))
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .selectExpr("event_id", "event_type", "value")
    cat.createIfAbsent("ev", df.schema)
    cat.overwritePartitioned("ev", df, Seq("event_type"))
    assert(cat.read("ev").count() == df.count())
    val plan = cat.read("ev").filter($"event_type" === "click")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition pruning in:\n$plan")
    assert(cat.read("ev").filter($"event_type" === "click").count() ==
      df.filter($"event_type" === "click").count())
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

  test("vacuum: retention grace window, explicit reclaim, reads intact") {
    val root = tmpDir("catvac")
    // keep plenty of history so vacuum (not prune-on-commit) does the GC
    val cat = new Catalog(spark, root, graceVersions = 16)
    def versionDirs() = new java.io.File(s"$root/t").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("v")).toSet

    cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    (1 to 4).foreach(i => cat.append("t", Seq((i.toString, s"v$i")).toDF("id", "v")))
    assert(versionDirs().size == 5, "grace window must retain history")

    // a reader that resolved the pointer BEFORE further commits...
    val early = cat.read("t")
    cat.append("t", Seq(("9", "v9")).toDF("id", "v"))
    // ...still collects inside the grace window
    assert(early.count() == 4)

    // keepLast=1 keeps the newest unreferenced version, drops the rest
    val deleted = cat.vacuum("t", keepLast = 1)
    assert(deleted.nonEmpty && versionDirs().size == 2)
    assert(cat.read("t").count() == 5, "current read must survive vacuum")

    // minAge guard: versions younger than the floor are never touched
    assert(cat.vacuum("t", keepLast = 0, minAgeMs = 3600L * 1000).isEmpty)
    // full reclaim: only the live version remains; reads + fallback fine
    cat.vacuum("t")
    assert(versionDirs().size == 1)
    assert(cat.read("t").count() == 5)
    // crash fallback (pointer removed) still resolves the live version
    new java.io.File(s"$root/t/_current").delete()
    assert(cat.read("t").count() == 5)
  }

  test("time travel: readVersion within the retention window") {
    val cat = new Catalog(spark, tmpDir("cattt"), graceVersions = 8)
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    cat.append("t", Seq(("1", "a")).toDF("id", "v"))
    val v1 = cat.currentVersion("t")
    cat.append("t", Seq(("2", "b")).toDF("id", "v"))
    val v2 = cat.currentVersion("t")
    cat.overwrite("t", Seq(("9", "z")).toDF("id", "v"))
    assert(cat.versions("t").takeRight(1).head == cat.currentVersion("t"))
    assert(cat.versions("t").size == 4) // empty-create + 3 commits
    // each historical version reads its own contents
    assert(cat.readVersion("t", v1).as[(String, String)].collect().toSeq ==
      Seq("1" -> "a"))
    assert(cat.readVersion("t", v2).as[(String, String)].collect().toSet ==
      Set("1" -> "a", "2" -> "b"))
    assert(cat.read("t").as[(String, String)].collect().toSeq == Seq("9" -> "z"))
    // past the vacuum horizon, time travel fails loudly
    cat.vacuum("t")
    val e = intercept[IllegalArgumentException] { cat.readVersion("t", v1) }
    assert(e.getMessage.contains("vacuumed"))

    // manifest tables resolve THEIR OWN refs: an append-log's old
    // version sees only the refs as of that commit
    cat.appendLog("log", Seq((1L, "a")).toDF("id", "v"))
    val lv1 = cat.currentVersion("log")
    cat.appendLog("log", Seq((2L, "b")).toDF("id", "v"))
    assert(cat.readVersion("log", lv1).select($"id").as[Long].collect().toSeq ==
      Seq(1L))
    assert(cat.read("log").select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("vacuum never deletes manifest-referenced old versions") {
    val root = tmpDir("catvacb")
    val cat = new Catalog(spark, root, graceVersions = 16)
    val n = 4
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    cat.registerBucketLayout("t", n)
    val rows = (1 to 40).map(i => (i.toString, s"v$i"))
    cat.overwriteAllBuckets("t", rows.toDF("id", "v"))
    val v0 = cat.bucketRefs("t").values.map(_.split("/").head).toSet
    assert(v0.size == 1)

    // touch one bucket twice: v0 stays referenced by the untouched
    // buckets; the middle rewrite becomes unreferenced garbage
    val b7 = rows.toDF("id", "v").filter($"id" === "7")
      .select(cat.bucketOf(Seq("id"), n).as("b")).head().getInt(0)
    cat.overwriteBuckets("t",
      cat.readBuckets("t", Seq(b7)).withColumn("v", concat($"v", lit("!"))), Seq(b7))
    cat.overwriteBuckets("t",
      cat.readBuckets("t", Seq(b7)).withColumn("v", concat($"v", lit("?"))), Seq(b7))

    val deleted = cat.vacuum("t")
    val live = cat.bucketRefs("t").values.map(_.split("/").head).toSet
    assert(v0.subsetOf(live), "old version referenced by untouched buckets must survive")
    assert(deleted.forall(!live.contains(_)))
    val dirs = new java.io.File(s"$root/t").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("v")).toSet
    assert(dirs == live, s"exactly the referenced versions survive: $dirs vs $live")

    // data + point reads intact after GC
    assert(cat.read("t").count() == 40)
    assert(cat.read("t").filter($"id" === "7").select("v").head().getString(0) == "v7!?")
    assert(cat.lookupByPk("t", Seq("37")).as[(String, String)]
      .collect().toSeq == Seq("37" -> "v37"))
  }

  test("bucket layout: partial rewrite touches only the mutated buckets") {
    val cat = new Catalog(spark, tmpDir("catbuck"))
    val n = 4
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    cat.registerBucketLayout("t", n)
    assert(cat.bucketCount("t").contains(n))

    val rows = (1 to 40).map(i => (i.toString, s"v$i"))
    cat.overwriteAllBuckets("t", rows.toDF("id", "v"))
    assert(cat.hasBucketManifest("t"))
    val refs0 = cat.bucketRefs("t")
    assert(refs0.keySet == (0 until n).toSet) // 40 ids cover all 4 buckets
    assert(cat.read("t").count() == 40)

    // rewrite ONE bucket: pick the bucket of id "7" and update its rows
    val b7 = rows.toDF("id", "v").filter($"id" === "7")
      .select(cat.bucketOf(Seq("id"), n).as("b")).head().getInt(0)
    val newBucketRows = cat.readBuckets("t", Seq(b7))
      .withColumn("v", concat($"v", lit("!")))
    cat.overwriteBuckets("t", newBucketRows, Seq(b7))

    val refs1 = cat.bucketRefs("t")
    assert(refs1(b7) != refs0(b7), "touched bucket must get a new directory")
    // buckets now spread over two live versions, both surviving pruning
    assert(refs1.values.map(_.split("/").head).toSet.size == 2)
    refs0.keys.filter(_ != b7).foreach { k =>
      assert(refs1(k) == refs0(k),
        s"untouched bucket $k was rewritten: ${refs0(k)} -> ${refs1(k)}")
    }
    assert(cat.read("t").filter($"id" === "7").select("v").head().getString(0) == "v7!")
    assert(cat.read("t").count() == 40)

    // bucket-pruned read scans ONLY the requested bucket's files
    val files = cat.readBuckets("t", Seq(b7)).inputFiles
    assert(files.nonEmpty && files.forall(_.contains(s"__b=$b7")),
      s"readBuckets leaked beyond bucket $b7: ${files.toSeq}")

    // deleting every row of a bucket drops its manifest entry
    cat.overwriteBuckets("t",
      cat.readBuckets("t", Seq(b7)).limit(0), Seq(b7))
    assert(!cat.bucketRefs("t").contains(b7))
    assert(cat.read("t").count() == 40 - newBucketRows.count())
  }

  test("appendLog is O(batch): history refs never rewritten") {
    val cat = new Catalog(spark, tmpDir("catlog"))
    cat.appendLog("log", Seq((1L, "a")).toDF("id", "v"))
    val refs1 = cat.bucketRefs("log")
    cat.appendLog("log", Seq((2L, "b")).toDF("id", "v"))
    val refs2 = cat.bucketRefs("log")
    cat.appendLog("log", Seq((3L, "c")).toDF("id", "v"))
    val refs3 = cat.bucketRefs("log")
    // one new ref per append; all prior refs byte-identical
    assert(refs2.size == refs1.size + 1 && refs3.size == refs2.size + 1)
    refs1.foreach { case (k, v) => assert(refs2(k) == v && refs3(k) == v) }
    assert(cat.read("log").select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // still ONE multi-path scan despite three refs
    val plan = cat.read("log").queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length == 2, s"multiple scans:\n$plan")

    // compaction folds the log into a single ref, contents intact
    cat.compactLog("log")
    assert(cat.bucketRefs("log").size == 1)
    assert(cat.read("log").select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))

    // schema drift fails fast instead of silently nulling history
    val renamed = intercept[IllegalArgumentException] {
      cat.appendLog("log", Seq((4L, "d")).toDF("id", "label"))
    }
    assert(renamed.getMessage.contains("schema drift"))
    intercept[IllegalArgumentException] {
      cat.appendLog("log", Seq((4, "d")).toDF("id", "v")) // id retyped int
    }
    // compatible appends (nullability aside) still land
    cat.appendLog("log", Seq((4L, "d")).toDF("id", "v"))
    assert(cat.read("log").count() == 4)
  }

  test("appendLog schema evolution: column adds read as one frame, retypes still fatal") {
    val cat = new Catalog(spark, tmpDir("catevolve"))
    cat.appendLog("log", Seq((1L, "a")).toDF("id", "v"))
    // evolved batch adds a nullable column; history refs resolve by
    // name under the union schema and yield nulls for the missing one
    cat.appendLog("log",
      Seq((2L, "b", 0.5)).toDF("id", "v", "score"), evolveSchema = true)
    val got = cat.read("log").orderBy("id")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", Some(0.5))))
    // an evolved append may also OMIT a stored column (old writer,
    // new table): its rows read back null for it
    cat.appendLog("log", Seq((3L, "c")).toDF("id", "v"), evolveSchema = true)
    assert(cat.read("log").filter($"id" === 3L)
      .select($"score").as[Option[Double]].head().isEmpty)
    // a NON-evolved append still requires the full current schema
    intercept[IllegalArgumentException] {
      cat.appendLog("log", Seq((4L, "d")).toDF("id", "v"))
    }
    // same-name type changes are never evolution
    val retyped = intercept[IllegalArgumentException] {
      cat.appendLog("log",
        Seq((4L, "d", "high")).toDF("id", "v", "score"), evolveSchema = true)
    }
    assert(retyped.getMessage.contains("type drift"))
    // compaction folds under the union schema, contents intact
    cat.compactLog("log")
    assert(cat.bucketRefs("log").size == 1)
    assert(cat.read("log").orderBy("id")
      .as[(Long, String, Option[Double])].collect().toSeq ==
      Seq((1L, "a", None), (2L, "b", Some(0.5)), (3L, "c", None)))
  }

  test("sorted write enables row-group skipping on the sort key") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    val cat = new Catalog(spark, tmpDir("catsort"))
    val rows = (1 to 100000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    cat.overwrite("shuffled", rows.repartition(8)) // every file spans the full range
    cat.overwriteSorted("clustered", rows, Seq("id"))
    assert(cat.read("clustered").count() == 100000)

    val fromShuffled = scanRows(cat.read("shuffled").filter($"id" === 42L))
    val fromClustered = scanRows(cat.read("clustered").filter($"id" === 42L))
    // both answers identical; the clustered scan reads a fraction of
    // the rows because non-matching row groups never decode
    assert(fromClustered < fromShuffled / 2,
      s"no data skipping: clustered read $fromClustered rows vs $fromShuffled")
    assert(cat.read("clustered").filter($"id" === 42L).count() == 1)
  }

  test("bloom-filtered write skips row groups for point probes on unsorted keys") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    val cat = new Catalog(spark, tmpDir("catbloom"))
    // hash-scrambled key order: every row group's min/max spans nearly
    // the full key range, so stats-based skipping is useless — exactly
    // the case bloom filters exist for
    val rows = spark.range(400000)
      .select(hash(col("id")).cast("long").as("k"), col("id").as("v"))
    val blocks = Some(256L * 1024)
    cat.overwriteWithBloom("bloomed", rows, Seq("k"), expectedNdv = 400000,
      rowGroupBytes = blocks)
    // identical layout and block size, bloom only on a column the
    // probe never filters: min/max stats are all the k-probe gets
    cat.overwriteWithBloom("plain", rows, Seq("v"), expectedNdv = 400000,
      rowGroupBytes = blocks)

    val probe = cat.read("bloomed").select(col("k")).head().getLong(0)
    assert(cat.read("bloomed").filter(col("k") === probe).count() ==
      cat.read("plain").filter(col("k") === probe).count())
    val bloomed = scanRows(cat.read("bloomed").filter(col("k") === probe))
    val plain = scanRows(cat.read("plain").filter(col("k") === probe))
    assert(bloomed < plain / 2,
      s"bloom filter not skipping: $bloomed rows vs $plain without")
  }

  test("z-ordered write skips on BOTH dimensions; lexicographic only on the first") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    val cat = new Catalog(spark, tmpDir("catz"))
    // 256×392 grid: every (x, y) combination — under lexicographic
    // (x, y) sort each file spans the FULL y range
    val rows = (0 until 100352).map(i => (i.toLong, (i % 256).toLong, (i / 256).toLong))
      .toDF("id", "x", "y")
    cat.overwriteSorted("lex", rows, Seq("x", "y"))
    cat.overwriteZOrdered("zed", rows, Seq("x", "y"), bits = 4,
      numPartitions = Some(16))
    assert(cat.read("zed").count() == 100352)

    // identical answers on every probe
    def q(t: String, c: String, v: Long) = cat.read(t).filter(col(c) === v)
    assert(q("zed", "y", 7).count() == q("lex", "y", 7).count())
    assert(q("zed", "x", 7).count() == q("lex", "x", 7).count())

    // trailing-column filter: lex reads everything, z-order skips
    val lexY = scanRows(q("lex", "y", 7))
    val zedY = scanRows(q("zed", "y", 7))
    assert(zedY < lexY / 2, s"no y-skipping under z-order: $zedY vs lex $lexY")
    // leading-column filter must still skip under z-order
    val fullScan = scanRows(cat.read("zed"))
    val zedX = scanRows(q("zed", "x", 7))
    assert(zedX < fullScan / 2, s"no x-skipping under z-order: $zedX of $fullScan")
  }

  test("appendLogClustered: filtered reads skip history row groups") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    val cat = new Catalog(spark, tmpDir("catlogclust"))
    def batch(seed: Int) = (1 to 50000)
      .map(i => ((i * 31 + seed) % 64, s"k$seed-$i")).toDF("kb", "key")
    // same history appended twice: one log clustered on kb, one not
    (0 until 3).foreach { s =>
      cat.appendLogClustered("clustered", batch(s), Seq("kb", "key"))
      cat.appendLog("plain", batch(s).repartition(8))
    }
    assert(cat.read("clustered").count() == 150000)
    val q = (t: String) => cat.read(t).filter($"kb" === 7)
    assert(q("clustered").count() == q("plain").count())
    val clustered = scanRows(q("clustered"))
    val plain = scanRows(q("plain"))
    assert(clustered < plain / 2,
      s"no history skipping: clustered read $clustered rows vs $plain")
  }

  test("commit lock: two catalog instances racing appends lose no update") {
    // Two Catalog INSTANCES over one root model two driver processes:
    // `synchronized` is per-instance, so only the _commit.lock file
    // serializes them. Each append is read-current + union + pointer
    // flip; without the lock, interleaved appends resolve the same
    // parent version and the second flip silently drops the first's
    // rows (lost update).
    val root = tmpDir("catrace")
    val catA = new Catalog(spark, root)
    val catB = new Catalog(spark, root)
    catA.createIfAbsent("t", catA.allStringSchema(Seq("id")), Seq("id"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val n = 12
    try {
      val futures = (1 to n).map { i =>
        val c = if (i % 2 == 0) catA else catB
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = c.append("t", Seq(i.toString).toDF("id"))
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    assert(catA.read("t").as[String].collect().toSet ==
      (1 to n).map(_.toString).toSet, "a racing append was lost")
    // both held and released: no lock file survives
    assert(!new java.io.File(s"$root/t/_commit.lock").exists())
  }

  test("commit lock: held lock times out loudly, stale lock is broken") {
    val root = tmpDir("catstale")
    val lock = new java.io.File(s"$root/t/_commit.lock")
    // a FRESH foreign lock (live holder) must time out, not deadlock
    val catSlow = new Catalog(spark, root, lockTimeoutMs = 300)
    catSlow.createIfAbsent("t", catSlow.allStringSchema(Seq("id")), Nil)
    lock.getParentFile.mkdirs()
    assert(lock.createNewFile())
    val ex = intercept[IllegalStateException] {
      catSlow.append("t", Seq("x").toDF("id"))
    }
    assert(ex.getMessage.contains("commit lock"))
    // a STALE lock (crashed holder) is broken and the commit proceeds
    val catFast = new Catalog(spark, root, lockTimeoutMs = 2000,
      lockStaleMs = 100)
    assert(lock.setLastModified(System.currentTimeMillis() - 10000))
    catFast.append("t", Seq("y").toDF("id"))
    assert(catFast.read("t").as[String].collect().toSeq == Seq("y"))
    assert(!lock.exists(), "broken stale lock must not linger")
  }

  test("compact rewrites fragmented buckets to one file each, data intact") {
    val cat = new Catalog(spark, tmpDir("catcompact"))
    val n = 4
    cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    cat.registerBucketLayout("t", n)
    // 8 upstream partitions → each bucket directory collects several
    // part-files (the fragmentation a mutation burst leaves behind)
    val rows = (1 to 200).map(i => (i.toString, s"v$i"))
    cat.overwriteAllBuckets("t", rows.toDF("id", "v").repartition(8))
    val before = cat.read("t").inputFiles.length
    assert(before > n, s"expected fragmented buckets, got $before files")

    val compacted = cat.compact("t")
    assert(compacted.nonEmpty)
    // one part-file per bucket, identical contents
    val after = cat.read("t").inputFiles
    assert(after.length == cat.bucketRefs("t").size,
      s"expected one file per bucket, got ${after.toSeq}")
    assert(cat.read("t").count() == 200)
    assert(cat.read("t").select("id", "v").as[(String, String)].collect().toSet ==
      rows.toSet)

    // second compact is a no-op: nothing fragmented
    assert(cat.compact("t").isEmpty)

    // point reads still prune to one bucket after compaction
    val one = cat.lookupByPk("t", Seq("7"))
    assert(one.count() == 1)
    assert(one.inputFiles.length == 1)
  }
}
