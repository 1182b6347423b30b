package graft.catalog

import graft.SparkTestBase

class PromotionSpec extends SparkTestBase {
  import spark.implicits._

  private def envs() = (
    new Catalog(spark, tmpDir("envdev"), graceVersions = 4),
    new Catalog(spark, tmpDir("envuat"), graceVersions = 4),
    new Catalog(spark, tmpDir("envprod"), graceVersions = 4))

  test("a failing gate blocks promotion; the target keeps its last good version") {
    val (dev, uat, _) = envs()
    dev.overwrite("orders", Seq((1L, 10.0), (2L, -5.0)).toDF("id", "amount"))
    dev.registerPrimaryKey("orders", Seq("id"))
    // seed UAT with a known-good prior version
    uat.overwrite("orders", Seq((1L, 9.0)).toDF("id", "amount"))
    val uatBefore = uat.currentVersion("orders")
    val e = intercept[Promotion.PromotionRejected] {
      Promotion.promote(dev, uat, "orders", Map(
        "amount_nonneg" -> "amount >= 0",
        "id_positive" -> "id > 0"))
    }
    assert(e.getMessage.contains("amount_nonneg") &&
      e.getMessage.contains("1 rows"))
    // the full report names passing gates too
    assert(e.reports.map(r => r.gate -> r.violations).toMap ==
      Map("amount_nonneg" -> 1L, "id_positive" -> 0L))
    // UAT untouched: same version, same rows
    assert(uat.currentVersion("orders") == uatBefore)
    assert(uat.read("orders").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 9.0)))
  }

  test("a passing promotion is atomic and reports the change feed; prior version time-travels") {
    val (dev, uat, _) = envs()
    dev.overwrite("orders",
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "amount"))
    dev.registerPrimaryKey("orders", Seq("id"))
    uat.overwrite("orders", Seq((1L, 10.0), (9L, 99.0)).toDF("id", "amount"))
    val uatBefore = uat.currentVersion("orders")
    val rep = Promotion.promote(dev, uat, "orders",
      Map("amount_nonneg" -> "amount >= 0"))
    assert(rep.candidateVersion == dev.currentVersion("orders"))
    assert(rep.promotedVersion == uat.currentVersion("orders"))
    assert(rep.promotedVersion != uatBefore)
    assert(rep.gates == Seq(
      Promotion.GateReport("amount_nonneg", "amount >= 0", 0L)))
    // change feed vs UAT's prior serve: 2,3 inserted, 9 deleted, 1 same
    assert((rep.inserts, rep.updates, rep.deletes) ==
      (Some(2L), Some(0L), Some(1L)))
    assert(uat.read("orders").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // the displaced version is still readable under retention
    assert(uat.readVersion("orders", uatBefore).as[(Long, Double)]
      .collect().toSet == Set((1L, 10.0), (9L, 99.0)))
    // PK registration carried so the next promotion can diff
    assert(uat.primaryKey("orders") == Seq("id"))
  }

  test("the target environment's own CHECK constraints still gate the commit") {
    val (dev, _, prod) = envs()
    dev.overwrite("orders", Seq((1L, 10.0), (2L, 5000.0)).toDF("id", "amount"))
    prod.overwrite("orders", Seq((1L, 10.0)).toDF("id", "amount"))
    prod.registerConstraints("orders", Map("amount_cap" -> "amount <= 1000"))
    val prodBefore = prod.currentVersion("orders")
    // stage gates pass, but PROD's own invariant rejects inside commit
    intercept[IllegalArgumentException] {
      Promotion.promote(dev, prod, "orders",
        Map("amount_nonneg" -> "amount >= 0"))
    }
    assert(prod.currentVersion("orders") == prodBefore)
    assert(prod.read("orders").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0)))
  }

  test("chained DEV->UAT->PROD promotion with stage-specific gates") {
    val (dev, uat, prod) = envs()
    dev.overwrite("orders", Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    dev.registerPrimaryKey("orders", Seq("id"))
    val r1 = Promotion.promote(dev, uat, "orders",
      Map("amount_nonneg" -> "amount >= 0"))
    // target table didn't exist: no change feed to report
    assert((r1.inserts, r1.updates, r1.deletes) == (None, None, None))
    val r2 = Promotion.promote(uat, prod, "orders",
      Map("amount_nonneg" -> "amount >= 0",
        "id_positive" -> "id > 0"))
    assert(prod.read("orders").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0)))
    assert(r2.gates.forall(_.violations == 0L))
  }
}
