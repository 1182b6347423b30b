package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog
import graft.model.{ApprovalEvent, FileEvent}
import graft.notify.InMemoryNotifier
import graft.pipeline.Pipeline

/** Minimal end-to-end drive of the E1→E3→E4 lifecycle (SURVEY §3) from
  * the public API: land CSVs, register arrivals, approve, stage + run
  * deletes, print resulting state. `sbt "runMain graft.PipelineDemo"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val landing = Files.createTempDirectory("landing").toString
    val wh = Files.createTempDirectory("warehouse").toString
    val notifier = new InMemoryNotifier
    val p = new Pipeline(spark, new Catalog(spark, wh), notifier, landing)

    def land(path: String, csv: String): Unit = {
      val f = Paths.get(landing, "b1", path)
      Files.createDirectories(f.getParent)
      Files.writeString(f, csv)
    }
    def approve(id: String, op: String, file: String, table: String): Unit =
      p.processApproval(ApprovalEvent(id, "approve", s"$op/$file", table, op,
        "b1", Some(1L), None, None, None))

    land("insert/customers.csv", "customer_id,name,balance\n1,alice,10.5\n2,bob,20\n3,carol,7\n")
    println(s"registered v${p.registerArrival(FileEvent("b1", "insert/customers.csv", "e1")).get}")
    approve("e1", "insert", "customers.csv", "customers")
    p.catalog.registerPrimaryKey("customers", Seq("customer_id"))

    land("update/customers.csv", "customer_id,name,balance\n2,BOB,99\n4,dave,1\n")
    p.registerArrival(FileEvent("b1", "update/customers.csv", "e2"))
    approve("e2", "update", "customers.csv", "customers")

    land("delete/customers.csv", "customer_id\n1\n")
    p.registerArrival(FileEvent("b1", "delete/customers.csv", "e3"))
    approve("e3", "delete", "customers.csv", "customers")
    println(s"executed deletes: ${p.executePendingDeletes()}")

    println("-- customers --")
    p.catalog.read("customers").orderBy("customer_id").show(false)
    println("-- processed_files --")
    p.catalog.read(p.ControlTable).orderBy("event_id")
      .select("event_id", "file_name", "operation", "file_version", "status", "is_processed").show(false)
    println("-- delete_control --")
    p.catalog.read(p.DeleteControlTable).orderBy("QueryId")
      .select("QueryId", "DeleteQuery", "ExecutedFlag").show(false)
    println(s"-- notifications sent: ${notifier.sent.length}")
    notifier.sent.foreach(n => println(s"   ${n.subject}"))

    // DEV -> UAT -> PROD promotion with per-stage validation (the
    // reference diagram's "Performs validations/checks (DEV/UAT/PROD)"
    // box): each environment is its own catalog root; a snapshot moves
    // only after its stage gates pass, and PROD additionally enforces
    // its own registered CHECK constraints at commit time.
    val uat = new Catalog(spark, Files.createTempDirectory("uat").toString)
    val prod = new Catalog(spark, Files.createTempDirectory("prod").toString)
    val r1 = graft.catalog.Promotion.promote(p.catalog, uat, "customers",
      Map("balance_nonneg" -> "CAST(balance AS DOUBLE) >= 0",
        "name_present" -> "length(name) > 0"))
    println(s"-- promoted customers DEV->UAT @ ${r1.promotedVersion} " +
      s"(gates: ${r1.gates.map(g => s"${g.gate}=${g.violations}").mkString(", ")})")
    prod.registerConstraints("customers",
      Map("pk_present" -> "customer_id IS NOT NULL"))
    val r2 = graft.catalog.Promotion.promote(uat, prod, "customers",
      Map("balance_nonneg" -> "CAST(balance AS DOUBLE) >= 0"))
    println(s"-- promoted customers UAT->PROD @ ${r2.promotedVersion}")
    prod.read("customers").orderBy("customer_id").show(false)
    spark.stop()
  }
}
