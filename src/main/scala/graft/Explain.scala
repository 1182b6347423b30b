package graft
import org.apache.spark.sql.SparkSession
/** Dump formatted physical plans of the named (or all) declared queries
  * — the iterate-on-the-plan loop from the build brief. With a leading
  * `--exec`, each query is also executed and its FINAL AQE plan printed
  * — the only place runtime stage reuse (ReusedExchange across AQE
  * query stages) is visible; the static plan can show three scans
  * where execution runs one.
  */
object Explain {
  def main(rawArgs: Array[String]): Unit = {
    val exec = rawArgs.headOption.contains("--exec")
    val args = if (exec) rawArgs.tail else rawArgs
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      df.explain("formatted")
      if (exec) {
        // foreach(no-op), not collect(): executes THIS df's
        // queryExecution (a noop write would build its own) without
        // materializing probe-scale results on the driver, so the
        // final AQE plan below is still the executed one
        // drive THIS df's executedPlan directly (AdaptiveSparkPlanExec
        // finalizes in place): Dataset.foreach routes through .rdd,
        // which plans a SEPARATE execution and leaves this one's AQE
        // plan un-finalized — the printed plan would be the initial one
        df.queryExecution.executedPlan.execute().foreach(_ => ())
        println(s"----- $n: final AQE plan -----")
        println(df.queryExecution.executedPlan.toString)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
