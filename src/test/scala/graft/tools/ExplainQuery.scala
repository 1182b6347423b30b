package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan-inspection helper: prints the formatted physical plan of one or
  * more declared queries without materializing them. With `--exec`,
  * additionally executes each query and prints the FINAL AQE plan
  * (where runtime stage reuse / ReusedExchange shows up). Usage:
  *   sbt "Test/runMain graft.tools.ExplainQuery [--exec] <sfDir> <name> [name ...]"
  */
object ExplainQuery {
  def main(rawArgs: Array[String]): Unit = {
    val exec = rawArgs.headOption.contains("--exec")
    val args = if (exec) rawArgs.tail else rawArgs
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      if (exec) {
        df.collect()
        println(s"---- $name: final AQE plan ----")
        println(df.queryExecution.executedPlan.toString)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
