package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // if events.parquet ships as TIMESTAMP(NANOS), read it as a
      // nanosecond LongType; other encodings (MICROS -> NTZ) resolve
      // adaptively through Tables.tsMicros/tsUtc.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // see Bench: split byte-small files finely so CPU-bound per-row
      // work parallelizes; no-op for scale-sized files
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture preflight: resolve every table's schema up front so a
    // regenerated fixture fails HERE with the actual types named, not
    // as N opaque per-query analysis errors (round-7 incident: events.ts
    // silently switched TIMESTAMP(NANOS) -> TIMESTAMP_MICROS and took
    // 10 queries off the board). tsMicros throws with the offending
    // type in the message if the encoding is unsupported.
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n)
      System.err.println(s"[verify] schema $n: ${df.schema.simpleString}")
    }
    Tables.tsMicros(Tables.load(spark, sfDir, "events"))
    // SPARK_GRAFT_ONLY=e22_cms_freq,e23_markov narrows the dump for
    // local iteration (same contract as Bench); the driver sets nothing
    // and dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries that persist() intermediates (near-dup pipelines) are
      // done with them once written — don't let cached partitions
      // accumulate across the 49-query session
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
