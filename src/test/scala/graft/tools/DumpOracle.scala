package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump SparkEntry.oracleSql as oracle_sql.json into an
  * existing Verify output dir, so an oracle-SQL-only edit can be
  * re-checked with tools/compare.py without re-running all queries.
  * Usage: sbt "Test/runMain graft.tools.DumpOracle /tmp/verify_out"
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
