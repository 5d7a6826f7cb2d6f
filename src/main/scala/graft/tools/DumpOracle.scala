package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dev tool: write SparkEntry.oracleSql as oracle_sql.json without running
  * any queries (dev/bench_duck.py input for crossover measurements).
  *
  * Usage: runMain graft.tools.DumpOracle <outDir>
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-oracle")
    new java.io.File(outDir).mkdirs()
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
    println(s"wrote $outDir/oracle_sql.json (${SparkEntry.oracleSql.size} entries)")
  }
}
