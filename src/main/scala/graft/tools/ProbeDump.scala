package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import java.nio.file.{Files, Paths}

/** Dev probe: dump ONE (or a few) SparkEntry queries to parquet plus the
  * full oracle_sql.json, shaped exactly like graft.Verify's output, so
  * dev/check_oracle.py can gate a single entry without a full Verify run.
  *
  * Usage: runMain graft.tools.ProbeDump <outDir> <queryName> [more names...]
  */
object ProbeDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error("usage: ProbeDump <outDir> <name...>"))
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "need at least one query name")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("probe-dump").master("local[8]")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[dump] $name done")
    }
    val json = SparkEntry.oracleSql.map { case (k, v) =>
      qq(k) + ": " + qq(v)
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  private def qq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
