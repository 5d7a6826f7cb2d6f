package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Targeted Verify twin: dump ONLY the named SparkEntry.queries entries
  * (plus oracle_sql.json) so dev/check_oracle.py can gate a new entry
  * without replaying all ~140.
  *
  * Usage: runMain graft.tools.ProbeSetopEntry <sfDir> <outDir> <name>...
  */
object ProbeSetopEntry {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-wh").toString)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[probe-entry] dumped $name")
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      graft.Verify.oracleJsonForTools)
    spark.stop()
  }
}
