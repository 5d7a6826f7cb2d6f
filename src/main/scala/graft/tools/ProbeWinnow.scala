package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Timing probe for the winnowing fingerprint path at sf0.01. */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val stats = docs.select(count(lit(1)), max(length(col("text"))), avg(length(col("text")))).head()
    println(s"docs=${stats.getLong(0)} maxLen=${stats.getInt(1)} avgLen=${stats.getDouble(2)}")
    val n = args.headOption.map(_.toInt).getOrElse(50)
    val t0 = System.nanoTime()
    val r = docs.limit(n).select(col("doc_id"),
      size(TextAnalysis.winnowFingerprints(col("text"))).as("nf"))
      .agg(sum("nf")).head().getLong(0)
    println(f"winnow first $n docs: ${(System.nanoTime() - t0) / 1e9}%.2f s, sum=$r")
    spark.stop()
  }
}
