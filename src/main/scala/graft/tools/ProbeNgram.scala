package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Time + sanity-check the exact n-gram Jaccard operator at sf0.1. */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val d = Dedup.ngramJaccardPairs(docs, threshold = 0.7)
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = d.count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    }
    spark.stop()
  }
}
