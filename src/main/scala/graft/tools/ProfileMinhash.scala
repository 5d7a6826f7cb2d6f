package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Ad-hoc stage timing for the minhash pipeline (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("count")(docs.count())
    val sh = time("shingles") {
      val s = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("__sh"))
      s.select(sum(size(col("__sh")))).head()
    }
    println("total shingles: " + sh)
    time("signature") {
      val s = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("__sh"))
        .select(col("doc_id"), explode(col("__sh")).as("__s"))
      val minCols = (0 until 32).map(seed => min(xxhash64(col("__s"), lit(seed))).as(s"m$seed"))
      s.groupBy("doc_id").agg(minCols.head, minCols.tail: _*).count()
    }
    time("full pipeline") {
      println("pairs: " + Dedup.minhashNearDuplicates(docs, threshold = 0.7, bands = 8, rows = 4).count())
    }
    time("full pipeline again") {
      println("pairs: " + Dedup.minhashNearDuplicates(docs, threshold = 0.7, bands = 8, rows = 4).count())
    }
    spark.stop()
  }
}
