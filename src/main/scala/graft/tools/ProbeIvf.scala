package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Drive IVF ANN vs the brute-force ground truth on real embeddings. */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, q, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, k = 5, nCells = 8, nProbe = 3)
    val got = ivf.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    println(f"IVF rows=${got.size}, recall@5 vs brute force = $recall%.2f (nProbe=3/8 cells)")
    // probe: nProbe = nCells must reach full recall within probed cells
    val full = Similarity.ivfTopK(e, q, k = 5, nCells = 8, nProbe = 8)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"IVF full-probe recall = ${(exact & full).size.toDouble / exact.size}%.2f")
    spark.stop()
  }
}
