package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the d_semdedup 100x cell at oracle-pinned k=8 vs the auto-k
  * default (k = ceil(n / targetClusterSize)) — the quadratic in-cluster
  * pairwise step is what auto-k exists to bound.
  */
object ProbeSemK {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val n = e.count()
    println(s"SEMK n=$n autoK=${math.max(8L, (n + 4095) / 4096)}")
    for ((label, run) <- Seq(
      "auto" -> (() => graft.ops.Dedup.semanticDedup(e, minCosine = 0.3)),
      "pinned8" -> (() => graft.ops.Dedup.semanticDedup(e, k = 8, minCosine = 0.3)))) {
      val t0 = System.nanoTime()
      val out = run()
      val dropped = out.filter(!col("kept")).count()
      val total = out.count()
      println(f"SEMK $label: ${(System.nanoTime() - t0) / 1e9}%.2f s  dropped=$dropped/$total")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
