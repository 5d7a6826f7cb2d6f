package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: PageRank over the 100x LSH near-dup pair list in a fresh
  * JVM — the scale path of the g_pagerank entry (whose oracle consumes
  * the exact n-gram pair list, out-of-envelope at 100x).
  */
object ProbePrLsh {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.minhashNearDuplicates(docs, threshold = 0.7, bands = 8, rows = 4)
    if (args.contains("cc")) {
      graft.ops.Dedup.connectedComponents(pairs)
        .write.format("noop").mode("overwrite").save()
      println(f"CCLSH: ${(System.nanoTime() - t0) / 1e9}%.2f s (rounds=${graft.ops.Dedup.lastCcRounds})")
    } else {
      graft.ops.GraphRank.pageRankUndirected(pairs, iters = 2)
        .write.format("noop").mode("overwrite").save()
      println(f"PRLSH: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
