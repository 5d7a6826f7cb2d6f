package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-9 probe (verdict task 5): flat vs two-level SemDeDup at large k
  * on the 100x embeddings corpus. The documented ceiling is the k-row
  * centroid broadcast per Lloyd round in flat k-means; kmeansTwoLevel
  * replaces it with a cell-id-joined centroid table. Measured with k
  * forced >= 512 per the verdict (auto-k at this corpus is ~123, so the
  * forced k isolates the large-k regime).
  *
  * Usage: runMain graft.tools.ProbeSem2L [sfDir] [k]
  */
object ProbeSem2L {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val k = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder()
      .appName("probe-sem2l").master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"[sem2l] corpus = ${emb.count()} vectors, k = $k")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val kept = f
      println(f"[sem2l] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s, kept = $kept")
    }
    // two-level first (fresh JVM bias favors the incumbent if flat goes first)
    time(s"two-level soft (kSuper=${math.ceil(math.sqrt(k)).toInt})") {
      graft.ops.Dedup.semanticDedup(emb, k = k, iters = 1, twoLevelFromK = k)
        .filter("kept").count()
    }
    time("two-level hard (r9 shape)") {
      graft.ops.Dedup.semanticDedup(emb, k = k, iters = 1, twoLevelFromK = k,
          twoLevelSoft = false)
        .filter("kept").count()
    }
    time("flat") {
      graft.ops.Dedup.semanticDedup(emb, k = k, iters = 1, twoLevelFromK = Int.MaxValue)
        .filter("kept").count()
    }
    spark.stop()
  }
}
