package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Graph family at 1000×-scale edge counts (r11 verdict task 6).
  *
  * The UPSTREAM pair generation at 1000× is out of the single-node envelope
  * by data construction (PERF.md §0i: compounding makes every sf0.1 doc a
  * 1000-member duplicate family → the true pair set alone is ~2.5B rows),
  * so the graph operators are probed on a 10×-compounded copy of the 100×
  * LSH edge list: the 24.7M-edge graph replicated 10 times with disjoint id
  * offsets (~247M edges, same degree distribution per component family —
  * the structure label propagation and rank mass actually iterate over).
  *
  * Usage: runMain graft.tools.ProbeGraph1000x [sf10Dir] [copies]
  */
object ProbeGraph1000x {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = java.nio.file.Files.createTempDirectory("graft-edges").toString

    // 1. 100× LSH pair list (untimed here; its own cell is paired separately)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.ops.Dedup.minhashNearDuplicates(docs, threshold = 0.7, bands = 8, rows = 4)
    // 2. compound ×copies with disjoint id offsets; materialize to parquet so
    //    the graph timings measure the OPERATORS, not the LSH chain
    val off = 1000000000L
    pairs.select(col("doc_id_a"), col("doc_id_b"))
      .crossJoin(spark.range(copies).select(col("id").as("__c")))
      .select((col("doc_id_a") + col("__c") * off).as("doc_id_a"),
              (col("doc_id_b") + col("__c") * off).as("doc_id_b"))
      .write.mode("overwrite").parquet(s"$scratch/edges")
    val edges = spark.read.parquet(s"$scratch/edges")
    val n = edges.count()
    println(f"[graph-1000x] edges: $n%,d ($copies copies)")

    locally {
      val t0 = System.nanoTime()
      graft.ops.GraphRank.pageRankUndirected(edges, iters = 2)
        .write.format("noop").mode("overwrite").save()
      println(f"[graph-1000x] g_pagerank_lsh: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.catalog.clearCache()
    locally {
      val t0 = System.nanoTime()
      graft.ops.Dedup.connectedComponents(edges)
        .write.format("noop").mode("overwrite").save()
      println(f"[graph-1000x] cc_minhash: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(rounds=${graft.ops.Dedup.lastCcRounds})")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
    spark.stop()
  }
}
