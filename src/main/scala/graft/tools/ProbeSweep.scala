package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    graft.SparkEntry.engineFor(spark, dir)
    // d_ngram EXCLUDED: the exact inverted-index path does Σ df² work
    // per shared token — on the 99%-dup 100x corpus (df ≈ dup-group size
    // ≈ 100 per shingle, under the 1000 doc-freq cap) that is ~5B pair
    // instances and OOMs an 8 GB single JVM. That envelope is the design
    // reason d_minhash exists; see Dedup.ngramJaccardPairs scaladoc.
    // d_clusters/d_cluster_dedup excluded: their oracle entries consume the
    // exact ngram pair list (same envelope); the scale path is cc_minhash.
    // d_embed_exact EXCLUDED (r8): the planes=0 all-pairs exact twin is
    // out-of-envelope by design at 100x (40B pairs) — in the r8 sweep its
    // task death took the whole SparkContext with it and voided every
    // later cell. The production path is d_embed_neardup (LSH-bucketed).
    // d_semdedup's ENTRY pins k=8 for the oracle; its scale path is the
    // auto-k default, timed at the END as d_semdedup_auto (the pinned-k
    // cell is the known-quadratic shape: ProbeSemK 512 s vs 44 s at 100x).
    // g_pagerank's ENTRY consumes the exact d_ngram pair list — the same
    // out-of-envelope family (its task death killed the whole local
    // SparkContext in both r8 sweep attempts). Its scale path is PageRank
    // over the LSH pair list, timed at the END as g_pagerank_lsh.
    val names = Seq(
      "d_simhash", "d_chunks", "d_incremental",
      "t_pack", "t_curate", "t_curate_incr", "t_bm25", "t_tfidf",
      "c_kmeans", "t_bpe", "t_subword", "t_nb_score",
      "t_lm_score", "t_mixture", "t_weighted", "t_winnow_poly",
      "e_asof", "e_range", "e_sessions", "q_hll", "q_hll_est", "t_cms",
      "q_histq", "t_dashboard")
    for (name <- names) {
      graft.SparkEntry.queries.get(name).foreach { fn =>
        try {
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"SWEEP $name: $sec%.2f s")
        } catch {
          case e: Throwable =>
            println(s"SWEEP $name FAILED: ${String.valueOf(e.getMessage).take(120).replace('\n',' ')}")
        }
        spark.catalog.clearCache()
      }
    }
    // The two heavy graph/cluster cells run LAST: their persisted edge
    // lists, localCheckpoint label blocks, and minutes of all-core load
    // contaminate any cell that follows them in the same JVM (r8 measured:
    // d_chunks 7.9 s fresh vs 18.8 s after them; t_bm25 4.7 vs 16.0).
    // scale path for cluster formation: label propagation over the LSH
    // pair list (24.7M edges on this corpus)
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.minhashNearDuplicates(docs, threshold = 0.7, bands = 8, rows = 4)
      graft.ops.Dedup.connectedComponents(pairs)
        .write.format("noop").mode("overwrite").save()
      println(f"SWEEP cc_minhash: ${(System.nanoTime() - t0) / 1e9}%.2f s (rounds=${graft.ops.Dedup.lastCcRounds})")
    } catch { case e: Throwable =>
      println(s"SWEEP cc_minhash FAILED: ${String.valueOf(e.getMessage).take(140).replace('\n',' ')}")
    }
    spark.catalog.clearCache()
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.minhashNearDuplicates(docs, threshold = 0.7, bands = 8, rows = 4)
      graft.ops.GraphRank.pageRankUndirected(pairs, iters = 2)
        .write.format("noop").mode("overwrite").save()
      println(f"SWEEP g_pagerank_lsh: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    } catch { case e: Throwable =>
      println(s"SWEEP g_pagerank_lsh FAILED: ${String.valueOf(e.getMessage).take(140).replace('\n',' ')}")
    }
    spark.catalog.clearCache()
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("embedding", org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      val t0 = System.nanoTime()
      graft.ops.Dedup.semanticDedup(e, minCosine = 0.3)
        .write.format("noop").mode("overwrite").save()
      println(f"SWEEP d_semdedup_auto: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    } catch { case e: Throwable =>
      println(s"SWEEP d_semdedup_auto FAILED: ${String.valueOf(e.getMessage).take(140).replace('\n',' ')}")
    }
    spark.stop()
  }
}
