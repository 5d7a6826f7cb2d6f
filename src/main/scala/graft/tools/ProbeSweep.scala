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
    val names = Seq(
      "d_simhash", "d_chunks",
      "d_incremental", "d_embed_exact", "d_semdedup",
      "t_pack", "t_curate", "t_curate_incr", "t_bm25", "t_tfidf",
      "c_kmeans", "g_pagerank", "t_bpe", "t_subword", "t_nb_score",
      "t_lm_score", "t_mixture", "t_weighted", "t_winnow_poly",
      "e_asof", "e_range", "e_sessions", "q_hll", "t_cms", "q_histq")
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
    spark.stop()
  }
}
