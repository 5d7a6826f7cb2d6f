package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeCurate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    graft.SparkEntry.engineFor(spark, dir)
    // t_curate excluded here: at 100x its hardcoded mixture spec hits the
    // op's own loud no-rows-for-source requirement after dedup (an entry
    // parameter artifact, not an engine defect). g_pagerank excluded: its
    // oracle entry consumes the exact ngram pair list (same envelope as
    // d_clusters); the operator itself is edge-source agnostic.
    for (name <- Seq("t_bpe", "t_subword", "t_nb_score", "t_lm_score",
        "t_mixture", "t_weighted", "t_winnow_poly", "e_asof", "e_range",
        "e_sessions", "q_hll", "t_cms", "q_histq")) {
      graft.SparkEntry.queries.get(name).foreach { fn =>
        try {
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          println(f"SWEEP2 $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch {
          case e: Throwable =>
            println(s"SWEEP2 $name FAILED: ${String.valueOf(e.getMessage).take(140).replace('\n',' ')}")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
