package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B the r14 optimizations at scale, in one JVM.
  *
  *   nb   — composed trainNaiveBayes + scoreNaiveBayesAuto (the r13 entry)
  *          vs fused trainAndScoreNaiveBayes (one training corpus pass)
  *   km2l — kmeansTwoLevel inner assignment: joined struct-min (budget 0)
  *          vs fused broadcast argmin (default budget); entry shape
  *          (kSuper=2, kInner=4) plus a larger split (8 x 8) where the
  *          per-round join cost actually shows
  *   lm   — scoreBigramLmFused: single-partition pair cache (default at
  *          this scale) vs wide cache (coalesceMaxRows=0) — the r14
  *          scale-safety change must NOT cost time at bench scale
  *
  * Each variant runs twice (JIT warm), noop sink, both timings print.
  */
object ProbeR14 {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val which = args.lift(1).getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.engineFor(spark, dir)
    val docs = spark.table("documents")
    val emb = spark.table("embeddings")

    def time(label: String)(fn: () => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        println(f"[r14] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    if (which == "all" || which == "nb") {
      time("nb A_composed")(() => graft.ops.Classifier.scoreNaiveBayesAuto(
        docs,
        graft.ops.Classifier.trainNaiveBayes(docs, col("lang") === "en", minCount = 2),
        col("lang") === "en"))
      time("nb B_fused")(() => graft.ops.Classifier.trainAndScoreNaiveBayes(
        docs, col("lang") === "en", minCount = 2))
    }

    if (which == "all" || which == "km2l") {
      def km(kS: Int, kI: Int, budget: String, label: String): Unit = {
        spark.conf.set("graft.kmeans.innerBroadcastMaxRows", budget)
        try time(label)(() =>
          graft.ops.Clustering.kmeansTwoLevel(emb, kSuper = kS, kInner = kI, iters = 1))
        finally spark.conf.unset("graft.kmeans.innerBroadcastMaxRows")
      }
      km(2, 4, "0", "km2l(2x4) A_joined")
      km(2, 4, "1000000", "km2l(2x4) B_fused")
      km(8, 8, "0", "km2l(8x8) A_joined")
      km(8, 8, "1000000", "km2l(8x8) B_fused")
    }

    if (which == "all" || which == "chunks") {
      time("chunks A_joined")(() => graft.ops.Dedup.chunkDedupJoined(docs, chunkWords = 10))
      time("chunks B_carry")(() => graft.ops.Dedup.chunkDedup(docs, chunkWords = 10))
      time("chunks A_joined")(() => graft.ops.Dedup.chunkDedupJoined(docs, chunkWords = 10))
      time("chunks B_carry")(() => graft.ops.Dedup.chunkDedup(docs, chunkWords = 10))
    }

    if (which == "all" || which == "lm") {
      def lm(budget: String, label: String): Unit = {
        spark.conf.set("graft.lm.coalesceMaxRows", budget)
        try time(label)(() => graft.ops.LangModel.scoreBigramLmFused(docs))
        finally spark.conf.unset("graft.lm.coalesceMaxRows")
      }
      lm("8000000", "lm A_coalesced")
      lm("0", "lm B_wide")
    }

    spark.stop()
  }
}
