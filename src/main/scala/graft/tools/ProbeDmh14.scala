package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14): stage attribution for the d_minhash pipeline at scale —
  * where does candidate-verify time actually go? Times cumulative prefixes
  * of the exact minhashNearDuplicates structure (same code, inlined):
  *   1. shingle fingerprints (scan + fused expression + persist)
  *   2. banded bucket keys + cap join (persist)
  *   3. candidate pairs (self-join + dedup)
  *   4. full pipeline (attach two shingle joins + sorted-merge jaccard)
  * Deltas between steps attribute the wall clock.
  */
object ProbeDmh14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (bands, rows, maxBucket, threshold) = (8, 4, 1000, 0.7)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dmh14] $label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }

    val shingled = docs.select(col("doc_id"), col("text").as("__text"))
      .withColumn("__sh", graft.functions.ShingleFpExpr.shingleFp(col("__text"), 3))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"), col("__sh"))
      .persist()
    time("1 shingled.count")(shingled.count())

    val slim = shingled
      .select(col("doc_id"),
        posexplode(graft.functions.MinHashBandsExpr.minhashBands(col("__sh"), bands, rows))
          .as(Seq("band", "bucket")))
    val bucketSizes = slim.groupBy("band", "bucket").agg(count(lit(1)).as("__bsz"))
    val bucketed = slim.join(bucketSizes.filter(col("__bsz") <= maxBucket).hint("shuffle_hash"),
      Seq("band", "bucket"))
      .persist()
    time("2 bucketed.count")(bucketed.count())

    val a = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_id_a"))
    val b = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b")
      .dropDuplicates("doc_id_a", "doc_id_b")
      .persist()
    // split the candidate stage: raw pair instances (join only, no dedup
    // exchange) vs the deduplicated pair set
    val rawInstances = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b")
    time("3a raw instances.count")(rawInstances.count())
    time("3b candidates.count")(candidates.count())

    val pairs = candidates
      .join(shingled.select(col("doc_id").as("doc_id_a"), col("__sh").as("__sh_a"))
        .hint("shuffle_hash"), "doc_id_a")
      .join(shingled.select(col("doc_id").as("doc_id_b"), col("__sh").as("__sh_b"))
        .hint("shuffle_hash"), "doc_id_b")
    time("4a attach-only (count)")(pairs.count())

    val verified = pairs.withColumn("jaccard",
        round(graft.functions.SortedJaccardExpr.sortedJaccard(col("__sh_a"), col("__sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
    time("4b verify (count)")(verified.count())
    // repeat warm
    time("4b verify warm")(verified.count())

    // end-to-end entry, fresh (no reused caches beyond the probe's)
    time("5 full entry")(graft.ops.Dedup.minhashNearDuplicates(
      docs, threshold = threshold, bands = bands, rows = rows).count())
    spark.stop()
  }
}
