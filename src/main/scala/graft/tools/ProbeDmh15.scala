package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14, session 2): stage attribution for the CURRENT
  * (first-match) minhashNearDuplicates pipeline at scale — which stage owns
  * the 1000×-corpus wall clock? Times cumulative prefixes of the exact
  * minhashNearDuplicates structure (same code, inlined):
  *   1. shingle fingerprints (scan + fused expression + persist)
  *   2. banded bucket keys (slim persist)
  *   3. kept-bucket vectors (docKept + sides persist)
  *   4. first-match candidate pairs
  *   5. attach two shingle joins (no jaccard)
  *   6. verify (sorted-merge jaccard + threshold)
  *   7. full entry (fresh, its own caches)
  * Deltas between steps attribute the wall clock.
  */
object ProbeDmh15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_dedup1000")
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
      println(f"[dmh15] $label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
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
      .persist()
    time("2 slim.count")(slim.count())

    val bucketSizes = slim.groupBy("band", "bucket").agg(count(lit(1)).as("__bsz"))
    val keptRows = slim.join(bucketSizes.filter(col("__bsz") <= maxBucket).hint("shuffle_hash"),
      Seq("band", "bucket"))
    val docKept = keptRows.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("band"), col("bucket")))).as("__m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(bands - 1)),
          j => try_element_at(col("__m"), j)).as("__kb"))
    val sides = docKept
      .select(col("doc_id"), col("__kb"),
        posexplode(col("__kb")).as(Seq("band", "bucket")))
      .filter(col("bucket").isNotNull)
      .persist()
    time("3 sides.count")(sides.count())

    val a = sides.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_a"), col("__kb").as("__kb_a"))
    val b = sides.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_b"), col("__kb").as("__kb_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .filter(col("band") ===
        graft.functions.FirstMatchBandExpr.firstMatchBand(col("__kb_a"), col("__kb_b")))
      .select("doc_id_a", "doc_id_b")
      .persist()
    time("4 candidates.count")(candidates.count())

    val pairs = candidates
      .join(shingled.select(col("doc_id").as("doc_id_a"), col("__sh").as("__sh_a"))
        .hint("shuffle_hash"), "doc_id_a")
      .join(shingled.select(col("doc_id").as("doc_id_b"), col("__sh").as("__sh_b"))
        .hint("shuffle_hash"), "doc_id_b")
    time("5 attach-only (count)")(pairs.count())

    val verified = pairs.withColumn("jaccard",
        round(graft.functions.SortedJaccardExpr.sortedJaccard(col("__sh_a"), col("__sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
    time("6 verify (count)")(verified.count())

    candidates.unpersist(); sides.unpersist(); slim.unpersist(); shingled.unpersist()
    time("7 full entry")(graft.ops.Dedup.minhashNearDuplicates(
      docs, threshold = threshold, bands = bands, rows = rows).count())
    spark.stop()
  }
}
