package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14): selectivity of a size-ratio prefilter on the minhash
  * candidate pairs. Jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|), so a pair
  * whose shingle-set sizes differ by more than the threshold ratio can
  * never verify — counting how many candidates that drops (before the
  * expensive array-attach joins) decides whether the filter is worth
  * wiring into the pipeline.
  */
object ProbeSizeSel {
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
      println(f"[sizesel] $label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }

    val shingled = docs.select(col("doc_id"), col("text").as("__text"))
      .withColumn("__sh", graft.functions.ShingleFpExpr.shingleFp(col("__text"), 3))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"), col("__sh"), size(col("__sh")).as("__n"))
      .persist()
    time("shingled.count")(shingled.count())

    val slim = shingled
      .select(col("doc_id"),
        posexplode(graft.functions.MinHashBandsExpr.minhashBands(col("__sh"), bands, rows))
          .as(Seq("band", "bucket")))
    val bucketSizes = slim.groupBy("band", "bucket").agg(count(lit(1)).as("__bsz"))
    val bucketed = slim.join(bucketSizes.filter(col("__bsz") <= maxBucket).hint("shuffle_hash"),
      Seq("band", "bucket"))
    val a = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_id_a"))
    val b = bucketed.select(col("band"), col("bucket"), col("doc_id").as("doc_id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b")
      .dropDuplicates("doc_id_a", "doc_id_b")
      .persist()
    val total = time("candidates.count")(candidates.count())

    val sizes = shingled.select(col("doc_id"), col("__n"))
    val withSizes = candidates
      .join(sizes.select(col("doc_id").as("doc_id_a"), col("__n").as("__na"))
        .hint("shuffle_hash"), "doc_id_a")
      .join(sizes.select(col("doc_id").as("doc_id_b"), col("__n").as("__nb"))
        .hint("shuffle_hash"), "doc_id_b")
      .persist()
    val pass = time("size-ratio pass.count")(withSizes
      .filter(least(col("__na"), col("__nb")).cast("double") >=
        lit(threshold - 1e-6) * greatest(col("__na"), col("__nb")).cast("double"))
      .count())
    println(f"[sizesel] total=$total pass=$pass dropped=${total - pass} " +
      f"(${100.0 * (total - pass) / total}%.1f%% dropped)")
    spark.stop()
  }
}
