package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r14 session 2): stage attribution for the capped-set
  * minhashNearDuplicates shape at scale (same code, inlined), to localize
  * memory/time behavior stage by stage:
  *   1. shingle fingerprints (persist)
  *   2. slim with carried band vector (persist)
  *   3. capped-bucket collect
  *   4. first-match candidate pairs (capped-set filter + self-join)
  *   5. verify (attach + sorted-merge jaccard)
  * Optional arg 2: advisory partition size for AQE coalescing (e.g. "16m"),
  * to test the giant-coalesced-sort-partition hypothesis.
  */
object ProbeDmh16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_dedup1000")
    val advisory = args.lift(1).getOrElse("64m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (bands, rows, maxBucket, threshold) = (8, 4, 1000, 0.7)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dmh16] $label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
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
        graft.functions.MinHashBandsExpr.minhashBands(col("__sh"), bands, rows).as("__kb"))
      .select(col("doc_id"), col("__kb"),
        posexplode(col("__kb")).as(Seq("band", "bucket")))
      .persist()
    time("2 slim.count")(slim.count())

    val bucketSizes = slim.groupBy("band", "bucket").agg(count(lit(1)).as("__bsz"))
    val cappedRows = time("3 capped collect")(
      bucketSizes.filter(col("__bsz") > maxBucket)
        .select(col("band"), col("bucket")).limit(4000001).collect())
    println(s"[dmh16] capped buckets: ${cappedRows.length}")
    val capped = spark.sparkContext.broadcast(
      graft.functions.CappedKeys.fromRows(cappedRows, bands))

    val sides = slim.filter(!graft.functions.FirstUncappedMatchExpr
      .cappedContains(col("band"), col("bucket"), capped))
    val a = sides.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_a"), col("__kb").as("__kb_a"))
    val b = sides.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_b"), col("__kb").as("__kb_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .filter(col("band") === graft.functions.FirstUncappedMatchExpr
        .firstUncappedMatch(col("__kb_a"), col("__kb_b"), capped))
      .select("doc_id_a", "doc_id_b")
      .persist()
    time("4 candidates.count")(candidates.count())

    val pairs = candidates
      .join(shingled.select(col("doc_id").as("doc_id_a"), col("__sh").as("__sh_a"))
        .hint("shuffle_hash"), "doc_id_a")
      .join(shingled.select(col("doc_id").as("doc_id_b"), col("__sh").as("__sh_b"))
        .hint("shuffle_hash"), "doc_id_b")
    val verified = pairs.withColumn("jaccard",
        round(graft.functions.SortedJaccardExpr.sortedJaccard(col("__sh_a"), col("__sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
    time("5 verify (count)")(verified.count())
    spark.stop()
  }
}
