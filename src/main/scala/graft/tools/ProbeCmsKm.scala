package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Clustering, Sketches}

/** Same-JVM interleaved A/B for the r13 t_cms carry-probe and c_kmeans
  * fused-argmin changes: old formulation vs new, alternating, min-of-2
  * per variant, noop sink. Usage: runMain graft.tools.ProbeCmsKm [sfDir]
  */
object ProbeCmsKm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
    spark.conf.set("spark.sql.files.openCostInBytes", (2L * 1024 * 1024).toString)

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def toks = docs.select(explode(split(
        lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")).as("tok"))
      .filter(length(col("tok")) >= 1)

    def cmsOld(): DataFrame = {
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      val sketch = Sketches.cmsSketchWeighted(exact, "tok", "exact", 3, 512)
      exact.join(Sketches.cmsEstimate(sketch, exact.select("tok"), "tok", 3, 512),
        Seq("tok")).orderBy("tok")
    }
    def cmsNew(): DataFrame = {
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      val sketch = Sketches.cmsSketchWeighted(exact, "tok", "exact", 3, 512)
      Sketches.cmsEstimateCarry(sketch, exact, "tok", Seq("exact"), 3, 512)
        .select("tok", "exact", "est").orderBy("tok")
    }
    def q = emb.select(col("vec_id").cast("long").as("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("q"))
    def cents = q.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cidx"),
        transform(col("q"), x => x.cast("double")).as("cvec"))
    def kmOldAssign(): DataFrame = Clustering.assignJoined(q, cents)
      .select(col("vec_id"), col("cluster")).orderBy("vec_id")
    def kmNewAssign(): DataFrame = Clustering.assign(q, cents)
      .select(col("vec_id"), col("cluster")).orderBy("vec_id")

    def time(name: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-14s $s%7.2f s")
      s
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "cms_old" -> (() => cmsOld()), "cms_new" -> (() => cmsNew()),
      "km_old" -> (() => kmOldAssign()), "km_new" -> (() => kmNewAssign()))
    // warmup round then two measured rounds, interleaved
    for (round <- 0 to 2; (n, mk) <- variants) {
      val tag = if (round == 0) s"$n (warm)" else n
      time(tag, mk)
    }
    spark.stop()
  }
}
