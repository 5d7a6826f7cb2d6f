package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round-10): where does the soft-candidate cost go, and how
  * selective is the boundary margin on the 100x embeddings?
  * Reports the fraction of vectors whose 2nd-nearest coarse cell is within
  * d2 <= m * d1 for several margins, plus the soft membership count each
  * admits — the knob that multiplies the quadratic in-cluster verify.
  */
object ProbeSoftMargin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val k = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder()
      .appName("probe-softmargin").master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val kSuper = math.ceil(math.sqrt(k.toDouble)).toInt
    val q = emb.select(col("vec_id").cast("long").as("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => round(x * 1000).cast("long")).as("q"))
    val coarse = q.filter(col("vec_id") < kSuper)
      .select(col("vec_id").cast("int").as("cidx"),
        transform(col("q"), x => x.cast("double")).as("cvec"))
    val d12 = q.crossJoin(broadcast(coarse))
      .withColumn("__d", graft.functions.VecOps.sqDistLongDouble(col("q"), col("cvec")))
      .groupBy("vec_id")
      .agg(min(struct(col("__d"), col("cidx"))).as("m1"),
        try_element_at(sort_array(collect_list(struct(col("__d"), col("cidx")))),
          lit(2)).as("m2"))
      .select(col("m1.__d").as("d1"), col("m2.__d").as("d2"))
      .persist()
    val n = d12.count()
    for (m <- Seq(1.05, 1.1, 1.21, 1.5, 2.0, 4.0)) {
      val pass = d12.filter(col("d2") <= lit(m) * col("d1")).count()
      println(f"MARGIN $m%.2f: pass = $pass / $n (${100.0 * pass / n}%.1f%%)")
    }
    d12.unpersist()
    spark.stop()
  }
}
