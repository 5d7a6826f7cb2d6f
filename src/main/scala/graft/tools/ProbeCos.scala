package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity
object ProbeCos {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${ts.sorted.apply(1)}%.3f s (runs: ${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    time("s_knn fused")(
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
