package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object ProbeDx {
  def main(args: Array[String]): Unit = {
    val dir = "/root/repo/bench_sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.setSplitConf(spark, "d_exact", bigInput = true)
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once("d_exact"); once("t_analysis")
    println(f"[dx] d_exact min=${math.min(once("d_exact"), once("d_exact"))}%.2f s")
    graft.Bench.setSplitConf(spark, "t_analysis", bigInput = true)
    println(f"[dx] t_analysis min=${math.min(once("t_analysis"), once("t_analysis"))}%.2f s")
    graft.Bench.setSplitConf(spark, "t_tokens", bigInput = true)
    once("t_tokens")
    println(f"[dx] t_tokens min=${math.min(once("t_tokens"), once("t_tokens"))}%.2f s")
    spark.stop()
  }
}
