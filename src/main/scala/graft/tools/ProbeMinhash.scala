package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    graft.SparkEntry.engineFor(spark, dir)
    val fn = graft.SparkEntry.queries("d_minhash")
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"d_minhash: ${ts.map(t => f"$t%.1f").mkString(",")}")
    spark.stop()
  }
}
