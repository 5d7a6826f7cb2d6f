package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeAtAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    graft.SparkEntry.engineFor(spark, dir)
    for (name <- Seq("m_at_all_pct", "m_at_all_dim", "m_agg_basic", "m_agg_twodim", "m_chained_all")) {
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: median ${ts.sorted.apply(1)}%.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
