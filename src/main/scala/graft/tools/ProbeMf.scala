package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeMf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.SparkEntry.engineFor(spark, dir)
    def time(label: String, name: String): Unit = {
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: median ${ts.sorted.apply(2)}%.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    time("m_multifact", "m_multifact")
    // count ReusedExchange in the plan
    val df = graft.SparkEntry.queries("m_multifact")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println("ReusedExchange occurrences: " + "ReusedExchange".r.findAllIn(plan).length)
    println("FileScan parquet occurrences: " + "Scan parquet".r.findAllIn(plan).length)
    spark.stop()
  }
}
