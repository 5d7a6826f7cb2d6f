package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeSmj {
  def main(args: Array[String]): Unit = {
    for (smj <- Seq("false", "true")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-wh").toString)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", smj)
        .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val dir = "/root/repo/bench_sf10"
      spark.conf.set("graft.layout.bucketed", "true")
      graft.SparkEntry.engineFor(spark, dir)
      val fn = graft.SparkEntry.queries("q_join_agg")
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"q_join_agg smj=$smj: median ${ts.sorted.apply(1)}%.3f (${ts.map(t => f"$t%.2f").mkString(",")})")
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      println("  join op: " + Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        .filter(plan.contains).mkString(","))
      spark.stop()
    }
  }
}
