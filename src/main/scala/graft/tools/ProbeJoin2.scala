package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object ProbeJoin2 {
  def main(args: Array[String]): Unit = {
    for ((label, conf) <- Seq(
      ("bcast64+p8", Map("spark.sql.autoBroadcastJoinThreshold" -> (64L<<20).toString, "spark.sql.shuffle.partitions" -> "8")),
      ("bcast20+shj+p32", Map("spark.sql.autoBroadcastJoinThreshold" -> (20L<<20).toString, "spark.sql.join.preferSortMergeJoin" -> "false", "spark.sql.shuffle.partitions" -> "32")),
      ("bcast4+shj+p32", Map("spark.sql.autoBroadcastJoinThreshold" -> (4L<<20).toString, "spark.sql.join.preferSortMergeJoin" -> "false", "spark.sql.shuffle.partitions" -> "32")),
      ("aqe+bcast64", Map("spark.sql.adaptive.enabled" -> "true", "spark.sql.autoBroadcastJoinThreshold" -> (64L<<20).toString, "spark.sql.shuffle.partitions" -> "32"))
    )) {
      val b = SparkSession.builder()
        .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("graft-wh").toString)
        .master("local[32]")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", (8L<<20).toString)
        .config("spark.sql.files.openCostInBytes", (1L<<20).toString)
        .config("spark.ui.enabled", "false")
      conf.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val fn = SparkEntry.queries("q_join_agg")
      val df = fn(spark, "/root/repo/bench_sf1")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${times.map(t => f"$t%.2f").mkString(" ")}")
      spark.stop()
    }
  }
}
