package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Compare d_minhash bench timing under shuffle-partition / join-strategy
  * configs to pick the bench session settings.
  */
object ProbeMinhashCfg {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    for ((label, conf) <- Seq(
      ("p8+smj", Map("spark.sql.shuffle.partitions" -> "8", "spark.sql.join.preferSortMergeJoin" -> "true")),
      ("p32+shj", Map("spark.sql.shuffle.partitions" -> "32", "spark.sql.join.preferSortMergeJoin" -> "false")),
      ("p8+shj", Map("spark.sql.shuffle.partitions" -> "8", "spark.sql.join.preferSortMergeJoin" -> "false")),
      ("p32+smj", Map("spark.sql.shuffle.partitions" -> "32", "spark.sql.join.preferSortMergeJoin" -> "true"))
    )) {
      val b = SparkSession.builder()
        .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("graft-wh").toString)
        .master("local[32]")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", (20L << 20).toString)
        .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
        .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
        .config("spark.ui.enabled", "false")
      conf.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      for (q <- Seq("d_minhash", "s_knn", "m_at_all_dim")) {
        val fn = SparkEntry.queries(q)
        val df = fn(spark, sfDir)
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$label $q: ${times.map(t => f"$t%.2f").mkString(" ")}")
      }
      spark.stop()
    }
  }
}
