package graft.tools

import org.apache.spark.sql.SparkSession

/** Print per-run wall times of the d_minhash bench entry under the exact
  * bench session config, to separate warm steady-state from cache-population
  * cost (bench reports the median of 3).
  */
object ProbeDmh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("probe-dmh").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("d_minhash")
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("PROBE-DMH OK")
    spark.stop()
  }
}
