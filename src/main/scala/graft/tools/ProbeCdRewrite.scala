package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the one headline cell with a plausible non-floor win
  * (round-8 verdict item 5): COUNT(DISTINCT x) GROUP BY k planned by
  * Spark's native distinct-aggregate path vs an explicit two-level
  * pre-distinct (GROUP BY k, x -> COUNT per k). Three reps each on the
  * 100x lineitem; prints per-rep and median.
  */
object ProbeCdRewrite {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")

    val native =
      "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS parts FROM lineitem GROUP BY l_returnflag"
    val twoLevel =
      """SELECT l_returnflag, COUNT(*) AS parts FROM
        |  (SELECT l_returnflag, l_partkey FROM lineitem GROUP BY l_returnflag, l_partkey)
        |GROUP BY l_returnflag""".stripMargin

    for ((label, sql) <- Seq("native" -> native, "twoLevel" -> twoLevel, "native2" -> native, "twoLevel2" -> twoLevel)) {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"CD $label: ${secs.sorted.apply(1)}%.2f s median (${secs.map(s => f"$s%.2f").mkString(", ")})")
    }
    println("--- native plan ---")
    println(spark.sql(native).queryExecution.executedPlan.toString.take(2500))
    println("--- twoLevel plan ---")
    println(spark.sql(twoLevel).queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
