package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** A/B: do non-join queries regress when the fact temp views point at the
  * bucketed tables? Times a scan-heavy aggregate (m_countdistinct), a
  * window over orders (q_window_fn) and the join the layout exists for
  * (q_join_agg), plain vs bucketed, same JVM, interleaved runs.
  *
  * Usage: runMain graft.tools.ProbeBucketScan [sfDir]
  */
object ProbeBucketScan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = Seq("m_countdistinct", "q_window_fn", "q_join_agg")

    def run(bucketed: Boolean): Map[String, Double] = {
      spark.conf.set("graft.layout.bucketed", bucketed.toString)
      SparkEntry.engineFor(spark, dir) // (re)registers the temp views
      queries.map { q =>
        def once(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm
        q -> math.min(once(), once())
      }.toMap
    }

    run(bucketed = true) // pay the one-time ingest + JIT outside the timings
    // interleave to cancel drift on a noisy machine
    val plain1 = run(bucketed = false)
    val bkt1 = run(bucketed = true)
    val plain2 = run(bucketed = false)
    val bkt2 = run(bucketed = true)
    for (q <- queries) {
      val p = math.min(plain1(q), plain2(q))
      val b = math.min(bkt1(q), bkt2(q))
      println(f"[bucket-scan] $q%-16s plain=$p%6.2f s  bucketed=$b%6.2f s  (b/p=${b / p}%4.2f)")
    }
    spark.stop()
  }
}
