package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.ScaleLayout

/** Measures the layout answer to the one shuffle that dominates the 100×
  * bench: q_join_agg's 60M-row lineitem ⋈ 15M-row orders. Bucketing both
  * fact tables by the join key at WRITE time removes the per-query
  * Exchange — the shuffle is paid once at ingest, which is the contract a
  * 100 TB deployment actually runs. Prints plain-parquet vs bucketed
  * wall-times for the identical query and asserts the bucketed plan is
  * Exchange-free on the join keys.
  *
  * Usage: runMain graft.tools.ProbeBucketed100x [sfDir] (default bench_sf10)
  */
object ProbeBucketed100x {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh").toString
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir", wh)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false") // stable plans for the audit
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (t <- Seq("lineitem", "orders", "customer", "nation"))
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)

    val sql =
      """SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin

    def time2(f: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once())
    }

    val plainSec = time2(spark.sql(sql).write.format("noop").mode("overwrite").save())
    println(f"[bucketed-probe] plain parquet q_join_agg: $plainSec%.2f s")

    // one-time ingest cost: bucket the two big fact tables by the join key
    val t0 = System.nanoTime()
    ScaleLayout.writeBucketed(spark.table("lineitem"), "lineitem_b", 128, "l_orderkey")
    ScaleLayout.writeBucketed(spark.table("orders"), "orders_b", 128, "o_orderkey")
    val ingestSec = (System.nanoTime() - t0) / 1e9
    println(f"[bucketed-probe] one-time bucketing ingest: $ingestSec%.2f s")

    val sqlB = sql.replace("orders o", "orders_b o").replace("lineitem l", "lineitem_b l")
    val bucketedSec = time2(spark.sql(sqlB).write.format("noop").mode("overwrite").save())
    println(f"[bucketed-probe] bucketed q_join_agg: $bucketedSec%.2f s")

    // audit: the l ⋈ o join must consume bucketed scans with NO Exchange
    // between the two fact scans and the join
    val plan = spark.sql(sqlB).queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    val hashIdx = plan.indexOf("ShuffledHashJoin")
    val firstJoin = Seq(joinIdx, hashIdx).filter(_ >= 0).minOption.getOrElse(-1)
    require(firstJoin >= 0, "expected a shuffle-family join operator in the plan")
    val exchanges = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(plan).size
    println(s"[bucketed-probe] exchanges on the orderkey join: $exchanges (want 0)")
    require(exchanges == 0, "bucketed join still shuffles on the join key")
    println(f"[bucketed-probe] RESULT plain=$plainSec%.2f s bucketed=$bucketedSec%.2f s " +
      f"ingest(once)=$ingestSec%.2f s")
    spark.stop()
  }
}
