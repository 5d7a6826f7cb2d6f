package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev probe: does EagerAggregation fire on q_join_agg at the given SF, and
  * what does it cost? Prints optimized-plan markers and timings with the
  * gate at its default, forced open, and forced closed.
  *
  * Usage: runMain graft.tools.ProbeEagerAgg [sfDir]
  */
object ProbeEagerAgg {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.engineFor(spark, dir)
    val single = (s2: SparkSession, d: String) => s2.sql(
      """SELECT o.o_orderpriority, SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin)
    val fn = sys.env.get("PROBE_SINGLE") match {
      case Some(_) => single
      case None => SparkEntry.queries("q_join_agg")
    }

    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (gate <- Seq("default", "0", "max")) {
      gate match {
        case "default" => spark.conf.unset(graft.plans.EagerAggregation.confKey)
        case "0" => spark.conf.set(graft.plans.EagerAggregation.confKey, "0")
        case "max" => spark.conf.set(graft.plans.EagerAggregation.confKey, Long.MaxValue.toString)
      }
      val plan = fn(spark, dir).queryExecution.optimizedPlan.toString()
      val fires = "__graft_partial".r.findAllIn(plan).size
      once() // warm
      val sec = math.min(once(), once())
      println(f"[eager-probe] gate=$gate%-8s partials=$fires time=$sec%.2f s")
    }
    spark.stop()
  }
}
