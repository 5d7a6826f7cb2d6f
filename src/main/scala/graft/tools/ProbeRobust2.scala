package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeRobust2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = graft.SparkEntry.engineFor(spark, "/root/testdata/sf0.001")
    val qs = Seq(
      "rank_over_measure" -> "SELECT l_returnflag, AGGREGATE(revenue) AS r, RANK() OVER (ORDER BY AGGREGATE(revenue) DESC) AS rnk FROM li_v GROUP BY l_returnflag ORDER BY rnk",
      "group_by_all" -> "SELECT l_returnflag, l_linestatus, AGGREGATE(revenue) AS r FROM li_v GROUP BY ALL ORDER BY 1, 2",
      "order_by_all" -> "SELECT l_returnflag, AGGREGATE(revenue) AS r FROM li_v GROUP BY l_returnflag ORDER BY ALL",
      "filter_on_call" -> "SELECT l_returnflag, AGGREGATE(revenue) FILTER (WHERE l_linestatus = 'F') AS r FROM li_v GROUP BY l_returnflag ORDER BY 1",
      "at_set_range" -> "SELECT ship_year, AGGREGATE(revenue) AT (SET ship_year = ship_year - 2) AS r2 FROM li_v GROUP BY ship_year ORDER BY 1",
      "coalesce_measure" -> "SELECT l_returnflag, COALESCE(AGGREGATE(revenue) AT (WHERE l_linestatus = 'O'), 0) AS r FROM li_v GROUP BY l_returnflag ORDER BY 1",
      "two_views_same_table" -> "SELECT a.l_returnflag, AGGREGATE(a.revenue) AS r1, AGGREGATE(b.qty) AS q FROM li_v a JOIN li_y b ON a.ship_year = b.yr GROUP BY a.l_returnflag ORDER BY 1",
      "subquery_from" -> "SELECT k, v FROM (SELECT l_returnflag AS k, AGGREGATE(revenue) AS v FROM li_v GROUP BY l_returnflag) t WHERE v > 0 ORDER BY k",
      "view_in_cte_and_union" -> "WITH a AS (SELECT l_returnflag AS k, AGGREGATE(revenue) AS v FROM li_v GROUP BY l_returnflag) SELECT * FROM a UNION ALL SELECT 'x', 0.0 ORDER BY k",
      "measure_in_where_subq" -> "SELECT o_orderpriority, COUNT(*) AS n FROM orders WHERE o_totalprice > (SELECT AGGREGATE(avg_order) FROM ord_v) GROUP BY o_orderpriority ORDER BY 1",
      "agg_distinct_dim" -> "SELECT DISTINCT l_returnflag, AGGREGATE(revenue) AS r FROM li_v GROUP BY l_returnflag ORDER BY 1",
      "nulls_first_last" -> "SELECT l_returnflag, AGGREGATE(revenue) AS r FROM li_v GROUP BY ROLLUP(l_returnflag) ORDER BY l_returnflag ASC NULLS LAST"
    )
    for ((name, sql) <- qs) {
      try {
        val rows = engine.sql(sql).collect()
        println(s"OK $name rows=${rows.length}: ${rows.take(2).mkString(" ")}")
      } catch {
        case e: Throwable =>
          println(s"FAIL $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200).replace('\n',' ')}")
      }
    }
    spark.stop()
  }
}
