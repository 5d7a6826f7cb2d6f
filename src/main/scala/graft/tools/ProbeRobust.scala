package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeRobust {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val engine = graft.SparkEntry.engineFor(spark, dir)
    val qs = Seq(
      "having_agg" -> "SELECT l_returnflag, AGGREGATE(revenue) AS r FROM li_v GROUP BY l_returnflag HAVING AGGREGATE(revenue) > 1000000 ORDER BY l_returnflag",
      "order_by_agg" -> "SELECT l_returnflag FROM li_v GROUP BY l_returnflag ORDER BY AGGREGATE(revenue) DESC",
      "case_arith" -> "SELECT l_returnflag, CASE WHEN AGGREGATE(revenue) > 0 THEN AGGREGATE(revenue) / 1000 ELSE 0 END AS k FROM li_v GROUP BY l_returnflag ORDER BY 1",
      "agg_in_scalar_subq" -> "SELECT o_orderpriority, (SELECT AGGREGATE(revenue) FROM li_v) AS total FROM orders GROUP BY o_orderpriority ORDER BY 1",
      "union_measures" -> "SELECT l_returnflag AS k, AGGREGATE(revenue) AS v FROM li_v GROUP BY l_returnflag UNION ALL SELECT l_linestatus, AGGREGATE(revenue) FROM li_v GROUP BY l_linestatus ORDER BY k, v",
      "nested_at" -> "SELECT l_returnflag, AGGREGATE(revenue) AT (ALL l_linestatus) AT (WHERE l_linestatus = 'F') AS x FROM li_v GROUP BY l_returnflag ORDER BY 1",
      "at_in_case" -> "SELECT l_returnflag, ROUND(100 * AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL), 2) AS pct FROM li_v GROUP BY l_returnflag ORDER BY 1",
      "cte_measure" -> "WITH top AS (SELECT l_returnflag, AGGREGATE(revenue) AS r FROM li_v GROUP BY l_returnflag) SELECT * FROM top WHERE r > 0 ORDER BY 1",
      "join_dim_table" -> "SELECT n.n_name, AGGREGATE(total_price) AS tp FROM ord_v o JOIN customer c ON o.o_custkey = c.c_custkey JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY 1 LIMIT 5",
      "between_where" -> "SELECT l_returnflag, AGGREGATE(revenue) AS r FROM li_v WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31' GROUP BY l_returnflag ORDER BY 1",
      "distinct_dims" -> "SELECT DISTINCT l_returnflag, l_linestatus FROM li_v ORDER BY 1, 2",
      "limit_offset" -> "SELECT l_returnflag, AGGREGATE(revenue) AS r FROM li_v GROUP BY l_returnflag ORDER BY r DESC LIMIT 2 OFFSET 1",
      "count_star_with_measure" -> "SELECT l_returnflag, COUNT(*) AS n, AGGREGATE(revenue) AS r FROM li_v GROUP BY l_returnflag ORDER BY 1",
      "expr_dim_groupby_alias" -> "SELECT year(l_shipdate) AS yr, AGGREGATE(revenue) AS r FROM li_v GROUP BY yr ORDER BY yr LIMIT 3",
      "groupby_position" -> "SELECT l_returnflag, AGGREGATE(revenue) AS r FROM li_v GROUP BY 1 ORDER BY 1",
      "where_in_subquery" -> "SELECT l_returnflag, AGGREGATE(revenue) AS r FROM li_v WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 100000) GROUP BY l_returnflag ORDER BY 1",
      "two_measures_two_ats" -> "SELECT l_returnflag, AGGREGATE(revenue) AT (ALL) AS t1, AGGREGATE(qty) AT (ALL) AS t2 FROM li_v GROUP BY l_returnflag ORDER BY 1"
    )
    for ((name, sql) <- qs) {
      try {
        val n = engine.sql(sql).count()
        println(s"OK $name rows=$n")
      } catch {
        case e: Throwable =>
          println(s"FAIL $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(220).replace('\n',' ')}")
      }
    }
    spark.stop()
  }
}
