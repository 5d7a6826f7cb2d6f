package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeDdl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = graft.SparkEntry.engineFor(spark, "/root/testdata/sf0.001")
    def run(name: String)(ddls: String*)(query: String): Unit = {
      try {
        ddls.foreach(engine.sql(_))
        val rows = engine.sql(query).collect()
        println(s"OK $name rows=${rows.length}: ${rows.take(2).mkString(" ")}")
      } catch {
        case e: Throwable =>
          println(s"FAIL $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200).replace('\n',' ')}")
      }
    }
    run("view_with_where_groupby")(
      "CREATE OR REPLACE VIEW dv1 AS SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS MEASURE q FROM lineitem WHERE l_shipdate >= DATE '1996-01-01' GROUP BY l_returnflag, l_linestatus")(
      "SELECT l_returnflag, ROUND(AGGREGATE(q),2) AS q FROM dv1 GROUP BY l_returnflag ORDER BY 1")
    run("view_body_with_join")(
      "CREATE OR REPLACE VIEW dv2 AS SELECT o_orderpriority, year(o_orderdate) AS yr, SUM(l_quantity) AS MEASURE q FROM orders JOIN lineitem ON o_orderkey = l_orderkey")(
      "SELECT o_orderpriority, ROUND(AGGREGATE(q),2) AS q, ROUND(AGGREGATE(q) AT (ALL),2) AS t FROM dv2 GROUP BY o_orderpriority ORDER BY 1")
    run("view_body_with_cte")(
      "CREATE OR REPLACE VIEW dv3 AS WITH f AS (SELECT * FROM lineitem WHERE l_discount > 0.05) SELECT l_returnflag, AVG(l_extendedprice) AS MEASURE ap FROM f")(
      "SELECT l_returnflag, ROUND(AGGREGATE(ap),2) AS ap FROM dv3 GROUP BY l_returnflag ORDER BY 1")
    run("view_body_union")(
      "CREATE OR REPLACE VIEW dv4 AS SELECT l_returnflag AS flag, SUM(l_quantity) AS MEASURE q FROM (SELECT l_returnflag, l_quantity FROM lineitem WHERE l_linestatus = 'F' UNION ALL SELECT l_returnflag, l_quantity FROM lineitem WHERE l_linestatus = 'O')")(
      "SELECT flag, ROUND(AGGREGATE(q),2) AS q FROM dv4 GROUP BY flag ORDER BY 1")
    run("replace_changes_measure")(
      "CREATE OR REPLACE VIEW dv5 AS SELECT l_returnflag, SUM(l_quantity) AS MEASURE m FROM lineitem",
      "CREATE OR REPLACE VIEW dv5 AS SELECT l_returnflag, SUM(l_extendedprice) AS MEASURE m FROM lineitem")(
      "SELECT l_returnflag, ROUND(AGGREGATE(m),2) AS m FROM dv5 GROUP BY l_returnflag ORDER BY 1")
    run("mixed_measures_and_dims_expr")(
      "CREATE OR REPLACE VIEW dv6 AS SELECT upper(l_returnflag) AS flag, month(l_shipdate) AS mo, COUNT(*) AS MEASURE n, SUM(l_tax) AS MEASURE tax FROM lineitem")(
      "SELECT flag, ROUND(AGGREGATE(tax) / AGGREGATE(n), 4) AS tax_per_row FROM dv6 GROUP BY flag ORDER BY 1")
    run("quoted_identifiers")(
      "CREATE OR REPLACE VIEW dv7 AS SELECT l_returnflag AS `ReturnFlag`, SUM(l_quantity) AS MEASURE `TotalQty` FROM lineitem")(
      "SELECT ReturnFlag, ROUND(AGGREGATE(TotalQty),2) AS q FROM dv7 GROUP BY ReturnFlag ORDER BY 1")
    run("spacey_dim_alias_guided_error")(
    )("CREATE OR REPLACE VIEW dv10 AS SELECT l_returnflag AS `Return Flag`, SUM(l_quantity) AS MEASURE q FROM lineitem")
    run("spacey_measure_name_guided_error")(
    )("CREATE OR REPLACE VIEW dv9 AS SELECT l_returnflag, SUM(l_quantity) AS MEASURE `Total Qty` FROM lineitem")
    run("measure_only_view_no_dims")(
      "CREATE OR REPLACE VIEW dv8 AS SELECT SUM(l_quantity) AS MEASURE q FROM lineitem")(
      "SELECT ROUND(AGGREGATE(q),2) AS q FROM dv8")
    spark.stop()
  }
}
