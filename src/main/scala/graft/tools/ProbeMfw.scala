package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftEngine

/** Debug: multi-fact WHERE measure predicate — print expansion. */
object ProbeMfw {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    for (t <- Seq("orders", "lineitem"))
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").createOrReplaceTempView(t)
    e.sql(
      """CREATE VIEW ord_v AS
        |SELECT year(o_orderdate) AS yr, o_orderpriority, o_orderstatus,
        |  SUM(o_totalprice) AS MEASURE total_price,
        |  COUNT(*) AS MEASURE order_cnt,
        |  AVG(o_totalprice) AS MEASURE avg_order
        |FROM orders""".stripMargin)
    e.sql(
      """CREATE VIEW li_y AS
        |SELECT year(l_shipdate) AS yr, l_returnflag,
        |  SUM(l_extendedprice * (1 - l_discount)) AS MEASURE li_rev
        |FROM lineitem""".stripMargin)
    val q =
      "SELECT o.yr, ROUND(AGGREGATE(total_price), 2) AS total_price, ROUND(AGGREGATE(li_rev), 2) AS li_rev " +
        "FROM ord_v o JOIN li_y l ON o.yr = l.yr " +
        "WHERE o.o_totalprice > o.avg_order AT (WHERE yr = o.yr) " +
        "GROUP BY o.yr ORDER BY o.yr"
    println("EXPANDED: " + e.expandSql(q))
    e.sql(q).show(10, truncate = false)
    spark.stop()
  }
}
