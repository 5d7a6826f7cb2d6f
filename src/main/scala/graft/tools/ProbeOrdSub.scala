package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftEngine

/** Debug: correlated-scalar and IN-subqueries in ORDER BY position
  * (measures.test:1254-1296 — the two pinned error-skips).
  */
object ProbeOrdSub {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    e.sql("CREATE OR REPLACE TEMPORARY VIEW sales AS SELECT * FROM VALUES " +
      "(2022, 'US', 100.0), (2022, 'EU', 50.0), (2023, 'US', 150.0), (2023, 'EU', 75.0) AS t(year, region, amount)")
    e.sql("CREATE VIEW sales_v AS SELECT year, region, SUM(amount) AS MEASURE revenue FROM sales")
    e.sql("CREATE OR REPLACE TEMPORARY VIEW order_subquery_totals AS SELECT * FROM VALUES " +
      "(2022, 2.0), (2023, 1.0) AS t(year, total)")
    e.sql("CREATE OR REPLACE TEMPORARY VIEW order_allowed_totals AS SELECT * FROM VALUES (225.0) AS t(total)")

    val q1 =
      """SELECT o.year, o.region, AGGREGATE(revenue) AT (ALL region) AS total
        |FROM sales_v o
        |ORDER BY (
        |    SELECT total
        |    FROM order_subquery_totals st
        |    WHERE st.year = o.year
        |), o.region""".stripMargin
    println("EXPANDED1: " + e.expandSql(q1))
    e.sql(q1).show(10, truncate = false)

    val q2 =
      """SELECT o.year, o.region, AGGREGATE(revenue) AT (ALL region) AS total
        |FROM sales_v o
        |ORDER BY total IN (SELECT total FROM order_allowed_totals), o.region, o.year""".stripMargin
    println("EXPANDED2: " + e.expandSql(q2))
    e.sql(q2).show(10, truncate = false)
    println("PROBE-ORD-SUB OK")
    spark.stop()
  }
}
