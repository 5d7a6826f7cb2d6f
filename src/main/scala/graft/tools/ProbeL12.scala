package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftEngine

/** Drive the Listing-12 row-level mode + shims through the public API. */
object ProbeL12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    e.sql("CREATE OR REPLACE TEMPORARY VIEW t AS SELECT * FROM VALUES ('Happy', DATE '2024-01-01', 4), ('Happy', DATE '2024-01-02', 6), ('Happy', DATE '2024-01-03', 7), ('Whizz', DATE '2024-01-04', 3) AS x(prodName, orderDate, revenue)")
    e.sql("CREATE VIEW tv AS SELECT prodName, orderDate, revenue, AVG(revenue) AS MEASURE avgRevenue FROM t")

    println("L12 expanded: " + e.expandSql(
      "SELECT o.prodName, o.orderDate FROM tv o WHERE o.revenue > o.avgRevenue AT (WHERE prodName = o.prodName)"))
    e.sql("SELECT o.prodName, o.orderDate FROM tv o WHERE o.revenue > o.avgRevenue AT (WHERE prodName = o.prodName) ORDER BY o.orderDate").show()

    // comment + quoted ref + :: cast + array literal shims
    e.sql("SELECT prodName, -- trailing comment\n AGGREGATE(avgRevenue)::VARCHAR AS a /* block */ FROM tv").show()
    println("array shim: ")
    e.sql("SELECT aggregate([1, 2, 3], 'sum') AS s, list_aggregate([4.0, 5.0], 'avg') AS a").show()

    // probe: grouped query with WHERE call must error clearly
    try {
      e.sql("SELECT prodName, AGGREGATE(avgRevenue) FROM tv WHERE revenue > avgRevenue AT (ALL) GROUP BY prodName").collect()
      println("PROBE rowlevel-guard: NO ERROR (bad)")
    } catch { case ex: Exception => println("PROBE rowlevel-guard OK: " + ex.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
