package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftEngine

/** Debug: sugar measure call in WHERE of a grouped query — print expansion. */
object ProbeWhere {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lineitem")
    e.sql(
      """CREATE VIEW li_v AS
        |SELECT l_returnflag, l_linestatus,
        |  SUM(l_extendedprice * (1 - l_discount)) AS MEASURE revenue,
        |  AVG(l_extendedprice) AS MEASURE avg_price
        |FROM lineitem""".stripMargin)
    val q =
      """SELECT l_returnflag, COUNT(*) AS n, ROUND(AGGREGATE(revenue), 2) AS rev
        |FROM li_v o
        |WHERE o.l_extendedprice > o.avg_price AT (WHERE l_returnflag = o.l_returnflag)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    println("EXPANDED: " + e.expandSql(q))
    e.sql(q).show(5, truncate = false)
    spark.stop()
  }
}
