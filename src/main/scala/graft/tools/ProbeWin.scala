package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftEngine

object ProbeWin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    e.sql("CREATE OR REPLACE TEMPORARY VIEW wmo AS SELECT * FROM VALUES (2021,10.0),(2022,20.0),(2023,30.0) AS t(year, revenue)")
    e.sql("CREATE VIEW wmv AS SELECT year, SUM(revenue) OVER (ORDER BY year) AS MEASURE running_total FROM wmo")
    println("EXPANDED: " + e.expandSql("SELECT year, AGGREGATE(running_total) AT (ALL) AS rt FROM wmv GROUP BY year"))
    try {
      e.sql("SELECT year, AGGREGATE(running_total) AT (ALL) AS rt FROM wmv GROUP BY year").collect()
      println("NO ERROR (unexpected)")
    } catch { case ex: Exception => println("ERROR OK: " + ex.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
