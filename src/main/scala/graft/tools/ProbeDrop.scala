package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftEngine

object ProbeDrop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    e.sql("CREATE OR REPLACE TEMPORARY VIEW sales AS SELECT * FROM VALUES (2022,'US',100.0),(2023,'US',150.0),(2023,'EU',75.0) AS t(year, region, amount)")
    e.sql("CREATE VIEW batch_drop_temp_replace_v AS SELECT year, SUM(amount) AS MEASURE drop_temp_permanent_revenue FROM sales")
    e.sql("DROP TABLE IF EXISTS batch_drop_temp_replace_result")
    e.sql("""DROP VIEW batch_drop_temp_replace_v;
      |CREATE TEMP VIEW batch_drop_temp_replace_v AS
      |SELECT year, SUM(amount * 10) AS MEASURE drop_temp_replacement_revenue FROM sales;
      |CREATE TABLE batch_drop_temp_replace_result AS
      |SELECT year, AGGREGATE(drop_temp_replacement_revenue) AS revenue FROM batch_drop_temp_replace_v GROUP BY year""".stripMargin)
    println("result table:")
    spark.sql("SELECT * FROM batch_drop_temp_replace_result ORDER BY year").show()
    try {
      e.sql("SEMANTIC SELECT AGGREGATE(drop_temp_permanent_revenue) FROM batch_drop_temp_replace_v").collect()
      println("PROBE: NO ERROR (bad)")
    } catch { case ex: Exception => println("PROBE ERROR OK: " + ex.getMessage.linesIterator.next()) }
    e.sql("DROP TABLE batch_drop_temp_replace_result")
    spark.stop()
  }
}
