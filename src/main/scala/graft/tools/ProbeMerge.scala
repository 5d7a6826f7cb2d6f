package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftEngine

object ProbeMerge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    e.sql("CREATE OR REPLACE TEMPORARY VIEW s AS SELECT * FROM VALUES (2022,'US',100.0,10.0),(2022,'EU',50.0,5.0),(2023,'US',150.0,15.0) AS t(year, region, amount, tax)")
    e.sql("CREATE VIEW sv AS SELECT year, region, SUM(amount) AS MEASURE rev, SUM(tax) AS MEASURE tx, AVG(amount) AS MEASURE avg_amt FROM s")
    val q = "SELECT year, region, AGGREGATE(rev) AT (ALL region) AS r1, AGGREGATE(tx) AT (ALL region) AS t1, AGGREGATE(avg_amt) AT (ALL region) AS a1 FROM sv"
    val expanded = e.expandSql(q)
    println("EXPANDED: " + expanded)
    println("frame CTE count: " + "__f\\d+_".r.findAllIn(expanded).toList.map(_.toString).distinct.size)
    e.sql(q).show()
    spark.stop()
  }
}
