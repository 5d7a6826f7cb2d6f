package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftEngine

/** Drive the c0eebcf shims through the public API. */
object ProbeShims {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[4]").config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    e.sql("CREATE OR REPLACE TEMPORARY VIEW s AS SELECT * FROM VALUES (2022,'US',100.0),(2022,'EU',50.0),(2023,'US',150.0) AS t(year, region, amount)")
    e.sql("CREATE VIEW sv AS SELECT year, region, SUM(amount) AS MEASURE rev, STRING_AGG(region, '|') AS MEASURE regions FROM s")
    // string_agg measure through AGGREGATE
    e.sql("SELECT year, AGGREGATE(regions) AS regions FROM sv ORDER BY year").show()
    // dot-spaced qualified refs
    e.sql("SELECT s2 . year, AGGREGATE(s2 . rev) AS r FROM sv s2 GROUP BY 1 ORDER BY 1").show()
    // alias-qualified output alias in ORDER BY
    e.sql("SELECT o.year, AGGREGATE(rev) AT (ALL year) AS total FROM sv o GROUP BY o.year ORDER BY o.total, o.year").show()
    // probe: plain string_agg in a passthrough query
    e.sql("SELECT year, string_agg(region, ',') AS rs FROM s GROUP BY year ORDER BY year").show()
    spark.stop()
  }
}
