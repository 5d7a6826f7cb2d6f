package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftEngine

/** Drive CTAS / INSERT / CREATE VIEW wrapping of measure bodies (dev tool). */
object ProbeWrap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = GraftEngine(spark)
    e.sql("CREATE OR REPLACE TEMPORARY VIEW s AS SELECT * FROM VALUES (2022,'US',100.0),(2023,'US',150.0),(2023,'EU',75.0) AS t(year, region, amount)")
    e.sql("CREATE VIEW sv AS SELECT year, region, SUM(amount) AS MEASURE rev FROM s")

    // CREATE VIEW wrapping a measure body
    e.sql("CREATE VIEW derived_view AS SELECT year, AGGREGATE(rev) AS rev FROM sv")
    println("CREATE VIEW body expanded:")
    e.sql("SELECT * FROM derived_view ORDER BY year").show()

    // INSERT INTO wrapping a measure body
    e.sql("CREATE TABLE ins_target (year INT, rev DOUBLE) USING parquet")
    e.sql("INSERT INTO ins_target SELECT year, AGGREGATE(rev) AS rev FROM sv")
    println("INSERT INTO target:")
    spark.sql("SELECT * FROM ins_target ORDER BY year").show()

    // probe: INSERT with a non-measure body passes through untouched
    e.sql("INSERT INTO ins_target SELECT year, SUM(amount) FROM s GROUP BY year")
    println("rows after plain INSERT: " + spark.sql("SELECT count(*) FROM ins_target").head().getLong(0))

    e.sql("DROP TABLE ins_target")
    spark.stop()
  }
}
