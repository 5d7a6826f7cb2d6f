package graft.tools

object ProbeStarExcept {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("probe").config("spark.ui.enabled", "false").getOrCreate()
    try {
      spark.sql("SELECT * EXCEPT (b) FROM (SELECT 1 AS a, 2 AS b, 3 AS c)").show()
      println("STAR_EXCEPT_OK")
    } catch { case e: Throwable => println("STAR_EXCEPT_NO: " + e.getMessage.take(200)) }
    // lateral alias referencing a window expr?
    try {
      spark.sql("SELECT a, row_number() OVER (ORDER BY a) AS rn, rn <= 1 AS q FROM (SELECT 1 AS a UNION ALL SELECT 2)").show()
      println("LATERAL_WINDOW_OK")
    } catch { case e: Throwable => println("LATERAL_WINDOW_NO: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
