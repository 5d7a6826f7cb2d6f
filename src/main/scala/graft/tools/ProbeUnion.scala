package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeUnion {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = graft.SparkEntry.engineFor(spark, "/root/testdata/sf0.001")
    val qs = Seq(
      "union_all" -> ("SELECT l_returnflag AS k, ROUND(AGGREGATE(revenue),2) AS v FROM li_v GROUP BY l_returnflag " +
        "UNION ALL SELECT l_linestatus, ROUND(AGGREGATE(revenue),2) FROM li_v GROUP BY l_linestatus ORDER BY k, v"),
      "union_distinct" -> ("SELECT l_returnflag AS k FROM li_v GROUP BY l_returnflag UNION SELECT l_linestatus FROM li_v GROUP BY l_linestatus ORDER BY k"),
      "union_mixed_measure_plain" -> ("SELECT l_returnflag AS k, ROUND(AGGREGATE(revenue),2) AS v FROM li_v GROUP BY l_returnflag " +
        "UNION ALL SELECT 'TOTAL', ROUND(SUM(l_extendedprice * (1 - l_discount)),2) FROM lineitem ORDER BY k"),
      "except_measures" -> ("SELECT l_returnflag AS k FROM li_v GROUP BY l_returnflag EXCEPT SELECT 'A' AS k ORDER BY k"),
      "union_with_at" -> ("SELECT l_returnflag AS k, ROUND(AGGREGATE(revenue) AT (ALL),2) AS v FROM li_v GROUP BY l_returnflag " +
        "UNION ALL SELECT l_linestatus, ROUND(AGGREGATE(revenue),2) FROM li_v GROUP BY l_linestatus ORDER BY k, v LIMIT 4"),
      "three_way" -> ("SELECT 'a' AS k, ROUND(AGGREGATE(revenue),2) AS v FROM li_v UNION ALL SELECT 'b', ROUND(AGGREGATE(qty),2) FROM li_v " +
        "UNION ALL SELECT 'c', 0.0 ORDER BY k"))
    for ((name, sql) <- qs) {
      try {
        val rows = engine.sql(sql).collect()
        println(s"OK $name rows=${rows.length}: ${rows.take(3).mkString(" ")}")
      } catch {
        case e: Throwable =>
          println(s"FAIL $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200).replace('\n',' ')}")
      }
    }
    // parity: union_all vs hand-written SQL
    val rev = "l_extendedprice * (1 - l_discount)"
    val want = spark.sql(s"SELECT l_returnflag AS k, ROUND(SUM($rev),2) AS v FROM lineitem GROUP BY 1 UNION ALL SELECT l_linestatus, ROUND(SUM($rev),2) FROM lineitem GROUP BY 1 ORDER BY k, v").collect().mkString("|")
    val got = engine.sql(qs.head._2).collect().mkString("|")
    println(s"MATCH union_all: ${want == got}")
    spark.stop()
  }
}
