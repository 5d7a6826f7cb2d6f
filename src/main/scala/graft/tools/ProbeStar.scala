package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeStar {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val engine = graft.SparkEntry.engineFor(spark, dir)
    engine.sql("CREATE VIEW sales_v AS SELECT o_custkey, year(o_orderdate) AS yr, SUM(o_totalprice) AS MEASURE rev FROM orders")
    val qs = Seq(
      "star_dim_from_other" -> "SELECT c.c_mktsegment, AGGREGATE(rev) AS r FROM sales_v s JOIN customer c ON s.o_custkey = c.c_custkey GROUP BY c.c_mktsegment ORDER BY 1",
      "star_mixed_dims" -> "SELECT c.c_mktsegment, s.yr, AGGREGATE(rev) AS r FROM sales_v s JOIN customer c ON s.o_custkey = c.c_custkey GROUP BY c.c_mktsegment, s.yr ORDER BY 1, 2 LIMIT 5",
      "star_at_all" -> "SELECT s.yr, ROUND(100 * AGGREGATE(rev) / AGGREGATE(rev) AT (ALL), 2) AS pct FROM sales_v s JOIN customer c ON s.o_custkey = c.c_custkey GROUP BY s.yr ORDER BY 1"
    )
    for ((name, sql) <- qs) {
      try {
        println(s"EXPANDED $name: " + engine.expandSql(sql).take(400))
        val rows = engine.sql(sql).collect()
        println(s"OK $name rows=${rows.length} first=${rows.headOption}")
      } catch {
        case e: Throwable =>
          println(s"FAIL $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200).replace('\n',' ')}")
      }
    }
    // cross-check star_mixed_dims against hand-written SQL
    val want = spark.sql("SELECT c.c_mktsegment, year(o.o_orderdate) AS yr, SUM(o.o_totalprice) AS r FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 5").collect().mkString("|")
    val got = engine.sql(qs(1)._2).collect().mkString("|")
    println(s"MATCH star_mixed_dims: ${want == got}\nwant=$want\ngot =$got")
    spark.stop()
  }
}
