package graft

import org.apache.spark.sql.SparkSession

/** End-to-end drive of the public engine API against the driver testdata.
  * `sbt "runMain graft.Demo [sfDir]"` — prints query results and the
  * expanded SQL + physical plan for inspection.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (t <- Seq("lineitem", "orders", "customer", "nation", "region"))
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)

    val engine = GraftEngine(spark)

    engine.sql(
      """CREATE VIEW li_v AS
        |SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
        |       SUM(l_extendedprice * (1 - l_discount)) AS MEASURE revenue,
        |       SUM(l_quantity) AS MEASURE qty,
        |       AVG(l_extendedprice) AS MEASURE avg_price,
        |       COUNT(DISTINCT l_partkey) AS MEASURE parts
        |FROM lineitem""".stripMargin)

    def show(label: String, sql: String): Unit = {
      println(s"\n=== $label\n--- query: $sql")
      println("--- expanded: " + engine.expandSql(sql))
      engine.sql(sql).show(12, truncate = false)
    }

    show("basic AGGREGATE + implicit GROUP BY",
      "SELECT l_returnflag, AGGREGATE(revenue) AS revenue FROM li_v")
    show("pct-of-total via AT (ALL)",
      """SELECT l_returnflag, l_linestatus, AGGREGATE(revenue) AS revenue,
        |ROUND(100.0 * AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL), 2) AS pct
        |FROM li_v""".stripMargin)
    show("YoY via AT (SET)",
      """SELECT ship_year, AGGREGATE(revenue) AS revenue,
        |AGGREGATE(revenue) AT (SET ship_year = ship_year - 1) AS prior_year
        |FROM li_v ORDER BY ship_year""".stripMargin)
    show("COUNT DISTINCT measure with WHERE",
      "SELECT l_returnflag, AGGREGATE(parts) AS parts FROM li_v WHERE l_linestatus = 'F'")

    println("\n=== physical plan of the AT (ALL) query:")
    engine.sql(
      """SELECT l_returnflag, AGGREGATE(revenue) AS revenue,
        |AGGREGATE(revenue) AT (ALL) AS total FROM li_v""".stripMargin)
      .explain("formatted")

    // probes
    def expectError(label: String, sql: String): Unit = {
      try {
        engine.sql(sql).show(1)
        println(s"PROBE $label: NO ERROR (unexpected)")
      } catch {
        case e: Exception =>
          println(s"PROBE $label: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}")
      }
    }
    expectError("unknown measure", "SELECT l_returnflag, AGGREGATE(nope) FROM li_v")
    // plain (visible-context) AGGREGATE in WHERE is circular and must error;
    // re-contexted calls (AT ...) are supported, demoed below
    expectError("circular visible AGGREGATE in WHERE",
      "SELECT l_returnflag, AGGREGATE(revenue) FROM li_v WHERE AGGREGATE(qty) > 5")
    // grouped measure-predicate WHERE: rows above their group's average
    // price, then grouped (filtered-base expansion)
    engine.sql(
      """SELECT l_returnflag, COUNT(*) AS n, ROUND(AGGREGATE(revenue), 2) AS rev
        |FROM li_v o
        |WHERE o.l_extendedprice > o.avg_price AT (WHERE l_returnflag = o.l_returnflag)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).show(5, truncate = false)

    // warnings: AT (ALL dim) over a filtered ungrouped dim
    engine.sql("SELECT l_returnflag, AGGREGATE(revenue) AT (ALL l_returnflag) AS t FROM li_v WHERE l_linestatus = 'F' GROUP BY l_returnflag").collect()
    println("WARNINGS: " + engine.lastWarnings.mkString(" | "))
    engine.sql("SET warnings_as_errors = true")
    expectError("warnings_as_errors escalation",
      "SELECT l_returnflag, AGGREGATE(revenue) AT (ALL l_returnflag) AS t FROM li_v WHERE l_linestatus = 'F' GROUP BY l_returnflag")
    engine.sql("SET warnings_as_errors = false")

    // batch TEMP measure view: must be consumed by a materializing statement
    // (plain SELECT consumption is an error, matching the reference)
    expectError("temp measure view consumed by plain SELECT",
      """CREATE TEMPORARY VIEW demo_tmp_v AS SELECT l_returnflag, SUM(l_quantity) AS MEASURE q FROM lineitem;
        |SELECT l_returnflag, AGGREGATE(q) AS q FROM demo_tmp_v""".stripMargin)
    engine.sql("DROP TABLE IF EXISTS demo_tmp_out")
    engine.executeBatch(
      """CREATE TEMPORARY VIEW demo_tmp_v AS SELECT l_returnflag, SUM(l_quantity) AS MEASURE q FROM lineitem;
        |CREATE TABLE demo_tmp_out AS SELECT l_returnflag, AGGREGATE(q) AS q FROM demo_tmp_v;
        |DROP VIEW demo_tmp_v""".stripMargin)
    println("BATCH rows: " + spark.table("demo_tmp_out").count() +
      ", temp view still registered: " + engine.catalog.contains("demo_tmp_v"))
    engine.sql("DROP TABLE demo_tmp_out")

    // multi-fact dedup pushdown: expanded SQL should show DISTINCT-pruned join sides
    engine.sql("CREATE VIEW demo_ord_v AS SELECT year(o_orderdate) AS yr, SUM(o_totalprice) AS MEASURE tp FROM orders")
    engine.sql("CREATE VIEW demo_li_v AS SELECT year(l_shipdate) AS yr, SUM(l_quantity) AS MEASURE lq FROM lineitem")
    println("MULTIFACT expanded: " + engine.expandSql(
      "SELECT o.yr, AGGREGATE(tp) AS tp, AGGREGATE(lq) AS lq FROM demo_ord_v o JOIN demo_li_v l ON o.yr = l.yr ORDER BY o.yr"))
    engine.sql("SELECT o.yr, ROUND(AGGREGATE(tp),2) AS tp, ROUND(AGGREGATE(lq),2) AS lq FROM demo_ord_v o JOIN demo_li_v l ON o.yr = l.yr ORDER BY o.yr").show(5, truncate = false)

    engine.sql("DROP VIEW li_v")
    expectError("query after DROP VIEW", "SELECT l_returnflag, AGGREGATE(revenue) FROM li_v")

    spark.stop()
  }
}
