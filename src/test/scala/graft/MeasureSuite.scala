package graft

/** Golden tests ported from the reference corpus
  * (/root/reference/test/sql/measures.test — line refs in comments).
  * Expected values are copied verbatim from the corpus inline goldens.
  */
class MeasureSuite extends SparkSpec {

  lazy val engine: GraftEngine = {
    val e = GraftEngine(spark)
    e.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sales AS
        |SELECT * FROM VALUES
        |  (2022, 'US', 100.0), (2022, 'EU', 50.0),
        |  (2023, 'US', 150.0), (2023, 'EU', 75.0)
        |AS t(year, region, amount)""".stripMargin)
    e.sql("CREATE VIEW sales_v AS SELECT year, region, SUM(amount) AS MEASURE revenue FROM sales")
    e.sql("CREATE VIEW sales_yearly AS SELECT year, SUM(amount) AS MEASURE revenue FROM sales")
    e
  }

  // measures.test:29-35
  test("basic AGGREGATE with implicit GROUP BY") {
    checkGolden(engine.sql("SELECT year, region, AGGREGATE(revenue) FROM sales_v"),
      """2022	EU	50
        |2022	US	100
        |2023	EU	75
        |2023	US	150""".stripMargin)
  }

  // measures.test:52-55
  test("scalar AGGREGATE with literal") {
    checkGolden(engine.sql("SELECT AGGREGATE(revenue), 1 AS measure FROM sales_v"),
      "375\t1")
  }

  // measures.test:66-69
  test("scalar AGGREGATE no dims") {
    checkGolden(engine.sql("SELECT AGGREGATE(revenue) FROM sales_v"), "375")
  }

  // measures.test:692-713: explicit GROUP BY 1 / GROUP BY 1,2 + ORDER BY
  test("explicit positional GROUP BY") {
    checkGolden(engine.sql(
      "SELECT year, AGGREGATE(revenue) FROM sales_v GROUP BY 1 ORDER BY 1"),
      """2022	150
        |2023	225""".stripMargin)
    checkGolden(engine.sql(
      "SELECT year, region, AGGREGATE(revenue) FROM sales_v GROUP BY 1, 2 ORDER BY 1, 2"),
      """2022	EU	50
        |2022	US	100
        |2023	EU	75
        |2023	US	150""".stripMargin)
  }

  // measures.test:718-726
  test("AT (ALL region) removes one dim") {
    checkGolden(engine.sql(
      "SELECT year, region, AGGREGATE(revenue) AT (ALL region) AS year_total FROM sales_v"),
      """2022	EU	150
        |2022	US	150
        |2023	EU	225
        |2023	US	225""".stripMargin)
  }

  // measures.test:1355-1362
  test("AT (ALL) grand total") {
    checkGolden(engine.sql(
      "SELECT year, region, AGGREGATE(revenue) AT (ALL) AS grand_total FROM sales_v"),
      """2022	EU	375
        |2022	US	375
        |2023	EU	375
        |2023	US	375""".stripMargin)
  }

  // measures.test:1370-1390
  test("AT (WHERE cond) replaces context") {
    checkGolden(engine.sql(
      "SELECT year, region, AGGREGATE(revenue) AT (WHERE region = 'US') AS us_revenue FROM sales_v"),
      """2022	EU	250
        |2022	US	250
        |2023	EU	250
        |2023	US	250""".stripMargin)
    // qualified columns inside AT (WHERE)
    checkGolden(engine.sql(
      "SELECT year, region, AGGREGATE(revenue) AT (WHERE sales_v.region = 'US') AS us_revenue FROM sales_v"),
      """2022	EU	250
        |2022	US	250
        |2023	EU	250
        |2023	US	250""".stripMargin)
  }

  // measures.test:1399-1420 (YoY + CURRENT)
  test("AT (SET year = year - 1) prior year") {
    checkGolden(engine.sql(
      "SELECT year, AGGREGATE(revenue) AT (SET year = year - 1) AS prior_year FROM sales_yearly"),
      """2022	NULL
        |2023	150""".stripMargin)
    checkGolden(engine.sql(
      "SELECT year, AGGREGATE(revenue) AT (SET year = CURRENT year - 1) AS prior_year FROM sales_yearly"),
      """2022	NULL
        |2023	150""".stripMargin)
  }

  // measures.test:1426-1432
  test("AT (VISIBLE) respects outer WHERE") {
    checkGolden(engine.sql(
      "SELECT year, region, AGGREGATE(revenue) AT (VISIBLE) AS visible_rev FROM sales_v WHERE region = 'US'"),
      """2022	US	100
        |2023	US	150""".stripMargin)
  }

  // measures.test:1439-1444
  test("chained AT (ALL year) AT (ALL region) = grand total") {
    checkGolden(engine.sql(
      "SELECT year, AGGREGATE(revenue) AT (ALL year) AT (ALL region) AS grand_total FROM sales_v"),
      """2022	375
        |2023	375""".stripMargin)
  }

  // measures.test:1450-1462
  test("percent of total") {
    checkGolden(engine.sql(
      """SELECT year, region, AGGREGATE(revenue) as revenue,
        |  100.0 * AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL) AS pct_of_total
        |FROM sales_v""".stripMargin),
      """2022	EU	50	13.333333
        |2022	US	100	26.666667
        |2023	EU	75	20
        |2023	US	150	40""".stripMargin)
  }

  // measures.test:828-838 (combined modifiers in one AT clause)
  test("AT (ALL region WHERE year = 2023)") {
    checkGolden(engine.sql(
      """SELECT region, ROUND(100.0 * AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL region WHERE year = 2023), 1) AS pct_of_total
        |FROM sales_v WHERE year = 2023 GROUP BY region ORDER BY region""".stripMargin),
      """EU	33.3
        |US	66.7""".stripMargin)
  }

  // measures.test:839-849
  test("AT (ALL region SET year = 2023)") {
    checkGolden(engine.sql(
      """SELECT region, ROUND(100.0 * AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL region SET year = 2023), 1) AS pct_of_total
        |FROM sales_v WHERE year = 2023 GROUP BY region ORDER BY region""".stripMargin),
      """EU	33.3
        |US	66.7""".stripMargin)
  }

  // measures.test:850-858
  test("AT (ALL year) AT (SET year = 2023)") {
    checkGolden(engine.sql(
      """SELECT region, AGGREGATE(revenue) AT (ALL year) AT (SET year = 2023) AS region_total
        |FROM sales_v WHERE year = 2023 GROUP BY region ORDER BY region""".stripMargin),
      """EU	75
        |US	150""".stripMargin)
  }

  // measures.test:859-866
  test("AT (ALL region VISIBLE)") {
    checkGolden(engine.sql(
      """SELECT region, ROUND(100.0 * AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL region VISIBLE), 1) AS pct_of_total
        |FROM sales_v WHERE year = 2023 GROUP BY region ORDER BY region""".stripMargin),
      """EU	33.3
        |US	66.7""".stripMargin)
  }

  // measures.test:1465-1477 (YoY arithmetic)
  test("YoY change arithmetic") {
    checkGolden(engine.sql(
      """SELECT year, AGGREGATE(revenue) as revenue,
        |  AGGREGATE(revenue) - AGGREGATE(revenue) AT (SET year = year - 1) AS yoy_change
        |FROM sales_yearly""".stripMargin),
      """2022	150	NULL
        |2023	225	75""".stripMargin)
  }

  // curly brace sugar {m} (measures.rs:994-1018)
  test("curly brace sugar") {
    checkGolden(engine.sql("SELECT year, region, {revenue} FROM sales_v"),
      """2022	EU	50
        |2022	US	100
        |2023	EU	75
        |2023	US	150""".stripMargin)
  }

  // bare measure ref ignores outer WHERE (paper default context;
  // measures.test:3267-3283 Listing 8 'r' column)
  test("bare measure ref uses paper default context") {
    checkGolden(engine.sql("SELECT region, revenue FROM sales_v WHERE year = 2023"),
      """EU	125
        |US	250""".stripMargin)
    // while explicit AGGREGATE is visible:
    checkGolden(engine.sql("SELECT region, AGGREGATE(revenue) FROM sales_v WHERE year = 2023"),
      """EU	75
        |US	150""".stripMargin)
  }

  // m AT shorthand (measures.rs:834-951)
  test("measure AT shorthand without AGGREGATE") {
    checkGolden(engine.sql(
      "SELECT year, region, revenue AT (ALL region) AS year_total FROM sales_v"),
      """2022	EU	150
        |2022	US	150
        |2023	EU	225
        |2023	US	225""".stripMargin)
  }

  // measures.test:1960-2004 (derived measures)
  test("derived measures") {
    engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW financials AS
        |SELECT * FROM VALUES
        |  (2022, 100.0, 60.0), (2022, 150.0, 80.0),
        |  (2023, 200.0, 100.0), (2023, 250.0, 120.0)
        |AS t(year, revenue_amt, cost_amt)""".stripMargin)
    engine.sql(
      """CREATE VIEW financials_v AS
        |SELECT year,
        |  SUM(revenue_amt) AS MEASURE revenue,
        |  SUM(cost_amt) AS MEASURE cost,
        |  revenue - cost AS MEASURE profit
        |FROM financials""".stripMargin)
    checkGolden(engine.sql("SELECT year, AGGREGATE(revenue), AGGREGATE(cost) FROM financials_v"),
      """2022	250	140
        |2023	450	220""".stripMargin)
    checkGolden(engine.sql("SELECT year, AGGREGATE(profit) FROM financials_v"),
      """2022	110
        |2023	230""".stripMargin)
    checkGolden(engine.sql(
      "SELECT year, AGGREGATE(profit), AGGREGATE(profit) AT (ALL) AS total_profit FROM financials_v"),
      """2022	110	340
        |2023	230	340""".stripMargin)
  }

  // measures.test:2837-2868 (COUNT DISTINCT non-decomposable)
  test("COUNT(DISTINCT) measures") {
    engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW dup_regions AS
        |SELECT * FROM VALUES (2023, 'US', 100.0), (2023, 'US', 100.0), (2023, 'EU', 50.0)
        |AS t(year, region, amount)""".stripMargin)
    engine.sql(
      "CREATE VIEW distinct_count_v AS SELECT year, COUNT(DISTINCT region) AS MEASURE unique_regions FROM dup_regions")
    checkGolden(engine.sql("SELECT year, unique_regions FROM distinct_count_v"), "2023\t2")
    checkGolden(engine.sql("SELECT year, AGGREGATE(unique_regions) FROM distinct_count_v"), "2023\t2")
    checkGolden(engine.sql("SELECT year, AGGREGATE(unique_regions) AT (ALL) FROM distinct_count_v"), "2023\t2")
  }

  // measures.test:2873-2908 (MEDIAN)
  test("MEDIAN measures recompute from base rows") {
    engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW median_test AS
        |SELECT * FROM VALUES ('A', 10.0), ('A', 20.0), ('A', 30.0), ('B', 100.0), ('B', 100.0)
        |AS t(category, value)""".stripMargin)
    engine.sql("CREATE VIEW median_v AS SELECT category, MEDIAN(value) AS MEASURE med_value FROM median_test")
    checkGolden(engine.sql("SELECT category, med_value FROM median_v"),
      """A	20
        |B	100""".stripMargin)
    checkGolden(engine.sql("SELECT category, AGGREGATE(med_value) FROM median_v"),
      """A	20
        |B	100""".stripMargin)
    checkGolden(engine.sql("SELECT AGGREGATE(med_value) AT (ALL) FROM median_v"), "30")
  }

  // measures.test:2910-2957 (ordered-set aggregates)
  test("percentile/quantile/mode measures") {
    engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW ordered_set_test AS
        |SELECT * FROM VALUES
        |  ('A', 1), ('A', 1), ('A', 2), ('A', 3), ('A', 4),
        |  ('B', 10), ('B', 10), ('B', 20)
        |AS t(category, value)""".stripMargin)
    engine.sql(
      """CREATE VIEW ordered_set_v AS
        |SELECT category,
        |  PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value) AS MEASURE p50,
        |  QUANTILE_CONT(value, 0.5) AS MEASURE q50,
        |  MODE(value) AS MEASURE mode_value
        |FROM ordered_set_test""".stripMargin)
    checkGolden(engine.sql("SELECT category, AGGREGATE(p50) FROM ordered_set_v"),
      """A	2
        |B	10""".stripMargin)
    checkGolden(engine.sql("SELECT category, AGGREGATE(q50) FROM ordered_set_v"),
      """A	2
        |B	10""".stripMargin)
    checkGolden(engine.sql("SELECT category, AGGREGATE(mode_value) FROM ordered_set_v"),
      """A	1
        |B	10""".stripMargin)
  }

  // measures.test:2113-2143 (multi-fact joins)
  test("multi-fact join measures") {
    engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW fact_orders AS
        |SELECT * FROM VALUES (2022, 'US', 100.0), (2022, 'EU', 50.0), (2023, 'US', 150.0), (2023, 'EU', 75.0)
        |AS t(year, region, amount)""".stripMargin)
    engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW fact_returns AS
        |SELECT * FROM VALUES (2022, 'US', 10.0), (2022, 'EU', 5.0), (2023, 'US', 20.0), (2023, 'EU', 8.0)
        |AS t(year, region, return_amount)""".stripMargin)
    engine.sql("CREATE VIEW fact_orders_v AS SELECT year, region, SUM(amount) AS MEASURE revenue FROM fact_orders")
    engine.sql("CREATE VIEW fact_returns_v AS SELECT year, region, SUM(return_amount) AS MEASURE refunds FROM fact_returns")
    checkGolden(engine.sql(
      """SELECT o.year, o.region, AGGREGATE(revenue), AGGREGATE(refunds)
        |FROM fact_orders_v o JOIN fact_returns_v r ON o.year = r.year AND o.region = r.region""".stripMargin),
      """2022	EU	50	5
        |2022	US	100	10
        |2023	EU	75	8
        |2023	US	150	20""".stripMargin)
    checkGolden(engine.sql(
      """SELECT o.year, o.region, AGGREGATE(revenue), AGGREGATE(refunds), AGGREGATE(revenue) - AGGREGATE(refunds) AS net_revenue
        |FROM fact_orders_v o JOIN fact_returns_v r ON o.year = r.year AND o.region = r.region""".stripMargin),
      """2022	EU	50	5	45
        |2022	US	100	10	90
        |2023	EU	75	8	67
        |2023	US	150	20	130""".stripMargin)
    checkGolden(engine.sql(
      """SELECT o.year, o.region, AGGREGATE(revenue), AGGREGATE(revenue) AT (ALL region) AS year_total
        |FROM fact_orders_v o JOIN fact_returns_v r ON o.year = r.year AND o.region = r.region""".stripMargin),
      """2022	EU	50	150
        |2022	US	100	150
        |2023	EU	75	225
        |2023	US	150	225""".stripMargin)
  }

  // measures.test:3255-3293 (Listing 8: ROLLUP + visible/default contexts + HAVING)
  test("Listing 8: ROLLUP with visible, shorthand and bare refs") {
    engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW paper_orders AS
        |SELECT * FROM VALUES
        |  ('Happy', 'Var Bob', DATE '2024-01-01', 4),
        |  ('Happy', 'Alice', DATE '2024-01-02', 6),
        |  ('Happy', 'Alice', DATE '2024-01-03', 7),
        |  ('Whizz', 'Alice', DATE '2024-01-04', 3)
        |AS t(prodName, custName, orderDate, revenue)""".stripMargin)
    engine.sql("CREATE VIEW paper_orders_v AS SELECT *, SUM(revenue) AS MEASURE sumRevenue FROM paper_orders")
    checkGolden(engine.sql(
      """SELECT o.prodName, COUNT(*) AS c,
        |  AGGREGATE(o.sumRevenue) AS rAgg,
        |  o.sumRevenue AT (VISIBLE) AS rViz,
        |  o.sumRevenue AS r
        |FROM paper_orders_v o
        |WHERE o.custName <> 'Var Bob'
        |GROUP BY ROLLUP(o.prodName)""".stripMargin),
      """Happy	2	13	13	17
        |NULL	3	NULL	NULL	NULL
        |Whizz	1	3	3	3""".stripMargin)
    checkGolden(engine.sql(
      """SELECT o.prodName, AGGREGATE(o.sumRevenue) AT (VISIBLE) AS rViz
        |FROM paper_orders_v o
        |WHERE o.custName <> 'Var Bob'
        |GROUP BY o.prodName
        |HAVING AGGREGATE(o.sumRevenue) AT (VISIBLE) > 10""".stripMargin),
      "Happy\t13")
  }

  // measures.test:3351-3360 (Listing 12: measures in WHERE, row-level)
  test("Listing 12: measure call in WHERE filters rows") {
    engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW paper_orders_l12 AS
        |SELECT * FROM VALUES
        |  ('Happy', DATE '2024-01-01', 4), ('Happy', DATE '2024-01-02', 6),
        |  ('Happy', DATE '2024-01-03', 7), ('Whizz', DATE '2024-01-04', 3)
        |AS t(prodName, orderDate, revenue)""".stripMargin)
    engine.sql(
      """CREATE VIEW paper_orders_l12_v AS
        |SELECT prodName, orderDate, revenue, AVG(revenue) AS MEASURE avgRevenue
        |FROM paper_orders_l12""".stripMargin)
    checkGolden(engine.sql(
      """SELECT o.prodName, o.orderDate
        |FROM paper_orders_l12_v o
        |WHERE o.revenue > o.avgRevenue AT (WHERE prodName = o.prodName)
        |ORDER BY o.prodName, o.orderDate""".stripMargin),
      """Happy	2024-01-02
        |Happy	2024-01-03""".stripMargin)
    // AT (ALL): compare each row against the global average
    checkGolden(engine.sql(
      """SELECT o.prodName, o.orderDate
        |FROM paper_orders_l12_v o
        |WHERE o.revenue > o.avgRevenue AT (ALL)
        |ORDER BY o.prodName, o.orderDate""".stripMargin),
      """Happy	2024-01-02
        |Happy	2024-01-03""".stripMargin)
  }

  // measures.test:652-668 (CTE expansion)
  test("CTE with measure query body") {
    checkGolden(engine.sql(
      """WITH per_year AS (
        |  SELECT year, AGGREGATE(revenue) AS rev FROM sales_v
        |)
        |SELECT year, rev FROM per_year ORDER BY year""".stripMargin),
      """2022	150
        |2023	225""".stripMargin)
  }

  // DROP VIEW catalog sync (measures.rs:7655-7661)
  test("DROP VIEW syncs catalog") {
    engine.sql("CREATE VIEW tmp_drop_v AS SELECT year, SUM(amount) AS MEASURE tmp_rev FROM sales")
    assert(engine.catalog.contains("tmp_drop_v"))
    engine.sql("DROP VIEW tmp_drop_v")
    assert(!engine.catalog.contains("tmp_drop_v"))
  }

  // statement batches
  test("multi-statement batch") {
    val df = engine.sql(
      """CREATE OR REPLACE TEMPORARY VIEW batch_sales AS SELECT * FROM VALUES (1, 10.0) AS t(k, v);
        |CREATE VIEW batch_v AS SELECT k, SUM(v) AS MEASURE sv FROM batch_sales;
        |SELECT k, AGGREGATE(sv) FROM batch_v""".stripMargin)
    checkGolden(df, "1\t10")
  }
}
