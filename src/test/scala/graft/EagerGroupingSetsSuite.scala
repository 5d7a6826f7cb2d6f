package graft

import org.apache.spark.sql.DataFrame

import graft.plans.EagerAggregation

/** Equivalence + plan-shape gates for eager aggregation below grouping-set
  * expansion: with the size gate forced open, every eligible CUBE/ROLLUP/
  * GROUPING SETS shape must return exactly the un-rewritten rows, the
  * pre-aggregate must sit below the Expand, and ineligible shapes must be
  * left alone.
  */
class EagerGroupingSetsSuite extends SparkSpec {

  private lazy val engine = SparkEntry.engineFor(spark, "/root/testdata/sf0.001")

  private def withGate[A](bytes: Long)(f: => A): A = {
    spark.conf.set(EagerAggregation.confKey, bytes.toString)
    try f finally spark.conf.unset(EagerAggregation.confKey)
  }

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map {
      case d: Double => f"$d%.8e"
      case f: Float => f"${f.toDouble}%.8e"
      case x => String.valueOf(x)
    }.mkString("[", ",", "]")).toSet

  private def run(sql: String): DataFrame = { engine; spark.sql(sql) }

  private def assertEquivalent(sql: String): Unit = {
    val expected = withGate(Long.MaxValue)(rowSet(run(sql)))
    val got = withGate(0L)(rowSet(run(sql)))
    assert(got == expected,
      s"eager grouping-sets changed the result of:\n$sql\nmissing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("CUBE pushes the aggregate below the Expand: identical results") {
    val sql =
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS q, COUNT(*) AS n,
        |       MIN(l_discount) AS mind, MAX(l_extendedprice) AS maxp
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin
    assertEquivalent(sql)
    val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
    assert(plan.contains("__graft_gpartial"), s"rule did not fire:\n$plan")
    val expandIdx = plan.indexOf("Expand")
    assert(expandIdx >= 0 && plan.indexOf("__graft_gpartial", expandIdx) > 0,
      s"pre-aggregate not below the Expand:\n$plan")
  }

  test("ROLLUP and GROUPING SETS with grouping() markers: identical results") {
    assertEquivalent(
      """SELECT l_returnflag, GROUPING(l_returnflag) AS g, SUM(l_quantity) AS q
        |FROM lineitem GROUP BY ROLLUP(l_returnflag)""".stripMargin)
    assertEquivalent(
      """SELECT l_returnflag, l_linestatus, COUNT(l_partkey) AS np
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
  }

  test("AVG over doubles pushes as SUM+COUNT; aggregate of a grouped column works") {
    assertEquivalent(
      """SELECT l_returnflag, l_linestatus, AVG(l_quantity) AS aq, SUM(l_tax) AS t
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)
    // SUM over a column that is ALSO a grouping column: the analyzer passes
    // an unmasked copy through the Expand, which the rule must use
    assertEquivalent(
      """SELECT l_linenumber, SUM(l_linenumber) AS s
        |FROM lineitem GROUP BY ROLLUP(l_linenumber)""".stripMargin)
  }

  test("ineligible shapes are untouched: DISTINCT agg, plain GROUP BY") {
    for (sql <- Seq(
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS dp
        |FROM lineitem GROUP BY CUBE(l_returnflag)""".stripMargin,
      """SELECT l_returnflag, SUM(l_quantity) AS q
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)) {
      val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
      assert(!plan.contains("__graft_gpartial"),
        s"rule fired on ineligible shape:\n$sql\n$plan")
      assertEquivalent(sql)
    }
  }

  test("measure-engine ROLLUP/CUBE/GROUPING SETS entries unchanged with gate open") {
    for (q <- Seq("m_rollup", "q_cube", "m_groupingsets")) {
      val fn = SparkEntry.queries(q)
      val expected = withGate(Long.MaxValue)(rowSet(fn(spark, "/root/testdata/sf0.001")))
      val got = withGate(0L)(rowSet(fn(spark, "/root/testdata/sf0.001")))
      assert(got == expected, s"$q changed under eager grouping-sets")
    }
  }

  test("randomized equivalence over 60 random grouping-set queries (rule on vs off)") {
    import scala.util.Random
    import spark.implicits._
    val rnd = new Random(20260814L)
    val n = 400
    val df = (0 until n).map { _ =>
      (rnd.nextInt(5), rnd.nextInt(7), rnd.nextInt(3),
        rnd.nextInt(2000) / 10.0, rnd.nextInt(100).toLong)
    }.toDF("a", "b", "c", "v1", "v2")
    df.createOrReplaceTempView("egs_rand")
    var fired = 0
    for (caseNo <- 0 until 60) {
      val dims = rnd.shuffle(List("a", "b", "c")).take(1 + rnd.nextInt(3))
      val shape = rnd.nextInt(3) match {
        case 0 => s"CUBE(${dims.mkString(", ")})"
        case 1 => s"ROLLUP(${dims.mkString(", ")})"
        case _ =>
          // first set = all dims so every selected dim participates
          val sets = dims.mkString(", ") +: (0 to rnd.nextInt(2)).map(_ =>
            rnd.shuffle(dims).take(rnd.nextInt(dims.size + 1)).mkString(", "))
          s"GROUPING SETS (${sets.map(s => s"($s)").mkString(", ")}, ())"
      }
      val aggs = (0 to rnd.nextInt(2)).map { j =>
        rnd.nextInt(7) match {
          case 0 => s"SUM(v1) AS c$j"
          case 1 => s"SUM(v1 * 2 + v2) AS c$j"
          case 2 => s"COUNT(v2) AS c$j"
          case 3 => s"COUNT(*) AS c$j"
          case 4 => s"AVG(v1) AS c$j"
          case 5 => s"MIN(v2) AS c$j"
          case _ => s"MAX(v1) AS c$j"
        }
      }
      val sql = s"SELECT ${dims.mkString(", ")}, GROUPING_ID() AS gid, " +
        s"${aggs.mkString(", ")} FROM egs_rand GROUP BY $shape"
      val off = withGate(Long.MaxValue)(rowSet(spark.sql(sql)))
      val (on, plan) = withGate(0L) {
        (rowSet(spark.sql(sql)), spark.sql(sql).queryExecution.optimizedPlan.toString())
      }
      if (plan.contains("__graft_gpartial")) fired += 1
      assert(on == off,
        s"case $caseNo diverged under eager grouping-sets:\n$sql\n" +
          s"missing=${(off -- on).take(3)} extra=${(on -- off).take(3)}")
    }
    info(s"rule fired on $fired/60 random cases")
    assert(fired >= 30, s"rule fired on only $fired/60 — generator drifted off the rule's surface")
  }

  test("composes with EagerAggregation: CUBE over an equi-join stays equivalent") {
    val sql =
      """SELECT o.o_orderpriority, l.l_returnflag, SUM(l.l_quantity) AS q, COUNT(*) AS n
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY CUBE(o.o_orderpriority, l.l_returnflag)""".stripMargin
    assertEquivalent(sql)
    val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
    info("fired: gpartial=" + plan.contains("__graft_gpartial") +
      " jpartial=" + plan.contains("__graft_partial"))
  }
}
