package graft

import org.apache.spark.sql.DataFrame

import graft.plans.EagerAggregation

/** Equivalence + plan-shape gates for the eager-aggregation rule: with the
  * size gate forced open, every eligible shape must return EXACTLY the
  * rows the un-rewritten plan returns, the pre-aggregate must appear below
  * the join, and ineligible shapes must be left alone.
  */
class EagerAggSuite extends SparkSpec {

  private lazy val engine = SparkEntry.engineFor(spark, "/root/testdata/sf0.001")

  private def withGate[A](bytes: Long)(f: => A): A = {
    spark.conf.set(EagerAggregation.confKey, bytes.toString)
    try f finally spark.conf.unset(EagerAggregation.confKey)
  }

  // doubles canonicalized to 9 significant digits: regrouped aggregation
  // legally changes float summation order by a few ulps (Spark's own
  // partial aggregates do the same), and the driver's oracle compare
  // applies the identical rounding
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
      s"eager aggregation changed the result of:\n$sql\nmissing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("single-join SUM and COUNT push: identical results, pre-agg below join") {
    val sql =
      """SELECT o.o_orderpriority, SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev,
        |       COUNT(*) AS n
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin
    assertEquivalent(sql)
    val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
    assert(plan.contains("__graft_partial"), s"rule did not fire:\n$plan")
    // a partial-producing Aggregate must sit BELOW the join (the outer
    // aggregate also mentions the partial attr, so search past the join)
    val joinIdx = plan.indexOf("Join Inner")
    assert(joinIdx >= 0 && plan.indexOf("Aggregate", joinIdx) >= 0,
      s"expected an Aggregate below the join:\n$plan")
    assert(plan.indexOf("__graft_partial", joinIdx) > 0,
      s"partial aggregate not below the join:\n$plan")
  }

  test("join-bearing sides are NOT pushed into (measured as pure overhead)") {
    val sql =
      """SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin
    assertEquivalent(sql)
    // with the lineitem side joined below the top join, the only candidate
    // targets contain joins — the leaf-only scope must decline them all
    val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
    assert(!plan.contains("__graft_partial"),
      s"rule pushed into a join-bearing subtree:\n$plan")
  }

  test("fan-out multiplicity is preserved (1:N and genuine M:N join keys)") {
    // 1:N — orders unique per key, lineitem ~4 rows per key
    assertEquivalent(
      """SELECT o.o_orderstatus, SUM(l.l_quantity) AS q, COUNT(l.l_partkey) AS np, COUNT(*) AS n
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderstatus""".stripMargin)
    // M:N — l_suppkey repeats in lineitem AND o_custkey repeats in orders,
    // so the outer re-aggregate must scale each partial by a fan-out > 1
    val mn =
      """SELECT o.o_orderstatus, SUM(l.l_quantity) AS q, COUNT(*) AS n
        |FROM lineitem l JOIN orders o ON l.l_suppkey = o.o_custkey
        |WHERE l.l_suppkey < 40
        |GROUP BY o.o_orderstatus""".stripMargin
    assertEquivalent(mn)
    val plan = withGate(0L)(run(mn).queryExecution.optimizedPlan.toString())
    assert(plan.contains("__graft_partial"), s"M:N shape did not fire:\n$plan")
  }

  test("AVG over doubles pushes as SUM+COUNT partials: identical results") {
    val sql =
      """SELECT o.o_orderpriority, AVG(l.l_quantity) AS aq,
        |       AVG(l.l_extendedprice) AS ap, SUM(l.l_quantity) AS q
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin
    assertEquivalent(sql)
    val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
    assert(plan.contains("__graft_partial"), s"AVG push did not fire:\n$plan")
  }

  test("ineligible shapes are untouched: integral AVG, DISTINCT, COUNT(*)-into-null-side, global agg") {
    for (sql <- Seq(
      // AVG over an integral column is NOT pushed: Average accumulates a
      // double sum, an exact long partial would differ by ULPs
      """SELECT o.o_orderpriority, AVG(l.l_linenumber) AS aq
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin,
      // DISTINCT blocks the push
      """SELECT o.o_orderpriority, COUNT(DISTINCT l.l_partkey) AS dp
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin,
      // COUNT(*) counts preserved rows of the LEFT join — pushing the
      // null-supplying side would undercount them
      """SELECT o.o_orderpriority, COUNT(*) AS n
        |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin,
      // a COALESCE input produces a value from a null-extended row —
      // the NULL partial would silently drop it
      """SELECT o.o_orderpriority, SUM(COALESCE(l.l_quantity, 5)) AS q
        |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin,
      // global aggregate (no GROUP BY) keeps empty-input COUNT semantics
      """SELECT SUM(l.l_quantity) AS q, COUNT(*) AS n
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey < 0""".stripMargin)) {
      val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
      assert(!plan.contains("__graft_partial"), s"rule fired on ineligible shape:\n$sql\n$plan")
      assertEquivalent(sql)
    }
  }

  test("LEFT join: null-supplying side pushes when inputs are null-intolerant") {
    // lineitem is the null-supplying side; SUM/COUNT over its columns skip
    // unmatched orders exactly as the null-extended inputs did
    val sql =
      """SELECT o.o_orderpriority, SUM(l.l_quantity * 2 + l.l_linenumber) AS q,
        |       COUNT(l.l_partkey) AS np
        |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin
    assertEquivalent(sql)
    val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
    assert(plan.contains("__graft_partial"), s"null-supplying push did not fire:\n$plan")
  }

  test("LEFT join: preserved side pushes with COUNT(*) (unmatched keys collapse safely)") {
    // orders is preserved; grouping keys come from the null-supplying side,
    // so unmatched orders land in the all-NULL group either way
    val sql =
      """SELECT l.l_linestatus, SUM(o.o_totalprice) AS tp, COUNT(*) AS n
        |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY l.l_linestatus""".stripMargin
    assertEquivalent(sql)
    val plan = withGate(0L)(run(sql).queryExecution.optimizedPlan.toString())
    assert(plan.contains("__graft_partial"), s"preserved-side push did not fire:\n$plan")
  }

  test("RIGHT join mirrors the LEFT-join gates") {
    assertEquivalent(
      """SELECT o.o_orderpriority, SUM(l.l_quantity) AS q
        |FROM lineitem l RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin)
    assertEquivalent(
      """SELECT l.l_linestatus, SUM(o.o_totalprice) AS tp, COUNT(*) AS n
        |FROM lineitem l RIGHT JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY l.l_linestatus""".stripMargin)
  }

  test("measure engine results are unchanged with the gate forced open") {
    for (q <- Seq("m_multifact", "q_join_agg", "m_agg_twodim")) {
      val fn = SparkEntry.queries(q)
      val expected = withGate(Long.MaxValue)(rowSet(fn(spark, "/root/testdata/sf0.001")))
      val got = withGate(0L)(rowSet(fn(spark, "/root/testdata/sf0.001")))
      assert(got == expected, s"$q changed under eager aggregation")
    }
  }

  // randomized equivalence property: the rule must be invisible to results
  // on ANY inner equi-join tree x SUM/COUNT/AVG/MIN/MAX mix, not just the
  // shapes somebody measured. Seeded, so a failure replays exactly.
  test("randomized equivalence over 120 random join trees (rule on vs off)") {
    import scala.util.Random
    import spark.implicits._
    val rnd = new Random(20260813L)
    val names = (0 until 4).map { i =>
      val n = 50 + rnd.nextInt(300)
      // small key ranges force heavy duplication: 1:N and M:N fan-outs,
      // plus keys with zero matches (ranges only partially overlap)
      val kRange = 2 + rnd.nextInt(40)
      val df = (0 until n).map { _ =>
        (rnd.nextInt(kRange), rnd.nextInt(kRange) + kRange / 4,
          rnd.nextInt(2000) / 10.0, rnd.nextInt(100).toLong, rnd.nextInt(5))
      }.toDF("k1", "k2", "v1", "v2", "g")
      val nm = s"ea_rand_t$i"
      df.createOrReplaceTempView(nm)
      nm
    }
    var fired = 0
    for (caseNo <- 0 until 120) {
      val nTables = 2 + rnd.nextInt(2)
      val ts = rnd.shuffle(names.toList).take(nTables)
      val aliases = ts.zipWithIndex.map { case (t, i) => s"$t a$i" }
      val joins = (1 until nTables).map { i =>
        val l = rnd.nextInt(i)
        val jt = rnd.nextInt(4) match {
          case 0 => "LEFT JOIN"
          case 1 => "RIGHT JOIN"
          case _ => "JOIN"
        }
        s"$jt ${aliases(i)} ON a$l.k${1 + rnd.nextInt(2)} = a$i.k${1 + rnd.nextInt(2)}"
      }
      val groupCol = s"a${rnd.nextInt(nTables)}.g"
      val aggs = (0 to rnd.nextInt(2)).map { j =>
        val at = rnd.nextInt(nTables)
        rnd.nextInt(7) match {
          case 0 => s"SUM(a$at.v1) AS c$j"
          case 1 => s"SUM(a$at.v1 * 2 + a$at.v2) AS c$j"
          case 2 => s"COUNT(a$at.v2) AS c$j"
          case 3 => s"COUNT(*) AS c$j"
          case 4 => s"AVG(a$at.v1) AS c$j"
          case 5 => s"SUM(COALESCE(a$at.v1, 7)) AS c$j" // null-intolerance gate
          case _ => s"${if (rnd.nextBoolean()) "MIN" else "MAX"}(a$at.v2) AS c$j"
        }
      }
      val sql = s"SELECT $groupCol AS gk, ${aggs.mkString(", ")} " +
        s"FROM ${aliases.head} ${joins.mkString(" ")} GROUP BY $groupCol"
      val off = withGate(Long.MaxValue)(rowSet(spark.sql(sql)))
      val (on, plan) = withGate(0L) {
        (rowSet(spark.sql(sql)), spark.sql(sql).queryExecution.optimizedPlan.toString())
      }
      if (plan.contains("__graft_partial")) fired += 1
      assert(on == off,
        s"case $caseNo diverged under eager aggregation:\n$sql\n" +
          s"missing=${(off -- on).take(3)} extra=${(on -- off).take(3)}")
    }
    info(s"rule fired on $fired/120 random cases")
    assert(fired >= 12, s"rule fired on only $fired/120 — generator drifted off the rule's surface")
  }
}
