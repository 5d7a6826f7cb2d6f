package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Bin-bucketed range join: exact matches, no duplicate pairs, and the plan
  * contract that makes it scale — an equi-join, never a nested-loop/cross
  * product.
  */
class RangeJoinSuite extends SparkSpec {
  import spark.implicits._

  test("containment is exact and inclusive; no duplicate pairs") {
    val pts = Seq(("a", 0L, 1L), ("a", 10L, 2L), ("a", 15L, 3L), ("a", 29L, 4L),
      ("b", 10L, 5L)).toDF("k", "x", "pid")
    val ivs = Seq(("a", 10L, 20L, 11L), ("a", 0L, 35L, 12L), ("b", 11L, 12L, 13L))
      .toDF("k", "lo", "hi", "iid")
    // binWidth smaller than spans: intervals explode to several bins, the
    // no-duplicates property must still hold. Checked on BOTH paths: the
    // bin-bucketed one (gate disabled) and the small-side broadcast one
    // (default gate, which fires at this size).
    for (gate <- Seq(0L, 100000L)) {
      val out = RangeJoin.pointInInterval(pts, ivs, "x", "lo", "hi", binWidth = 4,
          keys = Seq("k"), smallIntervalRows = gate)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(out.sorted == Seq((1L, 12L), (2L, 11L), (2L, 12L), (3L, 11L), (3L, 12L), (4L, 12L)),
        s"gate=$gate: " + out.sorted.mkString(", "))
    }
  }

  test("randomized against brute force, multiple bin widths") {
    val rnd = new scala.util.Random(20260815L)
    val pts = (0 until 300).map(i => ("k" + rnd.nextInt(4), rnd.nextInt(200).toLong, i.toLong))
    val ivs = (0 until 150).map { i =>
      val lo = rnd.nextInt(200).toLong
      ("k" + rnd.nextInt(4), lo, lo + rnd.nextInt(30), (1000 + i).toLong)
    }
    val want = (for {
      (pk, x, pid) <- pts
      (ik, lo, hi, iid) <- ivs
      if pk == ik && x >= lo && x <= hi
    } yield (pid, iid)).toSet
    for (w <- Seq(1L, 7L, 64L); gate <- Seq(0L, 100000L)) {
      val got = RangeJoin.pointInInterval(
          pts.toDF("k", "x", "pid"), ivs.toDF("k", "lo", "hi", "iid"),
          "x", "lo", "hi", binWidth = w, keys = Seq("k"), smallIntervalRows = gate)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"binWidth=$w gate=$gate diverged: ${(want -- got).take(3)} / ${(got -- want).take(3)}")
    }
  }

  test("plan contract: equi-join, never a nested-loop or cartesian product") {
    val pts = Seq(("a", 1L, 1L)).toDF("k", "x", "pid")
    val ivs = Seq(("a", 0L, 5L, 2L)).toDF("k", "lo", "hi", "iid")
    // gate disabled: the scale path must be the bin-bucketed equi-join
    val plan = RangeJoin.pointInInterval(pts, ivs, "x", "lo", "hi", 10L, Seq("k"),
        smallIntervalRows = 0L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("Join"), s"expected a join operator:\n$plan")
  }

  test("small-side gate: broadcast hash join on the keys, no bin explode") {
    val pts = Seq(("a", 1L, 1L)).toDF("k", "x", "pid")
    val ivs = Seq(("a", 0L, 5L, 2L)).toDF("k", "lo", "hi", "iid")
    // gate is OPT-IN (the A/B measured its probe at 0.1-0.6 s/call with no
    // win on the bench shape): armed explicitly here
    val plan = RangeJoin.pointInInterval(pts, ivs, "x", "lo", "hi", 10L, Seq("k"),
        smallIntervalRows = 100000L)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"small interval side should broadcast:\n$plan")
    assert(!plan.contains("__bin"), s"small path must skip the bin explode:\n$plan")
  }
}
