package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

/** As-of join semantics (DuckDB ASOF JOIN conventions) + the plan contract:
  * no join operator at all, one exchange on the key.
  */
class AsOfJoinSuite extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    // (key, ts, left payload)
    ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 20L, "b2"), ("u1", 5L, "c"),
    ("u2", 100L, "d"), ("u3", 7L, "e")
  ).toDF("k", "ts", "tag")

  private lazy val right = Seq(
    // (key, ts, id, value) — u1@20 is duplicated to exercise the tie-break
    ("u1", 10L, 1L, 1.5), ("u1", 20L, 2L, 2.5), ("u1", 20L, 3L, 3.5),
    ("u1", 30L, 4L, 4.5), ("u2", 101L, 5L, 5.5)
  ).toDF("k", "ts", "rid", "rval")

  test("asof semantics: >= match, equal-ts match, tie-break, null when none") {
    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", "rid", "rval")
      .orderBy("k", "ts", "tag")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq
    assert(out == Seq(
      ("u1", 5L, "c", None, None),                    // nothing at or before 5
      ("u1", 10L, "a", Some(1L), Some(1.5)),          // exact-ts match (>=)
      ("u1", 20L, "b", Some(3L), Some(3.5)),          // dup right ts -> max rid wins
      ("u1", 20L, "b2", Some(3L), Some(3.5)),         // dup left ts: same match
      ("u2", 100L, "d", None, None),                  // right is strictly later
      ("u3", 7L, "e", None, None)                     // key absent on the right
    ), out.mkString("\n"))
  }

  test("plan contract: no join operator, exactly one exchange on the key") {
    val plan = AsOfJoin.leftAsOf(left, right, "k", "ts", "rid", "rval")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning\\(k".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected ONE key exchange, got $exchanges:\n$plan")
  }

  test("randomized against a brute-force reference") {
    val rnd = new scala.util.Random(20260814L)
    val keys = (1 to 6).map(i => s"k$i")
    val l = (0 until 400).map(i =>
      (keys(rnd.nextInt(keys.size)), rnd.nextInt(50).toLong, i.toLong))
    val r = (0 until 300).map(i =>
      (keys(rnd.nextInt(keys.size)), rnd.nextInt(50).toLong, i.toLong, rnd.nextInt(100) / 4.0))
    val got = AsOfJoin.leftAsOf(
        l.toDF("k", "ts", "lid"), r.toDF("k", "ts", "rid", "rval"),
        "k", "ts", "rid", "rval")
      .collect().map(x => (x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Double]))).toSet
    // reference: collapse right dups by max rid, then linear scan per left row
    val rBest = r.groupBy(x => (x._1, x._2)).map { case (_, rows) => rows.maxBy(_._3) }.toSeq
    val want = l.map { case (k, ts, lid) =>
      val cands = rBest.filter(x => x._1 == k && x._2 <= ts)
      if (cands.isEmpty) (lid, None, None)
      else {
        val m = cands.maxBy(x => (x._2, x._3))
        (lid, Some(m._3), Some(m._4))
      }
    }.toSet
    assert(got == want, s"asof diverged from brute force: ${(want -- got).take(3)} / ${(got -- want).take(3)}")
  }
}
