package graft

import graft.ops.Bpe

class BpeSuite extends SparkSpec {
  import spark.implicits._

  test("mergeOnce: greedy left-to-right, non-overlapping") {
    assert(Bpe.mergeOnce(Seq("x", "x", "x", "x"), "x", "x") == Seq("xx", "xx"))
    assert(Bpe.mergeOnce(Seq("x", "x", "x"), "x", "x") == Seq("xx", "x"))
    assert(Bpe.mergeOnce(Seq("a", "x", "x", "b"), "x", "x") == Seq("a", "xx", "b"))
    assert(Bpe.mergeOnce(Seq("a", "b"), "x", "x") == Seq("a", "b"))
    assert(Bpe.mergeOnce(Seq("a"), "a", "a") == Seq("a"))
  }

  test("learnMerges: hand-built corpus replays classic BPE and stops when dry") {
    // words: aa (x2), ab (x1) -> merge1 (a,a,2); then ab -> merge2 (a,b,1);
    // then nothing left to merge even though nMerges = 5
    val docs = Seq("aa aa ab").toDF("text")
    val got = Bpe.learnMerges(docs, nMerges = 5)
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "a", 2L), (2L, "a", "b", 1L)))
  }

  test("learnMerges: deterministic tie-break and partition invariance") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) =
      Bpe.learnMerges(d.repartition(parts), nMerges = 4).orderBy("step")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(run(1) == run(7))
  }
}
