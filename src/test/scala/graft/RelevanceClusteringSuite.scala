package graft

import org.apache.spark.sql.functions._

import graft.ops.{Clustering, Relevance}

/** Behavior gates for the relevance (BM25/TF-IDF) and clustering (k-means)
  * operators: ranking sanity, per-doc rank structure, and the determinism
  * property the integer-quantized k-means is built around.
  */
class RelevanceClusteringSuite extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("bm25: top-k ranked descending, every hit matches a query term") {
    val terms = Seq("join", "vector", "dup")
    val top = Relevance.bm25(docs, terms, topK = 15).collect()
    assert(top.length == 15)
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "not descending")
    assert(scores.forall(_ > 0))
    val ids = top.map(_.getLong(0)).toSet
    val withTerm = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect()
    withTerm.foreach { r =>
      assert(terms.exists(t => r.getString(1).contains(t)), s"doc ${r.getLong(0)} has no query term")
    }
  }

  test("bm25: a rare term outscores a common one at equal tf") {
    // idf('dup') >> idf('join') on this corpus (df 25 vs 394 at sf0.01)
    val d = Seq((1L, "dup alpha"), (2L, "join alpha")) ++
      (3L to 30L).map(i => (i, if (i % 2 == 0) "join beta" else "gamma"))
    val df = d.toDF("doc_id", "text")
    val top = Relevance.bm25(df, Seq("dup", "join"), topK = 5).collect()
    assert(top.head.getLong(0) == 1L, "the doc with the rarer term must rank first")
  }

  test("tfidf: ranks are 1..perDoc, scores non-increasing within a doc") {
    val r = Relevance.tfidfTopTerms(docs, perDoc = 3, minDf = 2)
    val byDoc = r.collect().map(x => (x.getLong(0), x.getInt(1), x.getDouble(3)))
      .groupBy(_._1)
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      val s = sorted.map(_._3)
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
  }

  test("kmeans: assignment is partition-order invariant and total") {
    val a1 = Clustering.kmeans(emb, k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Clustering.kmeans(emb.repartition(13), k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2, "clustering must not depend on partitioning")
    assert(a1.size == emb.count())
    assert(a1.values.forall(c => c >= 0 && c < 8))
    assert(a1.values.toSet.size > 1, "degenerate single-cluster result")
  }

  test("kmeans: Lloyd iterations do not increase total inertia") {
    def total(iters: Int): Double =
      Clustering.inertia(emb, k = 8, iters = iters)
        .agg(sum("inertia")).as[Double].collect().head
    val i0 = total(0)
    val i2 = total(2)
    assert(i2 <= i0, s"inertia rose: $i0 -> $i2")
  }
}
