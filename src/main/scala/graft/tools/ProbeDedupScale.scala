package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale demo: the full dedup pipeline (minhash candidates -> exact n-gram
  * pairs -> connected components -> keeper selection) end-to-end on a 10x
  * replicated corpus (50k docs: each sf0.1 document in 10 lightly-mutated
  * copies, so the true clustering is 5k near-dup families of 10). Publishes
  * wall-times, CC round count, and the plan-size bound that makes the
  * iteration safe at 100 TB (localCheckpoint leaf, O(1) in rounds).
  *
  * Usage: runMain graft.tools.ProbeDedupScale [srcDir] [copies]
  */
object ProbeDedupScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .appName("dedup-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    val n0 = docs0.count()
    val idOff = docs0.agg(max("doc_id")).head().getLong(0) + 1
    // shifted ids + a per-copy suffix token: copies are near (not exact)
    // duplicates, jaccard ~ (n-1)/(n+1) >> 0.7
    val docs = (0 until copies).map { i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i * idOff))
        .withColumn("text", concat(col("text"), lit(s" copytag$i")))
    }.reduce(_ union _).repartition(32).persist()
    val n = docs.count()
    println(s"corpus: $n docs ($copies x $n0)")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val mh = timed("minhash candidate pairs") {
      val p = Dedup.minhashNearDuplicates(docs, threshold = 0.7).persist()
      println(s"  pairs=${p.count()}")
      p
    }
    val ng = timed("exact n-gram jaccard pairs") {
      val p = Dedup.ngramJaccardPairs(docs, threshold = 0.7).persist()
      println(s"  pairs=${p.count()}")
      p
    }
    val allPairs = mh.select("doc_id_a", "doc_id_b")
      .union(ng.select("doc_id_a", "doc_id_b")).dropDuplicates()
    val cc = timed("connected components") {
      val c = Dedup.connectedComponents(allPairs)
      val clusters = c.groupBy("component").count()
      println(s"  nodes=${c.count()} clusters=${clusters.count()} " +
        s"largest=${clusters.agg(max("count")).head().getLong(0)} rounds=${Dedup.lastCcRounds}")
      c
    }
    // the 100 TB safety property: the returned labels are a checkpoint leaf,
    // plan size O(1) in iteration count
    val planNodes = cc.queryExecution.logical.collect { case p => p }.size
    println(s"cc plan nodes=$planNodes (bounded, localCheckpoint leaf)")
    assert(planNodes <= 3, s"lineage not truncated: $planNodes")

    val kept = timed("dedupByPairs keeper selection") {
      val k = Dedup.dedupByPairs(docs, allPairs)
      println(s"  kept=${k.count()} of $n")
      k
    }
    println("PROBE-DEDUP-SCALE OK")
    spark.stop()
  }
}
