package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup

/** Bisect the d_minhash r3->r4 regression (0.81 s -> ~1.6 s at sf0.1):
  * time the operator warm under the four combinations of the two join
  * settings the r4 bench added (20 MB autoBroadcastJoinThreshold,
  * preferSortMergeJoin=false).
  */
object ProbeMinhashR5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("probe-minhash-r5").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def run(): Double = {
      val t0 = System.nanoTime()
      Dedup.minhashNearDuplicates(docs, threshold = 0.7)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup (codegen/JIT)
    run(); run()
    for (bcast <- Seq(10L * 1024 * 1024, 20L * 1024 * 1024);
         smj <- Seq(true, false)) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast.toString)
      spark.conf.set("spark.sql.join.preferSortMergeJoin", smj.toString)
      val times = Seq.fill(3)(run())
      println(f"bcast=${bcast / 1024 / 1024}%dMB preferSMJ=$smj%-5s -> median ${times.sorted.apply(1)}%.2f s (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    println("PROBE-MINHASH-R5 OK")
    spark.stop()
  }
}
