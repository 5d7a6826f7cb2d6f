package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Dump the two-level k-means INNER assignment plan, fused vs joined —
  * the per-Lloyd-round shape that kmeansTwoLevel's eager localCheckpoints
  * hide from the entry-level plan dump (plans/r14 evidence).
  */
object DumpKm2lInner {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r14")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def dump(budget: String, tag: String): Unit = {
      spark.conf.set("graft.kmeans.innerBroadcastMaxRows", budget)
      try {
        val df = graft.ops.Clustering.kmeansTwoLevelInnerPlanProbe(
          emb, kSuper = 2, kInner = 4)
        Files.writeString(Paths.get(s"$outDir/c_kmeans2l_inner_$tag.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(s"[plans] c_kmeans2l_inner_$tag written")
      } finally spark.conf.unset("graft.kmeans.innerBroadcastMaxRows")
    }
    dump("1000000", "fused")
    dump("0", "joined")
    spark.stop()
  }
}
