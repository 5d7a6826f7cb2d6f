package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Parameter-grid recall probe for the approximate kNN operators vs the
  * brute-force ground truth on the (uniformly random — ANN worst case)
  * testdata embeddings. Used to pick honest PipelineGatesSuite gates.
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val q = emb.filter(col("vec_id") < 20)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, q, k = 5))
    for (planes <- Seq(3, 4, 5); tables <- Seq(2, 4, 6, 8)) {
      val got = pairs(Similarity.lshTopK(emb, q, k = 5, planes = planes, tables = tables))
      println(f"LSH planes=$planes tables=$tables recall=${(got & truth).size.toDouble / truth.size}%.3f")
    }
    for (nProbe <- Seq(3, 4, 5, 6)) {
      val got = pairs(Similarity.ivfTopK(emb, q, k = 5, nCells = 8, nProbe = nProbe))
      println(f"IVF nCells=8 nProbe=$nProbe recall=${(got & truth).size.toDouble / truth.size}%.3f")
    }
    spark.stop()
  }
}
