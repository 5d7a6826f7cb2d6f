package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Compare embeddingNearDuplicates exact mode (planes=0) against an
  * independent brute-force crossJoin — diff any disagreeing pairs.
  */
object ProbeEmbed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val exact = a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("c", round(Similarity.cosine(col("va"), col("vb")), 6))
      .filter(col("c") >= 0.3)
      .select("ida", "idb", "c")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val got = Dedup.embeddingNearDuplicates(emb, minCosine = 0.3, planes = 0, maxBucket = 1000000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    println(s"exact=${exact.size} got=${got.size}")
    println("missing from got: " + (exact.keySet -- got.keySet).take(5).map(k => (k, exact(k))))
    println("extra in got: " + (got.keySet -- exact.keySet).take(5).map(k => (k, got(k))))
    val common = exact.keySet & got.keySet
    println("value diffs: " + common.filter(k => exact(k) != got(k)).take(5).map(k => (k, exact(k), got(k))))
    spark.stop()
  }
}
