package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: fine-grained stage cost of the fused LM pipeline at 100x. */
object ProbeLmStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def toksC = split(lower(trim(col("text"))), "\\s+")
    def pairsOf(t: org.apache.spark.sql.Column) = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    for (rep <- 1 to 2) {
      println(s"--- round $rep ---")
      val stream = docs.select(toksC.as("__t"))
        .select(explode(concat(pairsOf(col("__t")),
          array(struct(try_element_at(col("__t"), lit(-1)).as("w1"),
            lit(null).cast("string").as("w2"))))).as("pr"))
        .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      val pairCounts = stream.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      tm("pairCounts.count")(pairCounts.count())
      val unigrams = pairCounts.groupBy("w1").agg(sum("c").as("c_uni"))
        .filter(col("c_uni") >= 2)
        .select(col("w1").as("token"), col("c_uni"))
      val v = unigrams.agg(count(lit(1)).as("v"))
      val model = pairCounts.filter(col("w2").isNotNull)
        .filter(col("c") >= 2)
        .select(col("w1"), col("w2"), col("c").as("c_big"))
        .join(broadcast(unigrams.select(col("token").as("w1"), col("c_uni"))), Seq("w1"))
        .join(broadcast(unigrams.select(col("token").as("w2"))), Seq("w2"))
        .crossJoin(broadcast(v))
        .select(col("w1"), col("w2"), col("c_big"), col("c_uni"),
          round(log((col("c_big") + lit(1.0)) / (col("c_uni") + col("v"))) * lit(1e6))
            .cast("bigint").as("w_micro"))
      tm("model.count")(model.count())
      val scored = tm("broadcast collects + probe build") {
        graft.ops.LangModel.scoreBigramLmBroadcast(docs, model, unigrams)
      }
      tm("scoring write")(scored.write.format("noop").mode("overwrite").save())
      pairCounts.unpersist(false)
    }
    spark.stop()
  }
}
