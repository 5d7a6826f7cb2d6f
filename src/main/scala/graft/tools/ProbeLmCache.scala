package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: does the model plan actually scan the pairCounts cache? */
object ProbeLmCache {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def toksC = split(lower(trim(col("text"))), "\\s+")
    def pairsOf(t: org.apache.spark.sql.Column) = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val stream = docs.select(toksC.as("__t"))
      .select(explode(concat(pairsOf(col("__t")),
        array(struct(try_element_at(col("__t"), lit(-1)).as("w1"),
          lit(null).cast("string").as("w2"))))).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val pairCounts = stream.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pairCounts.count()
    val unigrams = pairCounts.groupBy("w1").agg(sum("c").as("c_uni"))
      .filter(col("c_uni") >= 2)
      .select(col("w1").as("token"), col("c_uni"))
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"T $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("pairCounts.count AGAIN")(pairCounts.count())
    t("unigrams.count")(unigrams.count())
    val plan = unigrams.queryExecution.executedPlan.toString
    println("unigrams plan has InMemory: " + plan.contains("InMemory"))
    println(unigrams.queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))
    spark.stop()
  }
}
