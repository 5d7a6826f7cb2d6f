package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: how many times does the tokenizing regex `split` appear in
  * the OPTIMIZED generator expression of each LM training formulation?
  * (split-per-row count = corpus-pass CPU multiplier), plus timings of
  * the explode+groupBy stage alone for each.
  */
object ProbeLmPlan {
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

    def toks = split(lower(trim(col("text"))), "\\s+")
    def pairs(t: org.apache.spark.sql.Column) = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))

    // A: fused generator, split inline (shipped r13 shape)
    val fusedInline = docs.select(explode(concat(pairs(toks),
      array(struct(try_element_at(toks, lit(-1)).as("w1"),
        lit(null).cast("string").as("w2"))))).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    // B: token array pre-projected under the Generate
    val fusedPre = docs.select(toks.as("__t"))
      .select(explode(concat(pairs(col("__t")),
        array(struct(try_element_at(col("__t"), lit(-1)).as("w1"),
          lit(null).cast("string").as("w2"))))).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    // C: composed bigram-only explode (the trainBigramLm shape)
    val bigramOnly = docs.select(explode(pairs(toks)).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))

    for ((name, df) <- Seq("fusedInline" -> fusedInline,
        "fusedPre" -> fusedPre, "bigramOnly" -> bigramOnly)) {
      val plan = df.queryExecution.optimizedPlan.toString
      val nSplit = "split\\(".r.findAllIn(plan).length
      println(s"PLAN $name: split() appears $nSplit times")
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"PLAN $name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    println("distinct pairs: " + fusedInline.count())
    spark.stop()
  }
}
