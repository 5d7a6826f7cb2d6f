package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B the t_nb_score scoring path at scale (r13).
  *
  * The composed Classifier.scoreNaiveBayes explodes the corpus, broadcast-
  * joins the token stream against the model, re-groups by doc, and joins
  * the sums back to the doc list — a corpus Generate plus two doc-keyed
  * exchanges for per-document-local integer sums. Variants:
  *   A: composed (current library scoreNaiveBayes)
  *   B: probe_auto (scoreNaiveBayesAuto — broadcast NbProbe, one-pass
  *      projection, zero scoring-side exchanges)
  * Training (trainNaiveBayes) is INSIDE the clock for both variants, like
  * the entry itself. Each variant runs twice (JIT warm); both print.
  */
object ProbeNb {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.engineFor(spark, dir)

    val docs = spark.table("documents")
    def model(): DataFrame =
      graft.ops.Classifier.trainNaiveBayes(docs, col("lang") === "en", minCount = 2)

    val variants = Seq[(String, () => DataFrame)](
      "A_composed" -> (() => graft.ops.Classifier
        .scoreNaiveBayes(docs, model(), col("lang") === "en")),
      "B_probe_auto" -> (() => graft.ops.Classifier
        .scoreNaiveBayesAuto(docs, model(), col("lang") === "en")))
    for ((name, mk) <- variants) {
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        println(f"NB $name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    println(s"NB model rows: ${model().count()}")
    spark.stop()
  }
}
