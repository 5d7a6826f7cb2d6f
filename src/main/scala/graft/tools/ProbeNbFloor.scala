package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: t_nb_score at the BENCH sf0.1 session config (r13).
  *
  * The r13 broadcast-probe scorer won at 100x (ProbeNb: 4.91 -> 2.50 s)
  * but the sf0.1 bench cell moved 1.01 -> 1.66 s: at toy scale the win is
  * eaten by per-run driver-synchronous JOB floors the auto path added
  * (wide model count, eager prior collect, wide model collect) — each a
  * scheduling round that the composed single-action plan never paid.
  * This probe replicates the bench session exactly (local[32], AQE off,
  * shuffle 32, 20 MB broadcast threshold, orderBy included, median-of-3)
  * and A/Bs composed vs auto so the fix (fold prior into the scoring job,
  * 1-partition cached model) has committed before/after evidence at the
  * scale the driver actually measures.
  */
object ProbeNbFloor {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.engineFor(spark, dir)

    val docs = spark.table("documents")
    def model(): DataFrame =
      graft.ops.Classifier.trainNaiveBayes(docs, col("lang") === "en", minCount = 2)

    val variants = Seq[(String, () => DataFrame)](
      "A_composed" -> (() => graft.ops.Classifier
        .scoreNaiveBayes(docs, model(), col("lang") === "en").orderBy("doc_id")),
      "B_probe_auto" -> (() => graft.ops.Classifier
        .scoreNaiveBayesAuto(docs, model(), col("lang") === "en").orderBy("doc_id")))
    // interleaved, median-of-3 after a shared warmup round
    for ((name, mk) <- variants)
      mk().write.format("noop").mode("overwrite").save() // warm JIT/codegen
    for ((name, mk) <- variants) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"NBFLOOR $name median ${ts.sorted.apply(1)}%.3f s  (runs ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
