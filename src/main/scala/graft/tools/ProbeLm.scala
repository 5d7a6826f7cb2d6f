package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B the t_lm_score model-join strategy at scale.
  *
  * The bigram-model join in LangModel.scoreBigramLm carries a
  * `shuffle_hash` hint (a bigram model can exceed broadcast size at real
  * scale, and a derived-aggregate frame has no reliable stats for the
  * static planner). Question: with AQE on — the 100x bench config — does
  * dropping the hint let AQE broadcast the runtime-small model and skip
  * the exploded-corpus shuffle read, and is that faster than the hinted
  * plan? Variants:
  *   A: hinted shuffle_hash (current library behavior)
  *   B: no hint (static planner + AQE runtime re-plan decide)
  *   C: explicit broadcast(model) (upper bound; NOT scale-safe)
  * Each variant runs twice (JIT warm); both timings print.
  */
object ProbeLm {

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
    val uni = graft.ops.LangModel.unigramCounts(docs, minCount = 2)
    val model = graft.ops.LangModel.trainBigramLm(docs, uni, minCount = 2)

    // inlined scoreBigramLm with the model-join strategy as a parameter;
    // arithmetic identical to the library (this is a measurement harness,
    // the library stays the single source of truth for entries)
    def score(modelSide: DataFrame): DataFrame = {
      val toks = split(lower(trim(col("text"))), "\\s+")
      val pairs = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      val v = uni.agg(count(lit(1)).as("v"))
      val perPair = docs
        .select(col("doc_id").as("__id"), explode(pairs).as("bg"))
        .select(col("__id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .join(modelSide, Seq("w1", "w2"), "left")
        .join(broadcast(uni.select(col("token").as("w1"), col("c_uni"))),
          Seq("w1"), "left")
        .crossJoin(broadcast(v))
        .select(col("__id"),
          when(col("w_micro").isNotNull, -col("w_micro"))
            .when(col("c_uni").isNotNull,
              round(log(col("c_uni") + col("v")) * lit(1e6)).cast("bigint"))
            .otherwise(round(log(col("v")) * lit(1e6)).cast("bigint"))
            .as("nll"))
        .groupBy("__id")
        .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_micro"))
      docs.select(col("doc_id").as("__id"))
        .join(perPair, Seq("__id"), "left")
        .select(col("__id").as("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
          when(col("n_bigrams") > 0L,
            expr("nll_micro div n_bigrams")).as("avg_nll_micro"))
    }

    val slim = model.select(col("w1"), col("w2"), col("w_micro"))
    // thunks, not frames: scoreBigramLmAuto runs eager driver actions
    // (model count + probe collects) at CONSTRUCTION — timing must cover
    // frame construction plus execution for every variant equally
    val variants = Seq[(String, () => DataFrame)](
      "A_shuffle_hash" -> (() => score(slim.hint("shuffle_hash"))),
      "B_no_hint" -> (() => score(slim)),
      "C_broadcast" -> (() => score(broadcast(slim))),
      // r13: the zero-exchange probe path (BigramNllExpr) — one corpus
      // projection, model folded into a broadcast map, no explode/join/
      // regroup. Auto keeps the join fallback for over-budget models.
      "D_probe_auto" -> (() => graft.ops.LangModel
        .scoreBigramLmAuto(docs, model, uni)),
      // r13: one corpus explode + one pair-keyed shuffle for training,
      // broadcast-probe scoring — the t_lm_score entry's shipped path
      "E_fused" -> (() => graft.ops.LangModel.scoreBigramLmFused(docs)))
    for ((name, mk) <- variants) {
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        println(f"LM $name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // model cardinality/size context for the scale judgment
    val n = model.count()
    println(s"LM model rows: $n")
    spark.stop()
  }
}
