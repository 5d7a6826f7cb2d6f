package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round-10 verdict task 3): e_range A/B at 100x.
  *
  * Variants over the same inputs as the e_range entry (points = even
  * events, intervals = odd events + 10 min, keyed by user):
  *   v0_smj   — the r9 shape: bin-bucketed equi-join, Spark's default
  *              sort-merge join
  *   v1_shj   — bin-bucketed equi-join with a shuffle_hash hint on the
  *              exploded interval side (skips both sort phases)
  *   v2_gate  — the shipped code path (RangeJoin.pointInInterval with the
  *              default small-side gate): measures the bounded
  *              limit+count probe overhead on a corpus where the gate
  *              correctly stays OFF
  * Each timed twice (JIT warm) with the entry's aggregate + orderBy on
  * top, noop sink — the same work the bench cell does.
  */
object ProbeRange {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf100")
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

    def eventsWithTus(): DataFrame = {
      val e = spark.table("events")
      val tus = e.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => expr("unix_micros(cast(ts as timestamp))")
      }
      e.withColumn("tus", tus)
    }
    def pts(): DataFrame = eventsWithTus().filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("event_id"), col("tus"))
    def ivs(): DataFrame = eventsWithTus().filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("event_id").as("iv_id"), col("tus").as("lo"),
        (col("tus") + lit(600000000L)).as("hi"))
    val W = 600000000L

    def binJoin(hinted: Boolean): DataFrame = {
      val p = pts().withColumn("__bin", floor(col("tus") / W))
      val i0 = ivs().withColumn("__bin",
        explode(sequence(floor(col("lo") / W), floor(col("hi") / W))))
      val i = if (hinted) i0.hint("shuffle_hash") else i0
      p.join(i, Seq("user_id", "__bin"))
        .filter(col("tus") >= col("lo") && col("tus") <= col("hi"))
        .drop("__bin")
    }
    def aggTop(j: DataFrame): DataFrame = j.groupBy("iv_id")
      .agg(count(lit(1)).as("n_pts"),
        min("event_id").as("first_event"), max("event_id").as("last_event"))
      .orderBy("iv_id")

    // small-side micro-case: the same 5M points against a 50k-interval
    // side (under the gate) — broadcast fast path vs forced bin path
    def ivsSmall(): DataFrame = ivs().filter(col("iv_id") < 100000)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "v0_smj" -> (() => aggTop(binJoin(hinted = false))),
      "v1_shj" -> (() => aggTop(binJoin(hinted = true))),
      // smallIntervalRows passed EXPLICITLY: the shipped default is 0
      // (gate opt-in), so without it v2 runs no probe and v3 takes the
      // bin path — the probe would no longer reproduce the PERF.md §0j
      // rows it documents (r10 ADVICE)
      "v2_gate" -> (() => aggTop(graft.ops.RangeJoin.pointInInterval(
        pts(), ivs(), "tus", "lo", "hi", binWidth = W, keys = Seq("user_id"),
        smallIntervalRows = 1000000L))),
      "v3_small_bcast" -> (() => aggTop(graft.ops.RangeJoin.pointInInterval(
        pts(), ivsSmall(), "tus", "lo", "hi", binWidth = W, keys = Seq("user_id"),
        smallIntervalRows = 1000000L))),
      "v4_small_bins" -> (() => aggTop(graft.ops.RangeJoin.pointInInterval(
        pts(), ivsSmall(), "tus", "lo", "hi", binWidth = W, keys = Seq("user_id"),
        smallIntervalRows = 0))))

    for ((name, mk) <- variants; run <- 1 to 2) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      println(f"RANGE $name run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
