package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, RangeJoin, Sessions}

/** A/B for the r11 verdict's e_range swing: a TIME-FAMILY bucketed events
  * layout — events written bucketed by user_id (sorted (user_id, tus)) — so
  * the bin join's two sides arrive pre-partitioned. HashPartitioning on a
  * SUBSET of the join keys satisfies ClusteredDistribution, so a
  * user_id-bucketed scan should elide BOTH (user_id, __bin) exchanges of
  * the range join (and, as a family bonus, the user_id exchanges of the
  * as-of union and the sessions window).
  *
  * Usage: runMain graft.tools.ProbeRangeLayout [sfDir] [rounds]
  */
object ProbeRangeLayout {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "128"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tus = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => expr("unix_micros(cast(ts as timestamp))")
    }
    val plain = raw.withColumn("tus", tus)
      .select("user_id", "event_id", "value", "tus")

    // one-time ingest (untimed, the deployment's write path): bucket count
    // sized like the fact tables (~8 MB/bucket, floor 32, cap 128)
    val evBytes = {
      val f = new java.io.File(s"$dir/events.parquet")
      if (f.isDirectory) f.listFiles().map(_.length()).sum else f.length()
    }
    val buckets = math.min(128L, math.max(32L, evBytes / (8L * 1024 * 1024))).toInt
    println(s"[range-layout] ingest: $buckets buckets")
    if (!spark.catalog.tableExists("events_tbkt"))
      plain.repartition(buckets, col("user_id"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "user_id").sortBy("user_id", "tus")
        .saveAsTable("events_tbkt")
    val bkt = spark.table("events_tbkt")

    def erange(e: DataFrame): DataFrame = {
      val pts = e.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), col("event_id"), col("tus"))
      val ivs = e.filter(col("event_id") % 2 === 1)
        .select(col("user_id"), col("event_id").as("iv_id"), col("tus").as("lo"),
          (col("tus") + lit(600000000L)).as("hi"))
      RangeJoin.pointInInterval(pts, ivs, "tus", "lo", "hi",
          binWidth = 600000000L, keys = Seq("user_id"))
        .groupBy("iv_id")
        .agg(count(lit(1)).as("n_pts"),
          min("event_id").as("first_event"), max("event_id").as("last_event"))
        .orderBy("iv_id")
    }
    def easof(e: DataFrame): DataFrame =
      AsOfJoin.leftAsOf(
          e.filter(col("event_id") % 2 === 0),
          e.filter(col("event_id") % 2 === 1),
          "user_id", "tus", "event_id", "value")
        .select(col("event_id"), col("user_id"), col("tus"),
          col("matched_id").as("matched_event"),
          round(col("matched_value"), 4).as("matched_value"))
        .orderBy("event_id")
    def esessions(e: DataFrame): DataFrame =
      Sessions.sessionStats(e, "user_id", "tus", "event_id", "value",
          gap = 30L * 60 * 1000000)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("start_ts").as("start_us"), col("end_ts").as("end_us"),
          round(col("total_value"), 4).as("total_value"))
        .orderBy("user_id", "session_seq")

    val queries: Seq[(String, DataFrame => DataFrame)] =
      Seq("e_range" -> erange, "e_asof" -> easof, "e_sessions" -> esessions)

    def exchanges(df: DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString()).size

    // Join subset-key elision is gated by requireAllClusterKeysForCoPartition
    // (default TRUE since Spark 3.3 — skew protection): with it on, the
    // (user_id, __bin) join shuffles both sides even though both scans are
    // HashPartitioning(user_id). The bucketed arm turns it off — per-user
    // co-location is the layout's contract; the plain arm keeps defaults.
    def run(e: DataFrame, label: String): Map[String, Double] = {
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        if (label.contains("plain")) "true" else "false")
      queries.map { case (q, f) =>
        println(s"[range-layout:phase] $q $label")
        def once(): Double = {
          val t0 = System.nanoTime()
          f(e).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm
        q -> math.min(once(), once())
      }.toMap
    }

    // row-identity fence before timing: layout must not change results
    for ((q, f) <- queries) {
      val a = f(plain).count(); val b = f(bkt).count()
      require(a == b, s"$q row count differs: plain=$a bucketed=$b")
    }
    run(bkt, "jit-warm")
    val pairs = (1 to rounds).map(_ => (run(plain, "plain"), run(bkt, "bucketed")))
    for ((q, f) <- queries) {
      val p = pairs.map(_._1(q)).min
      val b = pairs.map(_._2(q)).min
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "true")
      val pex = exchanges(f(plain))
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val bex = exchanges(f(bkt))
      println(f"[range-layout] $q%-11s plain=$p%6.2f s (ex=$pex)  " +
        f"bucketed=$b%6.2f s (ex=$bex)  (b/p=${b / p}%4.2f)")
    }
    spark.stop()
  }
}
