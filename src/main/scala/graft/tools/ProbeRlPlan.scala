package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** One-off: dump the bucketed-events range-join plan (why no elision?). */
object ProbeRlPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tusC = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => expr("unix_micros(cast(ts as timestamp))")
    }
    val plain = raw.withColumn("tus", tusC).select("user_id", "event_id", "value", "tus")
    plain.repartition(32, col("user_id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(32, "user_id").sortBy("user_id", "tus").saveAsTable("events_tbkt")
    val e = spark.table("events_tbkt")
    val pts = e.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("event_id"), col("tus"))
    val ivs = e.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("event_id").as("iv_id"), col("tus").as("lo"),
        (col("tus") + lit(600000000L)).as("hi"))
    val j = RangeJoin.pointInInterval(pts, ivs, "tus", "lo", "hi",
      binWidth = 600000000L, keys = Seq("user_id"))
    println(j.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
