package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.ScaleLayout

/** Drive ScaleLayout through the public API with plan capture. */
object ProbeLayout {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    ScaleLayout.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_totalprice"),
      "pb_orders", 8, "o_orderkey")
    ScaleLayout.writeBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_quantity"),
      "pb_lineitem", 8, "l_orderkey")
    val j = spark.table("pb_orders").join(spark.table("pb_lineitem"),
      col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    val plan = j.queryExecution.executedPlan.toString()
    println("BUCKETED exchanges in plan: " + "Exchange hashpartitioning".r.findAllIn(plan).size +
      ", SMJ: " + plan.contains("SortMergeJoin") + ", rows: " + j.count())
    // probe: same join over UNBUCKETED parquet shuffles both sides
    val raw = spark.read.parquet(s"$dir/orders.parquet").select("o_orderkey")
      .join(spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_quantity"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity"))
    println("UNBUCKETED exchanges in plan: " +
      "Exchange hashpartitioning".r.findAllIn(raw.queryExecution.executedPlan.toString()).size)
    spark.sql("DROP TABLE pb_orders"); spark.sql("DROP TABLE pb_lineitem")
    spark.stop()
  }
}
