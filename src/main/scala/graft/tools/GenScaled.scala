package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generate an N× scaled copy of an sf directory for the PERF.md crossover
  * measurement: lineitem/orders/customer are replicated with shifted join
  * keys (so join fan-out and key cardinalities scale with the data), the
  * small dimension tables and the text/embedding corpora are copied as-is.
  *
  * Usage: runMain graft.tools.GenScaled [srcDir] [dstDir] [copies]
  */
object GenScaled {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/bench_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[16]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val cust = spark.read.parquet(s"$src/customer.parquet")
    val ordOff = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    val custOff = cust.agg(max("c_custkey")).head().getLong(0) + 1

    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until copies).map { i =>
        shifts.foldLeft(df) { case (d, (c, off)) => d.withColumn(c, col(c) + lit(i * off)) }
      }.reduce(_ union _)

    replicate(li, Map("l_orderkey" -> ordOff))
      .repartition(32).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    replicate(ord, Map("o_orderkey" -> ordOff, "o_custkey" -> custOff))
      .repartition(8).write.mode("overwrite").parquet(s"$dst/orders.parquet")
    replicate(cust, Map("c_custkey" -> custOff))
      .repartition(4).write.mode("overwrite").parquet(s"$dst/customer.parquet")
    for (t <- Seq("region", "nation", "supplier", "part", "events", "documents", "embeddings")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"scaled $copies x from $src to $dst")
    spark.stop()
  }
}
