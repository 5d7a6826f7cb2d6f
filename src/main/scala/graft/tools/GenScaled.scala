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

    // the pipeline corpora scale too (r5 verdict: leaving them at sf0.1
    // made the 100x d_*/t_*/s_* numbers measure scheduling floor, not
    // scaling). Documents get lightly-MUTATED copies — per-copy suffix
    // token, so copies are near (not exact) duplicates and the dedup
    // workload stays honest: true clustering = n0 families of `copies`.
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    val docOff = docs0.agg(max("doc_id")).head().getLong(0) + 1
    (0 until copies).map { i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i * docOff))
        .withColumn("text", concat(col("text"), lit(s" copytag$i")))
        .withColumn("n_chars", col("n_chars") + lit(s" copytag$i".length.toLong))
    }.reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")

    // embeddings: shifted ids + deterministic per-dimension jitter (breaks
    // exact-duplicate ties without moving vectors off their label cluster)
    val emb0 = spark.read.parquet(s"$src/embeddings.parquet")
    val embOff = emb0.agg(max("vec_id")).head().getLong(0) + 1
    (0 until copies).map { i =>
      emb0.withColumn("vec_id", col("vec_id") + lit(i * embOff))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, d) -> x + ((vec_id * 31 + d * 7 + $i) % 101 - 50) * 1e-4)"))
    }.reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // events scale along the realistic axis — MORE USERS, same per-user
    // event density (shifted user_id + event_id per copy; timestamps stay):
    // as-of/range/session state is per-user, so this grows the key space
    // the way a larger deployment would, without inflating any one user's
    // timeline past its real density
    val ev0 = spark.read.parquet(s"$src/events.parquet")
    val evOff = ev0.agg(max("event_id")).head().getLong(0) + 1
    val userOff = ev0.agg(max("user_id")).head().getLong(0) + 1
    (0 until copies).map { i =>
      ev0.withColumn("event_id", col("event_id") + lit(i * evOff))
        .withColumn("user_id", col("user_id") + lit(i * userOff))
    }.reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$dst/events.parquet")

    for (t <- Seq("region", "nation", "supplier", "part")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    println(s"scaled $copies x from $src to $dst")
    spark.stop()
  }
}
