package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Cols, Dedup}

/** A/B the r4 bindOnce shingle rewrite against the r3 inline form on the
  * sf0.1 documents corpus (full materialization via count of exploded
  * shingles — the shape the minhash signature stage consumes).
  */
object ProbeShingleAB {
  def shinglesR3(text: Column, w: Int = 3): Column = {
    val words = split(lower(regexp_replace(trim(text), "\\s+", " ")), " ")
    val n = size(words)
    array_distinct(transform(
      sequence(lit(0), greatest(n - w, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(w)))))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("probe-shingle-ab").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").persist()
    docs.count()

    def time(label: String, c: Column): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        docs.select(explode(c).as("s")).selectExpr("count(distinct s)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val ts = Seq.fill(3)(once())
      println(f"$label: median ${ts.sorted.apply(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("r3 inline form  ", shinglesR3(col("text")))
    time("r4 bindOnce form", Dedup.shingles(col("text")))
    println("PROBE-SHINGLE-AB OK")
    spark.stop()
  }
}
