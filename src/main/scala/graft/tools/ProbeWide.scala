package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: wide-band (126-bit) simhash at 5M docs — the measurement
  * PERF.md §0i's scale recipe requires.
  *
  * The compounded 1000× documents table has 1000-member near-duplicate
  * families, so its true pair set is quadratic in family size (~2.5B
  * pairs) and no single node can emit it — that workload measures the
  * data, not the banding. This probe first breaks the families: every
  * word gets a per-doc `x<doc_id mod 997>` suffix, so only same-residue
  * copies of the same base doc remain near-dups (expected families of
  * ~2, ~2.5M true pairs over 5M docs — a realistic corpus shape). On
  * that corpus the 4×16-bit banding still saturates (~n²/65k candidates
  * per band, §0i math) while the 4×31/32-bit wide banding keeps buckets
  * at n/2^31 — this probe times the wide path end-to-end.
  */
object ProbeWide {
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

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text", regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1x"), pmod(col("doc_id"), lit(997)))))
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.simhashNearDuplicatesWide(docs).count()
    println(f"WIDE d_simhash_wide docs=${docs.count()} pairs=$pairs " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    // round-10 gate (verdict task 4): the same corpus through the DEFAULT
    // entry point — the auto-switch must route it to the wide path and
    // return the same pair count where the pinned 16-bit banding dies
    val t1 = System.nanoTime()
    val auto = graft.ops.Dedup.simhashNearDuplicates(docs, maxHamming = 3).count()
    println(f"WIDE default-entry auto-switch pairs=$auto " +
      f"time=${(System.nanoTime() - t1) / 1e9}%.1f s match=${auto == pairs}")
    spark.stop()
  }
}
