package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Grid probe for the m_countdistinct config sensitivity at 100x: the
  * Bench config (8 MB maxPartitionBytes, ~162 shuffle partitions) ran the
  * query at ~3.2 s while ProbeBucketScan's JVM (128 MB / 128) ran it at
  * ~1.3 s. Interleave the two split sizes and two shuffle widths in ONE
  * JVM to isolate which knob pays.
  */
object ProbeCd {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (20L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.layout.bucketed", "true")
    SparkEntry.engineFor(spark, dir)

    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("m_countdistinct")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val grid = for {
      mpb <- Seq(8L, 32L, 128L)
      sh <- Seq(32, 128, 162)
    } yield (mpb, sh)
    // two interleaved passes over the grid; report min per cell
    val t = scala.collection.mutable.Map[(Long, Int), Double]().withDefaultValue(1e9)
    for (pass <- 1 to 2; (mpb, sh) <- grid) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (mpb * 1024 * 1024).toString)
      spark.conf.set("spark.sql.shuffle.partitions", sh.toString)
      val v = once()
      t((mpb, sh)) = math.min(t((mpb, sh)), v)
    }
    grid.foreach { case (mpb, sh) =>
      println(f"[cd] maxPartitionBytes=${mpb}%3dMB shuffle=$sh%3d  min=${t((mpb, sh))}%.2f s")
    }
    spark.stop()
  }
}
