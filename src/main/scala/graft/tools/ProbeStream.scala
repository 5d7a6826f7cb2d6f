package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamingMeasures

/** Drive the streaming module against a real file-stream source. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val schema = spark.read.parquet("/tmp/events_stream/events.parquet").schema
    // ts came in as nanos-long under the legacy flag; restore a timestamp col
    val raw = spark.readStream.schema(schema).parquet("/tmp/events_stream")
      .withColumn("ts", (col("ts") / 1000000000L).cast("timestamp"))

    val agg = StreamingMeasures.windowedMeasures(raw, windowLen = "7 days", watermark = "1 day")
    val q = agg.writeStream.format("memory").queryName("ev_agg").outputMode("update").start()
    q.processAllAvailable()
    println("WINDOWED measure rows from file stream:")
    spark.sql("SELECT event_type, n_events, sum_value FROM ev_agg ORDER BY event_type, n_events DESC")
      .show(8, truncate = false)
    q.stop()

    val dedup = StreamingMeasures.streamingDedup(raw)
    val q2 = dedup.writeStream.format("memory").queryName("ev_dedup").outputMode("append").start()
    q2.processAllAvailable()
    val total = spark.read.parquet("/tmp/events_stream/events.parquet").count()
    val kept = spark.sql("SELECT COUNT(*) FROM ev_dedup").head().getLong(0)
    println(s"DEDUP: $total events in, $kept unique out")
    q2.stop()

    val sess = StreamingMeasures.sessionize(raw, gap = "30 minutes", watermark = "1 minute")
    val q3 = sess.writeStream.format("memory").queryName("ev_sessions").outputMode("append").start()
    q3.processAllAvailable()
    println("SESSIONS (closed so far): " + spark.sql("SELECT COUNT(*) FROM ev_sessions").head().getLong(0))
    spark.sql("SELECT user_id, n_events, total_value FROM ev_sessions ORDER BY n_events DESC").show(5)
    q3.stop()
    spark.stop()
  }
}
