package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators for the events stream.
  *
  * The reference has no streaming surface (SURVEY §2.B); these are the
  * pipeline operators a training-data/analytics deployment runs on the
  * live event feed, built on watermarks + windowed aggregation and
  * flatMapGroupsWithState sessionization — the idiomatic Spark shapes that
  * scale: state is partitioned by key, watermarks bound it, no driver
  * involvement.
  */
object StreamingMeasures {

  /** Tumbling-window measure aggregation with a watermark: the streaming
    * analogue of `SELECT window, event_type, AGGREGATE(value) ...`.
    */
  def windowedMeasures(events: DataFrame, tsCol: String = "ts",
                       windowLen: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("value"), 4).as("avg_value"),
        approx_count_distinct("user_id").as("approx_users"))
  }

  /** Incremental exact-dedup over a stream: first-seen fingerprints pass,
    * repeats are dropped. Spark's dropDuplicates with a watermark bounds
    * the state — the streaming form of Dedup.exactDedup.
    */
  def streamingDedup(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withColumn("__fp", xxhash64(col("event_type"), col("user_id"), col("props")))
      .withWatermark(tsCol, "2 hours")
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Session windows via the native session_window aggregation: a session
    * closes once the event-time watermark passes its end + gap. This is the
    * scalable shape — state is keyed by (user, session), bounded by the
    * watermark, merged by Spark's session-window state store.
    *
    * (A flatMapGroupsWithState variant is the classic alternative for
    * custom per-session logic; this Spark build's FlatMapGroupsWithStateExec
    * has a broken metrics initializer, and session_window covers the
    * sessionization contract without custom state code.)
    */
  def sessionize(events: DataFrame, tsCol: String = "ts",
                 gap: String = "30 minutes", watermark: String = "1 minute"): DataFrame = {
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(
        count(lit(1)).cast("int").as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"), col("total_value"))
  }

  /** Streaming incremental document dedup — the live form of
    * `Dedup.incrementalDedup`: a stream of crawled documents is
    * fingerprinted (same fused norm_fingerprint as the batch path, so
    * batch-built indexes and the stream agree byte-for-byte), first-seen
    * fingerprints within the stream pass (dropDuplicates state, bounded
    * by the watermark), and survivors are anti-joined against the static
    * historical index — a stream-static join Spark executes per
    * micro-batch with the index on the build side. At scale the index is
    * a parquet table bucketed by `fp` (ScaleLayout), so the per-batch
    * join is co-located; state size is bounded by distinct fingerprints
    * per watermark window, never corpus-sized.
    */
  def streamingIncrementalDedup(docs: DataFrame, index: DataFrame,
                                tsCol: String = "ts", textCol: String = "text",
                                watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp", graft.ops.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .join(index.select("fp"), Seq("fp"), "left_anti")

  /** Streaming corpus-quality monitor: per (window, source) aggregate of
    * the fused text statistics — doc count, token sum, mean quality score
    * — over a live document stream. The per-row signals come from the SAME
    * codegen'd `text_stats` expression the batch pipeline uses (one fused
    * scan per document), so batch-computed quality thresholds transfer to
    * the stream unchanged. The ingest-health dashboard query of a crawl
    * pipeline: a bad crawl batch shows up as a quality dip in its window.
    */
  def qualityMonitor(docs: DataFrame, tsCol: String = "ts",
                     textCol: String = "text",
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val stats = graft.functions.TextStatsExpr.textStats(col(textCol))
    val qcols = graft.ops.TextAnalysis.qualityColumnsFrom(stats).toMap
    val score = graft.ops.TextAnalysis.qualityScoreFrom(
      qcols("n_tokens"), qcols("punct_ratio"), qcols("digit_ratio"),
      qcols("mean_word_len"), qcols("stopword_ratio"))
    docs
      .withColumn("__q", score)
      .withColumn("__nt", qcols("n_tokens"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__nt").cast("long").as("sum_tokens"),
        round(avg("__q"), 4).as("mean_quality"),
        round(min("__q"), 4).as("min_quality"))
  }

  /** Convenience: run a windowed-measure stream from memory source to an
    * in-memory sink for tests/demos; returns the query name to poll.
    */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String): Unit = {
    stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("update")
      .start()
  }
}
