package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingMeasures

/** Structured Streaming operators driven through MemoryStream sources. */
class StreamingSuite extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("windowed measures over a stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Long, Double)]
    val events = src.toDF().toDF("ts", "event_type", "user_id", "value")
    val agg = StreamingMeasures.windowedMeasures(events, windowLen = "10 minutes", watermark = "20 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg").outputMode("update").start()
    try {
      src.addData((ts(1), "click", 1L, 2.0), (ts(2), "click", 2L, 4.0), (ts(12), "view", 1L, 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, sum_value FROM win_agg").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 6.0)), s"got $rows")
      assert(rows.contains(("view", 1L, 1.0)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup drops repeats within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Long, String, Double)]
    val events = src.toDF().toDF("ts", "event_type", "user_id", "props", "value")
    val deduped = StreamingMeasures.streamingDedup(events)
    val q = deduped.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      src.addData(
        (ts(1), "click", 1L, "a", 1.0),
        (ts(2), "click", 1L, "a", 1.0), // duplicate fingerprint
        (ts(3), "view", 1L, "b", 2.0))
      q.processAllAvailable()
      val n = spark.sql("SELECT COUNT(*) FROM dedup_out").head().getLong(0)
      assert(n == 2, s"expected 2 deduped events, got $n")
    } finally q.stop()
  }

  test("sessionization with session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String, Double)]
    val events = src.toDF().toDF("user_id", "ts", "event_type", "value")
    val sessions = StreamingMeasures.sessionize(events, gap = "5 minutes", watermark = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // user 1: two sessions (gap > 5 min); user 2: one session
      src.addData(
        (1L, ts(0), "click", 1.0),
        (1L, ts(2), "view", 2.0),
        (1L, ts(20), "click", 3.0),
        (2L, ts(1), "click", 5.0))
      q.processAllAvailable()
      // advance the watermark past all session ends
      src.addData((9L, ts(120), "noop", 0.0))
      q.processAllAvailable()
      src.addData((9L, ts(240), "noop", 0.0))
      q.processAllAvailable()
      val closed = spark.sql("SELECT user_id, n_events, total_value FROM sessions_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(closed.contains((1L, 2, 3.0)), s"first user-1 session missing: $closed")
      assert(closed.contains((1L, 1, 3.0)), s"second user-1 session missing: $closed")
      assert(closed.contains((2L, 1, 5.0)), s"user-2 session missing: $closed")
    } finally q.stop()
  }

  // the sampling predicate is stateless (pure function of the key), so it
  // applies unchanged to streams — and MUST select exactly the rows the
  // batch path selects, or batch-built mixtures and streaming ingestion
  // would diverge
  test("deterministic sampling on a stream matches the batch selection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Long]
    val streamed = graft.ops.Sampling.deterministicSample(
      src.toDF().toDF("doc_id"), "doc_id", 0.25, seed = 7)
    val q = streamed.writeStream.format("memory").queryName("sample_out")
      .outputMode("append").start()
    try {
      src.addData(0L until 500L: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM sample_out").as[Long].collect().toSet
      val batch = graft.ops.Sampling.deterministicSample(
        (0L until 500L).toDF("doc_id"), "doc_id", 0.25, seed = 7)
        .as[Long].collect().toSet
      assert(got == batch, s"stream selected ${got.size} rows, batch ${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  // the sketches' merge laws (HLL: per-idx MAX, CMS: per-cell SUM) are
  // exactly what incremental state maintenance needs, so both run as
  // plain streaming aggregations — the state after N micro-batches must
  // equal the batch sketch over the union of the input
  test("streaming HLL registers converge to the batch sketch across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Long]
    val streamed = graft.ops.Sketches.hllRegisters(src.toDF().toDF("v"), "v")
    val q = streamed.writeStream.format("memory").queryName("hll_out")
      .outputMode("complete").start()
    try {
      src.addData(0L until 300L: _*)
      q.processAllAvailable()
      src.addData(300L until 600L: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT idx, rho FROM hll_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.ops.Sketches.hllRegisters((0L until 600L).toDF("v"), "v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch, "streaming state must equal the batch sketch")
    } finally q.stop()
  }

  test("streaming count-min cells converge to the batch sketch across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    val streamed = graft.ops.Sketches.cmsSketch(src.toDF().toDF("tok"), "tok",
      depth = 3, width = 64)
    val q = streamed.writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      src.addData("a", "b", "a", "c")
      q.processAllAvailable()
      src.addData("a", "c", "d")
      q.processAllAvailable()
      val got = spark.sql("SELECT r, idx, cnt FROM cms_out").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.ops.Sketches.cmsSketch(
          Seq("a", "b", "a", "c", "a", "c", "d").toDF("tok"), "tok",
          depth = 3, width = 64)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batch, "streaming state must equal the batch sketch")
    } finally q.stop()
  }

  test("streaming incremental dedup converges to the batch incrementalDedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // history: first 20 docs of the corpus; stream: docs 10-49 in doc_id
    // order across two micro-batches (first-arrived == min doc_id, the
    // batch keeper rule), so stream survivors must equal the batch op's
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(50).collect()
    val history = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.take(20).toSeq), docs.head.schema)
    val index = graft.ops.Dedup.fingerprintIndex(history)
    index.createOrReplaceTempView("si_index")
    val indexDf = spark.table("si_index")

    val src = MemoryStream[(Timestamp, Long, String)]
    val stream = src.toDF().toDF("ts", "doc_id", "text")
    val out = StreamingMeasures.streamingIncrementalDedup(stream, indexDf)
    val q = out.writeStream.format("memory").queryName("sincr_out").outputMode("append").start()
    try {
      val batchRows = docs.slice(10, 50)
      val (b1, b2) = batchRows.splitAt(25)
      src.addData(b1.zipWithIndex.map { case (r, i) => (ts(i), r.getLong(0), r.getString(1)) }.toSeq: _*)
      q.processAllAvailable()
      src.addData(b2.zipWithIndex.map { case (r, i) => (ts(30 + i), r.getLong(0), r.getString(1)) }.toSeq: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM sincr_out").collect().map(_.getLong(0)).toSet

      val batchInput = spark.createDataFrame(
        spark.sparkContext.parallelize(batchRows.toSeq), docs.head.schema)
      val want = graft.ops.Dedup.incrementalDedup(batchInput, indexDf)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"stream=${got.size} batch=${want.size} diff=${(got diff want) ++ (want diff got)}")
    } finally q.stop()
  }

  test("streaming quality monitor equals the batch quality aggregate per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text").orderBy("doc_id").limit(60).collect()
    val src = MemoryStream[(Timestamp, String, String)]
    val stream = src.toDF().toDF("ts", "source", "text")
    val mon = StreamingMeasures.qualityMonitor(stream, windowLen = "10 minutes")
    val q = mon.writeStream.format("memory").queryName("qmon_out").outputMode("update").start()
    try {
      src.addData(docs.map(r => (ts(1), r.getString(1), r.getString(2))).toSeq: _*)
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT source, n_docs, sum_tokens, mean_quality FROM qmon_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

      // batch replay of the identical aggregate
      val stats = graft.functions.TextStatsExpr.textStats(col("text"))
      val qc = graft.ops.TextAnalysis.qualityColumnsFrom(stats).toMap
      val score = graft.ops.TextAnalysis.qualityScoreFrom(
        qc("n_tokens"), qc("punct_ratio"), qc("digit_ratio"),
        qc("mean_word_len"), qc("stopword_ratio"))
      val want = spark.createDataFrame(
          spark.sparkContext.parallelize(docs.toSeq), docs.head.schema)
        .withColumn("__q", score).withColumn("__nt", qc("n_tokens"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("__nt").cast("long").as("sum_tokens"),
          round(avg("__q"), 4).as("mean_quality"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == want, s"stream=$got\nbatch=$want")
    } finally q.stop()
  }
}
