package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable fixed-width histogram sketch and the quantile estimates it
  * yields — the scan-friendly way to answer "p50/p99 of a column" over
  * 100 TB without sorting it.
  *
  * Exact percentiles need a global sort (or a percentile aggregate that
  * buffers values); Spark's built-in `approx_percentile` avoids that but
  * its sketch is engine-private — no other system can reproduce its
  * answer, so it cannot be oracle-checked and two runs over differently
  * partitioned data may disagree. A fixed-width histogram gives up
  * adaptivity for DETERMINISM: bin(v) = clamp(floor((v-lo)/w), 0, n-1)
  * is a pure per-row expression, the per-bin counts are one map-side
  * partial-aggregated shuffle of at most `nBins` rows, and the estimate
  * is a fixed interpolation over the counts. The result is identical on
  * every engine, every partitioning, every cluster size, with error
  * bounded by one bin width — and the sketch MERGES: counts from
  * disjoint slices add, so per-day histograms roll up to a year for
  * free (see the suite's merge test).
  *
  * Both stages are replayed bit-for-bit by the driver's DuckDB oracle
  * (same integer bin arithmetic, same IEEE-double interpolation order).
  */
object Histogram {

  /** clamp(floor((v - lo)/w), 0, nBins-1) — rows outside [lo, hi) land in
    * the edge bins, so the sketch is total over dirty data.
    */
  def binOf(v: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val w = (hi - lo) / nBins
    least(greatest(floor((v.cast("double") - lit(lo)) / lit(w)).cast("bigint"),
      lit(0L)), lit(nBins - 1L))
  }

  /** Per-bin counts: (bin, cnt), the mergeable sketch. One shuffle of at
    * most nBins rows after map-side partial aggregation.
    */
  def fixedWidthCounts(df: DataFrame, valueCol: String, lo: Double,
                       hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo, s"need hi > lo and nBins >= 1")
    df.select(binOf(col(valueCol), lo, hi, nBins).as("bin"))
      .groupBy("bin").agg(count("*").as("cnt"))
  }

  /** Quantile estimates from the sketch. For each q: the first bin whose
    * cumulative count reaches ceil(q*N), interpolated linearly inside the
    * bin — deterministic arithmetic, replayable by any SQL engine:
    *   est(q) = lo + w * (bin + (ceil(q*N) - cum_before) / cnt)
    * The cumulative window runs over at most nBins rows (a histogram, not
    * data), so the unpartitioned window is driver-trivial at any scale.
    */
  def quantileEstimates(df: DataFrame, valueCol: String, lo: Double,
                        hi: Double, nBins: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"qs in (0,1]: $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val w = (hi - lo) / nBins
    val counts = fixedWidthCounts(df, valueCol, lo, hi, nBins)
    val win = org.apache.spark.sql.expressions.Window.orderBy("bin")
    val cum = counts
      .withColumn("cum", sum("cnt").over(win))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val qdf = qs.toDF("q")
    val target = ceil(col("q") * col("n")).cast("bigint")
    val sel = qdf.join(cum, cum("cum") >= target)
      .groupBy("q").agg(min("bin").as("bin"))
    sel.join(cum, "bin")
      .select(col("q"),
        round(lit(lo) + lit(w) *
          (col("bin").cast("double") +
            (ceil(col("q") * col("n")).cast("bigint") - (col("cum") - col("cnt")))
              .cast("double") / col("cnt").cast("double")), 6).as("est"))
  }
}
