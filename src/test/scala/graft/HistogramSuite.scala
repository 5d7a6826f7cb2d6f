package graft

import org.apache.spark.sql.functions._

import graft.ops.Histogram

class HistogramSuite extends SparkSpec {
  import spark.implicits._

  test("binOf: interior, boundary, and out-of-range values clamp to edge bins") {
    val df = Seq(-5.0, 0.0, 0.999, 1.0, 9.999, 10.0, 42.0).toDF("v")
    val got = df.select($"v", Histogram.binOf($"v", 0.0, 10.0, 10).as("bin"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(-5.0) == 0L)   // below range -> bin 0
    assert(got(0.0) == 0L)
    assert(got(0.999) == 0L)
    assert(got(1.0) == 1L)    // left-closed bins
    assert(got(9.999) == 9L)
    assert(got(10.0) == 9L)   // hi itself clamps into the last bin
    assert(got(42.0) == 9L)   // above range -> last bin
  }

  test("sketch merges: counts of disjoint halves add up to the whole") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val whole = Histogram.fixedWidthCounts(li, "l_extendedprice", 0.0, 110000.0, 110)
    val a = Histogram.fixedWidthCounts(li.filter($"l_orderkey" % 2 === 0),
      "l_extendedprice", 0.0, 110000.0, 110)
    val b = Histogram.fixedWidthCounts(li.filter($"l_orderkey" % 2 =!= 0),
      "l_extendedprice", 0.0, 110000.0, 110)
    val merged = a.union(b).groupBy("bin").agg(sum("cnt").as("cnt"))
    val diff = whole.join(merged, Seq("bin"), "full")
      .filter(coalesce(whole("cnt"), lit(0L)) =!= coalesce(merged("cnt"), lit(0L)))
    assert(diff.count() == 0, "merged half-sketches must equal the whole sketch")
  }

  test("quantile estimates are within one bin width of the exact percentile") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = Histogram.quantileEstimates(li, "l_extendedprice",
        0.0, 110000.0, 110, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = li.stat.approxQuantile("l_extendedprice", qs.toArray, 0.0)
    val w = 110000.0 / 110
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= w,
        s"q=$q est=${est(q)} exact=$ex off by more than bin width $w")
    }
  }

  test("count shuffle carries bins, not rows: partial aggregation precedes exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = Histogram.fixedWidthCounts(li, "l_extendedprice", 0.0, 110000.0, 110)
      .queryExecution.executedPlan.toString
    // partial HashAggregate must appear before the exchange (map-side combine)
    val iAgg = plan.indexOf("HashAggregate(keys=[bin")
    val iEx = plan.indexOf("Exchange")
    assert(iAgg >= 0 && iEx >= 0 && plan.lastIndexOf("HashAggregate") > iEx,
      s"expected partial agg below exchange:\n$plan")
  }
}
