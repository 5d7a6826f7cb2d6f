package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: points `x` matched to intervals `[lo, hi]`
  * (inclusive both ends), optionally under extra equi-keys. Spark plans the
  * naive `ON x BETWEEN lo AND hi` as a BroadcastNestedLoopJoin / per-key
  * cross product — quadratic per key and a scale-killer.
  *
  * Scale shape: BIN BUCKETING. Each interval explodes to the fixed-width
  * bins it overlaps; each point maps to exactly one bin; the join is a
  * plain equi-join on (keys..., bin) followed by the exact containment
  * filter. A point lies in one bin and an interval covers that bin at most
  * once, so no duplicate pairs are produced and no dedup pass is needed.
  * Shuffle is on (keys, bin) — data-proportional; the interval-side
  * explode fan-out is bounded by `ceil(span / binWidth) + 1`, so pick
  * `binWidth` near the typical interval span (fan-out ~2).
  *
  * Both inputs must have disjoint column names apart from `keys`.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      xCol: String, loCol: String, hiCol: String,
                      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(xCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, keys :+ "__bin")
      .filter(col(xCol) >= col(loCol) && col(xCol) <= col(hiCol))
      .drop("__bin")
  }
}
