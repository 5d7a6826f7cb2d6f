package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single right row with the
  * greatest timestamp <= the left timestamp, per key — the canonical
  * enrichment step for event data (latest quote per trade, latest profile
  * per event). DuckDB exposes this as `ASOF JOIN`; Spark has no native
  * operator, and the naive formulations are scale-killers (an inequality
  * theta-join degenerates to per-key cross products; a correlated
  * max-subquery is a join per probe).
  *
  * Implementation is the union + running-last trick, which is the shape
  * that survives 100 TB: tag both inputs, UNION them, and take
  * `last(<right payload>, ignoreNulls) OVER (PARTITION BY key ORDER BY ts,
  * side)` — ONE shuffle on the key, one sort, no join operator at all.
  * Right rows sort BEFORE left rows at equal timestamps, so the match is
  * `>=` (DuckDB ASOF semantics). Work is O(|L| + |R|) per key, immune to
  * the per-key fan-out that breaks the theta-join at scale.
  *
  * Right-side duplicates on (key, ts) resolve to the row with the greatest
  * `rightIdCol` (encoded in the window order — no pre-aggregation pass),
  * making the result total-order deterministic across engines and
  * partitionings (the same tie-break discipline as [[Sessions]]).
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param left       probe side; all its columns survive
    * @param right      build side: (keyCol, tsCol, rightIdCol, rightValCol)
    * @param keyCol     equi-key present on both sides
    * @param tsCol      ordering column (any orderable numeric/timestamp)
    * @param rightIdCol right unique id (tie-break + surfaced as matched_id)
    * @param rightValCol right payload, surfaced as matched_value
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               rightIdCol: String, rightValCol: String): DataFrame = {
    val r = right.select(col(keyCol), col(tsCol),
      col(rightIdCol).as("__rid"), col(rightValCol).as("__rval"))

    val leftCols = left.columns
    val tagged = left
      .withColumn("__side", lit(1))
      .withColumn("__rid", lit(null).cast(r.schema("__rid").dataType))
      .withColumn("__rval", lit(null).cast(r.schema("__rval").dataType))
      .select((leftCols.map(col) :+ col("__side") :+ col("__rid") :+ col("__rval")): _*)
      .unionByName(
        r.withColumn("__side", lit(0))
          .select((leftCols.map(c =>
            if (c == keyCol || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
            :+ col("__side") :+ col("__rid") :+ col("__rval")): _*))

    // right rows (side 0) precede left rows (side 1) at equal ts -> `>=`.
    // The right tie-break needs NO pre-aggregation: ordering by __rid within
    // equal (ts, side) makes the running last() land on the max-id right row
    // — the same dedup a groupBy would do, without its extra exchange. ONE
    // struct keeps matched_id and matched_value from the same row.
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__m",
        last(when(col("__side") === 0, struct(col("__rid"), col("__rval"))),
          ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col)
        :+ col("__m.__rid").as("matched_id")
        :+ col("__m.__rval").as("matched_value"): _*)
  }
}
