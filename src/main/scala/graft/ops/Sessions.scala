package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization for event streams in BATCH (the streaming twin
  * is `StreamingMeasures`' session_window): a user's events belong to one
  * session while consecutive gaps stay under `gap`; a larger gap starts the
  * next session. The standard preprocessing step for user-activity training
  * data (session-level sequences, per-session stats).
  *
  * Scale shape: ONE shuffle on the user key; the per-user window sort is
  * computed once and reused by both the gap `lag` and the running session
  * counter (same WindowSpec), and the final per-session aggregate
  * pre-aggregates map-side. No state, no driver-side loops — at 100 TB the
  * cost is the one user-key exchange, exactly like the groupBy it replaces.
  *
  * Ties on the timestamp are broken by `idCol` so the session assignment is
  * total-order deterministic across engines and partitionings.
  */
object Sessions {

  /** Tag each event with its per-user `session_seq` (1-based). */
  def byGap(events: DataFrame, userCol: String, tsCol: String, idCol: String,
            gap: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("__new", when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0))
      .withColumn("session_seq", sum(col("__new")).over(run))
      .drop("__new")
  }

  /** Per-session stats: event count, span, and summed value (exact — any
    * display rounding belongs to the caller).
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, valueCol: String, gap: Long): DataFrame =
    byGap(events, userCol, tsCol, idCol, gap)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        sum(col(valueCol)).as("total_value"))
}
