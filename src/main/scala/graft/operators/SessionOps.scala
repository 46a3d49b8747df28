package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over an event stream (batch form) — the gap-based
  * session semantics the reference lacks (SURVEY §2.10 T6 "n/a") but any
  * event-analytics consumer of this engine needs.
  *
  * Execution shape: one shuffle on the entity key (the window partition),
  * then two window passes over each partition (lag → gap flag → running
  * sum), then the session aggregation reuses the SAME partitioning — no
  * second exchange. At 100 TB the only cost driver is the per-user event
  * count; skewed users are bounded by the window spill path, and the
  * aggregation is partial.
  */
object SessionOps {

  /** Assign a session id per (userCol): a new session starts when the gap
    * since the previous event exceeds `gapSeconds`. Deterministic total
    * order within a user via (ts, eventIdCol).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 eventIdCol: String, gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(eventIdCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(prevTs.isNull, 1)
      .when(unix_timestamp(col(tsCol)) - unix_timestamp(prevTs) > gapSeconds, 1)
      .otherwise(0)
    events
      .withColumn("session_seq", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_id",
        concat(col(userCol).cast("string"), lit("#"), col("session_seq").cast("string")))
  }

  /** Per-session rollup: bounds, size, value sum. */
  def sessionSummary(events: DataFrame, userCol: String, tsCol: String,
                     eventIdCol: String, gapSeconds: Long = 1800L): DataFrame =
    sessionize(events, userCol, tsCol, eventIdCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.functions.Rounding.half2(sum(col("value"))).as("sum_value"))
}
