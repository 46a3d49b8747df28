package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequential per-key time-series kernels — the anomaly layer over the
  * event stream ([[SessionOps]] groups it, these scan it in order).
  *
  * EWMA arithmetic is ALL-INTEGER: with s_0 = x_0 and
  * s_t = (s_{t-1} * (den-1) + x_t) div den over non-negative integer
  * inputs, every state is exactly reproducible in any engine — the
  * same fixed-point discipline as [[GraphOps.pageRankFixedPoint]]
  * (no float accumulation, no ordering hazard), at the cost of a
  * deterministic ≤1-unit floor per step that both engines share.
  *
  * Scale shape: ONE shuffle on the key; each group is consumed as a
  * sorted stream (Spark's sort-based `flatMapSortedGroups` — group
  * sorts spill to disk, state per key is O(1), nothing is collected).
  * This is the mapGroupsWithState batch twin: the same recurrence runs
  * incrementally under Structured Streaming by carrying `ewma` as the
  * group state.
  */
object TimeSeriesOps {

  /** Flag values whose deviation from the running EWMA of their key's
    * PRIOR history exceeds `threshold`.
    *
    * Rows of `events` are (keyCol, tsCol, seqCol, valCol) with an
    * integer value; (tsCol, seqCol) totally orders each key. Returns
    * (seqCol, keyCol, value, ewma_prev, ewma, spike): the state before
    * and after each observation (first observation seeds the state and
    * is never a spike).
    */
  def ewmaSpikes(events: DataFrame, keyCol: String, tsCol: String,
                 seqCol: String, valCol: String, den: Long = 8L,
                 threshold: Long = 30000L): DataFrame = {
    require(den >= 2L, s"den must be >= 2, got $den")
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events.select(col(keyCol).cast("long"),
        col(tsCol).cast("long"), col(seqCol).cast("long"),
        col(valCol).cast("long"))
      .as[(Long, Long, Long, Long)]
    rows.groupByKey(_._1)
      .flatMapSortedGroups(col(tsCol), col(seqCol)) { (key, it) =>
        var state = Long.MinValue
        it.map { case (_, _, seq, v) =>
          val prev = if (state == Long.MinValue) v else state
          // JVM / truncates toward 0, and so does DuckDB's integer //
          // (verified: SELECT -7 // 2 = -3) — the two engines agree for
          // ALL operands, negatives included. (Python's // floors; don't
          // use it as the mental model for either engine.)
          state = (prev * (den - 1) + v) / den
          (seq, key, v, prev, state, math.abs(v - prev) > threshold)
        }
      }(Encoders.product[(Long, Long, Long, Long, Long, Boolean)])
      .toDF(seqCol, keyCol, "value", "ewma_prev", "ewma", "spike")
  }

  /** Per-group least-squares trend as an EXACT integer rational: for
    * y over x, slope = slope_num / slope_den with
    * slope_num = n·Σxy − Σx·Σy and slope_den = n·Σx² − (Σx)² — the
    * closed form from integer moments only, so detection ("is this
    * source growing?") never depends on float summation order. The
    * denominator is ≥ 0 (Cauchy–Schwarz; 0 iff all x equal, where the
    * slope is undefined and `rising` is false).
    *
    * Scale shape: one partial-aggregated pass — five integer moments
    * per group cross the wire, never rows. Caller must bound
    * |x|,|y| ≲ 2^20 per group-size ≲ 2^20 to keep n·Σxy within int64
    * (true for any per-source daily-count series; use day indexes, not
    * epoch micros, as x).
    */
  def integerTrend(df: DataFrame, groupCol: String, xCol: String,
                   yCol: String): DataFrame =
    df.select(col(groupCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(groupCol).agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col(groupCol), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
        (col("n") * col("sxy") - col("sx") * col("sy") > 0L).as("rising"))
}
