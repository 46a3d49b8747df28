package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Execution-time cardinality guard for distinct-value CELL frames.
  *
  * ntileExact / quantileNormalize / ksDrift run their ONLY
  * unpartitioned window over distinct-value cells and argue "bounded
  * by the value domain" — true for quantized features (prices,
  * scores, durations), silently false when a caller feeds a
  * row-scale column (unique ids): the cell frame then IS the table,
  * collapsed onto one task. The house rule (ItemsetOps.scala's
  * maxItemsPerDoc `require`) is that such bounds are ENFORCED with the
  * remedy in the message, not promised in scaladoc.
  *
  * Mechanics: a `row_number()` over the same ordering folds into the
  * same WindowExec as the cumulative sum (zero extra jobs, shuffles,
  * or passes — checked against the pre-guard plan), and the guarded
  * column routes through a `when` whose overflow branch raises. Below
  * the threshold the expression is exactly `cum`, so every green
  * oracle stays bit-identical; past it the query fails loudly AT
  * EXECUTION, before the single-task window becomes a 100 TB hang.
  */
private[graft] object CellGuard {

  /** Generous by design: 4M (v, cnt) cells is tens of MB through one
    * task — slow but survivable, and far above any bounded value
    * domain in the contract (the largest, dollar-quantized prices, is
    * ~104k cells at ANY row count). A column that exceeds it is
    * row-scale, not domain-scale.
    */
  val DefaultMaxCells = 4000000L

  /** `cum`, unless this is cell number > maxCells — then raise with
    * the remedy. `cellRank` must be a `row_number` over the same
    * ordering as the cumulative window so the two share one WindowExec.
    */
  def guarded(cum: Column, cellRank: Column, maxCells: Long, op: String): Column =
    when(cellRank > maxCells, raise_error(lit(
      s"$op: the distinct-value cell frame exceeded maxCells=$maxCells — " +
      "this value column is row-scale (unique-id-like), so the " +
      "unpartitioned cumulative window would collapse the table onto one " +
      "task; quantize/bucket the value column to a bounded domain first " +
      "(e.g. div/floor to cells), or raise maxCells deliberately")))
      .otherwise(cum)
}
