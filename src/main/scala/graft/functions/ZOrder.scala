package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve: interleave the low `bits` bits of two
  * non-negative integer columns so that sorting by the result clusters
  * rows that are close in BOTH dimensions at once.
  *
  * This is the lakehouse data-skipping layout for multi-column
  * predicates: files written in z-value order carry tight min/max
  * bounding BOXES over (x, y), so a two-dimensional predicate prunes to
  * the few files whose box intersects it — a linear sort on x gives
  * tight x-ranges but every file spans all of y, and a y-predicate scans
  * everything (asserted concretely in ZOrderSpec). At 100 TB this is the
  * difference between touching ~1/N of the files and touching all of
  * them for box queries; the z-value itself is a pure codegen'd
  * projection (shift/mask/add), so the one-time clustering write is a
  * single `repartitionByRange(zval).sortWithinPartitions(zval)` pass.
  *
  * The expression tree is a fixed sum of `bits` shift-mask terms per
  * dimension — whole-stage-codegen friendly, no UDF.
  */
object ZOrder {

  /** Morton-interleave the low `bits` of `x` (even positions) and `y`
    * (odd positions). Inputs must be non-negative; callers bucket first
    * (e.g. `pmod(col, lit(1024))` with bits = 10).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { b =>
      // (x & 2^b) << b lands bit b at position 2b; y's at 2b+1
      shiftleft(x.bitwiseAND(lit(1L << b)), b) +
        shiftleft(y.bitwiseAND(lit(1L << b)), b + 1)
    }.reduce(_ + _)
  }
}
