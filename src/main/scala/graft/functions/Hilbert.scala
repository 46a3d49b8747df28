package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnExprBridge.{toColumn, toExpression}

/** Hilbert-curve index: map a point on a 2^bits × 2^bits grid to its
  * position along the Hilbert space-filling curve.
  *
  * Why a second curve next to [[ZOrder]]: both cluster rows that are
  * close in two dimensions at once, but the Hilbert curve is
  * ADJACENCY-PRESERVING — consecutive curve positions are always
  * 4-neighbour grid cells (HilbertSpec proves it exhaustively), while
  * the Morton curve takes a long diagonal jump every other step (511 of
  * the 1023 consecutive steps on a 32×32 grid are non-adjacent). The
  * jump is invisible when files are 4^k-aligned curve runs (both curves
  * then cut into identical square blocks), but REAL clustered writes cut
  * files by equal ROWS over skewed data, so file boundaries land at
  * arbitrary curve offsets — and every Morton jump inside a file
  * stretches that file's min/max envelope across the grid, admitting
  * box predicates it should have excluded. Measured on lineitem
  * (q269_hilbert_layout, sf0.1, 64 equal-row files, a
  * quadrant-straddling 1/16-selectivity box): hilbert scans 47,082 rows
  * in 5 files where z-order scans 94,101 in 10 and a linear (a, b) sort
  * 159,338 in 17 — the Hilbert layout reads HALF of what Z-order reads
  * for the predicates Z-order is worst at, and never reads more
  * (aligned boxes tie; HilbertSpec pins both directions).
  *
  * Algorithm: the classic iterative xy→d conversion (Wikipedia,
  * "Hilbert curve — converting between (x, y) and d"): walk bit planes
  * from the top; at each scale `s` add the sub-quadrant's curve offset
  * `s²·((3·rx) XOR ry)` and rotate/reflect the frame so the next level
  * sees its quadrant in canonical orientation. The Column surface is a
  * native Catalyst expression
  * ([[graft.functions.expressions.HilbertIndex]]) whose generated code
  * is one static call into [[hilbertIndexLocal]] — an unrolled
  * `when`-combinator tree was measured to DOUBLE per bit plane (the
  * rotate rewrites x and y in terms of both previous values), costing
  * 4–7 s of Janino/C2 work per fresh plan at bits = 5; the expression
  * keeps plan size and codegen cost independent of `bits`.
  */
object Hilbert {

  /** Hilbert position of (`x`, `y`) on the 2^bits-per-side grid.
    * Inputs must be in [0, 2^bits); callers quantize first (e.g.
    * `(col * 32) div dim` with bits = 5). Codegen'd native expression —
    * no UDF, no per-plan tree growth.
    */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    toColumn(graft.functions.expressions.HilbertIndex(
      toExpression(x.cast("long")), toExpression(y.cast("long")), bits))

  /** The per-point kernel both the expression's `eval` and its generated
    * code call — and the driver-side planner helper. Plain JVM loop,
    * C2-compiled once per executor.
    */
  def hilbertIndexLocal(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
