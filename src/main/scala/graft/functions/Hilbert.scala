package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  * (q269_hilbert_layout, sf0.01, 64 equal-row files, a
  * quadrant-straddling 1/16-selectivity box): hilbert scans 8,395 rows
  * in 9 files where z-order scans 12,188 in 13 and a linear (a, b) sort
  * 15,013 in 16 — the Hilbert layout reads ~31% less than Z-order for
  * the predicates Z-order is worst at, and never reads more (aligned
  * boxes tie; HilbertSpec pins the sweep).
  *
  * Algorithm: the classic iterative xy→d conversion (Wikipedia,
  * "Hilbert curve — converting between (x, y) and d"): walk bit planes
  * from the top; at each scale `s` add the sub-quadrant's curve offset
  * `s²·((3·rx) XOR ry)` and rotate/reflect the frame so the next level
  * sees its quadrant in canonical orientation. Here the loop is
  * UNROLLED into a fixed `Column` expression tree — like
  * [[ZOrder.zValue]] it stays inside whole-stage codegen, no UDF. The
  * rotate step rewrites x and y in terms of both previous values, so
  * the tree doubles per level: `bits` is capped at 8 (a 256×256 cell
  * grid — far beyond what file-level skipping stats can resolve) to
  * keep the generated code small. Layout callers quantize to coarse
  * cells first anyway (see q269: 32×32).
  */
object Hilbert {

  /** Hilbert position of (`x`, `y`) on the 2^bits-per-side grid.
    * Inputs must be in [0, 2^bits); callers quantize first (e.g.
    * `(col * 32) div dim` with bits = 5). Pure integer shift/mask/add
    * arithmetic — the same closed form an oracle replays exactly.
    */
  def hilbertIndex(x0: Column, y0: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 8, s"bits must be in [1, 8], got $bits")
    val n = 1L << bits
    var x: Column = x0.cast("long")
    var y: Column = y0.cast("long")
    var d: Column = lit(0L)
    var s = n >> 1
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      d = d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      // rotate: when ry == 0, reflect (if rx == 1) then swap x and y
      val xr = when(rx === lit(1L), lit(n - 1) - x).otherwise(x)
      val yr = when(rx === lit(1L), lit(n - 1) - y).otherwise(y)
      val nx = when(ry === lit(0L), yr).otherwise(x)
      val ny = when(ry === lit(0L), xr).otherwise(y)
      x = nx
      y = ny
      s >>= 1
    }
    d
  }

  /** The same conversion as a plain JVM function — the per-element
    * kernel for driver-side planning helpers and the independent
    * cross-check HilbertSpec verifies the Column tree against.
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
