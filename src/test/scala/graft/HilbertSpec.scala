package graft

import graft.functions.{Hilbert, ZOrder}
import org.apache.spark.sql.functions._

/** The three facts the Hilbert layout family (q269) rests on, proved
  * exhaustively on whole grids rather than sampled:
  *
  *  1. the Column tree is the curve — it agrees with an independent
  *     plain-JVM walk on every cell of every grid up to 64×64, is a
  *     bijection onto [0, n²), and
  *  2. it is ADJACENCY-PRESERVING: every pair of consecutive curve
  *     positions is a 4-neighbour grid step — the locality property
  *     the Morton curve provably lacks (511 of 1023 steps jump on the
  *     32×32 grid), and
  *  3. the property CASHES OUT under equal-ROW file cuts over skewed
  *     data: the Hilbert layout's files-hit for a quadrant-straddling
  *     box is strictly below the Morton layout's on the same cells,
  *     same cuts, same audit — while 4^k-ALIGNED cuts tie exactly
  *     (both curves make square blocks), which is why q242 alone could
  *     never have chosen between the curves.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def gridDf(bits: Int) = {
    val n = 1 << bits
    spark.range(n.toLong * n)
      .select(expr(s"id div $n").as("x"), pmod(col("id"), lit(n.toLong)).as("y"))
  }

  /** INDEPENDENT witness: the same xy→d walk unrolled into a `when`
    * Column tree — different mechanics from the expression's generated
    * static call (this is the implementation the engine USED before the
    * native expression replaced it for plan-size reasons; kept here as
    * the cross-check that `eval`, codegen, and the unrolled tree all
    * compute one function).
    */
  private def unrolledTree(x0: org.apache.spark.sql.Column,
                           y0: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column = {
    val n = 1L << bits
    var x = x0.cast("long"); var y = y0.cast("long")
    var d: org.apache.spark.sql.Column = lit(0L)
    var s = n >> 1
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      d = d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      val xr = when(rx === lit(1L), lit(n - 1) - x).otherwise(x)
      val yr = when(rx === lit(1L), lit(n - 1) - y).otherwise(y)
      val nx = when(ry === lit(0L), yr).otherwise(x)
      val ny = when(ry === lit(0L), xr).otherwise(y)
      x = nx; y = ny
      s >>= 1
    }
    d
  }

  test("hilbertIndex: native expression == independent unrolled tree, bijective, for bits 1..6") {
    for (bits <- 1 to 6) {
      val n = 1 << bits
      val rows = gridDf(bits)
        .select(col("x"), col("y"),
          Hilbert.hilbertIndex(col("x"), col("y"), bits).as("d"),
          unrolledTree(col("x"), col("y"), bits).as("dTree"))
        .collect()
      assert(rows.length == n * n)
      rows.foreach { r =>
        val (x, y, d, dTree) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2), r.getLong(3))
        assert(d == dTree, s"bits=$bits ($x,$y): expression=$d unrolled=$dTree")
        assert(d == Hilbert.hilbertIndexLocal(n, x, y),
          s"bits=$bits ($x,$y): codegen=$d eval-kernel=${Hilbert.hilbertIndexLocal(n, x, y)}")
      }
      val ds = rows.map(_.getLong(2)).sorted
      assert(ds.head == 0L && ds.last == n.toLong * n - 1 && ds.distinct.length == n * n,
        s"bits=$bits: not a bijection onto [0, n^2)")
    }
  }

  test("hilbertIndex: the canonical 4x4 path, hand-pinned") {
    // the published orientation of the Wikipedia xy2d walk: d = 0 starts
    // at the origin, first quadrant is traversed transposed
    val expected = Seq(
      (0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3), (1, 2),
      (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1), (2, 0), (3, 0))
    expected.zipWithIndex.foreach { case ((x, y), d) =>
      assert(Hilbert.hilbertIndexLocal(4, x, y) == d.toLong,
        s"($x,$y) must sit at curve position $d")
    }
  }

  test("adjacency: consecutive Hilbert positions are 4-neighbours; Morton jumps on half its steps") {
    val bits = 5
    val n = 1 << bits
    def walk(key: (Int, Int) => Long): Seq[(Int, Int)] =
      (for (x <- 0 until n; y <- 0 until n) yield (key(x, y), x, y))
        .sortBy(_._1).map(t => (t._2, t._3))
    def jumps(path: Seq[(Int, Int)]): Int =
      path.sliding(2).count { case Seq((x0, y0), (x1, y1)) =>
        math.abs(x0 - x1) + math.abs(y0 - y1) != 1
      }
    def zLocal(x: Int, y: Int): Long =
      (0 until bits).map(b => (((x >> b) & 1).toLong << (2 * b)) | (((y >> b) & 1).toLong << (2 * b + 1))).sum
    assert(jumps(walk((x, y) => Hilbert.hilbertIndexLocal(n, x, y))) == 0,
      "every consecutive Hilbert step must be a unit grid move")
    assert(jumps(walk(zLocal)) == 511,
      "the Morton curve's non-adjacent step count on 32x32 is a fixed fact (511/1023)")
  }

  test("equal-row file cuts: Hilbert envelopes beat Morton on a straddling box; aligned cuts tie") {
    val n = 32
    // skewed deterministic per-cell density — boundaries land off-alignment
    def cnt(x: Int, y: Int): Long = 1L + (x * 7 + y * 13) % 9 + (if ((x * 31 + y * 17) % 11 == 0) 6 else 0)
    def zLocal(x: Int, y: Int): Long =
      (0 until 5).map(b => (((x >> b) & 1).toLong << (2 * b)) | (((y >> b) & 1).toLong << (2 * b + 1))).sum
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y, cnt(x, y))
    val total = cells.map(_._3).sum
    val box = (3 * n / 8, 5 * n / 8 - 1) // straddles the grid midline

    def filesHit(key: (Int, Int) => Long, target: Long): Int = {
      var cum = 0L
      val files = scala.collection.mutable.Map.empty[Long, (Int, Int, Int, Int)]
      cells.sortBy(c => key(c._1, c._2)).foreach { case (x, y, c) =>
        val f = cum / target; cum += c
        val (x0, x1, y0, y1) = files.getOrElse(f, (n, -1, n, -1))
        files(f) = (math.min(x0, x), math.max(x1, x), math.min(y0, y), math.max(y1, y))
      }
      files.values.count { case (x0, x1, y0, y1) =>
        x0 <= box._2 && x1 >= box._1 && y0 <= box._2 && y1 >= box._1
      }
    }
    // equal-ROW cuts (the production shape): Hilbert strictly wins
    val rowTarget = (total + 63) / 64
    val h = filesHit((x, y) => Hilbert.hilbertIndexLocal(n, x, y), rowTarget)
    val z = filesHit(zLocal, rowTarget)
    assert(h < z, s"hilbert files_hit ($h) must beat zorder ($z) under equal-row cuts")
    // 4^k-ALIGNED cuts (16 cells/file on the uniform grid): exact tie —
    // both curves cut into the same 4x4 quadrants
    def filesHitAligned(key: (Int, Int) => Long): Int = {
      val files = scala.collection.mutable.Map.empty[Long, (Int, Int, Int, Int)]
      cells.foreach { case (x, y, _) =>
        val f = key(x, y) / 16
        val (x0, x1, y0, y1) = files.getOrElse(f, (n, -1, n, -1))
        files(f) = (math.min(x0, x), math.max(x1, x), math.min(y0, y), math.max(y1, y))
      }
      files.values.count { case (x0, x1, y0, y1) =>
        x0 <= box._2 && x1 >= box._1 && y0 <= box._2 && y1 >= box._1
      }
    }
    val ha = filesHitAligned((x, y) => Hilbert.hilbertIndexLocal(n, x, y))
    val za = filesHitAligned(zLocal)
    assert(ha == za, s"aligned 16-cell cuts must tie (both are 4x4 blocks): hilbert=$ha zorder=$za")
  }
}
