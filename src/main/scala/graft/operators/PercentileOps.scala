package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe percentile operators.
  *
  * The exact `percentile()` aggregate (q51) is a sort-based
  * ObjectHashAggregate that buffers EVERY value of a group in one
  * aggregation buffer — correct, but at 100 TB a single hot group
  * (~billions of doubles) OOMs one executor. These operators trade that
  * for bounded state:
  *
  *  - [[histogramQuantiles]]: EXACT discrete quantiles over a quantized
  *    value domain. State and shuffle volume are O(distinct quantized
  *    values per group) — for bounded domains (prices, durations,
  *    scores) this is thousands of cells regardless of row count, and
  *    the map-side partial `count` collapses the row volume before the
  *    shuffle. Fully deterministic, so it hash-matches a SQL oracle.
  *  - [[approxQuantiles]]: Spark's native `approx_percentile`
  *    (Greenwald–Khanna sketch), rank error ≤ N/accuracy with
  *    O(accuracy · log N) state — the right tool when the value domain
  *    is unbounded/continuous. Mergeable sketch → partial aggregation
  *    works; no driver-side collection.
  *
  * Rule of thumb (also on q51's scaladoc): exact `percentile()` only
  * when max group row-count is known-bounded (≲10M values/group);
  * histogram for bounded domains; GK sketch otherwise.
  */
object PercentileOps {

  /** Exact "lower" (type-1) quantiles over values quantized to
    * `decimals` decimal places: the smallest quantized value whose
    * cumulative count reaches `ceil(p * total)`.
    *
    * Plan shape: map-side partial count → shuffle of (group, qval)
    * cells → per-group running-sum window over the cells → conditional
    * min. Rows never cross the wire; only distinct cells do.
    */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         probs: Seq[(String, Double)],
                         decimals: Int): DataFrame =
    histogramQuantilesFromCells(
      histogramCellCounts(df, groupCol, valueCol, decimals), groupCol, probs)

  /** [[histogramQuantiles]]'s sufficient statistics, MERGEABLE across
    * shards: per (group, quantized cell), the row count. Counts add, so
    * state(A) ⊕ state(B) == state(A ∪ B) — shards histogram
    * independently and fold by [[histogramMergeCells]] (q187 certifies
    * the law against the direct q56 oracle). This is how a
    * 1000-executor cluster computes exact quantiles nightly: each
    * partition ships its cells, never its rows, and yesterday's state
    * folds with today's increment.
    */
  def histogramCellCounts(df: DataFrame, groupCol: String, valueCol: String,
                          decimals: Int): DataFrame = {
    val f = math.pow(10, decimals)
    val qval = (floor(col(valueCol) * f) / f).as("qval")
    df.groupBy(col(groupCol), qval).agg(count(lit(1)).as("cnt"))
  }

  /** Fold two [[histogramCellCounts]] frames: cell counts add. */
  def histogramMergeCells(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol), col("qval"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Derive the quantiles from a (possibly merged) cell frame. */
  def histogramQuantilesFromCells(cells: DataFrame, groupCol: String,
                                  probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty, "need at least one probability")
    val wCum = Window.partitionBy(groupCol).orderBy("qval")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val ranked = cells
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(wAll))
    val aggs: Seq[Column] = probs.map { case (name, p) =>
      min(when(col("cum") >= ceil(col("total") * p), col("qval"))).as(name)
    }
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** EXACT linearly-interpolated quantiles (`percentile_cont`
    * semantics, bit-identical to Spark's `percentile()` built-in) with
    * a SPILL-SAFE distributed plan: map-side partial count collapses
    * duplicate values, the per-group cumulative count runs over a
    * sort-based window (sorts spill to disk; `percentile()`'s
    * ObjectHashAggregate buffer does not — the q51 100 TB hazard), and
    * each requested quantile reduces to the two order statistics
    * bracketing rank p·(n−1) plus the interpolation fraction. Shuffle
    * volume is distinct (group, value) cells, never raw rows.
    *
    * result = x_lo + (r − ⌊r⌋)·(x_hi − x_lo), the exact expression the
    * built-in evaluates — IEEE-identical, so oracles written against
    * `percentile()`/`quantile_cont` keep matching.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     probs: Seq[(String, Double)]): DataFrame = {
    require(probs.nonEmpty, "need at least one probability")
    // percentile() ignores null values (they don't count toward n);
    // without this filter nulls would sort first and shift every rank
    val cells = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val ranked = cells
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(wAll))
    val aggs: Seq[Column] = probs.flatMap { case (name, p) =>
      val r = lit(p) * (col("total") - 1).cast("double")
      val loIdx = floor(r)
      val hiIdx = ceil(r)
      // exactly one cell brackets each index: cum - cnt <= idx < cum
      Seq(
        min(when(col("cum") - col("cnt") <= loIdx && loIdx < col("cum"), col("v")))
          .as(s"_lo_$name"),
        min(when(col("cum") - col("cnt") <= hiIdx && hiIdx < col("cum"), col("v")))
          .as(s"_hi_$name"),
        // r and loIdx are per-group constants; min() just picks them up
        min(r - loIdx.cast("double")).as(s"_frac_$name"))
    }
    val agged = ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
    val outs = probs.map { case (name, _) =>
      (col(s"_lo_$name") +
        col(s"_frac_$name") * (col(s"_hi_$name") - col(s"_lo_$name"))).as(name)
    }
    agged.select(col(groupCol) +: outs: _*)
  }

  /** EXACT global NTILE(k) over the total order (valueCol, idCol)
    * WITHOUT a global row sort: the single-partition window a naive
    * `ntile(k) OVER (ORDER BY v, id)` needs is the classic 100 TB
    * scale-killer (every row through one task). Instead:
    *
    *  1. distinct-VALUE cells get cumulative counts (the q51/q56
    *     machinery — the only unpartitioned window runs over distinct
    *     cells, bounded by the value domain, not the row count);
    *  2. each row's global rank = rows strictly below its value
    *     (from the cell running sum) + its row_number within its value
    *     partition (bounded by the duplicate count of that value);
    *  3. the NTILE bucket is pure integer arithmetic on (rank, N, k):
    *     the first N mod k buckets take ⌈N/k⌉ rows, the rest ⌊N/k⌋ —
    *     exactly the SQL NTILE contract.
    *
    * Returns (idCol, valueCol, rank, bin), rank 1-based, bin in [1, k].
    *
    * The "bounded by the value domain" premise of step 1 is ENFORCED,
    * not assumed: past `maxCells` distinct values the query raises at
    * execution with the quantize-first remedy ([[CellGuard]]) instead
    * of silently collapsing a row-scale column onto one task.
    */
  def ntileExact(df: DataFrame, valueCol: String, idCol: String,
                 k: Int, maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rows = df.select(col(idCol), col(valueCol).as("v"))
    val cells = rows.groupBy("v").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val starts = cells.withColumn("cum", sum("cnt").over(wCum))
      .withColumn("_cell_rn", row_number().over(Window.orderBy("v")))
      .select(col("v"),
        (CellGuard.guarded(col("cum"), col("_cell_rn"), maxCells, "ntileExact")
          - col("cnt")).as("below"))
    val nTotal = rows.agg(count(lit(1)).as("n_total"))
    val wIn = Window.partitionBy("v").orderBy(idCol)
    val ranked = rows.withColumn("rn_in", row_number().over(wIn))
      .join(starts, "v")
      .crossJoin(broadcast(nTotal))
      .withColumn("rank", col("below") + col("rn_in"))
    val bin = {
      val q = expr(s"n_total div $k")
      val rem = expr(s"n_total % $k")
      val bigSpan = (q + 1) * rem // rows living in the (q+1)-sized buckets
      when(col("rank") <= bigSpan,
        expr(s"(rank - 1) div (n_total div $k + 1) + 1"))
        .otherwise(expr(
          s"n_total % $k + (rank - 1 - (n_total div $k + 1) * (n_total % $k)) div (n_total div $k) + 1"))
    }
    ranked.select(col(idCol), col("v").as(valueCol), col("rank"),
      bin.cast("long").as("bin"))
  }

  /** Quantile normalization: map every value onto the GLOBAL value at
    * the same within-group percentile — the batch-effect correction
    * that makes per-source distributions comparable (a verbose source's
    * p90 length becomes the corpus's p90 length). Standard in
    * bioinformatics (Bolstad 2003) and feature pipelines.
    *
    * Plan shape, all bounded:
    *  1. within-group percentile = row_number / group size, quantized
    *     to `levels` basis points (per-group window — bounded by the
    *     hottest group, the q102 skew bound);
    *  2. the global distribution reduces to distinct-value cells with
    *     cumulative counts (the only unpartitioned window runs over
    *     cells);
    *  3. a `levels`-row lookup table (bp -> global value) materializes
    *     via the bucketed [[JoinOps.rangeJoin]] of required ranks
    *     against cell intervals, then broadcasts back onto the rows.
    * Rows shuffle once (the group window); everything else is cells,
    * levels, and broadcasts.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String, levels: Int = 10000,
                        maxCells: Long = CellGuard.DefaultMaxCells): DataFrame = {
    require(levels >= 1, s"levels must be >= 1, got $levels")
    val rows = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"), col(idCol).as("_id"))
    val wRank = Window.partitionBy("g").orderBy("v", "_id")
    val wN = Window.partitionBy("g")
    val ranked = rows
      .withColumn("r", row_number().over(wRank).cast("long"))
      .withColumn("n_g", count(lit(1)).over(wN))
      .withColumn("rank_bp",
        greatest(lit(1L), expr(s"(r * $levels) div n_g")))
    val cells = rows.groupBy("v").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cum", sum("cnt").over(wCum))
      .withColumn("_cell_rn", row_number().over(Window.orderBy("v")))
      // step 2's domain-bound, enforced (CellGuard): a row-scale value
      // column fails loudly instead of one-task-ing the cell window
      .withColumn("cum",
        CellGuard.guarded(col("cum"), col("_cell_rn"), maxCells, "quantileNormalize"))
      .drop("_cell_rn")
      .withColumn("lo", col("cum") - col("cnt") + 1L)
    // n_total folds from the domain-bounded cell frame, not a second
    // scan of the input rows; this `cells` subtree is canonically
    // identical to cum's, so AQE reuses one shuffle stage
    val nTotal = cells.agg(sum("cnt").as("n_total"))
    val levelsDf = df.sparkSession.range(1, levels + 1)
      .select(col("id").as("bp"))
      .crossJoin(broadcast(nTotal))
      .withColumn("r_req", expr(s"(bp * n_total + ${levels - 1}) div $levels"))
    val lookup = JoinOps.rangeJoin(levelsDf,
      cum.select(col("v").as("norm_v"), col("lo"), col("cum")),
      "r_req", "lo", "cum", bucketWidth = 1024L)
      .select(col("bp").as("rank_bp"), col("norm_v"))
    ranked.join(broadcast(lookup), "rank_bp")
      .select(col("_id").as(idCol), col("g").as(groupCol),
        col("v").as(valueCol), col("rank_bp"),
        col("norm_v").as("normalized"))
  }

  /** Greenwald–Khanna sketch quantiles (`approx_percentile`): bounded
    * mergeable state, rank error ≤ group-size / `accuracy`. Returns one
    * row per group with one column per requested (name, prob).
    */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      probs: Seq[(String, Double)],
                      accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty, "need at least one probability")
    val arr = s"array(${probs.map(p => s"${p._2}D").mkString(", ")})"
    val sketched = df.groupBy(col(groupCol))
      .agg(expr(s"approx_percentile($valueCol, $arr, $accuracy)").as("qs"))
    val cols = col(groupCol) +: probs.zipWithIndex.map { case ((name, _), i) =>
      element_at(col("qs"), i + 1).as(name)
    }
    sketched.select(cols: _*)
  }
}
