package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities.
  *
  * AQE's skew-join split handles most runtime skew automatically; explicit
  * salting is for the pathological case it can't fix — a HOT KEY on the
  * build side of a shuffled hash/sort-merge join whose single partition
  * exceeds executor memory. Salting fans each big-side row of a key out to
  * `saltFactor` sub-keys and replicates the matching small-side rows, so
  * the hot key's work spreads over `saltFactor` tasks.
  */
object JoinOps {

  /** Equi-join `big ⋈ small` on `key`, salted `saltFactor` ways.
    *
    * The big side's salt is derived from a hash of the whole row (not
    * `rand()`), so the plan stays deterministic and re-executable — a task
    * retry lands every row in the same salt bucket. The small side is
    * replicated `saltFactor`× via explode (small by definition, so the
    * replication is bounded).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val bigCols = big.columns.toSeq
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(bigCols.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Point-in-interval range join via bucketing: `points ⋈ intervals ON
    * lo <= pt <= hi` (inclusive both ends).
    *
    * A naive range join is a broadcast-nested-loop (O(|P|·|I|) — dead at
    * scale). Bucketing turns it into an EQUI-join: each point maps to
    * exactly one `bucketWidth`-wide bucket, each interval explodes to the
    * buckets it overlaps, the join runs hash-partitioned on bucket id,
    * and the exact `BETWEEN` predicate filters survivors post-join. No
    * duplicates by construction (a point lives in one bucket; an
    * interval covers that bucket at most once).
    *
    * Cost: intervals replicate ~`len/bucketWidth + 1`× — pick the width
    * near the MEDIAN interval length so replication stays O(1). Point
    * clustering shows up as bucket skew; compose with AQE's skew split
    * or [[saltedEquiJoin]] on `_bkt` for pathological hot windows.
    *
    * `ptCol`/`loCol`/`hiCol` must be numeric (cast timestamps to epoch
    * first); the two frames' column names must be disjoint.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, ptCol: String,
                loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bkt",
      floor(col(ptCol).cast("double") / bucketWidth).cast("long"))
    val i = intervals.withColumn("_bkt", explode(sequence(
      floor(col(loCol).cast("double") / bucketWidth).cast("long"),
      floor(col(hiCol).cast("double") / bucketWidth).cast("long"))))
    p.join(i, Seq("_bkt"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bkt")
  }

  /** As-of join: attach to every left row the `valueCol` of the LATEST
    * right row with `right.ts <= left.ts` for the same key (inclusive);
    * null when no prior right row exists.
    *
    * Spark has no ASOF JOIN; the naive encoding — range join + per-row
    * max — explodes to |left|×|right-per-key| rows. This is the
    * UNION+WINDOW pattern instead: tag both sides, union, and take the
    * running `last(value, ignoreNulls)` per key in (ts, side) order —
    * right rows sort before left rows at equal ts, making the match
    * inclusive. ONE shuffle on the key, zero row amplification, state
    * bounded by the window frame (running, not unbounded-following).
    *
    * Ties between two right rows at identical (key, ts) resolve to the
    * larger `valueCol` (final sort key) for determinism.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    val payloadType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val l = left.select(
      col(keyCol).as("_k"), col(tsCol).as("_ts"), lit(1).as("_side"),
      lit(null).cast(valueType).as("_v"),
      struct(left.columns.map(col).toSeq: _*).as("_payload"))
    val r = right.select(
      col(keyCol).as("_k"), col(tsCol).as("_ts"), lit(0).as("_side"),
      col(valueCol).cast(valueType).as("_v"),
      lit(null).cast(payloadType).as("_payload"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_v"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_payload.*"), col("_asof").as(valueCol))
  }

  /** FUZZY ENTITY MATCHING: approximate string join via blocking + exact
    * Levenshtein verification — the entity-resolution shape (catalog
    * reconciliation, typo'd identifiers) a nested-loop distance join
    * cannot survive at scale.
    *
    * Blocking key = (last `blockLen` characters, length within
    * `maxDist`): candidates form ONLY within a block, so the quadratic
    * verify is bounded by block size, never table size — the same
    * guard-then-verify shape as the MinHash family. Recall bound is
    * explicit and documented: a typo inside the last `blockLen`
    * characters (or a length change > maxDist) escapes the block;
    * production pipelines union several block keys (prefix, suffix,
    * phonetic) exactly like LSH unions bands.
    *
    * Returns (left id, right id, both names, dist <= maxDist).
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftId: String, leftName: String,
                rightId: String, rightName: String,
                maxDist: Int = 1, blockLen: Int = 3): DataFrame = {
    // right(name, blockLen) semantics: a name SHORTER than blockLen blocks
    // on the whole string (substring(name, -blockLen) would yield "" and
    // collapse every short name into one giant block).
    def blk(c: Column): Column =
      c.substr(greatest(lit(1), length(c) - lit(blockLen - 1)), lit(blockLen))
    val lb = left.select(col(leftId).as("left_id"), col(leftName).as("left_name"),
      blk(col(leftName)).as("_blk_l"),
      length(col(leftName)).as("_ln_l"))
    val rb = right.select(col(rightId).as("right_id"), col(rightName).as("right_name"),
      blk(col(rightName)).as("_blk_r"),
      length(col(rightName)).as("_ln_r"))
    lb.join(rb, col("_blk_l") === col("_blk_r") &&
        abs(col("_ln_l") - col("_ln_r")) <= maxDist)
      .withColumn("dist", levenshtein(col("left_name"), col("right_name")))
      .where(col("dist") <= maxDist)
      .select("left_id", "right_id", "left_name", "right_name", "dist")
  }

  /** INTERVAL × INTERVAL overlap join — the generalization of
    * [[rangeJoin]] (point-in-interval) to two interval sets: pairs
    * with strictly positive overlap, plus the overlap length.
    *
    * `a` must have columns (a_id, a_start, a_end), `b` (b_id, b_start,
    * b_end), integer endpoints. The naive formulation is a
    * BroadcastNestedLoopJoin on the overlap predicate — quadratic. Here
    * each interval explodes to the coarse buckets it covers (bounded by
    * span/bucketSize), candidates equi-join per bucket, the exact
    * predicate filters, and the pair distinct-s away multi-bucket
    * duplicates — the standard time/genomic-interval join shape. Pick
    * `bucketSize` near the typical interval span: too small multiplies
    * the explode, too large degrades toward all-pairs per bucket.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          bucketSize: Long): DataFrame = {
    require(bucketSize >= 1L, s"bucketSize must be >= 1, got $bucketSize")
    def expand(df: DataFrame, s: String, e: String) =
      df.withColumn("_bucket",
        explode(sequence(expr(s"$s div $bucketSize"), expr(s"$e div $bucketSize"))))
    expand(a, "a_start", "a_end")
      .join(expand(b, "b_start", "b_end"), Seq("_bucket"))
      .where(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap"))
      .distinct()
  }
}
