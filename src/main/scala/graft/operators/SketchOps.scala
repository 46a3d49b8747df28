package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column: the fixed-size, MERGEABLE
  * frequency summary a 100 TB pipeline keeps when exact per-key counts
  * are too big to retain (Cormode & Muthukrishnan, J. Algorithms 2005).
  *
  * The sketch is a (depth x width) grid of counters; row k counts
  * collisions of h_k(key). Point estimate = min over rows — always an
  * OVERestimate (collisions only add), within eps*N with probability
  * 1 - delta for width = e/eps, depth = ln(1/delta).
  *
  * Scale shape: building is one map-side-combinable aggregation over
  * (k, bucket) — the shuffle carries at most depth*width rows per
  * partition regardless of input size. Sketches MERGE by elementwise
  * sum (same (k, bucket) grid), so per-day/per-shard sketches roll up
  * without touching raw data — the materialized-view-maintenance shape,
  * asserted in SketchOpsSpec.
  *
  * Hashing is [[HashFunctions.portableHash60]] (md5-based) so the exact
  * same sketch is derivable in any engine — the DuckDB oracle rebuilds
  * it bit-for-bit (q103).
  */
object SketchOps {

  private def bucketed(rows: DataFrame, keyCol: String,
                       depth: Int, width: Int): DataFrame = {
    val hashes = (0 until depth).map { k =>
      struct(lit(k).as("h"),
        pmod(HashFunctions.portableHash60(
          concat(lit(s"$k:"), col(keyCol).cast("string"))), lit(width.toLong))
          .as("bucket"))
    }
    rows.select(col(keyCol), explode(array(hashes: _*)).as("hb"))
      .select(col(keyCol), col("hb.h").as("h"), col("hb.bucket").as("bucket"))
  }

  /** Build the sketch: one (h, bucket, n) row per non-empty counter. */
  def cmsBuild(rows: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    bucketed(rows, keyCol, depth, width)
      .groupBy("h", "bucket").agg(count(lit(1)).as("n"))

  /** Merge sketches built with the same (depth, width): elementwise sum. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _).groupBy("h", "bucket")
      .agg(sum("n").as("n"))

  /** Point-estimate the count of every key in `keys`: min over the
    * depth rows of the key's counters. Keys absent from the sketch
    * estimate 0 (all their counters empty).
    */
  def cmsEstimate(cms: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame =
    bucketed(keys, keyCol, depth, width)
      .join(cms, Seq("h", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_n"))
}
