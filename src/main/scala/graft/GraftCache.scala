package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of DataFrames persisted INSIDE library
  * operators (LSH sketch tables, shingle tables, hyperplane keys).
  *
  * Those caches back multiple branches of a still-lazy returned plan, so
  * the operator itself can never unpersist them — only the caller knows
  * when the result has been materialized. Contract: after consuming an
  * operator's output (write/collect/count), call
  * [[GraftCache.releaseAll]] to drop every operator-held cache block.
  * `Verify` and `Bench` do this between queries; a long-lived
  * application should do it per pipeline stage. Idempotent and safe to
  * call while nothing is registered.
  */
object GraftCache {

  private val frames =
    new ConcurrentHashMap[SparkSession, java.util.Queue[DataFrame]]()
  private val rdds =
    new ConcurrentHashMap[SparkSession, java.util.Queue[org.apache.spark.rdd.RDD[_]]]()

  /** Register an operator-persisted frame for later release. */
  private[graft] def register(df: DataFrame): DataFrame = {
    frames
      .computeIfAbsent(df.sparkSession,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
      .add(df)
    df
  }

  /** Register an operator-persisted RDD (iterative operators like
    * connected components persist their per-round state as RDDs, not
    * frames). Results derived from it stay recomputable after release:
    * lineage re-reads the final round's shuffle files. EXCEPTION:
    * [[graft.operators.GraphOps.kCore]] on deep (>= 10 round) peels
    * localCheckpoints its state, so ITS result must be consumed before
    * release — see the consumption contract in its scaladoc.
    */
  private[graft] def registerRdd[T](spark: SparkSession,
                                    rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] = {
    rdds
      .computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]())
      .add(rdd)
    rdd
  }

  /** Unpersist every registered frame/RDD for `spark` (non-blocking). */
  def releaseAll(spark: SparkSession): Unit = {
    val q = frames.remove(spark)
    if (q != null) {
      var df = q.poll()
      while (df != null) { df.unpersist(false); df = q.poll() }
    }
    val r = rdds.remove(spark)
    if (r != null) {
      var rdd = r.poll()
      while (rdd != null) { rdd.unpersist(false); rdd = r.poll() }
    }
  }

  /** Number of registered (not yet released) frames/RDDs — for tests. */
  private[graft] def registeredCount(spark: SparkSession): Int = {
    val q = frames.get(spark)
    val r = rdds.get(spark)
    (if (q == null) 0 else q.size()) + (if (r == null) 0 else r.size())
  }
}
