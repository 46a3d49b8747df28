package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: SCD Type-2 dimension building and
  * MERGE (upsert + delete) application — the warehouse maintenance
  * layer over the engine's delta machinery ([[DeltaOps]] finds what
  * changed; these apply it).
  *
  * The reference's pipeline is insert-only (`DeltaOps` scaladoc, T5);
  * SCD2/MERGE are the general forms a 100 TB lakehouse needs.
  *
  * Scale shapes:
  *  - [[scd2]] is ONE shuffle on the business key; all three window
  *    passes (change collapse, validity lead, version number) reuse the
  *    same (key, order) partitioning, and per-key state is bounded by
  *    that key's change count, never the table.
  *  - [[mergeApply]] is one co-keyed full-outer join; the batch side is
  *    a delta (small), so AQE broadcast-joins it against the snapshot —
  *    the snapshot is never re-shuffled just to apply a day's changes.
  */
object CdcOps {

  /** Build an SCD Type-2 dimension from a change stream.
    *
    * `changes` rows are (keyCol, attrCol, tsCol, seqCol) change records;
    * (tsCol, seqCol) totally orders each key's history. Consecutive
    * records with an unchanged attribute are collapsed (no-op changes
    * produce no version); each surviving change opens a version valid
    * from its timestamp until the next change (null = still open).
    *
    * Returns (keyCol, attr, valid_from, valid_to, version, is_current).
    */
  def scd2(changes: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, seqCol: String): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy(tsCol, seqCol)
    val collapsed = changes
      .withColumn("_prev", lag(col(attrCol), 1).over(wOrd))
      .where(col("_prev").isNull || col("_prev") =!= col(attrCol))
    collapsed
      .withColumn("valid_to", lead(col(tsCol), 1).over(wOrd))
      .withColumn("version", row_number().over(wOrd).cast("long"))
      .select(col(keyCol), col(attrCol).as("attr"),
        col(tsCol).as("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Derive the MERGE batch that turns `oldSnap` into `newSnap` — the
    * inverse of [[mergeApply]]: added keys become I, removed keys D,
    * changed values U ([[QualityOps.snapshotDiff]] finds them; this
    * maps status → op). The round-trip law
    * `mergeApply(old, cdcFeed(old, new)) == new` is spec-asserted —
    * the CDC loop closes: diff two snapshots once, replay the feed
    * anywhere.
    */
  def cdcFeed(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
              valCol: String): DataFrame =
    QualityOps.snapshotDiff(oldSnap, newSnap, keyCol, valCol)
      .select(col(keyCol), col("new_v").as(valCol),
        when(col("status") === "added", lit("I"))
          .when(col("status") === "removed", lit("D"))
          .otherwise(lit("U")).as("op"))

  /** Apply a MERGE batch to a keyed snapshot.
    *
    * `batch` rows are (keyCol, valCol, opCol) with op in {I, U, D}:
    * inserts and updates land the batch value (an upsert — I vs U only
    * differ for audit), deletes drop the key. Snapshot rows not named
    * by the batch pass through unchanged. Returns the next snapshot
    * (keyCol, valCol).
    */
  def mergeApply(snapshot: DataFrame, batch: DataFrame, keyCol: String,
                 valCol: String, opCol: String): DataFrame = {
    val s = snapshot.select(col(keyCol), col(valCol).as("_snap_v"))
    val b = batch.select(col(keyCol), col(valCol).as("_batch_v"), col(opCol).as("_op"))
    s.join(b, Seq(keyCol), "full_outer")
      .where(col("_op").isNull || col("_op") =!= "D")
      .select(col(keyCol),
        coalesce(col("_batch_v"), col("_snap_v")).as(valCol))
  }
}
