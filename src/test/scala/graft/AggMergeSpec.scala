package graft

import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance (q109): rolling up stored
  * per-(type, day) partials must equal aggregating the raw data — the
  * algebraic-aggregate law the nightly partial-merge pipeline relies on.
  */
class AggMergeSpec extends SparkSpec {

  test("q109: merged partial state == direct aggregation over raw events") {
    val sf = "/root/testdata/sf0.001"
    val merged = SparkEntry.queries("q109_mv_rollup")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val direct = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        min("cents").as("mn"), max("cents").as("mx"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(merged == direct)
  }
}
