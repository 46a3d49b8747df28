package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join pattern for repeated large-x-large
  * joins at 100 TB. Both sides written `bucketBy(N, key)` agree on
  * partitioning at READ time, so the join plans with ZERO exchanges —
  * the shuffle is paid once at write time, then amortized over every
  * subsequent join on the bucket key.
  */
class BucketedJoinSpec extends SparkSpec {

  test("joins on the bucket key plan with no Exchange on either side") {
    // explicit external-table paths: the (static) warehouse dir is never
    // touched, and the temp dir vanishes with the test host
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val sf = "/root/testdata/sf0.001"
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    // at test scale the optimizer would broadcast the small side and the
    // bucketing would never be exercised; a 100 TB fact-fact join has no
    // broadcastable side, which is the case bucketing exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle: the only allowed exchange is
      // the one feeding the final aggregation
      assert(p.contains("Join"), s"expected a join node in the plan:\n$p")
      val joinPart = p.substring(p.indexOf("Join"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join must read co-located buckets, not shuffle:\n$p")
      // and it still returns the right answer
      val viaPlain = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaBucketed = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBucketed == viaPlain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      // the external-table data dirs survive DROP TABLE; remove them
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }
  }
}
