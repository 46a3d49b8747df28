package graft

import org.apache.spark.sql.functions._

/** Runtime skew mitigation — the third leg of the engine's skew story:
  * q225 DETECTS hot join keys, q75's salting is the STATIC fix (rewrite
  * the join around (key, salt) sub-keys), and AQE's skew-join split is
  * the RUNTIME fix — the shuffle-stage statistics flag an oversized
  * partition and the planner splits it across several tasks, joining
  * each slice against a duplicated copy of the matching right-side
  * partition. No query rewrite, no salt column; the split happens below
  * the DataFrame API.
  *
  * This spec pins that the engine's session shape actually gets that
  * behavior from Spark (thresholds scaled down to test size): the final
  * adaptive plan marks the SMJ `skew=true`, and the per-key results are
  * bit-identical to the expected counts — the split must change the
  * schedule, never the answer.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed SMJ partition (skew=true) without changing results") {
    val tuned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      // a 100 TB fact-fact join has no broadcastable side
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8",
      // scale the production defaults (256m threshold / 64m advisory)
      // down to test-corpus size so the hot partition trips them
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // textbook hot key: key 7 carries 50k padded rows (~6 MB in one
      // shuffle partition), 50 cold keys carry 20 rows each
      val pad = "x" * 100
      val left = spark.range(0, 50000)
        .select(lit(7L).as("k"), concat(lit(pad), col("id")).as("payload"))
        .unionByName(spark.range(0, 1000)
          .select((pmod(col("id"), lit(50L)) + 100L).as("k"),
            concat(lit(pad), col("id")).as("payload")))
      val right = spark.range(0, 200).select(col("id").as("k"),
        concat(lit("label_"), col("id")).as("label"))
      // aggregate on the RIGHT side's label, not the join key: a
      // downstream agg keyed on the join key would REUSE the join's
      // partitioning, and AQE (forceOptimizeSkewedJoin=false) refuses
      // a split that costs an extra shuffle. Summing payload length
      // also keeps the wide column flowing through the shuffle, as a
      // real enrichment join would.
      val agg = left.join(right, "k")
        .groupBy("label").agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("bytes"))
      val rows = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // results first: hot key intact, every cold key intact
      assert(rows("label_7") == 50000L, s"hot key must keep all rows: $rows")
      assert((100L until 150L).forall(k => rows(s"label_$k") == 20L),
        s"cold keys: $rows")
      assert(rows.size == 51)
      // and the FINAL adaptive plan must have split the hot partition
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"expected a finalized AQE plan:\n$p")
      assert("SortMergeJoin.*skew=true".r.findFirstIn(p).isDefined,
        s"expected the SMJ to be marked skew=true in the final plan:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
