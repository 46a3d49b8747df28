package graft

import graft.sources.BucketedLayout
import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join pattern for repeated large-x-large
  * joins at 100 TB. Both sides written `bucketBy(N, key)` agree on
  * partitioning at READ time, so the join plans with ZERO exchanges —
  * the shuffle is paid once at write time, then amortized over every
  * subsequent join on the bucket key. The same catalog metadata powers
  * bucket pruning: an equality/IN predicate on the bucket column reads
  * only the matching buckets (SelectedBucketsCount in the scan node).
  */
class BucketedJoinSpec extends SparkSpec {

  private def withBucketedTables[A](body: => A): A = {
    // explicit external-table paths: the (static) warehouse dir is never
    // touched, and the temp dir vanishes with the test host
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val sf = "/root/testdata/sf0.001"
    BucketedLayout.writeBucketed(Tables.orders(spark, sf),
      "orders_b", s"$wh/orders_b", 8, "o_orderkey", "o_orderkey")
    BucketedLayout.writeBucketed(Tables.lineitem(spark, sf),
      "lineitem_b", s"$wh/lineitem_b", 8, "l_orderkey", "l_orderkey")
    try body
    finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      // the external-table data dirs survive DROP TABLE; remove them
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }
  }

  test("joins on the bucket key plan with no Exchange on either side") {
    withBucketedTables {
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
        val sf = "/root/testdata/sf0.001"
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
      }
    }
  }

  test("q253 shape: merge hint alone keeps the bucketed join exchange-free") {
    // the contract query can't flip session confs (Bench runs 252 queries
    // in one session), so it relies on hint("merge") to force the SMJ a
    // scale join plans anyway — verify the hint + bucket spec suffice
    // under the DEFAULT broadcast threshold
    withBucketedTables {
      val joined = spark.table("lineitem_b").hint("merge")
        .join(spark.table("orders_b").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"),
        s"merge hint must force a sort-merge join:\n$p")
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"hinted bucketed join must not shuffle either side:\n$p")
    }
  }

  test("q254 shape: bucket-key predicate prunes buckets, agg is exchange-free") {
    // Spark 4's DisableUnnecessaryBucketedScan drops the bucketed scan
    // (and with it the pruning) when NOTHING downstream wants the
    // partitioning — a bare filter reads all 8 buckets. q254's shape
    // (filter + groupBy BOTH on the bucket column) keeps the scan
    // bucketed, so the IN predicate prunes buckets at the source AND
    // the aggregation reuses the bucket partitioning with no exchange.
    withBucketedTables {
      val key = spark.table("orders_b").agg(min("o_orderkey")).head.getLong(0)
      val pruned = spark.table("lineitem_b").where(col("l_orderkey") === key)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      val p = pruned.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(p)
      assert(m.isDefined, s"expected bucket pruning in the scan node:\n$p")
      assert(m.get.group(1).toInt == 1,
        s"a single-key equality must read exactly 1 of 8 buckets:\n$p")
      assert(!p.contains("Exchange"),
        s"groupBy on the bucket column must reuse the bucket partitioning:\n$p")
      // pruning must lose no rows
      val sf = "/root/testdata/sf0.001"
      val expected = Tables.lineitem(spark, sf)
        .where(col("l_orderkey") === key).count()
      assert(pruned.head.getLong(1) == expected)
    }
  }

  test("sizeBuckets reproduces the probe's 8-vs-64 verdict from the rule alone") {
    // the measured table (SCALING.md "Bucketed layout"): 8 buckets was
    // right at sf0.1 and a parallelism collapse at 30×/100×, where 64
    // (2× the 32 cores) built 3.5× faster and joined 3× faster
    assert(BucketedLayout.sizeBuckets(600_000L, 32) == 8)
    assert(BucketedLayout.sizeBuckets(18_000_000L, 32) == 64)
    assert(BucketedLayout.sizeBuckets(60_000_000L, 32) == 64)
    // dust floor: a tiny table never shatters into per-core buckets
    assert(BucketedLayout.sizeBuckets(10_000L, 1024) == 1)
    // task-memory ceiling overrides the 2×-parallelism cap: a
    // trillion-row fact on 8000 cores needs bucket sorts that fit a
    // task, not 16k buckets of 60M rows each. The ceiling rounds UP to
    // the next power of two — flooring 119,210 needed buckets to 65,536
    // would hand each write task ~15M rows, 2x the documented max
    val huge = BucketedLayout.sizeBuckets(1_000_000_000_000L, 8000)
    assert(huge == 131072, s"got $huge")
    assert(1_000_000_000_000L / huge <= (8L << 20),
      "the memory ceiling must HOLD after pow2 rounding")
    // power-of-two counts keep any two layouts coalesceBucketsInJoin-
    // compatible (one count divides the other)
    for (rows <- Seq(1L, 500_000L, 5_000_000L, 123_456_789L);
         par <- Seq(2, 32, 1000)) {
      val n = BucketedLayout.sizeBuckets(rows, par)
      assert(n >= 1 && Integer.bitCount(n) == 1, s"rows=$rows par=$par -> $n")
    }
  }

  test("auditBucketCount warns past the 4x rule violation, stays quiet within tolerance") {
    withBucketedTables {
      // 8 buckets for sf0.001's ~6k lineitem rows: the dust floor
      // answers 1 — an 8x violation, exactly the legacy-table arm the
      // warn exists for (the operator previously had to read SCALING.md
      // to learn their count throttles builds and fact⋈fact joins)
      val warn = BucketedLayout.auditBucketCount(spark, "lineitem_b")
      assert(warn.isDefined && warn.get.contains("lineitem_b") &&
        warn.get.contains("8 buckets"), s"expected a sizing warn, got $warn")
      // the same table under a relaxed tolerance: quiet
      assert(BucketedLayout.auditBucketCount(spark, "lineitem_b", tolerance = 8).isEmpty)
      // an unbucketed table: no spec, no opinion
      spark.range(10).write.mode("overwrite").saveAsTable("plain_t")
      try assert(BucketedLayout.auditBucketCount(spark, "plain_t").isEmpty)
      finally spark.sql("DROP TABLE IF EXISTS plain_t")
    }
  }

  test("mixed join: the unbucketed side shuffles onto numBuckets partitions — the collapse the decision rule guards") {
    // bucketed fact ⋈ fresh unbucketed delta, the commonest production
    // shape: EnsureRequirements keeps the bucketed scan exchange-free
    // and shuffles ONLY the delta — onto exactly numBuckets partitions.
    // Good when numBuckets >= cluster parallelism (half the shuffle for
    // free); at 8 buckets it throttles the whole join to 8 tasks.
    withBucketedTables {
      val sf = "/root/testdata/sf0.001"
      val delta = Tables.orders(spark, sf).limit(500) // unbucketed batch
      val joined = spark.table("lineitem_b").hint("merge")
        .join(delta.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected an SMJ:\n$p")
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      val exchanges = "Exchange hashpartitioning\\([^)]*\\)"
        .r.findAllIn(joinPart).toList
      assert(exchanges.length == 1,
        s"exactly ONE side (the delta) may shuffle, got $exchanges:\n$p")
      assert(exchanges.head.contains("o_orderkey") && exchanges.head.contains(", 8"),
        s"the delta must shuffle onto the 8 bucket partitions: ${exchanges.head}")
    }
  }

  test("mixed join escape hatch: disabling bucketed reads restores conf-width parallelism on both sides") {
    // the decision rule's other arm: numBuckets (8) below the join's
    // target parallelism -> give up the half-shuffle discount, read the
    // bucketed table as plain files, shuffle BOTH sides at conf width
    withBucketedTables {
      val prev = spark.conf.get("spark.sql.sources.bucketing.enabled")
      spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
      try {
        val sf = "/root/testdata/sf0.001"
        val delta = Tables.orders(spark, sf).limit(500)
        val joined = spark.table("lineitem_b").hint("merge")
          .join(delta.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        val p = joined.queryExecution.executedPlan.toString
        val joinPart = p.substring(p.indexOf("SortMergeJoin"))
        val exchanges = "Exchange hashpartitioning\\([^)]*\\)"
          .r.findAllIn(joinPart).toList
        assert(exchanges.length == 2,
          s"both sides must shuffle once bucketing is off, got $exchanges:\n$p")
        val width = spark.conf.get("spark.sql.shuffle.partitions")
        assert(exchanges.forall(_.contains(s", $width")),
          s"both exchanges must run at conf width $width: $exchanges")
      } finally spark.conf.set("spark.sql.sources.bucketing.enabled", prev)
    }
  }

  test("power-of-two layouts coalesce: an 8-bucket x 4-bucket join stays exchange-free") {
    // the empirical justification for sizeBuckets' power-of-two floor:
    // Spark's coalesceBucketsInJoin can co-locate two DIFFERENTLY
    // bucketed tables only when one count divides the other — the
    // larger side's buckets coalesce pairwise onto the smaller count
    // and the join still runs with zero exchanges. Any-two layouts
    // built by the sizing rule therefore join shuffle-free even when
    // built at different corpus sizes.
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val sf = "/root/testdata/sf0.001"
    BucketedLayout.writeBucketed(Tables.lineitem(spark, sf),
      "lineitem_b8", s"$wh/lineitem_b8", 8, "l_orderkey", "l_orderkey")
    BucketedLayout.writeBucketed(Tables.orders(spark, sf),
      "orders_b4", s"$wh/orders_b4", 4, "o_orderkey", "o_orderkey")
    val prev = spark.conf.getOption(
      "spark.sql.bucketing.coalesceBucketsInJoin.enabled")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    try {
      val joined = spark.table("lineitem_b8").hint("merge")
        .join(spark.table("orders_b4").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected an SMJ:\n$p")
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"divisible bucket counts must coalesce, not shuffle:\n$p")
      assert(p.contains("Coalesced"),
        s"the 8-bucket side must read coalesced onto 4:\n$p")
      // and it still returns the right answer
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", v)
        case None => spark.conf.unset("spark.sql.bucketing.coalesceBucketsInJoin.enabled")
      }
      spark.sql("DROP TABLE IF EXISTS lineitem_b8")
      spark.sql("DROP TABLE IF EXISTS orders_b4")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }
  }

  test("ensureBucketed builds once and reuses the catalog entry after") {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    var builds = 0
    def get() = BucketedLayout.ensureBucketed(
      spark, "ensure_b", 4, "k", "k") {
      builds += 1
      (s"$wh/ensure_b", spark.range(100).selectExpr("id AS k", "id * 2 AS v"))
    }
    try {
      assert(get().count() == 100)
      assert(get().count() == 100)
      assert(builds == 1, "second call must reuse the catalog entry")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ensure_b")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }
  }
}
