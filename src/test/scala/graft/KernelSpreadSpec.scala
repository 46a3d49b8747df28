package graft

import graft.operators.KernelSpread
import org.apache.spark.sql.functions._

/** KernelSpread contract: starved inputs spread to the session's
  * parallelism, already-parallel inputs pass through UNTOUCHED (the
  * production-layout no-op that keeps the helper scale-honest), and a
  * spread never changes a per-row kernel's result set.
  */
class KernelSpreadSpec extends SparkSpec {
  import spark.implicits._

  test("starved input spreads to defaultParallelism") {
    val one = spark.range(100).coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    val out = KernelSpread.spread(one)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("already-parallel input is returned as-is — no exchange added") {
    val want = spark.sparkContext.defaultParallelism
    val wide = spark.range(100).repartition(want + 1)
    val out = KernelSpread.spread(wide)
    // same plan object: spread must not wrap an input that is already
    // at or above session parallelism
    assert(out eq wide)
  }

  test("spread never changes a per-row kernel's result set") {
    val docs = Seq((1L, "a b c a b"), (2L, "x y"), (3L, "")).toDF("id", "text")
      .coalesce(1)
    val plain = docs.as[(Long, String)]
      .map { case (id, t) => (id, t.split("\\s+").count(_.nonEmpty)) }
      .collect().toSet
    val spread = KernelSpread.spreadDf(docs).as[(Long, String)]
      .map { case (id, t) => (id, t.split("\\s+").count(_.nonEmpty)) }
      .collect().toSet
    assert(spread == plain)
  }
}
