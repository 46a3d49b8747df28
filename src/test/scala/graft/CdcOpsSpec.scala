package graft

import graft.operators.CdcOps
import java.sql.Timestamp

/** CDC operators (q120/q121): SCD2 versioning on a hand-built history
  * (no-op changes, same-timestamp ties) and MERGE application laws.
  */
class CdcOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("scd2 collapses no-op changes and versions the survivors") {
    // key 1: a -> a (no-op) -> b -> b (no-op) -> c ; key 2: single row
    val changes = Seq(
      (1L, "a", ts(10), 1L), (1L, "a", ts(20), 2L), (1L, "b", ts(30), 3L),
      (1L, "b", ts(40), 4L), (1L, "c", ts(50), 5L),
      (2L, "x", ts(10), 6L))
      .toDF("k", "attr", "ts", "seq")
    val out = CdcOps.scd2(changes, "k", "attr", "ts", "seq")
      .select("k", "attr", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, "a", ts(10), Some(ts(30)), 1L, false),
      (1L, "b", ts(30), Some(ts(50)), 2L, false),
      (1L, "c", ts(50), None, 3L, true),
      (2L, "x", ts(10), None, 1L, true)))
  }

  test("scd2 orders same-timestamp changes by the sequence column") {
    val changes = Seq(
      (1L, "a", ts(10), 2L), (1L, "b", ts(10), 1L))
      .toDF("k", "attr", "ts", "seq")
    val out = CdcOps.scd2(changes, "k", "attr", "ts", "seq")
      .select("attr", "version").as[(String, Long)].collect().toMap
    // seq=1 ("b") is the first version, seq=2 ("a") the second
    assert(out == Map("b" -> 1L, "a" -> 2L))
  }

  test("mergeApply: insert, update, delete, passthrough") {
    val snap = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val batch = Seq((2L, 22L, "U"), (3L, 0L, "D"), (4L, 40L, "I"))
      .toDF("k", "v", "op")
    val out = CdcOps.mergeApply(snap, batch, "k", "v", "op")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 10L, 2L -> 22L, 4L -> 40L))
  }

  test("cdcFeed round-trip law: mergeApply(old, cdcFeed(old, new)) == new") {
    val a = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val b = Seq((2L, 22L), (3L, 30L), (4L, 40L)).toDF("k", "v")
    val feed = CdcOps.cdcFeed(a, b, "k", "v")
    val f = feed.collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2))))
      .toMap
    assert(f == Map(1L -> ((None, "D")), 2L -> ((Some(22L), "U")),
      4L -> ((Some(40L), "I"))), s"got $f") // unchanged key 3 absent
    val rebuilt = CdcOps.mergeApply(a, feed, "k", "v", "op")
      .as[(Long, Long)].collect().toMap
    assert(rebuilt == Map(2L -> 22L, 3L -> 30L, 4L -> 40L))
  }

  test("mergeApply is idempotent: replaying the same batch changes nothing") {
    val snap = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val batch = Seq((2L, 22L, "U"), (3L, 0L, "D"), (4L, 40L, "I"))
      .toDF("k", "v", "op")
    val once = CdcOps.mergeApply(snap, batch, "k", "v", "op")
    val twice = CdcOps.mergeApply(once, batch, "k", "v", "op")
      .as[(Long, Long)].collect().toMap
    assert(twice == once.as[(Long, Long)].collect().toMap)
  }

  test("mergeApply with an empty batch is the identity") {
    val snap = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val batch = Seq.empty[(Long, Long, String)].toDF("k", "v", "op")
    val out = CdcOps.mergeApply(snap, batch, "k", "v", "op")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 10L, 2L -> 20L))
  }
}
