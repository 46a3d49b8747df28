package graft

import graft.operators.{DedupOps, JoinOps}
import org.apache.spark.sql.functions._

/** Salted join + winnowing fingerprint tests. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin returns exactly the plain join's rows") {
    // hot key: 500 of 600 rows share key "hot"
    val big = ((1 to 500).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "payload")
    val small = (Seq(("hot", "H")) ++ (1 to 50).map(i => (s"k$i", s"V$i")))
      .toDF("key", "dim")
    val plain = big.join(small, Seq("key")).collect().map(_.toString).sorted.toSeq
    val salted = JoinOps.saltedEquiJoin(big, small, "key", saltFactor = 8)
      .select("key", "payload", "dim").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_.contains("hot")) == 500)
  }

  test("salted join is deterministic across executions") {
    val big = (1 to 200).map(i => ("k" + i % 3, i)).toDF("key", "payload")
    val small = Seq(("k0", "a"), ("k1", "b"), ("k2", "c")).toDF("key", "dim")
    val r1 = JoinOps.saltedEquiJoin(big, small, "key").collect().map(_.toString).sorted.toSeq
    val r2 = JoinOps.saltedEquiJoin(big, small, "key").collect().map(_.toString).sorted.toSeq
    assert(r1 == r2 && r1.size == 200)
  }

  private val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill nearby"

  test("winnowing: shared substrings produce shared fingerprints") {
    val docs = Seq(
      (1L, base),
      (2L, "INTRO. " + base + " OUTRO."),      // contains doc 1 verbatim
      (3L, "totally unrelated content about catalyst expression codegen internals")
    ).toDF("id", "text")
    val overlap = DedupOps.fingerprintOverlap(docs, "id", "text", minContainment = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(overlap.contains((1L, 2L)))
    assert(!overlap.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowing guarantee: substrings ≥ w+k-1 chars always share a fingerprint") {
    val shared = "abcdefghijklmnop" // 16 chars ≥ w+k-1 = 11 (k=8, w=4)
    val docs = Seq(
      (1L, "xxxx " + shared + " yyyy"),
      (2L, "zzzz " + shared + " qqqq")).toDF("id", "text")
    val overlap = DedupOps.fingerprintOverlap(docs, "id", "text", minContainment = 0.05)
    assert(overlap.count() == 1)
  }

  test("winnowing fingerprints are deterministic and short-text-safe") {
    val docs = Seq((1L, "tiny"), (2L, "")).toDF("id", "text")
    val fp = DedupOps.winnowingFingerprints(docs, "id", "text").collect()
    assert(fp.forall(_.getAs[Seq[Long]]("fingerprints").isEmpty))
  }

  test("asofJoin picks the latest at-or-before right row per key, null before any") {
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    val left = Seq(
      (100L, 1L, ts(5)),   // after ckpt at 3 → state 30
      (101L, 1L, ts(3)),   // exactly at ckpt 3 → inclusive → 30
      (102L, 1L, ts(2)),   // between 1 and 3 → 10
      (103L, 1L, ts(0)),   // before any → null
      (104L, 2L, ts(9))    // other key, only ckpt at 7 → 70
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(1), 10L), (1L, ts(3), 30L), (2L, ts(7), 70L)
    ).toDF("user_id", "ts", "state_id")
    val out = JoinOps.asofJoin(left, right, "user_id", "ts", "state_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[Any]("state_id")).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(
      100L -> Some(30L), 101L -> Some(30L), 102L -> Some(10L),
      103L -> None, 104L -> Some(70L)))
  }

  test("rangeJoin matches the naive range predicate exactly") {
    val pts = (0L to 200L).map(i => (i, i * 7L % 500L)).toDF("pid", "pt")
    val ivs = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 400L, 700L), (4L, 480L, 490L),
        (5L, 130L, 130L))
      .toDF("iid", "lo", "hi")
    val got = JoinOps.rangeJoin(pts, ivs, "pt", "lo", "hi", 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = pts.crossJoin(ivs)
      .where(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.length == got.distinct.length, "bucketing must not duplicate pairs")
  }

  test("rangeJoin: inclusive bounds, no duplicates when one interval spans many buckets") {
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 21L)).toDF("pid", "pt")
    val ivs = Seq((9L, 10L, 20L)).toDF("iid", "lo", "hi")
    // width 3 → the interval covers buckets 3..6; each point still matches once
    val rows = JoinOps.rangeJoin(pts, ivs, "pt", "lo", "hi", 3L)
      .select("pid").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L))
  }

  test("rangeJoin plans an equi-join on the bucket, not a nested loop") {
    val pts = Seq((1L, 10L)).toDF("pid", "pt")
    val ivs = Seq((9L, 0L, 20L)).toDF("iid", "lo", "hi")
    val p = JoinOps.rangeJoin(pts, ivs, "pt", "lo", "hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must bucket to an equi-join:\n$p")
  }

  test("asofJoin plans one shuffle and no join operator (union+window)") {
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    val left = Seq((1L, 1L, ts(1))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(0), 5L)).toDF("user_id", "ts", "state_id")
    val p = JoinOps.asofJoin(left, right, "user_id", "ts", "state_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"asof must not use a range join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      s"expected one shuffle per input side at most:\n$p")
  }

  test("fuzzyJoin matches within edit distance; blocking bounds recall as documented") {
    val left = Seq((1L, "acme corp"), (2L, "zenith ltd")).toDF("id", "name")
    val right = Seq(
      (11L, "acme c0rp"),   // 1 sub, suffix "orp"->"0rp"? no: last 3 = "0rp" != "orp" — escapes block
      (12L, "acme corp"),   // exact dup, matches 1
      (13L, "acmex corp"),  // 1 insert mid-string, same suffix, matches 1
      (14L, "zenith ltd x") // length +2 -> excluded by length guard
    ).toDF("id", "name")
    val out = JoinOps.fuzzyJoin(left, right, "id", "name", "id", "name",
        maxDist = 1, blockLen = 3)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    // 11 escapes the suffix block (typo inside the block region) — the
    // documented recall bound; 14 fails the length guard
    assert(out == Set((1L, 12L), (1L, 13L)), s"got $out")
  }

  test("intervalOverlapJoin == brute force: multi-bucket spans dedupe, " +
    "touching intervals excluded") {
    val a = Seq((1L, 0L, 100L), (2L, 250L, 260L), (3L, 300L, 300L))
      .toDF("a_id", "a_start", "a_end")
    val b = Seq((10L, 50L, 320L), (20L, 100L, 120L), (30L, 400L, 500L))
      .toDF("b_id", "b_start", "b_end")
    // bucketSize 10 -> interval (50, 320) spans 28 buckets: pairs must
    // still appear exactly once
    val out = JoinOps.intervalOverlapJoin(a, b, bucketSize = 10L)
      .as[(Long, Long, Long)].collect().toSet
    // brute force with the same strict predicate
    val av = Seq((1L, 0L, 100L), (2L, 250L, 260L), (3L, 300L, 300L))
    val bv = Seq((10L, 50L, 320L), (20L, 100L, 120L), (30L, 400L, 500L))
    val naive = (for {
      (ai, as_, ae) <- av; (bi, bs, be) <- bv
      if as_ < be && bs < ae
    } yield (ai, bi, math.min(ae, be) - math.max(as_, bs))).toSet
    assert(out == naive)
    // (1, 20) touch at 100 exactly -> excluded by the strict predicate
    assert(!out.exists(t => t._1 == 1L && t._2 == 20L))
    assert(out.contains((1L, 10L, 50L)) && out.contains((2L, 10L, 10L)))
  }
}
