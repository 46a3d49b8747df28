package graft

import graft.operators.SketchOps
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cms estimates are exact with no collisions, never underestimate with them") {
    val rows = (1 to 200).flatMap(i => Seq.fill(i % 5 + 1)(i.toLong)).toDF("k")
    val exact = rows.groupBy("k").agg(count(lit(1)).as("exact_n"))
    // wide sketch: 200 keys over 4x4096 — estimates should all be exact
    val wide = SketchOps.cmsEstimate(
        SketchOps.cmsBuild(rows, "k", 4, 4096), rows.select("k").distinct(), "k", 4, 4096)
      .join(exact, "k").collect()
    assert(wide.forall(r => r.getLong(1) == r.getLong(2)),
      "4x4096 over 200 keys should have no full-depth collisions")
    // narrow sketch: 200 keys over 2x8 — collisions guaranteed, but the
    // estimate must NEVER be below the true count
    val narrow = SketchOps.cmsEstimate(
        SketchOps.cmsBuild(rows, "k", 2, 8), rows.select("k").distinct(), "k", 2, 8)
      .join(exact, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(narrow.forall { case (_, est, ex) => est >= ex },
      s"CMS must only overestimate: ${narrow.filter(t => t._2 < t._3).toSeq}")
    assert(narrow.exists { case (_, est, ex) => est > ex },
      "2x8 over 200 keys must collide somewhere")
  }

  test("sketches merge by elementwise sum: shard sketches == full sketch") {
    val rows = (1 to 500).map(i => (i.toLong, i % 7L)).toDF("id", "k")
    val a = rows.where(col("id") <= 250)
    val b = rows.where(col("id") > 250)
    val merged = SketchOps.cmsMerge(
        SketchOps.cmsBuild(a, "k"), SketchOps.cmsBuild(b, "k"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = SketchOps.cmsBuild(rows, "k")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full,
      "per-shard sketches must roll up to the full-corpus sketch")
  }

  test("hll estimate lands within the m=64 error band; duplicates don't move it") {
    val n = 10000L
    val ids = spark.range(n).select(col("id"))
    val est = SketchOps.hllEstimate(ids, "id").collect().head.getDouble(2)
    assert(est > n * 0.6 && est < n * 1.4,
      s"HLL(m=64) on $n distinct ids estimated $est")
    // distinct-count property: tripling every row changes nothing
    val tripled = ids.union(ids).union(ids)
    val est3 = SketchOps.hllEstimate(tripled, "id").collect().head.getDouble(2)
    assert(est3 == est, "HLL must be insensitive to multiplicity")
  }

  test("hll registers merge by elementwise max: shard registers == full registers") {
    val ids = spark.range(5000L).select(col("id"))
    val a = ids.where(col("id") % 2 === 0)
    val b = ids.where(col("id") % 2 === 1)
    val merged = SketchOps.hllRegisters(a, "id").unionByName(SketchOps.hllRegisters(b, "id"))
      .groupBy("bucket").agg(max("r").as("r"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val full = SketchOps.hllRegisters(ids, "id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == full)
  }

  test("cmsJoinCardinality: exact when collision-free, always an overestimate") {
    import spark.implicits._
    // multiplicities: key k appears k times in a, (k % 3) + 1 times in b
    val a = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val b = (1 to 20).flatMap(k => Seq.fill(k % 3 + 1)(k.toLong)).toDF("k")
    val trueSize = (1 to 20).map(k => k * (k % 3 + 1)).sum.toLong
    // wide sketch: 20 keys in 4096 buckets -> collision-free, est exact
    val wide = SketchOps.cmsJoinCardinality(
      SketchOps.cmsBuild(a, "k", width = 4096),
      SketchOps.cmsBuild(b, "k", width = 4096))
      .collect().head.getLong(0)
    assert(wide == trueSize)
    // narrow sketch: collisions only ADD cross terms
    val narrow = SketchOps.cmsJoinCardinality(
      SketchOps.cmsBuild(a, "k", width = 4),
      SketchOps.cmsBuild(b, "k", width = 4))
      .collect().head.getLong(0)
    assert(narrow >= trueSize)
    // disjoint key sets in a wide grid: some depth row has NO occupied-
    // bucket overlap, and that row's 0 inner product must anchor the
    // min — the estimate is 0, not the smallest colliding row's sum
    val c = (101 to 120).map(_.toLong).toDF("k")
    val disjoint = SketchOps.cmsJoinCardinality(
      SketchOps.cmsBuild(a, "k", width = 4096),
      SketchOps.cmsBuild(c, "k", width = 4096))
      .collect().head.getLong(0)
    assert(disjoint == 0L, s"disjoint sketches must estimate 0, got $disjoint")
    // anchors derive from the sketches, so a depth mismatch can't poison
    // the min: rows 0-3 are common, each a valid upper bound
    val mixed = SketchOps.cmsJoinCardinality(
      SketchOps.cmsBuild(a, "k", depth = 4, width = 4096),
      SketchOps.cmsBuild(b, "k", depth = 6, width = 4096))
      .collect().head.getLong(0)
    assert(mixed == trueSize, s"common-row min must stay exact, got $mixed")
    // an empty sketch is an empty table: the join size is 0, not null
    val empty = SketchOps.cmsJoinCardinality(
      SketchOps.cmsBuild(a, "k", width = 4096),
      SketchOps.cmsBuild(spark.emptyDataset[Long].toDF("k"), "k", width = 4096))
      .collect().head.getLong(0)
    assert(empty == 0L, s"empty sketch must estimate 0, got $empty")
  }

  test("bloom: no false negatives; OR merge law; absent keys mostly rejected") {
    import spark.implicits._
    val members = (1L to 300L).toDF("k")
    // shard build + OR fold == direct build, lane for lane (the merge law)
    val direct = SketchOps.bloomBuild(members, "k")
      .as[(Long, Long)].collect().toMap
    val merged = SketchOps.bloomMerge(
        SketchOps.bloomBuild(members.where($"k" % 2 === 0), "k"),
        SketchOps.bloomBuild(members.where($"k" % 2 === 1), "k"))
      .as[(Long, Long)].collect().toMap
    assert(merged == direct, "shard OR-merge must equal the direct build")
    // membership contract: every member hits (NEVER a false negative)
    val hits = SketchOps.bloomProbe(direct.toSeq.toDF("lane", "bits"), members, "k")
      .as[(Long, Int)].collect().toMap
    assert(hits.values.forall(_ == 1), "false negative!")
    // absent keys: overwhelmingly rejected at this load (900 bits of
    // 32768 set -> per-probe FPR ~ (900/32768)^3 ~ 2e-5)
    val absent = (100000L to 100299L).toDF("k")
    val fp = SketchOps.bloomProbe(direct.toSeq.toDF("lane", "bits"), absent, "k")
      .as[(Long, Int)].collect().count(_._2 == 1)
    assert(fp <= 2, s"implausibly many false positives: $fp/300")
  }

  test("kmvIntersect: exact below k; self-intersection is identity; full-sketch consistency") {
    import spark.implicits._
    val a = (1L to 20L).toDF("k")
    val b = (11L to 30L).toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame, k: Int) =
      SketchOps.kmvSketch(df, "k", k)
    // k=64 > |A ∪ B| = 30: the union sketch saw everything — all three
    // estimates are EXACT (union 30, matches = intersection 10,
    // Jaccard 10/30)
    val exact = SketchOps.kmvIntersect(sk(a, 64), sk(b, 64), k = 64)
      .collect().head
    assert(exact.getAs[Long]("n_union_sketch") == 30L)
    assert(exact.getAs[Long]("matches") == 10L)
    assert(exact.getAs[Long]("union_est") == 30L)
    assert(exact.getAs[Long]("jaccard_bp") == 3333L)
    assert(exact.getAs[Long]("intersect_est") == 10L)
    // A vs A: Jaccard is exactly 1 and the intersection estimate IS the
    // union estimate, full sketch or not
    val self = SketchOps.kmvIntersect(sk(a, 8), sk(a, 8), k = 8)
      .collect().head
    assert(self.getAs[Long]("jaccard_bp") == 10000L)
    assert(self.getAs[Long]("intersect_est") == self.getAs[Long]("union_est"))
    // disjoint sets: zero matches, zero intersection
    val c = (100L to 119L).toDF("k")
    val dis = SketchOps.kmvIntersect(sk(a, 8), sk(c, 8), k = 8)
      .collect().head
    assert(dis.getAs[Long]("matches") == 0L && dis.getAs[Long]("intersect_est") == 0L)
    // full-sketch internal consistency on a real partial overlap
    val big = (1L to 500L).toDF("k")
    val big2 = (251L to 750L).toDF("k")
    val r = SketchOps.kmvIntersect(sk(big, 32), sk(big2, 32), k = 32)
      .collect().head
    val (n, m, u) = (r.getAs[Long]("n_union_sketch"), r.getAs[Long]("matches"),
      r.getAs[Long]("union_est"))
    assert(n == 32L)
    assert(r.getAs[Long]("jaccard_bp") == m * 10000L / n)
    assert(r.getAs[Long]("intersect_est") == m * u / n)
  }

  test("hllMergeRegisters: shard merge equals the one-pass registers, element-wise") {
    import spark.implicits._
    val rows = (1L to 300L).toDF("k")
    val merged = SketchOps.hllMergeRegisters(
      SketchOps.hllRegisters(rows.where($"k" % 3 === 0), "k"),
      SketchOps.hllRegisters(rows.where($"k" % 3 =!= 0), "k"))
      .as[(Long, Int)].collect().toSet
    val direct = SketchOps.hllRegisters(rows, "k")
      .as[(Long, Int)].collect().toSet
    assert(merged == direct && direct.nonEmpty)
  }

  test("kmv merge law: bottomK(bottomK(A) ∪ bottomK(B)) == bottomK(A ∪ B)") {
    val ids = spark.range(3000L).select(col("id"))
    val a = ids.where(col("id") % 2 === 0)
    val b = ids.where(col("id") % 2 === 1)
    val merged = SketchOps.kmvMerge(64,
        SketchOps.kmvSketch(a, "id"), SketchOps.kmvSketch(b, "id"))
      .as[Long].collect().sorted.toSeq
    val direct = SketchOps.kmvSketch(ids, "id").as[Long].collect().sorted.toSeq
    assert(merged == direct && merged.size == 64)
  }

  test("kmv estimate: exact below k, inside the error band above, multiplicity-blind") {
    // 40 distinct < k=64: the sketch holds everything, the count is exact
    val small = spark.range(40L).select(col("id"))
    val exactEst = SketchOps.kmvEstimate(SketchOps.kmvSketch(small, "id"), 64)
      .collect().head
    assert(exactEst.getLong(0) == 40L && exactEst.getLong(2) == 40L)
    // 10000 distinct: (k-1)·2^60/h_(k) lands within the ~1/sqrt(k-1) band
    val n = 10000L
    val big = spark.range(n).select(col("id"))
    val est = SketchOps.kmvEstimate(SketchOps.kmvSketch(big, "id"), 64)
      .collect().head.getLong(2)
    assert(est > n * 0.6 && est < n * 1.4, s"KMV(k=64) on $n ids estimated $est")
    // distinct semantics: tripling rows changes nothing
    val est3 = SketchOps.kmvEstimate(
        SketchOps.kmvSketch(big.union(big).union(big), "id"), 64)
      .collect().head.getLong(2)
    assert(est3 == est, "KMV must be insensitive to multiplicity")
  }

  test("mg summary: ≤ k counters, underestimates only, within n/(k+1)") {
    // Zipf-ish: key i appears ceil(600/i) times, i = 1..60
    val rows = (1 to 60).flatMap(i => Seq.fill((600 + i - 1) / i)(i.toLong)).toDF("k")
    val n = rows.count()
    val k = 8
    val exact = rows.groupBy("k").agg(count(lit(1)).as("exact_n"))
    val st = SketchOps.mgSummary(rows, "k", k)
      .join(exact, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(st.length <= k && st.nonEmpty)
    assert(st.forall { case (_, est, ex) => est >= 1 && est <= ex },
      s"MG estimates must be positive underestimates: ${st.toSeq}")
    assert(st.forall { case (_, est, ex) => (ex - est) * (k + 1) <= n },
      s"MG error must stay within n/(k+1): ${st.toSeq}")
    // the true top-1 key must survive any k >= 1 summary
    assert(st.exists(_._1 == 1L), "heaviest key lost from the summary")
  }

  test("mg merge law: shard summaries fold to a valid summary of the union") {
    val rows = (1 to 60).flatMap(i => Seq.fill((600 + i - 1) / i)(i.toLong))
      .zipWithIndex.map { case (key, i) => (i.toLong, key) }.toDF("id", "k")
    val n = rows.count()
    val k = 8
    val merged = SketchOps.mgMerge(
        SketchOps.mgSummary(rows.where(col("id") % 2 === 0), "k", k),
        SketchOps.mgSummary(rows.where(col("id") % 2 === 1), "k", k),
        "k", k)
    val exact = rows.groupBy("k").agg(count(lit(1)).as("exact_n"))
    val st = merged.join(exact, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(st.length <= k && st.nonEmpty)
    assert(st.forall { case (_, est, ex) => est >= 1 && est <= ex },
      "merged MG estimates must remain underestimates")
    assert(st.forall { case (_, est, ex) => (ex - est) * (k + 1) <= n },
      s"merged MG error must stay within n_total/(k+1): ${st.toSeq}")
    // determinism: the fold is symmetric in its inputs
    val swapped = SketchOps.mgMerge(
        SketchOps.mgSummary(rows.where(col("id") % 2 === 1), "k", k),
        SketchOps.mgSummary(rows.where(col("id") % 2 === 0), "k", k),
        "k", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(swapped == st.map(t => (t._1, t._2)).toSet, "mgMerge must commute")
  }

  test("mg reduce: t = 0 below k+1 keys (state exact), tie multiset determinism") {
    // 5 distinct keys, k = 8: nothing is subtracted — the summary IS the counts
    val small = Seq(1L, 1L, 2L, 2L, 3L, 4L, 5L).toDF("k")
    val st = SketchOps.mgSummary(small, "k", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(st == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // all-ties at the threshold: 10 keys count 3 each, k = 4 → t = 3,
    // nothing survives (a valid — vacuous — summary; bound still holds)
    val ties = (1 to 10).flatMap(i => Seq.fill(3)(i.toLong)).toDF("k")
    assert(SketchOps.mgSummary(ties, "k", 4).count() == 0L)
  }
}
