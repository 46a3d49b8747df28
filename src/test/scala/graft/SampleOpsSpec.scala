package graft

import graft.operators.SampleOps
import org.apache.spark.sql.functions._

/** Dataset-assembly operators: split determinism/stability and packing
  * arithmetic.
  */
class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: proportions near the boundaries, all rows labeled") {
    val df = (1L to 10000L).toDF("id")
    val counts = SampleOps.hashSplit(df, "id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") - 8000L) < 400, counts)
    assert(math.abs(counts("val") - 1000L) < 200, counts)
  }

  test("hashSplit is stable: a row's split never depends on the rest of the data") {
    val full = SampleOps.hashSplit((1L to 1000L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val subset = SampleOps.hashSplit((1L to 100L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(full(id) == s, s"id $id moved splits") }
  }

  test("packByTokenBudget: offsets accumulate in id order; packs cut at the budget") {
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 300L), (4L, 50L))
      .toDF("id", "toks")
    val out = SampleOps.packByTokenBudget(docs, "id", "toks", budget = 512L, nShards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1)
    // offsets: 0, 300, 600, 900 → packs 0, 0, 1, 1
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 300L, 0L), (3L, 600L, 1L), (4L, 900L, 1L)))
  }

  test("packByTokenBudget shards deterministically and packs per shard") {
    val docs = (0L until 64L).map(i => (i, 100L)).toDF("id", "toks")
    val out = SampleOps.packByTokenBudget(docs, "id", "toks", budget = 150L, nShards = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    out.foreach { case (id, shard, _, _) => assert(shard == id % 32) }
    // each shard has exactly ids (k, k+32): offsets 0 and 100 → packs 0 and 0
    out.foreach { case (id, _, off, pack) =>
      if (id < 32) assert(off == 0L && pack == 0L) else assert(off == 100L && pack == 0L)
    }
  }

  test("portableHash matches the documented md5-prefix contract") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("42".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val want = java.lang.Long.parseLong(hex.take(15), 16)
    val got = spark.range(42, 43)
      .select(SampleOps.portableHash(col("id")).as("h")).as[Long].head()
    assert(got == want)
  }

  test("portableSplit is append-stable; portableSample is a stable subset") {
    val full = SampleOps.portableSplit((1L to 1000L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val subset = SampleOps.portableSplit((1L to 100L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(full(id) == s, s"id $id moved splits") }
    assert(full.values.toSet == Set("train", "val", "test"))

    val sampled = SampleOps.portableSample((1L to 1000L).toDF("id"), "id", 10)
      .as[Long].collect().toSet
    assert(sampled.size > 50 && sampled.size < 200, s"~10% expected, got ${sampled.size}")
    val again = SampleOps.portableSample((1L to 500L).toDF("id"), "id", 10)
      .as[Long].collect().toSet
    assert(again == sampled.filter(_ <= 500L), "sample membership must not depend on corpus size")
  }

  test("epochShuffle: reproducible within an epoch, re-dealt across epochs") {
    val df = (1L to 400L).toDF("id")
    def order(epoch: Int): Seq[Long] =
      SampleOps.epochShuffle(df, "id", epoch, nShards = 8)
        .orderBy("shard", "pos").select("id").as[Long].collect().toSeq
    val e1 = order(1)
    assert(e1 == order(1), "same epoch must reproduce the same order")
    val e2 = order(2)
    assert(e1 != e2, "different epochs must re-deal the order")
    assert(e1.sorted == e2.sorted, "a shuffle permutes, never drops")
    // pos is dense 1..k within each shard
    val byShard = SampleOps.epochShuffle(df, "id", 1, nShards = 8)
      .select("shard", "pos").as[(Long, Long)].collect().groupBy(_._1)
    byShard.values.foreach { s =>
      assert(s.map(_._2).sorted.toSeq == (1L to s.length).toSeq)
    }
  }

  test("stratifiedSample applies per-stratum rates, default elsewhere") {
    val df = (1L to 900L).map(i => (i, s"c${i % 3}")).toDF("id", "cls")
    val out = SampleOps.stratifiedSample(df, "id", "cls",
      Map("c0" -> 100, "c1" -> 0), defaultPercent = 20)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byCls = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byCls("c0") == 300)              // keep-all stratum intact
    assert(!byCls.contains("c1"))           // zero-rate stratum gone
    val c2 = byCls.getOrElse("c2", 0)
    assert(c2 > 20 && c2 < 120, s"~20% of 300 expected, got $c2") // default rate
    // membership within a stratum equals the unstratified portable sample
    val flat = SampleOps.portableSample(df.where(col("cls") === "c2"), "id", 20)
      .select("id").as[Long].collect().toSet
    assert(out.filter(_._2 == "c2").map(_._1).toSet == flat)
  }

  test("cappedPerGroup respects the cap and is append-stable across groups") {
    val df = (1 to 200).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val picks = SampleOps.cappedPerGroup(df, "grp", "id", cap = 10)
      .select("id", "grp").as[(Long, String)].collect()
    assert(picks.groupBy(_._2).forall(_._2.length == 10))
    // growing OTHER groups never changes g1's picks
    val grown = df.unionAll(
      (1000 to 1300).map(i => (i.toLong, s"g${2 * (i % 2)}")).toDF("id", "grp"))
    val g1After = SampleOps.cappedPerGroup(grown, "grp", "id", cap = 10)
      .where(col("grp") === "g1").select("id").as[Long].collect().toSet
    assert(g1After == picks.filter(_._2 == "g1").map(_._1).toSet)
    // a group smaller than the cap is kept whole
    val tiny = SampleOps.cappedPerGroup(
      (1 to 4).map(i => (i.toLong, "solo")).toDF("id", "grp"), "grp", "id", 10)
    assert(tiny.count() == 4)
  }

  test("hrwAssign: adding a shard moves only keys TO the new shard (~1/n)") {
    val keys = (1 to 500).map(_.toLong).toDF("k")
    val with8 = SampleOps.hrwAssign(keys, "k", shards = 8)
      .as[(Long, Long)].collect().toMap
    val with9 = SampleOps.hrwAssign(keys, "k", shards = 9)
      .as[(Long, Long)].collect().toMap
    assert(with8.values.toSet.subsetOf((0L until 8L).toSet))
    val moved = with9.collect { case (k, s) if s != with8(k) => (k, s) }
    // the defining rendezvous property: every moved key lands on shard 8
    assert(moved.values.toSet == Set(8L), s"moved to ${moved.values.toSet}")
    // ~1/9 of 500 ~ 56; allow generous slack
    assert(moved.size > 20 && moved.size < 120, s"moved ${moved.size}")
  }

  test("weightedSample: deterministic, favors heavy rows, priorities append-stable") {
    // half the ids carry weight 1000, half weight 1
    val df = (1 to 400).map(i => (i.toLong, if (i % 2 == 0) 1000L else 1L))
      .toDF("id", "w")
    val s1 = SampleOps.weightedSample(df, "id", "w", k = 40)
      .select("id").as[Long].collect().toSet
    val s2 = SampleOps.weightedSample(df, "id", "w", k = 40)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2, "same input must reproduce the same sample")
    // 1000x weight should dominate the draw overwhelmingly
    val heavy = s1.count(_ % 2 == 0)
    assert(heavy >= 35, s"heavy rows should dominate, got $heavy/40")
    // appending rows never changes surviving rows' priorities
    val p1 = SampleOps.weightedSample(df, "id", "w", k = 40)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    val grown = df.unionAll((1000 to 1100).map(i => (i.toLong, 500L)).toDF("id", "w"))
    val p2 = SampleOps.weightedSample(grown, "id", "w", k = 40)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    p2.keySet.intersect(p1.keySet).foreach(id => assert(p1(id) == p2(id)))
    // zero/negative weights are excluded, not divided by
    val withZero = df.unionAll(Seq((9999L, 0L)).toDF("id", "w"))
    assert(!SampleOps.weightedSample(withZero, "id", "w", 400)
      .select("id").as[Long].collect().contains(9999L))
  }

  test("negativeSample: k per query, bucket-bounded, self-excluded, epoch-varying, partition-invariant") {
    val corpus = (0L until 200L).map(i => Tuple1(i)).toDF("doc_id")
    val queries = (0L until 10L).map(i => Tuple1(i)).toDF("doc_id")
    val out = SampleOps.negativeSample(queries, corpus, "doc_id", "doc_id",
      k = 4, buckets = 5, seed = "e0_")
      .as[(Long, Long, Long)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet && byQ.values.forall(_.length == 4))
    out.foreach { case (q, n, r) =>
      assert(n != q, s"query $q sampled itself")
      assert(n % 5 == q % 5, s"negative $n outside query $q's bucket")
      assert(r >= 1 && r <= 4)
    }
    // a different epoch seed draws a different sample (overwhelmingly)
    val e1 = SampleOps.negativeSample(queries, corpus, "doc_id", "doc_id",
      k = 4, buckets = 5, seed = "e1_").as[(Long, Long, Long)].collect()
    assert(e1.map(t => (t._1, t._2)).toSet != out.map(t => (t._1, t._2)).toSet)
    // repartitioning changes nothing (hash ranking is row-local)
    val re = SampleOps.negativeSample(queries.repartition(7),
      corpus.repartition(13), "doc_id", "doc_id", k = 4, buckets = 5,
      seed = "e0_").as[(Long, Long, Long)].collect()
    assert(re.sorted.toSeq == out.sorted.toSeq)
    // seed/query_id concatenation cannot alias: (seed="s1", qid=2) and
    // (seed="s", qid=12) rank with different keys, so the two epochs'
    // samples for those queries are not forced-identical
    val a = SampleOps.negativeSample(Seq(2L).toDF("doc_id"),
      corpus.where($"doc_id" % 5 === 2), "doc_id", "doc_id",
      k = 4, buckets = 1, seed = "s1").as[(Long, Long, Long)].collect()
    val b = SampleOps.negativeSample(Seq(12L).toDF("doc_id"),
      corpus.where($"doc_id" % 5 === 2), "doc_id", "doc_id",
      k = 4, buckets = 1, seed = "s").as[(Long, Long, Long)].collect()
    assert(a.map(_._2).toSeq != b.map(_._2).toSeq,
      "delimited seed||qid keys should break the s1/2 vs s/12 alias")
  }

  test("clusterAwareSplit keeps every near-dup cluster on one side of the cut") {
    val docs = (1L to 200L).toDF("id")
    // chain {1,2,3}, pair {10,11}, the rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = SampleOps.clusterAwareSplit(docs, "id", pairs)
      .select("id", "cluster_key", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // clustered ids share their component min as key — and its split
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._3).distinct.size == 1)
    assert(Seq(10L, 11L).map(out(_)._2).distinct == Seq(10L))
    assert(Seq(10L, 11L).map(out(_)._3).distinct.size == 1)
    // singleton: own id, split == plain portableSplit of the same id
    assert(out(50L)._2 == 50L)
    val plain = SampleOps.portableSplit(docs, "id")
      .as[(Long, String)].collect().toMap
    assert(out.values.filter(r => r._2 == r._1).forall(r => plain(r._1) == r._3))
    // all three splits occur over 200 ids
    assert(out.values.map(_._3).toSet == Set("train", "val", "test"))
    // appending a NEW near-dup of doc 3 pulls it into cluster 1's side
    val out2 = SampleOps.clusterAwareSplit((1L to 201L).toDF("id"), "id",
      pairs.unionAll(Seq((3L, 201L)).toDF("id_a", "id_b")))
      .select("id", "cluster_key", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out2(201L)._2 == 1L && out2(201L)._3 == out(1L)._3)
    // and nobody else moved
    assert((1L to 200L).forall(i => out2(i)._3 == out(i)._3))
  }

  test("prioritySampleEstimate: population smaller than n is returned whole, ŵ = w") {
    val df = (1L to 50L).map(i => (i, i * 10L)).toDF("id", "wt")
    val out = SampleOps.prioritySampleEstimate(df, "id", "wt", n = 100)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 50)
    // τ = 0 when the sample isn't full, so every ŵ is exactly w — the
    // estimator degrades to the exact total
    assert(out.forall { case (_, w, wHat) => wHat == w.toDouble })
    assert(out.map(_._3).sum == (1L to 50L).map(_ * 10L).sum.toDouble)
  }

  test("prioritySampleEstimate: HT total lands near the true total, sample is exact-n") {
    val df = (1L to 5000L).map(i => (i, i % 97L + 1L)).toDF("id", "wt")
    val trueTotal = (1L to 5000L).map(_ % 97L + 1L).sum.toDouble
    val out = SampleOps.prioritySampleEstimate(df, "id", "wt", n = 400)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.length == 400)
    assert(out.map(_._1).sorted.toSeq == (1L to 400L).toSeq, "ranks must be 1..n")
    val est = out.map(_._3).sum
    // Var(Σŵ) ≤ W²/(n-1); at n=400 a ±20% band is ~many sigmas
    assert(math.abs(est - trueTotal) / trueTotal < 0.2,
      s"HT estimate $est vs true $trueTotal")
    // every picked row's ŵ is at least its own weight (ŵ = max(w, τ))
    assert(out.forall { case (_, w, wHat) => wHat >= w.toDouble })
  }

  test("interleaveSchedule: every period carries exactly the weight mix; docs bind uniquely") {
    val docs = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val weights = Map("s0" -> 3, "s1" -> 2, "s2" -> 1)
    val out = SampleOps.interleaveSchedule(docs, "id", "src", weights, periods = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 60, "6 slots x 10 periods")
    assert(out.map(_._1).sorted.toSeq == (0L until 60L).toSeq, "slots are 0..59 exactly once")
    // fairness law: each period of W=6 slots carries each source w_s times
    out.groupBy(t => t._1 / 6).foreach { case (period, slots) =>
      val mix = slots.groupBy(_._2).view.mapValues(_.size).toMap
      assert(mix == Map("s0" -> 3, "s1" -> 2, "s2" -> 1),
        s"period $period mix was $mix")
    }
    // a document appears at most once, and src_idx runs 0..n-1 per source
    assert(out.map(_._4).distinct.length == out.length, "no doc repeats")
    weights.foreach { case (s, w) =>
      val idx = out.filter(_._2 == s).map(_._3).sorted.toSeq
      assert(idx == (0L until (w * 10L)).toSeq, s"$s src_idx gapless")
    }
  }

  test("waterFillBudget: light demands saturate, leftover water-fills the heavy tail") {
    val demands = Seq(("a", 10L), ("b", 100L), ("c", 100L)).toDF("domain", "pending")
    val out = SampleOps.waterFillBudget(demands, "domain", "pending", budget = 60L, rounds = 3)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // r1: share 20 -> a saturates at 10; r2: leftover 10 splits 5/5 to b,c
    assert(out("a") == (("a", 10L, 10L, 0L)))
    assert(out("b") == (("b", 100L, 25L, 75L)))
    assert(out("c") == (("c", 100L, 25L, 75L)))
    // abundant budget: everyone fully granted, nothing starves
    val rich = SampleOps.waterFillBudget(demands, "domain", "pending", budget = 1000L, rounds = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(rich.forall(r => r._3 == r._2 && r._4 == 0L), rich.toSeq.toString)
  }

  test("hrwAssign rescale law: growing the fleet moves keys ONLY onto the new shard") {
    val keys = (0L until 400L).toDF("key")
    val a = SampleOps.hrwAssign(keys, "key", 4)
      .select(col("key"), col("shard").as("s4"))
    val b = SampleOps.hrwAssign(keys, "key", 5)
      .select(col("key"), col("shard").as("s5"))
    val j = a.join(b, "key").as[(Long, Long, Long)].collect()
    val moved = j.filter(r => r._2 != r._3)
    assert(moved.nonEmpty && moved.forall(_._3 == 4L),
      s"every moved key must land on the new shard: ${moved.take(5).toSeq}")
    // expected churn ~1/5; mod-hashing would move ~4/5
    assert(moved.length < 400 / 3, s"moved ${moved.length} of 400 — too many for HRW")
  }
}
