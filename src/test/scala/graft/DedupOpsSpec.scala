package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Dedup operator tests with planted duplicates. */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home"
  private def docs = Seq(
    (1L, base),
    (2L, base + " extra"),                      // near-dup of 1
    (3L, "completely different text about spark catalyst optimizer rules engine"),
    (4L, "THE  quick brown fox jumps over the lazy dog and runs far away home"), // exact dup of 1 mod case/ws
    (5L, base)                                   // exact dup of 1
  ).toDF("id", "text")

  test("exactDedup groups case/whitespace-normalized duplicates") {
    val out = DedupOps.exactDedup(docs, "id", "text").collect()
    val dupGroup = out.find(_.getAs[Long]("dup_count") == 3L)
    assert(dupGroup.isDefined && dupGroup.get.getAs[Long]("keep_id") == 1L)
    assert(out.length == 3) // {1,4,5}, {2}, {3}
  }

  test("minhashNearDups finds the planted near-dup and nothing else") {
    val pairs = DedupOps.minhashNearDups(docs, "id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // exact dups found with jaccard 1.0
    assert(pairs.contains((1L, 5L)))
  }

  test("simhashNearDups: identical docs at hamming 0, unrelated docs absent") {
    val out = DedupOps.simhashNearDups(docs, "id", "text").collect()
    val h15 = out.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 5L)
    assert(h15.isDefined && h15.get.getAs[Int]("hamming") == 0)
    assert(!out.exists(r => r.getAs[Long]("id_a") == 3L || r.getAs[Long]("id_b") == 3L))
  }

  test("minhashNearDupsPortable finds the planted near-dup and nothing else") {
    val pairs = DedupOps.minhashNearDupsPortable(docs, "id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    graft.GraftCache.releaseAll(spark)
  }

  test("simhashNearDupsPortable: identical docs at hamming 0, unrelated absent") {
    val out = DedupOps.simhashNearDupsPortable(docs, "id", "text").collect()
    val h15 = out.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 5L)
    assert(h15.isDefined && h15.get.getAs[Int]("hamming") == 0)
    assert(!out.exists(r => r.getAs[Long]("id_a") == 3L || r.getAs[Long]("id_b") == 3L))
    graft.GraftCache.releaseAll(spark)
  }

  test("portable band rows skip shingle-less docs and join keys as strings") {
    val mixed = Seq((1L, base), (2L, "too short")).toDF("id", "text")
    val rows = DedupOps.minhashBandRowsPortable(
      DedupOps.hashedShingleRowsPortable(mixed, "id", "text", 3), 64, 16).collect()
    assert(rows.forall(_.getAs[Long]("id") == 1L)) // doc 2 has < 3 tokens
    assert(rows.length == 16)
    // band key is the '_'-joined signature run — 4 positive 60-bit values
    val bk = rows.head.getAs[String]("bk").split("_")
    assert(bk.length == 4 && bk.forall(v => v.toLong >= 0))
  }

  test("pairwiseJaccard: identical → 1.0, disjoint → 0.0") {
    val pairs = Seq((1L, 5L), (1L, 3L)).toDF("id_a", "id_b")
    val out = DedupOps.pairwiseJaccard(docs, "id", "text", pairs)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(out((1L, 5L)) == 1.0)
    assert(out((1L, 3L)) == 0.0)
  }

  test("minhash band rows: deterministic across runs, bands per doc") {
    val a = DedupOps.minhashBandRows(docs, "id", "text", 3, 64, 16).collect()
    val b = DedupOps.minhashBandRows(docs, "id", "text", 3, 64, 16).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    assert(a.length == 5 * 16)
  }

  test("oversized-bucket skew guard drops degenerate buckets") {
    // 50 identical docs all share every band bucket → bucket size 50;
    // with maxBucketSize=10 the guard must drop them all.
    val many = (1L to 50L).map(i => (i, base)).toDF("id", "text")
    val cands = DedupOps.minhashCandidates(many, "id", "text", maxBucketSize = 10)
    assert(cands.count() == 0)
    // and with a tolerant cap the self-join yields all pairs
    val loose = DedupOps.minhashCandidates(many, "id", "text", maxBucketSize = 100)
    assert(loose.count() == 50L * 49L / 2L)
  }

  test("connectedComponents resolves chains, stars, and isolates correctly") {
    // chain 1-2-3-4, star 10-{11,12,13}, pair 20-21; 99 isolated (no edge)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val comp = DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
    assert(!comp.contains(99L))
    graft.GraftCache.releaseAll(spark)
  }

  test("ccMergeStates: adversarial alternating chain split == direct CC; fold order irrelevant") {
    // chain 0-1-2-...-12 split so NEITHER batch connects anything beyond
    // pairs: A gets the even-index edges, B the odd-index ones. Only the
    // star-edge merge can bridge the pairs back into one component.
    val all = (0L until 12L).map(i => (i, i + 1))
    val a = all.zipWithIndex.collect { case (e, i) if i % 2 == 0 => e }.toDF("id_a", "id_b")
    val b = all.zipWithIndex.collect { case (e, i) if i % 2 == 1 => e }.toDF("id_a", "id_b")
    val direct = DedupOps.connectedComponents(all.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sa = DedupOps.connectedComponents(a)
    val sb = DedupOps.connectedComponents(b)
    val ab = DedupOps.ccMergeStates(sa, sb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ba = DedupOps.ccMergeStates(sb, sa)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ab == direct, s"merged $ab != direct $direct")
    assert(ba == direct, "merge must be commutative")
    graft.GraftCache.releaseAll(spark)
  }

  test("ccMergeStates: disjoint batches pass through; shared nodes bridge") {
    // A: pair {1,2}; B: pair {50,51} (disjoint) plus pair {2,3} (bridges A)
    val sa = DedupOps.connectedComponents(Seq((1L, 2L)).toDF("id_a", "id_b"))
    val sb = DedupOps.connectedComponents(
      Seq((50L, 51L), (2L, 3L)).toDF("id_a", "id_b"))
    val m = DedupOps.ccMergeStates(sa, sb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 50L -> 50L, 51L -> 50L))
    graft.GraftCache.releaseAll(spark)
  }

  test("connectedComponents converges on a long path within diameter rounds") {
    // path 0-1-2-...-15: worst case for label propagation (diameter 15)
    val edges = (0L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = DedupOps.connectedComponents(edges, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 16 && comp.values.forall(_ == 0L))
    graft.GraftCache.releaseAll(spark)
  }

  test("connectedComponents resolves a diameter-100 chain in O(log n) rounds") {
    // Min-label propagation needs ~100 rounds here; large-star/small-star
    // needs ~log2(100) plus the fixpoint-confirming round.
    val edges = (0L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = DedupOps.connectedComponentsWithRounds(edges)
    val comp = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 101 && comp.values.forall(_ == 0L))
    assert(rounds <= 10, s"expected O(log n) convergence, took $rounds rounds")
    graft.GraftCache.releaseAll(spark)
  }

  test("connectedComponents matches union-find on a random graph") {
    // adversarial check of the large-star/small-star rewrite: 1500 seeded
    // random edges over ~1000 nodes (mix of chains, merged clusters,
    // isolated pairs), ground truth from a driver-side union-find
    val rng = new scala.util.Random(0xC0FFEE)
    val edges = Seq.fill(1500)((rng.nextInt(1000).toLong, rng.nextInt(1000).toLong))
      .filter { case (a, b) => a != b }
    // union-find ground truth
    val parent = Array.tabulate(1000)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val truth = nodes.map { n =>
      var r = n.toInt; while (parent(r) != r) r = parent(r)
      // min id of the component: find can stop above the true min only if
      // parent chains skip; normalize by a second pass
      n -> r.toLong
    }.toMap
    // normalize truth roots to the component minimum
    val byRoot = truth.groupBy(_._2).flatMap { case (_, m) =>
      val minId = m.keys.min
      m.keys.map(_ -> minId)
    }
    val (labels, rounds) = DedupOps.connectedComponentsWithRounds(
      edges.toDF("id_a", "id_b"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == byRoot, "components disagree with union-find")
    assert(rounds <= 12, s"random graph should converge in O(log n) rounds, took $rounds")
    graft.GraftCache.releaseAll(spark)
  }

  test("connectedComponents right-sizes the round partitioner to the edge count") {
    // small graphs must not run every round at full conf width (rounds x
    // stages x width empty-task floors — the q237 BENCH_DIAG finding);
    // the output RDD carries the loop's partitioner, so its partition
    // count is the observable. 30 edges => 1 partition at the ~64k/
    // partition target, regardless of spark.sql.shuffle.partitions.
    val small = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = DedupOps.connectedComponents(small, maxIter = 20)
    assert(labels.rdd.getNumPartitions == 1,
      s"a 30-edge graph must collapse to 1 round partition, " +
        s"got ${labels.rdd.getNumPartitions}")
    // and correctness is unaffected by the resize
    val comp = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 31 && comp.values.forall(_ == 0L))
    graft.GraftCache.releaseAll(spark)
  }

  test("connectedComponents runs one action (SQL execution) per round") {
    // The round-3 weakness was 3 driver actions per round (persist-count,
    // join-agg, changed-count). The rewrite folds convergence detection
    // into the materializing aggregation: exactly ONE root SQL execution
    // per round plus one for the initial edge compaction. (Job count is
    // not assertable — AQE materializes each exchange as its own job.)
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
            // AQE re-optimization posts nested executions with a rootExecutionId
            // differing from executionId; count only roots
            if e.rootExecutionId.forall(_ == e.executionId) =>
            execs.incrementAndGet()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val edges = (0L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val (labels, rounds) = DedupOps.connectedComponentsWithRounds(edges)
      // listener delivery is async; give the bus a moment to drain
      Thread.sleep(500)
      val actions = execs.get()
      // 2 executions per round: the materializing agg (the only JOB-
      // running action) plus the event posted by the .rdd lineage
      // re-rooting. The old 3-actions-per-round shape (persist-count +
      // join-agg + changed-count, each running jobs) would be >= 3.
      assert(actions <= 2 * (rounds + 1),
        s"$actions root SQL executions for $rounds rounds — expected <= 2/round")
      assert(labels.collect().forall(_.getLong(1) == 0L))
    } finally spark.sparkContext.removeSparkListener(listener)
    graft.GraftCache.releaseAll(spark)
  }

  test("minhashProbe finds batch-vs-corpus dups but never corpus-internal pairs") {
    val base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val corpus = Seq(
      (1L, base),
      (2L, base),  // corpus-internal exact dup — must NOT be reported
      (3L, "completely different corpus document about insurance policies and annual reports filed yearly")
    ).toDF("id", "text")
    val batch = Seq(
      (101L, base + " zz"),                       // near-dup of 1 and 2
      (102L, "novel batch content qqq www eee rrr ttt yyy uuu iii ooo ppp")
    ).toDF("id", "text")
    val out = DedupOps.minhashProbe(corpus, batch, "id", "text", threshold = 0.7)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(out == Set((101L, 1L), (101L, 2L)), s"got $out")
    graft.GraftCache.releaseAll(spark)
  }

  test("connectedComponents runs one Spark job per round") {
    // the RDD loop's only action per round is the treeAggregate that
    // materializes the persist and computes the fixpoint checksum —
    // assert via the scheduler's job-start events: total jobs for the
    // whole call is rounds + 1 (initial edge compaction), bounded with
    // +1 slack for listener timing
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val edges = (0L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val (_, rounds) = DedupOps.connectedComponentsWithRounds(edges)
      Thread.sleep(500)
      val n = jobs.get()
      assert(n <= rounds + 2,
        s"$n jobs for $rounds rounds — the loop must run ONE action per round")
    } finally spark.sparkContext.removeSparkListener(listener)
    graft.GraftCache.releaseAll(spark)
  }

  test("semanticDedup keeps one representative per embedding cluster") {
    // 10 base vectors + scaled near-copies (id+100): each (i, i+100) pair
    // must cluster with min-id representative i kept and i+100 dropped;
    // vectors are random enough that no cross-pair cluster forms at 0.999
    val dim = 8
    def vec(seed: Int): Seq[Float] = {
      val rng = new scala.util.Random(seed)
      Seq.fill(dim)(rng.nextFloat() * 2 - 1)
    }
    val base = (0 until 10).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val scaled = base.unionByName(base.select(
      (col("vec_id") + 100).as("vec_id"),
      transform(col("embedding"), x => (x * lit(1.001f)).cast("float")).as("embedding")))
    val out = DedupOps.semanticDedup(scaled, minCosine = 0.999)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    (0L until 10L).foreach { i =>
      assert(out(i) == ((i, true)), s"base $i should anchor its cluster")
      assert(out(i + 100) == ((i, false)), s"copy ${i + 100} should defer to $i")
    }
    graft.GraftCache.releaseAll(spark)
  }

  test("connectedComponents handles shuffled ids, dup edges, and self-loops") {
    // two components with non-monotonic ids, redundant + reversed + self edges
    val edges = Seq(
      (7L, 3L), (3L, 9L), (9L, 7L), (9L, 3L), (5L, 5L),
      (42L, 17L), (17L, 42L)
    ).toDF("id_a", "id_b")
    val comp = DedupOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 17L -> 17L, 42L -> 17L))
    graft.GraftCache.releaseAll(spark)
  }

  test("frequentShingleStats: planted boilerplate counted, organic text not") {
    // 5 docs share a 6-word footer (two 5-grams, df=5); one doc is pure
    // boilerplate; one unique doc and one too-short doc stay at zero
    val footer = "one two three four five six"
    val docs = ((0 until 5).map(i => (i.toLong, s"unique$i words here padding $footer"))
      ++ Seq((10L, footer), (11L, "completely original text with no repeats at all"),
        (12L, "too short"))).toDF("id", "text")
    val out = DedupOps.frequentShingleStats(docs, "id", "text", shingleN = 5, minDf = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // footer alone = 2 distinct 5-grams, both frequent (df = 6 docs)
    assert(out(10L) == ((2L, 2L, 10000L, true)))
    // shared-footer docs: 6 shingles each; only the one containing the
    // doc-unique first token is rare — the other 5 appear in all 5 docs
    (0 until 5).foreach { i =>
      val (n, f, bp, fl) = out(i.toLong)
      assert(n == 6L && f == 5L && bp == 8333L && fl, s"doc $i: $n $f $bp $fl")
    }
    assert(out(11L) == ((4L, 0L, 0L, false)))
    assert(out(12L) == ((0L, 0L, 0L, false)))
  }

  test("minhashSignatureRows: 64 positions, identical docs agree everywhere, " +
    "empty docs emit nothing") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), (3L, "")).toDF("id", "text")
    val hs = DedupOps.hashedShingleRowsPortable(docs, "id", "text", 3)
    val sig = DedupOps.minhashSignatureRows(hs, 64)
      .as[(Long, Int, Long)].collect()
    val byId = sig.groupBy(_._1)
    assert(byId.keySet == Set(1L, 2L), "empty doc must emit no signature")
    assert(byId(1L).length == 64 && byId(2L).length == 64)
    val s1 = byId(1L).map(t => t._2 -> t._3).toMap
    val s2 = byId(2L).map(t => t._2 -> t._3).toMap
    assert(s1 == s2, "identical shingle sets must produce identical signatures")
  }

  test("prefixFilterJoin == brute-force exact Jaccard join (no false negatives)") {
    // near-dup family around a base sentence + unrelated docs
    val base = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, base), (2L, base + " extra"), (3L, "prefix " + base),
      (4L, "totally different content about spark query engines"),
      (5L, "totally different content about spark query planners"),
      (6L, base)).toDF("id", "text")
    val got = DedupOps.prefixFilterJoin(docs, "id", "text", minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // in-test brute force over ALL pairs from the same shingle rows
    val hs = DedupOps.hashedShingleRowsPortable(docs, "id", "text", 3)
      .as[(Long, Array[Long])].collect().toMap
    val expected = (for {
      a <- hs.keys; b <- hs.keys if a < b
      inter = hs(a).toSet.intersect(hs(b).toSet).size
      union = hs(a).toSet.union(hs(b).toSet).size
      j = inter.toDouble / union if j >= 0.5
    } yield (a, b, math.floor(j * 10000 + 0.5) / 10000)).toSet
    assert(got == expected)
    assert(expected.exists { case (a, b, _) => Set(a, b) == Set(1L, 6L) },
      "planted exact pair must be present")
    graft.GraftCache.releaseAll(spark)
  }

  test("duplicatedSpanDedup removes repeated spans, keeping the first occurrence") {
    // span = 8 identical tokens planted in docs 1, 3 and twice in 4;
    // doc 2 is clean; doc 5 is shorter than the window.
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"intro words here $span closing remarks"),
      (2L, "a clean document with no repeated window of any kind at all really"),
      (3L, s"other leading text $span trailing bits"),
      (4L, s"$span middle filler tokens $span"),
      (5L, "too short to window")
    ).toDF("id", "text")
    val out = DedupOps.duplicatedSpanDedup(corpus, "id", "text", 8)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap

    // canonical first occurrence = (1, pos 3): doc 1 keeps everything
    assert(out(1L)._3 == 0L && out(1L)._4 == s"intro words here $span closing remarks")
    // doc 2 untouched, doc 5 below window size: untouched
    assert(out(2L)._3 == 0L && out(5L)._3 == 0L && out(5L)._4 == "too short to window")
    // docs 3 and 4 lose every planted-span token; doc 4 loses BOTH copies
    assert(out(3L)._3 == 8L && out(3L)._4 == "other leading text trailing bits")
    assert(out(4L)._3 == 16L && out(4L)._4 == "middle filler tokens")
    // n_tokens reports the pre-removal token count
    assert(out(4L)._2 == 19L)
  }

  test("duplicatedSpanDedup merges overlapping duplicated windows by position union") {
    // docs share a 10-token run -> three overlapping 8-windows in each;
    // the non-canonical doc must lose exactly the 10 covered tokens once.
    val run = "one two three four five six seven eight nine ten"
    val corpus = Seq(
      (1L, s"$run tail_a unique_a"),
      (2L, s"lead_b $run tail_b")
    ).toDF("id", "text")
    val out = DedupOps.duplicatedSpanDedup(corpus, "id", "text", 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 0L)
    assert(out(2L)._3 == 10L && out(2L)._4 == "lead_b tail_b")
  }

  test("noveltyScore: the doc that introduces a span stays novel, repeats lose it") {
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"first unique words here $span"),
      (2L, s"second other tokens list $span"),
      (3L, "short text")
    ).toDF("id", "text")
    val out = DedupOps.noveltyScore(corpus, "id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == 10000L, "doc 1 introduced everything")
    assert(out(2L)._4 < 10000L && out(2L)._3 < out(2L)._2,
      "doc 2 repeats doc 1's span windows")
    assert(out(3L) == ((3L, 0L, 0L, 10000L)), "sub-window doc: 0 windows, novel by convention")
  }

  test("noveltyState merge law: state(A) ⊕ state(B) == state(A ∪ B), element-wise") {
    val span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, s"first doc $span"),
      (2L, s"second doc also has $span"),
      (3L, "unrelated content entirely different words"),
      (4L, s"fourth one $span trailing")
    ).toDF("id", "text")
    val a = corpus.where($"id" % 2 === 0)
    val b = corpus.where($"id" % 2 === 1)
    val merged = DedupOps.noveltyMergeStates(
      DedupOps.noveltyState(a, "id", "text", 8),
      DedupOps.noveltyState(b, "id", "text", 8))
      .selectExpr("h", "cnt", "first.id", "first.pos")
      .as[(Long, Long, Long, Long)].collect().toSet
    val direct = DedupOps.noveltyState(corpus, "id", "text", 8)
      .selectExpr("h", "cnt", "first.id", "first.pos")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(merged == direct && direct.nonEmpty)
    // and the derived scores agree with the one-shot operator
    val viaState = DedupOps.noveltyFromState(corpus, "id", "text", 8,
      DedupOps.noveltyMergeStates(
        DedupOps.noveltyState(a, "id", "text", 8),
        DedupOps.noveltyState(b, "id", "text", 8)))
      .as[(Long, Long, Long, Long)].collect().toSet
    val oneShot = DedupOps.noveltyScore(corpus, "id", "text", 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaState == oneShot)
  }

  test("noveltyFromState: windows absent from a history-only state count as novel") {
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val history = Seq((1L, s"old corpus doc containing $span")).toDF("id", "text")
    val fresh = Seq(
      (100L, s"brand new tokens nothing shared whatsoever here today friends"),
      (101L, s"repeat offender copying $span")
    ).toDF("id", "text")
    // state folded over HISTORY ONLY — the fresh docs' windows are
    // mostly absent from it and must count as first occurrences
    val out = DedupOps.noveltyFromState(fresh, "id", "text", 8,
      DedupOps.noveltyState(history, "id", "text", 8))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(100L)._2 == 2L && out(100L)._4 == 10000L,
      "all-new doc: every window unseen by the state => fully novel")
    assert(out(101L)._3 < out(101L)._2 && out(101L)._4 < 10000L,
      "the copied span's windows are in the state and are not novel")
  }

  test("contentDefinedChunks re-synchronizes on shared runs and tiles the text") {
    // non-periodic: a periodic run can legitimately contain no boundary
    // window at all (1 period of windows decides the whole run)
    val shared = (1 to 60).map(i => s"tok${i}word").mkString(" ")
    val corpus = Seq(
      (1L, s"prefix one differs $shared"),
      (2L, s"a completely different and much longer opening phrase $shared"),
      (3L, ""),
      (4L, "tiny")
    ).toDF("id", "text")
    val out = DedupOps.contentDefinedChunks(corpus, "id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
    val byDoc = out.groupBy(_._1)
    // chunks tile each doc: starts contiguous, lengths sum to the text
    for ((id, rows) <- byDoc) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3); case _ =>
      }
    }
    // the shared run produces shared interior chunk hashes in docs 1 and 2
    val h1 = byDoc(1L).map(_._5).toSet
    val h2 = byDoc(2L).map(_._5).toSet
    assert((h1 & h2).nonEmpty,
      s"CDC must re-synchronize on the ${shared.length}-char shared run")
    // empty doc: no chunks; sub-window doc: one whole-text chunk
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).toSeq == Seq((4L, 1L, 0L, 4L,
      byDoc(4L).head._5)) && byDoc(4L).head._4 == 4L)
  }

  test("duplicatedSpanDedup whitespace-normalizes and handles empty/null text") {
    val corpus = Seq((1L, "spaced   out    tokens"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = DedupOps.duplicatedSpanDedup(corpus, "id", "text", 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 0L, "spaced out tokens")))
    assert(out(2L) == ((2L, 0L, 0L, "")))
    assert(out(3L) == ((3L, 0L, 0L, "")))
  }

  test("bandRowsFromSig ∘ minhashSigRowsPortable == the fused band kernel, any config") {
    val docs = (1L to 40L).map(i =>
        (i, s"alpha beta gamma delta epsilon zeta token$i tail${i % 7}"))
      .toDF("id", "text")
    val hs = DedupOps.hashedShingleRowsPortable(docs, "id", "text", 3)
    val sig = DedupOps.minhashSigRowsPortable(hs, 64)
    for (bands <- Seq(32, 16, 8)) {
      val composed = DedupOps.bandRowsFromSig(sig, 64, bands)
        .as[(Long, Int, String)].collect().toSet
      val fused = DedupOps.minhashBandRowsPortable(hs, 64, bands)
        .as[(Long, Int, String)].collect().toSet
      assert(composed == fused && composed.nonEmpty,
        s"bands=$bands: sweep path must emit the exact fused band rows")
    }
  }

  test("containmentScores: a verbatim quote scores 1.0 where Jaccard would miss it; df guard mutes boilerplate") {
    val host = (1 to 40).map(i => s"w$i").mkString(" ")   // 40 unique tokens
    val corpus = Seq(
      (1L, host),
      (2L, "totally different content about other things entirely now"),
      (3L, "totally different content about other things entirely too")
    ).toDF("id", "text")
    val quote = (5 to 16).map(i => s"w$i").mkString(" ")  // 12-token span of host
    val probes = Seq((100L, quote), (101L, "nothing shared with anyone here at all")).toDF("id", "text")
    val out = DedupOps.containmentScores(corpus, probes, "id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((100L, 1L, 10L, 10L, 10000L)),
      s"the quote is fully contained in host 1 only: ${out.toSeq}")
    // df guard: a shingle shared by > maxDf hosts cannot create matches
    val boiler = Seq((200L, "totally different content")).toDF("id", "text")
    val muted = DedupOps.containmentScores(corpus, boiler, "id", "text", maxDf = 1L, minBp = 0L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(muted.isEmpty, s"df=2 shingle must be guarded out at maxDf=1: ${muted.toSeq}")
  }
}
