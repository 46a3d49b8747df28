package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val scale = 1000000000000L

  test("pageRank: star hub outranks its spokes; symmetric pair ties exactly") {
    // star: 1..4 all link to 0; 0 links back to 1 (so 0 is not dangling)
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val r = GraphOps.pageRankFixedPoint(star, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L),
      s"hub > linked-back spoke > plain spoke: $r")
    assert(r(2L) == r(3L) && r(3L) == r(4L), s"identical spokes tie exactly: $r")

    // symmetric 2-cycle: exactly equal fixed-point ranks
    val pair = Seq((10L, 20L), (20L, 10L)).toDF("src", "dst")
    val p = GraphOps.pageRankFixedPoint(pair, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(p(10L) == p(20L))
    // no dangling nodes here: total mass stays within iters * one
    // rounding unit per edge per iteration of the full scale
    val total = p.values.sum
    assert(total > scale - 100L && total <= scale, s"mass ~conserved: $total")
  }

  test("pageRank drops self-loops and is insensitive to duplicate-free input order") {
    val g1 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L)).toDF("src", "dst")
    val g2 = Seq((3L, 1L), (2L, 3L), (1L, 2L)).toDF("src", "dst") // self-loop removed, reordered
    val r1 = GraphOps.pageRankFixedPoint(g1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val r2 = GraphOps.pageRankFixedPoint(g2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1 == r2)
    // 3-cycle: perfect symmetry, exactly equal ranks
    assert(r1(1L) == r1(2L) && r1(2L) == r1(3L))
  }

  private def triCount(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = GraphOps.triangleCount(edges.toDF("src", "dst")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("triangleCount on known graphs: K4, pendant, square, self-loops/dups") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(triCount(k4) == ((4L, 6L, 4L)))
    // K4 + pendant edge: no new triangle
    assert(triCount(k4 :+ ((3L, 9L))) == ((5L, 7L, 4L)))
    // 4-cycle: no triangles
    assert(triCount(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))) == ((4L, 4L, 0L)))
    // duplicates / reversed copies / self-loops collapse
    assert(triCount(Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (2L, 2L),
      (0L, 1L))) == ((3L, 3L, 1L)))
  }

  test("bfsDistances: path graph hops, multi-source min, unreachable absent") {
    // path 0-1-2-3-4-5 plus an isolated pair 10-11
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("src", "dst")
    val fromZero = GraphOps.bfsDistances(edges, Seq(0L), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hop-4 horizon: node 5 is 5 hops away -> absent; 10/11 unreachable
    assert(fromZero == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    // two sources: distance to the NEAREST seed wins
    val multi = GraphOps.bfsDistances(edges, Seq(0L, 5L), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("bfsDistancesDeep resolves a diameter-50 path and matches the unrolled variant") {
    // 0-1-...-50 path: 50 hops from seed 0, far past the 8-hop unrolled cap
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = GraphOps.bfsDistancesDeep(chain, Seq(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 50L).map(i => i -> i).toMap)
    // identical output where both variants run (8-hop horizon)
    val small = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val deep = GraphOps.bfsDistancesDeep(small, Seq(0L, 4L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unrolled = GraphOps.bfsDistances(small, Seq(0L, 4L), maxHops = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deep == unrolled)
    graft.GraftCache.releaseAll(spark)
  }

  test("bfsDistancesDeep runs ONE job per 4-hop batch") {
    // round 17: hops are batched 4-per-action (lazy chain inside one
    // job) — assert via job-start events that total jobs stay around
    // hops/4 + small constant (seed count, one empty confirm batch,
    // final collect), i.e. scheduling cost per hop is sub-linear in
    // depth (the unrolled-plan form would re-run the whole prefix;
    // the per-hop-action form pays a job floor per hop).
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val chain = (0L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
      val n = GraphOps.bfsDistancesDeep(chain, Seq(0L)).count()
      assert(n == 31L)
      Thread.sleep(500)
      val j = jobs.get()
      // 30 hops / 4 per batch = 8 batches + 1 empty confirm batch +
      // seed count + final collect, + slack
      assert(j <= 12 + 4, s"$j jobs for 30 hops — the loop must batch hops per action")
    } finally spark.sparkContext.removeSparkListener(listener)
    graft.GraftCache.releaseAll(spark)
  }

  test("pageRankDeep == pageRankFixedPoint at equal iteration counts") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(60)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .toDF("src", "dst")
    val unrolled = GraphOps.pageRankFixedPoint(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deep = GraphOps.pageRankDeep(edges, tolFp = 0L, maxIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deep == unrolled)
    graft.GraftCache.releaseAll(spark)
  }

  test("pageRankDeep runs past the 10-iteration unrolled cap and converges") {
    // directed 6-cycle: ranks are symmetric, so the iteration converges to
    // the uniform fixed point; tolFp generous enough to stop well before
    // maxIter but only AFTER the mass redistributes (several iterations)
    val n = 6L
    val cyc = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val ranks = GraphOps.pageRankDeep(cyc, tolFp = 1000L, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size == n)
    // symmetric graph: all ranks equal, and close to scale/n minus the
    // deterministic integer-division leak
    assert(ranks.values.toSet.size == 1)
    val r = ranks.values.head
    assert(math.abs(r - 1000000000000L / n) < 1000000000000L / 100)
    graft.GraftCache.releaseAll(spark)
  }

  test("triangleCount matches a naive all-triples count on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val canon = edges.collect {
      case (a, b) if a != b => (math.min(a, b), math.max(a, b))
    }.toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val naive = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      if canon((nodes(i), nodes(j))) && canon((nodes(j), nodes(k))) &&
        canon((nodes(i), nodes(k)))
    } yield 1).size.toLong
    val (n, m, t) = triCount(edges)
    assert((n, m, t) == ((nodes.size.toLong, canon.size.toLong, naive)))
  }

  test("hitsFixedPoint separates hubs from authorities; mass stays ~scale") {
    // 0 links to everything popular (pure hub); 1 is linked by everyone
    // (pure authority); 8/9 are bystanders with one weak edge each
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (5L, 1L), (6L, 1L), (7L, 1L),
      (8L, 9L)).toDF("src", "dst")
    val out = GraphOps.hitsFixedPoint(edges, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // 0 is the strongest hub (it cites the top authority AND the rest)
    assert(out(0L)._1 == out.values.map(_._1).max && out(0L)._1 > 0L)
    // 1 is the strongest authority, and a pure one (no out-edges -> hub 0)
    assert(out(1L)._2 == out.values.map(_._2).max && out(1L)._2 > 0L)
    assert(out(1L)._1 == 0L, "no out-edges means zero hub score")
    assert(out(0L)._2 == 0L, "no in-edges means zero authority score")
    // bystander scores are dominated by the principal pair
    assert(out(8L)._1 < out(0L)._1 && out(9L)._2 < out(1L)._2)
    // integer L1 normalization: each vector's mass is scale minus
    // truncation (one unit per nonzero entry at most)
    val hubMass = out.values.map(_._1).sum
    val authMass = out.values.map(_._2).sum
    assert(hubMass > 999990L && hubMass <= 1000000L, s"hub mass $hubMass")
    assert(authMass > 999990L && authMass <= 1000000L, s"auth mass $authMass")
  }

  test("labelPropagation: seeds clamp, plurality wins with smaller-label ties, 2-hop reach") {
    // path 0—1—2—3—4 with seeds 0 (label 7) and 4 (label 3);
    // node 9 has two label-7 neighbors vs one label-3: plurality 7;
    // node 2 ties 7 vs 3 after round 1 → smaller label 3 wins;
    // node 50—51 is an unreachable island
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (0L, 9L), (1L, 9L), (4L, 9L), (50L, 51L)).toDF("src", "dst")
    val seeds = Seq((0L, 7L), (4L, 3L)).toDF("id", "label")
    val out = GraphOps.labelPropagation(edges, seeds, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(out(0L) == 7L && out(4L) == 3L, "seeds stay clamped")
    // round 2 recomputes every non-seed from the ROUND-1 labeling
    // (synchronous): node 1 sees 0 (7) and 9 (3 from round 1) — a tie,
    // which breaks to the smaller label; same for node 2 via 1 (7) / 3 (3)
    assert(out(1L) == 3L && out(2L) == 3L,
      s"ties must break to the smaller label, got ${(out(1L), out(2L))}")
    // node 9 sees {7 (seed 0), 7 (node 1's round-1 label), 3 (seed 4)}
    assert(out(9L) == 7L, "plurality must win over the single 3-vote")
    assert(out(3L) == 3L)
    assert(out(50L) == -1L && out(51L) == -1L, "islands stay unlabeled")
    // one synchronous round reaches only seed-adjacent nodes, and a
    // non-seed's round-1 label comes from seeds alone
    val out1 = GraphOps.labelPropagation(edges, seeds, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(out1(1L) == 7L && out1(2L) == -1L && out1(9L) == 3L,
      s"round-1: ${(out1(1L), out1(2L), out1(9L))}")
  }

  test("randomWalks: edges respected, dead ends terminate, choices partition-invariant") {
    // 0 and 1 fan out; 2 is a dead end; 3 only reaches the dead end
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (1L, 2L),
      (3L, 2L)).toDF("src", "dst")
    val starts = Seq(0L, 2L, 3L).toDF("start")
    val adj = Map(0L -> Set(1L, 2L, 3L), 1L -> Set(0L, 2L), 3L -> Set(2L))
    val out = GraphOps.randomWalks(edges, starts, steps = 3, seed = "s")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    // every emitted hop follows a real edge
    out.groupBy(_._1).foreach { case (_, trace) =>
      trace.sortBy(_._2).sliding(2).foreach {
        case Array((_, t1, u), (_, t2, v)) if t2 == t1 + 1 =>
          assert(adj(u).contains(v), s"step $u -> $v is not an edge")
        case _ =>
      }
    }
    // start 2 is a dead end: only its step-0 row exists
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == Seq(0L))
    // start 3 must hop to 2 and stop there
    assert(out.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq == Seq((0L, 3L), (1L, 2L)))
    // deterministic under repartitioning
    val out2 = GraphOps.randomWalks(edges.repartition(5), starts.repartition(3),
        steps = 3, seed = "s")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(out2.toSeq == out.toSeq)
    // a different seed takes a different path somewhere
    val outSeed = GraphOps.randomWalks(edges, starts, steps = 3, seed = "other")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(outSeed.map(_._3).toSeq != out.map(_._3).toSeq ||
      outSeed.length != out.length,
      "seeds must steer choices (overwhelmingly likely on this graph)")
  }

  test("modularity: two triangles + bridge, exact integer numerators, -1 bucket for unassigned") {
    // triangles {0,1,2} and {3,4,5}, bridge (2,3), pendant (5,9) with 9
    // unassigned; plus a duplicate edge and a self-loop that must drop
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L),
      (2L, 3L), (5L, 9L), (1L, 0L), (2L, 2L)).toDF("src", "dst")
    val com = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("id", "community")
    val out = GraphOps.modularity(edges, com)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // m = 8 canonical edges; deg sums: com0 = 2+2+3 = 7, com1 = 3+2+3 = 8
    assert(out(0L) == ((0L, 3L, 7L, 3L, 8L, 4L * 8L * 3L - 49L)))
    assert(out(1L) == ((1L, 3L, 8L, 3L, 8L, 4L * 8L * 3L - 64L)))
    // node 9 has no community: lands in -1 with zero intra edges
    assert(out(-1L) == ((-1L, 1L, 1L, 0L, 8L, -1L)))
    // sanity: sum of numerators / 4m^2 is the classic Q, here ~0.305
    val q = out.values.map(_._6).sum.toDouble / (4.0 * 8.0 * 8.0)
    assert(q > 0.30 && q < 0.31, s"Q = $q")
  }

  test("modularity: a perfect 2-clique partition scores higher than a mixed one") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L))
      .toDF("src", "dst")
    def q(com: Seq[(Long, Long)]): Double =
      GraphOps.modularity(edges, com.toDF("id", "community"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(_._6).sum.toDouble / (4.0 * 6.0 * 6.0)
    val perfect = q(Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L)))
    val mixed = q(Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L), (4L, 0L), (5L, 1L)))
    assert(perfect == 0.5, s"two disjoint triangles: Q = 1/2 exactly, got $perfect")
    assert(mixed < perfect, s"shuffled labels must score lower: $mixed vs $perfect")
  }

  test("kCore: pendant chain cascades off a triangle core; k above max degree empties") {
    // triangle {0,1,2} + chain 2-3-4-5: the chain peels back one node
    // per round (5, then 4, then 3) — the cascade a single-pass degree
    // filter would miss (3 and 4 start with degree 2)
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core2 = GraphOps.kCore(g, k = 2).as[(Long, Long)].collect().toMap
    assert(core2 == Map(0L -> 2L, 1L -> 2L, 2L -> 2L),
      s"2-core is exactly the triangle with in-core degree 2: $core2")
    // idempotence at fixpoint: re-running on the surviving subgraph is a no-op
    val again = GraphOps.kCore(
      Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst"), k = 2)
      .as[(Long, Long)].collect().toMap
    assert(again == core2)
    // k exceeding every degree: empty core, empty frame (not a crash)
    assert(GraphOps.kCore(g, k = 3).isEmpty)
    // duplicate/reversed/self-loop edges canonicalize away
    val noisy = Seq((1L, 0L), (0L, 1L), (1L, 2L), (2L, 0L), (2L, 2L))
      .toDF("src", "dst")
    val c = GraphOps.kCore(noisy, k = 2).as[(Long, Long)].collect().toMap
    assert(c == Map(0L -> 2L, 1L -> 2L, 2L -> 2L), s"canonicalized: $c")
  }

  test("kCore: two nested cores — k=2 keeps the 4-cycle bridge, k=3 only the clique") {
    // K4 clique {0..3} joined by a 4-cycle {3,10,11,12}: cycle nodes
    // have degree 2, clique nodes degree >= 3
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    val cyc = Seq((3L, 10L), (10L, 11L), (11L, 12L), (12L, 3L))
    val g = (k4 ++ cyc).toDF("src", "dst")
    val c2 = GraphOps.kCore(g, k = 2).as[(Long, Long)].collect().toMap
    assert(c2.keySet == Set(0L, 1L, 2L, 3L, 10L, 11L, 12L),
      s"2-core keeps the cycle: $c2")
    assert(c2(3L) == 5L, s"shared node counts both structures: ${c2(3L)}")
    val c3 = GraphOps.kCore(g, k = 3).as[(Long, Long)].collect().toMap
    assert(c3 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"3-core strips the cycle and the shared node's degree drops: $c3")
  }

  test("subtreeRollup: hand-computed tree, root totals, truncation detectable") {
    // tree: 0 -> (1, 2); 1 -> (3, 4); 4 -> 5   (values = 10*id + 1)
    val nodes = Seq(
      (0L, Option.empty[Long], 1L), (1L, Some(0L), 11L), (2L, Some(0L), 21L),
      (3L, Some(1L), 31L), (4L, Some(1L), 41L), (5L, Some(4L), 51L))
      .toDF("id", "parent", "v")
    val got = GraphOps.subtreeRollup(nodes, "id", "parent", "v", maxDepth = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      0L -> ((0L, 6L, 156L)),  // whole tree
      1L -> ((1L, 4L, 134L)),  // {1,3,4,5}
      2L -> ((1L, 1L, 21L)),
      3L -> ((2L, 1L, 31L)),
      4L -> ((2L, 2L, 92L)),   // {4,5}
      5L -> ((3L, 1L, 51L))), s"rollup mismatch: $got")
    // truncation is LOUD, not silent: maxDepth below the tree height
    // drops deep descendants from shallow ancestors' subtrees
    val cut = GraphOps.subtreeRollup(nodes, "id", "parent", "v", maxDepth = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(cut(0L) == 5L, s"depth-2 closure must miss node 5 under the root: $cut")
    // values sum law: the root's subtree sum equals the table total
    assert(got(0L)._3 == Seq(1L, 11L, 21L, 31L, 41L, 51L).sum)
  }

  test("subtreeRollupDeep: matches the unrolled variant on a shallow tree" +
      " (incl. phantom parent)") {
    // same tree as the unrolled test, PLUS node 6 whose parent 99 is
    // absent from the table — the phantom-hop quirk both variants must
    // agree on (depth counts the hop; 99 itself emits no row)
    val nodes = Seq(
      (0L, Option.empty[Long], 1L), (1L, Some(0L), 11L), (2L, Some(0L), 21L),
      (3L, Some(1L), 31L), (4L, Some(1L), 41L), (5L, Some(4L), 51L),
      (6L, Some(99L), 61L))
      .toDF("id", "parent", "v")
    val unrolled = GraphOps.subtreeRollup(nodes, "id", "parent", "v", maxDepth = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val deep = GraphOps.subtreeRollupDeep(nodes, "id", "parent", "v")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(deep == unrolled, s"deep=$deep unrolled=$unrolled")
    assert(deep.contains((6L, 1L, 1L, 61L)), s"phantom-parent row: $deep")
  }

  test("subtreeRollupDeep: depth-100 chain — the regime the unrolled guard refuses") {
    // chain 0 <- 1 <- 2 <- ... <- 100, value = id; closed forms:
    // depth(i) = i, n_desc(i) = 101 - i, subtree_sum(i) = sum(i..100)
    val n = 100L
    val rows = (0L to n).map(i =>
      (i, if (i == 0L) Option.empty[Long] else Some(i - 1L), i))
    val nodes = rows.toDF("id", "parent", "v")
    intercept[IllegalArgumentException] {
      GraphOps.subtreeRollup(nodes, "id", "parent", "v", maxDepth = 100)
    }
    val got = GraphOps.subtreeRollupDeep(nodes, "id", "parent", "v")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == n + 1, s"rows: ${got.size}")
    (0L to n).foreach { i =>
      val expect = (i, n + 1 - i, (i to n).sum)
      assert(got(i) == expect, s"node $i: got ${got(i)}, expect $expect")
    }
  }

  test("subtreeRollupDeep: negative ids fail loudly (sentinel aliasing), not silently") {
    val nodes = Seq((-1L, Option.empty[Long], 10L), (5L, Some(-1L), 7L))
      .toDF("id", "parent", "v")
    val e = intercept[org.apache.spark.SparkException] {
      GraphOps.subtreeRollupDeep(nodes, "id", "parent", "v").collect()
    }
    assert(e.getMessage.contains("non-negative"), e.getMessage)
  }

  test("subtreeRollupDeep: parent cycle throws instead of silently looping") {
    val nodes = Seq(
      (0L, Option.empty[Long], 1L), (1L, Some(2L), 2L), (2L, Some(1L), 3L))
      .toDF("id", "parent", "v")
    val e = intercept[IllegalStateException] {
      GraphOps.subtreeRollupDeep(nodes, "id", "parent", "v")
    }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }
}
