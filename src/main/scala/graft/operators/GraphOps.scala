package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis operators over (src, dst) edge lists — the
  * page-quality signal a web-corpus curation pipeline ranks by
  * (Page et al. 1999; used as a pretraining quality prior).
  *
  * Ranks are INTEGER fixed-point (scaled by `scale`): every per-edge
  * contribution is computed with integer division, so iteration results
  * are exactly reproducible in any engine — no floating accumulation,
  * no ordering hazard. The cost is a deterministic rounding-down bias
  * of at most one unit per edge per iteration (documented, not drift:
  * both engines round identically).
  *
  * Scale shape per iteration: one shuffle joins ranks to edges on src
  * (co-keyed with the outdegree join), one partial-aggregated shuffle
  * sums contributions by dst. The node set and N are computed once;
  * N rides along as a 1-row broadcast. A fixed `iters` unrolls into a
  * single Catalyst plan — no per-round actions, no lineage explosion at
  * small depths (for deep iteration counts, checkpoint like
  * [[DedupOps.connectedComponents]] does with its RDD loop).
  *
  * Dangling nodes (no out-edges) leak their damped mass — the classic
  * simplification; both engines leak identically.
  */
object GraphOps {

  /** PageRank with damping 0.85 over `iters` synchronous iterations.
    * Returns (id, rank_fp) where rank_fp is the rank scaled by `scale`
    * (must be divisible by 100 so the teleport term is exact).
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int = 3,
                         scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters must be in [1, 10], got $iters")
    require(scale % 100L == 0L, "scale must be divisible by 100")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nDf = nodes.agg(count(lit(1)).as("n_nodes"))
    val teleport = scale / 100L * 15L
    var rank = nodes.crossJoin(broadcast(nDf))
      .select(col("id"), expr(s"CAST($scale AS BIGINT) div n_nodes").as("r"))
    (1 to iters).foreach { _ =>
      val contribs = e.join(rank.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("id"),
          expr("((r * 85) div 100) div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("csum"))
      rank = nodes.crossJoin(broadcast(nDf))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (expr(s"CAST($teleport AS BIGINT) div n_nodes")
            + coalesce(col("csum"), lit(0L))).as("r"))
    }
    rank.select(col("id"), col("r").as("rank_fp"))
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) in an all-integer
    * L1-normalized form: authority(v) = Σ hub(u) over in-edges,
    * hub(u) = Σ authority(v) over out-edges, each vector rescaled to
    * L1 mass `scale` by integer division after every half-step (the
    * classic formulation L2-normalizes; L1 keeps the arithmetic exact
    * cross-engine, and normalization choice does not change the
    * ranking). Complements PageRank: one score per node vs the
    * hub/authority split a link-farm-resistant crawl ranker wants.
    *
    * Scale shape per half-step: one co-keyed edge⋈score join, one
    * partial-aggregated sum by the opposite endpoint, and a 1-row
    * global mass broadcast — the q105 iteration shape twice per round.
    * Fixed `iters` unrolls into one Catalyst plan; deep counts would
    * reuse the [[pageRankDeep]] RDD skeleton.
    *
    * Returns (id, hub_e6, auth_e6) at scale = 10^6.
    */
  def hitsFixedPoint(edges: DataFrame, iters: Int = 2,
                     scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 5, s"iters must be in [1, 5], got $iters")
    // NOTE (round 17): persisting e/nodes here was MEASURED 7× SLOWER
    // (2.7 s → 18.9 s at sf0.1) — the InMemoryRelation is an
    // optimization barrier that blocks the per-branch pruning and the
    // broadcast of the 1-row mass frames; AQE's ReusedExchange already
    // dedups the repeated node-set subtree without it. Left unpersisted
    // deliberately.
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var hub = nodes.select(col("id"), lit(scale).as("h"))
    var auth = nodes.select(col("id"), lit(0L).as("a"))
    (1 to iters).foreach { _ =>
      val ar = e.join(hub.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("h"))
        .groupBy("id").agg(sum("h").as("raw"))
      val asum = ar.agg(sum("raw").as("s"))
      auth = nodes.join(ar, Seq("id"), "left").crossJoin(broadcast(asum))
        .select(col("id"),
          coalesce(expr(s"(raw * $scale) div s"), lit(0L)).as("a"))
      val hr = e.join(auth.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("a"))
        .groupBy("id").agg(sum("a").as("raw"))
      val hsum = hr.agg(sum("raw").as("s"))
      hub = nodes.join(hr, Seq("id"), "left").crossJoin(broadcast(hsum))
        .select(col("id"),
          coalesce(expr(s"(raw * $scale) div s"), lit(0L)).as("h"))
    }
    hub.join(auth, "id")
      .select(col("id"), col("h").as("hub_e6"), col("a").as("auth_e6"))
  }

  /** SEMI-SUPERVISED LABEL PROPAGATION (Zhu & Ghahramani 2002, hard
    * clamped form): seed nodes keep their labels; every other node
    * adopts the plurality label of its (undirected) labeled neighbors
    * each synchronous round, ties to the smaller label. A node with no
    * labeled neighbor stays unlabeled (-1). The cheap transductive
    * labeler for "we labeled 10%, spread it over the link graph".
    *
    * Deterministic: plurality = min(struct(-count, label)) — a
    * map-side-combinable struct-min, no window over votes, identical
    * tie-breaks in any engine.
    *
    * Scale shape per round: one labeled-node⋈edges equi-join + one
    * partial-aggregated vote count keyed by (node, label) + the
    * struct-min fold; seeds ride a broadcast-sized side if the seed
    * fraction is small, but the plan never assumes it. Fixed `iters`
    * unrolls into one Catalyst plan (deep counts → the [[pageRankDeep]]
    * RDD skeleton).
    *
    * Returns (id, label) with -1 for never-reached nodes.
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 5, s"iters must be in [1, 5], got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val nodes = sym.select(col("src").as("id")).distinct()
    val s0 = seeds.select(col("id").cast("long").as("id"),
      col("label").cast("long").as("label"))
    var labeled = s0
    (1 to iters).foreach { _ =>
      val votes = sym.join(labeled.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      val adopted = votes.groupBy("id")
        .agg(min(struct((-col("c")).as("negc"), col("label").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("label"))
        .join(s0.select("id"), Seq("id"), "left_anti")
      labeled = s0.unionByName(adopted)
    }
    nodes.join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), lit(-1L)).as("label"))
  }

  /** DETERMINISTIC RANDOM WALKS (the DeepWalk/node2vec corpus
    * generator): from each start node, `steps` uniform steps where the
    * "random" choice at (start, step, node) is the portable md5 hash of
    * `"<seed>_<start>_<step>_<node>"` mod outdegree — every walk is
    * reproducible across runs, partitionings, AND engines (q201's
    * oracle replays the identical choices), which is what makes a
    * walk corpus regenerable instead of stored.
    *
    * Out-edges are DISTINCT and ranked by destination id (multi-edges
    * would make the rank nondeterministic); self-loops are dropped. A
    * walk reaching a node with no out-edges ends there (inner join
    * drops it from later steps).
    *
    * Scale shape: the ranked adjacency is built once (one src-keyed
    * window); each step is one equi-join of the frontier against it —
    * frontier rows never exceed |starts|. Returns
    * (start, step, node) for steps 0..`steps`.
    */
  def randomWalks(edges: DataFrame, starts: DataFrame, steps: Int,
                  seed: String): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps must be in [1, 8], got $steps")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val w = Window.partitionBy("src").orderBy("dst")
    val adj = e.select(col("src"), col("dst"),
      row_number().over(w).cast("long").as("rk"),
      count(lit(1)).over(Window.partitionBy("src")).cast("long").as("outdeg"))
    val w0 = starts.select(col("start").cast("long").as("start"),
      lit(0L).as("step"), col("start").cast("long").as("node"))
    var frontier = w0
    val traces = scala.collection.mutable.ArrayBuffer(w0)
    (1 to steps).foreach { t =>
      val choice = pmod(graft.functions.HashFunctions.portableHash60(
        concat(lit(s"${seed}_"), col("start").cast("string"),
          lit(s"_${t}_"), col("node").cast("string"))), col("outdeg")) + 1L
      frontier = frontier.join(adj, frontier("node") === adj("src"))
        .where(col("rk") === choice)
        .select(col("start"), lit(t.toLong).as("step"), col("dst").as("node"))
      traces += frontier
    }
    traces.reduce(_ unionByName _)
  }

  /** [[pageRankFixedPoint]] past the 10-iteration unrolled-plan cap:
    * the same integer recurrence as an RDD loop with one shared
    * `HashPartitioner`, iterating to CONVERGENCE (total L1 rank change
    * <= `tolFp` fixed-point units) instead of a fixed count.
    *
    * Same skeleton as [[bfsDistancesDeep]] / the CC rounds: the
    * (src -> (dst, outdeg)) adjacency is shuffled onto the shared
    * partitioner once and persisted; each iteration joins ranks to it
    * narrowly (co-partitioned), and one `reduceByKey` shuffle sums the
    * per-target contributions — the L1 delta that decides convergence is
    * computed by the SAME action that materializes the iteration's
    * persist (one job per iteration, nothing compiled per round).
    * Bit-identical to the unrolled variant at equal iteration counts
    * (spec-asserted): same integer division order, same dangling-mass
    * leak.
    */
  def pageRankDeep(edges: DataFrame, tolFp: Long = 1000000L,
                   maxIter: Int = 100,
                   scale: Long = 1000000000000L): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    require(scale % 100L == 0L, "scale must be divisible by 100")
    require(tolFp >= 0L, s"tolFp must be >= 0, got $tolFp")
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    // width follows the input's split count (capped at the session
    // setting) — same rationale as [[bfsDistancesDeep]]: don't pay a
    // 32-task scheduling floor per iteration on a small graph
    val part = new HashPartitioner(math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions, e0.getNumPartitions)))
    val outdeg = e0.mapValues(_ => 1L).reduceByKey(part, _ + _)
    // src -> (dst, outdeg(src)): narrow join (both sides on `part`),
    // persisted once — every iteration reads it without a shuffle
    val adj = e0.partitionBy(part).join(outdeg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e0.flatMap { case (s, d) => Iterator((s, ()), (d, ())) }
      .reduceByKey(part, (a, _) => a)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    if (n == 0L) {
      adj.unpersist(false); nodes.unpersist(false)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("rank_fp",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    val teleportPer = (scale / 100L * 15L) / n
    var rank: RDD[(Long, Long)] = nodes.mapValues(_ => scale / n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    rank.count()
    var i = 0
    var delta = Long.MaxValue
    while (delta > tolFp && i < maxIter) {
      // contributions: narrow join against the persisted adjacency, ONE
      // shuffle sums per target (map-side combine collapses fan-in)
      val contribs = rank.join(adj)
        .map { case (_, (r, (dst, od))) => (dst, ((r * 85L) / 100L) / od) }
        .reduceByKey(part, _ + _)
      val next = nodes.leftOuterJoin(contribs) // narrow: both on `part`
        .mapValues { case (_, c) => teleportPer + c.getOrElse(0L) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      // the iteration's ONE action: materializes next AND sums |change|
      delta = next.join(rank)
        .treeAggregate(0L)(
          { case (acc, (_, (a, b))) => acc + math.abs(a - b) }, _ + _)
      rank.unpersist(false)
      rank = next
      i += 1
    }
    graft.GraftCache.registerRdd(spark, rank)
    graft.GraftCache.registerRdd(spark, adj)
    graft.GraftCache.registerRdd(spark, nodes)
    val out = rank.map { case (id, r) => org.apache.spark.sql.Row(id, r) }
    spark.createDataFrame(out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank_fp",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Multi-source BFS distances over an undirected edge list, unrolled
    * to `maxHops` synchronous frontier expansions — hop distance from
    * the nearest seed (crawl frontier depth, link distance from trusted
    * domains a la TrustRank). Unvisited nodes are absent.
    *
    * Scale shape per hop: the frontier (rows that FIRST appeared last
    * hop) joins the edge list on the node key and the union re-mins —
    * both partial-aggregating equi-joins; the frontier shrinks as the
    * reachable set saturates. A fixed small `maxHops` unrolls into one
    * Catalyst plan (the [[pageRankFixedPoint]] pattern); deep traversals
    * use [[bfsDistancesDeep]], the RDD loop on the
    * [[DedupOps.connectedComponents]] skeleton.
    */
  def bfsDistances(edges: DataFrame, sources: Seq[Long],
                   maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, s"maxHops must be in [1, 8], got $maxHops")
    require(sources.nonEmpty, "need at least one source node")
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val e = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var dist = sources.map(id => (id, 0L)).toDF("id", "dist")
    (1 to maxHops).foreach { h =>
      val next = dist.where(col("dist") === (h - 1).toLong)
        .join(e, col("id") === col("src"))
        .select(col("dst").as("id"), lit(h.toLong).as("dist"))
      dist = dist.unionByName(next)
        .groupBy("id").agg(min("dist").as("dist"))
    }
    dist
  }

  /** [[bfsDistances]] past the unrolled-plan regime: multi-source BFS as
    * an RDD loop with one shared `HashPartitioner` — the deep-traversal
    * path (supply chains, citation depth, long redirect chains) where a
    * per-hop Catalyst plan would Janino-compile ~6 fresh codegen classes
    * per hop and the lineage would grow a join per hop.
    *
    * Same skeleton as [[DedupOps.connectedComponentsWithRounds]]:
    *  - the symmetric adjacency list is shuffled ONCE onto the shared
    *    partitioner and persisted; every hop's `join` against it is then
    *    NARROW (both sides co-partitioned), so a hop costs one shuffle
    *    (the frontier expansion's `reduceByKey`) regardless of depth;
    *  - the visited set and each new frontier are co-partitioned, so the
    *    frontier dedupe (`subtractByKey`) and the visited merge
    *    (`zipPartitions` concatenation — keys are disjoint by
    *    construction) add no shuffle;
    *  - hops run in BATCHES of `hopBatch` inside ONE action (round 17:
    *    the per-hop count was pure scheduling floor — a diameter-50
    *    path spent ~70 ms/job on ~µs of data; batching 4 hops per job
    *    cut q167 ~2×). Mid-batch hops chain lazily — each hop's
    *    `reduceByKey` output is shuffle-file-backed within the job, so
    *    nothing recomputes — and the batch-end count materializes the
    *    chain. Convergence = the merged-visited count stopped growing;
    *    an empty frontier mid-batch just drains the remaining hops as
    *    empty stages, costing at most one extra (cheap) batch over the
    *    exact per-hop test. Distances are exact either way: every hop
    *    subtracts the up-to-date lazy merged-visited set. `maxHops`
    *    stays a safety cap on HOPS, not jobs.
    *
    * Returns (id, dist) with dist = hop distance from the nearest seed;
    * unreachable nodes are absent. Output is identical to
    * [[bfsDistances]] wherever both run (spec-asserted).
    */
  def bfsDistancesDeep(edges: DataFrame, sources: Seq[Long],
                       maxHops: Int = 64): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    require(sources.nonEmpty, "need at least one source node")
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val sc = spark.sparkContext
    val e0 = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    // Partitioner width follows the INPUT's width (capped at the session
    // shuffle setting): a deep loop pays per-hop task-scheduling floor on
    // every partition, so a small graph (few input splits) should not run
    // 32 near-empty tasks per hop, while a big graph keeps full width.
    val part = new HashPartitioner(math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions, e0.getNumPartitions)))
    // undirected: symmetric view, shuffled onto the shared partitioner
    // once — every hop joins narrowly against this
    val adj = e0.flatMap { case (s, d) => Iterator((s, d), (d, s)) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val seeds = sources.distinct.map(id => (id, 0L))
    var visited: RDD[(Long, Long)] =
      sc.parallelize(seeds).partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var frontier: RDD[(Long, Long)] = visited
    var h = 0L
    var prevCount = frontier.count()
    var done = prevCount == 0L
    // 4 hops per scheduled job: deep traversals are scheduling-floor
    // bound, and a lazily-chained batch turns 4 job submissions into 4
    // shuffle stages of ONE job (see scaladoc).
    val hopBatch = 4
    while (!done && h < maxHops) {
      var nextF = frontier
      var mergedV = visited
      var steps = 0
      while (steps < hopBatch && h < maxHops) {
        h += 1L
        val hop = h
        // expand: co-partitioned narrow join, then ONE shuffle dedupes
        // the candidate frontier (map-side combine collapses fan-in
        // before the wire); subtract the up-to-date lazy visited set
        // narrowly (co-partitioned)
        val next = nextF.join(adj)
          .map { case (_, (_, v)) => (v, hop) }
          .reduceByKey(part, (a, _) => a)
          .subtractByKey(mergedV, part)
        // keys are disjoint (subtractByKey) and both sides share `part`,
        // so per-partition concatenation IS the merged visited set
        val merged = mergedV.zipPartitions(next, preservesPartitioning = true)(
          (a, b) => a ++ b)
        nextF = next
        mergedV = merged
        steps += 1
      }
      // ONE action materializes the whole batch; convergence = the
      // visited count stopped growing (counts only grow — merged is a
      // disjoint union — so equality is exact, not a checksum gamble)
      val nextP = nextF.persist(StorageLevel.MEMORY_AND_DISK)
      val mergedP = mergedV.persist(StorageLevel.MEMORY_AND_DISK)
      val n = mergedP.count()
      if (n == prevCount) {
        nextP.unpersist(false); mergedP.unpersist(false); done = true
      } else {
        // merged now holds the data; parents recompute (if ever) narrowly
        // from retained shuffle files, exactly like the CC rounds
        val (oldVisited, oldFrontier) = (visited, frontier)
        oldVisited.unpersist(false)
        if (oldFrontier ne oldVisited) oldFrontier.unpersist(false)
        visited = mergedP
        frontier = nextP // stays persisted for the next batch's join
        prevCount = n
      }
    }
    // released by the caller's GraftCache cycle; the returned frame stays
    // recomputable afterwards (narrow chain over retained shuffle files)
    graft.GraftCache.registerRdd(spark, visited)
    if (frontier ne visited) graft.GraftCache.registerRdd(spark, frontier)
    graft.GraftCache.registerRdd(spark, adj)
    val out = visited.map { case (id, d) => org.apache.spark.sql.Row(id, d) }
    spark.createDataFrame(out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dist",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Global triangle count (plus node/edge counts) over an undirected
    * graph given as a (src, dst) edge list — the clustering signal that
    * separates organic link neighborhoods from link farms in web-corpus
    * curation.
    *
    * Degree-ordered orientation (Cohen, CiSE 2009): each canonical
    * edge points from the endpoint with the smaller (degree, id) to the
    * larger, so every out-degree is O(sqrt(m)) on any graph — the wedge
    * join (the quadratic step of a naive approach) generates at most
    * O(m^1.5) candidate wedges, each closed by ONE equi-join probe
    * against the oriented edge set. Both joins are partial-agg-free
    * shuffles on node keys; nothing is ever collected.
    *
    * A triangle {x, y, z} is counted exactly once: orientation is a DAG
    * under a total order, so the wedge forms only at the minimum vertex
    * and the closing edge has one canonical direction.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val c = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = c.select(col("a").as("id"))
      .unionAll(c.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient each edge low -> high in the (deg, id) total order
    val oriented = c
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val ok = oriented
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("dv"))
    // wedges at the minimum vertex: two out-edges (u->v, u->w), ordered
    // so the closing oriented edge can only be v->w
    val wedges = ok.select(col("u"), col("v"), col("dv"))
      .join(ok.select(col("u"), col("v").as("w"), col("dv").as("dw")), "u")
      .where(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .select(col("v").as("u"), col("w").as("v"))
    val tri = wedges.join(oriented, Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = c.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(tri)
  }

  /** Newman modularity of a GIVEN node partition (the quality metric for
    * q200's label-prop communities, Louvain outputs, or any taxonomy
    * assignment): per community c, `Q_c = e_c/m − (d_c/2m)²` where e_c
    * is the intra-community edge count and d_c the community degree sum.
    * Emitted as the EXACT integer numerator `q_num_4m2 = 4·m·e_c − d_c²`
    * over the common denominator 4m² — summing q_num_4m2/(4m²) across
    * rows reconstructs Q with zero FP drift, so the whole report
    * hash-checks.
    *
    * `edges` (src, dst) is canonicalized undirected (self-loops and
    * duplicates dropped); `communities` is (id, community: long) — nodes
    * absent from it land in community −1 rather than silently vanishing
    * from the mass balance. Shape: one distinct-edge shuffle, one degree
    * count, two broadcast-size community joins keyed by node, and a 1-row
    * broadcast of m. Long-exact while 4m² < 2⁶³ (m < ~1.5e9 undirected
    * edges; shard the edge set and merge counts beyond that).
    *
    * Returns (community, n_nodes, deg_sum, e_in, m, q_num_4m2).
    */
  def modularity(edges: DataFrame, communities: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b")).distinct()
    val m = canon.agg(count(lit(1)).as("m"))
    val com = communities.select(col("id").cast("long").as("id"),
      col("community").cast("long").as("community"))
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val perCom = deg.join(com, Seq("id"), "left")
      .select(coalesce(col("community"), lit(-1L)).as("community"), col("deg"))
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("deg_sum"))
    val eIn = canon
      .join(com.select(col("id").as("a"), col("community").as("ca")), Seq("a"), "left")
      .join(com.select(col("id").as("b"), col("community").as("cb")), Seq("b"), "left")
      .where(coalesce(col("ca"), lit(-1L)) === coalesce(col("cb"), lit(-1L)))
      .groupBy(coalesce(col("ca"), lit(-1L)).as("community"))
      .agg(count(lit(1)).as("e_in"))
    perCom.join(eIn, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"), col("deg_sum"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("m"),
        (lit(4L) * col("m") * coalesce(col("e_in"), lit(0L))
          - col("deg_sum") * col("deg_sum")).as("q_num_4m2"))
  }

  /** Nodes of the k-core — the maximal subgraph where every node keeps
    * degree >= k — with their degree inside the core. The standard
    * link-farm / spam-cluster density filter in web-graph curation
    * (a retained page must have k surviving mutual neighbors, however
    * large its raw degree was before weak neighbors peeled away).
    *
    * Matula–Beck peeling run as an RDD fixpoint loop in the
    * [[graft.operators.DedupOps.connectedComponents]] /
    * [[bfsDistancesDeep]] style: canonical undirected edges land on ONE
    * shared HashPartitioner; every round recomputes degrees with a
    * map-side-combined `reduceByKey`, drops nodes below k, and filters
    * the edge set through two co-partitioned joins (by src, re-key, by
    * dst). Peeling is monotone — the surviving edge set only shrinks —
    * so the loop converges in at most (peeling-depth) rounds, each a
    * bounded number of co-partitioned shuffles, and ONE action per
    * round (the surviving-edge count) decides convergence. DataFrame
    * unrolling would Janino-compile fresh codegen classes per round
    * (the documented q63 pathology); the RDD loop compiles nothing.
    *
    * Returns (id, core_deg) for k-core members only: core_deg is the
    * degree within the final core (>= k by construction).
    *
    * CONSUMPTION CONTRACT (differs from connectedComponents/BFS): a peel
    * that runs >= 10 rounds localCheckpoints its state every 10th round
    * to bound lineage depth, which TRUNCATES the lineage — after
    * [[graft.GraftCache.releaseAll]] unpersists the registered state the
    * returned frame is NOT recomputable (re-execution would look for
    * deleted checkpoint blocks). Fully consume (write/collect/count) the
    * result BEFORE releasing caches — the discipline Bench/Verify follow
    * for every query. Shallow peels (< 10 rounds) keep the usual
    * recomputable-after-release property.
    */
  def kCore(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val e0 = edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b")).distinct()
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val part = new HashPartitioner(math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions, e0.getNumPartitions)))
    // symmetric view keyed by endpoint, on the shared partitioner: the
    // canonical pair rides along as the value so filtered rounds can
    // re-key without touching the other direction
    var alive: RDD[(Long, (Long, Long))] = e0
      .flatMap { case (a, b) => Iterator((a, (a, b)), (b, (a, b))) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    var nAlive = alive.count() // 2x canonical edge count
    var done = nAlive == 0L
    val kk = k.toLong
    var round = 0
    while (!done) {
      round += 1
      // degrees of the surviving subgraph; survivors keep deg >= k
      val deg = alive.mapValues(_ => 1L).reduceByKey(part, _ + _)
      val survivors = deg.filter(_._2 >= kk)
      // keep edges whose BOTH endpoints survive: the symmetric view is
      // keyed by one endpoint per copy, so one co-partitioned join
      // checks this copy's key and a re-key + second join checks the
      // other endpoint. Both joins are narrow (shared partitioner).
      // each copy checks its own key endpoint, re-keys to the OTHER
      // endpoint for the second check, then re-keys back — so the
      // symmetric-view invariant (each copy keyed by its endpoint)
      // holds for the next round, and both joins stay co-partitioned.
      val next = alive.join(survivors)
        .map { case (x, ((a, b), _)) => (if (x == a) b else a, (a, b)) }
        .partitionBy(part)
        .join(survivors)
        .map { case (y, ((a, b), _)) => (if (y == a) b else a, (a, b)) }
        .partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // A deep peel cascade can run many rounds: localCheckpoint every
      // 10th round truncates the per-round join-pair lineage chain
      // (driver stack-depth risk on pathological graphs), and the
      // BLOCKING unpersist keeps the previous round from coexisting
      // with the next while its lineage is still referenced — without
      // it, MEMORY_AND_DISK blocks of every peeled round could pile up
      // transiently (round-8 advice).
      if (round % 10 == 0) next.localCheckpoint()
      val nNext = next.count() // the round's ONE action
      done = nNext == nAlive || nNext == 0L
      val old = alive; alive = next; old.unpersist(blocking = true)
      nAlive = nNext
    }
    graft.GraftCache.registerRdd(spark, alive)
    val coreDeg = alive.mapValues(_ => 1L).reduceByKey(part, _ + _)
      .map { case (id, d) => org.apache.spark.sql.Row(id, d) }
    spark.createDataFrame(coreDeg,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("core_deg",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Subtree rollup over a parent-pointer hierarchy (account trees,
    * category taxonomies, org charts): for every node, the count and
    * value sum of its whole subtree (descendants + self) plus its depth
    * from the root — the recursive-CTE aggregation a warehouse runs on
    * chart-of-accounts tables, expressed without recursion.
    *
    * Shape: the ancestor CLOSURE is materialized by `maxDepth` unrolled
    * co-keyed equi-joins against the parent map (each round advances
    * every node's chain one ancestor; chains stop at roots, whose NULL
    * parent never enters the map). The closure holds ≤ n·(height+1)
    * (node, anc) long pairs — tree height, not row count, bounds the
    * blow-up — and both outputs (per-ancestor subtree aggregates,
    * per-node depth) are partial-aggregable group-bys over it. The
    * caller must pass maxDepth ≥ tree height (for the q247 contract
    * tree, height = ceil(log4 maxKey)) — a truncated chain would
    * under-aggregate, which q247's INDEPENDENT recursive oracle and
    * GraphOpsSpec's truncation test both catch. Trees deeper than the
    * unrolled-plan regime (~12) take [[subtreeRollupDeep]], the RDD
    * leaf-peeling loop with O(n) state per round.
    *
    * `nodes` must carry (idCol, parentCol nullable for roots, valueCol);
    * returns (id, depth, n_desc, subtree_sum) — all LongType.
    */
  def subtreeRollup(nodes: DataFrame, idCol: String, parentCol: String,
                    valueCol: String, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 12,
      s"maxDepth must be in [1, 12] (deeper trees take subtreeRollupDeep), got $maxDepth")
    val pm = nodes
      .select(col(idCol).cast("long").as("c"), col(parentCol).cast("long").as("p"))
      .where(col("p").isNotNull)
    val self = nodes.select(col(idCol).cast("long").as("node"),
      col(idCol).cast("long").as("anc"))
    var cur = self
    var acc = self
    (1 to maxDepth).foreach { _ =>
      cur = cur.join(pm, col("anc") === col("c"))
        .select(col("node"), col("p").as("anc"))
      acc = acc.unionByName(cur)
    }
    val vals = nodes.select(col(idCol).cast("long").as("node"),
      col(valueCol).cast("long").as("v"))
    val perAnc = acc.join(vals, "node")
      .groupBy(col("anc").as("id"))
      .agg(count(lit(1)).as("n_desc"), sum("v").as("subtree_sum"))
    val depth = acc.groupBy(col("node").as("id"))
      .agg((count(lit(1)) - 1L).as("depth"))
    perAnc.join(depth, "id")
      .select(col("id"), col("depth"), col("n_desc"), col("subtree_sum"))
  }

  /** Deep-hierarchy variant of [[subtreeRollup]]: the same
    * (id, depth, n_desc, subtree_sum) contract, but computed by TWO
    * O(height)-round RDD fixpoint loops with O(n) state per round
    * instead of materializing the n·(height+1) ancestor closure — the
    * path for 100-deep org charts / bill-of-materials trees where the
    * unrolled plan would blow up in both closure size and join count.
    *
    * Pass 1 (bottom-up leaf peeling, the Matula–Beck shape [[kCore]]
    * uses): every node starts with (n=1, sum=value, remaining=#children).
    * Each round, nodes with remaining == 0 FINALIZE — their accumulated
    * (n, sum) IS their subtree aggregate — and flush one combined
    * (n, sum, flushedChildren) record to their parent (map-side combined
    * by reduceByKey, so a million-leaf fan-in crosses the wire as one
    * record per parent per partition). All joins run on one shared
    * HashPartitioner, so only the child→parent key change shuffles.
    * Round count = tree height + 1; each round runs ONE job.
    *
    * Pass 2 (top-down depth walk): seed the roots, descend one level
    * per round over the co-partitioned child adjacency. A forest needs
    * no visited-set subtraction — each node has exactly one parent and
    * is reached exactly once.
    *
    * Semantics match [[subtreeRollup]] exactly, including its phantom-
    * parent behavior (a parentCol id absent from the table: the child
    * still counts that hop in its depth, and the phantom's own
    * aggregate group is dropped) — so the two variants share one oracle
    * text, q105/q168-style. Stricter on malformed input: a parent CYCLE
    * makes the unrolled closure silently loop chains, while this loop
    * detects the stall (no node finalizes, pending nodes remain) and
    * throws. `maxRounds` bounds both loops against adversarial input.
    * Node ids must be non-negative (−1 is the internal NULL-parent
    * sentinel).
    */
  def subtreeRollupDeep(nodes: DataFrame, idCol: String, parentCol: String,
                        valueCol: String, maxRounds: Int = 256): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = nodes.sparkSession
    val sc = spark.sparkContext
    // every persisted RDD registers with GraftCache AT CREATION, so the
    // designed throw paths (cycle stall, maxRounds) leak nothing — the
    // caller's releaseAll sweep reaps them (unpersist is idempotent for
    // the ones the loop already released)
    def pin[T](rdd: RDD[T]): RDD[T] = graft.GraftCache.registerRdd(spark,
      rdd.persist(StorageLevel.MEMORY_AND_DISK))
    val base0 = nodes.select(col(idCol).cast("long").as("id"),
        col(parentCol).cast("long").as("p"), col(valueCol).cast("long").as("v"))
      .rdd.map { r =>
        val id = r.getLong(0)
        val p = if (r.isNullAt(1)) -1L else r.getLong(1)
        // task-side guard: −1 is the internal NULL-parent sentinel, so a
        // negative id/parent would silently alias it — fail loudly instead
        // (the unrolled subtreeRollup handles negative ids; route there)
        require(id >= 0L && (r.isNullAt(1) || p >= 0L),
          s"subtreeRollupDeep requires non-negative ids (got id=$id, parent=$p)")
        (id, (p, r.getLong(2)))
      }
    val part = new HashPartitioner(math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions, base0.getNumPartitions)))
    val base = pin(base0.partitionBy(part))
    // Split parent pointers into real (parent id present in the table)
    // and phantom: contributions to phantoms vanish, but the hop still
    // counts one depth level — [[subtreeRollup]]'s exact closure
    // semantics. parentExists rides the child→parent shuffle once.
    val idSet: RDD[(Long, Unit)] = base.mapValues(_ => ())
    val byParent = base.filter(_._2._1 != -1L)
      .map { case (c, (p, _)) => (p, c) }.partitionBy(part)
    val resolved = pin(byParent.leftOuterJoin(idSet, part)
      .map { case (p, (c, exists)) => (c, (p, exists.isDefined)) }
      .partitionBy(part))
    // real child→parent map (flatMapValues PRESERVES the partitioner —
    // co-partitioned with everything else, no per-round shuffle)
    val parentOf: RDD[(Long, Long)] = resolved
      .flatMapValues { case (p, ex) => if (ex) Iterator.single(p) else Iterator.empty }
    val childCnt = parentOf.map { case (_, p) => (p, 1L) }.reduceByKey(part, _ + _)
    // state: (id, (n, sum, remainingChildren)); finalized: (id, (n, sum))
    var pending: RDD[(Long, (Long, Long, Long))] = pin(base
      .leftOuterJoin(childCnt, part)
      .mapValues { case ((_, v), c) => (1L, v, c.getOrElse(0L)) })
    var finalized: RDD[(Long, (Long, Long))] =
      pin(sc.emptyRDD[(Long, (Long, Long))].partitionBy(part))
    var nPending = pending.count()
    var round = 0
    while (nPending > 0L) {
      round += 1
      if (round > maxRounds) throw new IllegalStateException(
        s"subtreeRollupDeep: $nPending nodes unresolved after $maxRounds " +
          "rounds — tree deeper than maxRounds, or a parent cycle")
      val ready = pin(pending.filter(_._2._3 == 0L))
      // finalized ∪ ready: disjoint keys, both on `part`, so per-partition
      // concatenation merges; the ready count rides an accumulator so ONE
      // action materializes ready + the merge AND decides progress.
      val readyCount = sc.longAccumulator(s"rollup_ready_r$round")
      val merged = pin(finalized.zipPartitions(
          ready.mapValues { case (n, s, _) => (n, s) },
          preservesPartitioning = true)(
          (a, b) => a ++ b.map { e => readyCount.add(1L); e }))
      if (round % 10 == 0) merged.localCheckpoint()
      // flush: each finalized node sends ONE (n, sum, 1) to its real
      // parent; reduceByKey map-side combines the sibling fan-in.
      val contrib = ready.join(parentOf)
        .map { case (_, ((n, s, _), p)) => (p, (n, s, 1L)) }
        .reduceByKey(part, (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      val stillPending = pending.filter(_._2._3 > 0L)
      val nextPending = pin(stillPending.leftOuterJoin(contrib, part)
        .mapValues {
          case ((n, s, r), Some((cn, cs, ck))) => (n + cn, s + cs, r - ck)
          case ((n, s, r), None) => (n, s, r)
        })
      // the PENDING chain is the lineage that deepens one join per round
      // — truncate it periodically or task serialization stack-overflows
      // around round ~90 (observed on the depth-100 chain test)
      if (round % 10 == 0) nextPending.localCheckpoint()
      // The round's ONE job must materialize BOTH merged and nextPending
      // before the old round's blocks go away: the previous pending was
      // checkpoint-truncated every 10th round, so a later lazy recompute
      // through it would die with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
      // (observed). Draining both iterators in one zipPartitions
      // populates both caches in a single job.
      merged.zipPartitions(nextPending, preservesPartitioning = false)(
        (a, b) => Iterator.single(a.length + b.length)).count()
      if (readyCount.value == 0L) throw new IllegalStateException(
        s"subtreeRollupDeep: stalled with $nPending pending nodes at " +
          s"round $round — parent cycle in the input")
      val (oldPending, oldFinalized) = (pending, finalized)
      pending = nextPending
      finalized = merged
      nPending -= readyCount.value
      oldPending.unpersist(blocking = true)
      oldFinalized.unpersist(blocking = false)
      ready.unpersist(blocking = false)
    }
    // Pass 2: depth. Seeds: null-parent roots at 0, phantom-parent
    // roots at 1 (the phantom hop). Descend the real child adjacency.
    val childAdj = pin(parentOf.map { case (c, p) => (p, c) }
      .partitionBy(part))
    val nullRoots = base.filter(_._2._1 == -1L).mapValues(_ => 0L)
    val phantomRoots = resolved
      .flatMapValues { case (_, ex) => if (ex) Iterator.empty else Iterator.single(1L) }
    var depths: RDD[(Long, Long)] = pin(nullRoots
      .zipPartitions(phantomRoots, preservesPartitioning = true)(_ ++ _))
    var frontier = depths
    var level = 0
    var frontierN = depths.count()
    while (frontierN > 0L && level <= maxRounds) {
      level += 1
      val next = pin(frontier.join(childAdj)
        .map { case (_, (d, c)) => (c, d + 1L) }
        .partitionBy(part))
      // same lineage-depth guard as the peel loop: the frontier chain
      // grows one join per level
      if (level % 10 == 0) next.localCheckpoint()
      val levelSize = sc.longAccumulator(s"rollup_depth_l$level")
      val mergedD = pin(depths.zipPartitions(next, preservesPartitioning = true)(
          (a, b) => a ++ b.map { e => levelSize.add(1L); e }))
      if (level % 10 == 0) mergedD.localCheckpoint()
      mergedD.count() // the level's ONE job
      val (oldDepths, oldFrontier) = (depths, frontier)
      depths = mergedD
      frontier = next
      frontierN = levelSize.value
      oldDepths.unpersist(blocking = true)
      if (oldFrontier ne oldDepths) oldFrontier.unpersist(blocking = false)
    }
    // (everything is already registered via pin at creation)
    // co-partitioned narrow join: every real node has a depth (forest
    // reachability from the seeded roots) and a finalized aggregate
    val out = finalized.join(depths)
      .map { case (id, ((n, s), d)) => org.apache.spark.sql.Row(id, d, n, s) }
    spark.createDataFrame(out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("depth",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_desc",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("subtree_sum",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
