package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset assembly operators for training pipelines: deterministic
  * splits and token-budget sequence packing.
  *
  * Scale notes:
  *  - [[hashSplit]] is a pure per-row projection (zero shuffles, zero
  *    state): the split is a function of the id alone, so it is stable
  *    across runs, re-partitions, and incremental appends — new rows
  *    never move old rows between splits (the property rand()-based
  *    splits lack).
  *  - [[packByTokenBudget]] packs WITHIN deterministic shards
  *    (id-derived), the standard distributed shape: shards pack in
  *    parallel, each shard's window orders by id, and the shuffle
  *    carries (shard, id, n_tokens) — never document payloads. One
  *    shard's rows must fit a task (bound shards accordingly).
  */
object SampleOps {

  /** Deterministic train/val/test assignment from the 64-bit hash of the
    * id: balanced regardless of id distribution, reproducible across
    * engines that share the hash. `boundaries` are cumulative percentages
    * (e.g. 80, 90 → train 80%, val 10%, test 10%).
    */
  def hashSplit(df: DataFrame, idCol: String,
                names: Seq[String] = Seq("train", "val", "test"),
                boundaries: Seq[Int] = Seq(80, 90)): DataFrame = {
    require(names.size == boundaries.size + 1, "need one more name than boundary")
    val bucket = pmod(xxhash64(col(idCol)), lit(100))
    val split = boundaries.zip(names).foldRight(lit(names.last): org.apache.spark.sql.Column) {
      case ((b, n), rest) => when(bucket < b, n).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5 of the
    * value's string form, read as an unsigned integer. Any engine with
    * md5 reproduces it bit-for-bit (DuckDB:
    * `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT`), which
    * makes splits/samples derived from it verifiable ACROSS engines —
    * the property `xxhash64` (Spark-specific) lacks. ~3× slower than
    * xxhash64 per row; prefer [[hashSplit]] when only Spark reads the
    * split and portability doesn't matter.
    */
  def portableHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.HashFunctions.portableHash60(c)

  /** [[hashSplit]] on [[portableHash]]: same append-stability, plus the
    * assignment is reproducible outside Spark (auditable lineage — a
    * downstream consumer can re-derive every row's split from its id).
    */
  def portableSplit(df: DataFrame, idCol: String,
                    names: Seq[String] = Seq("train", "val", "test"),
                    boundaries: Seq[Int] = Seq(80, 90)): DataFrame = {
    require(names.size == boundaries.size + 1, "need one more name than boundary")
    val bucket = pmod(portableHash(col(idCol)), lit(100))
    val split = boundaries.zip(names).foldRight(lit(names.last): org.apache.spark.sql.Column) {
      case ((b, n), rest) => when(bucket < b, n).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Deterministic `percent`% sample by [[portableHash]] bucket — stable
    * under appends and re-partitioning (rows never enter/leave the
    * sample across runs), reproducible in any md5-bearing engine. A pure
    * predicate: pushes to the scan, no shuffle, no RNG state.
    */
  def portableSample(df: DataFrame, idCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100)
    df.where(pmod(portableHash(col(idCol)), lit(100)) < percent)
  }

  /** Deterministic STRATIFIED sample: per-stratum percentages (class
    * balancing for training mixes — downsample the over-represented
    * source, keep the rare one whole). Same [[portableHash]] bucket
    * predicate as [[portableSample]], so membership is append-stable,
    * engine-reproducible, and a pure per-row filter: the rate map rides
    * the plan as a literal CASE chain, no join, no shuffle, pushdown-
    * eligible. Strata absent from `percentByStratum` get `defaultPercent`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       percentByStratum: Map[String, Int],
                       defaultPercent: Int = 0): DataFrame = {
    require((defaultPercent +: percentByStratum.values.toSeq)
      .forall(p => p >= 0 && p <= 100), "percentages must be 0-100")
    val rate = percentByStratum.foldLeft(lit(defaultPercent)) {
      case (rest, (s, p)) => when(col(stratumCol) === s, p).otherwise(rest)
    }
    df.where(pmod(portableHash(col(idCol)), lit(100)) < rate)
  }

  /** Deterministic EPOCH SHUFFLE: a seed-stable pseudo-random training
    * order without a global sort. Every row shards by
    * portableHash(id ++ "_e" ++ epoch) and orders within its shard by
    * the same hash — changing `epoch` re-deals the whole order, re-runs
    * reproduce it exactly, and the plan is one hash-partition exchange
    * with in-partition sorts (shards sort in parallel; nothing global).
    * Returns the input plus (shard, pos).
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   nShards: Int = 32): DataFrame = {
    require(nShards > 0)
    val h = portableHash(concat(col(idCol).cast("string"), lit(s"_e$epoch")))
    val w = Window.partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }

  /** Greedy "concat then chunk" sequence packing: within each of
    * `nShards` deterministic shards, documents are laid out in id order
    * and cut into packs of `budget` tokens; `pack_id` is the pack a
    * document STARTS in (documents may straddle a boundary, as when the
    * token stream is chunked post-concatenation).
    *
    * Returns (id, shard, n_tokens, start_offset, pack_id).
    */
  def packByTokenBudget(docs: DataFrame, idCol: String, tokenCol: String,
                        budget: Long, nShards: Int = 32): DataFrame = {
    require(budget > 0 && nShards > 0)
    val shard = pmod(col(idCol), lit(nShards.toLong)).as("shard")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), shard, col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("pack_id", floor(col("start_offset") / budget).cast("long"))
  }

  /** Keep at most `cap` rows per group, picked by the portable hash of
    * the id — the domain-balancing rule of web-corpus pipelines (no
    * single source may dominate the mix), with the same append-stable
    * determinism as [[hashSplit]]: a row's hash never changes, so
    * adding documents to OTHER groups never changes a group's picks,
    * and re-runs reproduce the sample bit-for-bit in any engine
    * sharing md5.
    *
    * Returns the kept rows as (idCol, groupCol, pick_rank). Scale
    * shape: one shuffle on the group; the per-group window sort spills
    * and is bounded by the hottest group's row count (the q102 skew
    * bound — for pathological single-group skew, pre-filter with an
    * approximate per-group count and sample the hot group in shards).
    */
  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998): each key goes to argmax over shards of
    * hash(key # shard). Unlike `key mod n`, RESIZING is minimal: adding
    * shard n+1 moves ONLY the keys whose new-shard hash wins (~1/(n+1)
    * of them), every one TO the new shard — nothing reshuffles between
    * existing shards (spec-asserted). The portable md5 hash makes the
    * routing reproducible in any engine, so a 100 TB corpus can be
    * routed identically by Spark, the warehouse, and a serving tier.
    *
    * Pure per-row argmax over `shards` literal hash entries — zero
    * joins, zero shuffles, codegen'd.
    */
  def hrwAssign(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 1024, s"shards must be in [1, 1024], got $shards")
    val entries = (0 until shards).map { s0 =>
      struct(graft.functions.HashFunctions.portableHash60(
          concat(col(keyCol).cast("string"), lit("#"), lit(s0.toString))).as("h"),
        lit(s0.toLong).as("s"))
    }
    df.withColumn("shard", array_max(array(entries: _*)).getField("s"))
  }

  /** Weight-proportional sample of k rows without replacement:
    * integer priority sampling (the sequential-Poisson shape, Ohlsson
    * 1998) with priority = portable_hash(id) div weight — a row with
    * twice the weight halves its priority, so heavier rows win
    * proportionally more often, and the whole draw is a deterministic
    * pure function of (id, weight): reproducible across engines and
    * appends (a new row never changes existing priorities, only the
    * cutoff). The k smallest (priority, id) rows are the sample.
    *
    * Scale shape: priority is a shuffle-free projection; the selection
    * is ORDER BY + LIMIT = TakeOrderedAndProject (bounded per-partition
    * heaps, k rows per task to the driver — never a global sort).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(col(idCol), col(weightCol).cast("long").as("w"),
        graft.functions.HashFunctions.portableHash60(col(idCol)).as("_h"))
      .where(col("w") > 0L)
      .withColumn("priority", expr("_h div w"))
      .select(col(idCol), col("w"), col("priority"))
      .orderBy(col("priority"), col(idCol)).limit(k)
  }

  def cappedPerGroup(df: DataFrame, groupCol: String, idCol: String,
                     cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("_h"), col(idCol))
    df.select(col(idCol), col(groupCol),
        graft.functions.HashFunctions.portableHash60(col(idCol)).as("_h"))
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .where(col("pick_rank") <= cap)
      .select(col(idCol), col(groupCol), col("pick_rank"))
  }

  /** PRIORITY SAMPLING with the Horvitz–Thompson subset-sum estimator
    * (Duffield, Lund & Thorup, JACM 2007): an exact-n weighted sample
    * WITHOUT replacement — priority q_i = w_i / u_i with
    * u_i = portableHash(id)/2^60, keep the n largest — plus the
    * unbiased total-weight estimator the sample alone supports:
    * ŵ_i = max(w_i, τ) with τ = the (n+1)-th largest priority, and
    * E[Σ ŵ_i] = Σ w_i. Sampling alone gives membership; the threshold
    * gives the honest scale-up factor — the "sample 1000 docs,
    * extrapolate corpus token mass" step of a 100 TB pipeline.
    *
    * Determinism: u_i derives from the portable md5 hash, so sample AND
    * estimate re-derive in any md5-bearing engine (q192's oracle does).
    * Priorities are IEEE doubles computed in ONE fixed op order
    * (w · 2^60 / h, both factors exactly-representable), bit-identical
    * cross-engine; ties break by id.
    *
    * Returns (pick_rank, id, w, w_hat); τ reaches the caller as
    * w_hat = max(w, τ) per picked row.
    */
  def prioritySampleEstimate(df: DataFrame, idCol: String,
                             weightCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val pri = df.select(col(idCol), col(weightCol).cast("long").as("w"),
        graft.functions.HashFunctions.portableHash60(col(idCol)).as("_h"))
      .where(col("w") > 0L)
      .withColumn("priority",
        col("w").cast("double") * lit(1152921504606846976L).cast("double")
          / col("_h").cast("double"))
    // ONE TakeOrderedAndProject top-(n+1) — no global sort, no window
    // over the input; the unpartitioned window below ranks only the
    // n+1 surviving rows.
    val top = pri.orderBy(col("priority").desc, col(idCol)).limit(n + 1)
    val w0 = Window.orderBy(col("priority").desc, col(idCol))
    val ranked = top.withColumn("pick_rank", row_number().over(w0).cast("long"))
    val tau = ranked.agg(
        max(when(col("pick_rank") === (n + 1).toLong, col("priority"))).as("tau0"))
      .select(coalesce(col("tau0"), lit(0.0)).as("tau"))
    ranked.where(col("pick_rank") <= n.toLong)
      .crossJoin(broadcast(tau))
      .select(col("pick_rank"), col(idCol), col("w"),
        greatest(col("w").cast("double"), col("tau")).as("w_hat"))
  }

  /** WEIGHTED INTERLEAVE SCHEDULE (stride scheduling / weighted fair
    * queueing — the data-loader mixture order): source s with integer
    * weight w_s takes w_s slots per period of W = Σ w_s, spread as
    * evenly as stride scheduling allows. Slot order is ascending
    * virtual time vt(s, j) = (2j+1) / (2·w_s) — the j-th emission of s
    * sits at the midpoint of its j-th 1/w_s stride — with ties broken
    * by source name. Each slot binds to the (j+1)-th document of its
    * source in portable-hash order, so the emitted training order is
    * reproducible in any md5-bearing engine.
    *
    * Differs from curriculum ORDERING (q102, which sorts the whole
    * corpus by virtual time): this materializes the SCHEDULE itself —
    * the repeating slot pattern a streaming data-loader follows — and
    * binds documents to it.
    *
    * Scale shape: the schedule is O(W · periods) rows, built
    * driver-side and broadcast; documents reach it through one
    * per-source row_number window (each source sorts independently) and
    * a broadcast equi-join. vt doubles divide exactly-representable
    * small integers — bit-identical cross-engine.
    */
  def interleaveSchedule(df: DataFrame, idCol: String, srcCol: String,
                         weights: Map[String, Int], periods: Int): DataFrame = {
    require(periods >= 1, s"periods must be >= 1, got $periods")
    require(weights.nonEmpty && weights.values.forall(_ >= 1),
      "weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val slots = weights.toSeq.sortBy(_._1).flatMap { case (src, w) =>
      (0 until w * periods).map { j =>
        (src, j.toLong, (2.0 * j + 1.0) / (2.0 * w))
      }
    }.sortBy { case (src, _, vt) => (vt, src) }
      .zipWithIndex
      .map { case ((src, j, _), slot) => (slot.toLong, src, j) }
    val sched = slots.toDF("slot", srcCol, "src_idx")
    val wr = Window.partitionBy(srcCol).orderBy(
      graft.functions.HashFunctions.portableHash60(col(idCol)), col(idCol))
    val ranked = df.select(col(idCol), col(srcCol))
      .withColumn("src_idx", row_number().over(wr).cast("long") - 1L)
    broadcast(sched).join(ranked, Seq(srcCol, "src_idx"))
      .select(col("slot"), col(srcCol), col("src_idx"), col(idCol))
  }

  /** DETERMINISTIC NEGATIVE SAMPLING for contrastive training: for each
    * query, the k pseudo-random corpus negatives, reproducible across
    * runs, engines, and epochs (vary `seed` per epoch for fresh
    * negatives).
    *
    * Candidates form only inside the query's hash bucket
    * (`corpus_id % buckets == query_id % buckets`), so the candidate set
    * per query is |corpus| / buckets — never all-pairs; the per-query
    * ranking is [[portableHash]] of
    * `seed || '_' || query_id || '_' || corpus_id` (delimited on both
    * sides so distinct (seed, query_id) pairs can never concatenate to
    * the same key and alias epochs), so any md5-bearing engine
    * re-derives the exact sample. The query
    * itself is excluded; exclude known positives upstream by anti-joining
    * the pair table before calling.
    *
    * Scale shape: one bucket-key equi-join (never a cross join) + a
    * per-query top-k window over the bucket-bounded candidates. Returns
    * (query_id, neg_id, neg_rank 1..k).
    */
  def negativeSample(queries: DataFrame, corpus: DataFrame,
                     qIdCol: String, cIdCol: String,
                     k: Int, buckets: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val q = queries.select(col(qIdCol).cast("long").as("query_id"),
      pmod(col(qIdCol).cast("long"), lit(buckets.toLong)).as("_b"))
    val c = corpus.select(col(cIdCol).cast("long").as("neg_id"),
      pmod(col(cIdCol).cast("long"), lit(buckets.toLong)).as("_b"))
    val w = Window.partitionBy("query_id").orderBy(col("_h"), col("neg_id"))
    q.join(c, Seq("_b"))
      .where(col("neg_id") =!= col("query_id"))
      .withColumn("_h", graft.functions.HashFunctions.portableHash60(
        concat(lit(seed), lit("_"), col("query_id").cast("string"), lit("_"),
          col("neg_id").cast("string"))))
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .where(col("neg_rank") <= k)
      .select(col("query_id"), col("neg_id"), col("neg_rank"))
  }

  /** Leakage-proof split: every connected cluster in a near-dup pair
    * graph lands entirely on ONE side of the train/val/test cut. The
    * pair graph resolves to components ([[DedupOps.connectedComponents]],
    * O(log n) large-star/small-star rounds); each row's split key is its
    * component representative (its own id for singletons), hashed with
    * the portable 60-bit md5 — so the assignment is reproducible in any
    * md5-bearing engine AND stable under appends: a new near-dup of an
    * existing cluster joins that cluster's side instead of leaking its
    * text across the cut (the failure q112 measures; this op prevents
    * it by construction as long as the new edge is observed).
    *
    * Scale shape: the components loop shuffles (long, long) edges only;
    * the assignment is one left equi-join docs×components on id (AQE
    * broadcasts when the clustered subset is small — in a deduped
    * corpus, most docs are singletons and never enter the join's build
    * side) + a pure projection. Returns df + (cluster_key, split).
    */
  def clusterAwareSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                        names: Seq[String] = Seq("train", "val", "test"),
                        boundaries: Seq[Int] = Seq(80, 90)): DataFrame = {
    require(names.size == boundaries.size + 1, "need one more name than boundary")
    val comp = DedupOps.connectedComponents(pairs)
      .select(col("id").as(idCol), col("component"))
    val keyed = df.join(comp, Seq(idCol), "left")
      .withColumn("cluster_key",
        coalesce(col("component"), col(idCol).cast("long")))
      .drop("component")
    val bucket = pmod(portableHash(col("cluster_key")), lit(100))
    val split = boundaries.zip(names).foldRight(lit(names.last): org.apache.spark.sql.Column) {
      case ((b, n), rest) => when(bucket < b, n).otherwise(rest)
    }
    keyed.withColumn("split", split)
  }

  /** Max-min fair budget allocation over keyed demands (water-filling):
    * each round splits the remaining budget equally across still-
    * unsatisfied keys and grants each `min(deficit, share)` — small
    * demands saturate early and their leftover flows to heavy keys in
    * later rounds. The crawl-frontier / ingest-quota shape: "fetch at
    * most B pages this cycle, fairly across domains". Unrolled to
    * `rounds` synchronous rounds (each = one tiny 1-row aggregate
    * broadcast + one narrow map over keys), deterministic and
    * all-integer, so the allocation hash-checks.
    *
    * Returns (key, pending, granted, starved = pending − granted).
    */
  def waterFillBudget(counts: DataFrame, keyCol: String, pendingCol: String,
                      budget: Long, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && budget >= 0L)
    var df = counts.select(col(keyCol).as("key"),
      col(pendingCol).cast("long").as("pending"), lit(0L).as("granted"))
    for (_ <- 1 to rounds) {
      val stats = df.agg(
        sum("granted").as("spent"),
        sum(when(col("pending") > col("granted"), 1L).otherwise(0L)).as("unsat"))
      df = df.crossJoin(broadcast(stats))
        .select(col("key"), col("pending"),
          (col("granted") + least(col("pending") - col("granted"),
            when(col("unsat") > 0L,
              expr(s"($budget - spent) div unsat")).otherwise(lit(0L)))).as("granted"))
    }
    df.select(col("key"), col("pending"), col("granted"),
      (col("pending") - col("granted")).as("starved"))
  }
}
