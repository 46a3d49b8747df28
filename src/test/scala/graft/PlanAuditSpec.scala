package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits: the properties that matter at 100 TB, asserted on
  * the actual executed plans of the contract queries over the real tables.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def occurrences(haystack: String, needle: String): Int =
    haystack.sliding(needle.length).count(_ == needle)

  /** Execute the query and return its FINAL adaptive plan string —
    * stage-reuse nodes (ReusedQueryStage / ReusedExchange) only appear
    * once AQE has actually run the stages.
    */
  private def executedPlanString(df: DataFrame): String = {
    df.queryExecution.executedPlan.execute().count()
    df.queryExecution.executedPlan.toString
  }
  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("scalar scans prune to the referenced columns (ReadSchema)") {
    val p = q("q11_clean_text").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"clean_text should scan only doc_id+text:\n$p")
  }

  test("filters reach the parquet scan (PushedFilters)") {
    val df = Tables.lineitem(spark, sf).where(col("l_quantity") > 45)
      .select("l_orderkey")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter should push to scan:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("dimension joins broadcast the small side (q02)") {
    val p = plan(q("q02_revenue_by_nation"))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dims must not sort-merge at this size:\n$p")
  }

  test("delta anti-join is a broadcast anti join (q05)") {
    val p = plan(q("q05_delta_anti"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("changed-content delta: broadcast anti + broadcast label joins, no sort-merge (q166)") {
    val p = plan(q("q166_delta_content"))
    assert(p.contains("LeftAnti"), s"expected composite-key anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"state side should broadcast at this size:\n$p")
    assert(!p.contains("SortMergeJoin"), s"state-sized joins must not sort-merge here:\n$p")
  }

  test("top-k ANN aggregates partially — no Window, no full-corpus sort (q28)") {
    val p = plan(q("q28_bruteforce_topk"))
    assert(!p.contains("Window"), s"row_number window would shuffle QxN rows:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"expected partial top-k aggregation:\n$p")
  }

  test("IVF assignment plans with zero exchanges (q29)") {
    val p = plan(q("q29_ivf_assign"))
    assert(!p.contains("Exchange"), s"argmin against literal centroids must not shuffle:\n$p")
  }

  test("global top-n compiles to TakeOrderedAndProject, not a full sort (q03)") {
    val p = plan(q("q03_top_orders"))
    assert(p.contains("TakeOrderedAndProject"), s"limit+orderBy should fuse:\n$p")
  }

  test("aggregations are partial (map-side combine) before the shuffle (q01)") {
    val p = plan(q("q01_pricing_summary"))
    assert(p.contains("HashAggregate"), p)
    // partial + final pair means map-side combine happened
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"expected partial+final agg:\n$p")
  }

  test("enrichment join's max_by aggregates partially before its shuffle (q06)") {
    val p = plan(q("q06_enrich_latest"))
    assert(p.contains("partial_max_by") || p.contains("ObjectHashAggregate"),
      s"max_by should partial-aggregate map-side:\n$p")
    assert(!p.contains("Window"), s"no window needed for last-write-wins:\n$p")
  }

  test("pre-bucketed tables join without a shuffle (co-located join)") {
    import spark.implicits._
    val n = 1000
    (1 to n).map(i => (i.toLong, s"o$i")).toDF("k", "ov")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("b_orders")
    (1 to n).map(i => (i.toLong, i * 1.5)).toDF("k", "lv")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("b_lines")
    // force the shuffled-join path: tiny test tables would broadcast
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lines"), "k")
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"),
        s"bucketed join must be shuffle-free (both sides pre-partitioned on k):\n$p")
      assert(joined.count() == n)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("whole-stage codegen covers the scalar function pipeline (q19)") {
    val p = plan(q("q19_sanitize_filename"))
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(p.contains("*(1) Project"), s"scalar chain should codegen:\n$p")
  }

  /** Round-17 refinement of "blobs never shuffle": generator inputs MAY
    * cross one round-robin spread exchange (KernelSpread — a
    * single-row-group scan plans as one task, which serialized every
    * ImageIO kernel), but that exchange must carry ONLY the narrow id
    * projection and sit BELOW the blob-producing MapPartitions: no hash
    * or range exchange anywhere, and no exchange input wider than the
    * generator's input row.
    */
  private def assertOnlyNarrowSpreadExchanges(name: String, p: String, maxCols: Int = 1): Unit = {
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"$name must not key-shuffle anything (blobs never shuffle):\n$p")
    val widths = """\(\d+\) Exchange\nInput \[(\d+)\]""".r
      .findAllMatchIn(p).map(_.group(1).toInt).toList
    assert(widths.forall(_ <= maxCols),
      s"$name spread exchange must carry only the narrow kernel input " +
        s"(got widths $widths, cap $maxCols):\n$p")
  }

  test("media decode kernels are narrow — blobs never shuffle, spread carries ids only (q54/q59)") {
    for (name <- Seq("q54_image_decode", "q59_audio_decode")) {
      val p = plan(q(name))
      assertOnlyNarrowSpreadExchanges(name, p)
      assert(p.contains("MapPartitions"),
        s"$name decode must stay a mapPartitions kernel:\n$p")
    }
  }

  test("histogram quantiles shuffle cells, not rows (q56: partial count below the exchange)") {
    val p = plan(q("q56_hist_quantiles"))
    assert(p.contains("HashAggregate") &&
      "HashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final count around the cell shuffle:\n$p")
  }

  test("bm25 ranks via TakeOrderedAndProject and broadcasts the stats sides (q65)") {
    val p = plan(q("q65_bm25"))
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"df/stats joins should broadcast, corpus side stays put:\n$p")
  }

  test("range join buckets to an equi-join — no nested loop (q66)") {
    val p = plan(q("q66_range_join"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range predicate must ride the bucket equi-join:\n$p")
  }

  test("term top-k partial-aggregates before the shuffle and take-orders (q70)") {
    val p = plan(q("q70_term_topk"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"token stream must map-side combine before the term shuffle:\n$p")
  }

  test("BPE token counting never key-shuffles; spread carries (id, text) only (q72)") {
    val p = plan(q("q72_bpe_tokens"))
    assertOnlyNarrowSpreadExchanges("q72_bpe_tokens", p, maxCols = 2)
  }

  test("document text extraction is narrow — blobs never shuffle (q73)") {
    val p = plan(q("q73_doc_extract"))
    assertOnlyNarrowSpreadExchanges("q73_doc_extract", p)
    assert(p.contains("MapPartitions"),
      s"container parse + inflate must stay a mapPartitions kernel:\n$p")
  }

  test("hybrid RRF fuses k-sized inputs — every rank window is single-partition (q71)") {
    val p = plan(q("q71_hybrid_rrf"))
    // both retrieval arms must bound their output BEFORE the fusion windows
    assert(p.contains("TakeOrderedAndProject"),
      s"retrieval arms must rank via TakeOrderedAndProject, not global sort:\n$p")
  }

  test("salted join spreads hot keys — join keys include the salt (q75)") {
    val p = plan(q("q75_salted_join"))
    assert(p.contains("_salt"),
      s"the salted join must key on (flag, _salt), not flag alone:\n$p")
  }

  test("stratified sample is a pure filter — zero exchanges (q76)") {
    val p = plan(q("q76_stratified_sample"))
    assert(!p.contains("Exchange"),
      s"per-stratum rates must ride the scan as a literal CASE predicate:\n$p")
  }

  test("repetition stats never key-shuffle; spread carries (id, text) only (q77)") {
    val p = plan(q("q77_repetition"))
    assertOnlyNarrowSpreadExchanges("q77_repetition", p, maxCols = 2)
  }

  test("epoch shuffle is one exchange + in-shard sorts, no global sort (q78)") {
    val p = plan(q("q78_epoch_shuffle"))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one hash exchange (on shard):\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"a range exchange would mean a global sort crept in:\n$p")
  }

  test("curation gates evaluate before any exchange (q60)") {
    val df = q("q60_curate")
    val p = df.queryExecution.executedPlan.toString
    // the quality/language Filter must sit BELOW the first Exchange in
    // the profile branch: gated rows must never be shuffled
    val filterIdx = p.indexOf("Filter")
    val exchangeIdx = p.indexOf("Exchange")
    assert(filterIdx >= 0 && exchangeIdx >= 0,
      s"expected both a Filter and an Exchange in:\n$p")
    // executedPlan prints top-down: a Filter appearing only above (before)
    // the Exchange string-wise would mean post-shuffle filtering; the gate
    // must also appear after (below) it
    assert(p.lastIndexOf("Filter") > exchangeIdx,
      s"quality/language gate should run scan-side, below the shuffle:\n$p")
  }

  test("URL canonicalization is a shuffle-free scan (q84)") {
    // the param-sort HOF lambdas keep the Project out of whole-stage
    // codegen (expected for higher-order functions); the property that
    // matters at scale is that nothing shuffles
    val p = plan(q("q84_url_canon"))
    assert(!p.contains("Exchange"),
      s"pure per-row regexp/array exprs must not shuffle:\n$p")
  }

  test("boilerplate strip broadcasts the per-source line lists (q83)") {
    val p = plan(q("q83_boilerplate"))
    assert(p.contains("BroadcastHashJoin"),
      s"the tiny boilerplate list must broadcast, not sort-merge:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("token rarity partial-aggregates the unigram counts (q85)") {
    val p = plan(q("q85_token_rarity"))
    // both the counts pass and the per-doc pass must combine map-side
    assert("partial_count".r.findAllIn(p.toLowerCase).nonEmpty ||
      p.contains("HashAggregate"),
      s"expected partial aggregation before the token shuffle:\n$p")
  }

  test("z-order key is a pure projection — zero exchanges (q101)") {
    val p = plan(q("q101_zorder"))
    assert(!p.contains("Exchange"),
      s"Morton interleave must not shuffle:\n$p")
    assert(p.contains("*(1) Project"),
      s"shift-mask sum should stay inside one codegen span:\n$p")
  }

  test("CMS build partial-aggregates the (h, bucket) grid (q103)") {
    val p = plan(q("q103_cms_counts"))
    assert(p.contains("HashAggregate"),
      s"sketch counters must combine map-side before the shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the depth*width-bounded sketch side must broadcast:\n$p")
  }

  test("filtered ANN pushes the metadata predicate to the corpus scan (q108)") {
    val p = q("q108_filtered_ann").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GreaterThanOrEqual(vec_id,100)"),
      s"corpus filter must reach the parquet scan:\n$p")
    assert(!p.contains("Window"),
      s"top-k must stay a bounded-heap partial aggregation:\n$p")
  }

  test("HLL registers reduce to one row before the final agg (q104)") {
    val p = plan(q("q104_hll_distinct"))
    // the register aggregation is bounded by m = 64 rows; the estimate
    // join must be a 1-row broadcast, never a shuffle join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"exact-count side should broadcast as one row:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("column profiling is ONE pass over a pruned scan (q116)") {
    val p = q("q116_profile").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 1,
      s"profiling must not rescan per column:\n$p")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderstatus:string,o_orderpriority:string>"),
      s"profile should scan only the profiled columns:\n$p")
  }

  test("constraint checks anti-join via broadcast, never nested-loop (q117)") {
    val p = plan(q("q117_constraints"))
    assert(p.contains("LeftAnti"), s"FK check should be an anti-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no quadratic joins in the validation suite:\n$p")
  }

  test("snapshot diff reads only the key and value columns (q118)") {
    val p = q("q118_snapshot_diff").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"diff must never scan unreferenced columns:\n$p")
  }

  test("SCD2 windows reuse one key shuffle (q120)") {
    val p = plan(q("q120_scd2"))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"collapse + lead + version must share the (user) partitioning:\n$p")
  }

  test("triangle counting never goes quadratic (q122)") {
    val p = plan(q("q122_triangles"))
    // the closing-edge probe is an equi semi-join; the only nested-loop
    // joins are the two deliberate 1-row count combinations at the end
    assert(p.contains("LeftSemi"), s"closing edge must probe via semi-join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 2,
      s"only the 1-row count combinations may nested-loop:\n$p")
  }

  test("EWMA kernel shuffles the key exactly once (q124)") {
    val p = plan(q("q124_ewma_spikes"))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"sorted-group scan needs one key shuffle only:\n$p")
  }

  test("PQ scoring aggregates partially, no Window over scored pairs (q125)") {
    val p = plan(q("q125_pq_ann"))
    assert(!p.contains("Window"),
      s"top-k must stay a bounded-heap partial aggregation:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"expected TopK partial agg:\n$p")
  }

  test("IVF+PQ probes and tables broadcast (q127)") {
    val p = plan(q("q127_ivfpq_ann"))
    assert(p.contains("BroadcastHashJoin"),
      s"probe list and distance tables must broadcast:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("capped sampling groups in a single shuffle (q126)") {
    val p = plan(q("q126_capped_sample"))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"one (source) shuffle only:\n$p")
  }

  test("trend moments partial-aggregate before the shuffle (q130)") {
    val p = plan(q("q130_trend"))
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"five integer moments must combine map-side:\n$p")
  }

  test("prefix-filter join stays equi-join shaped (q131)") {
    val p = plan(q("q131_prefix_join"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the prefix equi-join:\n$p")
    graft.GraftCache.releaseAll(spark)
  }

  test("index merge reads each shard once, never the corpus again (q137)") {
    val p = q("q137_index_merge").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 2,
      s"exactly the two shard scans:\n$p")
  }

  test("weighted sampling selects via TakeOrderedAndProject (q143)") {
    val p = plan(q("q143_weighted_sample"))
    assert(p.contains("TakeOrderedAndProject"),
      s"k smallest priorities must not globally sort:\n$p")
  }

  test("JL projection plans with zero exchanges (q150)") {
    val p = plan(q("q150_jl_project"))
    // the 1-row stats crossJoin broadcasts; nothing else may shuffle
    assert(!p.contains("Exchange hashpartitioning"),
      s"literal sign-matrix fold must not shuffle:\n$p")
  }

  test("phrase search filters to phrase terms before any shuffle (q147)") {
    val p = plan(q("q147_phrase_search"))
    assert(p.contains("table") && p.contains("hash"),
      s"term filter must appear in the plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"anchored position joins must stay equi:\n$p")
  }

  test("interval overlap join never nested-loops (q148)") {
    val p = plan(q("q148_interval_overlap"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucketed candidates + filter, not a quadratic join:\n$p")
  }

  test("event analytics joins stay equi-shaped (q141, q146)") {
    val bfs = plan(q("q141_bfs_distance"))
    assert(!bfs.contains("CartesianProduct") &&
      !bfs.contains("BroadcastNestedLoopJoin"),
      s"frontier expansion must be an equi-join:\n$bfs")
    val mt = plan(q("q146_multi_touch"))
    assert(!mt.contains("CartesianProduct"),
      s"touch join must be user-co-keyed, range applied as a filter:\n$mt")
  }

  test("span dedup partial-aggregates window hashes; all joins stay equi (q175)") {
    val p = plan(q("q175_span_dedup"))
    // duplicate detection must map-side combine the (count, min-struct)
    // agg below its exchange — the hash shuffle carries partial states,
    // never one row per window occurrence (struct-min plans as a
    // SortAggregate; the partial_* functions are what matter)
    assert(p.contains("partial_min(struct") && p.contains("partial_count"),
      s"expected map-side partial (count, min struct) aggregation:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"occurrence->canonical and rewrite joins must stay equi:\n$p")
  }

  test("cluster-aware split joins components by id — no quadratic shape (q176)") {
    val p = plan(q("q176_cluster_split"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"component assignment must be an equi-join:\n$p")
  }

  test("CDC chunking never key-shuffles; spread carries (id, text) only (q181)") {
    val p = plan(q("q181_cdc_chunks"))
    assertOnlyNarrowSpreadExchanges("q181_cdc_chunks", p, maxCols = 2)
  }

  test("data card partial-aggregates per source; rate/profile sides stay equi (q183)") {
    val p = plan(q("q183_data_card"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"per-source fold must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"profile joins must be id equi-joins:\n$p")
  }

  test("temperature mix broadcasts the rate table back onto the corpus (q178)") {
    val p = plan(q("q178_temperature_mix"))
    assert(p.contains("BroadcastHashJoin"),
      s"|sources|-row rate table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in this plan is big enough to sort-merge:\n$p")
  }

  test("anchor aggregation partial-aggregates term counts; no window over links (q194)") {
    val p = plan(q("q194_anchor_text"))
    // plurality-anchor selection must ride min(struct(-cnt, term)) with
    // a map-side partial below the dst exchange — the shuffle carries
    // (dst, term) partial counts, never raw link rows into a window
    assert(p.contains("partial_min(struct"),
      s"expected map-side partial min-struct selection:\n$p")
    assert(!p.contains("Window"), s"no window over links:\n$p")
  }

  test("priority sampling is one TakeOrdered top-(n+1), never a global sort (q192)") {
    val p = plan(q("q192_priority_estimate"))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-(n+1) must plan as TakeOrderedAndProject:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"no global range-sort of the corpus:\n$p")
  }

  test("interleave schedule broadcasts; documents rank inside their source (q193)") {
    val p = plan(q("q193_interleave"))
    assert(p.contains("BroadcastHashJoin"),
      s"the O(W·periods) schedule must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("collocations: count gate precedes the dictionary joins; 1-row N broadcasts (q204)") {
    val p = q("q204_collocations").queryExecution.optimizedPlan.toString
    // the c_ab >= 3 filter must sit UNDER the joins (on the bigram agg),
    // not above them — otherwise the join input is the full bigram table
    val joinIdx = p.indexOf("Join Inner")
    val filtIdx = p.indexOf("(c_ab")
    assert(joinIdx >= 0 && filtIdx > joinIdx,
      s"minCount gate must be below the first join in the optimized plan:\n$p")
    assert(plan(q("q204_collocations")).contains("BroadcastNestedLoopJoin") ||
      plan(q("q204_collocations")).contains("BroadcastExchange"),
      "the 1-row totals frame must broadcast")
  }

  test("centroid outlier pruning: assignment never shuffles; means broadcast back (q207)") {
    val p = plan(q("q207_centroid_outliers"))
    assert(p.contains("BroadcastHashJoin"),
      s"the nlist-row means frame must broadcast onto the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in this query justifies a sort-merge:\n$p")
  }

  test("feature hashing: one partial-agg shuffle, no window, no join before the bucket agg (q210)") {
    val p = plan(q("q210_feature_hash"))
    assert(!p.contains("Window"), s"hashing-trick features must not window:\n$p")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"bucket counts must partial-aggregate map-side:\n$p")
  }

  test("containment: df guard and match counts stay equi-join shaped (q212)") {
    val p = plan(q("q212_containment"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"containment must never all-pairs:\n$p")
  }

  test("water-filling rounds are 1-row broadcasts over the keys (q213)") {
    val p = plan(q("q213_crawl_budget"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"per-round stats must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("TV divergence: totals broadcast; no cartesian, no sort-merge (q227)") {
    val p = plan(q("q227_tv_divergence"))
    assert(p.contains("BroadcastExchange"),
      s"per-source totals and the 1-row N must broadcast:\n$p")
    // the 1-row corpus-N frame rides a broadcast nested-loop CROSS —
    // that's the intended 1-row stats broadcast (q213 shape); what the
    // closed-form absent-mass trick must prevent is a CartesianProduct
    // or sort-merge over (source × vocab)
    assert(!p.contains("CartesianProduct"),
      s"the absent-mass closed form must keep joins equi-shaped:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("fingerprint manifest never windows and partial-aggregates its digests (q230)") {
    val p = plan(q("q230_fingerprint"))
    assert(!p.contains("Window"), s"digest lanes are plain aggregates:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("blocking eval: the four count frames broadcast; candidate join is key-equi (q231)") {
    val p = plan(q("q231_blocking_eval"))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"1-row aggregates must broadcast into the report row:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the blocking join itself must stay equi-shaped on the key:\n$p")
  }

  test("corpus diff: document bodies never cross the snapshot join (q220)") {
    // round-10 rework contract: text reduces to (md5, token count)
    // map-side, so the full-outer join's output — everything that
    // crossed the exchange — is digests and counts, never text
    val lp = q("q220_corpus_diff").queryExecution.optimizedPlan
    val joins = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty, s"q220 must diff via a join:\n$lp")
    joins.foreach { j =>
      val names = j.output.map(_.name).toSet
      assert(names.intersect(Set("text", "ta", "tb")).isEmpty,
        s"join must carry digests, not document bodies: $names")
    }
  }

  test("vocab ordering: ONE cached mask histogram feeds every greedy step; no corpus anti-joins (q215)") {
    val p = plan(q("q215_vocab_order"))
    // the round-9 rework's contract: the tokenize+mask pass is computed
    // once into the persisted histogram — each greedy branch scans the
    // InMemoryRelation, never the corpus
    assert(p.contains("InMemoryTableScan"),
      s"greedy steps must read the cached (mask, cnt) histogram:\n$p")
    assert(!p.contains("LeftAnti"),
      s"the covered-token cut must be a mask test, not a corpus anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"every join in the greedy is broadcast-sized:\n$p")
    graft.GraftCache.releaseAll(spark)
  }

  test("z-order skipping audit: ONE cached cell pass feeds every audit branch (q242)") {
    val p = plan(q("q242_zorder_skipping"))
    // every branch (both layouts' stats + rows_selected) folds from the
    // persisted ≤4096-cell frame — the row-scale scan happens once
    assert(p.contains("InMemoryTableScan"),
      s"audit branches must read the cached cell frame:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"dims/selected are 1-row frames and must broadcast:\n$p")
    assert(!p.contains("Window"), s"no global ordering is needed:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"bounds must arrive by broadcast:\n$p")
    graft.GraftCache.releaseAll(spark)
  }

  test("hilbert curve audit: ONE cached cell pass; windows run over the cell frame, never rows (q269)") {
    val p = plan(q("q269_hilbert_layout"))
    // all three layouts' file cuts + the selected count fold from the
    // persisted ≤1024-cell frame — the row-scale scan happens once
    assert(p.contains("InMemoryTableScan"),
      s"layout branches must read the cached cell frame:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"target/selected are 1-row frames and must broadcast:\n$p")
    // the equal-row file cut needs a cumsum window per layout — over
    // CELLS (bounded by the 32×32 grid), which is fine; what must NOT
    // happen is a window directly over the row-scale scan
    val lp = q("q269_hilbert_layout").queryExecution.optimizedPlan
    lp.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
      .foreach { w =>
        val feedsFromCache = w.collectFirst {
          case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => true
        }.nonEmpty
        assert(feedsFromCache, s"curve-cut windows must read the cell cache, not rows:\n$w")
      }
    graft.GraftCache.releaseAll(spark)
  }

  test("compaction plan: the window is partitioned by source — never a global sort (q243)") {
    val lp = q("q243_compaction_plan").queryExecution.optimizedPlan
    val windows = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, s"the cumsum must be a window:\n$lp")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"manifest cumsum must partition by the group column:\n$w")
    }
    assert(!plan(q("q243_compaction_plan")).contains("SortMergeJoin"))
  }

  test("MG merge: n_total folds from the REUSED exact-vocab exchange — one extra tokenize, not two (q241)") {
    // the total branch aggregates `exact`, whose exchange subtree is
    // canonically identical to the join branch's — AQE must run that
    // shuffle stage once and reuse it, or the fold buys nothing
    val p = executedPlanString(q("q241_mg_merge"))
    assert(p.contains("ReusedQueryStage") || p.contains("ReusedExchange"),
      s"the exact-vocab exchange was not reused — n_total is re-tokenizing:\n$p")
  }

  test("range-split plan: ONE cached cell histogram feeds cuts + assignment; no SMJ (q244)") {
    val p = plan(q("q244_range_split"))
    assert(p.contains("InMemoryTableScan"),
      s"cuts and assignment must both read the persisted cell histogram:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the 1-row cuts/total frames must broadcast:\n$p")
    graft.GraftCache.releaseAll(spark)
  }

  test("z-order maintenance + depth: batch cells / envelopes broadcast, no SMJ, no window (q245, q246)") {
    Seq("q245_zorder_maintenance", "q246_clustering_depth").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("SortMergeJoin"),
        s"$name: bounded probe frames must broadcast:\n$p")
      assert(!p.contains("Window"), s"$name: no ordering window is needed:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$name: the envelope probe must arrive by broadcast:\n$p")
    }
  }

  test("IVF drift: ONE corpus scan, zero joins — totals fold via the k-row window (q250)") {
    val p = plan(q("q250_ivf_drift"))
    // the round-12 shape: the quantized-assignment RDD is scanned ONCE
    // (the earlier tot-crossJoin shape re-ran the corpus scan — an
    // ExistingRDD subtree is never shared by Catalyst), and the global
    // totals come from a window over the k-row aggregate, so there is
    // no join at all and no second pass
    assert(!p.contains("Join"), s"no join of any kind — totals fold in-plan:\n$p")
    assert(occurrences(p, "Scan ExistingRDD") == 1,
      s"the assignment kernel must be scanned exactly once:\n$p")
    assert(p.contains("Window"), s"totals must fold via the k-row window:\n$p")
    graft.GraftCache.releaseAll(spark)
  }

  test("KMV sketches plan as TakeOrdered, never a global sort (q251)") {
    val p = plan(q("q251_kmv_intersect"))
    assert(p.contains("TakeOrderedAndProject"),
      s"bottom-k must fuse into TakeOrdered (no full sort):\n$p")
    // a Sort outside TakeOrdered would mean a global ordering of the
    // distinct-hash frame — the thing bottom-k exists to avoid
    assert(!p.contains("SortMergeJoin"),
      s"k-row sketch joins must broadcast:\n$p")
  }

  test("bloom probe broadcasts the 512-row filter; keys never sort-merge (q252)") {
    val p = plan(q("q252_bloom_filter"))
    assert(p.contains("BroadcastHashJoin"),
      s"the lane join must broadcast the filter:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge lane join would shuffle every key row:\n$p")
    assert(!p.contains("Window"), s"no ordering is needed:\n$p")
  }

  // The two bucketed-layout audits run the CONTRACT queries (through
  // Fixtures.bucketedTables), not spec-local tables — so a refactor
  // that silently drops the bucketing from the shared fixture fails
  // HERE even though the results would stay hash-identical.

  test("the contract bucketed join reads co-located buckets, zero exchanges under the SMJ (q253)") {
    val p = plan(q("q253_bucketed_join"))
    assert(p.contains("SortMergeJoin"), s"expected the hinted SMJ:\n$p")
    val joinPart = p.substring(p.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange"),
      s"the bucketed fact-fact join must not shuffle either side:\n$p")
    assert(occurrences(p, "Bucketed: true") == 2,
      s"both sides must scan as bucketed tables:\n$p")
  }

  test("image near-dup candidates come from band equi-joins, never an all-pairs product (q257)") {
    val p = plan(q("q257_image_neardup"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the Hamming filter must ride banded equi-join candidates, not a cross product:\n$p")
    assert(p.contains("Join"), s"expected the star/rejoin equi-joins:\n$p")
    // round-14 degenerate guards, pinned IN THE CONTRACT PATH: the
    // identical-hash pre-grouping (min-id representative per distinct
    // 64-bit hash) and the CappedList band-bucket aggregation — a
    // regression to the uncapped exploded self-join re-opens the B²
    // blowup ImageDegenerateBucketSpec measures
    assert(p.toLowerCase.contains("cappedlistaggregator"),
      s"band buckets must aggregate through the CappedList guard:\n$p")
    assert(p.contains("min(mediaId"),
      s"expected the identical-hash pre-grouping (min-id rep):\n$p")
  }

  test("video near-dup rides the SAME guarded core: pre-grouping + CappedList in the contract path (q264)") {
    // the modality-agnostic claim made structural: the video family's
    // contract plan must carry the identical guards q257 pins — a
    // query-side rewrite that bypassed imageNearDups would lose them
    // silently while correctness stayed green
    val p = plan(q("q264_video_neardup"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the Hamming filter must ride banded equi-join candidates, not a cross product:\n$p")
    assert(p.toLowerCase.contains("cappedlistaggregator"),
      s"band buckets must aggregate through the CappedList guard:\n$p")
    assert(p.contains("min(mediaId"),
      s"expected the identical-print pre-grouping (min-id rep):\n$p")
  }

  test("image probe joins batch to capped corpus buckets — no corpus self-join, no cartesian (q260)") {
    val p = plan(q("q260_image_probe"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the probe must ride banded equi-join candidates:\n$p")
    assert(p.toLowerCase.contains("cappedlistaggregator"),
      s"corpus buckets must aggregate through the CappedList guard:\n$p")
    assert(p.contains("min(mediaId"),
      s"expected the corpus identical-hash pre-grouping:\n$p")
  }

  test("the contract mixed join shuffles ONLY the unbucketed delta, onto the bucket count (q255)") {
    val p = plan(q("q255_mixed_bucket_join"))
    assert(p.contains("SortMergeJoin"), s"expected the hinted SMJ:\n$p")
    val joinPart = p.substring(p.indexOf("SortMergeJoin"))
    val exchanges = "Exchange hashpartitioning\\([^)]*\\)".r.findAllIn(joinPart).toList
    assert(exchanges.length == 1,
      s"exactly one side (the delta) may shuffle under the join, got $exchanges:\n$p")
    assert(exchanges.head.contains("o_orderkey"),
      s"the shuffled side must be the unbucketed delta: ${exchanges.head}")
    assert(occurrences(p, "Bucketed: true") == 1,
      s"exactly the fact side must scan as a bucketed table:\n$p")
  }

  test("the contract escape hatch reads the bucketed files as plain parquet: both exchanges return (q259)") {
    val p = plan(q("q259_bucket_escape"))
    assert(p.contains("SortMergeJoin"), s"expected the hinted SMJ:\n$p")
    // the structural INVERSE of the q253 audit: with bucketing disabled
    // in the sibling session, neither scan carries the bucket spec and
    // EnsureRequirements shuffles BOTH sides at conf width
    assert(!p.contains("Bucketed: true"),
      s"the escape hatch must not scan as a bucketed table:\n$p")
    val joinPart = p.substring(p.indexOf("SortMergeJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(joinPart).length
    assert(exchanges == 2,
      s"both sides must shuffle under the escape-hatch join, got $exchanges:\n$p")
  }

  test("the contract bucket-pruned scan reads a strict subset of buckets, zero exchanges (q254)") {
    val p = plan(q("q254_bucket_pruning"))
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
    assert(m.isDefined, s"expected bucket pruning in the scan:\n$p")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"the IN predicate must prune at least one bucket:\n$p")
    assert(!p.contains("Exchange"),
      s"the groupBy on the bucket column must reuse the bucket partitioning:\n$p")
  }

  test("snapshot CDC reads only changed files; the range read opens only envelope hits (q274, q277)") {
    // the delete-leg diff (q274's second arm) is built from the
    // added/removed file lists — a file CARRIED through the delete
    // (same path in v3 and v4) must appear in NEITHER scan, so the
    // CDC touches the delta, never the table. (q274's append leg
    // diff(1,2) legitimately opens v2's added files, some of which
    // are later carried — so the pin is on the delete leg alone.)
    q("q274_snapshot_cdc").collect() // build the contract fixture
    val root = graft.queries.Fixtures.snapshotTable(spark, sf)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rp = new org.apache.hadoop.fs.Path(root)
    val m3 = graft.sources.SnapshotTable.readManifest(fs, rp, 3)
    val m4 = graft.sources.SnapshotTable.readManifest(fs, rp, 4)
    val carried = m3.files.map(_.path).toSet.intersect(m4.files.map(_.path).toSet)
    assert(carried.nonEmpty, "fixture must carry files through the delete")
    val deleteLeg = graft.sources.SnapshotTable.diff(spark, root, 3, 4,
      Seq("l_orderkey", "l_linenumber"))
    assert(!deleteLeg.inputFiles.exists(f => carried.exists(f.endsWith)),
      "CDC of the delete must never open a carried file")
    // q277: the v6 re-clustered table serves the range read from a
    // strict subset of its files (driver-side envelope pruning)
    val d277 = q("q277_snapshot_range")
    val tip = graft.sources.SnapshotTable.readManifest(fs, rp,
      graft.sources.SnapshotTable.latestVersion(fs, rp))
    assert(d277.inputFiles.nonEmpty &&
      d277.inputFiles.length < tip.files.size,
      s"range read opened ${d277.inputFiles.length} of ${tip.files.size} files — expected envelope pruning")
  }

  test("apriori pairs: frequent vocabulary broadcasts, pair stage is partial-aggregated (q278)") {
    val p = plan(q("q278_frequent_pairs"))
    assert(p.contains("BroadcastHashJoin"),
      s"the domain-bounded frequent vocabulary must broadcast, never shuffle with tokens:\n$p")
    // pair generation is the basket flatMap kernel, never a join
    // product (the only nested-loop join allowed is the 1-row n_docs
    // cross — the q196 totals pattern)
    assert(p.contains("MapPartitions graft.operators.ItemsetOps"),
      s"expected the basket pair-expansion kernel:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"pair generation must be the basket flatMap, not a product:\n$p")
    // map-side combine on the (t1, t2) counts: partial then final
    assert(occurrences(p, "HashAggregate") >= 2,
      s"expected partial+final aggregation on the pair counts:\n$p")
  }

  test("merge CDC with update pairing still reads only changed files, never a product (q281, q282)") {
    // the update inner-join and its singleton guard windows are built
    // from the SAME added/removed file lists as the anti-join legs —
    // a file carried through the merge must appear in NO scan of the
    // diff, update detection included
    q("q281_snapshot_cdc_update").collect() // build the merge fixture
    val root = graft.queries.Fixtures.mergeSnapshotTable(spark, sf)
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = graft.sources.SnapshotTable.readManifest(fs, rp, 1)
    val m2 = graft.sources.SnapshotTable.readManifest(fs, rp, 2)
    val carried = m1.files.map(_.path).toSet.intersect(m2.files.map(_.path).toSet)
    assert(carried.nonEmpty, "fixture must carry low-key files through the merge")
    val d = graft.sources.SnapshotTable.diff(spark, root, 1, 2, Seq("o_orderkey"))
    assert(!d.inputFiles.exists(f => carried.exists(f.endsWith)),
      "CDC of the merge must never open a carried file")
    // pre/post pairing is a keyed equi-join over the changed files —
    // never a product, and the signed-delta refresh (q282) adds only
    // aggregations and a keyed join on top
    Seq("q281_snapshot_cdc_update", "q282_snapshot_incremental_merge").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$name must stay keyed, never a product:\n$p")
    }
  }
}
