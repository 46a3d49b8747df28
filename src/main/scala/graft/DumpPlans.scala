package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: `explain("formatted")` for the plan-critical queries —
  * the artifact backing the scale claims in README/COVERAGE (pushdown,
  * pruning, broadcast choices, partial aggregation, zero-exchange IVF).
  * Usage: sbt "runMain graft.DumpPlans [sfDir] [outFile]"
  */
object DumpPlans {
  private val Interesting = Seq(
    "q01_pricing_summary" -> "partial+final hash aggregation, narrow ReadSchema",
    "q02_revenue_by_nation" -> "broadcast dimension joins (no sort-merge)",
    "q03_top_orders" -> "TakeOrderedAndProject (fused top-n, no global sort)",
    "q05_delta_anti" -> "broadcast LEFT ANTI delta join",
    "q13_exact_dedup" -> "digest-only shuffle for exact dedup",
    "q28_bruteforce_topk" -> "bounded-heap partial top-k (ObjectHashAggregate, no Window)",
    "q29_ivf_assign" -> "zero-exchange literal-centroid argmin",
    "q49_sessionize" -> "single shuffle reused by both window passes and the rollup",
    "q56_hist_quantiles" -> "cell-level shuffle (partial count) for scale-safe percentiles",
    "q58_ivf_indexed" -> "PartitionFilters source pruning over the materialized IVF index",
    "q54_image_decode" -> "narrow decode kernel — blobs never shuffle (the only exchange is the id-only KernelSpread below the generator)",
    "q60_curate" -> "quality/language gates scan-side, only (fingerprint,id) shuffles",
    "q51_percentiles" -> "spill-safe exact quantiles: cell shuffle + sort-window, no ObjectHashAggregate buffer",
    "q72_bpe_tokens" -> "BPE tokenizer kernel — no key exchange (one (id, text) KernelSpread below the kernel)",
    "q73_doc_extract" -> "container parse + inflate — blobs never shuffle (id-only KernelSpread below the generator)",
    "q75_salted_join" -> "hot keys spread over (key, _salt) sub-keys",
    "q78_epoch_shuffle" -> "one hash exchange + in-shard sorts, no global sort",
    "q79_decontaminate" -> "broadcast benchmark grams, matching-gram-only shuffle",
    "q83_boilerplate" -> "broadcast per-source boilerplate lists, payloads never shuffle",
    "q84_url_canon" -> "shuffle-free canonicalization scan",
    "q85_token_rarity" -> "partial-aggregated unigram counts, token-keyed rejoin",
    "q86_minhash_probe" -> "asymmetric corpus x batch band join (no corpus self-join)",
    "q87_chunking" -> "shuffle-free token-window fan-out",
    "q91_fuzzy_match" -> "block-bounded fuzzy join (no nested-loop distance join)",
    "q100_bigram_lm" -> "bigram-count joins + 1-row vocabulary broadcast",
    "q101_zorder" -> "single codegen'd projection, zero exchanges",
    "q103_cms_counts" -> "map-side-combined (h, bucket) sketch grid",
    "q104_hll_distinct" -> "64-register bound, 1-row broadcast estimate join",
    "q105_pagerank" -> "three unrolled iterations: src-keyed joins + partial dst sums",
    "q108_filtered_ann" -> "metadata predicate pushed to the corpus scan before scoring",
    "q112_split_leakage" -> "asymmetric probe: candidates scale with the test split",
    "q114_quantized_ann" -> "broadcast (min, scale) + integer dot-product TopK",
    "q115_windowed_hll" -> "per-day registers, bounded contribution explode, register max",
    "q116_profile" -> "one-pass long-format profile: (col_name, value) partial counts, per-column fold — no multi-distinct Expand",
    "q119_ntile_bins" -> "global NTILE from cell-histogram ranks (no global row sort)",
    "q120_scd2" -> "collapse + validity + version windows over ONE key shuffle",
    "q122_triangles" -> "degree-oriented wedge join + closing semi-join (equi only)",
    "q124_ewma_spikes" -> "single key shuffle, sorted-group O(1)-state scan",
    "q125_pq_ann" -> "codes-only scoring: broadcast codebook/tables, TopK partial agg",
    "q127_ivfpq_ann" -> "IVF pruning x PQ ADC: broadcast probes, codes never vectors",
    "q131_prefix_join" -> "rare-prefix candidate equi-join, candidate-bounded verify",
    "q137_index_merge" -> "shard indexes fold by term (full-outer), corpus never re-read",
    "q147_phrase_search" -> "phrase-term-filtered postings, anchored position equi-joins",
    "q148_interval_overlap" -> "bucketed interval candidates + exact predicate (no NLJ)",
    "q149_cep_pattern" -> "pattern negation as a second as-of join, zero amplification",
    "q150_jl_project" -> "zero-exchange literal sign-matrix fold",
    "q166_delta_content" -> "composite-key anti-join + known-key label join (both broadcast at state scale)",
    "q170_mean_pool" -> "posexplode + partial-aggregated (group, dim) sums — vectors never shuffle whole",
    "q171_negative_sample" -> "bucket-key equi-join (never cross), per-query top-k window over bounded candidates",
    "q175_span_dedup" -> "window kernel; partial (count, min-struct) agg on 60-bit hashes; equi joins only",
    "q176_cluster_split" -> "star-CC components + one id equi-join; the split is a projection",
    "q178_temperature_mix" -> "per-source partial agg; |sources|-row rate table broadcasts back",
    "q179_mmr_rerank" -> "greedy over top-N candidates in flatMapGroups — bounded per-query state",
    "q181_cdc_chunks" -> "rolling-hash kernel — chunks never leave their stage (one (id, text) KernelSpread below the kernel)",
    "q182_novelty_increment" -> "two batch states + one merge shuffle — history is never rescanned",
    "q183_data_card" -> "three one-pass profile kernels + per-source partial aggs",
    "q186_hll_merge" -> "64-row register sets fold by max — a COUNT DISTINCT that ships sketches",
    "q187_percentile_merge" -> "cell histograms fold by sum; quantiles derive from merged state",
    "q189_hard_negatives" -> "bounded top-k agg + broadcast labels; the anti-label cut is a filter",
    "q190_nprobe_sweep" -> "three probe budgets share one exact ground-truth side",
    "q191_kmv_sketch" -> "distinct-hash partial agg into bottom-k TakeOrdered — sketch merge without raw keys",
    "q192_priority_estimate" -> "one TakeOrdered top-(n+1); the HT window ranks only the sample",
    "q194_anchor_text" -> "(dst, term) partial counts + min-struct plurality — no window over links",
    "q196_band_sweep" -> "one signature pass persisted; three narrow re-bandings + bucket-guarded self-joins",
    "q197_binary_ann" -> "two-lane XOR+popcount distances through the bounded-heap TopK partial agg",
    "q198_hits" -> "two unrolled half-step pairs: co-keyed edge joins + partial sums + 1-row mass broadcasts",
    "q199_mutual_knn" -> "one batch broadcast onto one corpus scan; both kNN directions fold from the same scored frame",
    "q200_label_prop" -> "per-round labeled⋈edges equi-join + partial vote counts + struct-min plurality",
    "q201_random_walks" -> "ranked adjacency built once; each hop is a frontier equi-join",
    "q204_collocations" -> "minCount gate BELOW the dictionary joins; 1-row N broadcast",
    "q207_centroid_outliers" -> "zero-shuffle literal-argmin assignment; nlist-row means broadcast back",
    "q210_feature_hash" -> "one (id, bucket) partial-agg shuffle — no vocabulary, no window",
    "q212_containment" -> "df-guarded shingle equi-join, partial-agg match counts, never all-pairs",
    "q213_crawl_budget" -> "three unrolled 1-row stats broadcasts over the domain keys",
    "q219_merge_usage" -> "Zipf-collapsed distinct-word trace kernel + per-rank partial rollup",
    "q222_stupid_backoff" -> "train-side count tables joined onto eval bigrams; 1-row N broadcast",
    "q227_tv_divergence" -> "vocab-keyed counts join; totals broadcast; absent mass in closed form",
    "q215_vocab_order" -> "one token-keyed shuffle into a (mask, cnt) histogram; greedy steps are broadcast nested-loops over it",
    "q220_corpus_diff" -> "map-side (md5, token-count) reduction — the snapshot full-outer join shuffles digests, never text",
    "q230_fingerprint" -> "order-independent digest lanes as plain partial aggs — no window, no join",
    "q235_normalize_date" -> "shuffle-free multi-format date normalization scan (codegen'd try_to_date chain)",
    "q238_cms_merge" -> "two shard grids partial-agg then fold cell-wise — sketches shuffle, rows don't",
    "q232_pareto_front" -> "per-x maxima + tiny prefix-max window + broadcast dominance join — never all-pairs",
    "q241_mg_merge" -> "O(k) counter states from bounded TakeOrdered thresholds; merge is a k-row fold",
    "q242_zorder_skipping" -> "codegen'd Morton key; file-stats partial aggs; 1-row bounds broadcast — no window, no SMJ",
    "q243_compaction_plan" -> "manifest-sized cumsum window, partitioned by source — never a global sort",
    "q244_range_split" -> "ONE persisted domain-bounded cell histogram feeds cuts + assignment; ranges fold from cells, not rows",
    "q245_zorder_maintenance" -> "file-stats partial aggs per scenario; batch cells broadcast into a left-semi envelope probe",
    "q246_clustering_depth" -> "two bounded frames (64 envelopes x 256 cells) broadcast-probed — depth never touches row-scale data",
    "q247_hierarchy_rollup" -> "height-bounded unrolled closure joins; both rollup outputs are partial-agg group-bys over (node, anc) longs",
    "q249_ivf_trained_recall" -> "trained-centroid index probed via PartitionFilters; seed arm, exact side, and list-balance audits all fold from partial aggs",
    "q250_ivf_drift" -> "fixed-centroid quantized assignment: k x dim literal broadcast, ONE corpus pass, totals fold via a k-row window (no second scan, no join)",
    "q251_kmv_intersect" -> "bottom-k sketches fuse into TakeOrderedAndProject — never a global sort; k-row joins broadcast",
    "q252_bloom_filter" -> "512-lane filter broadcast into the probe join; bit positions are a codegen'd projection, counts partial-agg",
    "q253_bucketed_join" -> "catalog-bucketed fact x fact SMJ: ZERO exchanges under the join — both scans read co-located buckets (the write-time shuffle is amortized over every orderkey join)",
    "q254_bucket_pruning" -> "SelectedBucketsCount scan pruning from the IN predicate; the groupBy reuses the bucket partitioning — no exchange anywhere",
    "q255_mixed_bucket_join" -> "mixed bucketed fact x unbucketed delta: exactly ONE exchange under the SMJ — the delta shuffles onto the bucket count, the fact side reads exchange-free",
    "q269_hilbert_layout" -> "native HilbertIndex expression (plan size independent of bits); ONE cached cell pass feeds all three layouts; the curve-cut window is partitioned by layout over the <=1024-cell cache, never rows",
    "q274_snapshot_cdc" -> "snapshot CDC scans ONLY the files that changed between the two manifests (carried files absent from both join sides); keyed anti-joins cancel copy-on-write re-emits",
    "q257_image_neardup" -> "banded Hamming LSH over scan-side dHash: identical-hash pre-grouping (min-id rep) + CappedList band buckets over DISTINCT hashes — no cartesian, no uncapped self-join; only (id, 4 ints) ever shuffles, blobs stay in the scan",
    "q259_bucket_escape" -> "the bucketing escape hatch: q253's bucketed files read with bucketing disabled in a sibling session — no bucketed scan, BOTH exchanges return under the SMJ (the structural inverse of q253), answers hash-identical",
    "q260_image_probe" -> "incremental image near-dup: batch banded against capped corpus buckets (singletons survive) over pre-grouped corpus reps — no corpus self-join, no cartesian; the admission shape for streaming ingest",
    "q262_audio_neardup" -> "the SAME guarded banded-Hamming join over audio energy-delta fingerprints — one modality-agnostic LSH core for text/image/audio; prints computed scan-side, blobs never shuffle",
    "q264_video_neardup" -> "the guarded banded-Hamming join over temporal video fingerprints (per-frame dHash XOR-folded into band frameIdx % 4) — the fourth modality on the one LSH core; four frame decodes per blob stay in the scan, only (id, 4 ints) shuffles",
    "q266_video_clip_match" -> "frame-axis shingle join for clipped re-uploads: identical signature sequences pre-group to a min-id rep (star edges), distinct reps equi-join per consecutive-frame shingle through the CappedList bucket guard, exact shared-shingle counts partial-agg — never an all-pairs product, shingles computed scan-side")

  /** Narrated per-round job shapes for the RDD fixpoint operators —
    * `explain` can't see inside an RDD loop, so the scale contract is
    * stated here the same way the Catalyst dumps state theirs.
    */
  private val Narratives = Seq(
    ("q248_hierarchy_rollup_deep",
      "two O(height)-round co-partitioned RDD fixpoints — O(n) state per round, ONE job per round, no closure materialization",
      """`GraphOps.subtreeRollupDeep` (GraphOps.scala) computes the same
(id, depth, n_desc, subtree_sum) contract as unrolled q247, for trees
deeper than the closure plan can afford (q247's n·(height+1) ancestor
closure and per-level join both grow with height; this loop's state is
O(n) at EVERY height). Per-round shape, pass 1 (bottom-up leaf peel):

- Every RDD lives on ONE shared `HashPartitioner` (numShufflePartitions
  capped by input partitions). `flatMapValues`/`mapValues` preserve it,
  so the only per-round exchange is the child→parent key change in the
  flush — and that flush is `reduceByKey` with map-side combine: a
  million-leaf sibling fan-in crosses the wire as one (n, sum, k)
  record per parent per map partition.
- Each round runs exactly ONE job: finalized ∪ ready and the next
  pending state are drained together through a single `zipPartitions`
  action, with the ready count riding an accumulator so progress is
  decided by the same job that materializes the round (no second pass,
  and no lazy recompute through checkpoint-truncated lineage — the
  in-code comment documents the CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
  failure this prevents).
- Lineage is `localCheckpoint`-truncated every 10 rounds (task
  serialization stack-overflows around round ~90 otherwise; pinned by
  the depth-100 chain test), and every persisted RDD registers with
  GraftCache AT CREATION so the designed throw paths leak nothing.
- Malformed input fails LOUDLY: a parent cycle stalls the peel (no node
  finalizes) and throws IllegalStateException; `maxRounds` bounds both
  loops against adversarial depth.

Pass 2 (top-down depth walk) descends the co-partitioned child
adjacency one level per round, same one-job/round + checkpoint cadence;
a forest needs no visited-set subtraction since every node has exactly
one parent. Final join (finalized ⋈ depths) is co-partitioned and
narrow.

At 100× (SCALING.md): 1.60 s → 14.68 s, and the ratio is ROUNDS — the
key-offset corpus deepens the parent chains ~16 levels vs 7 at sf0.1 —
times the per-job scheduling floor, not data volume. On a 1000-executor
cluster the same loop runs height-many barriers over hash-partitioned
(long, long) state; nothing in it is driver-resident or closure-sized."""))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — `explain(\"formatted\")` of the plan-critical queries\n\n")
    sb.append(s"Generated by `graft.DumpPlans` against `$sfDir`. These are the\n")
    sb.append("plans the 100 TB scale claims rest on; PlanAuditSpec asserts the\n")
    sb.append("same properties in CI.\n")
    Interesting.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name — $why\n\n```\n")
      // plan text can embed non-printable literal bytes (e.g. the q230
      // NUL-prefixed null sentinel) — escape them so the dump stays text
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
        .flatMap(c => if (c < ' ' && c != '\n' && c != '\t') f"\\u${c.toInt}%04x" else c.toString))
      sb.append("\n```\n")
    }
    // RDD fixpoint operators have no Catalyst plan to dump; their
    // "plan you'd want at 100×" contract is narrated instead.
    Narratives.foreach { case (name, why, text) =>
      sb.append(s"\n## $name — $why\n\n")
      sb.append(text.trim)
      sb.append("\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
