package graft.operators

import graft.functions.{Rounding, TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword (lexical) retrieval — the BM25 complement to
  * [[SimilarityOps]]' embedding ANN. Production RAG stacks run both and
  * fuse the rankings ([[hybridTopK]]); the reference has no search
  * surface at all, so this whole file is engine capability beyond parity
  * (cf. `/root/reference/scripts/delta_download.py` which only key-joins).
  *
  * Scale shape (what survives 100 TB):
  *  - the posting explode is filtered to the QUERY terms before anything
  *    shuffles — the corpus-wide token stream never leaves its scan
  *    stage; only (doc, query-term) hits reach the `groupBy`;
  *  - document frequencies and the corpus stats (N, avgdl) reduce to a
  *    handful of rows and broadcast back — no second pass re-keys the
  *    corpus;
  *  - the final ranking is `ORDER BY ... LIMIT k` →
  *    `TakeOrderedAndProject`: per-partition bounded heaps, k rows per
  *    task to the driver, never a global sort;
  *  - the one real shuffle joins term hits to doc lengths on doc id,
  *    carrying two longs per matching doc — never text payloads.
  */
object RetrievalOps {

  /** BM25 score of every document matching >= 1 of `queryTerms`, top
    * `topK` by (score desc, id asc). Tokenization is lowercase
    * whitespace tokens over cleaned text ([[T.tokens]] parity, so scores
    * line up with [[TextAnalysisOps.tokenCounts]] lengths).
    *
    * idf = ln((N - df + 0.5) / (df + 0.5) + 1)   (Lucene's non-negative form)
    * tf' = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    *
    * The score is rounded half-up to 4 decimals (binary-deterministic,
    * [[Rounding.half4]]) so the ORDER BY total order — and the driver's
    * value hash — is engine-independent.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tok = docs.select(col(idCol).as("doc_id"),
      T.tokens(lower(col(textCol))).as("toks"))
    val lens = tok.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val postings = tok.select(col("doc_id"), explode(col("toks")).as("term"))
      .where(col("term").isin(queryTerms.map(x => x: Any): _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfComp = col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    postings
      .join(broadcast(dfreq), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(Rounding.half4(sum(idf * tfComp)).as("bm25"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(topK)
  }

  /** Reciprocal-rank fusion of a lexical ([[bm25]]) and a semantic
    * ([[SimilarityOps.bruteForceTopK]] / ivf) ranking:
    * score(d) = Σ_rankings 1/(rrfK + rank_d). Docs missing from a
    * ranking contribute nothing (standard RRF). Both inputs are already
    * top-k sized, so the fusion is a broadcast-scale full-outer join.
    *
    * SCALE BOUND: the rank windows are unpartitioned `Window.orderBy` —
    * a single partition per input. That is safe ONLY because RRF fuses
    * top-k lists (k rows move to one task, k ≈ tens); do NOT feed this
    * un-truncated rankings. A corpus-sized ranking belongs in
    * [[bm25]]/ANN's own TakeOrderedAndProject before fusion.
    */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame, idCol: String,
              lexOrder: Seq[org.apache.spark.sql.Column],
              semOrder: Seq[org.apache.spark.sql.Column],
              rrfK: Int = 60, topK: Int = 20): DataFrame = {
    def ranked(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
               as: String) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      df.select(col(idCol), row_number().over(w).cast("long").as(as))
    }
    val l = ranked(lexical, lexOrder, "lex_rank")
    val s = ranked(semantic, semOrder, "sem_rank")
    l.join(s, Seq(idCol), "full_outer")
      .select(col(idCol),
        Rounding.half4(
          coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0))).as("rrf"))
      .orderBy(desc("rrf"), col(idCol))
      .limit(topK)
  }

  /** Materialize the inverted index itself: one row per term with its
    * document frequency and the delta-encoded (gap-compressed) sorted
    * posting list — the storage artifact [[bm25]] implicitly rebuilds
    * per query, written out once so retrieval reads postings instead of
    * re-tokenizing the corpus. Gap encoding (first id, then diffs) is
    * the standard index compression prior (small ints → varint/PFor on
    * disk); emitted as CSV text so the artifact is byte-comparable
    * across engines.
    *
    * Scale shape: (id, term) pairs are distinct-ed and shuffled ONCE on
    * the term; each posting list lives in one group whose state is the
    * term's df — bounded for everything except stop-words, which a
    * production index shards into blocks and merges (the same
    * shard-then-merge shape as [[SketchOps.cmsMerge]]).
    */
  def invertedIndex(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    invertedIndexGaps(docs, idCol, textCol)
      .select(col("term"), col("df"), gapsCsv(col("gaps")).as("gaps_csv"))

  /** [[invertedIndex]] with the posting list as a long array (first
    * absolute id, then gaps) — the mergeable internal form.
    */
  def invertedIndexGaps(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).cast("long").as("id"),
        explode(T.tokens(lower(col(textCol)))).as("term"))
      .distinct()
    tok.groupBy("term")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(col("term"), size(col("ids")).cast("long").as("df"),
        expr("transform(ids, (x, i) -> " +
          "CASE WHEN i = 0 THEN x ELSE x - ids[i-1] END)").as("gaps"))
  }

  private def gapsCsv(gaps: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(transform(gaps, g => g.cast("string")), ",")

  /** Positional phrase search: documents containing the exact token
    * sequence `phrase`, with occurrence counts — the capability a
    * positional inverted index exists for (docs-only postings, q129,
    * cannot distinguish "new york" from "york new").
    *
    * Scale shape (the [[bm25]] discipline): the corpus token stream is
    * filtered to the PHRASE terms before anything shuffles, then each
    * consecutive term joins on (doc, first-term-anchored position) —
    * equi-joins whose volume is the phrase terms' posting sizes, never
    * the corpus. Each match is one start position, so counts are exact
    * even for overlapping/repeated matches.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two tokens")
    val tok = docs.select(col(idCol).cast("long").as("id"),
        posexplode(T.tokens(lower(col(textCol)))).as(Seq("pos", "term")))
      .where(col("term").isin(phrase.distinct.map(x => x: Any): _*))
    val anchor = tok.where(col("term") === phrase.head).select("id", "pos")
    phrase.zipWithIndex.drop(1).foldLeft(anchor) { case (m, (t, i)) =>
      m.join(tok.where(col("term") === t)
        .select(col("id"), (col("pos") - i).as("pos")), Seq("id", "pos"))
    }.groupBy("id").agg(count(lit(1)).as("n_occurrences"))
  }

  /** Merge two RANGE-SHARDED index halves (every doc id of `a` below
    * every doc id of `b` — the layout sharded index builds produce)
    * WITHOUT touching the corpus: per term, df adds and the posting
    * lists concatenate with one boundary-gap adjustment (b's first
    * absolute id minus a's last id, recovered as the sum of a's gaps).
    * This is the index twin of the q109 algebraic-MV merge: nightly
    * shards build in parallel and fold together in one full-outer join
    * on the term — the corpus is never re-tokenized. The q137 oracle
    * certifies merge == direct build.
    */
  def mergeRangeShardIndexes(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.select(col("term"), col("df").as("df_a"), col("gaps").as("ga"))
    val bb = b.select(col("term"), col("df").as("df_b"), col("gaps").as("gb"))
    aa.join(bb, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_a"), lit(0L)) + coalesce(col("df_b"), lit(0L))).as("df"),
        when(col("ga").isNull, col("gb"))
          .when(col("gb").isNull, col("ga"))
          .otherwise(concat(col("ga"),
            array(element_at(col("gb"), 1) -
              expr("aggregate(ga, CAST(0 AS BIGINT), (x, y) -> x + y)")),
            expr("slice(gb, 2, size(gb) - 1)"))).as("gaps"))
      .select(col("term"), col("df"), gapsCsv(col("gaps")).as("gaps_csv"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    * at λ = 1/2, integer arithmetic: from each query's candidate list,
    * greedily pick the doc maximizing `rel_bp - maxsim_bp`, where
    * maxsim_bp is the candidate's highest token-Jaccard (basis points,
    * truncating div) against the already-picked set — relevance and
    * diversity weighted equally (for λ=1/2 the argmax of
    * λ·rel − (1−λ)·maxsim is the argmax of their difference, so the
    * integer form is exact). First pick = highest rel_bp; all ties break
    * to the lower id. Returns (qCol, pick_rank 1..k, idCol, rel_bp,
    * maxsim_bp, mmr_bp).
    *
    * Scale shape: the greedy loop is inherently sequential PER QUERY but
    * runs on a candidate list already cut to top-N by the retriever, so
    * each group is O(k·N) set intersections over bounded token sets —
    * `flatMapGroups` state is N candidate rows, never corpus-sized, and
    * queries parallelize freely across the corpus of queries.
    */
  def mmrRerank(cands: DataFrame, qCol: String, idCol: String,
                relBpCol: String, toksCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = cands.sparkSession
    import spark.implicits._
    cands.select(col(qCol).cast("long"), col(idCol).cast("long"),
        col(relBpCol).cast("long"), col(toksCol).cast("array<string>"))
      .as[(Long, Long, Long, Seq[String])]
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val remaining = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Set[String])]
        it.foreach(t => remaining += ((t._2, t._3, t._4.toSet)))
        val pickedSets = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long)]
        var rank = 1L
        while (rank <= k && remaining.nonEmpty) {
          var bestIdx = -1
          var bestScore = Long.MinValue
          var bestMs = 0L
          var bestId = Long.MaxValue
          var i = 0
          while (i < remaining.length) {
            val (id, rel, ts) = remaining(i)
            var ms = 0L
            var j = 0
            while (j < pickedSets.length) {
              val ps = pickedSets(j)
              val inter = ts.count(ps.contains).toLong
              val union = ts.size.toLong + ps.size.toLong - inter
              val s = if (union == 0L) 0L else inter * 10000L / union
              if (s > ms) ms = s
              j += 1
            }
            val sc = rel - ms
            if (sc > bestScore || (sc == bestScore && id < bestId)) {
              bestIdx = i; bestScore = sc; bestMs = ms; bestId = id
            }
            i += 1
          }
          val (id, rel, ts) = remaining.remove(bestIdx)
          pickedSets += ts
          out += ((q, rank, id, rel, bestMs, rel - bestMs))
          rank += 1L
        }
        out.iterator
      }.toDF(qCol, "pick_rank", idCol, "rel_bp", "maxsim_bp", "mmr_bp")
  }
}
