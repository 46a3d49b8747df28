package graft

import graft.operators.RetrievalOps
import org.apache.spark.sql.functions._

/** Lexical retrieval: BM25 ranking semantics and RRF fusion. */
class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark engine"),
    (2L, "spark engine"),
    (3L, "window join window plan"),
    (4L, "nothing relevant here at all"),
    (5L, "the rare hash term appears hash")
  ).toDF("doc_id", "text")

  test("bm25 returns only matching docs; higher tf ranks higher") {
    val out = RetrievalOps.bm25(corpus, "doc_id", "text", Seq("spark"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSet == Set(1L, 2L))
    assert(out.head._1 == 1L, s"tf=3 should outrank tf=1: ${out.toSeq}")
    assert(out.forall(_._2 > 0.0))
  }

  test("bm25 idf: a rarer term contributes more than a common one at equal tf") {
    // 'spark' appears in 2 docs, 'window' in 1 → doc3 (window×2) should
    // outscore doc2 (spark×1): higher idf AND higher tf.
    val out = RetrievalOps.bm25(corpus, "doc_id", "text", Seq("spark", "window"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(3L) > out(2L), s"rare-term doc should outscore common-term doc: $out")
  }

  test("bm25 is invariant to partitioning") {
    val a = RetrievalOps.bm25(corpus, "doc_id", "text", Seq("spark", "hash"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = RetrievalOps.bm25(corpus.repartition(7), "doc_id", "text",
        Seq("spark", "hash"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("rrfFuse: a doc ranked in both lists beats docs in one list") {
    val lex = Seq((1L, 5.0), (2L, 4.0), (3L, 3.0)).toDF("doc_id", "bm25")
    val sem = Seq((2L, 0.9), (4L, 0.8)).toDF("doc_id", "cos")
    val out = RetrievalOps.rrfFuse(lex, sem, "doc_id",
        Seq(col("bm25").desc, col("doc_id").asc),
        Seq(col("cos").desc, col("doc_id").asc), rrfK = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 == 2L, s"doc in both rankings should fuse highest: ${out.toSeq}")
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    // 1/(60+1) alone < 1/(60+2)+1/(60+1): fused strictly above any single-list doc
    assert(out.head._2 > out(1)._2)
  }

  test("invertedIndex: known postings, gap encoding decodes to sorted ids") {
    import spark.implicits._
    val docs = Seq(
      (3L, "apple banana"), (10L, "Banana cherry"), (7L, "banana  apple"),
      (1L, "")).toDF("doc_id", "text")
    val idx = RetrievalOps.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // lowercased, per-doc distinct, sorted ids, gaps = first + diffs
    assert(idx == Map(
      "apple" -> ((2L, "3,4")),           // ids 3, 7
      "banana" -> ((3L, "3,4,3")),        // ids 3, 7, 10
      "cherry" -> ((1L, "10"))))
    // decode law: cumulative sum of gaps reproduces the sorted id list
    idx.values.foreach { case (df, csv) =>
      val gaps = csv.split(",").map(_.toLong)
      assert(gaps.length == df)
      val ids = gaps.scanLeft(0L)(_ + _).drop(1)
      assert(ids.sorted.sameElements(ids))
    }
  }

  test("phraseSearch: order-sensitive, overlapping matches, 3-token phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "new york city"), (2L, "york new city"), (3L, "a new york and new york"),
      (4L, "new new new"), (5L, "unrelated words entirely"))
      .toDF("doc_id", "text")
    val ny = RetrievalOps.phraseSearch(docs, "doc_id", "text", Seq("new", "york"))
      .as[(Long, Long)].collect().toMap
    assert(ny == Map(1L -> 1L, 3L -> 2L), s"got $ny") // doc 2 has reversed order
    // overlapping matches count per start position
    val nn = RetrievalOps.phraseSearch(docs, "doc_id", "text", Seq("new", "new"))
      .as[(Long, Long)].collect().toMap
    assert(nn == Map(4L -> 2L))
    val nyc = RetrievalOps.phraseSearch(docs, "doc_id", "text",
      Seq("new", "york", "city"))
      .as[(Long, Long)].collect().toMap
    assert(nyc == Map(1L -> 1L))
  }

  test("mergeRangeShardIndexes == direct build, including one-sided terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana"), (5L, "banana cherry"),      // low shard
      (10L, "banana date"), (20L, "egg")).toDF("doc_id", "text") // high shard
    val a = RetrievalOps.invertedIndexGaps(
      docs.where(col("doc_id") < 10), "doc_id", "text")
    val b = RetrievalOps.invertedIndexGaps(
      docs.where(col("doc_id") >= 10), "doc_id", "text")
    val merged = RetrievalOps.mergeRangeShardIndexes(a, b)
      .as[(String, Long, String)].collect().toSet
    val direct = RetrievalOps.invertedIndex(docs, "doc_id", "text")
      .as[(String, Long, String)].collect().toSet
    assert(merged == direct)
    // the boundary adjustment is visible: banana spans both shards
    assert(merged.contains(("banana", 3L, "1,4,5")))
    // one-sided terms pass through untouched
    assert(merged.contains(("apple", 1L, "1")))
    assert(merged.contains(("egg", 1L, "20")))
  }

  test("mmrRerank trades relevance for diversity, hand-checked") {
    // doc 1: top relevance. doc 2: second by relevance but identical
    // tokens to doc 1 (jaccard 10000). doc 3: lower relevance, disjoint
    // tokens. MMR must pick 1, then 3 (8000 - 0 > 9000 - 10000), then 2.
    val cands = Seq(
      (0L, 1L, 10000L, Seq("a", "b", "c", "d")),
      (0L, 2L, 9000L, Seq("a", "b", "c", "d")),
      (0L, 3L, 8000L, Seq("x", "y", "z", "w"))
    ).toDF("qid", "id", "rel_bp", "toks")
    val out = RetrievalOps.mmrRerank(cands, "qid", "id", "rel_bp", "toks", k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3, r._5, r._6)).toSeq == Seq(
      (1L, 1L, 0L, 10000L),      // rank 1: doc 1, maxsim 0
      (2L, 3L, 0L, 8000L),       // rank 2: doc 3 beats doc 2 (-1000)
      (3L, 2L, 10000L, -1000L))) // rank 3: doc 2, full overlap with pick 1
    // ties in mmr score break to the lower id
    val tie = Seq(
      (0L, 5L, 7000L, Seq("p", "q")),
      (0L, 4L, 7000L, Seq("r", "s"))
    ).toDF("qid", "id", "rel_bp", "toks")
    val t = RetrievalOps.mmrRerank(tie, "qid", "id", "rel_bp", "toks", k = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(t.length == 1 && t.head._3 == 4L)
    // k beyond the candidate count returns every candidate, ranked
    val all = RetrievalOps.mmrRerank(cands, "qid", "id", "rel_bp", "toks", k = 99)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(all.length == 3)
  }
}
