package graft

import graft.operators.TextAnalysisOps

/** Kernel-level checks for the text-analysis operators whose main
  * verification is the DuckDB oracle (q14-q16, q72, q77) — these pin the
  * hand-computable cases.
  */
class TextAnalysisOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: hand-computed fractions, degenerate docs at 0") {
    val docs = Seq(
      // bigrams: "a b","b a","a b","b a","a b" -> 5 total, 2 distinct, max 3
      (1L, "a b a b a b"),
      // all distinct bigrams
      (2L, "w x y z"),
      // fewer than 2 tokens and empty/null -> zero row
      (3L, "solo"),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((5L, 0.6, 0.6)))   // 3/5 top, (5-2)/5 dup
    assert(out(2L) == ((3L, 0.3333, 0.0)))
    assert(out(3L) == ((0L, 0.0, 0.0)))
    assert(out(4L) == ((0L, 0.0, 0.0)))
    assert(out(5L) == ((0L, 0.0, 0.0)))
  }

  test("chunkByTokens windows with overlap, suppresses no-new-token tails") {
    // chunkSize 4, overlap 2, step 2 over 7 tokens:
    // starts 0,2,4 (6 suppressed: 6+2 >= 7 adds nothing new);
    // chunks: t0-t3, t2-t5, t4-t6 (tail clamps to 3 tokens)
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "x y"),        // single chunk, n_tokens 2
      (3L, "")            // no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.chunkByTokens(docs, "doc_id", "text",
        chunkSize = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getInt(3)))).toMap
    assert(out == Map(
      (1L, 0L) -> (("a b c d", 4)),
      (1L, 1L) -> (("c d e f", 4)),
      (1L, 2L) -> (("e f g", 3)),
      (2L, 0L) -> (("x y", 2))))
  }

  test("chunking is lossless: stepped prefixes reconstruct every token stream") {
    // taking the first `step` tokens of each chunk (all of the last)
    // must rebuild the document exactly, for arbitrary token counts
    // around the window boundaries
    val chunkSize = 8; val overlap = 3; val step = chunkSize - overlap
    val docs = (1 to 30).map { n =>
      (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))
    }.toDF("doc_id", "text")
    val chunks = TextAnalysisOps.chunkByTokens(docs, "doc_id", "text", chunkSize, overlap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    (1 to 30).foreach { n =>
      val cs = chunks(n.toLong)
      val rebuilt = (cs.init.map(_.split(" ").take(step).mkString(" ")) :+ cs.last)
        .mkString(" ")
      val want = (1 to n).map(i => s"t$i").mkString(" ")
      assert(rebuilt == want, s"n=$n: $cs")
    }
  }

  test("tokenRarity scores docs against the corpus unigram counts") {
    // corpus counts: "the"=3, "cat"=2, "sat"=1, "zx9q"=1
    // threshold 1 -> rare tokens are sat and zx9q
    val docs = Seq(
      (1L, "the cat sat"),        // counts 3,2,1 -> rare 1/3, mean 6/3
      (2L, "the cat the"),        // counts 3,2,3 -> rare 0, mean 8/3
      (3L, "zx9q"),               // count 1     -> rare 1/1, mean 1
      (4L, "")                    // no tokens   -> zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.tokenRarity(docs, "doc_id", "text", rareThreshold = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((3L, 1L, 0.3333, 2.0)))
    assert(out(2L) == ((3L, 0L, 0.0, 2.6667)))
    assert(out(3L) == ((1L, 1L, 1.0, 1.0)))
    assert(out(4L) == ((0L, 0L, 0.0, 0.0)))
  }

  test("bigramLmScore: add-one smoothed bigram probabilities, integer-quantized") {
    // corpus bigrams: doc1 "a b a b" -> (a,b),(b,a),(a,b); doc2 "a b" -> (a,b)
    // c(a,b)=3, c(b,a)=1; c(a as prev)=3, c(b as prev)=1; V={a,b,c}=3
    // p(a,b) = (3+1)/(3+3) = 2/3 -> p9 = 666666667
    // p(b,a) = (1+1)/(1+3) = 1/2 -> p9 = 500000000
    val docs = Seq(
      (1L, "a b a b"), // p9s: ab, ba, ab -> sum 1833333334, mean 611111111.33
      (2L, "a b"),     // one bigram: 666666667
      (3L, "c"),       // single token: no bigrams
      (4L, "")         // empty: no tokens
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 1833333334L, 611111111.33)))
    assert(out(2L) == ((1L, 666666667L, 666666667.0)))
    assert(out(3L) == ((0L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("nfcNormalize composes decomposed sequences, makes dedup see through them") {
    import spark.implicits._
    val decomposed = "cafe" + "\u0301"  // e + COMBINING ACUTE
    val composed = "caf" + "\u00e9"     // precomposed
    val docs = Seq(
      (1L, decomposed), (2L, composed), (3L, "plain ascii"),
      (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = TextAnalysisOps.nfcNormalize(docs, "id", "text")
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == composed && out(1L)._3, "decomposed must compose + flag")
    assert(out(2L)._2 == composed && !out(2L)._3, "already-NFC input untouched")
    assert(out(3L) == ((3L, "plain ascii", false)))
    assert(out(4L) == ((4L, "", false)) && out(5L) == ((5L, "", false)))
    // the point of the op: byte-different inputs become dedup-equal
    assert(decomposed != composed && out(1L)._2 == out(2L)._2)
  }

  test("collocations: a repeated pair clears count+lift gates; rare and common pairs do not") {
    val docs = Seq(
      (1L, "new york new york new york"),
      (2L, "the cat the dog the fish")
    ).toDF("id", "text")
    val out = TextAnalysisOps.collocations(docs, "text", minCount = 3L, minLiftE4 = 30000L)
      .as[(String, String, Long, Long, Long, Long)].collect()
    // N = 12, c(new)=c(york)=c(new york)=3 -> lift = 12*3*1e4/9 = 40000
    assert(out.toSeq == Seq(("new", "york", 3L, 3L, 3L, 40000L)), out.toSeq.toString)
    // lower thresholds admit (york, new) (c=2) but the pair table never
    // fabricates cross-document bigrams ("york the" must not exist)
    val loose = TextAnalysisOps.collocations(docs, "text", minCount = 2L, minLiftE4 = 0L)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(loose.exists(r => r._1 == "york" && r._2 == "new" && r._3 == 2L))
    assert(!loose.exists(r => r._1 == "york" && r._2 == "the"),
      "bigrams must not span documents")
  }

  test("vocabRichness: chao1 folds the singleton/doubleton tail per source") {
    val docs = Seq(
      ("A", "a a b c d"),   // D=4, f1=3 (b c d), f2=1 (a) -> chao1 = 4 + 6 div 4 = 5
      ("B", "x x y y"),     // D=2, f1=0, f2=2 -> chao1 = 2
      ("B", "")             // empty text contributes nothing
    ).toDF("source", "text")
    val out = TextAnalysisOps.vocabRichness(docs, "source", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 5L, 4L, 3L, 1L, 5L)), out("A").toString)
    assert(out("B") == (("B", 4L, 2L, 0L, 2L, 2L)), out("B").toString)
  }

  test("featureHash: deterministic, text-identical docs collide, signed mass bounded") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"),   // same text -> identical feature rows
      (3L, "delta"), (4L, "")
    ).toDF("id", "text")
    val out = TextAnalysisOps.featureHash(docs, "id", "text", nBuckets = 16)
      .as[(Long, Long, Long)].collect()
    val by = out.groupBy(_._1)
    assert(by(1L).map(r => (r._2, r._3)).toSet == by(2L).map(r => (r._2, r._3)).toSet,
      "identical text must produce identical sparse vectors")
    assert(!by.contains(4L), "empty doc emits no feature rows")
    // signed counts: |sum of signs| per bucket <= token occurrences
    assert(by(1L).map(r => math.abs(r._3)).sum <= 4L)
    assert(by(1L).forall(r => r._2 >= 0L && r._2 < 16L), "buckets within range")
    assert(by(3L).map(r => math.abs(r._3)).sum == 1L, "single token: one unit of mass")
  }

  test("bpeMergeUsage: per-rank rounds over distinct words, weighted by instances") {
    val docs = Seq((1L, "the the and")).toDF("id", "text")
    val out = TextAnalysisOps.bpeMergeUsage(docs, "id", "text")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // "the" (2 instances): ranks 1,2 (1-based); "and" (1): ranks 4,5
    assert(out(1L) == ((1L, "t h", 1L, 2L)))
    assert(out(2L) == ((2L, "th e", 1L, 2L)))
    assert(out(4L) == ((4L, "a n", 1L, 1L)))
    assert(out(5L) == ((5L, "an d", 1L, 1L)))
    assert(out.size == 4, s"dead merges must not appear: $out")
  }

  test("stupidBackoffScore: seen bigrams take the ML estimate, unseen back off through the unigram") {
    val train = Seq((1L, "a b a b c")).toDF("id", "text")   // N=5; c(a b)=2, c(a)=2, c(c)=1
    val eval = Seq((10L, "a b x"), (11L, "a c"), (12L, "z")).toDF("id", "text")
    val out = TextAnalysisOps.stupidBackoffScore(train, eval, "id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // (a,b) seen: 2e6/2 = 1e6; (b,x): x unseen entirely -> 0. mean = 5e5
    assert(out(10L) == ((10L, 2L, 1L, 500000L)), out(10L).toString)
    // (a,c) unseen bigram, c(c)=1: 400000*1/5 = 80000
    assert(out(11L) == ((11L, 1L, 1L, 80000L)), out(11L).toString)
    assert(out(12L) == ((12L, 0L, 0L, 0L)), "no bigrams -> zeros")
  }

  test("tokenDropout: deterministic ~10% subsequence, seed-steered") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "")).toDF("id", "text")
    def run(seed: String) = TextAnalysisOps.tokenDropout(docs, "id", "text", seed)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val a = run("aug")
    assert(a == run("aug"), "pure function of (id, position, seed)")
    val (_, aug, n, dropped) = a(1L)
    assert(n == 200L && dropped > 5L && dropped < 50L, s"~10% of 200: $dropped")
    val keptToks = aug.split(" ").toSeq
    assert(keptToks.length == 200 - dropped)
    // kept tokens preserve original order (subsequence law)
    val orig = text.split(" ").toSeq
    assert(keptToks == orig.filter(keptToks.toSet), "order-preserving subsequence")
    assert(a(2L) == ((2L, "", 0L, 0L)))
    assert(run("other")(1L)._2 != aug, "seed must steer the mask")
  }

  test("tvDivergence: hand-computed corpus, zero-distance and disjoint-vocab laws") {
    // s1 = corpus restricted to {a: 2, b: 2} (N_1 = 4); s2 = {a: 2, c: 2}
    // (N_2 = 4); corpus: a 4, b 2, c 2 (N = 8).
    // TV(s1) = 1/2 (|2/4-4/8| + |2/4-2/8| + |0-2/8|) = 1/4 -> 2500 bp
    val docs = Seq(("s1", "a b a b"), ("s2", "a c a c")).toDF("source", "text")
    val out = TextAnalysisOps.tvDivergence(docs, "source", "text")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("s1") == (("s1", 4L, 8L, 2500L)), out("s1").toString)
    assert(out("s2") == (("s2", 4L, 8L, 2500L)), out("s2").toString)

    // single source: its distribution IS the corpus -> TV = 0
    val solo = TextAnalysisOps.tvDivergence(
      Seq(("only", "x y z x")).toDF("source", "text"), "source", "text")
      .as[(String, Long, Long, Long)].collect()
    assert(solo.toSeq == Seq(("only", 4L, 4L, 0L)))

    // two disjoint-vocab sources of equal size: each TV = 1/2 -> 5000 bp
    val disj = TextAnalysisOps.tvDivergence(
      Seq(("l", "p p q"), ("r", "u v w")).toDF("source", "text"),
      "source", "text")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(disj == Map("l" -> 5000L, "r" -> 5000L), disj.toString)
  }
}
