package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** Curation composition: planted low-quality, foreign-language, and
  * duplicate rows must be gated/collapsed; clean rows must survive.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // 60 tokens of plain English with enough stopwords to clear the gate
  private val goodText = ("the quick brown fox jumps over the lazy dog and " +
    "runs far into the woods where it is safe and warm for the winter " +
    "season with plenty of food and water to last until spring arrives " +
    "bringing sunshine and new growth for all of the animals in the forest").trim

  private def corpus = Seq(
    (1L, goodText),                         // survivor
    (2L, goodText),                         // exact dup of 1 → collapsed
    (3L, goodText.replace(" ", "   ")),     // whitespace-variant dup (same fingerprint)
    (4L, "el la de que " * 20),             // spanish → language-gated
    (5L, "!!! ??? ### $$$ %%%"),            // punctuation soup → quality-gated
    (6L, goodText + " unique closing sentence for doc six of the corpus here")
  ).toDF("doc_id", "text")

  test("curate gates quality/language and collapses exact duplicates") {
    val out = CurationOps.curate(corpus, "doc_id", "text",
      minQuality = 0.5, langs = Seq("en")).collect()
    val byKeep = out.map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("dup_count")).toMap
    assert(byKeep.keySet == Set(1L, 6L), s"got $byKeep")
    assert(byKeep(1L) == 3L) // docs 1, 2, 3 share a normalized fingerprint
    assert(byKeep(6L) == 1L)
  }

  test("curatedDocs returns the surviving payload rows") {
    val out = CurationOps.curatedDocs(corpus, "doc_id", "text",
      minQuality = 0.5, langs = Seq("en"))
      .select("doc_id", "dup_count", "text").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 6L))
    assert(out.forall(_.getString(2).nonEmpty))
  }

  test("decontaminate flags benchmark-overlapping docs, spares the rest") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),     // contains bench grams
      (2L, "completely unrelated text about catalyst planner internals"),
      (3L, "quick brown fox appears here too with more words") // shares 2 grams
    ).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox ran far").toDF("text")
    val out = CurationOps.decontaminate(corpus, "doc_id", "text", bench, "text",
      shingleN = 3, minShared = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // bench grams: "the quick brown","quick brown fox","brown fox ran","fox ran far"
    assert(out(1L) == ((2L, true)))   // shares the first two
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((1L, false)))  // only "quick brown fox" — below threshold
  }

  test("mixWeights: upsample under-represented, downsample dominant") {
    val counts = Seq(
      ("web", 900L), ("web", 100L),   // 1000 tokens -> actual 0.8
      ("books", 250L)                 // 250 tokens  -> actual 0.2
    ).toDF("src", "tok")
    val out = CurationOps.mixWeights(counts, "src", "tok",
      Map("books" -> 0.5), defaultTarget = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5)))).toMap
    assert(out("web") == ((2L, 1000L, 0.8, 0.625)))   // 0.5 / 0.8
    assert(out("books") == ((1L, 250L, 0.2, 2.5)))    // 0.5 / 0.2 -> upsample
  }

  test("widening the language gate admits the spanish doc") {
    val out = CurationOps.curate(corpus, "doc_id", "text",
      minQuality = 0.3, langs = Seq("en", "es")).collect()
    assert(out.map(_.getAs[Long]("keep_id")).toSet.contains(4L))
  }

  test("stripBoilerplate removes frequent lines, keeps order and rare lines") {
    // footer in all 3 docs of src a (boilerplate), banner in 2 of 3 (also
    // >= 50%), unique body lines survive in order; src b below minDocs
    val docs = Seq(
      (1L, "a", "alpha body one\nFOOTER A\nBANNER\nalpha body two"),
      (2L, "a", "beta body\nFOOTER A\nBANNER"),
      (3L, "a", "gamma body\nFOOTER A"),
      (4L, "b", "delta body\nFOOTER B")
    ).toDF("doc_id", "src", "text")
    val out = CurationOps.stripBoilerplate(docs, "doc_id", "src", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) == (("alpha body one\nalpha body two", 2)))
    assert(out(2L) == (("beta body", 2)))
    assert(out(3L) == (("gamma body", 1)))
    // src b has a single doc: its footer is below minDocs=2, nothing strips
    assert(out(4L) == (("delta body\nFOOTER B", 0)))
  }

  test("stripBoilerplate counts repeated lines within one doc once for frequency") {
    // the repeated line appears TWICE in doc 1 but only doc 1 contains it:
    // distinct-per-doc counting keeps it (1 of 2 docs < minDocs)
    val docs = Seq(
      (1L, "a", "dup line\ndup line\nbody one"),
      (2L, "a", "body two")
    ).toDF("doc_id", "src", "text")
    val out = CurationOps.stripBoilerplate(docs, "doc_id", "src", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(1L -> 0, 2L -> 0))
  }

  test("temperatureSample rebalances toward tail sources, deterministically") {
    import spark.implicits._
    // 100:1 token skew: big = 200 docs x 50 tok, tail = 10 docs x 10 tok
    val docs = ((1L to 200L).map(i => (i, "big", 50L)) ++
      (1001L to 1010L).map(i => (i, "tail", 10L))).toDF("id", "src", "tok")
    val out = CurationOps.temperatureSample(docs, "id", "src", "tok")
      .as[(Long, String, Long, Long, Boolean)].collect()
    val bySrc = out.groupBy(_._2)
    // rates: w_big = floor(sqrt(10000)) = 100 -> raw = 10^8*100/10^4 = 10^6
    //        w_tail = floor(sqrt(100)) = 10  -> raw = 10^8*10/100 = 10^7 (max)
    // -> tail keeps 100%, big keeps 10^6*10^4 div 10^7 = 1000 bp = 10%
    assert(bySrc("tail").forall(r => r._4 == 10000L && r._5))
    assert(bySrc("big").forall(_._4 == 1000L))
    val keptBig = bySrc("big").count(_._5)
    assert(keptBig > 0 && keptBig < 50, s"~10% of 200 expected, got $keptBig")
    // at fixed rates the keep bit is a pure function of the id: a
    // repartitioned re-run reproduces every decision bit-for-bit
    val out2 = CurationOps.temperatureSample(docs.repartition(7),
      "id", "src", "tok")
      .as[(Long, String, Long, Long, Boolean)].collect()
    assert(out2.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("dsirResample: target-vocabulary docs outrank generic docs; targets self-select") {
    // targets (ids 1-5) speak "rust tokio async"; planted lookalikes
    // (ids 100-109) share that vocabulary; the noise floor (ids 200-299)
    // shares none of it
    val docs = ((1L to 5L).map(i => (i, "rust tokio async await spawn")) ++
      (100L to 109L).map(i => (i, "rust tokio async runtime")) ++
      (200L to 299L).map(i => (i, s"lorem ipsum dolor sit amet t$i"))).toDF("id", "text")
    val out = CurationOps.dsirResample(docs, "id", "text",
        isTarget = col("id") <= 5L, n = 15)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 15)
    val picked = out.map(_._1).toSet
    assert((1L to 5L).forall(picked), "the target slice defines the target — it must self-select")
    assert((100L to 109L).forall(picked), "lookalikes share the enriched vocabulary")
    // enrichment scores: every selected doc strictly outranks the noise floor
    val floorScore = out.map(_._4).min
    assert(floorScore > 0L, "noise-floor docs (imp_bp would be ~0) must not make the cut")
  }

  test("weakLabelVote: plurality, tie->abstain, all-abstain, unanimity") {
    val votes = Seq(
      (1L, "lf_a", "keep"), (1L, "lf_b", "keep"), (1L, "lf_c", "drop"),
      (2L, "lf_a", "keep"), (2L, "lf_b", "drop"), (2L, "lf_c", null),
      (3L, "lf_a", null), (3L, "lf_b", null), (3L, "lf_c", null),
      (4L, "lf_a", "keep"), (4L, "lf_b", null), (4L, "lf_c", null)
    ).toDF("id", "lf", "label")
    val out = CurationOps.weakLabelVote(votes, "id", "label")
      .as[(Long, Long, Long, String, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 0L, "keep", false, 6666L)), s"2-1 plurality: ${out(1L)}")
    assert(out(2L) == ((2L, 2L, 1L, "abstain", true, 0L)), s"1-1 tie: ${out(2L)}")
    assert(out(3L) == ((3L, 0L, 3L, "abstain", false, 0L)), s"no votes: ${out(3L)}")
    assert(out(4L) == ((4L, 1L, 2L, "keep", false, 10000L)), s"single vote: ${out(4L)}")
  }
}
