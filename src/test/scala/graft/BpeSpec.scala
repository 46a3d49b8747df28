package graft

import graft.functions.Bpe
import graft.operators.TextAnalysisOps

/** BPE encode-loop semantics (the oracle re-derives the identical loop
  * as a recursive CTE, so these pin the contract on the Spark side).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("encode: toy merges collapse common words, priority order wins") {
    val v = Bpe.toyVocab
    // t+h -> th (rank 0), th+e -> the (rank 1)
    assert(v.encode("the").toSeq == Seq("the"))
    // a+n -> an (rank 3), an+d -> and (rank 4)
    assert(v.encode("and").toSeq == Seq("and"))
    // no applicable merges -> stays characters
    assert(v.encode("xyz").toSeq == Seq("x", "y", "z"))
    assert(v.encode("").toSeq == Seq.empty)
  }

  test("encode: merge-all is left-to-right and non-overlapping") {
    val v = new Bpe.Vocab(Vector("a" -> "a"))
    assert(v.encode("aaaa").toSeq == Seq("aa", "aa"))
    assert(v.encode("aaa").toSeq == Seq("aa", "a"))
    assert(v.encode("aaaaa").toSeq == Seq("aa", "aa", "a"))
  }

  test("encode: best-ranked pair is merged before later-ranked pairs") {
    // 'b c' outranks 'a b': "abc" must become [a, bc], not [ab, c]
    val v = new Bpe.Vocab(Vector("b" -> "c", "a" -> "b"))
    assert(v.encode("abc").toSeq == Seq("a", "bc"))
    // and merged tokens re-enter the pair search on later rounds
    val v2 = new Bpe.Vocab(Vector("a" -> "b", "ab" -> "c"))
    assert(v2.encode("abc").toSeq == Seq("abc"))
  }

  test("encode is lossless: tokens always concatenate back to the word") {
    val rng = new scala.util.Random(11)
    val alpha = "etaoinshrdlcumwfgypbvk"
    (1 to 500).foreach { _ =>
      val w = Seq.fill(rng.nextInt(14) + 1)(alpha(rng.nextInt(alpha.length))).mkString
      val toks = Bpe.toyVocab.encode(w)
      assert(toks.mkString == w, s"lossy encode of '$w': ${toks.toSeq}")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("bpeTokenCounts kernel: per-doc word and token counts") {
    val docs = Seq(
      (1L, "The and the"),   // lowercased: the=1, and=1, the=1 -> 3 tokens
      (2L, "xyz"),           // 3 char tokens
      (3L, "  "),            // no words
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.bpeTokenCounts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 3L)))
    assert(out(2L) == ((1L, 3L)))
    assert(out(3L) == ((0L, 0L)))
    assert(out(4L) == ((0L, 0L)))
  }

  test("encodeTrace: applied ranks replay encode exactly on known words") {
    val v = graft.functions.Bpe.toyVocab
    // "the": (t,h) rank 0 then (th,e) rank 1
    assert(v.encodeTrace("the").toSeq == Seq(0, 1))
    assert(v.encode("the").toSeq == Seq("the"))
    // "and": (a,n) rank 3 then (an,d) rank 4
    assert(v.encodeTrace("and").toSeq == Seq(3, 4))
    // one round merges ALL occurrences: three (i,n) pairs, one trace entry
    assert(v.encodeTrace("ininin").toSeq == Seq(2))
    assert(v.encode("ininin").toSeq == Seq("in", "in", "in"))
    // no applicable merge: empty trace, character tokens
    assert(v.encodeTrace("xyz").isEmpty && v.encode("xyz").length == 3)
    assert(v.encodeTrace("").isEmpty)
    // law: every round shrinks the token count by at least one
    for (w <- Seq("the", "and", "ininin", "together", "punctuation"))
      assert(v.encode(w).length <= w.length - v.encodeTrace(w).length, w)
  }
}
