package graft

import org.apache.spark.sql.functions._

import graft.operators.ItemsetOps

/** Apriori frequent pairs: support is SET-counted (documents, not
  * occurrences), anti-monotone pruning keeps infrequent items out of
  * the pair stage, and the quadratic-basket guard fails loudly rather
  * than materializing C(n,2) rows.
  */
class ItemsetOpsSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("set-counted support and exact planted pairs") {
    val docs = corpus(
      1L -> "a b c", 2L -> "a b", 3L -> "a b a b a", // dup tokens: one doc
      4L -> "c d", 5L -> "x y")
    val out = ItemsetOps.frequentPairs(docs, "doc_id", "text", minSupport = 3L)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("a", "b", 3L))
    assert((r.getLong(3), r.getLong(4)) == (3L, 3L))
    // lift_e4 = n_docs * pair_docs * 10000 div (t1_docs * t2_docs)
    assert(r.getLong(5) == 5L * 3 * 10000 / (3 * 3))
  }

  test("anti-monotone pruning: a pair with one infrequent leg never forms") {
    // c and d co-occur in EVERY doc containing either, but d is
    // infrequent — the pair must be pruned at the item stage
    val docs = corpus(1L -> "c d", 2L -> "c e", 3L -> "c e", 4L -> "e f")
    val out = ItemsetOps.frequentPairs(docs, "doc_id", "text", minSupport = 2L)
    assert(out.select("t1", "t2").collect().map(r =>
      (r.getString(0), r.getString(1))).toSet == Set(("c", "e")))
  }

  test("oversized frequent basket fails loudly, not quadratically") {
    val docs = corpus(1L -> "a b c d e f", 2L -> "a b c d e f")
    val e = intercept[Exception] {
      ItemsetOps.frequentPairs(docs, "doc_id", "text",
        minSupport = 1L, maxItemsPerDoc = 4).collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxItemsPerDoc")),
      s"expected the basket-cap message, got: ${messages(e)}")
  }
}
