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
}
