package graft.functions

import scala.collection.mutable.ArrayBuffer

/** A real (if toy-vocabulary) byte-pair-encoding tokenizer: iterative
  * merge of the best-ranked adjacent pair, exactly the encode loop of
  * production BPE (GPT-2/SentencePiece style), over an explicit ordered
  * merges table. A training-data pipeline packs sequences by REAL token
  * counts, not whitespace words — this supplies those counts with
  * deterministic, engine-reproducible semantics (the same encode is
  * re-derived in the DuckDB oracle as a recursive CTE).
  *
  * The reference has no tokenizer at all (its parser splits HTML cells,
  * parser.py); this is engine capability beyond parity.
  *
  * Semantics per word (lowercased whitespace token):
  *  1. start from single characters;
  *  2. find the lowest-rank merge present among adjacent pairs;
  *  3. merge ALL its occurrences left-to-right, non-overlapping;
  *  4. repeat until no merge applies.
  */
object Bpe {

  /** Deterministic toy merges (priority order): common English pairs.
    * Small enough to inline as a literal in oracle SQL, rich enough that
    * frequent words collapse to 1-2 tokens while rare words stay near
    * character-length — the real BPE length distribution in miniature.
    */
  val ToyMerges: IndexedSeq[(String, String)] = Vector(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "r", "s" -> "t",
    "a" -> "t", "e" -> "n", "o" -> "u", "a" -> "r", "in" -> "g",
    "e" -> "s", "o" -> "f", "i" -> "s", "i" -> "t", "a" -> "l",
    "l" -> "e", "c" -> "h", "w" -> "h", "u" -> "n")

  /** A merges table with its rank lookup, shippable to executors once
    * (broadcast or closure capture) rather than rebuilt per row.
    */
  final class Vocab(val merges: IndexedSeq[(String, String)]) extends Serializable {
    private val rk: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Encode one word into its BPE tokens. */
    def encode(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      var toks: ArrayBuffer[String] =
        ArrayBuffer.tabulate(word.length)(i => word.substring(i, i + 1))
      var done = false
      while (!done && toks.length > 1) {
        // best-ranked adjacent pair present this round
        var best = Int.MaxValue
        var i = 0
        while (i < toks.length - 1) {
          val r = rk.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = merges(best)
          // merge all occurrences, left-to-right, non-overlapping
          val next = new ArrayBuffer[String](toks.length)
          var j = 0
          while (j < toks.length) {
            if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
              next += a + b
              j += 2
            } else {
              next += toks(j)
              j += 1
            }
          }
          toks = next
        }
      }
      toks.toArray
    }

    def countTokens(word: String): Int = encode(word).length

    /** Encode one word, returning the 0-based rank of every merge round
      * APPLIED, in application order — the trace [[graft.operators
      * .TextAnalysisOps.bpeMergeUsage]] aggregates into per-merge usage
      * counts. Same loop as [[encode]] (one entry per round; a round
      * merges ALL occurrences of its pair).
      */
    def encodeTrace(word: String): Array[Int] = {
      if (word.isEmpty) return Array.empty
      var toks: ArrayBuffer[String] =
        ArrayBuffer.tabulate(word.length)(i => word.substring(i, i + 1))
      val out = new ArrayBuffer[Int]()
      var done = false
      while (!done && toks.length > 1) {
        var best = Int.MaxValue
        var i = 0
        while (i < toks.length - 1) {
          val r = rk.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          out += best
          val (a, b) = merges(best)
          val next = new ArrayBuffer[String](toks.length)
          var j = 0
          while (j < toks.length) {
            if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
              next += a + b
              j += 2
            } else {
              next += toks(j)
              j += 1
            }
          }
          toks = next
        }
      }
      out.toArray
    }
  }

  lazy val toyVocab: Vocab = new Vocab(ToyMerges)
}
