package graft.operators

import graft.functions.{Rounding, TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators: language ID, quality scoring, token
  * counting, fingerprinting. All pure per-row Catalyst expressions —
  * they stay in whole-stage codegen and need no shuffle at all, which is
  * exactly what you want for a 100 TB scan-and-score pass.
  */
object TextAnalysisOps {

  /** Tiny per-language stopword marker lists for the n-gram-free heuristic.
    * Deliberately small and deterministic (explainable, oracle-checkable);
    * a production system would swap in fastText-style n-gram profiles.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "zh" -> Seq("de", "shi", "le", "zai"))

  private def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(x => x: Any): _*))).cast("double")

  /** Heuristic language ID: score each language by marker-token hit rate;
    * highest scorer wins, ties broken by list order; "und" when nothing
    * hits.
    */
  def langIdExpr(text: Column): Column = {
    val toks = T.tokens(text)
    // Build a deterministic argmax as a fold over the (lang, score) list.
    val scored = LangMarkers.map { case (lang, ms) => (lang, markerHits(toks, ms)) }
    val best = scored.foldLeft((lit("und"), lit(0.0))) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
         when(score > bestScore, score).otherwise(bestScore))
    }
    best._1
  }

  /** Quality-scoring pass: length, token stats, stopword/punct ratios and
    * a composite [0,1] quality score (heuristic, deterministic).
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nToks = T.tokenCount(t)
    val swr = T.stopwordRatio(t)
    val pr = T.punctRatio(t)
    val mtl = T.meanTokenLen(t)
    // Composite: reward mid-length docs with some stopwords, penalize punct
    // walls; clamp to [0,1]. Pure arithmetic, no UDF.
    val lengthScore = least(nToks.cast("double") / lit(50.0), lit(1.0))
    val composite = greatest(lit(0.0), least(lit(1.0),
      lengthScore * lit(0.5) + least(swr * lit(5.0), lit(1.0)) * lit(0.3)
        + (lit(1.0) - least(pr * lit(10.0), lit(1.0))) * lit(0.2)))
    docs.select(
      col(idCol),
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      Rounding.half4(mtl).as("mean_token_len"),
      Rounding.half4(swr).as("stopword_ratio"),
      Rounding.half4(pr).as("punct_ratio"),
      Rounding.half4(composite).as("quality"))
  }

  /** Token-counting pass: whitespace and BPE-ish counts per document. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      T.tokenCount(col(textCol)).as("ws_tokens"),
      T.bpeishTokenCount(col(textCol)).as("bpeish_tokens"))

  /** Language-ID pass with agreement flag against a labeled column. */
  def languageId(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: Option[String] = None): DataFrame = {
    val base = docs.select(col(idCol), langIdExpr(col(textCol)).as("lang_pred"))
    labelCol match {
      case Some(l) => docs.select(col(idCol), col(l).as("lang_label"),
        langIdExpr(col(textCol)).as("lang_pred"))
      case None => base
    }
  }

  /** Content fingerprints: md5 of normalized text + a 64-bit xxhash —
    * the join/dedup keys for incremental corpus maintenance.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      T.fingerprint(col(textCol)).as("fingerprint"),
      xxhash64(lower(T.cleanText(col(textCol)))).as("fp64"))
}
