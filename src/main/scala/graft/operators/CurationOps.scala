package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * runs over every ingest batch: quality gate → language gate → exact
  * dedup, in one operator.
  *
  * Plan shape (what survives 100 TB):
  *  - ONE `textStats` kernel pass produces quality AND language
  *    ([[TextAnalysisOps.docProfile]]); the gates are Catalyst
  *    predicates evaluated in the same stage — low-quality and
  *    wrong-language rows die before anything shuffles.
  *  - The fingerprint projection is a second narrow scan (md5 of
  *    normalized text), joined to the surviving profile rows on id; the
  *    join input on the profile side is already gate-filtered.
  *  - The dedup shuffle carries (fingerprint, id) — never document
  *    payloads (same contract as [[DedupOps.exactDedup]]).
  *
  * Near-dup removal (MinHash) intentionally stays a separate stage
  * ([[DedupOps.minhashNearDups]]): it needs its own shuffle geometry and
  * its candidate set should be built on the EXACT-deduped survivors.
  */
object CurationOps {

  /** Gate + dedup the corpus. Returns one row per surviving distinct
    * content: (fingerprint, keep_id, dup_count).
    *
    * @param minQuality  minimum composite quality (docProfile `quality`)
    * @param langs       allowed predicted languages
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             langs: Seq[String] = Seq("en")): DataFrame = {
    val prof = TextAnalysisOps.docProfile(docs, idCol, textCol)
      .where(col("quality") >= minQuality && col("lang_pred").isin(langs: _*))
      .select(col(idCol))
    val fp = docs.select(col(idCol), T.fingerprint(col(textCol)).as("fingerprint"))
    prof.join(fp, Seq(idCol))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** Survivor payloads: [[curate]] joined back to the original rows —
    * what downstream training jobs actually read. The join is on keep_id
    * (one row per distinct content), broadcast when the survivor set is
    * small.
    */
  def curatedDocs(docs: DataFrame, idCol: String, textCol: String,
                  minQuality: Double = 0.5,
                  langs: Seq[String] = Seq("en")): DataFrame =
    curate(docs, idCol, textCol, minQuality, langs)
      .select(col("keep_id").as(idCol), col("dup_count"))
      .join(docs, Seq(idCol))
}
