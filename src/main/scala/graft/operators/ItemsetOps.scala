package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over document token sets (market-basket):
  * which tokens co-occur in at least `minSupport` documents?
  *
  * The scale problem is pair GENERATION, not pair counting: a document
  * with K distinct tokens yields K·(K−1)/2 pairs, and a corpus-wide
  * self-join on doc id materializes that blowup for every document.
  * The classical Apriori answer (Agrawal & Srikant, VLDB'94) prunes
  * before any pair exists: a frequent pair's BOTH legs are frequent
  * items (anti-monotonicity), so one cheap item-count pass bounds the
  * pair stage to the frequent vocabulary — domain-bounded (it cannot
  * grow with rows, only with the vocabulary above threshold), hence
  * broadcast-able.
  *
  * Plan shape: one token pass for item counts; frequent vocabulary
  * broadcast back (never shuffled with payloads); one groupBy(doc)
  * builds the pruned baskets; a narrow flatMap expands pairs (cost
  * Σ C(f_d, 2) over docs, f_d = FREQUENT tokens in doc d — the
  * unpruned Σ C(K_d, 2) never exists); one partial-aggregated pair
  * shuffle finishes. Per-doc cost is still quadratic in f_d, so a
  * pathological basket (a spam page holding the whole frequent
  * vocabulary) is rejected LOUDLY via `maxItemsPerDoc` rather than
  * silently materializing C(f_d, 2) rows — raise `minSupport` or
  * pre-filter such docs; dropping them here would silently change the
  * answer.
  */
object ItemsetOps {

  /** Frequent co-occurring token pairs with support counts and an
    * integer lift score. Tokens are whitespace-split (the corpus
    * convention shared with the oracle SQL), de-duplicated per doc
    * (set semantics — support counts DOCUMENTS, not occurrences).
    * Output: (t1, t2, pair_docs, t1_docs, t2_docs, lift_e4) with
    * t1 < t2 binary order; lift_e4 = n_docs·pair_docs·10⁴ div
    * (t1_docs·t2_docs).
    */
  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
                    minSupport: Long, maxItemsPerDoc: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val items = docs.select(col(idCol).cast("long").as("doc"),
      explode(array_distinct(split(trim(col(textCol).cast("string")), "\\s+"))).as("t"))
      .where(length(col("t")) > 0)
    val freq = items.groupBy("t").agg(count(lit(1)).as("item_docs"))
      .where(col("item_docs") >= minSupport)
    val kept = items.join(broadcast(freq.select("t")), Seq("t"))
    val baskets = kept.groupBy("doc")
      .agg(sort_array(collect_set(col("t"))).as("ts"))
    val pairs = baskets.select(col("ts")).as[Seq[String]].mapPartitions { it =>
      it.flatMap { ts =>
        val arr = ts.toArray
        require(arr.length <= maxItemsPerDoc,
          s"basket of ${arr.length} frequent items exceeds maxItemsPerDoc=" +
            s"$maxItemsPerDoc (C(n,2) pair blowup) — raise minSupport or pre-filter")
        for {
          i <- arr.indices.iterator
          j <- (i + 1 until arr.length).iterator
        } yield (arr(i), arr(j))
      }
    }.toDF("t1", "t2")
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    pairs.groupBy("t1", "t2").agg(count(lit(1)).as("pair_docs"))
      .where(col("pair_docs") >= minSupport)
      .join(broadcast(freq.select(col("t").as("t1"), col("item_docs").as("t1_docs"))), "t1")
      .join(broadcast(freq.select(col("t").as("t2"), col("item_docs").as("t2_docs"))), "t2")
      .crossJoin(broadcast(nDocs))
      .select(col("t1"), col("t2"), col("pair_docs"), col("t1_docs"),
        col("t2_docs"),
        expr("(n_docs * pair_docs * 10000) div (t1_docs * t2_docs)").as("lift_e4"))
  }
}
