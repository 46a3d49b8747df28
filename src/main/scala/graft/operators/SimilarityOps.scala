package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * Execution shapes (designed for a big corpus, small-to-medium query set):
  *  - Brute force: broadcast the query vectors, stream the corpus once —
  *    one pass, no shuffle of the corpus, per-partition top-k via a window
  *    after a cheap repartition of the (query, candidate, sim) triples.
  *  - IVF: corpus is pre-assigned to the nearest of `nlist` centroids
  *    (one broadcast-join pass); a query probes only `nprobe` lists, so the
  *    scan cost drops by ~nlist/nprobe. At 100 TB the assignment would be
  *    written out bucketed by `centroid_id` so probes prune at the source.
  *  - Hyperplane LSH: sign-bit bucket key per vector; candidates share a
  *    bucket. Deterministic planes (seeded), so results are reproducible.
  */
object SimilarityOps {

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * `queries` is expected to be small — it is broadcast explicitly.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(V.cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Deterministic IVF index: centroids = the `nlist` lowest-id vectors
    * (a stand-in for k-means at this scale; the interface is the point).
    * Returns the corpus with a `centroid_id` assignment column.
    */
  def ivfAssign(corpus: DataFrame, nlist: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = broadcast(
      corpus.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("d2").asc, col("centroid_id").asc)
    corpus
      .join(centroids)
      .withColumn("d2", V.sqDist(col(vecCol), col("centroid_vec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn", "d2", "centroid_vec")
  }

  /** IVF top-k: probe the `nprobe` nearest centroid lists per query, then
    * exact cosine within the probed lists.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(corpus, nlist, idCol, vecCol)
    val centroids = broadcast(
      corpus.orderBy(col(idCol)).limit(nlist)
        .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec")))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("qd2").asc, col("centroid_id").asc)
    val probes = q.join(centroids)
      .withColumn("qd2", V.sqDist(col("qv"), col("centroid_vec")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))

    val cand = assigned
      .select(col("centroid_id"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(probes), Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(V.cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (seeded). Small:
    * nbits × dim doubles, inlined into the plan as a literal.
    */
  def hyperplanes(nbits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nbits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Near-duplicate embedding pairs via random-hyperplane LSH buckets,
    * verified with exact cosine.
    */
  def embeddingNearDups(corpus: DataFrame, minCosine: Double = 0.95,
                        nbits: Int = 16, dim: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = typedLit(hyperplanes(nbits, dim))
    val keyed = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      V.hyperplaneKey(col(vecCol), planes).as("bucket"))
    val a = keyed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = keyed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", round(V.cosine(col("v_a"), col("v_b")), 4))
      .where(col("sim") >= minCosine)
      .select("id_a", "id_b", "sim")
  }
}
