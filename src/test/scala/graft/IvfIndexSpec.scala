package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Materialized IVF index: partition pruning + result parity. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vec(seed: Int): Seq[Float] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(dim)(rng.nextFloat() * 2 - 1)
  }
  private val corpus = (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("probes prune index partitions at the source") {
    val path = graft.queries.Fixtures.scratchIndexDir("graft-ivf") + "/index"
    val cents = SimilarityOps.writeIvfIndex(corpus, path, nlist = 8)
    // index layout: one directory per centroid
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("centroid_id=")).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("centroid_id=\\d+")))

    val queries = corpus.where(col("vec_id") < 2)
    val out = SimilarityOps.ivfTopKIndexed(spark, path, cents, queries, k = 3, nprobe = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"probe scan should carry partition filters:\n$plan")

    // parity with the in-memory IVF path at identical parameters
    val mem = SimilarityOps.ivfTopK(corpus, queries, k = 3, nlist = 8, nprobe = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(out.collect().map(_.toString).sorted.toSeq == mem)
  }

  test("trained-centroid index (q249's production path): assignment parity + pruning") {
    val path = graft.queries.Fixtures.scratchIndexDir("graft-ivf-tr") + "/index"
    val cents = SimilarityOps.trainCentroids(corpus, k = 8, iters = 2)
    assert(cents.map(_._1) == (0L until 8L), "centroid ids are the cluster indices")
    SimilarityOps.writeIvfIndexWith(corpus, path, cents)
    // every corpus row lands in exactly the list assignTo picks
    val idx = spark.read.parquet(path)
      .select(col("neighbor_id"), col("centroid_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    val expect = corpus.select(col("vec_id"),
        SimilarityOps.assignTo(col("embedding"), cents))
      .as[(Long, Long)].collect().toSet
    assert(idx == expect, s"index lists != trained assignment")
    val out = SimilarityOps.ivfTopKIndexed(spark, path, cents,
      corpus.where(col("vec_id") < 2), k = 3, nprobe = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"trained probe scan should carry partition filters:\n$plan")
    assert(out.collect().length == 2 * 3)
  }
}
