package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis operators over (src, dst) edge lists — the
  * page-quality signal a web-corpus curation pipeline ranks by
  * (Page et al. 1999; used as a pretraining quality prior).
  *
  * Ranks are INTEGER fixed-point (scaled by `scale`): every per-edge
  * contribution is computed with integer division, so iteration results
  * are exactly reproducible in any engine — no floating accumulation,
  * no ordering hazard. The cost is a deterministic rounding-down bias
  * of at most one unit per edge per iteration (documented, not drift:
  * both engines round identically).
  *
  * Scale shape per iteration: one shuffle joins ranks to edges on src
  * (co-keyed with the outdegree join), one partial-aggregated shuffle
  * sums contributions by dst. The node set and N are computed once;
  * N rides along as a 1-row broadcast. A fixed `iters` unrolls into a
  * single Catalyst plan — no per-round actions, no lineage explosion at
  * small depths (for deep iteration counts, checkpoint like
  * [[DedupOps.connectedComponents]] does with its RDD loop).
  *
  * Dangling nodes (no out-edges) leak their damped mass — the classic
  * simplification; both engines leak identically.
  */
object GraphOps {

  /** PageRank with damping 0.85 over `iters` synchronous iterations.
    * Returns (id, rank_fp) where rank_fp is the rank scaled by `scale`
    * (must be divisible by 100 so the teleport term is exact).
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int = 3,
                         scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters must be in [1, 10], got $iters")
    require(scale % 100L == 0L, "scale must be divisible by 100")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nDf = nodes.agg(count(lit(1)).as("n_nodes"))
    val teleport = scale / 100L * 15L
    var rank = nodes.crossJoin(broadcast(nDf))
      .select(col("id"), expr(s"CAST($scale AS BIGINT) div n_nodes").as("r"))
    (1 to iters).foreach { _ =>
      val contribs = e.join(rank.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("id"),
          expr("((r * 85) div 100) div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("csum"))
      rank = nodes.crossJoin(broadcast(nDf))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (expr(s"CAST($teleport AS BIGINT) div n_nodes")
            + coalesce(col("csum"), lit(0L))).as("r"))
    }
    rank.select(col("id"), col("r").as("rank_fp"))
  }
}
