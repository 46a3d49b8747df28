package graft

import graft.operators.{DedupOps, JoinOps, PercentileOps}
import org.apache.spark.sql.functions._

/** Seeded randomized law checks for the operators whose correctness
  * rests on nontrivial bounds (prefix filtering, rank arithmetic,
  * as-of matching) — each compared against an independent brute-force
  * formulation on adversarial random inputs (scalatestplus isn't
  * resolvable offline, so seeded rounds instead of forAll).
  */
class FuzzLawsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(1234)

  test("prefixFilterJoin == brute force on random low-vocabulary corpora") {
    // tiny vocabulary maximizes shared shingles — the prefix filter's
    // adversarial case (where a wrong bound would drop pairs)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (round <- 1 to 3) {
      val docs = (1 to 25).map { i =>
        (i.toLong, Seq.fill(4 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("id", "text")
      val got = DedupOps.prefixFilterJoin(df, "id", "text", minJaccard = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val hs = DedupOps.hashedShingleRowsPortable(df, "id", "text", 3)
        .as[(Long, Array[Long])].collect().toMap
      val expected = (for {
        a <- hs.keys; b <- hs.keys
        if a < b && hs(a).nonEmpty && hs(b).nonEmpty
        inter = hs(a).toSet.intersect(hs(b).toSet).size
        union = hs(a).toSet.union(hs(b).toSet).size
        if inter.toDouble / union >= 0.5
      } yield (a, b)).toSet
      assert(got == expected, s"round $round: got ${got.size}, expected ${expected.size}")
      graft.GraftCache.releaseAll(spark)
    }
  }

  test("ntileExact == Spark ntile on random data and random k") {
    import org.apache.spark.sql.expressions.Window
    for (round <- 1 to 3) {
      val n = 50 + rng.nextInt(300)
      val k = 1 + rng.nextInt(20)
      val df = (1 to n).map(i => (i.toLong, rng.nextInt(12).toLong)).toDF("id", "v")
      val mine = PercentileOps.ntileExact(df, "v", "id", k)
        .select("id", "bin").as[(Long, Long)].collect().toMap
      val ref = df.select(col("id"),
          ntile(k).over(Window.orderBy("v", "id")).cast("long").as("bin"))
        .as[(Long, Long)].collect().toMap
      assert(mine == ref, s"round $round (n=$n, k=$k)")
    }
  }

  test("asofJoin == per-row naive latest-at-or-before on random event sets") {
    for (round <- 1 to 3) {
      val left = (1 to 60).map(i =>
        (i.toLong, rng.nextInt(5).toLong, rng.nextInt(50).toLong))
      val right = (1 to 40).map(i =>
        (rng.nextInt(5).toLong, rng.nextInt(50).toLong, (100 + i).toLong))
        // collapse ties like the q110 discipline: max value per (key, ts)
        .groupBy(t => (t._1, t._2)).map { case ((k, ts), vs) => (k, ts, vs.map(_._3).max) }
        .toSeq
      val out = JoinOps.asofJoin(
        left.toDF("lid", "k", "ts"), right.toDF("k", "ts", "v"), "k", "ts", "v")
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val naive = left.map { case (lid, k, ts) =>
        val cands = right.filter(r => r._1 == k && r._2 <= ts)
        lid -> (if (cands.isEmpty) None else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(out == naive, s"round $round")
    }
  }
}
