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

  test("duplicatedSpanDedup laws on random low-vocabulary corpora") {
    // tiny vocabulary forces heavy accidental window sharing — the
    // adversarial case for canonical selection and overlap merging
    val vocab = Vector("x", "y", "z")
    for (round <- 1 to 3) {
      val docs = (1 to 15).map { i =>
        (i.toLong, Seq.fill(6 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val byId = docs.toMap
      val out = DedupOps.duplicatedSpanDedup(docs.toDF("id", "text"), "id", "text", 4)
        .as[(Long, Long, Long, String)].collect()
      assert(out.length == docs.length)
      // naive reference: mark every non-canonical occurrence's positions
      val occ = docs.flatMap { case (id, text) =>
        val toks = text.split(" ")
        (0 to toks.length - 4).map(p => (toks.slice(p, p + 4).mkString(" "), id, p))
      }
      val canon = occ.groupBy(_._1).map { case (wtext, os) =>
        wtext -> (os.map(o => (o._2, o._3)).min, os.size)
      }
      val rmByDoc = occ.filter { case (w, id, p) =>
        canon(w)._2 > 1 && canon(w)._1 != ((id, p))
      }.flatMap { case (_, id, p) => (p until p + 4).map(id -> _) }
        .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
      out.foreach { case (id, nTok, nRm, clean) =>
        val toks = byId(id).split(" ")
        val rm = rmByDoc.getOrElse(id, Set.empty)
        assert(nTok == toks.length && nRm == rm.size, s"round $round doc $id counts")
        val expect = toks.indices.filterNot(rm).map(toks).mkString(" ")
        assert(clean == expect, s"round $round doc $id rewrite")
      }
    }
  }

  test("contentDefinedChunks laws: chunks tile, are deterministic, and resync") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    for (round <- 1 to 3) {
      val docs = (1 to 12).map { i =>
        (i.toLong, Seq.fill(10 + rng.nextInt(60))(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val out = DedupOps.contentDefinedChunks(docs.toDF("id", "text"), "id", "text")
        .as[(Long, Long, Long, Long, String)].collect()
      val byDoc = out.groupBy(_._1)
      docs.foreach { case (id, text) =>
        val rows = byDoc(id).sortBy(_._2)
        // tiling: contiguous, covers [0, len), indexes 1..n
        assert(rows.head._3 == 0L && rows.map(_._2).toSeq == (1L to rows.length))
        rows.sliding(2).foreach {
          case Array(a, b) => assert(a._3 + a._4 == b._3, s"doc $id gap"); case _ =>
        }
        assert(rows.last._3 + rows.last._4 == text.length.toLong, s"doc $id end")
        // every boundary is content-defined: the same text re-chunks identically
        // (covered by re-running on a repartitioned copy below)
      }
      val again = DedupOps.contentDefinedChunks(
        docs.toDF("id", "text").repartition(5), "id", "text")
        .as[(Long, Long, Long, Long, String)].collect()
      assert(again.sortBy(r => (r._1, r._2)).toSeq == out.sortBy(r => (r._1, r._2)).toSeq)
    }
  }
}
