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

  test("mgSummary/mgMerge == brute-force batch reduce on random skewed multisets") {
    import graft.operators.SketchOps
    def bruteReduce(counts: Map[Long, Long], k: Int): Map[Long, Long] = {
      val t = counts.values.toSeq.sorted(Ordering[Long].reverse)
        .drop(k).headOption.getOrElse(0L)
      counts.collect { case (key, c) if c > t => key -> (c - t) }
    }
    for (round <- 1 to 4) {
      val k = 2 + rng.nextInt(8)
      // skewed: key i drawn with weight ~ 1/(i+1)
      val keys = Seq.fill(300 + rng.nextInt(500)) {
        math.floor(math.pow(30, rng.nextDouble()) - 1).toLong
      }
      val df = keys.zipWithIndex.map { case (key, i) => (i.toLong, key) }.toDF("id", "k")
      val exact = keys.groupBy(identity).map { case (key, v) => key -> v.size.toLong }
      val got = SketchOps.mgSummary(df.select("k"), "k", k)
        .as[(Long, Long)].collect().toMap
      assert(got == bruteReduce(exact, k), s"round $round k=$k: summary != brute force")
      // merge law vs brute force: reduce(sum of reduced shard states)
      val (ea, eb) = (
        keys.zipWithIndex.collect { case (key, i) if i % 2 == 0 => key }
          .groupBy(identity).map { case (key, v) => key -> v.size.toLong },
        keys.zipWithIndex.collect { case (key, i) if i % 2 == 1 => key }
          .groupBy(identity).map { case (key, v) => key -> v.size.toLong })
      val (ra, rb) = (bruteReduce(ea, k), bruteReduce(eb, k))
      val summed = (ra.keySet ++ rb.keySet)
        .map(key => key -> (ra.getOrElse(key, 0L) + rb.getOrElse(key, 0L))).toMap
      val merged = SketchOps.mgMerge(
        SketchOps.mgSummary(df.where(col("id") % 2 === 0).select("k"), "k", k),
        SketchOps.mgSummary(df.where(col("id") % 2 === 1).select("k"), "k", k),
        "k", k).as[(Long, Long)].collect().toMap
      assert(merged == bruteReduce(summed, k), s"round $round k=$k: merge != brute force")
      // the MG guarantee on the merged state
      val n = keys.size.toLong
      assert(merged.forall { case (key, est) =>
        est <= exact(key) && (exact(key) - est) * (k + 1) <= n })
    }
  }

  test("compactionBins laws on random manifests: conservation, stripe bound, determinism") {
    import graft.operators.LayoutOps
    for (round <- 1 to 4) {
      val target = 50L + rng.nextInt(200)
      val maxSz = 1L + rng.nextInt(80)
      val files = (1 to 150 + rng.nextInt(200)).map { i =>
        (s"g${i % 3}", i.toLong, 1L + rng.nextInt(maxSz.toInt))
      }
      val df = files.toDF("grp", "id", "bytes")
      val bins = LayoutOps.compactionBins(df, "grp", "id", "bytes", target)
        .as[(String, Long, Long, Long)].collect()
      // conservation per group
      val byGrp = files.groupBy(_._1)
      bins.groupBy(_._1).foreach { case (g, rows) =>
        assert(rows.map(_._3).sum == byGrp(g).size.toLong, s"$g: file count drift")
        assert(rows.map(_._4).sum == byGrp(g).map(_._3).sum, s"$g: byte drift")
      }
      // stripe bound: every non-tail bin within one file of target
      bins.groupBy(_._1).foreach { case (g, rows) =>
        val tail = rows.map(_._2).max
        rows.filter(_._2 != tail).foreach { case (_, bin, _, bytes) =>
          assert(bytes > target - maxSz && bytes < target + maxSz,
            s"$g bin $bin: $bytes outside (${target - maxSz}, ${target + maxSz})")
        }
      }
      // determinism under repartition
      val again = LayoutOps.compactionBins(df.repartition(7), "grp", "id", "bytes", target)
        .as[(String, Long, Long, Long)].collect()
      assert(again.sortBy(r => (r._1, r._2)).toSeq == bins.sortBy(r => (r._1, r._2)).toSeq)
    }
  }

  test("skippingAudit is conservative and exact on random layouts and boxes") {
    import graft.operators.LayoutOps
    for (round <- 1 to 4) {
      val pts = (1 to 400).map(i =>
        (i.toLong % 16, rng.nextInt(100).toLong, rng.nextInt(100).toLong))
      val df = pts.toDF("f", "a", "b")
      val (aLo, bLo) = (rng.nextInt(80).toLong, rng.nextInt(80).toLong)
      val (aHi, bHi) = (aLo + rng.nextInt(20), bLo + rng.nextInt(20))
      val audit = LayoutOps.skippingAudit(
        LayoutOps.fileStats(df, col("f"), "a", "b"),
        lit(aLo), lit(aHi), lit(bLo), lit(bHi)).collect().head
      val (filesHit, rowsScanned) = (audit.getLong(1), audit.getLong(2))
      // brute force: which files hold matching rows, how many rows those files hold
      val matching = pts.filter(p => p._2 >= aLo && p._2 <= aHi && p._3 >= bLo && p._3 <= bHi)
      val mustScan = matching.map(_._1).toSet
      val byFile = pts.groupBy(_._1)
      // conservative: every file holding a match is hit; scan covers them
      assert(mustScan.forall(f =>
        rowsScanned >= mustScan.toSeq.map(byFile(_).size).sum), "lost a matching file")
      assert(rowsScanned >= matching.size.toLong)
      // exact under envelope semantics: hit files == files whose envelope intersects
      val expectHit = byFile.count { case (_, rows) =>
        rows.map(_._2).min <= aHi && rows.map(_._2).max >= aLo &&
          rows.map(_._3).min <= bHi && rows.map(_._3).max >= bLo
      }
      assert(filesHit == expectHit.toLong, s"round $round: $filesHit != $expectHit")
    }
  }
}
