package graft

import graft.functions.ZOrder
import graft.operators.LayoutOps
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  // the Morton kernel itself (ZOrder.zValue) is hand-checked in
  // ZOrderSpec; here: bijectivity over a full grid, which the
  // file-assignment story relies on (distinct cells → distinct files)
  test("zValue is bijective cell → file over the full grid") {
    val cells = (0 until 8).flatMap(a => (0 until 8).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val keys = cells
      .select(ZOrder.zValue(col("a"), col("b"), 3).as("z"))
      .collect().map(_.getLong(0))
    assert(keys.toSet == (0L until 64L).toSet)
  }

  test("z-ordered files skip a 2-D box the single-column sort cannot") {
    // 32x32 uniform grid, 4-bit cells = the raw coords' low bits scaled:
    // quantize to 16 cells per dim (cell = v div 2)
    val rows = (0 until 32).flatMap(a => (0 until 32).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
      .withColumn("ca", expr("a div 2")).withColumn("cb", expr("b div 2"))
    val z = rows.withColumn("file_id", ZOrder.zValue(col("ca"), col("cb"), 4))
    val lin = rows.withColumn("file_id", expr("a * 8")) // 256 files by a only
    def scanned(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val audit = LayoutOps.skippingAudit(
        LayoutOps.fileStats(df, col("file_id"), "a", "b"),
        lit(8L), lit(15L), lit(8L), lit(15L)).collect().head
      (audit.getLong(1), audit.getLong(2))
    }
    val selected = rows.where(col("a").between(8, 15) && col("b").between(8, 15)).count()
    val (zHit, zScan) = scanned(z)
    val (_, linScan) = scanned(lin)
    // pruning is conservative: never scans fewer rows than match
    assert(zScan >= selected && linScan >= selected)
    // z-order prunes both dimensions; the linear layout pays the full
    // b-range inside every a-matching file
    assert(zScan == selected, s"aligned box should prune exactly: $zScan vs $selected")
    assert(linScan == selected * 4, s"linear layout scans the whole b range: $linScan")
    assert(zHit == 16L)
  }

  test("compactionBins: hand-computed next-fit-decreasing plan, size bound") {
    // one group: sizes 9,7,5,3,1 target 10 →
    // csum 9,16,21,24,25; bin = (csum-sz) div 10 = 0,0,1,2,2
    val files = Seq(("g", 1L, 9L), ("g", 2L, 7L), ("g", 3L, 5L),
      ("g", 4L, 3L), ("g", 5L, 1L)).toDF("grp", "id", "sz0")
    val bins = LayoutOps.compactionBins(files, "grp", "id", "sz0", target = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(bins.toSeq == Seq((0L, 2L, 16L), (1L, 1L, 5L), (2L, 2L, 4L)))
    // stripe guarantee on a bigger deterministic manifest: every closed
    // bin's bytes sit within one file size of the target on either side
    val many = (1 to 200).map(i => ("h", i.toLong, (i % 13 + 1).toLong))
      .toDF("grp", "id", "sz0")
    val hb = LayoutOps.compactionBins(many, "grp", "id", "sz0", target = 40L)
      .orderBy("bin_id")
      .collect().map(r => (r.getLong(2), r.getLong(3))) // (n_files, bin_bytes)
    val maxSz = 13L
    assert(hb.dropRight(1).forall { case (_, bytes) =>
        bytes > 40L - maxSz && bytes < 40L + maxSz },
      s"closed bins must sit within one file of target: ${hb.toSeq}")
    // plan conserves bytes and files
    assert(hb.map(_._2).sum == (1 to 200).map(i => (i % 13 + 1).toLong).sum)
    assert(hb.map(_._1).sum == 200L)
  }

  test("fileStats: one row per file with exact envelopes") {
    val rows = Seq((0L, 5L, 50L), (0L, 9L, 10L), (1L, 2L, 7L))
      .toDF("f", "a", "b")
    val st = LayoutOps.fileStats(rows, col("f"), "a", "b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(st(0L) == ((2L, 5L, 9L, 10L, 50L)))
    assert(st(1L) == ((1L, 2L, 2L, 7L, 7L)))
  }
}
