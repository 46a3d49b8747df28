package graft

import graft.sources.BloomLayout
import org.apache.spark.sql.functions._

/** Parquet column bloom filters (q272's layout arm): the footer
  * contract, the skip behavior both ways, and layout-invariance of
  * results — measured on real written files, not simulated cells.
  */
class BloomLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Rows the SCAN decoded (post row-group skipping, pre Spark-side
    * Filter) for an equality probe on `k`.
    */
  private def scanRows(dir: String, keyCol: String, key: Long): Long = {
    val q = spark.read.parquet(dir).where(col(keyCol) === key)
    q.collect()
    q.queryExecution.executedPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("absent-key probes decode ZERO rows through blooms; a full row group without") {
    val dir = graft.queries.Fixtures.scratchIndexDir("bloom-spec")
    // sparse keys (every 4th value) so absent keys sit INSIDE every row
    // group's [min, max] — the exact regime stats cannot prune
    val df = spark.range(200000L).select((col("id") * 4).as("k"), (col("id") % 97).as("v"))
      .coalesce(1)
    BloomLayout.writeWithBloom(df, s"$dir/bloom", "k",
      expectedNdv = 200000L, rowGroupBytes = 256L * 1024)
    BloomLayout.writePlain(df, s"$dir/plain", "k", rowGroupBytes = 256L * 1024)
    val groups = BloomLayout.bloomPresence(spark, s"$dir/bloom", "k")
    assert(groups.size > 5, s"fixture must span several row groups, got ${groups.size}")
    assert(groups.forall(identity), "every row group must carry the key's bloom filter")
    assert(BloomLayout.bloomPresence(spark, s"$dir/plain", "k").forall(!_),
      "the control twin must carry none")
    // absent but in-range key: bloom skips every group; stats keep one
    val absent = 2L
    assert(scanRows(s"$dir/bloom", "k", absent) == 0L,
      "blooms must skip every row group for an absent key")
    val plainDecoded = scanRows(s"$dir/plain", "k", absent)
    assert(plainDecoded >= 10000L,
      s"without blooms the min/max survivor group decodes whole, got $plainDecoded")
    // present key: both layouts decode its group and agree on the rows
    val present = 400L
    assert(scanRows(s"$dir/bloom", "k", present) > 0L)
    val a = spark.read.parquet(s"$dir/bloom").where(col("k") === present).collect().toSeq
    val b = spark.read.parquet(s"$dir/plain").where(col("k") === present).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("the q272 fixture: blooms on the key column only; lookups are layout-invariant; filters push down") {
    val (bloomLi, plainLi) = graft.queries.Fixtures.bloomTables(spark, sf)
    // probe a real key through both layouts and the source table
    val key = Tables.lineitem(spark, sf).agg(min("l_orderkey")).collect()(0).getLong(0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.where(col("l_orderkey") === key)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .collect().map(_.toSeq).toSet
    val viaBloom = rows(bloomLi)
    assert(viaBloom == rows(plainLi) && viaBloom == rows(Tables.lineitem(spark, sf)),
      "point lookups must be layout-invariant")
    assert(viaBloom.nonEmpty)
    // the equality literal must reach the scan, or the bloom never fires
    val p = bloomLi.where(col("l_orderkey") === key).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains(s"EqualTo(l_orderkey,$key)"),
      s"the probe literal must be a PushedFilter:\n$p")
    // an absent key inside the fixture's range decodes nothing
    val keys = Tables.lineitem(spark, sf).select("l_orderkey").distinct()
      .collect().map(_.getLong(0)).sorted
    val absent = (keys.head to keys.last).find(k => !keys.contains(k))
    absent.foreach { k =>
      val (bloomDirDf, _) = graft.queries.Fixtures.bloomTables(spark, sf)
      val decoded = {
        val q = bloomDirDf.where(col("l_orderkey") === k)
        q.collect()
        q.queryExecution.executedPlan
          .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
          .map(_.metrics("numOutputRows").value).sum
      }
      assert(decoded == 0L, s"absent orderkey $k must decode 0 rows, got $decoded")
    }
    assert(absent.nonEmpty, "TPC-H orderkeys are sparse; the fixture must contain a gap")
  }
}
