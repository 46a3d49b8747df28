package graft

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** The SQL front door (graft.sources.v2.SnapshotCatalog): named
  * resolution, the full CREATE/INSERT/SELECT lifecycle in pure SQL,
  * VERSION AS OF and TIMESTAMP AS OF through the catalog's loadTable
  * overloads, INSERT OVERWRITE, namespace operations, and every loud
  * edge (unknown table, missing statsCol, ALTER/RENAME, PARTITIONED
  * BY). The catalog holds no state beyond the warehouse dir — the
  * manifests stay the single source of truth, so the Scala API and SQL
  * views of one table must always agree.
  */
class SnapshotCatalogSpec extends SparkSpec {

  private def uniq(prefix: String): String =
    s"${prefix}_${java.util.UUID.randomUUID().toString.replace('-', '_').take(8)}"

  private def warehouse: String = graft.queries.Fixtures.graftCatalog(spark)

  test("CREATE TABLE + INSERT INTO + named SELECT: the whole lifecycle in SQL") {
    warehouse
    val ns = uniq("ns")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    spark.sql(s"""CREATE TABLE graft.$ns.t (k BIGINT, v BIGINT)
                 |USING `graft-snapshot`
                 |TBLPROPERTIES ('statsCol' = 'k')""".stripMargin)
    spark.sql(s"INSERT INTO graft.$ns.t SELECT id, id % 7 FROM range(100)")
    spark.sql(s"INSERT INTO graft.$ns.t SELECT id + 100, 0 FROM range(50)")
    assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t").head().getLong(0) == 150)
    // SQL and the Scala API read the SAME table: one truth
    val root = s"$warehouse/$ns/t"
    assert(SnapshotTable.read(spark, root).count() == 150)
    assert(SnapshotTable.latestVersion(
      new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(root)) == 3,
      "CREATE commits v1 (empty), each INSERT one append version")
    // predicates through SQL still reach the envelope pruning path
    assert(spark.sql(s"SELECT sum(k) FROM graft.$ns.t WHERE k BETWEEN 10 AND 19")
      .head().getLong(0) == (10L to 19L).sum)
    assert(spark.sql(s"SHOW TABLES IN graft.$ns").collect()
      .map(_.getString(1)).contains("t"))
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve through the catalog") {
    warehouse
    val ns = uniq("ns")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    spark.sql(s"""CREATE TABLE graft.$ns.t (k BIGINT, v BIGINT)
                 |USING `graft-snapshot`
                 |TBLPROPERTIES ('statsCol' = 'k')""".stripMargin)
    spark.sql(s"INSERT INTO graft.$ns.t SELECT id, 1 FROM range(40)")   // v2
    spark.sql(s"INSERT INTO graft.$ns.t SELECT id + 40, 2 FROM range(10)") // v3
    assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t VERSION AS OF 2")
      .head().getLong(0) == 40)
    assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t VERSION AS OF 1")
      .head().getLong(0) == 0, "v1 is the empty bootstrap")
    // TIMESTAMP AS OF: pin the stamps (v × 1e6 ms) and travel by clock;
    // 2.5e6 ms = 1970-01-01 00:41:40 UTC — between v2 and v3
    graft.queries.Fixtures.pinManifestStamps(spark, s"$warehouse/$ns/t")
    assert(spark.sql(
      s"SELECT count(*) FROM graft.$ns.t TIMESTAMP AS OF '1970-01-01 00:41:40'")
      .head().getLong(0) == 40)
    // below the earliest stamp: loud, naming the boundary
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT count(*) FROM graft.$ns.t TIMESTAMP AS OF '1970-01-01 00:00:01'")
        .collect()
    }
    assert(e.getMessage.contains("earliest retained"),
      s"pre-history travel must name the boundary: ${e.getMessage}")
    // a bogus version string is loud too
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.$ns.t VERSION AS OF 'abc'").collect()
    }
    assert(e2.getMessage.contains("integers"), e2.getMessage)
  }

  test("INSERT OVERWRITE commits a replace version; time travel still sees the old one") {
    warehouse
    val ns = uniq("ns")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    spark.sql(s"""CREATE TABLE graft.$ns.t (k BIGINT, v BIGINT)
                 |USING `graft-snapshot`
                 |TBLPROPERTIES ('statsCol' = 'k')""".stripMargin)
    spark.sql(s"INSERT INTO graft.$ns.t SELECT id, 1 FROM range(100)")
    spark.sql(s"INSERT OVERWRITE graft.$ns.t SELECT id, 9 FROM range(25)")
    assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t").head().getLong(0) == 25)
    assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t VERSION AS OF 2")
      .head().getLong(0) == 100, "snapshot isolation across the overwrite")
    val root = s"$warehouse/$ns/t"
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(SnapshotTable.readManifest(fs, rp, 3).op == "overwrite")
  }

  test("loud edges: unknown table, missing statsCol, PARTITIONED BY, ALTER, RENAME") {
    warehouse
    val ns = uniq("ns")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    val missing = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.$ns.nope").collect()
    }
    assert(missing.getMessage.toLowerCase.contains("table"), missing.getMessage)
    val noStats = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.$ns.t2 (k BIGINT) USING `graft-snapshot`")
    }
    assert(noStats.getMessage.contains("statsCol"), noStats.getMessage)
    val parted = intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft.$ns.t3 (k BIGINT, d STRING)
                   |USING `graft-snapshot` PARTITIONED BY (d)
                   |TBLPROPERTIES ('statsCol' = 'k')""".stripMargin)
    }
    assert(parted.getMessage.contains("PARTITIONED BY"), parted.getMessage)
    spark.sql(s"""CREATE TABLE graft.$ns.t (k BIGINT)
                 |USING `graft-snapshot`
                 |TBLPROPERTIES ('statsCol' = 'k')""".stripMargin)
    val alter = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$ns.t ADD COLUMN extra BIGINT")
    }
    assert(alter.getMessage.contains("appendEvolved"), alter.getMessage)
    val ren = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$ns.t RENAME TO graft.$ns.t9")
    }
    assert(ren.getMessage.contains("identity"), ren.getMessage)
    // duplicate create is loud; DROP TABLE removes it for real
    intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft.$ns.t (k BIGINT)
                   |USING `graft-snapshot`
                   |TBLPROPERTIES ('statsCol' = 'k')""".stripMargin)
    }
    spark.sql(s"DROP TABLE graft.$ns.t")
    assert(!spark.sql(s"SHOW TABLES IN graft.$ns").collect()
      .map(_.getString(1)).contains("t"))
  }

  test("namespaces: create, list, drop semantics over plain directories") {
    warehouse
    val ns = uniq("nsd")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    assert(spark.sql(s"SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains(ns))
    spark.sql(s"""CREATE TABLE graft.$ns.t (k BIGINT)
                 |USING `graft-snapshot`
                 |TBLPROPERTIES ('statsCol' = 'k')""".stripMargin)
    // non-empty namespace refuses a plain drop, cascades on request
    intercept[Exception] { spark.sql(s"DROP NAMESPACE graft.$ns") }
    spark.sql(s"DROP NAMESPACE graft.$ns CASCADE")
    assert(!spark.sql(s"SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains(ns))
  }

  test("MERGE INTO: group-based copy-on-write, untouched files carried verbatim") {
    warehouse
    val ns = uniq("ns")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    // clustered table built at the catalog's path so the SQL name and
    // the Scala API address the same root
    val root = s"$warehouse/$ns/t"
    SnapshotTable.create(spark, root,
      spark.range(1000).select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartitionByRange(8, col("k")), "k")
    val v1 = SnapshotTable.readManifest(
      new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(root), 1)
    assert(v1.files.size >= 6)
    spark.range(100, 140).select(col("id").as("k"), lit(999L).as("v"))
      .unionByName(spark.range(2000, 2010).select(col("id").as("k"), lit(-1L).as("v")))
      .createOrReplaceTempView(s"src_$ns")
    spark.sql(
      s"""MERGE INTO graft.$ns.t t USING src_$ns s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.sql(s"SELECT * FROM graft.$ns.t")
    assert(out.count() == 1010)
    assert(out.where(col("v") === 999L).count() == 40, "matched band updated")
    assert(out.where(col("v") === -1L).count() == 10, "unmatched keys inserted")
    assert(out.where(col("k") === 500L && col("v") === (500L % 7)).count() == 1,
      "rows outside the band untouched")
    // the surgical property: files whose envelopes miss the matched
    // keys are carried VERBATIM into v2 (same path, never rewritten)
    val v2 = SnapshotTable.readManifest(
      new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(root), 2)
    assert(v2.op == "merge")
    val carried = v2.files.map(_.path).toSet intersect v1.files.map(_.path).toSet
    assert(carried.nonEmpty,
      s"runtime group filtering must carry untouched files: v1=${v1.files.size} " +
      s"v2=${v2.files.size} carried=${carried.size}")
    // the feed records the merge at membership granularity
    val ch = SnapshotTable.changes(spark, root, 1, 2)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch == Map("delete" -> 40L, "insert" -> 50L),
      s"40 updated rows retract+insert, 10 new rows insert: $ch")
  }

  test("SQL UPDATE and DELETE ride the same row-level rewrite") {
    warehouse
    val ns = uniq("ns")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    val root = s"$warehouse/$ns/t"
    SnapshotTable.create(spark, root,
      spark.range(400).select(col("id").as("k"), (col("id") % 5).as("v"))
        .repartitionByRange(4, col("k")), "k")
    spark.sql(s"UPDATE graft.$ns.t SET v = 77 WHERE k < 50")
    assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t WHERE v = 77")
      .head().getLong(0) == 50)
    spark.sql(s"DELETE FROM graft.$ns.t WHERE k BETWEEN 100 AND 199")
    assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t").head().getLong(0) == 300)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val rp = new org.apache.hadoop.fs.Path(root)
    assert(SnapshotTable.readManifest(fs, rp, 2).op == "update")
    assert(SnapshotTable.readManifest(fs, rp, 3).op == "delete")
    // both stay time-travelable
    assert(SnapshotTable.read(spark, root, Some(1)).count() == 400)
    assert(SnapshotTable.read(spark, root, Some(2)).count() == 400)
  }

  test("SQL INSERT lands through the executor write path with real envelopes") {
    warehouse
    val ns = uniq("ns")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    spark.sql(s"""CREATE TABLE graft.$ns.t (k BIGINT, b BIGINT)
                 |USING `graft-snapshot`
                 |TBLPROPERTIES ('statsCol' = 'k')""".stripMargin)
    spark.sql(s"INSERT INTO graft.$ns.t SELECT id, id * 3 FROM range(200)")
    val root = s"$warehouse/$ns/t"
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = SnapshotTable.readManifest(fs, rp, 2)
    assert(m.files.nonEmpty)
    m.files.foreach { f =>
      assert(f.minKey >= 0 && f.maxKey <= 199, s"primary envelope: $f")
      assert(f.colStats.get("b").exists { case (lo, hi) =>
        lo == f.minKey * 3 && hi == f.maxKey * 3
      }, s"secondary envelope must ride the SQL write too: $f")
    }
  }
}
