package graft.queries

import graft.Tables
import graft.operators.ParsePipeline.PageHtml
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixtures for the per-family query modules: deterministic
  * synthetic-input builders (mirrored literally in the oracle SQL) and the
  * DuckDB SQL fragments shared by multiple oracle entries. Moved verbatim
  * from the pre-split SparkEntry.scala — entry/oracle text is unchanged.
  */
object Fixtures {


  private[graft] def did = col("doc_id")
  private[graft] def sid = col("doc_id").cast("string")

  /** One materialized IVF index per sf dir per JVM (q58): the index is
    * corpus state — building it inside every query run would charge the
    * one-time build cost to every probe measurement.
    */
  private[graft] val ivfIndexCache =
    scala.collection.mutable.Map.empty[String, (String, Seq[(Long, Seq[Double])])]

  /** q249's twin of [[ivfIndexCache]] for the TRAINED-centroid index
    * (the writeIvfIndexWith(…, trainCentroids(…)) production path).
    */
  private[graft] val trainedIvfIndexCache =
    scala.collection.mutable.Map.empty[String, (String, Seq[(Long, Seq[Double])])]

  /** Temp directory for a per-JVM materialized index (q58/q249),
    * recursively deleted on JVM exit so Verify/Bench runs leave no
    * `graft-ivf-*` residue in /tmp. The index caches above hold these
    * for the JVM's whole lifetime by design (corpus state, built once),
    * so a shutdown hook — not eager deletion — is the correct scope.
    */
  private[graft] def scratchIndexDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }

  /** Per-JVM bucketed lineitem/orders tables for q253/q254 (corpus
    * state, like the IVF indexes above): both sides hash-bucketed on
    * their join key into the same bucket count, so every subsequent
    * orderkey join is exchange-free and orderkey equality predicates
    * prune buckets at the scan. Registered in the session catalog once
    * per sf dir (idempotent via tableExists); data lives under a
    * shutdown-deleted scratch dir, never the warehouse.
    */
  private[graft] def bucketedTables(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val (liTable, ordTable) = bucketedTableNames(d)
    // Bucket count from the measured sizing law (BucketedLayout.
    // sizeBuckets), derived at most once per corpus (lazy + by-name
    // ensureBucketed param: the count job runs only when a build
    // actually happens) from the fact side's row count (parquet count =
    // footer metadata only) — both tables share the fact's count so the
    // join stays co-bucketed. Floored at 8: the contract corpora are
    // tiny (sf0.001-0.1) and a multi-bucket layout IS the point of the
    // q253/q254 demonstrations; at sf0.1 the helper's own dust floor
    // answers 8 anyway, and at real scale the helper governs (64+ at
    // 30x - see SCALING.md).
    lazy val buckets = math.max(8, graft.sources.BucketedLayout.sizeBuckets(
      Tables.lineitem(s, d).count(), s.sparkContext.defaultParallelism))
    val li = graft.sources.BucketedLayout.ensureBucketed(
      s, liTable, buckets, "l_orderkey", "l_orderkey") {
      (scratchIndexDir("graft-bkt-li"),
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity",
          "l_extendedprice", "l_discount"))
    }
    val ord = graft.sources.BucketedLayout.ensureBucketed(
      s, ordTable, buckets, "o_orderkey", "o_orderkey") {
      (scratchIndexDir("graft-bkt-ord"),
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority"))
    }
    (li, ord)
  }

  /** Catalog names for the per-corpus bucketed tables: sanitized path +
    * hash of the RAW path — sanitation alone can collide ("/x/sf0.1" vs
    * "/x/sf0_1" both sanitize to x_sf0_1), and a collision would
    * silently serve the first corpus's buckets to the second via the
    * tableExists short-circuit.
    */
  private def bucketedTableNames(d: String): (String, String) = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_").toLowerCase +
      "_" + java.lang.Integer.toHexString(d.hashCode)
    (s"graft_bkt_lineitem_$tag", s"graft_bkt_orders_$tag")
  }

  /** Per-JVM bloom-filtered lineitem layout for q272 (corpus state,
    * like [[bucketedTables]]): one write with a split-block bloom on
    * l_orderkey in every row group (dictionary off for the key — the
    * high-cardinality regime blooms exist for), plus the stats-only
    * control twin BloomLayoutSpec measures against. Row groups shrunk
    * to 256 KiB so even sf0.001 has several groups to skip; built once
    * per corpus dir (ConcurrentHashMap computeIfAbsent), files under
    * shutdown-deleted scratch dirs.
    */
  private val bloomDirs = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private[graft] def bloomTables(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val (bloomDir, plainDir) = bloomDirs.computeIfAbsent(d, _ => {
      val bd = scratchIndexDir("graft-bloomli")
      val pd = scratchIndexDir("graft-plainli")
      val df = Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      // NDV hint = distinct keys PER ROW GROUP, not per table (the
      // saturation trap in BloomLayout's scaladoc): 256 KiB groups hold
      // ~10-16k 3-column rows, so 32k covers every group with 2× margin
      // while keeping the filters group-sized
      graft.sources.BloomLayout.writeWithBloom(
        df.coalesce(1), bd, "l_orderkey", expectedNdv = 32768L,
        rowGroupBytes = 256L * 1024)
      graft.sources.BloomLayout.writePlain(
        df.coalesce(1), pd, "l_orderkey", rowGroupBytes = 256L * 1024)
      (bd, pd)
    })
    (s.read.parquet(bloomDir), s.read.parquet(plainDir))
  }

  /** Per-JVM versioned snapshot table for q273/q274/q275 (corpus
    * state, like [[bloomTables]]): a deterministic 5-commit history
    * over lineitem through [[graft.sources.SnapshotTable]] —
    * v1 create (orderkey%4==0), v2 append (%4==1), v3 append (%4 in
    * 2,3 — the table now holds ALL of lineitem), v4 copy-on-write
    * deleteWhere(orderkey in [max/5, 3·max/10]), v5 compact,
    * v6 cluster (range-repartition + in-file sort on the key). Each
    * commit writes range-partitioned files on the stats column so the
    * delete's file-envelope pruning has files to carry. The commit
    * CHAIN is deterministic (predicates over table columns; the
    * delete range derives from max(l_orderkey)), so every oracle
    * states the expected content in closed form even though file
    * names/boundaries are layout-free.
    */
  private val snapshotRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def snapshotTable(s: SparkSession, d: String): String = {
    snapshotRoots.computeIfAbsent(d, _ => {
      val root = scratchIndexDir("graft-snap")
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      def commitSlice(p: Column) =
        li.where(p).repartitionByRange(4, col("l_orderkey"))
      graft.sources.SnapshotTable.create(
        s, root, commitSlice(col("l_orderkey") % 4 === 0), "l_orderkey")
      graft.sources.SnapshotTable.append(
        s, root, commitSlice(col("l_orderkey") % 4 === 1))
      graft.sources.SnapshotTable.append(
        s, root, commitSlice(col("l_orderkey") % 4 >= 2))
      val (lo, hi) = snapshotDeleteRange(s, d)
      graft.sources.SnapshotTable.deleteWhere(s, root, lo, hi)
      graft.sources.SnapshotTable.compact(s, root)
      // target = tableBytes/8 so the re-cluster yields ~8 range files
      // at EVERY sf — q277's envelope pruning needs files to skip
      // (PlanAuditSpec pins the strict subset), and a fixed byte
      // target either under-splits sf0.001 or shatters sf0.1
      val rp = new org.apache.hadoop.fs.Path(root)
      val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val tip = graft.sources.SnapshotTable.readManifest(fs, rp,
        graft.sources.SnapshotTable.latestVersion(fs, rp))
      graft.sources.SnapshotTable.cluster(s, root,
        targetBytes = math.max(1L, tip.files.map(_.bytes).sum / 8))
      root
    })
  }

  /** The v4 delete range, derived from data so it is identical in the
    * oracle: [max/5, 3·max/10] (integer division, non-negative keys).
    */
  private[graft] def snapshotDeleteRange(s: SparkSession, d: String): (Long, Long) = {
    val mx = Tables.lineitem(s, d).agg(max("l_orderkey")).head().getLong(0)
    (mx / 5, 3 * mx / 10)
  }

  /** Per-JVM MERGE-demo snapshot table for q279 (separate root from
    * [[snapshotTable]] so the 5-commit fixture's versions stay
    * stable): v1 = orders range-clustered on o_orderkey; v2 = ONE
    * merge whose batch mixes updates (keys in [max/2, 6·max/10] with
    * doubled price — replaced in place, count unchanged) and inserts
    * (keys shifted by +max for o_orderkey%100==3 — genuinely new).
    * The batch's stats range [max/2, 2·max] leaves the low-key files
    * carried, so the merge exercises envelope pruning too.
    */
  private val mergeRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def mergeSnapshotTable(s: SparkSession, d: String): String = {
    mergeRoots.computeIfAbsent(d, _ => {
      val root = scratchIndexDir("graft-snapmerge")
      val ord = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      graft.sources.SnapshotTable.create(s, root,
        ord.repartitionByRange(8, col("o_orderkey")), "o_orderkey")
      val mx = Tables.orders(s, d).agg(max("o_orderkey")).head().getLong(0)
      val updates = ord
        .where(col("o_orderkey").between(mx / 2, 6 * mx / 10))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val inserts = ord.where(col("o_orderkey") % 100 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + mx)
      graft.sources.SnapshotTable.merge(s, root,
        updates.unionByName(inserts), Seq("o_orderkey"))
      root
    })
  }

  /** Per-JVM MERGE×EVOLUTION snapshot table for q280 (separate root
    * from [[mergeSnapshotTable]] so q279's two-version history stays
    * stable): v1 = orders range-clustered on o_orderkey; v2 = ONE
    * merge whose batch both upserts (the q279 update band + inserts)
    * AND widens the schema with `o_band` (= key % 5) — the
    * upsert-and-evolve composition the two paths previously rejected.
    * Deterministic like its siblings: every value derives from orders
    * columns and max(o_orderkey), so the oracle restates the merged
    * state in closed form.
    */
  private val mergeEvolveRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def mergeEvolveSnapshotTable(s: SparkSession, d: String): String = {
    mergeEvolveRoots.computeIfAbsent(d, _ => {
      val root = scratchIndexDir("graft-snapevolve")
      val ord = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      graft.sources.SnapshotTable.create(s, root,
        ord.repartitionByRange(8, col("o_orderkey")), "o_orderkey")
      val mx = Tables.orders(s, d).agg(max("o_orderkey")).head().getLong(0)
      val updates = ord
        .where(col("o_orderkey").between(mx / 2, 6 * mx / 10))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val inserts = ord.where(col("o_orderkey") % 100 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + mx)
      graft.sources.SnapshotTable.merge(s, root,
        updates.unionByName(inserts)
          .withColumn("o_band", col("o_orderkey") % 5),
        Seq("o_orderkey"))
      root
    })
  }

  /** Per-JVM RETENTION-demo snapshot table for q285 (separate root so
    * the sibling fixtures' full histories stay stable): v1 = create
    * (l_orderkey%4<=1), v2 = append (the rest — table is all of
    * lineitem), v3 = copy-on-write delete of [max/5, 3·max/10], v4 =
    * compact; then `expire(keepLast=2)` drops v1/v2 and `vacuum`
    * reclaims the files only they referenced. Deterministic end state:
    * retained versions are exactly {3, 4}, both holding lineitem minus
    * the deleted range — so the oracle states the post-retention table
    * in closed form, and the hash match certifies vacuum reclaimed NO
    * live file.
    */
  private val expireRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def expireSnapshotTable(s: SparkSession, d: String): String = {
    expireRoots.computeIfAbsent(d, _ => {
      val root = scratchIndexDir("graft-snapexpire")
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      def commitSlice(p: Column) =
        li.where(p).repartitionByRange(4, col("l_orderkey"))
      graft.sources.SnapshotTable.create(
        s, root, commitSlice(col("l_orderkey") % 4 <= 1), "l_orderkey")
      graft.sources.SnapshotTable.append(
        s, root, commitSlice(col("l_orderkey") % 4 >= 2))
      val (lo, hi) = snapshotDeleteRange(s, d)
      graft.sources.SnapshotTable.deleteWhere(s, root, lo, hi)
      graft.sources.SnapshotTable.compact(s, root)
      graft.sources.SnapshotTable.expire(s, root, keepLast = 2)
      graft.sources.SnapshotTable.vacuum(s, root)
      root
    })
  }

  /** Per-JVM DSv2-WRITE-demo snapshot table for q289: v1 = create
    * (o_orderkey%3==0, the one-time bootstrap that declares the stats
    * column), v2 = the REST of orders appended through
    * `df.write.format("graft-snapshot").mode("append")` — executor
    * tasks writing parquet with on-the-fly stats envelopes, the
    * driver committing through the optimistic manifest protocol. The
    * tip is exactly all of orders, so the oracle states it directly —
    * the hash certifies the whole write path (task files, stats,
    * commit) produced precisely the right table.
    */
  private val dsv2WriteRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def dsv2WriteSnapshotTable(s: SparkSession, d: String): String = {
    dsv2WriteRoots.computeIfAbsent(d, _ => {
      val root = scratchIndexDir("graft-snapdsv2w")
      val ord = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      graft.sources.SnapshotTable.create(s, root,
        ord.where(col("o_orderkey") % 3 === 0)
          .repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      ord.where(col("o_orderkey") % 3 =!= 0)
        .repartitionByRange(4, col("o_orderkey"))
        .write.format("graft-snapshot").option("path", root)
        .mode("append").save()
      root
    })
  }

  /** Per-JVM graft CATALOG registration (q290+): one warehouse scratch
    * dir, the two catalog confs set once — idempotent and
    * value-stable, so the shared test session can call this from any
    * suite without a toggle race (the conf is only ever set to the
    * same values). Returns the warehouse path.
    */
  private val catalogWh = new java.util.concurrent.atomic.AtomicReference[String]()
  private[graft] def graftCatalog(s: SparkSession): String =
    catalogWh.synchronized {
      if (catalogWh.get == null) {
        val wh = scratchIndexDir("graft-cat-wh")
        s.conf.set("spark.sql.catalog.graft", "graft.sources.v2.SnapshotCatalog")
        s.conf.set("spark.sql.catalog.graft.warehouse", wh)
        catalogWh.set(wh)
      }
      catalogWh.get
    }

  /** Per-JVM SQL-front-door snapshot table for q290: created, loaded,
    * and committed ENTIRELY through `spark.sql` against the graft
    * catalog — CREATE NAMESPACE + CREATE TABLE (declaring statsCol as
    * a table property) + two INSERT INTO ... SELECT commits (v2 =
    * o_orderkey%3==0, v3 = the rest), so the tip is exactly orders and
    * v2 is the %3 slice, both stated in closed form by the oracle.
    * Returns the fully-qualified table name.
    */
  private val sqlTableNames = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def sqlSnapshotTable(s: SparkSession, d: String): String = {
    sqlTableNames.computeIfAbsent(d, _ => {
      graftCatalog(s)
      val tag = d.split('/').filter(_.nonEmpty).last.replace('.', '_')
      val ns = s"sql_$tag"
      val tbl = s"graft.$ns.orders"
      val view = s"orders_src_$tag"
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      s.sql(s"""CREATE TABLE $tbl (
               |  o_orderkey BIGINT, o_custkey BIGINT,
               |  o_totalprice DOUBLE, o_orderstatus STRING)
               |USING `graft-snapshot`
               |TBLPROPERTIES ('statsCol' = 'o_orderkey')""".stripMargin)
      Tables.orders(s, d).createOrReplaceTempView(view)
      s.sql(s"""INSERT INTO $tbl
               |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
               |FROM $view WHERE o_orderkey % 3 = 0""".stripMargin)
      s.sql(s"""INSERT INTO $tbl
               |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
               |FROM $view WHERE o_orderkey % 3 != 0""".stripMargin)
      tbl
    })
  }

  /** Per-JVM MULTI-COLUMN-envelope snapshot table for q291: lineitem
    * keyed on l_orderkey (the declared stats column) but CLUSTERED on
    * l_partkey — so the manifest's SECONDARY envelopes (per-file
    * min/max of every integral column, recorded since round 17) are
    * tight on l_partkey while the primary envelopes are near-full-
    * range: exactly the table where a predicate on a non-statsCol
    * column prunes files and one on the stats column alone cannot.
    */
  private val multiColRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def multiColSnapshotTable(s: SparkSession, d: String): String = {
    multiColRoots.computeIfAbsent(d, _ => {
      val root = scratchIndexDir("graft-snapmc")
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_returnflag"))
      graft.sources.SnapshotTable.create(s, root,
        li.repartitionByRange(8, col("l_partkey")), "l_orderkey")
      root
    })
  }

  /** Pin every manifest's commit stamp to `version × 1,000,000 ms` by
    * rewriting the `timestampMs:` header line in place (java.nio text
    * rewrite + checksum-sidecar delete — the manifest-rewrite spec
    * technique, used here instead of toggling SnapshotTable.clock
    * because the clock is a JVM-global and fixtures share the JVM with
    * concurrent suites). Deterministic history/time-travel at any sf.
    */
  private[graft] def pinManifestStamps(s: SparkSession, root: String): Unit = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
    graft.sources.SnapshotTable.versions(fs, rp).foreach { v =>
      val mf = java.nio.file.Paths.get(root, "meta", f"v$v%08d.manifest")
      val text = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      java.nio.file.Files.write(mf, text.replaceFirst(
        "timestampMs: -?\\d+", s"timestampMs: ${v * 1000000L}").getBytes("UTF-8"))
      val crc = mf.getParent.resolve(s".${mf.getFileName}.crc")
      java.nio.file.Files.deleteIfExists(crc): Unit
    }
  }

  /** Per-JVM TIMESTAMPED snapshot table for q292: three lineitem
    * commits (v1 = l_orderkey%4<=1, v2 = +%4==2, v3 = the rest) with
    * stamps pinned to v×10⁶ ms, then `expireOlderThan(2×10⁶)` — v1 is
    * older than the cutoff and expires; v2 (== the cutoff) and the tip
    * survive. TIMESTAMP AS OF 2.5×10⁶ must resolve to v2.
    */
  private val tsRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def timestampedSnapshotTable(s: SparkSession, d: String): String = {
    tsRoots.computeIfAbsent(d, _ => {
      val root = scratchIndexDir("graft-snapts")
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      def commitSlice(p: Column) =
        li.where(p).repartitionByRange(4, col("l_orderkey"))
      graft.sources.SnapshotTable.create(
        s, root, commitSlice(col("l_orderkey") % 4 <= 1), "l_orderkey")
      graft.sources.SnapshotTable.append(
        s, root, commitSlice(col("l_orderkey") % 4 === 2))
      graft.sources.SnapshotTable.append(
        s, root, commitSlice(col("l_orderkey") % 4 === 3))
      pinManifestStamps(s, root)
      graft.sources.SnapshotTable.expireOlderThan(s, root, 2000000L)
      graft.sources.SnapshotTable.vacuum(s, root)
      root
    })
  }

  /** Per-JVM OVERWRITE-demo snapshot table for q293: v1 = the
    * o_orderkey%3==0 slice of orders (Scala create); v2 = the WHOLE of
    * orders through `df.write.format("graft-snapshot")
    * .mode("overwrite")` — the SupportsTruncate path committing a
    * whole-table REPLACE under snapshot isolation, with the feed's
    * delete events for every replaced row materialized at commit. Both
    * versions and the v2 change legs are closed-form.
    */
  private val overwriteRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def overwriteSnapshotTable(s: SparkSession, d: String): String = {
    overwriteRoots.computeIfAbsent(d, _ => {
      val root = scratchIndexDir("graft-snapow")
      val ord = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      graft.sources.SnapshotTable.create(s, root,
        ord.where(col("o_orderkey") % 3 === 0)
          .repartitionByRange(4, col("o_orderkey")), "o_orderkey")
      ord.repartitionByRange(4, col("o_orderkey"))
        .write.format("graft-snapshot").option("path", root)
        .mode("overwrite").save()
      root
    })
  }

  /** Per-JVM STREAMING-SINK table for q294: the change feed of
    * [[mergeSnapshotTable]] read as a micro-batch STREAM
    * (`readStream.format("graft-snapshot").option("mode","changes")`)
    * and delivered into a fresh snapshot table through the DSv2
    * STREAMING sink (`writeStream.format("graft-snapshot")`) under
    * Trigger.AvailableNow — feed source and exactly-once sink are both
    * this format, end to end. The sink table's content is exactly the
    * q287 event log, stated in closed form by the oracle.
    */
  private val streamSinkRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def streamSinkSnapshotTable(s: SparkSession, d: String): String = {
    streamSinkRoots.computeIfAbsent(d, _ => {
      val src = mergeSnapshotTable(s, d)
      val dst = scratchIndexDir("graft-snapsink")
      val ckpt = scratchIndexDir("graft-snapsink-ckpt")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType)))
      graft.sources.SnapshotTable.createEmpty(s, dst, schema, "o_orderkey")
      val q = s.readStream.format("graft-snapshot")
        .option("path", src).option("mode", "changes").load()
        .writeStream.format("graft-snapshot")
        .option("path", dst).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      dst
    })
  }

  /** Per-JVM SQL-MERGE-INTO table for q295: v1 = orders range-clustered
    * at the graft catalog's path (Scala bootstrap — the clustering is
    * what gives the runtime group filter files to skip); v2 = ONE SQL
    * `MERGE INTO` whose source mixes the q279 update band (price
    * doubled on [max/2, 6·max/10]) and inserts (keys %100==3 shifted by
    * +max) — the same closed-form merged state, produced through
    * Spark's row-level rewrite (SupportsRowLevelOperations + `_file`
    * runtime filtering + replaceFiles commit) instead of the Scala
    * merge. Returns the fully-qualified table name.
    */
  private val mergeIntoNames = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def mergeIntoSnapshotTable(s: SparkSession, d: String): String = {
    mergeIntoNames.computeIfAbsent(d, _ => {
      val wh = graftCatalog(s)
      val tag = d.split('/').filter(_.nonEmpty).last.replace('.', '_')
      val ns = s"mi_$tag"
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      val root = s"$wh/$ns/orders"
      val ord = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      graft.sources.SnapshotTable.create(s, root,
        ord.repartitionByRange(8, col("o_orderkey")), "o_orderkey")
      val mx = Tables.orders(s, d).agg(max("o_orderkey")).head().getLong(0)
      ord.where(col("o_orderkey").between(mx / 2, 6 * mx / 10))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .unionByName(ord.where(col("o_orderkey") % 100 === 3)
          .withColumn("o_orderkey", col("o_orderkey") + mx))
        .createOrReplaceTempView(s"mi_src_$tag")
      s.sql(
        s"""MERGE INTO graft.$ns.orders t USING mi_src_$tag s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET
           |  o_custkey = s.o_custkey, o_totalprice = s.o_totalprice,
           |  o_orderstatus = s.o_orderstatus
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s"graft.$ns.orders"
    })
  }

  /** The decision rule's ESCAPE-HATCH arm as corpus state (q259): the
    * SAME bucketed files as [[bucketedTables]], read with
    * `spark.sql.sources.bucketing.enabled=false`. The conf is read at
    * PLANNING time, not DataFrame-construction time, and the driver
    * materializes contract results long after the query lambda returns —
    * so the toggle lives in a SIBLING session (`newSession`: own
    * SQLConf, shared SparkContext + catalog), where it holds for the
    * frame's whole lifetime without leaking into any other query's
    * planning.
    */
  private[graft] def escapeHatchTables(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    bucketedTables(s, d) // ensure built + registered in the shared catalog
    val (liTable, ordTable) = bucketedTableNames(d)
    val hatch = s.newSession()
    hatch.conf.set("spark.sql.sources.bucketing.enabled", "false")
    (hatch.table(liTable), hatch.table(ordTable))
  }

  // ---- synthetic input builders (mirrored literally in the oracle SQL) ----

  /** Deterministic URL variants exercising every filenameFromUrl branch. */
  private[graft] def testUrl: Column =
    when(pmod(did, lit(4)) === 0, concat(lit("https://x.test/docs/file_"), sid, lit(".pdf?x=1")))
      .when(pmod(did, lit(4)) === 1, concat(lit("https://x.test/d/report "), sid, lit(".XLSX")))
      .when(pmod(did, lit(4)) === 2, concat(lit("https://x.test/plain/"), sid))
      .otherwise(concat(lit("files/data"), sid))

  /** Deterministic URL variants exercising every extensionFromUrl branch. */
  private[graft] def extUrl: Column =
    when(pmod(did, lit(5)) === 0, concat(lit("https://x.test/a/file"), sid, lit(".pdf")))
      .when(pmod(did, lit(5)) === 1, concat(lit("https://x.test/b/file"), sid, lit(".xlsx?v=2")))
      .when(pmod(did, lit(5)) === 2, concat(lit("https://x.test/c/FILE"), sid, lit(".XLS")))
      .when(pmod(did, lit(5)) === 3, lit("https://x.test/download?fmt=xlsheet"))
      .otherwise(lit("https://x.test/download/plain"))

  private[graft] def archSample: Column =
    element_at(
      array(lit("Archived Product"), lit("Non-Archived item"),
        lit("non archived thing"), lit("Regular entry")),
      (pmod(did, lit(4)) + 1).cast("int"))

  /** 12-token boilerplate planted on every 7th doc for duplicated-span
    * dedup (q175) — long enough to contain five full 8-token windows, so
    * span detection has a deterministic corpus-wide positive set.
    */
  private[graft] val spanBoiler =
    "the quick brown fox jumps over the lazy dog again and again"

  /** ~300-char shared run planted on every 11th doc for content-defined
    * chunking (q181): long enough that the rolling-hash boundaries
    * re-synchronize inside it, producing identical interior chunks
    * across planted docs whatever their prefixes.
    */
  private[graft] val cdcTail: String = Seq.fill(5)(spanBoiler).mkString(" ")

  /** documents ∪ near-duplicate copies (id + 10^12 — collision-free at any SF, two tokens appended) —
    * gives the near-dup detectors a deterministic positive set.
    */
  private[graft] def dupCorpus(docs: DataFrame): DataFrame =
    docs.select(did.as("id"), col("text"))
      .unionByName(docs.select((did + 1000000000000L).as("id"),
        concat(col("text"), lit(" zzdup tail")).as("text")))

  /** embeddings ∪ scaled copies (id + 10^12, ×1.001) — cosine ≈ 1 pairs. */
  private[graft] def dupEmbeddings(emb: DataFrame): DataFrame =
    emb.unionByName(emb.select(
      (col("vec_id") + 1000000000000L).as("vec_id"),
      transform(col("embedding"), x => (x * lit(1.001f)).cast("float")).as("embedding"),
      col("label")))

  // ---- HTML round-trip fixtures: build a one-row page per document,
  //      parse it back through the full G1-G4 + P* + F* pipeline ----

  private[graft] def td(c: Column) = concat(lit("<td>"), c, lit("</td>"))

  private[graft] def pageDs(s: SparkSession, cells: Seq[Column], productType: String,
                     docs: DataFrame): Dataset[PageHtml] = {
    val row = concat((lit("<tr>") +: cells.map(td)) :+ lit("</tr>"): _*)
    val html = concat(lit("<table class='data table'><tbody>"), row,
      lit("</tbody></table>"))
    docs.select(lit(productType).as("productType"),
        did.cast("int").as("page"), html.as("html"))
      .as(Encoders.product[PageHtml])
  }

  private[graft] def lifePages(s: SparkSession, dir: String): Dataset[PageHtml] = {
    val docs = Tables.documents(s, dir)
    val cells = Seq(
      lit("<input type='checkbox'/>"),
      when(pmod(did, lit(2)) === 0, "Non-Archived").otherwise("Archived"),
      concat(lit("FY 20"), (lit(15) + pmod(did, lit(5))).cast("string")),
      concat(lit("Ins "), col("source")),
      concat(lit("Prod "), sid),
      concat(lit("UIN"), sid),
      lit("TypeA"), lit(""), lit(""),
      lit("P"), lit("Par"), lit("Ind"),
      when(pmod(did, lit(3)) === 0, "").otherwise(concat(lit("rem "), sid)),
      concat(lit("<a href='/documents/doc"), sid, lit(".pdf'>Doc "), sid, lit("</a>")))
    pageDs(s, cells, "life", docs)
  }

  private[graft] def healthPages(s: SparkSession, dir: String): Dataset[PageHtml] = {
    val docs = Tables.documents(s, dir)
    val cells = Seq(
      lit("<input type='checkbox'/>"),
      when(pmod(did, lit(2)) === 0, "Non-Archived").otherwise("Archived"),
      concat(lit("FY 20"), (lit(15) + pmod(did, lit(5))).cast("string")),
      concat(lit("Ins "), col("source")),
      concat(lit("HUIN"), sid),
      concat(lit("HProd "), sid),
      when(pmod(did, lit(4)) === 0, "").otherwise(lit("2020-01-15")),
      when(pmod(did, lit(5)) === 0, lit(""))
        .otherwise(concat(lit("<a href='/documents/h"), sid, lit(".pdf'>H</a>"))),
      lit("TypeH"))
    pageDs(s, cells, "health", docs)
  }

  private[graft] def nonlifePages(s: SparkSession, dir: String): Dataset[PageHtml] = {
    val docs = Tables.documents(s, dir)
    val cells = Seq(
      lit("<input type='checkbox'/>"),
      when(pmod(did, lit(2)) === 0, "Non-Archived").otherwise("Archived"),
      when(pmod(did, lit(6)) === 0, "").otherwise(sid),
      concat(lit("FY 20"), (lit(15) + pmod(did, lit(5))).cast("string")),
      concat(lit("GIns "), col("source")),
      concat(lit("NProd "), sid),
      lit("Motor"),
      concat(lit("NL-"), sid),
      when(pmod(did, lit(4)) === 0, "").otherwise(lit("2021-03-31")),
      concat(lit("<a href='/documents/n"), sid, lit(".xlsx'>NL Doc "), sid, lit("</a>")))
    pageDs(s, cells, "nonlife", docs)
  }

  /** life_list pages exercising the X2 onclick fallback on every third row. */
  private[graft] def lifeListPages(s: SparkSession, dir: String): Dataset[PageHtml] = {
    val docs = Tables.documents(s, dir)
    val linkCell = when(pmod(did, lit(3)) === 0,
        concat(lit("<span onclick=\"window.open('/files/w"), sid, lit(".xlsx')\">view</span>")))
      .otherwise(concat(lit("<a href='/documents/l"), sid, lit(".pdf'>List Doc "), sid, lit("</a>")))
    val cells = Seq(
      lit("<input type='checkbox'/>"),
      when(pmod(did, lit(2)) === 0, "Non-Archived").otherwise("Archived"),
      concat(lit("Product list "), sid),
      when(pmod(did, lit(4)) === 0, "").otherwise(lit("01-01-2024")),
      when(pmod(did, lit(5)) === 0, "").otherwise(concat(lit("sub "), sid)),
      linkCell)
    pageDs(s, cells, "life_list", docs)
  }



  // ---- DuckDB oracle SQL (same parquet tables registered by name) ----

  /** Shared SQL fragments (DuckDB dialect; note regexp_replace needs 'g'). */
  private[graft] val cleanSql = """trim(regexp_replace(text, '\s+', ' ', 'g'))"""
  private[graft] val toksSql =
    s"""CASE WHEN $cleanSql = '' THEN CAST([] AS VARCHAR[])
       | ELSE string_split($cleanSql, ' ') END""".stripMargin

  /** q15's tokenize/measure CTE chain (`t`, `m`) and the rounded quality
    * composite — shared by q15, the q96 per-source top-k, and q111's
    * survivor selection (which scores a doubled corpus via `src`).
    */
  private[graft] def qualityCtesFrom(src: String): String =
    s"""t AS (SELECT doc_id, text, $toksSql AS toks FROM $src),
       |m AS (SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CASE WHEN len(toks) = 0 THEN 0.0
       |   ELSE CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE) / len(toks) END AS mtl,
       |  CASE WHEN len(toks) = 0 THEN 0.0
       |   ELSE CAST(len(list_filter(toks, x -> x IN ('the','a','an','and','of','to','in','is','it','that','for','on','with','as'))) AS DOUBLE) / len(toks) END AS swr,
       |  CASE WHEN length(text) = 0 OR text IS NULL THEN 0.0
       |   ELSE CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text) END AS pr
       | FROM t)""".stripMargin

  private[graft] val qualityCtes: String = qualityCtesFrom("documents")

  /** q28's brute-force cosine chain as CTEs `{pfx}q/{pfx}c/{pfx}s/
    * {pfx}r/{pfx}w` — `{pfx}w` holds (qid, nid, sim, rk) ranked by the
    * ROUNDED sim (matching the Spark operators' tie behavior). Shared
    * by q28 (full corpus), q108 (filtered corpus), and q113 (exact
    * ground-truth side, `e` prefix to avoid clashing with the IVF
    * chain).
    */
  private[graft] def cosineTopKCtes(pfx: String, corpusWhere: String): String =
    s"""${pfx}q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
       |${pfx}c AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings WHERE $corpusWhere),
       |${pfx}s AS (SELECT qid, nid,
       |  list_sum(list_transform(list_zip(qv, cv), p -> p[1]::DOUBLE * p[2]::DOUBLE)) AS dp,
       |  sqrt(list_sum(list_transform(list_zip(qv, qv), p -> p[1]::DOUBLE * p[2]::DOUBLE))) AS na,
       |  sqrt(list_sum(list_transform(list_zip(cv, cv), p -> p[1]::DOUBLE * p[2]::DOUBLE))) AS nb
       | FROM ${pfx}c CROSS JOIN ${pfx}q WHERE qid <> nid),
       |${pfx}r AS (SELECT qid, nid,
       |  floor((CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END) * 10000 + 0.5) / 10000 AS sim FROM ${pfx}s),
       |${pfx}w AS (SELECT qid, nid, sim,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk FROM ${pfx}r)""".stripMargin

  /** q30's IVF chain (centroid assignment → nprobe probe → cosine →
    * rank) as CTEs `cent/ad/a/pd/p/s/r/w` — shared by q30 and q113's
    * approximate side.
    */
  private[graft] val ivfTopKCtes: String =
    """cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
      |ad AS (SELECT e.vec_id AS nid, e.embedding AS nv, c.cid,
      |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |   list_sum(list_transform(list_zip(e.embedding, c.cv),
      |     p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE))), c.cid) AS rn
      | FROM embeddings e CROSS JOIN cent c),
      |a AS (SELECT nid, nv, cid FROM ad WHERE rn = 1),
      |pd AS (SELECT q.vec_id AS qid, q.embedding AS qv, c.cid,
      |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |   list_sum(list_transform(list_zip(q.embedding, c.cv),
      |     p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE))), c.cid) AS rn
      | FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 8),
      |p AS (SELECT qid, qv, cid FROM pd WHERE rn <= 4),
      |s AS (SELECT p.qid, a.nid,
      |  list_sum(list_transform(list_zip(p.qv, a.nv), x -> x[1]::DOUBLE * x[2]::DOUBLE)) AS dp,
      |  sqrt(list_sum(list_transform(list_zip(p.qv, p.qv), x -> x[1]::DOUBLE * x[2]::DOUBLE))) AS na,
      |  sqrt(list_sum(list_transform(list_zip(a.nv, a.nv), x -> x[1]::DOUBLE * x[2]::DOUBLE))) AS nb
      | FROM a JOIN p ON a.cid = p.cid WHERE p.qid <> a.nid),
      |r AS (SELECT qid, nid,
      |  floor((CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END) * 10000 + 0.5) / 10000 AS sim FROM s),
      |w AS (SELECT qid, nid, sim,
      |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk FROM r)""".stripMargin

  /** The asymmetric (side-tagged) LSH probe chain: one signature
    * derivation over `allDocs` (must yield side 'c' = corpus / 'b' =
    * batch with columns side, id, text), corpus-only bucket guard,
    * corpus x batch candidates (never self), candidate-bounded Jaccard
    * verify at 0.7. Shared by q86 (ingest batch vs corpus) and q112
    * (test split vs train split).
    */
  private[graft] def minhashProbeSql(allDocs: String): String =
    s"""WITH all_docs AS (
       |$allDocs),
       |t AS (SELECT side, id, $toksSql AS toks FROM all_docs),
       |shl AS (SELECT side, id,
       |  CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
       |   ELSE list_transform(range(1, len(toks) - 1),
       |     i -> array_to_string(toks[i:i+2], ' ')) END AS shs
       | FROM t),
       |shu AS (SELECT side, id, unnest(shs) AS s FROM shl),
       |sh AS (SELECT DISTINCT side, id,
       |  ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM shu),
       |pidx AS (SELECT unnest(generate_series(0, 63)) AS i),
       |perms AS (SELECT i,
       |  ('0x' || substr(md5('graft_perm_a_' || CAST(i AS VARCHAR)), 1, 15))::BIGINT | 1 AS a,
       |  ('0x' || substr(md5('graft_perm_b_' || CAST(i AS VARCHAR)), 1, 15))::BIGINT AS b
       | FROM pidx),
       |sig AS (SELECT sh.side, sh.id, perms.i,
       |  min(((sh.h::HUGEINT * perms.a + perms.b) % 1152921504606846976::HUGEINT)::BIGINT) AS s
       | FROM sh, perms GROUP BY sh.side, sh.id, perms.i),
       |bandkey AS (SELECT side, id, i // 4 AS band, string_agg(CAST(s AS VARCHAR), '_' ORDER BY i) AS bk
       | FROM sig GROUP BY side, id, i // 4),
       |bsz AS (SELECT band, bk, count(*) AS n FROM bandkey WHERE side = 'c' GROUP BY band, bk),
       |cand AS (SELECT DISTINCT y.id AS batch_id, x.id AS corpus_id
       | FROM bandkey x
       | JOIN bandkey y ON x.band = y.band AND x.bk = y.bk
       | JOIN bsz ON bsz.band = x.band AND bsz.bk = x.bk
       | WHERE x.side = 'c' AND y.side = 'b' AND bsz.n <= 1000),
       |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
       |inter AS (SELECT c.batch_id, c.corpus_id, count(*) AS m
       | FROM cand c
       | JOIN sh x ON x.id = c.corpus_id
       | JOIN sh y ON y.id = c.batch_id AND y.h = x.h
       | GROUP BY c.batch_id, c.corpus_id)
       |SELECT i.batch_id, i.corpus_id,
       | floor((CAST(i.m AS DOUBLE) / (sb.n + sc.n - i.m)) * 10000 + 0.5) / 10000 AS jaccard
       |FROM inter i
       |JOIN sizes sb ON sb.id = i.batch_id
       |JOIN sizes sc ON sc.id = i.corpus_id
       |WHERE CAST(i.m AS DOUBLE) / (sb.n + sc.n - i.m) >= 0.7""".stripMargin

  private[graft] val qualityExprSql: String =
    """floor(greatest(0.0, least(1.0,
      |   least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.5
      |   + least(swr * 5.0, 1.0) * 0.3
      |   + (1.0 - least(pr * 10.0, 1.0)) * 0.2)) * 10000 + 0.5) / 10000""".stripMargin

  /** q27's portable hyperplane-LSH embedding pipeline as a reusable CTE
    * chain ending in `r(id_a, id_b, sim)` — q27 selects the pairs, q82
    * resolves the same pair graph into semantic clusters. Also defines
    * `corpus(id, v)`, which q82's final labeling joins back to.
    */
  private[graft] val embeddingPairCtes: String =
    """corpus AS (
      |  SELECT vec_id AS id, embedding AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000000000 AS id,
      |    list_transform(embedding, x -> CAST(CAST(x AS REAL) * CAST(1.001 AS REAL) AS REAL)) AS v
      |  FROM embeddings),
      |pj AS (SELECT unnest(generate_series(0, 15)) AS j),
      |pk AS (SELECT unnest(generate_series(0, 63)) AS k),
      |pl AS (SELECT j, k,
      |  (('0x' || substr(md5('graft_plane_' || CAST(j AS VARCHAR) || '_' || CAST(k AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
      |    / 576460752303423488.0 - 1.0 AS w
      | FROM pj, pk),
      |plv AS (SELECT j, list(w ORDER BY k) AS pv FROM pl GROUP BY j),
      |dots AS (SELECT c.id, c.v, p.j,
      |  list_sum(list_transform(list_zip(c.v, p.pv), q -> q[1]::DOUBLE * q[2]::DOUBLE)) AS dp
      | FROM corpus c CROSS JOIN plv p),
      |bk AS (SELECT id, any_value(v) AS v,
      |  CAST(sum(CASE WHEN dp >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
      | FROM dots GROUP BY id),
      |pairs AS (SELECT a.id AS id_a, b.id AS id_b, a.v AS va, b.v AS vb
      | FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.id < b.id),
      |s AS (SELECT id_a, id_b,
      |  list_sum(list_transform(list_zip(va, vb), q -> q[1]::DOUBLE * q[2]::DOUBLE)) AS dp,
      |  sqrt(list_sum(list_transform(list_zip(va, va), q -> q[1]::DOUBLE * q[2]::DOUBLE))) AS na,
      |  sqrt(list_sum(list_transform(list_zip(vb, vb), q -> q[1]::DOUBLE * q[2]::DOUBLE))) AS nb
      | FROM pairs),
      |r AS (SELECT id_a, id_b,
      |  floor((CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END) * 10000 + 0.5) / 10000 AS sim
      | FROM s)""".stripMargin

  /** [[graft.functions.Bpe.ToyMerges]] as a DuckDB literal ('a b' strings
    * in priority order; list_position = rank + 1).
    */
  private[graft] val bpeMergesLit: String =
    graft.functions.Bpe.ToyMerges
      .map { case (a, b) => s"'$a $b'" }.mkString("[", ",", "]")

  /** The portable MinHash-LSH pipeline as a CTE chain ending in
    * `inter` (shared intersection counts) + `sizes` — q25 selects the
    * verified pairs from it; q81 feeds those pairs into the component
    * closure over a corpus SLICE (cheaper bench input; the +100000
    * offset keeps dup ids collision-free within the slice). Arithmetic
    * parity notes at the q25 entry.
    */
  /** The shared shingle→hash→permute→signature half of
    * [[minhashLshCtes]] — reused alone by the q196 band-parameter
    * sweep, whose per-config tails re-band the SAME `sig` CTE.
    */
  private[graft] def minhashSigCtes(where: String, offset: Long): String =
    s"""corpus AS (
       |  SELECT doc_id AS id, text FROM documents WHERE $where
       |  UNION ALL
       |  SELECT doc_id + $offset AS id, text || ' zzdup tail' AS text
       |  FROM documents WHERE $where),
       |t AS (SELECT id, $toksSql AS toks FROM corpus),
       |shl AS (SELECT id,
       |  CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
       |   ELSE list_transform(range(1, len(toks) - 1),
       |     i -> array_to_string(toks[i:i+2], ' ')) END AS shs
       | FROM t),
       |shu AS (SELECT id, unnest(shs) AS s FROM shl),
       |sh AS (SELECT DISTINCT id,
       |  ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM shu),
       |pidx AS (SELECT unnest(generate_series(0, 63)) AS i),
       |perms AS (SELECT i,
       |  ('0x' || substr(md5('graft_perm_a_' || CAST(i AS VARCHAR)), 1, 15))::BIGINT | 1 AS a,
       |  ('0x' || substr(md5('graft_perm_b_' || CAST(i AS VARCHAR)), 1, 15))::BIGINT AS b
       | FROM pidx),
       |sig AS (SELECT sh.id, perms.i,
       |  min(((sh.h::HUGEINT * perms.a + perms.b) % 1152921504606846976::HUGEINT)::BIGINT) AS s
       | FROM sh, perms GROUP BY sh.id, perms.i)""".stripMargin

  /** One banding config's CTE tail over the shared `sig` CTE of
    * [[minhashSigCtes]] — band key grouping, the same ≤1000 bucket
    * guard the engine applies, candidate pairs, and the planted-pair
    * hit count (expects a `pl(id_a, id_b)` CTE). Prefixed so q196 can
    * instantiate several configs in one statement.
    */
  private[graft] def bandSweepTailSql(pfx: String, rowsPerBand: Int): String =
    s"""${pfx}bandkey AS (SELECT id, i // $rowsPerBand AS band, string_agg(CAST(s AS VARCHAR), '_' ORDER BY i) AS bk
       | FROM sig GROUP BY id, i // $rowsPerBand),
       |${pfx}bsz AS (SELECT band, bk, count(*) AS n FROM ${pfx}bandkey GROUP BY band, bk),
       |${pfx}cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       | FROM ${pfx}bandkey x
       | JOIN ${pfx}bandkey y ON x.band = y.band AND x.bk = y.bk
       | JOIN ${pfx}bsz bz ON bz.band = x.band AND bz.bk = x.bk
       | WHERE bz.n <= 1000 AND x.id < y.id),
       |${pfx}m AS (SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM ${pfx}cand) AS n_cand,
       |  (SELECT CAST(count(*) AS BIGINT) FROM ${pfx}cand c
       |    JOIN pl ON pl.id_a = c.id_a AND pl.id_b = c.id_b) AS planted_found)""".stripMargin

  private[graft] def minhashLshCtes(where: String, offset: Long): String =
    s"""${minhashSigCtes(where, offset)},
       |bandkey AS (SELECT id, i // 4 AS band, string_agg(CAST(s AS VARCHAR), '_' ORDER BY i) AS bk
       | FROM sig GROUP BY id, i // 4),
       |bsz AS (SELECT band, bk, count(*) AS n FROM bandkey GROUP BY band, bk),
       |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       | FROM bandkey x
       | JOIN bandkey y ON x.band = y.band AND x.bk = y.bk
       | JOIN bsz ON bsz.band = x.band AND bsz.bk = x.bk
       | WHERE bsz.n <= 1000 AND x.id < y.id),
       |sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
       |inter AS (SELECT c.id_a, c.id_b, count(*) AS m
       | FROM cand c
       | JOIN sh x ON x.id = c.id_a
       | JOIN sh y ON y.id = c.id_b AND y.h = x.h
       | GROUP BY c.id_a, c.id_b)""".stripMargin

  /** The BPE encode loop as a recursive CTE over DISTINCT words: each
    * step finds the best-ranked adjacent pair (999999 = "absent") and
    * merges all its occurrences left-to-right via a list_reduce over
    * singleton lists — the exact semantics of Bpe.Vocab.encode. `fin`
    * keeps each word's terminal state; `cnt` joins counts back to word
    * INSTANCES per doc.
    */
  private[graft] val bpeCtes: String =
    s"""t AS (SELECT doc_id, CASE WHEN $cleanSql = '' THEN CAST([] AS VARCHAR[])
       |  ELSE string_split(lower($cleanSql), ' ') END AS toks FROM documents),
       |inst AS (SELECT doc_id, unnest(toks) AS w FROM t),
       |wd AS (SELECT DISTINCT w FROM inst),
       |init AS (SELECT w, list_transform(range(1, len(w) + 1), i -> w[i:i]) AS tk FROM wd),
       |bpe AS (
       |  SELECT w, tk FROM init
       |  UNION ALL
       |  SELECT w, list_reduce(list_transform(tk, x -> [x]), (a, b) ->
       |      CASE WHEN a[len(a)] || ' ' || b[1] = bp
       |           THEN a[1:len(a)-1] || [a[len(a)] || b[1]]
       |           ELSE a || b END) AS tk
       |  FROM (SELECT w, tk, $bpeMergesLit[br] AS bp FROM (
       |          SELECT w, tk, list_min(list_transform(range(1, len(tk)), i ->
       |            coalesce(nullif(list_position($bpeMergesLit, tk[i] || ' ' || tk[i+1]), 0), 999999))) AS br
       |          FROM bpe) s
       |        WHERE br IS NOT NULL AND br < 999999) s2),
       |fin AS (SELECT w, len(tk) AS n FROM (
       |          SELECT w, tk, list_min(list_transform(range(1, len(tk)), i ->
       |            coalesce(nullif(list_position($bpeMergesLit, tk[i] || ' ' || tk[i+1]), 0), 999999))) AS br
       |          FROM bpe) s
       |        WHERE br IS NULL OR br = 999999),
       |cnt AS (SELECT i.doc_id, count(*) AS n_words, sum(f.n) AS n_bpe
       |        FROM inst i JOIN fin f USING (w) GROUP BY i.doc_id)""".stripMargin

}
