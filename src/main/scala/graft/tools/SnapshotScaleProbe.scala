package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** SCALING.md probe for the snapshot table format (q273–q275): does
  * each operation's cost track the thing it claims to track as the
  * table grows?
  *
  *  - append: cost ∝ the BATCH (data write + one stats read-back of
  *    the staged files + an O(files) manifest rewrite), not the table;
  *  - deleteWhere: cost ∝ the files whose [min,max] envelope
  *    intersects the range (copy-on-write), with the carried-file
  *    count reported so the pruning is visible;
  *  - diff: cost ∝ the files that CHANGED between the two manifests —
  *    measured against a full-table scan of the same snapshot as the
  *    in-run ruler;
  *  - vacuum: a driver-side listing + per-orphan delete.
  *
  * Corpus: (k, v, pad) rows range-partitioned on k into ~64 files per
  * commit, so envelope pruning has real file boundaries to work with
  * (the layout a range-clustered ingest produces; an unclustered
  * ingest degrades deleteWhere to a full rewrite — the same honesty
  * note as q242's linear-vs-clustered comparison).
  *
  * Usage: runMain graft.tools.SnapshotScaleProbe [nRows...] [reps=N]
  * Defaults: 2000000 20000000 60000000, reps=3.
  */
object SnapshotScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(3)
    // bare numbers = row-count arms; "rows=none" skips them (so the
    // files= metadata arm can run alone)
    val sizes = args.filterNot(a => a.startsWith("reps=") ||
        a.startsWith("files=") || a.startsWith("cdc=") ||
        a.startsWith("history=") || a.startsWith("stats=") ||
        a == "rows=none").map(_.toLong) match {
      case Array() if !args.contains("rows=none") =>
        Seq(2000000L, 20000000L, 60000000L)
      case xs => xs.toSeq
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def rows(n: Long, offset: Long) =
      spark.range(n).select((col("id") + offset).as("k"),
        (col("id") % 997).as("v"),
        md5(col("id").cast("string")).as("pad"))

    // warm the write/read paths once, untimed
    {
      val w = graft.queries.Fixtures.scratchIndexDir("snapprobe-warm")
      SnapshotTable.create(spark, s"$w/t", rows(10000, 0).repartitionByRange(4, col("k")), "k")
      SnapshotTable.read(spark, s"$w/t").count()
    }

    println("%8s %9s %9s %9s %7s %9s %9s %9s %9s  carried/total"
      .format("rows", "create_s", "append_s", "delete_s", "diff_s", "diffap_s", "scan_s", "vacuum_s", "files"))
    sizes.foreach { n =>
      val root = graft.queries.Fixtures.scratchIndexDir("snapprobe") + "/t"
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val (_, tCreate) = timed(SnapshotTable.create(spark, root,
        rows(n, 0).repartitionByRange(64, col("k")), "k"))
      // append 1% of the table — cost should track the 1%, not the n
      val batch = math.max(10000L, n / 100)
      val (_, tAppend) = timed(SnapshotTable.append(spark, root,
        rows(batch, n).repartitionByRange(2, col("k"))))
      // delete a ~3% mid-table range: with 64 range files expect ~2-3
      // rewritten, ~61 carried
      val lo = n / 2
      val hi = lo + n * 3 / 100
      val (_, tDelete) = timed(SnapshotTable.deleteWhere(spark, root, lo, hi))
      val m2 = SnapshotTable.readManifest(fs, new Path(root), 2)
      val m3 = SnapshotTable.readManifest(fs, new Path(root), 3)
      val carried = m3.files.map(_.path).toSet
        .intersect(m2.files.map(_.path).toSet).size
      // merge: a 2% update band + 0.5% fresh keys — the upsert's cost
      // must track its touched slice like the delete's does
      val ulo = n * 7 / 10
      val mergeBatch = rows(n * 2 / 100, ulo)
        .unionByName(rows(math.max(1000L, n / 200), 2 * n))
      val (_, tMerge) = timed(
        SnapshotTable.merge(spark, root, mergeBatch, Seq("k")))
      val m3b = SnapshotTable.readManifest(fs, new Path(root), 3)
      val m4b = SnapshotTable.readManifest(fs, new Path(root), 4)
      val mergeCarried = m4b.files.map(_.path).toSet
        .intersect(m3b.files.map(_.path).toSet).size
      val tDiffDel = median((1 to reps).map { _ =>
        timed(SnapshotTable.diff(spark, root, 2, 3, Seq("k")).count())._2
      })
      val tDiffApp = median((1 to reps).map { _ =>
        timed(SnapshotTable.diff(spark, root, 1, 2, Seq("k")).count())._2
      })
      // ruler: a full scan+count of the same tip snapshot
      val tScan = median((1 to reps).map { _ =>
        timed(SnapshotTable.read(spark, root).agg(sum("v")).collect())._2
      })
      val (nVac, tVacuum) = timed(SnapshotTable.vacuum(spark, root))
      println(f"$n%8d $tCreate%9.2f $tAppend%9.2f $tDelete%9.2f $tDiffDel%7.2f $tDiffApp%9.2f $tScan%9.2f $tVacuum%9.2f ${m3.files.size}%9d  $carried/${m2.files.size} orphans=$nVac " +
        f"merge=$tMerge%.2fs carried=$mergeCarried/${m3b.files.size}")
    }

    // ----- CDC-materialization overhead arm (cdc=N) ----------------
    // Cross-run comparison of merge/delete timings is hostage to host
    // drift (create — UNCHANGED code — measured 13.7 s vs 41–127 s for
    // the same 60M build on different days), so the feed's write cost
    // is measured SAME-JVM: alternating merges of a flipping 2%-band
    // batch (every rep a genuine update of the same volume) with
    // materialization off/on, plus one off/on delete pair. The delta
    // between the arms is the honest number.
    args.find(_.startsWith("cdc=")).foreach { arg =>
      val n = arg.drop(4).toLong
      val root = graft.queries.Fixtures.scratchIndexDir("snapprobe-cdc") + "/t"
      SnapshotTable.create(spark, root,
        rows(n, 0).repartitionByRange(64, col("k")), "k")
      val ulo = n * 7 / 10
      def flipBatch(i: Int) = rows(n * 2 / 100, ulo)
        .withColumn("v", col("v") + i) // every rep genuinely updates
        .unionByName(rows(math.max(1000L, n / 200), 2 * n + i * 10))
      val (off, on) = (collection.mutable.Buffer[Double](),
                       collection.mutable.Buffer[Double]())
      // try/finally: the flag is JVM-global — an off-arm merge/delete
      // that throws would otherwise leave it false for the rest of the
      // JVM, and every later delete/merge commit would silently write
      // an empty change feed (permanently unreadable via changes())
      try {
        (0 until 2 * reps).foreach { i =>
          SnapshotTable.materializeChanges = i % 2 == 1
          val (_, t) = timed(SnapshotTable.merge(spark, root, flipBatch(i), Seq("k")))
          (if (i % 2 == 1) on else off) += t
        }
        SnapshotTable.materializeChanges = false
        val (_, delOff) = timed(SnapshotTable.deleteWhere(spark, root, n / 3, n / 3 + n / 100))
        SnapshotTable.materializeChanges = true
        val (_, delOn) = timed(SnapshotTable.deleteWhere(spark, root, n / 2, n / 2 + n / 100))
        println(f"cdc-overhead n=$n merge: off=${median(off.toSeq)}%.2f s on=${median(on.toSeq)}%.2f s " +
          f"(+${(median(on.toSeq) / median(off.toSeq) - 1) * 100}%.0f%%)  " +
          f"delete: off=$delOff%.2f s on=$delOn%.2f s")
      } finally SnapshotTable.materializeChanges = true
    }

    // ----- high-FILE-count arm (files=F1,F2,...) -------------------
    // The row-count arms above stress the DATA side; the format's real
    // 100 TB risk is the METADATA side: each version is ONE manifest
    // listing every live file, read/written whole on the driver per
    // commit, and stabbedFiles sorts/broadcasts every envelope. At
    // 128 MB files, 10^5 files ≈ 12.8 TB and 10^6 ≈ 128 TB — this arm
    // measures the driver-side cost of a commit (render+write+rename),
    // a manifest read+parse, latestVersion's directory listing under
    // accumulated versions, and an exact merge touched-set derivation
    // (100k scattered batch keys against F envelopes), with synthetic
    // DataFileMeta so the measurement is purely the metadata path.
    args.find(_.startsWith("files=")).foreach { arg =>
      val fileCounts = arg.drop(6).split(',').map(_.toLong)
      println()
      println("%9s %9s %9s %9s %9s %9s %9s  (metadata path only)"
        .format("files", "mani_mb", "commit_s", "read_s", "latest_s", "stab_s", "touched"))
      fileCounts.foreach { fc =>
        val f = fc.toInt
        val root = new Path(
          graft.queries.Fixtures.scratchIndexDir("snapprobe-files") + "/t")
        val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val schema = spark.range(1).select(col("id").as("k"),
          col("id").as("v")).schema.json
        // clustered layout: file i covers [i*1000, i*1000+999]
        def files(tag: Long) = (0 until f).map { i =>
          SnapshotTable.DataFileMeta(
            s"data/$tag-${i}.parquet", 1000L, 128L * 1024 * 1024,
            i * 1000L, i * 1000L + 999L)
        }
        val (_, tCommit) = timed {
          SnapshotTable.tryCommit(spark, root,
            SnapshotTable.Manifest(1, 0, "create", "k", schema, files(0)))
        }
        // a few more versions so latestVersion lists a real directory
        (2 to 5).foreach { v =>
          SnapshotTable.tryCommit(spark, root,
            SnapshotTable.Manifest(v, v - 1, "append", "k", schema, files(v.toLong)))
        }
        val maniBytes = hfs.getFileStatus(
          new Path(root, f"meta/v${5}%08d.manifest")).getLen
        val tRead = median((1 to reps).map { _ =>
          timed(SnapshotTable.readManifest(hfs, root, 5))._2
        })
        val tLatest = median((1 to reps).map { _ =>
          timed(SnapshotTable.latestVersion(hfs, root))._2
        })
        val tip = SnapshotTable.readManifest(hfs, root, 5)
        // 100k batch keys: 2% clustered update band + scattered far keys
        val span = f * 1000L
        val batch = spark.range(100000).select(
          when(col("id") % 2 === 0, col("id") % (span / 50) + span * 7 / 10)
            .otherwise((col("id") * 2654435761L) % span).as("k"))
        var touched = 0
        val tStab = median((1 to reps).map { _ =>
          val (hit, t) = timed(SnapshotTable.stabbedFiles(spark, tip, batch))
          touched = hit.size
          t
        })
        println(f"$f%9d ${maniBytes / 1e6}%9.1f $tCommit%9.3f $tRead%9.3f $tLatest%9.3f $tStab%9.2f $touched%9d")
      }
    }

    // ----- deep-history arm (history=V,F) --------------------------
    // history() is the ops API a 1,000-version table consults daily;
    // pre-summary it re-parsed every manifest BODY (O(versions×files)
    // — ~6 min at 10³ versions × 10⁶ files at the measured 0.34 s/
    // read). The header summary makes it O(versions): this arm pins
    // the number. Manifests are synthetic (the files= discipline) so
    // the measurement is purely the metadata path; expire+vacuum run
    // at the end to exercise retention at version depth.
    args.find(_.startsWith("history=")).foreach { arg =>
      val Array(nv, nf) = arg.drop(8).split(',').map(_.toInt)
      val root = new Path(
        graft.queries.Fixtures.scratchIndexDir("snapprobe-history") + "/t")
      val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val schema = spark.range(1).select(col("id").as("k"),
        col("id").as("v")).schema.json
      def files(tag: Long) = (0 until nf).map { i =>
        SnapshotTable.DataFileMeta(
          s"data/$tag-${i}.parquet", 1000L, 128L * 1024 * 1024,
          i * 1000L, i * 1000L + 999L)
      }
      val (_, tBuild) = timed {
        (1 to nv).foreach { v =>
          SnapshotTable.tryCommit(spark, root,
            SnapshotTable.Manifest(v, v - 1,
              if (v == 1) "create" else "append", "k", schema, files(v.toLong),
              addedPaths = Some(Set.empty)))
        }
      }
      val tHist = median((1 to reps).map { _ =>
        timed(SnapshotTable.history(spark, root.toString))._2
      })
      val (nExpired, tExpire) = timed(
        SnapshotTable.expire(spark, root.toString, keepLast = 10))
      println(f"history versions=$nv files/manifest=$nf build=$tBuild%.1f s " +
        f"history()=$tHist%.3f s expire(keep 10)=$tExpire%.2f s ($nExpired dropped)")
    }

    // ----- multi-column-stats arm (stats=F,C) ----------------------
    // Round 17 adds per-file min/max for every integral column as
    // `stats` lines below the file list — O(files × columns) manifest
    // text. This arm pins what that costs at file-count scale: one
    // manifest with F files × C secondary envelopes, measuring commit
    // (render+write), full readManifest (parse), and the header-only
    // readManifestSummary (which must stay O(1) — it stops above the
    // file list, stats lines included).
    args.find(_.startsWith("stats=")).foreach { arg =>
      val Array(nf, nc) = arg.drop(6).split(',').map(_.toInt)
      val root = new Path(
        graft.queries.Fixtures.scratchIndexDir("snapprobe-stats") + "/t")
      val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val schema = spark.range(1).select(col("id").as("k") +:
        (0 until nc).map(c => col("id").as(s"c$c")): _*).schema.json
      val files = (0 until nf).map { i =>
        SnapshotTable.DataFileMeta(
          s"data/$i.parquet", 1000L, 128L * 1024 * 1024,
          i * 1000L, i * 1000L + 999L,
          (0 until nc).map(c => s"c$c" -> (i * 10L, i * 10L + 9L)).toMap)
      }
      val (_, tCommit) = timed {
        SnapshotTable.tryCommit(spark, root,
          SnapshotTable.Manifest(1, 0, "create", "k", schema, files,
            addedPaths = Some(Set.empty)))
      }
      val maniBytes = hfs.getFileStatus(
        new Path(root, f"meta/v${1}%08d.manifest")).getLen
      val tRead = median((1 to reps).map { _ =>
        timed(SnapshotTable.readManifest(hfs, root, 1))._2
      })
      val tSummary = median((1 to reps).map { _ =>
        timed(SnapshotTable.readManifestSummary(hfs, root, 1))._2
      })
      println(f"stats files=$nf cols=$nc manifest=${maniBytes / 1e6}%.1f MB " +
        f"commit=$tCommit%.3f s readManifest=$tRead%.3f s " +
        f"summary=$tSummary%.4f s")
    }
    spark.stop()
  }
}
