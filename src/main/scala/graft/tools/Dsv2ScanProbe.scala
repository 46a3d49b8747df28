package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md probe for the `graft-pages` DataSource V2 scan: writes a
  * fixture corpus of N realistic pages (60 table rows each, ~17 KB of
  * HTML per page — the reference's itemsPerPage), then times, median of
  * 5 steady-state reps each:
  *
  *  - `full`:   scan all columns → parse pipeline (explode + life
  *              projection) → count. The real ingest shape: N fetch
  *              tasks, zero shuffles, work linear in pages.
  *  - `pruned`: `select("page")` → count. Exercises
  *              SupportsPushDownRequiredColumns — the html column is
  *              never read, so cost is task-scheduling floor only and
  *              must stay ~flat as the corpus grows.
  *
  * Usage: runMain graft.tools.Dsv2ScanProbe <pages> [reps]
  * Prints one JSON line {"pages":N,"full_sec":…,"pruned_sec":…}.
  */
object Dsv2ScanProbe {

  private[tools] def writeFixtures(dir: java.nio.file.Path, pages: Int): Unit = {
    def tds(cells: Seq[String]): String =
      "<tr>" + cells.map(c => s"<td>$c</td>").mkString + "</tr>"
    (1 to pages).foreach { p =>
      val rows = (0 until 60).map { r =>
        val i = p * 60 + r
        tds(Seq("<input/>", "Non-Archived", s"FY ${2000 + i % 25}", s"Insurer $i",
          s"Plan name number $i", s"UIN$i", "Term", "", "", "P", "Par", "Ind", "",
          s"<a href='/documents/product_$i.pdf'>Document $i</a>"))
      }.mkString
      java.nio.file.Files.writeString(dir.resolve(s"page_$p.html"),
        s"<div class='portlet'><table class='iq-table'><tbody>$rows</tbody></table></div>")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Dsv2ScanProbe <pages> [reps]")
    val pages = args(0).toInt
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2-probe")
    try {
      writeFixtures(dir, pages)
      // per-page tasks (the default) vs batched: ~4 partitions per core
      val batch = math.max(1, pages / (spark.sparkContext.defaultParallelism * 4))
      def scan(per: Int) = spark.read.format("graft-pages")
        .option("dir", dir.toString).option("productType", "life")
        .option("pages", s"1-$pages")
        .option("pagesPerPartition", per.toString).load()

      def full(per: Int)(): Long = graft.operators.ParsePipeline.life(
        graft.operators.ParsePipeline.explodeRows(
          scan(per).select(col("product_type").as("productType"), col("page"), col("html"))
            .as[graft.operators.ParsePipeline.PageHtml]).toDF()).count()
      def pruned(per: Int)(): Long = scan(per).select("page").count()

      def medianOf(f: () => Long): Double = {
        f() // untimed warm rep (codegen + JIT)
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.sorted
        ts((ts.size - 1) / 2)
      }
      val expected = pages.toLong * 60
      require(full(1)() == expected, s"parse lost rows: ${full(1)()} != $expected")
      require(full(batch)() == expected, s"batched parse lost rows vs $expected")
      val fullSec = medianOf(full(1))
      val prunedSec = medianOf(pruned(1))
      val fullBatched = medianOf(full(batch))
      val prunedBatched = medianOf(pruned(batch))
      println(f"""{"pages":$pages,"rows":$expected,"batch":$batch,"full_sec":$fullSec%.3f,"pruned_sec":$prunedSec%.3f,"full_batched_sec":$fullBatched%.3f,"pruned_batched_sec":$prunedBatched%.3f}""")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
      spark.stop()
    }
  }
}

/** SCALING.md probe for the `graft-pages` STREAMING read: drains the
  * same fixture backlog the batch probe above scans, as Structured
  * Streaming micro-batches, at several `maxPagesPerTrigger` admission
  * caps — measuring what the admission control itself costs. Each cap
  * runs the FULL ingest shape (scan → explode → life projection) into
  * the noop streaming sink under `Trigger.AvailableNow()` (drain the
  * backlog, respecting the cap, then stop). Reported per cap: wall
  * seconds, micro-batch count, and seconds/batch; the batch-mode scan
  * of the identical corpus prints alongside as the zero-trigger
  * baseline, so (streamed wall − batch wall) / batches is the
  * per-trigger planning+commit overhead.
  *
  * Usage: runMain graft.tools.PageStreamProbe <pages> [caps,csv]
  * Prints one JSON line.
  */
object PageStreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PageStreamProbe <pages> [caps,csv]")
    val pages = args(0).toInt
    val caps = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(100, 1000))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-stream-probe")
    try {
      Dsv2ScanProbe.writeFixtures(dir, pages)
      val par = spark.sparkContext.defaultParallelism
      def pipeline(df: org.apache.spark.sql.DataFrame) =
        graft.operators.ParsePipeline.life(
          graft.operators.ParsePipeline.explodeRows(
            df.select(col("product_type").as("productType"), col("page"), col("html"))
              .as[graft.operators.ParsePipeline.PageHtml]).toDF())

      // batch baseline: same corpus, same task sizing, no triggers
      val batchPer = math.max(1, pages / (par * 4))
      def batchScan() = pipeline(spark.read.format("graft-pages")
        .option("dir", dir.toString).option("productType", "life")
        .option("pages", s"1-$pages")
        .option("pagesPerPartition", batchPer.toString).load()).count()
      batchScan() // warm (codegen + JIT)
      val b0 = System.nanoTime()
      val batchRows = batchScan()
      val batchSec = (System.nanoTime() - b0) / 1e9

      val perCap = caps.map { cap =>
        // size partitions so each micro-batch still fills the cores
        val per = math.max(1, cap / par)
        val ckpt = java.nio.file.Files.createTempDirectory("graft-probe-ckpt")
        try {
          val stream = pipeline(spark.readStream.format("graft-pages")
            .option("dir", dir.toString).option("productType", "life")
            .option("pages", s"1-$pages")
            .option("maxPagesPerTrigger", cap.toString)
            .option("pagesPerPartition", per.toString).load())
          val t0 = System.nanoTime()
          val q = stream.writeStream.format("noop")
            .option("checkpointLocation", ckpt.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val sec = (System.nanoTime() - t0) / 1e9
          val batches = Option(q.lastProgress).map(_.batchId + 1).getOrElse(-1L)
          (cap, sec, batches)
        } finally {
          // the offset/commit logs are per-run scratch, not resume state
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
          }
          rm(ckpt.toFile)
        }
      }
      val capJson = perCap.map { case (cap, sec, n) =>
        f""""cap_$cap":{"wall_sec":$sec%.3f,"batches":$n,"sec_per_batch":${sec / math.max(1, n)}%.4f,"trigger_overhead_sec":${(sec - batchSec) / math.max(1, n)}%.4f}"""
      }.mkString(",")
      println(f"""{"pages":$pages,"rows":$batchRows,"batch_sec":$batchSec%.3f,$capJson}""")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
      spark.stop()
    }
  }
}
