package graft.app

import graft.fetch.Downloader
import graft.fetch.Downloader.DownloadTask
import graft.functions.{TextFunctions => T}
import graft.operators.{DeltaOps, ParsePipeline}
import graft.sources.{CsvMeta, PageSource}
import graft.state.StateStore
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's four CLI entry points (SURVEY §3) as Spark jobs.
  *
  *  - scrape       → cli.py:236-379  (full scan with resume)
  *  - delta        → scripts/delta_download.py:167-211 (incremental)
  *  - status       → cli.py:382-413  (state summary)
  *  - retry-failed → cli.py:416-461  (DLQ replay)
  *  - reset        → cli.py:464-502
  *
  * All jobs run offline against fixture pages (`--pages <dir>` with
  * `page_<n>.html` files) and a stub fetch, or online by passing a real
  * base URL and [[Downloader.httpFetch]] — the pipeline shape is identical.
  * Run via: spark-submit --class graft.app.Jobs <jar> <command> <workDir>
  * <productType> [pagesDir]
  */
object Jobs {

  /** Deterministic offline fetch: "downloads" a URL as its UTF-8 bytes. */
  def stubFetch: String => Array[Byte] = url => s"CONTENT:$url".getBytes("UTF-8")

  def csvPath(workDir: String, productType: String) =
    s"$workDir/metadata/${productType}_products.csv"

  /** §3.1/§3.2 shared core: pages → parse → delta → tasks → fetch →
    * enrich → append. Returns (newRows, successes, failures) counts.
    */
  def runPipeline(spark: SparkSession, state: StateStore, workDir: String,
                  productType: String, pages: Dataset[ParsePipeline.PageHtml],
                  fetch: String => Array[Byte],
                  metadataOnly: Boolean = false): (Long, Long, Long) = {
    // G1-G4 + P* + F*: pages → typed rows, stamped (X12).
    val parsed = ParsePipeline.withScrapedAt(
      ParsePipeline.parse(spark, pages, productType))

    // J1: only rows whose document_url is NOT already in the metadata CSV.
    // `fresh` MUST be pinned before the CSV append below mutates its input:
    // a lazy re-evaluation after the append would re-read the grown CSV and
    // see an empty delta (SURVEY §7.4 — checkpoint before side effects).
    val existing = CsvMeta.loadExistingUrls(spark, csvPath(workDir, productType))
    val fresh = DeltaOps.delta(
      parsed.where(col("document_url").isNotNull),
      existing,
      "document_url")
      .unionByName(parsed.where(col("document_url").isNull))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freshCount = fresh.count()

    if (metadataOnly) { // F6: skip the download stage entirely
      CsvMeta.append(fresh, productType, csvPath(workDir, productType))
      fresh.unpersist()
      return (freshCount, 0L, 0L)
    }

    // F3 + X7/X9: downloadable rows → tasks with computed destinations.
    val tasks = fresh.where(col("document_url").isNotNull)
      .select(col("document_url").as("url"),
        concat(lit(s"$workDir/downloads/$productType/"),
          T.sanitizeFilename(coalesce(col("document_filename"),
            T.filenameFromUrl(col("document_url")),
            T.urlHash(col("document_url")).cast("string")))).as("destination"))

    // J2: drop tasks already completed in a prior run (T3 exactly-once).
    val pending = state.filterPending(tasks, "url")
      .as(Encoders.product[DownloadTask])

    // S6-S8 fetch; checkpoint results BEFORE any join (SURVEY §7.4).
    val results = Downloader.download(pending, fetch).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (ok, bad) = Downloader.splitResults(results)

    // T3/T4 state commits.
    state.markCompleted(ok.select("url"))
    if (bad.take(1).nonEmpty) state.markFailed(bad.select("url", "error"))

    // J3: enrich products with their download outcome, then K1 append.
    val enriched = DeltaOps.enrich(
      fresh,
      results.select(col("url").as("document_url"), col("file_path").as("local_file_path"),
        col("file_size"), col("success")),
      "document_url", "file_size")
      .drop("file_size", "success")
    CsvMeta.append(enriched, productType, csvPath(workDir, productType))

    val counts = (freshCount, ok.count(), bad.count())
    results.unpersist()
    fresh.unpersist()
    counts
  }

  /** §3.1 scrape: resume from state, scan [resume..totalPages]. */
  def scrape(spark: SparkSession, workDir: String, productType: String,
             pagesDir: String, totalPages: Int,
             fetch: String => Array[Byte] = stubFetch): (Long, Long, Long) = {
    val state = new StateStore(spark, s"$workDir/state")
    state.startSession(productType, totalPages)
    val start = state.resumePage(productType)
    if (start > totalPages) return (0L, 0L, 0L)
    val pages = PageSource.fixtureScan(spark, productType, pagesDir, start, totalPages)
    val out = runPipeline(spark, state, workDir, productType, pages, fetch)
    state.updateProgress(productType, totalPages, out._1)
    state.completeSession(productType)
    out
  }

  /** §3.2 delta: one incremental pass over the full page range. */
  def delta(spark: SparkSession, workDir: String, productType: String,
            pagesDir: String, totalPages: Int,
            fetch: String => Array[Byte] = stubFetch): (Long, Long, Long) = {
    val state = new StateStore(spark, s"$workDir/state")
    val pages = PageSource.fixtureScan(spark, productType, pagesDir, 1, totalPages)
    runPipeline(spark, state, workDir, productType, pages, fetch)
  }

  /** §3.3 status: session summary + completed/failed counts (A3/A6). */
  def status(spark: SparkSession, workDir: String): DataFrame =
    new StateStore(spark, s"$workDir/state").summary

  /** §3.3 retry-failed: replay the DLQ; successes leave it (J4). */
  def retryFailed(spark: SparkSession, workDir: String,
                  fetch: String => Array[Byte] = stubFetch): (Long, Long) = {
    val state = new StateStore(spark, s"$workDir/state")
    val tasks = state.failed.select(col("url"),
      concat(lit(s"$workDir/downloads/retry/"),
        coalesce(T.filenameFromUrl(col("url")),
          concat(lit("file_"), T.urlHash(col("url")).cast("string")))).as("destination"))
      .as(Encoders.product[DownloadTask])
    val results = Downloader.download(tasks, fetch).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (ok, bad) = Downloader.splitResults(results)
    state.markCompleted(ok.select("url"))
    state.clearSucceeded(ok.select("url"))
    if (bad.take(1).nonEmpty) state.markFailed(bad.select("url", "error"))
    val counts = (ok.count(), bad.count())
    results.unpersist()
    counts
  }

  /** §3.3 reset: drop session state (and optionally the CSV). */
  def reset(spark: SparkSession, workDir: String, productType: String,
            clearCsv: Boolean = false): Unit = {
    new StateStore(spark, s"$workDir/state").resetSession(productType)
    if (clearCsv) CsvMeta.clear(spark, csvPath(workDir, productType))
  }

  /** §3.3 reset-all: every product type in one sweep
    * (csv_writer.py:112-126 clears ALL tables, not one).
    */
  def resetAll(spark: SparkSession, workDir: String,
               clearCsv: Boolean = false): Unit =
    CsvMeta.columns.keys.foreach(reset(spark, workDir, _, clearCsv))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "scrape" :: workDir :: pt :: pagesDir :: total :: Nil =>
        val (n, ok, bad) = scrape(spark, workDir, pt, pagesDir, total.toInt)
        println(s"scrape: $n new rows, $ok downloaded, $bad failed")
      case "delta" :: workDir :: pt :: pagesDir :: total :: Nil =>
        val (n, ok, bad) = delta(spark, workDir, pt, pagesDir, total.toInt)
        println(s"delta: $n new rows, $ok downloaded, $bad failed")
      case "status" :: workDir :: Nil => status(spark, workDir).show(truncate = false)
      case "retry-failed" :: workDir :: Nil =>
        val (ok, bad) = retryFailed(spark, workDir)
        println(s"retry: $ok recovered, $bad still failing")
      case "reset" :: workDir :: pt :: Nil => reset(spark, workDir, pt)
      case other => sys.error(s"usage: scrape|delta|status|retry-failed|reset ... (got $other)")
    }
    spark.stop()
  }
}
