package graft.sources.v2

import graft.sources.PageSource
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 surface for the paginated page source (SURVEY §7's
  * optional `spark.read.format(...)` ergonomics over S1/S2/O1/O2 —
  * the [[graft.sources.PageSource]] Dataset builder remains the
  * programmatic path; this wraps the SAME semantics for SQL/reader
  * users):
  *
  * {{{
  *   spark.read.format("graft-pages")
  *     .option("dir", "/fixtures/life")      // fixture mode: page_N.html
  *     .option("productType", "life")
  *     .option("pages", "1-12")
  *     .load()
  *     .where($"page" <= 3)                   // pruned at the SOURCE
  * }}}
  *
  * Shape: one InputPartition per page by default — the fetch
  * parallelism unit the reference's asyncio gather loop had
  * (base.py:119-133), here as independent Spark tasks with per-page
  * error isolation (a throwing fetch yields an empty-HTML row, parity
  * with `continue`-on-error). For large page ranges the per-TASK
  * scheduling floor dominates a per-page split (measured: a 10k-page
  * fixture scan spent ~5 s on task scheduling alone — SCALING.md), so
  * `pagesPerPartition` batches consecutive pages into one task; error
  * isolation stays per page either way, since rows are emitted page by
  * page inside the reader. Two pushdowns run below the optimizer:
  *
  *  - '''Partition pruning''' — page-range predicates
  *    (`page =/</<=/>/>=`) tighten the planned page range, so a pruned
  *    scan never schedules the excluded pages at all (O2 enforced at
  *    the source, visible as fewer input partitions rather than a
  *    post-scan filter).
  *  - '''Column pruning''' — `SupportsPushDownRequiredColumns`: the one
  *    heavy column is `html`, and a scan that does not read it
  *    (`select("page")`, `count()`) never performs the fixture read or
  *    HTTP GET at all. This is the DSv2 analog of the reference's
  *    deliberate metadata-only probe (base.py:58-72 fetches ONE page to
  *    count, never the corpus) and of Spark file sources pruning
  *    columns at the scan.
  *
  * The same table also supports `spark.readStream` (MICRO_BATCH_READ):
  * offsets are page numbers, `maxPagesPerTrigger` rate-limits a
  * backlog, and the checkpoint replaces the reference's hand-rolled
  * scan-progress state — see [[PageMicroBatchStream]].
  *
  * Modes: `dir` reads `${dir}/page_${n}.html` fixtures (offline,
  * test-driven); otherwise `baseUrl`/`urlPath`/`portletId` fetch over
  * HTTP via the S2 URL builder. The HTTP branch uses `java.net.http`
  * with an explicit per-page deadline — `pageTimeoutSec` option,
  * default 60, parity with the reference's `REQUEST_TIMEOUT = 60`
  * (config.py:36) and with [[graft.fetch.Downloader.httpFetch]]'s
  * client. A bare `URL.openStream()` (JDK default = infinite
  * connect/read timeout) would let ONE hung page server stall a Spark
  * task — and therefore the whole scan — forever; a timed-out page is
  * instead an empty-HTML row like any other per-page failure.
  */
class PageTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PageTableProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PageTable(new CaseInsensitiveStringMap(properties))
}

object PageTableProvider {
  val Schema: StructType = StructType(Seq(
    StructField("product_type", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("html", StringType, nullable = false)))

  private[v2] def parsePages(s: String): (Int, Int) = s.split("-", 2) match {
    case Array(a, b) => (a.trim.toInt, b.trim.toInt)
    case Array(a) => (a.trim.toInt, a.trim.toInt)
  }
}

private[v2] class PageTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_pages"
  override def schema(): StructType = PageTableProvider.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap)
      : ScanBuilder = {
    // merge table properties with read options (read options win)
    val merged = new java.util.HashMap[String, String]()
    merged.putAll(options)
    merged.putAll(caseInsensitiveOptions)
    new PageScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[v2] class PageScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val (optLo, optHi) =
    PageTableProvider.parsePages(options.getOrDefault("pages", "1-1"))
  private var lo = optLo
  private var hi = optHi
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PageTableProvider.Schema

  /** O2 below the optimizer: page-range predicates tighten [lo, hi]
    * before partitions are planned. Accepted filters are fully applied
    * (the range IS the predicate), so they are not re-evaluated above.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("page", v: Int) => lo = math.max(lo, v); hi = math.min(hi, v); true
      // the strict comparisons adjust by one; at Int boundary values that
      // would overflow and silently UNtighten an accepted (= removed from
      // post-scan evaluation) filter — leave those to Spark instead
      case GreaterThan("page", v: Int) if v < Int.MaxValue => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("page", v: Int) => lo = math.max(lo, v); true
      case LessThan("page", v: Int) if v > Int.MinValue => hi = math.min(hi, v - 1); true
      case LessThanOrEqual("page", v: Int) => hi = math.min(hi, v); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Column pruning: Spark hands down the columns the query actually
    * reads (possibly none, for `count()`); the readers emit exactly
    * those and — the point — skip the page fetch entirely when `html`
    * is not among them.
    */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages [$lo, $hi] ${options.getOrDefault("productType", "")} " +
      s"cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = options.getOrDefault("pagesPerPartition", "1").toInt
    require(per >= 1, s"pagesPerPartition must be >= 1, got $per")
    (lo to hi).grouped(per)
      .map(g => PagePartition(g.head, g.last): InputPartition).toArray
  }

  /** T1/T2 over the same source: `spark.readStream.format("graft-pages")`
    * turns the paginated scrape into a resumable micro-batch stream —
    * the reference's incremental re-scrape loop (run N picks up where
    * run N−1 stopped) expressed as Structured Streaming offsets. The
    * offset IS the last ingested page number, so the checkpoint replaces
    * the reference's hand-rolled state file for scan progress. Reuses
    * this builder's pruned range, reader factory, and per-page error
    * isolation unchanged.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val per = options.getOrDefault("pagesPerPartition", "1").toInt
    require(per >= 1, s"pagesPerPartition must be >= 1, got $per")
    // streaming readers PROPAGATE fetch failures (failOnFetchError):
    // the batch side's swallow-to-empty-row isolation is safe there
    // because the caller sees the empty row in the same result it reads
    // — but a micro-batch COMMITS its end offset, so an empty-row page
    // would be permanently lost (the offset moves past it and no later
    // trigger ever replans it). Failing the task instead fails the
    // micro-batch before the commit, and the retriggered batch refetches
    // the same page range — at-least-once planning, exactly-once commit.
    new PageMicroBatchStream(options, lo, hi, per,
      () => mkReaderFactory(failOnFetchError = true))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    mkReaderFactory(failOnFetchError = false)

  private def mkReaderFactory(failOnFetchError: Boolean): PartitionReaderFactory = {
    val productType = options.getOrDefault("productType", "unknown")
    val dir = options.get("dir")
    val baseUrl = options.get("baseUrl")
    // config validation happens HERE, driver-side: the per-page catch in
    // the reader exists to isolate genuine fetch failures and would
    // otherwise swallow this misconfiguration into empty-HTML rows
    if (dir == null && baseUrl == null)
      throw new IllegalArgumentException(
        "graft-pages needs either dir (fixture mode) or baseUrl (HTTP mode)")
    val urlPath = options.getOrDefault("urlPath", "")
    val portletId = options.getOrDefault("portletId", "")
    val perPage = options.getOrDefault("itemsPerPage", "60").toInt
    val timeoutSec = options.getOrDefault("pageTimeoutSec", "60").toLong
    require(timeoutSec > 0, s"pageTimeoutSec must be positive, got $timeoutSec")
    PageReaderFactory(productType, Option(dir), Option(baseUrl),
      urlPath, portletId, perPage, timeoutSec, required.fieldNames.toSeq,
      failOnFetchError)
  }
}

private[v2] case class PagePartition(lo: Int, hi: Int) extends InputPartition

/** Stream position = highest page already ingested ("page 0" = nothing
  * yet). Monotone, dense, and human-readable in the checkpoint.
  */
private[v2] case class PageStreamOffset(page: Int) extends Offset {
  override def json(): String = s"""{"page":$page}"""
}

/** Micro-batch stream over the page range: each trigger ingests the
  * pages that became available since the last committed offset,
  * optionally capped by `maxPagesPerTrigger` (admission control — the
  * streaming twin of the batch side's `pagesPerPartition` task-floor
  * fix: a huge backlog drains in bounded batches instead of one
  * monster micro-batch).
  *
  * "Available" is mode-specific: fixture mode discovers the highest
  * `page_N.html` present on each trigger (the scrape-in-progress case —
  * new pages appear between triggers and are picked up incrementally,
  * like a file-source directory listing); HTTP mode treats the
  * configured range end as available (the reference scrapes a range it
  * sized via the S3 cardinality probe; the probe stays a batch-side
  * concern so the stream never issues speculative GETs past the range).
  *
  * Restart semantics come from the engine: the checkpointed offset is
  * handed back via [[deserializeOffset]] and planning resumes at
  * offset+1 — exactly-once page ingestion with no source-side state
  * (T2's kill-and-resume contract, pinned in PageStreamSpec).
  */
private[v2] class PageMicroBatchStream(
    options: CaseInsensitiveStringMap, lo: Int, hi: Int, pagesPerPartition: Int,
    mkFactory: () => PartitionReaderFactory)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val maxPerTrigger: Option[Int] =
    Option(options.get("maxPagesPerTrigger")).map { s =>
      val m = s.toInt
      require(m >= 1, s"maxPagesPerTrigger must be >= 1, got $m")
      m
    }
  private val fixtureDir: Option[String] = Option(options.get("dir"))

  /** Highest page currently available, clamped to the configured range.
    * Fixture mode returns the CONTIGUOUS prefix end, not the raw max:
    * if page_5.html exists while page_4.html is still being written, a
    * max-based answer would plan page 4 now — and since streaming
    * readers propagate fetch failures (failOnFetchError), the trigger
    * would fail-loop on the gap until the writer catches up. The prefix
    * rule waits at the gap instead, so a page is only ever planned once
    * it (and everything before it) actually exists. HTTP mode has no
    * listing to probe, so the configured range end is "available" and
    * the propagate-on-failure readers are the loss guard there: a
    * failed GET fails the micro-batch BEFORE the offset commits.
    */
  private def available(): Int = fixtureDir match {
    case Some(d) =>
      val names = Option(new java.io.File(d).list()).getOrElse(Array.empty)
      val pages = names.flatMap(n =>
        "^page_(\\d+)\\.html$".r.findFirstMatchIn(n).map(_.group(1).toInt)).toSet
      var p = lo - 1
      while (p < hi && pages.contains(p + 1)) p += 1
      p
    case None => hi
  }

  // Trigger.AvailableNow contract: snapshot the backlog end ONCE at
  // query start, then drain up to it in maxPagesPerTrigger-capped
  // micro-batches and stop. Without this interface Spark wraps the
  // source and drains the whole backlog as ONE batch, silently
  // discarding admission control (measured: a 10k-page drain at
  // cap=100 ran 1 batch, not 100); pages appearing AFTER the snapshot
  // are deliberately left for the next run — that is the semantics
  // that makes AvailableNow restart-safe.
  private var availableNowEnd: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(available())
  private def availableEnd(): Int = availableNowEnd.getOrElse(available())

  override def initialOffset(): Offset = PageStreamOffset(lo - 1)

  override def deserializeOffset(json: String): Offset =
    PageStreamOffset("\"page\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(
        s"not a graft-pages offset: $json"))
      .group(1).toInt)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.fold(ReadLimit.allAvailable())(ReadLimit.maxRows(_))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl: latestOffset(start, limit) is the entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[PageStreamOffset].page
    // honor the ENGINE's limit, not the captured option: the engine
    // passes our getDefaultReadLimit on normal triggers but explicitly
    // overrides it (ReadAllAvailable) for single-batch runs — using the
    // captured cap there would terminate a Trigger-Once drain after one
    // capped batch, silently stranding the rest of the backlog
    val capped = limit match {
      case rows: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(availableEnd().toLong, from + rows.maxRows()).toInt
      case _ => availableEnd()
    }
    // never regress below the committed start: a transient unlistable /
    // empty fixture dir would otherwise hand back lo-1, commit it, and
    // make the next healthy trigger re-ingest (duplicate) every page
    PageStreamOffset(math.max(from, capped))
  }

  override def reportLatestOffset(): Offset = PageStreamOffset(available())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageStreamOffset].page
    val e = end.asInstanceOf[PageStreamOffset].page
    ((s + 1) to e).grouped(pagesPerPartition)
      .map(g => PagePartition(g.head, g.last): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = mkFactory()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[v2] case class PageReaderFactory(
    productType: String, dir: Option[String], baseUrl: Option[String],
    urlPath: String, portletId: String, itemsPerPage: Int,
    pageTimeoutSec: Long, requiredCols: Seq[String],
    failOnFetchError: Boolean)
    extends PartitionReaderFactory {

  // one HTTP client per executor-side factory instance (it is not
  // serializable, so it cannot ride along from the driver); connect
  // deadline here, per-request deadline on each GET below. JDK
  // semantics: HttpRequest.timeout covers connect + time-to-response;
  // a server that answers headers and then trickles the body is not
  // bounded by it — same trade [[graft.fetch.Downloader.httpFetch]]
  // makes, and the hang mode actually observed (dead server, stalled
  // connect) is covered.
  @transient private lazy val httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(pageTimeoutSec))
      .build()

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var page = part.lo - 1
      override def next(): Boolean = { page += 1; page <= part.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(requiredCols.map {
          case "product_type" => UTF8String.fromString(productType)
          case "page" => page
          case "html" =>
            // per-page error isolation (BATCH ONLY): a throwing fetch —
            // including an HTTP timeout — yields "" (the downstream parse
            // treats a missing table as zero rows); reached ONLY when the
            // query reads html, so pruned scans never pay the fetch.
            // STREAMING readers propagate instead (failOnFetchError): an
            // empty row under a committed offset is a silently lost page,
            // so the micro-batch must fail before the commit and retry.
            val html =
              if (failOnFetchError) fetchPage(page)
              else try fetchPage(page) catch { case _: Exception => "" }
            UTF8String.fromString(html)
        })
      override def close(): Unit = ()
    }
  }

  private def fetchPage(page: Int): String = dir match {
    case Some(d) => PageSource.readFixture(d, page)
    case None =>
      val url = PageSource.buildPageUrl(baseUrl.get, urlPath, portletId,
        page, itemsPerPage)
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(pageTimeoutSec)).GET().build()
      val resp = httpClient.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString(
          java.nio.charset.StandardCharsets.UTF_8))
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
      resp.body()
  }
}
