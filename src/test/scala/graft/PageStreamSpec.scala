package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetAddress, InetSocketAddress}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming read of the DSv2 page source: the reference's incremental
  * re-scrape loop (each run resumes where the last stopped) as
  * Structured Streaming micro-batches. Offsets are page numbers; the
  * checkpoint carries the scan progress, so kill-and-resume ingests
  * every page exactly once with no source-side state.
  */
class PageStreamSpec extends SparkSpec {

  private def writePages(dir: String, pages: Range): Unit =
    pages.foreach { p =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, s"page_$p.html"),
        s"<html>fixture for page $p</html>")
    }

  private def startStream(dir: String, sinkName: String,
                          checkpoint: String,
                          maxPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.format("graft-pages")
      .option("dir", dir).option("productType", "life")
      .option("pages", "1-1000")
    val withCap = maxPerTrigger.fold(reader)(m =>
      reader.option("maxPagesPerTrigger", m.toString))
    withCap.load()
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", checkpoint)
      .start()
  }

  private def sunkPages(sinkName: String): Seq[Int] =
    spark.table(sinkName).select("page").collect().map(_.getInt(0)).toSeq

  test("drains the available fixtures, then picks up pages appearing later") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    writePages(dir, 1 to 3)
    val q = startStream(dir, "pages_grow", ckpt)
    try {
      q.processAllAvailable()
      assert(sunkPages("pages_grow").sorted == (1 to 3))
      // the scrape advances between triggers; the stream must notice
      writePages(dir, 4 to 5)
      q.processAllAvailable()
      assert(sunkPages("pages_grow").sorted == (1 to 5),
        "new fixture pages must be ingested exactly once")
    } finally q.stop()
  }

  test("maxPagesPerTrigger drains a backlog in bounded micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    writePages(dir, 1 to 7)
    val q = startStream(dir, "pages_capped", ckpt, maxPerTrigger = Some(3))
    try {
      q.processAllAvailable()
      assert(sunkPages("pages_capped").sorted == (1 to 7))
      val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.nonEmpty && batchSizes.forall(_ <= 3),
        s"every micro-batch must respect the cap: ${batchSizes.mkString(",")}")
      assert(batchSizes.length >= 3, // 7 pages / cap 3
        s"a 7-page backlog at cap 3 needs >= 3 batches: ${batchSizes.mkString(",")}")
    } finally q.stop()
  }

  test("a gap in the fixture pages stalls ingestion at the gap instead of skipping it") {
    // page_5 landing before page_4 (mid-write race) must NOT advance the
    // offset past 4 — a max-based availability would ingest 4 as an
    // empty row and permanently lose it once the offset commits
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    writePages(dir, 1 to 2)
    writePages(dir, 5 to 5) // gap: 3 and 4 missing
    val q = startStream(dir, "pages_gap", ckpt)
    try {
      q.processAllAvailable()
      assert(sunkPages("pages_gap").sorted == (1 to 2),
        "ingestion must wait at the gap, not jump to the max page")
      writePages(dir, 3 to 4) // the gap fills
      q.processAllAvailable()
      assert(sunkPages("pages_gap").sorted == (1 to 5),
        "filled gap pages must arrive with real content, exactly once")
    } finally q.stop()
  }

  test("a transient empty fixture dir never regresses the offset (no re-ingest)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    writePages(dir, 1 to 2)
    val q = startStream(dir, "pages_transient", ckpt)
    try {
      q.processAllAvailable()
      assert(sunkPages("pages_transient").sorted == (1 to 2))
      // every fixture vanishes for a trigger (the NFS-hiccup shape);
      // available() sees nothing, but the offset must hold at 2
      (1 to 2).foreach(p => java.nio.file.Files.delete(
        java.nio.file.Paths.get(dir, s"page_$p.html")))
      q.processAllAvailable()
      assert(sunkPages("pages_transient").sorted == (1 to 2))
      // dir comes back with one NEW page: only page 3 may arrive —
      // a regressed offset would re-ingest 1-2 as duplicates here
      writePages(dir, 1 to 3)
      q.processAllAvailable()
      assert(sunkPages("pages_transient").sorted == (1 to 3),
        "recovery must ingest exactly the new page, no duplicates")
    } finally q.stop()
  }

  test("Trigger.Once overrides maxPagesPerTrigger (engine ReadLimit wins)") {
    // the engine passes ReadAllAvailable for single-batch runs; using
    // the captured cap instead would drain 3 of 7 pages and terminate
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    writePages(dir, 1 to 7)
    val q = spark.readStream.format("graft-pages")
      .option("dir", dir).option("productType", "life")
      .option("pages", "1-1000").option("maxPagesPerTrigger", "3")
      .load()
      .writeStream.format("memory").queryName("pages_once")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    try {
      assert(q.awaitTermination(60000),
        "the single-batch drain must terminate within the deadline")
      assert(sunkPages("pages_once").sorted == (1 to 7),
        "a single-batch run must drain the whole backlog")
    } finally q.stop() // a hung drain must not leak into later tests
  }

  test("the whole scrape pipeline runs as ONE streaming query: pages -> rows -> life projection") {
    // the reference's end-to-end loop (fetch page, parse table, project
    // fields, append) as a single incremental query — G2/P1 stages are
    // narrow (flatMap/filter/select), so they stream unchanged
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    def tds(cells: String*): String =
      "<tr>" + cells.map(c => s"<td>$c</td>").mkString + "</tr>"
    def writeProductPages(pages: Range): Unit = pages.foreach { p =>
      val row = tds("<input/>", "Non-Archived", s"FY 202$p", s"Ins$p", s"Plan$p",
        s"UIN$p", "Term", "", "", "P", "Par", "Ind", "",
        s"<a href='/documents/p$p.pdf'>Doc $p</a>")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, s"page_$p.html"),
        s"<div class='portlet'><table class='iq-table'><tbody>$row</tbody></table></div>")
    }
    writeProductPages(1 to 3)
    val pages = spark.readStream.format("graft-pages")
      .option("dir", dir).option("productType", "life")
      .option("pages", "1-1000").load()
      .select($"product_type".as("productType"), $"page", $"html")
      .as[graft.operators.ParsePipeline.PageHtml]
    val projected = graft.operators.ParsePipeline.life(
      graft.operators.ParsePipeline.explodeRows(pages).toDF())
    val q = projected.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val first = spark.read.parquet(out)
      assert(first.count() == 3)
      assert(first.select("uin").as[String].collect().sorted.toSeq ==
        Seq("UIN1", "UIN2", "UIN3"))
      // the scrape advances; the SAME query picks up and projects page 4
      writeProductPages(4 to 4)
      q.processAllAvailable()
      val after = spark.read.parquet(out)
      assert(after.count() == 4)
      assert(after.where($"uin" === "UIN4")
        .select("document_url").as[String].head.endsWith("/documents/p4.pdf"))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in CAPPED micro-batches, then stops") {
    // Trigger.Once ignores admission control by design (one batch);
    // AvailableNow is the drain that respects it — which requires the
    // source to implement SupportsTriggerAvailableNow, or Spark's
    // wrapper silently collapses the drain into one uncapped batch
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    writePages(dir, 1 to 10)
    val q = spark.readStream.format("graft-pages")
      .option("dir", dir).option("productType", "life")
      .option("pages", "1-1000").option("maxPagesPerTrigger", "3")
      .load()
      .writeStream.format("memory").queryName("pages_availnow")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000), "the drain must terminate on its own")
      assert(sunkPages("pages_availnow").sorted == (1 to 10))
      val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.forall(_ <= 3),
        s"every micro-batch must respect the cap: ${batchSizes.mkString(",")}")
      assert(batchSizes.length >= 4, // ceil(10/3)
        s"a 10-page backlog at cap 3 needs >= 4 batches: ${batchSizes.mkString(",")}")
    } finally q.stop()
  }

  test("HTTP streaming: a failed fetch fails the micro-batch BEFORE the offset commits — no silent page loss") {
    // the batch scan's swallow-to-empty-row isolation would be a silent
    // PERMANENT loss here: the micro-batch commits its end offset, so an
    // empty-row page is never replanned. Streaming readers propagate the
    // failure instead; the retriggered (here: restarted) query refetches
    // the same page and delivers the real content exactly once.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val broken = new java.util.concurrent.atomic.AtomicBoolean(true)
    val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try {
        val page = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
          .collectFirst { case s if s.startsWith("_pp_cur=") =>
            s.stripPrefix("_pp_cur=").toInt }.getOrElse(-1)
        val body =
          if (page == 2 && broken.get()) Array.empty[Byte]
          else s"<html>page $page</html>".getBytes("UTF-8")
        val code = if (page == 2 && broken.get()) 500 else 200
        ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
        if (body.nonEmpty) { val os = ex.getResponseBody; os.write(body); os.close() }
      } finally ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2,
      r => { val t = new Thread(r); t.setDaemon(true); t }))
    server.start()
    try {
      val base = s"http://${server.getAddress.getAddress.getHostAddress}:${server.getAddress.getPort}"
      // parquet sink: the memory sink cannot recover from a checkpoint,
      // and the restart-after-heal IS the contract under test
      val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
      def start(): StreamingQuery = spark.readStream
        .format("graft-pages")
        .option("baseUrl", base).option("urlPath", "/list")
        .option("portletId", "pp").option("productType", "life")
        .option("pages", "1-3").option("pageTimeoutSec", "10")
        .option("maxPagesPerTrigger", "1") // page-per-batch: page 1 commits before 2 fails
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      def delivered(): Seq[(Int, String)] = spark.read.parquet(out)
        .select("page", "html").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
      val q1 = start()
      val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
        q1.stop() // unreachable when the batch failed; keeps the happy path clean
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(failure).exists(_.contains("500")),
        s"the 500 fetch must surface, not become an empty row: $failure")
      assert(delivered().map(_._1).sorted == Seq(1),
        s"only the page-1 batch may commit; got ${delivered().map(_._1).sorted}")
      // the server heals; a restart from the SAME checkpoint must refetch
      // page 2 (its offset never committed) and finish the range
      broken.set(false)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val resumed = delivered()
      assert(resumed.map(_._1).sorted == Seq(1, 2, 3),
        s"restart must plan exactly the uncommitted pages: ${resumed.map(_._1).sorted}")
      assert(resumed.forall(_._2.nonEmpty),
        "the refetched pages must carry REAL content — the failed fetch never became an empty row")
    } finally server.stop(0)
  }

  test("restart resumes from the checkpointed page offset, no re-ingest") {
    // the memory sink cannot recover from a checkpoint — the restart
    // contract needs a real sink, so this test goes through parquet
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-pages")
        .option("dir", dir).option("productType", "life")
        .option("pages", "1-1000").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    writePages(dir, 1 to 4)
    run()
    val firstRun = spark.read.parquet(out).select("page")
      .collect().map(_.getInt(0)).toSeq
    assert(firstRun.sorted == (1 to 4))
    // progress lands between runs; the SECOND query (same checkpoint)
    // must ingest ONLY the new pages — 1-6 present, each exactly once
    writePages(dir, 5 to 6)
    run()
    val afterRestart = spark.read.parquet(out).select("page")
      .collect().map(_.getInt(0)).toSeq
    assert(afterRestart.sorted == (1 to 6),
      s"resume must add exactly pages 5-6 once: ${afterRestart.sorted}")
  }
}
