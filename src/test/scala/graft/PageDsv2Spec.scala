package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.PageSource
import java.net.{InetAddress, InetSocketAddress}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSource V2 page source: `spark.read.format("graft-pages")` parity
  * with the programmatic PageSource scan, plus source-level page-range
  * pruning (the O2 guarantee pushed below the optimizer — excluded
  * pages are never scheduled, visible as fewer input partitions),
  * column pruning (a scan that never reads `html` never fetches it),
  * and the HTTP branch against a loopback stub server: URL-builder
  * parity, per-page error isolation, and the pageTimeoutSec deadline
  * (a hung page server costs one empty row, never a hung task).
  */
class PageDsv2Spec extends SparkSpec {
  import spark.implicits._

  /** Loopback-only HTTP stub (zero egress): `handle(page, exchange)`
    * serves each request; `body` gets the base URL. Page number is
    * recovered from the S2 URL builder's `_pp_cur=` parameter.
    */
  private def withHttpStub(handle: (Int, HttpExchange) => Unit)
                          (body: String => Unit): Unit = {
    val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val page = q.split("&")
        .collectFirst { case s if s.startsWith("_pp_cur=") =>
          s.stripPrefix("_pp_cur=").toInt }
        .getOrElse(-1)
      try handle(page, ex) finally ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      r => { val t = new Thread(r); t.setDaemon(true); t }))
    server.start()
    try body(s"http://${server.getAddress.getAddress.getHostAddress}:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, html: String): Unit = {
    val bytes = html.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
  }

  private def httpScan(baseUrl: String, pages: String, timeoutSec: Int = 60) =
    spark.read.format("graft-pages")
      .option("baseUrl", baseUrl).option("urlPath", "/list")
      .option("portletId", "pp").option("productType", "life")
      .option("pages", pages).option("pageTimeoutSec", timeoutSec.toString)
      .load()

  private def scanExec(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  private def writeFixtures(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2").toString
    def tds(cells: String*): String =
      "<tr>" + cells.map(c => s"<td>$c</td>").mkString + "</tr>"
    (1 to n).foreach { p =>
      val row = tds("<input/>", "Non-Archived", s"FY 202$p", s"Ins$p", s"Plan$p",
        s"UIN$p", "Term", "", "", "P", "Par", "Ind", "",
        s"<a href='/documents/p$p.pdf'>Doc $p</a>")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, s"page_$p.html"),
        s"<div class='portlet'><table class='iq-table'><tbody>$row</tbody></table></div>")
    }
    dir
  }

  test("format(graft-pages) reads fixtures, parity with PageSource.fixtureScan") {
    val dir = writeFixtures(5)
    val v2 = spark.read.format("graft-pages")
      .option("dir", dir).option("productType", "life").option("pages", "1-5")
      .load()
    assert(v2.schema.fieldNames.toSeq == Seq("product_type", "page", "html"))
    val prog = PageSource.fixtureScan(spark, "life", dir, 1, 5).toDF()
      .select($"productType".as("product_type"), $"page", $"html")
    assert(v2.orderBy("page").collect().toSeq ==
      prog.orderBy("page").collect().toSeq)
    // the rows drive the real parse pipeline end to end
    val parsed = graft.operators.ParsePipeline.life(
      graft.operators.ParsePipeline.explodeRows(
        v2.select($"product_type".as("productType"), $"page", $"html")
          .as[graft.operators.ParsePipeline.PageHtml]).toDF())
    assert(parsed.count() == 5)
  }

  test("page-range predicates prune partitions at the SOURCE (O2 below the optimizer)") {
    val dir = writeFixtures(8)
    def scan = spark.read.format("graft-pages")
      .option("dir", dir).option("productType", "life").option("pages", "1-8")
      .load()
    assert(scan.rdd.getNumPartitions == 8, "one partition per page")
    val pruned = scan.where($"page" >= 4 && $"page" <= 6)
    assert(pruned.rdd.getNumPartitions == 3,
      "excluded pages must never be scheduled")
    assert(pruned.select("page").as[Int].collect().sorted.toSeq == Seq(4, 5, 6))
    val one = scan.where($"page" === 7)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.select("page").as[Int].collect().toSeq == Seq(7))
  }

  test("neither dir nor baseUrl fails loudly driver-side, never as silent empty rows") {
    val e = intercept[Exception] {
      spark.read.format("graft-pages").option("pages", "1-3").load().collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("graft-pages needs either dir")), e.toString)
  }

  test("a missing page is an empty-HTML row, not a failed scan (error isolation)") {
    val dir = writeFixtures(2) // pages 1-2 exist; page 3 does not
    val rows = spark.read.format("graft-pages")
      .option("dir", dir).option("productType", "life").option("pages", "1-3")
      .load().orderBy("page").select("page", "html").as[(Int, String)].collect()
    assert(rows.length == 3)
    assert(rows(2) == ((3, "")), "missing fixture must yield empty html")
    assert(rows(0)._2.nonEmpty && rows(1)._2.nonEmpty)
  }

  test("pagesPerPartition batches tasks; pushdown still prunes; isolation stays per page") {
    val dir = writeFixtures(7) // pages 1-7 exist; page 8 does not
    def scan = spark.read.format("graft-pages")
      .option("dir", dir).option("productType", "life").option("pages", "1-8")
      .option("pagesPerPartition", "3").load()
    assert(scan.rdd.getNumPartitions == 3, "ceil(8/3) page batches")
    // range pushdown composes: [4,6] under batch=3 → one surviving batch
    assert(scan.where($"page".between(4, 6)).rdd.getNumPartitions == 1)
    val rows = scan.select("page", "html").as[(Int, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 8))
    assert(rows(7)._2.isEmpty, "missing page 8 fails alone inside its batch")
    assert(rows.take(7).forall(_._2.nonEmpty))
  }

  test("HTTP mode fetches each page through the S2 URL builder (loopback stub)") {
    PageDsv2Spec.hits.set(0)
    withHttpStub((page, ex) => {
      PageDsv2Spec.hits.incrementAndGet()
      assert(ex.getRequestURI.getQuery.contains("p_p_id=pp"))
      respond(ex, 200, s"<html>page $page</html>")
    }) { base =>
      // no orderBy on the scan: a global sort's RangePartitioner SAMPLES
      // the source first — a second fetch per page that would break the
      // one-GET-per-page assertion below; sort driver-side instead
      val rows = httpScan(base, "1-4")
        .select("page", "html").as[(Int, String)].collect().sortBy(_._1)
      assert(rows.toSeq == (1 to 4).map(p => (p, s"<html>page $p</html>")))
    }
    assert(PageDsv2Spec.hits.get() == 4, "one GET per page, no re-fetch")
  }

  test("HTTP per-page error isolation: a 500 page is an empty row, not a failed scan") {
    withHttpStub((page, ex) =>
      if (page == 2) respond(ex, 500, "boom")
      else respond(ex, 200, s"<html>page $page</html>")
    ) { base =>
      val rows = httpScan(base, "1-3")
        .select("page", "html").as[(Int, String)].collect().sortBy(_._1)
      assert(rows.length == 3)
      assert(rows(1) == ((2, "")), "HTTP 500 must yield an empty-HTML row")
      assert(rows(0)._2.nonEmpty && rows(2)._2.nonEmpty)
    }
  }

  test("pageTimeoutSec bounds a hung page server: empty row, never a hung task") {
    val t0 = System.nanoTime()
    withHttpStub((page, ex) =>
      if (page == 2) { Thread.sleep(8000); respond(ex, 200, "late") }
      else respond(ex, 200, s"<html>page $page</html>")
    ) { base =>
      val rows = httpScan(base, "1-3", timeoutSec = 1)
        .select("page", "html").as[(Int, String)].collect().sortBy(_._1)
      assert(rows.length == 3)
      assert(rows(1) == ((2, "")), "timed-out page must yield an empty-HTML row")
      assert(rows(0)._2.nonEmpty && rows(2)._2.nonEmpty)
    }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // the stub page hangs 8 s; with JDK-default (infinite) timeouts the
    // scan would block those 8 s — the 1 s deadline must cut it short
    assert(elapsedMs < 6000,
      s"scan took ${elapsedMs}ms — pageTimeoutSec did not bound the hung fetch")
  }

  test("column pruning: a scan that never reads html never fetches it (HTTP + plan)") {
    PageDsv2Spec.hits.set(0)
    withHttpStub((page, ex) => {
      PageDsv2Spec.hits.incrementAndGet()
      respond(ex, 200, s"<html>page $page</html>")
    }) { base =>
      val proj = httpScan(base, "1-6").select("page")
      // the pushed read schema excludes the heavy column...
      assert(scanExec(proj).output.map(_.name) == Seq("page"),
        s"scan still reads ${scanExec(proj).output.map(_.name)}")
      assert(proj.as[Int].collect().sorted.toSeq == (1 to 6))
      // ...and count() prunes to ZERO columns
      assert(httpScan(base, "1-6").count() == 6)
    }
    assert(PageDsv2Spec.hits.get() == 0,
      s"${PageDsv2Spec.hits.get()} GETs for html-free scans — column pruning lost")
  }

  test("column pruning in fixture mode: select(page) reads no fixture files") {
    val dir = writeFixtures(3)
    val scan = spark.read.format("graft-pages")
      .option("dir", dir).option("productType", "life").option("pages", "1-3")
      .load()
    // delete the fixtures AFTER planning: correct page values can now come
    // only from a reader that skipped the file read (a reader that tried
    // and caught would still emit rows, but the full-schema control row
    // below proves the files are genuinely gone, not silently re-created)
    (1 to 3).foreach(p => java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, s"page_$p.html")))
    val projected = scan.select("page", "product_type")
    // pruned read schema keeps TABLE-schema order regardless of select order
    assert(scanExec(projected).output.map(_.name) == Seq("product_type", "page"))
    assert(projected.as[(Int, String)].collect().sorted.toSeq ==
      (1 to 3).map(p => (p, "life")))
    val control = scan.select("page", "html").as[(Int, String)].collect()
    assert(control.forall(_._2.isEmpty), "control: fixtures really are deleted")
  }
}

object PageDsv2Spec {
  /** Fetch counter shared with executor threads (same local-mode JVM). */
  val hits = new AtomicInteger(0)
}
