package graft

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
