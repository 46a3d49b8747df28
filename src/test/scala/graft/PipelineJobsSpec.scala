package graft

import graft.app.Jobs
import graft.sources.CsvMeta
import graft.state.StateStore
import java.nio.file.{Files, Paths}

/** End-to-end incremental pipeline tests: T3 delta idempotence, T2 resume,
  * T4 DLQ replay, K1 append fidelity — SURVEY §5's "minimum slice" test
  * (§7.2 step 3).
  */
class PipelineJobsSpec extends SparkSpec {

  private def mkWorkDir(): String =
    Files.createTempDirectory("graft-jobs").toString

  /** Write fixture life pages: `rows` (uin, name, docId) per page. */
  private def writeLifePages(dir: String, pages: Seq[Seq[(String, String, Int)]]): Unit = {
    Files.createDirectories(Paths.get(dir))
    pages.zipWithIndex.foreach { case (rows, i) =>
      val trs = rows.map { case (uin, name, d) =>
        s"""<tr><td><input/></td><td>Non-Archived</td><td>FY 2020</td>
           |<td>Acme Life</td><td>$name</td><td>$uin</td><td>Term</td>
           |<td></td><td></td><td>P</td><td>Par</td><td>Ind</td><td></td>
           |<td><a href='/documents/doc$d.pdf'>Doc $d</a></td></tr>""".stripMargin.replace("\n", "")
      }.mkString
      Files.writeString(Paths.get(dir, s"page_${i + 1}.html"),
        s"<table class='table'><tbody>$trs</tbody></table>")
    }
  }

  test("delta job: first run ingests all, second run is an empty delta (T3)") {
    val work = mkWorkDir()
    val pagesDir = s"$work/pages"
    writeLifePages(pagesDir, Seq(
      Seq(("UIN1", "Alpha", 1), ("UIN2", "Beta", 2)),
      Seq(("UIN3", "Gamma", 3))))

    val (n1, ok1, bad1) = Jobs.delta(spark, work, "life", pagesDir, 2)
    assert((n1, ok1, bad1) == (3L, 3L, 0L))
    assert(CsvMeta.count(spark, Jobs.csvPath(work, "life")) == 3L)

    // identical input → empty delta, no new downloads, CSV unchanged
    val (n2, ok2, bad2) = Jobs.delta(spark, work, "life", pagesDir, 2)
    assert((n2, ok2, bad2) == (0L, 0L, 0L))
    assert(CsvMeta.count(spark, Jobs.csvPath(work, "life")) == 3L)

    // one new row appears → delta is exactly that row
    writeLifePages(pagesDir, Seq(
      Seq(("UIN1", "Alpha", 1), ("UIN2", "Beta", 2)),
      Seq(("UIN3", "Gamma", 3), ("UIN4", "Delta", 4))))
    val (n3, ok3, _) = Jobs.delta(spark, work, "life", pagesDir, 2)
    assert((n3, ok3) == (1L, 1L))
    assert(CsvMeta.count(spark, Jobs.csvPath(work, "life")) == 4L)
  }

  test("downloaded files land at computed destinations with stub content") {
    val work = mkWorkDir()
    val pagesDir = s"$work/pages"
    writeLifePages(pagesDir, Seq(Seq(("UIN9", "Omega", 9))))
    Jobs.delta(spark, work, "life", pagesDir, 1)
    val f = Paths.get(s"$work/downloads/life/Doc-9")
    assert(Files.exists(f))
    assert(new String(Files.readAllBytes(f), "UTF-8").startsWith("CONTENT:"))
  }

  test("scrape job resumes from last_completed_page (T2)") {
    val work = mkWorkDir()
    val pagesDir = s"$work/pages"
    writeLifePages(pagesDir, Seq(Seq(("UIN1", "Alpha", 1)), Seq(("UIN2", "Beta", 2))))

    val (n1, _, _) = Jobs.scrape(spark, work, "life", pagesDir, 2)
    assert(n1 == 2L)
    // completed session: resume page is beyond total → nothing to do
    val state = new StateStore(spark, s"$work/state")
    assert(state.resumePage("life") == 3)
    val (n2, _, _) = Jobs.scrape(spark, work, "life", pagesDir, 2)
    assert(n2 == 0L)
  }

  test("failures land in the DLQ and retry-failed recovers them (T4/J4)") {
    val work = mkWorkDir()
    val pagesDir = s"$work/pages"
    writeLifePages(pagesDir, Seq(Seq(("UIN1", "Alpha", 1), ("UIN2", "Beta", 2))))

    val failOn2: String => Array[Byte] = url =>
      if (url.contains("doc2")) throw new RuntimeException("boom")
      else s"CONTENT:$url".getBytes("UTF-8")
    val (_, ok1, bad1) = Jobs.delta(spark, work, "life", pagesDir, 1, failOn2)
    assert((ok1, bad1) == (1L, 1L))

    val state = new StateStore(spark, s"$work/state")
    val dlq = state.failed.collect()
    assert(dlq.length == 1 && dlq.head.getAs[String]("url").contains("doc2"))
    assert(dlq.head.getAs[Int]("retries") == 1)
    assert(dlq.head.getAs[String]("error").contains("boom"))

    // replay with a working fetch → DLQ drains, completed set grows
    val (rok, rbad) = Jobs.retryFailed(spark, work)
    assert((rok, rbad) == (1L, 1L) || (rok, rbad) == (1L, 0L))
    assert(state.failed.count() == 0)
    assert(state.completed.count() == 2)
  }

  test("CSV append: single file, one header, fixed column order, null→\"\" (K1/X14)") {
    import spark.implicits._
    val work = mkWorkDir()
    val csv = s"$work/m.csv"
    val df = Seq(("life", "UINx", null: String)).toDF("product_type", "uin", "remarks")
    CsvMeta.append(df, "life", csv)
    CsvMeta.append(df, "life", csv)
    val lines = Files.readAllLines(Paths.get(csv))
    assert(lines.size == 3) // 1 header + 2 data rows
    assert(lines.get(0) == CsvMeta.columns("life").mkString(","))
    // missing columns materialize as empty strings, nulls too
    assert(lines.get(1).split(",", -1).length == CsvMeta.columns("life").length)
    assert(CsvMeta.count(spark, csv) == 2)
    CsvMeta.clear(spark, csv)
    assert(CsvMeta.count(spark, csv) == 0)
  }

  test("resetAll clears every product type's CSV in one sweep (csv_writer.py:112-126)") {
    import spark.implicits._
    val work = mkWorkDir()
    for (pt <- CsvMeta.columns.keys) {
      val df = Seq(("u1", "P1")).toDF("document_url", "product_name")
      CsvMeta.append(df, pt, Jobs.csvPath(work, pt))
      assert(CsvMeta.count(spark, Jobs.csvPath(work, pt)) == 1L)
    }
    Jobs.resetAll(spark, work, clearCsv = true)
    for (pt <- CsvMeta.columns.keys)
      assert(CsvMeta.count(spark, Jobs.csvPath(work, pt)) == 0L, pt)
  }

  test("metadata-only mode skips the download stage entirely (F6)") {
    val work = mkWorkDir()
    val pagesDir = s"$work/pages"
    writeLifePages(pagesDir, Seq(Seq(("UIN1", "Alpha", 1), ("UIN2", "Beta", 2))))
    val state = new StateStore(spark, s"$work/state")
    val pages = graft.sources.PageSource.fixtureScan(spark, "life", pagesDir, 1, 1)
    val (n, ok, bad) = Jobs.runPipeline(spark, state, work, "life", pages,
      Jobs.stubFetch, metadataOnly = true)
    assert((n, ok, bad) == (2L, 0L, 0L))
    assert(CsvMeta.count(spark, Jobs.csvPath(work, "life")) == 2L)
    assert(!Files.exists(Paths.get(s"$work/downloads"))) // no fetch happened
    assert(state.completed.count() == 0)
  }

  test("status summary exposes sessions plus completed/failed counts (A3)") {
    val work = mkWorkDir()
    val pagesDir = s"$work/pages"
    writeLifePages(pagesDir, Seq(Seq(("UIN1", "Alpha", 1))))
    Jobs.scrape(spark, work, "life", pagesDir, 1)
    val s = Jobs.status(spark, work).collect()
    assert(s.length == 1)
    val row = s.head
    assert(row.getAs[String]("product_type") == "life")
    assert(row.getAs[String]("status") == "completed")
    assert(row.getAs[Long]("completed_downloads") == 1L)
  }
}
