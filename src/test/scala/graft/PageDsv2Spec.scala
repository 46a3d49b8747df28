package graft

import graft.sources.PageSource
import org.apache.spark.sql.functions._

/** DataSource V2 page source: `spark.read.format("graft-pages")` parity
  * with the programmatic PageSource scan, plus source-level page-range
  * pruning (the O2 guarantee pushed below the optimizer — excluded
  * pages are never scheduled, visible as fewer input partitions).
  */
class PageDsv2Spec extends SparkSpec {
  import spark.implicits._

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
}
