package graft

import graft.operators.ParsePipeline
import graft.operators.ParsePipeline.PageHtml
import org.apache.spark.sql.Encoders

/** Golden parse tests: fixture HTML shaped like the reference's Liferay
  * tables (scraper/parser.py:16-38, life.py/nonlife.py/health.py/
  * life_list.py) through the full G1-G4 + P* + F* pipeline.
  */
class ParsePipelineSpec extends SparkSpec {

  private def page(productType: String, rowsHtml: String): org.apache.spark.sql.Dataset[PageHtml] = {
    implicit val enc = Encoders.product[PageHtml]
    spark.createDataset(Seq(PageHtml(productType, 1,
      s"<div class='portlet'><table class='iq-table'><tbody>$rowsHtml</tbody></table></div>")))
  }

  private def tds(cells: String*): String =
    "<tr>" + cells.map(c => s"<td>$c</td>").mkString + "</tr>"

  test("life projection: 14 cells → named columns, doc link from last cell") {
    val row = tds("<input/>", "Non-Archived", "FY 2020-21", "Acme Life", "Super Plan",
      "UIN123", "Term", "01-04-2020", "", "Protection", "Par", "Individual", "note",
      "<a href='/documents/p1.pdf'>Policy One</a>")
    val out = ParsePipeline.life(ParsePipeline.explodeRows(page("life", row)).toDF()).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("uin") == "UIN123")
    assert(r.getAs[String]("financial_year") == "FY 2020-21")
    assert(r.getAs[String]("insurer") == "Acme Life")
    assert(r.getAs[String]("launch_modification_date") == "01-04-2020")
    assert(r.isNullAt(r.fieldIndex("closing_withdrawal_date"))) // F4: "" → NULL
    assert(r.getAs[String]("document_url") == "https://example.invalid/documents/p1.pdf")
    assert(r.getAs[String]("document_filename") == "Policy One")
  }

  test("withNormalizedDates derives typed siblings; raw strings stay (SURVEY §1.5)") {
    val row = tds("<input/>", "Non-Archived", "FY 2020-21", "Acme Life", "Super Plan",
      "UIN123", "Term", "2020-04-01 01-04-2020", "31-02-2021", "Protection",
      "Par", "Individual", "note", "<a href='/documents/p1.pdf'>Policy One</a>")
    val out = ParsePipeline.withNormalizedDates(
      ParsePipeline.life(ParsePipeline.explodeRows(page("life", row)).toDF()))
    val r = out.collect().head
    // raw columns untouched (ingest parity)
    assert(r.getAs[String]("launch_modification_date") == "2020-04-01 01-04-2020")
    assert(r.getAs[String]("financial_year") == "FY 2020-21")
    // double-stamped date resolves to one DateType value
    assert(r.getAs[java.sql.Date]("launch_modification_date_norm").toString == "2020-04-01")
    // impossible date (Feb 31) → NULL, not a rolled-over date
    assert(r.isNullAt(r.fieldIndex("closing_withdrawal_date_norm")))
    assert(r.getAs[String]("financial_year_norm") == "2020-21")
    import org.apache.spark.sql.types.DateType
    assert(out.schema("launch_modification_date_norm").dataType == DateType)
  }

  test("arity guard (F1) and empty-key filter (F2) drop bad rows") {
    val short = tds("<input/>", "x", "y") // too few cells
    val emptyKey = tds("<input/>", "Non-Archived", "FY", "Ins", "Name",
      "", "T", "", "", "P", "Par", "Ind", "", "no link")
    val out = ParsePipeline.life(
      ParsePipeline.explodeRows(page("life", short + emptyKey)).toDF())
    assert(out.count() == 0)
  }

  test("health projection: doc link falls back from second-to-last cell") {
    val row = tds("<input/>", "Archived", "FY 2019-20", "Care Health", "HUIN9",
      "Health Plan", "2019-05-01", "<a href='/documents/h9.pdf'>H</a>", "Retail")
    val out = ParsePipeline.health(ParsePipeline.explodeRows(page("health", row)).toDF()).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("uin") == "HUIN9")
    assert(r.getAs[String]("type_of_product") == "Retail")
    assert(r.getAs[String]("document_url") == "https://example.invalid/documents/h9.pdf")
    // short link text → filename derived from the URL (parser.py:78-89)
    assert(r.getAs[String]("document_filename") == "h9.pdf")
  }

  test("nonlife projection: 10 cells with s_no, key at cell 7") {
    val row = tds("<input/>", "Non-Archived", "42", "FY 2021-22", "General Ins",
      "Motor Plan", "Motor", "NL-UIN-1", "2021-07-01",
      "<a href='/documents/n1.xlsx'>Motor Doc</a>")
    val out = ParsePipeline.nonlife(ParsePipeline.explodeRows(page("nonlife", row)).toDF()).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("uin") == "NL-UIN-1")
    assert(out.head.getAs[String]("s_no") == "42")
    assert(out.head.getAs[String]("document_filename") == "Motor Doc")
  }

  test("life_list projection: 6 cells, key = short_description") {
    val row = tds("<input/>", "Non-Archived", "List of products 2024",
      "01-01-2024", "subtitle", "<a href='/documents/list.xlsx'>The List</a>")
    val out = ParsePipeline.lifeList(ParsePipeline.explodeRows(page("life_list", row)).toDF()).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("short_description") == "List of products 2024")
    assert(out.head.getAs[String]("document_url") == "https://example.invalid/documents/list.xlsx")
  }

  test("rows that throw are isolated, page without a table yields no rows (G4)") {
    implicit val enc = Encoders.product[PageHtml]
    val noTable = spark.createDataset(Seq(PageHtml("life", 1, "<p>maintenance</p>")))
    assert(ParsePipeline.explodeRows(noTable).count() == 0)
    val empty = spark.createDataset(Seq(PageHtml("life", 1, "")))
    assert(ParsePipeline.explodeRows(empty).count() == 0)
  }

  test("onclick-based document link is extracted (X2 fallback path)") {
    val row = tds("<input/>", "Non-Archived", "FY", "Ins", "Name", "UIN77", "T",
      "", "", "P", "Par", "Ind", "",
      "<span onclick=\"window.open('/files/w77.pdf')\">view</span>")
    val out = ParsePipeline.life(ParsePipeline.explodeRows(page("life", row)).toDF()).collect()
    assert(out.head.getAs[String]("document_url") == "https://example.invalid/files/w77.pdf")
    assert(out.head.getAs[String]("document_filename") == "w77.pdf")
  }
}
