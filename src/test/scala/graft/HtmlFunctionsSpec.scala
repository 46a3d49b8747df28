package graft

import graft.functions.HtmlFunctions
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM tests for the HTML extraction twins of
  * /root/reference/src/irdai_scraper/scraper/parser.py.
  */
class HtmlFunctionsSpec extends AnyFunSuite {

  test("getText strips tags, decodes entities, collapses whitespace") {
    assert(HtmlFunctions.getText("<b> Hello&nbsp;&amp;  <i>world</i> </b>") == "Hello & world")
    assert(HtmlFunctions.getText("") == "")
    assert(HtmlFunctions.getText("plain") == "plain")
  }

  test("findDataTable prefers class~=table, falls back to portlet div") {
    val byClass = "<table class='fancy-table'><tr><td>x</td></tr></table>"
    assert(HtmlFunctions.findDataTable(byClass).isDefined)
    val byPortlet =
      "<div class='my-portlet'><table><tr><td>y</td></tr></table></div>"
    assert(HtmlFunctions.findDataTable(byPortlet).exists(_.contains("y")))
    assert(HtmlFunctions.findDataTable("<p>no table</p>").isEmpty)
  }

  test("tableRows uses tbody rows, else drops the header tr") {
    val withBody = "<tr><th>h</th></tr><tbody><tr><td>a</td><td>b</td></tr></tbody>"
    val rows = HtmlFunctions.tableRows(withBody)
    assert(rows.map(_.cellsText) == Seq(Seq("a", "b")))

    val noBody = "<tr><th>h1</th></tr><tr><td>a</td></tr><tr><td>b</td></tr>"
    assert(HtmlFunctions.tableRows(noBody).map(_.cellsText) == Seq(Seq("a"), Seq("b")))
  }

  test("row class attribute is captured for archive detection") {
    val t = "<tbody><tr class='archive-row'><td>x</td></tr></tbody>"
    assert(HtmlFunctions.tableRows(t).head.rowClass == "archive-row")
  }

  test("extractDocumentLink: href with doc extension wins, text as filename") {
    val cell = "<a href='/documents/f1.pdf'>Annual Report</a>"
    val (url, name) = HtmlFunctions.extractDocumentLink(cell, "https://h.test")
    assert(url.contains("https://h.test/documents/f1.pdf"))
    assert(name.contains("Annual Report"))
  }

  test("extractDocumentLink: short link text falls back to URL filename") {
    val cell = "<a href='/docs/report7.pdf'>Go</a>"
    val (url, name) = HtmlFunctions.extractDocumentLink(cell, "https://h.test")
    assert(url.contains("https://h.test/docs/report7.pdf"))
    assert(name.contains("report7.pdf"))
  }

  test("extractDocumentLink: onclick window.open fallback") {
    val cell = "<span onclick=\"window.open('/files/x9.xlsx')\">open</span>"
    val (url, name) = HtmlFunctions.extractDocumentLink(cell, "https://h.test")
    assert(url.contains("https://h.test/files/x9.xlsx"))
    assert(name.contains("x9.xlsx"))
  }

  test("extractDocumentLink: nothing matches → (None, None)") {
    assert(HtmlFunctions.extractDocumentLink("<a href='/page.html'>x</a>") == (None, None))
  }

  test("urljoin absolutizes relative hrefs, passes through junk") {
    assert(HtmlFunctions.urljoin("https://h.test/a/b", "/c.pdf") == "https://h.test/c.pdf")
    assert(HtmlFunctions.urljoin("https://h.test", "https://o.test/d.pdf") == "https://o.test/d.pdf")
  }

  test("currentPage reads the active pagination li, defaults to 1") {
    val html =
      "<ul class='pagination'><li><a>1</a></li><li class='active'><a>3</a></li></ul>"
    assert(HtmlFunctions.currentPage(html) == 3)
    assert(HtmlFunctions.currentPage("<p/>") == 1)
  }

  test("maxPageFromPagination scans _cur= hrefs (base.py:74-86)") {
    val html = "<a href='?x_cur=2'>2</a><a href='?x_cur=17'>17</a>"
    assert(HtmlFunctions.maxPageFromPagination(html) == 17)
    assert(HtmlFunctions.maxPageFromPagination("<p/>") == 1)
  }

  test("filenameFromUrl: extension regex, dotted-segment fallback, None") {
    assert(HtmlFunctions.filenameFromUrl("/a/b/Policy.PDF").contains("Policy.PDF"))
    assert(HtmlFunctions.filenameFromUrl("https://x.test/plain/7").contains("x.test"))
    assert(HtmlFunctions.filenameFromUrl("files/data7").isEmpty)
  }
}
