package graft

import graft.sources.PageSource
import java.nio.file.{Files, Paths}

/** S1-S3 paginated source tests (offline fixtures). */
class PageSourceSpec extends SparkSpec {

  test("buildPageUrl carries Liferay pagination params (S2, base.py:40-49)") {
    val url = PageSource.buildPageUrl("https://h.test", "/life", "portletA", 3, 60)
    assert(url == "https://h.test/life?p_p_id=portletA&_portletA_cur=3&_portletA_delta=60")
  }

  test("totalPages: ceil of 'of N results' probe (S3, base.py:58-72)") {
    assert(PageSource.totalPages("<p>Showing 1 to 60 of 8,500 results</p>", 60) == 142)
    assert(PageSource.totalPages("<p>of 60 results</p>", 60) == 1)
    assert(PageSource.totalPages("<p>of 61 results</p>", 60) == 2)
  }

  test("totalPages falls back to max _cur= scan (base.py:74-86)") {
    val html = "<a href='?x_cur=4'>4</a><a href='?x_cur=9'>9</a>"
    assert(PageSource.totalPages(html, 60) == 9)
    assert(PageSource.totalPages("<p>nothing</p>", 60) == 1)
  }

  test("scan reads the page window, failed pages become empty HTML (S1/O2)") {
    val dir = Files.createTempDirectory("graft-pages").toString
    Files.writeString(Paths.get(dir, "page_1.html"), "<p>one</p>")
    Files.writeString(Paths.get(dir, "page_2.html"), "<p>two</p>")
    // page_3.html intentionally missing → empty-HTML row, scan continues
    val out = PageSource.fixtureScan(spark, "life", dir, 1, 3).collect()
      .sortBy(_.page)
    assert(out.map(_.page).toSeq == Seq(1, 2, 3))
    assert(out(0).html == "<p>one</p>")
    assert(out(2).html == "")
    assert(out.forall(_.productType == "life"))
  }
}
