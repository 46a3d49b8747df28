package graft

import graft.sources.CsvMeta
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Golden-diff the CSV sink's schema against the reference's SHIPPED
  * corpus (the CSVs under /root/reference/data/metadata) — the only
  * ground truth the reference provides (SURVEY §5).
  */
class CsvGoldenSpec extends AnyFunSuite {

  private val refDir = "/root/reference/data/metadata"
  private val files = Map(
    "life" -> "life_insurance_products.csv",
    "life_list" -> "life_products_list.csv",
    "nonlife" -> "nonlife_insurance_products.csv",
    "health" -> "health_insurance_products.csv")

  private def available: Boolean = Files.exists(Paths.get(refDir))

  for ((productType, file) <- files) {
    test(s"$productType column order matches the shipped corpus header") {
      assume(available, s"$refDir not present in this environment")
      val header = Files.lines(Paths.get(refDir, file)).iterator().asScala.next()
      assert(CsvMeta.columns(productType).mkString(",") == header)
    }
  }

  test("shipped corpus row counts are reachable golden fixtures") {
    assume(available)
    val counts = files.map { case (_, f) =>
      f -> (Files.lines(Paths.get(refDir, f)).count() - 1)
    }
    // BASELINE.md: 1,513 life / 54 life_list / 4,220 nonlife / 1,819 health
    assert(counts("life_insurance_products.csv") >= 1500L)
    assert(counts("nonlife_insurance_products.csv") >= 4200L)
  }
}
