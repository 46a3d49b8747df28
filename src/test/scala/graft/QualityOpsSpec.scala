package graft

import graft.operators.QualityOps
import org.apache.spark.sql.functions._

/** Data-quality operators (q116-q118): profiling, constraint checks,
  * snapshot diff — each against hand-built frames with known answers.
  */
class QualityOpsSpec extends SparkSpec {

  import spark.implicits._

  test("columnProfile counts rows, nulls, distincts, and string min/max") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, "a"), (2L, null), (null, "a"))
      .toDF("k", "s")
    val p = QualityOps.columnProfile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(p("k") == ((4L, 1L, 2L, "1", "2")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("checkViolations: planted pk/fk/domain violations are counted") {
    val rows = Seq((1L, 10L, 5L), (2L, 10L, -1L), (2L, 99L, 3L))
      .toDF("id", "fk", "v")
    val parent = Seq(10L).toDF("pk")
    val out = QualityOps.checkViolations(Seq(
      QualityOps.Check("pk", QualityOps.duplicateKeys(rows, "id"), lit(true)),
      QualityOps.Check("fk",
        QualityOps.fkViolations(rows, "fk", parent, "pk"), lit(true)),
      QualityOps.Check("dom", rows, col("v") <= 0L)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("pk") == ((1L, false)))  // key 2 appears twice -> one bad key
    assert(out("fk") == ((1L, false)))  // fk=99 has no parent
    assert(out("dom") == ((1L, false)))
  }

  test("fkViolations ignores NULL foreign keys (SQL semantics)") {
    val rows = Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (2L, null))
      .toDF("id", "fk")
    val parent = Seq(10L).toDF("pk")
    assert(QualityOps.fkViolations(rows, "fk", parent, "pk").count() == 0L)
  }

  test("ksDrift: zero on identical, 10000 on disjoint, exact on a known shift") {
    val a = (1 to 100).map(_.toLong % 10).toDF("v")
    assert(QualityOps.ksDrift(a, a, "v").collect().head.getLong(2) == 0L)
    val lo = Seq(1L, 2L, 3L).toDF("v")
    val hi = Seq(10L, 11L).toDF("v")
    val dj = QualityOps.ksDrift(lo, hi, "v").collect().head
    assert(dj.getLong(2) == 10000L && dj.getLong(3) == 3L)
    // half the B side shifted from 0 to 5: at v in [0, 4], cdf_a = 1.0
    // vs cdf_b = 0.5 -> D = 5000 bp at the smallest such value
    val base = Seq.fill(10)(0L).toDF("v")
    val shifted = (Seq.fill(5)(0L) ++ Seq.fill(5)(5L)).toDF("v")
    val r = QualityOps.ksDrift(base, shifted, "v").collect().head
    assert(r.getLong(2) == 5000L && r.getLong(3) == 0L)
  }

  test("kAnonymityAudit flags exactly the under-k combinations") {
    val rows = (Seq.fill(12)(("IN", "A")) ++ Seq.fill(3)(("IN", "B")) ++
      Seq.fill(10)(("US", "A"))).toDF("nation", "seg")
    val out = QualityOps.kAnonymityAudit(rows, Seq("nation", "seg"), k = 10L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out == Map(("IN", "A") -> ((12L, false)),
      ("IN", "B") -> ((3L, true)), ("US", "A") -> ((10L, false))))
  }

  test("rangeDigests: replica parity, single-row sensitivity, order independence") {
    val rows = (1L to 100L).map(k => (k, k * 7)).toDF("k", "v")
    def dig(df: org.apache.spark.sql.DataFrame) =
      QualityOps.rangeDigests(df, "k", "v", 10L)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = dig(rows)
    assert(base.keySet == (0L to 10L).toSet)
    // identical replica (shuffled row order) -> identical digests
    assert(dig(rows.orderBy(org.apache.spark.sql.functions.rand(7))) == base)
    // one corrupted value flips exactly its own bucket's digest
    val corrupted = (1L to 100L).map(k => (k, if (k == 55L) 999L else k * 7))
      .toDF("k", "v")
    val cd = dig(corrupted)
    assert(cd.filter(_._1 != 5L) == base.filter(_._1 != 5L))
    assert(cd(5L)._1 == base(5L)._1 && cd(5L)._2 != base(5L)._2)
  }

  test("fingerprint row-string distinguishes WHICH field is null (q230/q234 sentinel)") {
    // concat_ws silently skips NULL fields: without the NUL sentinel,
    // (lang=null, source="x") and (lang="x", source=null) would
    // concatenate to the SAME string and the content fingerprint would
    // certify two different datasets as byte-identical.
    val rows = Seq(
      (1L, null.asInstanceOf[String], "x", 10L, "t"),
      (1L, "x", null.asInstanceOf[String], 10L, "t"),
      (1L, "x", "x", 10L, "t"),
      (1L, null.asInstanceOf[String], null.asInstanceOf[String], 10L, null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val strs = rows.select(graft.queries.QualityQueries.fpRowString.as("s"))
      .collect().map(_.getString(0))
    assert(strs.forall(_ != null), "sentinel must keep the row-string non-null")
    assert(strs.distinct.length == strs.length,
      s"null positions must stay distinguishable: ${strs.toSeq}")
  }

  test("snapshotDiff emits only added/removed/changed") {
    val a = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "v")
    val b = Seq((2L, 200L), (3L, 333L), (4L, 400L)).toDF("k", "v")
    val d = QualityOps.snapshotDiff(a, b, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    // unchanged key 2 must NOT appear
    assert(!d.contains(2L))
  }

  test("ksDrift enforces the cell-frame bound loudly on row-scale columns") {
    def rootMsg(t: Throwable): String = {
      var m = ""; var c: Throwable = t
      while (c != null) { m += Option(c.getMessage).getOrElse("") + " | "; c = c.getCause }
      m
    }
    val a = spark.range(1000).selectExpr("id AS x")
    val b = spark.range(1000).selectExpr("id + 500 AS x")
    val e = intercept[Throwable] {
      QualityOps.ksDrift(a, b, "x", maxCells = 100).collect()
    }
    assert(rootMsg(e).contains("quantize"),
      s"the failure must carry the remedy, got: ${rootMsg(e)}")
    // below the bound the guard is inert: the 500-shift gives D = 5000 bp
    val ok = QualityOps.ksDrift(a, b, "x", maxCells = 5000).head
    assert(ok.getAs[Long]("ks_bp") == 5000L)
  }
}
