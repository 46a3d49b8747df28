package graft

import graft.operators.PercentileOps
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions.expr

/** Scale-safe percentile operators: exactness of the histogram quantile
  * against a hand-computed rank definition, GK-sketch rank-error bound,
  * and the cell-not-row shuffle shape.
  */
class PercentileOpsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val probs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)

  /** Type-1 (lower) quantile on a sorted vector: element at rank ceil(p*n). */
  private def typeOneQuantile(sorted: Vector[Double], p: Double): Double =
    sorted(math.ceil(p * sorted.size).toInt - 1)

  private def corpus = {
    // deterministic, skewed, with duplicates and two groups
    val rows = (1 to 997).map { i =>
      val g = if (i % 3 == 0) "A" else "B"
      val v = ((i * 7919L % 1000) / 4.0) + (i % 5) * 0.25
      (g, v)
    }
    rows.toDF("grp", "value")
  }

  test("histogramQuantiles matches the type-1 quantile computed by hand") {
    val out = PercentileOps.histogramQuantiles(corpus, "grp", "value", probs, decimals = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byGroup = corpus.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.toVector }
    byGroup.foreach { case (g, sorted) =>
      // decimals=2 quantization is exact for these .25-step values
      assert(out(g)._1 == typeOneQuantile(sorted, 0.25), s"p25 group $g")
      assert(out(g)._2 == typeOneQuantile(sorted, 0.5), s"p50 group $g")
      assert(out(g)._3 == typeOneQuantile(sorted, 0.75), s"p75 group $g")
    }
  }

  test("histogramQuantiles quantizes to the requested grid") {
    val df = Seq(("A", 1.234), ("A", 1.236), ("A", 9.999)).toDF("grp", "value")
    val out = PercentileOps.histogramQuantiles(df, "grp", "value",
      Seq("p50" -> 0.5), decimals = 2).collect().head
    assert(out.getDouble(1) == 1.23) // both 1.23x values land in the 1.23 cell
  }

  test("approxQuantiles honors the GK rank-error bound") {
    val n = 2000
    val df = (1 to n).map(i => ("G", i.toDouble)).toDF("grp", "value")
    val accuracy = 100 // rank error <= n/accuracy = 20
    val out = PercentileOps.approxQuantiles(df, "grp", "value", probs, accuracy)
      .collect().head
    Seq(0.25 -> out.getDouble(1), 0.5 -> out.getDouble(2), 0.75 -> out.getDouble(3))
      .foreach { case (p, v) =>
        val rank = v.toInt // value i has rank i
        assert(math.abs(rank - p * n) <= n / accuracy + 1, s"p=$p v=$v")
      }
  }

  test("exactQuantiles is bit-identical to the percentile() built-in") {
    // adversarial distribution: duplicates, negatives, singleton group,
    // group sizes that make p*(n-1) land on and between integers
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(997)(i => ("A", (rng.nextInt(50) - 25).toDouble / 4)) ++
      Seq.tabulate(10)(i => ("B", i.toDouble)) ++
      Seq(("C", 42.0))
    // null values must be ignored exactly like the built-in does
    val withNulls = rows.map { case (g, v) => (g, Option(v)) } ++
      Seq(("A", Option.empty[Double]), ("B", Option.empty[Double]))
    val df = withNulls.toDF("grp", "value").repartition(8)
    val got = PercentileOps.exactQuantiles(df, "grp", "value", probs)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = df.groupBy("grp")
      .agg(expr("percentile(value, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .collect().map(r => r.getString(0) -> {
        val s = r.getSeq[Double](1); (s(0), s(1), s(2))
      }).toMap
    assert(got == want) // == on doubles: BIT-identical, not approximately
  }

  test("exactQuantiles plan has no ObjectHashAggregate buffering") {
    val plan = PercentileOps.exactQuantiles(corpus, "grp", "value", probs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"exact quantiles must not buffer whole groups:\n$plan")
  }

  test("histogramQuantiles shuffles cells, not rows (partial count before exchange)") {
    val plan = PercentileOps.histogramQuantiles(corpus, "grp", "value", probs, decimals = 2)
      .queryExecution.executedPlan
    val formatted = plan.toString
    // a partial HashAggregate must appear below the first Exchange
    assert(formatted.contains("partial_count") || formatted.contains("Partial"),
      s"expected map-side partial aggregation in:\n$formatted")
  }

  test("ntileExact == Spark's ntile window for several k, with duplicate values") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = (1 to 500).map(i => (i.toLong, i * 7919L % 40)).toDF("id", "v")
    for (k <- Seq(1, 3, 10, 499, 500, 700)) {
      val mine = PercentileOps.ntileExact(df, "v", "id", k)
        .select(col("id"), col("bin")).as[(Long, Long)].collect().toMap
      val ref = df.select(col("id"),
          ntile(k).over(Window.orderBy("v", "id")).cast("long").as("bin"))
        .as[(Long, Long)].collect().toMap
      assert(mine == ref, s"k=$k")
    }
  }

  test("quantileNormalize: identity on a single group, monotone and " +
    "global-valued across groups") {
    import org.apache.spark.sql.functions.col
    val one = (1 to 300).map(i => (i.toLong, "g", i * 7L % 97)).toDF("id", "g", "v")
    val ident = PercentileOps.quantileNormalize(one, "g", "v", "id")
      .select(col("v"), col("normalized")).as[(Long, Long)].collect()
    ident.foreach { case (v, n) => assert(n == v, s"single group must be identity: $v -> $n") }

    // two groups with disjoint ranges: normalized values come from the
    // GLOBAL value set and preserve within-group order
    val two = ((1 to 100).map(i => (i.toLong, "small", i.toLong)) ++
      (1 to 100).map(i => ((i + 1000).toLong, "big", 1000L + i))).toDF("id", "g", "v")
    val out = PercentileOps.quantileNormalize(two, "g", "v", "id")
      .select(col("g"), col("v"), col("normalized"))
      .as[(String, Long, Long)].collect()
    val globalVals = ((1 to 100).map(_.toLong) ++ (1 to 100).map(1000L + _)).toSet
    out.foreach { case (_, _, n) => assert(globalVals.contains(n)) }
    Seq("small", "big").foreach { g =>
      val sorted = out.filter(_._1 == g).sortBy(_._2).map(_._3)
      assert(sorted.sameElements(sorted.sorted), s"$g must stay monotone")
    }
    // both groups' top rows normalize to the global maximum
    assert(out.filter(_._2 == 100L).head._3 == out.filter(_._2 == 1100L).head._3)
  }

  test("ntileExact: the raw-row window is value-partitioned (cells-only global window)") {
    val df = (1 to 500).map(i => (i.toLong, i * 7919L % 40)).toDF("id", "v")
    val plan = PercentileOps.ntileExact(df, "v", "id", 10)
      .queryExecution.optimizedPlan.toString()
    val rowWindows = plan.linesIterator
      .filter(_.contains("row_number()")).mkString("\n")
    assert(rowWindows.contains("windowspecdefinition(v"),
      s"row_number window must be value-partitioned:\n$plan")
  }

  test("ntileExact and quantileNormalize enforce the cell-frame bound loudly on row-scale columns") {
    def rootMsg(t: Throwable): String = {
      var m = ""; var c: Throwable = t
      while (c != null) { m += Option(c.getMessage).getOrElse("") + " | "; c = c.getCause }
      m
    }
    // unique-id-like value column: every row is its own cell
    val rowScale = spark.range(1000).selectExpr("id AS k", "id AS v")
    val e1 = intercept[Throwable] {
      PercentileOps.ntileExact(rowScale, "v", "k", 4, maxCells = 100).collect()
    }
    assert(rootMsg(e1).contains("quantize"),
      s"the failure must carry the remedy, got: ${rootMsg(e1)}")
    val grouped = spark.range(1000).selectExpr("id AS k", "id AS v",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g")
    val e2 = intercept[Throwable] {
      PercentileOps.quantileNormalize(grouped, "g", "v", "k", levels = 10,
        maxCells = 100).collect()
    }
    assert(rootMsg(e2).contains("quantize"), s"got: ${rootMsg(e2)}")
    // below the bound: results are untouched by the guard (same rank law)
    val ok = PercentileOps.ntileExact(rowScale, "v", "k", 4, maxCells = 2000)
    assert(ok.count() == 1000)
    assert(ok.where(expr("bin = 1")).count() == 250)
  }
}
