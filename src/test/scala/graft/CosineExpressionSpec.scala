package graft

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

/** Native codegen'd cosine vs the HOF reference implementation. */
class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private def fvec(d: Int) = Seq.fill(d)(rng.nextFloat() * 2 - 1)

  test("graft_cosine is value-identical to the HOF cosine (float arrays)") {
    val df = (1 to 50).map(_ => (fvec(64), fvec(64))).toDF("a", "b")
    val out = df.select(
      GraftFunctions.cosine(spark, col("a"), col("b")).as("fast"),
      V.cosine(col("a"), col("b")).as("ref")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bit-identical
  }

  test("zero vectors → 0.0; double arrays accepted; self-cosine = 1.0") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0)), (Seq(3.0, 4.0), Seq(3.0, 4.0)))
      .toDF("a", "b")
    val out = df.select(GraftFunctions.cosine(spark, col("a"), col("b"))).as[Double].collect()
    assert(out(0) == 0.0 && out(1) == 1.0)
  }

  test("null array → null result") {
    val df = Seq((Some(Seq(1.0f)), None: Option[Seq[Float]])).toDF("a", "b")
    val r = df.select(GraftFunctions.cosine(spark, col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("registered for SQL via GraftExtensions (injectFunction path)") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // note: getOrCreate may reuse the shared test session; register covers both
    GraftFunctions.register(s2)
    val out = s2.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(out == 1.0)
  }

  test("type mismatch is rejected at analysis time") {
    val df = Seq(("x", Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftFunctions.cosine(spark, col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_cosine") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
