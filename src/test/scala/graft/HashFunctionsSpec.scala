package graft

import graft.functions.{HashFunctions => H, TextFunctions => T}
import org.apache.spark.sql.functions._

/** Expression-form sketch utilities (the kernel twins are covered in
  * DedupOpsSpec; these keep the Column API honest on small inputs).
  */
class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles: n-grams, distinct, empty below n tokens") {
    val out = Seq("a b c d", "a b", "a a a a").toDF("s")
      .select(H.wordShingles(T.tokens(col("s")), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq("a a a")) // distinct collapses repeats
  }

  test("charShingles over cleaned text") {
    val out = Seq("ab  cd").toDF("s")
      .select(H.charShingles(col("s"), 3).as("sh")).as[Seq[String]].collect()
    assert(out.head == Seq("ab ", "b c", " cd"))
  }

  test("minhashSignature: equal sets → equal signatures; empty → sentinel") {
    val df = Seq(("a b c d e", "a b c d e"), ("", "x y z w v")).toDF("x", "y")
      .select(
        H.minhashSignature(H.wordShingles(T.tokens(col("x")), 2), 8).as("sx"),
        H.minhashSignature(H.wordShingles(T.tokens(col("y")), 2), 8).as("sy"))
    val rows = df.as[(Seq[Long], Seq[Long])].collect()
    assert(rows(0)._1 == rows(0)._2)
    assert(rows(1)._1 == Seq.fill(8)(Long.MaxValue))
    assert(rows(1)._1 != rows(1)._2)
  }

  test("bandKeys: identical signatures collide in every band") {
    val df = Seq("the quick brown fox jumps high").toDF("s")
      .select(H.bandKeys(
        H.minhashSignature(H.wordShingles(T.tokens(col("s")), 2), 8), 4, 2).as("bk"))
    val bk = df.as[Seq[Long]].collect().head
    assert(bk.length == 4 && bk.distinct.length >= 1)
  }

  test("simhash expression: identical tokens → hamming 0; hamming symmetric") {
    val df = Seq(("a b c", "a b c"), ("a b c", "x y z")).toDF("x", "y")
      .select(H.hamming(H.simhash(T.tokens(col("x"))),
        H.simhash(T.tokens(col("y")))).as("h"))
    val hs = df.as[Int].collect()
    assert(hs(0) == 0 && hs(1) > 0)
  }

  test("jaccard expression bounds and exact values") {
    val df = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String])).toDF("x", "y")
      .select(H.jaccard(col("x"), col("y")).as("j"))
    assert(df.as[Double].collect().toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("portableHash60: JVM kernel twin matches the Column form bit-for-bit") {
    val samples = Seq("", "a", "hello world", "graft_perm_a_0", "Ünïcodé ☃",
      "https://x.test/doc/42.pdf", "the quick brown fox")
    val viaColumn = samples.toDF("s")
      .select(H.portableHash60(col("s")).as("h")).as[Long].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val viaJvm = samples.map(H.portableHash60JVM(md, _))
    assert(viaColumn.toSeq == viaJvm)
    // 60-bit: always non-negative, below 2^60
    assert(viaJvm.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("portableHash60 property: random strings agree across both forms") {
    val rng = new scala.util.Random(13)
    val samples = Seq.fill(300)(rng.alphanumeric.take(rng.nextInt(40)).mkString)
      .distinct
    val viaColumn = samples.toDF("s")
      .select(H.portableHash60(col("s")).as("h")).as[Long].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(viaColumn.toSeq == samples.map(H.portableHash60JVM(md, _)))
  }
}
