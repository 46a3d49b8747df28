package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up test-data generator: writes a `factor`× copy of an sf dir by
  * unioning `factor` key-offset copies of every fact table (dims pass
  * through). Used for the SCALING.md probe — measuring how each operator
  * family's runtime grows when the data grows 10× with the same
  * distributions.
  *
  * Design constraints (so the scaled corpus measures ENGINE scaling, not
  * artifacts of the copying):
  *  - every key column gets `copy * offset` added, applied consistently
  *    across tables (l_orderkey and o_orderkey shift together), so join
  *    fan-outs and selectivities are IDENTICAL per copy — a 10× corpus
  *    does 10× the join work, not 100×;
  *  - copy 0 is byte-identical to the source; for copies k > 0, document
  *    text drops every ((pos + k) % 3 == 0)-th token, so cross-copy
  *    shingle Jaccard lands ~0.5 — BELOW the 0.7 near-dup threshold —
  *    and the planted dup structure grows linearly (10× clusters), not
  *    quadratically (10-wide cross-copy clusters);
  *  - embeddings get a deterministic per-copy, per-dimension jitter for
  *    the same reason: cross-copy cosine falls out of the near-dup band
  *    while within-copy geometry (centroid structure, label clusters) is
  *    preserved up to the jitter;
  *  - events.ts stays LONG NANOS on disk (the driver's convention —
  *    [[graft.Tables.events]] converts on read), with user_id/event_id
  *    offset so per-user series repeat per copy over the same time range.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> <factor>
  */
object ScaleGen {

  /** Far above any key in the source tables at sf <= 1. */
  private val Offset = 100000000L

  private def shifted(df: DataFrame, keys: Seq[String], copies: Int): DataFrame =
    (0 until copies).map { k =>
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * Offset)))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcSfDir> <outDir> <factor>")
    val Array(src, out, fStr) = args
    val factor = fStr.toInt
    require(factor >= 1 && factor <= 100, s"factor in [1,100], got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[scalegen] $name done")
    }

    // dims pass through unscaled (nation/region are fixed vocabularies)
    write("region", Tables.load(spark, src, "region"))
    write("nation", Tables.load(spark, src, "nation"))

    write("customer", shifted(Tables.load(spark, src, "customer"), Seq("c_custkey"), factor))
    write("supplier", shifted(Tables.load(spark, src, "supplier"), Seq("s_suppkey"), factor))
    write("part", shifted(Tables.load(spark, src, "part"), Seq("p_partkey"), factor))
    write("orders", shifted(Tables.load(spark, src, "orders"),
      Seq("o_orderkey", "o_custkey"), factor))
    write("lineitem", shifted(Tables.load(spark, src, "lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"), factor))
    // ts is long nanos on disk; keep it that way (Tables.events converts)
    write("events", shifted(Tables.load(spark, src, "events"),
      Seq("event_id", "user_id"), factor))

    // documents: decorrelate text across copies (see scaladoc), keep
    // n_chars consistent with the perturbed text
    val docs = Tables.load(spark, src, "documents")
    val docCopies = (0 until factor).map { k =>
      val base = docs.withColumn("doc_id", col("doc_id") + lit(k * Offset))
      if (k == 0) base
      else base
        // drop ~1/3 of token positions in a per-copy pattern that is
        // PAIRWISE distinct across copies: the old `(i + k) % 3` cycle
        // made copies 3 apart keep IDENTICAL positions, so at factor
        // 100 every text had ~33 exact twins and the planted dup
        // structure grew quadratically — the 100× probe drove q25's
        // candidate set (and any broadcast AQE chose for it) to
        // gigabytes. Prime modulus 101 > max factor ⇒ the 37k offsets
        // are distinct per copy; the i·53 spread (53 invertible mod
        // 101) keeps the dropped set scattered over EVERY position —
        // a contiguous `i + 37k` window can sit entirely past a
        // ~50-token doc and hand ~18 of 100 copies the ORIGINAL text
        // verbatim (observed: 549M exact-dup edges at 100×). Any two
        // copies share ~(2/3)² of kept positions, so cross-copy shingle
        // Jaccard stays ~0.5 — below the 0.7 near-dup threshold, as
        // the scaladoc promises.
        .withColumn("text", array_join(
          filter(split(col("text"), " "),
            (x, i) => pmod(i * 53 + lit(k * 37), lit(101)) >= 34),
          " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    write("documents", docCopies.reduce(_ unionByName _))

    // embeddings: deterministic per-copy jitter pushes cross-copy cosine
    // out of the near-dup band while preserving within-copy geometry
    val emb = Tables.load(spark, src, "embeddings")
    val embCopies = (0 until factor).map { k =>
      val base = emb.withColumn("vec_id", col("vec_id") + lit(k * Offset))
      if (k == 0) base
      else base.withColumn("embedding",
        // The old `(vec_id·31 + 7i + 13k) mod 11` jitter CANCELLED its
        // copy dependence: the id shift contributes 31k·(1e8 mod 11 = 1)
        // and 31k + 13k ≡ 0 (mod 11), so every copy carried IDENTICAL
        // jitter and cross-copy cosine was exactly 1 — quadratic planted
        // dup structure, violating this generator's own contract. Prime
        // modulus 101 > max factor with an explicit 37k term (net copy
        // coefficient 68, invertible mod 101) makes the per-copy jitter
        // pairwise distinct; amplitude ±0.4 pushes cross-copy cosine out
        // of the near-dup band while within-copy geometry is preserved.
        transform(col("embedding"), (x, i) =>
          (x + (pmod(col("vec_id") * 31L + i * 7L + lit(k * 37L), lit(101L)) - 50L)
            .cast("float") * 0.008f).cast("float")))
    }
    write("embeddings", embCopies.reduce(_ unionByName _))

    spark.stop()
  }
}
