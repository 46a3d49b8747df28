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
  *    text drops ~1/3 of token positions chosen by a per-(position,
  *    copy) HASH (xxhash64(pos, k) % 3 == 0) — a PRF, because every
  *    arithmetic pattern tried before it leaked: the original
  *    `(pos + k) % 3` cycle made copies 3 apart identical, and even a
  *    "pairwise distinct" affine pattern mod a prime collides for copy
  *    deltas whose offset is ±1 mod the modulus (near-identical drop
  *    masks → verbatim twins, found by review). Hashed drops give
  *    cross-copy shingle Jaccard ~0.45 for EVERY copy pair — below the
  *    0.7 near-dup threshold — so the planted dup structure grows
  *    linearly (10× clusters), not quadratically;
  *  - embeddings get a per-(id, dimension, copy) HASHED jitter for the
  *    same reason (the arithmetic version's copy term cancelled mod its
  *    modulus, leaving cross-copy cosine at 1.0): cross-copy cosine
  *    falls out of the near-dup band while within-copy geometry
  *    (centroid structure, label clusters) is preserved up to jitter;
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
        // Drop ~1/3 of token positions by a per-(position, copy) PRF.
        // History of this line (each version numerically falsified):
        // `(i + k) % 3` made copies 3 apart IDENTICAL (quadratic dups,
        // >1 GiB q25 broadcast at 100×); a contiguous window mod 101
        // missed ~50-token docs entirely for ~18/100 copies (549M
        // exact-dup edges); an affine spread `(53i + 37k) mod 101`
        // still gave near-identical masks for copy deltas with offset
        // ±1 mod 101 (byte-identical twins at deltas 30/71 — caught in
        // review). Only a hash decorrelates every pair: xxhash64 mixes
        // position and copy, so any two copies disagree independently
        // per position and cross-copy shingle Jaccard sits ~0.45 for
        // ALL pairs. Generator-side only — never oracle-checked — so a
        // Spark-specific hash is fine.
        .withColumn("text", array_join(
          filter(split(col("text"), " "),
            (x, i) => pmod(xxhash64(i, lit(k)), lit(3)) =!= 0),
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
        // Per-(id, dimension, copy) HASHED jitter. The arithmetic
        // versions failed twice: `(vec_id·31 + 7i + 13k) mod 11`'s copy
        // term CANCELLED (id-shift contributes 31k, 31k + 13k ≡ 0 mod
        // 11 — identical jitter on every copy, cosine exactly 1), and
        // the affine mod-101 retry still gave cosine ~0.9996 for copy
        // deltas whose net coefficient is ±1 mod 101 (caught in
        // review). xxhash64 mixing (id, dim, copy) decorrelates every
        // pair; amplitude ±0.4 pushes cross-copy cosine out of the
        // near-dup band while within-copy geometry is preserved.
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), i, lit(k)), lit(101L)) - 50L)
            .cast("float") * 0.008f).cast("float")))
    }
    write("embeddings", embCopies.reduce(_ unionByName _))

    spark.stop()
  }
}
