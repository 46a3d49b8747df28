package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ItemsetOps

/** SCALING.md probe for Apriori frequent pairs (q278): does pruning
  * before generation actually beat the textbook per-doc self-join,
  * and by how much, on a corpus shaped like real text (a small
  * frequent head + a long infrequent tail)?
  *
  * Corpus (deterministic, id arithmetic only): each doc holds ~10
  * head tokens out of a 50-token head vocabulary (h{(id+j²)%50},
  * j<10 — each head token lands in exactly 20% of docs, and pairwise
  * co-occurrence is the residue-set overlap: 100 head pairs share 4/50
  * residues (8% of docs, frequent at minSupport n/20), 725 share 2/50
  * and 400 share 1/50 (below threshold)) plus 30 tail tokens
  * unique to the doc (t{id·31+j} — support 1, hopeless). Unpruned
  * pair generation is C(~40,2) ≈ 780 pairs/doc, dominated by
  * tail×anything pairs that can never be frequent; Apriori's item
  * filter cuts it to C(~10,2) ≈ 45/doc before any pair exists.
  *
  * `naive` = explode distinct tokens, self-join on doc id, count,
  * filter — the plan a straightforward SQL translation produces.
  * It is run only at sizes where its pair volume is sane; the point
  * of the probe is the crossover, not waiting out a 1.2B-row join.
  *
  * Usage: runMain graft.tools.ItemsetScaleProbe [nDocs...] [reps=N]
  * Defaults: 50000 200000 1000000, reps=3; naive skipped above
  * 200000 docs.
  */
object ItemsetScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(3)
    val sizes = args.filterNot(_.startsWith("reps=")).map(_.toLong) match {
      case Array() => Seq(50000L, 200000L, 1000000L)
      case xs => xs.toSeq
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def corpus(n: Long): DataFrame = {
      val heads = (0 until 10).map(j =>
        concat(lit("h"), ((col("id") + lit(j * j)) % 50).cast("string")))
      val tails = (0 until 30).map(j =>
        concat(lit("t"), (col("id") * 31 + lit(j)).cast("string")))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", heads ++ tails: _*).as("text"))
    }

    def naive(docs: DataFrame, minSupport: Long): DataFrame = {
      val items = docs.select(col("doc_id"),
        explode(array_distinct(split(trim(col("text")), "\\s+"))).as("t"))
      items.as("a").join(items.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("t1"), col("b.t").as("t2"))
        .agg(count(lit(1)).as("pair_docs"))
        .where(col("pair_docs") >= minSupport)
    }

    // untimed warm pass
    ItemsetOps.frequentPairs(corpus(5000), "doc_id", "text", 500L).count()

    println("%9s %5s %10s %10s %8s".format("docs", "ms", "apriori_s", "naive_s", "n_pairs"))
    sizes.foreach { n =>
      val docs = corpus(n)
      val ms = n / 20
      val tApriori = median((1 to reps).map { _ =>
        timed(ItemsetOps.frequentPairs(docs, "doc_id", "text", ms).count())._2
      })
      val nPairs = ItemsetOps.frequentPairs(docs, "doc_id", "text", ms).count()
      val tNaive =
        if (n > 200000L) Double.NaN
        else median((1 to reps).map { _ => timed(naive(docs, ms).count())._2 })
      println(f"$n%9d $ms%5d $tApriori%10.2f $tNaive%10.2f $nPairs%8d")
    }
    spark.stop()
  }
}
