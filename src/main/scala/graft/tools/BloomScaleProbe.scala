package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md probe for parquet column bloom filters (the q272 layout
  * arm) at sizes where the skip matters in WALL CLOCK, not just decoded
  * rows. Corpus: an UNSORTED fact (keys scrambled by a coprime stride,
  * only multiples of 4 exist), so every row group AND every page spans
  * ~the whole key domain — min/max stats and the parquet column index
  * prune nothing for a mid-domain probe (an EDGE-of-domain probe is
  * pruned by page stats alone, measured and excluded from the design;
  * the bloom regime is mid-domain keys).
  *
  * Three layouts per corpus size n:
  *  - `plain`:   stats only (what a pre-bloom writer produced);
  *  - `bloom`:   NDV hint = the table row count — a safe CEILING for
  *               any group (over-sized filters, extra footer bytes);
  *  - `starved`: NDV hint = 400k on ~1.25M-key groups — the
  *               SATURATION TRAP: the filter answers "maybe" almost
  *               always and silently stops skipping. parquet gives no
  *               error or warning for this; only the decode counter
  *               shows it.
  *
  * Per layout: one-time write cost, file bytes (the filter's storage
  * price), and a mid-domain ABSENT-key equality probe (median seconds
  * of `reps`, rows the scan decoded) plus a PRESENT-key probe through
  * the bloom layout (the true-positive path must not regress).
  *
  * Usage: runMain graft.tools.BloomScaleProbe [nRows...] [reps=N]
  * Defaults: 2000000 20000000 60000000, reps=3.
  */
object BloomScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(3)
    val sizes = args.filterNot(_.startsWith("reps=")).map(_.toLong) match {
      case Array() => Seq(2000000L, 20000000L, 60000000L)
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

    // untimed warm write: Janino/JIT for the write path compiles once
    timed(spark.range(1000L).select(col("id").as("k"), col("id").as("v1"), col("id").as("v2"))
      .write.mode("overwrite").parquet(
        graft.queries.Fixtures.scratchIndexDir("bloom-warm") + "/w"))

    sizes.foreach { n =>
      val dir = graft.queries.Fixtures.scratchIndexDir(s"bloom-probe-$n")
      def corpus = spark.range(n).select(
        (pmod(col("id") * 2654435761L, lit(n)) * 4).as("k"),
        (col("id") % 97).as("v1"), (col("id") % 9973).as("v2"))
      val grp = 8L * 1024 * 1024
      val (_, wPlain) = timed {
        graft.sources.BloomLayout.writePlain(corpus, s"$dir/plain", "k", grp)
      }
      val (_, wBloom) = timed {
        graft.sources.BloomLayout.writeWithBloom(corpus, s"$dir/bloom", "k", n, grp)
      }
      val (_, wStarved) = timed {
        graft.sources.BloomLayout.writeWithBloom(corpus, s"$dir/starved", "k", 400000L, grp)
      }
      def bytes(p: String): Long =
        Option(new java.io.File(p).listFiles())
          .map(_.filter(_.getName.endsWith(".parquet")).map(_.length()).sum).getOrElse(0L)
      def probe(path: String, key: Long): (Double, Long) = {
        val times = (1 to reps).map { _ =>
          timed(spark.read.parquet(path).where(col("k") === key).collect())._2
        }
        val q = spark.read.parquet(path).where(col("k") === key)
        q.collect()
        val decoded = q.queryExecution.executedPlan
          .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
          .map(_.metrics("numOutputRows").value).sum
        (median(times), decoded)
      }
      val absent = (n / 2) * 4 + 2 // mid-domain, never written (keys are multiples of 4)
      val present = 4L * (n / 3)
      val (tP, dP) = probe(s"$dir/plain", absent)
      val (tB, dB) = probe(s"$dir/bloom", absent)
      val (tS, dS) = probe(s"$dir/starved", absent)
      val (tPres, dPres) = probe(s"$dir/bloom", present)
      println(s"""{"probe":"bloom","n":$n,"reps":$reps,""" +
        s""""write_plain_sec":${f(wPlain)},"write_bloom_sec":${f(wBloom)},"write_starved_sec":${f(wStarved)},""" +
        s""""bytes_plain":${bytes(s"$dir/plain")},"bytes_bloom":${bytes(s"$dir/bloom")},"bytes_starved":${bytes(s"$dir/starved")},""" +
        s""""absent_plain_sec":${f(tP)},"absent_plain_rows":$dP,""" +
        s""""absent_bloom_sec":${f(tB)},"absent_bloom_rows":$dB,""" +
        s""""absent_starved_sec":${f(tS)},"absent_starved_rows":$dS,""" +
        s""""present_bloom_sec":${f(tPres)},"present_bloom_rows":$dPres}""")
    }
    spark.stop()
  }

  private def f(d: Double): String = f"$d%.3f"
}
