package graft.tools

import graft.operators.{DedupOps, MultimodalOps}
import graft.operators.MultimodalOps.ImageRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SCALING.md probe for the image near-dup family on a DEGENERATE-HEAVY
  * corpus — the round-13 100× probe ran on the cubic-residue gradient
  * fixture, which is engineered for hash diversity and therefore cannot
  * exhibit the identical-hash blowup the round-14 guards exist for.
  * This probe measures the guarded path on a web-crawl-realistic mix
  * and the clean corpus side by side, same image count:
  *
  *  - `clean`: every image a unique gradient PNG (the r13 corpus —
  *    natural 3-member near-dup families, ~n distinct hashes)
  *  - `degen`: 5% SOLID FILLS (every uniform image dHashes to
  *    all-zeros → ONE identical-hash block of n/20 members), 10% spread
  *    over 50 byte-identical families (n/1000 members each — the
  *    re-served-logo case), 85% unique gradients
  *
  * Two shapes timed per corpus: `neardup` (decode → dHash →
  * imageNearDups certificate, the q257 shape) and `dedup` (certificate
  * → star-CC → keep list, the q258 shape). Before the guards, the
  * degen corpus' 25k-member block alone generates ~1.9e9 candidate
  * rows (6·B²/2, B = 25k) and the run aborts or crawls; with
  * pre-grouping its band-join contribution is ONE row and the expected
  * cost is near-flat vs clean.
  *
  * Usage: runMain graft.tools.ImageDegenProbe <nImages> [reps]
  * Prints one JSON line (medians of `reps` steady-state reps).
  */
object ImageDegenProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ImageDegenProbe <nImages> [reps]")
    val n = args(0).toLong
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.sql.warehouse.dir",
        graft.queries.Fixtures.scratchIndexDir("graft-probe-warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sp: SparkSession = spark
    import spark.implicits._

    def cleanCorpus: Dataset[ImageRow] =
      spark.range(n).mapPartitions(_.map(i =>
        ImageRow(i, MultimodalOps.syntheticGradientPng(i))))

    // blobs are generated ON THE EXECUTORS per-partition; family
    // content ids are spaced by 3 so each of the 50 blocks is a
    // DISTINCT variant-0 gradient, byte-identical within the block
    def degenCorpus: Dataset[ImageRow] =
      spark.range(n).mapPartitions(_.map { i =>
        val m = i % 20
        if (m == 0L) ImageRow(i, MultimodalOps.syntheticPng(i, 16, 16))
        else if (m <= 2L)
          ImageRow(i, MultimodalOps.syntheticGradientPng(1500000000L + 3L * (i % 50)))
        else ImageRow(i, MultimodalOps.syntheticGradientPng(i))
      })

    def nearDup(corpus: () => Dataset[ImageRow]): DataFrame =
      MultimodalOps.imageNearDups(MultimodalOps.imageDHash(corpus()), maxDist = 2)

    // the q260 admission shape: a 1% fresh batch (re-crawled content
    // under shifted ids — every 100th image's content) probed against
    // the full corpus
    def probe(corpus: () => Dataset[ImageRow]): DataFrame = {
      val batch = corpus().filter(_.mediaId % 100L == 0L)
        .map(r => r.copy(mediaId = r.mediaId + 1000000000L))
      MultimodalOps.imageNearDupProbe(
        MultimodalOps.imageDHash(corpus()),
        MultimodalOps.imageDHash(batch), maxDist = 2)
    }

    def dedup(corpus: () => Dataset[ImageRow]): DataFrame = {
      val pairs = nearDup(corpus).select("id_a", "id_b")
      val cc = DedupOps.connectedComponents(pairs)
      val docs = spark.range(n).toDF("media_id")
      docs.join(cc, docs("media_id") === cc("id"), "left")
        .select(col("media_id"),
          coalesce(col("component"), col("media_id")).as("cluster"),
          (coalesce(col("component"), col("media_id")) === col("media_id")).as("is_kept"))
    }

    def medianOf(mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.GraftCache.releaseAll(spark)
        dt
      }
      once() // warm (JIT + codegen)
      val ts = (1 to reps).map(_ => once()).sorted
      ts((ts.size - 1) / 2)
    }

    def pairCount(mk: () => DataFrame): Long = {
      val c = mk().count()
      graft.GraftCache.releaseAll(spark)
      c
    }

    val cleanNd = medianOf(() => nearDup(() => cleanCorpus))
    val degenNd = medianOf(() => nearDup(() => degenCorpus))
    val cleanDd = medianOf(() => dedup(() => cleanCorpus))
    val degenDd = medianOf(() => dedup(() => degenCorpus))
    val cleanPr = medianOf(() => probe(() => cleanCorpus))
    val degenPr = medianOf(() => probe(() => degenCorpus))
    val cleanPairs = pairCount(() => nearDup(() => cleanCorpus))
    val degenPairs = pairCount(() => nearDup(() => degenCorpus))

    println(f"""{"n":$n,"reps":$reps,"clean_neardup_sec":$cleanNd%.3f,"degen_neardup_sec":$degenNd%.3f,"clean_dedup_sec":$cleanDd%.3f,"degen_dedup_sec":$degenDd%.3f,"clean_probe_sec":$cleanPr%.3f,"degen_probe_sec":$degenPr%.3f,"clean_pairs":$cleanPairs,"degen_pairs":$degenPairs}""")
    spark.stop()
  }
}
