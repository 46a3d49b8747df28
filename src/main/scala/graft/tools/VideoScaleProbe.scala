package graft.tools

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.ImageRow
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** SCALING.md probe for the video fingerprint family (q263/q264): the
  * container-parse → 4 × frame-decode → per-frame dHash → XOR-fold →
  * guarded banded-Hamming join chain measured at contract scale and
  * 30×/100×, plus a degenerate mix (5% ONE byte-identical video
  * re-served n/20 times — the re-crawled hero-clip analog of the image
  * probe's logo — plus 10% spread over 50 smaller byte-identical
  * families). The family shares the image path's guards, so the
  * expected shape is the same: near-flat degenerate cost, scan-bound
  * overall — with the scan ~4× the image family's decode work (four
  * frames per blob).
  *
  * Usage: runMain graft.tools.VideoScaleProbe <nVideos> [reps]
  * Prints one JSON line (medians of `reps` steady-state reps).
  */
object VideoScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: VideoScaleProbe <nVideos> [reps]")
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
        ImageRow(i, MultimodalOps.syntheticVideoFamily(i))))

    // 5% one constant video re-served n/20 times (one identical-hash
    // block), 10% across 50 byte-identical families, 85% planted
    // family videos
    def degenCorpus: Dataset[ImageRow] =
      spark.range(n).mapPartitions(_.map { i =>
        val m = i % 20
        if (m == 0L) ImageRow(i, MultimodalOps.syntheticVideoFamily(0L))
        else if (m <= 2L)
          ImageRow(i, MultimodalOps.syntheticVideoFamily(1500000000L + 3L * (i % 50)))
        else ImageRow(i, MultimodalOps.syntheticVideoFamily(i))
      })

    def nearDup(corpus: () => Dataset[ImageRow]): DataFrame =
      MultimodalOps.imageNearDups(
        MultimodalOps.videoFingerprint(corpus()), maxDist = 2)

    def medianOf(mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.GraftCache.releaseAll(spark)
        dt
      }
      once() // warm
      val ts = (1 to reps).map(_ => once()).sorted
      ts((ts.size - 1) / 2)
    }

    def pairCount(mk: () => DataFrame): Long = {
      val c = mk().count()
      graft.GraftCache.releaseAll(spark)
      c
    }

    // clip-matching arms (q266): clean = planted clip pairs; degen adds
    // 5% of the corpus opening with ONE shared title sequence — the
    // degenerate shingle bucket the CappedList guard exists for (the
    // pre-grouping CANNOT collapse these: every video is distinct)
    def clipClean: Dataset[ImageRow] =
      MultimodalOps.asVideoClipTable(
        spark.range(n).toDF("doc_id"), "doc_id")
    def clipDegen: Dataset[ImageRow] =
      spark.range(n).mapPartitions(_.map { i =>
        if (i % 20 == 0L)
          ImageRow(i, MultimodalOps.videoContainer(
            (0 until 3).map(f => MultimodalOps.gradientPng(y =>
              MultimodalOps.clipFrameBits(900000000L, f, y))) :+
              MultimodalOps.gradientPng(y =>
                MultimodalOps.clipFrameBits(900001000L + i, 0, y))))
        else {
          val family = i / 2
          val shift = (i % 2).toInt
          ImageRow(i, MultimodalOps.videoContainer((0 until 4).map(f =>
            MultimodalOps.gradientPng(y =>
              MultimodalOps.clipFrameBits(family, f + shift, y)))))
        }
      })

    def clipMatch(corpus: () => Dataset[ImageRow]): DataFrame =
      MultimodalOps.videoClipMatches(corpus(), minShared = 2)

    val clean = medianOf(() => nearDup(() => cleanCorpus))
    val degen = medianOf(() => nearDup(() => degenCorpus))
    val cleanPairs = pairCount(() => nearDup(() => cleanCorpus))
    val degenPairs = pairCount(() => nearDup(() => degenCorpus))
    val clipCleanSec = medianOf(() => clipMatch(() => clipClean))
    val clipDegenSec = medianOf(() => clipMatch(() => clipDegen))
    val clipCleanPairs = pairCount(() => clipMatch(() => clipClean))
    val clipDegenPairs = pairCount(() => clipMatch(() => clipDegen))

    println(f"""{"n":$n,"reps":$reps,"clean_neardup_sec":$clean%.3f,"degen_neardup_sec":$degen%.3f,"clean_pairs":$cleanPairs,"degen_pairs":$degenPairs,"clip_clean_sec":$clipCleanSec%.3f,"clip_degen_sec":$clipDegenSec%.3f,"clip_clean_pairs":$clipCleanPairs,"clip_degen_pairs":$clipDegenPairs}""")
    spark.stop()
  }
}
