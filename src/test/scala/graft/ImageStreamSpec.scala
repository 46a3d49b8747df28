package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.ImageRow

/** T2/T3 treatment for the IMAGE ingest family — the PageStreamSpec
  * contract applied to blobs: a streaming image pipeline (scan-side
  * dHash → stateful dedup by VISUAL CONTENT → parquet sink) must
  * survive a crash mid-batch and a restart from the same checkpoint
  * with no duplicate and no loss, where identity is the CONTENT hash,
  * not the media id. The memory sink cannot recover from a checkpoint,
  * so everything runs through parquet + a real checkpoint dir.
  */
class ImageStreamSpec extends SparkSpec {
  import spark.implicits._

  private implicit val s: org.apache.spark.sql.SparkSession = spark

  test("image ingest: crash mid-batch, resume from checkpoint — exactly-once per visual CONTENT") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-img-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-img-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-img-ckpt").toString
    val poisonFlag = java.nio.file.Paths.get(
      java.nio.file.Files.createTempDirectory("graft-img-flag").toString, "broken")
    val Poison = 99L

    // one parquet file per addition + maxFilesPerTrigger=1: each file is
    // its own micro-batch, so the injected failure sits cleanly between
    // committed offsets
    def addFile(rows: (Long, Long)*): Unit = // (mediaId, content seed)
      rows.map { case (id, seed) =>
        ImageRow(id, MultimodalOps.syntheticGradientPng(seed)) }
        .toDS().coalesce(1).write.mode("append").parquet(inDir)

    def start() = {
      // closure-captured as primitives: a j.n.f.Path in the map lambda
      // is not serializable
      val flagPath = poisonFlag.toString
      val poisonId = Poison
      val imgs = spark.readStream
        .schema("mediaId LONG, content BINARY")
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
        .as[ImageRow]
        // the crash under test: a poisoned blob fails its micro-batch
        // BEFORE any row reaches the sink — the PageStream source-side
        // failure contract (offset uncommitted, nothing half-written)
        .map { r =>
          if (r.mediaId == poisonId && new java.io.File(flagPath).exists())
            throw new RuntimeException("injected decode crash")
          r
        }
      // blobs hash in the narrow map stage; only (id, 4 ints) reaches
      // the stateful dedup, which keys on the CONTENT hash — a
      // re-crawled byte-identical image under a NEW id is dropped by
      // checkpointed state, across batches AND restarts
      MultimodalOps.imageDHash(imgs)
        .dropDuplicates("band0", "band1", "band2", "band3")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
    }
    def delivered(): Seq[Long] = spark.read.parquet(out)
      .select("mediaId").collect().map(_.getLong(0)).sorted.toSeq

    // batch 1 commits two contents
    addFile(0L -> 0L, 1L -> 1L)
    val q1 = start()
    q1.processAllAvailable()
    assert(delivered() == Seq(0L, 1L))

    // batch 2 carries: a re-crawl of content 0 under a new id, a new
    // content, and the poisoned blob — the whole batch must fail with
    // NOTHING committed (no torn prefix of the file)
    java.nio.file.Files.createFile(poisonFlag)
    addFile(2L -> 0L, 3L -> 3L, Poison -> 999L)
    val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.stop() // unreachable when the batch failed; keeps the happy path clean
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(failure).exists(_.contains("injected decode crash")),
      s"the poisoned blob must fail the batch: $failure")
    assert(delivered() == Seq(0L, 1L),
      "the failed batch must commit nothing — no torn prefix in the sink")

    // heal and restart from the SAME checkpoint: the uncommitted file is
    // re-read in full. Exactly-once by content: id 2 (re-crawled content
    // 0) is dropped by state RESTORED from the checkpoint; ids 3 and 99
    // deliver exactly once — no dup, no loss
    java.nio.file.Files.delete(poisonFlag)
    val q2 = start()
    q2.processAllAvailable()
    assert(delivered() == Seq(0L, 1L, 3L, Poison),
      s"resume must deliver the crashed batch exactly once, deduped by content: ${delivered()}")

    // state continuity ACROSS the restart boundary: a later re-crawl of
    // pre-crash content 1 is still known; a genuinely new content lands
    addFile(100L -> 1L, 101L -> 101L)
    try q2.processAllAvailable() finally q2.stop()
    assert(delivered() == Seq(0L, 1L, 3L, Poison, 101L),
      s"content seen before the crash must stay deduped after it: ${delivered()}")
  }
}
