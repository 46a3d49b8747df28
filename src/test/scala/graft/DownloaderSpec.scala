package graft

import graft.fetch.Downloader
import graft.fetch.Downloader.DownloadTask
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** S6-S8 fetch operator tests with stubbed HTTP. */
class DownloaderSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir = Files.createTempDirectory("graft-dl").toString

  test("successful fetch writes bytes and reports size") {
    val dir = tmpDir
    val tasks = Seq(DownloadTask("https://x.test/a.pdf", s"$dir/a.pdf")).toDS()
    val out = Downloader.download(tasks, url => "hello".getBytes("UTF-8")).collect()
    assert(out.length == 1 && out.head.success && out.head.file_size == 5L)
    assert(Files.readAllBytes(Paths.get(s"$dir/a.pdf")).sameElements("hello".getBytes("UTF-8")))
  }

  test("retry with linear backoff: transient failures recover (S8)") {
    val dir = tmpDir
    // Counter lives in the shared local-mode JVM; fails twice, then works.
    DownloaderSpec.attempts.set(0)
    val tasks = Seq(DownloadTask("u1", s"$dir/r.pdf")).toDS()
    val out = Downloader.download(tasks,
      url => {
        if (DownloaderSpec.attempts.incrementAndGet() <= 2) throw new RuntimeException("flaky")
        "ok".getBytes("UTF-8")
      },
      retryAttempts = 3, retryDelayMs = 1).collect()
    assert(out.head.success)
    assert(DownloaderSpec.attempts.get() == 3)
  }

  test("exhausted retries → failure row with the error preserved (F5)") {
    val dir = tmpDir
    val tasks = Seq(
      DownloadTask("good", s"$dir/g.bin"),
      DownloadTask("bad", s"$dir/b.bin")).toDS()
    val results = Downloader.download(tasks,
      url => if (url == "bad") throw new IllegalStateException("nope")
             else "x".getBytes("UTF-8"),
      retryAttempts = 2, retryDelayMs = 1).toDF()
    val (ok, bad) = Downloader.splitResults(results)
    assert(ok.count() == 1 && bad.count() == 1)
    val err = bad.collect().head.getAs[String]("error")
    assert(err.contains("IllegalStateException") && err.contains("nope"))
  }

  test("skipExisting short-circuits the fetch (idempotent re-execution)") {
    val dir = tmpDir
    Files.write(Paths.get(s"$dir/done.pdf"), "already".getBytes("UTF-8"))
    DownloaderSpec.attempts.set(0)
    val tasks = Seq(DownloadTask("u", s"$dir/done.pdf")).toDS()
    val out = Downloader.download(tasks,
      url => { DownloaderSpec.attempts.incrementAndGet(); "new".getBytes("UTF-8") }).collect()
    assert(out.head.success && out.head.file_size == 7L)
    assert(DownloaderSpec.attempts.get() == 0) // fetch never invoked
  }

  test("numExecutors splits the cluster-global budget: aggregate rate ≤ ratePerSec") {
    // Two simulated executors sharing a 40/s global budget: each JVM's
    // bucket must enforce 20/s. This local-mode JVM stands in for one
    // executor — 10 fetches through its bucket need ≥ 9/20 s ≈ 450 ms of
    // spacing, so TWO such executors in parallel would aggregate to at
    // most 40/s. A failure here (elapsed < 400 ms) would mean the JVM ran
    // at the unsplit global rate and the fleet would run at 2× budget.
    val dir = tmpDir
    val tasks = (1 to 10).map(i => DownloadTask(s"u$i", s"$dir/e$i.bin")).toDS()
    val t0 = System.nanoTime()
    Downloader.download(tasks, _ => "x".getBytes("UTF-8"),
      maxConcurrent = 10, ratePerSec = 40.0, numExecutors = 2).collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 400,
      s"elapsed ${elapsedMs}ms — per-JVM rate was not ratePerSec/numExecutors")
  }

  test("rate limiter spaces acquisitions at roughly the configured rate") {
    val dir = tmpDir
    val tasks = (1 to 5).map(i => DownloadTask(s"u$i", s"$dir/f$i.bin")).toDS()
    val t0 = System.nanoTime()
    Downloader.download(tasks, _ => "x".getBytes("UTF-8"),
      maxConcurrent = 5, ratePerSec = 20.0).collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 5 acquisitions at 20/s ≈ ≥200ms of spacing (first one is free)
    assert(elapsedMs >= 150, s"elapsed ${elapsedMs}ms — limiter not engaged")
  }
}

object DownloaderSpec {
  val attempts = new AtomicInteger(0)
}
