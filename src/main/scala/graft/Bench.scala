package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry.queries entry against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A failing query is recorded as an error (negative time + errors map)
  * instead of being silently swallowed, and flips the exit code.
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 2) and the MIN is
  * reported; reps are interleaved as full passes over the query list so a
  * transient machine-load window (root cause of the round-5 "q40-q47
  * regression" — not reproducible afterwards) cannot hit every rep of the
  * same query. Rationale for min (root cause of the round-3 "q17-q23
  * regression"):
  * the first execution of a query pays one-time costs — Janino compilation
  * of the generated code, C2 JIT of the hot loops, and cold page cache for
  * its parquet footprint — and with 70 codegen queries in one JVM the
  * background C2 queue backs up nondeterministically, so those costs land
  * on arbitrary queries run-to-run (observed: the same scalar scan at
  * 0.24 s or 1.5 s across back-to-back runs with identical code, with
  * CompilationMXBean showing 1-13 s of background JIT per query). Min-of-N
  * measures steady-state per-query throughput, which is the number that
  * predicts 100 TB behavior: on a long-running cluster job the one-time
  * JIT/compile cost amortizes to zero. SPARK_GRAFT_BENCH_DIAG=1 prints
  * per-run JIT/GC deltas to stderr to audit this.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // dimension/sketch tables up to tens of MB broadcast instead of
      // shuffling both sides — standard production setting for executors
      // with this much memory (local[32]/128 GiB here)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    // Untimed warmup: JIT the parquet reader, codegen, and noop-sink paths
    // so the first timed query doesn't absorb one-time JVM costs.
    try Tables.lineitem(spark, sfDir).limit(1000)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // Optional comma-separated query filter for local iteration, e.g.
    // SPARK_GRAFT_BENCH_ONLY=q18_total_results,q22_download_path
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // Per-query JVM diagnostics (JIT compile ms, GC ms) pin down whether a
    // slow query is doing work or paying run-phase JVM costs.
    val diag = sys.env.get("SPARK_GRAFT_BENCH_DIAG").contains("1")
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    def gcMs: Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)

    var errors = List.empty[(String, String)]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Reps are INTERLEAVED (pass 1 over every query, then pass 2, ...)
    // rather than back-to-back: a transient external slowdown — CPU
    // contention from a co-resident process, page-cache eviction — spans
    // a contiguous time window, and back-to-back reps both land inside
    // it, so min-of-N reports a contiguous BLOCK of queries as regressed
    // with unchanged code (observed round 5: q40-q47 at 5-22x, not
    // reproducible afterwards). Interleaving puts a query's reps minutes
    // apart, so the min survives any window shorter than a full pass.
    def loadAvg: String =
      try java.nio.file.Files.readString(
        java.nio.file.Path.of("/proc/loadavg")).trim.split(" ").head
      catch { case _: Throwable => "?" }
    val timesByQuery = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to reps).foreach { rep =>
      if (diag) System.err.println(s"BENCHDIAG pass $rep loadavg=$loadAvg")
      selected.foreach { case (name, fn) =>
        val (j0, g0) = (jitMs, gcMs)
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every output column;
        // count() would let Catalyst prune the very expressions under test.
        val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          errors ::= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          false
        }
        val sec = (System.nanoTime() - t0) / 1e9
        if (diag)
          System.err.println(f"BENCHDIAG $name%-28s rep$rep ${sec}%7.3f s  jit=+${jitMs - j0}%5d ms  gc=+${gcMs - g0}%4d ms")
        // operators persist their sketch tables; release them between
        // runs so caches don't accumulate across 50+ queries and every
        // rep measures the same cold-cache plan
        GraftCache.releaseAll(spark)
        spark.catalog.clearCache()
        timesByQuery(name) = (if (ok) sec else -sec) :: timesByQuery.getOrElse(name, Nil)
      }
    }
    val coldTimes = selected.map { case (name, _) =>
      name -> timesByQuery(name).last } // pass-1 time (list is prepended)
    // min = steady-state; an errored rep is negative and sorts first,
    // preserving the error marker
    val results = selected.map { case (name, _) => name -> timesByQuery(name).min }
    val qs = results.map { case (k, v) => "\"" + esc(k) + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // first-rep (cold) times published alongside the steady-state mins so
    // the one-time JIT/codegen cost stays auditable, not hidden
    val cold = coldTimes.map { case (k, v) => "\"" + esc(k) + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) => "\"" + esc(k) + "\":\"" + esc(m) + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$cold,"reps":$reps,"errors":$errJson,"sf":"${esc(sfDir)}"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
