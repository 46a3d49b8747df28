package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry.queries entry against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A failing query is recorded as an error (negative time + errors map)
  * instead of being silently swallowed, and flips the exit code.
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

    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces full materialization of every output column;
      // count() would let Catalyst prune the very expressions under test.
      val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        errors ::= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // operators persist their sketch tables; release them between
      // queries so caches don't accumulate across 50+ queries
      GraftCache.releaseAll(spark)
      spark.catalog.clearCache()
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => "\"" + esc(k) + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) => "\"" + esc(k) + "\":\"" + esc(m) + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"${esc(sfDir)}"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
