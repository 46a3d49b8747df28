package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: exactly (sfDir, outDir); extra args are a local
    // dev-only query-name filter
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // catalog-table queries (q253/q254 bucketed layouts) use explicit
      // external paths, but pin the warehouse to a scratch dir anyway so
      // no spark-warehouse/ directory ever appears in the repo cwd
      // (scratchIndexDir registers the JVM-exit delete — no /tmp residue)
      .config("spark.sql.warehouse.dir",
        graft.queries.Fixtures.scratchIndexDir("graft-warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        if (sys.env.contains("SPARK_GRAFT_VERIFY_TRACE")) e.printStackTrace()
      }
      GraftCache.releaseAll(spark)
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Rationale for every intentionally-oracle-less query, so a
    // `no_oracle` row in the driver's correctness artifact is
    // self-explaining rather than looking like missing coverage.
    val notes = Map(
      "q61_hash_split" -> ("rows-only BY DESIGN: xxhash64 is Spark-specific "
        + "(no DuckDB twin exists). Cross-audited by q69_portable_split, "
        + "which hash-checks the identical split logic over a portable "
        + "60-bit md5 against DuckDB row-by-row, and by "
        + "q240_split_invariants, which hash-checks the xxhash64 split's "
        + "contract (full assignment, 3 splits, in-tolerance fractions) "
        + "directly against DuckDB."))
    Files.writeString(Paths.get(s"$outDir/rows_only_notes.json"),
      notes.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
