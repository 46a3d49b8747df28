package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-pipeline state (SURVEY §2.10 T2-T4, §2.6 A3/A4), persisted
  * as three small parquet tables under one root directory:
  *
  *  - `sessions/`  — per product type: status, last_completed_page,
  *                   total_pages, total_products  (reference:
  *                   storage/state.py:92-117, models.py:92-99)
  *  - `completed/` — the exactly-once-per-key URL set (state.py:133-140)
  *  - `failed/`    — dead-letter queue: url, error, retries, last_attempt
  *                   (state.py:142-167, models.py:102-108)
  *
  * Design departures from the reference, on purpose (state.py:49-83
  * rewrites the FULL state JSON after every row mutation — its scalability
  * defect): mutations here are BATCH-level DataFrame writes. Each table is
  * tiny relative to the corpus (thousands of rows per million documents),
  * so Catalyst broadcast-joins them against the big side automatically —
  * exactly how the reference uses its in-memory sets.
  *
  * Writes go through a temp-dir + atomic-rename commit so a crashed job
  * never leaves a half-written table (the same window the reference has
  * between download success and _save_state is documented in SURVEY §7.4).
  */
class StateStore(spark: SparkSession, root: String) {

  private def path(table: String) = s"$root/$table"

  private val sessionSchema = "product_type string, status string, " +
    "last_completed_page int, total_pages int, total_products long"
  private val keySchema = "url string"
  private val failedSchema = "url string, error string, retries int, last_attempt timestamp"

  private def readOrEmpty(table: String, schema: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(schema)).parquet(path(table))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** Atomic table replace: write to `<table>.tmp`, then rename over the
    * old directory. Readers either see the old or the new table.
    */
  private def commit(df: DataFrame, table: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path(table) + ".tmp")
    val dst = new org.apache.hadoop.fs.Path(path(table))
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  // ---- T2: session offsets (resume support) ----

  def sessions: DataFrame = readOrEmpty("sessions", sessionSchema)

  /** Start (or restart) a session row for a product type
    * (state.py:99-106).
    */
  def startSession(productType: String, totalPages: Int): Unit = {
    val others = sessions.where(col("product_type") =!= productType)
    val existing = sessions.where(col("product_type") === productType)
      .select("last_completed_page", "total_products").collect().headOption
    val row = spark.sql(
      s"""SELECT '$productType' AS product_type, 'in_progress' AS status,
         | ${existing.map(_.getInt(0)).getOrElse(0)} AS last_completed_page,
         | $totalPages AS total_pages,
         | CAST(${existing.map(_.getLong(1)).getOrElse(0L)} AS LONG) AS total_products""".stripMargin)
    commit(others.unionByName(row), "sessions")
  }

  /** The page to resume from: last_completed_page + 1 (state.py:108-117,
    * cli.py:76-77).
    */
  def resumePage(productType: String): Int =
    sessions.where(col("product_type") === productType)
      .select("last_completed_page").collect().headOption.map(_.getInt(0) + 1).getOrElse(1)

  /** Per-batch progress commit (replaces the reference's per-page full
    * rewrite, state.py:108-113).
    */
  def updateProgress(productType: String, page: Int, newProducts: Long): Unit = {
    val updated = sessions.withColumn("last_completed_page",
        when(col("product_type") === productType, greatest(col("last_completed_page"), lit(page)))
          .otherwise(col("last_completed_page")))
      .withColumn("total_products",
        when(col("product_type") === productType, col("total_products") + newProducts)
          .otherwise(col("total_products")))
    commit(updated, "sessions")
  }

  def completeSession(productType: String): Unit =
    commit(sessions.withColumn("status",
      when(col("product_type") === productType, lit("completed")).otherwise(col("status"))),
      "sessions")

  /** T2 reset: drop one session (or all state, reference cli.py:464-502). */
  def resetSession(productType: String): Unit =
    commit(sessions.where(col("product_type") =!= productType), "sessions")

  // ---- T3: completed-key set (exactly-once-per-URL) ----

  def completed: DataFrame = readOrEmpty("completed", keySchema)

  /** Idempotent batch insert (U3; state.py:137-140 set-add, batched). */
  def markCompleted(urls: DataFrame): Unit =
    commit(completed.unionByName(urls.select(col(urls.columns.head).as("url")))
      .distinct(), "completed")

  /** J2 guard: tasks not yet completed (cli.py:101-103). */
  def filterPending(tasks: DataFrame, urlCol: String): DataFrame =
    tasks.join(completed.withColumnRenamed("url", urlCol), Seq(urlCol), "left_anti")

  // ---- T4: dead-letter queue + replay ----

  def failed: DataFrame = readOrEmpty("failed", failedSchema)

  /** Record failures; a url already in the DLQ gets retries+1 and the new
    * error (state.py:142-156).
    */
  def markFailed(failures: DataFrame): Unit = {
    val incoming = failures.select(
      col("url").cast("string"),
      col("error").cast("string"),
      current_timestamp().as("last_attempt"))
    val prior = failed.select(col("url"), col("retries").as("prior_retries"))
    val merged = incoming.join(prior, Seq("url"), "left")
      .select(col("url"), col("error"),
        (coalesce(col("prior_retries"), lit(0)) + 1).as("retries"),
        col("last_attempt"))
    commit(failed.join(incoming.select("url"), Seq("url"), "left_anti")
      .unionByName(merged), "failed")
  }

  /** J4: remove urls that have since succeeded (state.py:162-167). */
  def clearSucceeded(succeededUrls: DataFrame): Unit =
    commit(failed.join(
      succeededUrls.select(col(succeededUrls.columns.head).as("url")),
      Seq("url"), "left_anti"), "failed")

  // ---- A3: state summary ----

  /** Per-type session summary + global completed/failed counts
    * (state.py:181-195, rendered cli.py:382-413). The two driver-side
    * counts become a literal one-row frame via the typed API (not SQL
    * string interpolation — values never round-trip through a parser).
    */
  def summary: DataFrame = {
    import spark.implicits._
    val counts = Seq((completed.count(), failed.count()))
      .toDF("completed_downloads", "failed_downloads")
    sessions.crossJoin(counts)
  }
}
