package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All tables are plain parquet files; reading them through `spark.read`
  * keeps column pruning and filter pushdown available to Catalyst — every
  * query in [[SparkEntry]] should show `PushedFilters` / a narrow
  * `ReadSchema` in `.explain("formatted")` when it filters/projects.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    // rejects outright (PARQUET_TYPE_ILLEGAL) — read nanos as long and
    // convert back to a timestamp column in the events loader below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** events.ts has shipped in two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (read as long nanoseconds via the
    * nanosAsLong conf in [[load]]) and plain timestamp[us] (read as
    * TIMESTAMP_NTZ). Normalize both to the same session-zone
    * TimestampType column (microsecond precision, UTC session zone set by
    * every entrypoint) so downstream queries and the DuckDB oracle —
    * which reads either encoding as a naive timestamp — see identical
    * wall-clock values regardless of generation.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val df = load(spark, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
