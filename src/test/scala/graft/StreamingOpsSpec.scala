package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.PageEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured-Streaming semantics tests via MemoryStream. */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupByKey emits each key exactly once across micro-batches (T3)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingOps.dedupByKey(input.toDF().withColumnRenamed("value", "url"), "url")
    val q = out.writeStream.format("memory").queryName("dedup_t3")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData("u1", "u2", "u1")
      q.processAllAvailable()
      input.addData("u2", "u3")
      q.processAllAvailable()
      val seen = spark.table("dedup_t3").as[String].collect().sorted.toSeq
      assert(seen == Seq("u1", "u2", "u3"))
    } finally q.stop()
  }

  test("sessionProgress accumulates max page + product totals (T2 state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PageEvent]
    val out = StreamingOps.sessionProgress(input.toDS())
    val q = out.writeStream.format("memory").queryName("session_t2")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(PageEvent("life", 1, 60), PageEvent("life", 2, 60))
      q.processAllAvailable()
      input.addData(PageEvent("life", 3, 30), PageEvent("health", 1, 10))
      q.processAllAvailable()
      val rows = spark.table("session_t2")
        .groupBy("productType")
        .agg(max("lastCompletedPage").as("p"), max("totalProducts").as("t"))
        .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
      assert(rows("life") == (3, 150L))
      assert(rows("health") == (1, 10L))
    } finally q.stop()
  }

  test("windowedCounts groups by tumbling event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val out = StreamingOps.windowedCounts(df, "ts", "event_type", "1 hour", "2 hours")
    val q = out.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      input.addData((t(10, 5), "click", 1.0), (t(10, 40), "click", 2.0), (t(11, 10), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("window_start", "n", "sum_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("2026-01-01 10:00:00.0", 2L, 3.0)))
      assert(rows.contains(("2026-01-01 11:00:00.0", 1L, 4.0)))
    } finally q.stop()
  }

  test("csvAppendSink appends each micro-batch through the K1 sink") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val input = MemoryStream[(String, String)]
    val df = input.toDF().toDF("uin", "product_name")
      .withColumn("product_type", lit("life"))
    val q = StreamingOps.csvAppendSink(df, "life", s"$dir/m.csv", s"$dir/ckpt").start()
    try {
      input.addData(("U1", "A")); q.processAllAvailable()
      input.addData(("U2", "B")); q.processAllAvailable()
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(s"$dir/m.csv"))
      assert(lines.size == 3) // one header + two rows
      assert(lines.get(0).startsWith("archive_status,"))
    } finally q.stop()
  }
}
