package graft

import graft.sources.CsvMeta
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

  test("dedupWithinWatermark drops re-fetches with DIFFERENT event times") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "url")
    val out = StreamingOps.dedupWithinWatermark(df, "url", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      // u1 re-fetched 2 minutes later with a different event time: the
      // (key, ts) dedup would emit both; within-watermark dedup must not
      input.addData((t(0), "u1"), (t(2), "u1"), (t(3), "u2"))
      q.processAllAvailable()
      input.addData((t(5), "u1"), (t(6), "u3"))
      q.processAllAvailable()
      val seen = spark.table("dedup_wm").select("url").as[String].collect().sorted.toSeq
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

  test("deltaPipeline survives kill-and-restart with no duplicate appends (T2/T3)") {
    val work = java.nio.file.Files.createTempDirectory("graft-e2e-stream").toString
    val pagesDir = s"$work/pages"
    val csv = s"$work/life.csv"
    val ckpt = s"$work/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pagesDir))

    def writePage(name: String, rows: Seq[(String, String, Int)]): Unit = {
      val trs = rows.map { case (uin, pname, d) =>
        s"""<tr><td><input/></td><td>Non-Archived</td><td>FY 2020</td>
           |<td>Acme Life</td><td>$pname</td><td>$uin</td><td>Term</td>
           |<td></td><td></td><td>P</td><td>Par</td><td>Ind</td><td></td>
           |<td><a href='/documents/doc$d.pdf'>Doc $d</a></td></tr>""".stripMargin.replace("\n", "")
      }.mkString
      java.nio.file.Files.writeString(java.nio.file.Paths.get(pagesDir, name),
        s"<table class='table'><tbody>$trs</tbody></table>")
    }

    def csvDataRows(): Seq[String] = {
      val p = java.nio.file.Paths.get(csv)
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(p).asScala.toSeq.drop(1)
      }
    }

    // run 1: two products
    writePage("page_1.html", Seq(("UIN1", "Alpha", 1), ("UIN2", "Beta", 2)))
    val q1 = StreamingOps.deltaPipeline(spark, pagesDir, "life", csv, ckpt)
    try q1.processAllAvailable() finally q1.stop() // kill mid-stream
    assert(csvDataRows().size == 2)

    // while down: a new page arrives repeating doc1 (dup URL) + one new doc
    writePage("page_2.html", Seq(("UIN1", "Alpha", 1), ("UIN3", "Gamma", 3)))

    // run 2: restart from the SAME checkpoint — only the new URL lands
    val q2 = StreamingOps.deltaPipeline(spark, pagesDir, "life", csv, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val rows = csvDataRows()
    assert(rows.size == 3, s"expected 3 data rows, got:\n${rows.mkString("\n")}")
    val urls = rows.map(_.split(",", -1)(CsvMeta.columns("life").indexOf("document_url")))
    assert(urls.distinct.size == 3, s"duplicate URLs appended: $urls")

    // run 3: nothing new → nothing appended
    val q3 = StreamingOps.deltaPipeline(spark, pagesDir, "life", csv, ckpt)
    try q3.processAllAvailable() finally q3.stop()
    assert(csvDataRows().size == 3)
  }

  test("streamingSessions closes a session via event-time timeout, splits in-batch gaps") {
    import graft.streaming.StreamingOps.{ClosedSession, Interaction}
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[Interaction]
    val out = StreamingOps.streamingSessions(input.toDS(),
      gapMinutes = 30, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10 min apart (one session); an in-batch gap of
      // 2h later must split into a second session
      input.addData(Interaction(1L, t(10, 0)), Interaction(1L, t(10, 10)),
        Interaction(1L, t(12, 30)))
      q.processAllAvailable()
      // nothing is final yet (the watermark hasn't passed end + gap at
      // PROCESSING time); the 18:00 event advances the watermark to
      // 17:50 and the follow-up timeout batch closes BOTH user-1
      // sessions — the split is visible in the two emitted rows
      input.addData(Interaction(2L, t(18, 0)))
      q.processAllAvailable()
      val afterBatch2 = spark.table("sessions_stream").as[ClosedSession].collect().toSet
      assert(afterBatch2 == Set(ClosedSession(1L, t(10, 0), t(10, 10), 2L),
        ClosedSession(1L, t(12, 30), t(12, 30), 1L)))
      // push the watermark past 12:30 + gap, then past 18:00 + gap
      input.addData(Interaction(2L, t(23, 0)))
      q.processAllAvailable()
      input.addData(Interaction(3L, t(23, 59)))
      q.processAllAvailable()
      val closed = spark.table("sessions_stream").as[ClosedSession].collect()
        .map(c => (c.userId, c.sessionStart, c.sessionEnd, c.nEvents)).toSet
      assert(closed.contains((1L, t(12, 30), t(12, 30), 1L)),
        s"timeout should close user 1's second session: $closed")
      assert(closed.contains((2L, t(18, 0), t(18, 0), 1L)),
        s"user 2's first session should close once the watermark passes: $closed")
    } finally q.stop()
  }

  test("streamingSessions: in-watermark late events extend the start backward; " +
    "a late event > gap before the session stays separate") {
    import graft.streaming.StreamingOps.{ClosedSession, Interaction}
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[Interaction]
    val out = StreamingOps.streamingSessions(input.toDS(),
      gapMinutes = 30, watermark = "10 hours")
    val q = out.writeStream.format("memory").queryName("late_sessions_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // open a session at 10:00-10:10
      input.addData(Interaction(1L, t(10, 0)), Interaction(1L, t(10, 10)))
      q.processAllAvailable()
      // late (in-watermark) events: 9:50 is within gap of the session
      // START and must extend it backward; 8:00 is > gap before and must
      // start a SEPARATE earlier session, not silently merge (the old
      // `t - s.end <= gapMs` guard was vacuously true for both)
      input.addData(Interaction(1L, t(9, 50)), Interaction(1L, t(8, 0)))
      q.processAllAvailable()
      // the earlier session is NOT emitted eagerly: a later in-watermark
      // event at 8:10 must still merge into it (cross-batch)
      input.addData(Interaction(1L, t(8, 10)))
      q.processAllAvailable()
      // push the watermark past every session's end + gap
      input.addData(Interaction(2L, t(23, 0)))
      q.processAllAvailable()
      input.addData(Interaction(2L, t(23, 59)))
      q.processAllAvailable()
      val closed = spark.table("late_sessions_stream").as[ClosedSession].collect()
        .map(c => (c.userId, c.sessionStart, c.sessionEnd, c.nEvents)).toSet
      assert(closed.contains((1L, t(8, 0), t(8, 10), 2L)),
        s"8:00 and the cross-batch 8:10 should sessionize together: $closed")
      assert(closed.contains((1L, t(9, 50), t(10, 10), 3L)),
        s"open session should extend its start backward to 9:50: $closed")
    } finally q.stop()
  }

  test("streamIntervalJoin matches within the interval, drops outside it") {
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val signups = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingOps.streamIntervalJoin(
      signups.toDF().toDF("s_user", "s_ts"),
      purchases.toDF().toDF("p_user", "p_ts"),
      "s_user", "p_user", "s_ts", "p_ts", within = "2 hours")
    val q = joined.writeStream.format("memory").queryName("interval_join")
      .outputMode(OutputMode.Append()).start()
    try {
      signups.addData((1L, t(10, 0)), (2L, t(10, 0)))
      // user 1 purchases inside the 2 h window; user 2 outside; user 3
      // never signed up
      purchases.addData((1L, t(11, 30)), (2L, t(13, 0)), (3L, t(11, 0)))
      q.processAllAvailable()
      val rows = spark.table("interval_join")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(rows == Set((1L, 1L)),
        s"only user 1's in-window purchase should match: ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("idempotentCsvAppend: replayed batches are skipped in BOTH crash windows") {
    import org.apache.spark.sql.functions.lit
    val dir = java.nio.file.Files.createTempDirectory("graft-idem").toString
    val csv = s"$dir/m.csv"
    def lines() = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(csv)).asScala.toSeq
    }
    def batch(uin: String) = spark.range(1).toDF()
      .withColumn("uin", lit(uin)).withColumn("product_type", lit("life"))
      .select("uin", "product_type")
    StreamingOps.idempotentCsvAppend(batch("U1"), "life", csv, 0L)
    val afterB0 = lines()
    assert(afterB0.size == 2, s"header + one row: $afterB0")
    // window 1 — crash AFTER the append, BEFORE the checkpoint commit:
    // the engine replays batch 0 verbatim; the sink marker must skip it
    StreamingOps.idempotentCsvAppend(batch("U1"), "life", csv, 0L)
    assert(lines() == afterB0, "replayed batch 0 must not double-append")
    // normal progress
    StreamingOps.idempotentCsvAppend(batch("U2"), "life", csv, 1L)
    val afterB1 = lines()
    assert(afterB1.size == 3)
    // window 2 — the data rename committed but the MARKER move was lost:
    // roll the marker back by hand (data stays at the post-batch-1
    // state) and replay batch 1; the length disagreement must resolve
    // to "already delivered", fixing the marker without touching rows
    val marker = java.nio.file.Paths.get(s"$csv.delivered")
    val headerLen = afterB0.map(_.length + 1L).sum // batch-0 state length
    java.nio.file.Files.writeString(marker, s"0,$headerLen")
    // the raw rewrite bypassed Hadoop's checksummed local FS — drop the
    // now-stale .crc sidecar so the sink can read the rolled-back marker
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, ".m.csv.delivered.crc"))
    StreamingOps.idempotentCsvAppend(batch("U2"), "life", csv, 1L)
    assert(lines() == afterB1, "a marker-lost replay must not re-append the rows")
    // and the recovered marker lets the NEXT batch through normally
    StreamingOps.idempotentCsvAppend(batch("U3"), "life", csv, 2L)
    assert(lines().size == 4)
    val uins = lines().drop(1).map(_.split(",", -1)(CsvMeta.columns("life").indexOf("uin")))
    assert(uins == Seq("U1", "U2", "U3"), s"exactly-once per batch: $uins")
  }

  test("idempotentCsvAppend: a FRESH checkpoint lineage re-baselines, never silently skips") {
    import org.apache.spark.sql.functions.lit
    val key = org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY
    val dir = java.nio.file.Files.createTempDirectory("graft-lineage").toString
    val csv = s"$dir/m.csv"
    def lines() = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(csv)).asScala.toSeq
    }
    def batch(uin: String) = spark.range(1).toDF()
      .withColumn("uin", lit(uin)).withColumn("product_type", lit("life"))
      .select("uin", "product_type")
    try {
      // incarnation 1 delivers batches 0 and 1
      spark.sparkContext.setLocalProperty(key, "query-incarnation-1")
      StreamingOps.idempotentCsvAppend(batch("U1"), "life", csv, 0L)
      StreamingOps.idempotentCsvAppend(batch("U2"), "life", csv, 1L)
      assert(lines().size == 3, "header + two rows")
      // the user deletes the checkpoint and restarts: a NEW query id,
      // batchIds restart at 0. Against the stale high-water mark (1) the
      // old marker logic judged batch 0 "already delivered" and dropped
      // it — data loss. The id mismatch must re-baseline and deliver.
      spark.sparkContext.setLocalProperty(key, "query-incarnation-2")
      StreamingOps.idempotentCsvAppend(batch("U3"), "life", csv, 0L)
      val uins = lines().drop(1).map(_.split(",", -1)(CsvMeta.columns("life").indexOf("uin")))
      assert(uins == Seq("U1", "U2", "U3"),
        s"the new lineage's batch 0 must append, not vanish: $uins")
      // and WITHIN the new lineage the replay guard still holds
      StreamingOps.idempotentCsvAppend(batch("U3"), "life", csv, 0L)
      assert(lines().size == 4, "replayed batch 0 of the new lineage must be skipped")
    } finally spark.sparkContext.setLocalProperty(key, null)
  }

  test("csvAppendSink survives an engine-level batch replay (crash before checkpoint commit)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val csv = s"$dir/m.csv"
    val ckpt = s"$dir/ckpt"
    val input = MemoryStream[(String, String)]
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = input.toDF().toDF("uin", "product_name")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        StreamingOps.idempotentCsvAppend(b.toDF(), "life", csv, id)
        // the crash window under test: the rows are DELIVERED but the
        // engine dies before committing the batch to the checkpoint
        if (crashOnce.getAndSet(false)) throw new RuntimeException("injected crash")
      }.start()
    input.addData(("U1", "A"))
    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable(); q1.stop()
    }
    // restart from the same checkpoint: the engine REPLAYS batch 0
    val q2 = start()
    try {
      q2.processAllAvailable()
      input.addData(("U2", "B"))
      q2.processAllAvailable()
    } finally q2.stop()
    import scala.jdk.CollectionConverters._
    val rows = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(csv))
      .asScala.toSeq.drop(1)
    val uins = rows.map(_.split(",", -1)(CsvMeta.columns("life").indexOf("uin")))
    assert(uins.sorted == Seq("U1", "U2"),
      s"the replayed batch must deliver exactly once: $uins")
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

  test("streamingDistinct registers == batch HLL registers per window") {
    import org.apache.spark.sql.functions.{col, date_format}
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-03-01 $h%02d:$m%02d:00")
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val out = StreamingOps.streamingDistinct(
      input.toDF().toDF("ts", "user"), "ts", "user")
    val q = out.writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      // hour 10: users 1,2,2,3 (dup); hour 11: users 2,4 — split so one
      // user spans both batches and windows
      input.addData((t(10, 0), 1L), (t(10, 10), 2L), (t(10, 20), 2L))
      q.processAllAvailable()
      input.addData((t(10, 30), 3L), (t(11, 5), 2L), (t(11, 40), 4L))
      q.processAllAvailable()
      val streamed = spark.table("hll_stream")
        .select(date_format(col("win.start"), "HH").as("h"), col("bucket"), col("r"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      val batchRows = Seq((t(10, 0), 1L), (t(10, 10), 2L), (t(10, 20), 2L),
        (t(10, 30), 3L), (t(11, 5), 2L), (t(11, 40), 4L))
        .toDF("ts", "user")
        .select(date_format(col("ts"), "HH").as("h"), col("user"))
      val batch = graft.operators.SketchOps
        .hllRegistersBy(batchRows, "user", Seq("h"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamingEwma == batch ewmaSpikes for all in-watermark events, " +
    "including late arrivals and an idle-key timeout drain") {
    import graft.streaming.StreamingOps.{EwmaEvent, EwmaFlag}
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val input = MemoryStream[EwmaEvent]
    val out = StreamingOps.streamingEwma(input.toDS(), den = 8L,
      threshold = 100L, watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("ewma_stream")
      .outputMode(OutputMode.Append()).start()
    val events = Seq(
      EwmaEvent(1L, t(0), 1L, 0L), EwmaEvent(1L, t(18), 2L, 80L),
      EwmaEvent(1L, t(20), 3L, 800L), EwmaEvent(2L, t(30), 4L, 40L))
    try {
      // batch 1 (out of order): t20 and t0 -> watermark advances to t15
      input.addData(EwmaEvent(1L, t(20), 3L, 800L), EwmaEvent(1L, t(0), 1L, 0L))
      q.processAllAvailable()
      // batch 2: t18 arrives AFTER t20 but is still inside the
      // watermark (t18 > t15) — it must score BEFORE t20 in the final
      // output; key 2 starts
      input.addData(EwmaEvent(1L, t(18), 2L, 80L), EwmaEvent(2L, t(30), 4L, 40L))
      q.processAllAvailable()
      // watermark flush: far-future events on an unrelated key
      // finalize key 1 and drain key 2 purely via its timeout
      input.addData(EwmaEvent(9L, t(600), 99L, 1L))
      q.processAllAvailable()
      input.addData(EwmaEvent(9L, t(610), 100L, 1L))
      q.processAllAvailable()
      val streamed = spark.table("ewma_stream").as[EwmaFlag].collect()
        .filter(_.key != 9L) // the watermark-driver key
        .map(f => (f.key, f.seq, f.value, f.ewmaPrev, f.ewma, f.spike)).toSet
      val batch = graft.operators.TimeSeriesOps.ewmaSpikes(
        events.map(e => (e.key, e.ts.getTime, e.seq, e.value))
          .toDF("key", "ts", "seq", "value"),
        "key", "ts", "seq", "value", den = 8L, threshold = 100L)
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
        .map(r => (r._2, r._1, r._3, r._4, r._5, r._6)).toSet
      assert(streamed == batch,
        s"streaming $streamed\nbatch $batch")
    } finally q.stop()
  }

  test("watermark-boundary: Spark drops a flatMapGroupsWithState row with ts == watermark, " +
    "so finalizing the <= prefix is exact") {
    // Pins the engine semantics the EWMA finalization rule rests on: the
    // late-row filter drops input rows with ts <= watermark (not only
    // ts < watermark), so nothing at the boundary can arrive after the
    // watermark reaches it and the <= prefix is final. If a Spark
    // upgrade ever loosens the filter to strict <, the dropped-event
    // assertion below fails and the comparisons in streamingEwma /
    // streamingSessions must be revisited together with this test.
    import graft.streaming.StreamingOps.{EwmaEvent, EwmaFlag}
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val input = MemoryStream[EwmaEvent]
    val out = StreamingOps.streamingEwma(input.toDS(), den = 8L,
      threshold = 100L, watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("ewma_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: key 1 starts; key 9 drives the watermark to exactly t(15)
      input.addData(EwmaEvent(1L, t(0), 1L, 0L), EwmaEvent(9L, t(20), 90L, 1L))
      q.processAllAvailable()
      // batch 2: seq 3 lands at ts EXACTLY == wm == t(15) -> dropped by
      // Spark's late filter; seq 4 at t(16) > wm is accepted and buffered
      input.addData(EwmaEvent(1L, t(15), 3L, 800L), EwmaEvent(1L, t(16), 4L, 80L))
      q.processAllAvailable()
      // advance the watermark far past t(16), then drain the timeout
      input.addData(EwmaEvent(9L, t(600), 91L, 1L))
      q.processAllAvailable()
      input.addData(EwmaEvent(9L, t(610), 92L, 1L))
      q.processAllAvailable()
      val streamed = spark.table("ewma_boundary").as[EwmaFlag].collect()
        .filter(_.key == 1L)
        .map(f => (f.key, f.seq, f.value, f.ewmaPrev, f.ewma, f.spike)).toSet
      // the boundary event (seq 3) is GONE — dropped by the engine, not us
      assert(!streamed.exists(_._2 == 3L),
        s"ts == watermark row was accepted — Spark's late filter changed: $streamed")
      // and the surviving events are exactly batch-equivalent
      val accepted = Seq(
        EwmaEvent(1L, t(0), 1L, 0L), EwmaEvent(1L, t(16), 4L, 80L))
      val batch = graft.operators.TimeSeriesOps.ewmaSpikes(
        accepted.map(e => (e.key, e.ts.getTime, e.seq, e.value))
          .toDF("key", "ts", "seq", "value"),
        "key", "ts", "seq", "value", den = 8L, threshold = 100L)
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
        .map(r => (r._2, r._1, r._3, r._4, r._5, r._6)).toSet
      assert(streamed == batch, s"streaming $streamed\nbatch $batch")
    } finally q.stop()
  }

  test("watermark-boundary: a session whose close point sits exactly at the watermark " +
    "closes safely (no mergeable event can arrive)") {
    // Complement of the EWMA boundary pin for sessions: with the close
    // rule end + gap <= wm, the only event that could have merged into
    // the closing session would carry ts <= wm — which Spark's late
    // filter drops (asserted above). So the early close loses nothing,
    // and the boundary event opens NO new session either.
    import graft.streaming.StreamingOps.{ClosedSession, Interaction}
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[Interaction]
    val out = StreamingOps.streamingSessions(input.toDS(),
      gapMinutes = 30, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 session [10:00, 10:00]; user 9 at 10:40 drives
      // the watermark to exactly 10:30 == session end + 30-min gap
      input.addData(Interaction(1L, t(10, 0)), Interaction(9L, t(10, 40)))
      q.processAllAvailable()
      // batch 2: user 1 event at ts == wm == 10:30 — gap-adjacent, but
      // Spark drops it (ts <= wm); an event at 10:31 starts a NEW session
      // (31 min after 10:00 > 30-min gap anyway)
      input.addData(Interaction(1L, t(10, 30)), Interaction(1L, t(10, 31)))
      q.processAllAvailable()
      // flush everything
      input.addData(Interaction(9L, t(20, 0)))
      q.processAllAvailable()
      input.addData(Interaction(9L, t(23, 0)))
      q.processAllAvailable()
      val got = spark.table("sessions_boundary").as[ClosedSession].collect()
        .filter(_.userId == 1L)
        .map(s => (s.sessionStart, s.sessionEnd, s.nEvents)).sortBy(_._1.getTime)
      assert(got.toSeq == Seq((t(10, 0), t(10, 0), 1L), (t(10, 31), t(10, 31), 1L)),
        s"expected the 10:00 session closed at 1 event and a new 10:31 session, got ${got.toSeq}")
    } finally q.stop()
  }
}
