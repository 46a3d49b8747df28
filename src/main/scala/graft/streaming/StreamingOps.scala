package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's incremental
  * semantics (SURVEY §2.10): the monthly scrape job is a slow micro-batch
  * stream — pages arrive, rows are parsed, URLs are deduplicated against
  * state, output is appended exactly-once-per-key.
  *
  *  - T1 trigger: callers pick `Trigger.AvailableNow()` (batch-like) or
  *    processing-time; the transformations below are trigger-agnostic.
  *  - T2 offsets/resume: the streaming checkpoint does what
  *    storage/state.py:108-117 hand-rolls.
  *  - T3 exactly-once-per-key: [[dedupByKey]] = `dropDuplicates` with
  *    state — the streaming twin of the completed-set guard
  *    (state.py:133-140).
  *  - T6-adjacent: watermarked event-time windows ([[windowedCounts]])
  *    and a `mapGroupsWithState` session tracker ([[sessionProgress]]),
  *    the streaming analogs of SessionState bookkeeping (models.py:92-99).
  *
  * Scale notes: dedup state is keyed by the dedup column only (compact);
  * the watermark bounds both window and dedup state so state size is
  * O(keys in the watermark horizon), not O(stream history).
  */
object StreamingOps {

  /** T3: exactly-once-per-key streaming dedup, state bounded by the
    * watermark when an event-time column is provided.
    */
  def dedupByKey(stream: DataFrame, keyCol: String,
                 eventTimeCol: Option[String] = None,
                 watermark: String = "1 hour"): DataFrame =
    eventTimeCol match {
      case Some(ts) => stream.withWatermark(ts, watermark).dropDuplicates(keyCol, ts)
      case None => stream.dropDuplicates(keyCol)
    }

  /** Streaming ingest dedup by key ALONE with watermark-expired state
    * (`dropDuplicatesWithinWatermark`): a re-fetched document arriving
    * minutes later is dropped even though its event time differs —
    * the semantics a corpus-ingest dedup wants, where
    * `dropDuplicates(key, ts)` would pass the re-fetch through. State
    * is O(keys inside the watermark horizon): the 100 TB-stream shape,
    * since keys older than the watermark are evicted instead of
    * accumulating forever (plain `dropDuplicates(key)` state grows
    * unboundedly).
    */
  def dedupWithinWatermark(stream: DataFrame, keyCol: String,
                           eventTimeCol: String,
                           watermark: String = "1 hour"): DataFrame =
    stream.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Watermarked tumbling-window counts per group — the streaming form of
    * the A1 running counters.
    */
  def windowedCounts(stream: DataFrame, tsCol: String, groupCol: String,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(groupCol))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col(groupCol),
        col("n"), col("sum_value"))

  /** One page-progress event (the streaming analog of SessionState). */
  case class PageEvent(productType: String, page: Int, nProducts: Long)

  /** Accumulated per-type progress (models.py:92-99 shape). */
  case class SessionProgress(productType: String, lastCompletedPage: Int,
                             totalProducts: Long, batches: Long)

  /** T2-shaped custom state: `mapGroupsWithState` keeps the max completed
    * page and the running product count per product type across
    * micro-batches — resume data the reference rewrites to JSON per page.
    */
  def sessionProgress(events: Dataset[PageEvent]): Dataset[SessionProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.productType)
      .mapGroupsWithState[SessionProgress, SessionProgress](
        GroupStateTimeout.NoTimeout()) {
        case (pt, batch, state: GroupState[SessionProgress]) =>
          val prior = state.getOption.getOrElse(SessionProgress(pt, 0, 0L, 0L))
          val events = batch.toSeq
          val next = SessionProgress(
            pt,
            math.max(prior.lastCompletedPage, if (events.isEmpty) 0 else events.map(_.page).max),
            prior.totalProducts + events.map(_.nProducts).sum,
            prior.batches + 1)
          state.update(next)
          next
      }
  }

  /** One user interaction for gap-based streaming sessionization. */
  case class Interaction(userId: Long, ts: java.sql.Timestamp)

  /** A closed session emitted when its inactivity gap expires. */
  case class ClosedSession(userId: Long, sessionStart: java.sql.Timestamp,
                           sessionEnd: java.sql.Timestamp, nEvents: Long)

  /** In-flight session state (public: the state encoder's generated code
    * must construct it).
    */
  case class OpenSession(start: Long, end: Long, n: Long)

  /** All of a user's not-yet-final sessions (any session whose
    * `end + gap` the watermark has not passed may still grow).
    */
  case class OpenSessions(sessions: Seq[OpenSession])

  /** GAP-BASED STREAMING SESSIONIZATION — the streaming twin of the batch
    * sessionizer (SessionOps, q49): `flatMapGroupsWithState` with an
    * EVENT-TIME timeout. Per user, arriving interactions merge into the
    * user's not-yet-final sessions as intervals (sorted by start,
    * neighbors within `gap` coalesce); a session is emitted ONLY once
    * the watermark passes `gap` beyond its last event — so any
    * in-watermark late event, in this batch or a later one, can still
    * extend a session forward OR backward, or bridge two of them.
    * Event-time semantics match the batch sessionizer for all
    * in-watermark data; append-mode emissions are final exactly when
    * the batch sessionizer's output could no longer change.
    *
    * State is the user's sessions inside the `watermark + gap` horizon
    * — O(users x sessions-in-horizon), the bounded shape that survives
    * an unbounded stream. The naive single-open-session model either
    * merges arbitrarily-early events (a `t - end <= gap` guard is
    * vacuously true for any t <= end) or emits early sessions eagerly,
    * fragmenting ones a later in-watermark event would have merged.
    */
  def streamingSessions(events: Dataset[Interaction],
                        gapMinutes: Int = 30,
                        watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, batch, state: GroupState[OpenSessions]) =>
          def toClosed(s: OpenSession) = ClosedSession(uid,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)
          // merge prior sessions and new point-events as sorted intervals
          val intervals = (batch.map { i =>
            val t = i.ts.getTime; OpenSession(t, t, 1L)
          }.toSeq ++ state.getOption.map(_.sessions).getOrElse(Nil))
            .sortBy(s => (s.start, s.end))
          var merged = List.empty[OpenSession]
          intervals.foreach { iv =>
            merged = merged match {
              case h :: rest if iv.start - h.end <= gapMs =>
                OpenSession(h.start, math.max(h.end, iv.end), h.n + iv.n) :: rest
              case other => iv :: other
            }
          }
          // close exactly the sessions the watermark has finalized; keep
          // the rest (they may still grow from in-watermark late data)
          // <= is CORRECT at the boundary: Spark's late-row filter for
          // flatMapGroupsWithState drops input rows with ts <= watermark
          // (verified empirically on this engine — see StreamingOpsSpec
          // "watermark-boundary" tests), so no event that could merge
          // into a session with end + gap == wm can ever arrive.
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.reverse.partition(_.end + gapMs <= wm)
          if (open.nonEmpty) {
            state.update(OpenSessions(open))
            // next close point; must be strictly beyond the watermark
            state.setTimeoutTimestamp(
              math.max(wm + 1L, open.map(_.end).min + gapMs))
          } else state.remove()
          closed.iterator.map(toClosed)
      }
  }

  /** STREAMING DISTINCT-COUNT SKETCH: per-window HLL registers over an
    * unbounded stream — distinct users per hour WITHOUT storing ids.
    * bucket/rho are row-local projections of the portable hash
    * ([[graft.operators.SketchOps.hllBucketRho]] — the exact math the
    * batch/oracle chain uses), and register max is an algebraic
    * aggregate, so Spark keeps at most 2^p tiny registers per window as
    * state (vs. the unbounded id set an exact streaming distinct
    * needs). Registers from any two streams/windows/days merge by max
    * — the same roll-up algebra as the batch q115 windowed HLL — and
    * [[graft.operators.SketchOps.hllEstimateFromRegisters]] turns any
    * collected register set into the estimate.
    */
  def streamingDistinct(stream: DataFrame, tsCol: String, keyCol: String,
                        windowDur: String = "1 hour",
                        watermark: String = "1 hour"): DataFrame = {
    val (bucket, rho) = graft.operators.SketchOps.hllBucketRho(col(keyCol))
    stream.withWatermark(tsCol, watermark)
      .select(window(col(tsCol), windowDur).as("win"),
        bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("win"), col("bucket")).agg(max("rho").as("r"))
  }

  case class EwmaEvent(key: Long, ts: java.sql.Timestamp, seq: Long, value: Long)
  case class EwmaFlag(key: Long, seq: Long, value: Long, ewmaPrev: Long,
                      ewma: Long, spike: Boolean)
  /** Per-key EWMA state: the running value plus the not-yet-final
    * events inside the watermark horizon (public for the state
    * encoder's generated code).
    */
  case class EwmaPending(ts: Long, seq: Long, value: Long)
  case class EwmaState(hasEwma: Boolean, ewma: Long, pending: Seq[EwmaPending])

  /** STREAMING EWMA ANOMALY FLAGS — the streaming twin of the batch
    * [[graft.operators.TimeSeriesOps.ewmaSpikes]] kernel, BATCH-
    * EQUIVALENT for all in-watermark data: because every flag depends
    * on the key's full event PREFIX, an event is scored only once the
    * watermark guarantees nothing earlier can still arrive. Arriving
    * events buffer in state; each trigger finalizes the prefix with
    * event time <= watermark in (ts, seq) order through the same
    * integer recurrence s_t = (s_{t-1}(den-1) + x) div den, emits its
    * flags (append-mode final), and carries the EWMA forward. An
    * event-time timeout drains a key's buffer even if the key never
    * receives another event.
    *
    * State is O(events inside the watermark horizon) per key plus one
    * long of EWMA forever — the bounded shape that survives an
    * unbounded stream. Same-millisecond ties order by `seq`, so feed
    * the batch twin millisecond timestamps when comparing.
    */
  def streamingEwma(events: Dataset[EwmaEvent], den: Long = 8L,
                    threshold: Long = 30000L,
                    watermark: String = "1 hour"): Dataset[EwmaFlag] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaFlag](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, batch, state: GroupState[EwmaState]) =>
          val prev = state.getOption.getOrElse(EwmaState(false, 0L, Nil))
          val pending = prev.pending ++
            batch.map(e => EwmaPending(e.ts.getTime, e.seq, e.value))
          // <= is CORRECT at the boundary: Spark's late-row filter drops
          // input rows with ts <= watermark (verified empirically — see
          // StreamingOpsSpec "watermark-boundary" tests), so nothing with
          // ts <= wm can still arrive and the prefix up to wm is final.
          val wm = state.getCurrentWatermarkMs()
          val (ready, hold) = pending.partition(_.ts <= wm)
          var has = prev.hasEwma
          var s = prev.ewma
          val out = ready.sortBy(p => (p.ts, p.seq)).map { p =>
            val pv = if (has) s else p.value
            s = (pv * (den - 1) + p.value) / den
            has = true
            EwmaFlag(key, p.seq, p.value, pv, s,
              math.abs(p.value - pv) > threshold)
          }
          state.update(EwmaState(has, s, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(wm + 1L, hold.map(_.ts).min))
          out.iterator
      }
  }

  /** STREAM-STREAM event-time interval join — the streaming twin of the
    * q98 batch funnel: left events (e.g. signups) joined to right events
    * (e.g. purchases) with the same key arriving within `within` AFTER
    * the left event. Both sides are watermarked and the join condition
    * bounds the right timestamp on BOTH ends, so Spark derives a state
    * eviction horizon for each side — join state is O(events in the
    * watermark+interval window), not O(stream history): the shape that
    * survives an unbounded 100 TB stream. Append-mode safe (matches are
    * final once the watermark passes the interval).
    *
    * Key/timestamp column names must differ between the two sides (the
    * caller renames; keeps the condition unambiguous without aliases).
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTs: String, rightTs: String,
                         within: String = "24 hours",
                         watermark: String = "1 hour"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) > col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))

  /** K1 streaming: append each micro-batch to the single-file CSV sink via
    * foreachBatch — exactly the reference's per-page append loop
    * (cli.py:223), driven by the streaming engine — made REPLAY-
    * IDEMPOTENT through [[idempotentCsvAppend]]: a crash between the CSV
    * append and the checkpoint commit replays the batch on restart
    * (foreachBatch is at-least-once), and without the batchId guard the
    * replay double-appends its rows. The reference has the same window
    * (SURVEY §7.4); this closes it.
    */
  def csvAppendSink(stream: DataFrame, productType: String, csvPath: String,
                    checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        idempotentCsvAppend(batch.toDF(), productType, csvPath, batchId)
      }

  /** Exactly-once delivery for the single-file CSV sink under
    * foreachBatch's at-least-once replay: the last DELIVERED batchId is
    * persisted next to the sink (`<csv>.delivered`, the StateStore
    * atomic-commit pattern) and a replayed batch is skipped.
    *
    * The marker trails the data write, so there is one ambiguous window
    * — crash after the data committed but before the marker moved. The
    * marker therefore records `(batchId, resulting file length)` and the
    * data write goes through CsvMeta's ATOMIC replace (rename, never
    * `fs.append` — a torn in-place append would leave the target at a
    * length belonging to neither state). Single-writer protocol on
    * replay of batch N against marker (M, L):
    *
    *  - N <= M: delivered in a prior incarnation — skip.
    *  - N == M+1 and target length == L: the crash (if any) happened
    *    BEFORE the data rename — append, then move the marker.
    *  - N == M+1 and target length != L: the data rename committed but
    *    the marker move didn't — the target already carries batch N, so
    *    move the marker and skip the rows.
    *
    * First contact writes a baseline marker `(-1, current length)`
    * BEFORE any append, so even a crash inside batch 0 lands in one of
    * the three cases above. The empty-batch corner (length unchanged by
    * design) resolves to a harmless no-op re-append. Assumes this sink
    * is the file's only writer — same contract as the reference's
    * exclusive csv_writer.
    *
    * The marker also records the STREAMING QUERY ID (the checkpoint-
    * stable UUID Spark publishes to the stream-execution thread as the
    * `sql.streaming.queryId` local property): batchIds are only
    * monotonic WITHIN one checkpoint lineage, so a query restarted
    * against a FRESH checkpoint restarts them at 0 — compared against
    * a stale high-water mark, every early batch would be "already
    * delivered" and silently dropped (data LOSS, strictly worse than
    * the duplicate the guard exists to stop). A query-id change
    * therefore RE-BASELINES the marker at the current file length and
    * delivers from batch 0. Discarding a checkpoint also discards
    * source offsets, so the new incarnation may re-deliver data the old
    * one already appended — at-least-once is the correct (and only
    * achievable) semantics once the batchId lineage is lost; markers
    * from pre-query-id versions carry no id and are adopted into the
    * current lineage unchanged.
    */
  private[graft] def idempotentCsvAppend(df: DataFrame, productType: String,
                                         csvPath: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val queryId = Option(spark.sparkContext.getLocalProperty(
      org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY))
      .getOrElse("")
    val target = new org.apache.hadoop.fs.Path(csvPath)
    val marker = new org.apache.hadoop.fs.Path(csvPath + ".delivered")
    val fs = target.getFileSystem(conf)
    def targetLen: Long =
      if (fs.exists(target)) fs.getFileStatus(target).getLen else -1L
    def writeMarker(id: Long, len: Long): Unit = {
      val tmp = new org.apache.hadoop.fs.Path(csvPath + ".delivered.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"$id,$len,$queryId".getBytes("UTF-8")) finally out.close()
      graft.sources.CsvMeta.renameOver(conf, fs, tmp, marker)
    }
    def baseline(): (Long, Long) = {
      val b = (-1L, targetLen)
      writeMarker(b._1, b._2) // pin BEFORE the first append
      b
    }
    val (lastId, lastLen) =
      if (!fs.exists(marker)) baseline()
      else {
        val in = fs.open(marker)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        // v1 markers: "id,len"; v2: "id,len,queryId" (queryId may be
        // empty outside a streaming thread)
        val parts = txt.trim.split(",", 3)
        val markerQueryId = if (parts.length >= 3) parts(2) else queryId
        if (markerQueryId != queryId) baseline() // new checkpoint lineage
        else (parts(0).toLong, parts(1).toLong)
      }
    if (batchId <= lastId) return // replayed: already delivered
    if (batchId == lastId + 1 && targetLen != lastLen) {
      writeMarker(batchId, targetLen) // data committed; finish bookkeeping
      return
    }
    graft.sources.CsvMeta.append(df, productType, csvPath, atomicReplace = true)
    writeMarker(batchId, targetLen)
  }

  /** §3.2 END-TO-END streaming delta pipeline: watch `pagesDir` for page
    * HTML files, parse them to typed product rows (G1-G4/P*), drop
    * document URLs already emitted in ANY prior micro-batch or run
    * (stateful streaming dedup), and append each micro-batch through the
    * K1 single-file CSV sink.
    *
    * Restartability (T2/T3, the reference's storage/state.py:108-140
    * semantics): file-source offsets AND the dedup key state both live in
    * `checkpointDir`, so a killed query restarted with the same
    * checkpoint resumes where it stopped and never re-appends a URL it
    * already delivered — proven by the kill-and-resume test in
    * StreamingOpsSpec. Dedup state is keyed by URL only (compact); pass
    * an event-time column via [[dedupByKey]] directly if the key horizon
    * must be bounded at very long stream lifetimes.
    */
  def deltaPipeline(spark: org.apache.spark.sql.SparkSession, pagesDir: String,
                    productType: String, csvPath: String,
                    checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", "16")
      .text(pagesDir)
      .select(lit(productType).as("productType"), lit(1).as("page"),
        col("value").as("html"))
      .as[graft.operators.ParsePipeline.PageHtml]
    val parsed = graft.operators.ParsePipeline.withScrapedAt(
      graft.operators.ParsePipeline.parse(spark, pages, productType))
    val fresh = dedupByKey(parsed.where(col("document_url").isNotNull), "document_url")
    csvAppendSink(fresh, productType, csvPath, checkpointDir).start()
  }
}
