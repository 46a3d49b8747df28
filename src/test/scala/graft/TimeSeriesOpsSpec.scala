package graft

import graft.operators.TimeSeriesOps

/** Integer EWMA anomaly kernel (q124): hand-computed recurrence,
  * ordering, and per-key independence.
  */
class TimeSeriesOpsSpec extends SparkSpec {

  import spark.implicits._

  test("ewmaSpikes matches the hand-computed integer recurrence") {
    // key 1, in (ts, seq) order: 0, 80, 80, 800
    val ev = Seq(
      (1L, 10L, 1L, 0L), (1L, 20L, 2L, 80L),
      (1L, 30L, 3L, 80L), (1L, 40L, 4L, 800L))
      .toDF("k", "ts", "seq", "v")
    val out = TimeSeriesOps.ewmaSpikes(ev, "k", "ts", "seq", "v",
        den = 8L, threshold = 100L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) == ((0L, 0L, false)))     // seed: prev = v, no spike
    assert(out(2L) == ((0L, 10L, false)))    // (0*7+80)/8 = 10, |80-0| <= 100
    assert(out(3L) == ((10L, 18L, false)))   // (70+80)/8 = 18
    assert(out(4L) == ((18L, 115L, true)))   // |800-18| > 100
  }

  test("ewmaSpikes orders by (ts, seq) and keeps keys independent") {
    // key 2's rows arrive shuffled; same-ts tie broken by seq
    val ev = Seq(
      (2L, 20L, 9L, 100L), (2L, 10L, 2L, 0L), (2L, 10L, 1L, 800L),
      (3L, 5L, 1L, 50L))
      .toDF("k", "ts", "seq", "v")
    val out = TimeSeriesOps.ewmaSpikes(ev, "k", "ts", "seq", "v",
        den = 8L, threshold = 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getLong(3)).toMap
    // key 2 order: seq 1 (seed 800) -> seq 2 (prev 800) -> seq 9
    assert(out((2L, 1L)) == 800L)
    assert(out((2L, 2L)) == 800L)
    // state after seq 2: (800*7 + 0)/8 = 700
    assert(out((2L, 9L)) == 700L)
    // key 3 unaffected by key 2's history
    assert(out((3L, 1L)) == 50L)
  }

  test("integerTrend: exact rational slope, falling series, degenerate x") {
    val pts =
      (0 to 9).map(x => ("up", x.toLong, 2L * x + 5)) ++     // slope exactly 2
      (0 to 9).map(x => ("down", x.toLong, 100L - 3 * x)) ++ // slope exactly -3
      Seq(("flat_x", 4L, 1L), ("flat_x", 4L, 9L))            // all x equal
    val out = TimeSeriesOps.integerTrend(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val (nU, numU, denU, risingU) = out("up")
    assert(nU == 10L && numU == 2L * denU && denU > 0L && risingU)
    val (_, numD, denD, risingD) = out("down")
    assert(numD == -3L * denD && !risingD)
    val (_, numF, denF, risingF) = out("flat_x")
    assert(numF == 0L && denF == 0L && !risingF)
  }
}
