package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Size-capped id-list aggregation: collect a group's Long members with
  * aggregation state HARD-bounded at cap+1 members (cap+2 buffer
  * slots) — one member past the cap is enough to DETECT overflow
  * (`size > cap`) without ever holding the overflowing group.
  *
  * This is the scale-safe form of the LSH degenerate-bucket guard. The
  * previous shape computed the oversized-key set with a groupBy and
  * BROADCAST-anti-joined it back — but that set's size is
  * DATA-dependent, and the 100× scale probe (where ScaleGen's 3-cycle
  * token drop makes copies three apart textually identical, so every
  * bucket blows past the cap) drove the broadcast collect over
  * `spark.driver.maxResultSize` and aborted the job. A capped
  * aggregation never involves the driver, shuffles the keyed rows ONCE
  * (with map-side partial aggregation — partials also cap at cap+1)
  * instead of twice for the old anti-join + self-join, and degrades on
  * adversarial data by dropping exactly the buckets the guard always
  * dropped.
  *
  * Determinism: a surviving group (≤ cap members) retains ALL members
  * under any merge order; an overflowing group's retained sample is
  * order-dependent but only its SIZE (cap+1 = dropped) is ever
  * consumed. Like [[TopK]], participates in partial aggregation
  * (ObjectHashAggregate).
  */
object CappedList {

  /** Buffer layout: slot 0 = member count n, slots 1..n = members;
    * allocation grows geometrically (capped at cap+2 slots), so reduce
    * is amortized O(1) — a naive immutable `buf :+ a` copies the whole
    * array per input row, ~cap²/2 element copies per overflowing bucket
    * (at cap 1000 that is ~500k Long copies per bucket per partition on
    * exactly the adversarial data this aggregator exists for). Unused
    * tail slots ride partial serialization as garbage (≤ 2× exact size);
    * merge re-packs to exact.
    */
  class CappedListAggregator(cap: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array(0L)
    def reduce(buf: Array[Long], a: Long): Array[Long] = {
      val n = buf(0).toInt
      if (n > cap) buf // sentinel reached: appends are no-ops
      else {
        val need = n + 2 // count slot + the n existing + the new member
        val out =
          if (buf.length >= need) buf
          else java.util.Arrays.copyOf(buf,
            math.min(math.max(buf.length * 2, need), cap + 2))
        out(n + 1) = a
        out(0) = n + 1
        out
      }
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      val n1 = b1(0).toInt
      val n2 = b2(0).toInt
      val n = math.min(n1 + n2, cap + 1)
      val out = new Array[Long](n + 1)
      out(0) = n
      val take1 = math.min(n1, n)
      System.arraycopy(b1, 1, out, 1, take1)
      if (take1 < n) System.arraycopy(b2, 1, out, 1 + take1, n - take1)
      out
    }
    def finish(buf: Array[Long]): Seq[Long] =
      buf.iterator.slice(1, buf(0).toInt + 1).toSeq
    // native array<bigint> buffer encoding (~8 B/element): the Kryo
    // encoder measured ~1.4 KB per partial row on the same data
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `cappedIds(cap)(id)` aggregates to `array<bigint>` of
    * at most cap+1 members (size cap+1 ⇔ the true group exceeds cap).
    */
  def cappedIds(cap: Int)(id: Column): Column =
    udaf(new CappedListAggregator(cap), Encoders.scalaLong)(id)
}
