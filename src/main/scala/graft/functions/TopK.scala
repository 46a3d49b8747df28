package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-heap top-k aggregation.
  *
  * Why a custom `Aggregator` instead of `row_number` over
  * `Window.partitionBy(query)`: the window plan shuffles EVERY scored
  * (query, candidate) pair into one partition per query — at 100 TB that is
  * the dominating exchange. An `Aggregator` participates in partial
  * aggregation (ObjectHashAggregate): each map task keeps at most ~4k
  * candidates per group and the shuffle carries k rows per group per map
  * task, independent of corpus size.
  *
  * Ordering is (sim DESC, neighborId ASC) — fully deterministic under any
  * partitioning, including ties.
  */
object TopK {

  case class Scored(sim: Double, neighborId: Long)
  case class TopKList(items: Seq[Scored])

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.sim, s.neighborId))

  class TopKAggregator(k: Int)
      extends Aggregator[Scored, Array[Scored], TopKList] {
    private def compact(buf: Array[Scored]): Array[Scored] =
      if (buf.length <= k) buf else buf.sorted(ord).take(k)

    def zero: Array[Scored] = Array.empty
    def reduce(buf: Array[Scored], a: Scored): Array[Scored] = {
      val appended = buf :+ a
      // Amortized: only re-sort once the buffer overshoots 4k.
      if (appended.length >= 4 * k) compact(appended) else appended
    }
    def merge(b1: Array[Scored], b2: Array[Scored]): Array[Scored] =
      compact(b1 ++ b2)
    def finish(buf: Array[Scored]): TopKList = TopKList(compact(buf).sorted(ord).toSeq)
    def bufferEncoder: Encoder[Array[Scored]] = Encoders.kryo[Array[Scored]]
    def outputEncoder: Encoder[TopKList] = Encoders.product[TopKList]
  }

  /** Column form: `topK(k)(sim, neighborId)` aggregates to
    * `array<struct<sim:double, neighborId:bigint>>` of the k best.
    */
  def topK(k: Int)(sim: Column, neighborId: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[Scored])(sim, neighborId)
      .getField("items")
}
