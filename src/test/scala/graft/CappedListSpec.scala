package graft

import graft.functions.CappedList
import org.apache.spark.sql.functions._

/** The capped-list aggregation's contract, independent of its LSH
  * call sites: groups at or under the cap keep EVERY member under any
  * partitioning; groups past the cap are detectable by size (cap+1)
  * and never hold more than cap+1 elements.
  */
class CappedListSpec extends SparkSpec {
  import spark.implicits._

  test("≤cap groups keep all members; >cap groups surface as size cap+1") {
    // group g has g members (1..12), cap 5 → groups 1..5 exact, 6..12 flagged
    val rows = (1 to 12).flatMap(g => (1 to g).map(i => (g, (g * 100 + i).toLong)))
    val got = rows.toDF("g", "id")
      .repartition(7)          // force multi-partition partial merges
      .groupBy("g").agg(CappedList.cappedIds(5)(col("id")).as("ids"))
      .select(col("g"), col("ids"))
      .as[(Int, Seq[Long])].collect().toMap
    (1 to 5).foreach { g =>
      assert(got(g).sorted == (1 to g).map(i => (g * 100 + i).toLong),
        s"group $g must keep every member: ${got(g)}")
    }
    (6 to 12).foreach { g =>
      assert(got(g).size == 6, s"group $g must cap at cap+1=6: ${got(g).size}")
      assert(got(g).toSet.subsetOf((1 to g).map(i => (g * 100 + i).toLong).toSet),
        s"retained sample must come from the group: ${got(g)}")
    }
  }

  test("overflow detection is partitioning-invariant (boundary cap and cap+1)") {
    // exactly-cap and exactly-cap+1 groups under several partitionings
    val rows = (1L to 5L).map(i => (0, i)) ++ (1L to 6L).map(i => (1, i))
    Seq(1, 3, 8).foreach { parts =>
      val sizes = rows.toDF("g", "id").repartition(parts)
        .groupBy("g").agg(size(CappedList.cappedIds(5)(col("id"))).as("n"))
        .as[(Int, Int)].collect().toMap
      assert(sizes(0) == 5 && sizes(1) == 6,
        s"parts=$parts: boundary groups must read (5, 6), got $sizes")
    }
  }
}
