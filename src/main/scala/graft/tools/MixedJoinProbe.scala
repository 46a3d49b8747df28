package graft.tools

import graft.Tables
import graft.sources.BucketedLayout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALING.md probe for the MIXED bucketed⋈unbucketed join (the q255
  * shape — bucketed fact joined to a fresh unbucketed delta batch):
  * measures the BucketedLayout decision rule's two arms at a corpus
  * size where they diverge. Four join shapes over the same corpus,
  * each merge-hinted SMJ → groupBy(o_orderpriority), delta = the 10%
  * orderkey slice:
  *
  *  - `plain`:    unbucketed lineitem ⋈ delta (both sides shuffle —
  *                the no-layout baseline every run pays)
  *  - `mixed8`:   8-bucket lineitem ⋈ delta (delta shuffles onto 8
  *                partitions; the join runs 8-task-parallel — the
  *                collapse arm)
  *  - `escape8`:  same tables, `spark.sql.sources.bucketing.enabled=
  *                false` (the decision rule's escape hatch: read the
  *                bucketed files as plain parquet, shuffle both sides
  *                at conf width)
  *  - `mixed64`:  64-bucket lineitem ⋈ delta (bucket count ≥ 2× cores:
  *                the half-shuffle win arm)
  *
  * Usage: runMain graft.tools.MixedJoinProbe <sfDir> [reps]
  * Prints one JSON line (medians of `reps` steady-state reps each,
  * plus the two one-time layout build times).
  */
object MixedJoinProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MixedJoinProbe <sfDir> [reps]")
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.sql.warehouse.dir",
        graft.queries.Fixtures.scratchIndexDir("graft-probe-warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scratch = graft.queries.Fixtures.scratchIndexDir("graft-mixed-probe")
    def delta: DataFrame = Tables.orders(spark, sfDir)
      .where(pmod(col("o_orderkey"), lit(10)) === 0)
      .select("o_orderkey", "o_orderpriority")
    def joinShape(li: DataFrame): DataFrame =
      li.hint("merge").join(delta.hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))

    def buildBucketed(n: Int): (String, Double) = {
      val table = s"probe_li_b$n"
      val t0 = System.nanoTime()
      BucketedLayout.writeBucketed(
        Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
        table, s"$scratch/$table", n, "l_orderkey", "l_orderkey")
      (table, (System.nanoTime() - t0) / 1e9)
    }

    def medianOf(mk: () => DataFrame): Double = {
      mk().write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts((ts.size - 1) / 2)
    }

    val plainSec = medianOf(() => joinShape(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")))
    val (t8, build8) = buildBucketed(8)
    val mixed8 = medianOf(() => joinShape(spark.table(t8)))
    // escape hatch: bucketed FILES read as plain parquet, both sides
    // shuffle at conf width — what the decision rule prescribes when
    // numBuckets < the join's target parallelism
    spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
    val escape8 = medianOf(() => joinShape(spark.table(t8)))
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val (t64, build64) = buildBucketed(64)
    val mixed64 = medianOf(() => joinShape(spark.table(t64)))

    println(f"""{"sf":"$sfDir","reps":$reps,"plain_sec":$plainSec%.3f,"build8_sec":$build8%.3f,"mixed8_sec":$mixed8%.3f,"escape8_sec":$escape8%.3f,"build64_sec":$build64%.3f,"mixed64_sec":$mixed64%.3f}""")
    spark.stop()
  }
}
