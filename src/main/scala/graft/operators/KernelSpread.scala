package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Scan-parallelism guard for expensive row kernels (optimization guide
  * §2.5 "input skew — one huge unsplittable file").
  *
  * A single-file, single-row-group parquet scan plans as ONE task no
  * matter how many cores the session has: parquet byte-range splits
  * cannot cut inside a row group, so `maxPartitionBytes` /
  * `minPartitionNum` produce extra EMPTY tasks, never extra
  * parallelism — only an explicit exchange can spread the rows
  * (measured round 17: every sf* input ships as one row group, so every
  * scan-side kernel — ImageIO PNG encode/decode, MD5 shingling, minhash
  * signatures — ran on 1 of 32 cores).
  *
  * [[spread]] round-robin-repartitions a kernel's INPUT up to the
  * session's default parallelism, but ONLY when the upstream plan
  * provides fewer partitions. On production tables with many
  * files/row groups the scan already yields >= cores partitions and
  * this is a NO-OP — nothing here is tuned to local mode. The exchange
  * it may insert carries the kernel's narrow input projection (ids, or
  * (id, text) pairs), never kernel OUTPUT (blobs, signature arrays):
  * the blobs-never-shuffle rule is untouched, because the spread sits
  * BELOW the generator/decoder in every call site.
  */
object KernelSpread {
  /** Typed variant (generator inputs: `Dataset[Long]` ids). */
  def spread[T](ds: Dataset[T]): Dataset[T] = {
    val want = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions >= want) ds else ds.repartition(want)
  }

  /** Untyped variant (kernel input projections like (id, text)). */
  def spreadDf(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }
}
