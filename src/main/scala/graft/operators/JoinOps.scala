package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities.
  *
  * AQE's skew-join split handles most runtime skew automatically; explicit
  * salting is for the pathological case it can't fix — a HOT KEY on the
  * build side of a shuffled hash/sort-merge join whose single partition
  * exceeds executor memory. Salting fans each big-side row of a key out to
  * `saltFactor` sub-keys and replicates the matching small-side rows, so
  * the hot key's work spreads over `saltFactor` tasks.
  */
object JoinOps {

  /** Equi-join `big ⋈ small` on `key`, salted `saltFactor` ways.
    *
    * The big side's salt is derived from a hash of the whole row (not
    * `rand()`), so the plan stays deterministic and re-executable — a task
    * retry lands every row in the same salt bucket. The small side is
    * replicated `saltFactor`× via explode (small by definition, so the
    * replication is bounded).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val bigCols = big.columns.toSeq
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(bigCols.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
