package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built on
  * Catalyst higher-order functions (`zip_with`/`aggregate`) so the hot
  * path stays codegen'd — no UDF boxing per element.
  *
  * All accumulation is in double precision (floats are widened before the
  * first multiply) and strictly left-to-right, which makes results
  * deterministic and reproducible across partitionings.
  */
object VectorFunctions {

  /** Dot product of two numeric arrays, accumulated as double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns 0.0). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Squared Euclidean distance (cheaper than sqrt for nearest-neighbor
    * argmin comparisons — monotone in the true distance).
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Sign-bit key for random-hyperplane LSH: one bit per plane, packed into
    * a long. `planes` must be a literal `array<array<double>>` broadcast as
    * part of the plan (small: nbits × dim doubles).
    */
  def hyperplaneKey(vec: Column, planes: Column): Column =
    aggregate(
      zip_with(planes, sequence(lit(0), size(planes) - 1), (p, i) =>
        when(dot(vec, p) >= 0.0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc.bitwiseOR(v))
}
