package graft

import graft.functions.expressions.CosineSimilarity
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Session extensions registering graft's native expressions for SQL use:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * [[GraftFunctions.cosine]] is the Column-API route and self-registers on
  * first use in a session, so library callers need no configuration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.cosineDescriptor)
}

object GraftFunctions {
  val CosineName = "graft_cosine"

  private[graft] val cosineDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(CosineName),
    new ExpressionInfo(classOf[CosineSimilarity].getName, CosineName),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(CosineName))) {
      val (id, info, builder) = cosineDescriptor
      registry.registerFunction(id, info, builder)
    }
  }

  /** Codegen'd cosine similarity column (value-identical to
    * [[graft.functions.VectorFunctions.cosine]]).
    */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(CosineName, a, b)
  }
}
