package graft

import graft.expressions.LongDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension point: registers graft's native expressions as SQL
  * functions. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * Surface: native-expression SQL functions plus one optimizer rule —
  * [[graft.plans.BandJoinBinning]], which rewrites pure band (range-
  * only) joins from nested-loop to binned equi-joins. Everything else
  * the engine needs is expressible with built-in operators (SURVEY.md
  * §4 conclusion).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.qdotNativeDescriptor)
    e.injectFunction(GraftExtensions.deflatedLenDescriptor)
    e.injectOptimizerRule(_ => graft.plans.BandJoinBinning)
  }
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val qdotNativeDescriptor: FunctionDescription = (
    FunctionIdentifier("qdot_native"),
    new ExpressionInfo(classOf[LongDotProduct].getName, "qdot_native"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "qdot_native(arrayA, arrayB) takes 2 arguments")
      LongDotProduct(children.head, children(1))
    })

  val deflatedLenDescriptor: FunctionDescription = (
    FunctionIdentifier("deflated_len"),
    new ExpressionInfo(classOf[graft.expressions.DeflatedLength].getName, "deflated_len"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "deflated_len(text) takes 1 argument")
      graft.expressions.DeflatedLength(children.head)
    })

  /** Imperative registration for sessions built without extensions
    * (e.g., the driver-owned Verify/Bench sessions). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qdot_native",
      (children: Seq[Expression]) => {
        require(children.length == 2, "qdot_native(arrayA, arrayB) takes 2 arguments")
        LongDotProduct(children.head, children(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflated_len",
      (children: Seq[Expression]) => {
        require(children.length == 1, "deflated_len(text) takes 1 argument")
        graft.expressions.DeflatedLength(children.head)
      },
      "built-in")
  }
}
