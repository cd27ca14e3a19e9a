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
    e.injectFunction(GraftExtensions.bloomContainDescriptor)
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

  /** `graft_might_contain(fp, 'handle')` — the seen-fingerprint bloom
    * probe as a SQL function: the handle (a string literal) resolves
    * against [[graft.operators.BloomRegistry]] at ANALYSIS time on the
    * driver, so the built expression carries the broadcast handle and
    * executors fetch the artifact via the block manager — never a
    * plan-embedded artifact literal (the reason Spark's own
    * `might_contain` doesn't fit; see BloomMightContain's scaladoc). */
  private def buildBloomContain(
      children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "graft_might_contain(fp, 'handle') takes 2 arguments")
    val key = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
          s: org.apache.spark.unsafe.types.UTF8String, _: org.apache.spark.sql.types.StringType) =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"graft_might_contain's handle must be a string literal naming a registered bloom, got $other")
    }
    graft.expressions.BloomMightContain(
      children.head, graft.operators.BloomRegistry.resolve(key), key)
  }

  val bloomContainDescriptor: FunctionDescription = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(classOf[graft.expressions.BloomMightContain].getName,
      "graft_might_contain"),
    (children: Seq[Expression]) => buildBloomContain(children))

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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      (children: Seq[Expression]) => buildBloomContain(children),
      "built-in")
  }
}
