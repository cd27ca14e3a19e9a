package graft.expressions

import graft.operators.BloomProbe
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native probe expression of the seen-fingerprint bloom family: does
  * the broadcast [[BloomProbe]] (bit or counting bloom) possibly
  * contain the fingerprint? Replaces the three per-QueryDef closure
  * `udf(...)`s with ONE registered definition (round-16 verdict
  * task 6) — and upgrades the probe from a Scala UDF to a codegen'd
  * expression, so the prefilter stays inside whole-stage codegen.
  *
  * Why Spark's own `might_contain` doesn't fit: it only accepts
  * Spark's `BloomFilter` binary as a plan-embedded literal — no
  * counting-bloom support, and an artifact-sized literal rides every
  * task binary. Here the expression carries only the BROADCAST HANDLE
  * (executors fetch the artifact once via the block manager), the
  * explicit-broadcast discipline the family's scaladocs mandate.
  *
  * Null semantics (the UDFs' contract, preserved exactly): a null
  * fingerprint is definably UNSEEN — false, never null — so the
  * expression is non-nullable and filters drop null-fp rows the same
  * way both the udf-based plans and the exact-join oracle do.
  *
  * SQL surface: `graft_might_contain(fp, 'handle')` via
  * [[graft.GraftExtensions]]; the handle resolves against
  * [[graft.operators.BloomRegistry]] at analysis time on the driver.
  */
case class BloomMightContain(child: Expression,
    bc: Broadcast[BloomProbe], tag: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string fingerprint, got ${dt.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_might_contain"
  override def toString: String = s"$prettyName($child, '$tag')"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bc.value.contains(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bc, classOf[Broadcast[BloomProbe]].getName)
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = false;
      if (!${c.isNull}) {
        ${ev.value} = ((graft.operators.BloomProbe) $ref.value())
          .contains(${c.value}.toString());
      }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
