package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct character-n-gram shingle generator.
  *
  * Replaces `array_distinct(transform(sequence(...), i ->
  * substring(text, i, n)))`, whose lambda is dispatched interpreted per
  * element (~|text| calls per row) — the dominant cost of the text
  * near-dup queries. One eval here runs a tight loop with a hash set:
  * same output (UTF8String.substringSQL = the Substring expression's
  * own kernel, so byte-for-byte identical shingles), ~linear time, one
  * call per row. CodegenFallback: a single non-splittable call per row
  * costs little; the win is removing per-element lambda dispatch.
  */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val len = text.numChars()
    // mirrors the composed form: sequence(1, greatest(len - (n-1), 1))
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(count * 2, 8))
    var i = 1
    while (i <= count) {
      seen.add(text.substringSQL(i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
