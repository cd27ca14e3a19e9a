package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared DEFLATE kernel for [[DeflatedLength]]. Kept as a static-ish
  * object method so generated code can call it directly
  * (`graft.expressions.CompressionKit.deflatedLen(...)`) — the loop
  * itself lives in library code (java.util.zip), so inlining the body
  * into codegen would buy nothing; what matters is staying INSIDE
  * whole-stage codegen (no UDF/serialization boundary around each row).
  */
object CompressionKit {

  /** Round-11 oracle design note: `doc_compression_ratio` IS now
    * oracle-hashed — its DuckDB oracle joins a committed fixture built
    * with CPython's zlib at the same parameters (raw deflate, level 6),
    * so the gate assumes the JVM's Deflater and CPython's zlib emit
    * byte-identical output lengths. That holds when both link classic
    * zlib (every environment this engine has run in) but is NOT a spec
    * guarantee — a JVM or distro built against zlib-ng / Chromium zlib
    * can emit different lengths at the same level. [[assertZlibParity]]
    * fails fast with a clear message in that environment instead of
    * surfacing as an opaque oracle hash diff; the judged query forces
    * it before returning its plan. */
  private lazy val zlibParity: Unit = {
    // probe pair computed ONCE with CPython zlib.compressobj(6,
    // DEFLATED, -15): 104 UTF-8 bytes -> 78 raw-deflate bytes. Any
    // classic-zlib level-6 encoder reproduces this; zlib-ng does not.
    val probe = "graft deflate parity probe: 0123456789 0123456789 " +
      "0123456789 the quick brown fox jumps over the lazy dog"
    val got = deflatedLen(UTF8String.fromString(probe))
    require(got == 78L,
      s"this JVM's java.util.zip.Deflater(6, nowrap) emitted $got bytes for the " +
        "parity probe (expected 78, the CPython-zlib value the committed " +
        "fixtures/deflate_expected.parquet was built with). The JVM is likely " +
        "linked against zlib-ng or Chromium zlib; doc_compression_ratio's " +
        "hash gate requires classic-zlib parity. Regenerate the fixture with " +
        "tools/gen_deflate_fixture.py against a matching zlib, or skip the query.")
  }

  /** Fail fast (once per JVM) if this JVM's Deflater disagrees with the
    * CPython zlib that built the committed deflate fixture. */
  def assertZlibParity(): Unit = zlibParity

  /** Raw-DEFLATE (nowrap, level 6) output length of the UTF-8 bytes.
    * Deterministic for a given zlib build; since round 11 the judged
    * query compares these lengths against a CPython-zlib fixture (see
    * [[assertZlibParity]] for the cross-implementation assumption). */
  def deflatedLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Native Catalyst expression: DEFLATE-compressed length of a string.
  *
  * Compression ratio (`deflated_len / n_bytes`) is a standard
  * information-density quality signal for LLM corpus curation:
  * boilerplate / template / repeated-span documents compress far
  * below natural prose, and the signal needs no language model or
  * vocabulary. Exposed as an expression (not a UDF, not
  * mapPartitions) so the scan → filter pipeline stays one
  * whole-stage-codegen span: per row it is a single static call on
  * the already-decoded UTF8String.
  *
  * Null → null (standard unary semantics).
  */
case class DeflatedLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "deflated_len"

  override protected def nullSafeEval(v: Any): Any =
    CompressionKit.deflatedLen(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CompressionKit.deflatedLen($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
