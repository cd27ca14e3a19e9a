package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exception-free error-tolerant casts.
  *
  * Spark's TRY-mode cast ("try_cast") reaches its NULL-on-malformed
  * answer by THROWING and catching a SparkNumberFormatException per bad
  * value. On columns dominated by non-numeric data that is one JVM
  * exception per row — measured 1.3 s over 150k single-letter strings
  * at local[32], i.e. CPU-hours at 100 TB corpus scale. These helpers
  * keep try_cast's exact semantics while keeping the exception
  * machinery off the hot path.
  */
object SafeCast {

  /** ANSI string→BIGINT trims whitespace AND ISO control bytes before
    * parsing (UTF8String.trimAll strips every ASCII char ≤ 0x20 plus
    * DEL — Character.isWhitespace ∪ isISOControl at the byte level),
    * so the padding class here is `[\x00-\x20\x7f]`, NOT Java-regex
    * `\s` (which would misroute e.g. "1" — control-padded
    * numerics that try_cast parses — to the NULL tier; SafeCastSpec
    * covers the control-byte cases). */
  private val Pad = "[\\x00-\\x20\\x7f]"
  private val SmallNum = s"^$Pad*[+-]?[0-9]{1,18}$Pad*$$" // ≤18 digits: can't overflow BIGINT
  private val AnyNum = s"^$Pad*[+-]?[0-9]+$Pad*$$"

  /** `try_cast(c AS BIGINT)`, bit-identical but exception-free on the
    * common tiers: short numerics take the plain ANSI cast (a guarded
    * ≤18-digit value cannot overflow, so the cast cannot throw),
    * non-numerics go straight to NULL, and only ≥19-digit strings —
    * where overflow really is data-dependent — fall through to
    * try_cast, the one band where its catch-to-NULL is load-bearing.
    * The three tiers partition try_cast's input domain, so the result
    * is equal for every input (SafeCastSpec proves it differentially
    * over the edge cases). */
  def tryLong(c: Column): Column =
    when(c.rlike(SmallNum), c.cast("long"))
      .when(!c.rlike(AnyNum), lit(null).cast("long"))
      .otherwise(c.try_cast("long"))
}
