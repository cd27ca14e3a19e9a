package graft

import graft.functions.SafeCast
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for SafeCast.tryLong: for every input class —
  * plain digits, signed, whitespace-padded, non-numeric, decimal
  * strings, empty/blank, Long.MaxValue boundary, 19-digit in-range,
  * 19/20-digit overflow — the exception-free tiered form must equal
  * bare try_cast exactly (both value and nullness). */
class SafeCastSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tryLong equals try_cast on every input class") {
    val inputs = Seq(
      "0", "1", "42", "+5", "-3", "007",
      " 12 ", "\t-8\n", "  +9  ",
      "F", "O", "P", "abc", "1a", "a1", "1 2", "++1", "+-1", "-", "+",
      "12.5", "1e3", "0x10", "NaN", "inf",
      "", " ", "  \t ",
      // ISO-control padding: ANSI cast byte-trims every ASCII char
      // <= 0x20 plus DEL, so try_cast parses these - the tiers must
      // route them identically (round-10 review finding)
      "\u00011", "1\u0000", "\u000e5", "\u007f-7", "\u001c8",
      "\u00a07", // non-breaking space is NOT byte-trimmed: both sides NULL
      "9223372036854775807",            // Long.MaxValue (19 digits, fits)
      "-9223372036854775808",           // Long.MinValue
      "9223372036854775808",            // MaxValue + 1 (overflow)
      "-9223372036854775809",           // MinValue - 1 (overflow)
      "1234567890123456789",            // 19 digits, in range
      "99999999999999999999",           // 20 digits, overflow
      "000000000000000000009",          // >18 chars but tiny value
      null.asInstanceOf[String])
    val df = inputs.toDF("v")
      .select(col("v"), SafeCast.tryLong(col("v")).as("fast"),
        col("v").try_cast("long").as("ref"))
    val bad = df.filter(!(col("fast") <=> col("ref"))).collect()
    assert(bad.isEmpty, s"divergent rows: ${bad.mkString(", ")}")
  }
}
