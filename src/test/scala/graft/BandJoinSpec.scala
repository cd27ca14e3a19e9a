package graft

import graft.plans.BandJoinBinning
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The band-join binning rule (graft.plans.BandJoinBinning): the rewrite
  * must be value-identical to the nested-loop plan on every band shape
  * it claims to handle, must actually remove the nested loop from the
  * physical plan, and must leave non-band joins alone.
  */
class BandJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def installed(): Unit = BandJoinBinning.install(spark)

  /** Run `q` with the rule on and off; both value-sorted collections
    * must match (the off path is the nested-loop ground truth). */
  private def assertSameOnOff(q: => DataFrame): Unit = {
    installed()
    val on = q.collect().map(_.toString).sorted
    spark.conf.set(BandJoinBinning.Flag, "false")
    val off =
      try q.collect().map(_.toString).sorted
      finally spark.conf.unset(BandJoinBinning.Flag)
    assert(on.sameElements(off), s"on=${on.take(5).mkString(";")} off=${off.take(5).mkString(";")}")
  }

  private def evs: DataFrame =
    Tables.events(spark, TestSpark.sf0001).select($"event_id", $"value")

  test("symmetric abs() band matches the nested loop and plans as a hash/merge join") {
    installed()
    val a = evs.select($"event_id".as("a_id"), $"value".as("a_val"))
    val b = evs.select($"event_id".as("b_id"), $"value".as("b_val"))
    // queryExecution caches the optimized plan per DataFrame, so each
    // flag setting needs a freshly-built join
    def joined = a.join(b, abs($"a_val" - $"b_val") <= 0.05 && $"a_id" < $"b_id")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "band join must not plan as a nested loop:\n" + p.take(3000))

    spark.conf.set(BandJoinBinning.Flag, "false")
    val pOff =
      try joined.queryExecution.executedPlan.toString
      finally spark.conf.unset(BandJoinBinning.Flag)
    assert(pOff.contains("BroadcastNestedLoopJoin") || pOff.contains("CartesianProduct"),
      "without the rule this join should be a nested loop (else the test is vacuous)")

    assertSameOnOff(
      a.join(b, abs($"a_val" - $"b_val") <= 0.05 && $"a_id" < $"b_id")
        .select($"a_id", $"b_id"))
  }

  test("asymmetric BETWEEN band (different lo/hi offsets) matches the nested loop") {
    val a = evs.select($"event_id".as("a_id"), $"value".as("a_val"))
    val b = evs.select($"event_id".as("b_id"), $"value".as("b_val"))
    assertSameOnOff(
      a.join(b, $"a_val" >= $"b_val" - 0.02 && $"a_val" <= $"b_val" + 0.07)
        .select($"a_id", $"b_id"))
  }

  test("strict bounds are honored exactly (widened for binning, re-filtered)") {
    val a = evs.select($"event_id".as("a_id"), $"value".as("a_val"))
    val b = evs.select($"event_id".as("b_id"), $"value".as("b_val"))
    assertSameOnOff(
      a.join(b, $"a_val" - $"b_val" < 0.03 && $"b_val" - $"a_val" < 0.04)
        .select($"a_id", $"b_id"))
  }

  test("null band values drop out of the inner join, same as the nested loop") {
    val withNulls = evs.select($"event_id",
      when($"event_id" % 7 === 0, lit(null)).otherwise($"value").as("value"))
    val a = withNulls.select($"event_id".as("a_id"), $"value".as("a_val"))
    val b = withNulls.select($"event_id".as("b_id"), $"value".as("b_val"))
    assertSameOnOff(
      a.join(b, abs($"a_val" - $"b_val") <= 0.05 && $"a_id" =!= $"b_id")
        .select($"a_id", $"b_id"))
  }

  test("joins that already have an equi key are left alone") {
    installed()
    val e = Tables.events(spark, TestSpark.sf0001)
      .select($"event_id", $"user_id", $"value")
    val a = e.select($"user_id".as("a_u"), $"value".as("a_val"))
    val b = e.select($"user_id".as("b_u"), $"value".as("b_val"))
    val joined = a.join(b, $"a_u" === $"b_u" && abs($"a_val" - $"b_val") <= 0.05)
    val p = joined.queryExecution.optimizedPlan.toString
    assert(!p.contains("__graft_band"),
      "equi-keyed join must not be rewritten:\n" + p.take(2000))
  }

  test("one-sided range predicates (no band) are left alone") {
    installed()
    val a = evs.select($"event_id".as("a_id"), $"value".as("a_val"))
    val b = evs.select($"event_id".as("b_id"), $"value".as("b_val"))
    val joined = a.join(b, $"a_val" <= $"b_val" && $"a_id" < $"b_id")
    val p = joined.queryExecution.optimizedPlan.toString
    assert(!p.contains("__graft_band"),
      "a half-bounded range is not binnable and must not be rewritten:\n" + p.take(2000))
  }

  test("past the broadcast threshold the binned join plans as SortMergeJoin on the bucket") {
    installed()
    val a = evs.select($"event_id".as("a_id"), $"value".as("a_val"))
    val b = evs.select($"event_id".as("b_id"), $"value".as("b_val"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p =
      try a.join(b, abs($"a_val" - $"b_val") <= 0.05 && $"a_id" < $"b_id")
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // the 100 TB shape: both sides shuffle once on the bucket key and
    // merge — never a loop, no broadcast of a fact-sized side
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(3000))
    assert(p.contains("__graft_band_probe") && p.contains("__graft_band_bucket"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("timestamp band (ts BETWEEN ts ± INTERVAL) binned via UnixMicros, value-identical") {
    installed()
    val e = Tables.events(spark, TestSpark.sf0001).select($"event_id", $"ts")
    val a = e.select($"event_id".as("a_id"), $"ts".as("a_ts"))
    val b = e.select($"event_id".as("b_id"), $"ts".as("b_ts"))
    def q = a.join(b,
      $"b_ts" >= $"a_ts" - expr("INTERVAL 30 SECONDS") &&
        $"b_ts" <= $"a_ts" + expr("INTERVAL 30 SECONDS") && $"a_id" < $"b_id")
      .select($"a_id", $"b_id")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "time band must bin, not loop:\n" + p.take(3000))
    assert(p.contains("unix_micros") || p.contains("__graft_band"), p.take(3000))
    val on = q.collect().map(_.toString).sorted
    spark.conf.set(BandJoinBinning.Flag, "false")
    val off =
      try q.collect().map(_.toString).sorted
      finally spark.conf.unset(BandJoinBinning.Flag)
    assert(on.sameElements(off))
  }

  test("judged join_range_band: no nested loop in the executed plan") {
    val df = SparkEntry.queries("join_range_band")(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    assert(df.collect().map(_.getLong(2)).sum > 0, "band pairs must exist on the fixture")
  }
}
