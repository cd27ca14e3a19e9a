package graft

import graft.streaming.{EventStreams, StatefulOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft_stateful")
    Files.copy(java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  test("flatMapGroupsWithState: running per-user stats with activity flag") {
    val in = EventStreams.readEvents(spark, streamDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[StatefulOps.EventIn]
    val updates = EventStreams.runToBatch(spark,
      StatefulOps.runningUserStats(in, threshold = 5).toDF(),
      "running_stats", outputMode = "append")
    // one update per input event
    assert(updates.count() === 1000L)
    // final per-user counts match a batch groupBy
    val finalCounts = updates.groupBy("user_id").agg(max("n_events").as("n"))
    val batchCounts = Tables.events(spark, TestSpark.sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(finalCounts.join(batchCounts, Seq("user_id"))
      .filter(finalCounts("n") =!= batchCounts("n")).count() === 0)
    // flag flips exactly at the threshold, monotonically
    assert(updates.filter(col("n_events") >= 5 && !col("high_activity")).count() === 0)
    assert(updates.filter(col("n_events") < 5 && col("high_activity")).count() === 0)
  }

  test("foreachBatch idempotent sink converges under replay") {
    val target = Files.createTempDirectory("graft_sink").toString + "/merged"
    def runOnce(): Unit = {
      val stream = EventStreams.readEvents(spark, streamDir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val q = StatefulOps.idempotentSink(stream, target,
        keys = Seq("event_id"), orderCol = "ts", tiebreaks = Seq("user_id"))
        .option("checkpointLocation", Files.createTempDirectory("graft_ckpt").toString)
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    val afterFirst = spark.read.parquet(target).count()
    runOnce()   // fresh checkpoint → the whole input replays
    val afterReplay = spark.read.parquet(target).count()
    assert(afterFirst === 1000L)
    assert(afterReplay === 1000L, "replay must not duplicate rows")
  }
}
