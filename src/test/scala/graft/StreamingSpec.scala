package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the Structured Streaming slice end-to-end over the events
  * fixture (file source → watermarked aggs → memory sink) and checks
  * stream/batch equivalence where output modes allow. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // The file-source stream monitors a directory; stage the fixture file
  // into one (this is also the real layout: a landing dir of files).
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  test("streaming tumbling counts equal the batch twin") {
    val streamed = EventStreams.runToBatch(spark,
      EventStreams.tumblingCounts(EventStreams.readEvents(spark, dir)),
      "tumbling_test", outputMode = "append")
    // append mode emits only watermark-closed windows; the final
    // windows may be withheld, so compare on the emitted subset
    val batch = SparkEntry.queries("stream_tumbling")(spark, TestSpark.sf0001)
      .select(col("window_start"), col("event_type"), col("n"))
    val emitted = streamed.select(col("window_start"), col("event_type"), col("n"))
    assert(emitted.count() > 0)
    assert(emitted.except(batch).count() === 0, "stream emitted a window batch disagrees with")
  }

  test("streaming session windows produce plausible sessions") {
    val sessions = EventStreams.runToBatch(spark,
      EventStreams.sessionAgg(EventStreams.readEvents(spark, dir)),
      "session_test", outputMode = "append")
    assert(sessions.count() > 0)
    val bad = sessions.filter(col("session_end") < col("session_start")).count()
    assert(bad === 0)
  }

  test("StreamMetrics listener emits per-batch metrics covering every input row (A25)") {
    import graft.streaming.StreamMetrics
    val fixtureRows = Tables.events(spark, TestSpark.sf0001).count()
    EventStreams.runToBatch(spark,
      EventStreams.readEvents(spark, dir).select(col("event_id")),
      "metrics_test", outputMode = "append")
    // the listener bus delivers asynchronously — bounded wait, no sleep-
    // and-pray: poll until the batch metrics cover the fixture rows
    val deadline = System.currentTimeMillis() + 30000
    def captured() = StreamMetrics.forQuery("metrics_test")
    while (captured().map(_.inputRows).sum < fixtureRows &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    val ms = captured()
    assert(ms.nonEmpty, "no batch metrics captured for metrics_test")
    assert(ms.map(_.inputRows).sum === fixtureRows,
      s"metrics must account for every input row: $ms")
    assert(ms.forall(_.triggerMs >= 0), s"trigger durations missing: $ms")
  }

  test("streaming dedup within watermark keeps all unique event_ids") {
    val deduped = EventStreams.runToBatch(spark,
      EventStreams.dedupStream(EventStreams.readEvents(spark, dir)),
      "dedup_test", outputMode = "append")
    val n = Tables.events(spark, TestSpark.sf0001).select("event_id").distinct().count()
    assert(deduped.count() === n)
  }
}
