package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostics main (round-16 verdict task 5; NOT part of the judged
  * surface): the STATE-HEAVY streaming scale curve. StreamScaleProbe
  * fitted per-trigger cost for a stateless-per-trigger shape (dedup
  * signatures + frozen-index probe join inside foreachBatch);
  * the state-store-bound families — `stream_session_window` /
  * `stream_tws_session_timers`, the bench's most expensive streaming
  * rows, dominated by the measured ~55 ms/partition/batch
  * state-commit floor — had no measured curve. This probe stages
  * ×1/×10/×100 derivations of the events fixture through the JUDGED
  * session-window shape (watermark 1h, session_window 30 min, six
  * mtime-ordered day files = six micro-batches, withStreamConf's 8
  * shuffle partitions) and fits per-trigger wall against BOTH axes
  * the "state is watermark-bounded" claim has:
  *
  *  - mode `sessions`: copy k offsets user_id by k·10⁹ — open-session
  *    count AND batch rows both grow ×factor (the realistic scale-up:
  *    more traffic = more concurrent sessions);
  *  - mode `rows`: copy k jitters ts by +k µs within the SAME user's
  *    session (≤ 99 µs can never bridge a 30-minute gap) — batch rows
  *    grow ×factor while the open-session/state-row count stays ×1,
  *    isolating the per-row aggregation cost from state size.
  *
  * State size is measured, not argued: the progress listener records
  * each trigger's stateOperators numRowsTotal alongside
  * triggerExecution and numInputRows. Results → PLANS.md.
  *
  * Usage: `SPARK_GRAFT_SCALE_REPS=3 sbt "runMain graft.queries.StateScaleProbe"`.
  */
object StateScaleProbe {

  private final case class Trig(batchId: Long, rows: Long, wallS: Double, stateRows: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.EventStreams

    val trig = new java.util.concurrent.ConcurrentLinkedQueue[Trig]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L)
        val state = p.stateOperators.headOption.map(_.numRowsTotal).getOrElse(-1L)
        trig.add(Trig(p.batchId, p.numInputRows, dur / 1e3, state))
      }
    })

    /** ×factor derivation of the events fixture. Both modes keep ts
      * day-of-month structure intact so the six-day-file staging and
      * its nondecreasing-arrival contract hold unchanged. */
    def derived(factor: Int, mode: String): DataFrame = {
      val ev = graft.Tables.events(spark, sfDir)
      if (factor == 1) ev
      else {
        val copies = (0 until factor).map(lit(_))
        val fanned = ev.withColumn("k", explode(array(copies: _*)))
          .withColumn("event_id", col("event_id") + col("k") * 1000000000000L)
        val out = mode match {
          case "sessions" => fanned
            .withColumn("user_id", col("user_id") + col("k") * 1000000000L)
          case "rows" => fanned
            // +k µs inside the same session: expr-level to keep µs
            // precision (INTERVAL arithmetic on the timestamp column)
            .withColumn("ts", col("ts") + expr("make_interval(0, 0, 0, 0, 0, 0, k * 0.000001)"))
        }
        out.drop("k")
      }
    }

    /** Stage `ev` as six mtime-ordered day files (the judged
      * stageDayFiles protocol over a derived frame) under a fresh
      * root; returns the input dir. */
    def stageDays(ev: DataFrame, root: String): String = {
      import org.apache.hadoop.fs.{FileUtil, Path}
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(root).getFileSystem(conf)
      fs.delete(new Path(root), true)
      fs.mkdirs(new Path(root, "in"))
      val t0 = System.currentTimeMillis()
      (0 until 6).foreach { i =>
        val tmp = s"$root/stage$i"
        ev.filter(dayofmonth(col("ts")).between(i * 5 + 1, (i + 1) * 5))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.globStatus(new Path(s"$tmp/part-*.parquet")).head.getPath
        val dst = new Path(s"$root/in/f$i.parquet")
        FileUtil.copy(fs, part, fs, dst, false, conf)
        fs.setTimes(dst, t0 + i * 60000L, -1)
      }
      s"$root/in"
    }

    // mode selector so long runs can be chunked (diagnostic-only main)
    val modes = sys.env.getOrElse("SPARK_GRAFT_STATE_MODES", "sessions,rows")
      .split(",").map(_.trim).toSeq
    require(modes.forall(Set("sessions", "rows")), s"unknown mode in $modes")
    println(f"${"mode"}%9s ${"factor"}%7s ${"rows/trig"}%10s ${"state_max"}%10s ${"trig_s(mean,med)"}%17s  samples")
    val results = scala.collection.mutable.LinkedHashMap.empty[(String, Int), (Long, Long, Double)]
    for (mode <- modes; factor <- Seq(1, 10, 100)) {
      val ev = derived(factor, mode).localCheckpoint()
      val in = stageDays(ev, graft.Staging.dir(s"ssp2_${mode}_f$factor", sfDir))
      val samples = (1 to reps).map { rep =>
        val ck = graft.Staging.dir(s"ssp2ck_${mode}_f${factor}_r$rep", sfDir)
        val fs = new org.apache.hadoop.fs.Path(ck)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(ck), true)
        trig.clear()
        EventStreams.withStreamConf(spark) {
          EventStreams.awaitOrKill(
            EventStreams.readEvents(spark, in)
              .withWatermark("ts", "1 hour")
              .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
              .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
              .writeStream.format("noop")
              .outputMode("append")
              .option("checkpointLocation", ck)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start(),
            s"state_scale_${mode}_f$factor", timeoutMs = 1200000L)
        }
        try org.apache.spark.graftbus.ListenerBusDrain.drain(spark.sparkContext)
        catch { case scala.util.control.NonFatal(_) => () }
        // drop zero-input and missing-duration triggers (the
        // StreamScaleProbe discipline incl. its round-15 -1 fix)
        val runs = Iterator.continually(trig.poll()).takeWhile(_ != null)
          .filter(t => t.rows > 0 && t.wallS >= 0).toSeq
        (runs.map(_.rows).sum / runs.size,       // mean rows per trigger
          runs.map(_.stateRows).max,             // peak open-session rows
          runs.map(_.wallS).sum / runs.size)     // mean per-trigger wall
      }
      val sortedW = samples.map(_._3).sorted
      val med =
        if (sortedW.size % 2 == 1) sortedW(sortedW.size / 2)
        else (sortedW(sortedW.size / 2 - 1) + sortedW(sortedW.size / 2)) / 2
      results((mode, factor)) = (samples.head._1, samples.map(_._2).max, med)
      println(f"$mode%9s $factor%7d ${samples.head._1}%10d ${samples.map(_._2).max}%10d $med%17.3f  ${samples.map(s => f"${s._3}%.2f").mkString(", ")}")
    }
    for (mode <- modes) {
      val (r1, s1, t1) = results((mode, 1))
      val (r10, _, t10) = results((mode, 10))
      val (r100, s100, t100) = results((mode, 100))
      val expFull = math.log10(t100 / t1) / math.log10(r100.toDouble / r1)
      val expDecade = math.log10(t100 / t10) / math.log10(r100.toDouble / r10)
      println(f"[$mode] per-trigger wall vs batch rows: exponent x1->x100 $expFull%.2f, x10->x100 decade $expDecade%.2f (state rows x${s100.toDouble / s1}%.1f)")
    }
    spark.stop()
  }
}
