package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostics main (round-17 verdict task 5; NOT part of the judged
  * surface): the FOURTH streaming evidence curve — the stream-stream
  * JOIN family. The three fitted curves so far cover the stateless
  * per-trigger probe (StreamScaleProbe 0.77), state-heavy session
  * aggregation (StateScaleProbe, two decoupled axes 0.32/0.44), and
  * the online artifact roll (MaintScaleProbe 0.25); the symmetric-hash
  * join family (`stream_stream_join`/left/full — three of the bench's
  * six most expensive streaming rows and twice flagged as bench
  * variance) had no curve. This probe stages ×1/×10/×100 events
  * through the JUDGED inner-join shape verbatim (purchases ⋈ clicks on
  * user_id with the click-in-the-hour-before interval bound, six
  * mtime-ordered day files = six micro-batches, withStreamConf's 8
  * shuffle partitions) and fits per-trigger wall on the two axes a
  * stream-stream join's cost model has:
  *
  *  - mode `users`: copy k offsets user_id by k·10⁹ (event_id by
  *    k·10¹²) — batch rows AND buffered-state rows both grow ×factor
  *    while per-user pair density is unchanged (the realistic traffic
  *    scale-up: output pairs grow ×factor, never ×factor² — fanning
  *    rows into the SAME users would measure the intrinsic quadratic
  *    growth of the answer, the ScaleRehearsal disjoint-strip lesson);
  *  - mode `retention`: the input is held FIXED and the watermark
  *    delay grows 2h → 20h → 200h — rows per trigger and the output
  *    stay ×1 while buffered-state rows grow with the eviction lag,
  *    isolating state-residency cost from row throughput (the
  *    StateScaleProbe `rows`-mode decoupling, inverted).
  *
  * State is measured, not argued: each trigger's stateOperators
  * numRowsTotal is recorded beside triggerExecution and numInputRows,
  * and the `retention` fit runs against the MEASURED state axis.
  * Results → PLANS.md.
  *
  * Usage: `SPARK_GRAFT_SCALE_REPS=3 sbt "runMain graft.queries.JoinScaleProbe"`
  * (chunk with SPARK_GRAFT_JOIN_MODES=users|retention).
  */
object JoinScaleProbe {

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

    /** ×factor traffic derivation: disjoint user strips, per-user pair
      * density preserved (see scaladoc). factor 1 = the fixture. */
    def derivedUsers(factor: Int): DataFrame = {
      val ev = graft.Tables.events(spark, sfDir)
      if (factor == 1) ev
      else {
        val copies = (0 until factor).map(lit(_))
        ev.withColumn("k", explode(array(copies: _*)))
          .withColumn("event_id", col("event_id") + col("k") * 1000000000000L)
          .withColumn("user_id", col("user_id") + col("k") * 1000000000L)
          .drop("k")
      }
    }

    /** Mtime-ordered day-slice files (the judged stageDayFiles
      * protocol over a derived frame) under a fresh root; `files`
      * slices of 30/files days each. The `users` mode keeps the
      * judged 6; the `retention` mode stages 15 two-day slices so the
      * watermark advances in finer steps and the eviction-lag axis
      * spans wider (6 five-day slices capped measured state at ×2.6
      * because retention follows the trigger cadence). */
    def stageDays(ev: DataFrame, root: String, files: Int): String = {
      import org.apache.hadoop.fs.{FileUtil, Path}
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(root).getFileSystem(conf)
      fs.delete(new Path(root), true)
      fs.mkdirs(new Path(root, "in"))
      val t0 = System.currentTimeMillis()
      // slice on the ORDINAL day of the fixture's actual ts range, not
      // dayofmonth: dayofmonth silently drops day-31 rows and folds a
      // month boundary's two months into the same slice (round-17
      // ADVICE). Every row lands in exactly one of the `files` slices.
      val bounds = ev.agg(min(to_date(col("ts"))).as("d0"),
        max(to_date(col("ts"))).as("d1")).head()
      val d0 = bounds.getDate(0)
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        d0.toLocalDate, bounds.getDate(1).toLocalDate) + 1
      val daysPer = ((span + files - 1) / files).toInt
      val ord = datediff(to_date(col("ts")), lit(d0))
      (0 until files).foreach { i =>
        val tmp = s"$root/stage$i"
        ev.filter(ord >= i * daysPer && ord < (i + 1) * daysPer)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.globStatus(new Path(s"$tmp/part-*.parquet")).head.getPath
        val dst = new Path(s"$root/in/f$i.parquet")
        FileUtil.copy(fs, part, fs, dst, false, conf)
        fs.setTimes(dst, t0 + i * 60000L, -1)
      }
      s"$root/in"
    }

    /** The judged stream_stream_join plan over the staged input, with
      * a parameterized watermark delay; joined pairs sink to noop (the
      * probe times the JOIN — the judged query's post-drain batch
      * aggregate is not part of the streaming cost). */
    def runJoin(in: String, delay: String, ck: String): Unit = {
      val ev = EventStreams.readEvents(spark, in)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", delay)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", delay)
      EventStreams.withStreamConf(spark) {
        EventStreams.awaitOrKill(
          purchases.join(clicks,
              col("c_user") === col("p_user") &&
                col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
                col("c_ts") < col("p_ts"))
            .writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start(),
          s"join_scale", timeoutMs = 1200000L)
      }
    }

    val modes = sys.env.getOrElse("SPARK_GRAFT_JOIN_MODES", "users,retention")
      .split(",").map(_.trim).toSeq
    require(modes.forall(Set("users", "retention")), s"unknown mode in $modes")
    println(f"${"mode"}%10s ${"factor"}%7s ${"rows/trig"}%10s ${"state_max"}%10s ${"trig_s(med)"}%12s  samples")
    val results = scala.collection.mutable.LinkedHashMap.empty[(String, Int), (Long, Long, Double)]
    for (mode <- modes; factor <- Seq(1, 10, 100)) {
      val (ev, delay, nFiles) = mode match {
        case "users" => (derivedUsers(factor).localCheckpoint(), "2 hours", 6)
        case "retention" => (graft.Tables.events(spark, sfDir), s"${2 * factor} hours", 15)
      }
      val in = stageDays(ev, graft.Staging.dir(s"jsp_${mode}_f$factor", sfDir), nFiles)
      val samples = (1 to reps).map { rep =>
        val ck = graft.Staging.dir(s"jspck_${mode}_f${factor}_r$rep", sfDir)
        val fs = new org.apache.hadoop.fs.Path(ck)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(ck), true)
        trig.clear()
        runJoin(in, delay, ck)
        try org.apache.spark.graftbus.ListenerBusDrain.drain(spark.sparkContext)
        catch { case scala.util.control.NonFatal(_) => () }
        // stateRows >= 0 like rows/wall: a trigger missing its
        // stateOperators entry records -1, and letting it through
        // feeds log10 of a negative axis in the retention fit (NaN
        // instead of a loud failure — round-17 ADVICE)
        val runs = Iterator.continually(trig.poll()).takeWhile(_ != null)
          .filter(t => t.rows > 0 && t.wallS >= 0 && t.stateRows >= 0).toSeq
        require(runs.nonEmpty,
          s"$mode f$factor rep $rep: no qualifying progress samples")
        val sample = (runs.map(_.rows).sum / runs.size,
          runs.map(_.stateRows).max,
          runs.map(_.wallS).sum / runs.size)
        require(sample._3 > 0, s"$mode f$factor rep $rep: zero trigger wall")
        sample
      }
      val sortedW = samples.map(_._3).sorted
      val med =
        if (sortedW.size % 2 == 1) sortedW(sortedW.size / 2)
        else (sortedW(sortedW.size / 2 - 1) + sortedW(sortedW.size / 2)) / 2
      results((mode, factor)) = (samples.head._1, samples.map(_._2).max, med)
      println(f"$mode%10s $factor%7d ${samples.head._1}%10d ${samples.map(_._2).max}%10d $med%12.3f  ${samples.map(s => f"${s._3}%.2f").mkString(", ")}")
    }
    for (mode <- modes if Seq(1, 10, 100).forall(f => results.contains((mode, f)))) {
      val (r1, s1, t1) = results((mode, 1))
      val (r10, s10, t10) = results((mode, 10))
      val (r100, s100, t100) = results((mode, 100))
      // users: fit against the batch-rows axis (state moves with it);
      // retention: rows are constant, fit against MEASURED state rows
      val (x1, x10, x100, axis) = mode match {
        case "users" => (r1.toDouble, r10.toDouble, r100.toDouble, "batch rows")
        case "retention" => (s1.toDouble, s10.toDouble, s100.toDouble, "buffered-state rows")
      }
      val expFull = math.log10(t100 / t1) / math.log10(x100 / x1)
      val expDecade = math.log10(t100 / t10) / math.log10(x100 / x10)
      println(f"[$mode] per-trigger wall vs $axis: exponent x1->x100 $expFull%.2f, decade $expDecade%.2f (state ×${s100.toDouble / math.max(s1, 1)}%.1f, rows ×${r100.toDouble / math.max(r1, 1)}%.1f)")
    }
    spark.stop()
  }
}
