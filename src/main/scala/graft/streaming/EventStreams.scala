package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming slice (SURVEY.md §2.10 / §7.2 step 4): the
  * reference's batch loop with sleeps (/root/reference/src/main.py:
  * 86,243) is logically a micro-batch incremental stream — watermark =
  * max landed date, resume from watermark. Here that becomes a real
  * `readStream` pipeline with event-time watermarks.
  *
  * The transformations are shared with the batch queries in
  * [[graft.queries.EventQueries]] (same window/agg shapes), so the
  * DuckDB oracle checks the semantics through the batch twin while
  * StreamingSpec drives the streaming execution itself.
  *
  * Scale config noted for 100 TB: RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass`), watermark-bounded
  * state, `maxFilesPerTrigger` for backpressure — all session config,
  * not plan shape.
  */
object EventStreams {

  /** File-source stream over an events directory. The stream schema is
    * DERIVED from a batch read of the same directory rather than
    * declared — round 7's hard-coded `ts: LongType` silently read
    * µs-encoded INT64 as if ns and fed 1970-era timestamps to five
    * judged streaming queries. Deriving from the files makes the
    * stream see exactly what a batch scan sees, and
    * [[graft.Tables.normalizeEventTs]] (the shared batch path)
    * canonicalizes `ts` identically for both — EventTsSpec asserts the
    * batch/stream min/max(ts) agreement per encoding. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val observed = graft.Tables.readRawEvents(spark, dir).schema
    graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(observed)
        .option("maxFilesPerTrigger", 1)   // backpressure: bounded batches
        .parquet(dir))
  }

  /** Tumbling 1h counts with a 1h watermark — streaming twin of the
    * `stream_tumbling` batch query. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Session windows (30 min gap) via the built-in session_window —
    * watermark-bounded state, the scalable form of sessionization. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Streaming dedup-by-key within the watermark horizon — the
    * streaming form of A16 (latest-wins is batch; streams keep
    * first-seen and drop replays). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming DataFrame to completion against the (finite)
    * fixture directory and return the collected result as a batch DF —
    * the test harness path: memory sink + processAllAvailable. */
  def runToBatch(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: String = "append", timeoutMs: Long = 300000L): DataFrame = {
    StreamMetrics.attach(spark)   // idempotent; per-batch observability
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    // watchdog: processAllAvailable has no timeout of its own; a wedged
    // stream must fail THIS call, not hang the whole Verify/Bench run
    val drain = new Thread(() => q.processAllAvailable(), s"runToBatch-$name")
    drain.setDaemon(true)
    drain.start()
    drain.join(timeoutMs)
    val drained = !drain.isAlive
    // a failed stream surfaces via q.exception (processAllAvailable's
    // throw died with the drain thread) — capture it BEFORE stopping
    val failure = q.exception
    // stop() itself can block forever on a non-interruptible stream
    // (stopTimeout=0 default): bound it on a side thread
    val stopper = new Thread(() => try q.stop() catch { case _: Throwable => () },
      s"runToBatch-stop-$name")
    stopper.setDaemon(true)
    stopper.start()
    stopper.join(15000L)
    // a failure raised DURING stop (e.g. a commit error on the final
    // batch) only appears on q.exception after the stop attempt —
    // re-check so it isn't swallowed
    val lateFailure = if (failure.isEmpty) q.exception else failure
    lateFailure.foreach(e =>
      throw new RuntimeException(s"runToBatch($name): stream failed", e))
    if (!drained)
      throw new RuntimeException(s"runToBatch($name): stream did not drain within $timeoutMs ms")
    spark.table(name)
  }

  /** Bound a started streaming query: await its (Trigger.AvailableNow)
    * completion, kill + throw on timeout. awaitTermination rethrows a
    * stream failure itself; stop() is bounded on a side thread because
    * it can block forever on a non-interruptible stream. */
  def awaitOrKill(q: org.apache.spark.sql.streaming.StreamingQuery, label: String,
      timeoutMs: Long = 300000L): Unit = {
    if (!q.awaitTermination(timeoutMs)) {
      val stopper = new Thread(() => try q.stop() catch { case _: Throwable => () },
        s"awaitOrKill-$label")
      stopper.setDaemon(true); stopper.start(); stopper.join(15000L)
      throw new RuntimeException(s"$label: stream did not finish within $timeoutMs ms")
    }
  }

  /** Fresh per-(prefix, sfDir) staging root with an empty `in/` dir —
    * the input side of the two-run checkpoint-resume protocol. */
  def prepareRestartBase(spark: SparkSession, sfDir: String, prefix: String): String = {
    import org.apache.hadoop.fs.Path
    val base = graft.Staging.dir(prefix, sfDir)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(base), true)
    fs.mkdirs(new Path(base, "in"))
    base
  }

  /** Stage ONE event_id-parity half of the events fixture as the single
    * file `in/<name>.parquet` under `base`. The raw (un-normalized)
    * read round-trips `ts` bytes as-is whatever the fixture's
    * encoding — readEvents derives its schema from the staged files
    * themselves, so staged and source stay consistent by construction.
    * Parity splitting is what makes the resume proofs sharp:
    * every event-time window has rows in BOTH halves. */
  def stageParityHalf(spark: SparkSession, sfDir: String, base: String,
      name: String, parity: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = s"$base/stage_$name"
    graft.Tables.readRawEvents(spark, s"$sfDir/events.parquet")
      .filter(pmod(col("event_id"), lit(2)) === parity)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val parts = fs.globStatus(new Path(tmp, "part-*.parquet"))
    require(parts.length == 1, s"stageParityHalf($name): expected 1 part file, got ${parts.length}")
    require(fs.rename(parts(0).getPath, new Path(s"$base/in/$name.parquet")),
      s"stageParityHalf($name): rename failed")
  }

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to
    * `partitions` (plus any `extra` confs), restoring prior values
    * after. The streaming queries otherwise inherit the session's 32
    * shuffle partitions, which also fixes the state-store partition
    * count at checkpoint creation — 32 state-store tasks per tiny
    * micro-batch is pure scheduling overhead at fixture scale (the
    * round-4 bench's dominant stream_stream_join cost and a noise
    * source). 8 keeps parallelism while quartering per-batch task
    * count; at 100 TB this knob is sized UP with the cluster — it is
    * per-query config, not plan shape.
    *
    * Round-13 measurement note (the round-12 verdict's top task asked
    * for Trigger.AvailableNow here, projecting ≥15 s): the hypothesis
    * was REFUTED by direct A/B — a ProcessingTime(0) drain via
    * processAllAvailable and an AvailableNow + awaitTermination drain
    * produce identical batch-by-batch durationMs breakdowns once
    * JIT-warmed (≈1.1 s either way on the probe pipeline; the first
    * uncached run's 4.1 vs 1.4 s gap was first-use JIT, not the
    * trigger loop), because both run the same data batches plus the
    * same watermark-finalization no-data batch. The per-trigger wall
    * is real addBatch work plus a per-partition state-commit floor
    * (~55 ms/partition/batch: p8→p2 cut the summed commit meter
    * 450→65 ms), but whole-family benches at partitions 2/4/8 landed
    * within host calibration noise (±3 s on a 56 s family while
    * calibration swung 0.09–0.36), so the established 8 stands —
    * PLANS.md records the full matrix. Delegates to
    * [[graft.operators.ConfScope.withConf]], so batch and streaming
    * conf scopes share ONE lock — see ConfScope's scaladoc for the
    * concurrency contract. */
  def withStreamConf[T](spark: SparkSession, partitions: Int = 8,
      extra: Map[String, String] = Map.empty)(body: => T): T = {
    StreamMetrics.attach(spark)
    graft.operators.ConfScope.withConf(spark,
      Map("spark.sql.shuffle.partitions" -> partitions.toString,
        // Changelog checkpointing (takes effect under the RocksDB state
        // store provider, a no-op for the default HDFS-backed one): per
        // commit, upload only the batch's state DELTA instead of a full
        // RocksDB snapshot — at 100 TB state a full-snapshot upload per
        // micro-batch IS the recovery/commit bottleneck; snapshots then
        // happen asynchronously in the background. Restart replays
        // changelogs on top of the last snapshot, which
        // stream_restart_stateful exercises end-to-end.
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
        ++ extra)(body)
  }

  /** Stage the events fixture file into a per-(prefix, sfDir) temp
    * directory for the file-source streaming queries (the source wants
    * a directory it can list). Idempotent: wiped and recopied per run.
    * `copies` > 1 stages the SAME file under several names — with
    * maxFilesPerTrigger=1 each copy arrives as its own micro-batch, a
    * controlled replay for dedup/idempotence tests. */
  /** Stage the events fixture as `groups` mtime-ASCENDING files of
    * consecutive days under `<base>/in` — the reference's daily-arrival
    * pattern; ascending day order keeps every event above the
    * watermark (nothing late-dropped). Used by the session-window /
    * timer-session queries, which share one oracle over the finalized
    * session set. */
  def stageDayFiles(spark: SparkSession, sfDir: String, prefix: String,
      groups: Int = 6, daysPerGroup: Int = 5): String =
    // READ-ONLY staged input, a pure function of (fixture, grouping) —
    // shared JVM-wide (round-11): the session-window and timer-session
    // queries (and their state-drop specs) consume identical day
    // files; `prefix` no longer isolates them, the grouping key does.
    // Consumers must never write under the returned base.
    graft.Staging.onceDir(spark, s"dayfiles_g${groups}d$daysPerGroup", sfDir) { base =>
      stageDayFilesInto(spark, sfDir, prefix, groups, daysPerGroup, base)
    }

  private def stageDayFilesInto(spark: SparkSession, sfDir: String, prefix: String,
      groups: Int, daysPerGroup: Int, base: String): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(base).getFileSystem(conf)
    fs.delete(new Path(base), true)
    fs.mkdirs(new Path(base, "in"))
    val ev = graft.Tables.events(spark, sfDir)
    // grouping is by day-of-MONTH: a fixture spanning months would
    // interleave day numbers across months and silently violate the
    // nondecreasing-arrival contract the session/timer queries build
    // on (watermark drops + state merges would corrupt quietly). The
    // fixture has drifted shape before (ts encoding, round 7) — fail
    // LOUDLY here if it ever spans months. One driver-side 2-value agg.
    val mm = ev.agg(min(trunc(col("ts"), "month")), max(trunc(col("ts"), "month")),
      max(dayofmonth(col("ts")))).head()
    require(mm.get(0) == mm.get(1),
      s"stageDayFiles($prefix): events span months ${mm.get(0)}..${mm.get(1)} — " +
        "day-of-month grouping would break arrival order; regroup by full date")
    // the between() filters below cover days [1, groups*daysPerGroup];
    // a later day would be silently DROPPED from the stream while the
    // oracle still counts it — fail loudly instead (round-9 ADVICE).
    require(mm.getInt(2) <= groups * daysPerGroup,
      s"stageDayFiles($prefix): fixture has events on day ${mm.getInt(2)} " +
        s"but staging only covers days 1..${groups * daysPerGroup} — raise groups/daysPerGroup")
    val t0 = System.currentTimeMillis()
    (0 until groups).foreach { i =>
      val tmp = s"$base/stage$i"
      ev.filter(dayofmonth(col("ts")).between(i * daysPerGroup + 1, (i + 1) * daysPerGroup))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.globStatus(new Path(s"$tmp/part-*.parquet")).head.getPath
      val dst = new Path(s"$base/in/f$i.parquet")
      FileUtil.copy(fs, part, fs, dst, false, conf)
      // the file source replays oldest-mtime first: pin day order
      fs.setTimes(dst, t0 + i * 60000L, -1)
    }
  }

  def stageEventsInput(spark: SparkSession, sfDir: String, prefix: String,
      copies: Int = 1): String = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val base = graft.Staging.dir(prefix, sfDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(base).getFileSystem(conf)
    fs.delete(new Path(base), true)
    val inDir = new Path(base, "in")
    fs.mkdirs(inDir)
    (0 until copies).foreach { i =>
      FileUtil.copy(fs, new Path(s"$sfDir/events.parquet"),
        fs, new Path(inDir, s"part-$i.parquet"), false, conf)
    }
    // guard: the replay/dedup queries' semantics assume exactly
    // `copies` staged files (each becomes one micro-batch under
    // maxFilesPerTrigger=1) — a partial copy must fail loudly here,
    // not as a silent watermark-eviction divergence downstream
    val staged = fs.listStatus(inDir).count(_.getPath.getName.endsWith(".parquet"))
    require(staged == copies,
      s"stageEventsInput($prefix): staged $staged files, expected $copies")
    base
  }
}
