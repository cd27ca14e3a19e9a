package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostics main (round-15 verdict task 2; NOT part of the judged
  * surface): the streaming complement of ScaleRehearsal — a measured
  * BATCH-SIZE scaling curve for a streaming production shape. The
  * 22-family ×100 roster is batch-only; every streaming op's scale
  * claim (O(batch) per trigger plus the ~55 ms/partition/batch
  * state-commit floor StreamProbe measured in round 13) was argued,
  * not fitted. This probe stages ×1/×10/×100 micro-batch volumes
  * through `stream_dedup_index`'s exact per-trigger work — MinHash
  * signatures computed in-batch, band-key equi-join against the
  * FROZEN base persisted index, per-doc rollup, parquet sink — as one
  * micro-batch per run, and reports the per-trigger wall
  * (triggerExecution from the progress listener, median of
  * SPARK_GRAFT_SCALE_REPS runs) against the batch row count. The
  * index is deliberately held at the base corpus across factors: the
  * claim under test is per-TRIGGER cost vs batch size, and the
  * batch-vs-index decade is already covered by the batch roster
  * (dedup_containment_incremental, both sides ×100). This is
  * batch-size scaling, NOT the trigger-mode question round 13
  * refuted — the trigger is AvailableNow throughout, matching the
  * judged query. Results → PLANS.md.
  *
  * Usage: `SPARK_GRAFT_SCALE_REPS=3 sbt "runMain graft.queries.StreamScaleProbe"`.
  */
object StreamScaleProbe {
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

    // per-trigger durations via the listener — the Bench trigger-meter
    // machinery, drained between runs so attribution can't bleed
    val trig = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        trig.add((p.batchId, p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L)))
      }
    })

    val idx = TextQueries.sharedMinhashIndex(spark, sfDir)
    println(f"${"factor"}%8s ${"rows"}%8s ${"trigger_s(median)"}%18s  samples")
    val medians = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, Double)]
    Seq(1, 10, 100).foreach { factor =>
      val docsDir =
        if (factor == 1) sfDir
        else graft.ScaleRehearsal.stageScaled(spark, sfDir, factor)
      // the judged query's batch slice at this factor, staged as ONE
      // input file = ONE micro-batch (parquet stays splittable, so the
      // in-batch scan parallelizes exactly as the judged coalesce(1)
      // staging does)
      val batch = spark.read.parquet(s"$docsDir/documents.parquet")
        .filter(pmod(col("doc_id"), lit(5L)) === 0)
        .select(col("doc_id"), col("text"))
      val samples = (1 to reps).map { rep =>
        val root = graft.Staging.dir(s"ssp_f${factor}_r$rep", sfDir)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        batch.coalesce(1).write.mode("overwrite").parquet(s"$root/in")
        val schema = spark.read.parquet(s"$root/in").schema
        trig.clear()
        EventStreams.withStreamConf(spark) {
          EventStreams.awaitOrKill(
            spark.readStream.schema(schema).parquet(s"$root/in")
              .writeStream.foreachBatch { (b: DataFrame, id: Long) =>
                TextQueries.scoreAgainstIndex(spark,
                    TextQueries.minhashBandedRaw(b), idx)
                  .write.mode("overwrite").parquet(s"$root/hits/b$id")
                ()
              }
              .option("checkpointLocation", s"$root/ckpt")
              .trigger(Trigger.AvailableNow())
              .start(),
            s"stream_scale_probe_f$factor")
        }
        try org.apache.spark.graftbus.ListenerBusDrain.drain(spark.sparkContext)
        catch { case scala.util.control.NonFatal(_) => () }
        // drop triples whose triggerExecution was absent (-1 sentinel)
        // the same way zero-input triggers are dropped — summing the
        // sentinel would silently bias the per-run wall low (round-15
        // ADVICE)
        val runs = Iterator.continually(trig.poll()).takeWhile(_ != null)
          .filter(t => t._2 > 0 && t._3 >= 0).toSeq
        (runs.map(_._2).sum, runs.map(_._3).sum / 1e3)
      }
      // true median: average the two middles on even rep counts
      // (index size/2 alone biases high — the Bench.scala fix)
      val sortedS = samples.map(_._2).sorted
      val med =
        if (sortedS.size % 2 == 1) sortedS(sortedS.size / 2)
        else (sortedS(sortedS.size / 2 - 1) + sortedS(sortedS.size / 2)) / 2
      medians(factor) = (samples.head._1, med)
      println(f"$factor%8d ${samples.head._1}%8d $med%18.3f  ${samples.map(s => f"${s._2}%.2f").mkString(", ")}")
    }
    val (r1, t1) = medians(1); val (r100, t100) = medians(100)
    val (r10, t10) = medians(10)
    val expFull = math.log10(t100 / t1) / math.log10(r100.toDouble / r1)
    val expDecade = math.log10(t100 / t10) / math.log10(r100.toDouble / r10)
    println(f"fitted exponent x1->x100: $expFull%.2f; x10->x100 decade: $expDecade%.2f")
    spark.stop()
  }
}
