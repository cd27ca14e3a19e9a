package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostics main (round 16; NOT part of the judged surface): the
  * THIRD streaming evidence curve, completing the set — StreamScaleProbe
  * fitted the stateless per-trigger shape (signatures + frozen-index
  * probe), StateScaleProbe the state-store-bound shape (session windows,
  * two decoupled axes); this probe fits the ONLINE ARTIFACT-MUTATION
  * shape `stream_lm_forget` judged: per-ROLL cost vs deletion-batch
  * size with the standing count artifact held FIXED at the base corpus.
  * The claimed cost model is O(tombstone batch) + a vocab-sized
  * artifact rewrite floor; the ×100 rehearsal row already measures the
  * full roll with BOTH axes ×100 (0.40), so this probe isolates the
  * batch axis the way StateScaleProbe's `rows` mode isolates row cost
  * from state size.
  *
  * Derivation: the base tombstone slice (standing ∧ doc_id%10=1)
  * replicated ×factor with offset doc_ids and UNCHANGED text, so the
  * batch vocabulary stays inside the artifact's and the subtraction
  * exercises the same merge width at every factor. COST-honest, not
  * value-honest: over-subtracting replicated counts drives some cells
  * negative and the c>0 filter clips them — the judged semantics live
  * in the gated queries; this probe measures the roll's wall only
  * (tokenize batch → counts → union-aggregate against the RE-READ
  * artifact → versioned write), one micro-batch per run, per-trigger
  * wall from the progress listener. The shared artifact is read-only
  * here; each run writes its v1 under its own root. Results → PLANS.md.
  *
  * Usage: `SPARK_GRAFT_SCALE_REPS=3 sbt "runMain graft.queries.MaintScaleProbe"`.
  */
object MaintScaleProbe {
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

    // the judged roll's standing artifact, built once and READ-ONLY
    // throughout (each probe run writes its own v1)
    val statsRoot = LmQueries.sharedLmStats(spark, sfDir, day1Only = false)
    val baseTomb = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5L)) =!= 0 &&
        pmod(col("doc_id"), lit(LmQueries.ForgetMod)) === LmQueries.ForgetRes)
      .select(col("doc_id"), col("text"))
    // replica offset derived from the corpus, not a constant (round-16
    // ADVICE): a fixed 10M stride collides on any corpus whose doc_ids
    // reach 10M (e.g. a pre-scaled rehearsal dir), silently shrinking
    // the effective batch and bending the fitted exponent
    val replicaOff = baseTomb.agg(max(col("doc_id"))).head.getLong(0) + 1L

    // section selector so the heavy curve and the cadence comparison
    // can run separately (diagnostic-only main)
    val modes = sys.env.getOrElse("SPARK_GRAFT_MAINT_MODES", "curve,compare")
      .split(",").map(_.trim).toSet
    require(modes.subsetOf(Set("curve", "compare")), s"unknown mode in $modes")

    println(f"${"factor"}%8s ${"rows"}%8s ${"trigger_s(median)"}%18s  samples")
    val medians = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, Double)]
    (if (modes("curve")) Seq(1, 10, 100) else Seq.empty[Int]).foreach { factor =>
      val copies = (0 until factor).map(lit(_))
      val batch =
        if (factor == 1) baseTomb
        else baseTomb.withColumn("k", explode(array(copies: _*)))
          .withColumn("doc_id", col("doc_id") + col("k") * replicaOff)
          .drop("k")
      val samples = (1 to reps).map { rep =>
        val root = graft.Staging.dir(s"msp_f${factor}_r$rep", sfDir)
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
                // the judged roll body verbatim (stream_lm_forget):
                // batch counts → negated union with the RE-READ
                // artifact → aggregate + clip → versioned write
                val ss = b.sparkSession
                val tok = b.select(col("doc_id"),
                  graft.functions.TextFunctions.tokens(col("text")).as("w"))
                val uniT = tok.select(explode(col("w")).as("w1"))
                  .groupBy("w1").agg(count(lit(1)).as("c1"))
                val biT = tok.filter(size(col("w")) >= 2)
                  .select(col("doc_id"), explode(expr(
                    "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))")).as("p"))
                  .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
                  .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
                ss.read.parquet(s"$statsRoot/uni")
                  .unionByName(uniT.select(col("w1"), negate(col("c1")).as("c1")))
                  .groupBy("w1").agg(sum("c1").as("c1")).filter(col("c1") > 0)
                  .write.mode("overwrite").parquet(s"$root/v${id + 1}/uni")
                ss.read.parquet(s"$statsRoot/bi")
                  .unionByName(biT.select(col("w1"), col("w2"), negate(col("c2")).as("c2")))
                  .groupBy("w1", "w2").agg(sum("c2").as("c2")).filter(col("c2") > 0)
                  .write.mode("overwrite").parquet(s"$root/v${id + 1}/bi")
                ()
              }
              .option("checkpointLocation", s"$root/ckpt")
              .trigger(Trigger.AvailableNow())
              .start(),
            s"maint_scale_probe_f$factor")
        }
        try org.apache.spark.graftbus.ListenerBusDrain.drain(spark.sparkContext)
        catch { case scala.util.control.NonFatal(_) => () }
        val runs = Iterator.continually(trig.poll()).takeWhile(_ != null)
          .filter(t => t._2 > 0 && t._3 >= 0).toSeq
        // a listener miss or all-zero numInputRows must abort loudly
        // (round-16 ADVICE): a silent (0 rows, 0.0 s) sample makes the
        // fitted exponent NaN/Infinity instead of failing the probe
        require(runs.nonEmpty,
          s"f$factor rep $rep: no qualifying progress samples - listener miss or empty batch")
        val (rows, t) = (runs.map(_._2).sum, runs.map(_._3).sum / 1e3)
        require(rows > 0 && t > 0,
          s"f$factor rep $rep: degenerate sample (rows=$rows, t=$t)")
        (rows, t)
      }
      val sortedS = samples.map(_._2).sorted
      val med =
        if (sortedS.size % 2 == 1) sortedS(sortedS.size / 2)
        else (sortedS(sortedS.size / 2 - 1) + sortedS(sortedS.size / 2)) / 2
      medians(factor) = (samples.head._1, med)
      println(f"$factor%8d ${samples.head._1}%8d $med%18.3f  ${samples.map(s => f"${s._2}%.2f").mkString(", ")}")
    }
    if (modes("curve")) {
      val (r1, t1) = medians(1); val (r100, t100) = medians(100)
      val (r10, t10) = medians(10)
      val expFull = math.log10(t100 / t1) / math.log10(r100.toDouble / r1)
      val expDecade = math.log10(t100 / t10) / math.log10(r100.toDouble / r10)
      println(f"fitted exponent x1->x100: $expFull%.2f; x10->x100 decade: $expDecade%.2f")
    }

    if (!modes("compare")) { spark.stop(); return }
    // N-roll vs log+compact (round-17 task 3, the cadence trade
    // doc_lm_compact judges for correctness measured for COST): the
    // four delta batches of the judged compact query, paid two ways —
    // EAGER: four sequential read-modify-write rolls, roll k re-reads
    // version k (4 vocab-floor rewrites); LOG: four pure appends (no
    // artifact read) + ONE compaction over base ∪ log (1 vocab-floor
    // rewrite). Same algebra, same final counts; the wall ratio is the
    // per-window saving a high-cadence deletion schedule buys.
    val deltas = Seq(1L, 11L, 21L, 31L).map { res =>
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(pmod(col("doc_id"), lit(5L)) =!= 0 &&
          pmod(col("doc_id"), lit(4L * LmQueries.ForgetMod)) === res)
        .select(col("doc_id"), col("text")).localCheckpoint()
    }
    def countsOf(b: DataFrame): (DataFrame, DataFrame) = {
      val tok = b.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("w"))
      (tok.select(explode(col("w")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1")),
        tok.filter(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))")).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c2")))
    }
    def timeReps(label: String)(body: String => Unit): Double = {
      val ts = (1 to reps).map { rep =>
        val root = graft.Staging.dir(s"mspcmp_${label}_r$rep", sfDir)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val t0 = System.nanoTime()
        body(root)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = if (ts.size % 2 == 1) ts(ts.size / 2)
                else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
      println(f"$label%8s rolls: $med%8.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
      med
    }
    val tEager = timeReps("eager") { root =>
      spark.read.parquet(s"$statsRoot/uni").write.parquet(s"$root/v0/uni")
      spark.read.parquet(s"$statsRoot/bi").write.parquet(s"$root/v0/bi")
      deltas.zipWithIndex.foreach { case (b, k) =>
        val (uniT, biT) = countsOf(b)
        spark.read.parquet(s"$root/v$k/uni")
          .unionByName(uniT.select(col("w1"), negate(col("c1")).as("c1")))
          .groupBy("w1").agg(sum("c1").as("c1")).filter(col("c1") > 0)
          .write.parquet(s"$root/v${k + 1}/uni")
        spark.read.parquet(s"$root/v$k/bi")
          .unionByName(biT.select(col("w1"), col("w2"), negate(col("c2")).as("c2")))
          .groupBy("w1", "w2").agg(sum("c2").as("c2")).filter(col("c2") > 0)
          .write.parquet(s"$root/v${k + 1}/bi")
      }
    }
    val tLog = timeReps("log") { root =>
      deltas.foreach { b =>
        val (uniT, biT) = countsOf(b)
        uniT.select(col("w1"), negate(col("c1")).as("c1"))
          .write.mode("append").parquet(s"$root/log/uni")
        biT.select(col("w1"), col("w2"), negate(col("c2")).as("c2"))
          .write.mode("append").parquet(s"$root/log/bi")
      }
      spark.read.parquet(s"$statsRoot/uni")
        .unionByName(spark.read.parquet(s"$root/log/uni"))
        .groupBy("w1").agg(sum("c1").as("c1")).filter(col("c1") > 0)
        .write.parquet(s"$root/compact/uni")
      spark.read.parquet(s"$statsRoot/bi")
        .unionByName(spark.read.parquet(s"$root/log/bi"))
        .groupBy("w1", "w2").agg(sum("c2").as("c2")).filter(col("c2") > 0)
        .write.parquet(s"$root/compact/bi")
    }
    println(f"log+compact / eager 4-roll wall ratio: ${tLog / tEager}%.2f")
    spark.stop()
  }
}
