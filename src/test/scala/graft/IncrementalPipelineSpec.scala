package graft

import graft.operators.IngestOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end incremental pipeline (the reference's §3.2 loop as batch
  * increments): land partitioned data → recover watermark from the
  * sink → fetch only newer days → dynamic-partition append → verify no
  * loss, no dupes, and untouched old partitions. */
class IncrementalPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("watermark-resume incremental load (A6+A7+A11+A16 composed)") {
    val sink = Files.createTempDirectory("graft_incr").toString + "/vendas"

    def mkBatch(days: Seq[Int], tag: String) =
      days.flatMap(d => (1 to 3).map(i => (d * 10L + i, f"2024-02-$d%02d", tag)))
        .toDF("sale_id", "d", "src").withColumn("d", to_timestamp(col("d")))

    // initial backfill: days 1-3
    IngestOps.writePartitioned(mkBatch(Seq(1, 2, 3), "backfill"), sink, "d", Seq("sale_id"))
    val wm1 = IngestOps.watermark(spark.read.parquet(sink)
      .withColumn("d", to_timestamp(col("dt").cast("string"), "yyyyMMdd")), "d").as[String].head()
    assert(wm1 === "20240203")

    // incoming feed has days 2-5; resume from watermark → only 4,5 land
    // (day 2-3 re-deliveries are dropped before the write, A16-style)
    val feed = mkBatch(Seq(2, 3, 4, 5), "incremental")
    val fresh = feed.filter(IngestOps.dtCompact(col("d")) > wm1)
    IngestOps.writePartitioned(fresh, sink, "d", Seq("sale_id"))

    val landed = spark.read.parquet(sink)
    assert(landed.count() === 15)                       // 5 days × 3 rows, no dupes
    assert(landed.select("dt").distinct().count() === 5)
    // old partitions untouched (still tagged backfill), new ones incremental
    assert(landed.filter(col("dt").cast("string") <= "20240203" && col("src") =!= "backfill").count() === 0)
    assert(landed.filter(col("dt").cast("string") > "20240203" && col("src") =!= "incremental").count() === 0)

    // re-running the same increment is idempotent (dynamic overwrite of
    // the same partitions, deterministic content)
    IngestOps.writePartitioned(fresh, sink, "d", Seq("sale_id"))
    assert(spark.read.parquet(sink).count() === 15)
    val wm2 = IngestOps.watermark(spark.read.parquet(sink)
      .withColumn("d", to_timestamp(col("dt").cast("string"), "yyyyMMdd")), "d").as[String].head()
    assert(wm2 === "20240205")
  }

  /** (relative path under root) -> (modtime, length) for every parquet
    * part file — the file-level identity used to prove untouched
    * partitions are never rewritten. */
  private def partFiles(root: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(root) -> (f.lastModified(), f.length()))
      .toMap
  }

  test("mergePartitioned rewrites ONLY touched dt partitions (file-level + pruned plan)") {
    val sink = Files.createTempDirectory("graft_mrg").toString + "/t"
    Seq((1L, 10.0, "20240201"), (2L, 20.0, "20240201"),
        (3L, 30.0, "20240202"), (4L, 40.0, "20240203"))
      .toDF("id", "v", "dt").write.partitionBy("dt").parquet(sink)
    val before = partFiles(sink)
    assert(before.keys.exists(_.contains("dt=20240201")))

    // plan evidence: the base read inside the merge is partition-pruned
    // — the dt predicate reaches the scan as PartitionFilters (dt is
    // STRING via readPartitioned, so no cast blocks pruning)
    val prunedPlan = IngestOps.readPartitioned(spark, sink)
      .filter(col("dt").isin("20240202", "20240203"))
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters") && prunedPlan.contains("dt#"),
      prunedPlan.take(2000))

    Thread.sleep(1100) // modtime granularity can be 1 s on some filesystems
    val changes = Seq((3L, 300.0, "20240202"), (5L, 50.0, "20240203"))
      .toDF("id", "v", "dt")
    val touched = IngestOps.mergePartitioned(spark, sink, changes, Seq("id"))
    assert(touched === Seq("20240202", "20240203"))

    val after = partFiles(sink)
    // untouched partition: exact same files (name, modtime, length)
    before.view.filterKeys(_.contains("dt=20240201")).foreach { case (p, sig) =>
      assert(after.get(p).contains(sig), s"untouched partition file rewritten: $p")
    }
    // touched partitions: fully replaced (no stale pre-merge file survives)
    before.view.filterKeys(k => k.contains("dt=20240202") || k.contains("dt=20240203"))
      .foreach { case (p, sig) =>
        assert(!after.get(p).contains(sig), s"touched partition file not rewritten: $p")
      }
    // merged end state: update applied, insert landed, rest intact
    val got = IngestOps.readPartitioned(spark, sink)
      .select(col("id"), col("v"), col("dt")).orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, 10.0, "20240201"), (2L, 20.0, "20240201"),
      (3L, 300.0, "20240202"), (4L, 40.0, "20240203"), (5L, 50.0, "20240203")))
  }

  test("mergePartitioned opCol: deletes remove keys, absent-key deletes are no-ops") {
    val sink = Files.createTempDirectory("graft_mrg_cdc").toString + "/t"
    Seq((1L, 10.0, "20240201"), (2L, 20.0, "20240201"), (3L, 30.0, "20240202"))
      .toDF("id", "v", "dt").write.partitionBy("dt").parquet(sink)
    val changes = Seq(
      (1L, 0.0, "20240201", "delete"),   // matched delete
      (9L, 0.0, "20240201", "delete"),   // absent key: no-op, but touches the partition
      (2L, 200.0, "20240201", "upsert"), // update
      (4L, 40.0, "20240202", "upsert"))  // insert
      .toDF("id", "v", "dt", "op")
    val touched = IngestOps.mergePartitioned(spark, sink, changes, Seq("id"), opCol = Some("op"))
    assert(touched === Seq("20240201", "20240202"))
    val got = IngestOps.readPartitioned(spark, sink)
      .select(col("id"), col("v"), col("dt")).orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.toSeq === Seq((2L, 200.0, "20240201"),
      (3L, 30.0, "20240202"), (4L, 40.0, "20240202")))
  }

  test("mergePartitioned opCol: a fully-deleted partition's directory is removed") {
    val sink = Files.createTempDirectory("graft_mrg_empty").toString + "/t"
    Seq((1L, 10.0, "20240201"), (4L, 40.0, "20240203"))
      .toDF("id", "v", "dt").write.partitionBy("dt").parquet(sink)
    // dt=20240203 holds ONLY key 4 — deleting it empties the partition;
    // dynamic overwrite alone would leave the old files (and the row)
    val changes = Seq((4L, 0.0, "20240203", "delete")).toDF("id", "v", "dt", "op")
    IngestOps.mergePartitioned(spark, sink, changes, Seq("id"), opCol = Some("op"))
    assert(!new java.io.File(s"$sink/dt=20240203").exists(),
      "emptied partition directory must be removed")
    val got = IngestOps.readPartitioned(spark, sink)
      .select(col("id"), col("dt")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "20240201")))
  }

  test("mergePartitioned identity is (keys, dt): cross-partition move = delete + upsert") {
    val sink = Files.createTempDirectory("graft_mrg_move").toString + "/t"
    Seq((7L, 70.0, "20240201"), (8L, 80.0, "20240202"))
      .toDF("id", "v", "dt").write.partitionBy("dt").parquet(sink)
    // move key 7 from 20240201 to 20240202 the contract way: both
    // partitions become touched, no cross-partition duplicate survives
    val changes = Seq((7L, 0.0, "20240201", "delete"), (7L, 71.0, "20240202", "upsert"))
      .toDF("id", "v", "dt", "op")
    val touched = IngestOps.mergePartitioned(spark, sink, changes, Seq("id"), opCol = Some("op"))
    assert(touched === Seq("20240201", "20240202"))
    val got = IngestOps.readPartitioned(spark, sink)
      .select(col("id"), col("v"), col("dt")).orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(got.toSeq === Seq((7L, 71.0, "20240202"), (8L, 80.0, "20240202")))
  }

  test("mergePartitioned fails loudly on bad change batches (contract guards)") {
    val sink = Files.createTempDirectory("graft_mrg_neg").toString + "/t"
    Seq((1L, 10.0, "20240201")).toDF("id", "v", "dt")
      .write.partitionBy("dt").parquet(sink)
    // empty change batch: a no-op merge is almost always a caller bug
    val empty = Seq.empty[(Long, Double, String)].toDF("id", "v", "dt")
    val e1 = intercept[IllegalArgumentException] {
      IngestOps.mergePartitioned(spark, sink, empty, Seq("id"))
    }
    assert(e1.getMessage.contains("empty change batch"))
    // null dt: the row names no target partition
    val nullDt = Seq((2L, 20.0, null.asInstanceOf[String])).toDF("id", "v", "dt")
    val e2 = intercept[IllegalArgumentException] {
      IngestOps.mergePartitioned(spark, sink, nullDt, Seq("id"))
    }
    assert(e2.getMessage.contains("null dt"))
    // touched-partition metadata bound: a change batch spraying more
    // partitions than maxTouched is a full-table rewrite in disguise
    val wide = Seq((3L, 30.0, "20240201"), (4L, 40.0, "20240202"), (5L, 50.0, "20240203"))
      .toDF("id", "v", "dt")
    val e3 = intercept[IllegalArgumentException] {
      IngestOps.mergePartitioned(spark, sink, wide, Seq("id"), maxTouched = 2)
    }
    assert(e3.getMessage.contains("maxTouched"))
    // an op column without opCol would silently upsert delete rows
    val opNoCol = Seq((2L, 20.0, "20240201", "delete")).toDF("id", "v", "dt", "op")
    val e4 = intercept[IllegalArgumentException] {
      IngestOps.mergePartitioned(spark, sink, opNoCol, Seq("id"))
    }
    assert(e4.getMessage.contains("opCol is not set"))
    // duplicate (keys, dt) change rows: the full-outer join would fan
    // them out into duplicate sink rows with a nondeterministic column
    // mix — rejected up front (ADVICE round 6)
    val dup = Seq((6L, 60.0, "20240201"), (6L, 61.0, "20240201"))
      .toDF("id", "v", "dt")
    val e5 = intercept[IllegalArgumentException] {
      IngestOps.mergePartitioned(spark, sink, dup, Seq("id"))
    }
    assert(e5.getMessage.contains("multiple rows"))
    // the sink is untouched by all five rejections
    assert(spark.read.parquet(sink).count() === 1)
  }

  test("a07_incremental_batch stages then loads only dt > watermark partitions") {
    val sf = TestSpark.sf0001
    // run the judged query end-to-end, then inspect its staging layout
    val out = SparkEntry.queries("a07_incremental_batch")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val root = Staging.dir("a07i", sf)
    // the sink now holds BOTH the initial (June) and incremental (July)
    // partitions; the source and sink agree exactly
    val srcN = spark.read.parquet(s"$root/source").count()
    assert(rows.length.toLong === srcN)
    // pruned incremental read: dt > watermark reaches the scan as a
    // PartitionFilter on the STRING dt (no cast in the way)
    val plan = IngestOps.readPartitioned(spark, s"$root/source")
      .filter(col("dt") > "19980630")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt#"), plan.take(2000))
  }
}
