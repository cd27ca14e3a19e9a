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
}
