package graft

import graft.operators.{IngestOps, ParallelOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source/sink coverage: NDJSON sink+source (A12/A13), schema-projected
  * lenient reads (ignore_unknown_values, §1.3), PERMISSIVE corrupt-record
  * isolation (A5 — replaces the reference's 60-line per-record fallback),
  * CSV, and A19 job-level parallelism. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("A12/A13 NDJSON sink is newline-delimited and round-trips with explicit schema") {
    val tmp = Files.createTempDirectory("graft_json").toString + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "v", "x")
    df.write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("x", DoubleType)))
    val back = spark.read.schema(schema).json(tmp)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("schema projection drops unknown JSON keys (ignore_unknown_values semantics)") {
    val dir = Files.createTempDirectory("graft_lenient")
    Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "v": "keep", "unknown_key": "dropped"}
        |{"id": 2, "v": "keep2", "extra": {"nested": true}}""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val got = spark.read.schema(schema).json(dir.toString).orderBy("id").collect()
    assert(got.map(_.toSeq).toSeq === Seq(Seq(1L, "keep"), Seq(2L, "keep2")))
  }

  test("A5 PERMISSIVE mode isolates poison records instead of failing the batch") {
    val dir = Files.createTempDirectory("graft_corrupt")
    Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "v": "good"}
        |THIS IS NOT JSON
        |{"id": 3, "v": "also good"}""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("_corrupt_record", StringType)))
    val got = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache()   // corrupt-record column requires a materialized scan
    assert(got.count() === 3)
    assert(got.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(got.filter(col("id").isNotNull).count() === 2)
    got.unpersist()
  }

  test("CSV source round-trips with header and explicit schema") {
    val tmp = Files.createTempDirectory("graft_csv").toString + "/out"
    val df = Seq((1L, "x,y", 1.25), (2L, "plain", -3.5)).toDF("id", "v", "x")
    df.write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("x", DoubleType)))
    val back = spark.read.schema(schema).option("header", "true").csv(tmp)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("A19 runIsolated: failures stay isolated, successes complete") {
    val outcomes = ParallelOps.runIsolated(Seq(
      () => Tables.region(spark, TestSpark.sf0001).count(),
      () => throw new RuntimeException("endpoint down"),
      () => Tables.nation(spark, TestSpark.sf0001).count()))
    assert(outcomes(0).isSuccess && outcomes(0).get === 5L)
    assert(outcomes(1).isFailure)
    assert(outcomes(2).isSuccess && outcomes(2).get === 25L)
  }

  test("A11 partitioned write prunes partitions on read (dt filter)") {
    val tmp = Files.createTempDirectory("graft_prune").toString + "/sink"
    val df = (1 to 100).map(i => (i.toLong, s"2024-01-${i % 5 + 1}"))
      .toDF("id", "d").withColumn("d", to_timestamp(col("d")))
    IngestOps.writePartitioned(df, tmp, "d", Seq("id"))
    val pruned = spark.read.parquet(tmp).filter(col("dt") === "20240103")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(pruned.count() === 20)
    assert(scan.contains("PartitionFilters: [isnotnull(dt"), s"no partition filter in: $scan")
  }
}
