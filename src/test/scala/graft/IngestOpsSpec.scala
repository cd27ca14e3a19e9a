package graft

import graft.operators.IngestOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IngestOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("A9 enrich appends the three metadata columns and keeps input columns") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val out = IngestOps.enrich(df, lit("gs://b/p"))
    assert(out.columns.toSeq === Seq("id", "v", "gcs_uri", "ingestion_timestamp", "source_system"))
    val rows = out.collect()
    assert(rows.forall(_.getAs[String]("source_system") == "VMHUB"))
    assert(rows.forall(_.getAs[String]("gcs_uri") == "gs://b/p"))
    // batch-constant ISO-8601Z stamp (main.py:35 semantics)
    val stamps = rows.map(_.getAs[String]("ingestion_timestamp")).distinct
    assert(stamps.length === 1)
    assert(stamps.head.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"""))
  }

  test("A22 normalizeCnpj strips . / -") {
    val got = Seq("12.345.678/0001-90").toDF("c")
      .select(IngestOps.normalizeCnpj(col("c"))).as[String].head()
    assert(got === "12345678000190")
  }

  test("A11 storagePath builds dated and undated layouts") {
    val df = Seq(("12.345.678/0001-90", 3)).toDF("cnpj", "pg")
    val dated = df.select(IngestOps.storagePath(col("cnpj"), "vendas",
      col("pg"), to_timestamp(lit("2024-01-15")))).as[String].head()
    assert(dated === "CNPJ_12345678000190/vendas/20240115/response_pg3.json")
    val undated = df.select(IngestOps.storagePath(col("cnpj"), "clientes",
      col("pg"), lit(null).cast("timestamp"))).as[String].head()
    assert(undated === "CNPJ_12345678000190/clientes/response_pg3.json")
  }

  test("A16 dedupLatest keeps the deterministic latest row per key and is idempotent") {
    val df = Seq(
      (1L, "2024-01-01", "old"), (1L, "2024-02-01", "new"),
      (1L, "2024-02-01", "tie"), (2L, "2024-01-01", "only"))
      .toDF("k", "d", "v").withColumn("d", to_timestamp(col("d")))
    val out = IngestOps.dedupLatest(df, Seq("k"), "d", Seq("v"))
    val got = out.orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    // ties on d broken by v DESC: "tie" > "new"
    assert(got === Seq((1L, "tie"), (2L, "only")))
    val again = IngestOps.dedupLatest(out, Seq("k"), "d", Seq("v"))
    assert(again.count() === out.count())
  }

  test("A7/A8 watermark is the max formatted date") {
    val df = Seq("2024-01-01", "2024-03-05", "2023-12-31").toDF("d")
      .withColumn("d", to_timestamp(col("d")))
    assert(IngestOps.watermark(df, "d").as[String].head() === "20240305")
  }

  test("A6 dailyRanges enumerates half-open day windows") {
    val df = Seq("2024-01-01 10:00:00", "2024-01-03 05:00:00").toDF("d")
      .withColumn("d", to_timestamp(col("d")))
    val days = IngestOps.dailyRanges(df, "d").collect()
    assert(days.length === 3)
    assert(days.head.getAs[java.sql.Date]("day").toString === "2024-01-01")
    val first = days.head
    assert(first.getAs[java.sql.Timestamp]("day_end").getTime -
      first.getAs[java.sql.Timestamp]("day_start").getTime === 86400000L)
  }

  test("A10 successOnly filters to the matching status") {
    val df = Seq(("a", "sucesso"), ("b", "erro")).toDF("v", "st")
    assert(IngestOps.successOnly(df, "st", "sucesso").as[(String, String)].collect()
      === Array(("a", "sucesso")))
  }

  test("A12 toNdjson emits one JSON object per row; A13 from_json round-trips") {
    val df = Seq((1L, "x")).toDF("id", "v")
    val json = IngestOps.toNdjson(df).select("json").as[String].head()
    assert(json === """{"id":1,"v":"x"}""")
  }

  test("A11/A17 writePartitioned lands Hive-style dt= partitions and overwrites dynamically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val df = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b"))
      .toDF("id", "d", "v").withColumn("d", to_timestamp(col("d")))
    IngestOps.writePartitioned(df, tmp, "d", Seq("v"))
    val dirs = new java.io.File(tmp).listFiles().map(_.getName).filter(_.startsWith("dt=")).sorted
    assert(dirs.toSeq === Seq("dt=20240101", "dt=20240102"))
    val back = spark.read.parquet(tmp)
    assert(back.count() === 2)
    assert(back.columns.toSet === Set("id", "d", "v", "dt"))
  }
}
