package graft

import graft.operators.IngestOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** End-to-end DataSourceV2 coverage: land NDJSON pages in the
  * reference's exact path layout, read them back through
  * format("graft-landing"), and verify page-level partitioning,
  * dt-pushdown pruning, and column pruning. */
class LandingSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val dataSchema = StructType(Seq(
    StructField("sale_id", LongType),
    StructField("amount", DoubleType),
    StructField("status", StringType)))

  /** Lay out {root}/CNPJ_x/vendas/{yyyyMMdd}/response_pg{N}.json with 2
    * pages per day — via the A11 storagePath layout. */
  lazy val root: String = {
    val dir = Files.createTempDirectory("graft_landing").toString
    for (day <- Seq("20240201", "20240202", "20240203"); pg <- 0 to 1) {
      val d = java.nio.file.Paths.get(dir, "CNPJ_12345678000190", "vendas", day)
      Files.createDirectories(d)
      val rows = (0 until 3).map { i =>
        val id = day.toLong * 100 + pg * 10 + i
        s"""{"sale_id": $id, "amount": ${i + 1}.5, "status": "${if (i == 0) "erro" else "sucesso"}", "ignored_key": 1}"""
      }
      Files.writeString(d.resolve(s"response_pg$pg.json"), rows.mkString("\n"))
    }
    dir
  }

  def read() = spark.read.format("graft-landing")
    .schema(dataSchema).option("path", root).option("endpoint", "vendas").load()

  test("reads all pages with path-derived dt/page/src_file columns") {
    val df = read()
    assert(df.count() === 18)   // 3 days × 2 pages × 3 records
    // metadata columns are hidden from the default projection...
    assert(df.columns.toSeq === Seq("sale_id", "amount", "status"))
    // ...but selectable by name
    assert(df.select("dt").distinct().count() === 3)
    assert(df.filter(col("src_file").contains("response_pg1.json")).count() === 9)
    // unknown JSON keys are dropped (lenient projection, §1.3)
  }

  test("one InputPartition per page file (the parallelism A1 lacked)") {
    assert(read().rdd.getNumPartitions === 6)
  }

  test("dt filter is pushed down and prunes page files before reading") {
    val df = read().filter(col("dt") >= "20240202")
    assert(df.rdd.getNumPartitions === 4, "pruning must drop day-1 files from the plan")
    assert(df.count() === 12)
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDesc.contains("pushedDt=[GreaterThanOrEqual(dt,20240202)]"), scanDesc)
  }

  test("residual filters still apply above the scan (A10 on page data)") {
    val ok = IngestOps.successOnly(read(), "status", "sucesso")
    assert(ok.count() === 12)
    assert(ok.filter(col("dt") === "20240201").count() === 4)
  }

  test("agrees with the built-in JSON reader over the same files") {
    val viaJson = spark.read.schema(dataSchema)
      .json(s"$root/CNPJ_12345678000190/vendas/*/response_pg*.json")
    val viaSource = read().select("sale_id", "amount", "status")
    assert(viaSource.except(viaJson).count() === 0)
    assert(viaJson.except(viaSource).count() === 0)
  }

  test("streams the landing layout: new page files arrive as increments") {
    import graft.streaming.EventStreams
    val dir = Files.createTempDirectory("graft_landing_stream")
    val day = dir.resolve(java.nio.file.Paths.get("CNPJ_1", "vendas", "20240301"))
    Files.createDirectories(day)
    def page(pg: Int, n: Int): Unit = Files.writeString(
      day.resolve(s"response_pg$pg.json"),
      (0 until n).map(i => s"""{"sale_id": ${pg * 10 + i}, "amount": 1.0, "status": "sucesso"}""")
        .mkString("\n"))
    page(0, 3)
    def streamed = spark.readStream.format("graft-landing")
      .schema(dataSchema).option("path", dir.toString).load()
      .select(col("sale_id"), col("amount"), col("status"), col("page"))

    val q1 = streamed.writeStream.format("memory").queryName("landing_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_landing_ckpt").toString)
      .outputMode("append").start()
    q1.processAllAvailable()
    assert(spark.table("landing_stream").count() === 3)
    // a new page lands → next trigger picks up ONLY the increment
    page(2, 2)
    q1.processAllAvailable()
    assert(spark.table("landing_stream").count() === 5)
    // a LATE page below the committed watermark (pg1 after pg2 was
    // committed) is deliberately skipped — the reference's
    // resume-from-watermark semantics, and what keeps offsets stable
    page(1, 4)
    q1.processAllAvailable()
    q1.stop()
    val rows = spark.table("landing_stream")
    assert(rows.count() === 5, "late page below the watermark must not replay or shift offsets")
    assert(rows.filter(col("page") === 2).count() === 2)
  }

  test("write path: df.write lands NDJSON pages the reader round-trips") {
    val dir = Files.createTempDirectory("graft_landing_write").toString
    val df = Seq((1L, 10.5, "sucesso"), (2L, 20.0, "erro"), (3L, 1.25, "sucesso"))
      .toDF("sale_id", "amount", "status").repartition(2)
    df.write.format("graft-landing")
      .option("path", dir).option("endpoint", "vendas")
      .option("cnpj", "12.345.678/0001-90").option("dt", "20240401")
      .mode("append").save()
    // files follow the reference's layout + page naming
    val day = new java.io.File(s"$dir/CNPJ_12345678000190/vendas/20240401")
    assert(day.listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq ===
      Seq("response_pg0.json", "response_pg1.json"))
    // and the DSv2 reader round-trips them
    val back = spark.read.format("graft-landing")
      .schema(df.schema).option("path", dir).load()
    assert(back.count() === 3)
    assert(back.select("sale_id", "amount", "status").except(df).count() === 0)
    assert(back.select("dt").distinct().head().getString(0) === "20240401")
    // overwrite (truncate) mode: re-landing replaces the page set
    df.limit(1).repartition(1).write.format("graft-landing")
      .option("path", dir).option("endpoint", "vendas")
      .option("cnpj", "12.345.678/0001-90").option("dt", "20240401")
      .mode("overwrite").save()
    assert(spark.read.format("graft-landing").schema(df.schema)
      .option("path", dir).load().count() === 1)
    // append mode PRESERVES landed pages and renumbers new ones after
    // the existing max page
    df.repartition(2).write.format("graft-landing")
      .option("path", dir).option("endpoint", "vendas")
      .option("cnpj", "12.345.678/0001-90").option("dt", "20240401")
      .mode("append").save()
    val afterAppend = spark.read.format("graft-landing").schema(df.schema)
      .option("path", dir).load()
    assert(afterAppend.count() === 4)
    assert(afterAppend.select("page").distinct().count() === 3)   // pg0 + appended pg1, pg2
  }

  test("uncommitted staging/backup dirs are invisible to readers and streams") {
    val dir = Files.createTempDirectory("graft_landing_stage").toString
    val live = java.nio.file.Paths.get(dir, "CNPJ_1", "vendas", "20240501")
    val stage = java.nio.file.Paths.get(dir, "CNPJ_1", "vendas", "20240501.staging-deadjob")
    Files.createDirectories(live); Files.createDirectories(stage)
    Files.writeString(live.resolve("response_pg0.json"), """{"sale_id": 1, "amount": 1.0, "status": "ok"}""")
    Files.writeString(stage.resolve("response_pg0.json"), """{"sale_id": 99, "amount": 9.9, "status": "partial"}""")
    val df = spark.read.format("graft-landing").schema(dataSchema).option("path", dir).load()
    assert(df.count() === 1)
    assert(df.filter(col("sale_id") === 99).count() === 0)
  }

  test("unparseable values become null, not Jackson's silent zero") {
    val dir = Files.createTempDirectory("graft_landing_bad")
    val d = dir.resolve(java.nio.file.Paths.get("CNPJ_1", "clientes"))
    Files.createDirectories(d)
    Files.writeString(d.resolve("response_pg0.json"),
      """{"sale_id": "N/A", "amount": "12,5", "status": "x"}
        |{"sale_id": 7, "amount": 1.5, "status": "y"}""".stripMargin)
    val df = spark.read.format("graft-landing").schema(dataSchema).option("path", dir.toString).load()
    val bad = df.filter(col("status") === "x").head()
    assert(bad.isNullAt(0) && bad.isNullAt(1), s"expected nulls, got $bad")
    assert(df.filter(col("sale_id") === 0 || col("amount") === 0.0).count() === 0)
  }

  test("scan reports post-pruning size statistics to the optimizer") {
    val all = read().queryExecution.optimizedPlan.stats.sizeInBytes
    val pruned = read().filter(col("dt") === "20240201")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(pruned > 0 && all > pruned, s"all=$all pruned=$pruned")
  }

  test("timestamps and nulls parse per schema") {
    val dir = Files.createTempDirectory("graft_landing_ts")
    val d = dir.resolve(java.nio.file.Paths.get("CNPJ_1", "clientes"))
    Files.createDirectories(d)
    Files.writeString(d.resolve("response_pg0.json"),
      """{"id": 1, "created": "2024-02-01T10:30:00Z", "name": null}
        |{"id": 2, "created": null, "name": "x"}""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("created", TimestampType), StructField("name", StringType)))
    val df = spark.read.format("graft-landing").schema(schema)
      .option("path", dir.toString).load()
    val rows = df.select(col("id"), col("created"), col("name"), col("dt")).orderBy("id").collect()
    assert(rows(0).getAs[java.sql.Timestamp]("created").toInstant.toString === "2024-02-01T10:30:00Z")
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(1))
    assert(rows(0).getAs[String]("dt") === "")   // undated endpoint layout
  }
}
