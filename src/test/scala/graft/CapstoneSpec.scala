package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Capstone integration: the whole reference pipeline shape through
  * graft's own machinery, end to end —
  *   DSv2 landing WRITE (paged NDJSON layout)
  *   → DSv2 landing STREAM (watermark-keyed micro-batches)
  *   → foreachBatch idempotent merge (latest-wins)
  *   → relational query over the merged table.
  */
class CapstoneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("land → stream → merge → query, with replayed pages deduped") {
    val root = Files.createTempDirectory("graft_capstone").toString
    val merged = Files.createTempDirectory("graft_capstone_m").toString + "/sales"
    val schema = StructType(Seq(StructField("sale_id", LongType),
      StructField("amount", DoubleType), StructField("updated", TimestampType)))

    def land(day: String, rows: Seq[(Long, Double, String)]): Unit =
      rows.toDF("sale_id", "amount", "updated")
        .withColumn("updated", to_timestamp(col("updated")))
        .repartition(1)
        .write.format("graft-landing")
        .option("path", root).option("endpoint", "vendas")
        .option("cnpj", "11.111.111/0001-11").option("dt", day)
        .mode("append").save()

    // day 1 lands; sale 2 later REPLAYED on day 2 with a newer amount
    land("20240601", Seq((1L, 10.0, "2024-06-01 08:00:00"), (2L, 20.0, "2024-06-01 09:00:00")))
    land("20240602", Seq((2L, 25.0, "2024-06-02 07:00:00"), (3L, 30.0, "2024-06-02 08:00:00")))

    val stream = spark.readStream.format("graft-landing")
      .schema(schema).option("path", root).option("endpoint", "vendas").load()
    val q = StatefulOps.idempotentSink(stream, merged,
      keys = Seq("sale_id"), orderCol = "updated", tiebreaks = Seq("amount"))
      .option("checkpointLocation", Files.createTempDirectory("graft_capstone_c").toString)
      .start()
    q.processAllAvailable()

    // a third page lands mid-stream → incremental pickup + merge
    land("20240603", Seq((4L, 40.0, "2024-06-03 08:00:00"), (1L, 12.0, "2024-06-03 09:00:00")))
    q.processAllAvailable()
    q.stop()

    val table = spark.read.parquet(merged)
    assert(table.count() === 4)   // latest-wins per sale_id
    val amounts = table.select("sale_id", "amount").as[(Long, Double)].collect().toMap
    assert(amounts === Map(1L -> 12.0, 2L -> 25.0, 3L -> 30.0, 4L -> 40.0))

    // and the relational layer queries the merged result
    table.createOrReplaceTempView("graft_capstone_sales")
    val total = spark.sql(
      "SELECT CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DECIMAL(18,2)) FROM graft_capstone_sales")
      .head().getDecimal(0)
    assert(total === new java.math.BigDecimal("107.00"))
  }
}
