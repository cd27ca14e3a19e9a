package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface entry point: registers every fixture table as a temp
  * view (plus graft's native SQL functions), so the full engine is
  * usable from `spark.sql(...)` exactly like the reference's users
  * query their warehouse (README.md:125-127).
  */
object GraftCatalog {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    GraftExtensions.register(spark)
  }
}
