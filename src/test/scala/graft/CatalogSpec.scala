package graft

import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registerAll exposes every table and native function to spark.sql") {
    GraftCatalog.registerAll(spark, TestSpark.sf0001)
    val n = spark.sql("""
      SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey""").head().getLong(0)
    assert(n === 6000L)
    // events view must carry the converted microsecond timestamp
    val tsType = spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType.typeName
    assert(tsType.startsWith("timestamp"))
    // native function usable in SQL through the same surface
    val d = spark.sql("SELECT qdot_native(array(2L, 3L), array(4L, 5L)) AS d").head().getLong(0)
    assert(d === 23L)
  }
}
