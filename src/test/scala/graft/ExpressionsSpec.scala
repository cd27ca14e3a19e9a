package graft

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native-expression coverage: codegen + interpreted paths, SQL
  * registration via GraftExtensions, and differential equality against
  * the higher-order-function twin. */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("qdot native == HOF twin on fixture embeddings (differential)") {
    val v = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), V.quantize(col("embedding")).as("q"))
    val diff = v.select(V.qdot(col("q"), col("q")).as("a"), V.qdotHof(col("q"), col("q")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("null element and null array semantics") {
    val df = Seq(
      (Some(Seq(Some(2L), None, Some(3L))), Some(Seq(Some(4L), Some(5L), Some(6L)))),
      (None, Some(Seq(Some(1L))))).toDF("a", "b")
    val got = df.select(V.qdot(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) === 2L * 4L + 3L * 6L)   // null element → 0 contribution
    assert(got(1).isNullAt(0))                        // null array → null
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    // force interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = df.select(V.qdot(col("a"), col("b"))).as[Long].head()
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val gen = df.select(V.qdot(col("a"), col("b"))).as[Long].head()
    assert(interp === 32L && gen === 32L)
  }

  test("char_shingles native == HOF twin on fixture documents (differential)") {
    import graft.functions.{TextFunctions => T}
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val diff = docs.select(T.shingles(col("text"), 3).as("a"), T.shinglesHof(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
    // short-text edge: |text| < n mirrors the composed form's greatest(...,1)
    val edge = Seq("ab", "", "abcd").toDF("t")
      .select(T.shingles(col("t"), 3).as("a"), T.shinglesHof(col("t"), 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(edge === 0)
  }

  test("SQL registration: qdot_native callable from spark.sql") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT qdot_native(array(1L, 2L), array(3L, 4L)) AS d").as[Long].head()
    assert(got === 11L)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val v = Tables.embeddings(spark, TestSpark.sf0001)
      .select(V.quantize(col("embedding")).as("q"))
    val plan = v.select(V.qdot(col("q"), col("q")).as("d")).queryExecution.executedPlan
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val qdotLine = plan.toString.linesIterator.find(_.contains("qdot_native")).get
    assert(qdotLine.trim.startsWith("*"), s"qdot_native not codegen'd:\n$plan")
  }
}
