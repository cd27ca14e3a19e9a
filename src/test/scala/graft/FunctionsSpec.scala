package graft

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: distinct character n-grams") {
    val got = Seq("abcabc").toDF("t")
      .select(T.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(got.toSet === Set("abc", "bca", "cab"))
  }

  test("tokens and counts") {
    val df = Seq("The  quick brown FOX").toDF("t")
    assert(df.select(T.tokenCount(col("t"))).as[Long].head() === 4L)
    assert(df.select(T.bpeishCount(col("t"))).as[Long].head() === 4L)
    assert(Seq("a-b c!").toDF("t").select(T.bpeishCount(col("t"))).as[Long].head() === 5L)
  }

  test("fingerprint normalizes case and outer whitespace") {
    val df = Seq(("  Hello World ", "hello world")).toDF("a", "b")
    val (fa, fb) = df.select(T.fingerprint(col("a")), T.fingerprint(col("b")))
      .as[(String, String)].head()
    assert(fa === fb)
  }

  test("langId separates stopword-dense text") {
    val df = Seq(
      "the cat sat on the mat and the dog is in the house",
      "zzz qqq www eee rrr ttt yyy").toDF("t")
    val got = df.select(T.langId(col("t"))).as[String].collect().toSeq
    assert(got === Seq("en", "other"))
  }

  test("minhash similarity: identical signatures score 1, disjoint near 0") {
    val df = Seq(("abcdefghij", "abcdefghij", "0123456789")).toDF("a", "b", "c")
    val sigs = df.select(
      T.minhashSignature(T.shingles(col("a"), 3), 16).as("sa"),
      T.minhashSignature(T.shingles(col("b"), 3), 16).as("sb"),
      T.minhashSignature(T.shingles(col("c"), 3), 16).as("sc"))
    val (same, diff) = sigs.select(
      T.minhashSimilarity(col("sa"), col("sb")),
      T.minhashSimilarity(col("sa"), col("sc"))).as[(Double, Double)].head()
    assert(same === 1.0)
    assert(diff < 0.3)
  }

  test("simhash: identical texts collide, hamming 0") {
    val df = Seq(("spark query engine", "spark query engine")).toDF("a", "b")
    val (ha, hb) = df.select(T.simhash("a"), T.simhash("b")).as[(Long, Long)].head()
    assert(ha === hb)
    assert(df.select(T.hamming(T.simhash("a"), T.simhash("b"))).as[Int].head() === 0)
  }

  test("quantized dot product is exact and cosine(self) = 1") {
    val df = Seq((Seq(0.5f, -0.25f, 0.125f), Seq(0.5f, -0.25f, 0.125f))).toDF("a", "b")
    val q = df.select(V.quantize(col("a")).as("qa"), V.quantize(col("b")).as("qb"))
    val dot = q.select(V.qdot(col("qa"), col("qb"))).as[Long].head()
    assert(dot === 500000L * 500000L + 250000L * 250000L + 125000L * 125000L)
    val cos = q.select(V.cosineFromQ(V.qdot(col("qa"), col("qb")),
      V.qdot(col("qa"), col("qa")), V.qdot(col("qb"), col("qb")))).as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("graft_might_contain: one registered probe over both bloom kinds, null fp = false") {
    GraftExtensions.register(spark)
    val cb = graft.operators.CountingBloom.sized(100, 0.01)
    cb.add("present")
    val bcCb = spark.sparkContext.broadcast[graft.operators.BloomProbe](cb)
    graft.operators.BloomRegistry.register("spec_cb", bcCb)
    val bit = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bit.putString("present")
    val bcBit = spark.sparkContext.broadcast[graft.operators.BloomProbe](
      new graft.operators.SparkBloomProbe(bit))
    graft.operators.BloomRegistry.register("spec_bit", bcBit)
    val df = Seq(Some("present"), Some("absent-zzz"), None).toDF("fp")
    // SQL surface: the handle resolves at analysis time on the driver
    val got = df.selectExpr(
      "graft_might_contain(fp, 'spec_cb') AS c",
      "graft_might_contain(fp, 'spec_bit') AS b")
      .as[(Boolean, Boolean)].collect().toSeq
    assert(got === Seq((true, true), (false, false), (false, false)),
      "counting and bit blooms must answer identically through the one expression")
    // DataFrame path is the SAME expression (the three judged serve
    // paths route through it — no per-QueryDef udf to drift)
    assert(df.select(T.graftMightContain(bcCb, col("fp"))).as[Boolean].collect().toSeq
      === Seq(true, false, false))
    // an unregistered handle fails loudly at analysis, not at runtime
    val err = intercept[Exception](
      df.selectExpr("graft_might_contain(fp, 'never_registered')").collect())
    assert(err.getMessage.contains("never_registered"))
    // the handle must be a literal — a column reference cannot name a
    // driver-side broadcast
    intercept[Exception](df.selectExpr("graft_might_contain(fp, fp)").collect())
  }

  test("graft_might_contain: interpreted (codegen-off) path agrees with codegen") {
    // BloomMightContain implements both eval() and doGenCode; the
    // judged plans run codegen'd, but fallback contexts (e.g. inside
    // certain interpreted projections) hit eval — pin the two paths
    // to the same answers
    GraftExtensions.register(spark)
    val cb = graft.operators.CountingBloom.sized(100, 0.01)
    cb.add("present")
    val bc = spark.sparkContext.broadcast[graft.operators.BloomProbe](cb)
    val df = Seq(Some("present"), Some("absent-zzz"), None).toDF("fp")
    def answers() = df.select(T.graftMightContain(bc, col("fp")))
      .as[Boolean].collect().toSeq
    val codegen = answers()
    val interpreted = graft.operators.ConfScope.withConf(spark, Map(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN"))(answers())
    assert(codegen === Seq(true, false, false))
    assert(interpreted === codegen)
  }

  test("lshBucket: same vector → same bucket, stable across runs") {
    val df = Seq(Seq(0.5f, -0.25f, 0.125f, 0.9f)).toDF("v")
    val b1 = df.select(V.lshBucket(V.quantize(col("v")), 8)).as[Long].head()
    val b2 = df.select(V.lshBucket(V.quantize(col("v")), 8)).as[Long].head()
    assert(b1 === b2)
    assert(b1 >= 0 && b1 < 256)
  }
}
